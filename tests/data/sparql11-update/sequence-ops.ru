PREFIX ex: <http://example.org/>
INSERT DATA { ex:t ex:step 1 } ;
INSERT DATA { ex:t ex:step 2 } ;
DELETE WHERE { ex:t ex:step 1 }
