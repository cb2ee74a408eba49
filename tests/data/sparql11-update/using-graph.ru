PREFIX ex: <http://example.org/>
INSERT { ?s ex:copied true }
USING ex:src
WHERE { ?s ex:flag true }
