PREFIX ex: <http://example.org/>
INSERT DATA { GRAPH ex:g1 { ex:s ex:p ex:o } }
