PREFIX ex: <http://example.org/>
DELETE WHERE { GRAPH ex:g1 { ?s ex:temp ?o } }
