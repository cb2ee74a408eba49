PREFIX ex: <http://example.org/>
DELETE { ?s ex:oldName ?n } INSERT { ?s ex:name ?n }
WHERE { ?s ex:oldName ?n }
