PREFIX ex: <http://example.org/>
WITH ex:g1
DELETE { ?s ex:status "draft" } INSERT { ?s ex:status "final" }
WHERE { ?s ex:status "draft" }
