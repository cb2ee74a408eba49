PREFIX : <http://example.org/>
INSERT { ?s :reach "yes" } WHERE { :a :p+ ?s }
