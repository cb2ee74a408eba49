PREFIX : <http://example.org/>
INSERT { ?s :v2 ?o } WHERE { ?s :v 1 OPTIONAL { ?s :w ?o } }
