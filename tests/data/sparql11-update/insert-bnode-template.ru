PREFIX ex: <http://example.org/>
INSERT { ?s ex:address [ ex:city "Graz" ] } WHERE { ?s ex:person true }
