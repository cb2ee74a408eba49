PREFIX ex: <http://example.org/>
CLEAR GRAPH ex:g1
