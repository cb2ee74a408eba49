PREFIX ex: <http://example.org/>
MOVE ex:g1 TO ex:g2
