PREFIX ex: <http://example.org/>
ADD ex:g1 TO ex:g2
