PREFIX ex: <http://example.org/>
COPY DEFAULT TO ex:g1
