PREFIX : <http://example.org/>
ADD GRAPH <http://example.org/g1> TO GRAPH <http://example.org/gnew>
