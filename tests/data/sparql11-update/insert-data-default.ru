PREFIX ex: <http://example.org/>
INSERT DATA { ex:book1 ex:price 42 . ex:book1 ex:title "SPARQL" }
