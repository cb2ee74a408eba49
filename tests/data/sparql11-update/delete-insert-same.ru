PREFIX : <http://example.org/>
DELETE { :a :p :b } INSERT { :a :p :b } WHERE {}
