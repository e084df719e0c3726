"""Test fixture data, re-authored from the public W3C SPARQL 1.1 spec
examples that the reference's fixtures are drawn from (shapes documented
in /root/repo/FIXTURES.md). Inline Turtle/TriG strings — also exercising
our Turtle reader on every test."""

VALUES_TTL = """
@prefix dc: <http://purl.org/dc/elements/1.1/> .
@prefix : <http://example.org/book/> .
@prefix ns: <http://example.org/ns#> .

:book1 dc:title "SPARQL Tutorial" ;
       ns:price 42 .
:book2 dc:title "The Semantic Web" ;
       ns:price 23 .
:book3 dc:title "Priceless SPARQL" .
"""

GROUP_BY_TTL = """
@prefix : <http://books.example/> .
:org1 :affiliates :auth1, :auth2 .
:auth1 :writesBook :book1, :book2 .
:book1 :price 9 .
:book2 :price 5 .
:auth2 :writesBook :book3 .
:book3 :price 7 .
:org2 :affiliates :auth3 .
:auth3 :writesBook :book4 .
:book4 :price 7 .

@prefix : <http://example.com/data/#> .
:x :p 1, 2, 3, 4 .
:y :p 1, _:b2, 3, 4 .
:z :p 1.0, 2.0, 3.0, 4 .
:w :p 1, 2, 3 .
"""

SAMPLE_TTL = """
@prefix : <http://example.com/data/#> .
:x :p 1, 2 .
:y :p 1, _:b2 .
"""

UNION_TTL = """
@prefix dc10: <http://purl.org/dc/elements/1.0/> .
@prefix dc11: <http://purl.org/dc/elements/1.1/> .

_:a dc10:title "SPARQL Query Language Tutorial" .
_:a dc10:creator "Alice" .
_:b dc11:title "SPARQL Protocol Tutorial" .
_:b dc11:creator "Bob" .
_:c dc10:title "SPARQL" .
_:c dc11:title "SPARQL (updated)" .
"""

OPTIONALS_TTL = """
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .

_:a rdf:type foaf:Person .
_:a foaf:name "Alice" .
_:a foaf:mbox <mailto:alice@example.com> .
_:a foaf:mbox <mailto:alice@work.example> .
_:b rdf:type foaf:Person .
_:b foaf:name "Bob" .
"""

OPTIONALS2_TTL = """
@prefix foaf: <http://xmlns.com/foaf/0.1/> .

_:a foaf:name "Alice" .
_:a foaf:homepage <http://work.example.org/alice/> .
_:b foaf:name "Bob" .
_:b foaf:mbox <mailto:bob@work.example> .
"""

MINUS_TTL = """
@prefix : <http://example/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .

:alice foaf:givenName "Alice" ;
       foaf:familyName "Smith" .
:bob   foaf:givenName "Bob" ;
       foaf:familyName "Jones" .
:carol foaf:givenName "Carol" ;
       foaf:familyName "Smith" .
"""

INNER_FILTER_TTL = """
@prefix : <http://example.com/> .
:a :p 1 .
:a :q 1, 2 .
:b :p 3.0 .
:b :q 4.0, 5.0 .
"""

PROPERTY_PATHS_TTL = """
@prefix : <http://example/> .
:order :item :z1, :z2 .
:z1 :name "Small" ;
    :price 5 .
:z2 :name "Large" ;
    :price 5 .
"""

GRAPHS_TRIG = """
@prefix dc: <http://purl.org/dc/elements/1.1/> .
@prefix g: <tag:example.org,2005-06-06:> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .

g:graph1 dc:publisher "Bob" .
g:graph1 dc:date "2004-12-06"^^xsd:date .
g:graph2 dc:publisher "Bob" .
g:graph2 dc:date "2005-01-10"^^xsd:date .

g:graph1 {
  _:a1 foaf:name "Alice" .
  _:a1 foaf:mbox <mailto:alice@work.example> .
  <mailto:alice@work.example> foaf:name "Alice's Work Email" .
  _:b1 foaf:name "Bob" .
  _:b1 foaf:mbox <mailto:bob@oldcorp.example.org> .
  <mailto:bob@oldcorp.example.org> foaf:name "Bob's Oldcorp Email" .
}

g:graph2 {
  _:a2 foaf:name "Alice" .
  _:a2 foaf:mbox <mailto:alice@work.example> .
  <mailto:alice@work.example> foaf:name "Alice's Work Email" .
  _:b2 foaf:name "Bob" .
  _:b2 foaf:mbox <mailto:bob@newcorp.example.org> .
  <mailto:bob@newcorp.example.org> foaf:name "Bob's Newcorp Email" .
}

<tag:graph3> {
  g:item1 g:in g:otherItem .
}

<tag:graph4> {
  g:otherItem foaf:name "Test" .
  g:otherItem rdf:type g:class .
}
"""
