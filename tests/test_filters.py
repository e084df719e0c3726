"""FILTER / EXISTS / NOT EXISTS / MINUS parity with the reference's
FilterTest (reference: src/test/scala/FilterTest.scala). The correlated
inner-filter case uses true SPARQL semantics (condition in the semi/anti
join ON clause) — the rdf4j oracle's behavior, which the reference itself
documents as unsupported (README.md:57-58)."""

from .fixtures import INNER_FILTER_TTL, MINUS_TTL, VALUES_TTL
from .helpers import assert_bag_equal, iri, num, run_sparql, s

BK = "http://example.org/book/"


def test_filter_in_optional(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?title ?price
    WHERE { ?x dc:title ?title .
            OPTIONAL { ?x ns:price ?price . FILTER (?price < 30) } }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(
        out,
        [
            {"title": s("SPARQL Tutorial"), "price": None},
            {"title": s("The Semantic Web"), "price": num(23)},
            {"title": s("Priceless SPARQL"), "price": None},
        ],
    )


def test_filter_plain(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?title ?price
    WHERE { ?x dc:title ?title .
            ?x ns:price ?price . FILTER (?price < 30) }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(out, [{"title": s("The Semantic Web"), "price": num(23)}])


def test_exists(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?title ?price
    WHERE { ?x dc:title ?title .
            FILTER EXISTS { ?x ns:price ?price } }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(
        out,
        [
            {"title": s("SPARQL Tutorial"), "price": None},
            {"title": s("The Semantic Web"), "price": None},
        ],
    )


def test_not_exists(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?title ?price
    WHERE { ?x dc:title ?title .
            FILTER NOT EXISTS { ?x ns:price ?price } }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(out, [{"title": s("Priceless SPARQL"), "price": None}])


def test_not_exists_no_shared_vars(spark):
    # uncorrelated NOT EXISTS over a non-empty dataset filters everything
    q = """
    SELECT *
    {
      ?s ?p ?o
      FILTER NOT EXISTS { ?x ?y ?z }
    }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert out == []


def test_correlated_inner_filter(spark):
    # :a's p-value equals one of its q-values -> excluded; :b's does not
    q = """
    PREFIX : <http://example.com/>
    SELECT * WHERE {
        ?x :p ?n
        FILTER NOT EXISTS {
            ?x :q ?m .
            FILTER(?n = ?m)
        }
    }"""
    out = run_sparql(spark, INNER_FILTER_TTL, q)
    assert_bag_equal(out, [{"x": iri("http://example.com/b"), "n": num(3.0)}])


def test_minus(spark):
    # MINUS with the disjoint-domain rule — declared-but-missing in the
    # reference (SURVEY.md §2.3); spec answer: alice + carol survive
    q = """
    PREFIX : <http://example/>
    PREFIX foaf: <http://xmlns.com/foaf/0.1/>
    SELECT DISTINCT ?s
    WHERE {
       ?s ?p ?o .
       MINUS { ?s foaf:givenName "Bob" . }
    }"""
    out = run_sparql(spark, MINUS_TTL, q)
    assert_bag_equal(
        out,
        [{"s": iri("http://example/alice")}, {"s": iri("http://example/carol")}],
    )


EXISTS_BIND_TTL = """
@prefix : <urn:eb:> .
:a :p 1 ; :q "x" .
:b :p 2 .
:c :p 3 ; :q "y" .
"""


def test_exists_inside_bind(spark):
    """BIND(EXISTS{} AS ?x): boolean column, not a filter — rdf4j
    evaluates this but the reference's interpreter has no Exists value
    case; upgrade."""
    q = """
    PREFIX : <urn:eb:>
    SELECT ?s ?has WHERE { ?s :p ?v . BIND(EXISTS { ?s :q ?w } AS ?has) }"""
    out = run_sparql(spark, EXISTS_BIND_TTL, q)
    got = {d["s"][0]: d["has"][0] for d in out}
    assert got == {"urn:eb:a": "true", "urn:eb:b": "false", "urn:eb:c": "true"}


def test_not_exists_inside_bind_if(spark):
    q = """
    PREFIX : <urn:eb:>
    SELECT ?s ?label WHERE {
      ?s :p ?v .
      BIND(IF(NOT EXISTS { ?s :q ?w }, "bare", "tagged") AS ?label)
    }"""
    out = run_sparql(spark, EXISTS_BIND_TTL, q)
    got = {d["s"][0]: d["label"][0] for d in out}
    assert got == {"urn:eb:a": "tagged", "urn:eb:b": "bare", "urn:eb:c": "tagged"}


def test_exists_nested_in_or_filter(spark):
    """EXISTS below an || (not top-level AND-part): rewritten to a hidden
    boolean column, so the disjunction evaluates row-wise."""
    q = """
    PREFIX : <urn:eb:>
    SELECT ?s WHERE { ?s :p ?v . FILTER(EXISTS { ?s :q ?w } || ?v > 2) }"""
    out = run_sparql(spark, EXISTS_BIND_TTL, q)
    assert {d["s"][0] for d in out} == {"urn:eb:a", "urn:eb:c"}
