"""VALUES / UNDEF / UNION / BIND parity with the reference's ValuesTest
(reference: src/test/scala/ValuesTest.scala)."""

from .fixtures import VALUES_TTL
from .helpers import assert_bag_equal, iri, num, run_sparql, s

BK = "http://example.org/book/"


def test_values_simple(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX : <http://example.org/book/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?book ?title ?price
    {
       VALUES ?book { :book1 :book3 }
       ?book dc:title ?title ;
             ns:price ?price .
    }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(
        out,
        [{"book": iri(BK + "book1"), "title": s("SPARQL Tutorial"), "price": num(42)}],
    )


def test_values_undef(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX : <http://example.org/book/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?book ?title ?price
    {
       ?book dc:title ?title ;
             ns:price ?price .
       VALUES (?book ?title)
       { (UNDEF "SPARQL Tutorial")
         (:book2 UNDEF)
       }
    }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(
        out,
        [
            {"book": iri(BK + "book1"), "title": s("SPARQL Tutorial"), "price": num(42)},
            {"book": iri(BK + "book2"), "title": s("The Semantic Web"), "price": num(23)},
        ],
    )


def test_union_with_anon_subject(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX : <http://example.org/book/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?price
    {
       {
         :book2 dc:title ?title;
                ns:price ?price .
       }
       UNION
       {
         [] dc:title "SPARQL Tutorial";
            ns:price ?price .
       }
    }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(out, [{"price": num(23)}, {"price": num(42)}])


def test_bind(spark):
    q = """
    PREFIX dc: <http://purl.org/dc/elements/1.1/>
    PREFIX : <http://example.org/book/>
    PREFIX ns: <http://example.org/ns#>
    SELECT ?book ?title ?price
    {
       BIND(:book1 as ?book)
       ?book dc:title ?title ;
             ns:price ?hiddenPrice .
       BIND((?hiddenPrice * ?hiddenPrice) as ?price)
    }"""
    out = run_sparql(spark, VALUES_TTL, q)
    assert_bag_equal(
        out,
        [{"book": iri(BK + "book1"), "title": s("SPARQL Tutorial"), "price": num(1764)}],
    )


def test_signed_numeric_literals_in_values(spark):
    """Grammar [131]/[132]: signed numeric literals are single tokens —
    adjacent sign parses (keeping the written sign in the lexical
    form); a detached sign is a syntax error."""
    import pytest

    from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list

    quads = quads_df_from_list(
        spark, parse_turtle("@prefix : <urn:x:> . :a :p 1 .")
    )
    df = execute_sparql(
        quads, "SELECT ?v WHERE { VALUES ?v { -1 +2 3 -4.5 } }"
    )
    assert sorted(r["v"]["lex"] for r in df.collect()) == ["+2", "-1", "-4.5", "3"]
    with pytest.raises(SyntaxError):
        execute_sparql(quads, "SELECT ?v WHERE { VALUES ?v { - 1 } }")
