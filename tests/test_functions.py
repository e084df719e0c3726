"""Scalar builtin coverage (SURVEY.md §2.9). The reference gets these from
rdf4j's StrictEvaluationStrategy (Interpreter.scala:39-54); ours are native
Columns. Each test drives a BIND/FILTER through the full engine."""

import pytest

from .helpers import assert_bag_equal, iri, num, run_sparql, s

TTL = """
@prefix : <urn:t:> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:a :name "Hello World" ;
   :tag "bonjour"@fr ;
   :n 42 ;
   :d 2.5 ;
   :when "2024-03-15T10:30:45"^^xsd:dateTime .
"""


def q(expr, extra=""):
    return f"""
    PREFIX : <urn:t:>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    SELECT ?out WHERE {{
      :a :name ?name ; :tag ?tag ; :n ?n ; :d ?d ; :when ?when .
      {extra}
      BIND(({expr}) AS ?out)
    }}"""


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("STR(?n)", s("42")),
        ("STR(:a)", s("urn:t:a")),
        ("LANG(?tag)", s("fr")),
        ("LANG(?name)", s("")),
        ("DATATYPE(?n)", iri("http://www.w3.org/2001/XMLSchema#integer")),
        ("STRLEN(?name)", num(11)),
        ("UCASE(?name)", s("HELLO WORLD")),
        ("LCASE(?name)", s("hello world")),
        ("SUBSTR(?name, 7)", s("World")),
        ("SUBSTR(?name, 1, 5)", s("Hello")),
        ("CONCAT(?name, \"!\")", s("Hello World!")),
        ("CONTAINS(?name, \"lo W\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("STRSTARTS(?name, \"Hello\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("STRENDS(?name, \"World\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("STRBEFORE(?name, \" \")", s("Hello")),
        ("STRAFTER(?name, \" \")", s("World")),
        ("STRBEFORE(?name, \"zzz\")", s("")),
        ("REPLACE(?name, \"World\", \"There\")", s("Hello There")),
        ("REGEX(?name, \"^hello\", \"i\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ABS(-3)", num(3)),
        ("CEIL(?d)", num(3)),
        ("FLOOR(?d)", num(2)),
        ("ROUND(?d)", num(3)),
        ("?n + ?d", num(44.5)),
        ("?n * 2", num(84)),
        ("?n - 40", num(2)),
        ("?n / 4", num(10.5)),
        ("-?n", num(-42)),
        ("IF(?n > 10, \"big\", \"small\")", s("big")),
        ("COALESCE(?missing, ?n)", num(42)),
        ("YEAR(?when)", num(2024)),
        ("MONTH(?when)", num(3)),
        ("DAY(?when)", num(15)),
        ("HOURS(?when)", num(10)),
        ("MINUTES(?when)", num(30)),
        ("SECONDS(?when)", num(45)),
        ("MD5(\"abc\")", s("900150983cd24fb0d6963f7d28e17f72")),
        ("SHA1(\"abc\")", s("a9993e364706816aba3e25717850c26c9cd0d89d")),
        ("SHA256(\"abc\")", s("ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")),
        ("xsd:integer(?d)", num(2)),
        ("xsd:double(?n)", num(42.0)),
        ("xsd:string(?n)", s("42")),
        ("xsd:boolean(\"true\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ISIRI(:a)", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ISLITERAL(?n)", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ISNUMERIC(?n)", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ISNUMERIC(?name)", ("false", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("SAMETERM(?n, ?n)", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("LANGMATCHES(LANG(?tag), \"FR\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("LANGMATCHES(LANG(?tag), \"*\")", ("true", "http://www.w3.org/2001/XMLSchema#boolean", None)),
        ("ENCODE_FOR_URI(\"a b\")", s("a%20b")),
        ("STRDT(\"5\", xsd:integer)", num(5)),
        ("IRI(\"urn:t:x\")", iri("urn:t:x")),
    ],
)
def test_builtin(spark, expr, expected):
    out = run_sparql(spark, TTL, q(expr))
    assert_bag_equal(out, [{"out": expected}])


def test_error_to_unbound(spark):
    # type error in BIND -> unbound, row survives (Interpreter.scala:911-916)
    out = run_sparql(spark, TTL, q("?name * 2"))
    assert_bag_equal(out, [{"out": None}])


def test_error_in_filter_drops_row(spark):
    out = run_sparql(
        spark,
        TTL,
        """
        PREFIX : <urn:t:>
        SELECT ?name WHERE { :a :name ?name . FILTER(?name > 5) }""",
    )
    assert out == []


def test_bound_and_logic(spark):
    out = run_sparql(
        spark,
        TTL,
        """
        PREFIX : <urn:t:>
        SELECT ?x WHERE {
          :a :name ?x .
          OPTIONAL { :a :nope ?m }
          FILTER(!BOUND(?m) && (BOUND(?x) || ?x > 99))
        }""",
    )
    assert_bag_equal(out, [{"x": s("Hello World")}])


def test_in_not_in(spark):
    out = run_sparql(
        spark,
        TTL,
        """
        PREFIX : <urn:t:>
        SELECT ?n WHERE { :a :n ?n . FILTER(?n IN (41, 42, 43)) }""",
    )
    assert_bag_equal(out, [{"n": num(42)}])
    out = run_sparql(
        spark,
        TTL,
        """
        PREFIX : <urn:t:>
        SELECT ?n WHERE { :a :n ?n . FILTER(?n NOT IN (41, 43)) }""",
    )
    assert_bag_equal(out, [{"n": num(42)}])


def test_numeric_promotion(spark):
    # integer + decimal -> decimal; / of ints -> decimal (XPath promotion,
    # ValueEvaluators.scala:19-25)
    ttl = "@prefix : <urn:t:> . :a :p 1 . :a :q 2.5 ."
    out = run_sparql(
        spark,
        ttl,
        """
        PREFIX : <urn:t:>
        SELECT ?r ?dt WHERE {
          :a :p ?x ; :q ?y .
          BIND(?x + ?y AS ?r)
          BIND(STR(DATATYPE(?r)) AS ?dt)
        }""",
    )
    assert out[0]["r"] == num(3.5)
    assert out[0]["dt"] == s("http://www.w3.org/2001/XMLSchema#decimal")
