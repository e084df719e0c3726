"""LIMIT / OFFSET / ORDER BY parity with the reference's LimitsTest
(reference: src/test/scala/LimitsTest.scala). Unordered LIMIT/OFFSET are
checked by row count only (the reference normalizes the same way,
LimitsTest.scala:16-21). Ordered slices check membership: our term total
order puts numerics before non-numeric literals (cross-type literal order
is implementation-defined in SPARQL; ours is documented in
terms.sort_key)."""

from .fixtures import VALUES_TTL
from .helpers import num, run_sparql, s

# all five ?c object values in our documented order
_ORDERED_C = [
    num(23),
    num(42),
    s("Priceless SPARQL"),
    s("SPARQL Tutorial"),
    s("The Semantic Web"),
]

_Q = """
PREFIX dc: <http://purl.org/dc/elements/1.1/>
SELECT *
{
   ?a ?b ?c
} %s"""


def test_limit(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "LIMIT 2")
    assert len(out) == 2


def test_offset(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "OFFSET 3")
    assert len(out) == 2


def test_order_by_limit(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "ORDER BY ?c\nLIMIT 3")
    assert [r["c"] for r in out] == _ORDERED_C[:3]


def test_order_by_offset_limit(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "ORDER BY ?c\nOFFSET 1\nLIMIT 3")
    assert [r["c"] for r in out] == _ORDERED_C[1:4]


def test_order_by_offset(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "ORDER BY ?c\nOFFSET 1")
    assert [r["c"] for r in out] == _ORDERED_C[1:]


def test_order_by_desc(spark):
    out = run_sparql(spark, VALUES_TTL, _Q % "ORDER BY DESC(?c)")
    assert [r["c"] for r in out] == list(reversed(_ORDERED_C))
