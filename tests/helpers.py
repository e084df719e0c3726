"""Differential-test helpers mirroring the reference harness contract
(reference: SparqlPipelineTest.scala:15-58, Utils.scala:56-68): results
compared order-insensitively with exact cardinality; terms normalized to
(lexical, datatype-class, lang); numerics compared with 1e-4 tolerance."""

from __future__ import annotations

from scio_sparql_spark import execute_sparql, parse_turtle, quads_df_from_list
from scio_sparql_spark.terms import NUMERIC_DTS, XSD_ANYURI


def run_sparql(spark, turtle: str, query: str):
    """Parse fixture text, run the query, return list of dicts
    var -> normalized value (None = unbound)."""
    quads = quads_df_from_list(spark, parse_turtle(turtle))
    df = execute_sparql(quads, query)
    out = []
    for row in df.collect():
        d = {}
        for name in df.columns:
            v = row[name]
            d[name] = None if v is None else _norm(v)
        out.append(d)
    return out


def _norm(v):
    kind, lex, dt, lang = v["kind"], v["lex"], v["dt"], v["lang"]
    if kind != 2:  # IRIs and bnodes compare by string value (Utils.scala:65-66)
        return (lex, XSD_ANYURI, None)
    if dt in NUMERIC_DTS:
        return (round(float(lex), 4), "num", None)
    return (lex, dt, lang)


def num(x):
    """Expected numeric literal of any numeric datatype."""
    return (round(float(x), 4), "num", None)


def s(lex, dt=None, lang=None):
    from scio_sparql_spark.terms import XSD_STRING

    return (lex, dt or XSD_STRING, lang)


def iri(x):
    return (x, XSD_ANYURI, None)


def assert_bag_equal(actual: list[dict], expected: list[dict]):
    """Order-insensitive, multiplicity-sensitive comparison
    (containInAnyOrder + size, SparqlPipelineTest.scala:52-56)."""
    def key(d):
        return tuple(sorted((k, repr(v)) for k, v in d.items()))

    a = sorted(actual, key=key)
    e = sorted(expected, key=key)
    assert a == e, f"\nactual:   {a}\nexpected: {e}"
