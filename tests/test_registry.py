"""User scalar-function registry (SURVEY §2.11 extension point —
strict upgrade: the reference's Interpreter has no extension-function
surface, its expression table is rdf4j's fixed builtin set)."""

import pytest
from pyspark.sql import functions as F

from scio_sparql_spark import (
    execute_sparql,
    parse_turtle,
    pandas_scalar_builder,
    quads_df_from_list,
    register_function,
    unregister_function,
)
from scio_sparql_spark.terms import is_literal, string_term

TTL = """@prefix : <urn:x:> .
:a :name "Brand#13" . :b :name "  Foo--Bar  " . :c :name "plain" ."""


def _quads(spark):
    return quads_df_from_list(spark, parse_turtle(TTL))


def _collapse_builder(args):
    lex = args[0]["lex"]
    v = F.trim(F.regexp_replace(F.lower(lex), "[^a-z0-9]+", " "))
    return F.when(is_literal(args[0]), string_term(v))


def test_registered_function_in_bind_and_filter(spark):
    register_function("urn:fn:collapse", _collapse_builder)
    try:
        df = execute_sparql(
            _quads(spark),
            """PREFIX : <urn:x:> PREFIX fn: <urn:fn:>
               SELECT ?s ?norm WHERE {
                 ?s :name ?n . BIND(fn:collapse(?n) AS ?norm)
                 FILTER(CONTAINS(fn:collapse(?n), " ")) }""",
        )
        out = {r["s"]["lex"]: r["norm"]["lex"] for r in df.collect()}
        assert out == {"urn:x:a": "brand 13", "urn:x:b": "foo bar"}
    finally:
        unregister_function("urn:fn:collapse")


def test_unregistered_iri_call_raises_with_hint(spark):
    with pytest.raises(ValueError, match="register_function"):
        execute_sparql(
            _quads(spark),
            """PREFIX : <urn:x:>
               SELECT ?v WHERE { ?s :name ?n . BIND(<urn:fn:nope>(?n) AS ?v) }""",
        ).collect()


def test_xsd_casts_still_dispatch_after_registry(spark):
    # the registry check must not shadow cast-style calls
    df = execute_sparql(
        quads_df_from_list(
            spark, parse_turtle('@prefix : <urn:x:> . :a :v "7" .')
        ),
        """PREFIX : <urn:x:> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?i WHERE { ?s :v ?v . BIND(xsd:integer(?v) AS ?i) }""",
    )
    assert [r["i"]["lex"] for r in df.collect()] == ["7"]


def test_registry_overrides_cast_iri_and_restores(spark):
    # a registered builder wins over the cast table for the same IRI;
    # unregistering restores cast behavior
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    register_function(
        xsd_int, lambda args: string_term(F.lit("overridden"))
    )
    try:
        df = execute_sparql(
            quads_df_from_list(
                spark, parse_turtle('@prefix : <urn:x:> . :a :v "7" .')
            ),
            """PREFIX : <urn:x:>
               PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
               SELECT ?i WHERE { ?s :v ?v . BIND(xsd:integer(?v) AS ?i) }""",
        )
        assert [r["i"]["lex"] for r in df.collect()] == ["overridden"]
    finally:
        unregister_function(xsd_int)


def test_pandas_scalar_builder_arrow_path(spark):
    register_function(
        "urn:fn:rev", pandas_scalar_builder(lambda s: s[::-1])
    )
    try:
        df = execute_sparql(
            _quads(spark),
            """PREFIX : <urn:x:> PREFIX fn: <urn:fn:>
               SELECT ?r WHERE { <urn:x:c> :name ?n . BIND(fn:rev(?n) AS ?r) }""",
        )
        assert [r["r"]["lex"] for r in df.collect()] == ["nialp"]
    finally:
        unregister_function("urn:fn:rev")


def test_register_function_validates_inputs():
    with pytest.raises(ValueError):
        register_function("notanabsoluteiri", lambda a: a)
    with pytest.raises(TypeError):
        register_function("urn:fn:x", "not-callable")
