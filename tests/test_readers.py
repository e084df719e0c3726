"""RDF ingest coverage: distributed N-Triples/N-Quads, Turtle details,
parquet round-trip (the reference's TriplesIO.write is unimplemented —
TriplesReader.scala:45-48 — ours is tested here)."""

import os

from pyspark.sql import functions as F

from scio_sparql_spark import (
    execute_sparql,
    parse_turtle,
    quads_df_from_list,
    read_triples,
    write_triples,
)
from scio_sparql_spark.terms import Term


def test_ntriples_distributed(spark, tmp_path):
    nt = """# a comment
<urn:s:1> <urn:p:name> "Alice" .
<urn:s:1> <urn:p:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
<urn:s:2> <urn:p:name> "Bob\\n." .
_:b1 <urn:p:knows> <urn:s:1> .
<urn:s:3> <urn:p:label> "hola"@es .
"""
    p = tmp_path / "data.nt"
    p.write_text(nt)
    df = read_triples(spark, str(p))
    rows = df.collect()
    assert len(rows) == 5
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["predicate"]["lex"], []).append(r)
    assert by_pred["urn:p:name"][0]["object"]["dt"].endswith("string")
    age = by_pred["urn:p:age"][0]["object"]
    assert age["lex"] == "30" and age["dt"].endswith("integer")
    knows = by_pred["urn:p:knows"][0]
    assert knows["subject"]["kind"] == 0 and knows["subject"]["lex"] == "b1"
    label = by_pred["urn:p:label"][0]["object"]
    assert label["lang"] == "es"
    # and it is queryable
    out = execute_sparql(
        df, 'SELECT ?n WHERE { <urn:s:1> <urn:p:name> ?n }'
    ).collect()
    assert out[0]["n"]["lex"] == "Alice"


def test_nquads(spark, tmp_path):
    nq = """<urn:s:1> <urn:p:a> "x" <urn:g:1> .
<urn:s:1> <urn:p:a> "y" .
"""
    p = tmp_path / "data.nq"
    p.write_text(nq)
    df = read_triples(spark, str(p))
    rows = {(r["object"]["lex"]): r["graph"] for r in df.collect()}
    assert rows["x"]["lex"] == "urn:g:1"
    assert rows["y"] is None


def test_parquet_roundtrip(spark, tmp_path):
    quads = quads_df_from_list(
        spark,
        [
            (Term.iri("urn:s"), Term.iri("urn:p"), Term.integer(5), None),
            (Term.iri("urn:s"), Term.iri("urn:q"), Term.literal("x"), Term.iri("urn:g")),
        ],
    )
    path = str(tmp_path / "quads.parquet")
    write_triples(quads, path)
    back = read_triples(spark, path)
    assert back.count() == 2
    assert sorted(r["predicate"]["lex"] for r in back.collect()) == ["urn:p", "urn:q"]


def test_parquet_predicate_partitioned(spark, tmp_path):
    quads = quads_df_from_list(
        spark,
        [
            (Term.iri(f"urn:s:{i}"), Term.iri(f"urn:p:{i % 3}"), Term.integer(i), None)
            for i in range(30)
        ],
    )
    path = str(tmp_path / "pq")
    write_triples(quads, path, partition_by_predicate=True)
    # layout is one directory per predicate -> scan pruning for
    # predicate-bound patterns
    dirs = [d for d in os.listdir(path) if d.startswith("__pred=")]
    assert len(dirs) == 3
    back = read_triples(spark, path)
    out = execute_sparql(back, "SELECT ?s ?o WHERE { ?s <urn:p:1> ?o }")
    assert out.count() == 10


def test_turtle_multiline_and_escapes(spark):
    ttl = r"""
@prefix : <urn:x:> .
:a :t1 "line\nbreak" ;
   :t2 '''triple
quoted''' ;
   :t3 "quote\"inside" .
"""
    quads = parse_turtle(ttl)
    objs = {q[1].lex.split(":")[-1]: q[2].lex for q in quads}
    assert objs["t1"] == "line\nbreak"
    assert objs["t2"] == "triple\nquoted"
    assert objs["t3"] == 'quote"inside'


def test_turtle_anon_bnode_object(spark):
    ttl = """
@prefix : <urn:x:> .
:a :knows [ :name "Carol" ] .
"""
    quads = parse_turtle(ttl)
    assert len(quads) == 2
    kinds = sorted((q[1].lex, q[2].kind) for q in quads)
    assert kinds[0][1] == 0  # :knows -> bnode object


def test_streaming_ntriples_ingest(spark, tmp_path):
    # readStream.text over a directory of .nt files -> quad micro-batches
    from scio_sparql_spark import read_triples_stream

    d = tmp_path / "ntdir"
    d.mkdir()
    (d / "a.nt").write_text(
        '<urn:s:1> <urn:p:name> "Alice" .\n'
        '<urn:s:2> <urn:p:name> "Bob"@en .\n'
        '<urn:s:2> <urn:p:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    stream = read_triples_stream(spark, str(d))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("nt_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from nt_stream").collect()
    got = {(r["subject"]["lex"], r["predicate"]["lex"], r["object"]["lex"],
            r["object"]["dt"], r["object"]["lang"]) for r in rows}
    assert got == {
        ("urn:s:1", "urn:p:name", "Alice", "http://www.w3.org/2001/XMLSchema#string", None),
        ("urn:s:2", "urn:p:name", "Bob", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en"),
        ("urn:s:2", "urn:p:age", "30", "http://www.w3.org/2001/XMLSchema#integer", None),
    }
