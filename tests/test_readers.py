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


def test_streaming_sparql_pattern_match(spark, tmp_path):
    """Streaming SPARQL (beyond-reference, SURVEY §2.10: the reference is
    batch-only Beam): execute_sparql compiles to plain filter/project/
    extend DataFrame ops, so a stateless query — single-pattern BGP +
    FILTER + BIND — runs unchanged over a streaming quad source, each
    file landing in the directory becoming a micro-batch of solutions."""
    from scio_sparql_spark import execute_sparql, read_triples_stream

    d = tmp_path / "ntdir2"
    d.mkdir()
    (d / "a.nt").write_text(
        '<urn:s:1> <urn:p:age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:s:2> <urn:p:age> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:s:3> <urn:p:age> "44"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    stream = read_triples_stream(spark, str(d))
    out = execute_sparql(
        stream,
        """PREFIX : <urn:p:> SELECT ?s ?next WHERE {
             ?s :age ?a . FILTER(?a >= 18) BIND(?a + 1 AS ?next) }""",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sparql_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from sparql_stream").collect()
    got = {(r["s"]["lex"], r["next"]["lex"]) for r in rows}
    assert got == {("urn:s:1", "31"), ("urn:s:3", "45")}


def test_rdfxml(spark, tmp_path):
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:foaf="http://xmlns.com/foaf/0.1/">
  <foaf:Person rdf:about="urn:f:alice" foaf:nick="ally">
    <foaf:name>Alice</foaf:name>
    <foaf:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</foaf:age>
    <foaf:label xml:lang="es">hola</foaf:label>
    <foaf:knows rdf:resource="urn:f:bob"/>
    <foaf:addr rdf:parseType="Resource">
      <foaf:city>Springfield</foaf:city>
    </foaf:addr>
    <foaf:pet>
      <rdf:Description rdf:nodeID="rex">
        <foaf:name>Rex</foaf:name>
      </rdf:Description>
    </foaf:pet>
  </foaf:Person>
</rdf:RDF>
"""
    p = tmp_path / "data.rdf"
    p.write_text(xml)
    df = read_triples(spark, str(p))
    rows = df.collect()
    foaf = "http://xmlns.com/foaf/0.1/"
    # typed node element -> rdf:type triple
    types = [r for r in rows if r["predicate"]["lex"].endswith("#type")]
    assert any(r["object"]["lex"] == foaf + "Person" for r in types)
    preds = {r["predicate"]["lex"]: r for r in rows}
    # property attribute -> string literal
    assert preds[foaf + "nick"]["object"]["lex"] == "ally"
    age = preds[foaf + "age"]["object"]
    assert age["lex"] == "30" and age["dt"].endswith("integer")
    assert preds[foaf + "label"]["object"]["lang"] == "es"
    assert preds[foaf + "knows"]["object"]["lex"] == "urn:f:bob"
    # parseType=Resource and nested node element -> bnode-valued props
    assert preds[foaf + "addr"]["object"]["kind"] == 0
    assert preds[foaf + "pet"]["object"]["kind"] == 0
    names = {r["object"]["lex"] for r in rows if r["predicate"]["lex"] == foaf + "name"}
    assert names == {"Alice", "Rex"}
    # queryable end-to-end: name of whatever alice knows' pet is Rex
    out = execute_sparql(
        df,
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
        "SELECT ?n WHERE { <urn:f:alice> foaf:pet ?b . ?b foaf:name ?n }",
    ).collect()
    assert [r["n"]["lex"] for r in out] == ["Rex"]


def test_turtle_gzip(spark, tmp_path):
    import gzip

    ttl = '@prefix : <urn:x:> .\n:a :name "Zed" ; :age 7 .\n'
    p = tmp_path / "data.ttl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as fh:
        fh.write(ttl)
    df = read_triples(spark, str(p))
    got = {(r["predicate"]["lex"], r["object"]["lex"]) for r in df.collect()}
    assert got == {("urn:x:name", "Zed"), ("urn:x:age", "7")}


def test_ntriples_gzip(spark, tmp_path):
    import gzip

    p = tmp_path / "data.nt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as fh:
        fh.write('<urn:s:1> <urn:p:name> "Alice" .\n')
    df = read_triples(spark, str(p))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["object"]["lex"] == "Alice"


def test_turtle_directory_distributed_bnode_scoping(spark, tmp_path):
    # two files each using the SAME bnode label must not be conflated;
    # parse happens on workers (mapInPandas), never all-quads-on-driver
    d = tmp_path / "ttldir"
    d.mkdir()
    (d / "a.ttl").write_text('@prefix : <urn:x:> .\n_:n :name "A" .\n_:n :age 1 .\n')
    (d / "b.ttl").write_text('@prefix : <urn:x:> .\n_:n :name "B" .\n')
    df = read_triples(spark, str(d / "*.ttl"))
    rows = df.collect()
    assert len(rows) == 3
    subj_of = {r["object"]["lex"]: r["subject"]["lex"] for r in rows
               if r["predicate"]["lex"] == "urn:x:name"}
    assert subj_of["A"] != subj_of["B"]
    # within a file the label is stable: age triple shares A's subject
    age_subj = [r["subject"]["lex"] for r in rows if r["predicate"]["lex"] == "urn:x:age"]
    assert age_subj == [subj_of["A"]]


def test_trig_graph_blocks_distributed(spark, tmp_path):
    trig = """@prefix : <urn:x:> .
:g1 { :a :p "in-g1" . }
{ :a :p "default" . }
"""
    p = tmp_path / "data.trig"
    p.write_text(trig)
    df = read_triples(spark, str(p))
    got = {r["object"]["lex"]: (r["graph"]["lex"] if r["graph"] else None)
           for r in df.collect()}
    assert got == {"in-g1": "urn:x:g1", "default": None}


JSONLD_DOC = """{
  "@context": {
    "ex": "urn:ex:",
    "name": "ex:name",
    "knows": {"@id": "ex:knows", "@type": "@id"},
    "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#integer"}
  },
  "@graph": [
    {"@id": "urn:ex:alice", "@type": "ex:Person",
     "name": "Alice", "age": "30", "knows": "urn:ex:bob",
     "ex:note": {"@value": "hola", "@language": "es"}},
    {"@id": "urn:ex:bob", "name": "Bob", "ex:score": 2.5}
  ]
}"""


def test_jsonld(spark, tmp_path):
    p = tmp_path / "data.jsonld"
    p.write_text(JSONLD_DOC)
    quads = read_triples(spark, str(p))
    df = execute_sparql(
        quads,
        """PREFIX ex: <urn:ex:>
        SELECT ?who ?age WHERE {
          ?s ex:knows ?o ; ex:name ?who ; ex:age ?age . }""",
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["who"]["lex"] == "Alice"
    assert rows[0]["age"]["lex"] == "30"
    assert rows[0]["age"]["dt"].endswith("integer")
    # typed coercion produced an IRI object, not a string literal
    knows = [
        r for r in quads.collect() if r["predicate"]["lex"] == "urn:ex:knows"
    ]
    assert knows[0]["object"]["kind"] == 1  # IRI
    note = [r for r in quads.collect() if r["predicate"]["lex"] == "urn:ex:note"]
    assert note[0]["object"]["lang"] == "es"


def test_jsonld_directory_distributed(spark, tmp_path):
    d = tmp_path / "jsonld_dir"
    d.mkdir()
    for i in range(3):
        (d / f"part{i}.jsonld").write_text(
            '{"@context": {"ex": "urn:ex:"}, "@id": "_:n",'
            f'"ex:val": {i}, "ex:of": {{"@id": "urn:ex:doc{i}"}}}}'
        )
    quads = read_triples(spark, str(d) + "/*.jsonld")
    rows = quads.collect()
    # per-file bnode scoping: _:n in different files stays distinct
    subs = {r["subject"]["lex"] for r in rows if r["predicate"]["lex"] == "urn:ex:val"}
    assert len(subs) == 3
    vals = sorted(
        int(r["object"]["lex"]) for r in rows if r["predicate"]["lex"] == "urn:ex:val"
    )
    assert vals == [0, 1, 2]


def test_n3_reads_as_turtle(spark, tmp_path):
    # rdf4j Rio dispatches .n3 to the Turtle parser family
    # (TriplesReader.scala:63-66); .n3 dumps are Turtle in practice
    p = tmp_path / "data.n3"
    p.write_text('@prefix : <urn:x:> .\n:a :p "v" ; :q 2 .\n')
    df = read_triples(spark, str(p))
    got = {(r["predicate"]["lex"], r["object"]["lex"]) for r in df.collect()}
    assert got == {("urn:x:p", "v"), ("urn:x:q", "2")}


def test_bzip2_turtle(spark, tmp_path):
    import bz2

    ttl = '@prefix : <urn:x:> .\n:a :p "one" .\n:b :p "two" .\n'
    p = tmp_path / "data.ttl.bz2"
    p.write_bytes(bz2.compress(ttl.encode()))
    df = read_triples(spark, str(p))
    got = sorted(r["object"]["lex"] for r in df.collect())
    assert got == ["one", "two"]


def test_bzip2_ntriples_distributed(spark, tmp_path):
    import bz2

    nt = "\n".join(f'<urn:s:{i}> <urn:p:n> "{i}" .' for i in range(100)) + "\n"
    p = tmp_path / "data.nt.bz2"
    p.write_bytes(bz2.compress(nt.encode()))
    df = read_triples(spark, str(p))
    assert df.count() == 100


def test_trix(spark, tmp_path):
    trix = """<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <uri>urn:g:1</uri>
    <triple>
      <uri>urn:s:1</uri>
      <uri>urn:p:name</uri>
      <plainLiteral xml:lang="en">Alice</plainLiteral>
    </triple>
    <triple>
      <uri>urn:s:1</uri>
      <uri>urn:p:age</uri>
      <typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">30</typedLiteral>
    </triple>
  </graph>
  <graph>
    <triple>
      <id>b0</id>
      <uri>urn:p:knows</uri>
      <uri>urn:s:1</uri>
    </triple>
  </graph>
</TriX>
"""
    p = tmp_path / "data.trix"
    p.write_text(trix)
    df = read_triples(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    by_pred = {r["predicate"]["lex"]: r for r in rows}
    assert by_pred["urn:p:name"]["graph"]["lex"] == "urn:g:1"
    assert by_pred["urn:p:name"]["object"]["lang"] == "en"
    assert by_pred["urn:p:age"]["object"]["dt"].endswith("integer")
    knows = by_pred["urn:p:knows"]
    assert knows["graph"] is None and knows["subject"]["kind"] == 0


def test_trix_pretty_printed_and_bnode_graph(spark, tmp_path):
    """ADVICE r3: indented TriX (rdf4j's Rio writer pretty-prints) must
    not leak whitespace into IRIs/bnode labels, literal text must stay
    verbatim, and an <id> graph label (bnode-named graph) is accepted."""
    trix = """<?xml version="1.0"?>
<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
  <graph>
    <id>
      g0
    </id>
    <triple>
      <uri>
        urn:s:1
      </uri>
      <uri>
        urn:p:name
      </uri>
      <plainLiteral>  spaced  </plainLiteral>
    </triple>
  </graph>
</TriX>
"""
    p = tmp_path / "pretty.trix"
    p.write_text(trix)
    row = read_triples(spark, str(p)).collect()[0]
    assert row["subject"]["lex"] == "urn:s:1"
    assert row["predicate"]["lex"] == "urn:p:name"
    assert row["object"]["lex"] == "  spaced  "  # literal ws is data
    assert row["graph"]["kind"] == 0 and row["graph"]["lex"].endswith("g0")


def test_unsupported_extension_clear_error(spark, tmp_path):
    import pytest

    p = tmp_path / "data.brf"
    p.write_text("")
    with pytest.raises(ValueError, match="supported extensions"):
        read_triples(spark, str(p))


def test_streaming_sparql_aggregation(spark, tmp_path):
    """Continuous SPARQL aggregation: a GROUP BY query compiles to a
    plain streaming-compatible groupBy().agg(), so it runs over a live
    quad stream under outputMode=complete — per-micro-batch updated
    aggregates with no engine changes (the reference is batch-only)."""
    from scio_sparql_spark import execute_sparql, read_triples_stream

    d = tmp_path / "ntagg"
    d.mkdir()
    (d / "a.nt").write_text(
        '<urn:s:1> <urn:p:t> "x" .\n'
        '<urn:s:2> <urn:p:t> "x" .\n'
        '<urn:s:3> <urn:p:t> "y" .\n'
    )
    stream = read_triples_stream(spark, str(d))
    out = execute_sparql(
        stream,
        "PREFIX : <urn:p:> SELECT ?t (COUNT(?s) AS ?n) "
        "WHERE { ?s :t ?t } GROUP BY ?t",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("agg_stream_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["t"]["lex"]: int(r["n"]["lex"])
        for r in spark.sql("select * from agg_stream_t").collect()
    }
    assert got == {"x": 2, "y": 1}


def test_ntriples_writer_roundtrip(spark, tmp_path):
    """write_triples_nt -> read_triples loses nothing: IRIs, bnodes,
    plain/typed/lang literals, and escaped characters survive; the NQ
    form keeps graph labels, the NT form flattens them."""
    from scio_sparql_spark import (
        parse_turtle,
        quads_df_from_list,
        read_triples,
        write_triples_nt,
    )
    from scio_sparql_spark.terms import Term

    ttl = r'''
    @prefix : <urn:w:> .
    :a :name "line\nbreak\ttab \"q\" \\ back" ;
       :age 41 ;
       :label "hola"@es .
    _:b :knows :a .
    '''
    quads = quads_df_from_list(spark, parse_turtle(ttl))
    # add one named-graph quad
    g = quads_df_from_list(
        spark,
        [(Term.iri("urn:w:x"), Term.iri("urn:w:p"), Term.integer(7), Term.iri("urn:w:g"))],
    )
    store = quads.unionByName(g)

    def key(df):
        return sorted(
            (tuple(r["subject"] or ()), tuple(r["predicate"]), tuple(r["object"]),
             tuple(r["graph"]) if r["graph"] else None)
            for r in df.collect()
        )

    nq = str(tmp_path / "out_nq")
    write_triples_nt(store, nq, quads=True)
    import os, shutil
    # read back via .nq path convention (single concatenated file)
    nq_file = str(tmp_path / "all.nq")
    with open(nq_file, "w") as out:
        for p in sorted(os.listdir(nq)):
            if p.startswith("part-"):
                out.write(open(os.path.join(nq, p)).read())
    assert key(read_triples(spark, nq_file)) == key(store)

    nt = str(tmp_path / "out_nt")
    write_triples_nt(store, nt, quads=False)
    # batch read_triples(dir) means parquet store; concatenate the text
    # parts into one .nt file (the streaming reader covers the dir form)
    nt_file = str(tmp_path / "all.nt")
    with open(nt_file, "w") as out:
        for p in sorted(os.listdir(nt)):
            if p.startswith("part-"):
                out.write(open(os.path.join(nt, p)).read())
    flattened = store.withColumn("graph", F.lit(None).cast(store.schema["graph"].dataType))
    assert key(read_triples(spark, nt_file)) == key(flattened)


def test_turtle_writer_roundtrip(spark):
    """to_turtle -> parse_turtle loses nothing: prefix compression,
    'a' for rdf:type, bare canonical numerics/booleans, lang/typed
    literals, bnodes, and escapes all survive; graph labels flatten."""
    from scio_sparql_spark import parse_turtle, quads_df_from_list, to_turtle

    ttl = r'''
    @prefix ex: <urn:ex:> .
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    ex:a rdf:type ex:Widget ;
         ex:n 42 ;
         ex:d 3.25 ;
         ex:flag true ;
         ex:note "hi\nthere" ;
         ex:label "hola"@es ;
         ex:odd "01"^^<http://www.w3.org/2001/XMLSchema#integer> .
    _:b ex:knows ex:a .
    '''
    quads = quads_df_from_list(spark, parse_turtle(ttl))
    doc = to_turtle(quads, prefixes={"ex": "urn:ex:"})
    assert "ex:a a ex:Widget" in doc.replace("\n    ", " ")
    assert "ex:n 42" in doc       # bare integer
    assert "ex:odd 01" in doc     # Turtle INTEGER allows leading zeros:
    #                               bare form preserves the exact lexical
    back = quads_df_from_list(spark, parse_turtle(doc))

    def key(df):
        rows = []
        for r in df.collect():
            s = tuple(r["subject"]) if r["subject"][0] != 0 else ("bnode",)
            rows.append(repr((s, tuple(r["predicate"]), tuple(r["object"]))))
        return sorted(rows)

    assert key(back) == key(quads)


def test_trig_writer_roundtrip(spark, tmp_path):
    """to_trig preserves named graphs: write the document to a .trig
    file and read_triples must reproduce the exact quad set."""
    from scio_sparql_spark import to_trig

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri("urn:t:a"), Term.iri("urn:t:p"), Term.integer(1), None),
            (Term.iri("urn:t:a"), Term.iri("urn:t:q"), Term.literal("x"), Term.iri("urn:t:g1")),
            (Term.iri("urn:t:b"), Term.iri("urn:t:p"), Term.literal("hola", lang="es"), Term.iri("urn:t:g1")),
            (Term.iri("urn:t:c"), Term.iri("urn:t:p"), Term.integer(2), Term.iri("urn:t:g2")),
        ],
    )
    doc = to_trig(quads, prefixes={"t": "urn:t:"})
    assert "<urn:t:g1> {" in doc and "<urn:t:g2> {" in doc
    p = tmp_path / "out.trig"
    p.write_text(doc)
    back = read_triples(spark, str(p))

    def key(df):
        return sorted(
            repr((tuple(r["subject"]), tuple(r["predicate"]), tuple(r["object"]),
                  tuple(r["graph"]) if r["graph"] else None))
            for r in df.collect()
        )

    assert key(back) == key(quads)


def test_jsonld_writer_roundtrip(spark, tmp_path):
    """to_jsonld (expanded form) -> parse_jsonld reproduces the exact
    quad set: IRIs, bnodes, typed/lang/plain literals, named graphs,
    and JSON-special characters in literals."""
    from scio_sparql_spark import parse_jsonld, to_jsonld

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri("urn:j:a"), Term.iri("urn:j:p"), Term.integer(7), None),
            (Term.iri("urn:j:a"), Term.iri("urn:j:q"), Term.literal('say "hi"\n'), None),
            (Term.iri("urn:j:a"), Term.iri("urn:j:r"), Term.iri("urn:j:b"), None),
            (Term.bnode("n1"), Term.iri("urn:j:p"), Term.literal("hola", lang="es"), None),
            (Term.iri("urn:j:c"), Term.iri("urn:j:p"), Term.integer(9), Term.iri("urn:j:g")),
        ],
    )
    doc = to_jsonld(quads)
    back = quads_df_from_list(spark, parse_jsonld(doc))

    def key(df):
        # bnode labels may be file-scope-prefixed on re-read; identity
        # is structural, so normalize them
        def t(x):
            return ("bnode",) if x is not None and x[0] == 0 else tuple(x or ())

        return sorted(
            repr((t(r["subject"]), tuple(r["predicate"]), t(r["object"]),
                  tuple(r["graph"]) if r["graph"] else None))
            for r in df.collect()
        )

    assert key(back) == key(quads)
    # and the .jsonld file path round-trips through read_triples
    p = tmp_path / "out.jsonld"
    p.write_text(doc)
    assert key(read_triples(spark, str(p))) == key(quads)


def test_trix_writer_roundtrip(spark, tmp_path):
    """to_trix -> parse_trix reproduces the exact quad set: IRIs,
    bnodes (as terms AND as graph labels), typed/lang/plain literals,
    XML-special characters, named + default graphs."""
    from scio_sparql_spark import to_trix
    from scio_sparql_spark.sources.rio import parse_trix

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri("urn:x:a"), Term.iri("urn:x:p"), Term.integer(7), None),
            (Term.iri("urn:x:a"), Term.iri("urn:x:q"),
             Term.literal('<&> "quotes"'), None),
            (Term.bnode("n1"), Term.iri("urn:x:p"),
             Term.literal("hola", lang="es"), None),
            (Term.iri("urn:x:c"), Term.iri("urn:x:p"), Term.integer(9),
             Term.iri("urn:x:g")),
            (Term.iri("urn:x:d"), Term.iri("urn:x:p"), Term.iri("urn:x:e"),
             Term.bnode("gb")),
        ],
    )
    doc = to_trix(quads)
    back = quads_df_from_list(spark, parse_trix(doc))

    def key(df):
        def t(x):
            return ("bnode",) if x is not None and x[0] == 0 else tuple(x or ())

        return sorted(
            repr((t(r["subject"]), tuple(r["predicate"]), t(r["object"]),
                  t(r["graph"]) if r["graph"] else None))
            for r in df.collect()
        )

    assert key(back) == key(quads)
    # and the .trix file path round-trips through read_triples
    p = tmp_path / "out.trix"
    p.write_text(doc)
    assert key(read_triples(spark, str(p))) == key(quads)


def test_rdfxml_writer_roundtrip(spark, tmp_path):
    """to_rdfxml -> parse_rdfxml reproduces the triple set (graphs
    flattened per the format's own model): rdf:about/resource/nodeID,
    rdf:datatype, xml:lang, XML escaping, multi-namespace predicates."""
    import pytest as _pytest

    from scio_sparql_spark import to_rdfxml
    from scio_sparql_spark.sources.rio import parse_rdfxml

    quads = quads_df_from_list(
        spark,
        [
            (Term.iri("urn:a"), Term.iri("http://ex.org/v#p"), Term.integer(7), None),
            (Term.iri("urn:a"), Term.iri("http://ex.org/v#q"),
             Term.literal('x < y & "z"'), None),
            (Term.iri("urn:a"), Term.iri("http://other.org/w#r"),
             Term.iri("urn:b"), None),
            (Term.bnode("n1"), Term.iri("http://ex.org/v#p"),
             Term.literal("bonjour", lang="fr"), None),
            (Term.iri("urn:a"), Term.iri("http://ex.org/v#s"),
             Term.bnode("n1"), None),
        ],
    )
    doc = to_rdfxml(quads)
    back = quads_df_from_list(spark, parse_rdfxml(doc))

    def key(df):
        def t(x):
            return ("bnode",) if x is not None and x[0] == 0 else tuple(x or ())

        return sorted(
            repr((t(r["subject"]), tuple(r["predicate"]), t(r["object"])))
            for r in df.collect()
        )

    assert key(back) == key(quads)
    # the .rdf file path round-trips through read_triples too
    p = tmp_path / "out.rdf"
    p.write_text(doc)
    assert key(read_triples(spark, str(p))) == key(quads)
    # an unqualifiable predicate (no NCName suffix) raises, naming it
    bad = quads_df_from_list(
        spark,
        [(Term.iri("urn:a"), Term.iri("http://ex.org/123"), Term.integer(1), None)],
    )
    with _pytest.raises(ValueError, match="ex.org/123"):
        to_rdfxml(bad)
