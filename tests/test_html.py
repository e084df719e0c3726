"""HTML -> text extraction (extras/html.py): unit semantics, the
wrap∘extract DuckDB differential, and the WARC -> extract pipeline
composition."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from scio_sparql_spark.extras import html as H

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _extract_one(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    return H.html_extract(df).collect()[0].asDict()


def test_script_style_comment_content_dropped(spark):
    r = _extract_one(
        spark,
        "<html><head><style>p { color: red }</style>"
        "<script>if (1 < 2) alert('hi');</script></head>"
        "<body><!-- secret -->Hello <b>world</b></body></html>",
    )
    assert r["text"] == "Hello world"
    assert "secret" not in r["text"] and "alert" not in r["text"]


def test_block_tags_become_newlines_and_entities_decode(spark):
    r = _extract_one(
        spark,
        "<p>a &amp; b</p><p>c &lt;tag&gt; d</p><div>e&nbsp;f</div>",
    )
    assert r["text"] == "a & b\nc <tag> d\ne f"


def test_double_escaped_entity_not_reinterpreted(spark):
    # &amp;lt; means the TEXT "&lt;" — decoding &amp; last keeps it
    r = _extract_one(spark, "<p>&amp;lt;literal&amp;gt;</p>")
    assert r["text"] == "&lt;literal&gt;"


def test_non_tag_angle_brackets_survive(spark):
    r = _extract_one(spark, "<p>i <3 math: 1 < 2 and x > y</p>")
    assert r["text"] == "i <3 math: 1 < 2 and x > y"


def test_unclosed_script_is_conservative(spark):
    # truncated crawl payload: unclosed container falls through to the
    # generic tag strip; its TEXT survives rather than eating the rest
    # of the document
    r = _extract_one(spark, "<script>var x = 1;<p>kept text</p>")
    assert "kept text" in r["text"]


def test_br_and_whitespace_normalization(spark):
    r = _extract_one(
        spark, "<p>line1<br>line2<br/>   line3  \t x</p>\n\n<p>  </p>"
    )
    assert r["text"] == "line1\nline2\nline3 x"


def test_signals_counts(spark):
    r = _extract_one(
        spark,
        '<div><a href="/x">one</a> <a href="/y">two</a><span>s</span></div>',
    )
    assert r["n_links"] == 2
    # <div>, <a>, </a>, <a>, </a>, <span>, </span>, </div>
    assert r["n_tags"] == 8
    assert r["n_text_chars"] == len("one two s")
    assert 0 < r["density_micro"] < 1_000_000


def test_fuzz_extraction_chain_matches_duckdb(spark):
    """r15 adversarial differential: the bare extraction chain
    (html_to_text_expr vs html_to_text_sql) over pathological markup —
    nested/unclosed containers, split tags, entity-in-entity, junk
    brackets — must produce identical strings in both engines. The
    500-doc differential covers the deterministic wrap shapes; THIS
    covers the shapes a real crawl throws (RE2 vs Java regex parity is
    exactly where silent divergence would live)."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    pieces = st.lists(
        st.sampled_from(
            [
                "<p>", "</p>", "<div >", "</div>", "<br/>", "<br >",
                "<script>", "</script>", "<script src='x'>", "<style>",
                "</style>", "<!--", "-->", "<!DOCTYPE html>", "<a\nhref='x'>",
                "</a>", "<a/>", "&amp;lt;", "&amp;", "&lt;", "&nbsp;",
                "&#39;", "<3", "a < b", ">", "x y", "\tz", "\r\n", "\n",
                "word", "<SCRIPT>var x;</SCRIPT>", "<unclosed", "<i",
                "<table><tr><td>c</td></tr></table>", "é¿", " ",
                # r16 (ADVICE r15): vertical tab — Java \s matches it,
                # RE2's does not; the chain spells its classes out
                "</p\x0b>", "<br\x0b>", "\x0b", "</script\x0b>",
            ]
        ),
        min_size=1,
        max_size=12,
    )

    @given(parts=pieces)
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def check(parts):
        doc = "".join(parts)
        df = spark.createDataFrame([(doc,)], "html string")
        got = df.select(H.html_to_text_expr(F.col("html")).alias("t")).first()["t"]
        want = duckdb.execute(
            f"SELECT {H.html_to_text_sql('html')} FROM (SELECT ? AS html)",
            [doc],
        ).fetchone()[0]
        assert got == want, (doc, got, want)

    check()


def test_n_links_counts_multiline_and_selfclosing_anchors(spark):
    """r15 (ADVICE r14): anchors written as '<a\\nhref=...>' or '<a/>'
    count toward link density like plain '<a href=...>' does."""
    r = _extract_one(spark, '<p><a\nhref="/x">one</a> and <a/> and <a href="/y">t</a></p>')
    assert r["n_links"] == 3


def test_n_links_vertical_tab_matches_duckdb(spark):
    """r16 (ADVICE r15): the anchor pattern spells its whitespace set
    explicitly as [ \\t\\n\\f\\r>/] — Java's \\s includes vertical tab
    U+000B, RE2's does not, so the old [\\s>/] silently diverged on
    '<a\\x0B...' input. Both engines must now agree (and agree on the
    RE2 semantics: a \\x0B-split anchor does NOT count)."""
    doc = '<p><a\x0bhref="/x">v</a> <a href="/y">y</a> <a\thref="/z">z</a></p>'
    pat = r"(?is)<a[ \t\n\f\r>/]"
    got = (
        spark.createDataFrame([(doc,)], "html string")
        .select(
            F.size(
                F.regexp_extract_all(F.col("html"), F.lit(pat), F.lit(0))
            ).alias("n")
        )
        .first()["n"]
    )
    want = duckdb.execute(
        "SELECT len(regexp_extract_all(html, '(?is)<a[ \\t\\n\\f\\r>/]'))"
        " FROM (SELECT ? AS html)",
        [doc],
    ).fetchone()[0]
    assert got == want == 2


def test_wrap_extract_matches_duckdb_oracle(spark):
    """The r14 slot-dry differential: deterministic HTML wrap + the
    full extraction chain replayed in DuckDB — digests of the FULL
    extracted text plus every signal column, bit-for-bit."""
    docs = spark.read.parquet(DOCS)
    out = H.html_extract(H.wrap_documents_html(docs))
    got = sorted(
        (
            r["doc_id"],
            r["digest"],
            r["n_links"],
            r["n_tags"],
            r["n_html_chars"],
            r["n_text_chars"],
            r["density_micro"],
        )
        for r in out.select(
            "doc_id",
            F.md5("text").alias("digest"),
            "n_links",
            "n_tags",
            "n_html_chars",
            "n_text_chars",
            "density_micro",
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    want = sorted(
        (int(r[0]), r[1], int(r[2]), int(r[3]), int(r[4]), int(r[5]), int(r[6]))
        for r in con.execute(H.html_extract_oracle_sql()).fetchall()
    )
    assert len(got) == 500
    assert got == want


def test_warc_to_text_pipeline(spark, tmp_path):
    """Crawl-pipeline composition: HTML docs -> write_warc archives ->
    read_warc -> decode payload -> html_extract equals extracting the
    same HTML directly (the stage boundary loses nothing)."""
    from scio_sparql_spark.sources import warc

    docs = spark.read.parquet(DOCS).limit(50)
    wrapped = H.wrap_documents_html(docs)
    direct = {
        r["doc_id"]: r["digest"]
        for r in H.html_extract(wrapped)
        .select("doc_id", F.md5("text").alias("digest"))
        .collect()
    }
    records = wrapped.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("record_id"),
        F.concat(F.lit("http://ex.org/doc/"), F.col("doc_id")).alias(
            "target_uri"
        ),
        F.encode(F.col("html"), "UTF-8").alias("payload"),
    )
    out_dir = str(tmp_path / "arcs")
    warc.write_warc_archives(records, out_dir, shards=3).count()
    back = warc.read_warc(spark, out_dir + "/*.warc*")
    got_html = back.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("html"),
    )
    got = {
        r["doc_id"]: r["digest"]
        for r in H.html_extract(got_html)
        .select("doc_id", F.md5("text").alias("digest"))
        .collect()
    }
    assert got == direct


def test_empty_and_null_html(spark):
    df = spark.createDataFrame([(1, ""), (2, None)], "doc_id int, html string")
    rows = {r["doc_id"]: r.asDict() for r in H.html_extract(df).collect()}
    assert rows[1]["text"] == "" and rows[1]["density_micro"] == 0
    assert rows[2]["text"] is None
