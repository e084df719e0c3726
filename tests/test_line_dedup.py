"""Line-level corpus boilerplate removal (dedup.line_dedup): unit
semantics, the crawl-pipeline composition differential (html_extract
output -> line_dedup vs the DuckDB twin), and chrome-line removal
sanity on the synthesized HTML (nav lines appear in every doc)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from scio_sparql_spark.extras import dedup
from scio_sparql_spark.extras import html as H

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _rows(spark, data, min_docs=2):
    df = spark.createDataFrame(data, "doc_id bigint, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in dedup.line_dedup(df, min_docs=min_docs).collect()
    }


def test_fuzz_line_dedup_matches_python_reference(spark):
    """r15 property fuzz: random multi-doc line structures (repeats
    within docs, trim-collisions, whitespace-only lines, empty docs)
    vs a literal pure-Python re-implementation of the documented
    semantics — the differential locks ENGINE parity; this locks the
    SEMANTICS themselves against an independent model."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    line = st.sampled_from(
        ["chrome", " chrome ", "CHROME", "body", "x y", "", "  ", "\t", "é", "z"]
    )
    doc = st.lists(line, min_size=0, max_size=6).map("\n".join)

    @given(docs=st.lists(doc, min_size=1, max_size=8), min_docs=st.integers(2, 3))
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def check(docs, min_docs):
        rows = [(i, t) for i, t in enumerate(docs)]
        got = _rows(spark, rows, min_docs=min_docs)
        # reference model: key = SPACE-trimmed line (SQL trim strips
        # ASCII spaces only — a tab-only line is an ordinary line, per
        # the documented semantics); count DISTINCT docs per key
        from collections import defaultdict

        trim = lambda s: s.strip(" ")  # noqa: E731
        seen = defaultdict(set)
        for i, t in rows:
            for ln in t.split("\n"):
                if trim(ln):
                    seen[trim(ln)].add(i)
        bl = {k for k, v in seen.items() if len(v) >= min_docs}
        for i, t in rows:
            lines = t.split("\n")
            kept = [ln for ln in lines if not (trim(ln) and trim(ln) in bl)]
            removed = len(lines) - len(kept)
            assert got[i]["text"] == "\n".join(kept), (i, t, got[i])
            assert got[i]["n_lines"] == len(lines)
            assert got[i]["n_removed"] == removed

    check()


def test_shared_lines_removed_unique_kept(spark):
    got = _rows(
        spark,
        [
            (1, "COOKIE BANNER\nreal content one\nfooter"),
            (2, "COOKIE BANNER\nreal content two\nfooter"),
            (3, "COOKIE BANNER\nsomething else"),
        ],
    )
    assert got[1]["text"] == "real content one"
    assert got[2]["text"] == "real content two"
    assert got[3]["text"] == "something else"
    assert got[1]["n_lines"] == 3 and got[1]["n_removed"] == 2
    assert got[3]["n_removed"] == 1


def test_within_doc_repeat_counts_once_but_removes_all(spark):
    got = _rows(
        spark,
        [(1, "dup\ndup\nmine"), (2, "other")],
    )
    # "dup" occurs twice in doc 1 only -> 1 distinct doc < 2 -> kept
    assert got[1]["text"] == "dup\ndup\nmine"
    got2 = _rows(
        spark,
        [(1, "dup\ndup\nmine"), (2, "dup\nother")],
    )
    # now 2 distinct docs -> removed everywhere, both occurrences
    assert got2[1]["text"] == "mine" and got2[1]["n_removed"] == 2
    assert got2[2]["text"] == "other"


def test_trim_keyed_but_lines_kept_verbatim(spark):
    got = _rows(
        spark,
        [(1, "  chrome  \nkeep me"), (2, "chrome\nmine")],
    )
    # "  chrome  " and "chrome" share a trim key -> both removed
    assert got[1]["text"] == "keep me"
    assert got[2]["text"] == "mine"


def test_all_lines_removed_gives_empty_text(spark):
    got = _rows(spark, [(1, "x"), (2, "x"), (3, "x")])
    assert all(got[i]["text"] == "" for i in (1, 2, 3))


def test_pipeline_composition_matches_duckdb(spark):
    """html_extract over the deterministic wrap, then line_dedup —
    compared against the DuckDB twin run on the SAME extracted text.
    The nav chrome ('Home', 'About & Contact') appears in every doc
    and must vanish from all of them."""
    docs = spark.read.parquet(DOCS)
    extracted = H.html_extract(H.wrap_documents_html(docs)).select(
        "doc_id", "text"
    )
    out = dedup.line_dedup(extracted, min_docs=5)
    got = sorted(
        (r["doc_id"], r["text"], r["n_lines"], r["n_removed"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    con.execute(
        "CREATE VIEW extracted AS SELECT doc_id, text FROM ("
        + H.html_extract_oracle_sql(project_text=True)
        + ")"
    )
    have_text = con.execute(
        "SELECT COUNT(*) FROM extracted WHERE text IS NOT NULL"
    ).fetchone()[0]
    assert have_text == 500
    want = sorted(
        (int(r[0]), r[1], int(r[2]), int(r[3]))
        for r in con.execute(
            dedup.line_dedup_oracle_sql(min_docs=5, table="extracted")
        ).fetchall()
    )
    assert got == want
    # chrome really removed: no surviving doc contains the nav lines
    assert all("About & Contact" not in t for _, t, _, _ in got)
    assert any(n_removed >= 3 for _, _, _, n_removed in got)
