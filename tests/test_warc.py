"""WARC source tests: pure-Python parser/writer roundtrip, the Spark
reader over plain and per-record-gzip archives, malformed handling,
and a DuckDB differential over the payload digests (the slot-dry
discipline: the oracle lives IN the test when no driver slot is
free)."""

import gzip

import duckdb
import pytest
from pyspark.sql import functions as F

from scio_sparql_spark.sources import warc

SF = "/root/testdata/sf0.001"


def _response_record(uri: str, body: bytes, rec_id: str) -> dict:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
    return {
        "headers": {
            "WARC-Type": "response",
            "WARC-Record-ID": rec_id,
            "WARC-Target-URI": uri,
            "Content-Type": "application/http; msgtype=response",
        },
        "content": http,
    }


def test_warc_parse_write_roundtrip_and_strictness():
    recs = [
        _response_record("http://a", b"hello world", "<urn:uuid:1>"),
        {
            "headers": {"WARC-Type": "warcinfo", "Content-Type": "application/warc-fields"},
            "content": b"software: test\r\n",
        },
        _response_record("http://b", b"\x00\xffbinary\r\n\r\nstuff", "<urn:uuid:2>"),
    ]
    data = warc.write_warc(recs)
    back = warc.parse_warc(data)
    assert len(back) == 3
    assert back[0]["version"] == "WARC/1.1"
    assert [r["content"] for r in back] == [r["content"] for r in recs]
    assert back[2]["headers"]["WARC-Target-URI"] == "http://b"
    # wrong magic -> unusable
    assert warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n") is None
    # truncated tail: good prefix kept (missing final CRLF CRLF)
    assert len(warc.parse_warc(data[:-2])) == 2
    # corrupted Content-Length ends the parse at that record
    import re

    bad = re.sub(rb"Content-Length: \d+", b"Content-Length: 9999", data, count=1)
    assert bad != data and len(warc.parse_warc(bad)) == 0


def test_warc_http_split():
    s, b = warc.split_http_response(b"HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nnope")
    assert (s, b) == (404, b"nope")
    s, b = warc.split_http_response(b"not http at all")
    assert s is None and b == b"not http at all"
    s, b = warc.split_http_response(b"HTTP/1.1 banana\r\n\r\nx")
    assert s is None


def test_read_warc_plain_gz_and_corrupt_files(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40).collect()
    recs = [
        _response_record(
            f"http://corpus/{r['doc_id']}",
            r["text"].encode(),
            f"<urn:doc:{r['doc_id']}>",
        )
        for r in docs
        if r["text"] is not None
    ]
    half = len(recs) // 2
    d = tmp_path / "archives"
    d.mkdir()
    (d / "a.warc").write_bytes(warc.write_warc(recs[:half]))
    # standard .warc.gz: one gzip MEMBER per record, concatenated
    gz = b"".join(gzip.compress(warc.write_warc([r])) for r in recs[half:])
    (d / "b.warc.gz").write_bytes(gz)
    (d / "c.warc").write_bytes(b"garbage not a warc")          # dropped whole
    (d / "d.warc.gz").write_bytes(b"\x1f\x8b\x08corrupt")      # dropped whole
    out = warc.read_warc(spark, str(d)).filter(F.col("warc_type") == "response")
    rows = out.collect()
    assert len(rows) == len(recs)
    assert {r["http_status"] for r in rows} == {200}
    got = {r["target_uri"]: bytes(r["payload"]) for r in rows}
    want = {
        f"http://corpus/{r['doc_id']}": r["text"].encode()
        for r in docs
        if r["text"] is not None
    }
    assert got == want
    # n_bytes is the PAYLOAD length (http headers stripped)
    assert all(r["n_bytes"] == len(got[r["target_uri"]]) for r in rows)


def test_stream_warc_equals_batch(spark, tmp_path):
    """Streaming == batch for crawl ingest: the bounded replay of the
    archive directory through stream_warc yields exactly read_warc's
    record rows."""
    from scio_sparql_spark.sources.warc import read_warc, stream_warc
    from scio_sparql_spark.streaming.bounded import run_bounded

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30).collect()
    recs = [
        _response_record(f"u{r['doc_id']}", r["text"].encode(), f"<{r['doc_id']}>")
        for r in docs
        if r["text"] is not None
    ]
    d = tmp_path / "stream_archives"
    d.mkdir()
    (d / "a.warc").write_bytes(warc.write_warc(recs[:10]))
    (d / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(warc.write_warc([r])) for r in recs[10:])
    )

    def rows(df):
        return sorted(
            (r["target_uri"], r["http_status"], bytes(r["payload"]))
            for r in df.select("target_uri", "http_status", "payload").collect()
        )

    got = rows(run_bounded(stream_warc(spark, str(d)), shuffle_partitions=4))
    assert got == rows(read_warc(spark, str(d)))
    assert len(got) == len(recs)


def test_stream_warc_extraction_equals_batch(spark, tmp_path):
    """r15 streaming==batch for the crawl TEXT stage: html_to_text_expr
    is stateless, so the extraction chain composes onto stream_warc
    unchanged — the bounded replay of archive->extract yields exactly
    the batch read->extract rows (the continuous-ingest form of the
    docs_html_extract gate's map-only stage)."""
    from pyspark.sql import functions as F

    from scio_sparql_spark.extras import html as H
    from scio_sparql_spark.sources.warc import read_warc, stream_warc
    from scio_sparql_spark.streaming.bounded import run_bounded

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    pages = H.wrap_documents_html(docs).collect()
    recs = [
        _response_record(f"u{r['doc_id']}", r["html"].encode(), f"<{r['doc_id']}>")
        for r in pages
    ]
    d = tmp_path / "stream_html"
    d.mkdir()
    (d / "a.warc").write_bytes(warc.write_warc(recs))

    def extract(df):
        return df.select(
            "target_uri",
            H.html_to_text_expr(F.decode("payload", "UTF-8")).alias("text"),
        )

    def rows(df):
        return sorted((r["target_uri"], r["text"]) for r in df.collect())

    got = rows(run_bounded(extract(stream_warc(spark, str(d))), shuffle_partitions=4))
    want = rows(extract(read_warc(spark, str(d))))
    assert got == want and len(got) == 20
    # the extraction really ran (chrome stripped, text kept)
    assert all("<p>" not in t and t for _, t in got)


def test_read_warc_duckdb_differential(spark, tmp_path):
    """Ingest differential: md5 digests of the payloads Spark read out
    of the archive == DuckDB's digests of the source documents — the
    whole write->archive->read path preserves every byte."""
    docs_path = f"{SF}/documents.parquet"
    docs = spark.read.parquet(docs_path).collect()
    recs = [
        _response_record(f"u{r['doc_id']}", r["text"].encode(), f"<{r['doc_id']}>")
        for r in docs
        if r["text"] is not None
    ]
    p = tmp_path / "x.warc"
    p.write_bytes(warc.write_warc(recs))
    got = sorted(
        (r["target_uri"], r["digest"])
        for r in warc.read_warc(spark, str(p))
        .select("target_uri", F.md5("payload").alias("digest"))
        .collect()
    )
    want = sorted(
        (f"u{i}", h)
        for i, h in duckdb.sql(
            f"SELECT doc_id, md5(text) FROM read_parquet('{docs_path}') "
            "WHERE text IS NOT NULL"
        ).fetchall()
    )
    assert got == want


def test_write_wet_conversion_archives(spark, tmp_path):
    """r15 WET egress: record_type='conversion' writes extracted text
    bare (no HTTP wrapper) into part-*.warc.wet.gz files — the
    CommonCrawl WET layout — and the same strict reader + CDX
    range-split path round-trips it byte-for-byte (payload == text,
    http_status NULL, warc_type 'conversion')."""
    import os

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    src = docs.select(
        F.concat(F.lit("<urn:doc:"), "doc_id", F.lit(">")).alias("record_id"),
        F.concat(F.lit("u"), "doc_id").alias("target_uri"),
        F.col("text").cast("binary").alias("payload"),
    )
    want = sorted(
        (r["record_id"], bytes(r["payload"])) for r in src.collect()
    )
    d = tmp_path / "wet"
    cdx_rows = warc.write_warc_archives(
        src, str(d), shards=3, record_type="conversion"
    )
    cdx_path = str(tmp_path / "cdx")
    cdx_rows.write.parquet(cdx_path)
    files = sorted(os.listdir(d))
    assert len(files) == 3 and all(f.endswith(".warc.wet.gz") for f in files)

    for read in (
        warc.read_warc(spark, str(d)),
        warc.read_warc(spark, str(d), cdx=spark.read.parquet(cdx_path)),
    ):
        got = sorted(
            (r["record_id"], bytes(r["payload"]))
            for r in read.collect()
        )
        assert got == want
        one = read.limit(1).collect()[0]
        assert one["warc_type"] == "conversion"
        assert one["http_status"] is None
        assert one["content_type"] == "text/plain"

    # bad record_type fails loudly
    import pytest

    with pytest.raises(ValueError, match="record_type"):
        warc.write_warc_archives(src, str(d), record_type="wet")

    # r16 (ADVICE r15): writing the OTHER record type into this
    # directory must refuse, not silently unlink the .warc.wet shards
    with pytest.raises(ValueError, match="mix record types"):
        warc.write_warc_archives(src, str(d), record_type="response")
    assert sorted(os.listdir(d)) == files  # nothing deleted

    # and the stale-shard cleanup still clears SAME-type shards: a
    # re-run with fewer shards leaves no orphans behind
    warc.write_warc_archives(
        src, str(d), shards=2, record_type="conversion"
    ).count()
    assert len(os.listdir(d)) == 2


def test_write_warc_archives_and_cdx_split_read(spark, tmp_path):
    """r14 CDX sidecar: the distributed writer's offsets are exact —
    a range-split read over the sidecar equals the whole-archive read
    row-for-row, for both .warc.gz (per-record gzip members) and plain
    .warc, even when the ranges spread over many more tasks than there
    are archives (the fat-archive case the sidecar exists for)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    src = docs.select(
        F.concat(F.lit("<urn:doc:"), "doc_id", F.lit(">")).alias("record_id"),
        F.concat(F.lit("u"), "doc_id").alias("target_uri"),
        F.col("text").cast("binary").alias("payload"),
    )
    n_docs = src.count()

    def rows(df):
        return sorted(
            (r["record_id"], r["target_uri"], r["http_status"], bytes(r["payload"]))
            for r in df.select(
                "record_id", "target_uri", "http_status", "payload"
            ).collect()
        )

    for compress in (True, False):
        d = tmp_path / ("gz" if compress else "plain")
        cdx = warc.write_warc_archives(
            src, str(d), shards=3, compress=compress
        ).collect()
        assert len(cdx) == n_docs
        import os

        files = sorted(os.listdir(d))
        assert len(files) == 3 and all(f.startswith("part-") for f in files)
        # offsets tile each archive exactly: contiguous, gap-free
        by_path = {}
        for r in cdx:
            by_path.setdefault(r["path"], []).append((r["offset"], r["length"]))
        for p, ranges in by_path.items():
            ranges.sort()
            pos = 0
            for o, ln in ranges:
                assert o == pos
                pos += ln
            assert pos == os.path.getsize(p)
        whole = rows(warc.read_warc(spark, str(d)))
        cdx_df = spark.createDataFrame(cdx, warc.CDX_SCHEMA)
        split = rows(warc.read_warc(spark, str(d), cdx=cdx_df))
        assert split == whole
        assert len(whole) == n_docs
        assert {r[2] for r in whole} == {200}
        # payloads survived byte-exactly
        want = sorted(
            (f"<urn:doc:{r['doc_id']}>", f"u{r['doc_id']}", 200, r["text"].encode())
            for r in docs.collect()
        )
        assert whole == want
    # re-running the writer (retry/bench-rep case) is idempotent
    d = tmp_path / "gz"
    again = warc.write_warc_archives(src, str(d), shards=3).collect()
    assert len(again) == n_docs
    assert rows(warc.read_warc(spark, str(d))) == rows(
        warc.read_warc(spark, str(d), cdx=spark.createDataFrame(again, warc.CDX_SCHEMA))
    )


# --- hypothesis fuzz (pure-Python layer: no Spark session) -----------------

from hypothesis import given, settings, strategies as st

_content = st.binary(min_size=0, max_size=300)
_uri = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=":"),
    min_size=1,
    max_size=20,
)


@st.composite
def _records(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    recs = []
    for i in range(n):
        body = draw(_content)
        kind = draw(st.sampled_from(["response", "request", "warcinfo", "metadata"]))
        headers = {
            "WARC-Type": kind,
            "WARC-Record-ID": f"<urn:uuid:{i}>",
        }
        if draw(st.booleans()):
            headers["WARC-Target-URI"] = "http://x/" + draw(_uri)
        if kind == "response" and draw(st.booleans()):
            status = draw(st.integers(min_value=100, max_value=599))
            headers["Content-Type"] = "application/http; msgtype=response"
            body = b"HTTP/1.1 %d X\r\nH: v\r\n\r\n" % status + body
        recs.append({"headers": headers, "content": body})
    return recs


@given(recs=_records())
@settings(max_examples=60, deadline=None)
def test_fuzz_warc_write_parse_roundtrip(recs):
    """write -> parse is the identity on headers+content for ARBITRARY
    binary bodies (including bodies containing CRLFCRLF and WARC/
    magic), and the record count survives a gzip member chain."""
    data = warc.write_warc(recs)
    back = warc.parse_warc(data)
    assert len(back) == len(recs)
    for want, got in zip(recs, back):
        assert got["content"] == want["content"]
        for k, v in want["headers"].items():
            assert got["headers"][k] == str(v)
    # per-record gzip members (the .warc.gz layout) decompress to the
    # same concatenation
    members = b"".join(
        gzip.compress(warc.write_warc([r])) for r in recs
    )
    assert warc.gunzip_members(members) == data
    # offsets tile exactly: parsing any single record's slice yields
    # that record alone (the CDX contract at the byte level)
    off = 0
    for r in recs:
        piece = warc.write_warc([r])
        one = warc.parse_warc(data[off : off + len(piece)])
        assert len(one) == 1 and one[0]["content"] == r["content"]
        off += len(piece)
    assert off == len(data)


@given(recs=_records(), cut=st.integers(min_value=1, max_value=10**6))
@settings(max_examples=40, deadline=None)
def test_fuzz_warc_truncation_keeps_prefix(recs, cut):
    """Truncating the stream anywhere never crashes and never yields
    MORE records than survive intact — the crawl-corruption contract
    (truncated tail = the common corruption)."""
    data = warc.write_warc(recs)
    cut = cut % len(data)
    got = warc.parse_warc(data[:cut])
    if cut < 5:  # magic gone
        assert got is None or got == []
        return
    assert got is not None
    assert len(got) <= len(recs)
    # every surviving record is bit-exact, in order
    for want, g in zip(recs, got):
        assert g["content"] == want["content"]
