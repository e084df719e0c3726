"""WARC (Web ARChive, ISO 28500 — the public CommonCrawl container)
source: the ingest format a 100-TB text pipeline actually reads.

Pure-Python record parser + writer and a Spark reader built on the
``binaryFile`` source + mapInPandas — one task per archive file, which
is exactly how crawl corpora parallelize (CommonCrawl ships ~1 GB
.warc.gz files by the hundred thousand; file-level parallelism
saturates any cluster long before record-level splitting matters.
Record-level splits inside ONE file would need an offset index because
the standard .warc.gz is a chain of per-record gzip members with no
sync markers — the CDX sidecar's job, out of scope here).

Parsing is strict where corruption hides (version magic, exact
Content-Length, the record-terminating CRLF CRLF) and lenient where
the wild varies (unknown headers pass through; any WARC-Type is
surfaced). Malformed records are DROPPED with the rest of the file
kept — the crawl-bytes discipline the multimodal codecs follow
(extras/multimodal.py): a bad record must not poison an archive.

r14 adds the CDX sidecar the module docstring promised: the
distributed writer (``write_warc_archives``) emits one
(path, record_id, offset, length) row per record while it writes —
offsets of the per-record gzip MEMBER for .warc.gz, raw byte ranges
for plain .warc — and ``read_warc(cdx=...)`` turns those ranges into
tasks, so a FEW FAT archives split record-wise instead of one task
per file (CDX is exactly how CommonCrawl's own index solves this).

HTTP response records (``Content-Type: application/http``) are split
into status + payload body at the first CRLF CRLF so callers get the
document bytes directly — the step every C4-style pipeline does first.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF2 = b"\r\n\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def gunzip_members(data: bytes) -> bytes | None:
    """Decompress a chain of gzip members (the .warc.gz layout: one
    member per record) into one byte string; None if any member is
    corrupt."""
    out, pos = bytearray(), 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data[pos:])
        except zlib.error:
            return None
        if not d.eof:
            return None  # truncated member
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return None
        pos += consumed
    return bytes(out)


def parse_warc(data: bytes) -> list[dict] | None:
    """Concatenated WARC records -> list of
    {"version", "headers" (dict, original case preserved; lookup via
    lower-cased twin), "content" (bytes)}. None only when the stream
    is unusable from the first record (wrong magic); a record that
    goes bad mid-stream ends the parse with the good prefix kept
    (truncated tail = the common corruption)."""
    if not data.startswith(b"WARC/"):
        return None
    records, pos, n = [], 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        head = data[pos : head_end]
        lines = head.split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            break
        version = lines[0].decode("ascii", "replace").strip()
        headers: dict[str, str] = {}
        ok = True
        for ln in lines[1:]:
            if b":" not in ln:
                ok = False
                break
            k, v = ln.split(b":", 1)
            headers[k.decode("ascii", "replace").strip()] = v.decode(
                "utf-8", "replace"
            ).strip()
        lower = {k.lower(): v for k, v in headers.items()}
        if not ok or "content-length" not in lower:
            break
        try:
            clen = int(lower["content-length"])
        except ValueError:
            break
        body_start = head_end + 4
        body_end = body_start + clen
        # the record block MUST end with CRLF CRLF (ISO 28500 §4)
        if clen < 0 or data[body_end : body_end + 4] != _CRLF2:
            break
        records.append(
            {
                "version": version,
                "headers": headers,
                "content": data[body_start:body_end],
            }
        )
        pos = body_end + 4
    return records


def write_warc(records: list[dict]) -> bytes:
    """Records ({"headers": {...}, "content": bytes}) -> concatenated
    WARC/1.1 bytes. Content-Length is computed; other headers pass
    through verbatim."""
    out = bytearray()
    for r in records:
        content = r["content"]
        out += b"WARC/1.1\r\n"
        for k, v in r["headers"].items():
            if k.lower() == "content-length":
                continue
            out += f"{k}: {v}\r\n".encode()
        out += f"Content-Length: {len(content)}\r\n".encode()
        out += b"\r\n"
        out += content
        out += _CRLF2
    return bytes(out)


def split_http_response(content: bytes) -> tuple[int | None, bytes]:
    """HTTP response block -> (status, body). A block without the
    CRLF CRLF header terminator or a parsable status line comes back
    as (None, whole block) — surfaced, not dropped, so callers can
    count protocol oddities."""
    head_end = content.find(_CRLF2)
    if head_end < 0:
        return None, content
    first = content[:head_end].split(b"\r\n", 1)[0]
    parts = first.split(b" ")
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None, content
    try:
        status = int(parts[1])
    except ValueError:
        return None, content
    return status, content[head_end + 4 :]


def _append_archive_rows(rows: dict, fpath: str, data: bytes) -> None:
    """Parse one (possibly gzip-member-chained) archive byte string and
    append its record rows to the WARC_SCHEMA column dict; corrupt
    archives/records drop row-wise."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip_members(data)
        if data is None:
            return
    recs = parse_warc(data)
    if not recs:
        return
    for r in recs:
        lower = {k.lower(): v for k, v in r["headers"].items()}
        ctype = lower.get("content-type", "")
        status, payload = (None, r["content"])
        if ctype.startswith("application/http"):
            status, payload = split_http_response(r["content"])
        rows["path"].append(fpath)
        rows["record_id"].append(lower.get("warc-record-id"))
        rows["warc_type"].append(lower.get("warc-type"))
        rows["target_uri"].append(lower.get("warc-target-uri"))
        rows["content_type"].append(ctype or None)
        rows["http_status"].append(status)
        rows["payload"].append(payload)
        rows["n_bytes"].append(len(payload))


def _finish_batch(rows: dict) -> pd.DataFrame:
    pdf_out = pd.DataFrame(rows)
    pdf_out["http_status"] = pdf_out["http_status"].astype("Int32")
    return pdf_out


def _record_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = {k.name: [] for k in WARC_SCHEMA.fields}
        for fpath, blob in zip(pdf["path"], pdf["content"]):
            _append_archive_rows(rows, fpath, bytes(blob))
        yield _finish_batch(rows)


CDX_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def write_warc_archives(
    df: DataFrame,
    out_dir: str,
    shards: int = 32,
    compress: bool = True,
    id_col: str = "record_id",
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    record_type: str = "response",
) -> DataFrame:
    """Distributed WARC egress: shard ``df`` (record_id, target_uri,
    payload binary) into ``shards`` archive files under ``out_dir``.
    ``record_type='response'`` (default) wraps each payload as an
    HTTP/1.1 200 response record — the crawl-corpus WARC shape;
    ``record_type='conversion'`` writes the payload bare as a
    ``WARC-Type: conversion`` / ``Content-Type: text/plain`` record in
    ``part-*.warc.wet(.gz)`` files — the CommonCrawl WET layout for
    extracted text (r15; completes the WARC/CDX/WET artifact trio).
    Returns the CDX sidecar as a DataFrame —
    (path, record_id, offset, length) per record, produced by the SAME
    tasks that write the bytes, so the index costs nothing extra:
    offsets name the record's own gzip member for .gz archives (the
    CommonCrawl one-member-per-record layout) or its raw byte range
    otherwise. Materializing the returned frame (e.g.
    ``.write.parquet(sidecar)``) IS the write job.

    Tasks write to an attempt-suffixed temp name and ``os.replace`` to
    the deterministic per-shard name, so retries/speculation are
    idempotent. Paths are driver-visible filesystem paths (local/NFS —
    the test/bench environment); an object-store deployment would swap
    the ``open`` for a pyarrow.fs stream, the offset arithmetic is
    identical."""
    if record_type not in ("response", "conversion"):
        raise ValueError(f"record_type must be response|conversion, got {record_type!r}")
    os.makedirs(out_dir, exist_ok=True)
    base = ".warc" if record_type == "response" else ".warc.wet"
    ext = base + (".gz" if compress else "")
    # clear stale shards so a re-run with fewer shards can't leave
    # orphans behind (deterministic names make this a plain unlink) —
    # but ONLY shards of the record type being written (r16, ADVICE
    # r15): a WET write into a directory holding response archives
    # must not silently destroy the .warc files (or vice versa).
    # `.warc.wet` does not end with `.warc` and `.warc.wet.gz` does
    # not end with `.warc.gz`, so the (base, base+'.gz') suffix pair
    # selects exactly this type's family. Foreign-type shards are a
    # caller error (one out_dir holds one record type) — fail loud.
    foreign = (".warc.wet", ".warc.wet.gz") if record_type == "response" else (".warc", ".warc.gz")
    listing = [f for f in os.listdir(out_dir) if f.startswith("part-")]
    # check-then-unlink, two passes: raising mid-unlink would have
    # already destroyed same-type shards in a mixed directory — the
    # refusal must leave the directory EXACTLY as found
    for f in listing:
        if f.endswith(foreign):
            raise ValueError(
                f"{out_dir} holds {foreign[0]} shards; writing "
                f"record_type={record_type!r} into it would mix record "
                "types in one archive directory — use a separate out_dir"
            )
    for f in listing:
        if f.endswith((base, base + ".gz")):
            os.unlink(os.path.join(out_dir, f))
    src = df.select(
        F.col(id_col).alias("record_id"),
        F.col(uri_col).alias("target_uri"),
        F.col(payload_col).cast("binary").alias("payload"),
    ).repartition(shards, "record_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        final = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{ext}")
        tmp = f"{final}.tmp-{ctx.taskAttemptId()}"
        fh, off = None, 0
        cdx = {"path": [], "record_id": [], "offset": [], "length": []}
        try:
            for pdf in batches:
                for rid, uri, payload in zip(
                    pdf["record_id"], pdf["target_uri"], pdf["payload"]
                ):
                    if record_type == "response":
                        body = (
                            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                            + bytes(payload)
                        )
                        ctype = "application/http; msgtype=response"
                    else:  # conversion (WET): the extracted text, bare
                        body = bytes(payload)
                        ctype = "text/plain"
                    rec = write_warc(
                        [
                            {
                                "headers": {
                                    "WARC-Type": record_type,
                                    "WARC-Record-ID": str(rid),
                                    "WARC-Target-URI": str(uri),
                                    "Content-Type": ctype,
                                },
                                "content": body,
                            }
                        ]
                    )
                    if compress:
                        c = zlib.compressobj(6, wbits=31)
                        rec = c.compress(rec) + c.flush()
                    if fh is None:
                        fh = open(tmp, "wb")
                    fh.write(rec)
                    cdx["path"].append(final)
                    cdx["record_id"].append(str(rid))
                    cdx["offset"].append(off)
                    cdx["length"].append(len(rec))
                    off += len(rec)
            if fh is not None:
                fh.close()
                fh = None
                os.replace(tmp, final)
        finally:
            if fh is not None:
                fh.close()
                if os.path.exists(tmp):
                    os.unlink(tmp)
        yield pd.DataFrame(cdx)

    return src.mapInPandas(gen, schema=CDX_SCHEMA)


def read_warc(spark: SparkSession, path: str, cdx: DataFrame | None = None) -> DataFrame:
    """Spark reader: binaryFile scan (one task per archive — the crawl
    parallelism unit) -> mapInPandas parse -> one row per record.
    ``.warc.gz`` member chains are decompressed worker-side; HTTP
    response records surface (http_status, document body) directly.
    Corrupt files/records drop row-wise, never failing the scan.

    With ``cdx`` (a DataFrame of (path, offset, length) ranges — the
    write_warc_archives sidecar or a parsed CommonCrawl CDX), the scan
    is RANGE-SPLIT instead: ranges spread over defaultParallelism
    tasks, each seek-reading only its records, so one fat archive no
    longer binds to one task. Ranges must cover whole records (gzip
    members for .warc.gz); each range is parsed with the identical
    strict parser, so split read == whole read row-for-row."""
    if cdx is None:
        files = spark.read.format("binaryFile").load(path)
        return files.mapInPandas(_record_batches, schema=WARC_SCHEMA)
    slices = cdx.select("path", "offset", "length").repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, object] = {}
        try:
            for pdf in batches:
                rows = {k.name: [] for k in WARC_SCHEMA.fields}
                # seek order: group by file, ascending offset
                pdf = pdf.sort_values(["path", "offset"])
                for p, o, ln in zip(pdf["path"], pdf["offset"], pdf["length"]):
                    fh = handles.get(p)
                    if fh is None:
                        fh = handles[p] = open(p, "rb")
                    fh.seek(int(o))
                    _append_archive_rows(rows, p, fh.read(int(ln)))
                yield _finish_batch(rows)
        finally:
            for fh in handles.values():
                fh.close()

    return slices.mapInPandas(gen, schema=WARC_SCHEMA)


def stream_warc(spark: SparkSession, path: str) -> DataFrame:
    """Structured Streaming twin of read_warc: the binaryFile FILE
    SOURCE watches the directory, each newly-landed archive becomes
    one task in the next micro-batch, and the identical Arrow parse
    stage emits its records — continuous crawl ingest with exactly the
    batch reader's semantics (streaming == batch over a bounded replay
    is pytest-locked). Downstream composes the usual way: the
    watermarked near-dup/exact dedup stages in streaming/dedup.py."""
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source schema is fixed; passing it explicitly
        # is required by readStream
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .load(path)
    )
    return files.mapInPandas(_record_batches, schema=WARC_SCHEMA)
