"""Mechanical guard for the driver-hash type discipline (VERDICT r5 item 2).

The driver's correctness harness runs each catalog oracle through DuckDB
and Arrow-serializes the result before hashing.  DuckDB silently widens
integer aggregates: SUM(BIGINT) -> HUGEINT, which Arrow represents as
decimal128 and which therefore hash-mismatches Spark's int64 even when
every value is identical (the root cause of the r3-r5 hash-reds on
events_props / events_window / stream_windowed_counts).  The same
signature bit r4 via DECIMAL(38,6) AVGs.

This test type-checks EVERY oracle's final projection (schema-only, on
the sf0.001 views) so the class of red can never recur: no HUGEINT /
UHUGEINT / DECIMAL / FLOAT column may ever feed the driver hash.
DOUBLE is allowed only because the existing DOUBLE columns are
pass-through parquet values (bit-identical by construction), never
aggregate outputs -- new entries should still prefer BIGINT micro-units
(see COVERAGE.md, hash discipline).
"""

import os

import duckdb
import pytest

from scio_sparql_spark.workload import build_oracles

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "FLOAT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_oracle_emits_hash_unsafe_types(con):
    offenders = {}
    for name, sql in build_oracles().items():
        rel = con.sql(sql)
        flagged = [
            f"{col}:{typ}"
            for col, typ in zip(rel.columns, rel.types)
            if any(b in str(typ).upper() for b in BANNED)
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracle final projections with hash-unsafe DuckDB types "
        "(wrap in CAST(... AS BIGINT) / use integer micro-units): "
        f"{offenders}"
    )


def test_every_oracle_parses_and_binds(con):
    """Every oracle must at least plan against the real table schemas --
    catches column typos before the driver does."""
    for name, sql in build_oracles().items():
        try:
            con.sql(sql)  # lazy: plans + binds, no execution
        except Exception as e:  # pragma: no cover - failure message only
            pytest.fail(f"oracle {name!r} failed to bind: {e}")
