"""Relational -> RDF bridge: parquet tables to quads DataFrames.

Direct-mapping style (W3C "Direct Mapping" flavor): row -> subject IRI
``urn:{table}:{pk}``, column -> predicate ``urn:col:{column}`` with a typed
literal object, foreign key -> predicate ``urn:ref:{column}`` with the
target row's subject IRI, one named graph per table (``urn:graph:{table}``).

Scale notes (100 TB): the transform is a per-column project + unionByName —
narrow, no shuffle, fully pipelined into whatever consumes the quads.
NULL cells emit no triple (RDF absence = SQL NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..terms import (
    KIND_IRI,
    KIND_LITERAL,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
)

_DT_FOR_SPARK = {
    "tinyint": XSD_INTEGER,
    "smallint": XSD_INTEGER,
    "int": XSD_INTEGER,
    "bigint": XSD_INTEGER,
    "float": XSD_FLOAT,
    "double": XSD_DOUBLE,
    "string": XSD_STRING,
    "boolean": XSD_BOOLEAN,
    "date": XSD_DATE,
    "timestamp": XSD_DATETIME,
}


def _iri(lex: Column) -> Column:
    return F.struct(
        F.lit(KIND_IRI).cast("tinyint").alias("kind"),
        lex.alias("lex"),
        F.lit(None).cast("string").alias("dt"),
        F.lit(None).cast("string").alias("lang"),
    )


def _lit(lex: Column, dt: str) -> Column:
    return F.struct(
        F.lit(KIND_LITERAL).cast("tinyint").alias("kind"),
        lex.alias("lex"),
        F.lit(dt).alias("dt"),
        F.lit(None).cast("string").alias("lang"),
    )


def subject_iri(table: str, *key_cols: Column) -> Column:
    key = F.concat_ws("-", *[c.cast("string") for c in key_cols])
    return F.concat(F.lit(f"urn:{table}:"), key)


def table_to_quads(
    df: DataFrame,
    table: str,
    pk: list[str],
    fks: dict[str, str] | None = None,
    graph: bool = True,
    unique_pk: bool = True,
) -> DataFrame:
    """One quad per non-NULL cell. ``fks`` maps column -> target table
    (emitted as ``urn:ref:{col}`` IRI edges instead of literals).

    ``unique_pk=False``: the pk does not uniquely identify rows (bag
    fact tables) — append a row uniquifier and snapshot with
    localCheckpoint so all per-column branches see identical subjects.
    (At warehouse scale you'd materialize the quads parquet once
    instead of checkpointing per query.)"""
    fks = fks or {}
    dtypes = dict(df.dtypes)
    if not unique_pk:
        # Bag table: subjects carry a row uniquifier. The base df must be
        # cached/materialized by the caller (see tables_to_quads) so
        # monotonically_increasing_id is consistent across the per-column
        # branches. Branch pruning on predicate-bound patterns still
        # applies (the filter folds against each branch's constant
        # predicate), so a pattern scans ONE cached column, not all.
        subj = _iri(subject_iri(table, F.col("__rid")))
    else:
        subj = _iri(subject_iri(table, *[F.col(k) for k in pk]))
    gcol = (
        _iri(F.lit(f"urn:graph:{table}"))
        if graph
        else F.lit(None).cast(
            "struct<kind:tinyint,lex:string,dt:string,lang:string>"
        )
    )
    parts = []
    for c in df.columns:
        if c == "__rid":
            continue
        if c in fks:
            pred = _iri(F.lit(f"urn:ref:{c}"))
            obj = _iri(subject_iri(fks[c], F.col(c)))
        else:
            dt = _DT_FOR_SPARK.get(dtypes[c], XSD_STRING)
            pred = _iri(F.lit(f"urn:col:{c}"))
            obj = _lit(F.col(c).cast("string"), dt)
        parts.append(
            df.filter(F.col(c).isNotNull()).select(
                subj.alias("subject"),
                pred.alias("predicate"),
                obj.alias("object"),
                gcol.alias("graph"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# TPC-H-ish schema registry for /root/testdata tables.
# lineitem's (orderkey, linenumber) is NOT unique in the synthetic data —
# flagged unique_pk=False so rows get uniquified subjects.
TPCH_META = {
    "region": (["r_regionkey"], {}, True),
    "nation": (["n_nationkey"], {"n_regionkey": "region"}, True),
    "customer": (["c_custkey"], {"c_nationkey": "nation"}, True),
    "supplier": (["s_suppkey"], {"s_nationkey": "nation"}, True),
    "part": (["p_partkey"], {}, True),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}, True),
    "lineitem": (
        ["l_orderkey", "l_linenumber"],
        {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
        False,
    ),
    "events": (["event_id"], {}, True),
    "documents": (["doc_id"], {}, True),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, tolerating TIMESTAMP(NANOS) parquet (which
    Spark rejects by default): read nanos as long, convert to timestamp
    (micro truncation — the same thing DuckDB does reading these files)."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    # nanos timestamps surface as bigint under nanosAsLong: convert back
    for c, t in df.dtypes:
        if t == "bigint" and c == "ts":
            df = df.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
    return df


# (sf_dir, table) -> cached base df with __rid, for bag tables whose
# subjects need a stable row uniquifier. One small cached table per bag
# source; at warehouse scale you would materialize the quads parquet once
# instead (write_triples).
_RID_CACHE: dict = {}


def _uniquified(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    key = (sf_dir, table)
    if key not in _RID_CACHE:
        df = load_table(spark, sf_dir, table).withColumn(
            "__rid", F.monotonically_increasing_id()
        )
        df = df.cache()
        df.count()  # materialize so ids are frozen for all consumers
        _RID_CACHE[key] = df
    return _RID_CACHE[key]


def tables_to_quads(spark: SparkSession, sf_dir: str, tables: list[str]) -> DataFrame:
    """Load + relationalize a set of testdata tables into one quads DF."""
    out = None
    for t in tables:
        pk, fks, uniq = TPCH_META[t]
        if uniq:
            df = load_table(spark, sf_dir, t)
        else:
            df = _uniquified(spark, sf_dir, t)
        q = table_to_quads(df, t, pk, fks, unique_pk=uniq)
        out = q if out is None else out.unionByName(q)
    return out
