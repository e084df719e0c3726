"""Derive an sf1-scale benchmark dataset from the driver's sf0.1
fixtures (VERDICT r12 next #2 — the scale-curve measurement needs a
10x input the driver does not provide).

10 deterministic copies of each table the scale-critical entries read
(documents, embeddings, events, lineitem), each copy decorrelated so
the workload SHAPE is preserved rather than degenerated:

- documents: ids offset per copy; text passed through a per-copy
  `translate` rotation of the 10 most frequent letters — lengths,
  token counts and language mix are untouched, but shingle/minhash
  content diverges, so the near-dup entries see a 10x corpus instead
  of 10 identical replicas (which would be a pathological
  every-doc-has-9-twins workload, not scale).
- embeddings: ids offset; vector elements rotated by the copy index —
  norms and pairwise-similarity DISTRIBUTION preserved, directions
  decorrelated across copies.
- events: ids/users offset; timestamps shifted a day per copy so the
  session/window structure repeats instead of piling onto one day.
- lineitem: order and part keys offset per copy — the part co-order
  graph becomes 10 disjoint copies (node and edge count scale 10x).
- customer/supplier (r16): entity keys offset per copy, nationkeys
  kept — the FK graph grows 10x in entities and edges around the
  shared nation/region hubs (graph_pagerank's scale input; the 1x
  symlinks made its curve a fixed-overhead measurement).

This is BENCH INPUT derivation only — every correctness gate still
runs exclusively on the driver's own parquet.

Usage: python tools/make_scale_data.py [out_dir] [copies] [table ...]
       (defaults: ./scale_data/sf1, 10, all tables; with table names,
       only those are regenerated — the derivation is deterministic,
       so a partial refresh cannot diverge from a full one)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
ALPHA = "etaoinshrd"
ID_OFF = 10_000_000


def _rot(s: str, i: int) -> str:
    return s[i:] + s[:i]


def copies(df, n, build):
    out = None
    for i in range(n):
        c = build(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "scale_data/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def docs_copy(df, i):
        return df.select(
            (F.col("doc_id") + i * ID_OFF).alias("doc_id"),
            F.translate("text", ALPHA, _rot(ALPHA, i)).alias("text"),
            "lang",
            "source",
            "n_chars",
        )

    def emb_copy(df, i):
        dim = 64
        rot = F.concat(
            F.slice("embedding", i % dim + 1, dim - i % dim),
            F.slice("embedding", 1, i % dim),
        )
        return df.select(
            (F.col("vec_id") + i * ID_OFF).alias("vec_id"),
            (rot if i else F.col("embedding")).alias("embedding"),
            "label",
        )

    def ev_copy(df, i):
        return df.select(
            (F.col("event_id") + i * ID_OFF).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
            (F.col("user_id") + i * ID_OFF).alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    def li_copy(df, i):
        return df.select(
            (F.col("l_orderkey") + i * ID_OFF).alias("l_orderkey"),
            (F.col("l_partkey") + i * ID_OFF).alias("l_partkey"),
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )

    # r16: graph_pagerank's FK edge set reads customer/supplier ->
    # nation -> region; the symlinked 1x copies made its sf1 curve a
    # fixed-overhead measurement, not a scale-up. 10x customers/
    # suppliers with offset keys and the ORIGINAL nationkeys is the
    # realistic growth shape (more entities, same dimension tables) —
    # edge count 10x, the nation/region hub nodes shared.
    def cust_copy(df, i):
        return df.select(
            (F.col("c_custkey") + i * ID_OFF).alias("c_custkey"),
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )

    def supp_copy(df, i):
        return df.select(
            (F.col("s_suppkey") + i * ID_OFF).alias("s_suppkey"),
            "s_name",
            "s_nationkey",
            "s_acctbal",
        )

    jobs = {
        "documents": docs_copy,
        "embeddings": emb_copy,
        "events": ev_copy,
        "lineitem": li_copy,
        "customer": cust_copy,
        "supplier": supp_copy,
    }
    only = sys.argv[3:]
    unknown = set(only) - set(jobs)
    if unknown:
        raise SystemExit(f"no derivation for: {sorted(unknown)}")
    os.makedirs(out_dir, exist_ok=True)
    for name, build in jobs.items():
        dst = os.path.join(out_dir, f"{name}.parquet")
        if only and name not in only:
            # the cannot-diverge guarantee: a derived table left as a
            # stale 1x symlink from the pre-r16 layout — or MISSING
            # entirely (fresh/incomplete out_dir, ADVICE r16 #2) — is
            # regenerated even when the partial refresh did not name
            # it (skipping either case would leave a wrong-scale or
            # absent input until a later read fails)
            if os.path.exists(dst) and not os.path.islink(dst):
                continue
            why = "stale 1x symlink" if os.path.islink(dst) else "missing"
            print(f"{name}: {why} — regenerating despite partial refresh")
        # a stale 1x symlink must be unlinked, not written through
        # (the target is the READ-ONLY fixture)
        if os.path.islink(dst):
            os.unlink(dst)
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        copies(src, n, build).repartition(8).write.mode("overwrite").parquet(dst)
        print(name, spark.read.parquet(dst).count())
    # the small dims some entries touch incidentally: symlink as-is
    for name in (
        "region",
        "nation",
        "part",
        "orders",
    ):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print("done ->", out_dir)


if __name__ == "__main__":
    main()
