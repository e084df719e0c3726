"""Text retrieval over a document corpus: BM25 scoring and term stats.

Beyond-reference surface (the reference engine has no text-retrieval
operators); part of the LLM-training-data toolkit next to dedup and
quality scoring — e.g. ranking corpus documents against a probe query,
or building quality filters from lexical statistics.

Scale notes (100 TB):
- The query-term list is a tiny Python constant: the per-token explode
  is filtered by `isin(query_terms)` BEFORE any shuffle, so only rows
  matching a query term ever leave the map side — the corpus is never
  shuffled by term.
- Corpus-level stats (N, avgdl) are a 1-row aggregate crossJoin'd
  (broadcast) back in-plan: no driver-side .collect(), no second pass.
- Document frequencies are computed only for the query terms (a
  |terms|-row table), then broadcast into the scoring join.
- Final top-k is ORDER BY + LIMIT -> Catalyst TakeOrderedAndProject
  (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textstats import _tokens  # empty-filtered: len matches corpus stats
from .util import spread


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms
    (Robertson/Sparck Jones idf with the +1 floor, as in Lucene).
    Returns (doc_id, score) ordered score DESC, doc_id ASC (stable
    tie-break so top-k is deterministic).
    """
    toks = spread(docs).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__toks")
    )
    # per-doc length from the token array directly — no explode needed
    dl = toks.select(F.col(id_col), F.size("__toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # term frequencies for QUERY TERMS ONLY: the isin filter runs
    # map-side inside the same stage as the explode. The doc length
    # rides through as an int and comes back out of the aggregate via
    # first() (deterministic: dl is a function of the group key), so
    # the scored frame needs no join back against dl — that join
    # re-derived the whole tokenize chain for its build side (r17,
    # guide §2.2; the jaccard plain path's measured restructure).
    tf = (
        toks.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("__dl").alias("dl"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = tf.join(F.broadcast(df_t), on="term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def term_doc_stats(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide term statistics: (term, df, total_tf) for every term
    with document frequency >= ``min_df``. One explode + one groupBy on
    term (partial aggregation map-side); the building block for idf
    tables, vocabulary pruning, and stopword discovery over a corpus."""
    exploded = spread(docs).select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    return (
        exploded.groupBy("term")
        .agg(
            F.countDistinct(id_col).alias("df"),
            F.count(F.lit(1)).alias("total_tf"),
        )
        .filter(F.col("df") >= min_df)
    )
