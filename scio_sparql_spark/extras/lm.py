"""Corpus-trained n-gram language-model scoring.

The standard "perplexity filter" of large-scale training-data
pipelines (CCNet / Gopher / RefinedWeb style): score every document by
its mean token log-probability under a cheap LM and drop the tails.
Real pipelines use a pretrained KenLM; this operator trains the LM on
the corpus itself (add-one-smoothed bigram MLE), which keeps the whole
thing a closed relational plan — no model artifact, fully
oracle-checkable — while exercising exactly the join/aggregate shape a
KenLM-broadcast variant would use.

Beyond-reference surface (no counterpart in the reference engine).

Hash discipline (COVERAGE.md): every output is BIGINT. Per-bigram
log-probs are rounded to integer micro-units BEFORE the per-document
sum, so the sum is exact integer arithmetic — order-independent and
bit-identical across engines (a double sum of logs is order-dependent
in the last ulps; an integer sum is not). ``ln`` itself is
correctly-rounded on both JVM and libm for identical double inputs,
and the probability ``(c12+1)/(c1+V)`` is an identical double on both
sides because its operands are exact integers.

Scale design (100 TB): the unigram/bigram count tables are
vocabulary-sized (bounded by token diversity, not corpus size) and
aggregate with map-side partial combine; the per-occurrence join
shuffles the corpus once on the bigram key and once on the first-token
key. At warehouse scale you would xxhash64 both keys to 8-byte ints
(the dup_span_coverage trick) and broadcast the unigram table; kept as
raw strings here so the DuckDB oracle can replicate the plan
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _tokens, token_ngrams
from .util import spread


def lm_occurrence_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, b, lp): the add-one-smoothed bigram log-prob of every
    bigram OCCURRENCE in BIGINT micro-nats — the exact intermediate
    that lm_bigram_score sums per document. Public so the property
    suite can compare per-bigram values (not just document sums)
    against DuckDB's ln()+ROUND on random corpora: the in-module claim
    that ln is correctly rounded identically across JVM/libm for
    identical double inputs is load-bearing for the driver hash, and a
    future JVM/libm change should surface as a unit failure here, not
    as a driver red (VERDICT r5 item 8)."""
    base = spread(docs)
    # all bigram OCCURRENCES (token_ngrams keeps duplicates), plus the
    # conditioning first token of each occurrence
    occ = base.select(
        F.col(id_col),
        F.explode(token_ngrams(F.col(text_col), 2)).alias("b"),
    ).select(
        F.col(id_col),
        F.col("b"),
        F.split(F.col("b"), " ", 2).getItem(0).alias("w1"),
    )
    uni = (
        base.select(F.explode(_tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("V"))
    bc = occ.groupBy("b").agg(F.count("*").alias("c12"))
    p = (F.col("c12") + 1).cast("double") / (F.col("c1") + F.col("V")).cast("double")
    return (
        occ.join(bc, on="b")
        .join(uni, occ["w1"] == uni["w"])
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("b"),
            F.round(F.log(p) * 1000000).cast("bigint").alias("lp"),
        )
    )


def lm_bigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, sum_lp_micro, avg_lp_micro) for EVERY document:
    the add-one-smoothed bigram log-likelihood of the document under
    the corpus-trained LM, in BIGINT micro-nats.

    p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V) with V = |vocabulary|;
    per-occurrence lp = round(ln(p) * 1e6); sum/avg by integer
    arithmetic. Documents with fewer than 2 tokens score 0/0/0 (no
    bigram — same zero-window rule as token_ngrams)."""
    scored = lm_occurrence_scores(docs, text_col, id_col).select(
        F.col(id_col), F.col("lp")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("lp").alias("sum_lp_micro"),
    )
    out = (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("sum_lp_micro"), F.lit(0)).cast("bigint").alias(
                "sum_lp_micro"
            ),
        )
    )
    return out.withColumn(
        "avg_lp_micro",
        F.expr(
            "CASE WHEN n_bigrams > 0 THEN sum_lp_micro DIV n_bigrams"
            " ELSE CAST(0 AS BIGINT) END"
        ),
    )
