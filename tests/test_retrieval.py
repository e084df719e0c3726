"""Retrieval + contamination operators: known-answer micro-fixtures."""

import math

import pytest

from scio_sparql_spark.extras import dedup, retrieval


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "spark joins use hash tables for speed"),
        (1, "hash hash hash everywhere hash"),
        (2, "nothing relevant here at all today"),
        (3, "spark spark spark streaming engine"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranks_tf_and_idf(spark, corpus):
    out = retrieval.bm25_topk(corpus, ["hash", "spark"], k=4).collect()
    ids = [r["doc_id"] for r in out]
    # doc 2 has no query term: absent. Scores strictly positive, sorted.
    assert 2 not in ids
    assert set(ids) == {0, 1, 3}
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_matches_hand_computation(spark):
    # one term, two docs, equal length -> score ratio driven by tf alone
    rows = [(0, "x a b c"), (1, "x x a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["score"]
        for r in retrieval.bm25_topk(df, ["x"], k=2).collect()
    }
    n_docs, docfreq, k1, b = 2, 2, 1.2, 0.75
    idf = math.log((n_docs - docfreq + 0.5) / (docfreq + 0.5) + 1.0)
    def s(tf, dl, avgdl):
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert out[0] == pytest.approx(round(s(1, 4, 4.0), 6), abs=1e-6)
    assert out[1] == pytest.approx(round(s(2, 4, 4.0), 6), abs=1e-6)


def test_term_doc_stats(spark, corpus):
    stats = {
        r["term"]: (r["df"], r["total_tf"])
        for r in retrieval.term_doc_stats(corpus, min_df=2).collect()
    }
    assert stats["hash"] == (2, 5)  # docs 0 and 1; 1+4 occurrences
    assert stats["spark"] == (2, 4)  # docs 0 and 3; 1+3 occurrences
    assert "nothing" not in stats  # df=1 pruned


def test_contamination_hits(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (0, "we saw the quick brown fox yesterday"),  # shares 3-grams
            (1, "totally clean document with no overlap"),
            (2, "the quick brown fox jumps high indeed"),  # shares many
        ],
        ["doc_id", "text"],
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in dedup.contamination_hits(corpus, bench, n=3).collect()
    }
    assert 1 not in hits  # clean doc never reported
    assert hits[0] == 2  # "the quick brown", "quick brown fox"
    assert hits[2] == 4  # all four benchmark 3-grams
