"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All native Column expressions (codegen) — these
run per-document at corpus scale with zero shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
ES_STOPWORDS = ["el", "la", "de", "y", "que", "en", "un", "es", "se", "no"]


def _tokens(col):
    return F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda t: t != "")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (chars/4 heuristic, the common LLM rule of thumb)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.length(F.col(text_col)) / 4).cast("bigint").alias("est_bpe_tokens"),
    )


def _stopword_hits(toks, words):
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: mean token length, stopword ratio,
    punctuation ratio — the standard cheap pre-filters for LLM corpus
    cleaning."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    text = F.col(text_col)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return docs.select(
        F.col(id_col),
        F.round(F.length(text) / n, 6).alias("mean_token_len"),
        F.round(_stopword_hits(toks, EN_STOPWORDS) / n, 6).alias("stopword_ratio"),
        F.round(n_punct / F.length(text), 6).alias("punct_ratio"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language heuristic (en/es/unknown). A real system
    plugs a fastText-style model in via mapInPandas; the surrounding
    plumbing (per-doc score, argmax, tie -> unknown) is identical."""
    toks = _tokens(F.col(text_col))
    en = _stopword_hits(toks, EN_STOPWORDS)
    es = _stopword_hits(toks, ES_STOPWORDS)
    return docs.select(
        F.col(id_col),
        F.when(en > es, F.lit("en"))
        .when(es > en, F.lit("es"))
        .otherwise(F.lit("unknown"))
        .alias("lang_pred"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — robust to shuffled word order, the cheap canonical-form
    dedup key."""
    toks = F.array_sort(F.array_distinct(_tokens(F.col(text_col))))
    return docs.select(
        F.col(id_col),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )
