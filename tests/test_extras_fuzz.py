"""Differential fuzzing of the PIPELINE EXTRAS against pure-Python
references: hypothesis-random corpora / edge lists / vectors through
the distributed operators, compared with trivially-written Python
models (brute-force Jaccard, union-find, Counter, prefix sums). The
reference side is deliberately naive so an operator bug cannot mirror
into it — the same discipline as test_sparql_fuzz's DuckDB twins,
extended to the beyond-reference surface (VERDICT r9 item 8's spirit).

Derandomized for reproducibility."""

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scio_sparql_spark.extras import dedup, pipeline, similarity, textstats

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
    derandomize=True,
)

# small token alphabet => organic duplicate shingles and near-dup docs
_tok = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
_doc = st.lists(_tok, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=14)


def _pytokens(text):
    return [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]


def _pyshingles(text, n=3):
    toks = _pytokens(text)
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _pyjaccard_pairs(texts, threshold, n=3):
    out = set()
    sh = {i: _pyshingles(t, n) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            u = sh[a] | sh[b]
            if not u:
                continue  # 0/0 -> NULL -> dropped, as the operator does
            j = round(len(sh[a] & sh[b]) / len(u), 6)
            if j >= threshold:
                out.add((a, b, j))
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


@given(texts=_corpus, threshold=st.sampled_from([0.2, 0.5, 1.0]))
@_settings
def test_fuzz_ngram_jaccard_equals_bruteforce(spark, texts, threshold):
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            _df(spark, texts), threshold=threshold, n=3
        ).collect()
    }
    assert got == _pyjaccard_pairs(texts, threshold)


@given(texts=_corpus)
@_settings
def test_fuzz_minhash_verified_sound_and_dup_complete(spark, texts):
    # random low-J pairs may legitimately miss a band (LSH recall), so
    # equality is not the property — soundness is: every emitted pair
    # must carry the EXACT Jaccard of the exact baseline, and exact
    # duplicates (J == 1.0, identical signatures => collide in every
    # band) must always be recovered.
    exact = _pyjaccard_pairs(texts, 0.2)
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_verified_pairs(
            _df(spark, texts), threshold=0.2, n=3
        ).collect()
    }
    assert got <= exact
    assert {p for p in exact if p[2] == 1.0} <= got


def _pyunion_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min reachable id
    return {i: find(i) for i in n_ids}


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_fuzz_connected_components_equals_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(df).collect()
    }
    ids = {a for a, _ in edges} | {b for _, b in edges}
    # path-compression union-find roots to the min id per component
    want = _pyunion_find(ids, edges)
    # normalize: the reference's find() root is the min id because
    # unions always parent the larger root under the smaller
    assert got == want


@given(texts=_corpus)
@_settings
def test_fuzz_normalized_dedup_equals_reference(spark, texts):
    got = {
        (r.norm_digest, r.n_docs, r.keep_id)
        for r in dedup.normalized_dedup(_df(spark, texts)).collect()
    }
    import hashlib

    groups = {}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", re.sub(r"[^\w\s]", "", t.lower())).strip()
        d = hashlib.md5(norm.encode()).hexdigest()
        groups.setdefault(d, []).append(i)
    want = {(d, len(ids), min(ids)) for d, ids in groups.items()}
    assert got == want


@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=900), min_size=1, max_size=16
    ),
    seq_len=st.sampled_from([64, 512]),
)
@_settings
def test_fuzz_pack_sequences_prefix_sums(spark, counts, seq_len):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id bigint, n_tokens bigint"
    )
    got = {
        r.doc_id: (r.tok_offset, r.seq_first, r.seq_last, r.offset_in_seq, r.n_seqs)
        for r in pipeline.pack_sequences(df, seq_len=seq_len).collect()
    }
    off = 0
    for i, c in enumerate(counts):
        if c > 0:
            want = (
                off,
                off // seq_len,
                (off + c - 1) // seq_len,
                off % seq_len,
                (off + c - 1) // seq_len - off // seq_len + 1,
            )
        else:
            want = (off, off // seq_len, off // seq_len, off % seq_len, 0)
        assert got[i] == want, (i, c, got[i], want)
        off += c


@given(texts=_corpus, k=st.sampled_from([3, 8]))
@_settings
def test_fuzz_top_ngrams_equals_counter(spark, texts, k):
    got = [
        (r.ngram, r.n_occurrences)
        for r in textstats.top_ngrams(_df(spark, texts), n=2, k=k).collect()
    ]
    c = Counter()
    for t in texts:
        toks = _pytokens(t)
        for i in range(len(toks) - 1):
            c[" ".join(toks[i : i + 2])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8, max_value=8, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@_settings
def test_fuzz_quantize_int8_reference(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id bigint, embedding array<double>"
    )
    got = {
        r.vec_id: (list(r.q), r.scale_micro)
        for r in similarity.quantize_int8(df).collect()
    }
    for i, v in enumerate(vecs):
        mx = max(abs(x) for x in v)
        if mx == 0:
            want = ([0] * len(v), 0)
        else:
            want = ([int(x * 127.0 / mx) for x in v], int(mx * 1e6))
        assert got[i] == want, (i, v, got[i], want)
        assert all(-127 <= q <= 127 for q in got[i][0])


def _pycross_pairs(texts, threshold, n=3):
    """Brute-force cross-corpus Jaccard: corpus = odd indices,
    benchmark = even indices (mirrors q_dedup_cross_corpus's % split)."""
    out = set()
    sh = {i: _pyshingles(t, n) for i, t in enumerate(texts)}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a % 2 == 0 or b % 2 != 0:
                continue  # a must be corpus (odd), b benchmark (even)
            u = sh[a] | sh[b]
            if not u:
                continue
            j = round(len(sh[a] & sh[b]) / len(u), 6)
            if j >= threshold:
                out.add((a, b, j))
    return out


@given(texts=_corpus)
@_settings
def test_fuzz_cross_corpus_sound_and_dup_complete(spark, texts):
    """cross_corpus_minhash_pairs (r10, fuzz per VERDICT r10 next #9):
    SOUND — every returned (corpus, benchmark) pair carries the exact
    brute-force Jaccard and clears the threshold (the verify is exact,
    so no false positive can survive); J=1-COMPLETE — an identical
    corpus/benchmark text pair has identical signatures, collides in
    every band, and MUST be returned. Mid-J completeness is
    probabilistic by design (the (1-J^r)^b curve), so it is not
    asserted here; the catalog gate pins it at the matched
    threshold=0.5 / 2-row-band operating point."""
    df = _df(spark, texts)
    corpus = df.filter(F.col("doc_id") % 2 != 0)
    benchmark = df.filter(F.col("doc_id") % 2 == 0)
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.cross_corpus_minhash_pairs(
            corpus, benchmark, threshold=0.5, bands=32, n=3
        ).collect()
    }
    want = _pycross_pairs(texts, 0.5)
    assert got <= want, got - want
    dups = {p for p in want if p[2] == 1.0}
    assert dups <= got, dups - got


@given(texts=st.lists(_doc, min_size=4, max_size=12))
@_settings
def test_fuzz_minhash_verified_collapse_modes_agree(spark, texts):
    """ADVICE r10 #3 regression: collapse='auto'|'always'|'never'
    must produce the SAME output rows. The corpus is salted with a
    duplicate class larger than collapse_threshold so 'auto' actually
    takes the collapse path and all three modes are exercised for
    real."""
    big = [texts[0]] * 6  # duplicate class of 6 > collapse_threshold=4
    all_texts = texts + big
    df = _df(spark, all_texts)
    outs = []
    for mode in ("auto", "always", "never"):
        outs.append(
            {
                (r.id_a, r.id_b, r.jaccard)
                for r in dedup.minhash_verified_pairs(
                    df, threshold=0.5, collapse_threshold=4, collapse=mode
                ).collect()
            }
        )
    assert outs[0] == outs[1] == outs[2], (outs[0] ^ outs[1], outs[1] ^ outs[2])


# prepend a universal stopword-shingle prefix: every doc shares these
# shingles, so the plain postings join is quadratic in the corpus size
# while the df-ordered prefix filter must exclude them from (almost)
# every prefix — the adversarial family from VERDICT r10 missing #2
_stop_doc = st.lists(_tok, min_size=0, max_size=7).map(
    lambda ts: " ".join(["the", "quick", "brown", "fox"] + ts)
)
_stop_corpus = st.lists(_stop_doc, min_size=2, max_size=12)


@given(texts=_stop_corpus, threshold=st.sampled_from([0.2, 0.5, 0.8]))
@_settings
def test_fuzz_ngram_jaccard_prefix_filter_high_df(spark, texts, threshold):
    """The prefix-filtered path must stay EXACT on a corpus where a
    stopword shingle appears in every document (forced via
    prefix_filter='always' so low thresholds exercise it too), and
    agree with both the brute-force reference and the plain postings
    join ('never')."""
    want = _pyjaccard_pairs(texts, threshold)
    for mode in ("always", "never"):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                _df(spark, texts), threshold=threshold, n=3, prefix_filter=mode
            ).collect()
        }
        assert got == want, (mode, got ^ want)


@given(texts=_corpus)
@_settings
def test_fuzz_cms_estimates_vs_counter(spark, texts):
    """Count-Min estimates vs a Python Counter: est >= true for every
    token, and the heavy-hitter set at the 1% gate (est*100 >= N)
    contains every TRUE heavy hitter (no false negatives — the CMS
    one-sided error direction)."""
    from scio_sparql_spark.extras import sketches

    toks = [t for x in texts for t in _pytokens(x)]
    if not toks:
        return
    df = _df(spark, texts).select(
        F.explode(dedup.token_ngrams(F.col("text"), 1)).alias("w")
    )
    grid = sketches.cms_sketch(df, "w", depth=4, width=512)
    est = {
        r["value"]: r["est"]
        for r in sketches.cms_estimate(
            grid, df.distinct(), "w", depth=4, width=512
        ).collect()
    }
    c = Counter(toks)
    n = len(toks)
    for w, t in c.items():
        assert est[w] >= t, (w, est[w], t)
    true_heavy = {w for w, t in c.items() if t * 100 >= n}
    got_heavy = {w for w, e in est.items() if e * 100 >= n}
    assert true_heavy <= got_heavy


@given(texts=_corpus)
@_settings
def test_fuzz_pmi_bigrams_vs_reference(spark, texts):
    """pmi_bigrams vs a literal Python recurrence of the integer-ratio
    ranking (min_count=1 so tiny corpora produce rows)."""
    got = [
        (r.bigram, r.c_xy, r.pmi_ratio_micro)
        for r in textstats.pmi_bigrams(
            _df(spark, texts), min_count=1, k=10
        ).collect()
    ]
    uni, big = Counter(), Counter()
    n = 0
    for t in texts:
        ws = _pytokens(t)
        uni.update(ws)
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
            n += 1
    want = sorted(
        (
            (f"{x} {y}", c, (c * n * 1000000) // (uni[x] * uni[y]))
            for (x, y), c in big.items()
        ),
        key=lambda r: (-r[2], r[0]),
    )[:10]
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=5, max_value=10**9),
            st.integers(min_value=5, max_value=45 * 10**12),
            st.integers(min_value=5, max_value=45 * 10**12),
            st.integers(min_value=5, max_value=45 * 10**12),
        ),
        min_size=1,
        max_size=8,
    )
)
@_settings
def test_fuzz_pmi_ratio_decimal_no_overflow(spark, rows):
    """The DECIMAL(38) PMI ratio (r12, VERDICT r11 wrong #5) vs Python
    big-int floor division, over the operator's DOCUMENTED domain
    (min_count >= 5, N < 4.6e13 so the RESULT fits the BIGINT output
    column — pmi_bigrams docstring; beyond it, the result column
    itself overflows whatever the intermediate type). c_xy*N here
    reaches ~4.5e22 — ten orders of magnitude past the 9.2e12 point
    where the replaced BIGINT numerator overflowed. Operator-shaped
    constraints: c_x, c_y, N >= c_xy (a bigram count never exceeds
    its word counts or the total)."""
    data = [
        (c_xy, max(c_x, c_xy), max(c_y, c_xy), max(n, c_xy))
        for c_xy, c_x, c_y, n in rows
    ]
    df = spark.createDataFrame(data, ["c_xy", "c_x", "c_y", "__n"])
    got = [
        r.ratio
        for r in df.select(
            textstats.pmi_ratio_micro_expr().alias("ratio")
        ).collect()
    ]
    want = [
        (c_xy * n * 1000000) // (c_x * c_y) for c_xy, c_x, c_y, n in data
    ]
    assert got == want


def _pycontainment_pairs(texts, threshold):
    sh = {i: _pyshingles(t, 3) for i, t in enumerate(texts)}
    want = set()
    for a in range(len(texts)):
        if not sh[a]:
            continue
        for b in range(len(texts)):
            if a == b or not (sh[a] & sh[b]):
                continue
            c = round(len(sh[a] & sh[b]) / len(sh[a]), 6)
            if c >= threshold:
                want.add((a, b, c))
    return want


@given(texts=_corpus, threshold=st.sampled_from([0.5, 0.8, 1.0]))
@_settings
def test_fuzz_containment_pairs_equals_bruteforce(spark, texts, threshold):
    """Directed containment |A∩B|/|A| vs a brute-force reference —
    including the asymmetric excerpt case the corpus strategy produces
    organically (short docs whose shingles sit inside longer ones).
    BOTH plan shapes (plain postings join and the r12 asymmetric
    prefix filter) must match it."""
    want = _pycontainment_pairs(texts, threshold)
    for mode in ("always", "never"):
        got = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                _df(spark, texts), threshold=threshold, n=3, prefix_filter=mode
            ).collect()
        }
        assert got == want, (mode, got ^ want)


@given(texts=_stop_corpus, threshold=st.sampled_from([0.2, 0.5, 0.8, 1.0]))
@_settings
def test_fuzz_containment_prefix_filter_high_df(spark, texts, threshold):
    """The asymmetric prefix-filtered containment path must stay EXACT
    on the universal-stopword corpus (every doc shares the high-df
    shingles that the df-ordered A-prefix must exclude) and agree with
    both the brute-force reference and the plain postings join. Forced
    'always' so sub-0.4 thresholds exercise the prefix machinery."""
    want = _pycontainment_pairs(texts, threshold)
    for mode in ("always", "never"):
        got = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                _df(spark, texts), threshold=threshold, n=3, prefix_filter=mode
            ).collect()
        }
        assert got == want, (mode, got ^ want)


@given(texts=_stop_corpus, threshold=st.sampled_from([0.5, 0.8]))
@_settings
def test_fuzz_proxy_hash_collisions_do_not_change_output(
    spark, texts, threshold
):
    """r18: the prefix-filtered candidate machinery runs on
    _PROXY_HASH(shingle) longs (8 B/shingle through every candidate
    shuffle). The output must be IDENTICAL for any hash function —
    collisions may only add candidates that the exact string verify
    filters — so force a 4-bucket hash (astronomically more collisions
    than xxhash64 will ever produce) and require both operators to
    still equal the brute-force reference on the adversarial
    universal-stopword corpus."""
    orig = dedup._PROXY_HASH
    dedup._PROXY_HASH = lambda c: F.pmod(F.xxhash64(c), F.lit(4))
    try:
        got_c = {
            (r.id_a, r.id_b, r.containment)
            for r in dedup.containment_pairs(
                _df(spark, texts), threshold=threshold, n=3,
                prefix_filter="always",
            ).collect()
        }
        got_j = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                _df(spark, texts), threshold=threshold, n=3,
                prefix_filter="always",
            ).collect()
        }
    finally:
        dedup._PROXY_HASH = orig
    assert got_c == _pycontainment_pairs(texts, threshold)
    assert got_j == _pyjaccard_pairs(texts, threshold)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8, max_value=8, allow_nan=False, allow_infinity=False
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
    )
)
@_settings
def test_fuzz_int8_rerank_full_prefilter_equals_exact(spark, vecs):
    """With prefilter >= corpus size, the two-stage rerank degenerates
    to exact cosine top-k — stage 1 cuts nothing, so any divergence is
    a bug in the candidate plumbing, not the quantization."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    if any(sum(x * x for x in v) == 0.0 for v in vecs):
        return  # zero-NORM vectors (incl. subnormals whose square
        # underflows to 0.0) are outside cosine_topk's documented
        # domain (norm divides; ANSI mode raises DIVIDE_BY_ZERO)
    qv = vecs[0]
    got = [
        (r.vec_id, r.score)
        for r in similarity.int8_rerank_topk(
            df, qv, k=5, prefilter=len(vecs) + 10
        ).collect()
    ]
    want = [
        (r.vec_id, r.score)
        for r in similarity.cosine_topk(df, qv, k=5).collect()
    ]
    assert got == want


# ---- media codec fuzz (r13): pure-Python codecs, no Spark needed ----
# The codecs feed hash-gated Arrow stages; these locks are the
# encode->decode identity over hypothesis-random bodies (every PNG
# filter type, LZW across code-width boundaries) plus prefix-truncation
# always decoding to None (the malformed-drop contract).

_png_dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


@given(
    dims=_png_dims,
    seed=st.integers(0, 2**31 - 1),
    filt=st.sampled_from([None, (0,), (1,), (2,), (3,), (4,), (3, 4, 1)]),
)
@_settings
def test_fuzz_png_roundtrip_and_truncation(dims, seed, filt):
    import numpy as np

    from scio_sparql_spark.extras import multimodal as mm

    w, h = dims
    body = np.random.RandomState(seed).randint(
        0, 256, 3 * w * h, dtype=np.uint8
    ).tobytes()
    png = mm.encode_png(w, h, body, filt)
    d = mm.decode_png(png)
    assert d is not None and d["body"] == body
    assert (d["width"], d["height"]) == (w, h)
    # every strict prefix is malformed (missing IEND at minimum)
    for cut in (len(png) // 3, len(png) - 1):
        assert mm.decode_png(png[:cut]) is None


@given(
    n=st.integers(0, 600),
    alphabet=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
@_settings
def test_fuzz_gif_lzw_roundtrip(n, alphabet, seed):
    import numpy as np

    from scio_sparql_spark.extras import multimodal as mm

    min_code = max(2, (alphabet - 1).bit_length())
    data = np.random.RandomState(seed).randint(
        0, alphabet, n, dtype=np.uint8
    ).tobytes()
    assert mm._lzw_decode(mm._lzw_encode(data, min_code), min_code, n) == data


@given(
    dims=st.tuples(st.integers(1, 8), st.integers(1, 8)),
    n_frames=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
@_settings
def test_fuzz_gif_multiframe_roundtrip(dims, n_frames, seed):
    import numpy as np

    from scio_sparql_spark.extras import multimodal as mm

    w, h = dims
    rng = np.random.RandomState(seed)
    frames = [
        rng.randint(0, 256, w * h, dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    ]
    gif = mm.encode_gif(w, h, frames, mm.GIF_PALETTE)
    d = mm.decode_gif(gif)
    assert d is not None and d["frames"] == frames
    assert d["palette"] == mm.GIF_PALETTE
    assert mm.decode_gif(gif[: len(gif) - 1]) is None


@given(
    n_samples=st.integers(0, 200),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
@_settings
def test_fuzz_wav_roundtrip(n_samples, rate, channels, seed):
    import numpy as np

    from scio_sparql_spark.extras import multimodal as mm

    body = np.random.RandomState(seed).randint(
        -32768, 32768, n_samples * channels
    ).astype("<i2").tobytes()
    wav = mm.encode_wav(body, rate, channels)
    d = mm.decode_wav(wav)
    assert d is not None and d["sample_rate"] == rate
    assert d["channels"] == channels
    assert d["samples"].tobytes() == body
    if len(wav) > 44:
        assert mm.decode_wav(wav[:-1]) is None  # RIFF size mismatch


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-2.0, max_value=2.0, allow_nan=False, width=32
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=4,
        max_size=14,
    ),
    k_codes=st.sampled_from([2, 3]),
)
@_settings
def test_fuzz_pq_topk_matches_duckdb(spark, vecs, k_codes):
    """r14 PQ: random tiny embedding sets (negative coordinates, ties,
    clusters that go empty) through the full train -> encode -> ADC
    pipeline equal the standalone DuckDB replica bit-for-bit — locks
    the trunc-div update (negative sums!), the lowest-code tie-break
    and the 2^20-shift quantization across engines."""
    import duckdb

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    got = [
        (r["vec_id"], r["adc"])
        for r in similarity.pq_topk(
            emb, list(qv), k=5, m=2, k_codes=k_codes, iters=2, dim=8,
            max_train=8,
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
    )
    want = con.execute(
        similarity.pq_topk_oracle_sql(
            query_id=0, k=5, m=2, k_codes=k_codes, iters=2, dim=8,
            max_train=8,
        )
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want], (got, want)


@given(texts=_corpus)
@_settings
def test_fuzz_dsir_matches_duckdb(spark, texts):
    """r14 DSIR: random corpora (empty docs, single tokens, duplicate
    features, tiny target subsets) through the hashed-ngram importance
    scorer equal the DuckDB replica bit-for-bit — locks the feature
    construction (unigrams + bigrams, empty under 2 tokens), md5
    bucketing and the micro-nat ln difference across engines."""
    import duckdb

    from scio_sparql_spark.extras import dsir

    rows = [
        (i, t, "src%d" % (i % 3)) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = sorted(
        (r["doc_id"], r["n_feats"], r["score_micro"])
        for r in dsir.dsir_scores(
            docs, F.col("source") == "src0", buckets=64
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(
        (int(a), int(b), int(c))
        for a, b, c in con.execute(
            dsir.dsir_topk_oracle_sql(
                "source = 'src0'", k=10**6, buckets=64
            )
        ).fetchall()
    )
    assert got == want, (got[:4], want[:4])
