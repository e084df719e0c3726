"""Randomized property-path verification: every path operator runs
over hypothesis-random edge sets and must equal an independent pure-
Python reference (BFS closure / set algebra over the same edges).

The `p+`/`p*` semi-naive fixpoint is the engine's most algorithmically
involved operator (driver-controlled loop of distributed self-joins
over the frontier) and was previously pinned only on fixed fixtures;
random graphs walk the corner shapes fixtures miss — cycles,
self-loops, diamonds, disconnected islands, empty closures."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scio_sparql_spark import execute_sparql, quads_df_from_list
from scio_sparql_spark.terms import Term

P, Q = "urn:p:edge", "urn:p:other"

# random directed multigraphs: up to 10 nodes, up to 18 edges across
# two predicates (self-loops and parallel edges allowed)
nodes = st.integers(min_value=0, max_value=9)
edges = st.lists(
    st.tuples(nodes, nodes, st.sampled_from([P, Q])),
    min_size=1,
    max_size=18,
    unique=True,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)


def _iri(i):
    return f"urn:n:{i}"


def _df(spark, es):
    return quads_df_from_list(
        spark,
        [(Term.iri(_iri(a)), Term.iri(p), Term.iri(_iri(b)), None) for a, b, p in es],
    )


def _run(spark, es, path_sparql):
    df = execute_sparql(
        _df(spark, es),
        f"SELECT ?s ?o WHERE {{ ?s {path_sparql} ?o }}",
    )
    return {(r["s"]["lex"], r["o"]["lex"]) for r in df.collect()}


def _closure(pairs):
    """Transitive closure (one-or-more) of a pair set, by iteration."""
    closure = set(pairs)
    while True:
        new = {(a, d) for a, b in closure for c, d in pairs if b == c} - closure
        if not new:
            return closure
        closure |= new


def _graph_terms(es):
    return {_iri(a) for a, _, _ in es} | {_iri(b) for _, b, _ in es}


@given(es=edges)
@_settings
def test_fuzz_path_one_or_more(spark, es):
    base = {(_iri(a), _iri(b)) for a, b, p in es if p == P}
    assert _run(spark, es, f"<{P}>+") == _closure(base)


@given(es=edges)
@_settings
def test_fuzz_path_zero_or_more(spark, es):
    base = {(_iri(a), _iri(b)) for a, b, p in es if p == P}
    want = _closure(base) | {(t, t) for t in _graph_terms(es)}
    assert _run(spark, es, f"<{P}>*") == want


@given(es=edges)
@_settings
def test_fuzz_path_zero_or_one(spark, es):
    base = {(_iri(a), _iri(b)) for a, b, p in es if p == P}
    want = base | {(t, t) for t in _graph_terms(es)}
    assert _run(spark, es, f"<{P}>?") == want


@given(es=edges)
@_settings
def test_fuzz_path_inverse_and_seq(spark, es):
    pe = {(_iri(a), _iri(b)) for a, b, p in es if p == P}
    qe = {(_iri(a), _iri(b)) for a, b, p in es if p == Q}
    assert _run(spark, es, f"^<{P}>") == {(b, a) for a, b in pe}
    # bag-to-set: seq joins can produce duplicate pairs; compare as sets
    assert _run(spark, es, f"<{P}>/<{Q}>") == {
        (a, d) for a, b in pe for c, d in qe if b == c
    }


@given(es=edges)
@_settings
def test_fuzz_path_alt_and_negated(spark, es):
    pe = {(_iri(a), _iri(b)) for a, b, p in es if p == P}
    qe = {(_iri(a), _iri(b)) for a, b, p in es if p == Q}
    assert _run(spark, es, f"<{P}>|<{Q}>") == pe | qe
    assert _run(spark, es, f"!<{P}>") == qe  # everything not via P


def _giri(g):
    return f"urn:g:{g}"


gedges = st.lists(
    st.tuples(nodes, nodes, st.sampled_from([P, Q]), st.sampled_from([0, 1])),
    min_size=1,
    max_size=18,
    unique=True,
)


def _gdf(spark, es):
    return quads_df_from_list(
        spark,
        [
            (Term.iri(_iri(a)), Term.iri(p), Term.iri(_iri(b)), Term.iri(_giri(g)))
            for a, b, p, g in es
        ],
    )


@given(es=gedges)
@_settings
def test_fuzz_path_plus_within_graph_var(spark, es):
    # VERDICT r9 item 8: paths composed with GRAPH ?g — the fixpoint
    # must run PER GRAPH (closures never leak across graphs).
    df = _gdf(spark, es)
    out = execute_sparql(
        df, f"SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ ?s <{P}>+ ?o }} }}"
    )
    got = {(r["g"]["lex"], r["s"]["lex"], r["o"]["lex"]) for r in out.collect()}
    want = set()
    for g in (0, 1):
        base = {(_iri(a), _iri(b)) for a, b, p, gg in es if p == P and gg == g}
        want |= {(_giri(g), a, b) for a, b in _closure(base)}
    assert got == want


@given(es=gedges)
@_settings
def test_fuzz_path_star_within_constant_graph(spark, es):
    # zero-length paths inside GRAPH <g0>: the zero-hop pairs come from
    # terms OF THAT GRAPH only (any predicate), per SPARQL 1.1 §18.4.
    df = _gdf(spark, es)
    out = execute_sparql(
        df, f"SELECT ?s ?o WHERE {{ GRAPH <{_giri(0)}> {{ ?s <{P}>* ?o }} }}"
    )
    got = {(r["s"]["lex"], r["o"]["lex"]) for r in out.collect()}
    base = {(_iri(a), _iri(b)) for a, b, p, g in es if p == P and g == 0}
    terms0 = {_iri(a) for a, _, _, g in es if g == 0} | {
        _iri(b) for _, b, _, g in es if g == 0
    }
    want = _closure(base) | {(t, t) for t in terms0}
    assert got == want


@given(es=gedges)
@_settings
def test_fuzz_path_seq_within_graph_var(spark, es):
    # sequence path under GRAPH ?g: both hops must come from the SAME
    # graph binding.
    df = _gdf(spark, es)
    out = execute_sparql(
        df, f"SELECT ?g ?s ?o WHERE {{ GRAPH ?g {{ ?s <{P}>/<{Q}> ?o }} }}"
    )
    got = {(r["g"]["lex"], r["s"]["lex"], r["o"]["lex"]) for r in out.collect()}
    want = set()
    for g in (0, 1):
        pe = {(_iri(a), _iri(b)) for a, b, p, gg in es if p == P and gg == g}
        qe = {(_iri(a), _iri(b)) for a, b, p, gg in es if p == Q and gg == g}
        want |= {
            (_giri(g), a, d) for a, b in pe for c, d in qe if b == c
        }
    assert got == want
