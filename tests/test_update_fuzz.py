"""Randomized SPARQL 1.1 Update verification: random operation
sequences (INSERT DATA / DELETE DATA / DELETE WHERE / CLEAR) applied
to random initial stores must leave exactly the quad set an
independent pure-Python set model predicts.

Update correctness is order-sensitive and interaction-heavy (a DELETE
WHERE after an INSERT DATA must see the inserted triples; CLEAR GRAPH
must not touch the default graph); the catalog's single round-trip
entry exercises one fixed sequence — this walks random ones."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scio_sparql_spark import execute_update, quads_df_from_list
from scio_sparql_spark.terms import Term

G = "urn:g:1"
subjects = st.integers(min_value=0, max_value=4).map(lambda i: f"urn:s:{i}")
preds = st.sampled_from(["urn:p:a", "urn:p:b"])
objs = st.integers(min_value=0, max_value=3)
graphs = st.sampled_from([None, G])
quad = st.tuples(subjects, preds, objs, graphs)

ops = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), quad),
        st.tuples(st.just("delete"), quad),
        # DELETE WHERE { ?s <p> ?o } — wipes one predicate everywhere
        st.tuples(st.just("delete_where_pred"), preds),
        st.tuples(st.just("clear_named"), st.just(G)),
        st.tuples(st.just("clear_default"), st.just(None)),
    ),
    min_size=1,
    max_size=8,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,
)


def _nq(s, p, o, g):
    core = f"<{s}> <{p}> {o}"
    return f"GRAPH <{g}> {{ {core} }}" if g else core


def _sparql_ops(seq):
    out = []
    for kind, arg in seq:
        if kind == "insert":
            out.append(f"INSERT DATA {{ {_nq(*arg)} }}")
        elif kind == "delete":
            out.append(f"DELETE DATA {{ {_nq(*arg)} }}")
        elif kind == "delete_where_pred":
            out.append(f"DELETE WHERE {{ ?s <{arg}> ?o }}")
        elif kind == "clear_named":
            out.append(f"CLEAR GRAPH <{arg}>")
        else:
            out.append("CLEAR DEFAULT")
    return " ;\n".join(out)


def _model(initial, seq):
    store = set(initial)
    for kind, arg in seq:
        if kind == "insert":
            store.add(arg)
        elif kind == "delete":
            store.discard(arg)
        elif kind == "delete_where_pred":
            # union-default-graph semantics (update.py _delete): the
            # graph-less WHERE matches triples in EVERY graph, and a
            # graph-less delete template removes the matched (s,p,o)
            # wherever it resides — so the whole predicate vanishes
            # across all graphs. (DELETE DATA, by contrast, is an
            # exact-quad subtract: the "delete" op above only discards
            # the default-graph quad.)
            store = {q for q in store if q[1] != arg}
        elif kind == "clear_named":
            store = {q for q in store if q[3] != arg}
        else:
            store = {q for q in store if q[3] is not None}
    return store


@given(initial=st.lists(quad, max_size=6, unique=True), seq=ops)
@_settings
def test_fuzz_update_sequences_match_set_model(spark, initial, seq):
    df = quads_df_from_list(
        spark,
        [
            (
                Term.iri(s),
                Term.iri(p),
                Term.integer(o),
                Term.iri(g) if g else None,
            )
            for s, p, o, g in set(initial)
        ],
    )
    out = execute_update(df, _sparql_ops(seq))
    got = {
        (
            r["subject"]["lex"],
            r["predicate"]["lex"],
            int(r["object"]["lex"]),
            r["graph"]["lex"] if r["graph"] is not None else None,
        )
        for r in out.collect()
    }
    assert got == _model(set(initial), seq)
