"""Property-based round-trip fuzzing of every RDF writer against its
parser: any structurally-valid quad set must survive
write -> parse -> compare for N-Triples/N-Quads, Turtle, TriG,
JSON-LD, TriX, and (graph-flattened, NCName-predicate) RDF/XML.

The escaping/abbreviation corners (quotes, backslashes, newlines,
XML/JSON metacharacters, unicode, language tags, canonical-vs-not
numeric lexicals) are exactly where hand-written serializers rot;
hypothesis walks them mechanically. One shared deterministic profile
keeps the suite reproducible."""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scio_sparql_spark import (
    parse_jsonld,
    parse_turtle,
    quads_df_from_list,
    to_jsonld,
    to_ntriples_df,
    to_rdfxml,
    to_trig,
    to_trix,
)
from scio_sparql_spark.sources.rio import (
    parse_rdfxml,
    parse_trix,
    _project_ntriples,
)
from scio_sparql_spark.terms import Term

# --- strategies -------------------------------------------------------

# IRIs: scheme + path of URI-legal characters (no spaces/angle brackets
# — those are illegal in IRIREF productions and in rdf:about alike)
_iri_chars = string.ascii_letters + string.digits + "-._~:/?#[]@!$&'()*+,;=%"
iris = st.builds(
    lambda body: f"urn:f:{body}",
    st.text(alphabet=string.ascii_letters + string.digits + "-._:/", min_size=1, max_size=12),
)
# predicate IRIs additionally end in an NCName local part so RDF/XML
# can serialize them (its own documented constraint)
pred_iris = st.builds(
    lambda body, local: f"urn:f:{body}#{local}",
    st.text(alphabet=string.ascii_letters + string.digits, max_size=6),
    st.text(alphabet=string.ascii_letters, min_size=1, max_size=8),
)
bnodes = st.builds(
    Term.bnode,
    st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=8),
)
# literal lexicals: printable unicode incl. quotes/backslashes/newlines
# and XML/JSON metacharacters (surrogates excluded — not valid text)
lex = st.text(
    alphabet=st.characters(
        max_codepoint=0x2FFF, blacklist_categories=("Cs", "Cc")
    )
    | st.sampled_from(list('"\\\n\t<>&{}[]')),
    max_size=20,
)
langs = st.sampled_from(["en", "en-US", "es", "zh-Hant"])
dts = st.sampled_from(
    [
        "http://www.w3.org/2001/XMLSchema#integer",
        "http://www.w3.org/2001/XMLSchema#decimal",
        "http://www.w3.org/2001/XMLSchema#double",
        "http://www.w3.org/2001/XMLSchema#boolean",
        "urn:f:customType",
    ]
)
literals = st.one_of(
    st.builds(Term.literal, lex),
    st.builds(lambda s, g: Term.literal(s, lang=g), lex, langs),
    st.builds(lambda s, d: Term.literal(s, dt=d), lex, dts),
    # canonical + non-canonical numeric lexicals (Turtle abbreviation
    # boundary: "7" prints bare, "07" must stay quoted+typed)
    st.builds(
        lambda n, d: Term.literal(n, dt=d),
        st.sampled_from(["7", "-3", "07", "3.25", "0.5e1", "1E2", "true", "TRUE"]),
        dts,
    ),
)
subjects = st.one_of(st.builds(Term.iri, iris), bnodes)
objects = st.one_of(st.builds(Term.iri, iris), bnodes, literals)
graphs = st.one_of(st.none(), st.builds(Term.iri, iris))
quad_sets = st.lists(
    st.tuples(subjects, st.builds(Term.iri, pred_iris), objects, graphs),
    min_size=1,
    max_size=8,
    unique_by=repr,
)

_settings = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,  # reproducible suite: same examples every run
)


def _key(df, with_graph=True):
    def t(x):
        # bnode labels are scope-prefixed on re-read; identity is
        # structural
        return ("bnode",) if x is not None and x[0] == 0 else tuple(x or ())

    out = []
    for r in df.collect():
        row = (t(r["subject"]), tuple(r["predicate"]), t(r["object"]))
        if with_graph:
            row += (t(r["graph"]) if r["graph"] is not None else None,)
        out.append(repr(row))
    return sorted(out)


@given(quads=quad_sets)
@_settings
def test_fuzz_nquads_roundtrip(spark, quads):
    df = quads_df_from_list(spark, quads)
    lines = to_ntriples_df(df, quads=True)
    back = _project_ntriples(lines.select(lines["line"].alias("value")), quads=True)
    assert _key(back) == _key(df)


@given(quads=quad_sets)
@_settings
def test_fuzz_trig_roundtrip(spark, quads):
    df = quads_df_from_list(spark, quads)
    doc = to_trig(df)
    back = quads_df_from_list(spark, parse_turtle(doc))
    assert _key(back) == _key(df)


@given(quads=quad_sets)
@_settings
def test_fuzz_jsonld_roundtrip(spark, quads):
    df = quads_df_from_list(spark, quads)
    back = quads_df_from_list(spark, parse_jsonld(to_jsonld(df)))
    assert _key(back) == _key(df)


@given(quads=quad_sets)
@_settings
def test_fuzz_trix_roundtrip(spark, quads):
    df = quads_df_from_list(spark, quads)
    back = quads_df_from_list(spark, parse_trix(to_trix(df)))
    assert _key(back) == _key(df)


@given(quads=quad_sets)
@_settings
def test_fuzz_rdfxml_roundtrip(spark, quads):
    df = quads_df_from_list(spark, quads)
    back = quads_df_from_list(spark, parse_rdfxml(to_rdfxml(df)))
    # RDF/XML flattens graphs by contract
    assert _key(back, with_graph=False) == _key(df, with_graph=False)


@given(quads=quad_sets, use_prefixes=st.booleans())
@_settings
def test_fuzz_trig_prefix_compression_roundtrip(spark, quads, use_prefixes):
    # prefix compression is the trickiest Turtle path (longest-match
    # wins, nested namespaces, locals that need escaping fall back to
    # <full-iri> form) — fuzz it with namespaces that prefix the
    # generated IRI space at two nesting depths
    prefixes = {"f": "urn:f:", "fh": "urn:f:h"} if use_prefixes else None
    df = quads_df_from_list(spark, quads)
    doc = to_trig(df, prefixes=prefixes)
    back = quads_df_from_list(spark, parse_turtle(doc))
    assert _key(back) == _key(df)
