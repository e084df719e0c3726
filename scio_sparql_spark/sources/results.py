"""SPARQL query-result serialization (W3C result formats).

The reference's only egress is a test harness that JSON-encodes
BindingSets with circe (SPARQLTestPipeline.scala:21-53) — not a spec
format. Users switching from it still need standard egress, so this
module implements the three W3C SPARQL 1.1 result syntaxes over a
solution DataFrame (one term-struct column per variable, NULL =
unbound):

- ``to_result_json_df`` / ``to_result_json``: SPARQL 1.1 Query Results
  JSON Format. The _df form is distributed (one JSON object string per
  solution — suitable for ``df.write.text`` or a streaming sink); the
  plain form collects into the full ``{"head":…,"results":…}`` document
  (driver-side — result sets, not datasets).
- ``to_result_csv_df``: SPARQL 1.1 CSV — plain lexical forms, lossy by
  design (spec §3); write with ``df.write.csv(header=True)``.
- ``to_result_tsv_df``: SPARQL 1.1 TSV — full term syntax (``<iri>``,
  ``"lit"^^<dt>``, ``_:b``), lossless; write with ``sep='\\t'``.

All three build native Column expressions — serialization happens
executor-side under codegen, no Python in the row path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..terms import KIND_BNODE, KIND_IRI, RDF_LANGSTRING, XSD_STRING


def _json_term(c):
    """W3C JSON term object: {"type","value","datatype"?,"xml:lang"?}.
    One uniform struct shape; to_json drops NULL fields."""
    typ = (
        F.when(c["kind"] == KIND_IRI, "uri")
        .when(c["kind"] == KIND_BNODE, "bnode")
        .otherwise("literal")
    )
    dt = F.when(
        (c["kind"] != KIND_IRI)
        & (c["kind"] != KIND_BNODE)
        & ~c["dt"].isin(XSD_STRING, RDF_LANGSTRING),
        c["dt"],
    )
    return F.when(
        c.isNotNull(),
        F.struct(
            typ.alias("type"),
            c["lex"].alias("value"),
            dt.alias("datatype"),
            c["lang"].alias("xml:lang"),
        ),
    )


def to_result_json_df(df: DataFrame) -> DataFrame:
    """One column ``json``: the W3C bindings object per solution row."""
    obj = F.struct(*[_json_term(F.col(v)).alias(v) for v in df.columns])
    return df.select(F.to_json(obj).alias("json"))


def to_result_json(df: DataFrame, limit: int | None = None) -> str:
    """The complete SPARQL 1.1 JSON results document (driver-side)."""
    rows = to_result_json_df(df.limit(limit) if limit is not None else df).collect()
    return json.dumps(
        {
            "head": {"vars": list(df.columns)},
            "results": {"bindings": [json.loads(r["json"]) for r in rows]},
        }
    )


def _xml_escape(s):
    # &amp; first, then the rest (text + attribute-value safe)
    out = F.regexp_replace(s, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    return F.regexp_replace(out, '"', "&quot;")


def to_result_xml_df(df: DataFrame) -> DataFrame:
    """One column ``xml``: a ``<result>…</result>`` element per solution
    row (W3C SPARQL 1.1 Query Results XML Format, distributed form —
    native Column concat/escape under codegen)."""
    parts = []
    for v in df.columns:
        c = F.col(v)
        lex = _xml_escape(c["lex"])
        literal = F.when(
            c["dt"] == RDF_LANGSTRING,
            F.concat(
                F.lit('<literal xml:lang="'), c["lang"], F.lit('">'), lex,
                F.lit("</literal>"),
            ),
        ).when(
            c["dt"].isNotNull() & (c["dt"] != XSD_STRING),
            F.concat(
                F.lit('<literal datatype="'), _xml_escape(c["dt"]), F.lit('">'),
                lex, F.lit("</literal>"),
            ),
        ).otherwise(F.concat(F.lit("<literal>"), lex, F.lit("</literal>")))
        term = (
            F.when(c["kind"] == KIND_IRI, F.concat(F.lit("<uri>"), lex, F.lit("</uri>")))
            .when(c["kind"] == KIND_BNODE, F.concat(F.lit("<bnode>"), c["lex"], F.lit("</bnode>")))
            .otherwise(literal)
        )
        parts.append(
            F.when(
                c.isNotNull(),
                F.concat(
                    F.lit(f'<binding name="{v}">'), term, F.lit("</binding>")
                ),
            ).otherwise(F.lit(""))  # unbound: binding element omitted
        )
    row = F.concat(F.lit("<result>"), *parts, F.lit("</result>"))
    return df.select(row.alias("xml"))


XML_NS = "http://www.w3.org/2005/sparql-results#"


def to_result_xml(df: DataFrame, limit: int | None = None) -> str:
    """The complete XML results document (driver-side — result sets,
    not datasets)."""
    rows = to_result_xml_df(df.limit(limit) if limit is not None else df).collect()
    head = "".join(f'<variable name="{v}"/>' for v in df.columns)
    body = "".join(r["xml"] for r in rows)
    return (
        '<?xml version="1.0"?>'
        f'<sparql xmlns="{XML_NS}">'
        f"<head>{head}</head><results>{body}</results></sparql>"
    )


def to_result_xml_boolean(value: bool) -> str:
    """ASK-form XML results document."""
    return (
        '<?xml version="1.0"?>'
        f'<sparql xmlns="{XML_NS}">'
        f"<head></head><boolean>{'true' if value else 'false'}</boolean></sparql>"
    )


def to_result_csv_df(df: DataFrame) -> DataFrame:
    """Plain string columns per the CSV rules: lexical form for IRIs and
    literals, ``_:label`` for bnodes, empty string for unbound."""
    cols = []
    for v in df.columns:
        c = F.col(v)
        s = F.when(c["kind"] == KIND_BNODE, F.concat(F.lit("_:"), c["lex"])).otherwise(
            c["lex"]
        )
        cols.append(F.coalesce(s, F.lit("")).alias(v))
    return df.select(*cols)


def _tsv_escape(s):
    # TSV term syntax escapes per N-Triples string rules
    out = F.regexp_replace(s, r"\\", r"\\\\")
    out = F.regexp_replace(out, "\t", r"\\t")
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, '"', r'\\"')


def to_result_tsv_df(df: DataFrame) -> DataFrame:
    """Full TSV term syntax per column (lossless; unbound -> empty)."""
    cols = []
    for v in df.columns:
        c = F.col(v)
        lit = F.concat(F.lit('"'), _tsv_escape(c["lex"]), F.lit('"'))
        lit = (
            F.when(
                c["dt"] == RDF_LANGSTRING, F.concat(lit, F.lit("@"), c["lang"])
            )
            .when(
                c["dt"].isNotNull() & (c["dt"] != XSD_STRING),
                F.concat(lit, F.lit("^^<"), c["dt"], F.lit(">")),
            )
            .otherwise(lit)
        )
        s = (
            F.when(c["kind"] == KIND_IRI, F.concat(F.lit("<"), c["lex"], F.lit(">")))
            .when(c["kind"] == KIND_BNODE, F.concat(F.lit("_:"), c["lex"]))
            .otherwise(lit)
        )
        cols.append(F.coalesce(s, F.lit("")).alias(f"?{v}"))
    return df.select(*cols)
