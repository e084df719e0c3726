"""HTML -> text extraction (boilerplate stripping) for crawl pipelines.

The stage between WARC ingest (sources/warc.py hands back raw HTTP
payload bytes — for a web crawl, HTML) and every text operator in this
package (dedup, quality, langid, BPE, DSIR ...): strip markup, drop
script/style/comment content, decode the common entities, normalize
whitespace, and emit the structural signals (link count, tag count,
text-to-markup density) that boilerplate classifiers threshold on.

Beyond-reference surface (the reference engine has no HTML handling);
the public recipe is the trafilatura/jusText/C4 preprocessing shape:
C4 (Raffel et al. 2020 §2.2) starts from extracted text, and this is
the extractor that produces it.

Scale design (100 TB):
- The ENTIRE extraction is a chain of native ``regexp_replace`` /
  ``regexp_extract_all`` Column expressions — map-only, zero shuffle,
  whole-stage codegen, no Python in the hot path. At crawl scale this
  runs scan-speed next to the WARC record parse.
- Exactness: every regex avoids backreferences and possessive
  quantifiers so the SAME pattern runs on Java regex (Spark) and RE2
  (DuckDB) with identical semantics — the in-test differential and the
  driver oracle replay the chain verbatim. Whitespace classes are
  spelled out as ``[ \\t\\n\\f\\r]`` (r16, ADVICE r15): Java's ``\\s``
  includes vertical tab U+000B, RE2's does not, so a bare ``\\s``
  silently diverges on real crawl bytes. Entity decode handles the
  five XML-predefined names + ``&nbsp;`` with ``&amp;`` LAST (decoding
  it earlier would re-interpret ``&amp;lt;`` as a tag bracket).

Column contract: input is a STRING column of HTML (decode bytes with
``F.decode(col, 'UTF-8')`` upstream if needed — e.g. the payload
column of sources/warc.read_warc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tags whose closing (or void) form marks a block boundary -> newline,
# so paragraph structure survives extraction (dup_line_frac and other
# line-keyed quality signals need real line breaks, not one long row).
_BLOCK_CLOSE = (
    r"(?i)</(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|"
    r"pre|section|article|header|footer|td|th)[ \t\n\f\r]*>"
)
_BR = r"(?i)<br[ \t\n\f\r]*/?[ \t\n\f\r]*>"
# A real tag starts with a letter or '/' (RE2-safe; "<3" or "a < b"
# stays text). (?s) lets multi-line tags match across newlines.
_ANY_TAG = r"(?s)</?[A-Za-z][^>]*>"
_COMMENT = r"(?s)<!--.*?-->"
_DOCTYPE = r"(?i)<!DOCTYPE[^>]*>"


def _drop_container(col: Column, tag: str) -> Column:
    # No backreference (RE2 has none): one pattern per container tag.
    # Lazy body up to the first matching close; unclosed containers
    # fall through to the generic tag strip (content survives — the
    # conservative choice for truncated crawl payloads).
    pat = rf"(?is)<{tag}\b[^>]*>.*?</{tag}[ \t\n\f\r]*>"
    return F.regexp_replace(col, pat, " ")


def html_to_text_expr(html: Column) -> Column:
    """The extraction chain as a single Column expression: container
    drops (script/style/noscript + comments + doctype), block-close ->
    newline, generic tag strip, entity decode, whitespace normalize.
    Output lines are trimmed and blank lines removed."""
    c = html
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _DOCTYPE, " ")
    for tag in ("script", "style", "noscript"):
        c = _drop_container(c, tag)
    c = F.regexp_replace(c, _BR, "\n")
    c = F.regexp_replace(c, _BLOCK_CLOSE, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    # entity decode — &amp; strictly last
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    # whitespace normalize: intra-line runs -> one space, trim around
    # newlines, collapse newline runs, trim the ends
    c = F.regexp_replace(c, r"[ \t\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    c = F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")
    return c


def html_extract(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    passthrough: tuple = (),
) -> DataFrame:
    """Extract text + structural boilerplate signals from an HTML
    column, one map-only pass. ``passthrough`` names extra input
    columns to carry into the output unchanged (r15 — e.g. the page
    URL riding next to its extracted text, so composers never
    self-join the crawl to reunite per-row columns):

    - ``text``             extracted text (html_to_text_expr)
    - ``n_links``          count of <a ...> opens (link density's
                           numerator — boilerplate-heavy chrome is
                           link-dense)
    - ``n_tags``           count of ALL tags stripped (markup weight)
    - ``n_html_chars``     raw HTML length
    - ``n_text_chars``     extracted text length
    - ``density_micro``    text/html char ratio in integer micro-units
                           (the jusText/trafilatura gating signal)
    """
    html = F.col(html_col)
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        html_to_text_expr(html).alias("text"),
        # <a followed by whitespace/>//: counts whitespace-split
        # ("<a\nhref=...") and self-closing ("<a/>") anchors too (r15,
        # ADVICE r14 — the plain "<a[ >]" undercounted those, skewing
        # link density). The whitespace set is spelled EXPLICITLY (r16,
        # ADVICE r15): Java's \s includes vertical tab U+000B, RE2's
        # does not, so [\s>/] silently diverged on '<a\x0B...' input —
        # [ \t\n\f\r>/] is the RE2 \s set, byte-identical in both.
        F.size(F.regexp_extract_all(html, F.lit(r"(?is)<a[ \t\n\f\r>/]"), F.lit(0)))
        .cast("bigint")
        .alias("n_links"),
        F.size(F.regexp_extract_all(html, F.lit(_ANY_TAG), F.lit(0)))
        .cast("bigint")
        .alias("n_tags"),
        F.length(html).cast("bigint").alias("n_html_chars"),
    )
    # second projection so the regexp chain is evaluated once and the
    # density is EXACT integer division (matches DuckDB's // on the
    # same BIGINTs — no double rounding in the gate column)
    return staged.select(
        id_col,
        *passthrough,
        "text",
        "n_links",
        "n_tags",
        "n_html_chars",
        F.length("text").cast("bigint").alias("n_text_chars"),
        F.expr(
            "CASE WHEN n_html_chars > 0 THEN"
            " (CAST(length(text) AS BIGINT) * 1000000) DIV n_html_chars"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("density_micro"),
    )


def wrap_documents_html(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministically wrap plain-text documents in realistic HTML —
    the multimodal-codec discipline (extras/multimodal.py): a pure
    Column construction both engines can rebuild bit-for-bit, so an
    extraction differential/oracle can gate the REAL regexp chain
    without binary fixtures. Structure varies per doc via md5(text):
    title/h1 chrome, the text split across <p>/<div> at the first
    space after the md5-derived cut point, a nav block of links, a
    script, a comment, entities, and an unclosed tag in half the docs
    (the truncated-crawl case)."""
    return docs.select(
        F.col(id_col),
        html_wrap_expr(F.col(text_col), F.col(id_col)).alias("html"),
    )


def html_wrap_expr(text: Column, doc_id: Column) -> Column:
    """The wrap as a bare Column expression (r15) — so composers
    (workload.q_docs_crawl_pipeline) can project the HTML NEXT TO other
    per-doc columns in one select instead of self-joining two
    single-column frames back together on doc_id (a full-corpus
    shuffle at scale, for columns that are pure functions of the row)."""
    d = F.conv(F.substring(F.md5(text), 1, 4), 16, 10).cast("bigint")
    # split the text at the first space AT/after position (d % 40)+1;
    # instr on the suffix finds it in both engines (0 -> no split)
    cut = (d % 40 + 1).cast("int")
    tail = text.substr(cut, F.lit(0x7FFFFFFF))
    sp = F.instr(tail, " ")
    head = F.when(
        sp > 0, F.concat(text.substr(F.lit(1), cut - 1), tail.substr(F.lit(1), sp - 1))
    ).otherwise(text)
    rest = F.when(sp > 0, tail.substr(sp + 1, F.lit(0x7FFFFFFF))).otherwise(F.lit(""))
    ids = doc_id.cast("string")
    nav = F.concat(
        F.lit('<ul class="nav">'),
        F.lit('<li><a href="/home">Home</a></li>'),
        F.lit('<li><a href="/about">About &amp; Contact</a></li>'),
        F.when(d % 3 == 0, F.lit('<li><a href="/more">More &gt;</a></li>')).otherwise(F.lit("")),
        F.lit("</ul>"),
    )
    return F.concat(
        F.lit("<!DOCTYPE html>\n<html><head><title>Doc "),
        ids,
        F.lit("</title><style>body { margin: 0; }\n.nav{color:#333}</style>"),
        F.lit('<script type="text/javascript">var t = 1 < 2 && "x";</script></head>\n'),
        F.lit("<body><!-- header chrome -->"),
        nav,
        F.lit("<h1>Doc &quot;"),
        ids,
        F.lit("&quot;</h1>\n<p>"),
        head,
        F.lit("</p>"),
        F.when(sp > 0, F.concat(F.lit("<div>"), rest, F.lit("</div>"))).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("\n<p>trailing &nbsp;note")).otherwise(
            F.lit("\n<footer>fin</footer>")
        ),
        F.lit("</body></html>"),
    )


def html_to_text_sql(col: str) -> str:
    """DuckDB twin of html_to_text_expr over SQL expression ``col`` —
    the identical RE2-safe chain, innermost-first (split out in r15 so
    the adversarial fuzz can differential the bare chain, not just the
    deterministic wrap shapes)."""
    c = col
    for pat, rep in (
        (r"(?s)<!--.*?-->", " "),
        (r"(?i)<!DOCTYPE[^>]*>", " "),
        (r"(?is)<script\b[^>]*>.*?</script[ \t\n\f\r]*>", " "),
        (r"(?is)<style\b[^>]*>.*?</style[ \t\n\f\r]*>", " "),
        (r"(?is)<noscript\b[^>]*>.*?</noscript[ \t\n\f\r]*>", " "),
        (r"(?i)<br[ \t\n\f\r]*/?[ \t\n\f\r]*>", "\n"),
        (
            r"(?i)</(?:p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|"
            r"pre|section|article|header|footer|td|th)[ \t\n\f\r]*>",
            "\n",
        ),
        (r"(?s)</?[A-Za-z][^>]*>", " "),
    ):
        pat_sql = pat.replace("'", "''")
        rep_sql = "chr(10)" if rep == "\n" else f"'{rep}'"
        c = f"regexp_replace({c}, '{pat_sql}', {rep_sql}, 'g')"
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),
        ("&apos;", "''"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        c = f"replace({c}, '{ent}', '{rep}')"
    for pat, rep in (
        (r"[ \t\f\r]+", " "),
        (r" ?\n ?", "\n"),
        (r"\n+", "\n"),
        (r"^[ \n]+|[ \n]+$", ""),
    ):
        rep_sql = "chr(10)" if rep == "\n" else f"'{rep}'"
        c = f"regexp_replace({c}, '{pat}', {rep_sql}, 'g')"
    return c


def html_extract_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    project_text: bool = False,
) -> str:
    """Standalone DuckDB replica of wrap_documents_html ∘ html_extract
    (digest form): rebuilds the same HTML, replays the same regexp
    chain (RE2 'g' flag = Java replace-all), and projects the same
    signal columns with md5(text) standing in for the full extracted
    text — the driver-hash shape."""
    wrap = f"""
        SELECT {id_col},
               '<!DOCTYPE html>' || chr(10) || '<html><head><title>Doc '
               || CAST({id_col} AS VARCHAR)
               || '</title><style>body {{ margin: 0; }}' || chr(10)
               || '.nav{{color:#333}}</style>'
               || '<script type="text/javascript">var t = 1 < 2 && "x";</script></head>'
               || chr(10) || '<body><!-- header chrome -->'
               || '<ul class="nav"><li><a href="/home">Home</a></li>'
               || '<li><a href="/about">About &amp; Contact</a></li>'
               || CASE WHEN d % 3 = 0
                       THEN '<li><a href="/more">More &gt;</a></li>'
                       ELSE '' END
               || '</ul>'
               || '<h1>Doc &quot;' || CAST({id_col} AS VARCHAR)
               || '&quot;</h1>' || chr(10) || '<p>'
               || CASE WHEN sp > 0
                       THEN substr({text_col}, 1, cut - 1) || substr(tail, 1, sp - 1)
                       ELSE {text_col} END
               || '</p>'
               || CASE WHEN sp > 0
                       THEN '<div>' || substr(tail, sp + 1) || '</div>'
                       ELSE '' END
               || CASE WHEN d % 2 = 0
                       THEN chr(10) || '<p>trailing &nbsp;note'
                       ELSE chr(10) || '<footer>fin</footer>' END
               || '</body></html>' AS html
        FROM (
          SELECT {id_col}, {text_col}, d, cut, tail,
                 COALESCE(strpos(tail, ' '), 0) AS sp
          FROM (
            SELECT {id_col}, {text_col},
                   ('0x' || substr(md5({text_col}), 1, 4))::BIGINT AS d,
                   CAST(('0x' || substr(md5({text_col}), 1, 4))::BIGINT % 40 + 1 AS INTEGER) AS cut,
                   substr({text_col},
                          CAST(('0x' || substr(md5({text_col}), 1, 4))::BIGINT % 40 + 1 AS INTEGER)) AS tail
            FROM {table}))"""
    # the regexp chain, innermost-first (same order as html_to_text_expr)
    c = html_to_text_sql("html")
    first = "text" if project_text else "md5(text) AS text_digest"
    return f"""WITH w AS ({wrap}),
        x AS (SELECT {id_col}, html, {c} AS text FROM w)
        SELECT {id_col},
               {first},
               CAST(len(regexp_extract_all(html, '(?is)<a[ \\t\\n\\f\\r>/]')) AS BIGINT) AS n_links,
               CAST(len(regexp_extract_all(html, '(?s)</?[A-Za-z][^>]*>')) AS BIGINT) AS n_tags,
               CAST(length(html) AS BIGINT) AS n_html_chars,
               CAST(length(text) AS BIGINT) AS n_text_chars,
               CAST(length(text) * 1000000 // length(html) AS BIGINT) AS density_micro
        FROM x"""
