"""User-facing scalar-function registry: map a SPARQL function IRI to
a native Column builder, dispatched from the expression compiler.

The reference has no extension-function surface at all (its
Interpreter delegates expression evaluation to rdf4j's fixed builtin
table — Interpreter.scala) — this is a strict upgrade, using the spot
SURVEY.md §2.11 names as the natural extension point. SPARQL 1.1
itself blesses the syntax: any IRI followed by an argument list is a
function call, with implementation-defined semantics.

Design: a builder takes the list of compiled TERM-STRUCT Columns (the
same contract as functions.builtins.BUILTINS values) and returns a
term-struct Column. Builders therefore compose with the engine's
error-as-NULL discipline for free: return NULL (e.g. via F.when with
no otherwise) to signal a SPARQL "error" — FILTERs drop the row, BIND
leaves the variable unbound.

Scale note (100 TB): builders are native Column expressions, so a
registered function stays inside whole-stage codegen like any builtin
— no Python in the hot path. When the logic genuinely needs Python,
wrap it once with ``pandas_scalar_builder`` (Arrow-batched pandas UDF
over the lexical form, ~10-100x the throughput of a row-at-a-time
UDF) — the slow path is explicit and opt-in, never the default.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column

_REGISTRY: dict[str, Callable[[list[Column]], Column]] = {}


def register_function(iri: str, builder: Callable[[list[Column]], Column]) -> None:
    """Register (or replace) the builder for ``iri``.

    ``iri`` is the full function IRI as it appears in queries (after
    prefix expansion), e.g. ``"http://example.org/fn#collapse"``.
    """
    if not iri or ":" not in iri:
        raise ValueError(f"function IRI must be absolute, got {iri!r}")
    if not callable(builder):
        raise TypeError("builder must be callable: list[Column] -> Column")
    _REGISTRY[iri] = builder


def unregister_function(iri: str) -> None:
    _REGISTRY.pop(iri, None)


def lookup_function(iri: str):
    """The registered builder for ``iri``, or None."""
    return _REGISTRY.get(iri)


def pandas_scalar_builder(
    fn: Callable[[str], str | None],
) -> Callable[[list[Column]], Column]:
    """Adapt a plain Python str -> str function into a builder: the
    Arrow-batched slow path for logic Columns can't express. The UDF
    maps the first argument's lexical form; None -> unbound (SPARQL
    error semantics). Result is a plain xsd:string term."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(lex: pd.Series) -> pd.Series:
        return lex.map(lambda v: None if v is None else fn(v))

    def _builder(args: list[Column]) -> Column:
        from ..terms import is_literal, string_term

        t = args[0]
        v = _udf(t["lex"])
        return F.when(is_literal(t) & v.isNotNull(), string_term(v))

    return _builder
