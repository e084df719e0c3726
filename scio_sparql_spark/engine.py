"""Engine entry points.

The reference's API is ``SCollection[Statement].executeSparql(query[,
bindings])`` (reference: Interpreter.scala:173-205). Spark equivalent:
``execute_sparql(quads_df, query[, bindings]) -> DataFrame`` — the
DataFrame plan is built lazily at call time (same deferred-DAG model,
README.md:72-77) and executes on ``.collect()``/action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import algebra as A
from .compiler import compile_query
from .optimize import reorder_joins
from .sparql.parser import parse_query
from .terms import Term


def execute_sparql(quads: DataFrame, query: str, bindings: dict | None = None) -> DataFrame:
    """Run a SPARQL 1.1 SELECT query over a quads DataFrame.

    ``bindings`` maps variable name -> Term and restricts solutions on the
    projected variables (the reference splices initial bindings into the
    query text pre-parse — Interpreter.scala:191-205; joining a one-row
    VALUES at the algebra level is the injection-safe equivalent).
    """
    q = parse_query(query)
    root = reorder_joins(q.algebra)
    if bindings:
        names = tuple(bindings.keys())
        row = tuple(bindings[n] for n in names)
        values = A.Values(names, (row,))
        root = _join_beneath_projection(root, values)
    return compile_query(quads, root)


def _join_beneath_projection(node: A.Node, values: A.Values) -> A.Node:
    """Splice initial bindings below the top projection/modifiers so they
    constrain WHERE-scope variables, projected or not."""
    if isinstance(node, A.Slice):
        return A.Slice(_join_beneath_projection(node.input, values), node.limit, node.offset)
    if isinstance(node, A.Distinct):
        return A.Distinct(_join_beneath_projection(node.input, values))
    if isinstance(node, A.Reduced):
        return A.Reduced(_join_beneath_projection(node.input, values))
    if isinstance(node, A.OrderBy):
        return A.OrderBy(_join_beneath_projection(node.input, values), node.keys)
    if isinstance(node, A.Project):
        return A.Project(A.Join(values, node.input), node.names)
    return A.Join(values, node)


def term_to_string(c: Column) -> Column:
    """Term struct -> plain string (IRI text / bnode label / literal lexical
    form). Handy for surfacing results to plain-SQL consumers."""
    return c["lex"]


def term_to_long(c: Column) -> Column:
    return c["lex"].cast("long")


def term_to_double(c: Column) -> Column:
    return c["lex"].cast("double")
