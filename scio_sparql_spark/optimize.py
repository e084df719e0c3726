"""Logical rewrites applied before DataFrame compilation.

The reference executes the parser's naive left-deep join tree in textual
order (no optimizer pass at all — SURVEY.md §4). Catalyst reorders joins
only with CBO stats, which ad-hoc quad scans don't have, so we apply the
classic triple-pattern heuristic ourselves:

BGP join reordering — flatten pure inner-Join trees, then greedily order:
start from the most-selective pattern (most ground positions, fewest
variables), and always prefer a next pattern CONNECTED to the already
bound variables (avoids accidental cross products when a query lists
patterns in an unfortunate order). Inner joins are commutative and
associative over bag semantics, so this is always safe; LeftJoin / Minus
/ Filter boundaries are never crossed.
"""

from __future__ import annotations

from . import algebra as A
from .terms import KIND_IRI, Term


def _fusable(leaf, catalog) -> bool:
    """A pattern joins into a subject star iff: variable subject,
    constant IRI predicate covered by a property table, default-graph
    mode, and the object is not the subject variable itself (a ?s p ?s
    self-loop constrains within one row — keep the generic path)."""
    return (
        isinstance(leaf, A.StatementPattern)
        and isinstance(leaf.s, A.Var)
        and isinstance(leaf.p, Term)
        and leaf.p.kind == KIND_IRI
        and catalog.covers(leaf.p.lex)
        and leaf.graph_mode == "default"
        and not (isinstance(leaf.o, A.Var) and leaf.o.name == leaf.s.name)
    )


def _fuse_stars(leaves: list, catalog) -> list:
    """Replace each group of >=2 fusable patterns that share a subject
    var AND are covered by ONE property table with a StarScan; keep the
    group's original relative position (at its first member) so
    reordering sees a stable input. Fusion requires single-table
    coverage because the compiled plan is a scan of that table
    (compiler._c_starscan) — no query-time aggregate, no SortAggregate
    fallback (the round-2 regression)."""
    groups: dict[tuple, list] = {}
    for leaf in leaves:
        if _fusable(leaf, catalog):
            pt = catalog.table_for([leaf.p.lex])
            groups.setdefault((leaf.s.name, id(pt)), []).append(leaf)
    fused = {
        k: pats
        for k, pats in groups.items()
        if len(pats) >= 2
        and catalog.table_for([p.p.lex for p in pats]) is not None
    }
    out = []
    emitted = set()
    for leaf in leaves:
        if _fusable(leaf, catalog):
            pt = catalog.table_for([leaf.p.lex])
            k = (leaf.s.name, id(pt))
            if k in fused:
                if k not in emitted:
                    emitted.add(k)
                    pats = fused[k]
                    out.append(
                        A.StarScan(pats[0].s, tuple((p.p, p.o) for p in pats))
                    )
                continue
        out.append(leaf)
    return out


def _flatten_join(node) -> list:
    if isinstance(node, A.Join):
        return _flatten_join(node.left) + _flatten_join(node.right)
    return [node]


def _selectivity_score(leaf) -> tuple:
    """Higher = more selective. (#ground positions, -#vars)."""
    if isinstance(leaf, A.StatementPattern):
        positions = [leaf.s, leaf.p, leaf.o]
        if leaf.graph_mode == "named" and leaf.graph is not None:
            positions.append(leaf.graph)
        ground = sum(1 for p in positions if isinstance(p, Term))
        return (2, ground, -len(leaf.vars))
    if isinstance(leaf, A.StarScan):
        ground = len(leaf.items) + sum(
            1 for _, o in leaf.items if isinstance(o, Term)
        )
        return (2, ground, -len(leaf.vars))
    if isinstance(leaf, A.Values):
        return (3, len(leaf.names), -len(leaf.names))  # tiny: join early
    # opaque subtree (union, filtered pattern, subselect, path fixpoint):
    # neutral priority, keep relative order among themselves
    return (1, 0, -len(leaf.vars))


def _order_leaves(leaves: list) -> list:
    remaining = list(leaves)
    first = max(remaining, key=_selectivity_score)
    remaining.remove(first)
    ordered = [first]
    bound = set(first.vars)
    while remaining:
        connected = [l for l in remaining if l.vars & bound]
        pool = connected if connected else remaining
        nxt = max(pool, key=_selectivity_score)
        remaining.remove(nxt)
        ordered.append(nxt)
        bound |= nxt.vars
    return ordered


def reorder_joins(node, star_catalog=None):
    """Recursive rewrite: fuse subject stars (when the caller supplied a
    property-table catalog — star.StarCatalog), then reorder every
    maximal pure-Join subtree."""
    sv = star_catalog
    if isinstance(node, A.Join):
        leaves = [reorder_joins(l, sv) for l in _flatten_join(node)]
        if sv:
            leaves = _fuse_stars(leaves, sv)
        if len(leaves) > 2:
            leaves = _order_leaves(leaves)
        out = leaves[0]
        for l in leaves[1:]:
            out = A.Join(out, l)
        return out
    if isinstance(node, A.LeftJoin):
        cond = _reorder_expr(node.condition, sv) if node.condition is not None else None
        return A.LeftJoin(reorder_joins(node.left, sv), reorder_joins(node.right, sv), cond)
    if isinstance(node, A.Minus):
        return A.Minus(reorder_joins(node.left, sv), reorder_joins(node.right, sv))
    if isinstance(node, A.Union):
        return A.Union(reorder_joins(node.left, sv), reorder_joins(node.right, sv))
    if isinstance(node, A.Filter):
        return A.Filter(reorder_joins(node.input, sv), _reorder_expr(node.condition, sv))
    if isinstance(node, A.Extend):
        return A.Extend(reorder_joins(node.input, sv), node.var, _reorder_expr(node.expr, sv))
    if isinstance(node, A.Project):
        return A.Project(reorder_joins(node.input, sv), node.names)
    if isinstance(node, A.Distinct):
        return A.Distinct(reorder_joins(node.input, sv))
    if isinstance(node, A.Reduced):
        return A.Reduced(reorder_joins(node.input, sv))
    if isinstance(node, A.Group):
        return A.Group(reorder_joins(node.input, sv), node.keys, node.aggs)
    if isinstance(node, A.OrderBy):
        return A.OrderBy(reorder_joins(node.input, sv), node.keys)
    if isinstance(node, A.Slice):
        return A.Slice(reorder_joins(node.input, sv), node.limit, node.offset)
    if isinstance(node, A.ArbitraryLengthPath):
        return A.ArbitraryLengthPath(
            node.s, node.o, reorder_joins(node.path, sv), node.start_var,
            node.end_var, node.min_length, node.graph_mode, node.graph,
        )
    if isinstance(node, A.Service):
        # the sub-pattern executes against the SERVICE's own dataset:
        # reorder its joins, but drop the star catalog — property
        # tables describe the OUTER dataset and must not fuse into a
        # foreign one
        return A.Service(node.iri, reorder_joins(node.pattern, None), node.silent)
    return node


def _reorder_expr(e, sv=None):
    """Recurse into every expression container that can hold an EXISTS."""
    if isinstance(e, A.EExists):
        return A.EExists(reorder_joins(e.pattern, sv), e.negated)
    if isinstance(e, A.EAnd):
        return A.EAnd(_reorder_expr(e.left, sv), _reorder_expr(e.right, sv))
    if isinstance(e, A.EOr):
        return A.EOr(_reorder_expr(e.left, sv), _reorder_expr(e.right, sv))
    if isinstance(e, A.ENot):
        # !EXISTS{} == NOT EXISTS{} (EXISTS never errors, so 3VL negation
        # collapses) — normalizing here lets the compiler's top-level
        # semi/anti-join path handle it instead of raising.
        if isinstance(e.arg, A.EExists):
            return A.EExists(reorder_joins(e.arg.pattern, sv), not e.arg.negated)
        return A.ENot(_reorder_expr(e.arg, sv))
    if isinstance(e, A.ECall):
        return A.ECall(e.name, tuple(_reorder_expr(a, sv) for a in e.args))
    if isinstance(e, A.ECmp):
        return A.ECmp(e.op, _reorder_expr(e.left, sv), _reorder_expr(e.right, sv))
    if isinstance(e, A.EArith):
        return A.EArith(e.op, _reorder_expr(e.left, sv), _reorder_expr(e.right, sv))
    if isinstance(e, A.ENeg):
        return A.ENeg(_reorder_expr(e.arg, sv))
    if isinstance(e, A.EIn):
        return A.EIn(_reorder_expr(e.arg, sv),
                     tuple(_reorder_expr(x, sv) for x in e.options), e.negated)
    return e
