"""Basic-graph-pattern (BGP) query compilation over SPO triple tables.

The reference emits entities and the downstream KG materializes triples
(`triples.py`, `sources/conll.py:154` is the reference's own vertical
entity sink) — a KG *engine* must also answer queries over that store.
This module compiles the SPARQL core — a conjunction of triple patterns
with shared variables — into a DataFrame plan, Spark-first:

* each pattern becomes a FILTERED scan of the triple table: every
  literal term is an equality predicate Catalyst pushes into the
  parquet scan of a pred-partitioned store (predicate + partition
  pruning — a pattern with a literal predicate reads ONE partition);
* shared variables become equi-joins; the compiler seeds the join
  chain with the most-literal-constrained pattern (classic selectivity
  heuristic) and then grows ONLY along connected variables, so no
  cartesian product is ever planned for a connected pattern (a
  disconnected pattern raises instead of silently exploding);
* Catalyst + AQE finish the job: join reordering stays available
  because everything is plain equi-joins, small pattern legs broadcast
  at runtime, and a star pattern (all patterns sharing ?s) compiles to
  the same one-shuffle shape as ``triples.property_table``.

Semantics: bag matches like SPARQL BGPs; pass ``distinct=True`` for the
DISTINCT modifier. A variable repeated INSIDE one pattern (e.g.
``(?x, "knows", ?x)``) becomes an intra-pattern equality filter.
``optional`` groups are SPARQL OPTIONAL blocks for *well-designed*
queries (each group's shared variables are bound by the required
block): each group compiles to its own inner-joined sub-plan and is
LEFT-joined onto the required matches — unmatched rows keep their
required bindings with NULLs for the optional-only variables.

Beyond the core BGP+OPTIONAL: property paths — one-or-more
(``pred+``, depth-capped doubling closure), zero-or-one (``pred?``,
direct edges plus reflexive rows, no closure), zero-or-more (``pred*``,
the closure plus reflexive rows over all graph terms — SPARQL's
zero-length-path semantics), inverse (``^pred``),
sequence (``a/b``, rewritten to chained patterns over fresh internal
variables), alternation (``a|b``, ONE scan with an In-list
predicate, not a union of scans) and closure-over-alternation
(``(a|b)+``/``(a|b)*``, the doubling closure of the alternation's
edge union — the skos broader|narrower shape) and negated property
sets (``!p`` / ``!(a|b)``, ONE scan with a NOT-IN predicate; not
closable); ``<...>`` angle-quotes an atomic name and a bare term
containing ``://`` is atomic by convenience, so IRI predicates — which
contain the path operator characters ``/`` and ``|`` — compose with
every path form — FILTER EXISTS / NOT EXISTS (semi-/anti-join on
the witness key), MINUS (anti-join on the shared variables; a
MINUS group sharing no variable removes nothing, per SPARQL
compatibility semantics), FILTER expressions (comparisons and
string predicates over bound variables; numeric literals compare
numerically via a double cast), VALUES (pushed-down In-lists),
GRAPH scoping over quad stores, GROUP BY aggregation
(``bgp_aggregate``: one-shuffle hash aggregate with map-side
partials), CONSTRUCT templating (``construct``), and fixed-round
naive/semi-naive Datalog forward chaining (``apply_rules``).

Scale shape (100 TB triple store): worst case is the self-join chain
every SPARQL engine pays; the wins come from literal pushdown before
any shuffle, id-only join columns, and letting AQE choose
broadcast/skew handling per leg. For hot star patterns, materialize
``property_table`` once and scan that instead.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _is_path_pred(term: str) -> bool:
    return (
        (not _is_var(term))
        and len(term) > 1
        and term.endswith(("+", "*", "?"))
    )


def _strip_angles(name: str) -> str:
    """``<...>`` quotes an atomic predicate name (IRIs contain ``/``
    and ``|``, the path operator characters) — strip the brackets."""
    if len(name) >= 2 and name.startswith("<") and name.endswith(">"):
        return name[1:-1]
    return name


def _is_atomic_pred(term: str) -> bool:
    """A predicate term the path machinery must NOT split: fully
    angle-bracket-quoted, or a bare IRI (contains ``://`` and no
    brackets — the plain-string convenience)."""
    return (
        term.startswith("<")
        and term.endswith(">")
        and "<" not in term[1:-1]
    ) or ("://" in term and "<" not in term)


def _split_outside_angles(term: str, sep: str) -> list[str]:
    """Split on ``sep`` characters that sit OUTSIDE ``<...>`` quoting."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in term:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth = max(0, depth - 1)
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _split_path_seq(term: str) -> list[str]:
    """Split a sequence path on ``/`` characters that sit outside
    BOTH ``<...>`` quoting and ``(...)`` grouping, so a group segment
    like ``(a|b)/c`` splits into ``(a|b)`` and ``c`` while the slash
    inside ``<http://...>`` or ``(a/b)`` stays put (the latter is
    rejected later with a clear error — groups hold alternations
    only)."""
    parts: list[str] = []
    buf: list[str] = []
    angle = paren = 0
    for ch in term:
        if ch == "<":
            angle += 1
        elif ch == ">":
            angle = max(0, angle - 1)
        elif ch == "(" and angle == 0:
            paren += 1
        elif ch == ")" and angle == 0:
            paren = max(0, paren - 1)
        if ch == "/" and angle == 0 and paren == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _alt_parts(term: str) -> list[str]:
    """Split an alternation ``a|b`` (optionally ``(a|b)``) into plain
    predicate names, rejecting nested path operators. Angle-quoted
    (``<iri>``) and bare-IRI parts are atomic — operator characters
    inside them are data, not syntax."""
    alts = [a.strip() for a in _split_outside_angles(term.strip("()"), "|")]
    if not all(alts):
        raise ValueError(f"malformed alternation: {term!r}")
    out: list[str] = []
    for a in alts:
        if _is_atomic_pred(a):
            out.append(_strip_angles(a))
            continue
        if a.endswith(("+", "*", "?")) or a.startswith("^") or "/" in a:
            raise ValueError(
                "alternation path supports plain predicates only "
                f"(no nested +/^//): {term!r}"
            )
        out.append(a)
    return out


def _expand_paths(
    patterns: list[tuple[str, str, str]], counter
) -> list[tuple[str, str, str]]:
    """Rewrite sequence property paths (``a/b/c``) into chained
    patterns over fresh internal variables (``?__seqN``) — excluded
    from the default projection. Each segment may itself be an
    inverse (``^p``), one-or-more (``p+``), alternation (``a|b``) or
    parenthesized-group (``(a|b)``, ``(a|b)+``, ``^(a|b)``) step —
    the split is paren-aware, so ``(a|b)/c`` chains the group scan
    into ``c``; ``counter`` is shared across every group of one
    query so internal names never collide."""
    out: list[tuple[str, str, str]] = []
    for pat in patterns:
        p = pat[1] if len(pat) == 3 else None
        if (
            isinstance(p, str)
            and (not _is_var(p))
            and "/" in p
            and not _is_atomic_pred(p)
            and len(_split_path_seq(p)) > 1
        ):
            segs = [s.strip() for s in _split_path_seq(p)]
            if not all(segs):
                raise ValueError(f"malformed sequence path: {p!r}")
            cur = pat[0]
            for i, seg in enumerate(segs):
                nxt = (
                    pat[2]
                    if i == len(segs) - 1
                    else f"?__seq{next(counter)}"
                )
                out.append((cur, seg, nxt))
                cur = nxt
        else:
            out.append(pat)
    return out


_FILTER_OPS = ("=", "==", "!=", "<", "<=", ">", ">=")
_FILTER_FUNCS = ("contains", "strstarts", "strends", "regex")


def _filter_vars(flt) -> frozenset[str]:
    """Every ``?var`` name a FILTER node references (lhs always; rhs
    when it is itself a variable), recursing through ``and/or/not``
    compounds. Used to classify a sub-group filter as local (only the
    group's own variables) vs correlated (references an outer one)."""
    if (
        isinstance(flt, (tuple, list))
        and flt
        and isinstance(flt[0], str)
        and flt[0] in ("and", "or", "not")
    ):
        out: frozenset[str] = frozenset()
        for a in flt[1:]:
            out = out | _filter_vars(a)
        return out
    try:
        lhs, _op, rhs = flt
    except (TypeError, ValueError):
        raise ValueError(f"filter must be a (lhs, op, rhs) triple: {flt!r}")
    out = frozenset({lhs[1:]}) if _is_var(lhs) else frozenset()
    if isinstance(rhs, str) and _is_var(rhs):
        out = out | {rhs[1:]}
    return out


def _compile_filter(bound: frozenset[str], flt, col_of=F.col) -> F.Column:
    """One FILTER expression → a boolean Column over the bound
    variables. ``flt`` is ``(lhs, op, rhs)``: lhs a ``?var``; op a
    comparison (``= == != < <= > >=``) or string predicate
    (``contains strstarts strends regex``); rhs a ``?var``, string
    literal,
    or number (numbers compare numerically via a double cast —
    non-numeric values become NULL and the row drops, SPARQL's
    type-error-is-false semantics). The op ``bound`` maps SPARQL's
    ``BOUND(?v)`` / ``!BOUND(?v)``: rhs True keeps rows where the
    variable matched (IS NOT NULL after an OPTIONAL left join), rhs
    False keeps the unmatched rows — the negation idiom SPARQL uses
    to query for ABSENT facts.

    Compound nodes compose recursively: ``("and", f1, f2, ...)``,
    ``("or", f1, f2, ...)``, ``("not", f)`` — SPARQL's ``&&  ||  !``.
    Spark's three-valued NULL logic coincides with SPARQL's
    error-propagation table for filter purposes (``error || true`` is
    true, ``error && x`` and ``!error`` stay error → the row drops),
    so the composition is a plain boolean expression."""
    if (
        isinstance(flt, (tuple, list))
        and flt
        and isinstance(flt[0], str)
        and flt[0] in ("and", "or", "not")
    ):
        op, *args = flt
        if op == "not":
            if len(args) != 1:
                raise ValueError(f"'not' takes exactly one operand: {flt!r}")
            return ~_compile_filter(bound, args[0], col_of)
        if len(args) < 2:
            raise ValueError(f"{op!r} needs at least two operands: {flt!r}")
        cols = [_compile_filter(bound, a, col_of) for a in args]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if op == "and" else (out | c)
        return out
    try:
        lhs, op, rhs = flt
    except (TypeError, ValueError):
        raise ValueError(f"filter must be a (lhs, op, rhs) triple: {flt!r}")
    if not _is_var(lhs):
        raise ValueError(f"filter lhs must be a ?variable: {lhs!r}")
    v = lhs[1:]
    if v not in bound:
        raise ValueError(f"filter variable not bound by any pattern: {lhs}")
    col = col_of(v)
    if op == "bound":
        if not isinstance(rhs, bool):
            raise ValueError(f"bound filter needs a True/False rhs: {rhs!r}")
        return col.isNotNull() if rhs else col.isNull()
    if op == "in":
        # SPARQL IN over an inline literal list: one In predicate
        # Catalyst can push into the scan (values compare as stored
        # strings, matching the all-string triple store); NOT IN
        # arrives as ("not", (..., "in", ...))
        if (
            not isinstance(rhs, (list, tuple))
            or not rhs
            or not all(isinstance(x, str) and not _is_var(x) for x in rhs)
        ):
            raise ValueError(
                f"in filter needs a non-empty literal list rhs: {rhs!r}"
            )
        return col.isin(list(rhs))
    if op in _FILTER_FUNCS:
        if not isinstance(rhs, str) or _is_var(rhs):
            raise ValueError(f"{op} needs a string literal rhs: {rhs!r}")
        return {
            "contains": col.contains,
            "strstarts": col.startswith,
            "strends": col.endswith,
            "regex": col.rlike,
        }[op](rhs)
    if op not in _FILTER_OPS:
        raise ValueError(f"unsupported filter operator: {op!r}")
    if isinstance(rhs, (int, float)) and not isinstance(rhs, bool):
        # try_cast, not cast: ANSI mode would THROW on a non-numeric
        # value; SPARQL's type error semantics drop the row instead
        left: F.Column = col.try_cast("double")
        right: F.Column = F.lit(float(rhs))
    elif isinstance(rhs, str) and _is_var(rhs):
        rv = rhs[1:]
        if rv not in bound:
            raise ValueError(f"filter variable not bound by any pattern: {rhs}")
        left, right = col, col_of(rv)
    elif isinstance(rhs, str):
        left, right = col, F.lit(rhs)
    else:
        raise ValueError(f"unsupported filter rhs: {rhs!r}")
    return {
        "=": left == right,
        "==": left == right,
        "!=": left != right,
        "<": left < right,
        "<=": left <= right,
        ">": left > right,
        ">=": left >= right,
    }[op]


_EXPR_FUNCS = ("concat", "ucase", "lcase", "strlen", "str")
_EXPR_NUMERIC = ("abs", "round", "floor", "ceil")
_EXPR_ARITH = ("+", "-", "*", "/")


def _compile_expr(bound: frozenset[str], e) -> F.Column:
    """A small BIND expression language → a Column. Terms: ``?var``
    (must be bound), string literal, number. Composites (prefix
    tuples): ``("concat", a, b, ...)`` string concatenation,
    ``("+"|"-"|"*"|"/", a, b)`` arithmetic over double try_casts
    (non-numeric → NULL, SPARQL's type-error-is-unbound),
    ``("ucase"|"lcase"|"strlen"|"str", a)`` string functions,
    ``("substr", s, start[, len])`` 1-based substring and
    ``("replace", s, pat, rep)`` regex replacement,
    ``("coalesce", a, b, ...)`` first non-NULL (the OPTIONAL-default
    idiom — values are compared as strings, matching the all-string
    triple store), ``("abs"|"round"|"floor"|"ceil", x)`` numeric
    builtins over double try_casts, ``("strbefore"|"strafter", s,
    sep)`` ('' on no match, per spec), and ``("if", cond, then,
    else)`` where ``cond`` is
    a FILTER node (see ``_compile_filter``) — a NULL/error condition
    takes the else branch, SPARQL's effective-boolean-value
    coercion."""
    if isinstance(e, str) and _is_var(e):
        v = e[1:]
        if v not in bound:
            raise ValueError(f"expression variable not bound: {e}")
        return F.col(v)
    if isinstance(e, str):
        return F.lit(e)
    if isinstance(e, (int, float)) and not isinstance(e, bool):
        return F.lit(e)
    if isinstance(e, (tuple, list)) and e:
        op, *args = e
        if op == "if":
            # args[0] is a FILTER node, not an expression
            if len(args) != 3:
                raise ValueError(f"if needs (cond, then, else): {e!r}")
            cond = _compile_filter(bound, args[0])
            then_c = _compile_expr(bound, args[1]).cast("string")
            else_c = _compile_expr(bound, args[2]).cast("string")
            # a NULL condition is not-true → the else branch, which is
            # SPARQL's effective-boolean-value coercion of an error
            return F.when(cond, then_c).otherwise(else_c)
        cols = [_compile_expr(bound, a) for a in args]
        if op == "coalesce":
            if len(cols) < 2:
                raise ValueError(f"coalesce needs >= 2 arguments: {e!r}")
            return F.coalesce(*[c.cast("string") for c in cols])
        if op == "concat":
            if not cols:
                raise ValueError("concat needs at least one argument")
            return F.concat(*[c.cast("string") for c in cols])
        if op in _EXPR_ARITH:
            if len(cols) != 2:
                raise ValueError(f"{op} needs exactly two arguments: {e!r}")
            lo, hi = (c.try_cast("double") for c in cols)
            return {
                "+": lo + hi,
                "-": lo - hi,
                "*": lo * hi,
                "/": lo / hi,
            }[op]
        if op == "substr":
            # ("substr", s, start[, length]) — 1-based like SPARQL
            if len(cols) not in (2, 3):
                raise ValueError(f"substr needs (s, start[, len]): {e!r}")
            length = (
                cols[2].try_cast("int")
                if len(cols) == 3
                else F.lit(2147483647)
            )
            return F.substring(
                cols[0].cast("string"), cols[1].try_cast("int"), length
            )
        if op == "replace":
            # ("replace", s, pattern, replacement) — regex semantics,
            # like SPARQL REPLACE
            if len(cols) != 3:
                raise ValueError(f"replace needs (s, pat, rep): {e!r}")
            return F.regexp_replace(
                cols[0].cast("string"),
                cols[1].cast("string"),
                cols[2].cast("string"),
            )
        if op in _EXPR_NUMERIC:
            # SPARQL numeric builtins over the all-string store:
            # try_cast like the arithmetic ops (non-numeric → NULL =
            # unbound). ROUND is half-up away from zero per the XPath
            # fn:round SPARQL inherits — Spark's F.round matches;
            # FLOOR/CEIL keep the double type (SPARQL returns the
            # argument's numeric type; the store is untyped anyway).
            if len(cols) != 1:
                raise ValueError(f"{op} needs exactly one argument: {e!r}")
            c = cols[0].try_cast("double")
            return {
                "abs": F.abs(c),
                "round": F.round(c, 0),
                "floor": F.floor(c).cast("double"),
                "ceil": F.ceil(c).cast("double"),
            }[op]
        if op in ("strbefore", "strafter"):
            # SPARQL STRBEFORE/STRAFTER: '' when the separator does
            # not occur (NOT null) — substring_index gives the whole
            # string on no match, so gate on a contains() test
            if len(cols) != 2:
                raise ValueError(f"{op} needs (s, sep): {e!r}")
            src_c = cols[0].cast("string")
            sep_c = cols[1].cast("string")
            hit = src_c.contains(sep_c)
            # F.substring_index's python wrapper wants a str delim;
            # call_function passes the Column through to the SQL
            # function, which accepts expressions
            n = F.lit(1) if op == "strbefore" else F.lit(-1)
            val = F.call_function("substring_index", src_c, sep_c, n)
            return F.when(hit, val).otherwise(F.lit(""))
        if op in ("ucase", "lcase", "strlen", "str"):
            if len(cols) != 1:
                raise ValueError(f"{op} needs exactly one argument: {e!r}")
            c = cols[0]
            return {
                "ucase": F.upper(c),
                "lcase": F.lower(c),
                "strlen": F.length(c),
                "str": c.cast("string"),
            }[op]
        raise ValueError(f"unsupported expression function: {op!r}")
    raise ValueError(f"unsupported expression term: {e!r}")


def _compile_legs(
    src: DataFrame,
    patterns: list[tuple[str, str, str]],
    path_depth: int = 8,
    src_overrides: dict[int, DataFrame] | None = None,
    graph_var: str | None = None,
) -> list[tuple[DataFrame, frozenset[str]]]:
    """One filtered/renamed scan per pattern: literals become equality
    predicates (pushed down by Catalyst), variables become columns.
    ``src_overrides`` swaps the triple source for specific pattern
    indices (semi-naive delta evaluation compiles one leg against the
    last round's delta and the rest against the full known set).

    A literal predicate ending in ``+`` (``"knows+"``) is a SPARQL
    one-or-more property path: the leg becomes the transitive closure
    of that predicate's edge set, depth-capped at ``path_depth``.
    Cycle-closing matches are INCLUDED (``a knows+ a`` holds when a
    ≥1-hop path a→…→a exists) per SPARQL arbitrary-length-path
    semantics; the strict-ancestor variant is the ontology layer's
    ``transitive_closure(keep_cycles=False)`` default."""
    from nametag3_spark.operators.ontology import transitive_closure

    legs: list[tuple[DataFrame, frozenset[str]]] = []
    for idx, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern must be a 3-tuple: {pat!r}")
        src_i = (src_overrides or {}).get(idx, src)
        s_term, p_term, o_term = pat
        # SPARQL inverse path: ^pred means (o, pred, s) — swap the ends
        # and fall through to the normal/path machinery
        if (not _is_var(p_term)) and len(p_term) > 1 and p_term.startswith("^"):
            p_term = p_term[1:]
            s_term, o_term = o_term, s_term
            pat = (s_term, p_term, o_term)
        if graph_var is not None and _is_path_pred(p_term):
            raise ValueError(
                "property-path patterns are not supported under a GRAPH "
                f"variable (a closure would mix graphs): {pat!r}"
            )
        if (not _is_var(p_term)) and _is_atomic_pred(p_term):
            # angle-quoted or bare-IRI predicate: atomic, no path
            # interpretation — rides the plain literal machinery
            pat = (s_term, _strip_angles(p_term), o_term)
            leg, positions, terms = src_i, _POS, pat
            if graph_var is not None:
                positions = ("graph",) + positions
                terms = ("?" + graph_var,) + tuple(terms)
        elif (not _is_var(p_term)) and p_term.startswith("!"):
            # negated property set !p / !(a|b): one scan with a
            # NOT-IN predicate over the excluded edge labels
            if _is_path_pred(p_term):
                raise ValueError(
                    f"negated property sets cannot be closed: {p_term!r}"
                )
            excluded = _alt_parts(p_term[1:])
            leg = src_i.where(~F.col("pred").isin(excluded))
            positions, terms = ("subj", "obj"), (s_term, o_term)
            if graph_var is not None:
                # per-EDGE scan — each row carries its graph, so the
                # graph binding rides along like the plain branch
                # (closures stay rejected: they would mix graphs)
                positions = ("graph",) + positions
                terms = ("?" + graph_var,) + terms
        elif (
            (not _is_var(p_term))
            and ("|" in p_term
                 or (p_term.startswith("(") and p_term.endswith(")")))
            and not _is_path_pred(p_term)
        ):
            # alternation path (a|b): ONE scan with an In-list predicate
            # (pushed down like a literal), never a union of scans.
            # Any paren group routes here too, so a sequence hiding
            # inside one ((a/b)) fails loudly in _alt_parts instead of
            # silently matching a literal named "(a/b)"
            alts = _alt_parts(p_term)
            leg = src_i.where(F.col("pred").isin(alts))
            positions, terms = ("subj", "obj"), (s_term, o_term)
            if graph_var is not None:
                # per-EDGE scan: the graph binding rides along (only
                # closures mix graphs and stay rejected)
                positions = ("graph",) + positions
                terms = ("?" + graph_var,) + terms
        elif _is_path_pred(p_term):
            # one-or-more path: close the edge set — one predicate's,
            # or the union of an alternation's ((a|b)+, e.g. a
            # broader|narrower closure) via the same In-list scan; the
            # closure may be corpus-scale, so AQE (not a pinned
            # broadcast) picks each doubling round's join strategy
            inner = p_term[:-1]
            if inner.startswith("!"):
                raise ValueError(
                    f"negated property sets cannot be closed: {p_term!r}"
                )
            if "|" in inner or (
                inner.startswith("(") and inner.endswith(")")
            ):
                # closure-over-alternation REQUIRES parens: bare
                # a|b+ is ambiguous (SPARQL precedence reads it as
                # a|(b+), which this engine doesn't support). A
                # paren group without | routes here too so (a/b)+
                # raises _alt_parts' clear error
                if not (inner.startswith("(") and inner.endswith(")")):
                    raise ValueError(
                        "ambiguous alternation+closure — parenthesize "
                        f"the alternation, e.g. (a|b){p_term[-1]}: {p_term!r}"
                    )
                base = src_i.where(
                    F.col("pred").isin(_alt_parts(inner))
                ).select("subj", "obj")
            else:
                base = src_i.where(
                    F.col("pred") == F.lit(_strip_angles(inner))
                ).select("subj", "obj")
            if p_term.endswith("?"):
                # zero-or-one: the direct edges plus the zero-length
                # reflexive rows below — no closure at all. SPARQL
                # path evaluation is set-semantics, and a self-loop
                # edge is already covered by its reflexive row, so
                # strict (subj != obj) edges keep the union
                # duplicate-free without a corpus-wide distinct.
                leg = base.where(
                    F.col("subj") != F.col("obj")
                ).distinct()
            else:
                leg = transitive_closure(
                    base,
                    max_depth=path_depth,
                    child="subj",
                    parent="obj",
                    broadcast_build=False,
                    # p+ keeps cycle-closing matches (a p+ a via
                    # a→b→a), SPARQL arbitrary-length semantics; p*
                    # uses the strict closure because its zero-length
                    # reflexive union below already covers every
                    # self-pair — keeping cycles there too would
                    # double-count them under bag semantics
                    keep_cycles=p_term.endswith("+"),
                ).select(
                    F.col("child").alias("subj"),
                    F.col("ancestor").alias("obj"),
                )
            if p_term.endswith(("*", "?")):
                # zero-or-more / zero-or-one: add the reflexive rows
                # over ALL graph terms (SPARQL's zero-length path
                # matches every term in the graph, not just the
                # predicate's endpoints). Corpus-wide distinct —
                # prefer p+ when zero-length matches aren't needed.
                # Strict closure/edges exclude self-loops, so the two
                # sets are disjoint.
                nodes = (
                    src_i.select("subj")
                    .unionByName(src_i.select(F.col("obj").alias("subj")))
                    .distinct()
                )
                leg = leg.unionByName(
                    nodes.select("subj", F.col("subj").alias("obj"))
                )
            positions, terms = ("subj", "obj"), (s_term, o_term)
        else:
            leg, positions, terms = src_i, _POS, pat
            if graph_var is not None:
                # the graph binding rides the SAME var/literal machinery
                # (incl. repeated-var equality if ?g also names a term)
                positions = ("graph",) + positions
                terms = ("?" + graph_var,) + tuple(terms)
        var_cols: dict[str, str] = {}  # var name -> first position bound
        for pos, term in zip(positions, terms):
            if _is_var(term):
                v = term[1:]
                if not v:
                    raise ValueError(f"bare '?' variable in {pat!r}")
                if v in var_cols:  # repeated var inside one pattern
                    leg = leg.where(F.col(pos) == F.col(var_cols[v]))
                else:
                    var_cols[v] = pos
            else:
                lit = _strip_angles(term) if pos == "pred" else term
                leg = leg.where(F.col(pos) == F.lit(lit))
        leg = leg.select(*[F.col(p).alias(v) for v, p in var_cols.items()])
        legs.append((leg, frozenset(var_cols)))
    return legs


def _estimate_leg_costs(
    patterns: list[tuple[str, str, str]],
    pred_stats: dict[str, int],
) -> list[float]:
    """Estimated cardinality per pattern from per-predicate row counts
    (the ``kg_stats``/``triples.pred_stats`` output): a literal
    predicate costs its stored count (0.5 when absent — an unknown
    predicate matches nothing and makes the best seed), an alternation
    sums its branches, a path closure gets its base count times the
    classic expansion guess (2x), a variable predicate costs the whole
    store; each additional literal term applies a 0.1 selectivity."""
    total = float(sum(pred_stats.values())) or 1.0
    costs: list[float] = []
    for pat in patterns:
        s_term, p_term, o_term = pat
        if _is_var(p_term):
            c = total
        elif p_term.startswith("!"):
            # negated set matches everything except the excluded labels
            excluded = sum(
                float(pred_stats.get(a, 0.0)) for a in _alt_parts(p_term[1:])
            )
            c = max(total - excluded, 0.5)
            for t in (s_term, o_term):
                if not _is_var(t):
                    c *= 0.1
            costs.append(c)
            continue
        else:
            p = p_term[1:] if p_term.startswith("^") else p_term
            closure = _is_path_pred(p)
            if closure:
                p = p[:-1]
            parts = (
                _alt_parts(p)
                if ("|" in p)
                else [_strip_angles(p)]
            )
            c = sum(float(pred_stats.get(a, 0.0)) + 0.5 for a in parts)
            if closure:
                c *= 2.0
        for t in (s_term, o_term):
            if not _is_var(t):
                c *= 0.1
        costs.append(c)
    return costs


def _join_connected(
    legs: list[tuple[DataFrame, frozenset[str]]],
    costs: list[float] | None = None,
) -> tuple[DataFrame, frozenset[str]]:
    """Inner-join legs along shared variables, seeded from the
    cheapest leg — estimated cardinality when ``costs`` is given
    (stats-driven), else the most literal-constrained leg — growing
    greedily along connected variables by the same key; raises on a
    disconnected (cartesian) pattern instead of planning one."""
    if costs is not None:
        order = sorted(range(len(legs)), key=lambda i: (costs[i], i))
    else:
        order = sorted(range(len(legs)), key=lambda i: (len(legs[i][1]), i))
    seed, *rest = order
    joined, bound = legs[seed]
    pending = list(rest)
    while pending:
        pick = next(
            (i for i in pending if legs[i][1] & bound),
            None,
        )
        if pick is None:
            raise ValueError(
                "disconnected basic graph pattern (cartesian product); "
                "split the query or add a linking pattern"
            )
        pending.remove(pick)
        leg, vars_ = legs[pick]
        joined = joined.join(leg, on=sorted(vars_ & bound))
        bound = bound | vars_
    return joined, bound


def bgp_query(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = False,
    optional: list[list[tuple[str, str, str]]] | None = None,
    not_exists: list[list[tuple[str, str, str]] | dict] | None = None,
    exists: list[list[tuple[str, str, str]] | dict] | None = None,
    minus: list[list[tuple[str, str, str]] | dict] | None = None,
    binds: list[tuple] | None = None,
    filters: list[tuple] | None = None,
    values: dict[str, list[str]] | None = None,
    extra_legs: list[DataFrame] | None = None,
    pred_stats: dict[str, int] | None = None,
    path_depth: int = 8,
    graph: str | None = None,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    graph_col: str = "graph",
) -> DataFrame:
    """Compile a conjunctive triple-pattern query to a DataFrame.

    ``patterns``: (s, p, o) tuples; terms starting with ``?`` are
    variables, anything else is a literal equality constraint.
    ``select``: variable names (with or without ``?``) to project, in
    order; default = every variable, sorted. Returns one row per match
    (bag semantics; ``distinct=True`` for set semantics).
    ``optional``: OPTIONAL blocks — each a pattern list compiled to its
    own inner-joined sub-plan, then LEFT-joined on the variables it
    shares with the required block (which must bind at least one, and
    in a well-designed query all, of the shared variables). A group
    may instead be a dict ``{"patterns": [...], "filters": [...]}``:
    the filters apply to the sub-plan BEFORE the left join (SPARQL's
    LeftJoin-condition scoping — a group row failing the filter does
    not extend, the required row survives with NULLs) and may only
    reference variables the group itself binds.
    A literal predicate ending in ``+`` is a one-or-more property path,
    closed to ``path_depth`` steps (strict: no reflexive matches);
    ``*`` is zero-or-more (the same closure plus reflexive rows over
    every graph term — a corpus-wide distinct; prefer ``+`` when
    zero-length matches aren't needed); ``?`` is zero-or-one (the
    direct edges plus the same reflexive rows, no closure).
    ``not_exists``: FILTER NOT EXISTS blocks — each group compiles to
    its own inner-joined sub-plan and removes required matches via a
    LEFT ANTI join on the shared variables (which must exist).
    ``exists``: FILTER EXISTS blocks — the positive twin, a LEFT SEMI
    join: keeps each required match at most once however many
    witnesses exist.
    ``minus``: SPARQL MINUS blocks — same anti-join shape, but a
    group sharing NO variable with the required block removes
    nothing (SPARQL's compatibility semantics) instead of raising.
    Each of the three may instead be a dict ``{"patterns": [...],
    "filters": [...]}``. Filters over the group's OWN variables apply
    to the witness sub-plan BEFORE the semi/anti join (exact: shared
    variables are equi-joined, so a pre-join filter over them equals
    the substituted evaluation). For EXISTS/NOT EXISTS a filter may
    also reference OUTER variables — the correlated form: it compiles
    into the semi/anti join's ON condition together with the
    shared-variable equalities, which is SPARQL's substitution
    semantics (note Spark may have to plan a conditional join as
    broadcast-nested-loop when the group shares no equality key).
    For MINUS correlated filters raise: the spec evaluates the right
    side independently, so such a filter sees an unbound variable —
    type error, false, a group that matches nothing — and the MINUS
    silently removes nothing; the raise is the loud version.
    ``binds``: SPARQL BIND — ``(expr, alias)`` pairs evaluated in
    order after the joins (see ``_compile_expr`` for the expression
    language); each alias becomes a selectable/filterable variable.
    ``filters``: FILTER expressions as ``(lhs, op, rhs)`` triples —
    see ``_compile_filter``; applied after OPTIONAL joins and BINDs,
    so a filter on an optional-only variable drops unmatched rows
    (NULL-comparison-is-false), matching SPARQL, and may reference
    BIND aliases.
    A literal predicate may also be a sequence path (``a/b``:
    rewritten to chained patterns over internal variables), an
    inverse step (``^p``) or an alternation (``a|b``: one scan with
    an In-list predicate).
    ``values``: SPARQL VALUES — inline allowed bindings per variable
    (``{"x": ["a", "b"]}``), each applied as an In-list predicate that
    Catalyst pushes below the joins (multi-variable dicts restrict each
    variable independently, i.e. a cross-product VALUES table).
    ``extra_legs``: pre-compiled binding sets joined into the chain
    like pattern legs — each a DataFrame whose COLUMN NAMES are
    variable names (the SPARQL subquery hook, and an escape hatch to
    join any DataFrame as bindings). Connectivity rules apply.
    ``pred_stats``: per-predicate row counts (the ``kg_stats`` /
    ``triples.pred_stats`` output, collected to a dict) — switches
    join ordering from the literal-count heuristic to estimated
    cardinalities (see ``_estimate_leg_costs``): the cheapest leg
    seeds the left-deep chain and growth picks the cheapest connected
    leg. At store scale, collect the stats once per session and pass
    them to every query.
    ``graph``: SPARQL GRAPH over a QUAD store (``graph_col`` names the
    provenance/snapshot column). ``None`` queries the union of all
    graphs (RDF default-graph-as-union); a literal scopes every
    pattern to that one graph via a pushed-down filter (partition
    pruning on a graph-partitioned store); a variable (``"?g"``)
    requires all patterns of the query to match WITHIN one graph and
    binds it — the per-snapshot query shape. Per-EDGE pattern kinds
    (plain, inverse, sequence, alternation, negated sets) all bind the
    graph variable; CLOSURE paths (``+ * ?``) are rejected under a
    graph VARIABLE (a multi-hop closure would mix graphs).
    """
    if not patterns and not extra_legs:
        raise ValueError("empty basic graph pattern")
    src = triples.select(
        *[F.col(c).alias(p) for c, p in zip((subj_col, pred_col, obj_col), _POS)]
    )
    graph_var: str | None = None
    if graph is not None:
        if _is_var(graph):
            graph_var = graph[1:]
            if not graph_var:
                raise ValueError("bare '?' graph variable")
            src = triples.select(
                F.col(graph_col).alias("graph"),
                *[
                    F.col(c).alias(p)
                    for c, p in zip((subj_col, pred_col, obj_col), _POS)
                ],
            )
        else:
            # literal graph: one pushed-down filter scopes every leg
            src = triples.where(F.col(graph_col) == F.lit(graph)).select(
                *[
                    F.col(c).alias(p)
                    for c, p in zip((subj_col, pred_col, obj_col), _POS)
                ]
            )

    seq_counter = itertools.count()
    stats_total = float(sum(pred_stats.values())) if pred_stats else 0.0

    def _group_plan(pats):
        expanded = _expand_paths(pats, seq_counter)
        g_legs = _compile_legs(src, expanded, path_depth, graph_var=graph_var)
        g_costs = (
            _estimate_leg_costs(expanded, pred_stats) if pred_stats else None
        )
        return g_legs, g_costs

    legs, costs = _group_plan(patterns)
    for sub in extra_legs or []:
        # a pre-compiled binding set (e.g. a SPARQL subquery, or ANY
        # DataFrame whose column names are variable names) joins the
        # chain like a pattern leg — shared columns become the join key
        cols = frozenset(sub.columns)
        if not cols:
            raise ValueError("extra leg has no columns")
        legs.append((sub, cols))
        if costs is not None:
            costs.append(stats_total)  # unknown cardinality: whole store
    joined, bound = _join_connected(legs, costs)

    def _corr_cond(shared, corr, g_vars):
        """The join CONDITION for a correlated sub-group: equality on
        the shared pattern variables (witness side renamed ``__w_*``)
        AND the correlated filters, each compiled with group variables
        resolving to the renamed witness columns and outer variables
        to the required plan's own columns. Equality is null-unsafe,
        matching the equi-join (``on=shared``) path: an outer NULL
        (OPTIONAL miss) never matches a witness."""
        cond = None
        for v in shared:
            c = F.col(v) == F.col("__w_" + v)
            cond = c if cond is None else cond & c

        def col_of(name: str) -> F.Column:
            return F.col("__w_" + name) if name in g_vars else F.col(name)

        for flt in corr:
            c = _compile_filter(bound | g_vars, flt, col_of)
            cond = c if cond is None else cond & c
        return cond

    def _rename_witness(g_joined, g_vars):
        return g_joined.select(
            *[F.col(v).alias("__w_" + v) for v in sorted(g_vars)]
        )

    def _sub_plan(group, kind: str):
        """Compile an OPTIONAL/EXISTS/NOT EXISTS/MINUS group (pattern
        list or ``{"patterns", "filters"}`` dict) to its sub-plan.
        Filters over the group's OWN variables apply pre-join (exact
        for every form: shared variables are equi-joined, so a
        pre-join filter over them equals the joined evaluation);
        filters referencing an outer variable come back separately as
        CORRELATED — the caller folds them into the join condition
        (SPARQL's LeftJoin-condition / EXISTS-substitution semantics).
        A filter variable bound by NEITHER side still raises."""
        g_filters: list[tuple] = []
        if isinstance(group, dict):
            g_filters = group.get("filters") or []
            group = group.get("patterns") or []
        if not group:
            raise ValueError(f"empty {kind} group")
        g_joined, g_vars = _join_connected(*_group_plan(group))
        corr: list[tuple] = []
        for flt in g_filters:
            fvars = _filter_vars(flt)
            missing = fvars - g_vars - bound
            if missing:
                raise ValueError(
                    f"filter variable not bound by any pattern in or "
                    f"around the {kind} group: ?{sorted(missing)[0]}"
                )
            if fvars <= g_vars:
                g_joined = g_joined.where(_compile_filter(g_vars, flt))
            else:
                corr.append(flt)
        return g_joined, g_vars, group, corr

    for group in optional or []:
        g_joined, g_vars, group, corr = _sub_plan(group, "OPTIONAL")
        shared = sorted(g_vars & bound)
        if not shared and not corr:
            raise ValueError(
                "OPTIONAL group shares no variable with the required "
                f"pattern (cartesian product): {group!r}"
            )
        if corr:
            # correlated LeftJoin condition: witness side renamed, the
            # filter joins the equality keys inside the ON clause, new
            # group bindings renamed back after the join
            w = _rename_witness(g_joined, g_vars)
            joined = joined.join(
                w, on=_corr_cond(shared, corr, g_vars), how="left"
            ).select(
                *[F.col(v) for v in sorted(bound)],
                *[
                    F.col("__w_" + v).alias(v)
                    for v in sorted(g_vars - bound)
                ],
            )
        else:
            joined = joined.join(g_joined, on=shared, how="left")
        bound = bound | g_vars

    def _witness_join(group, kind: str, how: str):
        """One EXISTS/NOT EXISTS/MINUS application: equi-join on the
        shared variables when every filter is group-local (ids-only
        witness projection), else a conditional semi/anti join whose
        ON clause carries the correlated filters."""
        nonlocal joined
        g_joined, g_vars, group, corr = _sub_plan(group, kind)
        shared = sorted(g_vars & bound)
        if kind == "MINUS" and corr:
            # per SPARQL the MINUS right side evaluates WITHOUT the
            # outer bindings: its filter sees the variable unbound →
            # type error → false → the group matches nothing and the
            # MINUS removes nothing. Always-dead code — raise loudly
            # instead of silently keeping every row.
            raise ValueError(
                "MINUS filters cannot reference outer variables (the "
                "right side evaluates independently per SPARQL; such a "
                f"filter would match nothing): {corr[0]!r}"
            )
        if not shared and not corr:
            if kind == "MINUS":
                # SPARQL MINUS: no shared domain removes nothing
                return
            raise ValueError(
                f"{kind} group shares no variable with the required "
                f"pattern: {group!r}"
            )
        if corr:
            w = _rename_witness(g_joined, g_vars)
            joined = joined.join(
                w, on=_corr_cond(shared, corr, g_vars), how=how
            )
        else:
            # the join carries only the shared key columns of the
            # witness; semi keeps each required match AT MOST once
            # regardless of witness count (bag cardinality preserved)
            joined = joined.join(
                g_joined.select(*shared), on=shared, how=how
            )

    for group in not_exists or []:
        _witness_join(group, "NOT EXISTS", "left_anti")

    for group in exists or []:
        _witness_join(group, "EXISTS", "left_semi")

    for group in minus or []:
        _witness_join(group, "MINUS", "left_anti")

    for expr, alias in binds or []:
        a = alias.lstrip("?")
        if not a:
            raise ValueError("BIND needs a non-empty alias")
        if a in bound:
            raise ValueError(f"BIND alias already bound: ?{a}")
        joined = joined.withColumn(a, _compile_expr(bound, expr))
        bound = bound | {a}

    for flt in filters or []:
        joined = joined.where(_compile_filter(bound, flt))

    for var, allowed in (values or {}).items():
        v = var.lstrip("?")
        if v not in bound:
            raise ValueError(f"VALUES variable not bound by any pattern: {var}")
        if not allowed:
            raise ValueError(f"empty VALUES list for {var}")
        # a literal binding list is tiny by construction: isin compiles
        # to an In predicate Catalyst can push below the joins
        joined = joined.where(F.col(v).isin(list(allowed)))

    out_vars = (
        [v.lstrip("?") for v in select]
        if select
        else sorted(v for v in bound if not v.startswith("__"))
    )
    missing = [v for v in out_vars if v not in bound]
    if missing:
        raise ValueError(f"select variables not bound by any pattern: {missing}")
    out = joined.select(*out_vars)
    return out.distinct() if distinct else out


def construct(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL CONSTRUCT: derive NEW (subj, pred, obj) triples from each
    BGP match via a template — the single-rule forward-chaining
    primitive of rule-based KG construction (e.g. ``?o ordered_by ?c .
    ?c in_nation ?n => ?o shipped_to ?n``).

    ``template`` triples mix bound variables and literals. Matches are
    deduplicated BEFORE templating (CONSTRUCT emits a graph, i.e. a
    set) and the result is distinct per emitted triple. Rows where any
    templated variable is NULL (possible when the match used an
    ``optional`` block) are dropped, mirroring SPARQL's skip-on-
    unbound CONSTRUCT semantics. Accepts every ``bgp_query`` keyword
    except ``select``/``distinct``, which the templating owns.
    """
    if not template:
        raise ValueError("empty CONSTRUCT template")
    for kw in ("select", "distinct"):
        if kw in bgp_kwargs:
            raise ValueError(f"construct() owns the {kw!r} argument")
    needed = _template_needed(template)
    # bag matches on purpose: the templating's own final distinct already
    # yields the emitted-triple SET, so a match-level distinct would be a
    # second corpus-scale shuffle buying nothing — both distincts dedup
    # map-side first, so the final exchange carries the same bytes either
    # way (measured: dropping it halves the construct wall at 10× scale,
    # output proven row-identical).
    matches = bgp_query(
        triples, patterns, select=needed or None, distinct=False, **bgp_kwargs
    )

    return _template_expand(matches, template)


def _template_needed(template: list[tuple[str, str, str]]) -> list[str]:
    return sorted({t[1:] for tri in template for t in tri if _is_var(t)})


def _template_expand(
    matches: DataFrame, template: list[tuple[str, str, str]]
) -> DataFrame:
    """ONE pass over the matches: the template expands via an inline
    explode (a Generate node), never by unioning T copies of the match
    sub-plan — which would re-scan the corpus once per template
    triple."""

    def term_col(t: str):
        return F.col(t[1:]) if _is_var(t) else F.lit(t)

    shapes = []
    for tri in template:
        if len(tri) != 3:
            raise ValueError(f"template entry must be a 3-tuple: {tri!r}")
        shapes.append(
            F.struct(
                term_col(tri[0]).alias("subj"),
                term_col(tri[1]).alias("pred"),
                term_col(tri[2]).alias("obj"),
            )
        )
    return (
        matches.select(F.explode(F.array(*shapes)).alias("t"))
        .select("t.subj", "t.pred", "t.obj")
        .where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .distinct()
    )


def bgp_union(
    triples: DataFrame,
    groups: list[list[tuple[str, str, str]]],
    select: list[str],
    distinct: bool = False,
    allow_partial: bool = False,
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL UNION: the bag union of independently-compiled pattern
    groups projected onto a COMMON ``select`` list (explicit, because
    union semantics require aligned columns). By default every group
    must bind every selected variable; ``allow_partial=True`` instead
    NULL-fills the selected variables a branch does not bind (SPARQL's
    unbound-in-this-branch semantics — the branch-private-variable
    shape ``SELECT ?x ?y ?w { {?x knows ?y} UNION {?x works_at ?w} }``).
    A branch binding NONE of the selected variables is still an error
    (its rows would be all-NULL noise). ``bgp_kwargs`` apply to every
    group; note a FILTER/BIND over a variable some branch does not
    bind still raises in that branch — bind it or filter outside.
    """
    if len(groups) < 2:
        raise ValueError("UNION needs at least two pattern groups")
    graph_kw = bgp_kwargs.get("graph")
    graph_var = (
        graph_kw[1:]
        if isinstance(graph_kw, str) and _is_var(graph_kw) and len(graph_kw) > 1
        else None
    )
    parts = []
    for g in groups:
        if allow_partial:
            gvars = {
                t[1:]
                for pat in g
                for t in pat
                if isinstance(t, str) and t.startswith("?") and len(t) > 1
            }
            if graph_var is not None:
                # a GRAPH variable is bound by every branch
                gvars.add(graph_var)
            # BIND aliases are computed columns every branch produces —
            # they must reach bgp_query's select, not be NULL-filled
            gvars |= {
                alias for _e, alias in (bgp_kwargs.get("binds") or [])
            }
            sel = [v for v in select if v in gvars]
            if not sel:
                raise ValueError(
                    "UNION branch binds none of the selected "
                    f"variables {select!r}: {g!r}"
                )
            p = bgp_query(triples, g, select=sel, **bgp_kwargs)
            for v in select:
                if v not in sel:
                    p = p.withColumn(v, F.lit(None).cast("string"))
            p = p.select(*select)
        else:
            p = bgp_query(triples, g, select=select, **bgp_kwargs)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct() if distinct else out


_AGG_FUNCS = (
    "count",
    "count_distinct",
    "sum",
    "avg",
    "min",
    "max",
    "sample",
    "group_concat",
)


def bgp_aggregate(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    group_by: list[str],
    aggs: list[tuple[str, str, str]],
    having: list[tuple] | None = None,
    **bgp_kwargs,
) -> DataFrame:
    """SPARQL GROUP BY + aggregates over a BGP: compiles the match set
    with ``bgp_query`` then a ONE-shuffle hash aggregate (map-side
    partial aggregation comes free from Catalyst).

    ``group_by``: variable names (``?`` optional) to group on — may be
    empty for a whole-result aggregate (one output row).
    ``aggs``: ``(func, var, alias)`` triples; func in ``count``,
    ``count_distinct``, ``sum``, ``avg``, ``min``, ``max``. ``count``
    over ``"*"`` counts rows; over a variable it counts non-NULL
    bindings (the OPTIONAL-aware SPARQL semantics). Numeric funcs
    (sum/avg) try_cast the string binding to double — non-numeric
    bindings are ignored, SPARQL's silent-error aggregation.
    ``having``: post-aggregation filters in the same ``(lhs, op,
    rhs)`` shape as ``filters``, where lhs names a group key or an
    aggregate ALIAS (Catalyst evaluates them after the aggregate;
    numeric rhs compares numerically — aggregate outputs are already
    numeric, so the try_cast is a no-op there).
    ``bgp_kwargs`` pass to ``bgp_query`` (filters, optional, ...);
    ``select``/``distinct`` are owned by the aggregation."""
    for kw in ("select", "distinct"):
        if kw in bgp_kwargs:
            raise ValueError(f"bgp_aggregate() owns the {kw!r} argument")
    if not aggs:
        raise ValueError("bgp_aggregate needs at least one aggregate")
    keys = [g.lstrip("?") for g in group_by]
    needed = sorted(
        {*keys, *(a[1].lstrip("?") for a in aggs if a[1] != "*")}
    )
    matches = bgp_query(triples, patterns, select=needed or None, **bgp_kwargs)

    cols = []
    for spec_a in aggs:
        # (func, var, alias[, separator]) — the 4th slot is
        # group_concat's separator (default ",")
        func, var, alias = spec_a[0], spec_a[1], spec_a[2]
        sep = spec_a[3] if len(spec_a) > 3 else ","
        if func not in _AGG_FUNCS:
            raise ValueError(
                f"unsupported aggregate {func!r} (use one of {_AGG_FUNCS})"
            )
        a = alias.lstrip("?")
        if var == "*":
            if func != "count":
                raise ValueError(f"only count(*) may aggregate '*', not {func}")
            cols.append(F.count(F.lit(1)).alias(a))
            continue
        v = F.col(var.lstrip("?"))
        if func == "count":
            cols.append(F.count(v).alias(a))
        elif func == "count_distinct":
            cols.append(F.countDistinct(v).alias(a))
        elif func in ("sum", "avg"):
            agg = F.sum if func == "sum" else F.avg
            cols.append(agg(v.try_cast("double")).alias(a))
        elif func == "sample":
            # SPARQL SAMPLE may return ANY group member; we pick the
            # binary-collation minimum so the result is deterministic
            # (partitioning-invariant), which F.first is not
            cols.append(F.min(v).alias(a))
        elif func == "group_concat":
            # sorted elements: the SPARQL spec leaves element order
            # undefined — sorting makes the value deterministic and
            # cross-engine comparable; separator defaults to ","
            cols.append(
                F.array_join(F.array_sort(F.collect_list(v)), sep).alias(a)
            )
        else:  # min/max: string (binary-collation) semantics
            cols.append((F.min if func == "min" else F.max)(v).alias(a))
    out = matches.groupBy(*keys).agg(*cols)
    out_names = frozenset(keys) | {a[2].lstrip("?") for a in aggs}
    for flt in having or []:
        out = out.where(_compile_filter(out_names, flt))
    return out


def ask(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    **bgp_kwargs,
) -> bool:
    """SPARQL ASK: does at least one match exist? Compiles the same
    plan as ``bgp_query`` and takes ONE row — Spark stops the scan at
    the first match (CollectLimit), so an ASK against a selective
    pattern touches a fraction of the store."""
    if "select" in bgp_kwargs:
        raise ValueError("ask() owns the 'select' argument")
    return bool(bgp_query(triples, patterns, **bgp_kwargs).take(1))


def describe(
    triples: DataFrame,
    entity: str,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL DESCRIBE (concise-bounded-description lite): every triple
    where the entity is subject or object — the entity-card lookup a
    KG serves constantly. ONE scan with an OR filter (both halves push
    down); on a store bucketed/partitioned by subject the subj half
    prunes, and the obj half is the scan's residual filter."""
    return triples.where(
        (F.col(subj_col) == F.lit(entity)) | (F.col(obj_col) == F.lit(entity))
    )


def apply_rules(
    triples: DataFrame,
    rules: list[tuple[list[tuple[str, str, str]], list[tuple[str, str, str]]]],
    rounds: int = 3,
    path_depth: int = 8,
    semi_naive: bool = False,
    materialize_rounds: str | None = None,
) -> DataFrame:
    """Bounded forward chaining: apply every (patterns, template) rule
    to the accumulated triple set for a FIXED number of rounds,
    merging derivations back each round — naive Datalog evaluation
    with a deterministic, unrollable plan. Returns base ∪ derived.

    Derivations compound across rounds (a transitive rule doubles
    reachable path length per round after seeding, so ``rounds`` rounds
    close chains of length 2^(rounds-1)). Rounds are fixed, never convergence-tested:
    the plan shape is data-independent, which is what lets a DuckDB
    twin unroll it and a checkpointer resume it.

    Scale note (100 TB): each round costs one distinct shuffle of the
    accumulated set plus the rule joins. Naive evaluation
    (``semi_naive=False``) re-derives old facts every round — fine for
    the 2-3 fixed rounds ontology-style rules need. ``semi_naive=True``
    is the incremental path for corpora where re-derivation dominates:
    each round joins every rule once PER LEG with that one leg sourced
    from the previous round's DELTA and the rest from the full known
    set (any genuinely new fact must use ≥1 delta fact, so this is
    exhaustive), then anti-joins the derivations against the known set
    so later rounds touch only the frontier. Rounds stay fixed either
    way — the plan is data-independent and unrollable. Property-path
    (``pred+``) patterns are rejected under semi-naive: a path can mix
    old and delta edges, so per-leg delta sourcing would miss it.

    ``materialize_rounds="local"`` eagerly ``localCheckpoint``s the
    per-round state. The lazy default nests each round's plan inside
    the next (fine for the 2-3 rounds ontology rules need, and what
    the unrollable-oracle contract assumes); transitive rules double
    the plan per round, so for larger round counts — or any production
    run, where each round would be an Iceberg snapshot anyway —
    materialize to keep optimizer time flat and make rounds resumable.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not rules:
        raise ValueError("empty rule set")
    if materialize_rounds not in (None, "local"):
        raise ValueError(f"unknown materialize_rounds: {materialize_rounds!r}")

    def mat(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if materialize_rounds else df

    base = triples.select("subj", "pred", "obj")
    if not semi_naive:
        current = base
        for _ in range(rounds):
            derived = None
            for patterns, template in rules:
                d = construct(current, patterns, template, path_depth=path_depth)
                derived = d if derived is None else derived.unionByName(d)
            current = mat(current.unionByName(derived).distinct())
        return current

    for patterns, _ in rules:
        for pat in patterns:
            if len(pat) == 3 and _is_path_pred(pat[1]):
                raise ValueError(
                    "property-path patterns are not supported with "
                    f"semi_naive=True: {pat!r}"
                )
    known = base.distinct()
    return _semi_naive_rounds(
        known, known, rules, rounds, path_depth, mat
    )[0]


def _semi_naive_rounds(
    known: DataFrame,
    delta: DataFrame,
    rules: list[tuple[list[tuple[str, str, str]], list[tuple[str, str, str]]]],
    rounds: int,
    path_depth: int = 8,
    mat=lambda df: df,
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` semi-naive rounds from an EXPLICIT frontier:
    ``known`` is the complete fact set so far, ``delta`` the facts not
    yet propagated through the rules (``delta ⊆ known``). Returns
    (new_known, all_new_facts) — the second is everything derived
    beyond the input ``known``, which is exactly what an incremental
    consumer (streaming micro-batch) appends to its store."""
    # Sequence property paths (``a/b``) rewrite to chained atomic legs
    # over fresh internal variables BEFORE per-leg delta sourcing:
    # compiling the raw pattern would treat ``a/b`` as a literal
    # predicate literally named "a/b" and silently derive nothing. The
    # expansion lives HERE (not only in construct/apply_rules) so the
    # streaming caller gets identical semantics, and delta sourcing
    # then iterates the REWRITTEN legs — exhaustive, since any new
    # match must use ≥1 new fact in some expanded leg. A leg still
    # carrying +/* after expansion is rejected: a multi-hop closure can
    # mix old and delta edges, which per-leg delta sourcing misses.
    seq_counter = itertools.count()
    expanded_rules = []
    for patterns, template in rules:
        pats = _expand_paths(list(patterns), seq_counter)
        for pat in pats:
            if (
                len(pat) == 3
                and isinstance(pat[1], str)
                and _is_path_pred(pat[1])
            ):
                raise ValueError(
                    "property-path (+/*/?) patterns are not supported in "
                    f"semi-naive evaluation: {pat!r}"
                )
        expanded_rules.append((pats, template))
    rules = expanded_rules
    initial = known
    for _ in range(rounds):
        derived = None
        for patterns, template in rules:
            needed = _template_needed(template)
            for i in range(len(patterns)):
                legs = _compile_legs(
                    known, patterns, path_depth, src_overrides={i: delta}
                )
                matches, bound = _join_connected(legs)
                missing = [v for v in needed if v not in bound]
                if missing:
                    raise ValueError(
                        f"template variables not bound by rule: {missing}"
                    )
                d = _template_expand(
                    matches.select(*needed) if needed else matches, template
                )
                derived = d if derived is None else derived.unionByName(d)
        # the frontier: facts no earlier round (or the base) produced
        delta = mat(
            derived.distinct().join(
                known, on=["subj", "pred", "obj"], how="left_anti"
            )
        )
        known = mat(known.unionByName(delta))
    new_facts = known.join(initial, on=["subj", "pred", "obj"], how="left_anti")
    return known, new_facts
