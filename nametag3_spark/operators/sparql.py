"""A SPARQL text front end for the BGP compiler (operators/bgp.py).

Parses a pragmatic SPARQL subset onto the programmatic API — the
query-language surface a reference user actually types, compiled to
the same Catalyst plans the compiler already plan-guards:

    [PREFIX ns: <iri> ...] before any form — registered ns:local
      names expand to iri+local everywhere (incl. inside path
      operators: ns:a|ns:b); unregistered colons (entity ids like
      e:E1) pass through untouched; <IRI> angle tokens are accepted
      as plain terms
    DESCRIBE entity
    SELECT [DISTINCT] (*|?var...|(FUNC([DISTINCT] ?v|*) AS ?alias)...
                       |(expr AS ?alias)...)
        WHERE { ... } [GROUP BY ?v...] [HAVING (?alias op val)...]
        [ORDER BY (?v|expr|ASC(?v|expr)|DESC(?v|expr))...]
        [LIMIT n] [OFFSET n] — expr is the BIND expression grammar
        (e.g. ORDER BY DESC(STRLEN(?x)) ?x)
      aggregates: COUNT/SUM/AVG/MIN/MAX/SAMPLE/GROUP_CONCAT (SAMPLE
      = deterministic min; GROUP_CONCAT = sorted elements joined with
      "," or GROUP_CONCAT(?v, 'sep')); plain selected vars must be
      GROUP BY keys; SUM/AVG try_cast string bindings to double
      (non-numeric ignored — SPARQL's silent aggregation errors);
      (expr AS ?alias) projection expressions use the BIND grammar,
      evaluate at group end (SPARQL Extend) and cannot mix with
      aggregates in one SELECT
    ASK [WHERE] { ... }
    CONSTRUCT { template } WHERE { ... }

Inside ``WHERE { }``:
    s p o .                      triple pattern (vars start with ?,
                                 anything else is a literal; 'quoted'
                                 or "quoted" literals may hold spaces;
                                 property paths in the predicate
                                 position: ``p+`` one-or-more, ``p*``
                                 zero-or-more (reflexive over all
                                 graph terms), ``p?`` zero-or-one
                                 (direct edges + the same reflexive
                                 rows, no closure), ``^p``
                                 inverse, ``a/b`` sequence, ``a|b``
                                 alternation, and in the predicate
                                 slot a parenthesized group
                                 ``(a|b)`` / ``(a|b)+`` / ``(a|b)*``
                                 / ``(a|b)?`` / ``^(a|b)`` — closure
                                 over the alternation's edge union
                                 (also reachable quoted:
                                 ``'(a|b)+'``) — and SEQUENCES mixing
                                 groups with plain steps:
                                 ``(a|b)/c``, ``a/(b|c)+``; negated
                                 property sets ``!p`` / ``!(a|b)``
                                 (no closure/sequence tail); nested
                                 groups stay unsupported)
    OPTIONAL { ... }             left-join block (triple patterns,
                                 plus inner FILTER expressions scoped
                                 to the left join per SPARQL — a
                                 group row failing them does not
                                 extend; required rows survive with
                                 unbound variables)
    FILTER NOT EXISTS { ... }    anti-join block (triple patterns
                                 plus inner FILTER expressions; a
                                 filter naming an OUTER variable is
                                 the correlated form and compiles
                                 into the anti-join's ON condition —
                                 SPARQL substitution semantics)
    FILTER EXISTS { ... }        semi-join block (same body surface,
                                 correlated filters included)
    MINUS { ... }                SPARQL MINUS block (filters over the
                                 block's own variables only; per the
                                 spec its right side evaluates
                                 independently, so an outer-variable
                                 filter would match nothing — raises
                                 loudly instead)
    FILTER (?x > 3)              comparison filter (= == != < <= > >=;
                                 unquoted numeric rhs → numeric
                                 compare); also FILTER (?x != ?y);
                                 connectives ! && || compose atoms
                                 with SPARQL precedence (! tightest,
                                 && over ||, parens group; whitespace
                                 around && and || required) — Spark's
                                 three-valued NULL logic reproduces
                                 SPARQL's error-propagation table
                                 (error||true=true, error&&x=error)
    FILTER CONTAINS(?x, "s")     string predicates (CONTAINS,
                                 STRSTARTS, STRENDS, REGEX — with an
                                 optional flags argument, e.g.
                                 REGEX(?x, 'ab', 'i'), folded into
                                 the pattern as a (?i) inline group)
    FILTER (?x IN ('a', 'b'))    inline literal membership (one In
                                 predicate, pushed down; values
                                 compare as stored strings); also
                                 ?x NOT IN (...)
    FILTER BOUND(?v)             matched-OPTIONAL test; !BOUND(?v)
                                 keeps the UNmatched rows (the
                                 absent-fact negation idiom; parens
                                 optional)
    BIND (expr AS ?v)            computed binding; expr: ?vars,
                                 literals, numbers, CONCAT(...),
                                 COALESCE(a, b, ...) (first non-NULL
                                 — the OPTIONAL-default idiom),
                                 IF(cond, then, else) (cond is any
                                 FILTER boolean expression; NULL/error
                                 takes else), UCASE/LCASE/STRLEN/
                                 STR(x), SUBSTR(?x, start[, len])
                                 (1-based), REPLACE(?x, pat, rep)
                                 (regex), ABS/ROUND/FLOOR/CEIL(x)
                                 (numeric over double try_casts; ROUND
                                 half-up like SPARQL),
                                 STRBEFORE/STRAFTER(?x, 'sep') ('' on
                                 no match, per spec), and binary
                                 + - * / over double try_casts
                                 (whitespace around operators)
    { A } UNION { B }            bag union of plain-triple branches;
                                 composes with other patterns,
                                 OPTIONAL/MINUS/EXISTS, subqueries,
                                 SELECT * and aggregates — the chain
                                 compiles to one binding-set leg whose
                                 join surface is the variables EVERY
                                 branch binds (≥1 required);
                                 branch-PRIVATE variables survive
                                 NULL-filled in the non-binding
                                 branches (SPARQL unbound semantics) as
                                 long as nothing else in the group
                                 binds the same name (equality joins
                                 would drop the NULL rows — rename or
                                 bind in every branch); INSIDE a GRAPH
                                 block the branches scope to the
                                 literal graph or bind the GRAPH
                                 variable per row (same-graph join
                                 with the block's other patterns)
    { SELECT ... }               subquery: compiled to its own
                                 DataFrame (aggregates/ORDER/LIMIT
                                 allowed inside) and joined into the
                                 outer chain on its projected vars
    VALUES ?v { lit lit ... }    inline binding list (In-predicate)
    VALUES (?a ?b) { (x y) ... } multi-variable binding TABLE, joined
                                 like a pattern leg (row-correlated,
                                 unlike per-var lists)
    GRAPH ?g|lit { ... }         quad scope. A SINGLE block wrapping
                                 all triple patterns scopes the whole
                                 query (full surface incl. a UNION
                                 chain inside the block); multiple
                                 blocks and default-graph triples MIX
                                 per-block — each block compiles
                                 against its own graph and joins the
                                 chain on shared variables (the same
                                 ?g across two blocks = same graph
                                 per binding; a UNION inside a block
                                 requires the sole-block shape).
                                 Per-edge path kinds (inverse,
                                 sequence, alternation, negated sets)
                                 bind a graph VARIABLE; closures
                                 (+ * ?) stay rejected under one
                                 (multi-hop closures would mix
                                 graphs)

Not covered (use the programmatic API): nested non-subquery groups,
nested GRAPH blocks, subqueries inside a GRAPH **?variable** block
(a literal-graph block scopes its subqueries fine; a graph variable
would need per-graph re-evaluation — the parser accepts it and the
compiler raises), rich content
(OPTIONAL/FILTER/…) inside a MIXED GRAPH block (sole-wrapping blocks
take the full surface), and a UNION branch-private variable whose
NAME something else in the group also binds (needs a null-tolerant
compatible-join; the engine raises rather than silently dropping the
unbound branch's rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SparqlSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace() or c == ",":  # commas read as whitespace (arg lists)
            i += 1
        elif c == "#":  # comment to end of line
            while i < n and text[i] != "\n":
                i += 1
        elif c.isdigit() or (
            c == "-" and i + 1 < n and text[i + 1].isdigit()
        ):
            # digit-led token: dots are PART of it (decimals, dotted
            # timestamps) — except a single trailing dot, which is the
            # triple terminator
            j = i + 1
            while (
                j < n
                and not text[j].isspace()
                and text[j] not in "{}#'\"(),<>=!"
            ):
                j += 1
            tok = text[i:j]
            if tok.endswith(".") and not tok.endswith(".."):
                toks.append(tok[:-1])
                toks.append(".")
            else:
                toks.append(tok)
            i = j
        elif c in "{}.()":
            toks.append(c)
            i += 1
        elif c == "<" and (
            (close := text.find(">", i + 1)) > i + 1
            and not any(ch.isspace() for ch in text[i + 1 : close])
            and text[i + 1] not in "<>=!"
        ):
            # <IRI> — whitespace-free angle-bracketed token, tagged
            # like a quoted literal so keywords never fire inside it
            toks.append("\x00" + text[i + 1 : close])
            i = close + 1
        elif c in "<>=!":  # comparison operators: maximal run (>=, !=)
            j = i
            while j < n and text[j] in "<>=!":
                j += 1
            toks.append(text[i:j])
            i = j
        elif c in "'\"":
            j = text.find(c, i + 1)
            if j < 0:
                raise SparqlSyntaxError(f"unterminated string at offset {i}")
            toks.append("\x00" + text[i + 1 : j])  # \x00 marks "literal"
            i = j + 1
        else:
            j = i
            while (
                j < n
                and not text[j].isspace()
                and text[j] not in "{}.#'\"(),<>=!"
            ):
                j += 1
            toks.append(text[i:j])
            i = j
    return toks


def _untag(tok: str) -> str:
    return tok[1:] if tok.startswith("\x00") else tok


def _is_quoted(tok: str) -> bool:
    return tok.startswith("\x00")


_AGG_FNS = (
    "COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT",
)


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.pos = 0

    def peek(self) -> str | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.pos += 1
        return tok

    def expect(self, want: str) -> None:
        tok = self.next()
        if _untag(tok).upper() != want:
            raise SparqlSyntaxError(f"expected {want!r}, got {_untag(tok)!r}")

    def kw(self, word: str) -> bool:
        """Consume token if it equals the UNQUOTED keyword (case-insensitive)."""
        tok = self.peek()
        if tok is not None and not _is_quoted(tok) and tok.upper() == word:
            self.pos += 1
            return True
        return False

    def _next_is_select(self) -> bool:
        nxt = (
            self.toks[self.pos + 1] if self.pos + 1 < len(self.toks) else None
        )
        return (
            nxt is not None and not _is_quoted(nxt) and nxt.upper() == "SELECT"
        )

    # ---- grammar ------------------------------------------------------

    def term(self) -> str:
        """One subject/object term (never punctuation)."""
        tok = self.next()
        if not _is_quoted(tok) and tok in ("{", "}", ".", "(", ")"):
            raise SparqlSyntaxError(
                f"expected a term, got {tok!r} (triple needs 3 terms)"
            )
        return _untag(tok)

    def _path_group(self) -> str:
        """A parenthesized path group body after its ``(``: one
        alternation/predicate token, then ``)``. Prefix-expanded
        tokens arrive quoted and are accepted (the expansion
        angle-quotes IRIs, which the compiler treats as atomic)."""
        inner = self.next()
        if (not _is_quoted(inner)) and inner in ("{", "}", ".", "(", ")"):
            raise SparqlSyntaxError(
                f"expected a path inside (...), got {_untag(inner)!r}"
            )
        self.expect(")")
        return f"({_untag(inner)})"

    def pred_term(self) -> str:
        """One predicate term; additionally accepts PARENTHESIZED path
        groups — ``(a|b)``, ``(a|b)+``, ``(a|b)*``, ``(a|b)?``,
        inverse ``^(a|b)`` — and SEQUENCES mixing groups with plain
        steps (``(a|b)/c``, ``a/(b|c)+``), reassembled into the
        compiler's path form (previously only reachable by quoting
        the whole path: ``'(a|b)+/c'``). Nested groups stay
        unsupported (quote them or use the programmatic API)."""
        tok = self.next()
        if _is_quoted(tok):
            return _untag(tok)
        if tok == "^" and self.peek() == "(":
            self.next()
            path = "^" + self._path_group()
        elif tok == "!":
            # negated property set: !p / !(a|b) (the tokenizer splits
            # the operator run off the name, so reassemble)
            nxt = self.peek()
            if nxt is not None and not _is_quoted(nxt) and nxt == "(":
                self.next()
                path = "!" + self._path_group()
            elif (
                nxt is not None
                and not _is_quoted(nxt)
                and nxt not in ("{", "}", ".", ")")
            ):
                path = "!" + self.next()
            else:
                raise SparqlSyntaxError(
                    f"expected a predicate after '!', got {nxt!r}"
                )
            return path  # negated sets take no closure/sequence tail
        elif tok == "(":
            path = self._path_group()
        elif tok in ("{", "}", ".", ")"):
            raise SparqlSyntaxError(
                f"expected a term, got {tok!r} (triple needs 3 terms)"
            )
        else:
            path = tok
        # sequence / closure continuations: the tokenizer breaks at
        # parens, so "(a|b)+/c" arrives as  ( a|b ) +/c  and
        # "a/(b|c)" as  a/ ( b|c )
        while True:
            nxt = self.peek()
            if nxt is None or _is_quoted(nxt):
                break
            if (
                path.endswith(")")
                and nxt[0] in "+*?"
                and (len(nxt) == 1 or nxt[1] == "/")
            ):
                path += self.next()  # closure char (+ optional /rest)
            elif path.endswith("/") and nxt == "(":
                self.next()
                path += self._path_group()
            elif path.endswith(")") and nxt.startswith("/"):
                path += self.next()
            else:
                break
        if path.endswith("/"):
            raise SparqlSyntaxError(f"dangling sequence path: {path!r}")
        return path

    def triples(self) -> list[tuple[str, str, str]]:
        """Triple patterns until '}' (no nested blocks allowed here)."""
        out = []
        while self.peek() is not None and self.peek() != "}":
            out.append((self.term(), self.pred_term(), self.term()))
            if self.peek() == ".":
                self.next()
        return out

    def block(self) -> list[tuple[str, str, str]]:
        self.expect("{")
        t = self.triples()
        self.expect("}")
        if not t:
            raise SparqlSyntaxError("empty block")
        return t

    def optional_block(self, kind: str = "OPTIONAL"):
        """A sub-group body: triple patterns plus inner FILTER
        expressions. Used for OPTIONAL (filters scoped to the
        left-join per SPARQL), FILTER [NOT] EXISTS (filters evaluate
        inside the witness pattern) and MINUS (the right side
        evaluates independently, so its filters see only its own
        bindings) — see ``bgp_query``. Returns a plain pattern list
        when no filter is present (the back-compatible shape), else a
        ``{"patterns", "filters"}`` dict."""
        self.expect("{")
        pats: list[tuple[str, str, str]] = []
        flts: list[tuple] = []
        while self.peek() is not None and self.peek() != "}":
            if self.kw("FILTER"):
                flts.append(self.filter_expr())
            else:
                pats.append((self.term(), self.pred_term(), self.term()))
                if self.peek() == ".":
                    self.next()
        self.expect("}")
        if not pats:
            raise SparqlSyntaxError(f"empty {kind} group")
        return {"patterns": pats, "filters": flts} if flts else pats

    _GROUP_KEYS = (
        "patterns", "optional", "not_exists", "exists", "minus",
        "binds", "filters", "subqueries", "values_rows",
    )

    @staticmethod
    def _fresh_group() -> dict:
        return {
            "patterns": [],
            "optional": [],
            "not_exists": [],
            "exists": [],
            "minus": [],
            "binds": [],
            "filters": [],
            "subqueries": [],
            "values_rows": [],
            "union": None,
            "values": {},
            "graph": None,
            "graph_legs": [],
            "graph_subqueries": [],
        }

    def _group_item(self, out: dict, graph_blocks: list | None) -> None:
        """Parse ONE WHERE-group item into ``out``. ``graph_blocks``
        is the collector for GRAPH blocks (None when already INSIDE a
        block — nesting raises). A GRAPH block parses with the same
        item grammar, so OPTIONAL/FILTER/MINUS/EXISTS/BIND/VALUES and
        one UNION chain may sit inside it; ``group()`` resolves at the
        end whether the block wraps the whole query (full surface,
        whole-query scope) or mixes per-block (triples only)."""
        tok = self.peek()
        if self.kw("OPTIONAL"):
            out["optional"].append(self.optional_block())
        elif self.kw("FILTER"):
            if self.kw("NOT"):
                self.expect("EXISTS")
                out["not_exists"].append(self.optional_block("NOT EXISTS"))
            elif self.kw("EXISTS"):
                out["exists"].append(self.optional_block("EXISTS"))
            else:
                out["filters"].append(self.filter_expr())
        elif self.kw("MINUS"):
            out["minus"].append(self.optional_block("MINUS"))
        elif self.kw("BIND"):
            out["binds"].append(self.bind_clause())
        elif tok == "{" and self._next_is_select():
            # { SELECT ... } subquery: compiled to its own
            # DataFrame and joined into the chain on shared vars.
            # Inside a GRAPH block (graph_blocks is None) the subquery
            # lands in the block's own list; group() moves it to
            # ``graph_subqueries`` so it compiles against the SCOPED
            # store instead of the default-graph union.
            self.next()  # '{'
            if not self.kw("SELECT"):
                raise SparqlSyntaxError("expected SELECT in subquery")
            out["subqueries"].append(self.select_query())
            self.expect("}")
        elif tok == "{":
            # { A } UNION { B } [UNION { C } ...]
            branches = [self.block()]
            while self.kw("UNION"):
                branches.append(self.block())
            if len(branches) < 2:
                raise SparqlSyntaxError(
                    "a braced group must be part of a UNION"
                )
            if out["union"] is not None:
                raise SparqlSyntaxError(
                    "only one UNION chain per WHERE group"
                )
            out["union"] = branches
        elif self.kw("VALUES"):
            if self.peek() == "(":
                # multi-variable form: VALUES (?a ?b) { (x y) ... }
                self.next()
                vs: list[str] = []
                while self.peek() is not None and self.peek() != ")":
                    v = _untag(self.next())
                    if not v.startswith("?") or len(v) < 2:
                        raise SparqlSyntaxError(
                            f"VALUES needs ?vars, got {v!r}"
                        )
                    vs.append(v[1:])
                self.expect(")")
                if not vs:
                    raise SparqlSyntaxError("empty VALUES variable list")
                self.expect("{")
                rows: list[tuple] = []
                while self.peek() is not None and self.peek() != "}":
                    self.expect("(")
                    row = []
                    while self.peek() is not None and self.peek() != ")":
                        row.append(_untag(self.next()))
                    self.expect(")")
                    if len(row) != len(vs):
                        raise SparqlSyntaxError(
                            f"VALUES row width {len(row)} != "
                            f"{len(vs)} variables"
                        )
                    rows.append(tuple(row))
                self.expect("}")
                if not rows:
                    raise SparqlSyntaxError("empty VALUES row list")
                out["values_rows"].append((vs, rows))
            else:
                var = _untag(self.next())
                if not var.startswith("?"):
                    raise SparqlSyntaxError(
                        f"VALUES needs a ?var, got {var!r}"
                    )
                self.expect("{")
                lits = []
                while self.peek() is not None and self.peek() != "}":
                    lits.append(_untag(self.next()))
                self.expect("}")
                out["values"][var[1:]] = lits
        elif self.kw("GRAPH"):
            if graph_blocks is None:
                raise SparqlSyntaxError(
                    "nested GRAPH blocks are not supported"
                )
            blk = self._fresh_group()
            blk["term"] = _untag(self.next())
            self.expect("{")
            while self.peek() is not None and self.peek() != "}":
                self._group_item(blk, None)
            self.expect("}")
            if not blk["patterns"] and blk["union"] is None:
                raise SparqlSyntaxError("empty GRAPH block")
            graph_blocks.append(blk)
        else:
            # plain triples until the next keyword/brace
            out["patterns"].append(
                (self.term(), self.pred_term(), self.term())
            )
            if self.peek() == ".":
                self.next()

    def group(self) -> dict:
        """The WHERE group: returns bgp_query kwargs. GRAPH blocks
        resolve at the end: a single block that is the only pattern
        source wraps the whole query (its items merge into the group —
        OPTIONAL/MINUS/EXISTS/FILTER all join the scoped chain);
        otherwise blocks mix per-block as extra legs (triples only)."""
        out = self._fresh_group()
        graph_blocks: list[dict] = []
        self.expect("{")
        while True:
            tok = self.peek()
            if tok is None:
                raise SparqlSyntaxError("unterminated group (missing '}')")
            if tok == "}":
                self.next()
                break
            self._group_item(out, graph_blocks)
        if graph_blocks:
            sole = (
                len(graph_blocks) == 1
                and not out["patterns"]
                and out["union"] is None
            )
            if sole:
                # the single-wrapping shape keeps the whole-query
                # scope path: block items merge with anything parsed
                # outside the braces (same engine semantics — the
                # scoped source feeds every sub-plan)
                blk = graph_blocks[0]
                out["graph"] = blk["term"]
                out["union"] = blk["union"]
                # block subqueries compile against the SCOPED store;
                # subqueries parsed outside the braces stay unscoped —
                # keep the two lists apart before the key merge
                out["graph_subqueries"] = blk.pop("subqueries")
                blk["subqueries"] = []
                for k in self._GROUP_KEYS:
                    out[k] = blk[k] + out[k]
                out["values"] = {**blk["values"], **out["values"]}
            else:
                # per-block mixing: each block compiles to its own
                # extra leg against its graph and joins the
                # default-graph chain on shared variables (same
                # variable name across two GRAPH ?g blocks = same
                # graph per binding)
                for blk in graph_blocks:
                    rich = blk["union"] is not None or blk["values"] or any(
                        blk[k]
                        for k in self._GROUP_KEYS
                        if k != "patterns"
                    )
                    if rich:
                        raise SparqlSyntaxError(
                            "non-triple items inside a GRAPH block require "
                            "that block to be the query's only graph "
                            "pattern"
                        )
                out["graph_legs"] = [
                    (b["term"], b["patterns"]) for b in graph_blocks
                ]
        return out

    def select_query(self) -> dict:
        """The SELECT form AFTER its keyword was consumed: select
        list, WHERE group, GROUP BY/HAVING, solution modifiers —
        reused verbatim for ``{ SELECT ... }`` subqueries (the closing
        outer ``}`` naturally ends the modifier loop)."""
        distinct = self.kw("DISTINCT")
        select: list[str] | None
        aggs: list[tuple[str, str, str]] = []
        expr_selects: list[tuple] = []
        if self.peek() == "*":
            self.next()
            select = None
        else:
            select = []
            while True:
                tok = self.peek()
                if tok is None or _is_quoted(tok):
                    break
                if tok.startswith("?"):
                    select.append(self.next()[1:])
                elif tok == "(":
                    # disambiguate by lookahead: '( FUNC (' with an
                    # aggregate FUNC is an aggregate item, anything
                    # else is a projection expression '( expr AS ?a )'
                    # — the BIND grammar verbatim
                    nxt = (
                        self.toks[self.pos + 1]
                        if self.pos + 1 < len(self.toks)
                        else None
                    )
                    nxt2 = (
                        self.toks[self.pos + 2]
                        if self.pos + 2 < len(self.toks)
                        else None
                    )
                    if (
                        nxt is not None
                        and not _is_quoted(nxt)
                        and nxt.upper() in _AGG_FNS
                        and nxt2 == "("
                    ):
                        aggs.append(self.agg_item())
                    else:
                        e, alias = self.bind_clause()
                        expr_selects.append((e, alias))
                        select.append(alias)
                else:
                    break
            if not select and not aggs:
                raise SparqlSyntaxError("SELECT needs '*', ?vars or (AGG...)")
        self.expect("WHERE")
        g = self.group()
        if expr_selects:
            if aggs:
                raise SparqlSyntaxError(
                    "SELECT expressions cannot mix with aggregates "
                    "(project the aggregate, BIND afterwards in an "
                    "outer query)"
                )
            # a projection expression IS a BIND evaluated at group end
            # (SPARQL 18.2.4.4 Extend): it may reference group BIND
            # aliases and its alias must be fresh — both enforced by
            # the engine's bind chain
            g["binds"] = (g["binds"] or []) + expr_selects
        group_by: list[str] = []
        if self.kw("GROUP"):
            self.expect("BY")
            while self.peek() is not None and self.peek().startswith("?"):
                group_by.append(self.next()[1:])
            if not group_by:
                raise SparqlSyntaxError("GROUP BY needs at least one ?var")
        having: list[tuple] = []
        while self.kw("HAVING"):
            having.append(self.filter_expr())
        if having and not aggs:
            raise SparqlSyntaxError("HAVING needs aggregates in SELECT")
        if aggs:
            if select is None:
                raise SparqlSyntaxError("SELECT * cannot mix with aggregates")
            stray = [v for v in select if v not in group_by]
            if stray:
                raise SparqlSyntaxError(
                    f"non-aggregated SELECT vars must be in GROUP BY: {stray}"
                )
        elif group_by:
            raise SparqlSyntaxError("GROUP BY without aggregates in SELECT")
        order, limit, offset = self.modifiers()
        return {
            "form": "select",
            "select": select,
            "distinct": distinct,
            "aggs": aggs,
            "group_by": group_by,
            "having": having,
            "order": order,
            "limit": limit,
            "offset": offset,
            **g,
        }

    def agg_item(self) -> tuple[str, str, str]:
        """``( FUNC([DISTINCT] ?v|*) AS ?alias )`` in the SELECT list
        → an engine ``(func, var, alias)`` triple. FUNC: COUNT, SUM,
        AVG, MIN, MAX; ``COUNT(DISTINCT ?v)`` → ``count_distinct``."""
        self.expect("(")
        fn_tok = self.next()
        fn = _untag(fn_tok).upper()
        if _is_quoted(fn_tok) or fn not in _AGG_FNS:
            raise SparqlSyntaxError(f"unsupported aggregate: {_untag(fn_tok)!r}")
        func = fn.lower()
        self.expect("(")
        if self.kw("DISTINCT"):
            if func != "count":
                raise SparqlSyntaxError("DISTINCT only inside COUNT(...)")
            func = "count_distinct"
        var = _untag(self.next())
        if var != "*" and not var.startswith("?"):
            raise SparqlSyntaxError(f"aggregate needs ?var or *, got {var!r}")
        if var == "*" and func != "count":
            raise SparqlSyntaxError(f"only COUNT may aggregate '*', not {fn}")
        sep = None
        if (
            func == "group_concat"
            and self.peek() is not None
            and self.peek() != ")"
        ):
            # pragmatic separator form: GROUP_CONCAT(?v, 'sep') — the
            # tokenizer reads commas as whitespace and the separator
            # must be quoted (SPARQL's SEPARATOR= keyword syntax needs
            # ';' tokenization the term grammar doesn't reserve)
            sep_tok = self.next()
            if not _is_quoted(sep_tok):
                raise SparqlSyntaxError(
                    "GROUP_CONCAT separator must be a quoted literal, "
                    f"got {_untag(sep_tok)!r}"
                )
            sep = _untag(sep_tok)
        self.expect(")")
        self.expect("AS")
        alias = _untag(self.next())
        if not alias.startswith("?"):
            raise SparqlSyntaxError(f"AS needs a ?alias, got {alias!r}")
        self.expect(")")
        if sep is not None:
            return (func, var, alias[1:], sep)
        return (func, var, alias[1:])

    def modifiers(self) -> tuple[list[tuple[str, bool]], int | None, int | None]:
        """Solution modifiers after the WHERE group: ORDER BY
        (``?v`` | ``ASC(?v)`` | ``DESC(?v)``)..., LIMIT n, OFFSET n —
        LIMIT/OFFSET accepted in either order."""
        order: list[tuple[str, bool]] = []
        limit: int | None = None
        offset: int | None = None

        def _int(what: str) -> int:
            tok = self.next()
            try:
                v = int(tok)
            except ValueError:
                raise SparqlSyntaxError(f"{what} needs an integer, got {tok!r}")
            if v < 0:
                raise SparqlSyntaxError(f"{what} must be non-negative")
            return v

        _EXPR_LEADS = (
            "CONCAT", "COALESCE", "UCASE", "LCASE", "STRLEN", "STR",
            "SUBSTR", "REPLACE", "IF",
        )

        def _order_key(self=self):
            """A sort key: a plain ``?var`` keeps the (name, asc) spec
            shape; an expression (``STRLEN(?x)``, …) parses through
            the BIND expression grammar into ``(("expr", node), asc)``."""
            tok = self.peek()
            if (
                tok is not None
                and not _is_quoted(tok)
                and tok.startswith("?")
                and len(tok) > 1
            ):
                return self.next()[1:]
            return ("expr", self.expr())

        while True:
            if self.kw("ORDER"):
                self.expect("BY")
                saw = False
                while True:
                    tok = self.peek()
                    if tok is None or _is_quoted(tok):
                        break
                    if tok.upper() in ("ASC", "DESC"):
                        asc = self.next().upper() == "ASC"
                        self.expect("(")
                        key = _order_key()
                        self.expect(")")
                        order.append(
                            (key if isinstance(key, tuple) else key.lstrip("?"),
                             asc)
                        )
                        saw = True
                    elif tok.startswith("?"):
                        order.append((self.next()[1:], True))
                        saw = True
                    elif tok.upper() in _EXPR_LEADS:
                        order.append((("expr", self.expr()), True))
                        saw = True
                    else:
                        break
                if not saw:
                    raise SparqlSyntaxError("ORDER BY needs at least one ?var")
            elif self.kw("LIMIT"):
                limit = _int("LIMIT")
            elif self.kw("OFFSET"):
                offset = _int("OFFSET")
            else:
                return order, limit, offset

    def bind_clause(self) -> tuple:
        """``BIND ( expr AS ?alias )`` → an engine ``(expr, alias)``
        pair. Expression terms need whitespace around arithmetic
        operators (``?x + 1``, not ``?x+1``)."""
        self.expect("(")
        e = self.expr()
        self.expect("AS")
        alias = _untag(self.next())
        if not alias.startswith("?") or len(alias) < 2:
            raise SparqlSyntaxError(f"BIND ... AS needs a ?alias, got {alias!r}")
        self.expect(")")
        return (e, alias[1:])

    def expr(self):
        """A BIND expression: term [op term] with op in + - * /."""
        left = self.expr_term()
        tok = self.peek()
        if tok is not None and not _is_quoted(tok) and tok in ("+", "-", "*", "/"):
            op = self.next()
            return (op, left, self.expr_term())
        return left

    def expr_term(self):
        tok = self.next()
        if _is_quoted(tok):
            return _untag(tok)
        if tok == "(":
            e = self.expr()
            self.expect(")")
            return e
        up = tok.upper()
        if up == "IF":
            # IF(cond, then, else): the condition is a FILTER boolean
            # expression (connectives/BOUND/comparisons all work)
            self.expect("(")
            cond = self._bool_or()
            then_e = self.expr()
            else_e = self.expr()
            self.expect(")")
            return ("if", cond, then_e, else_e)
        if up in ("CONCAT", "COALESCE", "UCASE", "LCASE", "STRLEN",
          "STR", "SUBSTR", "REPLACE", "ABS", "ROUND", "FLOOR", "CEIL",
          "STRBEFORE", "STRAFTER"):
            self.expect("(")
            args = []
            while self.peek() != ")":
                if self.peek() is None:
                    raise SparqlSyntaxError("unterminated expression")
                args.append(self.expr())
            self.next()  # consume ')'
            return (up.lower(), *args)
        if tok.startswith("?"):
            return tok
        try:
            return int(tok)
        except ValueError:
            try:
                return float(tok)
            except ValueError:
                return tok  # plain unquoted literal

    def filter_expr(self) -> tuple:
        """FILTER constraint → an engine filter node: an atom
        ``(lhs, op, rhs)`` triple or a compound ``("and"|"or"|"not",
        ...)`` tree. SPARQL shape: a bracketted boolean expression —
        ``FILTER (?x > 3 && (CONTAINS(?n, 'a') || !BOUND(?w)))`` —
        or a bare builtin call ``FILTER CONTAINS(?x, 'lit')`` /
        ``FILTER BOUND(?v)`` / ``FILTER !BOUND(?v)``. Connectives
        ``!  &&  ||`` follow SPARQL precedence (! binds tightest) and
        need surrounding whitespace, like BIND arithmetic. Unquoted
        numeric rhs tokens compare numerically."""
        tok = self.peek()
        if tok == "(":
            self.next()
            node = self._bool_or()
            self.expect(")")
            return node
        if tok == "!":
            return self._bool_unary()
        # a bare (unbracketted) constraint must be a builtin call —
        # SPARQL's FILTER grammar; plain comparisons need parens
        if tok is None or _is_quoted(tok) or tok.upper() not in (
            "BOUND", "CONTAINS", "STRSTARTS", "STRENDS", "REGEX",
        ):
            raise SparqlSyntaxError(
                "FILTER needs (...), BOUND(...), or "
                "CONTAINS/STRSTARTS/STRENDS/REGEX(...)"
            )
        return self._filter_atom()

    def _bool_or(self):
        parts = [self._bool_and()]
        while self.peek() == "||":
            self.next()
            parts.append(self._bool_and())
        return parts[0] if len(parts) == 1 else ("or", *parts)

    def _bool_and(self):
        parts = [self._bool_unary()]
        while self.peek() == "&&":
            self.next()
            parts.append(self._bool_unary())
        return parts[0] if len(parts) == 1 else ("and", *parts)

    def _bool_unary(self):
        if self.peek() == "!":
            self.next()
            inner = self._bool_unary()
            if (
                isinstance(inner, tuple)
                and len(inner) == 3
                and inner[1] == "bound"
            ):
                # !BOUND folds into the atom's dedicated engine shape
                return (inner[0], "bound", not inner[2])
            return ("not", inner)
        if self.peek() == "(":
            self.next()
            node = self._bool_or()
            self.expect(")")
            return node
        return self._filter_atom()

    def _filter_atom(self) -> tuple:
        """One comparison or builtin call → an ``(lhs, op, rhs)``
        triple."""
        tok = self.peek()
        if tok is not None and not _is_quoted(tok) and tok.upper() == "BOUND":
            self.next()
            self.expect("(")
            var = _untag(self.next())
            if not var.startswith("?") or len(var) < 2:
                raise SparqlSyntaxError(f"BOUND needs a ?var, got {var!r}")
            self.expect(")")
            return (var, "bound", True)
        if (
            tok is not None
            and not _is_quoted(tok)
            and tok.upper() in ("CONTAINS", "STRSTARTS", "STRENDS", "REGEX")
        ):
            fn = self.next().lower()
            self.expect("(")
            lhs = _untag(self.next())
            rhs = _untag(self.next())
            if fn == "regex" and self.peek() != ")":
                flags = _untag(self.next())
                if not flags or not set(flags) <= set("ismx"):
                    raise SparqlSyntaxError(
                        f"unsupported REGEX flags: {flags!r}"
                    )
                rhs = f"(?{flags}){rhs}"  # Java inline flag group
            self.expect(")")
            return (lhs, fn, rhs)
        if tok is None or not _untag(tok).startswith("?"):
            raise SparqlSyntaxError(
                "FILTER needs (...), BOUND(...), or "
                "CONTAINS/STRSTARTS/REGEX(...)"
            )
        lhs = _untag(self.next())
        op = self.next()
        if not _is_quoted(op) and op.upper() in ("IN", "NOT"):
            negate = op.upper() == "NOT"
            if negate and not self.kw("IN"):
                raise SparqlSyntaxError("expected IN after NOT in FILTER")
            self.expect("(")
            lits: list[str] = []
            while self.peek() is not None and self.peek() != ")":
                lits.append(_untag(self.next()))
            self.expect(")")
            if not lits:
                raise SparqlSyntaxError("empty IN list")
            atom = (lhs, "in", tuple(lits))
            return ("not", atom) if negate else atom
        if _is_quoted(op) or op not in ("=", "==", "!=", "<", "<=", ">", ">="):
            raise SparqlSyntaxError(f"unsupported FILTER operator: {op!r}")
        rhs_tok = self.next()
        rhs: object = _untag(rhs_tok)
        if not _is_quoted(rhs_tok) and not rhs_tok.startswith("?"):
            try:
                rhs = int(rhs_tok)
            except ValueError:
                try:
                    rhs = float(rhs_tok)
                except ValueError:
                    pass
        return (lhs, op, rhs)


def parse(query: str) -> dict:
    """Parse to an execution spec: {form, select, distinct, template,
    **group-kwargs}. ``form`` is 'select' | 'ask' | 'construct'."""
    p = _Parser(_tokenize(query))
    # PREFIX ns: <iri> headers: expand registered ns:local tokens to
    # iri+local IN PLACE (tagged as literals so keywords never fire).
    # Unregistered colon-bearing tokens (entity ids like e:E1) pass
    # through untouched.
    prefixes: dict[str, str] = {}
    while p.kw("PREFIX"):
        name = _untag(p.next())
        if not name.endswith(":") or len(name) < 2:
            raise SparqlSyntaxError(f"PREFIX needs 'ns:', got {name!r}")
        iri_tok = p.next()
        prefixes[name] = _untag(iri_tok)
    if prefixes:
        import re as _re

        def _sub(m):
            ns = m.group(1) + ":"
            if ns in prefixes:
                # angle-quote the expanded name: IRIs contain the path
                # operator characters (/ |), and the engine treats
                # <...> as atomic
                return "<" + prefixes[ns] + m.group(2) + ">"
            return m.group(0)

        pat = _re.compile(r"([A-Za-z][\w.-]*):([\w.-]+)")
        lone = _re.compile(r"<[^<>]*>")
        for idx in range(p.pos, len(p.toks)):
            tok = p.toks[idx]
            if _is_quoted(tok) or ":" not in tok or tok.startswith("?"):
                continue
            expanded = pat.sub(_sub, tok)
            if expanded != tok:
                if lone.fullmatch(expanded):
                    # a single name (subj/obj positions compare it to
                    # plain stored values): drop the quoting again
                    expanded = expanded[1:-1]
                p.toks[idx] = "\x00" + expanded
    if p.kw("SELECT"):
        spec = p.select_query()
    elif p.kw("DESCRIBE"):
        ent_tok = p.next()
        spec = {"form": "describe", "entity": _untag(ent_tok)}
    elif p.kw("ASK"):
        p.kw("WHERE")  # optional keyword
        g = p.group()
        spec = {"form": "ask", **g}
    elif p.kw("CONSTRUCT"):
        template = p.block()
        p.expect("WHERE")
        g = p.group()
        spec = {"form": "construct", "template": template, **g}
    else:
        raise SparqlSyntaxError(
            f"query must start with SELECT/ASK/CONSTRUCT, got {p.peek()!r}"
        )
    if p.peek() is not None:
        raise SparqlSyntaxError(f"trailing tokens after query: {p.peek()!r}")
    return spec


def _union_branch_vars(patterns: list[tuple[str, str, str]]) -> set[str]:
    return {
        t[1:]
        for pat in patterns
        for t in pat
        if isinstance(t, str) and t.startswith("?") and len(t) > 1
    }


def _union_leg(
    triples: DataFrame,
    branches: list,
    engine_kwargs: dict,
    graph: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """Compile a UNION chain into ONE binding-set DataFrame so it joins
    the rest of the WHERE group like any other leg (the same extra_legs
    machinery subqueries use). The variables bound by EVERY branch are
    the leg's join surface (at least one required — they are what
    connects the chain); branch-PRIVATE variables ride along NULL-filled
    in the branches that do not bind them (SPARQL's unbound-in-this-
    branch semantics) and are returned so the caller can reject a
    collision with a variable the rest of the group binds — a private
    column doubling as a join key would need SPARQL's null-tolerant
    compatible-join, which equality joins don't give."""
    from nametag3_spark.operators.bgp import bgp_union

    var_sets = [_union_branch_vars(b) for b in branches]
    if graph is not None and graph.startswith("?"):
        # a GRAPH variable is bound by EVERY branch (the per-branch
        # graph kwarg forces it) — it joins the leg to the scoped
        # outer patterns, keeping the whole query within one graph
        # per binding
        var_sets = [vs | {graph[1:]} for vs in var_sets]
    shared = sorted(set.intersection(*var_sets))
    if not shared:
        raise SparqlSyntaxError(
            "UNION branches bind no common variable — nothing to align "
            "the union columns on"
        )
    all_vars = sorted(set.union(*var_sets))
    private = [v for v in all_vars if v not in shared]
    allowed = {
        "path_depth", "pred_stats", "subj_col", "pred_col", "obj_col",
        "graph_col",
    }
    g_kwargs = {k: v for k, v in engine_kwargs.items() if k in allowed}
    if graph is not None:
        g_kwargs["graph"] = graph  # literal filter or variable binding
    leg = bgp_union(
        triples,
        branches,
        select=all_vars,
        allow_partial=bool(private),
        **g_kwargs,
    )
    return leg, private


def _union_is_sole_pattern(spec: dict) -> bool:
    """True when the UNION chain is the only graph pattern of the WHERE
    group (FILTER/BIND/VALUES may accompany it) — the shape the direct
    bgp_union fast path serves without an extra join."""
    return not (
        spec["patterns"]
        or spec["optional"]
        or spec["not_exists"]
        or spec["exists"]
        or spec["minus"]
        or spec["subqueries"]
        or spec["values_rows"]
        or spec["graph"] is not None
        or spec.get("graph_legs")
    )


def _common_kwargs(
    spec: dict,
    engine_kwargs: dict,
    triples: DataFrame,
    compose_union: bool = True,
) -> dict:
    """Group-level bgp_query kwargs from a spec, with subqueries
    compiled recursively into extra_legs. ``compose_union=True`` also
    compiles a UNION chain into an extra leg (callers taking the
    standalone bgp_union fast path pass False)."""
    common = dict(
        optional=spec["optional"] or None,
        not_exists=spec["not_exists"] or None,
        exists=spec["exists"] or None,
        minus=spec["minus"] or None,
        binds=spec["binds"] or None,
        filters=spec["filters"] or None,
        values=spec["values"] or None,
        graph=spec["graph"],
        **engine_kwargs,
    )
    legs = [
        _compile_select(triples, sub, engine_kwargs)
        for sub in spec["subqueries"]
    ]
    if spec.get("graph_subqueries"):
        # a subquery INSIDE a GRAPH block compiles against the scoped
        # store: literal graph = the quad store filtered to that graph
        # (the filter pushes into the subquery's scans like any leg's).
        # A GRAPH ?var would need the subquery re-run per graph with
        # ?var joined through — not expressible as one pre-filter, so
        # it stays rejected, loudly, at compile time.
        g = spec["graph"]
        if g is None or g.startswith("?"):
            raise SparqlSyntaxError(
                "subqueries inside GRAPH require a literal graph term "
                "(GRAPH ?var would need per-graph re-evaluation); name "
                "the graph or move the subquery outside the block"
            )
        from pyspark.sql import functions as F

        gcol = engine_kwargs.get("graph_col", "graph")
        scoped = triples.where(F.col(gcol) == F.lit(g))
        for sub in spec["graph_subqueries"]:
            if sub.get("graph") is not None or sub.get("graph_legs"):
                raise SparqlSyntaxError(
                    "a subquery inside a GRAPH block cannot itself use "
                    "GRAPH (the outer block already fixes the scope)"
                )
            legs.append(_compile_select(scoped, sub, engine_kwargs))
    for g_term, g_pats in spec.get("graph_legs") or []:
        # per-block GRAPH: the block compiles against its own graph
        # (literal = pushed-down filter; variable = bound column) and
        # joins the default-graph chain like any leg
        from nametag3_spark.operators.bgp import bgp_query

        sel = sorted(
            _union_branch_vars(g_pats)
            | ({g_term[1:]} if g_term.startswith("?") else set())
        )
        allowed = {
            "path_depth", "pred_stats", "subj_col", "pred_col",
            "obj_col", "graph_col",
        }
        legs.append(
            bgp_query(
                triples,
                g_pats,
                select=sel,
                graph=g_term,
                **{k: v for k, v in engine_kwargs.items() if k in allowed},
            )
        )
    for vs, rows in spec.get("values_rows") or []:
        # multi-var VALUES: an inline binding table joined like a leg
        legs.append(
            triples.sparkSession.createDataFrame(
                rows, ", ".join(f"{v} string" for v in vs)
            )
        )
    if compose_union and spec.get("union") is not None:
        u_leg, private = _union_leg(
            triples, spec["union"], engine_kwargs, graph=spec.get("graph")
        )
        if private:
            # A branch-private variable survives the composed UNION as
            # a NULL-filled column — legal only while nothing ELSE in
            # the group binds the same name (the equality join would
            # drop the NULL rows where SPARQL's compatible-join keeps
            # them). Conservatively include MINUS/EXISTS block vars
            # and BIND aliases.
            outer: set[str] = _union_branch_vars(spec["patterns"] or [])
            for g in spec["optional"] or []:
                pats = g.get("patterns") if isinstance(g, dict) else g
                outer |= _union_branch_vars(pats or [])
            for block in (
                (spec["minus"] or [])
                + (spec["not_exists"] or [])
                + (spec["exists"] or [])
            ):
                pats = (
                    block.get("patterns") if isinstance(block, dict) else block
                )
                outer |= _union_branch_vars(pats or [])
            for vs, _rows in spec.get("values_rows") or []:
                outer |= set(vs)
            outer |= {alias for _e, alias in spec["binds"] or []}
            for leg in legs:  # subquery/VALUES-table legs
                outer |= set(leg.columns)
            clash = sorted(set(private) & outer)
            if clash:
                raise SparqlSyntaxError(
                    "UNION branch-private variable(s) "
                    f"{['?' + c for c in clash]} are also bound elsewhere "
                    "in the group — an equality join would drop the "
                    "branch rows where the variable is unbound (SPARQL "
                    "compatible-join); bind them in every branch or "
                    "rename"
                )
        legs.append(u_leg)
    if legs:
        common["extra_legs"] = legs
    return common


def _compile_select(triples: DataFrame, spec: dict, engine_kwargs: dict):
    """A parsed SELECT spec → a DataFrame (recursive via subqueries)."""
    from pyspark.sql import functions as F

    from nametag3_spark.operators.bgp import (
        bgp_aggregate,
        bgp_query,
        bgp_union,
    )

    # standalone explicit-select UNION keeps the direct bgp_union path
    # (one pass, filters/VALUES pushed into each branch); every other
    # UNION shape — other patterns alongside it, aggregates over it,
    # SELECT * — composes the chain as ONE extra leg joined on shared
    # variables (the subquery machinery), so UNION now combines freely
    # with OPTIONAL/MINUS/EXISTS/subqueries/aggregates
    sole_union = (
        spec["union"] is not None
        and not spec["aggs"]
        and spec["select"] is not None
        and _union_is_sole_pattern(spec)
    )
    common = _common_kwargs(
        spec, engine_kwargs, triples, compose_union=not sole_union
    )
    if spec["aggs"]:
        out = bgp_aggregate(
            triples,
            spec["patterns"],
            group_by=spec["group_by"],
            aggs=spec["aggs"],
            having=spec["having"] or None,
            **common,
        )
        # projection order: as written in the SELECT list is not
        # tracked; selected group vars first, then aggregate aliases.
        # SELECT may name a strict SUBSET of the GROUP BY keys (SPARQL
        # allows grouping finer than the projection), in which case the
        # projected rows can repeat — SELECT DISTINCT then deduplicates
        # them (18.2.5.2 Distinct applies AFTER aggregation/projection).
        out = out.select(*spec["select"], *[a[2] for a in spec["aggs"]])
        if spec["distinct"]:
            out = out.dropDuplicates()
    elif sole_union:
        # union branches are plain-triple blocks; the group-level
        # kwargs that require a required block don't apply here
        for kw in (
            "optional", "not_exists", "exists", "minus", "graph", "extra_legs",
        ):
            common.pop(kw, None)
        out = bgp_union(
            triples,
            spec["union"],
            select=spec["select"],
            distinct=spec["distinct"],
            # branch-private selected vars NULL-fill (SPARQL unbound);
            # a FILTER/BIND over one still raises inside the branch
            allow_partial=True,
            **common,
        )
    else:
        out = bgp_query(
            triples,
            spec["patterns"],
            select=spec["select"],
            distinct=spec["distinct"],
            **common,
        )
    if spec["order"]:
        from nametag3_spark.operators.bgp import _compile_expr

        bound = frozenset(out.columns)
        keys = []
        for v, asc in spec["order"]:
            col = (
                _compile_expr(bound, v[1])
                if isinstance(v, tuple)  # ("expr", node) sort key
                else F.col(v)
            )
            keys.append(col.asc() if asc else col.desc())
        out = out.orderBy(*keys)
    if spec["offset"] is not None:
        out = out.offset(spec["offset"])
    if spec["limit"] is not None:
        out = out.limit(spec["limit"])
    return out


def execute(triples: DataFrame, query: str, **engine_kwargs):
    """Parse and run against a triple (or quad) DataFrame. Returns a
    DataFrame for SELECT/CONSTRUCT, a bool for ASK. ``engine_kwargs``
    pass through to the compiler (path_depth, column names, ...)."""
    from nametag3_spark.operators.bgp import ask, construct

    spec = parse(query)
    if spec["form"] == "describe":
        from nametag3_spark.operators.bgp import describe

        allowed = {"subj_col", "pred_col", "obj_col"}
        return describe(
            triples,
            spec["entity"],
            **{k: v for k, v in engine_kwargs.items() if k in allowed},
        )
    if spec["form"] == "select":
        return _compile_select(triples, spec, engine_kwargs)
    common = _common_kwargs(spec, engine_kwargs, triples)
    if spec["form"] == "ask":
        return ask(triples, spec["patterns"], **common)
    return construct(triples, spec["patterns"], spec["template"], **common)
