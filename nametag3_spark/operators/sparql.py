"""A SPARQL text front end for the BGP compiler (operators/bgp.py).

Parses a pragmatic SPARQL subset onto the programmatic API — the
query-language surface a reference user actually types, compiled to
the same Catalyst plans the compiler already plan-guards:

    SELECT [DISTINCT] (*|?var...) WHERE { ... }
    ASK [WHERE] { ... }
    CONSTRUCT { template } WHERE { ... }

Inside ``WHERE { }``:
    s p o .                      triple pattern (vars start with ?,
                                 anything else is a literal; 'quoted'
                                 or "quoted" literals may hold spaces;
                                 a predicate ending in + is a
                                 one-or-more property path)
    OPTIONAL { ... }             left-join block (triples only)
    FILTER NOT EXISTS { ... }    anti-join block (triples only)
    VALUES ?v { lit lit ... }    inline binding list
    GRAPH ?g|lit { ... }         quad scope — must be the single
                                 top-level block wrapping ALL triple
                                 patterns (the engine scopes the whole
                                 query, not per-block)

Not covered (use the programmatic API): expressions in FILTER, UNION,
subqueries, aggregates (run ``.groupBy`` on the returned DataFrame),
per-block GRAPH mixing, prefixed-name expansion (IRIs are plain
strings here).
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
        if c.isspace():
            i += 1
        elif c == "#":  # comment to end of line
            while i < n and text[i] != "\n":
                i += 1
        elif c in "{}.":
            toks.append(c)
            i += 1
        elif c in "'\"":
            j = text.find(c, i + 1)
            if j < 0:
                raise SparqlSyntaxError(f"unterminated string at offset {i}")
            toks.append("\x00" + text[i + 1 : j])  # \x00 marks "literal"
            i = j + 1
        else:
            j = i
            while j < n and not text[j].isspace() and text[j] not in "{}.#'\"":
                j += 1
            toks.append(text[i:j])
            i = j
    return toks


def _untag(tok: str) -> str:
    return tok[1:] if tok.startswith("\x00") else tok


def _is_quoted(tok: str) -> bool:
    return tok.startswith("\x00")


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

    # ---- grammar ------------------------------------------------------

    def triples(self) -> list[tuple[str, str, str]]:
        """Triple patterns until '}' (no nested blocks allowed here)."""
        out = []
        while self.peek() is not None and self.peek() != "}":
            terms = []
            for _ in range(3):
                tok = self.next()
                if not _is_quoted(tok) and tok in "{}.":
                    raise SparqlSyntaxError(
                        f"expected a term, got {tok!r} (triple needs 3 terms)"
                    )
                terms.append(_untag(tok))
            out.append(tuple(terms))
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

    def group(self) -> dict:
        """The WHERE group: returns bgp_query kwargs."""
        out: dict = {
            "patterns": [],
            "optional": [],
            "not_exists": [],
            "values": {},
            "graph": None,
        }
        self.expect("{")
        while True:
            tok = self.peek()
            if tok is None:
                raise SparqlSyntaxError("unterminated group (missing '}')")
            if tok == "}":
                self.next()
                break
            if self.kw("OPTIONAL"):
                out["optional"].append(self.block())
            elif self.kw("FILTER"):
                self.expect("NOT")
                self.expect("EXISTS")
                out["not_exists"].append(self.block())
            elif self.kw("VALUES"):
                var = _untag(self.next())
                if not var.startswith("?"):
                    raise SparqlSyntaxError(f"VALUES needs a ?var, got {var!r}")
                self.expect("{")
                lits = []
                while self.peek() is not None and self.peek() != "}":
                    lits.append(_untag(self.next()))
                self.expect("}")
                out["values"][var[1:]] = lits
            elif self.kw("GRAPH"):
                if out["graph"] is not None or out["patterns"]:
                    raise SparqlSyntaxError(
                        "GRAPH must be the single top-level block wrapping "
                        "all triple patterns"
                    )
                out["graph"] = _untag(self.next())
                out["patterns"].extend(self.block())
            else:
                # plain triples until the next keyword/brace
                tok = self.next()
                terms = [_untag(tok)]
                for _ in range(2):
                    t2 = self.next()
                    if not _is_quoted(t2) and t2 in "{}.":
                        raise SparqlSyntaxError(
                            f"expected a term, got {t2!r} (triple needs 3 terms)"
                        )
                    terms.append(_untag(t2))
                if out["graph"] is not None:
                    raise SparqlSyntaxError(
                        "triple patterns outside the GRAPH block; the engine "
                        "scopes the whole query"
                    )
                out["patterns"].append(tuple(terms))
                if self.peek() == ".":
                    self.next()
        return out


def parse(query: str) -> dict:
    """Parse to an execution spec: {form, select, distinct, template,
    **group-kwargs}. ``form`` is 'select' | 'ask' | 'construct'."""
    p = _Parser(_tokenize(query))
    if p.kw("SELECT"):
        distinct = p.kw("DISTINCT")
        select: list[str] | None
        if p.peek() == "*" :
            p.next()
            select = None
        else:
            select = []
            while p.peek() is not None and _untag(p.peek()).startswith("?"):
                select.append(_untag(p.next())[1:])
            if not select:
                raise SparqlSyntaxError("SELECT needs '*' or ?vars")
        p.expect("WHERE")
        g = p.group()
        spec = {"form": "select", "select": select, "distinct": distinct, **g}
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


def execute(triples: DataFrame, query: str, **engine_kwargs):
    """Parse and run against a triple (or quad) DataFrame. Returns a
    DataFrame for SELECT/CONSTRUCT, a bool for ASK. ``engine_kwargs``
    pass through to the compiler (path_depth, column names, ...)."""
    from nametag3_spark.operators.bgp import ask, bgp_query, construct

    spec = parse(query)
    common = dict(
        optional=spec["optional"] or None,
        not_exists=spec["not_exists"] or None,
        values=spec["values"] or None,
        graph=spec["graph"],
        **engine_kwargs,
    )
    if spec["form"] == "select":
        return bgp_query(
            triples,
            spec["patterns"],
            select=spec["select"],
            distinct=spec["distinct"],
            **common,
        )
    if spec["form"] == "ask":
        return ask(triples, spec["patterns"], **common)
    return construct(triples, spec["patterns"], spec["template"], **common)
