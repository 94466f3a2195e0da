"""SPARQL SELECT/ASK text front-end over bgp_match (SURVEY §2.5 E3).

The reference's query surface is SPARQL text sent to an HTTP endpoint
(/root/reference/sparql/sparqlservice.go:43-95); result bindings are a
map keyed by bare variable name (result.go SelectResult). In-engine
there is no endpoint — this parses the conjunctive SELECT subset those
clients send and plans it with :func:`argo_spark.ops.bgp.bgp_match`,
whose output columns are exactly the reference's binding names
(variable names without ``?``) holding NT lexical forms.

Supported grammar (the BGP core):

    PREFIX p: <uri> ...
    SELECT (DISTINCT)? (?v ... | *) WHERE { t1 . t2 . ... } (LIMIT n)?
    ASK { t1 . ... }

with terms ``?var``/``$var``, ``<iri>``, ``prefix:local``, the ``a``
keyword (rdf:type), and ``"literal"`` with optional ``@lang`` or
``^^<dt>``/``^^prefix:local``. OPTIONAL/FILTER/UNION/paths are out of
scope (the reference client passes text through verbatim; its own
tooling composes plain conjunctive SELECTs).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame

from argo_spark.namespaces import RDF_TYPE
from argo_spark.terms import KIND_LITERAL, Term

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<lit>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtmark>\^\^)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_-]*:[A-Za-z0-9_.-]*|:[A-Za-z0-9_.-]+)
  | (?P<kw>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>[0-9]+)
  | (?P<punct>[{}.*;,()])
    """,
    re.VERBOSE,
)

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\", "'": "'"}


class SparqlSyntaxError(ValueError):
    pass


def _tokenize(query: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if m is None:
            raise SparqlSyntaxError(f"bad token at {query[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    return out


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class _Parser:
    def __init__(self, query: str):
        self.toks = _tokenize(query)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect_kw(self, word: str):
        kind, val = self.next()
        if kind != "kw" or val.upper() != word:
            raise SparqlSyntaxError(f"expected {word}, got {val!r}")

    def expect_punct(self, ch: str):
        kind, val = self.next()
        if not (kind == "punct" and val == ch):
            raise SparqlSyntaxError(f"expected {ch!r}, got {val!r}")

    def parse_prefixes(self):
        while True:
            kind, val = self.peek()
            if kind == "kw" and val.upper() == "PREFIX":
                self.next()
                pk, pv = self.next()
                if pk != "pname" or not pv.endswith(":"):
                    raise SparqlSyntaxError(f"bad PREFIX name {pv!r}")
                ik, iv = self.next()
                if ik != "iri":
                    raise SparqlSyntaxError(f"bad PREFIX iri {iv!r}")
                self.prefixes[pv[:-1]] = iv[1:-1]
            elif kind == "kw" and val.upper() == "BASE":
                raise SparqlSyntaxError("BASE is not supported")
            else:
                return

    def expand_pname(self, pname: str) -> str:
        p, _, local = pname.partition(":")
        if p not in self.prefixes:
            raise SparqlSyntaxError(f"undeclared prefix {p!r}")
        return self.prefixes[p] + local

    def parse_term(self, position: str):
        kind, val = self.next()
        if kind == "var":
            return "?" + val[1:]
        if kind == "iri":
            return val[1:-1]
        if kind == "pname":
            return self.expand_pname(val)
        if kind == "kw" and val == "a" and position == "p":
            return RDF_TYPE
        if kind == "lit":
            if position == "p":
                raise SparqlSyntaxError("literal in predicate position")
            value = _unescape(val[1:-1])
            nk, nv = self.peek()
            if nk == "langtag":
                self.next()
                return Term(KIND_LITERAL, value, lang=nv[1:])
            if nk == "dtmark":
                self.next()
                dk, dv = self.next()
                if dk == "iri":
                    dt = dv[1:-1]
                elif dk == "pname":
                    dt = self.expand_pname(dv)
                else:
                    raise SparqlSyntaxError(f"bad datatype {dv!r}")
                return Term(KIND_LITERAL, value, dt=dt)
            return Term(KIND_LITERAL, value)
        raise SparqlSyntaxError(f"unexpected term {val!r}")

    def parse_group(self) -> list[tuple]:
        self.expect_punct("{")
        patterns: list[tuple] = []
        while True:
            kind, val = self.peek()
            if kind == "punct" and val == "}":
                self.next()
                break
            s = self.parse_term("s")
            p = self.parse_term("p")
            o = self.parse_term("o")
            patterns.append((s, p, o))
            kind, val = self.peek()
            if kind == "punct" and val == ".":
                self.next()
        if not patterns:
            raise SparqlSyntaxError("empty group pattern")
        return patterns


def parse_select(query: str):
    """-> (vars | None for *, patterns, distinct, limit | None)."""
    p = _Parser(query)
    p.parse_prefixes()
    p.expect_kw("SELECT")
    distinct = False
    kind, val = p.peek()
    if kind == "kw" and val.upper() == "DISTINCT":
        distinct = True
        p.next()
    variables: list[str] | None = []
    kind, val = p.peek()
    if kind == "punct" and val == "*":
        variables = None
        p.next()
    else:
        while True:
            kind, val = p.peek()
            if kind != "var":
                break
            variables.append(val[1:])
            p.next()
        if not variables:
            raise SparqlSyntaxError("SELECT needs variables or *")
    kind, val = p.peek()
    if kind == "kw" and val.upper() == "WHERE":
        p.next()
    patterns = p.parse_group()
    limit = None
    kind, val = p.peek()
    if kind == "kw" and val.upper() == "LIMIT":
        p.next()
        nk, nv = p.next()
        if nk != "num":
            raise SparqlSyntaxError(f"bad LIMIT {nv!r}")
        limit = int(nv)
    kind, val = p.peek()
    if kind is not None:
        # never silently drop solution modifiers (ORDER BY, OFFSET,
        # GROUP BY, ...) — an ignored modifier is a WRONG result
        raise SparqlSyntaxError(f"unsupported trailing clause at {val!r}")
    return variables, patterns, distinct, limit


def parse_ask(query: str) -> list[tuple]:
    p = _Parser(query)
    p.parse_prefixes()
    p.expect_kw("ASK")
    patterns = p.parse_group()
    kind, val = p.peek()
    if kind is not None:
        raise SparqlSyntaxError(f"unsupported trailing clause at {val!r}")
    return patterns


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """SELECT text -> bindings DataFrame: one column per selected
    variable (bare name, NT lexical form) — the SelectResult keys of
    /root/reference/sparql/result.go."""
    from argo_spark.ops.bgp import bgp_match

    variables, patterns, distinct, limit = parse_select(query)
    out = bgp_match(triples, patterns, distinct=distinct)
    if variables is not None:
        missing = [v for v in variables if v not in out.columns]
        if missing:
            raise SparqlSyntaxError(f"SELECT vars not bound in WHERE: {missing}")
        out = out.select(*variables)
        if distinct:
            out = out.dropDuplicates()
    if limit is not None:
        out = out.limit(limit)
    return out


def sparql_ask(triples: DataFrame, query: str) -> bool:
    """ASK text -> bool (sparqlservice.go:57-70 semantics)."""
    from argo_spark.ops.bgp import bgp_match

    patterns = parse_ask(query)
    return bgp_match(triples, patterns, distinct=False).limit(1).count() > 0
