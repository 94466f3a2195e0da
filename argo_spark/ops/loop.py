"""``loop`` interpreter (SURVEY §2.5): the reference's RDF-as-code
expression evaluator — /root/reference/loop/loop.go:66-207 (literal
typing + evaluation walk) and loop/builtins.go:26-62 (builtin table).

Programs ARE RDF graphs: a node's rdf:type names a function; its
properties are the arguments; ``loop:code`` holds an rdf:List of body
expressions evaluated sequentially (last value wins). Programs are
code, not data — hundreds of triples at most — so evaluation runs
driver-side over a collected index (the analogue of the reference's
in-memory ListStore); data the program references stays in Spark.
``LoopInterpreter.from_dataframe`` enforces that with a size guard.

Divergences (documented):
* the reference HTTP-fetches unknown IRIs mid-evaluation
  (loop.go:57-66 ParseHTTP); here fetching is an injectable
  ``fetcher(url) -> rdfxml text`` (None = no network, the sandbox
  default);
* an untyped term whose rdf:type lookup fails returns Resource(term)
  instead of the reference's Filter(nil,...) nil-subject quirk (a
  crash path in Go).
"""

from __future__ import annotations

import base64
import binascii
from typing import Callable, Iterable, NamedTuple, Optional

from argo_spark.namespaces import NAMESPACES, RDF, RDF_TYPE
from argo_spark.terms import KIND_IRI, KIND_LITERAL, Term, TripleT, iri

XSD = NAMESPACES["xsd"]
LOOP = "http://kierdavis.com/data/vocab/loop/"
RDF_NIL = RDF + "nil"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"

# loop.go:101-103 full integer-family list
_INTEGER_TYPES = {
    XSD + n
    for n in (
        "integer nonPositiveInteger negativeInteger long int short byte "
        "nonNegativeInteger unsignedLong unsignedInt unsignedShort "
        "unsignedByte positiveInteger"
    ).split()
}
_FLOAT_TYPES = {XSD + "float", XSD + "decimal", XSD + "double"}


class LoopError(Exception):
    pass


class Resource(NamedTuple):
    """Unevaluated reference to a graph node (loop.go Resource)."""

    term: Term


def term2str(t: Term) -> str:
    """loop.go:38-44: IRIs by URI, blank nodes as ``_:id``."""
    if t.kind == KIND_IRI:
        return t.value
    return "_:" + t.value


class Builtin(NamedTuple):
    val_args: tuple[str, ...]
    ref_args: tuple[str, ...]
    func: Callable


def _builtin_add(args, refs):
    """loop:Add — int/float promotion matrix (builtins.go:33-62)."""
    a, b = args
    if isinstance(a, bool) or isinstance(b, bool):
        raise LoopError("loop:Add expects loop:a to be an integer or float")
    if isinstance(a, int) and isinstance(b, int):
        return a + b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) + float(b)
    if isinstance(a, (int, float)):
        raise LoopError("loop:Add expects loop:b to be an integer or float")
    raise LoopError("loop:Add expects loop:a to be an integer or float")


BUILTINS: dict[str, Builtin] = {
    LOOP + "Add": Builtin((LOOP + "a", LOOP + "b"), (), _builtin_add),
}


class LoopInterpreter:
    """Driver-side evaluator over a small program graph."""

    def __init__(
        self,
        triples: Iterable[TripleT] = (),
        prefixes: Optional[dict[str, str]] = None,
        fetcher: Optional[Callable[[str], str]] = None,
    ):
        # subject (kind, value) -> insertion-ordered (p_value, o Term)
        self._by_subject: dict[tuple[int, str], list[tuple[str, Term]]] = {}
        self.prefixes = dict(prefixes or {})
        self.fetcher = fetcher
        for t in triples:
            self.add(t)

    @classmethod
    def from_dataframe(cls, df, max_triples: int = 100_000, **kw) -> "LoopInterpreter":
        """Collect a PROGRAM graph (size-guarded: a data table passed
        by mistake fails loudly instead of flooding the driver)."""
        rows = df.limit(max_triples + 1).collect()
        if len(rows) > max_triples:
            raise LoopError(
                f"program graph exceeds {max_triples} triples — "
                "loop programs are code, not data"
            )
        trips = [
            TripleT(
                Term(r.s_kind, r.s_value),
                Term(KIND_IRI, r.p_value),
                Term(r.o_kind, r.o_value, r.o_lang, r.o_dt),
            )
            for r in rows
        ]
        return cls(trips, **kw)

    def add(self, t: TripleT) -> None:
        self._by_subject.setdefault((t.s.kind, t.s.value), []).append((t.p.value, t.o))

    def has_subject(self, t: Term) -> bool:
        return (t.kind, t.value) in self._by_subject

    def get(self, s: Term, p_uri: str) -> Optional[Term]:
        for p, o in self._by_subject.get((s.kind, s.value), ()):
            if p == p_uri:
                return o
        return None

    def must_get(self, s: Term, p_uri: str) -> Term:
        o = self.get(s, p_uri)
        if o is None:
            raise LoopError(f"missing required property <{p_uri}> on {term2str(s)}")
        return o

    def properties(self, s: Term) -> list[tuple[str, Term]]:
        return list(self._by_subject.get((s.kind, s.value), ()))

    def iter_list(self, head: Term):
        """rdf:first/rdf:rest walk (graph.IterList)."""
        node = head
        seen = set()
        while not (node.kind == KIND_IRI and node.value == RDF_NIL):
            key = (node.kind, node.value)
            if key in seen:
                raise LoopError("cyclic rdf:List")
            seen.add(key)
            first = self.get(node, RDF_FIRST)
            if first is None:
                return
            yield first
            node = self.get(node, RDF_REST) or iri(RDF_NIL)

    def fetch_if_needed(self, t: Optional[Term]) -> None:
        """loop.go:57-66 — fetch-and-merge an unknown IRI's RDF/XML."""
        if t is None or t.kind != KIND_IRI or self.has_subject(t):
            return
        if self.fetcher is None:
            return
        from argo_spark.extract.rdfxml import parse_rdfxml

        text = self.fetcher(t.value)
        triples, err = parse_rdfxml(text, skolem_key=t.value)
        if err is not None:
            raise LoopError(f"fetch of <{t.value}> failed to parse: {err}")
        for s_kind, s_value, p_value, o_kind, o_value, o_lang, o_dt in triples:
            self.add(
                TripleT(
                    Term(s_kind, s_value),
                    Term(KIND_IRI, p_value),
                    Term(o_kind, o_value, o_lang, o_dt),
                )
            )

    # -- evaluation ---------------------------------------------------------

    def _eval_literal(self, lit: Term):
        """XSD datatype -> Python value, loop.go:71-119 table."""
        dt = lit.dt
        if dt == XSD + "boolean":
            if lit.value in ("true", "1"):
                return True
            if lit.value in ("false", "0"):
                return False
            raise LoopError(f"Invalid boolean value: {lit.value}")
        if dt == XSD + "base64Binary":
            try:
                return base64.standard_b64decode(lit.value)
            except binascii.Error as e:
                raise LoopError(f"Invalid base64 value: {e}")
        if dt == XSD + "hexBinary":
            try:
                return bytes.fromhex(lit.value)
            except ValueError as e:
                raise LoopError(f"Invalid hex value: {e}")
        if dt in _FLOAT_TYPES:
            try:
                return float(lit.value)
            except ValueError as e:
                raise LoopError(str(e))
        if dt in _INTEGER_TYPES:
            try:
                return int(lit.value)
            except ValueError as e:
                raise LoopError(str(e))
        if dt == XSD + "anyURI":
            return Resource(iri(lit.value))
        if dt == XSD + "QName":
            colon = lit.value.find(":")
            if colon < 0:
                raise LoopError(f"No colon found in QName value: {lit.value}")
            prefix, local = lit.value[:colon], lit.value[colon + 1 :]
            if prefix not in self.prefixes:
                raise LoopError(
                    "Namespace identifier not found in graph prefix map "
                    f"when parsing QName: {lit.value}"
                )
            return Resource(iri(self.prefixes[prefix] + local))
        return lit.value  # untyped / lang-tagged / unknown dt -> string

    def evaluate(self, term: Term, ctx: Optional[dict] = None):
        """loop.go:66-207 Evaluate."""
        if ctx is None:
            ctx = {}
        if term.kind == KIND_LITERAL:
            return self._eval_literal(term)

        self.fetch_if_needed(term)
        t = self.get(term, RDF_TYPE)

        if t is not None and t.kind == KIND_IRI and t.value in (
            LOOP + "Variable", LOOP + "Argument",
        ):
            uri = term2str(term)
            if uri not in ctx:
                raise LoopError(f"Reference to unset variable: {uri}")
            return ctx[uri]

        self.fetch_if_needed(t)
        t_type = self.get(t, RDF_TYPE) if t is not None else None
        if (
            t_type is not None
            and t_type.kind == KIND_IRI
            and t_type.value == LOOP + "Function"
        ):
            uri = term2str(t)
            builtin = BUILTINS.get(uri)
            if builtin is not None:
                valargs = [
                    self.evaluate(self.must_get(term, arg_uri), ctx)
                    for arg_uri in builtin.val_args
                ]
                refargs = [
                    Resource(self.must_get(term, arg_uri))
                    for arg_uri in builtin.ref_args
                ]
                return builtin.func(valargs, refargs)

            # user-defined function: bind every property as an argument
            subctx: dict = {}
            for p_value, obj in self.properties(term):
                arg = iri(p_value)
                self.fetch_if_needed(arg)
                by_ref = False
                marker = self.get(arg, LOOP + "byReference")
                if marker is not None and marker.kind == KIND_LITERAL:
                    by_ref = marker.value in ("true", "1")
                if by_ref:
                    subctx[p_value] = Resource(obj)
                else:
                    subctx[p_value] = self.evaluate(obj, ctx)

            code = self.get(t, LOOP + "code")
            if code is not None and not (
                code.kind == KIND_IRI and code.value == RDF_NIL
            ):
                value = None
                for expr in self.iter_list(code):
                    value = self.evaluate(expr, subctx)
                return value
            return None

        return Resource(term)


def run_loop(spark, rdfxml_path: str, root_uri: str, fetcher=None):
    """``runloop`` equivalent: load a program graph from RDF/XML and
    evaluate the root expression."""
    from argo_spark.extract.rdfxml import read_rdfxml

    triples, errors = read_rdfxml(spark, rdfxml_path)
    errs = errors.collect()
    if errs:
        raise LoopError(f"program parse errors: {[e.error for e in errs]}")
    interp = LoopInterpreter.from_dataframe(triples, fetcher=fetcher)
    return interp.evaluate(iri(root_uri))
