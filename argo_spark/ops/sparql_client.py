"""SPARQL protocol client + streaming XML result parser (SURVEY §2.5
E3, the HTTP half; the text front-end is :mod:`argo_spark.ops.sparql`).

Ports the reference's client stack offline-testably:

* :class:`SparqlResultParser` — the ``application/sparql-results+xml``
  state machine (/root/reference/sparql/result.go:97-508: parseTop →
  parseSparql → parseHead → parseSparql2 → parseResults → parseResult
  → parseBinding → parseBnode/parseUri/parseLiteral, parseBoolean,
  parseFinish) over incremental expat — results stream out as each
  ``</result>`` closes, header vars/links are available after
  ``</head>`` (the Go WaitUntilHeaderDone contract).
* :class:`StructuredResultParser` — reflection binding of a result row
  onto an object's attributes with a rename map, the Go struct-tag
  mechanism (result.go:33-96) expressed as ``rename={'binding':
  'attr'}``; empty binding names are skipped like the reference.
* :class:`SparqlService` — Select/Ask/Graph/Update request
  construction (sparqlservice.go:22-95): form-encoded POST bodies
  (``query=…`` / ``update=…``), Accept headers per method, EnsureOK
  status handling (sparql.go:9-24: anything <200 or >=400 is an
  error after draining the body).
* :class:`GraphStoreService` — the SPARQL 1.1 Graph Store protocol
  (graphstoreservice.go:12-181): ``?default=`` / ``?graph=uri``
  action URIs, GET/PUT/POST/DELETE/HEAD/PATCH with RDF/XML bodies.
* :class:`FusekiService` / :class:`FusekiDataset` — endpoint path
  helpers (fuseki/service.go:3-19, fuseki/dataset.go:7-47).

The HTTP layer is injectable (``transport(method, url, body, headers)
-> (status, reason, headers, body)``) — the same pattern as the
Squirtle include fetcher and the KVStore client — so every request/
response path is testable against canned Fuseki-style fixtures with no
endpoint in the sandbox; the default transport is stdlib urllib.

Documented divergences: (1) adjacent character-data chunks are merged
(expat buffer_text) before a term is built — the reference rebuilds
the term per chunk, keeping only the LAST chunk of split text
(result.go:413-469 overwrite per CharData) and then files later
chunks under the cleared binding name ""; (2) results accumulate on
a list rather than an unbuffered channel — iteration order and
values are identical; (3) Graph() returns flattened triples through
the repo's RDF/XML parser instead of a Go Graph object.
"""

from __future__ import annotations

import urllib.parse
import xml.parsers.expat
from typing import Callable, Iterator, List, Optional, Tuple

from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL, Term

SPARQL_NS = "http://www.w3.org/2005/sparql-results#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_SPARQL = SPARQL_NS + "sparql"
_HEAD = SPARQL_NS + "head"
_VARIABLE = SPARQL_NS + "variable"
_RESULTS = SPARQL_NS + "results"
_BOOLEAN = SPARQL_NS + "boolean"
_LINK = SPARQL_NS + "link"
_RESULT = SPARQL_NS + "result"
_BINDING = SPARQL_NS + "binding"
_BNODE = SPARQL_NS + "bnode"
_URI = SPARQL_NS + "uri"
_LITERAL = SPARQL_NS + "literal"
_XML_LANG = (XML_NS + "lang", "xml:lang", "xmllang")

# transport(method, url, body, headers) -> (status, reason, headers, body)
Transport = Callable[
    [str, str, Optional[bytes], dict], Tuple[int, str, dict, bytes]
]


class SparqlHttpError(Exception):
    """EnsureOK failure: status outside [200, 400) (sparql.go:9-24)."""


class SparqlResultXmlError(Exception):
    """Malformed sparql-results+xml (the state functions' errors)."""


def urllib_transport(
    method: str, url: str, body: Optional[bytes], headers: dict
) -> Tuple[int, str, dict, bytes]:
    """Default HTTP transport (stdlib). Network calls are outside the
    sandbox — inject a fake transport in tests."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.reason, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.reason, dict(e.headers or {}), e.read()


# ---------------------------------------------------------------------------
# Result parser (result.go:97-508)
# ---------------------------------------------------------------------------

# states, named after the reference's stateFuncs
(_TOP, _IN_SPARQL, _IN_HEAD, _SPARQL2, _IN_RESULTS, _IN_RESULT,
 _IN_BINDING, _IN_TERM, _IN_BOOLEAN, _FINISH, _DONE) = range(11)


class SparqlResultParser:
    """Incremental ``application/sparql-results+xml`` parser.

    Feed bytes/str with :meth:`feed` (or parse whole documents with
    :meth:`parse`); completed rows land on :attr:`results` as dicts
    ``{binding_name: Term}`` (the Go SelectResult) in document order.
    After ``</head>``, :attr:`header_done` is set and :attr:`vars` /
    :attr:`link_uris` are final; an ASK document sets
    :attr:`bool_result`. Errors raise :class:`SparqlResultXmlError`
    with the reference's message texts."""

    def __init__(self) -> None:
        self.vars: List[str] = []
        self.link_uris: List[str] = []
        self.bool_result: Optional[bool] = None
        self.results: List[dict] = []
        self.header_done = False
        self.done = False
        self._state = _TOP
        self._current: Optional[dict] = None
        self._binding = ""
        self._term_kind: Optional[int] = None
        self._lang = ""
        self._dt = ""
        self._text: List[str] = []
        self._parser = xml.parsers.expat.ParserCreate(namespace_separator="")
        self._parser.buffer_text = True
        self._parser.StartElementHandler = self._start
        self._parser.EndElementHandler = self._end
        self._parser.CharacterDataHandler = self._chardata

    # -- expat handlers, one branch per reference stateFunc ------------

    def _fail(self, msg: str) -> None:
        raise SparqlResultXmlError(msg)

    def _start(self, name: str, attrs: dict) -> None:
        st = self._state
        if st == _TOP:
            if name != _SPARQL:
                self._fail("Expected <sparql> element at top level")
            self._state = _IN_SPARQL
        elif st == _IN_SPARQL:
            if name != _HEAD:
                self._fail("Expected <head> element inside <sparql>")
            self._state = _IN_HEAD
        elif st == _IN_HEAD:
            if name == _VARIABLE:
                self.vars.append(attrs.get("name", ""))
            elif name == _LINK:
                self.link_uris.append(attrs.get("href", ""))
            else:
                self._fail(
                    "Expected <variable> or <link> in <head>, not <%s>"
                    % name.rsplit("#", 1)[-1]
                )
        elif st == _SPARQL2:
            if name == _RESULTS:
                self._state = _IN_RESULTS
            elif name == _BOOLEAN:
                self._state = _IN_BOOLEAN
                self._text = []
            else:
                self._fail("Expected <results> or <boolean> element inside <sparql>")
        elif st == _IN_RESULTS:
            if name != _RESULT:
                self._fail("Expected <result> element inside <results>")
            self._current = {}
            self._state = _IN_RESULT
        elif st == _IN_RESULT:
            if name != _BINDING:
                self._fail("Expected <binding> element inside <result>")
            self._binding = attrs.get("name", "")
            self._state = _IN_BINDING
        elif st == _IN_BINDING:
            if name == _BNODE:
                self._term_kind = KIND_BLANK
            elif name == _URI:
                self._term_kind = KIND_IRI
            elif name == _LITERAL:
                self._term_kind = KIND_LITERAL
                self._lang = next(
                    (attrs[k] for k in _XML_LANG if k in attrs), ""
                )
                self._dt = attrs.get("datatype", "")
            else:
                self._fail(
                    "Expected <bnode>, <uri> or <literal> element inside <result>"
                )
            self._text = []
            self._state = _IN_TERM
        else:
            self._fail(f"Unexpected start element <{name}> in state {st}")

    def _end(self, name: str) -> None:
        st = self._state
        if st == _IN_HEAD:
            if name == _HEAD:
                self.header_done = True
                self._state = _SPARQL2
            # </variable> / </link>: stay
        elif st == _IN_TERM:
            text = "".join(self._text)
            if self._term_kind == KIND_BLANK:
                term = Term(KIND_BLANK, text)
            elif self._term_kind == KIND_IRI:
                term = Term(KIND_IRI, text)
            else:
                term = Term(
                    KIND_LITERAL, text,
                    self._lang or None, self._dt or None,
                )
            assert self._current is not None
            self._current[self._binding] = term
            self._binding = ""
            self._state = _IN_BINDING
        elif st == _IN_BINDING:  # </binding>
            self._state = _IN_RESULT
        elif st == _IN_RESULT:  # </result>
            assert self._current is not None
            self.results.append(self._current)
            self._current = None
            self._state = _IN_RESULTS
        elif st == _IN_RESULTS:  # </results>
            self._state = _FINISH
        elif st == _IN_BOOLEAN:  # </boolean>
            text = "".join(self._text)
            if text == "true":
                self.bool_result = True
            elif text == "false":
                self.bool_result = False
            else:
                self._fail(f"Invalid value for <boolean>: {text}")
            self._state = _FINISH
        elif st == _FINISH:  # </sparql>
            self.done = True
            self._state = _DONE
        else:
            self._fail(f"Unexpected end element </{name}> in state {st}")

    def _chardata(self, data: str) -> None:
        if self._state in (_IN_TERM, _IN_BOOLEAN):
            self._text.append(data)
        # whitespace between elements: ignored, as in every stateFunc's
        # CharData passthrough

    # -- public API -----------------------------------------------------

    def feed(self, data) -> "SparqlResultParser":
        if isinstance(data, str):
            data = data.encode("utf-8")
        try:
            self._parser.Parse(data, False)
        except xml.parsers.expat.ExpatError as e:
            raise SparqlResultXmlError(f"XML error: {e}") from e
        return self

    def close(self) -> "SparqlResultParser":
        try:
            self._parser.Parse(b"", True)
        except xml.parsers.expat.ExpatError as e:
            raise SparqlResultXmlError(f"XML error: {e}") from e
        return self

    def parse(self, document) -> "SparqlResultParser":
        return self.feed(document).close()

    def read_all(self) -> List[dict]:
        return list(self.results)


def iter_results(chunks, chunk_results: bool = True) -> Iterator[dict]:
    """STREAMING read: feed an iterable of byte/str chunks, yielding
    each completed binding row as soon as its ``</result>`` closes —
    the Go ReadResult/ResultChan contract without holding the document
    in memory."""
    p = SparqlResultParser()
    emitted = 0
    for chunk in chunks:
        p.feed(chunk)
        while emitted < len(p.results):
            yield p.results[emitted]
            emitted += 1
    p.close()
    while emitted < len(p.results):
        yield p.results[emitted]
        emitted += 1


class SparqlResultJsonError(Exception):
    """Malformed application/sparql-results+json document."""


class SparqlResultJsonParser:
    """``application/sparql-results+json`` parser (W3C SPARQL 1.1
    Query Results JSON Format — Fuseki/Virtuoso's default; NO
    reference analogue, result.go parses XML only). Same surface as
    :class:`SparqlResultParser`: :attr:`vars`, :attr:`link_uris`,
    :attr:`bool_result`, :attr:`results` as ``{binding_name: Term}``
    dicts in document order — so :class:`StructuredResultParser` and
    the SERVICE federation layer consume either format unchanged.
    ``typed-literal`` (the pre-REC Virtuoso spelling) is accepted as
    ``literal``."""

    def __init__(self) -> None:
        self.vars: List[str] = []
        self.link_uris: List[str] = []
        self.bool_result: Optional[bool] = None
        self.results: List[dict] = []
        self.header_done = False
        self.done = False

    def parse(self, data) -> "SparqlResultJsonParser":
        import json

        if isinstance(data, (bytes, bytearray)):
            data = data.decode("utf-8")
        try:
            doc = json.loads(data)
        except ValueError as e:
            raise SparqlResultJsonError(f"bad JSON: {e}") from None
        if not isinstance(doc, dict):
            raise SparqlResultJsonError("top level must be an object")
        head = doc.get("head", {})
        self.vars = list(head.get("vars", []))
        self.link_uris = list(head.get("link", []))
        self.header_done = True
        if "boolean" in doc:
            if not isinstance(doc["boolean"], bool):
                raise SparqlResultJsonError("'boolean' must be a bool")
            self.bool_result = doc["boolean"]
            self.done = True
            return self
        bindings = doc.get("results", {}).get("bindings")
        if bindings is None:
            raise SparqlResultJsonError(
                "document has neither 'boolean' nor 'results.bindings'"
            )
        for b in bindings:
            self.results.append(
                {name: self._term(name, t) for name, t in b.items()}
            )
        self.done = True
        return self

    @staticmethod
    def _term(name: str, t) -> Term:
        if not isinstance(t, dict) or "value" not in t:
            raise SparqlResultJsonError(
                f"binding {name!r} is not a term object"
            )
        ttype, value = t.get("type"), t["value"]
        if ttype == "uri":
            return Term(KIND_IRI, value)
        if ttype == "bnode":
            return Term(KIND_BLANK, value)
        if ttype in ("literal", "typed-literal"):
            return Term(
                KIND_LITERAL, value,
                t.get("xml:lang") or None, t.get("datatype") or None,
            )
        raise SparqlResultJsonError(
            f"binding {name!r} has unknown term type {ttype!r}"
        )


class SparqlResultTsvError(Exception):
    """Malformed text/tab-separated-values results document."""


_TSV_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\",
                "b": "\b", "f": "\f", "'": "'"}


def _tsv_unescape(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in _TSV_ESCAPES:
                out.append(_TSV_ESCAPES[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _tsv_term(cell: str) -> Term:
    """One SPARQL-TSV cell -> Term (Turtle-subset encoding per the
    W3C results-TSV spec: <iri>, _:label, quoted literals with
    @lang / ^^<dt>, bare numerics and booleans)."""
    import re

    _XSD = "http://www.w3.org/2001/XMLSchema#"
    if cell.startswith("<") and cell.endswith(">"):
        return Term(KIND_IRI, cell[1:-1])
    if cell.startswith("_:"):
        return Term(KIND_BLANK, cell[2:])
    if cell.startswith('"'):
        m = re.match(r'^"((?:[^"\\]|\\.)*)"', cell)
        if not m:
            raise SparqlResultTsvError(f"unterminated literal: {cell!r}")
        value, rest = _tsv_unescape(m.group(1)), cell[m.end():]
        if rest.startswith("@"):
            return Term(KIND_LITERAL, value, lang=rest[1:])
        if rest.startswith("^^<") and rest.endswith(">"):
            return Term(KIND_LITERAL, value, dt=rest[3:-1])
        if rest:
            raise SparqlResultTsvError(f"bad literal suffix: {cell!r}")
        return Term(KIND_LITERAL, value)
    if cell in ("true", "false"):
        return Term(KIND_LITERAL, cell, dt=_XSD + "boolean")
    if re.fullmatch(r"[+-]?\d+", cell):
        return Term(KIND_LITERAL, cell, dt=_XSD + "integer")
    if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+)", cell):
        return Term(KIND_LITERAL, cell, dt=_XSD + "decimal")
    if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+", cell):
        return Term(KIND_LITERAL, cell, dt=_XSD + "double")
    raise SparqlResultTsvError(f"unparseable term cell: {cell!r}")


class SparqlResultTsvParser:
    """``text/tab-separated-values`` results parser (W3C SPARQL 1.1
    Query Results CSV/TSV Format §4 — no reference analogue). Same
    surface as the XML/JSON parsers; an empty cell leaves the
    variable out of that row's dict (unbound). Round-trips the
    repo's own ``write_select_tsv`` output (NT forms are valid
    results-TSV terms)."""

    def __init__(self) -> None:
        self.vars: List[str] = []
        self.link_uris: List[str] = []
        self.bool_result: Optional[bool] = None
        self.results: List[dict] = []
        self.header_done = False
        self.done = False

    def parse(self, data) -> "SparqlResultTsvParser":
        if isinstance(data, (bytes, bytearray)):
            data = data.decode("utf-8")
        lines = data.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        if not lines:
            raise SparqlResultTsvError("empty TSV document (no header)")
        hdr = lines[0].rstrip("\r")
        self.vars = [
            v[1:] if v.startswith("?") else v
            for v in hdr.split("\t")
        ] if hdr else []
        self.header_done = True
        for ln in lines[1:]:
            cells = ln.rstrip("\r").split("\t")
            if len(cells) != len(self.vars):
                raise SparqlResultTsvError(
                    f"row has {len(cells)} cells, header has "
                    f"{len(self.vars)}"
                )
            self.results.append({
                v: _tsv_term(c)
                for v, c in zip(self.vars, cells) if c != ""
            })
        self.done = True
        return self


class SparqlResultCsvParser:
    """``text/csv`` results parser (W3C results-CSV §3). The format
    is LOSSY by design — cells are raw lexical values with no term
    syntax — so every non-empty cell lands as a PLAIN LITERAL Term
    (documented; use TSV/JSON/XML when term kinds matter)."""

    def __init__(self) -> None:
        self.vars: List[str] = []
        self.link_uris: List[str] = []
        self.bool_result: Optional[bool] = None
        self.results: List[dict] = []
        self.header_done = False
        self.done = False

    def parse(self, data) -> "SparqlResultCsvParser":
        import csv
        import io

        if isinstance(data, (bytes, bytearray)):
            data = data.decode("utf-8")
        rows = list(csv.reader(io.StringIO(data)))
        if not rows:
            raise SparqlResultTsvError("empty CSV document (no header)")
        self.vars = rows[0]
        self.header_done = True
        for cells in rows[1:]:
            self.results.append({
                v: Term(KIND_LITERAL, c)
                for v, c in zip(self.vars, cells) if c != ""
            })
        self.done = True
        return self


def parse_sparql_results(body: bytes, content_type: str = ""):
    """Dispatch a SPARQL results document on its Content-Type: json
    media types go to :class:`SparqlResultJsonParser`, TSV/CSV to
    their line parsers, everything else (including the bare default)
    to the XML state machine."""
    ct = (content_type or "").split(";", 1)[0].strip().lower()
    if ct in ("application/sparql-results+json", "application/json"):
        return SparqlResultJsonParser().parse(body)
    if ct == "text/tab-separated-values":
        return SparqlResultTsvParser().parse(body)
    if ct == "text/csv":
        return SparqlResultCsvParser().parse(body)
    return SparqlResultParser().parse(body)


class StructuredResultParser:
    """Bind result rows onto an object's attributes (result.go:33-96).
    ``rename`` maps binding name -> attribute name (the Go
    ``sparql:"..."`` struct tag); an empty binding name is skipped; a
    binding with no destination attribute is an error."""

    def __init__(self, rows: List[dict], target, rename: Optional[dict] = None):
        self._rows = iter(rows)
        self._target = target
        self._rename = rename or {}

    def read(self) -> bool:
        """Apply the next row; False at end-of-results (the Go io.EOF)."""
        row = next(self._rows, None)
        if row is None:
            return False
        for key, value in row.items():
            if key == "":
                continue
            key = self._rename.get(key, key)
            if not hasattr(self._target, key):
                raise SparqlResultXmlError(
                    f"Could not find a destination field for binding '{key}' "
                    "(try using a rename entry)"
                )
            setattr(self._target, key, value)
        return True


# ---------------------------------------------------------------------------
# Protocol services (sparqlservice.go, graphstoreservice.go)
# ---------------------------------------------------------------------------

def _ensure_ok(status: int, reason: str) -> None:
    if status < 200 or status >= 400:
        raise SparqlHttpError(f"HTTP request returned {status} {reason}")


class SparqlService:
    """SPARQL protocol endpoint client (sparqlservice.go:11-95): every
    operation is a form-encoded POST; Accept is
    ``application/sparql-results+xml`` for Select/Ask and
    ``application/rdf+xml`` for Graph; Update sends no Accept."""

    def __init__(self, endpoint_uri: str, transport: Optional[Transport] = None):
        self.endpoint_uri = endpoint_uri
        self.transport = transport or urllib_transport

    def _do(self, form: dict, accept: str) -> Tuple[bytes, dict]:
        payload = urllib.parse.urlencode(form).encode("ascii")
        headers = {"Content-Type": "application/x-www-form-urlencoded"}
        if accept:
            headers["Accept"] = accept
        status, reason, hdrs, body = self.transport(
            "POST", self.endpoint_uri, payload, headers
        )
        _ensure_ok(status, reason)
        return body, hdrs

    def select(self, query: str):
        """-> a parsed result set (XML or JSON parser — identical
        surface). Accept prefers the reference's XML but also offers
        the JSON format; the response Content-Type picks the parser,
        so a JSON-only endpoint works out of the box."""
        body, hdrs = self._do(
            {"query": query},
            "application/sparql-results+xml, "
            "application/sparql-results+json;q=0.9",
        )
        ct = next(
            (v for k, v in hdrs.items() if k.lower() == "content-type"),
            "",
        )
        return parse_sparql_results(body, ct)

    def ask(self, query: str) -> bool:
        parser = self.select(query)
        if parser.bool_result is None:
            raise SparqlResultXmlError("ASK response carried no <boolean>")
        return parser.bool_result

    def graph(self, query: str):
        """CONSTRUCT/DESCRIBE: returns the flattened triples parsed
        from the RDF/XML response (sparqlservice.go:71-86)."""
        from argo_spark.extract.rdfxml import parse_rdfxml

        body, _ = self._do({"query": query}, "application/rdf+xml")
        triples, error = parse_rdfxml(
            body.decode("utf-8"), skolem_key=self.endpoint_uri
        )
        if error is not None:
            raise SparqlResultXmlError(error)
        return triples

    def update(self, query: str) -> None:
        self._do({"update": query}, "")


class GraphStoreService:
    """SPARQL 1.1 Graph Store protocol client
    (graphstoreservice.go:12-181). Graph payloads are triple-row
    lists/DataFrames serialized as RDF/XML through the repo's
    serializer; ``graph_uri=''`` addresses the default graph."""

    def __init__(self, endpoint_uri: str, transport: Optional[Transport] = None):
        self.endpoint_uri = endpoint_uri
        self.transport = transport or urllib_transport

    def action_uri(self, graph_uri: str) -> str:
        if graph_uri == "":
            params = urllib.parse.urlencode({"default": ""})
        else:
            params = urllib.parse.urlencode({"graph": graph_uri})
        return f"{self.endpoint_uri}?{params}"

    def _do(self, method: str, graph_uri: str, body: Optional[bytes],
            headers: dict) -> bytes:
        status, reason, _hdrs, resp = self.transport(
            method, self.action_uri(graph_uri), body, headers
        )
        _ensure_ok(status, reason)
        return resp

    def get(self, graph_uri: str):
        """Flattened triples of the named (or default) graph."""
        from argo_spark.extract.rdfxml import parse_rdfxml

        body = self._do("GET", graph_uri, None,
                        {"Accept": "application/rdf+xml"})
        triples, error = parse_rdfxml(
            body.decode("utf-8"), skolem_key=self.action_uri(graph_uri)
        )
        if error is not None:
            raise SparqlResultXmlError(error)
        return triples

    def _serialize(self, graph_df) -> bytes:
        from argo_spark.sinks.writers import rdfxml_string

        return rdfxml_string(graph_df).encode("utf-8")

    def put(self, graph_uri: str, graph_df) -> None:
        self._do("PUT", graph_uri, self._serialize(graph_df),
                 {"Content-Type": "application/rdf+xml"})

    def post(self, graph_uri: str, graph_df) -> None:
        self._do("POST", graph_uri, self._serialize(graph_df),
                 {"Content-Type": "application/rdf+xml"})

    def delete(self, graph_uri: str) -> None:
        self._do("DELETE", graph_uri, None, {})

    def head(self, graph_uri: str) -> None:
        self._do("HEAD", graph_uri, None, {})

    def patch(self, graph_uri: str, update_query: str) -> None:
        self._do("PATCH", graph_uri, update_query.encode("utf-8"),
                 {"Content-Type": "application/sparql-update"})


# ---------------------------------------------------------------------------
# Fuseki helpers (fuseki/service.go, fuseki/dataset.go)
# ---------------------------------------------------------------------------

class FusekiDataset:
    def __init__(self, base_uri: str, transport: Optional[Transport] = None):
        self.base_uri = base_uri.rstrip("/")
        self._transport = transport

    def query_endpoint(self) -> str:
        return self.base_uri + "/query"

    def update_endpoint(self) -> str:
        return self.base_uri + "/update"

    def graph_store_endpoint(self) -> str:
        return self.base_uri + "/data"

    def upload_endpoint(self) -> str:
        return self.base_uri + "/upload"

    def query_service(self) -> SparqlService:
        return SparqlService(self.query_endpoint(), self._transport)

    def update_service(self) -> SparqlService:
        return SparqlService(self.update_endpoint(), self._transport)

    def graph_store_service(self) -> GraphStoreService:
        return GraphStoreService(self.graph_store_endpoint(), self._transport)


class FusekiService:
    def __init__(self, base_uri: str, transport: Optional[Transport] = None):
        self.base_uri = base_uri.rstrip("/")
        self._transport = transport

    def dataset(self, name: str) -> FusekiDataset:
        return FusekiDataset(self.base_uri + "/" + name, self._transport)
