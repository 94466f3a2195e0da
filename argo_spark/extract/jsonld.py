"""JSON-LD extractor — schema.org embeds from web pages.

Beyond the reference (argo has RDFa only, rdfaparser.go): today's
Common-Crawl-style pages carry most of their structured data in
``<script type="application/ld+json">`` blocks, so a KG-construction
pipeline that reads only RDFa misses the dominant carrier. This
module turns JSON-LD node objects into the repo's flat triples.

SUPPORTED SUBSET (documented; everything else is a per-block error):

* inline ``@context``: term -> IRI string, term -> ``{"@id": iri}``
  or ``{"@id": iri, "@type": "@id"}`` (coerced IRI values),
  ``@vocab`` (bare-term fallback), ``@base`` (relative ``@id``
  resolution); contexts may be a dict or an array of dicts (merged
  left-to-right). REMOTE contexts (a URL string) raise — there is no
  fetcher on executors; the error routes to the block's error row.
* node objects: ``@id`` (IRI or ``_:label``; missing -> fresh
  deterministic skolem bnode via terms.skolem_id), ``@type`` (string
  or array -> rdf:type triples), nested node objects and arrays
  (each nested node links via its property and contributes its own
  triples), ``@graph`` (top-level array of nodes; graph naming is
  NOT carried — triples land in the default graph, matching the
  single-graph extractor contract).
* values: strings -> plain literals (or IRIs under ``@type: @id``
  coercion); JSON numbers -> xsd:integer / xsd:double; booleans ->
  xsd:boolean; ``@value`` objects with optional ``@language`` /
  ``@type``; ``@list`` -> rdf:first/rest/nil chains.
* keys that do not resolve to an IRI (no mapping, no @vocab, not a
  prefixed name or absolute IRI) are SKIPPED, not errors — real
  embeds carry junk keys; skipping matches what crawl pipelines do.

``extract_jsonld_page`` pulls every ld+json script block out of an
HTML page (raw-text tag scan — script bodies take no entity decoding
per HTML5) and concatenates the blocks' triples, a bad block voiding
only itself; ``extract_jsonld_df`` is the
Arrow-batched distributed stage over (url, warc_ts, html) — same
shape, same provenance columns as the RDFa extractor.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, List, Optional, Tuple
from urllib.parse import urljoin

import pandas as pd

from pyspark.sql import DataFrame

from argo_spark.extract.rdfa import EXTRACT_SCHEMA, FlatTriple
from argo_spark.namespaces import (
    RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, has_iri_scheme,
)
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL, skolem_id

XSD = "http://www.w3.org/2001/XMLSchema#"


class JsonLdError(Exception):
    pass


class _Context:
    """One resolved @context scope: term map + @vocab/@base."""

    def __init__(self, parent: Optional["_Context"] = None):
        self.terms: dict = dict(parent.terms) if parent else {}
        self.vocab: Optional[str] = parent.vocab if parent else None
        self.base: Optional[str] = parent.base if parent else None

    def apply(self, ctx) -> "_Context":
        out = _Context(self)
        specs = ctx if isinstance(ctx, list) else [ctx]
        for spec in specs:
            if spec is None:
                out.terms, out.vocab, out.base = {}, None, None
                continue
            if isinstance(spec, str):
                raise JsonLdError(
                    f"remote @context {spec!r} unsupported (no fetcher)"
                )
            if not isinstance(spec, dict):
                raise JsonLdError(f"bad @context entry {spec!r}")
            for term, val in spec.items():
                if term == "@vocab":
                    if not isinstance(val, str):
                        raise JsonLdError(f"non-string @vocab {val!r}")
                    out.vocab = val
                elif term == "@base":
                    if not isinstance(val, str):
                        raise JsonLdError(f"non-string @base {val!r}")
                    out.base = val
                elif isinstance(val, str):
                    out.terms[term] = {"@id": val}
                elif (
                    isinstance(val, dict)
                    and isinstance(val.get("@id"), str)
                ):
                    out.terms[term] = {
                        "@id": val["@id"],
                        "@type": val.get("@type"),
                    }
                else:
                    raise JsonLdError(f"bad term definition {term!r}: {val!r}")
        return out

    def expand_key(self, key: str) -> Optional[str]:
        """Property/type key -> IRI, or None when unmappable (the
        caller skips junk keys)."""
        if key in self.terms:
            iri = self.terms[key]["@id"]
            # term definitions may themselves be prefixed
            return self.expand_key(iri) if not has_iri_scheme(iri) else iri
        p, _, local = key.partition(":")
        if local and p in self.terms:
            base = self.terms[p]["@id"]
            return (self.expand_key(base) or base) + local
        if has_iri_scheme(key):
            return key
        if self.vocab is not None and not key.startswith("@"):
            return self.vocab + key
        return None

    def coerced_id(self, key: str) -> bool:
        return (
            key in self.terms and self.terms[key].get("@type") == "@id"
        )

    def expand_id(self, ref: str) -> str:
        """@id value -> IRI string (relative against @base)."""
        if ref.startswith("_:"):
            return ref
        if has_iri_scheme(ref):
            return ref
        if self.base:
            return urljoin(self.base, ref)
        return ref


class _Extractor:
    def __init__(self, skolem_key: str):
        self.skolem_key = skolem_key
        self._anon = 0
        self._labels: dict = {}
        self.triples: List[FlatTriple] = []

    def fresh_bnode(self) -> Tuple[int, str]:
        self._anon += 1
        return KIND_BLANK, skolem_id(self.skolem_key, "jsonld", self._anon)

    def bnode_label(self, label: str) -> str:
        """JSON-LD blank-node labels are scoped to ONE document —
        two ld+json blocks on a page both using _:b0 name DIFFERENT
        nodes. Remap every explicit label through a per-document
        deterministic skolem (consistent within the document)."""
        if label not in self._labels:
            self._labels[label] = skolem_id(
                self.skolem_key, "jsonld-label-" + label, 0
            )
        return self._labels[label]

    def node_id(self, node: dict, ctx: _Context) -> Tuple[int, str]:
        ref = node.get("@id")
        if ref is None:
            return self.fresh_bnode()
        if not isinstance(ref, str):
            raise JsonLdError(f"non-string @id {ref!r}")
        if ref.startswith("_:"):
            return KIND_BLANK, self.bnode_label(ref[2:])
        return KIND_IRI, ctx.expand_id(ref)

    def emit(self, s, p: str, o):
        self.triples.append((s[0], s[1], p) + o)

    def value_object(self, v: dict, ctx: _Context):
        val = v.get("@value")
        if val is None:
            raise JsonLdError(f"@value object without @value: {v!r}")
        lang = v.get("@language")
        if lang is not None and not isinstance(lang, str):
            raise JsonLdError(f"non-string @language {lang!r}")
        dt = v.get("@type")
        if dt is not None:
            if not isinstance(dt, str):
                raise JsonLdError(f"non-string value @type {dt!r}")
            dt = ctx.expand_key(dt) or dt
        if isinstance(val, bool):
            return (KIND_LITERAL, "true" if val else "false", None,
                    dt or XSD + "boolean")
        if isinstance(val, (int, float)):
            return self._number(val, dt)
        return (KIND_LITERAL, str(val), lang, dt)

    @staticmethod
    def _number(v, dt=None):
        if isinstance(v, int):
            return (KIND_LITERAL, str(v), None, dt or XSD + "integer")
        lex = repr(v)
        return (KIND_LITERAL, lex, None, dt or XSD + "double")

    def object_for(self, key: str, v, ctx: _Context):
        """One property value -> object tuple (emitting nested
        nodes' triples); returns None for skippable values."""
        if isinstance(v, dict):
            if "@value" in v:
                return self.value_object(v, ctx)
            if "@list" in v:
                items = [
                    self.object_for(key, item, ctx) for item in v["@list"]
                ]
                items = [o for o in items if o is not None]
                if not items:
                    return (KIND_IRI, RDF_NIL, None, None)
                cells = [self.fresh_bnode() for _ in items]
                for i, (item, cell) in enumerate(zip(items, cells)):
                    self.emit(cell, RDF_FIRST, item)
                    rest = (
                        cells[i + 1] + (None, None)
                        if i + 1 < len(items)
                        else (KIND_IRI, RDF_NIL, None, None)
                    )
                    self.emit(cell, RDF_REST, rest)
                return cells[0] + (None, None)
            # nested node object
            kind, value = self.walk_node(v, ctx)
            return (kind, value, None, None)
        if isinstance(v, bool):
            return (KIND_LITERAL, "true" if v else "false", None,
                    XSD + "boolean")
        if isinstance(v, (int, float)):
            return self._number(v)
        if isinstance(v, str):
            if ctx.coerced_id(key):
                ref = ctx.expand_id(v)
                if ref.startswith("_:"):
                    return (KIND_BLANK, self.bnode_label(ref[2:]), None, None)
                return (KIND_IRI, ref, None, None)
            return (KIND_LITERAL, v, None, None)
        if v is None:
            return None
        raise JsonLdError(f"unsupported value {v!r}")

    def walk_node(self, node: dict, ctx: _Context) -> Tuple[int, str]:
        if "@context" in node:
            ctx = ctx.apply(node["@context"])
        subj = self.node_id(node, ctx)
        types = node.get("@type", [])
        for t in types if isinstance(types, list) else [types]:
            if not isinstance(t, str):
                raise JsonLdError(f"non-string @type entry {t!r}")
            iri = ctx.expand_key(t)
            if iri is not None:
                self.emit(subj, RDF_TYPE, (KIND_IRI, iri, None, None))
        for key, val in node.items():
            if key.startswith("@"):
                if key == "@graph":
                    for sub in val if isinstance(val, list) else [val]:
                        if isinstance(sub, dict):
                            self.walk_node(sub, ctx)
                continue
            p = ctx.expand_key(key)
            if p is None:
                continue  # junk key — skipped, not an error
            for v in val if isinstance(val, list) else [val]:
                o = self.object_for(key, v, ctx)
                if o is not None:
                    self.emit(subj, p, o)
        return subj


def jsonld_to_triples(
    doc, skolem_key: str = ""
) -> List[FlatTriple]:
    """One parsed JSON-LD document (dict or top-level array of node
    objects) -> flat triples. Raises JsonLdError on the unsupported
    constructs listed in the module docstring."""
    ex = _Extractor(skolem_key)
    ctx = _Context()
    nodes = doc if isinstance(doc, list) else [doc]
    for node in nodes:
        if not isinstance(node, dict):
            raise JsonLdError(f"top-level item is not a node: {node!r}")
        ex.walk_node(node, ctx)
    return ex.triples


def parse_jsonld(
    text: str, skolem_key: str = ""
) -> Tuple[List[FlatTriple], Optional[str]]:
    """JSON text -> (triples, error); all-or-nothing per document."""
    try:
        return jsonld_to_triples(json.loads(text), skolem_key), None
    except json.JSONDecodeError as e:
        return [], f"invalid JSON ({e.msg})"
    except JsonLdError as e:
        return [], str(e)
    except RecursionError:
        return [], "jsonld: nesting too deep"
    except (TypeError, ValueError, AttributeError, KeyError) as e:
        # totality backstop: structurally-junk embeds (non-string
        # keys/ids/contexts beyond the validated cases) must yield an
        # error row, never crash the Arrow stage
        return [], f"malformed JSON-LD: {type(e).__name__}: {e}"


def extract_jsonld_blocks(html: str) -> List[str]:
    """Every ``<script type="application/ld+json">`` body in the
    page. Script bodies are raw text per HTML5 (no entity decoding,
    no nested tags), so a case-insensitive tag scan is exact and
    avoids a full tree parse; attribute order and quoting don't
    matter because the match is on the whole open tag."""
    out = []
    low = html.lower()
    pos = 0
    while True:
        start = low.find("<script", pos)
        if start < 0:
            return out
        tag_end = low.find(">", start)
        if tag_end < 0:
            return out
        tag = low[start:tag_end]
        body_end = low.find("</script", tag_end)
        if body_end < 0:
            return out
        if "application/ld+json" in tag:
            out.append(html[tag_end + 1:body_end])
        pos = body_end + 1


def extract_jsonld_page(
    html: str, skolem_key: str = ""
) -> Tuple[List[FlatTriple], List[str]]:
    """All ld+json blocks of a page -> (triples, block_errors). A bad
    block voids only itself (crawl pages routinely carry one broken
    embed next to a good one)."""
    triples: List[FlatTriple] = []
    errors: List[str] = []
    for i, block in enumerate(extract_jsonld_blocks(html)):
        t, err = parse_jsonld(block, f"{skolem_key}\x1f{i}")
        if err is not None:
            errors.append(f"block {i}: {err}")
        else:
            triples.extend(t)
    return triples, errors


def extract_jsonld_df(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> triples with provenance —
    the JSON-LD twin of extract/rdfa.py::extract_triples_df: one
    Arrow stage, pruned 3-column scan, zero shuffles; block errors
    are dropped silently here (use extract_jsonld_page for them)."""
    src = pages.select("url", "warc_ts", "html")

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["s_kind", "s_value", "p_value", "o_kind", "o_value",
                "o_lang", "o_dt", "url", "warc_ts"]
        for pdf in batches:
            rows = []
            for url, warc_ts, html in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"]
            ):
                h = (
                    html.decode("utf-8", errors="replace")
                    if isinstance(html, (bytes, bytearray))
                    else html
                )
                triples, _errs = extract_jsonld_page(h, f"{url}\x1f{warc_ts}")
                for t in triples:
                    rows.append(t + (url, warc_ts))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(fn, schema=EXTRACT_SCHEMA)
