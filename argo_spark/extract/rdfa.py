"""RDFa triple extraction over web pages (SURVEY §2.1 S3 + §2.6).

Attribute semantics replicate the reference's DOM walk
(/root/reference/rdfaparser/rdfaparser.go:64-152) exactly:

* ``xmlns:p="uri"`` attributes extend the prefix map — which is ONE
  shared map per document (Go maps are reference types), so bindings
  persist beyond the declaring subtree (rdfaparser.go:66-73);
* ``vocab`` rebinds the vocab base for the subtree (passed by value,
  rdfaparser.go:76-79);
* ``typeof`` mints a new subject — the ``resource`` attr if present,
  else an anonymous node — and emits an rdf:type triple
  (rdfaparser.go:81-91); the subject scopes over the subtree;
* ``property`` emits a literal triple whose value is the ``content``
  attr, else the first child's data, else "" (rdfaparser.go:93-110);
  ``datatype`` (taken verbatim, NOT CURIE-expanded) wins over
  ``xml:lang`` (rdfaparser.go:112-123);
* ``rel`` + ``href`` emits a forward link, ``rev`` + ``href`` a
  reversed one (rdfaparser.go:128-146);
* CURIE expansion: ``prefix:local`` via the prefix map (missing prefix
  resolves to "" + local, the Go zero-value quirk), else
  vocabBase + name (rdfaparser.go:53-62);
* the document URI is the initial subject (rdfaparser.go:184).

Divergence: anonymous nodes are skolemized as a deterministic function
of (url, warc_ts, per-document ordinal) instead of the reference's
``rand.Int63`` labels (/root/reference/term.go:148-151) — required for
exactly-once resume and P/R comparison at scale.

Execution: one ``mapInPandas`` stage over (url, warc_ts, html) — the
only Python boundary in the pipeline; everything downstream is column
expressions. Mention detection + entity-link scoring (north-star
stages with no reference analogue) run in the same pass over the
boilerplate-stripped text so the HTML is parsed once.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

from argo_spark.extract.gazetteer import detect_mentions
from argo_spark.extract.html import (
    ELEMENT,
    Node,
    extract_text_from_tree,
    parse_html,
)
from argo_spark.namespaces import RDF_TYPE, SCHEMA
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL, Term, skolem_id

MENTIONS_PRED = SCHEMA + "mentions"

# flattened triple tuple: (s_kind, s_value, p_value, o_kind, o_value, o_lang, o_dt)
FlatTriple = Tuple[int, str, str, int, str, Optional[str], Optional[str]]


def _expand_uri(s: str, vocab_base: str, prefix_map: dict) -> str:
    p = s.find(":")
    if p < 0:
        return vocab_base + s
    return prefix_map.get(s[:p], "") + s[p + 1 :]


def extract_rdfa(
    html: str, doc_uri: str, skolem_key: str
) -> List[FlatTriple]:
    """Extract RDFa triples from one page, reference walk semantics."""
    return extract_rdfa_tree(parse_html(html), doc_uri, skolem_key)


def extract_rdfa_tree(
    root: Node, doc_uri: str, skolem_key: str
) -> List[FlatTriple]:
    out: List[FlatTriple] = []
    prefix_map: dict = {}  # shared across the whole document
    anon_ordinal = 0

    def emit(s: Term, p_value: str, o: Term) -> None:
        out.append((s.kind, s.value, p_value, o.kind, o.value, o.lang, o.dt))

    def walk(node: Node, subject: Term, vocab_base: str) -> None:
        nonlocal anon_ordinal
        # one first-wins pass over the attribute list instead of a
        # linear get_attr scan per attribute name (h5 getAttr takes
        # the first occurrence — dict insertion order preserves that);
        # attribute-less elements skip the whole RDFa block
        if node.type == ELEMENT and node.attrs:
            am: dict = {}
            for k, v in node.attrs:
                if k.startswith("xmlns:"):
                    prefix_map[k[6:]] = v
                if k not in am:
                    am[k] = v
            get_attr = am.get

            v = get_attr("vocab")
            if v is not None:
                vocab_base = v

            typeof = get_attr("typeof")
            if typeof is not None:
                resource = get_attr("resource")
                if resource is not None:
                    subject = Term(KIND_IRI, resource)
                else:
                    subject = Term(KIND_BLANK, skolem_id(skolem_key, "", anon_ordinal))
                    anon_ordinal += 1
                emit(
                    subject,
                    RDF_TYPE,
                    Term(KIND_IRI, _expand_uri(typeof, vocab_base, prefix_map)),
                )

            prop = get_attr("property")
            if prop is not None:
                predicate = _expand_uri(prop, vocab_base, prefix_map)
                content = get_attr("content")
                if content is not None:
                    value = content
                elif node.children:
                    value = node.children[0].data()
                else:
                    value = ""
                datatype = get_attr("datatype")
                if datatype is not None:
                    obj = Term(KIND_LITERAL, value, dt=datatype)
                else:
                    lang = get_attr("xml:lang")
                    if lang is not None:
                        obj = Term(KIND_LITERAL, value, lang=lang)
                    else:
                        obj = Term(KIND_LITERAL, value)
                emit(subject, predicate, obj)

            rel = get_attr("rel")
            if rel is not None:
                href = get_attr("href")
                if href is not None:
                    emit(
                        subject,
                        _expand_uri(rel, vocab_base, prefix_map),
                        Term(KIND_IRI, href),
                    )

            rev = get_attr("rev")
            if rev is not None:
                href = get_attr("href")
                if href is not None:
                    emit(
                        Term(KIND_IRI, href),
                        _expand_uri(rev, vocab_base, prefix_map),
                        subject,
                    )

        for child in node.children:
            walk(child, subject, vocab_base)

    walk(root, Term(KIND_IRI, doc_uri), "")
    return out


def extract_page(
    html: str, doc_uri: str, skolem_key: str, with_mentions: bool = True
) -> Tuple[List[FlatTriple], str]:
    """Full per-page extraction: RDFa triples + boilerplate-stripped
    text + mention/entity-link triples. Returns (triples, text).

    The HTML is parsed ONCE; the tree feeds both the RDFa walk and the
    text strip (parsing dominates per-page cost — measured 2x win)."""
    root = parse_html(html)
    triples = extract_rdfa_tree(root, doc_uri, skolem_key)
    text = extract_text_from_tree(root)
    if with_mentions:
        for iri, _score in detect_mentions(text):
            triples.append(
                (KIND_IRI, doc_uri, MENTIONS_PRED, KIND_IRI, iri, None, None)
            )
    return triples, text


EXTRACT_SCHEMA = (
    "s_kind tinyint, s_value string, p_value string, o_kind tinyint, "
    "o_value string, o_lang string, o_dt string, url string, warc_ts timestamp"
)

TEXT_SCHEMA = "url string, text string"


def _extract_batches(
    batches: Iterable[pd.DataFrame], with_mentions: bool, emit_text: bool
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list = []
        texts: list = []
        for url, warc_ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
            h = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
            skolem_key = f"{url}\x1f{warc_ts}"
            triples, text = extract_page(h, url, skolem_key, with_mentions)
            if emit_text:
                texts.append((url, text))
            else:
                for t in triples:
                    rows.append(t + (url, warc_ts))
        if emit_text:
            yield pd.DataFrame(texts, columns=["url", "text"])
        else:
            yield pd.DataFrame(
                rows,
                columns=[
                    "s_kind", "s_value", "p_value", "o_kind",
                    "o_value", "o_lang", "o_dt", "url", "warc_ts",
                ],
            )


def extract_triples_df(pages: DataFrame, with_mentions: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> triples with provenance.

    One Arrow-batched stage; column pruning pushes the projection to
    the parquet scan (only url/warc_ts/html are read).
    """
    src = pages.select("url", "warc_ts", "html")

    def fn(batches):
        return _extract_batches(batches, with_mentions, emit_text=False)

    return src.mapInPandas(fn, schema=EXTRACT_SCHEMA)


def extract_text_df(pages: DataFrame) -> DataFrame:
    """pages -> (url, text) via the deterministic boilerplate strip."""
    src = pages.select("url", "warc_ts", "html")

    def fn(batches):
        return _extract_batches(batches, with_mentions=False, emit_text=True)

    return src.mapInPandas(fn, schema=TEXT_SCHEMA)


def read_rdfa(spark, path: str) -> DataFrame:
    """HTML file(s)/glob -> RDFa triples — the ``rdfaparse`` tool path
    (/root/reference/rdfaparser/rdfaparse/rdfaparse.go:29-49: file in,
    N-Triples out). The input file name is the document URI (the
    reference passes the filename as the base URI); mentions are off
    (rdfaparse emits pure RDFa). One wholetext scan + one Arrow stage."""
    from pyspark.sql import functions as F

    pages = (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("url"),
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.col("value").alias("html"),
        )
    )
    return extract_triples_df(pages, with_mentions=False).drop("url", "warc_ts")
