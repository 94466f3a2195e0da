"""JSON-LD extractor (extract/jsonld.py): context handling, value
typing, nesting, @graph/@list, HTML block extraction, error routing,
and the distributed Arrow stage."""

from __future__ import annotations

import pytest

from argo_spark.extract.jsonld import (
    extract_jsonld_blocks, extract_jsonld_df, extract_jsonld_page,
    parse_jsonld,
)
from argo_spark.namespaces import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL

XSD = "http://www.w3.org/2001/XMLSchema#"
S = "http://schema.org/"


def test_schema_org_embed():
    doc = """{
      "@context": {"@vocab": "http://schema.org/",
                   "sameAs": {"@id": "http://schema.org/sameAs",
                              "@type": "@id"},
                   "@base": "http://base.org/"},
      "@id": "thing/1", "@type": "Person",
      "name": "Alice", "age": 36, "height": 1.72, "active": true,
      "title": {"@value": "Dr", "@language": "en"},
      "sameAs": ["https://wiki/A", "rel/b"],
      "knows": {"@type": "Person", "name": "Bob"}
    }"""
    triples, err = parse_jsonld(doc, "k")
    assert err is None
    got = set(triples)
    T = "http://base.org/thing/1"
    assert (0, T, RDF_TYPE, 0, S + "Person", None, None) in got
    assert (0, T, S + "name", 2, "Alice", None, None) in got
    assert (0, T, S + "age", 2, "36", None, XSD + "integer") in got
    assert (0, T, S + "height", 2, "1.72", None, XSD + "double") in got
    assert (0, T, S + "active", 2, "true", None, XSD + "boolean") in got
    assert (0, T, S + "title", 2, "Dr", "en", None) in got
    # @type: @id coercion makes strings IRIs; @base resolves rel/b
    assert (0, T, S + "sameAs", 0, "https://wiki/A", None, None) in got
    assert (0, T, S + "sameAs", 0, "http://base.org/rel/b", None, None) in got
    # the nested node links through a fresh bnode and emits its own
    nested = [t for t in got if t[2] == S + "knows"]
    assert nested[0][3] == KIND_BLANK
    bnode = nested[0][4]
    assert (1, bnode, S + "name", 2, "Bob", None, None) in got
    # determinism: same skolem_key -> same labels
    again, _ = parse_jsonld(doc, "k")
    assert sorted(again) == sorted(triples)


def test_graph_list_prefixed_and_junk_keys():
    doc = """{
      "@context": {"ex": "http://ex.org/"},
      "@graph": [
        {"@id": "http://e/a", "ex:ranks": {"@list": [1, 2]},
         "unmapped": "skipped", "@type": "ex:T"},
        {"@id": "_:b", "ex:p": {"@value": "5", "@type": "ex:dt"}}
      ]
    }"""
    triples, err = parse_jsonld(doc, "k")
    assert err is None
    got = set(triples)
    assert (0, "http://e/a", RDF_TYPE, 0, "http://ex.org/T", None, None) in got
    # the _:b label is remapped to a document-scoped skolem (JSON-LD
    # bnode labels don't survive across documents)
    (brow,) = [t for t in got if t[2] == "http://ex.org/p"]
    assert brow[0] == KIND_BLANK and brow[3:] == (
        2, "5", None, "http://ex.org/dt"
    )
    # no @vocab -> the junk key is skipped silently
    assert not any("unmapped" in t[2] for t in got)
    firsts = [t for t in got if t[2] == RDF_FIRST]
    rests = [t for t in got if t[2] == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(t[4] == RDF_NIL for t in rests)


@pytest.mark.parametrize("doc,frag", [
    ('{"@context": "https://schema.org", "@id": "http://e/a"}',
     "remote @context"),
    ("[1]", "not a node"),
    ("{bad", "invalid JSON"),
    ('{"@context": {"t": 5}, "@id": "http://e/a"}', "bad term definition"),
])
def test_errors(doc, frag):
    triples, err = parse_jsonld(doc, "k")
    assert triples == [] and frag in err, (err, frag)


def test_html_block_extraction():
    html = (
        "<html><head>"
        '<script type="application/ld+json">{"@id": "http://e/1", '
        '"@context": {"@vocab": "http://s/"}, "n": "a"}</script>'
        "<script>var x = '</scr' + 'ipt>';</script>"
        "<SCRIPT  TYPE='application/LD+JSON'>{broken</SCRIPT>"
        "</head><body></body></html>"
    )
    # case-insensitive tag match; the plain script is ignored
    blocks = extract_jsonld_blocks(html)
    assert len(blocks) == 2
    triples, errors = extract_jsonld_page(html, "p")
    assert triples == [(0, "http://e/1", "http://s/n", 2, "a", None, None)]
    assert len(errors) == 1 and "block 1" in errors[0]


def test_extract_jsonld_df(spark):
    rows = [
        ("http://p/1", "2026-01-01 00:00:00",
         '<script type="application/ld+json">{"@context": '
         '{"@vocab": "http://s/"}, "@id": "http://e/1", "k": 7}</script>'),
        ("http://p/2", "2026-01-01 00:00:00", "<html>no embed</html>"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html string"
    ).withColumn("warc_ts", __import__("pyspark.sql.functions", fromlist=["col"]).col("warc_ts").cast("timestamp"))
    out = extract_jsonld_df(pages).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.s_value, r.p_value, r.o_value, r.url) == (
        "http://e/1", "http://s/k", "7", "http://p/1"
    )
    assert r.o_dt == XSD + "integer"


def test_junk_embeds_are_errors_not_crashes():
    """Review regression: structurally-junk embeds (non-string @type
    entries / @vocab / @base / @id / term defs / @language) must
    yield per-block error rows, never TypeError out of the Arrow
    stage. Each case previously raised."""
    for doc in (
        '{"@type": [{"x": 1}]}',
        '{"@context": {"@vocab": 5}, "a": "b"}',
        '{"@context": {"t": {"@id": 5}}, "t": "x"}',
        '{"@context": {"@base": 7}, "@id": "x"}',
        '{"@context": {"@vocab": "http://x/"},'
        ' "a": {"@value": "v", "@language": 5}}',
        '{"@id": 5}',
    ):
        triples, err = parse_jsonld(doc, "k")
        assert triples == [] and isinstance(err, str), (doc, err)


def test_bnode_labels_scoped_per_block():
    """Review regression: _:b0 in two separate ld+json blocks names
    two DIFFERENT nodes (JSON-LD bnode labels are document-scoped);
    within one document the label stays consistent."""
    html = (
        '<script type="application/ld+json">{"@context":'
        '{"@vocab":"http://s/"},"@id":"_:b0","n":"one"}</script>'
        '<script type="application/ld+json">{"@context":'
        '{"@vocab":"http://s/"},"@id":"_:b0","n":"two"}</script>'
    )
    triples, errs = extract_jsonld_page(html, "p")
    assert not errs
    assert len({t[1] for t in triples}) == 2
    doc = (
        '{"@context": {"@vocab": "http://s/", "r": {"@id": "http://s/r",'
        ' "@type": "@id"}}, "@id": "_:a", "n": "x", "r": "_:a"}'
    )
    t2, err = parse_jsonld(doc, "k")
    assert err is None
    (n_row, r_row) = sorted(t2, key=lambda t: t[2])
    assert r_row[1] == r_row[4]  # self-reference stays consistent
