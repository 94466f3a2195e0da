"""RDFa walk semantics (/root/reference/rdfaparser/rdfaparser.go:64-152)
and the end-to-end P/R gate on the synthetic corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from argo_spark.extract.gazetteer import DBP as _unused  # noqa: F401
from argo_spark.extract.gazetteer import detect_mentions
from argo_spark.extract.html import extract_text
from argo_spark.extract.rdfa import extract_rdfa, extract_triples_df, extract_text_df
from argo_spark.namespaces import FOAF, RDF_TYPE, SCHEMA
from argo_spark.pages import gen_page, synthesize_pages, expected_triples
from argo_spark.terms import KIND_BLANK, KIND_IRI, KIND_LITERAL, skolem_id

DOC = "http://example.org/doc"


def ex(html):
    return extract_rdfa(html, DOC, "k")


def test_typeof_resource_and_property_child_text():
    html = (
        '<div vocab="http://schema.org/" typeof="Person" resource="http://e/X">'
        '<span property="name">Ada</span></div>'
    )
    assert ex(html) == [
        (KIND_IRI, "http://e/X", RDF_TYPE, KIND_IRI, SCHEMA + "Person", None, None),
        (KIND_IRI, "http://e/X", SCHEMA + "name", KIND_LITERAL, "Ada", None, None),
    ]


def test_typeof_without_resource_mints_skolem_anon():
    html = '<div vocab="http://schema.org/" typeof="Event"><span property="name">E</span></div>'
    t = ex(html)
    anon = skolem_id("k", "", 0)
    assert t[0] == (KIND_BLANK, anon, RDF_TYPE, KIND_IRI, SCHEMA + "Event", None, None)
    assert t[1][:2] == (KIND_BLANK, anon)
    # deterministic across runs; second anon block gets the next ordinal
    html2 = html + html
    t2 = ex(html2)
    assert t2[2][1] == skolem_id("k", "", 1) != anon


def test_property_content_datatype_lang_precedence():
    html = (
        '<div vocab="http://v/">'
        '<span property="a" content="c1">ignored</span>'
        '<span property="b" datatype="http://dt" xml:lang="fr" content="v"></span>'
        '<span property="c" xml:lang="en" content="v2"></span>'
        '<span property="d"></span>'
        "</div>"
    )
    t = ex(html)
    # content attr wins over child text; datatype wins over xml:lang
    assert t[0] == (KIND_IRI, DOC, "http://v/a", KIND_LITERAL, "c1", None, None)
    assert t[1] == (KIND_IRI, DOC, "http://v/b", KIND_LITERAL, "v", None, "http://dt")
    assert t[2] == (KIND_IRI, DOC, "http://v/c", KIND_LITERAL, "v2", "en", None)
    # no content, no children -> empty literal (rdfaparser.go:104-110)
    assert t[3] == (KIND_IRI, DOC, "http://v/d", KIND_LITERAL, "", None, None)


def test_rel_and_rev():
    html = (
        '<div vocab="http://v/">'
        '<a rel="next" href="http://e/2">n</a>'
        '<a rev="prev" href="http://e/0">p</a></div>'
    )
    t = ex(html)
    assert t[0] == (KIND_IRI, DOC, "http://v/next", KIND_IRI, "http://e/2", None, None)
    # rev reverses subject and object (rdfaparser.go:138-146)
    assert t[1] == (KIND_IRI, "http://e/0", "http://v/prev", KIND_IRI, DOC, None, None)


def test_rel_without_href_emits_nothing():
    assert ex('<div vocab="http://v/"><a rel="next">n</a></div>') == []


def test_xmlns_binding_is_document_global():
    # binding declared in an earlier sibling persists (Go shared map,
    # rdfaparser.go:66-73)
    html = (
        '<div xmlns:foaf="http://xmlns.com/foaf/0.1/"></div>'
        '<span property="foaf:name">Ada</span>'
    )
    t = ex(html)
    assert t == [(KIND_IRI, DOC, FOAF + "name", KIND_LITERAL, "Ada", None, None)]


def test_unknown_prefix_resolves_to_bare_local():
    # Go map zero value: missing prefix -> "" + local (rdfaparser.go:53-62)
    t = ex('<span property="nope:x" content="v"></span>')
    assert t == [(KIND_IRI, DOC, "x", KIND_LITERAL, "v", None, None)]


def test_vocab_scoped_to_subtree():
    html = (
        '<div vocab="http://a/"><span property="p" content="1"></span></div>'
        '<span property="q" content="2"></span>'
    )
    t = ex(html)
    assert t[0][2] == "http://a/p"
    assert t[1][2] == "q"  # vocab did not leak to the sibling


def test_extract_text_strips_boilerplate():
    html = (
        "<html><head><title>T</title><script>x</script></head><body>"
        "<nav>skip</nav><p>hello   world</p><footer>skip</footer></body></html>"
    )
    assert extract_text(html) == "T hello world"


def test_detect_mentions_independent():
    text = "we met Ada Lovelace and Alan Turing in London today"
    got = detect_mentions(text)
    iris = [i for i, _ in got]
    assert iris == [
        "http://dbpedia.org/resource/Ada_Lovelace",
        "http://dbpedia.org/resource/Alan_Turing",
        "http://dbpedia.org/resource/London",
    ]
    # no substring false-positives, case-sensitive
    assert detect_mentions("london ada lovelace NotLondoner") == []


def test_gen_page_text_matches_extractor():
    """The byte-identical text invariant, page by page."""
    for pid in range(40):
        url, warc_ts, html, text, lang, _ = gen_page(pid)
        assert extract_text(html.decode("utf-8")) == text, pid


def test_gen_page_triples_match_extractor_exactly():
    """P/R = 1.0 on the synthetic corpus, pure-Python path."""
    from argo_spark.extract.rdfa import extract_page

    for pid in range(40):
        url, warc_ts, html, text, lang, golden = gen_page(pid)
        skolem_key = f"{url}\x1f{warc_ts}"
        got, got_text = extract_page(html.decode("utf-8"), url, skolem_key)
        assert got_text == text
        assert sorted(got) == sorted(golden), pid


def test_distributed_extraction_pr(spark):
    """End-to-end over Spark: extracted triple set == golden set
    (precision = recall = 1.0 >= the 0.95 gate), any parallelism."""
    n = 150
    pages = synthesize_pages(spark, n, partitions=7)
    got = extract_triples_df(pages).drop("url", "warc_ts").dropDuplicates()
    gold = expected_triples(spark, n, partitions=3).drop("url", "warc_ts").dropDuplicates()
    only_got = got.exceptAll(gold).count()
    only_gold = gold.exceptAll(got).count()
    assert only_got == 0 and only_gold == 0
    assert got.count() > n  # sanity: plenty of triples

    # text invariant distributed + stable across partitioning
    texts = extract_text_df(pages)
    joined = pages.select("url", F.col("text").alias("expected")).join(texts, "url")
    assert joined.where(F.col("text") != F.col("expected")).count() == 0
