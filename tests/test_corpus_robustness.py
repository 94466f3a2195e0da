"""Composed corpus cleaning + extractor robustness on hostile HTML."""

from __future__ import annotations

from argo_spark.extract.html import extract_text
from argo_spark.extract.rdfa import extract_page, extract_rdfa
from argo_spark.ops.corpus import clean_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the long meadow with great joy in the morning sun every single day"
)


def test_clean_corpus(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),                      # exact dup of 0
        (2, GOOD + " extra tail"),      # near dup of 0
        (3, "!!! ### ???"),             # low quality + short
        (4, "short text"),              # too few tokens
        (5, "le chat est dans la maison et les enfants sont dans le jardin "
            "avec le chien et les livres de la grande bibliotheque ce matin"),
        (6, "a completely different english document that talks about spark "
            "plans and the shuffle boundaries of wide transformations in detail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept, audit = clean_corpus(
        docs, languages=("en",), min_quality=0.5, min_tokens=10,
        neardup_threshold=0.5,
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 6]  # fr doc 5 filtered, dups 1/2 folded into 0
    assert audit["exact_dup"] == 1
    assert audit["near_dup"] == 1
    assert audit["lang_quality_length"] == 3
    assert audit["kept"] == 2


HOSTILE = [
    "",                                                   # empty
    "not html at all \x00\x01 binary-ish",
    "<div><span>unclosed everywhere",
    "</div></span> stray closers <p property='x'",
    "<div typeof='T'><div typeof='T'><div typeof='T'>",   # deep unclosed nesting
    "<?xml version='1.0'?><html><body><p property=>v</p>",
    "<div vocab='http://v/' property='a' content='1'>"     # valid inside garbage
    "<script>alert('<div property=fake>')</script>",
    "<a rel='r' href='http://e'>x</a>" * 500,              # repetition
    "﻿<html lang='x'>\udcff surrogates?</html>",
]


def test_extractor_never_crashes_and_is_deterministic():
    for h in HOSTILE:
        t1, text1 = extract_page(h, "http://doc", "k")
        t2, text2 = extract_page(h, "http://doc", "k")
        assert t1 == t2 and text1 == text2
        assert isinstance(text1, str)


def test_script_content_not_parsed_as_markup():
    h = (
        '<div vocab="http://v/"><span property="a" content="1"></span>'
        "<script>var x = '<span property=\"fake\" content=\"2\">';</script></div>"
    )
    t = extract_rdfa(h, "http://doc", "k")
    preds = [x[2] for x in t]
    assert preds == ["http://v/a"]
    assert "fake" not in extract_text(h)


def test_clean_corpus_quality_representative(spark):
    # doc 2 extends doc 0 with substantial extra content -> higher
    # quality_score; with representative="quality" it must survive
    # instead of the min-id doc
    from argo_spark.ops.textstats import quality_score
    from pyspark.sql import functions as F

    rows = [
        (0, GOOD),
        (2, GOOD + " and a further paragraph about join strategies in "
            "distributed query engines with broadcast and shuffle sides"),
        (6, "a completely different english document that talks about spark "
            "plans and the shuffle boundaries of wide transformations in "
            "detail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = {r.doc_id: r.q for r in docs.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert q[2] > q[0], "fixture must make the larger id higher quality"
    kept_min, _ = clean_corpus(
        docs, min_quality=0.0, min_tokens=1, neardup_threshold=0.5,
    )
    assert sorted(r.doc_id for r in kept_min.collect()) == [0, 6]
    kept_best, audit = clean_corpus(
        docs, min_quality=0.0, min_tokens=1, neardup_threshold=0.5,
        representative="quality",
    )
    assert sorted(r.doc_id for r in kept_best.collect()) == [2, 6]
    assert audit["near_dup"] == 1
    import pytest as _p
    with _p.raises(ValueError, match="representative"):
        clean_corpus(docs, representative="nope")
