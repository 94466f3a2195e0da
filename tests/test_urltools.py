"""URL canonicalization / dedup / domain filtering (ops/urltools.py)."""

import pytest

from argo_spark.ops.urltools import (
    canonicalize_url,
    filter_blocked_domains,
    host_of,
    registered_domain,
    url_dedup,
)
from pyspark.sql import functions as F


CASES = [
    # (input, canonical)
    ("HTTP://WWW.Example.COM:80/Path/Index.html#frag",
     "http://www.example.com/Path/Index.html"),
    ("https://Example.com:443/", "https://example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com/a?utm_source=x&q=1&utm_medium=y",
     "http://example.com/a?q=1"),
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/a?fbclid=abc&gclid=d&b=2",
     "http://example.com/a?b=2"),
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("  http://example.com  ", "http://example.com"),
    # path/query case is preserved; only scheme+authority lowercase
    ("HtTpS://HoSt.Io/CaSe?Q=Va", "https://host.io/CaSe?Q=Va"),
    # no scheme: left as-is apart from the generic cleanups
    ("example.com/x/#f", "example.com/x"),
]


def test_canonicalize_url(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r.c for r in
        df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_host_and_registered_domain(spark):
    rows = [
        ("https://a.b.Example.COM:8443/x", "a.b.example.com", "example.com"),
        ("http://user@news.bbc.co.uk/y", "news.bbc.co.uk", "bbc.co.uk"),
        ("https://example.co.jp/", "example.co.jp", "example.co.jp"),
        ("http://localhost/", "localhost", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = df.select(
        host_of(F.col("url")).alias("h"),
        registered_domain(F.col("url")).alias("d"),
    ).collect()
    for (_, h, d), r in zip(rows, got):
        assert (r.h, r.d) == (h, d)


def test_url_dedup_keeps_best(spark):
    rows = [
        (1, "http://E.com/a?utm_source=x", 10.0),
        (2, "http://e.com/a", 50.0),       # same canonical, best quality
        (3, "http://e.com/a/", 50.0),      # tie on quality -> larger id loses
        (4, "http://e.com/b", 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")
    out = url_dedup(df, url_col="url", quality_col="q", id_col="doc_id")
    got = {r.canonical_url: (r.doc_id, r.q) for r in out.collect()}
    assert got == {
        "http://e.com/a": (2, 50.0),
        "http://e.com/b": (4, 1.0),
    }
    # deterministic without quality: min id wins
    out2 = url_dedup(df, url_col="url", id_col="doc_id")
    got2 = {r.canonical_url: r.doc_id for r in out2.collect()}
    assert got2["http://e.com/a"] == 1


def test_url_dedup_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "http://e.com/a", 1.0)], "doc_id long, url string, q double"
    )
    plan = url_dedup(df, "url", "q", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_filter_blocked_domains(spark):
    rows = [
        ("http://spam.example.com/x",),
        ("http://ok.org/y",),
        ("http://sub.deep.spamlord.co.uk/z",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = filter_blocked_domains(
        df, ["Example.com", "spamlord.co.uk"], url_col="url"
    )
    assert [r.url for r in out.collect()] == ["http://ok.org/y"]
    assert filter_blocked_domains(df, [], "url").count() == 3


def test_url_dedup_string_ids_no_ansi_crash(spark):
    # ADVICE r4: cast("long") on a non-numeric string id raised
    # CAST_INVALID_INPUT under ANSI mode; try_cast + raw-string
    # tiebreak keeps it deterministic instead.
    rows = [
        ("doc-b", "http://e.com/a", 1.0),
        ("doc-a", "http://e.com/a/", 1.0),   # same canonical, tie on q
        ("7", "http://e.com/b", 1.0),
        ("doc-z", "http://e.com/b?utm_source=x", 1.0),  # numeric id wins
    ]
    df = spark.createDataFrame(rows, "doc_id string, url string, q double")
    out = url_dedup(df, url_col="url", quality_col="q", id_col="doc_id")
    got = {r.canonical_url: r.doc_id for r in out.collect()}
    # tie on quality: non-numeric ids fall back to lexicographic min;
    # a numeric id always beats a non-numeric one
    assert got == {"http://e.com/a": "doc-a", "http://e.com/b": "7"}
