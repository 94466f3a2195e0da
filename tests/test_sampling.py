"""Deterministic sampling / quota operators (ops/sampling.py):
hash-determined decisions must be reproducible across partitionings
and exact at the fraction endpoints."""

from __future__ import annotations

import pytest

from argo_spark.ops.sampling import (
    _threshold_hex,
    cap_per_group,
    hash_sample,
    stratified_sample,
)


def _corpus(spark, n=2000):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "fr")
        .otherwise("de")
        .alias("lang"),
    )


def test_threshold_hex_endpoints():
    assert _threshold_hex(0.0) == "00000000"
    assert _threshold_hex(1.0) == "g"
    assert _threshold_hex(0.5) == "80000000"
    with pytest.raises(ValueError):
        _threshold_hex(1.5)


def test_hash_sample_deterministic_and_unbiased(spark):
    d = _corpus(spark)
    s1 = {r.doc_id for r in hash_sample(d, "doc_id", 0.25).collect()}
    s2 = {
        r.doc_id
        for r in hash_sample(d.repartition(13), "doc_id", 0.25).collect()
    }
    assert s1 == s2  # partitioning-independent
    assert 0.18 < len(s1) / 2000 < 0.32  # md5 uniformity at n=2000
    # fraction monotonicity: a bigger sample contains the smaller one
    s3 = {r.doc_id for r in hash_sample(d, "doc_id", 0.5).collect()}
    assert s1 <= s3
    # different salt -> effectively independent subset
    s4 = {r.doc_id for r in hash_sample(d, "doc_id", 0.25, salt="s1").collect()}
    assert s4 != s1
    # endpoints exact
    assert hash_sample(d, "doc_id", 1.0).count() == 2000
    assert hash_sample(d, "doc_id", 0.0).count() == 0


def test_stratified_sample(spark):
    d = _corpus(spark)
    out = stratified_sample(
        d, "lang", {"en": 1.0, "fr": 0.5}, key_col="doc_id"
    )
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert by_lang.get("en") == 667  # every en doc kept
    assert "de" not in by_lang  # default fraction 0 drops
    assert 250 < by_lang.get("fr", 0) < 420


def test_cap_per_group(spark):
    d = _corpus(spark)
    out = cap_per_group(d, "source", 10, key_col="doc_id")
    counts = [r["count"] for r in out.groupBy("source").count().collect()]
    assert counts == [10] * 7
    # deterministic across partitionings
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in cap_per_group(
            d.repartition(17), "source", 10, key_col="doc_id"
        ).collect()
    }
    assert a == b
    # keep_order override: best-N by doc_id descending
    top = cap_per_group(
        d, "source", 1, key_col="doc_id", keep_order=["doc_id"]
    )
    assert {r.doc_id for r in top.collect()} == {0, 1, 2, 3, 4, 5, 6}


def test_assign_split(spark):
    from argo_spark.ops.sampling import assign_split

    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = assign_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    from pyspark.sql import functions as F

    counts = {r.split: r.c for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # deterministic across partitionings
    again = assign_split(
        docs.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in again.collect()}
    assert a == b
    # same salt + same key -> same split across tables
    emb = spark.range(0, 2000).withColumnRenamed("id", "vec_id")
    c = {r.vec_id: r.split for r in assign_split(
        emb, "vec_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert a == c
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, "doc_id", {"a": 0.5, "b": 0.6})
