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


def test_pack_sequences(spark):
    # round 5b: concat-and-chunk packing — per-shard prefix sum; a
    # doc lands in the sequence where it STARTS; spans allowed
    from argo_spark.ops.packing import pack_sequences

    rows = [
        # shard A, ordered: tokens 3, 4, 5, 2 with budget 8
        # stream: [0,3) [3,7) [7,12) [12,14)
        ("A", 1, 3), ("A", 2, 4), ("A", 3, 5), ("A", 4, 2),
        # shard B: one doc longer than the budget
        ("B", 1, 20),
        ("B", 2, 1),
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id int, nt int")
    out = pack_sequences(
        docs, budget=8, tokens_col="nt",
        id_cols=("doc_id",),
    )
    got = {(r.shard, r.doc_id): (r.n_tokens, r.seq_id, r.seq_offset)
           for r in out.collect()}
    assert got == {
        ("A", 1): (3, 0, 0),
        ("A", 2): (4, 0, 3),
        ("A", 3): (5, 0, 7),   # starts at 7, spans into seq 1
        ("A", 4): (2, 1, 4),   # 12 // 8 = 1, offset 4
        ("B", 1): (20, 0, 0),
        ("B", 2): (1, 2, 4),   # starts at 20: seq 2, offset 4
    }
    # deterministic across partitionings
    again = pack_sequences(
        docs.repartition(7), budget=8, tokens_col="nt"
    )
    assert {tuple(r) for r in again.collect()} == \
        {tuple(r) for r in out.collect()}
    # token counting from text when no tokens_col
    tdocs = spark.createDataFrame(
        [("A", 1, "three word doc"), ("A", 2, "two words")],
        "source string, doc_id int, text string",
    )
    tout = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
            for r in pack_sequences(tdocs, budget=4).collect()}
    assert tout == {1: (3, 0, 0), 2: (2, 0, 3)}
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(docs, budget=0, tokens_col="nt")
    # plan: exactly ONE exchange (hash on shard), no global sort
    plan = pack_sequences(docs, budget=8, tokens_col="nt") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan
