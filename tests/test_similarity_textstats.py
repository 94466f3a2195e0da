"""ANN similarity search, text statistics, multimodal plumbing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from argo_spark.ops.multimodal import extract_media_features, synthesize_media
from argo_spark.ops.similarity import brute_force_topk, cosine, lsh_topk
from argo_spark.ops.textstats import document_stats


def emb(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i < 5:  # planted near-neighbors: tiny perturbation of i
            rows.append((1000 + i, [x + 0.01 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<float>, b array<float>",
    )
    vals = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(vals[0], 1.0, abs_tol=1e-6)
    assert math.isclose(vals[1], 0.0, abs_tol=1e-6)


def test_brute_force_topk_finds_planted(spark):
    e = emb(spark)
    queries = e.where("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(e, queries, k=3)
    best = {r.query_id: r.neighbor_id for r in top.where("rank = 1").collect()}
    assert best == {i: 1000 + i for i in range(5)}


def test_lsh_topk_recall_on_planted(spark):
    e = emb(spark)
    top = lsh_topk(e, k=3, n_planes=6)
    best = {r.query_id: r.neighbor_id for r in top.where("rank = 1").collect()}
    hits = sum(1 for i in range(5) if best.get(i) == 1000 + i)
    assert hits >= 4  # LSH is approximate; planted pairs are near-identical


def test_embedding_neardup_and_dedup(spark):
    from argo_spark.ops.similarity import embedding_dedup, embedding_neardup_pairs

    e = emb(spark)
    exact = embedding_neardup_pairs(e, threshold=0.99, dim=8, exact=True)
    got = {(r.a, r.b) for r in exact.collect()}
    assert {(i, 1000 + i) for i in range(5)} <= got
    # LSH path finds (almost) the same planted pairs
    lsh = embedding_neardup_pairs(e, threshold=0.99, dim=8, n_planes=4, n_tables=4)
    got_lsh = {(r.a, r.b) for r in lsh.collect()}
    assert len(got_lsh & {(i, 1000 + i) for i in range(5)}) >= 4
    assert got_lsh <= got  # verification: never a false positive
    # dedup keeps the min-id representative
    kept = {r.vec_id for r in embedding_dedup(e, threshold=0.99, dim=8, exact=True).collect()}
    assert all(i in kept and (1000 + i) not in kept for i in range(5))


def test_document_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "The cat and the dog played in the garden with the ball."),
            (2, "le chat est dans la maison et les enfants sont dans le jardin"),
            (3, "!!! ??? ###"),
            (4, "el perro y el gato que juegan en la casa con los amigos"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in document_stats(df).collect()}
    assert out[1].lang_pred == "en"
    assert out[2].lang_pred == "fr"
    assert out[4].lang_pred == "es"
    assert out[3].lang_pred == "und"
    assert out[1].n_tokens == 12
    assert out[1].quality > out[3].quality
    # fingerprint is whitespace-robust and deterministic
    df2 = spark.createDataFrame(
        [(1, "  The cat and   the dog played in the garden with the ball. ")],
        "doc_id long, text string",
    )
    fp1 = out[1].fingerprint
    fp2 = document_stats(df2).collect()[0].fingerprint
    assert fp1 == fp2


def test_multimodal_stub_plumbing(spark):
    media = synthesize_media(spark, 30)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    by_id = {r.media_id: r for r in rows}
    assert all(len(r.feat) == 8 for r in rows)
    assert all(r.sha256 and r.n_bytes > 0 for r in rows)
    # deterministic across runs
    again = {r.media_id: r for r in extract_media_features(media).collect()}
    assert all(by_id[i].sha256 == again[i].sha256 for i in by_id)
    # image rows have exactly one frame; av rows have >= 1
    assert all(r.frames == 1 for r in rows if r.kind == "image")


def test_ivf_topk_matches_brute_force_on_clustered_data(spark):
    """IVF coarse-quantizer ANN: on well-separated clusters the probe
    of the nearest inverted lists recovers the exact top-k."""
    import math

    from argo_spark.ops.similarity import brute_force_topk, ivf_topk, kmeans_centroids

    rows = []
    for i in range(60):
        c = i % 3  # three well-separated direction clusters
        base = [math.cos(2.1 * c + 0.02 * j) + 3 * (c == (j % 3)) for j in range(8)]
        rows.append((i, [x + 0.01 * (i % 5) for x in base]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.where("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    exact = brute_force_topk(emb, queries, k=5)
    cents = kmeans_centroids(emb, n_clusters=3, dim=8)
    assert len(cents) == 3 and all(len(c) == 8 for c in cents)
    approx = ivf_topk(emb, queries, k=5, n_clusters=3, nprobe=1, dim=8,
                      centroids=cents, exclude_self=True)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, f"IVF recall {recall}"
    # determinism: second build gives identical centroids
    assert kmeans_centroids(emb, n_clusters=3, dim=8) == cents


def test_scrub_pii(spark):
    from argo_spark.ops.textstats import scrub_pii

    df = spark.createDataFrame(
        [(0, "mail a.b+c@ex.co or call +44 (0)20 7946-0958, host 10.1.2.3 ok")],
        "id long, text string",
    )
    out = df.select(scrub_pii(F.col("text")).alias("t")).first().t
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "@" not in out and "7946" not in out and "10.1.2.3" not in out


def test_decontaminate(spark):
    """Docs sharing >= 1 benchmark 8-gram are flagged and removed."""
    from argo_spark.ops.decontaminate import decontaminate

    bench_text = "the exact eight word benchmark sentence appears right here"
    docs = spark.createDataFrame(
        [
            (0, "prefix words then " + bench_text + " and a suffix"),
            (1, "a completely different document with no overlap at all whatsoever"),
            (2, bench_text),  # identical
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(bench_text,)], "text string")
    kept, flagged = decontaminate(docs, bench, n=8)
    assert {r.doc_id for r in flagged.collect()} == {0, 2}
    assert {r.doc_id for r in kept.collect()} == {1}


def test_scrub_pii_never_crosses_newlines(spark):
    """A newline-separated column of numbers is NOT a phone number."""
    from argo_spark.ops.textstats import scrub_pii

    df = spark.createDataFrame(
        [(0, "12\n345\n678\n90 but 555 010 1234 is phone-like")],
        "id long, text string",
    )
    out = df.select(scrub_pii(F.col("text")).alias("t")).first().t
    assert "12\n345\n678" in out       # untouched across lines
    assert "<PHONE>" in out and "555" not in out


def test_multimodal_real_decode_seam_raises(spark):
    """VERDICT #9 contract: the one declared stub in the repo.
    decode_stub=False must fail with NotImplementedError exactly at
    the decode seam (PIL/ffmpeg absent in this container) — the
    Spark-side plumbing up to that point is real."""
    import pytest
    from pyspark.errors import PythonException

    from argo_spark.ops.multimodal import extract_media_features, synthesize_media

    media = synthesize_media(spark, 4)
    df = extract_media_features(media, decode_stub=False)
    with pytest.raises(PythonException, match="real decode requires PIL/ffmpeg"):
        df.collect()


def test_repetition_score(spark):
    from pyspark.sql import functions as F

    from argo_spark.ops.textstats import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> 2/5 distinct
            (2, "all words differ here now"),  # 4 distinct / 4
            (3, "one"),                # shorter than n -> 0.0
            (4, ""),                   # empty -> 0.0
        ],
        "id long, text string",
    )
    got = {
        r.id: r.rep
        for r in df.select(
            "id", repetition_score(F.col("text")).alias("rep")
        ).collect()
    }
    assert got == {1: 0.6, 2: 0.0, 3: 0.0, 4: 0.0}


def test_quality_flags(spark):
    from pyspark.sql import functions as F

    from argo_spark.ops.textstats import quality_flags

    good = "the quick brown fox jumps over the lazy dog and " * 10
    bully = "\n".join("- item %d" % i for i in range(10))
    symbols = "### " * 100
    docs = spark.createDataFrame(
        [(1, good), (2, bully), (3, symbols), (4, "too short")],
        "id long, text string",
    )
    flags = quality_flags(F.col("text"), min_words=20)
    out = docs.select("id", *[c.alias(n) for n, c in flags.items()])
    rows = {r.id: r.asDict() for r in out.collect()}
    assert rows[1]["pass_all"] is True
    assert rows[2]["flag_bullet_ratio"] is False  # 100% bullet lines
    assert rows[3]["flag_symbol_ratio"] is False
    assert rows[4]["flag_word_count"] is False
    assert rows[4]["flag_stopwords"] is False


def test_repetition_stats_matches_column_version(spark):
    from pyspark.sql import functions as F

    from argo_spark.ops.textstats import repetition_score, repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "all words differ here now"),
            (3, "one"),
            (4, ""),
            (5, "x y x y z x y"),
        ],
        "id long, text string",
    )
    col_ver = {
        r.id: r.rep
        for r in df.select(
            "id", repetition_score(F.col("text")).alias("rep")
        ).collect()
    }
    df_ver = {
        r.id: r.repetition for r in repetition_stats(df, "text").collect()
    }
    assert col_ver == df_ver
    # the scale path must not contain an interpreted HOF lambda
    plan = repetition_stats(df, "text")._jdf.queryExecution() \
        .analyzed().toString()
    assert "lambdafunction" not in plan.lower()
