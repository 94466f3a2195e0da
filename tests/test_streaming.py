"""Streaming ingest: exactly-once across incremental runs, parity with
batch extraction, watermarked windowed stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from argo_spark.extract.rdfa import extract_triples_df
from argo_spark.pages import synthesize_pages
from argo_spark.streaming import stream_extract_to_parquet, stream_predicate_stats


def test_streaming_extract_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    cp = str(tmp_path / "cp")

    # batch 1 lands
    synthesize_pages(spark, 60).write.mode("append").parquet(pages_dir)
    q = stream_extract_to_parquet(spark, pages_dir, out, cp)
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # restart with no new data: nothing reprocessed
    q = stream_extract_to_parquet(spark, pages_dir, out, cp)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == n1

    # batch 2 lands; restart processes ONLY the new files
    synthesize_pages(spark, 40, seed=43).write.mode("append").parquet(pages_dir)
    q = stream_extract_to_parquet(spark, pages_dir, out, cp)
    q.awaitTermination()
    got = spark.read.parquet(out)

    # parity with one-shot batch extraction over the same directory
    batch = extract_triples_df(spark.read.parquet(pages_dir))
    assert got.count() == batch.count()
    cols = [c for c in got.columns]
    assert got.select(*cols).exceptAll(batch.select(*cols)).count() == 0


def test_stateful_streaming_dedup(spark, tmp_path):
    from argo_spark.streaming import stream_dedup_to_parquet

    docs_dir = str(tmp_path / "docs")
    out = str(tmp_path / "deduped")
    cp = str(tmp_path / "cp")
    schema = "doc_id long, text string"

    # batch 1: 3 docs, one internal dup
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], schema
    ).write.mode("append").parquet(docs_dir)
    q = stream_dedup_to_parquet(spark, docs_dir, schema, out, cp)
    q.awaitTermination()
    got1 = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    assert got1 == {(1, "alpha"), (2, "beta")}  # min-id wins the dup

    # batch 2 re-sends "alpha" and adds "gamma": state survives restart
    spark.createDataFrame(
        [(4, "alpha"), (5, "gamma")], schema
    ).write.mode("append").parquet(docs_dir)
    q = stream_dedup_to_parquet(spark, docs_dir, schema, out, cp)
    q.awaitTermination()
    got2 = {(r.doc_id, r.text) for r in spark.read.parquet(out).collect()}
    assert got2 == {(1, "alpha"), (2, "beta"), (5, "gamma")}


def test_streaming_windowed_stats(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    synthesize_pages(spark, 50).write.mode("append").parquet(pages_dir)
    q = stream_predicate_stats(
        spark, pages_dir, str(tmp_path / "cp2"), query_name="pstats_test"
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; with availableNow
    # the final watermark closes all seen windows except the max — check
    # the intermediate state instead via a complete-mode equivalent
    batch = extract_triples_df(spark.read.parquet(pages_dir))
    expected = (
        batch.groupBy(F.window("warc_ts", "1 hour"), "p_value")
        .count()
        .count()
    )
    got = spark.sql("SELECT * FROM pstats_test").count()
    assert 0 <= got <= expected
    assert expected > 0


def test_streaming_dedup_eviction_bound(spark, tmp_path):
    """State bound: FIFO cap evicts oldest hashes with an audit counter
    on output rows; an evicted hash re-arriving is re-emitted
    (exactly-once holds within the retention capacity). The counter is
    CURRENT: rows in the chunk that triggers an eviction already carry
    the post-eviction cumulative count (round-3 fix — no one-batch
    lag)."""
    from argo_spark.streaming import dedup_stream

    docs_dir = str(tmp_path / "docs_ev")
    out = str(tmp_path / "deduped_ev")
    cp = str(tmp_path / "cp_ev")
    schema = "doc_id long, text string"

    def run():
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(docs_dir)
        )
        q = (
            dedup_stream(src, n_buckets=1, max_hashes_per_bucket=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: 3 distinct docs -> cap 2 evicts the oldest ("alpha");
    # the triggering chunk itself reports the eviction (audit=1)
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], schema
    ).write.mode("append").parquet(docs_dir)
    run()
    got1 = {(r.doc_id, r.bucket_evictions) for r in spark.read.parquet(out).collect()}
    assert got1 == {(1, 1), (2, 1), (3, 1)}

    # batch 2: evicted "alpha" re-emits (audit=1); retained "gamma" suppressed
    spark.createDataFrame(
        [(4, "alpha"), (5, "gamma")], schema
    ).write.mode("append").parquet(docs_dir)
    run()
    got2 = {(r.doc_id, r.text, r.bucket_evictions)
            for r in spark.read.parquet(out).collect()}
    # re-emitted; its own arrival pushed "beta" out -> cumulative 2
    assert (4, "alpha", 2) in got2
    assert not any(r[0] == 5 for r in got2)  # within-capacity exactly-once


def test_streaming_sessionization(spark, tmp_path):
    """session_window sessions: gap > 30 min splits; batch replay of
    the same events through the lag-based batch sessionizer counts
    the same number of sessions per user."""
    import datetime as dt

    from argo_spark.streaming import stream_sessionize_to_memory

    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    # user 1: two sessions (3 events, 45-min gap, 2 events)
    for m in (0, 5, 10, 55, 60):
        rows.append((1, base + dt.timedelta(minutes=m), f"e1{m}"))
    # user 2: one session
    for m in (0, 20):
        rows.append((2, base + dt.timedelta(minutes=m), f"e2{m}"))
    # watermark flush: append-mode session aggs emit only once the
    # watermark passes the session end, so a far-future event from a
    # sentinel user pushes the final watermark past every real session
    rows.append((99, base + dt.timedelta(days=1), "flush"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id string"
    )
    events_dir = str(tmp_path / "events")
    ev.write.parquet(events_dir)

    q = stream_sessionize_to_memory(
        spark, events_dir, "user_id long, ts timestamp, event_id string",
        str(tmp_path / "cp"), query_name="sess_t",
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM sess_t").collect()
        if r.user_id != 99
    }
    assert got == {(1, 3), (1, 2), (2, 2)}

    # cross-check session COUNTS against the batch lag-based shape
    import __spark_entry__ as em

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ns = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    batch = (
        ev.where("user_id != 99").select("user_id", ns.alias("ns"))
        .groupBy("user_id").agg(F.sum("ns").alias("n_sessions"))
    )
    batch_counts = {(r.user_id, r.n_sessions) for r in batch.collect()}
    stream_counts = {}
    for u, _n in got:
        stream_counts[u] = stream_counts.get(u, 0) + 1
    assert {(u, n) for u, n in stream_counts.items()} == batch_counts


def test_streaming_url_dedup(spark, tmp_path):
    from argo_spark.streaming import stream_dedup_to_parquet

    docs_dir = str(tmp_path / "udocs")
    out = str(tmp_path / "udeduped")
    cp = str(tmp_path / "ucp")
    schema = "doc_id long, text string, url string"

    # two urls that canonicalize identically, one distinct
    spark.createDataFrame(
        [
            (1, "t1", "HTTP://E.com:80/a?utm_source=x"),
            (2, "t2", "http://e.com/a"),
            (3, "t3", "http://e.com/b"),
        ],
        schema,
    ).write.mode("append").parquet(docs_dir)
    q = stream_dedup_to_parquet(spark, docs_dir, schema, out, cp,
                                url_col="url")
    q.awaitTermination()
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 3}  # min-id fetch of each canonical url wins

    # a later batch re-fetching /a (any surface form) is suppressed
    spark.createDataFrame(
        [(4, "t4", "http://E.COM/a/"), (5, "t5", "http://e.com/c")],
        schema,
    ).write.mode("append").parquet(docs_dir)
    q = stream_dedup_to_parquet(spark, docs_dir, schema, out, cp,
                                url_col="url")
    q.awaitTermination()
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 3, 5}
