"""Structured Streaming ingest (driver brief: streams via readStream →
transform → writeStream).

The reference is a pure batch library — its closest notion is the
always-streaming channel pipeline (rdf/rdf.go:398-412, never
materializes a graph). This module is the continuous-ingest variant of
the batch KgPipeline: new page files landing in a directory are
extracted incrementally; Spark's checkpoint gives exactly-once file
processing (complementing the batch manifest), and a watermarked
tumbling window tracks triple rates per predicate with bounded state.

The extraction stage is the SAME ``mapInPandas`` operator as batch —
stateless, so it composes with streaming unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argo_spark.extract.rdfa import extract_triples_df
from argo_spark.schema import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_path: str) -> DataFrame:
    """Streaming source over a pages directory (new parquet files are
    the micro-batches; maxFilesPerTrigger bounds batch size)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )


def stream_extract_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    with_mentions: bool = True,
):
    """Continuous extraction: pages dir → triples parquet, exactly-once
    via the streaming checkpoint. availableNow drains what exists and
    stops — the incremental-batch pattern; on a cluster the same query
    runs unbounded."""
    pages = stream_pages(spark, input_path)
    triples = extract_triples_df(pages, with_mentions=with_mentions)
    return (
        triples.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_predicate_counts(
    triples_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window triples-per-predicate counts —
    bounded state: windows older than the watermark are evicted, late
    pages beyond it are dropped (the documented trade)."""
    return (
        triples_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("p_value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("p_value"),
            F.col("n"),
        )
    )


DEDUP_OUT_SCHEMA = (
    "doc_id long, text string, content_hash long, bucket_evictions long"
)
DEDUP_STATE_SCHEMA = "hashes array<long>, evicted long"


def dedup_stream(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    max_hashes_per_bucket: int | None = None,
    idle_ttl_ms: int | None = None,
    key_expr=None,
) -> DataFrame:
    """Streaming exact dedup across micro-batches: a custom stateful
    operator via applyInPandasWithState. State = content hashes seen
    per hash-bucket key (insertion-ordered); only first-seen documents
    are emitted, across batches and restarts (state lives in the
    checkpoint).

    Keying by ``xxhash64(text) % n_buckets`` spreads state uniformly
    over the cluster. NOTE: the state schema gained an ``evicted``
    field in round 2 — checkpoints written by the earlier single-field
    schema fail Spark's state-compatibility check on restart and need
    a fresh checkpoint location (one-time migration; Spark does not
    evolve applyInPandasWithState schemas in place).

    Unbounded state is a leak on an endless stream, so two eviction
    knobs exist:

    * ``max_hashes_per_bucket`` — FIFO cap per bucket; the OLDEST
      hashes are evicted and the cumulative eviction count rides on
      every output row as ``bucket_evictions`` (an audit column — the
      drop is observable in the sink, never silent). A re-arriving doc
      whose hash was evicted is re-emitted (documented trade:
      exactly-once within the retention capacity).
    * ``idle_ttl_ms`` — processing-time TTL; a bucket that receives
      nothing for the duration has its whole state dropped
      (GroupStateTimeout, the production RocksDB-TTL analogue).

    ``key_expr``: optional Column whose xxhash64 is the dedup
    identity instead of the text — e.g.
    ``urltools.canonicalize_url(F.col("url"))`` turns this into
    streaming URL-level dedup of a crawl frontier (first fetch of
    each canonical URL wins; same state/eviction machinery)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ident = key_expr if key_expr is not None else F.col(text_col)
    keyed = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.xxhash64(ident).alias("content_hash"),
    ).withColumn("bucket", F.pmod(F.col("content_hash"), F.lit(n_buckets)))

    def fn(key, pdfs, state: GroupState):
        if idle_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ordered, evicted = list(state.get[0]), int(state.get[1])
        else:
            ordered, evicted = [], 0
        seen = set(ordered)
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            fresh_mask = []
            for h in pdf["content_hash"]:
                if h in seen:
                    fresh_mask.append(False)
                else:
                    seen.add(h)
                    ordered.append(h)
                    fresh_mask.append(True)
            # cap BEFORE emitting the chunk so the audit column is
            # current: rows in the chunk that triggers eviction carry
            # the post-eviction cumulative count (no one-batch lag)
            if max_hashes_per_bucket is not None and len(ordered) > max_hashes_per_bucket:
                n_evict = len(ordered) - max_hashes_per_bucket
                for h in ordered[:n_evict]:
                    seen.discard(h)
                ordered = ordered[n_evict:]
                evicted += n_evict
            out = pdf.loc[fresh_mask, ["doc_id", "text", "content_hash"]]
            if len(out):
                yield out.assign(bucket_evictions=evicted)
        state.update((ordered, evicted))
        if idle_ttl_ms is not None:
            state.setTimeoutDuration(idle_ttl_ms)

    return keyed.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization via Spark's native session windows:
    per-user sessions close after ``gap`` of inactivity, state is
    bounded by the watermark (a session older than the watermark can
    never reopen, so its state is evicted and the finished session
    emitted). The batch twin (__spark_entry__.q_sessionize_events's
    lag-based variant) counts the same sessions; this is the
    readStream shape — groupBy(session_window) keeps the whole
    aggregation JVM-side, no Python state function needed (unlike
    dedup_stream, whose per-key FIFO genuinely needs
    applyInPandasWithState)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("session"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col(user_col),
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )


def stream_sessionize_to_memory(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    query_name: str = "sessions",
):
    """Continuous sessionization of an events directory into an
    in-memory sink (smoke/monitoring shape; production writes a
    table)."""
    src = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    return (
        sessionize_stream(src, gap=gap)
        .writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_to_parquet(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    output_path: str,
    checkpoint_path: str,
    max_hashes_per_bucket: int | None = None,
    idle_ttl_ms: int | None = None,
    url_col: str | None = None,
):
    """Continuous exact-dedup of a documents directory; exactly-once +
    cross-restart state via the checkpoint (bounded by the eviction
    knobs — see dedup_stream). With ``url_col``, dedup identity is
    the CANONICAL URL instead of the text (streaming crawl-frontier
    dedup: the first fetch of each canonical URL wins)."""
    src = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    key_expr = None
    if url_col is not None:
        from argo_spark.ops.urltools import canonicalize_url

        key_expr = canonicalize_url(F.col(url_col))
    deduped = dedup_stream(
        src,
        max_hashes_per_bucket=max_hashes_per_bucket,
        idle_ttl_ms=idle_ttl_ms,
        key_expr=key_expr,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_predicate_stats(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str = "predicate_stats",
):
    """Windowed stats to an in-memory sink (smoke/monitoring);
    production would point this at a metrics table."""
    pages = stream_pages(spark, input_path)
    triples = extract_triples_df(pages)
    agg = windowed_predicate_counts(triples)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
