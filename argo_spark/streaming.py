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
