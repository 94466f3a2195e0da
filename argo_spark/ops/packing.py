"""Sequence packing for LLM pretraining (beyond the reference — no
argo analogue; the training-data-pipeline op family of SURVEY §2.6).

Pretraining consumes documents as a concatenated token stream cut
into fixed-length sequences; packing assigns every document its
(sequence id, offset) in that stream. The distributed shape is a
prefix sum WITHIN AN ORDERING SHARD: one hash shuffle on the shard
column, one in-partition sort, one cumulative-sum window — no global
sort, no single-partition window, no driver loop. At 100 TB the
shard column must be granular (crawl shard / source file); a skewed
mega-shard serializes its own window, so salt or split upstream —
documented, not hidden.

Determinism: output is a pure function of (shard, order, tokens) —
independent of partitioning and parallelism, same contract as the
extractor pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from argo_spark.ops.textstats import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    id_cols: tuple = ("doc_id",),
) -> DataFrame:
    """Assign each document its packed-sequence coordinates.

    Documents are conceptually concatenated per shard in
    ``order_col`` order and the token stream is cut every ``budget``
    tokens (the GPT-style concat-and-chunk loader). Each doc gets:

    * ``n_tokens`` — its token count (``tokens_col`` if given, else
      :func:`token_count` over ``text_col``);
    * ``seq_id`` — the sequence (chunk) where the doc STARTS,
      0-based per shard;
    * ``seq_offset`` — token offset of the doc within that sequence
      (a doc longer than the remaining room simply spans into the
      following sequence(s), as the chunking loader would).

    Plan: Exchange(shard) -> Sort(order) -> Window(running sum) ->
    project. One shuffle total.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks: Column = (
        F.col(tokens_col) if tokens_col is not None
        else token_count(F.col(text_col))
    ).cast("long")
    w = Window.partitionBy(shard_col).orderBy(order_col)
    start = (F.sum(toks).over(w) - toks).cast("long")
    return docs.select(
        *id_cols,
        F.col(shard_col).alias("shard"),
        toks.alias("n_tokens"),
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("seq_offset"),
    )
