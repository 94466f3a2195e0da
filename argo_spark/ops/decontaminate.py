"""Benchmark decontamination (training-data hygiene): flag/remove
documents that share word n-grams with an evaluation set — the
standard guard against test-set leakage into a training corpus.

Shape: the benchmark is SMALL (thousands of prompts) — its n-gram
hash set broadcasts; the corpus side is one exploded shingle pass +
a broadcast semi-join + a per-doc count. No shuffle of the corpus
beyond the per-doc aggregation, which reuses the shingle window's
partitioning (docs/PLANS.md §7 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from argo_spark.ops.dedup import word_shingles_exploded


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_hits): how many distinct benchmark n-grams each document
    contains. The benchmark n-gram hash set is computed with the SAME
    shingler as the corpus side, so hashes align; it is tiny and
    broadcasts."""
    doc_grams = word_shingles_exploded(docs, id_col, text_col, n)
    bench_grams = (
        word_shingles_exploded(
            benchmark.select(F.monotonically_increasing_id().alias("_bid"),
                             F.col(bench_text_col)),
            "_bid", bench_text_col, n,
        )
        .select("_gh")
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "_gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_hits: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """-> (kept_docs, flagged) where flagged = (id, n_hits) for docs
    with more than ``max_hits`` benchmark n-grams. The removal is an
    anti-join on the flagged ids (small side — AQE broadcasts it)."""
    hits = contamination_hits(docs, benchmark, id_col, text_col, bench_text_col, n)
    flagged = hits.where(F.col("n_hits") > max_hits)
    kept = docs.join(flagged.select(id_col), id_col, "left_anti")
    return kept, flagged
