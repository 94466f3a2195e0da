"""Composed training-corpus cleaning (driver brief: what a large-scale
training-data pipeline needs, as one operator).

    docs → exact dedup → near-dup removal (MinHash-LSH + CC)
         → language filter → quality/length gates

Each stage is the already-tested primitive; the composition keeps the
winner-selection deterministic (min doc id) and returns both the kept
corpus and a per-stage audit of how many rows each gate removed —
silent-truncation-free by construction.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from argo_spark.ops.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup_pairs,
)
from argo_spark.ops.textstats import lang_id, quality_score, token_count


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: Optional[tuple[str, ...]] = None,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    neardup_threshold: float = 0.85,
    neardup_pairs_fn: Optional[Callable[[DataFrame], DataFrame]] = None,
    representative: str = "min_id",
) -> tuple[DataFrame, dict[str, int]]:
    """Returns (kept_docs, audit). audit maps stage -> rows removed.

    ``neardup_pairs_fn`` swaps the near-dup candidate stage: it
    receives the exact-deduped frame and must return verified
    ``(a, b)`` pair rows (a = cluster-min winner side). Used for
    oracle contracts (a portable md5-minhash variant DuckDB can
    replay) and custom LSH configurations; the default is the
    production star-edge MinHash-LSH.

    ``representative`` picks the survivor per near-dup cluster:
    ``"min_id"`` (smallest id — cheapest, the CC label itself) or
    ``"quality"`` (highest quality_score, ties to the smallest id —
    one extra aggregation over cluster members only, a vanishing
    fraction of the corpus)."""
    audit: dict[str, int] = {}
    n0 = docs.count()

    # each audit count doubles as the cache fill for the next stage
    # (and for the caller's write of the returned frame)
    d1 = exact_dedup(docs, [text_col], id_col).persist()
    n1 = d1.count()
    audit["exact_dup"] = n0 - n1

    # star-edge LSH: O(k) per bucket — a web-scale boilerplate cluster
    # of 10^6 docs costs 10^6 edges, not 10^12 pairs
    if neardup_pairs_fn is not None:
        pairs = neardup_pairs_fn(d1)
    else:
        pairs = minhash_dedup_pairs(
            d1, id_col, text_col, threshold=neardup_threshold, pair_mode="star"
        )
    comps = connected_components(pairs.select("a", "b"))
    if representative == "quality":
        # keep-best: argmax quality per component via min-of-struct
        # (negated quality, then id) — one aggregation over cluster
        # MEMBERS (not the whole corpus), deterministic ties
        member_q = comps.select(F.col("id").alias("__m"), "comp").join(
            d1.select(
                F.col(id_col).alias("__m"),
                quality_score(F.col(text_col)).alias("__q"),
            ),
            "__m",
        )
        win = member_q.groupBy("comp").agg(
            F.min(
                F.struct(
                    (-F.col("__q")).alias("nq"), F.col("__m").alias("m")
                )
            ).alias("__w")
        )
        losers = (
            member_q.join(win, "comp")
            .where(F.col("__m") != F.col("__w.m"))
            .select(F.col("__m").alias(id_col))
        )
    elif representative == "min_id":
        losers = comps.where(F.col("id") != F.col("comp")).select(
            F.col("id").alias(id_col)
        )
    else:
        raise ValueError(
            f"representative must be 'min_id' or 'quality', got "
            f"{representative!r}"
        )
    # no broadcast hint: at 100 TB the loser set is most of the corpus;
    # AQE converts to broadcast when it is actually small
    d2 = d1.join(losers, id_col, "left_anti").persist()
    n2 = d2.count()
    audit["near_dup"] = n1 - n2

    c = F.col(text_col)
    d3 = d2.withColumns(
        {
            "_lang": lang_id(c),
            "_quality": quality_score(c),
            "_tokens": token_count(c),
        }
    )
    if languages:
        d3 = d3.where(F.col("_lang").isin(list(languages)))
    d3 = d3.where(
        (F.col("_quality") >= min_quality)
        & (F.col("_tokens") >= min_tokens)
        & (F.col("_tokens") <= max_tokens)
    )
    kept = d3.drop("_lang", "_quality", "_tokens").persist()
    n3 = kept.count()
    audit["lang_quality_length"] = n2 - n3
    audit["kept"] = n3
    return kept, audit
