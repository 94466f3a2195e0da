"""Corpus-level repeated-line removal (C4-style boilerplate dedup).

Web corpora carry boilerplate lines (nav text, cookie banners,
footers) repeated verbatim across many pages; C4 famously drops any
line occurring more than once in the corpus. This implements that as
a 4-stage DataFrame plan:

1. ``posexplode(split(text, sep))`` — map-only line explosion that
   keeps each line's position;
2. ``groupBy(line).agg(countDistinct(id))`` — ONE shuffle keyed on
   the line text with a map-side partial, so hot lines (the empty
   line, "Home", ...) arrive pre-combined; the frequent-line set that
   comes out is tiny relative to the corpus;
3. a left-anti join of the exploded lines against that set (AQE
   broadcasts it when small, which is the normal case);
4. per-document reassembly: ``sort_array(collect_list(struct(pos,
   line)))`` then ``array_join`` — position-ordered without a window
   function, deterministic under any partitioning.

A document whose every line is boilerplate survives with empty text
(callers drop empties with their length gate). Unlike C4 this keeps
NO occurrence of a repeated line (keep-first would need a global
order — an extra sort shuffle for semantics no training pipeline
depends on; documented divergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Lines occurring in >= ``min_docs`` distinct documents, with
    their document frequency: (line, n_docs)."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """``df`` with every line that appears in >= ``min_docs``
    distinct documents removed from ``text_col``. All other columns
    pass through; a fully-boilerplate document keeps an empty
    string."""
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    frequent = (
        exploded.groupBy("line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line")
    )
    kept = exploded.join(frequent, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.sort_array(F.collect_list(F.struct("pos", "line"))).getField(
                "line"
            ),
            sep,
        ).alias("__rebuilt")
    )
    out = (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__rebuilt"), F.lit("")))
        .drop("__rebuilt")
    )
    return out.select(*df.columns)
