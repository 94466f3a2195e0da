"""Graph traversal by iterative self-join (SURVEY §2.4 "self-join /
graph traversal").

The reference chases pointers one list cell at a time
(/root/reference/graph.go:255-271); the scale shape is the inverse:
ALL traversals advance one hop per iteration via a single join over
the triples table, so k-hop reachability over any number of seeds
costs k shuffles total (not k per seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argo_spark.namespaces import RDF_FIRST, RDF_NIL, RDF_REST
from argo_spark.terms import KIND_LITERAL


def reachable(
    triples: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """All (kind, value, hop) nodes reachable from seeds(kind, value)
    along subject→object edges in ≤ max_hops. Literals terminate paths
    (they can't be subjects). BFS: one edge join per hop; lineage cut
    with localCheckpoint each round; stops early when the frontier is
    empty."""
    edges = triples.select(
        F.col("s_kind").alias("src_kind"),
        F.col("s_value").alias("src_value"),
        F.col("o_kind").alias("dst_kind"),
        F.col("o_value").alias("dst_value"),
    ).where(F.col("o_kind") != KIND_LITERAL)

    visited = (
        seeds.select(F.col("kind"), F.col("value"))
        .dropDuplicates()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            edges.join(
                frontier,
                (edges.src_kind == frontier.kind)
                & (edges.src_value == frontier.value),
            )
            .select(
                F.col("dst_kind").alias("kind"),
                F.col("dst_value").alias("value"),
            )
            .dropDuplicates()
        )
        new = nxt.join(
            visited.select("kind", "value"), ["kind", "value"], "left_anti"
        ).withColumn("hop", F.lit(hop))
        new = new.localCheckpoint(eager=True)
        if not new.take(1):
            break
        visited = visited.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    return visited


def iter_lists_distributed(
    triples: DataFrame, heads: DataFrame, max_len: int = 64
) -> DataFrame:
    """Walk rdf:first/rdf:rest cons lists for MANY heads at once:
    (head_kind, head_value, pos, o_kind, o_value, o_lang, o_dt).

    One join per list POSITION (not per list): iteration count is the
    max list length, independent of how many lists are walked — the
    distributed inverse of graph.go:255-271."""
    firsts = triples.where(F.col("p_value") == RDF_FIRST).select(
        F.col("s_kind").alias("c_kind"), F.col("s_value").alias("c_value"),
        "o_kind", "o_value", "o_lang", "o_dt",
    )
    rests = triples.where(
        (F.col("p_value") == RDF_REST)
        & ~((F.col("o_kind") == 0) & (F.col("o_value") == RDF_NIL))
    ).select(
        F.col("s_kind").alias("c_kind"), F.col("s_value").alias("c_value"),
        F.col("o_kind").alias("n_kind"), F.col("o_value").alias("n_value"),
    )

    cursor = heads.select(
        F.col("kind").alias("head_kind"), F.col("value").alias("head_value"),
        F.col("kind").alias("c_kind"), F.col("value").alias("c_value"),
    ).localCheckpoint(eager=True)
    out = None
    for pos in range(max_len):
        members = cursor.join(firsts, ["c_kind", "c_value"]).select(
            "head_kind", "head_value",
            F.lit(pos).alias("pos"), "o_kind", "o_value", "o_lang", "o_dt",
        )
        members = members.localCheckpoint(eager=True)
        out = members if out is None else out.unionByName(members)
        cursor = (
            cursor.join(rests, ["c_kind", "c_value"])
            .select(
                "head_kind", "head_value",
                F.col("n_kind").alias("c_kind"), F.col("n_value").alias("c_value"),
            )
            .localCheckpoint(eager=True)
        )
        if not cursor.take(1):
            break
    return out
