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


def transitive_closure(edges: DataFrame, max_rounds: int = 10) -> DataFrame:
    """All (src, dst) pairs connected by a path of >= 1 edges.

    Pointer doubling — ``P_{k+1} = P_k ∪ (P_k ∘ P_k)`` — so after k
    rounds every pair within 2^k hops is present: O(log diameter)
    shuffle rounds instead of one join per hop, the property-path
    closure shape that survives deep chains at scale. Each round is
    one self-equi-join on ``dst == src`` plus an anti-join against the
    accumulated pairs; lineage is cut per round with localCheckpoint.
    Converges (returns) when a round adds nothing; raises if the
    diameter exceeds 2^max_rounds rather than silently truncating
    (same contract as connected_components' non-convergence guard).

    Input must have exactly the columns (src, dst); output the same.
    Note the closure of a graph can be O(|V|^2) pairs — that is the
    semantics of SPARQL's ``p+``, not an implementation artifact; the
    doubling keeps the ROUND COUNT logarithmic, and AQE handles the
    growing intermediate sizes.

    Convergence is detected by pair-count fixpoint (the checkpoint
    materializes the round anyway, so the count is a cheap RDD count)
    rather than an anti-join emptiness probe: an anti-join between two
    localCheckpoint'd frames trips a Catalyst constraint-rewrite bug
    on this Spark version (NoSuchElementException in
    UnionBase.rewriteConstraints when the LogicalRDD's inherited
    constraints reference pruned attributes).
    """
    paths = edges.select("src", "dst").dropDuplicates()
    paths = paths.localCheckpoint(eager=True)
    n = paths.count()
    for _ in range(max_rounds):
        hop2 = (
            paths.alias("a")
            .join(paths.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        nxt = paths.unionByName(hop2).dropDuplicates()
        nxt = nxt.localCheckpoint(eager=True)
        n2 = nxt.count()
        if n2 == n:
            return paths
        paths, n = nxt, n2
    raise RuntimeError(
        f"transitive_closure did not converge in {max_rounds} doubling "
        f"rounds (path diameter > {2 ** max_rounds})"
    )


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
