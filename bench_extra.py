#!/usr/bin/env python
"""Optimization-round instrumentation (round 6). NOT the driver bench —
bench.py stays frozen. This harness isolates the expensive bench
queries phase-by-phase with the noop sink (guide §1.4) so we can see
where each second goes, and prints one JSON object per phase.

Usage: python bench_extra.py [phases...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, reps=3):
    times = []
    out = None
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        out = fn()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"phase": name, "times": times, "min": min(times)}),
          flush=True)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    which = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from argo_spark.session import get_spark

    spark = get_spark("argo_spark-bench-extra", master=f"local[{cpus}]")
    sc = spark.sparkContext
    workdir = tempfile.mkdtemp(prefix="argo_bx_")
    print(json.dumps({"loadavg": list(os.getloadavg())}), flush=True)

    def want(tag):
        return not which or tag in which

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # ---------------- minhash (pairs mode) ----------------
    if want("minhash"):
        from argo_spark.ops.dedup import (
            _minhash_coeffs,
            _MERSENNE,
            minhash_dedup_pairs,
            word_shingles_exploded,
        )

        sc.setJobDescription("minhash: shingles only")
        timed(spark, "minhash_shingles",
              lambda: word_shingles_exploded(docs, "doc_id", "text", 5).count())

        def sigs_only():
            ex = word_shingles_exploded(docs, "doc_id", "text", 5)
            a, b = _minhash_coeffs(64)
            hashed = ex.select(
                F.col("doc_id"), F.pmod(F.col("_gh"), F.lit(_MERSENNE)).alias("_h"))
            aggs = [
                F.min(F.pmod(F.lit(a[i]) * F.col("_h") + F.lit(b[i]),
                             F.lit(_MERSENNE))).alias(f"_m{i}")
                for i in range(64)
            ]
            return hashed.groupBy("doc_id").agg(*aggs).count()

        sc.setJobDescription("minhash: shingles+sigs, no persist")
        timed(spark, "minhash_sigs_nopersist", sigs_only)

        sc.setJobDescription("minhash: full pairs mode")
        timed(spark, "minhash_full_pairs", lambda: minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.7, pair_mode="pairs").count())
        sc.setJobDescription("minhash: full star mode")
        timed(spark, "minhash_full_star", lambda: minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.7, pair_mode="star").count())

    # ---------------- simhash ----------------
    if want("simhash"):
        from argo_spark.ops.dedup import simhash_candidate_pairs, simhash_signatures_df

        sc.setJobDescription("simhash: signatures only")
        timed(spark, "simhash_sigs",
              lambda: noop(simhash_signatures_df(docs, "doc_id", "text")))
        sc.setJobDescription("simhash: full")
        timed(spark, "simhash_full",
              lambda: simhash_candidate_pairs(docs, "doc_id", "text").count())

    # ---------------- ANN family ----------------
    if want("ann"):
        from argo_spark.ops.similarity import (
            brute_force_topk,
            hyperplane_buckets,
            ivf_topk,
            kmeans_centroids,
            lsh_topk,
        )

        q = emb.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")
        sc.setJobDescription("ann: brute")
        timed(spark, "ann_brute", lambda: brute_force_topk(emb, q, k=10).count())

        sc.setJobDescription("ann: lsh bucket assignment only")
        timed(spark, "ann_lsh_buckets", lambda: noop(emb.select(
            "vec_id",
            hyperplane_buckets(F.col("embedding"), 64, 6).alias("bucket"))))
        sc.setJobDescription("ann: lsh full")
        timed(spark, "ann_lsh_full",
              lambda: lsh_topk(emb, k=5, dim=64, n_planes=6).count())

        sc.setJobDescription("ann: ivf kmeans only")
        timed(spark, "ann_ivf_kmeans",
              lambda: len(kmeans_centroids(emb, 8, 64)))
        cents = kmeans_centroids(emb, 8, 64)
        sc.setJobDescription("ann: ivf search only (fixed centroids)")
        timed(spark, "ann_ivf_search", lambda: ivf_topk(
            emb, q, k=10, n_clusters=8, nprobe=2, dim=64,
            exclude_self=True, centroids=cents).count())
        sc.setJobDescription("ann: ivf full")
        timed(spark, "ann_ivf_full", lambda: ivf_topk(
            emb, q, k=10, n_clusters=8, nprobe=2, dim=64,
            exclude_self=True).count())

    # ---------------- SPARQL closure ----------------
    if want("closure"):
        import bench as bench_mod

        sc.setJobDescription("closure: edge construction only")
        timed(spark, "closure_edges_only", lambda: noop(
            _closure_edges(spark, sf_dir)))
        sc.setJobDescription("closure: full bench query")
        timed(spark, "closure_full", lambda: bench_mod._sparql_closure_bench(
            spark, sf_dir).count())

        from argo_spark.ops.traversal import transitive_closure

        sc.setJobDescription("closure: raw transitive_closure on edges")

        def raw_closure():
            e = _closure_edges(spark, sf_dir)
            return transitive_closure(e).count()

        timed(spark, "closure_raw", raw_closure)

    # ---------------- sparql algebra mix ----------------
    if want("algebra"):
        import __spark_entry__ as em

        sc.setJobDescription("sparql: algebra mix")
        timed(spark, "sparql_algebra_mix",
              lambda: em.q_sparql_algebra_mix(spark, sf_dir).count())
        sc.setJobDescription("sparql: compile only")

        def compile_only():
            df = em.q_sparql_algebra_mix(spark, sf_dir)
            return df.schema is not None

        timed(spark, "sparql_algebra_compile", compile_only)

    # ---------------- kg pipeline ----------------
    if want("kg"):
        import bench as bench_mod

        n_pages = bench_mod._n_pages(spark, sf_dir)
        pages_path = bench_mod._pages_table(spark, workdir, n_pages)

        from argo_spark.extract.rdfa import extract_triples_df
        from argo_spark.schema import TRIPLE_COLS

        sc.setJobDescription("kg: extract only")
        timed(spark, "kg_extract_only", lambda: noop(
            extract_triples_df(spark.read.parquet(pages_path))
            .select(*TRIPLE_COLS)))
        sc.setJobDescription("kg: full job")
        timed(spark, "kg_full", lambda: bench_mod._kg_job(
            spark, sf_dir, workdir, n_pages, pages_path))

    # ---------------- misc smaller ----------------
    if want("misc"):
        import __spark_entry__ as em

        sc.setJobDescription("misc: semi+anti")
        timed(spark, "semi_anti", lambda: (
            em.q_g8_semi_join(spark, sf_dir).count()
            + em.q_g2_anti_join(spark, sf_dir).count()))
        sc.setJobDescription("misc: text stats")
        from argo_spark.ops.textstats import document_stats
        timed(spark, "text_stats", lambda: document_stats(docs).agg(
            F.sum("n_tokens"), F.avg("quality")).collect())
        sc.setJobDescription("misc: nt parse")
        timed(spark, "url_dedup", lambda: em.q_url_dedup_best(spark, sf_dir).count())
        timed(spark, "line_dedup", lambda: em.q_line_dedup(spark, sf_dir).count())
        timed(spark, "agg_lineitem", lambda: em.q_agg_lineitem(spark, sf_dir).collect())
        timed(spark, "events_window", lambda: em.q_events_window_agg(spark, sf_dir).count())

    spark.stop()


def _closure_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    import __spark_entry__ as em

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    e = (
        d.alias("a")
        .join(d.alias("b"), F.col("b.doc_id") == F.col("a.doc_id") + 7)
        .where((F.col("a.doc_id") % 448) + 7 < 448)
    )
    return e.select(
        F.concat(F.lit(em.DOC_BASE), F.col("a.doc_id")).alias("src"),
        F.concat(F.lit(em.DOC_BASE), F.col("b.doc_id")).alias("dst"),
    )


if __name__ == "__main__":
    main()
