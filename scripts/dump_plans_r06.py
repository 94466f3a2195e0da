#!/usr/bin/env python
"""Dump .explain('formatted') for the bench queries touched in the
round-6 optimization pass, into plans/r06/<name>_<suffix>.txt.

Usage: python scripts/dump_plans_r06.py before|after [names...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout


def main():
    suffix = sys.argv[1]
    names = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from argo_spark.session import get_spark

    spark = get_spark("argo_plans_r06", master=f"local[{cpus}]")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = emb.limit(8).select(F.col("vec_id").alias("query_id"), "embedding")

    def build(name):
        if name == "ann_brute_topk":
            from argo_spark.ops.similarity import brute_force_topk
            return brute_force_topk(emb, q, k=10)
        if name == "ann_lsh_topk":
            from argo_spark.ops.similarity import lsh_topk
            return lsh_topk(emb, k=5, dim=64, n_planes=6)
        if name == "ann_ivf_topk":
            from argo_spark.ops.similarity import ivf_topk, md5_centroids
            # fixed centroids so the SEARCH plan is shown (k-means is
            # a fixed set of training jobs, not one plan)
            return ivf_topk(emb, q, k=10, n_clusters=8, nprobe=2, dim=64,
                            exclude_self=True, centroids=md5_centroids(8, 64))
        if name == "dedup_minhash":
            from argo_spark.ops.dedup import minhash_dedup_pairs
            return minhash_dedup_pairs(docs, "doc_id", "text",
                                       threshold=0.7, pair_mode="pairs")
        if name == "dedup_minhash_star":
            from argo_spark.ops.dedup import minhash_dedup_pairs
            return minhash_dedup_pairs(docs, "doc_id", "text",
                                       threshold=0.7, pair_mode="star")
        if name == "dedup_simhash":
            from argo_spark.ops.dedup import simhash_candidate_pairs
            return simhash_candidate_pairs(docs, "doc_id", "text")
        if name == "sparql_closure":
            import bench as bench_mod
            return bench_mod._sparql_closure_bench(spark, sf_dir)
        if name == "text_stats":
            from argo_spark.ops.textstats import document_stats
            return document_stats(docs)
        if name == "kg_extract_e2e":
            from argo_spark.extract.rdfa import extract_triples_df
            from argo_spark.schema import TRIPLE_COLS
            return extract_triples_df(docs.sparkSession.read.parquet(
                f"{sf_dir}/documents.parquet").select(
                F.concat(F.lit("u"), "doc_id").alias("url"),
                F.lit("t").alias("warc_ts"), F.col("text").alias("html"),
            )).select(*TRIPLE_COLS)
        raise KeyError(name)

    all_names = [
        "ann_brute_topk", "ann_lsh_topk", "ann_ivf_topk", "dedup_minhash",
        "dedup_minhash_star", "dedup_simhash", "sparql_closure",
    ]
    os.makedirs("plans/r06", exist_ok=True)
    for name in (sorted(names) if names else all_names):
        df = build(name)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = f"plans/r06/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print("wrote", out, len(buf.getvalue()), "bytes")
    spark.stop()


if __name__ == "__main__":
    main()
