#!/usr/bin/env python
"""spark-submit entry point for the training-corpus cleaning pipeline
(the LLM-data path of the driver brief):

    spark-submit --py-files dist/argo_spark.zip jobs/clean_corpus.py \
        <docs_parquet> <out_dir> [--min-quality Q] [--min-tokens N] \
        [--max-tokens N] [--languages en,fr] [--neardup-threshold T] \
        [--url-col url] [--line-dedup-min-docs N]

Optional web-hygiene pre-stages, then exact dedup → star-edge
MinHash-LSH near-dup removal (O(k) per bucket — safe on
boilerplate-heavy crawls) → language/quality/length gates:

* ``--url-col``: canonical-URL best-row dedup first (one exchange;
  survivor = longest text per canonical URL) — the cheapest cut on a
  crawl, before any content pass;
* ``--line-dedup-min-docs``: C4-style removal of lines repeated in
  >= N distinct documents (cookie banners, nav text) BEFORE near-dup
  and quality gates, so boilerplate doesn't glue unrelated pages
  into near-dup clusters.

Writes the kept corpus as parquet and prints a one-line JSON audit of
rows removed per stage (silent-truncation-free).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("docs", help="documents parquet path (doc_id, text, ...)")
    p.add_argument("out_dir")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--max-tokens", type=int, default=1_000_000)
    p.add_argument("--languages", default=None, help="comma-separated keep-list")
    p.add_argument("--neardup-threshold", type=float, default=0.85)
    p.add_argument("--url-col", default=None,
                   help="dedup on canonicalize_url(<col>) first")
    p.add_argument("--line-dedup-min-docs", type=int, default=None,
                   help="drop lines shared by >= N docs before gating")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("argo_spark-clean-corpus").getOrCreate()
    try:
        from argo_spark.ops.corpus import clean_corpus

        docs = spark.read.parquet(args.docs)
        pre_audit = {}
        if args.url_col:
            from pyspark.sql import functions as F

            from argo_spark.ops.urltools import url_dedup

            n0 = docs.count()
            docs = docs.withColumn(
                "__len", F.length("text")
            )
            docs = url_dedup(
                docs, url_col=args.url_col, quality_col="__len",
                id_col="doc_id",
            ).drop("__len", "canonical_url")
            pre_audit["url_dedup_removed"] = n0 - docs.count()
        if args.line_dedup_min_docs:
            from argo_spark.ops.linedup import remove_repeated_lines

            docs = remove_repeated_lines(
                docs, min_docs=args.line_dedup_min_docs
            )
            pre_audit["line_dedup_min_docs"] = args.line_dedup_min_docs
        langs = tuple(args.languages.split(",")) if args.languages else None
        kept, audit = clean_corpus(
            docs,
            languages=langs,
            min_quality=args.min_quality,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            neardup_threshold=args.neardup_threshold,
        )
        kept.write.mode("overwrite").parquet(args.out_dir)
        print(json.dumps({"out": args.out_dir, **pre_audit, **audit}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
