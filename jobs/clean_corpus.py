#!/usr/bin/env python
"""spark-submit entry point for the training-corpus cleaning pipeline
(the LLM-data path of the driver brief):

    spark-submit --py-files dist/argo_spark.zip jobs/clean_corpus.py \
        <docs_parquet> <out_dir> [--min-quality Q] [--min-tokens N] \
        [--max-tokens N] [--languages en,fr] [--neardup-threshold T]

Runs exact dedup → star-edge MinHash-LSH near-dup removal (O(k) per
bucket — safe on boilerplate-heavy crawls) → language/quality/length
gates, writes the kept corpus as parquet, and prints a one-line JSON
audit of rows removed per stage (silent-truncation-free).
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
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("argo_spark-clean-corpus").getOrCreate()
    try:
        from argo_spark.ops.corpus import clean_corpus

        docs = spark.read.parquet(args.docs)
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
        print(json.dumps({"out": args.out_dir, **audit}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
