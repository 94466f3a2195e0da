#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline
(north_rule: ``spark-submit --py-files dist/argo_spark.zip``).

    spark-submit --py-files dist/argo_spark.zip jobs/run_pipeline.py \
        <pages_parquet | SYNTH:n | WARC:glob> <out_dir> [--buckets N] \
        [--no-mentions] [--nt] [--resume/--no-resume]

``WARC:<glob>`` ingests Common Crawl segment files (.warc/.warc.gz)
directly — e.g. ``WARC:s3a://commoncrawl/.../segments/*.warc.gz`` —
via sources/warc.py; unparseable segments are counted and reported,
not fatal.

On a cluster, add --master/--num-executors as usual; the pipeline's
bucket manifest makes re-submission after any failure resume
exactly-once (see argo_spark/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("pages", help="pages parquet path, or SYNTH:<n_pages>")
    p.add_argument("out_dir")
    p.add_argument("--buckets", type=int, default=256)
    p.add_argument("--no-mentions", action="store_true")
    p.add_argument("--nt", action="store_true", help="also materialize N-Triples")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--max-buckets", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("argo_spark-pipeline").getOrCreate()

    from argo_spark.pages import synthesize_pages
    from argo_spark.pipeline import KgPipeline

    if args.pages.startswith("SYNTH:"):
        pages = synthesize_pages(spark, int(args.pages.split(":", 1)[1]))
    elif args.pages.startswith("WARC:"):
        from argo_spark.sources.warc import pages_from_warc

        pages, warc_errors = pages_from_warc(
            spark, args.pages.split(":", 1)[1]
        )
        n_bad = warc_errors.count()
        if n_bad:
            print(
                f"WARC: {n_bad} unparseable segment(s) quarantined",
                file=sys.stderr,
            )
        pages = pages.select("url", "warc_ts", "html")
    else:
        pages = spark.read.parquet(args.pages)

    pipe = KgPipeline(spark, args.out_dir, n_buckets=args.buckets)
    stats = pipe.run(
        pages,
        resume=not args.no_resume,
        max_buckets=args.max_buckets,
        with_mentions=not args.no_mentions,
    )
    if args.nt:
        pipe.materialize(nt_path=args.out_dir.rstrip("/") + "/nt")
    print(json.dumps(stats.__dict__), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
