"""``rdf``-tool equivalent (SURVEY §3 E1, §2.1 S6): multi-source read
→ term rewriting → serialize.

The reference CLI (/root/reference/rdf/rdf.go:89-237,292-424) spawns
one goroutine per source and merges channels; here each source is a
DataFrame scan and the merge is ``unionByName`` — task parallelism per
input split comes free. The pipeline stays fully streaming in the
reference sense: no graph materialization, one pass from scan to sink.

Throughput is printed in the reference's own figure of merit
("%d triples processed in %.3f seconds", rdf.go:422-424).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import DataFrame, SparkSession

from argo_spark.schema import TRIPLE_COLS
from argo_spark.sinks.registry import FORMATS, format_from_filename


def read_source(spark: SparkSession, path: str, fmt_id: str | None = None) -> DataFrame:
    fmt = FORMATS.get(fmt_id) if fmt_id else format_from_filename(path)
    if fmt is None or fmt.reader is None:
        raise SystemExit(f"no reader for source {path!r} (format {fmt_id or 'auto'})")
    out = fmt.reader(spark, path)
    df = out[0] if isinstance(out, tuple) else out
    return df.select(*TRIPLE_COLS)


def run_pipeline(
    spark: SparkSession,
    inputs: list[str],
    output: str,
    out_format: str | None = None,
    in_format: str | None = None,
    rewrites: list[tuple[str, str]] | None = None,
    subject_rewrites: list[tuple[str, str]] | None = None,
    predicate_rewrites: list[tuple[str, str]] | None = None,
    object_rewrites: list[tuple[str, str]] | None = None,
    squish: bool = False,
) -> int:
    from argo_spark.ops.rewrite import rewrite_terms

    t0 = time.time()
    dfs = [read_source(spark, p, in_format) for p in inputs]
    df = dfs[0]
    for other in dfs[1:]:
        df = df.unionByName(other)

    # rewrite order mirrors rdf.go:272-284: the generic list first,
    # then the per-position list
    for pat, repl in rewrites or []:
        df = rewrite_terms(df, pat, repl)
    for pat, repl in subject_rewrites or []:
        df = rewrite_terms(df, pat, repl, positions=("subject",))
    for pat, repl in predicate_rewrites or []:
        df = rewrite_terms(df, pat, repl, positions=("predicate",))
    for pat, repl in object_rewrites or []:
        df = rewrite_terms(df, pat, repl, positions=("object",))

    if squish:
        df = df.dropDuplicates(TRIPLE_COLS)

    ofmt = FORMATS.get(out_format) if out_format else format_from_filename(output)
    if ofmt is None or ofmt.writer is None:
        raise SystemExit(f"no writer for output {output!r}")
    ofmt.writer(df, output)

    n = spark.read.text(output).count()
    dt = time.time() - t0
    print(f"{n} triples processed in {dt:.3f} seconds", file=sys.stderr)
    return n


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="A tool for manipulating RDF files.")
    p.add_argument("files", nargs="+", help="input files/globs")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("-I", "--input-format", choices=sorted(FORMATS))
    p.add_argument("-O", "--output-format", choices=sorted(FORMATS))
    p.add_argument("-r", "--rewrite", nargs=2, action="append", metavar=("FIND", "REPLACE"), default=[])
    p.add_argument("--rewrite-subject", nargs=2, action="append", default=[])
    p.add_argument("--rewrite-predicate", nargs=2, action="append", default=[])
    p.add_argument("--rewrite-object", nargs=2, action="append", default=[])
    p.add_argument("--squish", action="store_true", help="dedup to set semantics")
    args = p.parse_args(argv)

    from argo_spark.session import get_spark

    spark = get_spark("argo_spark-cli")
    try:
        run_pipeline(
            spark,
            args.files,
            args.output,
            out_format=args.output_format,
            in_format=args.input_format,
            rewrites=[tuple(x) for x in args.rewrite],
            subject_rewrites=[tuple(x) for x in args.rewrite_subject],
            predicate_rewrites=[tuple(x) for x in args.rewrite_predicate],
            object_rewrites=[tuple(x) for x in args.rewrite_object],
            squish=args.squish,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
