"""End-to-end pipeline: exactly-once resume, committed-only reads,
P/R after materialize, skewed predicate stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argo_spark.pages import expected_triples, synthesize_pages
from argo_spark.pipeline import KgPipeline, predicate_stats
from argo_spark.schema import TRIPLE_COLS


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "kg")


N = 120


def test_run_resume_exactly_once(spark, outdir):
    pages = synthesize_pages(spark, N)
    pipe = KgPipeline(spark, outdir, n_buckets=8)

    # first run dies after 3 buckets (simulated partial run)
    s1 = pipe.run(pages, max_buckets=3)
    assert s1.n_buckets_processed == 3
    # resume: picks up ONLY the remaining buckets
    s2 = pipe.run(pages)
    assert s2.n_buckets_processed == 5
    # a third run has nothing to do
    s3 = pipe.run(pages)
    assert s3.n_buckets_processed == 0 and s3.n_pages == 0

    # exactly-once: every page counted once across the two real runs
    assert s1.n_pages + s2.n_pages == N
    m = pipe.manifest.read()
    assert m.select("bucket").distinct().count() == 8
    assert m.count() == 8  # no bucket committed twice
    assert m.agg(F.sum("n_pages")).collect()[0][0] == N

    # committed view equals a fresh single-shot run's triples
    committed = pipe.triples()
    assert committed.select("url").distinct().count() == N


def test_rerun_bucket_is_idempotent(spark, outdir):
    pages = synthesize_pages(spark, N)
    pipe = KgPipeline(spark, outdir, n_buckets=4)
    pipe.run(pages, max_buckets=2)
    before = pipe.spark.read.parquet(pipe.triples_path).count()
    # simulate crash AFTER data write but BEFORE manifest commit of
    # bucket 2: write it again with resume (manifest says pending)
    pipe.run(pages, max_buckets=1)  # processes bucket 2 fresh
    pipe.run(pages)  # finish
    total = pipe.spark.read.parquet(pipe.triples_path).count()
    committed = pipe.triples().count()
    assert committed == total  # dynamic overwrite left no duplicates
    assert total > before


def test_materialize_pr_and_squish(spark, outdir):
    pages = synthesize_pages(spark, N)
    pipe = KgPipeline(spark, outdir, n_buckets=4)
    pipe.run(pages)
    squished = pipe.materialize(dedup_entities=False).select(*TRIPLE_COLS)

    gold = expected_triples(spark, N).select(*TRIPLE_COLS).dropDuplicates()
    assert squished.exceptAll(gold).count() == 0
    assert gold.exceptAll(squished).count() == 0
    # squish is a strict set
    assert squished.count() == squished.dropDuplicates().count()


def test_materialize_with_entity_dedup_shrinks_iris(spark, outdir):
    pages = synthesize_pages(spark, 300)
    pipe = KgPipeline(spark, outdir, n_buckets=4)
    pipe.run(pages)
    plain = pipe.materialize(dedup_entities=False)
    deduped = pipe.materialize(dedup_entities=True)
    ents = lambda df: (  # noqa: E731
        df.where("s_kind = 0 AND s_value LIKE 'http://dbpedia.org/resource/%'")
        .select("s_value")
        .distinct()
        .count()
    )
    assert ents(deduped) < ents(plain)  # variants folded
    assert deduped.count() <= plain.count()


def test_predicate_stats_salted(spark, outdir):
    pages = synthesize_pages(spark, N)
    pipe = KgPipeline(spark, outdir, n_buckets=4)
    pipe.run(pages)
    stats = {r.p_value: r.n for r in predicate_stats(pipe.triples()).collect()}
    t = pipe.triples()
    naive = {r.p_value: r.n for r in t.groupBy("p_value").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert stats == naive  # salting changes the plan, not the answer
    assert stats["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"] > 0
