"""Per-partition lineage manifest + exactly-once resume (SURVEY §2.6,
§4 item 3).

No Iceberg runtime jar is bundled in this sandbox (BASELINE.md), so
transactional semantics are emulated the classic way: the triples
table is hash-bucketed by url into ``bucket=N`` directories written
with dynamic partition overwrite (re-running a bucket is idempotent —
overwrite, not append), and a bucket becomes visible ONLY when its row
is appended to the manifest parquet after the data commit. A crash
between data write and manifest append re-runs that bucket from
scratch; downstream readers join through the manifest, so half-written
buckets are never observed. With an Iceberg catalog the same layout
maps 1:1 onto a partitioned table + snapshot metadata.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

MANIFEST_SCHEMA = (
    "bucket int, n_pages long, n_triples long, run_id string, "
    "committed_at double, min_url string, max_url string"
)


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/") + "/manifest"

    def read(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except AnalysisException:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def done_buckets(self) -> list[int]:
        return [r.bucket for r in self.read().select("bucket").distinct().collect()]

    def record(self, stats: DataFrame, run_id: str) -> None:
        """Append per-bucket lineage rows. stats: (bucket, n_pages,
        n_triples, min_url, max_url)."""
        (
            stats.withColumn("run_id", F.lit(run_id))
            .withColumn("committed_at", F.lit(time.time()))
            .select(
                "bucket", "n_pages", "n_triples", "run_id",
                "committed_at", "min_url", "max_url",
            )
            .write.mode("append")
            .parquet(self.path)
        )


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]
