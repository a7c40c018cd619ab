"""Per-partition checkpoint lineage + resumable writes — [NORTH-RULE]
(SURVEY.md §3.6 "checkpoint lineage / resumability", §5.2 item 5).

Mechanism (no engine forks, pure table layout):

* The job's output is bucketed by a deterministic key
  (``pmod(hash(url), n_buckets)``).  Each bucket is written to its own
  partition directory ``bucket=<i>`` with one atomic rename, and a row
  ``(bucket, n_rows, value_hash, wall_s)`` is appended to a MANIFEST
  parquet next to the output.
* A rerun loads the manifest, **skips buckets already present**, and
  recomputes only the missing ones — per-partition lineage at the
  bucket granularity.  Because every operator upstream is
  deterministic (fixed-iteration kernels, first-match AFT, seeded
  fixtures), a skipped bucket is byte-equivalent to a recomputed one —
  asserted in tests via the bucket value hash.
* At 10¹² rows, buckets map 1:1 to output partition dirs, so recovery
  cost after a failure is (missing buckets)/(total buckets), and the
  manifest doubles as the per-partition metrics table (rows, bytes,
  wall-clock) the north_rule asks for.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest"


def bucket_col(key: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def _bucket_hash(df: DataFrame) -> DataFrame:
    """Order-insensitive content hash per bucket: sum of per-row
    xxhash64 over the concatenated row repr (integer sum wraps
    identically everywhere)."""
    cols = [c for c in df.columns if c != "bucket"]
    # mod-reduced so the sum cannot overflow int64 under ANSI mode even
    # at 10^9 rows/bucket (1e9 · (1e9+7) < 2^63)
    row_h = F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in cols]),
                   F.lit(1_000_000_007))
    return df.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.sum(row_h).alias("value_hash"))


def checkpointed_write(df: DataFrame, out_dir: str, key: str,
                       n_buckets: int = 16,
                       fail_after_bucket: int | None = None) -> dict:
    """Write ``df`` partitioned by bucket with manifest lineage; skip
    buckets already committed by a previous (possibly failed) run.

    ``fail_after_bucket`` injects a crash for the resumability test.
    Returns {written: [...], skipped: [...]}.
    """
    spark = df.sparkSession
    b = df.withColumn("bucket", bucket_col(F.col(key), n_buckets))
    b.persist()
    try:
        done: set[int] = set()
        mpath = os.path.join(out_dir, MANIFEST)
        try:
            done = {r.bucket for r in spark.read.parquet(mpath).collect()}
        except Exception:
            pass

        written, skipped = [], []
        for i in range(n_buckets):
            if i in done:
                skipped.append(i)
                continue
            part = b.filter(F.col("bucket") == i)
            t0 = time.time()
            part.drop("bucket").write.mode("overwrite").parquet(
                os.path.join(out_dir, f"bucket={i}"))
            stats = _bucket_hash(part).collect()
            n_rows = stats[0].n_rows if stats else 0
            v_hash = stats[0].value_hash if stats else 0
            spark.createDataFrame(
                [(i, int(n_rows), int(v_hash or 0), time.time() - t0)],
                "bucket int, n_rows long, value_hash long, wall_s double",
            ).write.mode("append").parquet(mpath)
            written.append(i)
            if fail_after_bucket is not None and i >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {i}")
        return {"written": written, "skipped": skipped}
    finally:
        b.unpersist()


def read_checkpointed(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "bucket=*"))


def manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, MANIFEST))
