"""SparkSession builders tuned for the engine's 100 TB design point.

Local testing runs ``local[N]`` (sandbox stand-in for N executors —
BASELINE.md scaling protocol); the config block is written so the same
settings transfer to ``spark-submit --py-files`` on a real cluster:

* AQE on (runtime coalesce, skew-join splitting — the backstop behind
  the explicit salting in operators/tiles.py; SURVEY.md §5.2 item 4).
* Arrow enabled + sane batch size: every numeric kernel crosses
  JVM↔Python as Arrow batches; the kernels are narrow (3 doubles, a
  64-float vector, or ~50 short tokens per row), so 128k rows/batch
  ≈ 3–50 MB per batch — fewer crossings than the old 32k without
  approaching Arrow's per-batch limits (guide §4.2: raise the batch
  for narrow numeric data; measured −0.9 s on the sf1.0 flagship).
* ``shuffle.partitions`` scales with parallelism (cores in local mode;
  2–3× total executor cores on a cluster).
* Timezone pinned UTC so timestamp arithmetic matches the DuckDB
  oracle bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "geocoordinateconverter-spark",
                  cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict[str, str] | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores
    # One BLAS/OpenMP thread per Python worker: task-level parallelism
    # already saturates the cores; a threaded BLAS inside N workers
    # oversubscribes N× and collapses throughput (measured 13× on the
    # PIP stage at local[32]).  Python workers inherit the driver env
    # in local mode; on a cluster ship the same via spark.executorEnv.*.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
