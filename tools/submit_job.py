"""spark-submit entry point: runs the flagship pipeline from the
--py-files artifact only (no repo on sys.path), proving the engine is
self-contained for cluster submission.

    python tools/package.py
    spark-submit --master local[8] --py-files dist/engine.zip \
        tools/submit_job.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # imports resolve from the shipped zip on every executor
    import __spark_entry__ as em
    from geocoordinateconverter_spark import kernels
    from geocoordinateconverter_spark.operators import pip as pip_op
    from geocoordinateconverter_spark.operators import tiles

    em._register(spark, sf_dir)
    src = spark.sql(f"SELECT * FROM {em.SRC_GK_LINEITEM}")
    t3 = kernels.transform_udf(3)
    conv = (src.withColumn("o", t3(F.col("x"), F.col("y"), F.col("h")))
            .select("k", F.col("o.fi").alias("fi"),
                    F.col("o.la").alias("la"), F.col("o.h").alias("h")))
    t0 = time.time()
    tiles_df = tiles.salted_tile_agg(pip_op.pip_join(conv, spark), key="k")
    n = tiles_df.count()
    print(f"SUBMIT_OK tiles={n} wall={time.time() - t0:.2f}s sf_dir={sf_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
