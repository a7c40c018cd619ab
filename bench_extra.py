"""Stage-isolation benchmarks (guide §1.4: noop sink, labelled jobs).

NOT part of the driver contract — `bench.py` stays the frozen
measurement surface.  This file exists so OPTIMIZATION_r06.md can cite
per-stage numbers: each entry times one sub-stage of a bench query
against the noop sink (computes every column, discards the result).

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [stage ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from geocoordinateconverter_spark import kernels  # noqa: E402
from geocoordinateconverter_spark.operators import curation as cu  # noqa: E402
from geocoordinateconverter_spark.operators import textdedup as td  # noqa: E402
from geocoordinateconverter_spark.plans.session import build_session  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def stage_minhash_sig(spark, docs):
    noop(td.minhash_sig_array(docs))


def stage_minhash_bands(spark, docs):
    # banded + capped table (the self-join's input), built the
    # minhash_pairs way but stopped before the join
    cache: list = []
    try:
        pairs = td.minhash_pairs(docs, cache=cache)
        noop(cache[0])
    finally:
        for c in cache:
            c.unpersist()


def stage_minhash_full(spark, docs):
    cache: list = []
    try:
        noop(td.minhash_pairs(docs, cache=cache))
    finally:
        for c in cache:
            c.unpersist()


def stage_simhash_fp(spark, docs):
    noop(td.simhash(docs))


def stage_simhash_full(spark, docs):
    cache: list = []
    try:
        noop(td.simhash_near_dup_pairs(docs, cache=cache))
    finally:
        for c in cache:
            c.unpersist()


def stage_dupspans_grams(spark, docs):
    noop(cu._pos_grams(docs, cu.SPAN_N))


def stage_dupspans_dupagg(spark, docs):
    g = cu._pos_grams(docs, cu.SPAN_N)
    noop(g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
         .filter(F.col("nd") >= cu.SPAN_MIN_DOCS).select("gram"))


def stage_dupspans_full(spark, docs):
    cache: list = []
    try:
        noop(cu.dup_ngram_spans(docs, cache=cache))
    finally:
        for c in cache:
            c.unpersist()


def stage_decon_grams(spark, docs):
    from geocoordinateconverter_spark.operators.textdedup import TOKS_EXPR, \
        gram_window_expr
    noop(docs.select("doc_id", F.expr(TOKS_EXPR).alias("toks"))
         .select("doc_id",
                 F.explode(F.expr(
                     f"array_distinct({gram_window_expr(cu.DECON_N)})"))
                 .alias("gram")))


def stage_decon_full(spark, docs):
    noop(cu.decontaminate(docs))


def stage_flagship_t3(spark, docs):
    par = spark.sparkContext.defaultParallelism
    gk = em.sg.gk_points_sql("k")
    keys = (spark.sql(f"SELECT {em.LKEY} AS k0 FROM lineitem")
            .repartition(par))
    keys.createOrReplaceTempView("bench_keys")
    src = spark.sql(f"SELECT k0 AS k, {gk['x']} AS x, {gk['y']} AS y, "
                    f"{gk['h']} AS h FROM bench_keys")
    t3 = kernels.transform_udf(3)
    conv = (src.withColumn("o", t3(F.col("x"), F.col("y"), F.col("h")))
            .select("k", F.col("o.fi").alias("fi"),
                    F.col("o.la").alias("la"), F.col("o.h").alias("h")))
    noop(conv)


def stage_flagship_keys(spark, docs):
    par = spark.sparkContext.defaultParallelism
    noop(spark.sql(f"SELECT {em.LKEY} AS k0 FROM lineitem").repartition(par))


STAGES = {k[len("stage_"):]: v for k, v in list(globals().items())
          if k.startswith("stage_")}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    only = sys.argv[1:]
    spark = build_session("bench-extra", cores=cores,
                          shuffle_partitions=cores)
    em._register(spark, sf_dir)
    docs = spark.table("documents")
    # warm-up
    docs.limit(10).count()
    for name, fn in STAGES.items():
        if only and name not in only:
            continue
        ts = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"stage:{name}")
            t0 = time.time()
            fn(spark, docs)
            ts.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(ts)} runs={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
