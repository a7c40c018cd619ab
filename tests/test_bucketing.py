"""Bucketed co-located join (SURVEY.md §3.6 "Co-locate joins via
bucketing"): writing both sides bucketed+sorted on the join key lets
Catalyst plan a SortMergeJoin with NO Exchange on either side — the
at-scale answer for repeated big-big joins (e.g. docs ⋈ per-doc
features at 10¹² rows, where a broadcast is impossible and a shuffle
per query is the dominant cost)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_join_no_shuffle(spark, warehouse):
    import shutil
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    # a fresh session's catalog doesn't know tables from a previous
    # process, so DROP won't clear their orphaned warehouse dirs
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable("b_customer"))

    j = (spark.table("b_orders")
         .join(spark.table("b_customer"),
               F.col("o_custkey") == F.col("c_custkey"))
         .groupBy("c_mktsegment").agg(F.count("*").alias("n")))
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the join itself reads pre-bucketed files: no Exchange below the SMJ
    join_part = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else ""
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part.split("HashAggregate")[0]

    # and the result matches the plain (shuffled) join
    plain = (orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment").agg(F.count("*").alias("n")))
    got = {r.c_mktsegment: r.n for r in j.collect()}
    exp = {r.c_mktsegment: r.n for r in plain.collect()}
    assert got == exp


def test_partition_pruning_on_date(spark, tmp_path_factory):
    """SURVEY.md §3.6: partition pruning on the ingest timestamp is
    free via Catalyst once the corpus is written partitioned by date
    (the warc_ts layout of the production Iceberg table)."""
    out = str(tmp_path_factory.mktemp("part") / "events_by_day")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    (events.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
     .write.partitionBy("day").mode("overwrite").parquet(out))

    df = spark.read.parquet(out)
    # partition col is inferred as DATE on read-back
    day0 = str(sorted(r.day for r in df.select("day").distinct().collect())[0])
    one_day = df.filter(F.col("day") == day0).select("event_id", "value")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and day0 in plan
    # pruned read touches only that partition's rows
    n_expected = events.filter(
        F.date_format("ts", "yyyy-MM-dd") == day0).count()
    assert one_day.count() == n_expected
