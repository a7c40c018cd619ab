"""Driver contract for the spark-graft builder (PySpark target).

Engine: ``geocoordinateconverter_spark`` — a PySpark-native spatial
join + tiling engine whose numeric core reimplements the reference's
Slovenian datum pipeline (SURVEY.md; BASELINE.json north_star).

Layout of this file:
  * ``entry``      — flagship end-to-end pipeline at sf0.001
  * ``queries``    — one entry per implemented operator (SURVEY.md §2)
  * ``oracle_sql`` — DuckDB twins; see functions/sqlgen.py for how the
    numeric chains are replicated bit-for-bit in dialect-neutral SQL.

Numeric outputs are rounded (mm-scale or finer) and, for value-listing
queries, sampled — DuckDB and NumPy agree to ≤5e-9 m / 4e-14 deg
(measured), so rounding boundary flips are negligible; structural
outputs (cells, tri ids, join partners, counts) are integer-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geocoordinateconverter_spark import kernels
from geocoordinateconverter_spark.functions import sqlgen as sg
from geocoordinateconverter_spark.operators import knn as knn_op
from geocoordinateconverter_spark.operators import pip as pip_op
from geocoordinateconverter_spark.sources import webpages as wp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _register(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# Integer key column spanning the largest table: lineitem rows keyed by
# 4·l_orderkey + l_linenumber (unique, dense enough for mixing).
LKEY = "(l_orderkey * 8 + l_linenumber)"

_GK = sg.gk_points_sql("k")
_WGS = sg.wgs_points_sql("k")

# dialect-neutral derived-point sources (shared Spark/DuckDB verbatim)
SRC_GK_LINEITEM = (f"(SELECT k, {_GK['x']} AS x, {_GK['y']} AS y, "
                   f"{_GK['h']} AS h FROM (SELECT {LKEY} AS k FROM lineitem) q_k) q_src")


def _src_wgs(key_expr: str, table: str) -> str:
    w = sg.wgs_points_sql("k")
    return (f"(SELECT k, {w['fi']} AS fi, {w['la']} AS la, "
            f"{w['h']} AS h FROM (SELECT {key_expr} AS k FROM {table}) q_k) q_src")


SRC_WGS_ORDERS = _src_wgs("o_orderkey", "orders")


# ===========================================================================
# entry — flagship pipeline (SURVEY.md §8 M2): web corpus → geoparse →
# t=3 datum conversion (pandas UDF) → cell encode (codegen) → PIP join
# (broadcast) → tile aggregation.
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    sf_dir = "/root/testdata/sf0.001"
    _register(spark, sf_dir)
    pages = spark.sql(f"SELECT * FROM {wp.webpages_sql('documents')} w")
    pages.createOrReplaceTempView("webpages")
    gk = spark.sql(f"SELECT * FROM {wp.geoparse_gk_sql('webpages')} g")
    t3 = kernels.transform_udf(3)
    conv = (gk.withColumn("out", t3(F.col("x"), F.col("y"), F.col("h")))
              .select("url", F.col("out.fi").alias("fi"),
                      F.col("out.la").alias("la"), F.col("out.h").alias("h")))
    hits = pip_op.pip_join(conv, spark)
    tiles = (hits
             .withColumn("cell", kernels.cell_col(F.col("fi"), F.col("la"), 7))
             .groupBy("cell", "mun_id")
             .agg(F.count("*").alias("n_docs"),
                  F.round(F.avg("h"), 3).alias("avg_h")))
    return tiles


# ===========================================================================
# queries / oracle_sql
# ===========================================================================

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- S3: northing normalizer (gk-slo.c input normalize) --------------
    def q_normalize(spark, sf_dir):
        _register(spark, sf_dir)
        return spark.sql(
            f"SELECT k, x AS x_raw, "
            f"case when x > 1000000.0e0 then x - 5000000.0e0 else x end AS x_red, y "
            f"FROM {SRC_GK_LINEITEM} WHERE k % 7 = 0")
    q["s3_normalize_northing"] = q_normalize

    # ---- t-chain value queries (sampled; pandas-UDF kernels) -------------
    def _chain_query(t: int, src_sql: str, sample: str, out_round):
        # out_round: decimals per output col; None = pass-through value
        # that is bit-identical to the oracle's (rounding would only
        # introduce decimal-midpoint HALF_UP-vs-float divergence).
        def run(spark, sf_dir):
            _register(spark, sf_dir)
            src = spark.sql(f"SELECT * FROM {src_sql} WHERE {sample}")
            udf = kernels.transform_udf(t)
            cols = ["fi", "la", "h"] if t in (1, 3, 7) else ["x", "y", "h"]
            in_cols = [F.col(c) for c in (("x", "y", "h") if t in (1, 3, 5, 6, 9)
                                          else ("fi", "la", "h"))]
            df = src.withColumn("out", udf(*in_cols))
            sel = [F.col("k")] + [
                (F.col(f"out.{c}") if nd is None
                 else F.round(F.col(f"out.{c}"), nd)).alias(f"{c}_out")
                for c, nd in zip(cols, out_round)]
            return df.select(*sel)
        return run

    q["t3_gk_to_wgs84"] = _chain_query(3, SRC_GK_LINEITEM, "k % 37 = 0", (8, 8, 2))
    q["t1_tm_to_wgs84"] = _chain_query(1, SRC_GK_LINEITEM, "k % 41 = 0", (8, 8, None))
    q["t2_wgs84_to_tm"] = _chain_query(2, SRC_WGS_ORDERS, "k % 11 = 0", (2, 2, None))
    q["t5_gk_to_tm"] = _chain_query(5, SRC_GK_LINEITEM, "k % 43 = 0", (2, 2, 2))

    # ---- flagship tile aggregation (t3 → cell → groupBy) -----------------
    def q_tile(spark, sf_dir):
        _register(spark, sf_dir)
        src = spark.sql(f"SELECT * FROM {SRC_GK_LINEITEM}")
        t3 = kernels.transform_udf(3)
        conv = src.withColumn("out", t3(F.col("x"), F.col("y"), F.col("h")))
        return (conv
                .withColumn("cell", kernels.cell_col(F.col("out.fi"), F.col("out.la"), 7))
                .groupBy("cell")
                .agg(F.count("*").alias("n_pts"),
                     F.round(F.avg("out.h"), 3).alias("avg_h")))
    q["tile_t3_cells"] = q_tile

    # ---- raster↔vector rollup: res7 → res5 parent cells ------------------
    def q_rollup(spark, sf_dir):
        _register(spark, sf_dir)
        src = spark.sql(f"SELECT * FROM {_src_wgs('o_orderkey', 'orders')}")
        c7 = kernels.cell_col(F.col("fi"), F.col("la"), 7)
        df = src.withColumn("cell7", c7).withColumn(
            "cell5", kernels.parent_cell_col(F.col("cell7"), 2))
        return df.groupBy("cell5").agg(F.count("*").alias("n_pts"))
    q["tile_rollup_res5"] = q_rollup

    # ---- geoparse (S2) + passthrough invariant ---------------------------
    def q_pages_md5(spark, sf_dir):
        _register(spark, sf_dir)
        pages = spark.sql(f"SELECT * FROM {wp.webpages_sql('documents')} w")
        return pages.select("url", F.md5(F.col("page_text")).alias("text_md5"),
                            F.length("page_text").alias("text_len"))
    q["webpages_text_passthrough"] = q_pages_md5

    def q_geoparse_dd(spark, sf_dir):
        _register(spark, sf_dir)
        pages = spark.sql(f"SELECT * FROM {wp.webpages_sql('documents')} w")
        pages.createOrReplaceTempView("webpages")
        return spark.sql(
            f"SELECT url, fi, la FROM {wp.geoparse_dd_sql('webpages')} g")
    q["geoparse_decimal_degrees"] = q_geoparse_dd

    def q_geoparse_dms(spark, sf_dir):
        _register(spark, sf_dir)
        pages = spark.sql(f"SELECT * FROM {wp.webpages_sql('documents')} w")
        pages.createOrReplaceTempView("webpages")
        return spark.sql(
            f"SELECT url, round(fi, 6) AS fi, round(la, 6) AS la "
            f"FROM {wp.geoparse_dms_sql('webpages')} g")
    q["geoparse_dms"] = q_geoparse_dms

    # ---- PIP join (broadcast cover-cell + ray-cast refine) ---------------
    def q_pip(spark, sf_dir):
        _register(spark, sf_dir)
        pts = spark.sql(f"SELECT * FROM {_src_wgs('o_orderkey', 'orders')}")
        return (pip_op.pip_join(pts, spark)
                .select(F.col("k"), F.col("mun_id")))
    q["pip_join_municipalities"] = q_pip

    def q_pip_tile(spark, sf_dir):
        _register(spark, sf_dir)
        pts = spark.sql(f"SELECT * FROM {_src_wgs('o_orderkey', 'orders')}")
        return (pip_op.pip_join(pts, spark)
                .groupBy("mun_id").agg(F.count("*").alias("n_pts"),
                                       F.min("h").alias("min_h"),
                                       F.max("h").alias("max_h")))
    q["pip_tile_agg"] = q_pip_tile

    # ---- kNN join --------------------------------------------------------
    def q_knn(spark, sf_dir):
        _register(spark, sf_dir)
        pts = spark.sql(f"SELECT * FROM {_src_wgs('o_orderkey', 'orders')}")
        return (knn_op.knn_join(pts, spark, key="k", k=3)
                .select("k", "station_id", "dist2", "rk"))
    q["knn_join_stations"] = q_knn

    # ---- AFT point location (A1/A2) --------------------------------------
    def q_aft(spark, sf_dir):
        _register(spark, sf_dir)
        src = spark.sql(
            f"SELECT k, case when x > 1000000.0e0 then x - 5000000.0e0 else x end AS x, y "
            f"FROM {SRC_GK_LINEITEM}")
        loc = kernels.aft_locate_udf("gk_tm")
        return src.select("k", loc(F.col("x"), F.col("y")).alias("tri_id"))
    q["aft_locate_triangle"] = q_aft

    # ---- geoid sampling (A4) ---------------------------------------------
    def q_geoid(spark, sf_dir):
        _register(spark, sf_dir)
        src = spark.sql(f"SELECT * FROM {_src_wgs('o_orderkey', 'orders')}")
        g = kernels.geoid_udf("slo")
        return src.select("k", F.round(g(F.col("fi"), F.col("la")), 6).alias("geoid_n"))
    q["geoid_bilinear"] = q_geoid

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["s3_normalize_northing"] = (
        f"SELECT k, x AS x_raw, "
        f"case when x > 1000000.0e0 then x - 5000000.0e0 else x end AS x_red, y "
        f"FROM {SRC_GK_LINEITEM} WHERE k % 7 = 0")

    def _chain_oracle(sql_fn, src_sql, sample, cols, rounds):
        src = f"(SELECT * FROM {src_sql} WHERE {sample}) q_f"
        sel = ", ".join(
            (f"{c} AS {c}_out" if nd is None else f"round({c}, {nd}) AS {c}_out")
            for c, nd in zip(cols, rounds))
        return f"SELECT k, {sel} FROM ({sql_fn(src, 'k')}) q_out"

    o["t3_gk_to_wgs84"] = _chain_oracle(sg.t3_sql, SRC_GK_LINEITEM, "k % 37 = 0",
                                        ("fi", "la", "h"), (8, 8, 2))
    o["t1_tm_to_wgs84"] = _chain_oracle(sg.t1_sql, SRC_GK_LINEITEM, "k % 41 = 0",
                                        ("fi", "la", "h"), (8, 8, None))
    o["t2_wgs84_to_tm"] = _chain_oracle(sg.t2_sql, SRC_WGS_ORDERS, "k % 11 = 0",
                                        ("x", "y", "h"), (2, 2, None))
    o["t5_gk_to_tm"] = _chain_oracle(sg.t5_sql, SRC_GK_LINEITEM, "k % 43 = 0",
                                     ("x", "y", "h"), (2, 2, 2))

    from geocoordinateconverter_spark import cells as _cells

    o["tile_t3_cells"] = (
        f"SELECT cell, count(*) AS n_pts, round(avg(h), 3) AS avg_h FROM ("
        f"SELECT {_cells.encode_sql('fi', 'la', 7)} AS cell, h "
        f"FROM ({sg.t3_sql(SRC_GK_LINEITEM, 'k')}) q_t3) q_c GROUP BY cell")

    o["tile_rollup_res5"] = (
        f"SELECT {_cells.encode_sql('fi', 'la', 5)} AS cell5, count(*) AS n_pts "
        f"FROM {_src_wgs('o_orderkey', 'orders')} GROUP BY 1")

    o["webpages_text_passthrough"] = (
        f"SELECT url, md5(page_text) AS text_md5, length(page_text) AS text_len "
        f"FROM {wp.webpages_sql('documents')} w")

    _pages = f"{wp.webpages_sql('documents')} w"
    o["geoparse_decimal_degrees"] = (
        f"SELECT url, fi, la FROM {wp.geoparse_dd_sql(_pages)} g")

    o["geoparse_dms"] = (
        f"SELECT url, round(fi, 6) AS fi, round(la, 6) AS la "
        f"FROM {wp.geoparse_dms_sql(_pages)} g")

    _pts_orders = f"(SELECT * FROM {_src_wgs('o_orderkey', 'orders')})"
    o["pip_join_municipalities"] = (
        f"SELECT p.k AS k, m.mun_id AS mun_id "
        f"FROM {_pts_orders} p CROSS JOIN {pip_op.municipalities_values_sql()} m "
        f"WHERE {pip_op.pip_oracle_condition()}")

    o["pip_tile_agg"] = (
        f"SELECT mun_id, count(*) AS n_pts, min(h) AS min_h, max(h) AS max_h FROM ("
        f"SELECT p.k AS k, p.h AS h, m.mun_id AS mun_id "
        f"FROM {_pts_orders} p CROSS JOIN {pip_op.municipalities_values_sql()} m "
        f"WHERE {pip_op.pip_oracle_condition()}) q GROUP BY mun_id")

    o["knn_join_stations"] = (
        f"SELECT k, station_id, dist2, rk "
        f"FROM {knn_op.knn_oracle_sql(_pts_orders, 'k', 3)} q")

    _gk_norm = (f"(SELECT k, case when x > 1000000.0e0 then x - 5000000.0e0 else x end AS x, y "
                f"FROM {SRC_GK_LINEITEM}) q_n")
    o["aft_locate_triangle"] = (
        f"SELECT k, tri_id FROM {sg.aft_locate_sql(_gk_norm, 'k')} q")

    o["geoid_bilinear"] = (
        f"SELECT k, round(geoid_n, 6) AS geoid_n "
        f"FROM {sg.geoid_sql(_pts_orders, 'k', 'slo')} q")

    return o
