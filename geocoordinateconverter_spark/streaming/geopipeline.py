"""Streaming twin of the flagship geo pipeline (SURVEY.md §3.6:
streaming is not in the north rule, but corpus ingest is incremental in
practice, so the geoparse → t=3 convert → tile-count pipeline exists in
both forms with identical semantics — same design as
streaming/windows.py).

The streaming plan is the SAME lineage as the batch one (the geoparse
SQL builders run unchanged over a streaming temp view; the chain UDF is
the same Arrow kernel); only the source (`readStream` file source) and
the sink mode differ.  Tile counts are a keyed aggregation, so the
batch-equivalence test drives it with ``trigger(availableNow=True)`` +
``outputMode('complete')`` to a memory sink — exactly-once per epoch,
result must equal the batch run row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import kernels
from ..sources import webpages as wp

TILE_RES = 7


def flagship_tiles_batch(spark: SparkSession, docs_view: str) -> DataFrame:
    """Batch form: documents view → webpages → GK geoparse → t3 → tile
    counts (the bench flagship minus the PIP stage, which is stateless
    and adds nothing to the streaming-semantics question)."""
    pages = spark.sql(f"SELECT * FROM {wp.webpages_sql(docs_view)} w")
    pages.createOrReplaceTempView(f"{docs_view}_pages")
    gk = spark.sql(f"SELECT * FROM {wp.geoparse_gk_sql(docs_view + '_pages')} g")
    t3 = kernels.transform_udf(3)
    conv = gk.withColumn("o", t3(F.col("x"), F.col("y"), F.col("h")))
    return (conv
            .withColumn("cell", kernels.cell_col(
                F.col("o.fi"), F.col("o.la"), TILE_RES))
            .groupBy("cell")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.sum("o.h"), 3).alias("sum_h")))


def flagship_tiles_streaming(spark: SparkSession,
                             docs_parquet_dir: str) -> DataFrame:
    """Streaming form over a parquet file source; same lineage."""
    schema = spark.read.parquet(docs_parquet_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_parquet_dir)
    stream.createOrReplaceTempView("stream_documents")
    return flagship_tiles_batch(spark, "stream_documents")
