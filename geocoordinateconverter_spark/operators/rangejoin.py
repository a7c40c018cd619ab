"""Banded range/interval join — [NORTH-RULE] (SURVEY.md §3.6 "range /
interval join": *prefer the equi form to avoid BNLJ*).

A raw range predicate ``value >= lo AND value < hi`` has no equality
key, so Spark plans BroadcastNestedLoopJoin — fine for a 10-row dim,
O(n·m) once the interval side grows.  The scale-safe form grids the
value axis with a fixed ``step``: every interval is exploded to the
grid cells it covers, every point maps to its one cell, the join is a
hash equi-join on the cell, and the original range predicate stays as
a residual filter.  Cost is (interval length / step) rows per interval
— pick ``step`` near the median interval width.

This is the 1-D analogue of the engine's H3 cover-cell PIP join
(operators/pip.py) and the same banding trick the MinHash-LSH pair
generator uses: turn a geometric predicate into an equi key + refine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(points: DataFrame, value_col: str,
                      intervals: DataFrame, lo_col: str, hi_col: str,
                      step: float, broadcast_intervals: bool = True,
                      hi_inclusive: bool = False) -> DataFrame:
    """Join each point to every interval with lo <= value < hi (or <=
    hi when ``hi_inclusive``), via grid-cell equi-join + residual
    filter.  Output: points columns + intervals columns."""
    cell_of = lambda c: F.floor(c / F.lit(float(step))).cast("bigint")  # noqa: E731
    iv = intervals.withColumn(
        "_cell", F.explode(F.sequence(cell_of(F.col(lo_col)),
                                      cell_of(F.col(hi_col)))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pts = points.withColumn("_cell", cell_of(F.col(value_col)))
    hi_pred = (F.col(value_col) <= F.col(hi_col) if hi_inclusive
               else F.col(value_col) < F.col(hi_col))
    return (pts.join(iv, "_cell")
            .filter((F.col(value_col) >= F.col(lo_col)) & hi_pred)
            .drop("_cell"))
