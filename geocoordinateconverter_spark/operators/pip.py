"""Point-in-polygon join — [NORTH-RULE] (SURVEY.md §3.6, §5.2 item 3).

Two-phase plan, designed for the 100 TB point side:

1. **Prefilter** — points get a grid-cell id (pure Catalyst arithmetic,
   kernels.cell_col) and equi-join against a tiny broadcast table of
   polygon *cover cells* (every cell intersecting a polygon's bbox).
   Expressing PIP as a broadcast **equi**-join lets Catalyst pick
   BroadcastHashJoin — no shuffle of the big side, no
   BroadcastNestedLoopJoin.
2. **Exact refine** — vectorized even-odd ray-cast pandas UDF over the
   candidate pairs; the polygon vertex table rides inside the UDF
   closure as a NumPy array (≈ the reference shipping its AFT tables in
   headers — SURVEY.md §2.2).  Handles concave polygons; boundary rule
   is the classic half-open crossing test.

The municipality fixture (FIXTURES.md §4) is a deterministic set of
convex octagons around mixed centroids (212 at bench scale to match the
real Slovenian municipality count; 20 at test scale).  Synthesis is
pure arithmetic on ``mun_id`` so :func:`municipalities_sql` rebuilds it
bit-identically inside DuckDB, and :func:`pip_oracle_condition`
generates the convex half-plane containment test the oracle uses
(engine ray-cast ≡ half-plane test on convex polygons).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import cells
from ..constants import BBOX_FI_MAX, BBOX_FI_MIN, BBOX_LA_MAX, BBOX_LA_MIN
from ..functions.sqlgen import f as _f

N_VERTS = 8
PIP_CELL_RES = 6  # prefilter resolution (~0.0068° ≈ 500–750 m cells)


# ---------------------------------------------------------------------------
# Fixture synthesis (deterministic, no RNG — identical on every
# executor and inside DuckDB)
# ---------------------------------------------------------------------------

def _mix01(i: int, mult: int) -> float:
    return ((i * mult) % 1000000) / 1000000.0


def municipality_polygons(n_mun: int = 20) -> np.ndarray:
    """(n_mun, N_VERTS, 2) lon/lat vertex array, CCW convex octagons."""
    out = np.empty((n_mun, N_VERTS, 2), dtype=np.float64)
    for i in range(n_mun):
        cx = BBOX_LA_MIN + 0.3 + (BBOX_LA_MAX - BBOX_LA_MIN - 0.6) * _mix01(i + 1, 2654435761)
        cy = BBOX_FI_MIN + 0.2 + (BBOX_FI_MAX - BBOX_FI_MIN - 0.4) * _mix01(i + 1, 1597334677)
        r = 0.08 + 0.05 * _mix01(i + 1, 40503)
        phase = 2.0 * math.pi * _mix01(i + 1, 69069) / 8.0
        for v in range(N_VERTS):
            ang = phase + 2.0 * math.pi * v / N_VERTS
            out[i, v, 0] = cx + r * math.cos(ang)
            out[i, v, 1] = cy + 0.7 * r * math.sin(ang)
    return out


def municipalities_values_sql(n_mun: int = 20) -> str:
    """VALUES table (mun_id, v0x, v0y, …, v7x, v7y) with exact float64
    literals — the oracle's copy of the polygon table."""
    polys = municipality_polygons(n_mun)
    rows = []
    for i in range(n_mun):
        vals = ", ".join(
            f"{_f(polys[i, v, 0])}, {_f(polys[i, v, 1])}" for v in range(N_VERTS)
        )
        rows.append(f"({i}, {vals})")
    cols = ", ".join(f"v{v}x, v{v}y" for v in range(N_VERTS))
    return (f"(SELECT * FROM (VALUES {', '.join(rows)}) "
            f"AS m(mun_id, {cols}))")


def pip_oracle_condition(px: str = "p.la", py: str = "p.fi") -> str:
    """Convex containment as AND of half-plane tests (CCW ⇒ every edge
    cross product ≥ 0).  Strict/non-strict choice is irrelevant off the
    boundary; fixture points never lie exactly on an edge."""
    conds = []
    for v in range(N_VERTS):
        w = (v + 1) % N_VERTS
        conds.append(
            f"((m.v{w}x - m.v{v}x) * (({py}) - m.v{v}y) - "
            f"(m.v{w}y - m.v{v}y) * (({px}) - m.v{v}x) >= {_f(0.0)})"
        )
    return "(" + " AND ".join(conds) + ")"


# ---------------------------------------------------------------------------
# Engine side
# ---------------------------------------------------------------------------

def municipalities_df(spark: SparkSession, n_mun: int = 20) -> DataFrame:
    """Dimension table: mun_id, name, vertex struct array, cover cells."""
    polys = municipality_polygons(n_mun)
    rows = []
    for i in range(n_mun):
        cover = cells.cover_bbox(
            polys[i, :, 0].min(), polys[i, :, 1].min(),
            polys[i, :, 0].max(), polys[i, :, 1].max(), PIP_CELL_RES)
        rows.append((i, f"MUN_{i}", [int(c) for c in cover]))
    return spark.createDataFrame(rows, "mun_id int, name string, h3_cover array<bigint>")


def point_in_polygon_udf(polys: np.ndarray):
    """Vectorized even-odd ray cast: (px, py, poly_idx) → bool.

    ``polys``: (n_poly, n_verts, 2) closure array.  One Arrow crossing;
    n_verts-step XOR accumulation over whole columns.
    """
    vx = polys[:, :, 0]
    vy = polys[:, :, 1]
    nv = polys.shape[1]

    @pandas_udf("boolean")
    def _udf(px: pd.Series, py: pd.Series, idx: pd.Series) -> pd.Series:
        x = px.to_numpy(np.float64, copy=False)
        y = py.to_numpy(np.float64, copy=False)
        k = idx.to_numpy(np.int64, copy=False)
        gx = vx[k]  # (n, nv)
        gy = vy[k]
        inside = np.zeros(len(x), dtype=bool)
        for v in range(nv):
            w = (v + 1) % nv
            yi, yj = gy[:, v], gy[:, w]
            xi, xj = gx[:, v], gx[:, w]
            crosses = (yi > y) != (yj > y)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (xj - xi) * (y - yi) / (yj - yi) + xi
            inside ^= crosses & (x < xint)
        return pd.Series(inside)

    return _udf


def pip_join(points: DataFrame, spark: SparkSession,
             fi_col: str = "fi", la_col: str = "la",
             n_mun: int = 20) -> DataFrame:
    """points (big) ⋈ municipalities (tiny broadcast) → rows + mun_id.

    Plan shape: codegen cell encode → BroadcastHashJoin on cover cell →
    ArrowEvalPython refine → filter.  The point side is never shuffled.
    """
    polys = municipality_polygons(n_mun)
    mun = municipalities_df(spark, n_mun)
    cover = mun.select("mun_id", F.explode("h3_cover").alias("cell"))
    pts = points.withColumn(
        "cell", _cell(F.col(fi_col), F.col(la_col)))
    cand = pts.join(F.broadcast(cover), "cell", "inner")
    refine = point_in_polygon_udf(polys)
    return (cand
            .withColumn("inside", refine(F.col(la_col), F.col(fi_col), F.col("mun_id")))
            .filter(F.col("inside"))
            .drop("inside", "cell"))


def _cell(fi: Column, la: Column) -> Column:
    from ..kernels import cell_col
    return cell_col(fi, la, PIP_CELL_RES)
