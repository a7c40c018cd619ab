"""Arrow pandas-UDF wrappers around the NumPy numeric core.

The reference runs one C function per input line (gk-slo.c main loop —
SURVEY.md §4.1); the Spark rebuild runs the SAME math whole-column over
Arrow record batches (SURVEY.md §4.4): JVM → Arrow → NumPy float64
kernel → Arrow → JVM, with **one Arrow crossing per composite chain**
(a fused t=3 UDF, not five stage UDFs) and **zero per-row Python**
(input_hint hard ban; audit with ``explain()`` — only ArrowEvalPython
may appear, never BatchEvalPython).

Cell encoding deliberately does NOT live here: it is pure arithmetic,
so :func:`cell_col` builds it from Catalyst built-ins and it stays
inside whole-stage codegen (see cells.py rationale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from . import aft as _aft
from . import cells as _cells
from . import geodesy as _g
from . import geoid as _geoid

_CHAINS = {
    1: _g.tm_to_wgs84,
    2: _g.wgs84_to_tm,
    3: _g.gk_to_wgs84,
    4: _g.wgs84_to_gk,
    5: _g.gk_to_tm,
    6: _g.tm_to_gk,
    7: _aft.gk_to_wgs84_aft,
    8: _aft.wgs84_to_gk_aft,
    9: _aft.gk_to_tm_aft,
    10: _aft.tm_to_gk_aft,
}

# Output column names per chain: geographic chains return (fi, la, h),
# projected chains return (x, y, h) — mirroring GEOGRA/GEOUTM
# (common.h struct decls, SURVEY.md §2.1).
_GEOGRAPHIC_OUT = {1, 3, 7}
_GEOGRAPHIC_IN = {2, 4, 8}

# SURVEY.md §3.4 A6: per-chain default height mode (-ht transformed /
# -hc copied / -hg geoid-derived).  [UNVERIFIED against the README's
# exact defaults table — /root/reference is an empty mount (SURVEY §0);
# values mirror the public usage docs and each chain's semantics:
# same-datum projections carry the geoid-corrected height, Helmert
# chains the transformed height, AFT chains copy.]  The table is the
# single source of truth for transform_with_height_udf.
HEIGHT_MODE_DEFAULTS = {1: "hg", 2: "hg", 3: "ht", 4: "ht", 5: "ht",
                        6: "ht", 7: "hc", 8: "hc", 9: "hc", 10: "hc"}


def transform_udf(t: int):
    """pandas UDF for composite chain ``t`` (1..10, SURVEY.md §3.3).

    Signature: (c1, c2, c3) → struct<c1:double, c2:double, c3:double>
    where the c-triple is (x, y, H) or (fi, la, h) per the chain's
    GEOUTM/GEOGRA direction.  The whole chain is one NumPy pipeline →
    one Arrow crossing.
    """
    fn = _CHAINS[t]
    names = ("fi", "la", "h") if t in _GEOGRAPHIC_OUT else ("x", "y", "h")
    schema = ", ".join(f"{n} double" for n in names)

    @pandas_udf(schema)
    def _udf(c1: pd.Series, c2: pd.Series, c3: pd.Series) -> pd.DataFrame:
        o1, o2, o3 = fn(c1.to_numpy(dtype="float64", copy=False),
                        c2.to_numpy(dtype="float64", copy=False),
                        c3.to_numpy(dtype="float64", copy=False))
        return pd.DataFrame({names[0]: o1, names[1]: o2, names[2]: o3})

    _udf.__name__ = f"t{t}_{fn.__name__}"
    return _udf


def transform_with_height_udf(t: int, height_mode: str | None = None,
                              geoid_model: str = "slo"):
    """Chain ``t`` with an explicit -ht/-hc/-hg height-mode selector
    (gk-slo CLI options; defaults from :data:`HEIGHT_MODE_DEFAULTS`).

    * ``ht`` — the chain's transformed height (Helmert path carries it
      through ECEF; projection-only chains pass it unchanged).
    * ``hc`` — copy the input height verbatim.
    * ``hg`` — geoid-derived: chains ENDING geographic add N(φ,λ) at
      the output point (physical H → ellipsoidal h); chains STARTING
      geographic subtract N(φ,λ) at the input point (h → H).
      Projected↔projected chains (5/6/9/10) would need the WGS84
      intermediate — not exposed at this wrapper; selecting hg for
      them raises (their reference defaults are ht/hc anyway).

    Still ONE Arrow crossing: the geoid lookup is NumPy inside the
    same UDF."""
    mode = height_mode or HEIGHT_MODE_DEFAULTS[t]
    if mode not in ("ht", "hc", "hg"):
        raise ValueError(f"height_mode {mode!r}")
    if mode == "hg" and t not in (_GEOGRAPHIC_OUT | _GEOGRAPHIC_IN):
        raise ValueError(
            f"height_mode='hg' needs a geographic endpoint; chain t={t} "
            f"is projected↔projected (default: {HEIGHT_MODE_DEFAULTS[t]!r})")
    fn = _CHAINS[t]
    names = ("fi", "la", "h") if t in _GEOGRAPHIC_OUT else ("x", "y", "h")
    schema = ", ".join(f"{n} double" for n in names)

    @pandas_udf(schema)
    def _udf(c1: pd.Series, c2: pd.Series, c3: pd.Series) -> pd.DataFrame:
        a1 = c1.to_numpy(dtype="float64", copy=False)
        a2 = c2.to_numpy(dtype="float64", copy=False)
        a3 = c3.to_numpy(dtype="float64", copy=False)
        o1, o2, o3 = fn(a1, a2, a3)
        if mode == "hc":
            h = a3
        elif mode == "ht":
            h = o3
        elif t in _GEOGRAPHIC_OUT:
            h = o3 + _geoid.geoid_height(o1, o2, geoid_model)
        else:  # geographic input
            h = o3 - _geoid.geoid_height(a1, a2, geoid_model)
        return pd.DataFrame({names[0]: o1, names[1]: o2, names[2]: h})

    _udf.__name__ = f"t{t}_{fn.__name__}_{mode}"
    return _udf


def geoid_udf(model: str = "slo"):
    """Bilinear geoid undulation N(φ,λ) (SURVEY.md §3.4 A4/A5)."""

    @pandas_udf("double")
    def _udf(fi: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(_geoid.geoid_height(
            fi.to_numpy(dtype="float64", copy=False),
            la.to_numpy(dtype="float64", copy=False), model))

    return _udf


def aft_locate_udf(direction: str = "gk_tm"):
    """Containing-triangle id (first match in table order; −1 outside)
    — the point-location half of SURVEY.md §3.4 A1/A2."""
    table = _aft.AFT_GK_TM if direction == "gk_tm" else _aft.AFT_TM_GK

    @pandas_udf("long")
    def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(table.locate(
            x.to_numpy(dtype="float64", copy=False),
            y.to_numpy(dtype="float64", copy=False)))

    return _udf


def cell_col(fi: Column, la: Column, res: int = _cells.DEFAULT_RES) -> Column:
    """Grid-cell id as a pure Catalyst expression (stays in codegen).

    Bit-identical to :func:`cells.encode` and to the DuckDB SQL emitted
    by :func:`cells.encode_sql` — same constants, same operation order.
    """
    n = _cells.n_cells(res)
    ix = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (la - F.lit(_cells.BBOX_LA_MIN)) / F.lit(_cells.LA_SPAN) * F.lit(n)
    ).cast("bigint")))
    iy = F.least(F.lit(n - 1), F.greatest(F.lit(0), F.floor(
        (fi - F.lit(_cells.BBOX_FI_MIN)) / F.lit(_cells.FI_SPAN) * F.lit(n)
    ).cast("bigint")))
    return (F.lit(res).cast("bigint") * F.lit(1 << _cells.RES_SHIFT)
            + ix * F.lit(1 << _cells.IX_SHIFT) + iy)


def parent_cell_col(cell: Column, levels: int = 1) -> Column:
    """Parent cell at (res − levels) — pure arithmetic, stays in codegen;
    the raster↔vector rollup key (SURVEY.md §3.6)."""
    res = F.shiftright(cell, _cells.RES_SHIFT)
    ix = F.shiftright(cell, _cells.IX_SHIFT) % F.lit(1 << (_cells.RES_SHIFT - _cells.IX_SHIFT))
    iy = cell % F.lit(1 << _cells.IX_SHIFT)
    return ((res - F.lit(levels)) * F.lit(1 << _cells.RES_SHIFT)
            + F.shiftright(ix, levels) * F.lit(1 << _cells.IX_SHIFT)
            + F.shiftright(iy, levels))
