"""Dialect-neutral SQL replication of the numeric kernels — the DuckDB
oracle side of the driver's correctness gate (SURVEY.md §6.2 item 4).

The driver compares each ``queries()`` DataFrame against
``oracle_sql()`` run by DuckDB on the same parquet views.  DuckDB
cannot call our NumPy kernels, so this module *generates* ANSI SQL that
performs the **same float64 arithmetic in the same operation order** as
:mod:`..geodesy` / :mod:`..geoid` / :mod:`..cells`.  The SQL here is
dialect-neutral (runs unchanged on Spark SQL and DuckDB): plain
arithmetic, ``sin/cos/tan/atan2/sqrt/pi``, ``case when``, ``floor``,
``cast``, ``least/greatest``, ``%`` on non-negative integers.

Float literals are emitted via ``repr`` (shortest round-trip — parses
back to the identical binary64 in every engine) with an ``e0`` suffix
forcing DOUBLE type in DuckDB (bare ``45.25`` would parse as DECIMAL
and change division semantics).

Synthetic point derivation (``gk_points_sql`` …) is integer mixing —
bit-identical across engines — and mirrors FIXTURES.md §1: bbox-bounded
with a 60 % Ljubljana-region cluster to exercise hot-cell skew.
"""

from __future__ import annotations

import numpy as np

from .. import geodesy
from ..constants import (
    BBOX_FI_MAX,
    BBOX_FI_MIN,
    BBOX_LA_MAX,
    BBOX_LA_MIN,
    D48_GK,
    D96_TM,
    MIX_A,
    MIX_B,
    Projection,
)
from ..geodesy import XYZ2FILA_ITERS, _HELMERT_M, _HELMERT_M_INV, _HELMERT_T
from ..geoid import GRID_PARAMS, GRIDS


def f(v: float) -> str:
    """Float64 literal, DOUBLE-typed in both dialects."""
    r = repr(float(v))
    if "e" in r or "E" in r or "inf" in r or "nan" in r:
        return r
    return r + "e0"


D2R = "(pi() / 180.0e0)"
R2D = "(180.0e0 / pi())"


# ---------------------------------------------------------------------------
# Synthetic point derivation from an integer key (shared Spark/DuckDB)
# ---------------------------------------------------------------------------

def mix01(key: str, mult: int) -> str:
    """Deterministic uniform-ish value in [0,1) from integer ``key``."""
    return f"(cast((({key}) * {mult}) % 1000000 as double) / 1000000.0e0)"


def gk_points_sql(key: str) -> dict[str, str]:
    """D48/GK (x reduced-northing, y easting, H) from integer key.
    40 % uniform over the working bbox, 60 % in a tight Ljubljana-area
    cluster (FIXTURES.md §1 skew rule); every 7th point carries the
    absolute 5 000 000 m northing to exercise the S3 normalizer."""
    u1, u2, u3 = mix01(key, MIX_A), mix01(key, MIX_B), mix01(key, 40503)
    base_x = (f"(case when ({key}) % 10 < 6 "
              f"then {f(91000.0)} + {f(12000.0)} * {u1} "
              f"else {f(15000.0)} + {f(185000.0)} * {u1} end)")
    x = f"(case when ({key}) % 7 = 0 then {base_x} + {f(5.0e6)} else {base_x} end)"
    y = (f"(case when ({key}) % 10 < 6 "
         f"then {f(455000.0)} + {f(14000.0)} * {u2} "
         f"else {f(370000.0)} + {f(260000.0)} * {u2} end)")
    h = f"({f(200.0)} + {f(1800.0)} * {u3})"
    return {"x": x, "y": y, "h": h}


def tm_points_sql(key: str) -> dict[str, str]:
    """D96/TM points: same distribution as gk_points_sql but without
    the absolute-northing variant (TM inputs are always reduced)."""
    u1, u2, u3 = mix01(key, MIX_A), mix01(key, MIX_B), mix01(key, 40503)
    x = (f"(case when ({key}) % 10 < 6 "
         f"then {f(91000.0)} + {f(12000.0)} * {u1} "
         f"else {f(15000.0)} + {f(185000.0)} * {u1} end)")
    y = (f"(case when ({key}) % 10 < 6 "
         f"then {f(455000.0)} + {f(14000.0)} * {u2} "
         f"else {f(370000.0)} + {f(260000.0)} * {u2} end)")
    h = f"({f(200.0)} + {f(1800.0)} * {u3})"
    return {"x": x, "y": y, "h": h}


def wgs_points_sql(key: str) -> dict[str, str]:
    """ETRS89/WGS84 (φ, λ, h) from integer key; same skew rule."""
    u1, u2, u3 = mix01(key, MIX_A), mix01(key, MIX_B), mix01(key, 40503)
    fi = (f"(case when ({key}) % 10 < 6 "
          f"then {f(46.00)} + {f(0.11)} * {u1} "
          f"else {f(BBOX_FI_MIN)} + {f(1.75)} * {u1} end)")
    la = (f"(case when ({key}) % 10 < 6 "
          f"then {f(14.44)} + {f(0.14)} * {u2} "
          f"else {f(BBOX_LA_MIN)} + {f(3.5)} * {u2} end)")
    h = f"({f(200.0)} + {f(1800.0)} * {u3})"
    return {"fi": fi, "la": la, "h": h}


# ---------------------------------------------------------------------------
# Projection chains.  Each generator returns SQL producing the chain's
# output columns from a subquery exposing the input columns.  Layered
# nested SELECTs mirror the NumPy kernels expression-for-expression.
# ---------------------------------------------------------------------------

def _normalize_sql(x: str) -> str:
    return (f"(case when ({x}) > {f(1.0e6)} "
            f"then ({x}) - {f(5.0e6)} else ({x}) end)")


def _xy2geo_layers(proj: Projection, src: str, keep: str,
                   xcol: str = "x", ycol: str = "y") -> str:
    """Inverse TM on ``proj`` — mirrors geodesy.xy2geo.  Emits a
    subquery with columns ``keep…, fi_rad, la_rad`` (radians!)."""
    e = proj.ellipsoid
    return f"""
 SELECT {keep}, h, y,
        fi1 - (n1 * t / r1) * (
            d*d / 2.0e0
            - ({f(5.0)} + {f(3.0)}*t*t + {f(10.0)}*c1 - {f(4.0)}*c1*c1 - {f(9.0)}*{f(e.ep2)}) * ((d*d)*(d*d)) / {f(24.0)}
            + ({f(61.0)} + {f(90.0)}*t*t + {f(298.0)}*c1 + {f(45.0)}*((t*t)*(t*t))
               - {f(252.0)}*{f(e.ep2)} - {f(3.0)}*c1*c1) * (((d*d)*(d*d))*(d*d)) / {f(720.0)}
        ) AS fi_rad,
        {f(np.deg2rad(proj.lon0_deg))} + (
            d
            - ({f(1.0)} + {f(2.0)}*t*t + c1) * (d*d*d) / {f(6.0)}
            + ({f(5.0)} - {f(2.0)}*c1 + {f(28.0)}*t*t - {f(3.0)}*c1*c1
               + {f(8.0)}*{f(e.ep2)} + {f(24.0)}*((t*t)*(t*t))) * (((d*d)*(d*d))*d) / {f(120.0)}
        ) / cf AS la_rad
 FROM (
   SELECT {keep}, h, y, fi1, t, c1, n1,
          {f(e.a)} * ({f(1.0)} - {f(e.e2)}) / (w * sqrt(w)) AS r1,
          (y - {f(proj.false_easting)}) / (n1 * {f(proj.k0)}) AS d,
          cf
   FROM (
     SELECT {keep}, h, y, fi1,
            sin(fi1) AS sf, cos(fi1) AS cf, sin(fi1) / cos(fi1) AS t,
            {f(e.ep2)} * cos(fi1) * cos(fi1) AS c1,
            {f(1.0)} - {f(e.e2)} * sin(fi1) * sin(fi1) AS w,
            {f(e.a)} / sqrt({f(1.0)} - {f(e.e2)} * sin(fi1) * sin(fi1)) AS n1
     FROM (
       SELECT {keep}, h, y,
              mu + {f(e.fp2)}*sin({f(2.0)}*mu) + {f(e.fp4)}*sin({f(4.0)}*mu)
                 + {f(e.fp6)}*sin({f(6.0)}*mu) + {f(e.fp8)}*sin({f(8.0)}*mu) AS fi1
       FROM (
         SELECT {keep}, h, y,
                (({xcol}) - {f(proj.false_northing)}) / {f(proj.k0)} / ({f(e.a)} * {f(e.m0)}) AS mu
         FROM {src}
       ) q_mu
     ) q_fi1
   ) q_trig
 ) q_d
"""


def xy2geo_sql(proj: Projection, src: str, keep: str,
               normalize: bool = True) -> str:
    """φ,λ in DEGREES from (x,y) columns of ``src`` → subquery with
    ``keep…, fi, la, h``."""
    x_in = _normalize_sql("x") if normalize else "x"
    inner = _xy2geo_layers(proj, f"(SELECT {keep}, {x_in} AS x, y, h FROM {src}) q_n",
                           keep)
    return (f"(SELECT {keep}, fi_rad * {R2D} AS fi, la_rad * {R2D} AS la, h "
            f"FROM ({inner}) q_inv)")


def geo2xy_sql(proj: Projection, src: str, keep: str) -> str:
    """Forward TM — mirrors geodesy.geo2xy.  ``src`` exposes fi, la
    (degrees), h → subquery with ``keep…, x (reduced northing), y, h``."""
    e = proj.ellipsoid
    return f"""
(SELECT {keep}, h,
        {f(proj.k0)} * (m + n * t * (
            aa*aa / {f(2.0)}
            + ({f(5.0)} - t*t + {f(9.0)}*c + {f(4.0)}*c*c) * ((aa*aa)*(aa*aa)) / {f(24.0)}
            + ({f(61.0)} - {f(58.0)}*t*t + ((t*t)*(t*t)) + {f(600.0)}*c - {f(330.0)}*{f(e.ep2)})
              * (((aa*aa)*(aa*aa))*(aa*aa)) / {f(720.0)}
        )) + {f(proj.false_northing)} AS x,
        {f(proj.false_easting)} + {f(proj.k0)} * n * (
            aa
            + ({f(1.0)} - t*t + c) * (aa*aa*aa) / {f(6.0)}
            + ({f(5.0)} - {f(18.0)}*t*t + ((t*t)*(t*t)) + {f(72.0)}*c - {f(58.0)}*{f(e.ep2)})
              * (((aa*aa)*(aa*aa))*aa) / {f(120.0)}
        ) AS y
 FROM (
   SELECT {keep}, h,
          sin(fir) / cos(fir) AS t,
          {f(e.ep2)} * cos(fir) * cos(fir) AS c,
          dl * cos(fir) AS aa,
          {f(e.a)} / sqrt({f(1.0)} - {f(e.e2)} * sin(fir) * sin(fir)) AS n,
          {f(e.a)} * ({f(e.m0)} * fir - {f(e.m2)} * sin({f(2.0)} * fir)
                      + {f(e.m4)} * sin({f(4.0)} * fir) - {f(e.m6)} * sin({f(6.0)} * fir)) AS m
   FROM (
     SELECT {keep}, h,
            fi * {D2R} AS fir,
            (la - {f(proj.lon0_deg)}) * {D2R} AS dl
     FROM {src}
   ) q_rad
 ) q_fwd)
"""


def _fila2xyz_sql(ell, src: str, keep: str) -> str:
    """mirrors geodesy.fila2xyz; src exposes fi_rad, la_rad, h."""
    return f"""
(SELECT {keep},
        (n + h) * cos(fir) * cos(lar) AS ex,
        (n + h) * cos(fir) * sin(lar) AS ey,
        (n * ({f(1.0)} - {f(ell.e2)}) + h) * sin(fir) AS ez
 FROM (
   SELECT {keep}, h, fi_rad AS fir, la_rad AS lar,
          {f(ell.a)} / sqrt({f(1.0)} - {f(ell.e2)} * sin(fi_rad) * sin(fi_rad)) AS n
   FROM {src}
 ) q_n)
"""


def _helmert_sql(src: str, keep: str, inverse: bool = False) -> str:
    if not inverse:
        m = _HELMERT_M
        t = _HELMERT_T
        return f"""
(SELECT {keep},
        {f(m[0,0])}*ex + {f(m[0,1])}*ey + {f(m[0,2])}*ez + {f(t[0])} AS ex,
        {f(m[1,0])}*ex + {f(m[1,1])}*ey + {f(m[1,2])}*ez + {f(t[1])} AS ey,
        {f(m[2,0])}*ex + {f(m[2,1])}*ey + {f(m[2,2])}*ez + {f(t[2])} AS ez
 FROM {src})
"""
    m = _HELMERT_M_INV
    t = _HELMERT_T
    return f"""
(SELECT {keep},
        {f(m[0,0])}*dx + {f(m[0,1])}*dy + {f(m[0,2])}*dz AS ex,
        {f(m[1,0])}*dx + {f(m[1,1])}*dy + {f(m[1,2])}*dz AS ey,
        {f(m[2,0])}*dx + {f(m[2,1])}*dy + {f(m[2,2])}*dz AS ez
 FROM (SELECT {keep}, ex - {f(t[0])} AS dx, ey - {f(t[1])} AS dy,
              ez - {f(t[2])} AS dz FROM {src}) q_sub)
"""


def _xyz2fila_sql(ell, src: str, keep: str) -> str:
    """mirrors geodesy.xyz2fila: Bowring-seeded fixed XYZ2FILA_ITERS
    iterations, unrolled as nested subqueries."""
    q = f"""
(SELECT {keep}, ex, ey, ez,
        atan2(ey, ex) AS lar,
        sqrt(ex*ex + ey*ey) AS p,
        atan2(ez, sqrt(ex*ex + ey*ey) * ({f(1.0)} - {f(ell.e2)})) AS fir
 FROM {src})
"""
    for i in range(XYZ2FILA_ITERS):
        q = f"""
(SELECT {keep}, ex, ey, ez, lar, p,
        atan2(ez + {f(ell.e2)} * ({f(ell.a)} / sqrt({f(1.0)} - {f(ell.e2)} * sin(fir) * sin(fir))) * sin(fir), p) AS fir
 FROM {q} q_it{i})
"""
    return f"""
(SELECT {keep},
        fir * {R2D} AS fi,
        lar * {R2D} AS la,
        p / cos(fir) - ({f(ell.a)} / sqrt({f(1.0)} - {f(ell.e2)} * sin(fir) * sin(fir))) AS h
 FROM {q} q_fin)
"""


# --- public chain generators ----------------------------------------------

def t1_sql(src: str, keep: str) -> str:
    """t=1 tmxy2fila_wgs (D96/TM → WGS84)."""
    return xy2geo_sql(D96_TM, src, keep)


def t2_sql(src: str, keep: str) -> str:
    """t=2 fila_wgs2tmxy (WGS84 → D96/TM)."""
    return geo2xy_sql(D96_TM, src, keep)


def t3_sql(src: str, keep: str) -> str:
    """t=3 gkxy2fila_wgs — full flagship chain (inverse Bessel proj →
    ECEF → Helmert → geodetic on GRS80)."""
    inv = _xy2geo_layers(
        D48_GK,
        f"(SELECT {keep}, {_normalize_sql('x')} AS x, y, h FROM {src}) q_n",
        keep)
    ecef = _fila2xyz_sql(D48_GK.ellipsoid, f"({inv}) q_geo48", keep)
    helm = _helmert_sql(f"{ecef} q_ecef", keep, inverse=False)
    return _xyz2fila_sql(D96_TM.ellipsoid, f"{helm} q_helm", keep)


def t4_sql(src: str, keep: str) -> str:
    """t=4 fila_wgs2gkxy — exact inverse of t=3; src exposes fi, la, h."""
    rad = (f"(SELECT {keep}, h, fi * {D2R} AS fi_rad, la * {D2R} AS la_rad "
           f"FROM {src}) q_rad")
    ecef = _fila2xyz_sql(D96_TM.ellipsoid, rad, keep)
    helm = _helmert_sql(f"{ecef} q_ecef", keep, inverse=True)
    geo48 = _xyz2fila_sql(D48_GK.ellipsoid, f"{helm} q_helm", keep)
    return geo2xy_sql(D48_GK, f"{geo48} q_geo48", keep)


def t5_sql(src: str, keep: str) -> str:
    """t=5 gkxy2tmxy (Helmert path) = t2 ∘ t3."""
    return geo2xy_sql(D96_TM, f"({t3_sql(src, keep)}) q_t3", keep)


def t6_sql(src: str, keep: str) -> str:
    """t=6 tmxy2gkxy (Helmert path) = t4 ∘ t1."""
    return t4_sql(f"({t1_sql(src, keep)}) q_t1", keep)


# ---------------------------------------------------------------------------
# Geoid bilinear sampling — the synthetic grid's node values are a
# closed form of the node coordinates, so the oracle reproduces the
# EXACT bilinear result by evaluating that closed form at the 4
# surrounding nodes (mirrors geoid._synthetic_grid + geoid_height).
# ---------------------------------------------------------------------------

def _grid_node_sql(g, lat: str, lon: str) -> str:
    amp1, amp2, base = GRID_PARAMS[g.name]  # geoid.py is the source
    return (f"({f(base)} + {f(amp1)} * sin({f(3.0)} * (({lat}) - {f(BBOX_FI_MIN)}))"
            f" + {f(amp2)} * cos({f(2.5)} * (({lon}) - {f(BBOX_LA_MIN)}))"
            f" + {f(0.15)} * sin({f(7.0)} * (({lat}) - {f(BBOX_FI_MIN)}))"
            f" * cos({f(5.0)} * (({lon}) - {f(BBOX_LA_MIN)})))")


def geoid_sql(src: str, keep: str, model: str = "slo") -> str:
    """Undulation N(fi, la) — src exposes fi, la (degrees)."""
    g = GRIDS[model]
    # node lat/lon exactly as numpy builds them: lat = FI_MIN + span*i/(nrows-1)
    fi_span = BBOX_FI_MAX - BBOX_FI_MIN  # spans derived, not hardcoded
    la_span = BBOX_LA_MAX - BBOX_LA_MIN
    lat_node = lambda i: (f"({f(BBOX_FI_MIN)} + {f(fi_span)} * ({i}) / {f(float(g.nrows - 1))})")  # noqa: E731
    lon_node = lambda j: (f"({f(BBOX_LA_MIN)} + {f(la_span)} * ({j}) / {f(float(g.ncols - 1))})")  # noqa: E731
    return f"""
(SELECT {keep},
        (case when inside then
            {_grid_node_sql(g, lat_node('r0'), lon_node('c0'))} * ({f(1.0)} - tr) * ({f(1.0)} - tc)
          + {_grid_node_sql(g, lat_node('r0'), lon_node('c0 + 1'))} * ({f(1.0)} - tr) * tc
          + {_grid_node_sql(g, lat_node('r0 + 1'), lon_node('c0'))} * tr * ({f(1.0)} - tc)
          + {_grid_node_sql(g, lat_node('r0 + 1'), lon_node('c0 + 1'))} * tr * tc
         else {f(0.0)} end) AS geoid_n
 FROM (
   SELECT {keep},
          inside, r0, c0, rf_c - r0 AS tr, cf_c - c0 AS tc
   FROM (
     SELECT {keep}, inside, rf_c, cf_c,
            least(cast(floor(rf_c) as bigint), {g.nrows - 2}) AS r0,
            least(cast(floor(cf_c) as bigint), {g.ncols - 2}) AS c0
     FROM (
       SELECT {keep},
              (rf >= {f(0.0)} and cf >= {f(0.0)} and rf <= {f(float(g.nrows - 1))}
               and cf <= {f(float(g.ncols - 1))}) AS inside,
              least(greatest(rf, {f(0.0)}), {f(float(g.nrows - 1))}) AS rf_c,
              least(greatest(cf, {f(0.0)}), {f(float(g.ncols - 1))}) AS cf_c
       FROM (
         SELECT {keep},
                (fi - {f(g.lat0)}) / {f(g.dlat)} AS rf,
                (la - {f(g.lon0)}) / {f(g.dlon)} AS cf
         FROM {src}
       ) q_rc
     ) q_in
   ) q_fl
 ) q_t)
"""


# ---------------------------------------------------------------------------
# AFT triangle location on the regular 22×22 mesh: quad index + diagonal
# side test, closed form (mirrors aft table order: lower tri (p00,p10,p11)
# first = index 2*(i*21+j), upper (p00,p11,p01) = +1).
# ---------------------------------------------------------------------------

def _aft_grid_verts_sql() -> str:
    """(vid, sx, sy, dx, dy) — the synthetic AFT tie-point grid (r5,
    VERDICT r4 Next #1a): source vertices replicate ``np.linspace``
    bit-for-bit (i·step + start, endpoint pinned) from
    ``generate_series``; only the 484 destination vertices remain as
    literals (see inline note).  Replaces 882 triangles × 12 float
    literals (230 KB, the statements that pinned the driver's DuckDB
    pool in r4) with ~28 KB."""
    from ..aft import _GRID_N, _X_MAX, _X_MIN, _Y_MAX, _Y_MIN, _build_tables
    n = _GRID_N
    step_x = f((_X_MAX - _X_MIN) / (n - 1))
    step_y = f((_Y_MAX - _Y_MIN) / (n - 1))
    # np.linspace pins the endpoint exactly; mirror via the gi/gj guard
    grid = f"""
(SELECT vid,
        (case when gi = {n - 1} then {f(_X_MAX)} else sx end) AS sx,
        (case when gj = {n - 1} then {f(_Y_MAX)} else sy end) AS sy
 FROM (SELECT g.v AS vid,
              cast(floor(g.v / {n}.0e0) as bigint) AS gi,
              g.v % {n} AS gj,
              cast(cast(floor(g.v / {n}.0e0) as bigint) as double)
                * {step_x} + {f(_X_MIN)} AS sx,
              cast(g.v % {n} as double) * {step_y} + {f(_Y_MIN)} AS sy
       FROM generate_series(0, {n * n - 1}) AS g(v)) q_g)
"""
    # Destination vertices stay as literals: the t5 chain that builds
    # them agrees with DuckDB only to ~1e-14 (libm sin/cos ulps), so a
    # chain-generated dst would break the bit-exact t9/t10 parity.
    # 484 vertex pairs ≈ 27 KB — the 882-triangle table they expand to
    # in the Cramer layer would be ~9× that.
    _, dst, _ = _build_tables()
    rows = ", ".join(f"({i}, {f(dst[i, 0])}, {f(dst[i, 1])})"
                     for i in range(len(dst)))
    dst_tbl = f"(SELECT * FROM (VALUES {rows}) AS d(vid, dx, dy))"
    return (f"(SELECT g.vid AS vid, g.sx AS sx, g.sy AS sy, "
            f"d.dx AS dx, d.dy AS dy "
            f"FROM {grid} g JOIN {dst_tbl} d ON d.vid = g.vid)")


def _aft_values_literal_sql(direction: str) -> str:
    """Literal VALUES serialization of the in-memory directed AFT
    table — the fallback for REAL (irregular-mesh) tables, which the
    generate_series derivation below cannot express.  ~230 KB per
    statement; only reachable once ``aft.TABLES_SYNTHETIC`` is False
    (tools/reanchor.py flips it when swapping in aft_gktm.h/aft_tmgk.h)."""
    from ..aft import AFT_GK_TM, AFT_TM_GK
    t = AFT_GK_TM if direction == "gk_tm" else AFT_TM_GK
    rows = []
    for i in range(len(t.coef)):
        s = t.tri_src[i]
        c = t.coef[i]
        vals = ", ".join([f(s[0, 0]), f(s[0, 1]), f(s[1, 0]), f(s[1, 1]),
                          f(s[2, 0]), f(s[2, 1])]
                         + [f(v) for v in c])
        rows.append(f"({i}, {vals})")
    return ("(SELECT * FROM (VALUES " + ", ".join(rows) +
            ") AS t(tri_id, x1, y1, x2, y2, x3, y3, ca, cb, cc, cd, ce, cf))")


def aft_values_sql(direction: str = "gk_tm") -> str:
    """Directed AFT triangle table: (tri_id, x1,y1,x2,y2,x3,y3 source
    vertices, ca..cf affine coefficients) — the oracle's analogue of
    aft_gktm.h / aft_tmgk.h.  While the tables are the synthetic
    regular grid (``aft.TABLES_SYNTHETIC``), it is GENERATED in SQL:
    the regular 2·21·21 triangulation comes from ``generate_series``
    and the coefficients from the same closed-form Cramer solve as
    ``aft._affine_from_pairs`` (identical expression order → identical
    float64 bits).  Real irregular tables fall back to literal
    serialization."""
    from ..aft import _GRID_N, TABLES_SYNTHETIC
    if not TABLES_SYNTHETIC:
        return _aft_values_literal_sql(direction)
    n, nq = _GRID_N, _GRID_N - 1
    verts = _aft_grid_verts_sql()
    # quad (qi, qj) + parity → the three vertex ids, table order:
    # lower (p00,p10,p11) even, upper (p00,p11,p01) odd
    tri_idx = f"""
(SELECT tid AS tri_id,
        (qi * {n} + qj) AS va,
        (case when tid % 2 = 0 then (qi + 1) * {n} + qj
              else (qi + 1) * {n} + qj + 1 end) AS vb,
        (case when tid % 2 = 0 then (qi + 1) * {n} + qj + 1
              else qi * {n} + qj + 1 end) AS vc
 FROM (SELECT t.t AS tid,
              cast(floor(t.t / {2 * nq}.0e0) as bigint) AS qi,
              cast(floor(t.t / 2.0e0) as bigint) % {nq} AS qj
       FROM generate_series(0, {2 * nq * nq - 1}) AS t(t)) q_q)
"""
    if direction == "gk_tm":
        pick = ("a.sx AS x1, a.sy AS y1, b.sx AS x2, b.sy AS y2, "
                "c.sx AS x3, c.sy AS y3, a.dx AS u1, a.dy AS v1, "
                "b.dx AS u2, b.dy AS v2, c.dx AS u3, c.dy AS v3")
    else:  # tm_gk: AftTable(dst, src, tris) — directions swapped
        pick = ("a.dx AS x1, a.dy AS y1, b.dx AS x2, b.dy AS y2, "
                "c.dx AS x3, c.dy AS y3, a.sx AS u1, a.sy AS v1, "
                "b.sx AS u2, b.sy AS v2, c.sx AS u3, c.sy AS v3")
    # subquery-local CTE so the (literal-bearing) vertex table appears
    # ONCE, not 3× for the triple self-join
    tri_v = f"""
(WITH __aft_verts AS (SELECT * FROM {verts} q_v)
 SELECT tr.tri_id AS tri_id, {pick}
 FROM {tri_idx} tr
 JOIN __aft_verts a ON a.vid = tr.va
 JOIN __aft_verts b ON b.vid = tr.vb
 JOIN __aft_verts c ON c.vid = tr.vc)
"""
    # Cramer, expression-for-expression as aft._affine_from_pairs
    return f"""
(SELECT tri_id, x1, y1, x2, y2, x3, y3,
        ca, cb, u1 - ca * x1 - cb * y1 AS cc,
        cd, ce, v1 - cd * x1 - ce * y1 AS cf
 FROM (
   SELECT tri_id, x1, y1, x2, y2, x3, y3, u1, v1,
          ((u2 - u1) * (y3 - y1) - (u3 - u1) * (y2 - y1)) / det AS ca,
          ((x2 - x1) * (u3 - u1) - (x3 - x1) * (u2 - u1)) / det AS cb,
          ((v2 - v1) * (y3 - y1) - (v3 - v1) * (y2 - y1)) / det AS cd,
          ((x2 - x1) * (v3 - v1) - (x3 - x1) * (v2 - v1)) / det AS ce
   FROM (SELECT *, (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1) AS det
         FROM {tri_v} q_tv) q_det) q_coef)
"""


def aft_scan_locate_sql(src: str, keep: str, direction: str = "gk_tm") -> str:
    """Generic first-match triangle location + affine apply by full
    candidate scan — mirrors AftTable.locate/transform arithmetic
    (same barycentric formulas, same EPS, min tri_id = table order).
    Output: keep…, tri_id, ox, oy.  Use on SAMPLED inputs only (the
    scan is |src|×882)."""
    from ..aft import EPS_BARY
    eps = f(EPS_BARY)
    return f"""
(SELECT {keep}, tri_id, ca * x + cb * y + cc AS ox, cd * x + ce * y + cf AS oy
 FROM (
   SELECT {keep}, x, y, tri_id, ca, cb, cc, cd, ce, cf,
          row_number() OVER (PARTITION BY {keep} ORDER BY tri_id ASC) AS rn
   FROM (
     SELECT {keep}, p.x AS x, p.y AS y, t.tri_id AS tri_id,
            t.ca AS ca, t.cb AS cb, t.cc AS cc,
            t.cd AS cd, t.ce AS ce, t.cf AS cf
     FROM {src} p CROSS JOIN {aft_values_sql(direction)} t
     WHERE ((p.x - t.x1) * (t.y3 - t.y1) - (p.y - t.y1) * (t.x3 - t.x1))
           / ((t.x2 - t.x1) * (t.y3 - t.y1) - (t.y2 - t.y1) * (t.x3 - t.x1))
           >= -{eps}
       AND ((p.y - t.y1) * (t.x2 - t.x1) - (p.x - t.x1) * (t.y2 - t.y1))
           / ((t.x2 - t.x1) * (t.y3 - t.y1) - (t.y2 - t.y1) * (t.x3 - t.x1))
           >= -{eps}
       AND ((p.x - t.x1) * (t.y3 - t.y1) - (p.y - t.y1) * (t.x3 - t.x1))
           / ((t.x2 - t.x1) * (t.y3 - t.y1) - (t.y2 - t.y1) * (t.x3 - t.x1))
           + ((p.y - t.y1) * (t.x2 - t.x1) - (p.x - t.x1) * (t.y2 - t.y1))
           / ((t.x2 - t.x1) * (t.y3 - t.y1) - (t.y2 - t.y1) * (t.x3 - t.x1))
           <= {f(1.0)} + {eps}
   ) q_cand
 ) q_rn WHERE rn = 1)
"""


def aft_locate_sql(src: str, keep: str) -> str:
    from ..aft import _GRID_N, _X_MAX, _X_MIN, _Y_MAX, _Y_MIN
    nq = _GRID_N - 1
    dx = (_X_MAX - _X_MIN) / nq
    dy = (_Y_MAX - _Y_MIN) / nq
    return f"""
(SELECT {keep},
        (case when cross_d <= {f(0.0)}
              then cast(2 * (qi * {nq} + qj) as bigint)
              else cast(2 * (qi * {nq} + qj) + 1 as bigint) end) AS tri_id
 FROM (
   SELECT {keep}, qi, qj,
          ({f(dx)}) * (y - ({f(_Y_MIN)} + qj * {f(dy)}))
          - ({f(dy)}) * (x - ({f(_X_MIN)} + qi * {f(dx)})) AS cross_d
   FROM (
     SELECT {keep}, x, y,
            least({nq - 1}, greatest(0, cast(floor((x - {f(_X_MIN)}) / {f(dx)}) as bigint))) AS qi,
            least({nq - 1}, greatest(0, cast(floor((y - {f(_Y_MIN)}) / {f(dy)}) as bigint))) AS qj
     FROM {src}
   ) q_q
 ) q_c)
"""
