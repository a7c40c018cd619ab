"""Numeric-core tests (SURVEY.md §6.2 items 1–2): round-trip
properties over the Slovenian working bbox, chain composition
identities, and determinism.  Golden vectors vs ``gk-slo -x`` activate
once /root/reference is populated (SURVEY.md §0) — the tolerances here
(≤1 mm round-trip) are the FIXTURES.md §3 invariants.
"""

from __future__ import annotations

import numpy as np
import pytest

from geocoordinateconverter_spark import geodesy as g
from geocoordinateconverter_spark.constants import (
    BBOX_FI_MAX, BBOX_FI_MIN, BBOX_LA_MAX, BBOX_LA_MIN,
)

N = 20000
MM_DEG = 2e-8   # ~2 mm in degrees
MM = 1e-3


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(42)
    fi = rng.uniform(BBOX_FI_MIN, BBOX_FI_MAX, N)
    la = rng.uniform(BBOX_LA_MIN, BBOX_LA_MAX, N)
    h = rng.uniform(0.0, 2500.0, N)
    return fi, la, h


def test_t2_t1_roundtrip(pts):
    fi, la, h = pts
    x, y, hh = g.wgs84_to_tm(fi, la, h)
    fi2, la2, h2 = g.tm_to_wgs84(x, y, hh)
    assert np.abs(fi2 - fi).max() < MM_DEG
    assert np.abs(la2 - la).max() < MM_DEG
    np.testing.assert_array_equal(h2, h)  # t1/t2 copy height


def test_t4_t3_roundtrip(pts):
    fi, la, h = pts
    x, y, hh = g.wgs84_to_gk(fi, la, h)
    fi2, la2, h2 = g.gk_to_wgs84(x, y, hh)
    assert np.abs(fi2 - fi).max() < MM_DEG
    assert np.abs(la2 - la).max() < MM_DEG
    assert np.abs(h2 - h).max() < MM  # Helmert height round-trips


def test_t5_t6_roundtrip(pts):
    fi, la, h = pts
    x, y, hh = g.wgs84_to_gk(fi, la, h)
    tx, ty, th = g.gk_to_tm(x, y, hh)
    x2, y2, _ = g.tm_to_gk(tx, ty, th)
    assert np.abs(x2 - x).max() < MM
    assert np.abs(y2 - y).max() < MM


def test_projection_plausibility(pts):
    """Slovenian reduced coordinates land in the national ranges
    (FIXTURES.md header) and the D48↔D96 datum shift is the documented
    few-hundred-metre magnitude."""
    fi, la, h = pts
    x, y, _ = g.wgs84_to_tm(fi, la, h)
    assert 0 < x.min() and x.max() < 250000
    assert 350000 < y.min() and y.max() < 650000
    gx, gy, _ = g.wgs84_to_gk(fi, la, h)
    shift = np.hypot(gx - x, gy - y)
    assert 300 < shift.mean() < 700


def test_ecef_roundtrip(pts):
    fi, la, h = pts
    x, y, z = g.fila2xyz(fi, la, h, g.D96_TM.ellipsoid)
    fi2, la2, h2 = g.xyz2fila(x, y, z, g.D96_TM.ellipsoid)
    assert np.abs(fi2 - fi).max() < 1e-11
    assert np.abs(h2 - h).max() < 1e-6


def test_helmert_exact_inverse(pts):
    fi, la, h = pts
    x, y, z = g.fila2xyz(fi, la, h, g.D48_GK.ellipsoid)
    a, b, c = g.helmert_d48_to_etrs89(x, y, z)
    x2, y2, z2 = g.helmert_etrs89_to_d48(a, b, c)
    assert np.abs(x2 - x).max() < 1e-6  # exact matrix inverse → μm closure
    assert np.abs(y2 - y).max() < 1e-6
    assert np.abs(z2 - z).max() < 1e-6


def test_normalize_northing():
    x = np.array([87234.1, 5087234.1, 999999.9, 1000000.1])
    out = g.normalize_northing(x)
    np.testing.assert_allclose(out, [87234.1, 87234.1, 999999.9, -3999999.9])


def test_determinism(pts):
    """Same input → bit-identical output (fixed iteration counts, no
    environment dependence) — SURVEY.md §6.2 item 5."""
    fi, la, h = pts
    a1 = g.wgs84_to_gk(fi, la, h)
    a2 = g.wgs84_to_gk(fi.copy(), la.copy(), h.copy())
    for u, v in zip(a1, a2):
        np.testing.assert_array_equal(u, v)
    # order independence: shuffled batch gives identical per-row values
    perm = np.random.default_rng(0).permutation(N)
    b = g.wgs84_to_gk(fi[perm], la[perm], h[perm])
    np.testing.assert_array_equal(b[0], a1[0][perm])


def test_bbox_corners_and_extremes():
    """Kernels stay finite and accurate at working-area corners,
    negative heights, and the absolute-northing form."""
    fi = np.array([BBOX_FI_MIN, BBOX_FI_MIN, BBOX_FI_MAX, BBOX_FI_MAX, 46.0])
    la = np.array([BBOX_LA_MIN, BBOX_LA_MAX, BBOX_LA_MIN, BBOX_LA_MAX, 15.0])
    h = np.array([-100.0, 0.0, 4000.0, -50.0, 0.0])
    for chain in (g.wgs84_to_tm, g.wgs84_to_gk):
        a, b, c = chain(fi, la, h)
        assert np.isfinite(a).all() and np.isfinite(b).all() and np.isfinite(c).all()
    x, y, hh = g.wgs84_to_gk(fi, la, h)
    # absolute-northing inputs round-trip identically to reduced ones
    f1, l1, h1 = g.gk_to_wgs84(x, y, hh)
    f2, l2, h2 = g.gk_to_wgs84(x + 5.0e6, y, hh)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(l1, l2)
    assert np.abs(f1 - fi).max() < MM_DEG
    assert np.abs(h1 - h).max() < MM
