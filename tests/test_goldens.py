"""Self-golden regression guard (SURVEY.md §6.1/F8).

The reference's `gk-slo -x` golden constants are unavailable
(/root/reference is an empty mount — SURVEY.md §0), so these vectors
freeze the CURRENT kernels' outputs for fixed inputs: any accidental
numeric drift in a future edit fails here loudly.  When the reference
materializes, replace golden_frozen.py with the extracted `-x`
constants and tighten to the mm tolerances of FIXTURES.md §2.
"""

import numpy as np

from geocoordinateconverter_spark import aft
from geocoordinateconverter_spark import geodesy as g
from geocoordinateconverter_spark import geoid
from geocoordinateconverter_spark.goldens import (EXPECTED, GEOID_SLO_N,
                                                  GK_IN, WGS_IN)

CHAINS = {3: (g.gk_to_wgs84, "GK"), 5: (g.gk_to_tm, "GK"),
          9: (aft.gk_to_tm_aft, "GK"),
          2: (g.wgs84_to_tm, "WGS"), 4: (g.wgs84_to_gk, "WGS")}


def test_frozen_chain_outputs():
    for t, (fn, kind) in CHAINS.items():
        pts = GK_IN if kind == "GK" else WGS_IN
        a, b, c = fn(pts[:, 0], pts[:, 1], pts[:, 2])
        got = np.stack([a, b, c], axis=1)
        np.testing.assert_array_equal(got, EXPECTED[t], err_msg=f"chain t={t}")


def test_frozen_geoid():
    n = geoid.geoid_height(WGS_IN[:, 0], WGS_IN[:, 1], "slo")
    np.testing.assert_array_equal(n, GEOID_SLO_N)
