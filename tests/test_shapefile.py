"""Shapefile I/O (S5/S6): binary .shp/.shx/.dbf roundtrips and the
Spark vertex-bridge — reimplementation of the gk-shp lifecycle
(SURVEY.md §4.2) against the public ESRI spec."""

from __future__ import annotations

import numpy as np
import pytest

from geocoordinateconverter_spark.sources import shapefile as shp


def test_polygon_roundtrip_bitexact(tmp_path):
    rng = np.random.default_rng(42)
    shapes = [[rng.uniform(3e5, 6e5, size=(7, 2))],
              # multi-part: outer ring + hole
              [rng.uniform(3e5, 6e5, size=(5, 2)),
               rng.uniform(3e5, 6e5, size=(4, 2))]]
    base = str(tmp_path / "poly")
    shp.write_shp(base, shapes, shp.SHP_POLYGON)
    st, got = shp.read_shp(base)
    assert st == shp.SHP_POLYGON
    assert len(got) == 2 and [len(p) for p in got[1]] == [5, 4]
    for a, b in zip(shapes, got):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)  # float64 bit-exact


def test_point_and_polyline_roundtrip(tmp_path):
    pts = [[np.array([[1.5, 2.5]])], [np.array([[3.25, -4.75]])]]
    base = str(tmp_path / "pts")
    shp.write_shp(base, pts, shp.SHP_POINT)
    st, got = shp.read_shp(base)
    assert st == shp.SHP_POINT
    np.testing.assert_array_equal(got[1][0], pts[1][0])

    lines = [[np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])]]
    base2 = str(tmp_path / "lines")
    shp.write_shp(base2, lines, shp.SHP_POLYLINE)
    st2, got2 = shp.read_shp(base2)
    assert st2 == shp.SHP_POLYLINE
    np.testing.assert_array_equal(got2[0][0], lines[0][0])


def test_dbf_roundtrip(tmp_path):
    path = str(tmp_path / "attrs.dbf")
    fields = [("GEOM_ID", "N", 18), ("NAME", "C", 12)]
    rows = [(7, "ljubljana"), (42, "maribor")]
    shp.write_dbf(path, fields, rows)
    got_fields, got_rows = shp.read_dbf(path)
    assert [(n, t, w) for n, t, w in got_fields] == fields
    assert got_rows == rows


def test_shx_index_consistent(tmp_path):
    """every .shx entry must point at the matching .shp record."""
    import struct
    shapes = [[np.array([[float(i), float(i * 2)]])] for i in range(5)]
    base = str(tmp_path / "idx")
    shp.write_shp(base, shapes, shp.SHP_POINT)
    raw_shp = open(base + ".shp", "rb").read()
    raw_shx = open(base + ".shx", "rb").read()
    for i in range(5):
        off, words = struct.unpack(">ii", raw_shx[100 + 8 * i:108 + 8 * i])
        rec_num, rec_words = struct.unpack(
            ">ii", raw_shp[2 * off:2 * off + 8])
        assert rec_num == i + 1 and rec_words == words


@pytest.mark.usefixtures("spark")
def test_spark_bridge_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F
    rows = [(10, 0, v, 400000.0 + v, 90000.0 + 2.0 * v) for v in range(5)] \
        + [(11, 0, v, 500000.0 + v * 0.125, 95000.0 + v) for v in range(4)]
    df = spark.createDataFrame(rows, shp.VERTEX_SCHEMA)
    base = str(tmp_path / "bridge")
    shp.df_to_shapefile(df, base, shp.SHP_POLYGON)
    back = shp.shapefile_to_df(spark, base)
    a = df.orderBy("geom_id", "vid").collect()
    b = back.orderBy("geom_id", "vid").collect()
    assert [(r.geom_id, r.vid, r.x, r.y) for r in a] \
        == [(r.geom_id, r.vid, r.x, r.y) for r in b]
    # attribute passthrough: DBF carries the geom ids
    _, attrs = shp.read_dbf(base + ".dbf")
    assert [r[0] for r in attrs] == [10, 11]
    # converted write-out also roundtrips (gk-shp's output side)
    from geocoordinateconverter_spark import kernels
    conv = (df.withColumn("o", kernels.transform_udf(5)(
        F.col("x"), F.col("y"), F.lit(0.0)))
        .select("geom_id", "part", "vid",
                F.col("o.x").alias("x"), F.col("o.y").alias("y")))
    base2 = str(tmp_path / "bridge_conv")
    shp.df_to_shapefile(conv, base2, shp.SHP_POLYGON)
    back2 = shp.shapefile_to_df(spark, base2)
    assert back2.count() == 9


def test_multipatch_roundtrip_with_part_types(tmp_path):
    """MultiPatch (type 31) record layout: parts starts, then the
    partTypes int array, then XY + Z block + M block.  Part types and
    all four vertex components must roundtrip bit-exactly."""
    import numpy as np
    shapes = [
        [np.array([[1.0, 2.0, 10.0, 0.5], [3.0, 4.0, 11.0, 1.5],
                   [5.0, 6.0, 12.0, 2.5], [7.0, 8.0, 13.0, 3.5]]),
         np.array([[0.0, 0.0, 1.0, shp.M_NODATA], [1.0, 0.0, 1.0, 7.0],
                   [0.5, 1.0, 1.0, 8.0]])],
        [np.array([[9.0, 9.0, 2.0, -1e38]])],  # legal boundary measure
    ]
    ptypes = [[shp.MP_TRIANGLE_STRIP, shp.MP_INNER_RING], [shp.MP_RING]]
    base = str(tmp_path / "patch")
    shp.write_shp(base, shapes, shp.SHP_MULTIPATCH, part_types=ptypes)
    stype, back, bp = shp.read_shp_ex(base)
    assert stype == shp.SHP_MULTIPATCH
    assert bp == ptypes
    for a, b in zip(shapes, back):
        assert len(a) == len(b)
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)
    # header M range must include the exact -1e38 boundary measure but
    # exclude the M_NODATA sentinel
    import struct as _st
    raw = open(base + ".shp", "rb").read()
    mmin, mmax = _st.unpack("<2d", raw[84:100])
    assert mmin == -1e38 and mmax == 8.0
    # part-type count mismatch must be rejected
    import pytest as _pt
    with _pt.raises(ValueError, match="part types"):
        shp.write_shp(base, shapes, shp.SHP_MULTIPATCH,
                      part_types=[[5], [5]])
