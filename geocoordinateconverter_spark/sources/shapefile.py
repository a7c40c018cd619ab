"""Minimal ESRI Shapefile reader/writer (S5/S6 — gk-shp.c + vendored
shapelib, SURVEY.md §3.1), reimplemented from scratch against the
PUBLIC ESRI Shapefile Technical Description (July 1998 whitepaper).
No shapelib code is used or needed: the format is ~200 lines of
big/little-endian struct packing.

Scope mirrors what gk-shp actually converts: shape types 1 (Point),
3 (PolyLine), 5 (Polygon), plus a minimal DBF with numeric/character
fields passed through untouched (gk-shp's attribute passthrough).

Scale posture: shapefiles are the reference's EXCHANGE format for the
small dimension side (municipality polygons, station lists) — never
the 10¹²-row fact side, which lives in parquet/Iceberg.  Accordingly
read/write assemble on the driver (a .shp is a single sequential file;
there is nothing to parallelize) and hand the vertex table to Spark as
a broadcastable DataFrame; the per-vertex CONVERSION still runs
through the same vectorized chain kernels as everything else.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_POINTZ = 11
SHP_POLYLINEZ = 13
SHP_POLYGONZ = 15

Z_TYPES = {SHP_POINTZ, SHP_POLYLINEZ, SHP_POLYGONZ}
# ESRI spec: an M value < -1e38 means "no data"; this is the
# conventional sentinel writers emit for absent measures
M_NODATA = -1e40


def _is_z(shape_type: int) -> bool:
    return shape_type in Z_TYPES


# ---------------------------------------------------------------------------
# .shp / .shx
# ---------------------------------------------------------------------------

def _shp_header(shape_type: int, file_words: int, bbox, zmr) -> bytes:
    return (struct.pack(">7i", 9994, 0, 0, 0, 0, 0, file_words)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", *zmr))


def _rng(a: np.ndarray) -> tuple[float, float]:
    return (float(a.min()), float(a.max())) if a.size else (0.0, 0.0)


def write_shp(path_base: str, shapes: list[list[np.ndarray]],
              shape_type: int) -> None:
    """``shapes``: one entry per record; each a list of parts, each part
    an (n, 2) float64 array of (x, y) — or (n, 4) of (x, y, z, m) for
    the Z shape types (11/13/15).  Point records use one 1-vertex part;
    an EMPTY parts list writes a null shape (type 0) record, which the
    spec allows inside any shape-type file.  Writes ``<base>.shp`` and
    ``<base>.shx``."""
    width = 4 if _is_z(shape_type) else 2
    allv = (np.concatenate([p for s in shapes for p in s])
            if any(s for s in shapes) else np.zeros((0, width)))
    bbox = ((float(allv[:, 0].min()), float(allv[:, 1].min()),
             float(allv[:, 0].max()), float(allv[:, 1].max()))
            if allv.size else (0.0, 0.0, 0.0, 0.0))
    zmr = ((*_rng(allv[:, 2]), *_rng(allv[:, 3])) if width == 4
           else (0.0, 0.0, 0.0, 0.0))
    records, index = [], []
    offset_words = 50  # header = 100 bytes
    for i, parts in enumerate(shapes):
        if not parts:
            content = struct.pack("<i", SHP_NULL)
        elif shape_type == SHP_POINT:
            x, y = float(parts[0][0, 0]), float(parts[0][0, 1])
            content = struct.pack("<i2d", SHP_POINT, x, y)
        elif shape_type == SHP_POINTZ:
            x, y, z, m = (float(v) for v in parts[0][0, :4])
            content = struct.pack("<i4d", SHP_POINTZ, x, y, z, m)
        else:
            pts = np.concatenate(parts)
            starts, n = [], 0
            for p in parts:
                starts.append(n)
                n += len(p)
            content = struct.pack(
                "<i4dii", shape_type,
                float(pts[:, 0].min()), float(pts[:, 1].min()),
                float(pts[:, 0].max()), float(pts[:, 1].max()),
                len(parts), len(pts))
            content += struct.pack(f"<{len(parts)}i", *starts)
            content += pts[:, :2].astype("<f8").tobytes()
            if width == 4:
                # spec: Zmin,Zmax + Z array, then Mmin,Mmax + M array
                content += struct.pack("<2d", *_rng(pts[:, 2]))
                content += pts[:, 2].astype("<f8").tobytes()
                content += struct.pack("<2d", *_rng(pts[:, 3]))
                content += pts[:, 3].astype("<f8").tobytes()
        words = len(content) // 2
        records.append(struct.pack(">ii", i + 1, words) + content)
        index.append(struct.pack(">ii", offset_words, words))
        offset_words += 4 + words
    body = b"".join(records)
    with open(path_base + ".shp", "wb") as f:
        f.write(_shp_header(shape_type, (100 + len(body)) // 2, bbox, zmr))
        f.write(body)
    with open(path_base + ".shx", "wb") as f:
        f.write(_shp_header(shape_type, (100 + 8 * len(index)) // 2,
                            bbox, zmr))
        f.write(b"".join(index))


def read_shp(path_base: str) -> tuple[int, list[list[np.ndarray]]]:
    """Returns (shape_type, shapes) in :func:`write_shp`'s structure
    (Z-type records come back as (n, 4) parts; null records as [])."""
    with open(path_base + ".shp", "rb") as f:
        raw = f.read()
    file_words = struct.unpack(">i", raw[24:28])[0]
    shape_type = struct.unpack("<i", raw[32:36])[0]
    shapes: list[list[np.ndarray]] = []
    pos, end = 100, 2 * file_words
    while pos < end:
        _, words = struct.unpack(">ii", raw[pos:pos + 8])
        c = raw[pos + 8:pos + 8 + 2 * words]
        rec_type = struct.unpack("<i", c[:4])[0]
        if rec_type == SHP_NULL:
            shapes.append([])
        elif rec_type == SHP_POINT:
            x, y = struct.unpack("<2d", c[4:20])
            shapes.append([np.array([[x, y]], dtype=np.float64)])
        elif rec_type == SHP_POINTZ:
            x, y, z, m = struct.unpack("<4d", c[4:36])
            shapes.append([np.array([[x, y, z, m]], dtype=np.float64)])
        elif rec_type in (SHP_POLYLINE, SHP_POLYGON,
                          SHP_POLYLINEZ, SHP_POLYGONZ):
            n_parts, n_pts = struct.unpack("<ii", c[36:44])
            starts = list(struct.unpack(f"<{n_parts}i", c[44:44 + 4 * n_parts]))
            off = 44 + 4 * n_parts
            pts = np.frombuffer(c[off:off + 16 * n_pts],
                                dtype="<f8").reshape(n_pts, 2)
            if rec_type in (SHP_POLYLINEZ, SHP_POLYGONZ):
                zo = off + 16 * n_pts + 16  # skip Zmin,Zmax
                zs = np.frombuffer(c[zo:zo + 8 * n_pts], dtype="<f8")
                mo = zo + 8 * n_pts + 16    # skip Mmin,Mmax
                ms = np.frombuffer(c[mo:mo + 8 * n_pts], dtype="<f8")
                pts = np.column_stack([pts, zs, ms])
            bounds = starts + [n_pts]
            shapes.append([pts[bounds[j]:bounds[j + 1]].copy()
                           for j in range(n_parts)])
        else:  # unsupported type: empty record
            shapes.append([])
        pos += 8 + 2 * words
    return shape_type, shapes


# ---------------------------------------------------------------------------
# .dbf (attribute passthrough — numeric 'N' and character 'C' fields)
# ---------------------------------------------------------------------------

def write_dbf(path: str, fields: list[tuple[str, str, int]],
              rows: list[tuple]) -> None:
    """``fields``: (name≤10, type 'N'|'C', width)."""
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(w for _, _, w in fields)
    head = struct.pack("<B3BIHH20x", 0x03, 99, 1, 1, len(rows),
                       hdr_size, rec_size)
    descs = b"".join(
        struct.pack("<11sc4xBB14x", name.encode()[:10], typ.encode(), w, 0)
        for name, typ, w in fields)
    body = bytearray()
    for row in rows:
        body += b" "
        for (name, typ, w), v in zip(fields, row):
            # DBF records are fixed-width in BYTES: encode first, then
            # pad/validate at the byte level — char-level padding shifts
            # every later field when a 'C' value is non-ASCII, and
            # silently truncating an over-width 'N' corrupts the value.
            bv = str(v).encode()
            if len(bv) > w:
                raise ValueError(
                    f"DBF field {name!r}: value {v!r} is {len(bv)} bytes, "
                    f"exceeds declared width {w}")
            body += bv.rjust(w, b" ") if typ == "N" else bv.ljust(w, b" ")
    with open(path, "wb") as f:
        f.write(head + descs + b"\x0d" + bytes(body) + b"\x1a")


def read_dbf(path: str) -> tuple[list[tuple[str, str, int]], list[tuple]]:
    with open(path, "rb") as f:
        raw = f.read()
    n_rec, hdr_size, rec_size = struct.unpack("<IHH", raw[4:12])
    fields = []
    pos = 32
    while raw[pos] != 0x0D:
        name = raw[pos:pos + 11].split(b"\x00")[0].decode()
        typ = chr(raw[pos + 11])
        width = raw[pos + 16]
        fields.append((name, typ, width))
        pos += 32
    rows = []
    for i in range(n_rec):
        r = raw[hdr_size + i * rec_size: hdr_size + (i + 1) * rec_size]
        vals, off = [], 1
        for name, typ, w in fields:
            s = r[off:off + w].decode().strip()
            vals.append(int(s) if typ == "N" and s else s)
            off += w
        rows.append(tuple(vals))
    return fields, rows


# ---------------------------------------------------------------------------
# Spark bridges
# ---------------------------------------------------------------------------

VERTEX_SCHEMA = "geom_id bigint, part int, vid int, x double, y double"
VERTEX_SCHEMA_ZM = VERTEX_SCHEMA + ", z double, m double"


def shapefile_to_df(spark: SparkSession, path_base: str) -> DataFrame:
    """SHP + DBF → vertex DataFrame (geom_id from the DBF's first
    numeric field, else the record index).  Z-type files populate the
    ``z``/``m`` columns; 2-D files leave them NULL.  Null-shape records
    contribute no vertex rows (their geom_id simply has none)."""
    _, shapes = read_shp(path_base)
    try:
        _, attrs = read_dbf(path_base + ".dbf")
        ids = [int(a[0]) for a in attrs]
    except FileNotFoundError:
        ids = list(range(len(shapes)))
    rows = []
    for sid, parts in zip(ids, shapes):
        vid = 0
        for pi, p in enumerate(parts):
            for v in p:
                z, m = (float(v[2]), float(v[3])) if len(v) >= 4 \
                    else (None, None)
                rows.append((sid, pi, vid, float(v[0]), float(v[1]), z, m))
                vid += 1
    return spark.createDataFrame(rows, VERTEX_SCHEMA_ZM)


def df_to_shapefile(df: DataFrame, path_base: str,
                    shape_type: int = SHP_POLYGON,
                    attrs: DataFrame | None = None) -> None:
    """Vertex DataFrame (VERTEX_SCHEMA[_ZM], converted or not) → SHP +
    DBF.  Collects — by design: see module docstring (dim-side exchange
    format; a .shp is one sequential file).  For Z shape types the
    ``z`` and ``m`` columns are written per vertex (NULL m →
    :data:`M_NODATA`); multi-part records (hole rings, multi-segment
    lines) keep part and within-part vertex order exactly.

    ``attrs``: optional per-geometry attribute DataFrame (gk-shp's DBF
    attribute copy) with a ``geom_id`` column plus any number of
    integer ('N') / string ('C') columns; rows are aligned to the .shp
    record order and written as extra DBF fields."""
    pdf = df.toPandas().sort_values(["geom_id", "part", "vid"])
    if _is_z(shape_type):
        if "z" not in pdf.columns:
            raise ValueError(f"shape type {shape_type} needs a z column")
        if "m" not in pdf.columns:
            pdf["m"] = M_NODATA
        pdf["m"] = pdf["m"].fillna(M_NODATA)
        cols = ["x", "y", "z", "m"]
    else:
        cols = ["x", "y"]
    shapes, ids = [], []
    for gid, g in pdf.groupby("geom_id", sort=True):
        parts = [p[cols].to_numpy(np.float64)
                 for _, p in g.groupby("part", sort=True)]
        shapes.append(parts)
        ids.append(int(gid))
    write_shp(path_base, shapes, shape_type)
    if attrs is None:
        write_dbf(path_base + ".dbf", [("GEOM_ID", "N", 18)],
                  [(i,) for i in ids])
        return
    apdf = (attrs.toPandas().set_index("geom_id").reindex(ids)
            .reset_index())
    fields: list[tuple[str, str, int]] = []
    for col in apdf.columns:
        vals = apdf[col]
        if pd.api.types.is_integer_dtype(vals):
            fields.append((col.upper()[:10], "N", 18))
        elif vals.dtype == object or pd.api.types.is_string_dtype(vals):
            w = max((len(str(v).encode()) for v in vals), default=1)
            fields.append((col.upper()[:10], "C", max(w, 1)))
        else:
            raise ValueError(
                f"DBF attribute {col!r}: only integer (N) and string (C) "
                f"fields are supported, got dtype {vals.dtype}")
    write_dbf(path_base + ".dbf", fields,
              [tuple(r) for r in apdf.itertuples(index=False)])


def dbf_to_df(spark: SparkSession, path_base: str) -> DataFrame:
    """DBF attribute table → DataFrame (N → bigint, C → string; field
    names lowercased) — the read side of the attribute passthrough."""
    fields, rows = read_dbf(path_base + ".dbf")
    schema = ", ".join(f"{n.lower()} {'bigint' if t == 'N' else 'string'}"
                       for n, t, _ in fields)
    return spark.createDataFrame(rows, schema)
