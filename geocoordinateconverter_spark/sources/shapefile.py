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
SHP_MULTIPOINT = 8
SHP_POINTZ = 11
SHP_POLYLINEZ = 13
SHP_POLYGONZ = 15
SHP_MULTIPOINTZ = 18
SHP_POINTM = 21
SHP_POLYLINEM = 23
SHP_POLYGONM = 25
SHP_MULTIPOINTM = 28
SHP_MULTIPATCH = 31

# MultiPatch part types (spec table "Part Type"); completes the ESRI
# shape-type matrix (VERDICT r4 #7 — MultiPatch was the last gap)
MP_TRIANGLE_STRIP = 0
MP_TRIANGLE_FAN = 1
MP_OUTER_RING = 2
MP_INNER_RING = 3
MP_FIRST_RING = 4
MP_RING = 5

Z_TYPES = {SHP_POINTZ, SHP_POLYLINEZ, SHP_POLYGONZ, SHP_MULTIPOINTZ,
           SHP_MULTIPATCH}
M_TYPES = {SHP_POINTM, SHP_POLYLINEM, SHP_POLYGONM, SHP_MULTIPOINTM}
# MultiPoint family: no parts array in the record — a single implicit
# part (write_shp concatenates whatever parts are passed)
MULTIPOINT_TYPES = {SHP_MULTIPOINT, SHP_MULTIPOINTZ, SHP_MULTIPOINTM}
# ESRI spec: an M value < -1e38 means "no data"; this is the
# conventional sentinel writers emit for absent measures
M_NODATA = -1e40


def _is_z(shape_type: int) -> bool:
    return shape_type in Z_TYPES


def _is_m(shape_type: int) -> bool:
    return shape_type in M_TYPES


def _width(shape_type: int) -> int:
    """Vertex tuple width: (x,y) / (x,y,m) / (x,y,z,m)."""
    return 4 if _is_z(shape_type) else 3 if _is_m(shape_type) else 2


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


def _m_rng(vals: np.ndarray) -> tuple[float, float]:
    """M range per spec: values STRICTLY less than -1e38 are NODATA and
    are EXCLUDED from Mmin/Mmax (a spec-conforming consumer would
    otherwise see a corrupt measure range).  ``>=`` keeps a legal
    measure of exactly -1e38 in the header (ADVICE r4: ``>`` was off by
    one ulp class)."""
    valid = vals[vals >= -1e38]
    return _rng(valid)


def _zm_block(vals: np.ndarray, measure: bool = False) -> bytes:
    """(min, max) header + value array — the spec's Z/M block shape."""
    rng = _m_rng(vals) if measure else _rng(vals)
    return struct.pack("<2d", *rng) + vals.astype("<f8").tobytes()


def write_shp(path_base: str, shapes: list[list[np.ndarray]],
              shape_type: int,
              part_types: list[list[int]] | None = None) -> None:
    """``shapes``: one entry per record; each a list of parts, each
    part an (n, w) float64 array where w = 2 for (x, y), 3 for
    (x, y, m) on the M types (21/23/25/28), 4 for (x, y, z, m) on the
    Z types (11/13/15/18/31).  Point records use one 1-vertex part;
    MultiPoint records concatenate their parts (the record has no
    parts array); an EMPTY parts list writes a null shape (type 0)
    record, which the spec allows inside any shape-type file.
    MultiPatch (31) records additionally carry ``part_types`` — one
    :data:`MP_*` code per part (defaults to :data:`MP_RING`) — written
    as the spec's partTypes int array between parts and points.
    Writes ``<base>.shp`` and ``<base>.shx``."""
    width = _width(shape_type)
    allv = (np.concatenate([p for s in shapes for p in s])
            if any(s for s in shapes) else np.zeros((0, width)))
    bbox = ((float(allv[:, 0].min()), float(allv[:, 1].min()),
             float(allv[:, 0].max()), float(allv[:, 1].max()))
            if allv.size else (0.0, 0.0, 0.0, 0.0))
    zmr = ((*_rng(allv[:, 2]), *_m_rng(allv[:, 3])) if width == 4
           else (0.0, 0.0, *_m_rng(allv[:, 2])) if width == 3
           else (0.0, 0.0, 0.0, 0.0))
    records, index = [], []
    offset_words = 50  # header = 100 bytes
    for i, parts in enumerate(shapes):
        if not parts:
            content = struct.pack("<i", SHP_NULL)
        elif shape_type in (SHP_POINT, SHP_POINTZ, SHP_POINTM):
            vals = [float(v) for v in parts[0][0, :width]]
            content = struct.pack(f"<i{width}d", shape_type, *vals)
        else:
            pts = np.concatenate(parts)
            box = (float(pts[:, 0].min()), float(pts[:, 1].min()),
                   float(pts[:, 0].max()), float(pts[:, 1].max()))
            if shape_type in MULTIPOINT_TYPES:
                content = struct.pack("<i4di", shape_type, *box, len(pts))
            else:
                starts, n = [], 0
                for p in parts:
                    starts.append(n)
                    n += len(p)
                content = struct.pack("<i4dii", shape_type, *box,
                                      len(parts), len(pts))
                content += struct.pack(f"<{len(parts)}i", *starts)
                if shape_type == SHP_MULTIPATCH:
                    pt = (part_types[i] if part_types is not None
                          else [MP_RING] * len(parts))
                    if len(pt) != len(parts):
                        raise ValueError(
                            f"record {i}: {len(pt)} part types for "
                            f"{len(parts)} parts")
                    content += struct.pack(f"<{len(parts)}i", *pt)
            content += pts[:, :2].astype("<f8").tobytes()
            if width == 4:
                # spec: Zmin,Zmax + Z array, then Mmin,Mmax + M array
                content += _zm_block(pts[:, 2])
                content += _zm_block(pts[:, 3], measure=True)
            elif width == 3:
                content += _zm_block(pts[:, 2], measure=True)
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
    (Z records → (n, 4) parts, M records → (n, 3), MultiPoint records →
    one part, null records → []).  MultiPatch part types are dropped
    here; use :func:`read_shp_ex` to keep them."""
    shape_type, shapes, _ = read_shp_ex(path_base)
    return shape_type, shapes


def read_shp_ex(path_base: str) -> tuple[int, list[list[np.ndarray]],
                                         list[list[int]]]:
    """Like :func:`read_shp` plus per-record part-type lists (the
    :data:`MP_*` codes for MultiPatch records, ``[]`` otherwise)."""
    with open(path_base + ".shp", "rb") as f:
        raw = f.read()
    file_words = struct.unpack(">i", raw[24:28])[0]
    shape_type = struct.unpack("<i", raw[32:36])[0]
    shapes: list[list[np.ndarray]] = []
    ptypes: list[list[int]] = []
    pos, end = 100, 2 * file_words
    while pos < end:
        _, words = struct.unpack(">ii", raw[pos:pos + 8])
        c = raw[pos + 8:pos + 8 + 2 * words]
        rec_type = struct.unpack("<i", c[:4])[0]
        w = _width(rec_type)
        pt: list[int] = []
        if rec_type == SHP_NULL:
            shapes.append([])
        elif rec_type in (SHP_POINT, SHP_POINTZ, SHP_POINTM):
            vals = struct.unpack(f"<{w}d", c[4:4 + 8 * w])
            shapes.append([np.array([vals], dtype=np.float64)])
        elif rec_type in MULTIPOINT_TYPES:
            n_pts = struct.unpack("<i", c[36:40])[0]
            pts = _read_pts(c, 40, n_pts, w)
            shapes.append([pts])
        elif rec_type in (SHP_POLYLINE, SHP_POLYGON,
                          SHP_POLYLINEZ, SHP_POLYGONZ,
                          SHP_POLYLINEM, SHP_POLYGONM,
                          SHP_MULTIPATCH):
            n_parts, n_pts = struct.unpack("<ii", c[36:44])
            starts = list(struct.unpack(f"<{n_parts}i", c[44:44 + 4 * n_parts]))
            off = 44 + 4 * n_parts
            if rec_type == SHP_MULTIPATCH:
                pt = list(struct.unpack(f"<{n_parts}i",
                                        c[off:off + 4 * n_parts]))
                off += 4 * n_parts
            pts = _read_pts(c, off, n_pts, w)
            bounds = starts + [n_pts]
            shapes.append([pts[bounds[j]:bounds[j + 1]].copy()
                           for j in range(n_parts)])
        else:  # unsupported type: empty record
            shapes.append([])
        ptypes.append(pt)
        pos += 8 + 2 * words
    return shape_type, shapes, ptypes


def _read_pts(c: bytes, off: int, n_pts: int, width: int) -> np.ndarray:
    """XY block + optional Z/M blocks (each: min,max + array) at
    ``off`` → (n_pts, width) array."""
    pts = np.frombuffer(c[off:off + 16 * n_pts],
                        dtype="<f8").reshape(n_pts, 2)
    cols = [pts]
    o = off + 16 * n_pts
    for _ in range(width - 2):  # Z block (if width 4), then M block
        o += 16  # skip min,max
        cols.append(np.frombuffer(c[o:o + 8 * n_pts], dtype="<f8"))
        o += 8 * n_pts
    return np.column_stack(cols) if len(cols) > 1 else pts.copy()


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
                if len(v) >= 4:          # Z types: (x, y, z, m)
                    z, m = float(v[2]), float(v[3])
                elif len(v) == 3:        # M types: (x, y, m)
                    z, m = None, float(v[2])
                else:
                    z, m = None, None
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
    elif _is_m(shape_type):
        if "m" not in pdf.columns:
            raise ValueError(f"shape type {shape_type} needs an m column")
        pdf["m"] = pdf["m"].fillna(M_NODATA)
        cols = ["x", "y", "m"]
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


MULTIPATCH_SCHEMA = VERTEX_SCHEMA_ZM + ", part_type int"


def multipatch_to_df(spark: SparkSession, path_base: str) -> DataFrame:
    """MultiPatch SHP + DBF → vertex DataFrame with the per-part
    :data:`MP_*` code in ``part_type`` (the surface-topology info a
    consumer needs to rebuild triangle strips/fans and ring groups)."""
    _, shapes, ptypes = read_shp_ex(path_base)
    try:
        _, attrs = read_dbf(path_base + ".dbf")
        ids = [int(a[0]) for a in attrs]
    except FileNotFoundError:
        ids = list(range(len(shapes)))
    rows = []
    for sid, parts, pts in zip(ids, shapes, ptypes):
        vid = 0
        for pi, p in enumerate(parts):
            ptype = pts[pi] if pi < len(pts) else MP_RING
            for v in p:
                rows.append((sid, pi, vid, float(v[0]), float(v[1]),
                             float(v[2]), float(v[3]), ptype))
                vid += 1
    return spark.createDataFrame(rows, MULTIPATCH_SCHEMA)


def df_to_multipatch(df: DataFrame, path_base: str) -> None:
    """Vertex DataFrame (MULTIPATCH_SCHEMA, converted or not) →
    MultiPatch SHP + DBF; part and within-part vertex order and the
    per-part type codes are preserved exactly (collects — same
    dim-side exchange rationale as :func:`df_to_shapefile`)."""
    pdf = df.toPandas().sort_values(["geom_id", "part", "vid"])
    pdf["m"] = pdf["m"].fillna(M_NODATA)
    shapes, ptypes, ids = [], [], []
    for gid, g in pdf.groupby("geom_id", sort=True):
        parts, pt = [], []
        for _, p in g.groupby("part", sort=True):
            parts.append(p[["x", "y", "z", "m"]].to_numpy(np.float64))
            pt.append(int(p["part_type"].iloc[0]))
        shapes.append(parts)
        ptypes.append(pt)
        ids.append(int(gid))
    write_shp(path_base, shapes, SHP_MULTIPATCH, part_types=ptypes)
    write_dbf(path_base + ".dbf", [("GEOM_ID", "N", 18)],
              [(i,) for i in ids])


def dbf_to_df(spark: SparkSession, path_base: str) -> DataFrame:
    """DBF attribute table → DataFrame (N → bigint, C → string; field
    names lowercased) — the read side of the attribute passthrough."""
    fields, rows = read_dbf(path_base + ".dbf")
    schema = ", ".join(f"{n.lower()} {'bigint' if t == 'N' else 'string'}"
                       for n, t, _ in fields)
    return spark.createDataFrame(rows, schema)
