"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The 100 TB corpus carries image/audio/video as binary columns next to
text (input_hint's ``html:binary`` is the testbed here).  This module
implements the Spark-side plumbing for decode / feature-extract as
``mapInPandas`` over Arrow batches — schema, partitioning, UDF
signature, and batch shape are real and tested; the actual media
decoders are STUBBED (no image/audio libs in this container) behind
:func:`decode_media`, which raises ``NotImplementedError`` for real
codecs and provides a deterministic byte-level fake ('raw') so the
pipeline is exercisable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id bigint, n_bytes bigint, byte_mean double, "
                  "byte_entropy double, magic string")


def decode_media(payload: bytes, codec: str) -> np.ndarray:
    """STUB: real decoders (jpeg/png/wav/mp4 frame-sample) are not
    available in this container.  'raw' interprets the payload as a
    uint8 array — deterministic and adequate to exercise the Arrow
    plumbing; swap in real codecs on a cluster with the media libs."""
    if codec == "raw":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: media decoding is stubbed in this environment")


def _entropy(counts: np.ndarray) -> float:
    p = counts[counts > 0].astype(np.float64)
    p /= p.sum()
    return float(-(p * np.log2(p)).sum())


def extract_features(df: DataFrame, payload_col: str = "html",
                     codec: str = "raw") -> DataFrame:
    """Per-doc byte-level features via mapInPandas (Arrow batches in,
    Arrow batches out — no per-row Python at the Spark boundary; the
    inner loop is per-doc because payloads are variable-length, which
    is the honest batch shape for media decode)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, mean, ent, magic = [], [], [], []
            for payload in pdf[payload_col]:
                arr = decode_media(bytes(payload), codec)
                n_bytes.append(arr.size)
                mean.append(float(arr.mean()) if arr.size else 0.0)
                ent.append(_entropy(np.bincount(arr, minlength=256))
                           if arr.size else 0.0)
                magic.append(bytes(payload[:4]).hex())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "byte_mean": pd.Series(mean, dtype="float64"),
                "byte_entropy": pd.Series(ent, dtype="float64"),
                "magic": magic,
            })

    return df.select("doc_id", payload_col).mapInPandas(_gen, FEATURE_SCHEMA)


def html_binary(docs: DataFrame) -> DataFrame:
    """The FIXTURES.md §1 html column: deterministic wrapper bytes —
    mirrors in DuckDB as encode('<html><body>' || text || …)."""
    return docs.withColumn(
        "html",
        F.concat(F.lit("<html><body>"), F.col("text"),
                 F.lit("</body></html>")).cast("binary"))
