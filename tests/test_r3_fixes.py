"""Round-3 regression tests for the ADVICE.md findings:

* c4_quality_filter on empty/whitespace-only docs (ANSI divide-by-zero
  guard + NULL/keep=false parity with the DuckDB oracle),
* DBF byte-width encoding (non-ASCII 'C' values, over-width 'N' raise),
* minhash_pairs cache ownership / near_dup_drop_list pairs reuse,
* checkpoint manifest hashes derived from committed bytes,
* api.convert reverse=True with default cols.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geocoordinateconverter_spark.operators import textdedup as td
from geocoordinateconverter_spark.sources import shapefile as shp

EDGE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "", "und"),                 # empty doc: the ANSI /0 trap
    (3, "   ", "und"),              # whitespace-only: n_tokens == 0
    (4, "a b", "en"),               # short but non-empty
]


def test_c4_quality_filter_empty_doc_parity(spark):
    docs = spark.createDataFrame(EDGE_DOCS, "doc_id int, text string, lang string")
    got = (td.c4_quality_filter(docs).orderBy("doc_id")
           .toPandas().reset_index(drop=True))
    # no crash, and the empty/ws-only rows are NULL avg + keep=false
    for i in (1, 2):
        assert got.loc[i, "n_tokens"] == 0
        assert pd.isna(got.loc[i, "avg_word_len"])
        assert got.loc[i, "keep"] == False  # noqa: E712
    assert got.loc[0, "keep"] == True  # noqa: E712

    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(EDGE_DOCS, columns=["doc_id", "text", "lang"]))
    exp = (con.execute(td.c4_quality_filter_sql() + " ORDER BY doc_id")
           .df().reset_index(drop=True))
    for col in ("n_tokens", "keep", "pass_min_tokens", "pass_stopword"):
        assert list(got[col].astype("object").where(got[col].notna(), None)) \
            == list(exp[col].astype("object").where(exp[col].notna(), None)), col
    # avg_word_len: NULL where NULL, equal elsewhere
    assert list(got["avg_word_len"].isna()) == list(exp["avg_word_len"].isna())
    mask = got["avg_word_len"].notna()
    assert (got.loc[mask, "avg_word_len"].round(9).values
            == exp.loc[mask, "avg_word_len"].round(9).values).all()


def test_dbf_nonascii_byte_width(tmp_path):
    path = str(tmp_path / "attrs.dbf")
    fields = [("NAME", "C", 12), ("POP", "N", 8)]
    rows = [("Šmarje", 1234), ("Ljubljana", 295504)]
    shp.write_dbf(path, fields, rows)
    _, got = shp.read_dbf(path)
    # the field AFTER the non-ASCII value must survive unshifted
    assert got == rows


def test_dbf_overflow_raises(tmp_path):
    path = str(tmp_path / "bad.dbf")
    with pytest.raises(ValueError, match="exceeds declared width"):
        shp.write_dbf(path, [("POP", "N", 3)], [(12345,)])
    with pytest.raises(ValueError, match="exceeds declared width"):
        # 9 chars but 10 utf-8 bytes: byte-level check must catch it
        shp.write_dbf(path, [("NAME", "C", 9)], [("Šmarje pš",)])


def test_minhash_cache_ownership_and_pairs_reuse(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cache: list = []
    pairs = td.minhash_pairs(docs, cache=cache)
    n_pairs = pairs.count()
    assert len(cache) == 1 and cache[0].is_cached
    # near_dup_drop_list reuses the precomputed pairs (no second cache)
    via_reuse = (td.near_dup_drop_list(docs, pairs=pairs)
                 .orderBy("drop_doc_id").collect())
    cache[0].unpersist()
    assert not cache[0].is_cached
    fresh_cache: list = []
    fresh = (td.near_dup_drop_list(
        docs, pairs=td.minhash_pairs(docs, cache=fresh_cache))
        .orderBy("drop_doc_id").collect())
    fresh_cache[0].unpersist()
    assert via_reuse == fresh
    assert n_pairs >= len(via_reuse)


def test_convert_reverse_default_cols(spark):
    from geocoordinateconverter_spark import api
    rows = [(46.05, 14.5, 300.0), (45.8, 15.2, 250.0)]
    straight = spark.createDataFrame(rows, "fi double, la double, h double")
    # on-disk order is (la, fi): default cols + reverse must un-swap
    swapped = straight.select(F.col("la").alias("fi"),
                              F.col("fi").alias("la"), "h")
    a = (api.convert(straight, t=2).select("x_out", "y_out", "h_out")
         .collect())
    b = (api.convert(swapped, t=2, reverse=True)
         .select("x_out", "y_out", "h_out").collect())
    assert a == b
