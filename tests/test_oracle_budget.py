"""Oracle survivability budget (VERDICT r4 Next #1c).

The driver's correctness sweep runs every ``oracle_sql()`` statement
through DuckDB; in r4 a 380 KB unrolled statement pinned the shared
connection's buffer pool and starved the 49 queries behind it.  These
tests make that failure class unshippable:

* every statement must parse + execute to completion on a FRESH
  connection capped at ``memory_limit='2GB'`` (far below the driver
  box, far above anything a sane oracle needs), and
* no statement may exceed 50 KB of SQL text (the r4 post-mortem
  threshold — parse-arena size tracked the statement size 1:1).

Runs the full 96-oracle corpus at sf0.01 in ~12 s (measured r5).
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")
MAX_SQL_BYTES = 50_000

ORACLES = entrymod.oracle_sql()


def _fresh_con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET memory_limit='2GB'")
    con.execute("SET threads TO 4")
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_no_giant_oracle_statements():
    over = {k: len(v) for k, v in ORACLES.items() if len(v) > MAX_SQL_BYTES}
    assert not over, f"oracle statements over {MAX_SQL_BYTES}B: {over}"


@pytest.mark.skipif(not Path(SF_DIR).exists(), reason="driver testdata absent")
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_completes_within_memory_budget(name: str):
    con = _fresh_con()
    try:
        rows = con.execute(ORACLES[name]).fetchall()
    finally:
        con.close()
    assert rows is not None  # completion (no OutOfMemoryException) is the assertion
