"""Build the --py-files artifact (north_rule: "runs via spark-submit
--py-files on a multi-executor cluster").

Produces dist/engine.zip containing the package + __spark_entry__; the
static data (AFT mesh, geoid grids, fixtures) needs no separate
shipping because it is rebuilt deterministically at import time on
every executor (SURVEY.md §5.1 "constant folding at init" — the Spark
analogue of the reference's compiled-in headers).

Usage:
    python tools/package.py
    spark-submit --master local[16] --py-files dist/engine.zip \
        tools/submit_job.py
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build() -> Path:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "engine.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "geocoordinateconverter_spark").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
        z.write(REPO / "__spark_entry__.py", "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build())
