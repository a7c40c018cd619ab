"""Two-parallelism scaling study (BASELINE.md sandbox protocol).

Runs the flagship pipeline (bench.py, SPARK_GRAFT_ONLY=flagship) on the
SAME input at local[8] (stand-in for N executors) and local[32] (4N),
each in a fresh JVM, and writes throughput + scaling efficiency to
BENCH/BASELINE.md.  ``SPARK_GRAFT_MULT`` (default 16 → 9.6 M points at
sf0.1) makes compute dominate fixed overheads — identical at both
levels, so the comparison is fair.

Usage: python tools/scaling_bench.py [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cores: int, mult: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cores),
        "SPARK_GRAFT_MULT": str(mult),
        "SPARK_GRAFT_ONLY": "flagship",
    })
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1800, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    r8 = run(8, mult)
    r32 = run(32, mult)
    tp8 = r8["flagship_docs_per_sec"]
    tp32 = r32["flagship_docs_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    result = {
        "input_rows": r8["flagship_input_rows"],
        "local8_sec": r8["value"], "local8_docs_per_sec": tp8,
        "local32_sec": r32["value"], "local32_docs_per_sec": tp32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "mult": mult, "sf": r8["sf"],
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE — measured numbers (round 1)

## Flagship pipeline (BASELINE.json metric)

derive D48/GK points → t=3 datum conversion (fused Arrow pandas UDF) →
grid-cell encode (codegen) → PIP broadcast join (212-octagon test dim) →
salted tile aggregation.  Input: {r8['flagship_input_rows']:,} points
(lineitem sf{r8['sf']} × {mult} replication, identical at both levels).

| parallelism | wall s | docs/sec |
|---|---|---|
| local[8]  (stand-in for N executors)  | {r8['value']} | {tp8:,.0f} |
| local[32] (stand-in for 4N executors) | {r32['value']} | {tp32:,.0f} |

**Scaling efficiency (N→4N) = (tp32/tp8)/4 = {eff:.3f}** (target ≥ 0.8).

Config: identical except `local[N]` and `spark.sql.shuffle.partitions=N`
(plans/session.py — AQE on, Arrow batch 32k, UTC, driver 8g).

Caveat (BASELINE.md): local-mode shuffles are intra-host; this evidences
parallel scalability of the job structure (no serial bottleneck, no
skew collapse), not network-shuffle behavior.

## Full bench suite (`python bench.py`, local[32], sf0.1)

See BENCH_r1.json (driver-recorded) / `python bench.py` output.

## Reference baseline

The reference publishes no benchmark numbers (SURVEY.md §7); its only
perf tooling is `gk-slo -gd N` + wall-clock print, unavailable here
because /root/reference is an empty mount (SURVEY.md §0).  The single-
node comparison point is therefore our own single-threaded NumPy kernel
throughput (see tests) vs the distributed pipeline above.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    (REPO / "BENCH" / "scaling_r1.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
