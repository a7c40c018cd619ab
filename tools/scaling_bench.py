"""Two-parallelism scaling study (BASELINE.md sandbox protocol).

Runs the flagship pipeline on the SAME input at ``local[N]`` and
``local[4N]`` (fresh JVM each, 1 warm-up + ``trials`` measured runs,
min taken — the low-noise estimator on this shared host), plus a
process-parallel NumPy ``sin`` microbenchmark at N and 4N workers that
measures the HOST's own FP scaling ceiling at the same moment.

Reported:
* raw scaling efficiency  = (tpN4 / tpN) / 4          (target ≥ 0.8)
* structural efficiency   = raw / hardware-ceiling    (≈1 ⇒ the job
  adds no serial bottleneck or skew collapse beyond what the silicon
  itself loses — the property the north rule is probing)

Why N=4: this sandbox advertises 32 vCPUs but measured aggregate FP
throughput saturates near ~10–16 cores' worth (oversubscribed host;
see BENCH/BASELINE.md), so 8→32 would benchmark the hypervisor, not
the job.  N=4 → 4N=16 keeps both levels inside the machine's real
capacity; the protocol is still "same job, same input, N vs 4N cores".

Usage: python tools/scaling_bench.py [N] [mult] [trials]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
import __spark_entry__ as em
from geocoordinateconverter_spark import kernels
from geocoordinateconverter_spark.operators import pip as pip_op, tiles
from geocoordinateconverter_spark.plans.session import build_session

cores, mult, trials = {cores}, {mult}, {trials}
spark = build_session("scaling", cores=cores, shuffle_partitions=cores)
em._register(spark, {sf_dir!r})
par = spark.sparkContext.defaultParallelism
import bench
full = bench.flagship(spark, {sf_dir!r}, mult)
n_rows = full.count()  # warm-up (JIT, python worker pool, broadcast)
times = []
for _ in range(trials):
    t0 = time.time(); full.count(); times.append(time.time() - t0)
n_input = spark.table("lineitem").count() * mult
print("RESULT " + json.dumps({{"cores": cores, "times": times,
      "min_s": min(times), "input_rows": n_input, "out_rows": n_rows}}))
spark.stop()
"""


def run_level(cores: int, mult: int, trials: int, sf_dir: str) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, mult=mult,
                         trials=trials, sf_dir=sf_dir)
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=1500,
                         check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def _burn(_):
    os.environ["OMP_NUM_THREADS"] = "1"
    import numpy as np
    a = np.random.default_rng(0).random(2_000_000)
    t0 = time.time()
    k = 0
    while time.time() - t0 < 2.5:
        np.sin(a)
        k += 1
    return k * 2_000_000


def hw_ceiling(n: int) -> float:
    with mp.Pool(n) as p:
        t0 = time.time()
        res = p.map(_burn, range(n))
        el = time.time() - t0
    return sum(res) / el


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n4 = 4 * n

    hw_lo = hw_ceiling(n)
    r_lo = run_level(n, mult, trials, sf_dir)
    r_hi = run_level(n4, mult, trials, sf_dir)
    hw_hi = hw_ceiling(n4)

    tp_lo = r_lo["input_rows"] / r_lo["min_s"]
    tp_hi = r_hi["input_rows"] / r_hi["min_s"]
    raw_eff = (tp_hi / tp_lo) / (n4 / n)
    hw_scale = hw_hi / hw_lo
    hw_eff = hw_scale / (n4 / n)
    structural = raw_eff / hw_eff if hw_eff > 0 else float("nan")

    result = {
        "n": n, "n4": n4, "mult": mult, "trials": trials,
        "input_rows": r_lo["input_rows"],
        f"local{n}_times": [round(t, 2) for t in r_lo["times"]],
        f"local{n4}_times": [round(t, 2) for t in r_hi["times"]],
        f"local{n}_min_s": round(r_lo["min_s"], 2),
        f"local{n4}_min_s": round(r_hi["min_s"], 2),
        f"local{n}_docs_per_sec": round(tp_lo),
        f"local{n4}_docs_per_sec": round(tp_hi),
        "raw_scaling_efficiency": round(raw_eff, 3),
        "hw_sin_ceiling_scale": round(hw_scale, 2),
        "hw_efficiency": round(hw_eff, 3),
        # raw value always recorded; the clamped headline is flagged so
        # a cap never silently fabricates the archived measurement
        "structural_efficiency_raw": round(structural, 3),
        "structural_efficiency": round(min(structural, 1.5), 3),
        "structural_clamped": structural > 1.5,
    }
    print(json.dumps(result))

    # BENCH/BASELINE.md is curated by hand (it aggregates several
    # protocol variants); this tool only records its raw JSON.
    # Output name is an argument so reruns don't overwrite earlier
    # rounds' evidence.
    out_name = sys.argv[4] if len(sys.argv) > 4 else "scaling_r1.json"
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / out_name).write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
