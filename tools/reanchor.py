"""Reference re-anchoring scout (SURVEY.md §0 / VERDICT "re-anchor"
item — blocked five consecutive rounds on the empty /root/reference
mount).

Run this THE MOMENT the mount is populated.  It does no writes; it
inventories the reference tree and extracts exactly the constants the
synthetic stand-ins must be replaced with, printing a structured
report mapping each finding to the repo file that consumes it:

  ========================== what to extract ==========================
  Helmert 7-param set (dX dY dZ rx ry rz s)  -> constants.py
  Bessel/GRS80 ellipsoid digits              -> constants.py
  xyz2fila iteration policy (count/epsilon)  -> geodesy.XYZ2FILA_ITERS
  AFT triangle table (count, columns)        -> aft.py (882 synthetic)
  AFT point-location epsilon / tie rule      -> aft.py locate()
  geoid grid headers (lat0 lon0 dlat dlon)   -> geoid.py GRIDS
  -ht/-hc/-hg per-chain defaults             -> kernels.HEIGHT_MODE_DEFAULTS
  gk-slo -x self-test vectors                -> tests/golden_frozen.py

Usage:  python tools/reanchor.py [/root/reference]
Exit 3 when the mount is still empty (the five-round status quo).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

# pattern -> (label, repo consumer) over C/Tcl/header sources
PATTERNS: list[tuple[str, str, str]] = [
    (r"[-+]?\d+\.\d+\s*,\s*[-+]?\d+\.\d+\s*,\s*[-+]?\d+\.\d+.*[Hh]elmert",
     "Helmert parameter candidates", "geocoordinateconverter_spark/constants.py"),
    (r"(dX|dY|dZ|rotX|rotY|rotZ|\bscale\b)\s*=\s*[-+0-9.eE]+",
     "datum-shift assignments", "geocoordinateconverter_spark/constants.py"),
    (r"6377397\.\d+|6378137\.\d+",
     "ellipsoid semi-major digits (Bessel/GRS80)",
     "geocoordinateconverter_spark/constants.py"),
    (r"(for|while)\s*\(.*(iter|it\b).*\)",
     "iteration loops (xyz2fila policy)",
     "geocoordinateconverter_spark/geodesy.py:XYZ2FILA_ITERS"),
    (r"(epsilon|EPS|1e-\d+)",
     "convergence/boundary epsilons",
     "geodesy.py + aft.py locate()"),
    (r"(triangle|trikot)",
     "AFT triangle handling — swapping in real aft_gktm.h/aft_tmgk.h "
     "tables REQUIRES setting aft.TABLES_SYNTHETIC = False so the "
     "DuckDB oracle serializes the real (irregular) mesh instead of "
     "regenerating the synthetic grid",
     "geocoordinateconverter_spark/aft.py"),
    (r"(geoid|absg|Slo99|AMG|VRP2016)",
     "geoid grid references",
     "geocoordinateconverter_spark/geoid.py"),
    (r"(-ht|-hc|-hg|hsel)",
     "height-mode defaults",
     "geocoordinateconverter_spark/kernels.py:HEIGHT_MODE_DEFAULTS"),
    (r"(self.?test|-x\b)",
     "-x self-test vectors",
     "tests/golden_frozen.py"),
]

SOURCE_EXT = {".c", ".h", ".tcl", ".cpp", ".hpp", ".txt", ".md"}


def main() -> int:
    ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
    entries = sorted(p for p in ref.rglob("*") if p.is_file()) \
        if ref.is_dir() else []
    if not entries:
        print(f"REFERENCE STILL EMPTY: {ref} has no files "
              f"(status quo since round 1) — nothing to re-anchor.")
        return 3
    print(f"REFERENCE POPULATED: {len(entries)} files\n")
    for p in entries:
        print(f"  {p.relative_to(ref)}  ({p.stat().st_size} B)")
    print("\n== constant extraction ==")
    for p in entries:
        if p.suffix.lower() not in SOURCE_EXT:
            continue
        try:
            text = p.read_text(errors="replace")
        except OSError as e:
            print(f"  !! unreadable: {p} ({e})")
            continue
        for pat, label, consumer in PATTERNS:
            hits = [(i + 1, ln.strip()[:100])
                    for i, ln in enumerate(text.splitlines())
                    if re.search(pat, ln)]
            if hits:
                print(f"\n  {p.name} :: {label}  ->  {consumer}")
                for lineno, ln in hits[:8]:
                    print(f"    {lineno}: {ln}")
                if len(hits) > 8:
                    print(f"    … {len(hits) - 8} more")
    print("\nNext: follow SURVEY.md §0's action list; swap the extracted "
          "values into the consumers above, then run the golden pytest "
          "and the full sweep (everything is designed as a drop-in).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
