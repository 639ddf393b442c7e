"""Benchmark breadth: all configs + stream-count scaling (VERDICT item 10).

Runs bench.measure over {cif, cif_rc, cif_intra, qcif} and a stream-count
scaling curve {4, 16, 32, 64} for the headline config, then prints a
markdown table (stderr prints progress; stdout the table) ready to paste
into BASELINE.md.  Run in the TPU session:

    python tools/bench_breadth.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    rows = []
    for config in ("cif", "cif_rc", "cif_intra", "qcif"):
        r = bench.measure(config)
        rows.append((f"{config} (16 streams)", r))
    for streams in (4, 32, 64):
        r = bench.measure("cif", streams=streams)
        rows.append((f"cif ({streams} streams)", r))

    print("| config | MB/s/chip | ms/run | total bits |")
    print("|---|---|---|---|")
    for name, r in rows:
        print(f"| {name} | {r['mbs']:,.0f} | {r['ms']:.1f} | {r['bits']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
