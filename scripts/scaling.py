#!/usr/bin/env python3
"""Throughput-scaling evidence for the north rule (N -> 4N executors).

No real cluster exists in this sandbox, so the two 'cluster sizes' are two
local parallelism levels with fresh JVMs over the SAME stored input.  The
pair is local[1] vs local[4]: a mapInPandas task occupies ~3 hardware
threads (JVM Arrow pump + the Python worker), so local[4] already drives
~12 of this host's 16 PHYSICAL cores; local[8] would cross into SMT
pairing and measure the host's hyperthreading, not our code (BENCH.md
calibration).  Interleaved best-of-N to suppress external load noise.

  eff = (T_N / T_4N) / 4
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
LOW = int(__import__("os").environ.get("SCALE_LOW", "1"))
HIGH = int(__import__("os").environ.get("SCALE_HIGH", "4"))


def run(cpus: int, pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, str(HERE / "scaling_worker.py"), str(cpus), str(pages)],
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo_runs, hi_runs = [], []
    for _ in range(trials):  # interleaved to cancel time-varying host load
        lo_runs.append(run(LOW, pages))
        hi_runs.append(run(HIGH, pages))
    lo = min(lo_runs, key=lambda r: r["fused_sec"])
    hi = min(hi_runs, key=lambda r: r["fused_sec"])
    ratio = HIGH / LOW
    eff = lambda key: round((lo[key] / hi[key]) / ratio, 3)  # noqa: E731
    print(json.dumps({
        "low": lo, "high": hi, "cores": [LOW, HIGH], "trials": trials,
        "pipeline_pages_per_sec": {
            f"cpus{LOW}": round(pages / lo["fused_sec"], 1),
            f"cpus{HIGH}": round(pages / hi["fused_sec"], 1),
        },
        "scaling_efficiency_scan": eff("scan_sec"),
        "scaling_efficiency_pipeline": eff("pipe_sec"),
        "scaling_efficiency_fused_pipeline": eff("fused_sec"),
        "scaling_efficiency_kg_build": eff("kg_sec"),
        "scaling_efficiency_kg_build_x16": eff("kg_big_sec"),
    }))


if __name__ == "__main__":
    main()
