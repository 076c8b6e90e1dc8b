"""Memory-bandwidth contention probe for bench adjudication.

The shared host has a recurring co-tenant state that is INVISIBLE in
guest loadavg: CPU stays idle but parallel memory bandwidth collapses,
inflating the high-parallelism bench level (shuffle/write-heavy Spark
stages) while leaving the 2-thread level untouched — which moves the
scaling-efficiency ratio with zero code change (measured: the same
tree scored 0.919 in a quiet window and 0.710 hours later, with this
probe reading +130% mean per-copy inflation at the latter moment).

Probe: one 320 MB numpy multiply-add stream, run solo and as 8
concurrent copies; report per-copy wall inflation. Near-zero
inflation = quiet box (efficiency readings are the code's);
>>+20% mean = memory-starved window (read T_N/T_4N against this).

Usage: python tools/membw_probe.py  → one JSON line.
`bench.py` runs this automatically and stores the result in
`bench_detail.json` under "membw_probe".
"""
from __future__ import annotations

import json
import subprocess
import sys

_PROBE_SRC = r"""
import numpy as np, time
a = np.ones(40_000_000, dtype=np.float64)   # 320 MB
b = np.ones(40_000_000, dtype=np.float64)
t0 = time.time()
for _ in range(5):
    a = a * 1.0000001 + b
print(time.time() - t0)
"""


def _run_n(n: int) -> list[float]:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC], stdout=subprocess.PIPE
        )
        for _ in range(n)
    ]
    return [float(p.communicate()[0]) for p in procs]


def measure() -> dict:
    solo = min(_run_n(1) + _run_n(1))  # best of two solo runs
    eight = _run_n(8)
    mean8 = sum(eight) / len(eight)
    return {
        "solo_sec": round(solo, 3),
        "eight_mean_sec": round(mean8, 3),
        "eight_worst_sec": round(max(eight), 3),
        "mean_inflation_pct": round((mean8 / solo - 1) * 100, 1),
        "worst_inflation_pct": round((max(eight) / solo - 1) * 100, 1),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
