"""Quiet-box re-measure of the three queries the round-4 driver bench
showed +60% drift on (judge watch-item #1: likely co-tenant noise —
the r4 driver run started pipeline reps at 1-min loadavg 8.4-9.0).

Runs each query at sf0.1 on local[32] for `reps` fresh plans and
records wall time + 1-min loadavg at each rep start, so the artifact
carries the measurement-conditions evidence the r4 artifact lacked.
Output: tools/remeasure_r5.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hikma_engine_spark.session import get_spark, stop_all

TARGETS = ["g_cc_dupgroups", "kg_nodes_alias_only", "kg_full_pipeline"]
R3_STEADY = {"g_cc_dupgroups": 3.93, "kg_nodes_alias_only": 2.12,
             "kg_full_pipeline": 4.42}
R4_DRIVER = {"g_cc_dupgroups": 6.39, "kg_nodes_alias_only": 3.53,
             "kg_full_pipeline": 5.74}


def _load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="remeasure_r5", cores=32)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entrymod.queries()
    out = {}
    for name in TARGETS:
        reps, loads = [], []
        for _ in range(4):
            loads.append(_load1())
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            reps.append(round(time.time() - t0, 3))
        out[name] = {
            "reps_sec": reps,
            "loadavg_at_rep_start": loads,
            "sec_min": min(reps[1:]),
            "r3_steady": R3_STEADY[name],
            "r4_driver_loaded": R4_DRIVER[name],
            "within_15pct_of_r3": min(reps[1:]) <= R3_STEADY[name] * 1.15,
        }
        print(name, out[name], flush=True)
    stop_all()
    with open(os.path.join(os.path.dirname(__file__), "remeasure_r5.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
