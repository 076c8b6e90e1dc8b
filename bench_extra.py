"""Extra measurement harness for the optimization round (guide §1).

`bench.py` is frozen for measurement; this file exists so individual
queries can be timed and re-timed in isolation without touching it.

Usage:
  python bench_extra.py q1 q2 ...     # time the named queries (collect,
                                      # same methodology as bench.py:
                                      # fresh plan per rep, min of reps)
  python bench_extra.py --all         # every queries() entry
  python bench_extra.py --plan q1     # print .explain("formatted")
  python bench_extra.py --reps 3 q1   # change rep count (default 2)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32) — identical to bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hikma_engine_spark.session import get_spark


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entrymod

    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    plan_mode = "--plan" in args
    if plan_mode:
        args.remove("--plan")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cores=cpus)
    # same warmup as bench.py so rep-1 numbers are comparable
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    names = list(qs) if "--all" in args else args
    out: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if plan_mode:
            print(f"===== {name} =====")
            qs[name](spark, sf_dir).explain("formatted")
            continue
        times = []
        loads = []
        spark.sparkContext.setJobDescription(name)
        for _ in range(reps):
            loads.append(_load1())
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(times), "reps": times, "load1": loads}
        print(json.dumps({name: out[name]}), flush=True)
    if out and not plan_mode:
        print(
            json.dumps(
                {
                    "total_min": round(sum(v["min"] for v in out.values()), 2),
                    "n": len(out),
                }
            )
        )


if __name__ == "__main__":
    main()
