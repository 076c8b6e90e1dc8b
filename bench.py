"""Benchmark harness.

Runs (1) every queries() entry from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and (2) the full KG pipeline over a
deterministic synthetic transcript corpus at TWO parallelism levels
(local[8] vs local[32]) to evidence the north rule's two-cluster-size
scaling criterion (no real cluster in this sandbox — see BASELINE.md).

Prints ONE JSON line:
  {"metric": "e2e_bench_sec", "value": <total query sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "pipeline": {"turns": N, "local8": {...}, "local32": {...},
                "scaling_efficiency": E, "turns_per_sec": tps32}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hikma_engine_spark import synth
from hikma_engine_spark.pipeline import Pipeline
from hikma_engine_spark.session import get_spark, stop_all

# corpus size for the pipeline bench, scaled to the sf under test
# (sf0.1 → ~520k turns / ~70MB text — enough parallel work that the
# two-parallelism scaling measurement is not fixed-overhead-bound)
N_CONVS_BY_SF = {0.001: 300, 0.01: 3000, 0.1: 30000}
SCALING_CORES = (4, 16)  # N and 4N


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def run_pipeline(cores: int, corpus: str, n_turns: int, reps: int = 2) -> dict:
    """Best-of-N timing in one JVM (first run pays JIT/codegen warmup —
    the steady-state number is what a long-running cluster job sees)."""
    spark = get_spark(app_name=f"bench_pipeline_{cores}", cores=cores)
    best = float("inf")
    for rep in range(reps):
        out = f"/tmp/hikma_bench_out_{cores}_{rep}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        Pipeline(spark, corpus, out, run_id=f"bench-{cores}-{rep}").run(resume=False)
        best = min(best, time.time() - t0)
    stop_all()
    return {
        "cores": cores,
        "sec": round(best, 2),
        "turns_per_sec": round(n_turns / best, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    # --- query suite at the target sf ---
    spark = get_spark(app_name="bench_queries", cores=cpus)
    # one-time JIT/codegen warmup so the first query isn't charged for it
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    t0 = time.time()
    qtimes = run_queries(spark, sf_dir)
    total = round(time.time() - t0, 2)
    stop_all()

    # --- pipeline scaling bench (N vs 4N cores on the same input) ---
    n_convs = N_CONVS_BY_SF.get(sf, 4000)
    corpus = synth.ensure_corpus(n_convs=n_convs, seed=42)
    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(corpus).num_rows
    lo = run_pipeline(SCALING_CORES[0], corpus, n_turns)
    hi = run_pipeline(SCALING_CORES[1], corpus, n_turns)
    efficiency = round((lo["sec"] / hi["sec"]) / (SCALING_CORES[1] / SCALING_CORES[0]), 3)

    print(
        json.dumps(
            {
                "metric": "e2e_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "pipeline": {
                    "n_convs": n_convs,
                    "turns": n_turns,
                    f"local{SCALING_CORES[0]}": lo,
                    f"local{SCALING_CORES[1]}": hi,
                    "turns_per_sec": hi["turns_per_sec"],
                    "scaling_efficiency": efficiency,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
