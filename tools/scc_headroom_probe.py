"""1M-node functional-graph SCC headroom probe (pointer doubling)."""
import sys, time
sys.path.insert(0, "/root/repo")
from hikma_engine_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(cores=32)
n = 1_000_000
# rho-shaped functional graph: xxhash-derived successor, plus forced
# small cycles among ids < 1000 for structure
base = spark.range(n).select(
    F.col("id").cast("string").alias("node"),
    F.when(F.col("id") < 1000, ((F.col("id") + 7) % 1000).cast("string"))
    .otherwise(F.pmod(F.xxhash64("id"), F.lit(n)).cast("string"))
    .alias("succ"),
)
from hikma_engine_spark.operators.graph import functional_scc
t0 = time.time()
out = functional_scc(base)
agg = out.groupBy("on_cycle").count().collect()
wall = time.time() - t0
import math
print({"n": n, "rounds": max(1, math.ceil(math.log2(2 * n))),
       "wall_sec": round(wall, 1),
       "on_cycle": {str(r["on_cycle"]): r["count"] for r in agg}})
spark.stop()
