"""Mergeable sketch operators (the O(1)-state family for 100 TB stats).

Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") expressed
as plain DataFrame algebra:

- the SKETCH is a (depth × width) table of bucket sums — one algebraic
  ``groupBy`` with map-side partial aggregation, so a token occurring
  10^12 times is absorbed into per-task partials before the shuffle,
  and two sketches built over different shards MERGE by adding bucket
  counts (the property that makes it the scale option: state is
  depth·width rows, independent of corpus size);
- a POINT ESTIMATE is min over depth rows of the hashed bucket's sum —
  always ≥ the true count, and ≤ true + ε·N with probability
  1 − (1/2)^depth for width = 2/ε (Markov over each independent row).

Spark ships a binary `F.count_min_sketch` aggregate; this table form
is used instead because the sketch must be queryable with plain joins
and replayable cross-engine (the DuckDB oracle twin reproduces the
identical bucket integers — see `a_topk_sketch` in __spark_entry__).

Completes the sketch family next to HLL distinct (`a_approx_distinct`)
and the GK quantile contract (`a_approx_quantile`). No reference
analog (the reference keeps no approximate state; SURVEY §2.6 covers
only exact aggregation) — target-domain coverage.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, row: int, width: int) -> Column:
    """Portable 48-bit hash → bucket: identical integers in Spark
    (`conv(substring(md5(...),1,12),16,10)`) and DuckDB
    (`CAST('0x'||substr(md5(...),1,12) AS BIGINT)`). 48 bits keeps the
    value positive in a signed 64-bit lane in both engines; the row
    index is prefixed so the depth rows hash independently."""
    h = F.md5(F.concat_ws(":", F.lit(str(row)), item))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % width).alias(
        f"b{row}"
    )


def count_min_sketch_table(
    df: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) with at most depth·width rows.

    One algebraic groupBy over a depth-times-replicated item stream
    (union of per-row projections — each branch reuses the same scan;
    map-side combine collapses every task's contribution to ≤
    depth·width partial rows regardless of item skew)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    base = df.select(F.col(item_col).alias("item"), w.alias("w"))
    per_row = [
        base.select(
            F.lit(j).alias("d"),
            _bucket(F.col("item"), j, width).alias("bucket"),
            "w",
        )
        for j in range(depth)
    ]
    u = reduce(lambda a, b: a.unionByName(b), per_row)
    return u.groupBy("d", "bucket").agg(F.sum("w").alias("cnt"))


def count_min_estimates(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every row of ``queries``: returns
    ``queries`` + ``cm_est`` (min over depth rows — the CM estimator).

    The SKETCH side is broadcast (≤ depth·width rows by construction —
    bounded whatever the corpus), so an arbitrarily large query set
    never shuffles."""
    q = queries.select(
        F.col(item_col).alias("item"),
        *[_bucket(F.col(item_col), j, width) for j in range(depth)],
    )
    per_row = [
        q.select("item", F.lit(j).alias("d"), F.col(f"b{j}").alias("bucket"))
        for j in range(depth)
    ]
    u = reduce(lambda a, b: a.unionByName(b), per_row)
    est = (
        u.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").alias("cm_est"))
    )
    return queries.join(
        est.withColumnRenamed("item", item_col), item_col, "left"
    )
