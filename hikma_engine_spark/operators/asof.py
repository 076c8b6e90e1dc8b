"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Strategy (a) from the brief: compose built-in ops. The classic
union-and-carry trick keeps everything JVM-side and window-based:

  1. tag left rows (probe) and right rows (reference) and union them
  2. one window per key ordered by (ts, tag): ``last(right_value,
     ignorenulls)`` over rows-unbounded-preceding carries the most
     recent reference value forward
  3. keep only left rows — each now wears the as-of match

One shuffle (the window partitioning), no range explosion, no
per-group pandas. Ties (equal ts) resolve as right-before-left
(inclusive as-of), deterministic via the tag ordering.

A ``tolerance`` bound (max staleness) becomes a plain filter afterward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tolerance_sec: int | None = None,
) -> DataFrame:
    """For each left row: the latest right row with same ``on`` key and
    right.ts <= left.ts. Returns left columns + value_cols (nullable)
    + ``asof_ts`` (the matched right timestamp)."""
    lt = left.withColumn("_tag", F.lit(1))
    rt = right.select(
        on,
        ts,
        *value_cols,
    ).withColumn("_tag", F.lit(0))
    # align schemas: left's non-key columns ride along, right's are null on left rows
    left_extra = [c for c in left.columns if c not in (on, ts)]
    rt_full = rt
    for c in left_extra:
        rt_full = rt_full.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    lt_full = lt
    for c in value_cols:
        lt_full = lt_full.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt_full.select(rt_full.columns).unionByName(
        rt_full.select(rt_full.columns)
    )
    w = (
        Window.partitionBy(on)
        # value_cols in the ordering make ties on (ts) deterministic:
        # among equal-timestamp reference rows the max value wins
        .orderBy(
            F.col(ts).asc(),
            F.col("_tag").asc(),
            *[F.col(c).asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_tag") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in value_cols
        ],
        F.last(F.when(F.col("_tag") == 0, F.col(ts)), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
    )
    out = (
        carried.filter(F.col("_tag") == 1)
        .drop("_tag", *value_cols)
        .select(
            on,
            ts,
            *left_extra,
            *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
            "asof_ts",
        )
    )
    if tolerance_sec is not None:
        within = (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col("asof_ts"))
        ) <= tolerance_sec
        out = out.select(
            on,
            ts,
            *left_extra,
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in value_cols],
            F.when(within, F.col("asof_ts")).otherwise(F.lit(None)).alias("asof_ts"),
        )
    return out
