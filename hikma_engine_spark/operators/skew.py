"""Explicit skew handling: salting utilities.

The north rule calls out "skewed conversations and hot entities …
salted repartitioning and AQE-aware shuffle tuning". Where the hot key
feeds an ALGEBRAIC aggregate (count/sum/min/max), Spark's map-side
partial aggregation already absorbs it; salting matters when

- the aggregate is holistic (collect_list/collect_set over a hot key
  would funnel every row of that key through one reducer), or
- a JOIN keys on the hot value (every edge pointing at a hot canonical
  entity lands in one join partition; AQE skew-join splits help only
  for sort-merge joins above thresholds).

``salt_col`` adds a deterministic salt derived from row content (never
rand() — reruns must reproduce); ``salted_agg`` runs the classic
two-phase aggregate; ``salted_join`` replicates the small side per salt
value so the big side's hot key spreads over n_salt partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(n_salt: int, *content_cols: str) -> Column:
    """Deterministic salt in [0, n_salt): hash of the row's content
    columns (NOT rand() — resume/idempotency require stable salts)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in content_cols]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs_partial: list[Column],
    aggs_final: list[Column],
    n_salt: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → groupBy(key).

    ``aggs_partial`` run in phase 1 (per salt bucket), ``aggs_final``
    combine the buckets. Example (count):
        salted_agg(df, ["k"], [F.count("*").alias("c")],
                   [F.sum("c").alias("c")])
    """
    src = salt_source or key_cols
    phase1 = (
        df.withColumn("_salt", salt_col(n_salt, *src))
        .groupBy(*key_cols, "_salt")
        .agg(*aggs_partial)
    )
    return phase1.groupBy(*key_cols).agg(*aggs_final)


def salted_topn_collect(
    df: DataFrame,
    key_cols: list[str],
    item_col: str,
    n: int = 8,
    n_salt: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Capped adjacency aggregation (the holistic-agg case salting
    exists for): per key, the total item count (``degree``) and the n
    SMALLEST items sorted (``items``) — a deterministic bounded sample,
    never the full list (a hot entity at corpus scale has billions of
    mentioning turns; an uncapped collect_list on its node is a
    one-reducer OOM). Exact: each salt bucket's local sorted top-n is a
    superset of that bucket's contribution to the global top-n.

    Reference analog: per-function callsMethods[]/calledByMethods[]
    adjacency properties (src/modules/ast-parser.ts:398-438), which the
    reference stores uncapped because it is single-process."""
    return salted_agg(
        df,
        key_cols,
        [
            F.count("*").alias("_pc"),
            F.slice(F.array_sort(F.collect_list(item_col)), 1, n).alias("_pl"),
        ],
        [
            F.sum("_pc").alias("degree"),
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_pl"))), 1, n
            ).alias("items"),
        ],
        n_salt=n_salt,
        salt_source=salt_source,
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the big side gets a content-derived salt,
    the small side is replicated once per salt value (explode), and the
    join keys on (key, salt) — a hot key now spreads across n_salt
    partitions instead of one."""
    big_s = big.withColumn("_salt", salt_col(n_salt, *big.columns))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
