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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash space size for the portable 48-bit md5 hash (12 hex chars)
HASH_SPACE = 1 << 48


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


# ---------- KMV (k-minimum-values) set-overlap sketch ----------

def portable_hash48(item: Column) -> Column:
    """Element → uniform 48-bit integer, identical in Spark
    (`conv(substring(md5(x),1,12),16,10)`) and DuckDB
    (`CAST('0x'||substr(md5(x),1,12) AS BIGINT)`): the property that
    lets the oracle twin replay KMV ESTIMATES exactly, not just exact
    counts (same cross-engine trick as `_bucket` / `a_topk_sketch`).
    Collision rate n²/2^49 — ~3e-5 at 10^5 distinct elements — is the
    standard KMV hash-identity assumption (Beyer et al. 2007)."""
    return F.conv(F.substring(F.md5(item), 1, 12), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    set_col: str,
    item_col: str,
    k: int = 256,
    distinct_safety: int = 8,
) -> DataFrame:
    """Per-set KMV sketch: the k smallest DISTINCT 48-bit hashes of
    ``item_col``, as rows ``(s, h, rn)`` with rn = 1..k ascending
    (Beyer et al. 2007, "On synopses for distinct-value estimation
    under multiset operations" — the public KMV/AKMV construction).

    The sketch is the O(k)-state answer to set cardinality / overlap
    at corpus scale: |S| ≈ (k−1)·M / h_k, two sketches UNION by
    re-taking the k smallest of their union, and Jaccard(A,B) ≈
    |union_sketch ∩ A_sketch ∩ B_sketch| / k — so cross-corpus overlap
    (train-vs-benchmark contamination) needs only 2·k rows, never the
    corpora.

    Scale shape — Spark has no bounded-state top-k aggregate, so the
    naive per-set k-min (window over ALL rows, or collect_list) sorts
    the full element stream. Instead, two bounded passes:

    1. per-set `approx_count_distinct` (HLL — O(1) mergeable state)
       estimates n̂; a hash THRESHOLD t = safety·k·M/n̂ is broadcast
       back. Uniform hashes ⇒ expected survivors = safety·k per set;
       P[true h_k > t] ≤ exp(−k·(safety−1)²/(2·safety)) (Chernoff) —
       ~1e-100 at safety 8, and the 5% HLL rsd moves it negligibly.
    2. `h < t` filters AT THE SCAN (pushed down — the full stream
       never shuffles); the ~safety·k survivors per set deduplicate
       and rank by a per-set window that now sorts thousands of rows,
       not 10^12.

    The threshold failure mode is self-checking downstream: a sketch
    with fewer than min(k, n_distinct) rows is detectably short — the
    overlap entry's oracle twin computes sketches from the exact
    element sets, so any short sketch hash-mismatches.
    """
    base = df.select(
        F.col(set_col).alias("s"),
        portable_hash48(F.col(item_col)).alias("h"),
    )
    counts = base.groupBy("s").agg(
        F.approx_count_distinct("h", 0.05).alias("nd")
    )
    thr = F.least(
        F.lit(HASH_SPACE),
        (F.lit(int(distinct_safety * k) * HASH_SPACE)
         / F.greatest(F.col("nd"), F.lit(1))).cast("long"),
    )
    surv = (
        base.join(F.broadcast(counts.select("s", thr.alias("thr"))), "s")
        .filter(F.col("h") < F.col("thr"))
        .select("s", "h")
        .distinct()
    )
    w = Window.partitionBy("s").orderBy("h")
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_overlap(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Two KMV sketches (rows ``(h, rn)``) → one row of integer-exact
    overlap estimators (all arithmetic is BIGINT so the DuckDB twin
    reproduces every value bit-for-bit; M = 2^48):

    - ``est_a``/``est_b``   : (k−1)·M DIV h_k         (|A|, |B|)
    - ``est_union``         : same over the union sketch (k smallest
                              of A_sketch ∪ B_sketch)
    - ``n_common``          : |union_sketch ∩ A_sketch ∩ B_sketch|
    - ``est_common``        : n_common·est_union DIV k (|A∩B|)
    - ``jaccard_ppm``       : n_common·10^6 DIV k
    A sketch with fewer than k rows means the set had < k distinct
    hashes — the sketch IS the set, so the estimate falls back to the
    exact row count. Everything here runs over ≤ 3·k rows; the
    corpora are never touched."""
    ua = sk_a.select("h")
    ub = sk_b.select("h")
    wu = Window.orderBy("h")
    union_sk = (
        ua.union(ub).distinct()
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
    )
    common = (
        union_sk.join(ua, "h", "left_semi")
        .join(ub, "h", "left_semi")
        .agg(F.count("*").alias("n_common"))
    )

    def card_est(sk: DataFrame, name: str) -> DataFrame:
        return sk.agg(
            F.when(
                F.count("*") < k, F.count("*")
            ).otherwise(
                F.expr(f"{(k - 1) * HASH_SPACE} DIV max(CASE WHEN rn = {k} THEN h END)")
            ).alias(name)
        )

    out = (
        card_est(sk_a, "est_a")
        .crossJoin(F.broadcast(card_est(sk_b, "est_b")))
        .crossJoin(F.broadcast(card_est(union_sk, "est_union")))
        .crossJoin(F.broadcast(common))
    )
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        "n_common",
        F.expr(f"n_common * est_union DIV {k}").alias("est_common"),
        F.expr(f"n_common * 1000000 DIV {k}").alias("jaccard_ppm"),
    )
