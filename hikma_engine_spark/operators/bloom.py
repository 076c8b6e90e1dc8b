"""Broadcast Bloom-filter semi-join.

At 100 TB the classic semi-join ("keep fact rows whose key is in this
cohort") shuffles the whole fact table on the join key. When the cohort
is small, a Bloom filter does the same reduction SCAN-LOCAL: build a
compact bitmap from the cohort keys (one tiny aggregation), broadcast
it as a single array<long> row, and probe each fact row with pure bit
arithmetic inside whole-stage codegen — no fact-side shuffle at all,
exactly the runtime-filter pattern Spark's own
`spark.sql.optimizer.runtime.bloomFilter` injects, built here from
plain Column expressions so the filter's soundness (zero false
negatives) and false-positive rate are checkable in-plan against the
exact join.

Engine-portable hashing (the DuckDB oracle must replay bit-for-bit):
``h_i(x) = (((x % P) * A_i + B_i) % P) % m`` with P = 2^31 − 1 and
A_i < 2^31 — every intermediate stays under 2^62, so neither Spark's
silent 64-bit wrap nor DuckDB's overflow error can ever fire. Words
hold 32 bits each so every bitmap value stays positive (bit 63 never
set — `1 << 63` is engine-divergent territory).

Reference analog: the reference's semi-join intersections
(hikma-engine search-service filters); the Bloom layer is the Spark-
scale path for them. Sizing: m/n ≥ 16 with k = 4 keeps FPR < 0.3%; in
production derive n from an HLL count of the cohort before choosing m.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1 (prime)
# (A_i, B_i) pairs; A_i < 2^31 keeps (x % P) * A_i < 2^62
HASHES = (
    (1103515245, 12345),
    (1299709, 7919),
    (1000003, 65537),
    (40503, 2749),
)
WORD_BITS = 32  # 32 bits per array<long> word: values stay positive


def _pos(key: Column, i: int, m: int) -> Column:
    a, b = HASHES[i]
    return ((key % P) * a + b) % P % m


def _pos_sql(expr: str, i: int, m: int) -> str:
    a, b = HASHES[i]
    return f"(((({expr}) % {P}) * {a} + {b}) % {P}) % {m}"


def bloom_build(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """One-row DataFrame with column ``bf``: a dense array<long> of
    2^m_bits / 32 words. Explode k positions per key, OR bits per
    word (map-side combinable), left-join the full word domain so the
    array indexes densely, assemble order-independently via
    array_sort(collect_list(struct)). The build is one tiny shuffle
    over ≤ k·n positions — the fact table never participates."""
    if k > len(HASHES):
        raise ValueError(f"k={k} exceeds the {len(HASHES)} hash constants")
    m = 1 << m_bits
    n_words = m >> 5
    pos = keys.select(
        F.explode(
            F.array(*[_pos(F.col(key_col), i, m) for i in range(k)])
        ).alias("p")
    )
    # pyspark's shiftleft() only takes a literal numBits — the
    # column-valued shift goes through an expr (still codegen'd)
    words = pos.select(
        F.shiftright("p", 5).alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT))").alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("v"))
    dom = keys.sparkSession.range(n_words).select(F.col("id").alias("w"))
    dense = dom.join(words, "w", "left").select(
        "w", F.coalesce("v", F.lit(0).cast("long")).alias("v")
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("w", "v"))).alias("s")
    ).select(F.transform("s", lambda x: x.getField("v")).alias("bf"))


def bloom_hit(key: str, bf: str, m_bits: int, k: int) -> Column:
    """Boolean probe: all k hashed bits set in the broadcast bitmap —
    k element_at lookups + bit tests, fully inside codegen. Takes
    column NAMES (the column-valued shift amount forces expr form —
    pyspark's shiftleft() only accepts a literal numBits)."""
    m = 1 << m_bits
    tests = []
    for i in range(k):
        a, b = HASHES[i]
        p = f"(((({key}) % {P}) * {a} + {b}) % {P}) % {m}"
        tests.append(
            f"(element_at({bf}, CAST(shiftright({p}, 5) AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) & 31 AS INT))) != 0"
        )
    return F.expr("(" + " AND ".join(tests) + ")")


def bloom_build_sql(keys_cte: str, key_expr: str, m_bits: int, k: int) -> str:
    """DuckDB CTE chain ending at ``bf(bf)`` — the exact twin of
    ``bloom_build`` (same hashes, same 32-bit words, same dense
    order-by-word list)."""
    m = 1 << m_bits
    n_words = m >> 5
    pos_selects = "\n          UNION ALL ".join(
        f"SELECT {_pos_sql(key_expr, i, m)} AS p FROM {keys_cte}"
        for i in range(k)
    )
    return f"""pos AS (
          {pos_selects}
        ),
        words AS (
          SELECT p >> 5 AS w, bit_or(CAST(1 AS BIGINT) << CAST(p & 31 AS INT)) AS v
          FROM pos GROUP BY p >> 5
        ),
        dense AS (
          SELECT g.w AS w, COALESCE(words.v, 0) AS v
          FROM (SELECT unnest(range(0, {n_words})) AS w) g
          LEFT JOIN words ON g.w = words.w
        ),
        bf AS (SELECT list(v ORDER BY w) AS bf FROM dense)"""


def bloom_hit_sql(key_expr: str, m_bits: int, k: int) -> str:
    """SQL boolean twin of ``bloom_hit`` (expects the ``bf`` row in
    scope, e.g. via a CROSS JOIN on the bf CTE)."""
    m = 1 << m_bits
    tests = []
    for i in range(k):
        p = _pos_sql(key_expr, i, m)
        tests.append(
            f"(bf[CAST(({p}) >> 5 AS INT) + 1]"
            f" & (CAST(1 AS BIGINT) << CAST(({p}) & 31 AS INT))) != 0"
        )
    return "(" + " AND ".join(tests) + ")"
