"""As-of join operator: hand-crafted semantics cases."""

from __future__ import annotations

import pandas as pd

from hikma_engine_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_asof_basic(spark):
    left = _df(
        spark,
        [(1, "2025-01-01 10:00:00", 100), (1, "2025-01-01 12:00:00", 200),
         (2, "2025-01-01 09:00:00", 300)],
        ["user_id", "ts", "probe"],
    )
    right = _df(
        spark,
        [(1, "2025-01-01 09:30:00", 1.0), (1, "2025-01-01 11:00:00", 2.0),
         (2, "2025-01-01 09:30:00", 9.0)],  # AFTER user 2's probe
        ["user_id", "ts", "ref"],
    )
    out = asof_join(left, right, on="user_id", ts="ts", value_cols=["ref"]).toPandas()
    got = {(r.user_id, r.probe): r.ref for r in out.itertuples()}
    assert got[(1, 100)] == 1.0   # latest prior = 09:30
    assert got[(1, 200)] == 2.0   # latest prior = 11:00
    assert pd.isna(got[(2, 300)])  # no prior reference


def test_asof_inclusive_tie(spark):
    left = _df(spark, [(1, "2025-01-01 10:00:00", 1)], ["user_id", "ts", "probe"])
    right = _df(spark, [(1, "2025-01-01 10:00:00", 7.0)], ["user_id", "ts", "ref"])
    out = asof_join(left, right, on="user_id", ts="ts", value_cols=["ref"]).toPandas()
    assert out.iloc[0].ref == 7.0  # equal timestamps match (inclusive)


def test_asof_tolerance(spark):
    left = _df(spark, [(1, "2025-01-01 10:00:00", 1)], ["user_id", "ts", "probe"])
    right = _df(spark, [(1, "2025-01-01 08:00:00", 7.0)], ["user_id", "ts", "ref"])
    strict = asof_join(
        left, right, on="user_id", ts="ts", value_cols=["ref"], tolerance_sec=3600
    ).toPandas()
    assert pd.isna(strict.iloc[0].ref)  # 2h stale > 1h tolerance
    loose = asof_join(
        left, right, on="user_id", ts="ts", value_cols=["ref"], tolerance_sec=7200
    ).toPandas()
    assert loose.iloc[0].ref == 7.0
