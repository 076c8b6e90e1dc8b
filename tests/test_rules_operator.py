"""Focused equivalence test for operators/rules.py (round-6 AMIE
restructure): the set-based mining stage must reproduce the round-5
row-grain formulation (wedge -> DISTINCT body -> joins) exactly on a
synthetic KB that exercises every branch — duplicate wedge paths that
must collapse in the distinct, a degree-capped hub mid, confirmed and
unconfirmed body pairs, and proposals filtered by existing head facts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hikma_engine_spark.operators.rules import mine_kb_rules, rule_proposals


@pytest.fixture(scope="module")
def kb(spark):
    # predicates: 0, 1, 2; entities: small ints. Two distinct mids (10,
    # 11) connect 1 -> 20 via p=0 ∧ q=1 (duplicate body paths that the
    # distinct grain must collapse); hub 99 exceeds the mid cap and
    # contributes nothing; facts include the head 2(1, 20) so that body
    # pair is confirmed AND excluded from proposals.
    rows = [
        (1, 0, 10), (1, 0, 11),          # p=0 edges into mids
        (10, 1, 20), (11, 1, 20),        # q=1 edges out of mids
        (10, 1, 21),                     # second body pair (1, 21)
        (1, 2, 20),                      # head fact confirming (1, 20)
        (2, 0, 10),                      # second x for body (2, 20)/(2, 21)
        # hub mid 99: in-degree x out-degree over the cap
        (1, 0, 99), (2, 0, 99), (3, 0, 99), (4, 0, 99),
        (99, 1, 30), (99, 1, 31), (99, 1, 32),
    ]
    return spark.createDataFrame(rows, "s long, p int, o long")


def _reference_mine(facts, mid_cap, min_support):
    """The round-5 formulation, verbatim shape."""
    in_d = facts.groupBy(F.col("o").alias("y")).agg(F.count("*").alias("in_n"))
    out_d = facts.groupBy(F.col("s").alias("y")).agg(
        F.count("*").alias("out_n")
    )
    mids = (
        in_d.join(out_d, "y")
        .filter(F.col("in_n") * F.col("out_n") <= mid_cap)
        .select("y")
    )
    f1 = facts.select("p", F.col("s").alias("x"), F.col("o").alias("y"))
    f2 = facts.select(
        F.col("p").alias("q"), F.col("s").alias("y"), F.col("o").alias("z")
    )
    body = (
        f1.join(mids, "y")
        .join(f2, "y")
        .filter(F.col("x") != F.col("z"))
        .select("p", "q", "x", "z")
        .distinct()
    )
    bn = body.groupBy("p", "q").agg(F.count("*").cast("long").alias("body_n"))
    heads = facts.groupBy(F.col("p").alias("r")).agg(
        F.count("*").cast("long").alias("head_n")
    )
    sup = (
        body.join(
            facts.select(
                F.col("p").alias("r"),
                F.col("s").alias("x"),
                F.col("o").alias("z"),
            ),
            ["x", "z"],
        )
        .groupBy("p", "q", "r")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return body, bn, heads, sup


def test_mine_matches_row_grain_reference(kb):
    mid_cap = 10  # hub 99 has in 4 x out 3 = 12 > 10 -> excluded
    kb_mined = mine_kb_rules(kb, mid_cap=mid_cap, min_support=1)
    body, bn, heads, sup = _reference_mine(kb, mid_cap, 1)

    # body grain: exploded bodysets == distinct body rows
    got_body = sorted(
        (r.p, r.q, r.x, r.z)
        for r in kb_mined.bodysets.select(
            F.explode("pqs").alias("pq"), "x", "z"
        )
        .select(F.col("pq.p").alias("p"), F.col("pq.q").alias("q"), "x", "z")
        .collect()
    )
    assert got_body == sorted(
        (r.p, r.q, r.x, r.z) for r in body.collect()
    )
    # the hub mid contributed nothing
    assert all(z not in (30, 31, 32) for (_, _, _, z) in got_body)

    assert sorted(map(tuple, kb_mined.bn.collect())) == sorted(
        map(tuple, bn.collect())
    )
    assert sorted(map(tuple, kb_mined.heads.collect())) == sorted(
        map(tuple, heads.collect())
    )
    assert sorted(map(tuple, kb_mined.sup.collect())) == sorted(
        map(tuple, sup.collect())
    )


def test_proposals_match_left_anti_reference(kb):
    mid_cap = 10
    kb_mined = mine_kb_rules(kb, mid_cap=mid_cap, min_support=1)
    body, bn, _, sup = _reference_mine(kb, mid_cap, 1)
    rules = sup.join(F.broadcast(bn), ["p", "q"]).select(
        "p", "q", "r",
        F.expr("(1000 * support) DIV body_n").cast("long").alias("conf"),
    )
    ref = (
        body.join(F.broadcast(rules), ["p", "q"])
        .join(
            kb.select(
                F.col("p").alias("r"),
                F.col("s").alias("x"),
                F.col("o").alias("z"),
            ),
            ["r", "x", "z"],
            "left_anti",
        )
        .select("p", "q", "r", "x", "z", "conf")
    )
    got = rule_proposals(kb_mined, rules).select(
        "p", "q", "r", "x", "z", "conf"
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # sanity: the confirmed head fact 2(1,20) is NOT proposed
    assert all(
        not (r == 2 and x == 1 and z == 20)
        for (_, _, r, x, z, _) in map(tuple, got.collect())
    )
