"""AMIE-style 2-hop Horn-rule mining over a dictionary-encoded KB
(Galárraga et al., WWW'13) — the shared mining stage consumed by both
`kg_amie_rules` (rule table) and `kg_rule_apply` (rule-based KB
completion proposals).

Round-6 optimization restructure (guide §2.4 "remove shuffles
outright", §5 "caching when reused"). The round-5 entries re-evaluated
the degree-capped wedge join + DISTINCT `body` subtree once per
consuming branch — twice in kg_amie_rules (body_n, support) and three
times in kg_rule_apply (body_n, support, proposals) — and duplicated
the whole mining pipeline between the two entries. Measured at sf0.1
the wedge emits ~20.7M rows and the distinct body is ~11.1M rows, so
the duplicate evaluation dominated both entries (suite top-2).

The restructure replaces the row-grain distinct body with ONE
aggregation keyed by the join key every downstream consumer needs:

  bodysets  (x, z, pqs = collect_set(struct(p, q)))   [checkpointed]
  rsets     (x, z, rs  = collect_set(p)) over facts   [checkpointed]

Equivalences (facts has no duplicate (s,p,o) rows by construction —
the base-table parts are keyed, the derived parts are DISTINCT):

  body_n(p,q)      = Σ_(x,z) [ (p,q) ∈ pqs(x,z) ]          — exact,
                     collect_set dedups exactly like DISTINCT;
  support(p,q,r)   = Σ_(x,z) [ (p,q) ∈ pqs(x,z) ]·[ r ∈ rs(x,z) ]
                     — the old body ⋈ facts(r,x,z) join counted one
                     row per (body pair, matching fact), and facts
                     holds each (r,x,z) at most once, so the double
                     explode of the two sets reproduces the same
                     multiset;
  proposals        = body pairs with a qualifying rule whose head
                     fact r(x,z) is absent — the old left_anti on
                     (r,x,z) becomes `rs IS NULL OR r ∉ rs`.

Why it is faster: the wedge is evaluated ONCE (localCheckpoint,
memoized per session by the caller) instead of
2-3×; the support join consumes two tables both hash-partitioned by
(x,z) (bodysets by its own aggregation, rsets likewise), so no
re-shuffle of the 11M-row grain; body_n needs no shuffle at all
(explode + map-side-combinable count into a ≤|P|² dim); the proposal
anti-join on the (r,x,z) grain disappears into an array_contains
filter on the already-co-partitioned join. Set order from collect_set
is nondeterministic, which is safe here: every consumer is an
order-insensitive aggregate or membership test.

Scale doctrine is unchanged from round 5: mids are degree-capped
(in·out ≤ mid_cap) so no hub pivots |V|² wedges; pqs is bounded by
|P|² and rs by |P|, so the per-(x,z) arrays can never grow with the
corpus; the persisted grain is the distinct (x,z) pair set, which the
old plan also materialized (as shuffle output, 2-3 times)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MinedKB:
    """Mining intermediates shared by the rule-table and rule-apply
    readouts. `bodysets`/`rsets` are localCheckpoint-materialized
    (scanning checkpointed UnsafeRow blocks measured faster per
    consumer than decoding a columnar persist() cache); `bn`/`heads`/
    `sup` are cheap aggregates over them."""

    bodysets: DataFrame  # (x, z, pqs: array<struct<p,q>>)
    rsets: DataFrame  # (x, z, rs: array<p-code>)
    bn: DataFrame  # (p, q, body_n)
    heads: DataFrame  # (r, head_n)
    sup: DataFrame  # (p, q, r, support) with support >= min_support


def mine_kb_rules(
    facts: DataFrame, *, mid_cap: int, min_support: int
) -> MinedKB:
    """Mine every 2-hop path rule p(x,y) ∧ q(y,z) ⇒ r(x,z) from a
    dictionary-encoded fact table (s, p, o). See module docstring for
    the equivalence and performance argument."""
    in_d = facts.groupBy(F.col("o").alias("y")).agg(
        F.count("*").alias("in_n")
    )
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
    wedges = (
        f1.join(mids, "y")
        .join(f2, "y")
        .filter(F.col("x") != F.col("z"))
        .select("p", "q", "x", "z")
    )
    bodysets = (
        wedges.groupBy("x", "z")
        .agg(F.collect_set(F.struct("p", "q")).alias("pqs"))
        .localCheckpoint(eager=True)
    )
    rsets = (
        facts.groupBy(F.col("s").alias("x"), F.col("o").alias("z"))
        .agg(F.collect_set("p").alias("rs"))
        .localCheckpoint(eager=True)
    )
    bn = (
        bodysets.select(F.explode("pqs").alias("pq"))
        .groupBy(F.col("pq.p").alias("p"), F.col("pq.q").alias("q"))
        .agg(F.count("*").cast("long").alias("body_n"))
    )
    heads = facts.groupBy(F.col("p").alias("r")).agg(
        F.count("*").cast("long").alias("head_n")
    )
    sup = (
        bodysets.join(rsets, ["x", "z"])
        .select(F.explode("pqs").alias("pq"), "rs")
        .select(
            F.col("pq.p").alias("p"),
            F.col("pq.q").alias("q"),
            F.explode("rs").alias("r"),
        )
        .groupBy("p", "q", "r")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return MinedKB(bodysets=bodysets, rsets=rsets, bn=bn, heads=heads, sup=sup)


def rule_proposals(kb: MinedKB, rules: DataFrame) -> DataFrame:
    """Apply qualifying rules: propose head facts r(x,z) for body
    pairs the KB does not contain. `rules` is a tiny (p, q, r, ...)
    dim (≤|P|³ rows) and rides a broadcast; the body/fact tables meet
    on their shared (x, z) partitioning, so the old per-row left_anti
    shuffle on (r, x, z) collapses into an array-membership filter."""
    return (
        kb.bodysets.join(kb.rsets, ["x", "z"], "left")
        .select("x", "z", "rs", F.explode("pqs").alias("pq"))
        .select(
            F.col("pq.p").alias("p"),
            F.col("pq.q").alias("q"),
            "x",
            "z",
            "rs",
        )
        .join(F.broadcast(rules), ["p", "q"])
        .filter(
            F.col("rs").isNull()
            | ~F.array_contains(F.col("rs"), F.col("r"))
        )
    )
