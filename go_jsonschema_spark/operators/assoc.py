"""Association rules over item baskets: support / confidence / lift.

The market-basket view of an event log: which event types co-occur in
the same session (or which tags/labels co-occur on a document) more
than chance — the complement of the SEQUENTIAL transition matrix
(funnel.py `event_transitions`), which cares about order; association
rules care about co-presence.

Relational shape: distinct (basket, item) pairs (one map-side-combined
aggregation), a within-basket self-join on ``item_a < item_b`` — the
join key is the BASKET id, and each basket's side is its own distinct
item list, so the per-basket join output is bounded by |items|²/2
(tiny: event types, tags), never rows² — then one count aggregation
over the pair space and broadcast-joined per-item supports.  Nothing
row-scaled beyond the two aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: float = 0.0,
) -> DataFrame:
    """Pairwise association rules over ``(basket, item)`` rows.

    For every unordered item pair {a, b} (emitted once, ``a < b``):

        support(a,b) = n_ab / N        (N = number of baskets)
        conf(a→b)    = n_ab / n_a,  conf(b→a) = n_ab / n_b
        lift         = support(a,b) / (supp_a · supp_b)

    Lift > 1: the pair co-occurs more than independence predicts.
    ``min_support`` prunes the pair table BEFORE the stats join (the
    Apriori observation: low-support pairs can't make high-support
    anything).  Items are compared as strings; NULL items are dropped.

    Output: ``(item_a, item_b, n_ab, support, conf_a_to_b, conf_b_to_a,
    lift)``, floats rounded to 6.
    """
    items = (
        df.select(
            F.col(basket_col).alias("b"),
            F.col(item_col).cast("string").alias("i"),
        )
        .where(F.col("i").isNotNull())
        .distinct()
    )
    n_baskets = items.select("b").distinct().count()
    if n_baskets == 0:
        raise ValueError("association_rules: no baskets")
    counts = items.groupBy("i").agg(F.count(F.lit(1)).alias("n_i"))
    l = items.select("b", F.col("i").alias("item_a"))
    r = items.select("b", F.col("i").alias("item_b"))
    pairs = (
        l.join(r, "b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") / n_baskets >= min_support)
    )
    ca = counts.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))
    cb = counts.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ca), "item_a").join(F.broadcast(cb), "item_b")
    )
    n = float(n_baskets)
    return out.select(
        "item_a", "item_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.round(F.col("n_ab") / n, 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_a_to_b"),
        F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_b_to_a"),
        F.round(
            (F.col("n_ab") / n) / ((F.col("n_a") / n) * (F.col("n_b") / n)),
            6,
        ).alias("lift"),
    )
