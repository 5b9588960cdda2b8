"""Ordered funnel analysis: how many users complete step1 → step2 → …
in event-time order.

Semantics: a user completes step k at the EARLIEST event of that type
STRICTLY after their step-(k-1) completion (strict ``>`` so equal-
timestamp events can't chain, which also makes the greedy scan below
provably equal to the sequential min-timestamp formulation an external
SQL engine computes).

Execution: one shuffle (groupBy user), then a NATIVE state machine — the
user's events are collected, sorted, and folded with ``F.aggregate``,
advancing a (steps-completed, last-ts) accumulator per event.  No Python
anywhere; per-user state is the user's own event list (fine for
behavioral data where per-user cardinality is bounded — for pathological
users cap upstream with
:func:`~go_jsonschema_spark.operators.sampling.cap_per_group`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel_users", "funnel_counts", "event_transitions"]


def funnel_users(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel depth: ``(user_col, n_steps)`` where ``n_steps``
    is how many consecutive funnel steps the user completed in strict
    event-time order (0..len(steps))."""
    if not steps:
        raise ValueError("funnel_users: empty step list")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    k = len(steps)

    evs = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias("ts"), F.col(event_col).alias("event"))))

    def _advance(acc, x):
        nxt = F.element_at(steps_arr, (acc["n"] + 1).cast("int"))
        hit = (
            (acc["n"] < k)
            & (x["event"] == nxt)
            & (acc["last"].isNull() | (x["ts"] > acc["last"]))
        )
        return F.struct(
            F.when(hit, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            F.when(hit, x["ts"]).otherwise(acc["last"]).alias("last"),
        )

    acc0 = F.struct(
        F.lit(0).alias("n"),
        F.lit(None).cast("timestamp").alias("last"),
    )
    return (
        df.filter(F.col(ts_col).isNotNull()
                  & F.col(event_col).isin(steps))
        .groupBy(user_col)
        .agg(evs.alias("__evs__"))
        .select(
            user_col,
            F.aggregate(F.col("__evs__"), acc0, _advance)["n"]
            .alias("n_steps"),
        )
    )


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: one row per step with the number of users whose
    funnel depth reaches it — ``(step_idx, step, n_users)``, step_idx
    1-based.  Per-user depths first collapse to ≤ len(steps)+1 depth
    histogram rows (map-side combined), so the inequality join against
    the step list touches only O(k²) tiny rows — never per-user rows."""
    depths = funnel_users(df, steps, user_col=user_col, ts_col=ts_col,
                          event_col=event_col)
    by_depth = depths.groupBy("n_steps").agg(
        F.count(F.lit(1)).alias("c"))
    spark = df.sparkSession
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string")
    return (
        steps_df.join(by_depth, F.col("n_steps") >= F.col("step_idx"),
                      "left")
        .groupBy("step_idx", "step")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: for every ordered pair of CONSECUTIVE events of one user,
    count ``(from_type, to_type)`` and normalize per source state —
    the behavioral-analytics companion of :func:`funnel_users`
    (funnels test ONE hypothesized path; the transition matrix surveys
    every observed hop).

    Event order is total and engine-independent: ``(ts, tiebreak_col)``
    — without the tiebreak, equal-timestamp events would make ``lead``
    nondeterministic and the result engine-dependent.

    Shape: ONE user-keyed shuffle for the lead window (the same
    partitioning sessionization uses), then the pair aggregation
    map-side-combines into the |types|² transition table — tiny by
    construction — whose per-source normalization is a window over
    that tiny table, not the events.  NULL types and each user's last
    event (no successor) drop out.

    Output: ``(from_type, to_type, n, p)``, ``p`` rounded to 6.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.where(F.col(type_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("__to__", F.lead(type_col).over(w))
        .where(F.col("__to__").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("__to__").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wn), 6)
    )
