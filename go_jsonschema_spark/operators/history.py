"""Anomaly detection over a validation-metrics history.

The checkpoint layer (checkpoint.py) persists per-batch metrics; this
is the op that reads that history back and answers "is today's number
WEIRD relative to this metric's own past?" — the alerting half of a
metrics repository (deequ's anomaly checkers are the public prior
art; the reference validates rows, never trends).

Input is long-format history ``(metric, ts, value)``; the trailing
window is per metric, so thousands of tracked metrics parallelize as
window groups and nothing is ever global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["metric_anomalies", "verdict_regressions"]


def metric_anomalies(
    history: DataFrame,
    *,
    metric_col: str = "metric",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 30,
    k: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """Flag metric observations more than ``k`` trailing standard
    deviations from their trailing mean.

    Per metric, ordered by ``ts``: mean/stddev over the ``window``
    PRECEDING observations (the current row is excluded — an anomaly
    must not mask itself), requiring ``min_history`` prior points
    before judging.  A zero-variance history (constant metric) flags
    ANY deviation — the z-score is NULL there (0/0), so the flag rule
    is ``|value - mean| > k·std OR (std = 0 AND value != mean)``.

    Output: ``(metric, ts, value, mean_trailing, std_trailing, z)``
    for flagged rows only, z rounded to 6 (NULL for the zero-variance
    case).

    Shape: ONE window pass per metric group (the shuffle key is the
    metric name; frames are row-bounded so state is O(window)).  NULL
    values are excluded up front — a missing observation is the
    completeness check's business, not a zero.
    """
    if window < 1 or min_history < 1:
        raise ValueError("metric_anomalies: window and min_history >= 1")
    w = (
        Window.partitionBy(metric_col)
        .orderBy(F.col(ts_col).asc(), F.col(value_col).asc())
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    base = history.filter(
        F.col(metric_col).isNotNull() & F.col(ts_col).isNotNull()
        & v.isNotNull()
    ).select(
        F.col(metric_col).alias("metric"),
        F.col(ts_col).alias("ts"),
        v.alias("value"),
        F.count(v).over(w).alias("n_hist"),
        F.avg(v).over(w).alias("mean_trailing"),
        F.stddev_samp(v).over(w).alias("std_trailing"),
    )
    dev = F.abs(F.col("value") - F.col("mean_trailing"))
    flagged = base.filter(
        (F.col("n_hist") >= min_history)
        & (
            (F.col("std_trailing") > 0)
            & (dev > F.lit(k) * F.col("std_trailing"))
            | (F.col("std_trailing") == 0) & (dev > 0)
        )
    )
    return flagged.select(
        "metric", "ts", "value",
        F.round("mean_trailing", 6).alias("mean_trailing"),
        F.round("std_trailing", 6).alias("std_trailing"),
        F.round(
            F.when(
                F.col("std_trailing") > 0,
                (F.col("value") - F.col("mean_trailing"))
                / F.col("std_trailing"),
            ),
            6,
        ).alias("z"),
    )


def verdict_regressions(store, base_run: str, cur_run: str) -> list[dict]:
    """Run-over-run verdict REGRESSIONS from checkpoint manifests alone
    (the drift_between_runs discipline applied to pass/fail state): for
    every partition present in both runs, report it when the current
    run fails MORE rows (or newly flips to failing) than the baseline
    run — the "what broke since yesterday's delivery" question answered
    without rescanning either dataset.

    Pure driver-side manifest fold (KB of counters); partitions only in
    one run are reported with the other side's counts as None so a
    vanished or brand-new partition is visible rather than silent.

    Returns a list of dicts sorted by partition:
    ``{partition, n_fail_base, n_fail_cur, n_rows_base, n_rows_cur,
    regressed}`` — ``regressed`` is True when cur fails more rows than
    base or the partition newly appeared already-failing.
    """
    def _parts(run_id: str) -> dict[str, dict]:
        out: dict[str, dict] = {}
        for manifest in store.completed(run_id).values():
            for part, m in manifest.get("metrics", {}).items():
                if part.startswith("__"):  # sketch blocks, not partitions
                    continue
                out[part] = m
        return out

    base = _parts(base_run)
    cur = _parts(cur_run)
    rows = []
    for part in sorted(set(base) | set(cur)):
        b, c = base.get(part), cur.get(part)
        regressed = (
            (b is not None and c is not None
             and int(c["n_fail"]) > int(b["n_fail"]))
            or (b is None and c is not None and int(c["n_fail"]) > 0)
        )
        rows.append({
            "partition": part,
            "n_fail_base": None if b is None else int(b["n_fail"]),
            "n_fail_cur": None if c is None else int(c["n_fail"]),
            "n_rows_base": None if b is None else int(b["n_rows"]),
            "n_rows_cur": None if c is None else int(c["n_rows"]),
            "regressed": regressed,
        })
    return rows
