"""Distribution-drift checks: KS statistic and PSI over binned histograms.

Not a reference capability (SURVEY.md §2.8) and not a Catalyst builtin
(SURVEY.md §4.3): the engine computes a **binned histogram** with one
groupBy over the numeric column (map-side combinable, tiny result ≈ n_bins
rows), then the KS / PSI math runs driver-side on the two histograms —
O(bins), never O(rows).  Baselines are persisted as plain tables
(``ntok_baseline(bucket, count, snapshot_id)``, FIXTURES.md §1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["histogram", "DriftReport", "ks_statistic", "psi", "drift_check",
           "psi_per_window", "js_divergence", "benford_digits"]


def histogram(df: DataFrame, column: str, *, bucket_width: float) -> DataFrame:
    """Fixed-width binned histogram ``(bucket, count)``; bucket = floor(x/w).

    One narrow-scan aggregate; NULLs excluded (they are the null-count
    stat's job, stats.py)."""
    return (
        df.filter(F.col(column).isNotNull())
        .groupBy(
            F.floor(F.col(column) / F.lit(float(bucket_width))).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )


@dataclass
class DriftReport:
    ks: float
    psi: float
    n_current: int
    n_baseline: int
    passed: bool


def _aligned(cur: dict[int, int], base: dict[int, int]):
    buckets = sorted(set(cur) | set(base))
    nc = sum(cur.values()) or 1
    nb = sum(base.values()) or 1
    pc = [cur.get(b, 0) / nc for b in buckets]
    pb = [base.get(b, 0) / nb for b in buckets]
    return pc, pb, nc, nb


def ks_statistic(cur: dict[int, int], base: dict[int, int]) -> float:
    """Two-sample KS statistic over binned data: max |ECDF_cur - ECDF_base|."""
    pc, pb, _, _ = _aligned(cur, base)
    d = 0.0
    cc = cb = 0.0
    for x, y in zip(pc, pb):
        cc += x
        cb += y
        d = max(d, abs(cc - cb))
    return d


def psi(cur: dict[int, int], base: dict[int, int], *, eps: float = 1e-6) -> float:
    """Population Stability Index: Σ (p_c - p_b) · ln(p_c / p_b)."""
    pc, pb, _, _ = _aligned(cur, base)
    total = 0.0
    for x, y in zip(pc, pb):
        x = max(x, eps)
        y = max(y, eps)
        total += (x - y) * math.log(x / y)
    return total


def psi_per_window(
    hist: DataFrame,
    baseline: DataFrame,
    *,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI per event-time window, fully native — the batch drift pass
    over a (streamed or batch) per-window histogram sink.

    ``hist``: ``(window_start, bucket, count)`` — e.g. the materialized
    :func:`~go_jsonschema_spark.streaming.validate.stream_histogram`
    sink.  ``baseline``: a static ``(bucket, count)`` histogram (tiny —
    collected once and broadcast as per-bucket probabilities).  Buckets
    are aligned per window over the UNION of window and baseline buckets
    (same semantics as :func:`psi`: missing mass clamps to ``eps`` on
    either side).  Everything is O(windows × bins) — broadcast joins,
    no shuffle of anything row-scaled.  Returns
    ``(window_start, n_rows, psi)``."""
    import pandas as pd

    spark = hist.sparkSession
    rows = baseline.select("bucket", "count").collect()
    nb = sum(int(r["count"]) for r in rows) or 1
    # pandas + Arrow path: half the round-trip cost of the pickled-rows
    # parallelize for this tiny driver-local table (measured r7)
    pb = spark.createDataFrame(pd.DataFrame({
        "bucket": pd.Series([int(r["bucket"]) for r in rows],
                            dtype="int64"),
        "pb": pd.Series([int(r["count"]) / nb for r in rows],
                        dtype="float64"),
    }))
    wins = hist.select("window_start").distinct()
    # skeleton: every baseline bucket present in every window, so a
    # bucket the window never saw still contributes its (eps - pb) term
    skel = wins.crossJoin(F.broadcast(pb))
    cur = hist.groupBy("window_start", "bucket").agg(
        F.sum("count").alias("c"))
    j = skel.join(cur, ["window_start", "bucket"], "full_outer").select(
        "window_start",
        F.coalesce("pb", F.lit(0.0)).alias("pb"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    n = j.groupBy("window_start").agg(F.sum("c").alias("n"))
    jn = j.join(F.broadcast(n), "window_start")
    pc_e = F.greatest(F.col("c") / F.col("n"), F.lit(eps))
    pb_e = F.greatest(F.col("pb"), F.lit(eps))
    term = (pc_e - pb_e) * F.log(pc_e / pb_e)
    return (
        jn.groupBy("window_start", "n")
        .agg(F.sum(term).alias("psi"))
        .select("window_start", F.col("n").cast("long").alias("n_rows"),
                "psi")
    )


def drift_check(
    df: DataFrame,
    column: str,
    baseline: DataFrame,
    *,
    bucket_width: float,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> DriftReport:
    """Compare ``df[column]``'s histogram against a baseline histogram table
    ``(bucket, count)``.  Triggers two tiny collects (n_bins rows each)."""
    cur = {
        int(r["bucket"]): int(r["count"])
        for r in histogram(df, column, bucket_width=bucket_width).collect()
    }
    base = {
        int(r["bucket"]): int(r["count"])
        for r in baseline.select("bucket", "count").collect()
    }
    ks = ks_statistic(cur, base)
    p = psi(cur, base)
    return DriftReport(
        ks=ks,
        psi=p,
        n_current=sum(cur.values()),
        n_baseline=sum(base.values()),
        passed=(ks <= ks_threshold and p <= psi_threshold),
    )


def js_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    *,
    bucket_width: float,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between two samples of
    ``column`` over shared fixed-width bins — the SYMMETRIC, bounded
    (≤ ln 2) drift number that completes the KS/PSI family: KS sees the
    worst CDF gap, PSI explodes on empty bins, JS degrades gracefully
    (zero-mass bins contribute 0 — no epsilon clamping).

        JS = ½·KL(P‖M) + ½·KL(Q‖M),  M = (P+Q)/2

    Fully native end-to-end: one map-side-combined histogram aggregation
    per side (tiny ≈ n_bins results), a full-outer bucket align, and the
    KL terms as a projection + final sum over the bin table.  Nothing
    row-scaled ever shuffles or reaches the driver.

    Output: one row ``(js, n_a, n_b, n_buckets)``, js rounded to 6.
    """
    ha = histogram(df_a, column, bucket_width=bucket_width)
    hb = histogram(df_b, column, bucket_width=bucket_width)
    j = (
        ha.withColumnRenamed("count", "ca")
        .join(hb.withColumnRenamed("count", "cb"), "bucket", "full_outer")
        .select(
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    tots = j.select(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    t = j.crossJoin(F.broadcast(tots)).select(
        "na", "nb",
        (F.col("ca") / F.col("na")).alias("p"),
        (F.col("cb") / F.col("nb")).alias("q"),
    ).withColumn("m", (F.col("p") + F.col("q")) / 2)
    # 0·ln(0/m) := 0 — when() gates the log away from zero mass
    kl_p = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / F.col("m"))).otherwise(0.0)
    kl_q = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / F.col("m"))).otherwise(0.0)
    return t.agg(
        F.round(F.sum((kl_p + kl_q) / 2), 6).alias("js"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


def benford_digits(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit conformance vs Benford's law — the
    fraud/corruption smoke test for any naturally-multiplicative
    magnitude column (prices, populations, token counts): digit d
    should appear with probability log10(1 + 1/d).

    Output: exactly 9 rows ``(digit, n, share, expected, abs_dev)`` —
    observed count/share per first digit 1-9 (missing digits emit
    n=0 via a 9-row spine), Benford's expected share, and
    ``|share - expected|``; ``sum(abs_dev)/9`` is the MAD statistic
    (conformance thresholds: Nigrini's 0.006/0.012/0.015 ladder).

    Shape: one map-side-combined 9-group aggregation over the scan —
    the only shuffle carries ≤ 9 rows per map task.  NULLs and zeros
    carry no first digit and are excluded; negatives contribute
    |value|.  The digit comes from ``floor(log10|x|)`` with an
    explicit mantissa re-normalization (``m<1 → ×10``, ``m≥10 →
    /10``), so an off-by-one-ulp ``log10`` at a power-of-10 boundary
    still yields the same digit in any IEEE engine — the property the
    DuckDB oracle replay depends on.
    """
    x = F.abs(F.col(column).cast("double"))
    p = F.floor(F.log10(x))
    m = x / F.pow(F.lit(10.0), p.cast("double"))
    m = F.when(m < 1, m * 10).when(m >= 10, m / 10).otherwise(m)
    digit = F.floor(m).cast("int")
    counts = (
        df.filter(F.col(column).isNotNull() & (x > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    spine = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    total = F.sum("n").over(Window.partitionBy())
    filled = spine.join(counts, on="digit", how="left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    expected = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
    return (
        filled.select(
            "digit",
            "n",
            F.round(F.col("n") / total, 6).alias("share"),
            expected.alias("expected"),
        )
        .select(
            "digit", "n", "share", "expected",
            F.round(F.abs(F.col("share") - F.col("expected")), 6)
            .alias("abs_dev"),
        )
        .orderBy("digit")
    )
