"""Regular-grid time-series resampling with gap filling.

Raw event streams have holes; training curves, drift dashboards and
downstream window functions all want a DENSE regular grid.  ``resample``
buckets events onto a fixed step, aggregates once, then left-joins the
aggregates onto a generated spine so EMPTY buckets exist as rows, with
per-column fill policies:

* ``"zero"`` — missing buckets get 0 (counts/sums),
* ``"prev"`` — forward fill from the last observed bucket (gauges),
* ``"linear"`` — linear interpolation between the neighbouring observed
  buckets (NULL before the first / after the last observation),
* ``"null"`` — keep the hole visible.

Scale shape: ONE aggregation shuffle over the events (map-side
combined); the spine is ``(range_span / step)`` rows generated from a
two-value driver aggregate — never row-scaled — and the fills are
window functions over the SPINE (tiny), partitioned by group.  With
``group_col`` the spine is cross-joined per distinct group, so every
group covers the same grid (what a training-mix dashboard wants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["resample"]


def resample(
    df: DataFrame,
    *,
    ts_col: str,
    step_seconds: int,
    aggs: dict[str, tuple[Column, str]],
    group_col: str | None = None,
) -> DataFrame:
    """Resample ``df`` onto a dense ``step_seconds`` grid.

    ``aggs`` maps output column name → ``(aggregate expression, fill)``
    with fill one of ``zero | prev | linear | null``.  Returns
    ``(bucket_ts[, group_col], *aggs)`` sorted-free (callers order).
    """
    for name, (_, fill) in aggs.items():
        if fill not in ("zero", "prev", "linear", "null"):
            raise ValueError(f"resample: {name}: unknown fill {fill!r}")

    ts = F.col(ts_col).cast("timestamp")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / step_seconds).cast("long")
        * step_seconds)
    src = df.filter(ts.isNotNull()).withColumn("__b__", bucket)

    agged = src.groupBy(
        *(["__b__", group_col] if group_col else ["__b__"])
    ).agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])

    # spine bounds: a two-value aggregate, never row-scaled
    lo, hi = src.agg(F.min("__b__"), F.max("__b__")).first()
    if lo is None:
        return agged.withColumnRenamed("__b__", "bucket_ts").limit(0)
    spark = df.sparkSession
    spine = spark.range(1).select(
        F.explode(F.sequence(
            F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"),
            F.expr(f"INTERVAL {int(step_seconds)} SECOND"),
        )).alias("__b__"))
    if group_col:
        spine = spine.crossJoin(
            F.broadcast(src.select(group_col).distinct()))

    keys = ["__b__"] + ([group_col] if group_col else [])
    dense = spine.join(agged, keys, "left")

    part = [group_col] if group_col else [F.lit(1)]
    w_back = (Window.partitionBy(*part).orderBy("__b__")
              .rowsBetween(Window.unboundedPreceding, 0))
    w_fwd = (Window.partitionBy(*part).orderBy("__b__")
             .rowsBetween(0, Window.unboundedFollowing))

    out = dense
    for name, (_, fill) in aggs.items():
        v = F.col(name)
        if fill == "zero":
            out = out.withColumn(name, F.coalesce(v, F.lit(0)))
        elif fill == "prev":
            out = out.withColumn(name, F.last(v, ignorenulls=True)
                                 .over(w_back))
        elif fill == "linear":
            has = v.isNotNull()
            t = F.unix_timestamp("__b__")
            pv = F.last(F.when(has, v), ignorenulls=True).over(w_back)
            pt = F.last(F.when(has, t), ignorenulls=True).over(w_back)
            nv = F.first(F.when(has, v), ignorenulls=True).over(w_fwd)
            nt = F.first(F.when(has, t), ignorenulls=True).over(w_fwd)
            interp = F.when(has, v.cast("double")).otherwise(
                F.when(
                    pv.isNotNull() & nv.isNotNull(),
                    pv + (nv - pv) * (t - pt) / (nt - pt),
                ))
            out = out.withColumn(name, interp)
    return out.withColumnRenamed("__b__", "bucket_ts")
