"""Streaming validation: the compiled constraint plan over readStream.

The row predicates compiled by compile.py are STATELESS Column expressions,
so they apply to a streaming DataFrame unchanged — the one engine serves
batch and streaming (the reference has no streaming at all, SURVEY.md
§2.8; this is a north-star addition built on Structured Streaming).

* :func:`stream_violations` — per-record violations stream (append mode).
* :func:`windowed_verdicts` — event-time-windowed pass/fail aggregation
  with a watermark for late data.

Dataset-level checks over unbounded input need key-scoped state:

* :func:`stream_duplicate_keys` — running duplicate-key counts via
  ``applyInPandasWithState`` (duplicate EMISSION, not suppression).
* :func:`dedup_stream` — watermark-bounded duplicate SUPPRESSION.
* :func:`stream_fk_violations` — stateless stream-static anti-join.
* :func:`stream_histogram` — per-window binned histograms; drift (PSI)
  against a static baseline then runs as a batch transform over the sink
  (:func:`~go_jsonschema_spark.operators.drift.psi_per_window`) — chained
  streaming aggregations are not expressible, and the histogram is the
  right sink granularity anyway (windows × bins rows, replayable).

Exact global uniqueness over a truly unbounded key domain still grows
state with distinct keys (one counter per key here); at 10^12 scale the
recommended pattern remains periodic batch reconciliation over the sink
table, with the streaming check as the low-latency early warning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_jsonschema_spark.engine import ConstraintSuite


def _checked(suite: ConstraintSuite, stream: DataFrame):
    plan = suite.compile(stream)
    ids = [cid for cid, _ in plan.predicates]
    safe = {cid: f"__c{i}__" for i, cid in enumerate(ids)}
    out = stream.select(
        "*", *[p.alias(safe[cid]) for cid, p in plan.predicates]
    )
    import functools
    import operator

    pass_col = (
        functools.reduce(operator.and_, [F.col(safe[cid]) for cid in ids])
        if ids
        else F.lit(True)
    )
    return out.withColumn("__pass__", pass_col), plan, ids, safe


def stream_violations(suite: ConstraintSuite, stream: DataFrame) -> DataFrame:
    """Append-mode violations stream ``(doc_id, constraint_id, observed)``
    — attach ``.writeStream`` to sink it."""
    checked, plan, ids, safe = _checked(suite, stream)
    entries = [
        F.when(
            ~F.col(safe[cid]),
            F.struct(
                F.lit(cid).alias("constraint_id"),
                plan.observed[cid].alias("observed"),
            ),
        )
        for cid in ids
    ]
    return (
        checked.filter(~F.col("__pass__"))
        .select(
            F.col(suite.key).cast("string").alias("doc_id"),
            F.explode(
                F.filter(F.array(*entries), lambda x: x.isNotNull())
            ).alias("v"),
        )
        .select("doc_id", "v.constraint_id", "v.observed")
    )


def stream_fk_violations(
    stream: DataFrame,
    column: str,
    dim: DataFrame,
    dim_column: str | None = None,
    *,
    key: str = "doc_id",
    constraint_id: str | None = None,
) -> DataFrame:
    """Streaming referential check: stream rows whose ``column`` has no
    match in the STATIC dimension — a stateless broadcast left-anti join,
    so it runs per micro-batch with no state store at all (the dimension
    is broadcast once per batch; Structured Streaming supports
    stream-static joins natively)."""
    dc = dim_column or dim.columns[0]
    cid = constraint_id or f"fk:{column}"
    missing = stream.join(
        F.broadcast(dim.select(F.col(dc).alias("__dim__")).distinct()),
        F.col(column) == F.col("__dim__"),
        "left_anti",
    )
    return missing.select(
        F.col(key).cast("string").alias("doc_id"),
        F.lit(cid).alias("constraint_id"),
        F.col(column).cast("string").alias("observed"),
    )


def stateful_group_verdicts(
    suite: ConstraintSuite, stream: DataFrame, *, group_col: str
) -> DataFrame:
    """Custom stateful streaming operator: RUNNING per-group verdict
    counters across micro-batches via ``applyInPandasWithState`` —
    arbitrary state the built-in windowed aggregation can't express
    (cumulative totals over the whole stream lifetime, no window).

    Output (update mode): one row per group per batch with the running
    ``(n_rows, n_fail)`` totals."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    checked, _, _, _ = _checked(suite, stream)
    slim = checked.select(group_col, F.col("__pass__").alias("ok"))

    def update(key, pdfs, state: GroupState):
        n_rows, n_fail = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_rows += len(pdf)
            n_fail += int((~pdf["ok"]).sum())
        state.update((n_rows, n_fail))
        yield pd.DataFrame(
            {"group": [key[0]], "n_rows": [n_rows], "n_fail": [n_fail]}
        )

    return slim.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType="group string, n_rows long, n_fail long",
        stateStructType="n_rows long, n_fail long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_group_verdicts_tws(
    suite: ConstraintSuite, stream: DataFrame, *, group_col: str
) -> DataFrame:
    """Running per-group verdict counters via ``transformWithStateInPandas``
    — the Spark 4 stateful-processor API (successor of
    applyInPandasWithState: multiple named state variables, timers, state
    TTL; requires the RocksDB state store provider:
    ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` AND the ``protobuf`` Python package —
    absent in this sandbox, so the gated test skips and
    :func:`stateful_group_verdicts` is the working fallback).  Output
    mirrors :func:`stateful_group_verdicts`."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    checked, _, _, _ = _checked(suite, stream)
    slim = checked.select(group_col, F.col("__pass__").alias("ok"))

    class Counters(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getValueState(
                "counts", "n_rows long, n_fail long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n_rows, n_fail = (
                self._counts.get() if self._counts.exists() else (0, 0)
            )
            for pdf in rows:
                n_rows += len(pdf)
                n_fail += int((~pdf["ok"]).sum())
            self._counts.update((n_rows, n_fail))
            yield pd.DataFrame(
                {"group": [key[0]], "n_rows": [n_rows], "n_fail": [n_fail]}
            )

        def close(self) -> None:
            pass

    return slim.groupBy(group_col).transformWithStateInPandas(
        statefulProcessor=Counters(),
        outputStructType="group string, n_rows long, n_fail long",
        outputMode="Update",
        timeMode="None",
    )


def stream_histogram(
    stream: DataFrame,
    column: str,
    *,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Per-event-time-window binned histogram ``(window, bucket, count)``
    — the streaming feed for drift detection.  ONE streaming aggregation
    (map-side combinable; state is windows × bins counters, independent
    of row volume).  Bucket semantics match the batch
    :func:`~go_jsonschema_spark.operators.drift.histogram`:
    ``floor(x / bucket_width)``, nulls excluded."""
    ts_field = dict((f.name, f.dataType.simpleString())
                    for f in stream.schema.fields).get(ts_col)
    if ts_field == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.filter(F.col(column).isNotNull() & F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window),
            F.floor(F.col(column) / F.lit(float(bucket_width)))
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )


def stream_duplicate_keys(
    stream: DataFrame,
    key: str,
    *,
    min_count: int = 2,
) -> DataFrame:
    """Streaming dataset-level uniqueness: running per-key occurrence
    counts across micro-batches, EMITTING ``(key, n_dup)`` whenever a
    key's lifetime count reaches ``min_count`` — the streaming twin of
    :func:`~go_jsonschema_spark.operators.uniqueness.duplicate_keys`
    (update mode: a key re-emits with its new running total each batch it
    grows, so the latest row per key is the current count; fold with
    ``max(n_dup)`` when a sink may hold several updates).

    Scale shape: only the key column is shuffled per micro-batch (id-only,
    like the batch operator), and state is one long per distinct key —
    the same O(#keys) a batch count aggregation holds transiently, kept
    resident instead.  For an unbounded key domain, pair with periodic
    batch reconciliation (module docstring)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ktype = {f.name: f.dataType.simpleString()
             for f in stream.schema.fields}[key]
    slim = stream.select(key)

    def update(k, pdfs, state: GroupState):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        if n >= min_count:
            yield pd.DataFrame({"key": [k[0]], "n_dup": [n]})

    return slim.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"key {ktype}, n_dup long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    stream: DataFrame,
    key: str,
    *,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on ``key``: keep the first record per key,
    with state bounded by the watermark (Spark's native stateful
    ``dropDuplicates`` — late duplicates beyond the watermark age out of
    state, the standard unbounded-dedup tradeoff)."""
    ts_field = dict((f.name, f.dataType.simpleString())
                    for f in stream.schema.fields).get(ts_col)
    if ts_field == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicates([key])


def windowed_verdicts(
    suite: ConstraintSuite,
    stream: DataFrame,
    *,
    ts_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    with_passed: bool = False,
) -> DataFrame:
    """Event-time-windowed verdict counts with late-data watermark:
    ``(window, n_rows, n_pass, n_fail)`` in append mode once the watermark
    passes — the streaming analogue of per-partition verdicts.

    ``with_passed=True`` appends a per-window ``passed`` gate computed
    with the SAME rule as batch verdicts — strict (zero failures) by
    default, per-constraint ``spec.tolerances`` budgets when declared
    (the exact-integer ``mostly`` rule; one extra sum per constraint in
    the same windowed aggregation, no second pass).  Off by default to
    keep the established output schema."""
    checked, _, ids, safe = _checked(suite, stream)
    # watermarks need TIMESTAMP (with zone); parquet often stores NTZ
    ts_field = dict((f.name, f.dataType.simpleString())
                    for f in stream.schema.fields).get(ts_col)
    if ts_field == "timestamp_ntz":
        checked = checked.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__pass__").cast("long")).alias("n_pass"),
        F.sum((~F.col("__pass__")).cast("long")).alias("n_fail"),
    ]
    if with_passed:
        aggs += [
            F.sum((~F.coalesce(F.col(safe[cid]), F.lit(True)))
                  .cast("long")).alias(f"__n{i}__")
            for i, cid in enumerate(ids)
        ]
    out = (
        checked.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(*aggs)
    )
    if with_passed:
        passed = (
            suite._tolerant_passed(
                ids,
                lambda cid: F.col(f"__n{ids.index(cid)}__"),
                F.col("n_rows"),
            )
            if suite.spec.tolerances
            else F.col("n_fail") == 0
        )
        out = out.withColumn("passed", passed).drop(
            *[f"__n{i}__" for i in range(len(ids))])
    return out


def stream_sessions(
    stream: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via Spark's NATIVE session windows:
    ``session_window(ts, gap)`` merges a user's events whose gaps are
    at most ``gap`` (closed boundary — measured: an event exactly
    ``gap`` after the previous one EXTENDS the session, the same
    ``> gap``-starts-new rule as the batch sessionize) and keeps
    per-session state that closes when the watermark passes, giving ``(user, session_start, session_end,
    n_events)`` without the lag+cumsum window the batch formulation
    needs.  ``session_end`` is Spark's window end = last event + gap.

    Output modes (Spark rejects ``update`` for session windows):
    ``append`` for production — sessions emit once, when the watermark
    passes their end, so sessions still open at end-of-input are held
    in state; ``complete`` for bounded gates — every final session
    emits (measured: append loses exactly the watermark-tail session
    on an AvailableNow run, complete matches the batch replay).

    Scale shape: one user-keyed shuffle per micro-batch; state is one
    (start, end, count) per OPEN session per user, aged out by the
    watermark — O(active users), not O(events).
    """
    ts_field = dict((f.name, f.dataType.simpleString())
                    for f in stream.schema.fields).get(ts_col)
    if ts_field == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"),
                 F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
