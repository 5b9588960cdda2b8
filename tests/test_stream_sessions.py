"""stream_sessions: native session-window semantics on a bounded
AvailableNow run — gap merging, half-open boundary, per-user isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.streaming.validate import stream_sessions


def _run(spark, tmp_path, rows):
    src = tmp_path / "events"
    spark.createDataFrame(rows, "user_id long, ts long").select(
        "user_id", F.timestamp_seconds("ts").alias("ts")
    ).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    name = f"sessions_mem_{abs(hash(str(rows))) % 10**8}"
    q = (
        stream_sessions(stream, user_col="user_id", ts_col="ts",
                        gap="30 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    return spark.table(name).collect()


def test_sessions_gap_splits(spark, tmp_path):
    # user 1: two events 10 min apart (one session), then one 31 min
    # later (new session); user 2: single event
    rows = [(1, 0), (1, 600), (1, 600 + 31 * 60), (2, 50)]
    out = _run(spark, tmp_path, rows)
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2 and len(per_user[2]) == 1
    first = min(per_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2
    # session end = last event + gap
    assert int(first["session_end"].timestamp()) == 600 + 1800


def test_sessions_closed_boundary_merges(spark, tmp_path):
    # exactly 1800 s apart: session_window MERGES (closed boundary —
    # a new event at ts == current window end extends the session)
    rows = [(1, 0), (1, 1800)]
    out = _run(spark, tmp_path, rows)
    assert len(out) == 1 and out[0]["n_events"] == 2
    assert int(out[0]["session_end"].timestamp()) == 1800 + 1800


def test_sessions_just_over_gap_splits(spark, tmp_path):
    rows = [(1, 0), (1, 1801)]
    out = _run(spark, tmp_path, rows)
    assert len(out) == 2
    assert all(r["n_events"] == 1 for r in out)
