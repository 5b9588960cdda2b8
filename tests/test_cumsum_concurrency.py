"""distributed_cumsum / concurrency_profile: hand cases, integer
exactness, tie semantics, and the no-single-partition-big-window plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.timeseries import (
    concurrency_profile,
    distributed_cumsum,
)


# ---------------------------------------------------------------------------
# distributed_cumsum
# ---------------------------------------------------------------------------

def test_cumsum_matches_sequential(spark):
    # shuffled input, unique keys: cumsum must equal the sorted prefix sum
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(-5, 9)) for i in range(200)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    out = {r["k"]: r["cum"] for r in
           distributed_cumsum(df, ["k"], "v", n_buckets=7).collect()}
    acc = 0
    for k, v in sorted(rows):
        acc += v
        assert out[k] == acc, k


def test_cumsum_integer_stays_long(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    out = distributed_cumsum(df, ["k"], "v", n_buckets=4)
    assert dict(out.dtypes)["cum"] == "bigint"
    assert {r["k"]: r["cum"] for r in out.collect()} == {1: 10, 2: 30}


def test_cumsum_tiebreak_total_order(spark):
    # same first key, tiebreak id: running order follows (k, id)
    df = spark.createDataFrame(
        [(1, 2, 100), (1, 1, 1), (2, 1, 10)], "k long, id long, v long")
    out = {(r["k"], r["id"]): r["cum"] for r in
           distributed_cumsum(df, ["k", "id"], "v", n_buckets=4).collect()}
    assert out[(1, 1)] == 1 and out[(1, 2)] == 101 and out[(2, 1)] == 111


def test_cumsum_empty_and_guard(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert distributed_cumsum(df, ["k"], "v").count() == 0
    with pytest.raises(ValueError, match="order_cols"):
        distributed_cumsum(df, [], "v")


def test_cumsum_timestamp_order_col(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 2),
         ("2024-01-03 00:00:00", 4)], "ts string, v long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {str(r["ts"]): r["cum"] for r in
           distributed_cumsum(df, ["ts"], "v", n_buckets=3).collect()}
    assert out["2024-01-03 00:00:00"] == 7


def test_cumsum_no_single_partition_big_window(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    out = distributed_cumsum(
        df.withColumn("cents", cents), ["o_orderdate", "o_orderkey"],
        "cents", n_buckets=16)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the big window is hash-partitioned on the bucket id; the ONLY
    # SinglePartition exchange feeds the 16-row offsets window
    assert plan.count("SinglePartition") == 1
    assert "hashpartitioning(__bkt__" in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# concurrency_profile
# ---------------------------------------------------------------------------

def _iv(spark, rows):
    return spark.createDataFrame(rows, "s long, e long").select(
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"))


def test_concurrency_hand_case(spark):
    # [0,10], [5,15], [10,20]: at t=10 all three are active (closed)
    df = _iv(spark, [(0, 10), (5, 15), (10, 20)])
    out = {int(r["ts"].timestamp()): r["active"]
           for r in concurrency_profile(df, "s", "e").collect()}
    assert out[0] == 1 and out[5] == 2
    assert out[10] == 3  # end@10 still active AT 10, start@10 counts
    assert out[15] == 2 and out[20] == 1


def test_concurrency_disjoint(spark):
    df = _iv(spark, [(0, 1), (10, 11), (20, 21)])
    out = concurrency_profile(df, "s", "e").collect()
    assert max(r["active"] for r in out) == 1
    assert len(out) == 6


def test_concurrency_nested(spark):
    df = _iv(spark, [(0, 100), (10, 20), (12, 18), (30, 40)])
    out = {int(r["ts"].timestamp()): r["active"]
           for r in concurrency_profile(df, "s", "e").collect()}
    assert out[12] == 3 and out[18] == 3 and out[20] == 2
    assert out[30] == 2 and out[100] == 1


def test_concurrency_null_intervals_dropped(spark):
    df = spark.createDataFrame(
        [(0, 10), (None, 5), (3, None)], "s long, e long").select(
        F.timestamp_seconds("s").alias("s"),
        F.timestamp_seconds("e").alias("e"))
    out = concurrency_profile(df, "s", "e").collect()
    assert len(out) == 2 and all(r["active"] == 1 for r in out)
