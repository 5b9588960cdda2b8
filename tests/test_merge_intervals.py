"""timeseries.merge_intervals: island merging rules, touching endpoints,
inverted/zero-length intervals, null handling, single-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_jsonschema_spark.operators.timeseries import merge_intervals


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, s long, e long")


def test_merge_basic_islands(spark):
    rows = [("a", 0, 10), ("a", 5, 12), ("a", 20, 25),
            ("b", 0, 1), ("b", 3, 4)]
    got = sorted(
        tuple(r) for r in merge_intervals(
            _df(spark, rows), key_col="k", start_col="s", end_col="e"
        ).collect())
    assert got == [("a", 0, 12, 2), ("a", 20, 25, 1),
                   ("b", 0, 1, 1), ("b", 3, 4, 1)]


def test_touching_endpoints_merge(spark):
    rows = [("a", 0, 5), ("a", 5, 9)]
    got = merge_intervals(_df(spark, rows),
                          key_col="k", start_col="s", end_col="e").collect()
    assert [(r["island_start"], r["island_end"], r["n_intervals"])
            for r in got] == [(0, 9, 2)]


def test_contained_and_inverted_intervals(spark):
    # (3,1) is inverted -> clamped to point (3,3); (2,8) contains it
    rows = [("a", 2, 8), ("a", 3, 1), ("a", 0, 1)]
    got = sorted(
        tuple(r) for r in merge_intervals(
            _df(spark, rows), key_col="k", start_col="s", end_col="e"
        ).collect())
    assert got == [("a", 0, 1, 1), ("a", 2, 8, 2)]


def test_nulls_dropped(spark):
    rows = [("a", 0, 5), ("a", None, 9), ("a", 1, None), (None, 0, 9)]
    got = merge_intervals(_df(spark, rows),
                          key_col="k", start_col="s", end_col="e").collect()
    assert [tuple(r) for r in got] == [("a", 0, 5, 1)]


def test_merge_intervals_single_exchange(spark):
    import contextlib, io

    df = _df(spark, [("a", 0, 5)])
    out = merge_intervals(df, key_col="k", start_col="s", end_col="e")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # both windows + the island aggregation ride ONE hash partitioning
    # on the key (the agg keys on (k, island) = superset, no re-exchange
    # needed beyond it); no Python anywhere
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BatchEvalPython" not in plan
