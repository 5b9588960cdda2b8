"""robust_outliers: hand-computed median/MAD cases, masking resistance,
MAD==0 breakdown, NULLs, grouping, and the broadcast two-pass plan."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.stats import robust_outliers


def test_hand_case_single_group(spark):
    # values 1..9 plus 100: med=5.5, deviations [4.5,3.5,...,94.5],
    # MAD = median([0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5]) = 2.5
    # threshold 3.5*1.4826*2.5 = 12.97 -> only 100 flagged
    rows = [(i, float(v)) for i, v in enumerate([*range(1, 10), 100])]
    df = spark.createDataFrame(rows, "id long, v double")
    out = robust_outliers(df, "v").collect()
    assert len(out) == 1
    r = out[0]
    assert r["v"] == 100.0 and r["med"] == 5.5 and r["mad"] == 2.5
    assert r["robust_z"] == pytest.approx((100 - 5.5) / (1.4826 * 2.5),
                                          abs=1e-4)


def test_masking_resistance_vs_stddev(spark):
    # a 25% contamination cluster inflates stddev enough that a 3-sigma
    # rule keeps every outlier (z≈1.7); median/MAD flags them all
    vals = [9.0, 10.0, 11.0] * 7 + [1000.0] * 7
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double")
    flagged = [r["v"] for r in robust_outliers(df, "v", k=3.5).collect()]
    assert flagged == [1000.0] * 7
    import statistics
    sd = statistics.pstdev(vals)
    mean = statistics.fmean(vals)
    assert abs(1000.0 - mean) < 3 * sd  # classic rule would miss them


def test_mad_zero_group_flags_nothing(spark):
    rows = [(i, "c", 5.0) for i in range(10)] + [(10, "c", 9e9)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    # majority-constant: med=5, MAD=0 -> documented breakdown, no flags
    assert robust_outliers(df, "v", ["g"]).count() == 0


def test_groups_isolated_and_nulls_skipped(spark):
    rows = (
        [(i, "a", float(i % 5)) for i in range(20)]
        + [(20, "a", 50.0), (21, "a", None)]
        + [(i + 30, "b", 50.0 + i % 5) for i in range(20)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = robust_outliers(df, "v", ["g"]).collect()
    # 50.0 is an outlier in group a but perfectly ordinary in group b
    assert [(r["g"], r["v"]) for r in out] == [("a", 50.0)]


def test_guard(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with pytest.raises(ValueError, match="k must be"):
        robust_outliers(df, "v", k=0)


def test_two_broadcast_joins_no_python(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        robust_outliers(df, "value", ["event_type"]).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    # exactly two stats joins, both broadcast (tree lines, not details)
    assert plan.count("BroadcastHashJoin Inner") == 2
    assert "Window" not in plan  # group-keyed aggs, not a row-keyed window
