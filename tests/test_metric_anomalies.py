"""metric_anomalies (operators/history.py)."""
import pytest

from go_jsonschema_spark.operators.history import metric_anomalies


def _hist(spark, values, metric="m"):
    return spark.createDataFrame(
        [(metric, float(i), float(v)) for i, v in enumerate(values)],
        ["metric", "ts", "value"])


def test_planted_spike_flagged(spark):
    vals = [10, 11, 10, 9, 10, 11, 10, 9, 10, 50]  # spike at the end
    out = metric_anomalies(_hist(spark, vals), window=8, k=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ts"] == 9.0 and r["value"] == 50.0 and r["z"] > 3


def test_spike_does_not_mask_itself(spark):
    # the spike is excluded from its own trailing window, so the point
    # AFTER it is judged against a window containing the spike (higher
    # std) and stays unflagged
    vals = [10, 10, 11, 9, 10, 11, 50, 10]
    out = metric_anomalies(_hist(spark, vals), window=6, k=3.0).collect()
    assert [r["ts"] for r in out] == [6.0]


def test_min_history_gate(spark):
    vals = [10] * 5 + [50]  # 5 prior points
    # default min_history=5: judged and flagged
    assert metric_anomalies(_hist(spark, vals), window=8, k=3.0).count() == 1
    # min_history=6: not enough history, never judged
    assert metric_anomalies(
        _hist(spark, vals), window=8, k=3.0, min_history=6).count() == 0


def test_zero_variance_history_flags_any_deviation(spark):
    vals = [5, 5, 5, 5, 5, 5, 6]
    out = metric_anomalies(_hist(spark, vals), window=8, k=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 6.0 and r["std_trailing"] == 0.0 and r["z"] is None


def test_metrics_are_independent(spark):
    a = _hist(spark, [10] * 8 + [99], metric="a")
    b = _hist(spark, [10] * 9, metric="b")
    out = metric_anomalies(a.unionByName(b), window=8, k=3.0).collect()
    assert len(out) == 1 and out[0]["metric"] == "a"


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("m", float(i), float(v)) for i, v in enumerate([5] * 6)]
        + [("m", 6.0, None), ("m", 7.0, 9.0)],
        "metric string, ts double, value double")
    out = metric_anomalies(df, window=8, k=3.0).collect()
    assert [r["ts"] for r in out] == [7.0]


def test_guard(spark):
    with pytest.raises(ValueError):
        metric_anomalies(_hist(spark, [1.0]), window=0)


# --- verdict_regressions (r6) -----------------------------------------------


def test_verdict_regressions_from_manifests(spark, tmp_path):
    from go_jsonschema_spark.checkpoint import (
        CheckpointStore, ResumableValidation)
    from go_jsonschema_spark.engine import ConstraintSuite
    from go_jsonschema_spark.operators.history import verdict_regressions
    from go_jsonschema_spark.spec import TableSpec

    suite = ConstraintSuite(
        TableSpec(columns={"v": {"minimum": 0}}), key="doc_id")
    store = CheckpointStore(str(tmp_path / "ck"))

    def run(name, rows):
        df = spark.createDataFrame(rows, "doc_id string, part string, v long")
        ResumableValidation(suite, store, partition_col="part",
                            quantile_cols=("v",)).run(
            df, name, str(tmp_path / name))

    # base: p1 clean, p2 one failure
    run("base", [("a", "p1", 1), ("b", "p1", 2), ("c", "p2", -1),
                 ("d", "p2", 3)])
    # cur: p1 now fails once (REGRESSION), p2 unchanged, p3 new + failing
    run("cur", [("a", "p1", -5), ("b", "p1", 2), ("c", "p2", -1),
                ("d", "p2", 3), ("e", "p3", -9)])
    got = {r["partition"]: r for r in
           verdict_regressions(store, "base", "cur")}
    assert got["p1"]["regressed"] and got["p1"]["n_fail_cur"] == 1 \
        and got["p1"]["n_fail_base"] == 0
    assert not got["p2"]["regressed"]  # same failure count is not new
    assert got["p3"]["regressed"] and got["p3"]["n_fail_base"] is None
    # sketch blocks must never leak in as partitions
    assert all(not p.startswith("__") for p in got)
    # self-comparison: nothing regresses
    assert not any(r["regressed"]
                   for r in verdict_regressions(store, "base", "base"))
