"""ewma: hand recurrence, seeding, NULL skip, order independence."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.timeseries import ewma


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, v double")


def test_ewma_hand_recurrence(spark):
    # seed 10; then 0.3·20 + 0.7·10 = 13; then 0.3·0 + 0.7·13 = 9.1
    df = _df(spark, [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 0.0)])
    r = ewma(df, group_col="g", order_cols=["t"], value_col="v",
             alpha=0.3).collect()[0]
    assert r["ewma"] == pytest.approx(9.1, abs=1e-6)
    assert r["n_obs"] == 3


def test_ewma_input_order_irrelevant(spark):
    rows = [("u", 3, 0.0), ("u", 1, 10.0), ("u", 2, 20.0)]
    df = _df(spark, rows).repartition(4)
    r = ewma(df, group_col="g", order_cols=["t"], value_col="v",
             alpha=0.3).collect()[0]
    assert r["ewma"] == pytest.approx(9.1, abs=1e-6)


def test_ewma_nulls_skipped_and_empty_group(spark):
    df = _df(spark, [("u", 1, None), ("u", 2, 4.0), ("w", 1, None)])
    out = {r["g"]: r for r in ewma(
        df, group_col="g", order_cols=["t"], value_col="v").collect()}
    assert out["u"]["ewma"] == pytest.approx(4.0, abs=1e-6)
    assert out["u"]["n_obs"] == 1
    assert out["w"]["ewma"] is None and out["w"]["n_obs"] == 0


def test_ewma_alpha_one_is_last_value(spark):
    df = _df(spark, [("u", 1, 5.0), ("u", 2, 7.0)])
    r = ewma(df, group_col="g", order_cols=["t"], value_col="v",
             alpha=1.0).collect()[0]
    assert r["ewma"] == pytest.approx(7.0, abs=1e-6)


def test_ewma_guards(spark):
    df = _df(spark, [("u", 1, 1.0)])
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, group_col="g", order_cols=["t"], value_col="v", alpha=0.0)
    with pytest.raises(ValueError, match="order_cols"):
        ewma(df, group_col="g", order_cols=[], value_col="v")
