"""record_linkage / skew_report: hand-scored pairs, NULL handling,
blocking discipline, skew shares."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.linkage import record_linkage
from go_jsonschema_spark.operators.stats import skew_report


# ---------------------------------------------------------------------------
# record_linkage
# ---------------------------------------------------------------------------

_FIELDS = {"name": ("string", 2.0), "bal": ("numeric", 1.0),
           "seg": ("categorical", 1.0)}


def _customers(spark, rows):
    return spark.createDataFrame(
        rows, "id long, blk long, name string, bal double, seg string")


def test_linkage_hand_score(spark):
    # same block; name 'smith' vs 'smyth' → lev 1 / len 5 → 0.8
    # bal 100 vs 50 → 0.5; seg equal → 1.0
    # score = (2·0.8 + 1·0.5 + 1·1.0) / 4 = 0.775
    df = _customers(spark, [
        (1, 7, "smith", 100.0, "A"), (2, 7, "smyth", 50.0, "A")])
    r = record_linkage(df, id_col="id", block_col="blk",
                       fields=_FIELDS).collect()[0]
    assert r["sim_name"] == pytest.approx(0.8, abs=1e-6)
    assert r["sim_bal"] == pytest.approx(0.5, abs=1e-6)
    assert r["sim_seg"] == 1.0
    assert r["score"] == pytest.approx(0.775, abs=1e-6)


def test_linkage_blocking_prevents_cross_pairs(spark):
    df = _customers(spark, [
        (1, 1, "same", 1.0, "A"), (2, 2, "same", 1.0, "A"),
        (3, None, "same", 1.0, "A")])
    out = record_linkage(df, id_col="id", block_col="blk",
                         fields=_FIELDS).collect()
    assert out == []  # different blocks, NULL block dropped


def test_linkage_null_field_contributes_zero(spark):
    df = _customers(spark, [
        (1, 7, None, 10.0, "A"), (2, 7, "x", 10.0, "A")])
    r = record_linkage(df, id_col="id", block_col="blk",
                       fields=_FIELDS).collect()[0]
    assert r["sim_name"] == 0.0
    assert r["score"] == pytest.approx((0 + 1.0 + 1.0) / 4, abs=1e-6)


def test_linkage_min_score_and_guards(spark):
    df = _customers(spark, [
        (1, 7, "aaaa", 1.0, "A"), (2, 7, "zzzz", 1e9, "B")])
    assert record_linkage(df, id_col="id", block_col="blk",
                          fields=_FIELDS, min_score=0.5).count() == 0
    with pytest.raises(ValueError, match="no fields"):
        record_linkage(df, id_col="id", block_col="blk", fields={})
    with pytest.raises(ValueError, match="unknown field kinds"):
        record_linkage(df, id_col="id", block_col="blk",
                       fields={"name": ("fuzzy", 1.0)})


# ---------------------------------------------------------------------------
# skew_report
# ---------------------------------------------------------------------------

def test_skew_report_shares(spark):
    rows = [(i, "hot") for i in range(80)]
    rows += [(100 + i, f"k{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew_report(df, ["k"], top_n=3).collect()
    assert out[0]["k"] == "hot" and out[0]["rank"] == 1
    assert out[0]["share"] == pytest.approx(0.8, abs=1e-6)
    assert out[0]["cum_share"] == pytest.approx(0.8, abs=1e-6)
    assert out[2]["cum_share"] == pytest.approx(0.82, abs=1e-6)


def test_skew_report_null_key_is_a_row(spark):
    rows = [(1, None), (2, None), (3, "a")]
    df = spark.createDataFrame(rows, "id long, k string")
    out = skew_report(df, ["k"], top_n=5).collect()
    assert out[0]["k"] is None and out[0]["n_rows"] == 2


def test_skew_report_guards(spark):
    df = spark.createDataFrame([], "id long, k string")
    with pytest.raises(ValueError, match="empty input"):
        skew_report(df, ["k"])
    with pytest.raises(ValueError, match="key_cols"):
        skew_report(df, [])
