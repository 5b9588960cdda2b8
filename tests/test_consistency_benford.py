"""fd_violations / reconcile_totals (operators/consistency.py) and
benford_digits (operators/drift.py)."""
import math

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.consistency import (
    fd_violations,
    reconcile_totals,
)
from go_jsonschema_spark.operators.drift import benford_digits


# ---------------------------------------------------------------- fd
def test_fd_holds_empty_output(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], ["k", "v"])
    assert fd_violations(df, "k", "v").count() == 0


def test_fd_violation_with_examples(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "y"), ("b", "z")], ["k", "v"])
    rows = fd_violations(df, "k", "v").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["n_values"], r["example_min"], r["example_max"]) == (
        "a", 2, "x", "y")


def test_fd_null_dependent_is_a_value(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None)], ["k", "v"])
    rows = fd_violations(df, "k", "v").collect()
    assert len(rows) == 1 and rows[0]["n_values"] == 2
    # min/max skip NULL (SQL semantics both engines share)
    assert rows[0]["example_min"] == "x" and rows[0]["example_max"] == "x"


def test_fd_composite_determinant(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("a", 2, "z")], ["k1", "k2", "v"])
    rows = fd_violations(df, ["k1", "k2"], "v").collect()
    assert len(rows) == 1
    assert (rows[0]["k1"], rows[0]["k2"], rows[0]["n_values"]) == ("a", 2, 2)


def test_fd_rejects_dependent_in_determinant(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError):
        fd_violations(df, ["k", "v"], "v")


# --------------------------------------------------------- reconcile
def test_reconcile_clean_no_rows(spark):
    parent = spark.createDataFrame([(1, 30.0), (2, 7.0)], ["k", "total"])
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 7.0)], ["k", "v"])
    assert reconcile_totals(
        parent, child, "k", "total", "v").count() == 0


def test_reconcile_mismatch_and_one_sided(spark):
    parent = spark.createDataFrame(
        [(1, 31.0), (2, 7.0), (3, 5.0)], ["k", "total"])
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 7.0), (4, 9.0)], ["k", "v"])
    rows = {r["k"]: r for r in reconcile_totals(
        parent, child, "k", "total", "v").collect()}
    assert set(rows) == {1, 3, 4}
    assert rows[1]["diff"] == pytest.approx(1.0)          # 31 vs 30
    assert rows[3]["child_total"] is None                 # no children
    assert rows[4]["parent_total"] is None                # orphaned child
    # inner mode drops the one-sided keys
    inner = {r["k"] for r in reconcile_totals(
        parent, child, "k", "total", "v", how="inner").collect()}
    assert inner == {1}


def test_reconcile_atol_swallows_float_noise(spark):
    parent = spark.createDataFrame([(1, 0.3)], ["k", "total"])
    child = spark.createDataFrame([(1, 0.1), (1, 0.2)], ["k", "v"])
    assert reconcile_totals(
        parent, child, "k", "total", "v", atol=1e-9).count() == 0


def test_reconcile_rejects_bad_how(spark):
    parent = spark.createDataFrame([(1, 1.0)], ["k", "total"])
    with pytest.raises(ValueError):
        reconcile_totals(parent, parent, "k", "total", "total", how="left")


# ------------------------------------------------------------ benford
def test_benford_nine_rows_shares_sum_to_one(spark):
    df = spark.range(1, 1000).select(
        (F.col("id") * 7919 % 9973 + 1).cast("double").alias("x"))
    rows = benford_digits(df, "x").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-5)
    assert sum(r["n"] for r in rows) == 999
    for r in rows:
        assert r["expected"] == pytest.approx(
            math.log10(1 + 1 / r["digit"]), abs=1e-6)


def test_benford_digit_extraction_edges(spark):
    # powers of ten, sub-1 magnitudes, negatives, zero, NULL
    df = spark.createDataFrame(
        [(100.0,), (0.05,), (-230.0,), (0.0,), (None,), (9.99,), (1.0,)],
        ["x"])
    rows = {r["digit"]: r["n"] for r in benford_digits(df, "x").collect()}
    # 100->1, 0.05->5, -230->2, 9.99->9, 1.0->1; zero+NULL excluded
    assert rows[1] == 2 and rows[5] == 1 and rows[2] == 1 and rows[9] == 1
    assert sum(rows.values()) == 5


def test_benford_missing_digits_emit_zero(spark):
    df = spark.createDataFrame([(1.0,), (19.0,)], ["x"])
    rows = {r["digit"]: r for r in benford_digits(df, "x").collect()}
    assert len(rows) == 9 and rows[7]["n"] == 0 and rows[7]["share"] == 0.0


def test_benford_conforming_sample_low_mad(spark):
    # synthesize a Benford-conforming sample: x = 10^u, u uniform via
    # a deterministic low-discrepancy sequence
    df = spark.range(0, 20000).select(
        F.pow(F.lit(10.0), (F.col("id") * 0.6180339887) % 1.0
              + F.col("id") % 3).alias("x"))
    rows = benford_digits(df, "x").collect()
    mad = sum(r["abs_dev"] for r in rows) / 9
    assert mad < 0.01  # Nigrini "acceptable conformity" territory


# ------------------------------------------- declarative table_checks
def test_fd_as_table_check(spark):
    from go_jsonschema_spark import ConstraintSuite, TableSpec

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")],
        ["doc_id", "k", "v"])
    ts = TableSpec(table_checks=[{
        "kind": "functional_dependency", "id": "fd:k->v",
        "determinant": "k", "dependent": "v"}])
    res = ConstraintSuite(ts, key="doc_id").run(df)
    rows = res.violations.filter(
        F.col("constraint_id") == "fd:k->v").collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == "a" and rows[0]["observed"] == "2"


def test_reconcile_as_table_check(spark):
    from go_jsonschema_spark import ConstraintSuite, TableSpec

    parent = spark.createDataFrame(
        [(1, 31.0), (2, 7.0)], ["doc_id", "total"])
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 7.0), (9, 4.0)], ["doc_id", "v"])
    ts = TableSpec(table_checks=[{
        "kind": "reconcile", "id": "rec:total",
        "key": "doc_id", "parent_col": "total",
        "child": "ledger", "child_col": "v", "atol": 0.5}])
    res = ConstraintSuite(ts, key="doc_id").run(
        parent, dims={"ledger": child})
    rows = {r["doc_id"]: r["observed"] for r in res.violations.filter(
        F.col("constraint_id") == "rec:total").collect()}
    assert rows["1"] == "1.0" and rows["9"] == "missing_parent"


def test_reconcile_table_check_requires_child(spark):
    from go_jsonschema_spark import ConstraintSuite, TableSpec

    parent = spark.createDataFrame([(1, 1.0)], ["doc_id", "total"])
    ts = TableSpec(table_checks=[{
        "kind": "reconcile", "id": "rec:x", "key": "doc_id",
        "parent_col": "total", "child": "nope", "child_col": "total"}])
    with pytest.raises(KeyError):
        ConstraintSuite(ts, key="doc_id").run(parent)
