"""k_anonymity / l_diversity / t_closeness: hand cases, NULL-class
semantics, guards, and the class-keyed plan shapes."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.privacy import (
    k_anonymity,
    l_diversity,
    t_closeness,
)


def _people(spark):
    rows = [
        # (zip, age_band, diagnosis)
        (1, "02138", "30-40", "flu"),
        (2, "02138", "30-40", "flu"),
        (3, "02138", "30-40", "cold"),
        (4, "94305", "20-30", "flu"),      # class of 1 -> k<2 violation
        (5, None,    "20-30", "flu"),      # null zip: its own class of 2
        (6, None,    "20-30", "flu"),      #   ... and 1-diverse (all flu)
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, age string, diagnosis string")


def test_k_anonymity_flags_small_classes(spark):
    out = k_anonymity(_people(spark), ["zip", "age"], k=2).collect()
    got = {(r["zip"], r["age"]): r["class_size"] for r in out}
    assert got == {("94305", "20-30"): 1}
    assert all(r["k"] == 2 for r in out)


def test_k_anonymity_null_class_counted(spark):
    # at k=3 the NULL-zip class (size 2) is itself a violation
    out = k_anonymity(_people(spark), ["zip", "age"], k=3).collect()
    got = {(r["zip"], r["age"]): r["class_size"] for r in out}
    assert got[(None, "20-30")] == 2
    assert got[("94305", "20-30")] == 1
    assert (("02138", "30-40") not in got)  # size 3 passes


def test_k_anonymous_table_yields_empty(spark):
    df = _people(spark).limit(3)  # single class of 3
    assert k_anonymity(df, ["zip", "age"], k=3).count() == 0


def test_l_diversity_flags_uniform_classes(spark):
    out = l_diversity(
        _people(spark), ["zip", "age"], "diagnosis", l=2).collect()
    got = {(r["zip"], r["age"]): r for r in out}
    # 02138/30-40 has flu+cold (2-diverse, passes); the other two fail
    assert set(got) == {("94305", "20-30"), (None, "20-30")}
    assert got[(None, "20-30")]["class_size"] == 2
    assert got[(None, "20-30")]["distinct_sensitive"] == 1


def test_l_diversity_null_sensitive_not_distinct(spark):
    rows = [(1, "a", "flu"), (2, "a", None)]
    df = spark.createDataFrame(rows, "id long, q string, s string")
    out = l_diversity(df, ["q"], "s", l=2).collect()
    assert len(out) == 1 and out[0]["distinct_sensitive"] == 1


def test_guards(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(df, ["zip"], k=0)
    with pytest.raises(ValueError, match="l must be"):
        l_diversity(df, ["zip"], "diagnosis", l=0)
    with pytest.raises(ValueError, match="quasi-identifier"):
        k_anonymity(df, [], k=2)


def _severity(spark):
    # two skewed classes against a uniform global distribution:
    # class a = [1,1,2], class b = [2,3,3], global = (1/3,1/3,1/3)
    # ordered-EMD(a) = (|1/3| + |1/3| + |0|) / 2 = 1/3, same for b
    rows = [
        ("a", 1), ("a", 1), ("a", 2),
        ("b", 2), ("b", 3), ("b", 3),
    ]
    return spark.createDataFrame(rows, "q string, sev int")


def test_t_closeness_hand_emd(spark):
    out = t_closeness(_severity(spark), ["q"], "sev", t=0.3).collect()
    got = {r["q"]: r for r in out}
    assert set(got) == {"a", "b"}
    for r in got.values():
        assert r["emd"] == pytest.approx(1 / 3, abs=1e-6)
        assert r["class_size"] == 3 and r["t"] == 0.3


def test_t_closeness_threshold_excludes(spark):
    assert t_closeness(_severity(spark), ["q"], "sev", t=0.34).count() == 0


def test_t_closeness_null_sensitive_excluded(spark):
    # a NULL severity neither shifts class a's distribution nor its
    # class_size; an all-NULL class has no distribution and is skipped
    rows = [
        ("a", 1), ("a", 1), ("a", 2), ("a", None),
        ("b", 2), ("b", 3), ("b", 3),
        ("c", None), ("c", None),
    ]
    df = spark.createDataFrame(rows, "q string, sev int")
    out = t_closeness(df, ["q"], "sev", t=0.3).collect()
    got = {r["q"]: r for r in out}
    assert set(got) == {"a", "b"}
    assert got["a"]["class_size"] == 3
    assert got["a"]["emd"] == pytest.approx(1 / 3, abs=1e-6)


def test_t_closeness_single_value_domain_is_zero(spark):
    rows = [("a", 7), ("a", 7), ("b", 7)]
    df = spark.createDataFrame(rows, "q string, sev int")
    # m == 1: every class matches the global distribution exactly
    assert t_closeness(df, ["q"], "sev", t=0.001).count() == 0


def test_t_closeness_guards(spark):
    df = _severity(spark)
    with pytest.raises(ValueError, match="t must be"):
        t_closeness(df, ["q"], "sev", t=0.0)
    with pytest.raises(ValueError, match="max_domain"):
        t_closeness(df, ["q"], "sev", t=0.3, max_domain=2)


def test_t_closeness_no_python_in_plan(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t_closeness(df, ["o_custkey"], "o_orderpriority", t=0.3) \
            .explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # tiny domain dim broadcast


def test_k_anonymity_single_exchange_plan(spark):
    """One class-keyed aggregation: exactly one Exchange, no window,
    no Python."""
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        k_anonymity(df, ["c_nationkey", "c_mktsegment"], k=8) \
            .explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange (") == 1
    assert "Window" not in plan and "BatchEvalPython" not in plan
