"""event_transitions / chi_square_independence / mixing_weights:
hand-computed cases, degenerate inputs, and plan shape."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.funnel import event_transitions
from go_jsonschema_spark.operators.sampling import mixing_weights
from go_jsonschema_spark.operators.stats import chi_square_independence


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------

def test_transitions_hand_case(spark):
    rows = [
        # user 1: a -> b -> a ; user 2: a -> b ; user 3: b (no successor)
        (1, 1, "a"), (2, 1, "b"), (3, 1, "a"),
        (4, 2, "a"), (5, 2, "b"),
        (6, 3, "b"),
    ]
    df = spark.createDataFrame(
        [(i, u, t, float(i)) for i, u, t in rows],
        "event_id long, user_id long, event_type string, ts double")
    out = event_transitions(df, ts_col="ts").collect()
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in out}
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_transitions_tiebreak_makes_equal_ts_deterministic(spark):
    # both events at ts=1.0: order falls back to event_id
    rows = [(1, 1, "x", 0.0), (2, 1, "a", 1.0), (3, 1, "b", 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts double")
    out = event_transitions(df, ts_col="ts").collect()
    got = {(r["from_type"], r["to_type"]) for r in out}
    assert got == {("x", "a"), ("a", "b")}


def test_transitions_null_type_and_users_isolated(spark):
    rows = [
        (1, 1, "a", 1.0), (2, 1, None, 2.0), (3, 1, "b", 3.0),
        (4, 2, "c", 1.0),  # other user: no cross-user pair with user 1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts double")
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in event_transitions(df, ts_col="ts").collect()}
    # the NULL row vanishes entirely -> a..b become consecutive
    assert got == {("a", "b"): 1}


def test_transitions_probabilities_sum_to_one_per_source(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = event_transitions(df).collect()
    from collections import defaultdict
    sums = defaultdict(float)
    for r in out:
        sums[r["from_type"]] += r["p"]
    for s, tot in sums.items():
        assert tot == pytest.approx(1.0, abs=1e-4), s


# ---------------------------------------------------------------------------
# chi_square_independence
# ---------------------------------------------------------------------------

def test_chi2_hand_case(spark):
    # classic 2x2: [[10, 20], [30, 40]]
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20
        + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "id long, a string, b string")
    r = chi_square_independence(df, "a", "b").collect()[0]
    # chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 100*(400-600)^2/(30*70*40*60)
    want = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    assert r["n"] == 100 and r["r"] == 2 and r["c"] == 2 and r["dof"] == 1
    assert r["chi2"] == pytest.approx(want, abs=1e-6)
    assert r["cramers_v"] == pytest.approx((want / 100) ** 0.5, abs=1e-6)


def test_chi2_independent_columns_near_zero(spark):
    # perfectly independent: every (a, b) cell equal
    rows = [(i, str(i % 3), str(i % 4)) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0 and r["dof"] == 6


def test_chi2_single_category_degenerates_to_zero(spark):
    rows = [(i, "only", str(i % 3)) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r["r"] == 1 and r["dof"] == 0
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_chi2_nulls_excluded(spark):
    rows = [(1, "x", "u"), (2, "x", None), (3, None, "u"), (4, "y", "v")]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    assert chi_square_independence(df, "a", "b").collect()[0]["n"] == 2


# ---------------------------------------------------------------------------
# mixing_weights
# ---------------------------------------------------------------------------

def test_mixing_hand_case(spark):
    # 90/10 split, alpha=0.5: weights ∝ (0.9^.5, 0.1^.5) ≈ (.7500, .2500)
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, source string")
    got = {r["group"]: r for r in
           mixing_weights(df, "source", alpha=0.5).collect()}
    wb = 0.9 ** 0.5 / (0.9 ** 0.5 + 0.1 ** 0.5)
    assert got["big"]["weight"] == pytest.approx(wb, abs=1e-6)
    assert got["small"]["weight"] == pytest.approx(1 - wb, abs=1e-6)
    # tail upsampled, head downsampled
    assert got["small"]["multiplier"] > 1 > got["big"]["multiplier"]


def test_mixing_alpha_one_is_proportional_and_zero_is_uniform(spark):
    rows = [(i, "a" if i < 75 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, source string")
    for r in mixing_weights(df, "source", alpha=1.0).collect():
        assert r["weight"] == pytest.approx(r["p"], abs=1e-6)
        assert r["multiplier"] == pytest.approx(1.0, abs=1e-6)
    for r in mixing_weights(df, "source", alpha=0.0).collect():
        assert r["weight"] == pytest.approx(0.5, abs=1e-6)


def test_mixing_guard(spark):
    df = spark.createDataFrame([(1, "a")], "id long, source string")
    with pytest.raises(ValueError, match="alpha"):
        mixing_weights(df, "source", alpha=-0.1)
