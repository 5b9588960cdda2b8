"""operators.sketches — mergeable HLL distinct sketches in checkpoint
manifests: accuracy bound, merge associativity, resume-without-rescan."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_jsonschema_spark.checkpoint import CheckpointStore, ResumableValidation
from go_jsonschema_spark.engine import ConstraintSuite
from go_jsonschema_spark.operators.sketches import (
    batch_distinct_sketch,
    running_distinct,
    union_estimate,
)
from go_jsonschema_spark.spec import TableSpec


def test_single_batch_estimate_within_bound(spark):
    df = spark.range(50_000).select(
        (F.col("id") % 7919).alias("k"), F.col("id").alias("u"))
    sk = batch_distinct_sketch(df, ["k", "u"])
    est_k = union_estimate(spark, [sk["k"]])
    est_u = union_estimate(spark, [sk["u"]])
    assert abs(est_k - 7919) / 7919 < 0.05
    assert abs(est_u - 50_000) / 50_000 < 0.05


def test_union_matches_whole_and_is_order_free(spark):
    a = spark.range(0, 30_000).select((F.col("id") % 5000).alias("k"))
    b = spark.range(20_000, 60_000).select((F.col("id") % 9000).alias("k"))
    sa = batch_distinct_sketch(a, ["k"])["k"]
    sb = batch_distinct_sketch(b, ["k"])["k"]
    whole = batch_distinct_sketch(a.unionByName(b), ["k"])["k"]
    u1 = union_estimate(spark, [sa, sb])
    u2 = union_estimate(spark, [sb, sa])
    assert u1 == u2  # commutative merge
    assert abs(u1 - union_estimate(spark, [whole])) / 9000 < 0.03


def test_running_distinct_from_manifests_no_rescan(spark, tmp_path):
    from go_jsonschema_spark.sources import synth

    df = synth.sequences(spark, 4000)
    suite = ConstraintSuite(
        TableSpec(columns={"n_tok": {"type": "integer"}}), key="doc_id")
    store = CheckpointStore(str(tmp_path / "ckpt"))
    rv = ResumableValidation(suite, store, partition_col="part",
                             batch_size=3, sketch_cols=("doc_id",))
    rv.run(df, "run1", str(tmp_path / "out"))
    est = running_distinct(spark, store, "run1", ["doc_id"])
    exact = df.select("doc_id").distinct().count()
    assert abs(est["doc_id"] - exact) / exact < 0.05
    # resume: skipped batches keep their stored sketches readable
    rep = rv.run(df, "run1", str(tmp_path / "out"))
    assert rep.batches_run == 0
    est2 = running_distinct(spark, store, "run1", ["doc_id"])
    assert est2 == est


def test_empty_and_missing(spark, tmp_path):
    assert union_estimate(spark, []) == 0
    store = CheckpointStore(str(tmp_path / "ckpt2"))
    assert running_distinct(spark, store, "none", ["x"]) == {}


# --- quantile sketches (r6) -------------------------------------------------

import pytest

from go_jsonschema_spark.operators.sketches import (
    batch_quantile_sketch,
    grouped_sketch_quantiles,
    log_bucket,
    merge_quantile_sketches,
    running_quantiles,
    sketch_quantiles,
)


def _bucket_py(x: int) -> int:
    if x < 0:
        return -2
    if x == 0:
        return -1
    e = x.bit_length() - 1
    return e * 16 + (((x - (1 << e)) * 16) >> e)


def _lb_py(b: int) -> float:
    if b == -1:
        return 0.0
    e, sub = divmod(b, 16)
    return (16 + sub) / 16.0 * float(1 << e)


def test_log_bucket_hand_computed(spark):
    vals = [0, 1, 2, 3, 5, 15, 16, 100, 513, 2**40 + 12345, None, -7]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = [r["b"] for r in
           df.select(log_bucket(F.col("x")).alias("b")).collect()]
    want = [None if v is None else _bucket_py(v) for v in vals]
    assert got == want
    # spot values: exact lower bounds for small integers
    assert _lb_py(_bucket_py(1)) == 1.0
    assert _lb_py(_bucket_py(3)) == 3.0
    assert _lb_py(_bucket_py(100)) == 100.0


def test_quantile_sketch_merge_is_exact(spark):
    df = spark.range(10_000).select(
        ((F.col("id") * 37) % 997 + 1).alias("v"))
    whole = batch_quantile_sketch(df, ["v"])["v"]
    df2 = spark.range(10_000).select(
        F.col("id"), ((F.col("id") * 37) % 997 + 1).alias("v"))
    h1 = batch_quantile_sketch(df2.filter("id < 4000"), ["v"])["v"]
    h2 = batch_quantile_sketch(df2.filter("id >= 4000"), ["v"])["v"]
    merged = merge_quantile_sketches([h1, h2])
    assert merged["buckets"] == whole["buckets"]  # EXACT, not approximate
    assert merge_quantile_sketches([h2, h1])["buckets"] == whole["buckets"]


def test_quantile_estimate_bound(spark):
    import random

    rnd = random.Random(42)
    vals = [rnd.randint(1, 10**6) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = batch_quantile_sketch(df, ["v"])["v"]
    svals = sorted(vals)
    for q in ["0.5", "0.9", "0.99"]:
        est = sketch_quantiles(sk, [q])[q]
        from fractions import Fraction

        fq = Fraction(q)
        rank = -((-len(vals) * fq.numerator) // fq.denominator)
        true = svals[rank - 1]
        assert est <= true <= est * (17 / 16), (q, est, true)


def test_quantile_sketch_null_zero_negative(spark):
    df = spark.createDataFrame(
        [(0,), (None,), (5,), (-3,)], "v long")
    sk = batch_quantile_sketch(df, ["v"])["v"]
    assert sk["n_null"] == 1
    assert sk["buckets"][str(-1)] == 1  # zero
    assert sk["buckets"][str(-2)] == 1  # negative
    with pytest.raises(ValueError, match="negative"):
        sketch_quantiles(sk, ["0.5"])
    ok = {"buckets": {k: v for k, v in sk["buckets"].items() if k != "-2"},
          "n_null": 0}
    assert sketch_quantiles(ok, ["0.5"])["0.5"] == 0.0  # rank 1 of {0,5}
    assert sketch_quantiles({"buckets": {}, "n_null": 0}, ["0.5"]) == {
        "0.5": None}
    with pytest.raises(ValueError, match="q must be"):
        sketch_quantiles(ok, ["1.5"])


def test_running_quantiles_from_manifests(spark, tmp_path):
    from go_jsonschema_spark.sources import synth

    df = synth.sequences(spark, 4000)
    suite = ConstraintSuite(
        TableSpec(columns={"n_tok": {"type": "integer"}}), key="doc_id")
    store = CheckpointStore(str(tmp_path / "qckpt"))
    rv = ResumableValidation(suite, store, partition_col="part",
                             batch_size=3, quantile_cols=("n_tok",))
    rv.run(df, "runq", str(tmp_path / "qout"))
    est = running_quantiles(store, "runq", ["n_tok"], ["0.5", "0.9"])
    whole = sketch_quantiles(
        batch_quantile_sketch(df, ["n_tok"])["n_tok"], ["0.5", "0.9"])
    # manifest merge == whole-table sketch (integer counters, exact)
    assert est["n_tok"] == whole
    # resume reuses manifests: same estimates, zero batches run
    rep = rv.run(df, "runq", str(tmp_path / "qout"))
    assert rep.batches_run == 0
    assert running_quantiles(store, "runq", ["n_tok"], ["0.5", "0.9"]) == est


def test_grouped_sketch_quantiles_matches_driver_side(spark):
    from go_jsonschema_spark.sources import synth

    df = synth.sequences(spark, 3000)
    got = {
        r["source"]: r
        for r in grouped_sketch_quantiles(
            df, "n_tok", {"p50": "0.5", "p99": "0.99"},
            group_col="source").collect()
    }
    # independent replay: per-group driver-side sketch over collected rows
    rows = df.select("source", "n_tok").collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["source"], []).append(r["n_tok"])
    for g, vs in by_g.items():
        buckets: dict = {}
        for v in vs:
            b = _bucket_py(int(v))
            buckets[str(b)] = buckets.get(str(b), 0) + 1
        want = sketch_quantiles(
            {"buckets": buckets, "n_null": 0}, ["0.5", "0.99"])
        assert got[g]["n"] == len(vs)
        assert got[g]["p50"] == want["0.5"], g
        assert got[g]["p99"] == want["0.99"], g


def test_drift_between_runs_from_manifests(spark, tmp_path):
    from go_jsonschema_spark.operators.drift import psi
    from go_jsonschema_spark.operators.sketches import drift_between_runs

    suite = ConstraintSuite(
        TableSpec(columns={"v": {"type": "integer"}}), key="doc_id")
    store = CheckpointStore(str(tmp_path / "dckpt"))

    def run(name, df):
        rv = ResumableValidation(suite, store, partition_col="part",
                                 batch_size=2, quantile_cols=("v",))
        rv.run(df, name, str(tmp_path / name))

    base = spark.range(4000).selectExpr(
        "cast(id as string) as doc_id", "id % 4 as part",
        "cast(id % 100 + 1 as long) as v")
    # shifted distribution: values 4x larger
    cur = spark.range(4000).selectExpr(
        "cast(id as string) as doc_id", "id % 4 as part",
        "cast((id % 100 + 1) * 4 as long) as v")
    run("base", base)
    run("cur", cur)
    got = drift_between_runs(store, "base", "cur", ["v"])
    assert got["v"] > 0.5  # a 4x shift is gross drift
    # self-drift is exactly zero (identical bucket histograms)
    assert drift_between_runs(store, "base", "base", ["v"]) == {"v": 0.0}
    # equals drift.psi over directly-computed whole-table sketches
    sk_b = batch_quantile_sketch(base, ["v"])["v"]
    sk_c = batch_quantile_sketch(cur, ["v"])["v"]
    want = psi({int(b): n for b, n in sk_c["buckets"].items()},
               {int(b): n for b, n in sk_b["buckets"].items()})
    assert got["v"] == want
    # missing column / missing run -> omitted, not an error
    assert drift_between_runs(store, "base", "cur", ["nope"]) == {}
    assert drift_between_runs(store, "ghost", "cur", ["v"]) == {}
