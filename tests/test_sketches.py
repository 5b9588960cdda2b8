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
