"""hard_negatives: the label mask is exact (same-label rows can never
crowd out negatives), self-exclusion, NULL-label semantics."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.ann import hard_negatives


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")


def test_hard_negatives_mask_beats_topk_filter(spark):
    # anchor 0 (label 0) is surrounded by same-label near-duplicates;
    # naive top-2-then-filter would return NOTHING, the mask must find
    # the different-label vectors anyway
    rows = [(0, 0, [1.0, 0.0]),
            (1, 0, [0.999, 0.01]), (2, 0, [0.998, 0.02]),
            (3, 1, [0.9, 0.1]), (4, 1, [0.0, 1.0])]
    df = _vecs(spark, rows)
    anchors = df.where("vec_id = 0")
    out = hard_negatives(df, anchors, k=2).collect()
    assert [(r["vec_id"]) for r in out] == [3, 4]
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["cosine"] > out[1]["cosine"]


def test_hard_negatives_excludes_self_for_null_label_anchor(spark):
    rows = [(0, None, [1.0, 0.0]), (1, 5, [1.0, 0.0]), (2, 6, [0.5, 0.5])]
    df = _vecs(spark, rows)
    anchors = df.where("vec_id = 0")
    out = hard_negatives(df, anchors, k=5).collect()
    ids = [r["vec_id"] for r in out]
    assert 0 not in ids          # self excluded
    assert set(ids) == {1, 2}    # NULL-label anchor: everyone else is fair


def test_hard_negatives_null_label_rows_are_negatives(spark):
    rows = [(0, 3, [1.0, 0.0]), (1, None, [1.0, 0.0]), (2, 3, [1.0, 0.0])]
    df = _vecs(spark, rows)
    out = hard_negatives(df, df.where("vec_id = 0"), k=5).collect()
    assert [r["vec_id"] for r in out] == [1]  # same-label 2 masked


def test_hard_negatives_multiple_anchors(spark):
    rows = [(i, i % 2, [float(i), 1.0]) for i in range(6)]
    df = _vecs(spark, rows)
    out = hard_negatives(df, df, k=1).collect()
    assert len(out) == 6
    for r in out:
        assert r["anchor_id"] % 2 != r["vec_id"] % 2  # always cross-label
