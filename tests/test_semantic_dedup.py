"""semantic_dedup (SemDeDup): within-cell earlier-row semantics, the
negative-similarity mask, guards, and the single-shuffle plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.dedup import semantic_dedup

# one centroid -> everything lands in cell 0 (pairwise is corpus-wide)
ONE_CELL = np.asarray([[0.0, 0.0]])


def _run(spark, rows, threshold, centroids=ONE_CELL, **kw):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, centroids=centroids, threshold=threshold, **kw)
    return {r["vec_id"]: r for r in out.collect()}


def test_earlier_duplicate_dropped_first_kept(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    got = _run(spark, rows, threshold=0.95)
    assert got[1]["keep"] and not got[2]["keep"] and got[3]["keep"]
    assert got[1]["max_prev_sim"] is None
    assert got[2]["max_prev_sim"] == pytest.approx(1.0)
    assert got[3]["max_prev_sim"] == pytest.approx(0.0)


def test_negative_similarities_not_clobbered_by_zero(spark):
    # all earlier sims are negative: max_prev must be the true (negative)
    # max, not 0 from a zero-filled triangle
    rows = [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]
    got = _run(spark, rows, threshold=0.5)
    assert got[2]["max_prev_sim"] == pytest.approx(-1.0)
    assert got[2]["keep"]


def test_earlier_row_counts_even_if_itself_dropped(spark):
    # 1~2 dup, 2~3 dup, but 1~3 not: the earlier-row variant drops BOTH
    # 2 and 3 (3's earlier neighbor 2 counts although 2 was dropped)
    a, b = [1.0, 0.0], [float(np.cos(0.3)), float(np.sin(0.3))]
    c = [float(np.cos(0.6)), float(np.sin(0.6))]
    got = _run(spark, [(1, a), (2, b), (3, c)], threshold=0.95)
    assert got[1]["keep"] and not got[2]["keep"] and not got[3]["keep"]


def test_cells_isolate_pairs(spark):
    # identical vectors in DIFFERENT cells are both kept
    cents = np.asarray([[1.0, 0.0], [-1.0, 0.0]])
    rows = [(1, [2.0, 0.1]), (2, [-2.0, -0.1])]
    got = _run(spark, rows, threshold=0.5, centroids=cents)
    assert got[1]["keep"] and got[2]["keep"]
    assert got[1]["cell"] != got[2]["cell"]


def test_cell_size_guard_raises(spark):
    rows = [(i, [float(i), 1.0]) for i in range(10)]
    with pytest.raises(Exception, match="max_cell_rows"):
        _run(spark, rows, threshold=0.99, max_cell_rows=5)


def test_null_vector_raises(spark):
    with pytest.raises(Exception, match="null"):
        _run(spark, [(1, [1.0, 0.0]), (2, None)], threshold=0.9)


def test_single_exchange_plan(spark):
    """Assignment is a native expression; the ONLY shuffle keys on cell
    (FlatMapGroupsInPandas)."""
    import contextlib
    import io

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = np.asarray([[float(i == j) for j in range(64)] for i in range(4)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        semantic_dedup(e, centroids=cent, threshold=0.9).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange (") == 1
    assert "FlatMapGroupsInPandas" in plan
