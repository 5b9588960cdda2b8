"""edit_distance_pairs: exactness vs a reference DP, block-boundary
coverage, guards, and the no-Python blocked-join plan."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.dedup import edit_distance_pairs


def _lev(s1: str, s2: str) -> int:
    # reference Wagner-Fischer, independent of both engines
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def test_hand_pairs(spark):
    rows = [
        (1, "kitten"), (2, "sitting"),        # distance 3
        (3, "flaw"), (4, "lawn"),             # distance 2
        (5, "identical"), (6, "identical"),   # distance 0
        (7, "completely different string"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = edit_distance_pairs(df, max_distance=3, band=8).collect()
    got = {(r["a"], r["b"]): r["distance"] for r in out}
    assert got == {(1, 2): 3, (3, 4): 2, (5, 6): 0}


def test_block_boundary_pair_not_missed(spark):
    # lengths 31 and 33 straddle the band=32 boundary (blocks 0 and 1);
    # the two-block cover must still join them
    a = "x" * 31
    b = "x" * 33
    df = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string")
    out = edit_distance_pairs(df, max_distance=3, band=32).collect()
    assert [(r["a"], r["b"], r["distance"]) for r in out] == [(1, 2, 2)]


def test_exactness_vs_reference_dp(spark):
    # deterministic corpus with planted near-dups and decoys
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
    ]
    rows, rid = [], 0
    for s in base:
        for edit in [s, s[1:], s + "!", s.replace("q", "g", 1),
                     s[: len(s) // 2]]:
            rows.append((rid, edit))
            rid += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = 4
    out = edit_distance_pairs(df, max_distance=d, band=16).collect()
    got = {(r["a"], r["b"]): r["distance"] for r in out}
    want = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            dist = _lev(sa, sb)
            if dist <= d:
                want[(ia, ib)] = dist
    assert got == want and want  # non-trivial: some pairs exist


def test_null_text_excluded_and_guards(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], "doc_id long, text string")
    out = edit_distance_pairs(df, max_distance=1, band=8).collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 3)]
    with pytest.raises(ValueError, match="band"):
        edit_distance_pairs(df, max_distance=8, band=8)
    with pytest.raises(ValueError, match="max_distance"):
        edit_distance_pairs(df, max_distance=-1)


def test_no_python_blocked_join_plan(spark):
    import contextlib
    import io

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edit_distance_pairs(df, max_distance=3).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # equi-join on the block key (any hash/merge strategy qualifies)
    assert any(j in plan for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
