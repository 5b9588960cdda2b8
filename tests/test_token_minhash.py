"""tokens.token_minhash_pairs — near-dup detection on token arrays
through the shared LSH core."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_jsonschema_spark.operators.tokens import token_minhash_pairs


def test_near_dup_pair_found_exact_jaccard(spark):
    base = list(range(100, 160))
    near = base[:-2]            # drop last 2 tokens
    far = list(range(500, 560))
    df = spark.createDataFrame(
        [("a", base), ("b", near), ("c", far)],
        "doc_id string, tokens array<int>")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in token_minhash_pairs(df, n=5, threshold=0.5).collect()}
    assert set(got) == {("a", "b")}
    # exact distinct-window jaccard: a has 56 windows, b has 54, all of
    # b's are in a's -> 54/56
    assert got[("a", "b")] == round(54 / 56, 6)


def test_below_threshold_pair_dropped(spark):
    a = list(range(100, 160))
    b = list(range(130, 190))   # half-overlapping range, few shared windows
    df = spark.createDataFrame(
        [("a", a), ("b", b)], "doc_id string, tokens array<int>")
    assert token_minhash_pairs(df, n=5, threshold=0.9).count() == 0


def test_short_arrays_excluded(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [1, 2, 3])],  # < n tokens: no windows
        "doc_id string, tokens array<int>")
    assert token_minhash_pairs(df, n=5).count() == 0


def test_identical_sequences_jaccard_one(spark):
    seq = list(range(50))
    df = spark.createDataFrame(
        [("a", seq), ("b", seq)], "doc_id string, tokens array<int>")
    r = token_minhash_pairs(df, n=5, threshold=0.99).first()
    assert (r["a"], r["b"], r["jaccard"]) == ("a", "b", 1.0)
