"""dedup.minhash_index / lsh_pairs_against_index: persistable signature
index, cross-batch-only pairs, parquet round-trip, re-ingested ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_jsonschema_spark.operators.dedup import (
    lsh_pairs_against_index,
    minhash_index,
    minhash_lsh_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_NEAR_A = "the quick brown fox jumps over the lazy dog again and again ok"
_NEAR_B = "the quick brown fox jumps over the lazy dog again and again yes"
_OTHER = "completely different words about spark shuffles and parquet files"


def test_cross_index_finds_straddling_pair_only(spark):
    hist = _docs(spark, [(2, _NEAR_A), (4, _OTHER)])
    new = _docs(spark, [(1, _NEAR_B), (3, "unrelated text entirely here")])
    idx = minhash_index(hist)
    got = lsh_pairs_against_index(new, idx, threshold=0.5,
                                  bands=16).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]
    assert 0.5 <= got[0]["jaccard"] <= 1.0


def test_no_history_history_or_batch_batch_pairs(spark):
    # two near-identical docs INSIDE history and two INSIDE the batch:
    # the cross join must not report either
    hist = _docs(spark, [(2, _NEAR_A), (4, _NEAR_A)])
    new = _docs(spark, [(1, _OTHER), (3, _OTHER)])
    idx = minhash_index(hist)
    assert lsh_pairs_against_index(new, idx, threshold=0.5).collect() == []


def test_index_parquet_round_trip_and_reuse(spark, tmp_path):
    hist = _docs(spark, [(2, _NEAR_A), (4, _OTHER)])
    p = str(tmp_path / "mh_index")
    minhash_index(hist).write.mode("overwrite").parquet(p)
    stored = spark.read.parquet(p)
    new = _docs(spark, [(1, _NEAR_B)])
    got = lsh_pairs_against_index(new, stored, threshold=0.5,
                                  bands=16).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]
    # appending a batch's own index keeps the store current
    minhash_index(new).write.mode("append").parquet(p)
    assert spark.read.parquet(p).count() == 3


def test_reingested_id_not_reported(spark):
    hist = _docs(spark, [(7, _NEAR_A)])
    new = _docs(spark, [(7, _NEAR_A)])  # same id, same text
    got = lsh_pairs_against_index(new, minhash_index(hist),
                                  threshold=0.5).collect()
    assert got == []


def test_cross_index_agrees_with_self_join_on_split(spark):
    rows = [(i, _NEAR_A if i % 3 == 0 else _OTHER + f" v{i}")
            for i in range(10)]
    df = _docs(spark, rows)
    whole = {
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(df, threshold=0.5, bands=16).collect()
    }
    cross = {
        (min(r["a"], r["b"]), max(r["a"], r["b"]))
        for r in lsh_pairs_against_index(
            df.filter(F.col("doc_id") % 2 == 1),
            minhash_index(df.filter(F.col("doc_id") % 2 == 0)),
            threshold=0.5, bands=16).collect()
    }
    straddling = {(a, b) for a, b in whole if (a % 2) != (b % 2)}
    assert cross == straddling
