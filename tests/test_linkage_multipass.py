"""Multi-pass (OR-)blocking record linkage — the recall repair for
dirty block keys (VERDICT r5 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.linkage import (
    record_linkage,
    record_linkage_multipass,
)

FIELDS = {"name": ("string", 2.0), "bal": ("numeric", 1.0)}


def _people(spark):
    # 1 & 2 are the same person with a TYPO'D ZIP (zip-blocking misses
    # them) but share the name-prefix block; 3 is an unrelated person in
    # zip 12345; 4 shares nothing.
    rows = [
        (1, "12345", "ann", "annabel smith", 100.0),
        (2, "12346", "ann", "annabel smyth", 101.0),
        (3, "12345", "bob", "bob jones", 500.0),
        (4, "99999", "zzz", "zed zed", 9.0),
    ]
    return spark.createDataFrame(
        rows, "id long, zip string, name3 string, name string, bal double")


def test_dirty_block_key_pass1_misses_pass2_catches(spark):
    df = _people(spark)
    p1 = record_linkage(df, id_col="id", block_col="zip",
                        fields=FIELDS, min_score=0.8)
    assert (1, 2) not in {(r["id_a"], r["id_b"]) for r in p1.collect()}

    mp = record_linkage_multipass(
        df, id_col="id", block_cols=["zip", "name3"],
        fields=FIELDS, min_score=0.8)
    got = {(r["id_a"], r["id_b"]): r for r in mp.collect()}
    assert (1, 2) in got
    assert got[(1, 2)]["n_passes"] == 1  # name3 pass only


def test_pair_found_by_both_passes_scored_once(spark):
    df = _people(spark)
    # give 1 and 2 the same zip so BOTH passes propose the pair
    df2 = df.withColumn(
        "zip", F.when(F.col("id") == 2, "12345").otherwise(F.col("zip")))
    mp = record_linkage_multipass(
        df2, id_col="id", block_cols=["zip", "name3"],
        fields=FIELDS, min_score=0.0)
    rows = [r for r in mp.collect()
            if (r["id_a"], r["id_b"]) == (1, 2)]
    assert len(rows) == 1 and rows[0]["n_passes"] == 2


def test_single_pass_matches_record_linkage_scores(spark):
    df = _people(spark)
    single = {(r["id_a"], r["id_b"]): r["score"] for r in record_linkage(
        df, id_col="id", block_col="zip", fields=FIELDS).collect()}
    multi = {(r["id_a"], r["id_b"]): r["score"]
             for r in record_linkage_multipass(
                 df, id_col="id", block_cols=["zip"],
                 fields=FIELDS).collect()}
    assert single == multi and single  # same pairs, identical scores


def test_null_block_key_sits_out_that_pass_only(spark):
    df = _people(spark).withColumn(
        "zip", F.when(F.col("id") == 1, None).otherwise(F.col("zip")))
    mp = record_linkage_multipass(
        df, id_col="id", block_cols=["zip", "name3"],
        fields=FIELDS, min_score=0.8)
    got = {(r["id_a"], r["id_b"]) for r in mp.collect()}
    assert (1, 2) in got  # still caught by the name3 pass


def test_multipass_guards(spark):
    df = _people(spark)
    with pytest.raises(ValueError, match="block_cols"):
        record_linkage_multipass(df, id_col="id", block_cols=[],
                                 fields=FIELDS)
    with pytest.raises(ValueError, match="fields"):
        record_linkage_multipass(df, id_col="id", block_cols=["zip"],
                                 fields={})
    with pytest.raises(ValueError, match="kinds"):
        record_linkage_multipass(
            df, id_col="id", block_cols=["zip"],
            fields={"name": ("fuzzy", 1.0)})
