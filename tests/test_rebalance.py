"""sampling.rebalance_by_token_share — exact-integer mixture thresholds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.sampling import rebalance_by_token_share


def _df(spark):
    # src a: 1000 tokens over 10 docs; src b: 400; src c: 100; d untargeted
    rows = []
    for i in range(10):
        rows.append((f"a{i}", 100, "a"))
    for i in range(8):
        rows.append((f"b{i}", 50, "b"))
    for i in range(4):
        rows.append((f"c{i}", 25, "c"))
    rows.append(("d0", 999, "d"))
    return spark.createDataFrame(rows, "doc_id string, n_tok int, source string")


def test_binding_source_keeps_everything(spark):
    # weights 2:1:1 -> tokens/weight = 500, 400, 100 -> c binds (thr=1M)
    sampled, thr = rebalance_by_token_share(
        _df(spark), {"a": 2, "b": 1, "c": 1})
    assert thr["c"] == 1_000_000
    kept_c = sampled.filter("source = 'c'").count()
    assert kept_c == 4  # binding source is never thinned
    # exact integer thresholds: a -> 1e6*2*100/(1*1000)=200000
    assert thr["a"] == 200_000 and thr["b"] == 250_000


def test_untargeted_sources_dropped_and_deterministic(spark):
    sampled, _ = rebalance_by_token_share(_df(spark), {"a": 1, "b": 1})
    assert sampled.filter("source IN ('c','d')").count() == 0
    again, _ = rebalance_by_token_share(_df(spark), {"a": 1, "b": 1})
    assert sorted(r["doc_id"] for r in sampled.collect()) == \
           sorted(r["doc_id"] for r in again.collect())


def test_stability_under_ingestion(spark):
    # adding rows to an UNRELATED source never flips a kept row of a
    # source whose threshold is already 1M (the binding source)
    df = _df(spark)
    sampled, thr = rebalance_by_token_share(df, {"a": 2, "b": 1, "c": 1})
    kept = {r["doc_id"] for r in sampled.filter("source='c'").collect()}
    more = df.unionByName(spark.createDataFrame(
        [("x1", 10_000, "d")], "doc_id string, n_tok int, source string"))
    sampled2, _ = rebalance_by_token_share(more, {"a": 2, "b": 1, "c": 1})
    assert {r["doc_id"] for r in sampled2.filter("source='c'").collect()} == kept


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="positive integers"):
        rebalance_by_token_share(df, {"a": 0})
    with pytest.raises(ValueError, match="no tokens"):
        rebalance_by_token_share(df, {"a": 1, "zz": 1})
