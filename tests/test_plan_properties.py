"""Scale-discipline regression tests: assert the PHYSICAL PLAN properties
the 100 TB design depends on, so a refactor that silently loses a
broadcast, pushdown, or column pruning fails CI — not the cluster."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.engine import ConstraintSuite
from go_jsonschema_spark.sources import synth


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def seq_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "seq")
    synth.sequences(spark, 1000).write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_referential_is_broadcast_anti_join(spark, seq_parquet):
    from go_jsonschema_spark.operators.referential import referential_violations

    plan = _plan(
        referential_violations(seq_parquet, "source", synth.sources_dim(spark))
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # fact-side scan pruned to the two needed columns
    assert "struct<doc_id:string,source:string>" in plan


def test_uniqueness_single_shuffle_and_pruned(spark, seq_parquet):
    from go_jsonschema_spark.operators.uniqueness import duplicate_keys

    plan = _plan(duplicate_keys(seq_parquet, "doc_id"))
    # default path: ONE exchange (partial+final hash agg handles the hot
    # key map-side — r4 A/B measured the salted two-phase at 1.8x the
    # cost); scan reads only the key column
    assert plan.count("Exchange (") == 1
    assert "struct<doc_id:string>" in plan
    # opt-in salted form for aggs without map-side reduction: two phases
    salted = _plan(duplicate_keys(seq_parquet, "doc_id", salt_buckets=64))
    assert salted.count("Exchange (") >= 2


def test_verdict_rowcount_scan_is_single_column(spark, seq_parquet):
    suite = ConstraintSuite(synth.sequences_table_spec(), key="doc_id")
    res = suite.run(
        seq_parquet, partition_col="part",
        dims={"sources_dim": synth.sources_dim(spark)},
    )
    plan = _plan(res.verdicts)
    assert "struct<part:int>" in plan  # n_rows side reads ONE column


def test_filters_push_to_parquet(spark, seq_parquet):
    plan = _plan(
        seq_parquet.filter((F.col("part") == 3) & (F.col("n_tok") > 100))
        .select("doc_id")
    )
    assert "EqualTo(part,3)" in plan and "GreaterThan(n_tok,100)" in plan


def test_predicates_stay_in_codegen(spark, seq_parquet):
    """The row-predicate block must live inside WholeStageCodegen — no
    Python, no interpreted fallback."""
    suite = ConstraintSuite(synth.sequences_table_spec(), key="doc_id")
    res = suite.run(
        seq_parquet, dims={"sources_dim": synth.sources_dim(spark)}
    )
    plan = _plan(res.checked)
    # '*' marks codegen'd operators in formatted plans; the HOF (forall)
    # predicates are JVM-interpreted expressions (Spark doesn't codegen
    # lambda functions) but must never fall to a Python eval node
    assert "* " in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_selfjoins_reuse_exchange_and_prune(spark):
    """The banded self-joins must plan ONE exchange + ReusedExchange (the
    signature pipeline is not computed once per side), and the scan must
    prune to (id, text).  Static reuse is only visible with AQE off — at
    runtime AQE performs the same reuse via its stage cache."""
    from go_jsonschema_spark.operators.dedup import (
        minhash_lsh_pairs, simhash_dup_pairs,
    )

    # other tests may have cached this path — a cache hit swaps the scan
    # for InMemoryTableScan and hides the ReadSchema pruning we assert on
    spark.catalog.clearCache()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for op in (simhash_dup_pairs, minhash_lsh_pairs):
            plan = _plan(op(docs))
            assert "ReusedExchange" in plan, op.__name__
            assert "struct<doc_id:bigint,text:string>" in plan.replace(
                "doc_id:long", "doc_id:bigint"
            ), op.__name__
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key → sort-merge join with ZERO
    Exchange (the co-location contract repeated validations rely on)."""
    from pyspark.sql import functions as F

    from go_jsonschema_spark.sources.bucketing import (
        is_bucketed_on, write_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/wh'")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        write_bucketed(orders, "bdb.orders_b", key="o_custkey", buckets=8)
        write_bucketed(cust, "bdb.cust_b", key="c_custkey", buckets=8)
        assert is_bucketed_on(spark, "bdb.orders_b", "o_custkey")

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bdb.orders_b").join(
                spark.table("bdb.cust_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: no shuffle at all
            # and the result is right
            n = j.count()
            want = orders.join(
                cust, orders.o_custkey == cust.c_custkey
            ).count()
            assert n == want
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_redact_is_fully_native(spark):
    """PII redaction must stay JVM-side: regexp chains, no Python eval."""
    from go_jsonschema_spark.functions.redact import redact_documents

    df = spark.createDataFrame([(0, "a@b.co")], "doc_id int, text string")
    plan = _plan(redact_documents(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lsh_multi_one_arrow_pass_and_takeordered(spark):
    """topk_cosine_lsh_multi: exactly ONE Arrow-vectorized candidate
    filter (the 256-plane matmul) and a TakeOrderedAndProject ranking —
    never a row-at-a-time Python eval or a full sort."""
    from go_jsonschema_spark.operators.ann import topk_cosine_lsh_multi

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x)
          for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    plan = _plan(topk_cosine_lsh_multi(e, qv, k=10))
    # tree occurrence (node-id form) — the detail section repeats the name
    assert plan.count("ArrowEvalPython (") == 1
    assert "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort, heap-select only


def test_null_scan_elision_under_storage_contract(spark, seq_parquet):
    """VERDICT r4 item 7: the `non_null_elements` storage contract must
    ELIDE the per-element null forall from the compiled predicate (the
    -22% flagship win, engine.py / compile.py items fast path) — and the
    uncontracted compile must KEEP it.  Asserted on the executed plan so
    a compile.py refactor can't silently resurrect the scan."""
    import re

    def lambda_nullchecks(contract):
        suite = ConstraintSuite(synth.sequences_table_spec(), key="doc_id",
                                non_null_elements=contract)
        res = suite.run(
            seq_parquet, dims={"sources_dim": synth.sources_dim(spark)})
        return len(re.findall(r"lambdafunction\(isnotnull",
                              _plan(res.checked)))

    assert lambda_nullchecks(()) >= 1          # default: null scan present
    assert lambda_nullchecks(("tokens",)) == 0  # contract: elided


def test_range_join_is_equi_join_not_nested_loop(spark):
    """range_join exists precisely to avoid the BroadcastNestedLoopJoin
    Spark plans for a bare BETWEEN predicate — assert the binned plan is
    a hash/sort-merge equi-join on the bucket."""
    from go_jsonschema_spark.operators.asof import range_join

    pts = spark.range(1000).select(F.col("id").cast("double").alias("x"))
    ivs = spark.range(200).select(
        (F.col("id") * 5.0).alias("lo"), (F.col("id") * 5.0 + 9.0).alias("hi"))
    plan = _plan(range_join(pts, ivs, left_point="x", right_start="lo",
                            right_end="hi", bin_width=10.0))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)

    # the naive formulation really does plan a nested loop (the trap)
    naive = _plan(pts.join(ivs, (F.col("x") >= F.col("lo"))
                           & (F.col("x") <= F.col("hi"))))
    assert "BroadcastNestedLoopJoin" in naive or "CartesianProduct" in naive


def test_diversity_sample_single_exchange_no_python(spark):
    """Nearest-centroid assignment must stay a native argmin expression:
    ONE Exchange (the per-cell rank window), no Python eval nodes."""
    from go_jsonschema_spark.operators.sampling import diversity_sample

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import numpy as np

    cent = np.asarray([[float(i == j) for j in range(64)] for i in range(4)])
    plan = _plan(diversity_sample(e, 5, centroids=cent))
    assert plan.count("Exchange (") == 1
    assert "EvalPython" not in plan


def test_semantic_contamination_zero_shuffle(spark):
    """The corpus side must never shuffle: one MapInPandas over the scan,
    no Exchange anywhere (probe matrix travels in the closure)."""
    from go_jsonschema_spark.operators.decontam import semantic_contamination

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    probes = e.filter(F.col("vec_id") < 3)
    plan = _plan(semantic_contamination(
        e.filter(F.col("vec_id") >= 3), probes, threshold=0.25))
    assert plan.count("Exchange (") == 0
    assert "MapInPandas" in plan


def test_simhash_pairs_no_dedup_exchange(spark):
    """r5: pair dedup rides the join output as a first-shared-block
    filter over the two signatures already present — the plan must show
    exactly the banding-join exchange pattern (one Exchange reused for
    both sides) with NO extra exchange for a dropDuplicates."""
    from go_jsonschema_spark.operators.dedup import simhash_dup_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(simhash_dup_pairs(docs))
    # dropDuplicates(a, b) would compile to an aggregate behind an
    # exchange hash-partitioned on the PAIR columns — assert that
    # exchange is gone (the banding/cap exchanges key on blk/bv/id)
    assert "hashpartitioning(a" not in plan
    # and the exact-hamming filter still runs (verify not lost)
    assert "bit_count" in plan


def test_pmi_and_vocab_overlap_native_plans(spark):
    """r6: both corpus collocation/overlap ops stay JVM-side (no Python
    eval nodes) and the small dimension tables broadcast — the unigram/
    totals tables in PMI, the per-group size skeleton in vocab_overlap."""
    from go_jsonschema_spark.operators.corpus import (
        pmi_collocations, vocab_overlap)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pmi_plan = _plan(pmi_collocations(docs, min_count=5, top_k=50))
    assert "BatchEvalPython" not in pmi_plan
    assert "ArrowEvalPython" not in pmi_plan
    assert "BroadcastExchange" in pmi_plan        # totals/bigram mass
    assert "TakeOrderedAndProject" in pmi_plan    # top-k, no global sort

    vo_plan = _plan(vocab_overlap(docs, group_col="source"))
    assert "BatchEvalPython" not in vo_plan
    assert "BroadcastExchange" in vo_plan         # sizes skeleton
    # the fact scan is pruned to the two needed columns
    assert "n_chars" not in vo_plan
