"""packing.packing_efficiency — context-length waste sweep."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.packing import packing_efficiency


def test_hand_computed(spark):
    # docs: 3, 5, 8 tokens; L=4: ceil slots 4+8+8=20; L=8: 8+8+8=24
    df = spark.createDataFrame([(3,), (5,), (8,), (None,), (0,)],
                               "n_tok int")
    got = {r["context_len"]: r for r in
           packing_efficiency(df, [4, 8]).collect()}
    assert got[4]["total_tokens"] == 16
    assert got[4]["pad_per_doc_slots"] == 20
    assert got[4]["pad_per_doc_util"] == 0.8
    assert got[4]["concat_chunk_slots"] == 16  # 16 divides 4 exactly
    assert got[4]["concat_chunk_util"] == 1.0
    assert got[8]["pad_per_doc_slots"] == 24
    assert got[8]["concat_chunk_slots"] == 16


def test_dedup_and_validation(spark):
    df = spark.createDataFrame([(3,)], "n_tok int")
    assert packing_efficiency(df, [4, 4, 8]).count() == 2  # deduped
    with pytest.raises(ValueError, match="positive ints"):
        packing_efficiency(df, [0])
    with pytest.raises(ValueError, match="positive ints"):
        packing_efficiency(df, [])


def test_one_aggregation_pass(spark):
    import contextlib, io
    df = spark.createDataFrame([(3,)], "n_tok int")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        packing_efficiency(df, [128, 256, 512]).explain("formatted")
    plan = buf.getvalue()
    # all three Ls share one aggregate; no join, no extra scans
    import re
    nodes = re.findall(r"^\(\d+\) (\w+)", plan, flags=re.M)
    assert nodes.count("HashAggregate") == 2  # partial + final
    assert nodes.count("Scan") <= 1 and "Join" not in plan
