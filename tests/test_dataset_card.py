"""profile.dataset_card — lazy long-format dataset summary."""

from __future__ import annotations

from go_jsonschema_spark.engine import ConstraintSuite
from go_jsonschema_spark.operators.profile import dataset_card
from go_jsonschema_spark.spec import TableSpec


def _df(spark):
    return spark.createDataFrame(
        [("a", [1, 2], 5), ("a", [], None), ("b", None, 3), ("c", [9], -1)],
        "doc_id string, tokens array<int>, v int")


def test_shape_metrics(spark):
    got = {r["metric"]: r["value"]
           for r in dataset_card(_df(spark), key="doc_id").collect()}
    assert got["n_rows"] == 4.0
    assert got["n_dup_key_rows"] == 1.0          # 'a' twice
    assert got["null_ratio.tokens"] == 0.25      # one NULL array
    assert got["empty_ratio.tokens"] == 0.25     # one [] (NULL is not empty)
    assert got["null_ratio.v"] == 0.25
    assert got["null_ratio.doc_id"] == 0.0


def test_suite_block(spark):
    suite = ConstraintSuite(
        TableSpec(columns={"v": {"type": "integer", "minimum": 0}}),
        key="doc_id")
    got = {r["metric"]: r["value"]
           for r in dataset_card(_df(spark), suite, key="doc_id").collect()}
    # v=-1 fails minimum; NULL v passes minimum but fails type
    assert got["fail.v.minimum"] == 1.0
    assert got["fail.v.type"] == 1.0
    assert got["n_row_fail"] == 2.0
    assert got["row_fail_ratio"] == 0.5


def test_card_is_lazy_plan(spark):
    # no action ran at build time: the return is a plain DataFrame whose
    # plan contains the three aggregation passes, not materialized rows
    card = dataset_card(_df(spark), key="doc_id")
    assert card.schema.simpleString() == "struct<metric:string,value:double>"
