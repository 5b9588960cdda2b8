"""kind=scoped column wrapper + row_check `where` — row-conditioned
constraints (the Great-Expectations row_condition analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.engine import ConstraintSuite
from go_jsonschema_spark.spec import SpecError, TableSpec


def _df(spark):
    return spark.createDataFrame(
        [("a", 10, "web"), ("b", 2, "web"), ("c", 2, "pdf"),
         ("d", None, "web"), ("e", 3, None)],
        "doc_id string, v int, src string")


def test_scoped_column_judges_only_in_scope(spark):
    ts = TableSpec(columns={"v": {"kind": "scoped", "where": "src = 'web'",
                                  "schema": {"minimum": 5}}})
    got = {(r["doc_id"], r["constraint_id"])
           for r in ConstraintSuite(ts).run(_df(spark)).violations.collect()}
    # b: web, 2 < 5 -> fails; c: pdf (out of scope), e: NULL src (out of
    # scope), d: NULL value passes minimum (json-schema null semantics)
    assert got == {("b", "v.minimum")}


def test_scoped_row_check(spark):
    ts = TableSpec(row_checks=[{"id": "rc", "expr": "v % 2 = 0",
                                "where": "src = 'web'", "observed": "v"}])
    got = {r["doc_id"]
           for r in ConstraintSuite(ts).run(_df(spark)).violations.collect()}
    # in web scope: a=10 even ok, b=2 even ok, d=NULL -> NULL expr ->
    # coalesce False -> fails; c/e out of scope despite odd values
    assert got == {"d"}


def test_out_of_scope_rows_pass_verdict_and_split(spark):
    ts = TableSpec(columns={"v": {"kind": "scoped", "where": "src = 'web'",
                                  "schema": {"minimum": 5}}})
    res = ConstraintSuite(ts).run(_df(spark), partition_col="src")
    verdicts = {r["partition"]: r["passed"]
                for r in res.verdicts.collect()}
    assert verdicts == {"web": False, "pdf": True, None: True}
    clean, bad = res.split()
    assert {r["doc_id"] for r in bad.collect()} == {"b"}
    assert clean.count() == 4


def test_scope_composes_with_tolerances(spark):
    # 10 web rows, 1 failure -> 90% pass of the PARTITION (tolerance
    # denominators are partition rows, documented)
    rows = [(f"w{i}", 1 if i == 0 else 9, "web") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, v int, src string")
    ts = TableSpec(
        columns={"v": {"kind": "scoped", "where": "src = 'web'",
                       "schema": {"minimum": 5}}},
        tolerances={"v.minimum": 0.9},
    )
    assert ConstraintSuite(ts).run(df).verdicts.first()["passed"] is True


def test_scoped_spec_validation():
    with pytest.raises(SpecError, match="needs 'where'"):
        TableSpec(columns={"v": {"kind": "scoped", "schema": {}}})
    with pytest.raises(SpecError, match="cannot wrap"):
        TableSpec(columns={"v": {
            "kind": "scoped", "where": "1=1",
            "schema": {"kind": "json", "schema": {}}}})


def test_unscoped_semantics_unchanged(spark):
    # same schema without the wrapper: pdf/NULL-src rows ARE judged
    ts = TableSpec(columns={"v": {"minimum": 5}})
    got = {r["doc_id"]
           for r in ConstraintSuite(ts).run(_df(spark)).violations.collect()}
    assert got == {"b", "c", "e"}
