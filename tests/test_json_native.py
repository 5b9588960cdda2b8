"""Differential tests: native from_json JSON validation vs the
interpreter UDF path — identical verdicts on every payload, zero Python
in the native plan."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.compile import CompileError, json_column_predicate
from go_jsonschema_spark.functions.json_native import (
    json_column_predicate_auto,
    json_column_predicate_native,
)
from go_jsonschema_spark.interp import validate_instance

PROPS_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 49}},
}

NESTED_SCHEMA = {
    "type": "object",
    "required": ["name", "meta"],
    "properties": {
        "name": {"type": "string", "minLength": 2, "pattern": "^[a-z]+$"},
        "meta": {
            "type": "object",
            "required": ["n"],
            "properties": {
                "n": {"type": "number", "exclusiveMinimum": 0},
                "tags": {"type": ["array", "null"],
                         "items": {"type": "number", "minimum": 0}},
            },
        },
        "opt": {"type": ["integer", "null"], "multipleOf": 3},
        "nick": {"type": ["string", "null"], "maxLength": 3},
    },
}

PAYLOADS = [
    '{"k": 12}', '{"k": 0}', '{"k": 49}', '{"k": 50}', '{"k": -1}',
    '{"k": 12.0}', '{"k": 12.5}', '{"k": "12"}', '{"k": null}', '{"k": true}',
    '{"k": [1]}', '{}', '{"other": 3}', '5', '"str"', '[1,2]', 'null', 'true',
    'garbage', '', '   ', None, '{"k": 1e400}', '  {"k": 3}  ',
    '{"name": "ab", "meta": {"n": 1.5}}',
    '{"name": "ab", "meta": {"n": 0}}',
    '{"name": "ab", "meta": {"n": 2, "tags": ["x"]}}',
    '{"name": "ab", "meta": {"n": 2, "tags": [1, 2.5]}}',
    '{"name": "ab", "meta": {"n": 2, "tags": [1, -4]}}',
    '{"name": "ab", "meta": {"n": 2, "tags": [null]}}',
    '{"name": "ab", "meta": {"n": 2, "tags": null}}',
    '{"name": "ab", "meta": {"n": 2, "tags": []}}',
    '{"name": "A", "meta": {"n": 1}}',
    '{"name": 5, "meta": {"n": 1}}',
    '{"name": true, "meta": {"n": 1}}',
    '{"name": null, "meta": {"n": 1}}',
    '{"name": "ab", "meta": null}',
    '{"name": "ab", "meta": 3}',
    '{"name": "ab", "meta": {"n": 2}, "opt": 9}',
    '{"name": "ab", "meta": {"n": 2}, "opt": 10}',
    '{"name": "ab", "meta": {"n": 2}, "opt": null}',
    '{"name": "ab", "meta": {"n": 2}, "nick": "xy"}',
    '{"name": "ab", "meta": {"n": 2}, "nick": "wxyz"}',
    '{"name": "ab", "meta": {"n": 2}, "nick": 7}',
    '{"name": "ab", "meta": {"n": 2}, "nick": null}',
]


@pytest.mark.parametrize("schema", [PROPS_SCHEMA, NESTED_SCHEMA])
def test_native_matches_interp_and_udf(spark, schema):
    df = spark.createDataFrame([(p,) for p in PAYLOADS], "j string")
    native = json_column_predicate_native(schema)
    udf = json_column_predicate(schema)
    rows = df.select(
        "j",
        native(F.col("j")).alias("n"),
        udf(F.col("j")).alias("u"),
    ).collect()
    for r in rows:
        # interpreter ground truth
        raw = r["j"]
        if raw is None:
            want = False
        else:
            try:
                want = validate_instance(schema, json.loads(raw)).valid
            except (ValueError, TypeError):
                want = False
        assert r["n"] == want, f"native: {raw!r} -> {r['n']}, interp {want}"
        assert bool(r["u"]) == want, f"udf: {raw!r} -> {r['u']}, interp {want}"


def test_native_matches_interp_randomized(spark):
    """Seeded randomized differential: 500 structurally-varied payloads
    through the native path in ONE Spark job, verdicts pinned to the
    interpreter."""
    import random

    rng = random.Random(42)

    def rand_value(depth=0):
        kinds = ["int", "float", "str", "bool", "null", "missing"]
        if depth < 1:
            kinds += ["obj", "arr"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-5, 55)
        if k == "float":
            return rng.choice([0.0, 1.5, 12.0, 49.0, 50.5, -0.5, 1e9])
        if k == "str":
            return rng.choice(["", "ab", "xyz", "12", "ABC", "ééé"])
        if k == "bool":
            return rng.choice([True, False])
        if k == "null":
            return None
        if k == "obj":
            return {"n": rand_value(depth + 1)}
        if k == "arr":
            return [rand_value(depth + 1) for _ in range(rng.randint(0, 3))]
        return "__missing__"

    payloads = []
    for _ in range(500):
        doc = {}
        # biased per-field choice: mostly-valid values with random
        # corruptions, so both verdicts appear in the corpus
        name = rng.choice(["ab", "xyz", "valid", "A", "a", 5, True, None,
                           "", "ééé", "__missing__"])
        meta = rng.choice(
            [{"n": 1.5}, {"n": 2, "tags": [1, 2.5]}, {"n": 0.1},
             {"n": 0}, {"n": -1}, {"n": "x"}, {"n": None}, {},
             {"n": 2, "tags": rand_value()}, None, 3, "__missing__"]
        )
        opt = rng.choice([9, 12, 10, 9.0, None, "9", "__missing__",
                          rand_value()])
        nick = rng.choice(["xy", "wxyz", 7, None, "__missing__"])
        for key, v in (("name", name), ("meta", meta), ("opt", opt),
                       ("nick", nick), ("extra", rand_value())):
            if v != "__missing__":
                doc[key] = v
        payloads.append(json.dumps(doc))
    payloads += ["garbage", "", "[1]", "3", None]

    df = spark.createDataFrame([(p,) for p in payloads], "j string")
    native = json_column_predicate_native(NESTED_SCHEMA)
    rows = df.select("j", native(F.col("j")).alias("n")).collect()
    n_valid = 0
    for r in rows:
        raw = r["j"]
        if raw is None:
            want = False
        else:
            try:
                want = validate_instance(NESTED_SCHEMA, json.loads(raw)).valid
            except (ValueError, TypeError):
                want = False
        n_valid += int(want)
        assert r["n"] == want, f"{raw!r}: native {r['n']} interp {want}"
    assert n_valid > 0  # corpus exercises both verdicts


def test_native_plan_has_no_python(spark):
    import contextlib
    import io

    df = spark.createDataFrame([('{"k": 1}',)], "j string")
    native = json_column_predicate_native(PROPS_SCHEMA)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(native(F.col("j")).alias("ok")).explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.mark.parametrize(
    "schema",
    [
        {"properties": {"k": {"type": "integer"}}},  # no root type
        {"type": "object", "properties": {"k": {"minimum": 0}}},  # untyped prop
        # optional non-nullable property: JSON null vs absent diverges
        {"type": "object", "properties": {"k": {"type": "integer"}}},
        {"type": "object", "required": ["k"], "additionalProperties": False,
         "properties": {"k": {"type": "integer"}}},
        {"type": "object", "required": ["k"], "patternProperties": {"^x": {}},
         "properties": {"k": {"type": "integer"}}},
        # arrays of strings: per-element witnesses unaddressable
        {"type": "object", "required": ["k"],
         "properties": {"k": {"type": "array", "items": {"type": "string"}}}},
        True,
    ],
)
def test_native_rejects_dynamic_schemas(schema):
    with pytest.raises(CompileError):
        json_column_predicate_native(schema)


def test_auto_falls_back_to_udf(spark):
    schema = {"type": "object", "properties": {"k": {"minimum": 0}}}
    fn = json_column_predicate_auto(schema)
    df = spark.createDataFrame([('{"k": -1}',), ('{"k": "s"}',)], "j string")
    got = [r[0] for r in df.select(fn(F.col("j"))).collect()]
    assert got == [False, True]  # minimum vacuous on strings (interp parity)


def test_json_column_errors_surface(spark):
    """Errors-as-data UDF: ALL failed keywords per payload as
    array<string> (the reference's chained error strings, but as data)."""
    from go_jsonschema_spark.compile import json_column_errors

    errs = json_column_errors(PROPS_SCHEMA)
    df = spark.createDataFrame(
        [('{"k": 12}',), ('{"k": 99}',), ('{}',), ("garbage",), (None,)],
        "j string",
    )
    rows = df.select("j", errs(F.col("j")).alias("e")).collect()
    got = {r["j"]: list(r["e"]) for r in rows}
    assert got['{"k": 12}'] == []
    assert any("maximum" in e for e in got['{"k": 99}'])
    assert any("required" in e for e in got["{}"])
    assert any("invalid JSON" in e for e in got["garbage"])
    assert any("null payload" in e for e in got[None])
