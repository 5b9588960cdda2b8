"""Typed-path format predicates must agree with the interpreter's format
checkers on every string instance in the optional/format corpus — the
native-regex formats (uuid, duration, hostname, json-pointer, date, ...)
are separate implementations from interp._FORMAT_CHECKS and can drift."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.functions.formats import format_predicate
from go_jsonschema_spark.interp import _FORMAT_CHECKS

SUITE = "/root/reference/testdata/draft7/optional/format"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SUITE), reason="reference corpus not present"
)


def test_format_predicate_matches_interp(spark):
    rows = []
    for path in sorted(glob.glob(os.path.join(SUITE, "*.json"))):
        fmt = os.path.basename(path)[:-5]
        if fmt not in _FORMAT_CHECKS:
            continue
        for group in json.load(open(path)):
            for t in group["tests"]:
                if isinstance(t["data"], str) and "\x00" not in t["data"]:
                    rows.append((fmt, t["data"]))
    assert len(rows) > 150
    df = spark.createDataFrame(rows, "fmt string, value string")
    fmts = sorted({r[0] for r in rows})
    pred = None
    for fmt in reversed(fmts):
        p = format_predicate(fmt, F.col("value"))
        pred = p if pred is None else F.when(F.col("fmt") == fmt, p).otherwise(pred)
    got = df.select("fmt", "value", pred.alias("ok")).collect()
    mismatches = [
        f"{r['fmt']}: {r['value']!r} spark={r['ok']} "
        f"interp={_FORMAT_CHECKS[r['fmt']](r['value'])}"
        for r in got
        if bool(r["ok"]) != bool(_FORMAT_CHECKS[r["fmt"]](r["value"]))
    ]
    assert not mismatches, "\n".join(mismatches[:20])
