"""Constraint suggestion: profile a table and propose the spec that
already holds — the reverse direction of the engine (data → TableSpec
instead of TableSpec → verdicts), the workflow-starter a validation
engine needs when a user points it at an unspecced table (deequ's
ConstraintSuggestionRunner is the public prior art; the reference has
no analogue — its specs are always authored).

Two bounded passes, both scale-honest at 10^12 rows:

1. ONE aggregation pass computing, per profiled column: row count,
   non-null count, exact distinct count, numeric min/max, string
   min/max length.  The result is a single collected row (bounded by
   #columns, never rows).
2. For columns whose distinct count ≤ ``enum_max``: one distinct pass
   over just those columns (narrow (column, value) explode →
   distinct), collected bounded by ``n_candidates × enum_max``.

Suggestions are DETERMINISTIC rows ``(column, keyword, value)`` —
DuckDB can replay every one — and :func:`suggest_spec` assembles them
into a runnable :class:`~go_jsonschema_spark.spec.TableSpec` whose
defining property is self-consistency: running the suggested spec on
the profiled table yields zero violations (pinned by test).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["suggest_constraints", "suggest_spec"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _fmt(v) -> str:
    """Engine-stable string form: integers never grow a '.0'."""
    if v is None:
        return ""
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def suggest_constraints(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    enum_max: int = 20,
) -> DataFrame:
    """Suggestion rows ``(column, keyword, value)``, ordered by
    (column, keyword).  Keywords emitted:

    - ``type``       — the Spark column type's JSON-Schema name
    - ``required``   — when the column has zero NULLs
    - ``enum``       — sorted JSON array, when distinct ≤ ``enum_max``
    - ``minimum`` / ``maximum``           — numeric observed bounds
    - ``minLength`` / ``maxLength``       — string observed length bounds
    - ``unique``     — when distinct count == non-null count == rows
      (a key candidate → ``{"kind": "unique"}`` table check)
    """
    spark = df.sparkSession
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns else list(fields)
    for c in cols:
        if c not in fields:
            raise KeyError(f"suggest_constraints: no column {c!r}")

    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn::{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd::{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).alias(f"min::{c}"))
            aggs.append(F.max(F.col(c)).alias(f"max::{c}"))
        elif isinstance(fields[c], T.StringType):
            aggs.append(F.min(F.length(F.col(c))).alias(f"minl::{c}"))
            aggs.append(F.max(F.length(F.col(c))).alias(f"maxl::{c}"))
    prof = df.agg(*aggs).first()
    n_rows = prof["__rows__"]

    enum_cands = [
        c for c in cols
        if 0 < prof[f"nd::{c}"] <= enum_max
        and isinstance(fields[c], (T.StringType, *_NUMERIC))
    ]
    enum_values: dict[str, list] = {}
    if enum_cands:
        # one distinct pass over only the candidate columns; the
        # collect is bounded by n_candidates × enum_max by construction
        pairs = df.select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.col(c).cast("string").alias("v"))
            for c in enum_cands
        ])).alias("p")).select("p.c", "p.v").filter(
            F.col("v").isNotNull()).distinct()
        for r in pairs.collect():
            enum_values.setdefault(r["c"], []).append(r["v"])

    # date/timestamp columns get no type suggestion: the engine
    # validates JSON types against the column's native Spark type, and
    # a temporal column is neither string nor number
    _TYPE = {
        "string": "string", "long": "integer", "int": "integer",
        "short": "integer", "byte": "integer", "double": "number",
        "float": "number", "boolean": "boolean",
    }
    out: list[tuple[str, str, str]] = []
    for c in cols:
        t = fields[c].simpleName() if hasattr(fields[c], "simpleName") \
            else fields[c].typeName()
        jt = _TYPE.get(fields[c].typeName())
        if jt:
            out.append((c, "type", jt))
        nn, nd = prof[f"nn::{c}"], prof[f"nd::{c}"]
        if nn == n_rows and n_rows > 0:
            out.append((c, "required", "true"))
        if c in enum_values:
            vals = sorted(enum_values[c])
            out.append((c, "enum", json.dumps(vals)))
        if isinstance(fields[c], _NUMERIC) and nn > 0:
            out.append((c, "minimum", _fmt(prof[f"min::{c}"])))
            out.append((c, "maximum", _fmt(prof[f"max::{c}"])))
        elif isinstance(fields[c], T.StringType) and nn > 0:
            out.append((c, "minLength", _fmt(prof[f"minl::{c}"])))
            out.append((c, "maxLength", _fmt(prof[f"maxl::{c}"])))
        if n_rows > 0 and nd == nn == n_rows:
            out.append((c, "unique", "true"))
    out.sort()
    return spark.createDataFrame(
        out, "column string, keyword string, value string")


def suggest_spec(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    enum_max: int = 20,
    key: str | None = None,
) -> "TableSpec":
    """Assemble :func:`suggest_constraints` rows into a runnable
    TableSpec.  Numeric bounds/enums become per-column keywords;
    ``unique`` suggestions become table checks.  Type suggestions for
    string-typed date/timestamp columns stay ``string`` (the engine
    validates the stored representation, not the logical type).

    Self-consistency contract (pinned by test): running the suggested
    spec over the profiled DataFrame produces ZERO violations.
    """
    from go_jsonschema_spark.spec import TableSpec

    fields = {f.name: f.dataType for f in df.schema.fields}
    rows = suggest_constraints(df, columns, enum_max=enum_max).collect()
    col_specs: dict[str, dict] = {}
    table_checks: list[dict] = []
    required = {r["column"] for r in rows if r["keyword"] == "required"}
    for r in rows:
        c, kw, v = r["column"], r["keyword"], r["value"]
        spec = col_specs.setdefault(c, {})
        if kw == "type":
            # NULL is a JSON type: a column observed WITH nulls must
            # admit them or the suggested spec flags the very rows it
            # was profiled on (self-consistency contract)
            spec["type"] = v if c in required else [v, "null"]
        elif kw == "required":
            pass  # already folded into the type suggestion above
        elif kw == "enum":
            vals = json.loads(v)
            if isinstance(fields[c], _NUMERIC):
                cast = (float if isinstance(
                    fields[c], (T.FloatType, T.DoubleType, T.DecimalType))
                    else int)
                vals = [cast(x) for x in vals]
            if c not in required:
                vals = vals + [None]  # observed NULLs stay admissible
            spec["enum"] = vals
        elif kw in ("minimum", "maximum"):
            spec[kw] = float(v) if "." in v else int(v)
        elif kw in ("minLength", "maxLength"):
            spec[kw] = int(v)
        elif kw == "unique":
            table_checks.append(
                {"kind": "unique", "id": f"unique:{c}", "columns": [c]})
    return TableSpec(columns=col_specs, table_checks=table_checks)
