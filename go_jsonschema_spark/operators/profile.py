"""Constraint suggestion: profile a table and propose the spec that
already holds — the keyword-level PRESENTATION of the spec-inference
core (infer.py, r5).  ``infer.infer_table_spec`` answers "give me a
runnable TableSpec"; this module answers the review-workflow question
"show me each proposed constraint as a row I can accept or reject"
(deequ's ConstraintSuggestionRunner is the public prior art; the
reference has no analogue — its specs are always authored).

The heavy lifting is NOT duplicated: the single-pass per-column
aggregation and the bounded string-enum collection are
``infer._profile_rows`` (one collected row bounded by #columns + one
collect bounded by n_candidates × enum_max).  This module adds only a
numeric-enum candidate collect (categorical integer codes — a case
infer.py's TableSpec generator deliberately maps to bounds instead)
and the row-shaped output.

Suggestions are DETERMINISTIC rows ``(column, keyword, value)`` —
DuckDB replays every one — and :func:`suggest_spec` assembles them
into a runnable :class:`~go_jsonschema_spark.spec.TableSpec` whose
defining property is self-consistency: running the suggested spec on
the profiled table yields zero violations (pinned by test).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from go_jsonschema_spark.infer import _NUMERIC as _INFER_NUMERIC
from go_jsonschema_spark.infer import _profile_rows

__all__ = ["dataset_card", "suggest_constraints", "suggest_spec",
           "suggest_tolerances"]

_NUMERIC = _INFER_NUMERIC + (T.DecimalType,)
_TYPED = {"string", "integer", "number", "boolean"}


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
    approx: bool = False,
) -> DataFrame:
    """Suggestion rows ``(column, keyword, value)``, ordered by
    (column, keyword).  Keywords emitted:

    - ``type``       — the column type's JSON-Schema name (only for
      string/integer/number/boolean columns; temporal and nested types
      have no faithful JSON scalar type)
    - ``required``   — when the column has zero NULLs
    - ``enum``       — sorted JSON array of the distinct values (as
      strings), when ``0 < distinct ≤ enum_max``; string AND numeric
      columns qualify (categorical integer codes are enums too)
    - ``minimum`` / ``maximum``       — numeric observed bounds
    - ``minLength`` / ``maxLength``   — string observed length bounds
    - ``unique``     — when distinct == non-null == rows (a key
      candidate → ``{"kind": "unique"}`` table check)

    ``approx=True`` is the 10^12-row form: HLL
    ``approx_count_distinct`` replaces the exact distinct count, enum
    gating uses the estimate, and ``unique`` suggestions are SUPPRESSED
    (a sketch cannot prove exact distinctness).
    """
    spark = df.sparkSession
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns else list(fields)
    for c in cols:
        if c not in fields:
            raise KeyError(f"suggest_constraints: no column {c!r}")

    rows, str_enums = _profile_rows(df, cols, enum_max=enum_max,
                                    approx=approx)
    prof = {r[0]: r for r in rows}

    # numeric enum candidates — one extra bounded collect, same
    # discipline as the string-enum pass in _profile_rows
    num_cands = [
        c for c in cols
        if isinstance(fields[c], _NUMERIC)
        and 0 < prof[c][4] <= enum_max
    ]
    num_enums: dict[str, list[str]] = {}
    if num_cands:
        erow = df.agg(*[
            F.collect_set(F.col(c).cast("string")).alias(c)
            for c in num_cands
        ]).first()
        for c in num_cands:
            num_enums[c] = sorted(erow[c])

    out: list[tuple[str, str, str]] = []
    for c in cols:
        _, jt, n, n_null, nd, mn, mx, minl, maxl, _ = prof[c]
        nn = n - n_null
        if jt in _TYPED:
            out.append((c, "type", jt))
        if n_null == 0 and n > 0:
            out.append((c, "required", "true"))
        vals = (str_enums.get(c) if isinstance(fields[c], T.StringType)
                else num_enums.get(c))
        if vals:
            out.append((c, "enum", json.dumps(vals)))
        if isinstance(fields[c], _NUMERIC) and mn is not None:
            out.append((c, "minimum", _fmt(mn)))
            out.append((c, "maximum", _fmt(mx)))
        elif isinstance(fields[c], T.StringType) and minl is not None:
            out.append((c, "minLength", _fmt(minl)))
            out.append((c, "maxLength", _fmt(maxl)))
        if not approx and n > 0 and nd == nn == n:
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
    ``unique`` suggestions become table checks.

    Self-consistency contract (pinned by test): running the suggested
    spec over the profiled DataFrame produces ZERO violations.  NULL
    is a JSON type, so a column observed WITH nulls gets
    ``[type, "null"]`` and a NULL-admitting enum — same rule as
    ``infer.infer_table_spec``, which remains the direct one-call
    data→TableSpec path (and adds array-shape constraints this
    keyword-row surface does not model).
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
            # int first, float fallback: _fmt renders small/large doubles
            # in scientific notation ('1e-05' has no '.'), so a
            # contains-'.' test crashed on such columns (ADVICE r6);
            # values that parsed before parse to the same number
            try:
                spec[kw] = int(v)
            except ValueError:
                spec[kw] = float(v)
        elif kw in ("minLength", "maxLength"):
            spec[kw] = int(v)
        elif kw == "unique":
            table_checks.append(
                {"kind": "unique", "id": f"unique:{c}", "columns": [c]})
    return TableSpec(columns=col_specs, table_checks=table_checks)

def dataset_card(
    df: DataFrame,
    suite=None,
    *,
    key: str = "doc_id",
    dims: dict | None = None,
) -> DataFrame:
    """One-call dataset card: the long-format ``(metric, value)`` summary
    a data-readiness review starts from, assembled LAZILY (no collect —
    the card is a DataFrame you can write next to the batch it
    describes).

    Metrics (all double; counts are exact integers in double form):

    - ``n_rows``; ``n_dup_key_rows`` (rows beyond the first per ``key``)
    - ``null_ratio.<col>`` for every column, and ``empty_ratio.<col>``
      for array columns (empty arrays are a distinct pathology from
      NULLs — a tokenizer that emits [] did not emit nothing)
    - with ``suite``: ``n_row_fail`` / ``row_fail_ratio`` and a
      ``fail.<constraint_id>`` row per constraint — from the suite's
      counts-only fast path (ONE predicate-scan aggregation, zero
      violation materialization)

    Plan shape: one map-side-combined aggregation over the scan for the
    shape metrics, one count-distinct aggregation for the key, one
    predicate-scan aggregation for the suite block; the single-row
    results explode into rows driver-free and union — everything stays
    a lazy plan, nothing scales with data except those three passes."""
    cols = [f.name for f in df.schema.fields]
    arrays = [f.name for f in df.schema.fields
              if isinstance(f.dataType, T.ArrayType)]
    aggs = [
        F.count(F.lit(1)).alias("__n__"),
        F.count_distinct(F.col(key)).alias("__nd__"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{i}__")
          for i, c in enumerate(cols)],
        *[F.sum((F.coalesce(F.size(F.col(c)), F.lit(-1)) == 0)
                .cast("long")).alias(f"__empty_{i}__")
          for i, c in enumerate(cols) if c in arrays],
    ]
    one = df.agg(*aggs)
    entries = [
        F.struct(F.lit("n_rows").alias("metric"),
                 F.col("__n__").cast("double").alias("value")),
        F.struct(F.lit("n_dup_key_rows").alias("metric"),
                 (F.col("__n__") - F.col("__nd__"))
                 .cast("double").alias("value")),
    ]
    for i, c in enumerate(cols):
        entries.append(F.struct(
            F.lit(f"null_ratio.{c}").alias("metric"),
            F.round(F.col(f"__null_{i}__") / F.col("__n__"), 6)
            .alias("value")))
        if c in arrays:
            entries.append(F.struct(
                F.lit(f"empty_ratio.{c}").alias("metric"),
                F.round(F.col(f"__empty_{i}__") / F.col("__n__"), 6)
                .alias("value")))
    card = one.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.metric", "e.value")
    if suite is None:
        return card
    vc = suite.verdict_counts(df)
    fail_entries = [
        F.struct(F.lit("n_row_fail").alias("metric"),
                 F.col("n_fail").cast("double").alias("value")),
        F.struct(F.lit("row_fail_ratio").alias("metric"),
                 F.round(F.col("n_fail") / F.col("n_rows"), 6)
                 .alias("value")),
    ] + [
        F.struct(F.lit(f"fail.{cid}").alias("metric"),
                 F.coalesce(
                     F.element_at("fail_by_constraint", F.lit(cid)),
                     F.lit(0)).cast("double").alias("value"))
        for cid, _ in suite.compile(df).predicates
    ]
    suite_rows = vc.select(
        F.explode(F.array(*fail_entries)).alias("e")).select(
        "e.metric", "e.value")
    return card.unionByName(suite_rows)

def suggest_tolerances(
    df: DataFrame,
    suite,
    *,
    margin: float = 0.0,
    quantize: int = 4,
) -> dict[str, float]:
    """Propose ``TableSpec.tolerances`` from observed failure rates — the
    budget-review analogue of :func:`suggest_spec`: profile the batch
    with the suite's counts-only pass (ONE predicate-scan aggregation,
    zero violation materialization), then for every constraint that has
    failures suggest the largest ``mostly`` the batch satisfies,
    floored to ``quantize`` decimal places (≤ 6 — the spec's BIGINT
    overflow cap) minus ``margin``.

    Self-consistency contract (pinned by test): re-running the suite
    with the suggested tolerances on the SAME batch passes.  Constraints
    with zero failures are omitted — absence means strict, and a clean
    constraint should stay strict."""
    if not 0 < quantize <= 6:
        raise ValueError("quantize must be in 1..6 (spec denominator cap)")
    row = suite.verdict_counts(df).first()
    if row is None or not row["n_rows"]:
        return {}
    n = row["n_rows"]
    fails = row["fail_by_constraint"] or {}
    scale = 10 ** quantize
    out: dict[str, float] = {}
    for cid, f in sorted(fails.items()):
        if not f:
            continue
        # floor((n-f)/n * scale) in exact integer math, then the margin
        q = ((n - f) * scale) // n - round(margin * scale)
        if q <= 0:
            q = 1  # an all-failing constraint still gets a valid budget
        out[cid] = q / scale
    return out
