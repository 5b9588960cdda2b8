"""Schema-enforced readers that surface malformed input as violations.

A validation engine must not silently drop undecodable source rows: with
Spark's default PERMISSIVE mode a broken JSON line becomes an all-NULL
row (indistinguishable from legitimate nulls) and with DROPMALFORMED it
vanishes.  These readers declare the expected schema plus a corrupt-record
column, split the scan into (clean rows, violation rows), and keep the
raw text of every malformed record as the violation's ``observed`` value.

Works for ``json`` (JSON-lines) and ``csv``.  One scan, no Python: the
split is two filters over the same cached parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["read_with_corrupt_capture"]

_CORRUPT = "__corrupt_record__"


def read_with_corrupt_capture(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    format: str = "json",
    key: str | None = None,
    constraint_id: str | None = None,
    options: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(clean, violations)``.

    ``clean``      — rows matching ``schema`` (corrupt column dropped).
    ``violations`` — ``(doc_id, constraint_id, observed)`` rows, one per
    malformed record, ``observed`` = the raw record text (truncated to
    256 chars like every other observed value).  ``doc_id`` is taken from
    ``key`` when that field parsed, else NULL.

    The parse is cached before splitting: Spark disallows filters that
    reference ONLY the internal corrupt-record column on a direct file
    scan, and caching also makes the two branches share one read."""
    full = T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )
    reader = (
        spark.read.format(format)
        .schema(full)
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("mode", "PERMISSIVE")
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load(path).cache()
    clean = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    cid = constraint_id or f"source.malformed:{format}"
    doc_id = (
        F.col(key).cast("string") if key and key in schema.fieldNames()
        else F.lit(None).cast("string")
    )
    violations = df.filter(F.col(_CORRUPT).isNotNull()).select(
        doc_id.alias("doc_id"),
        F.lit(cid).alias("constraint_id"),
        F.substring(F.col(_CORRUPT), 1, 256).alias("observed"),
    )
    return clean, violations
