"""normalize_text + normalized dedup: planted case/punct/space variants
collapse to one keeper; distinct texts survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_jsonschema_spark.functions.text import normalize_text
from go_jsonschema_spark.operators.dedup import exact_duplicates


def test_normalize_text_canonical_form(spark):
    rows = [(1, "Hello,   World!"), (2, "hello world"),
            (3, "HELLO--WORLD"), (4, "héllo wörld")]
    out = {r["doc_id"]: r["t"] for r in spark.createDataFrame(
        rows, "doc_id long, text string").select(
        "doc_id", normalize_text(F.col("text")).alias("t")).collect()}
    assert out[1] == out[2] == out[3] == "hello world"
    assert out[4] == "héllo wörld"  # unicode letters preserved


def test_normalized_dedup_finds_variants(spark):
    rows = [(1, "The cat sat."), (2, "the   CAT sat"), (3, "The-cat-sat!"),
            (4, "a different text")]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "text", normalize_text(F.col("text")))
    out = exact_duplicates(df).collect()
    dropped = {r["doc_id"]: r["keeper_id"] for r in out}
    assert dropped == {2: 1, 3: 1}  # keeper = min id; 4 untouched
    assert all(r["group_size"] == 3 for r in out)
