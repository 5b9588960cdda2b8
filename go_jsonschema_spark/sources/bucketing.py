"""Bucketed-table helpers: co-locate repeated joins/aggregations.

At 100 TB the same fact table is typically validated every run against
the same dimension keys (referential checks) and grouped on the same key
(uniqueness).  Writing it ONCE bucketed by that key makes every later
join/aggregation on the key shuffle-free: Spark's bucketing contract
(``bucketBy`` on ``saveAsTable``) records the hash-partitioning in the
catalog, and the planner drops the Exchange on the bucketed side(s).

The reference has no storage layer at all (/root/reference validates
per-document in memory); this module is the Spark-native answer for the
recurring-validation deployment, where the scan layout IS part of the
contract.

Usage::

    write_bucketed(lineitem, "lineitem_b", key="l_orderkey", buckets=64)
    write_bucketed(orders,   "orders_b",   key="o_orderkey", buckets=64)
    j = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    # plan: zero Exchange under the join — verified by
    # tests/test_plan_properties.py::test_bucketed_join_has_no_shuffle
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str | list[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table.

    ``buckets`` should be sized so one bucket of the FACT table fits an
    executor's memory at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB
    per bucket per sort-merge task before column pruning)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def is_bucketed_on(spark, table: str, key: str) -> bool:
    """True when ``table`` is bucketed with ``key`` among its bucket
    columns (DESCRIBE-based, no scan)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols = {r["col_name"]: (r["data_type"] or "") for r in rows}
    return key in cols.get("Bucket Columns", "")
