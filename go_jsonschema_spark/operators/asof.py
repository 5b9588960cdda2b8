"""As-of join — the time-series join Spark lacks natively (guide §OLAP).

Scalable formulation (no per-group Python, no range explosion): tag both
sides, union, and take the running ``last_value`` of the right side's
payload over a window partitioned by key and ordered by (ts, side) — each
left row then carries the most recent right row with ``right.ts <=
left.ts``.  ONE shuffle (the window partitioning), O(n log n) per key.

An ``applyInPandas`` + ``pd.merge_asof`` variant is the fallback when the
payload is too wide to thread through the union, at the cost of the
Arrow boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the latest ``payload`` columns of the
    right row with the same ``key`` and ``right.ts <= left.ts`` (NULLs when
    none exists).  Column names of attached payload get ``suffix``."""
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side__"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}__")
          for p in payload],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side__"),
        *[F.col(p).alias(f"__p_{p}__") for p in payload],
    )
    both = tagged_l.unionByName(tagged_r)
    # right rows sort before left rows at equal ts (side 0 < 1) → a right
    # row AT the left row's ts is visible to it ("<=" semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__side__").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        *lcols,
        "__side__",
        *[
            F.last(f"__p_{p}__", ignorenulls=True).over(w).alias(f"{p}{suffix}")
            for p in payload
        ],
    )
    return carried.filter(F.col("__side__") == 1).drop("__side__")
