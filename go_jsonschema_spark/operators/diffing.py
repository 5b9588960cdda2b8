"""Keyed dataset diff: what changed between two versions of a table.

Data pipelines re-materialize tables constantly (new crawl, re-run
curation, backfill); the operational question is always "what did this
run CHANGE" — rows added, rows removed, rows whose tracked columns
differ, and WHICH columns.  ``dataset_diff`` answers it relationally:
ONE full outer sort-merge join on the key (the unavoidable shuffle;
co-partitioned/bucketed inputs elide it), a null-safe per-column
compare (``<=>`` so NULL→value and value→NULL count as changes), and a
NATIVE array filter to name the changed columns.  Unchanged rows are
filtered OUT (at 10^12 rows the diff is the small output; the identity
is the big one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dataset_diff"]


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff ``new`` against ``old`` by ``key_cols``.

    ``compare_cols`` defaults to all shared non-key columns.  Keys must
    be unique per side (it's a keyed diff, not a multiset diff — run
    through a latest-wins compaction first if not).

    Output: ``(*key_cols, change_type, changed_cols)`` with
    ``change_type ∈ {added, removed, changed}`` and ``changed_cols``
    the sorted column-name array (empty for added/removed).
    """
    if not key_cols:
        raise ValueError("dataset_diff: empty key_cols")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    missing = [c for c in compare_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"dataset_diff: columns absent on a side: {missing}")

    # presence flags: "any side-column IS NOT NULL" is unreliable when
    # a row's compared values are all NULL, so tag each side explicitly
    o = old.select(*key_cols,
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
                   F.lit(True).alias("__in_o"))
    n = new.select(*key_cols,
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
                   F.lit(True).alias("__in_n"))
    # join on the key columns by name (a NULL key is malformed input
    # either way); full outer keeps both orphan sides
    j = o.join(n, on=key_cols, how="full_outer")

    diffs = F.array(*[
        F.struct(
            F.lit(c).alias("c"),
            (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).alias("d"),
        )
        for c in sorted(compare_cols)
    ])
    changed_cols = F.transform(
        F.filter(diffs, lambda s: s["d"]), lambda s: s["c"])
    change_type = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .where(F.col("change_type").isNotNull())
        .select(
            *key_cols, "change_type",
            F.when(F.col("change_type") == "changed", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
