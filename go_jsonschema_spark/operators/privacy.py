"""Privacy re-identification checks: k-anonymity and l-diversity.

Dataset-level governance checks in the same family as
operators/uniqueness.py and referential.py (SURVEY.md §2.8 — the
north-star dataset checks the reference's per-document engine cannot
express): before releasing or training on a table containing
quasi-identifiers, verify that no combination of them isolates fewer
than k people (k-anonymity, Sweeney 2002) and that each equivalence
class carries at least l distinct sensitive values (l-diversity,
Machanavajjhala et al. 2007).

100 TB shape: both checks are ONE groupBy over the quasi-identifier
columns — map-side combine collapses each class to a single partial
per task, so the shuffle carries class-level rows (bounded by the
number of equivalence classes, not the row count).  l-diversity uses
exact count(DISTINCT) which Spark plans as a two-phase expand —
still class-keyed, never row-keyed.  The outputs are small
(violating classes only); joining them back to quarantine raw rows is
one broadcast semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["k_anonymity", "l_diversity"]


def _quasi(cols: list[str]) -> list:
    if not cols:
        raise ValueError("at least one quasi-identifier column required")
    return [F.col(c) for c in cols]


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """Equivalence classes of ``quasi_cols`` with fewer than ``k``
    rows — the groups where an attacker who knows someone's
    quasi-identifiers narrows them down to < k candidates.  An empty
    result means the table IS k-anonymous at this k.

    NULL quasi-identifier values form their own class (a null ZIP code
    is still a linkable signature), which is groupBy's native NULL
    semantics — no special-casing.

    Output: quasi_cols + ``(class_size, k)``, one row per violating
    class.
    """
    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    return (
        df.groupBy(*_quasi(quasi_cols))
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
        .withColumn("k", F.lit(k).cast("long"))
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,  # noqa: E741 - the literature's own name
) -> DataFrame:
    """Equivalence classes of ``quasi_cols`` whose ``sensitive_col``
    takes fewer than ``l`` distinct values — k-anonymity's blind spot:
    a class of 50 people all sharing one diagnosis is 50-anonymous and
    still leaks the diagnosis.  Distinct-l-diversity (the verifiable
    base form; entropy/recursive variants strengthen it).

    NULLs in the sensitive column do not count as a distinct value
    (count(DISTINCT) semantics, same in Spark and ANSI SQL): a class
    whose only "second value" is NULL is still reported.

    Output: quasi_cols + ``(class_size, distinct_sensitive, l)``.
    """
    if l < 1:
        raise ValueError(f"l_diversity: l must be >= 1, got {l}")
    return (
        df.groupBy(*_quasi(quasi_cols))
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(F.col(sensitive_col))
            .alias("distinct_sensitive"),
        )
        .where(F.col("distinct_sensitive") < l)
        .withColumn("l", F.lit(l).cast("long"))
    )
