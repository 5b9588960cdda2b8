"""Privacy re-identification checks: k-anonymity, l-diversity, t-closeness.

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

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["k_anonymity", "l_diversity", "t_closeness"]


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


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float,
    *,
    max_domain: int = 10_000,
) -> DataFrame:
    """Equivalence classes whose sensitive-value distribution sits
    farther than ``t`` (Earth Mover's Distance) from the table-wide
    distribution — l-diversity's blind spot (Li et al. 2007): a class
    can carry l distinct values yet still be badly skewed toward one.

    EMD uses the ORDERED-domain form with unit spacing: sort the
    distinct sensitive values, then
    ``EMD = sum_i |cumsum_i(P - Q)| / (m - 1)`` over the m domain
    values (0 when m == 1).  This is exact for ordinal sensitive
    attributes (severity grades, priority codes, income bands); for
    free numerics, band them first.

    NULL sensitive values carry no information and are excluded from
    both distributions; classes with no non-null sensitive rows have no
    distribution and are skipped.

    100 TB shape: one class+value-keyed aggregation (map-side combined
    — the shuffle carries |classes| x |domain| partials, never rows),
    then the domain dim (<= ``max_domain`` rows, guard-enforced) is
    broadcast against the class list to zero-fill absent values, and a
    class-partitioned running sum finishes the EMD.  Every stage is
    keyed on the class, so skew follows quasi-identifier skew, which
    k_anonymity itself bounds.

    Output: quasi_cols + ``(class_size, emd, t)``, ``emd`` rounded to 6
    so verdicts are engine-independent.
    """
    if not (0.0 < t <= 1.0):
        raise ValueError(f"t_closeness: t must be in (0, 1], got {t}")
    quasi = _quasi(quasi_cols)
    s = F.col(sensitive_col)

    # class x value counts — the ONE row-keyed aggregation
    cv = (
        df.where(s.isNotNull())
        .groupBy(*quasi, s.alias("__v__"))
        .agg(F.count(F.lit(1)).alias("__c__"))
    )

    # global domain: ordered distinct values + global probability Q.
    # Tiny (<= max_domain, enforced below) -> broadcast.
    dom = (
        cv.groupBy("__v__")
        .agg(F.sum("__c__").alias("__vc__"))
        .withColumn("__n__", F.sum("__vc__").over(Window.partitionBy()))
        .withColumn(
            "__i__",
            F.row_number().over(Window.partitionBy().orderBy("__v__")),
        )
        .withColumn("__q__", F.col("__vc__") / F.col("__n__"))
        .select("__v__", "__i__", "__q__")
    )
    m = dom.count()
    if m > max_domain:
        raise ValueError(
            f"t_closeness: sensitive domain has {m} distinct values "
            f"(max_domain={max_domain}); band the attribute first — "
            "the ordered EMD needs a bounded ordinal domain"
        )

    # class list with sizes (aggregate of the already class-keyed cv)
    classes = cv.groupBy(*quasi).agg(F.sum("__c__").alias("class_size"))

    # zero-filled skeleton: every class x every domain value.  The
    # re-join of per-class-value counts MUST be null-safe on the quasi
    # columns: k_anonymity documents NULL-is-its-own-class semantics, and
    # a plain `=` join would orphan every NULL-quasi class (its counts
    # never rejoin, p collapses to 0 for all values, and the class gets
    # spuriously flagged with emd outside [0,1]).
    skel = classes.join(F.broadcast(dom))
    # rename the count side to generated names: no shared attributes ->
    # no self-join ambiguity (skel and cv share the cv lineage)
    cvr = cv.select(
        *[cv[c].alias(f"__qc{i}__") for i, c in enumerate(quasi_cols)],
        cv["__v__"].alias("__cvv__"),
        cv["__c__"].alias("__cvc__"),
    )
    cond = skel["__v__"] == cvr["__cvv__"]  # domain values are non-null
    for i, c in enumerate(quasi_cols):
        cond = cond & skel[c].eqNullSafe(cvr[f"__qc{i}__"])
    filled = (
        skel.join(cvr, cond, "left")
        .withColumn(
            "__p__",
            F.coalesce(F.col("__cvc__"), F.lit(0)) / F.col("class_size"),
        )
    )

    w = Window.partitionBy(*quasi_cols).orderBy("__i__")
    emd = (
        filled.withColumn(
            "__cum__", F.sum(F.col("__p__") - F.col("__q__")).over(w)
        )
        .groupBy(*quasi, F.col("class_size"))
        .agg(
            (
                F.sum(F.abs(F.col("__cum__")))
                / F.greatest(F.lit(m - 1), F.lit(1))
            ).alias("__emd__")
        )
        .withColumn("emd", F.round(F.col("__emd__"), 6))
        .drop("__emd__")
    )
    return emd.where(F.col("emd") > t).withColumn(
        "t", F.lit(float(t)).cast("double")
    )
