"""Record linkage: blocked, field-weighted fuzzy record matching.

Entity resolution over STRUCTURED records — "are these two customer /
supplier / product rows the same real-world thing?" — where document
dedup (dedup.py) works on one text blob, linkage scores a weighted
combination of per-FIELD similarities: edit similarity for names,
relative closeness for numbers, equality for categoricals.

The scale discipline is blocking: candidate pairs are generated ONLY
within a blocking key (one equi-join, never a cross join), so pair
volume is Σ_blocks n_b² — the operator's knob, not its surprise.  At
10^12 rows a single coarse key is not enough: run multiple passes with
different blocking keys (phonetic code, sorted-neighborhood window,
zip prefix) and union the pair sets — each pass is this same operator.

Similarity combinators (all native Catalyst, scored in one projection
over the joined pairs):

* string: ``1 - levenshtein(a, b) / greatest(len(a), len(b))``
* numeric: ``1 - |a - b| / greatest(|a|, |b|)``  (1.0 when both 0)
* categorical: ``1.0`` on equality else ``0.0``

NULL on either side contributes 0 to that field (and its weight still
divides, so missing data lowers the score rather than inflating it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["record_linkage", "record_linkage_multipass"]


def _string_sim(a: Column, b: Column) -> Column:
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(
        a.isNotNull() & b.isNotNull(),
        F.when(mx == 0, F.lit(1.0))
        .otherwise(1.0 - F.levenshtein(a, b) / mx),
    ).otherwise(0.0)


def _numeric_sim(a: Column, b: Column) -> Column:
    mx = F.greatest(F.abs(a), F.abs(b))
    return F.when(
        a.isNotNull() & b.isNotNull(),
        F.when(mx == 0, F.lit(1.0))
        .otherwise(1.0 - F.abs(a - b) / mx),
    ).otherwise(0.0)


def _cat_sim(a: Column, b: Column) -> Column:
    return F.when(
        a.isNotNull() & b.isNotNull() & (a == b), F.lit(1.0)
    ).otherwise(0.0)


_KINDS = {"string": _string_sim, "numeric": _numeric_sim,
          "categorical": _cat_sim}


def record_linkage(
    df: DataFrame,
    *,
    id_col: str,
    block_col: str,
    fields: dict[str, tuple[str, float]],
    min_score: float = 0.0,
) -> DataFrame:
    """Score record pairs within each ``block_col`` group.

    ``fields`` maps column name → ``(kind, weight)`` with kind one of
    ``string | numeric | categorical``; weights are normalized to sum
    to 1.  Pairs are emitted once (``id_a < id_b``) with per-field
    similarities and the weighted ``score``, filtered to ``score >=
    min_score``.  Rows with a NULL block key join no block and are
    dropped (give them their own pass with a different key).

    Output: ``(id_a, id_b, block, sim_<field>..., score)``, floats
    rounded to 6.
    """
    if not fields:
        raise ValueError("record_linkage: no fields")
    bad = [k for _, (k, _) in fields.items() if k not in _KINDS]
    if bad:
        raise ValueError(f"record_linkage: unknown field kinds {bad}")
    wsum = sum(w for _, (_, w) in fields.items())
    if wsum <= 0:
        raise ValueError("record_linkage: weights must sum > 0")

    # a small input (single parquet file → one scan partition) would
    # otherwise run the whole blocked self-join — Σn_b² levenshtein
    # evaluations — in ONE task while every other core idles (measured
    # 5.8 s → 0.7 s at sf0.1, r7); no-op for big inputs (guide §2.6
    # stragglers / idle capacity)
    from go_jsonschema_spark.operators.dedup import _spread

    df = _spread(df)
    cols = [id_col, block_col, *fields]
    l = df.select(*(F.col(c).alias(f"a_{c}") for c in cols)).where(
        F.col(f"a_{block_col}").isNotNull())
    r = df.select(*(F.col(c).alias(f"b_{c}") for c in cols)).where(
        F.col(f"b_{block_col}").isNotNull())
    pairs = l.join(
        r,
        (F.col(f"a_{block_col}") == F.col(f"b_{block_col}"))
        & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
    )
    sims = {
        c: _KINDS[kind](F.col(f"a_{c}"), F.col(f"b_{c}"))
        for c, (kind, _) in fields.items()
    }
    score = sum(
        (sims[c] * (w / wsum) for c, (_, w) in fields.items()),
        F.lit(0.0),
    )
    out = pairs.select(
        F.col(f"a_{id_col}").alias("id_a"),
        F.col(f"b_{id_col}").alias("id_b"),
        F.col(f"a_{block_col}").alias("block"),
        *[F.round(sims[c], 6).alias(f"sim_{c}") for c in fields],
        F.round(score, 6).alias("score"),
    )
    return out.where(F.col("score") >= min_score)


def record_linkage_multipass(
    df: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    fields: dict[str, tuple[str, float]],
    min_score: float = 0.0,
) -> DataFrame:
    """Multi-pass (OR-)blocking: the union of candidate pairs from one
    blocking pass PER ``block_cols`` entry, each pair scored exactly
    once — the classic recall repair for blocked entity resolution
    (Fellegi-Sunter practice; single-key blocking misses every true
    match whose block key is itself dirty, e.g. a typo'd zip code, while
    a second pass on a different key catches it).

    Scale shape, deliberately different from scoring inside each pass:

    1. per pass, the self-equi-join carries ONLY ``(id, block)`` — the
       expensive similarity columns never ride the candidate shuffle;
    2. pair-level dedup BEFORE scoring (one groupBy on the id pair), so
       a pair found by 3 passes pays its levenshtein once, not 3 times;
    3. the field payloads join back by id (two hash joins on the
       already-deduped, much smaller pair set), then one projection
       scores — identical math to :func:`record_linkage`.

    Pair volume is Σ_passes Σ_blocks n_b² MINUS the overlap; each
    pass's key obeys the same n_b² knob as single-pass blocking.  Rows
    NULL in a pass's key simply sit that pass out (that is the point:
    give dirty keys a pass whose key they are clean in).

    Output: ``(id_a, id_b, n_passes, sim_<field>..., score)`` with
    ``n_passes`` = how many blocking passes proposed the pair (≥ 1),
    floats rounded to 6, filtered to ``score >= min_score``.
    """
    if not block_cols:
        raise ValueError("record_linkage_multipass: no block_cols")
    if not fields:
        raise ValueError("record_linkage_multipass: no fields")
    bad = [k for _, (k, _) in fields.items() if k not in _KINDS]
    if bad:
        raise ValueError(
            f"record_linkage_multipass: unknown field kinds {bad}")
    wsum = sum(w for _, (_, w) in fields.items())
    if wsum <= 0:
        raise ValueError("record_linkage_multipass: weights must sum > 0")

    # single-file inputs: spread so per-pass pair generation and the
    # payload-scoring projection use every core (see record_linkage)
    from go_jsonschema_spark.operators.dedup import _spread

    df = _spread(df)

    def _pass(i: int, bc: str) -> DataFrame:
        ids = df.select(
            F.col(id_col).alias("__id__"), F.col(bc).alias("__blk__")
        ).where(F.col(bc).isNotNull())
        a = ids.select(F.col("__id__").alias("id_a"), "__blk__")
        b = ids.select(F.col("__id__").alias("id_b"), "__blk__")
        return (
            a.join(b, "__blk__")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit(i).alias("__pass__"))
        )

    cand = reduce(
        DataFrame.unionByName,
        [_pass(i, bc) for i, bc in enumerate(block_cols)],
    )
    pairs = cand.groupBy("id_a", "id_b").agg(
        F.count_distinct(F.col("__pass__")).alias("n_passes"))

    af = df.select(F.col(id_col).alias("id_a"),
                   *[F.col(c).alias(f"a_{c}") for c in fields])
    bf = df.select(F.col(id_col).alias("id_b"),
                   *[F.col(c).alias(f"b_{c}") for c in fields])
    joined = pairs.join(af, "id_a").join(bf, "id_b")
    sims = {
        c: _KINDS[kind](F.col(f"a_{c}"), F.col(f"b_{c}"))
        for c, (kind, _) in fields.items()
    }
    score = sum(
        (sims[c] * (w / wsum) for c, (_, w) in fields.items()),
        F.lit(0.0),
    )
    out = joined.select(
        "id_a", "id_b", "n_passes",
        *[F.round(sims[c], 6).alias(f"sim_{c}") for c in fields],
        F.round(score, 6).alias("score"),
    )
    return out.where(F.col("score") >= min_score)
