"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated pipeline ops, not in the reference):

* :func:`topk_cosine` — brute-force exact cosine top-k: one narrow scan,
  native arithmetic (``zip_with``/``aggregate``), a single
  ``TakeOrderedAndProject`` — the correctness baseline and perfectly
  adequate when the query set is small.
* :func:`topk_cosine_lsh` — the scale path: random-hyperplane bucket
  signature (same family as dedup.embedding_cosine_pairs); probe the
  query's bucket plus all hamming≤1 neighbor buckets, exact-rank only the
  candidates.  Scan prunes to matching buckets (a pre-computed/bucketed
  table turns this into partition pruning on a real deployment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["topk_cosine", "topk_cosine_lsh", "hyperplane_bucket"]


def _dot_lit(vec: Column, q: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in q]), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to(vec: Column, q: list[float]) -> Column:
    import math

    qn = math.sqrt(sum(x * x for x in q)) or 1.0
    return _dot_lit(vec, q) / (_norm(vec) * F.lit(qn))


def topk_cosine(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: ``(vec_id, cosine)`` ordered desc, ties by id.

    orderBy+limit compiles to TakeOrderedAndProject — per-partition heaps of
    size k then a driver merge, no full sort, no shuffle of the table."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(
    vec: Column, *, n_planes: int = 10, dim: int = 64, seed: int = 42
) -> Column:
    """Random-hyperplane sign-bit bucket id (long) for a vector column."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        bit = F.when(
            _dot_lit(vec, [float(x) for x in planes[i]]) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def topk_cosine_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: restrict the exact ranking to vectors whose hyperplane
    bucket is within hamming distance 1 of the query's bucket
    (multi-probe LSH), then brute-force only those."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, len(query)))
    qbits = 0
    for i in range(n_planes):
        if float(np.dot(planes[i], np.asarray(query))) > 0:
            qbits |= 1 << i
    probe = [qbits] + [qbits ^ (1 << i) for i in range(n_planes)]

    bucket = hyperplane_bucket(
        F.col(vec_col), n_planes=n_planes, dim=len(query), seed=seed
    )
    return (
        df.select(
            F.col(id_col), F.col(vec_col), bucket.alias("bkt")
        )
        .filter(F.col("bkt").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_to(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
