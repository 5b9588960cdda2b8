"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's native ``hll_sketch_agg`` family) — the north rule's
"per-partition stats sketches live in checkpointed metadata".

The problem they solve: exact global distinct counts need a full
shuffle over every row ever validated; re-deriving them after each
incremental batch means re-scanning history.  An HLL sketch is a few
KB, MERGEABLE (union is associative + commutative, so per-batch
sketches combine in any order), and deterministic for a given input —
so each validation batch stores its sketch in the checkpoint manifest
and the RUNNING distinct count is a driver-side union over manifests:
no historical rescan, ever.  Estimate error is the standard HLL bound
(~1.04/sqrt(2^lg_k): ≈0.8% at the default lg_k=12).

Exactness discipline: estimates are labelled estimates.  The engine's
``unique``/``dup`` checks stay exact; sketches serve trend dashboards
and cheap pre-checks (a sketch union that says "no growth in distinct
doc_ids" cannot prove uniqueness, but one that says "distinct grew
less than rows ingested" proves duplicates EXIST before any shuffle).
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["batch_distinct_sketch", "running_distinct", "union_estimate"]

_SKETCH_KEY = "__sketches__"


def batch_distinct_sketch(
    df: DataFrame, cols: list[str], *, lg_k: int = 12
) -> dict[str, str]:
    """One narrow aggregation pass → ``{col: base64(HLL sketch)}`` for
    this batch (column-pruned scan; each map task contributes one
    partial sketch, the driver receives ``len(cols)`` small blobs)."""
    row = df.agg(
        *[F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"__s{i}__")
          for i, c in enumerate(cols)]
    ).first()
    return {
        c: base64.b64encode(bytes(row[f"__s{i}__"])).decode("ascii")
        for i, c in enumerate(cols)
    }


def union_estimate(spark: SparkSession, sketches: list[str]) -> int:
    """Distinct estimate of the UNION of base64-serialized sketches —
    a driver-side merge of KB-sized blobs (one tiny local job)."""
    if not sketches:
        return 0
    df = spark.createDataFrame(
        [(base64.b64decode(s),) for s in sketches], "sk binary")
    return int(df.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).first()["e"])


def running_distinct(
    spark: SparkSession, store, run_id: str, cols: list[str],
) -> dict[str, int]:
    """Running distinct estimates for ``run_id`` from the checkpoint
    store's manifests alone — no data rescan.  Requires the run to have
    been executed with ``ResumableValidation(..., sketch_cols=cols)``;
    columns without stored sketches are omitted from the result."""
    by_col: dict[str, list[str]] = {c: [] for c in cols}
    for manifest in store.completed(run_id).values():
        sk = manifest.get("metrics", {}).get(_SKETCH_KEY, {})
        for c in cols:
            if c in sk:
                by_col[c].append(sk[c])
    return {
        c: union_estimate(spark, blobs)
        for c, blobs in by_col.items() if blobs
    }
