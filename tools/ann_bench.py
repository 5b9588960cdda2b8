"""ANN at scale: 1M-vector evidence for the partition-pruned IVF path.

The driver-contract embeddings tables are tiny (500-2,000 vectors) —
they prove CORRECTNESS (every cosine recomputed, recall@10 gated ≥ 0.8
by DuckDB), but a 10-row top-k over 2k vectors says nothing about the
scale design.  This tool generates a deterministic 1M × 64 embeddings
parquet (native expressions, no Python in the generator), materializes
the IVF index partitioned by coarse-quantizer cell
(:func:`ivf_write_index`), and measures:

* brute-force exact top-k (the one-narrow-scan baseline),
* the materialized-index query at ``n_probe`` of ``n_centroids``
  (partition pruning at the scan — unprobed cells never read),
* recall@k of the pruned query vs the exact baseline,
* the fraction of file bytes the pruned scan actually touched.

Usage::

    python tools/ann_bench.py [--rows 1000000] [--centroids 64]
                              [--probe 8] [--runs 3]

Writes BENCH/ann_scale.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = os.path.join(REPO, ".benchdata")


def gen_embeddings(spark, n_rows: int, dim: int = 64):
    """Deterministic pseudo-uniform [-1, 1) embeddings, fully native:
    xxhash64(id, i) → pmod → affine.  No Python in the row path."""
    from pyspark.sql import functions as F

    path = os.path.join(DATA, f"embeddings_{n_rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(20000))
                .cast("double") / 10000.0 - 1.0
            ).cast("float"),
        )
        (
            spark.range(n_rows)
            .select(F.col("id").alias("vec_id"),
                    F.transform(vec, lambda x: F.coalesce(x, F.lit(0.0))
                                .cast("float")).alias("embedding"))
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        )
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--centroids", type=int, default=64)
    ap.add_argument("--probe", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import bench
    from pyspark.sql import functions as F

    from go_jsonschema_spark.operators.ann import (
        ivf_write_index, kmeans_centroids, topk_cosine,
        topk_cosine_ivf_indexed,
    )

    spark = bench._session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    path = gen_embeddings(spark, args.rows)
    e = spark.read.parquet(path)
    qv = [float(x)
          for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]

    idx_path = os.path.join(
        DATA, f"ivf_index_{args.rows}_c{args.centroids}")
    cent = kmeans_centroids(e, n_centroids=args.centroids)
    t0 = time.time()
    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        ivf_write_index(e, idx_path, cent)
    build_sec = round(time.time() - t0, 2)

    def best(fn):
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            rows = fn()
            runs.append(round(time.time() - t0, 3))
        return rows, min(runs), runs

    exact_rows, exact_sec, exact_runs = best(
        lambda: topk_cosine(e, qv, k=args.k).collect())
    ivf_rows, ivf_sec, ivf_runs = best(
        lambda: topk_cosine_ivf_indexed(
            spark, idx_path, qv, cent, k=args.k,
            n_probe=args.probe).collect())

    exact_ids = {r["vec_id"] for r in exact_rows}
    recall = len(exact_ids & {r["vec_id"] for r in ivf_rows}) / args.k

    # bytes evidence: probed partitions vs whole index on disk
    def _bytes(root, probed=None):
        total = 0
        for r, _d, files in os.walk(root):
            if probed is not None and not any(
                    f"cell={p}" in r for p in probed):
                continue
            total += sum(os.path.getsize(os.path.join(r, f))
                         for f in files if f.endswith(".parquet"))
        return total

    import numpy as np

    d2 = ((np.asarray(cent) - np.asarray(qv)[None, :]) ** 2).sum(1)
    probe = [int(i) for i in d2.argsort()[:args.probe]]
    probed_bytes = _bytes(idx_path, probe)
    index_bytes = _bytes(idx_path)

    plan = (topk_cosine_ivf_indexed(spark, idx_path, qv, cent,
                                    k=args.k, n_probe=args.probe)
            ._jdf.queryExecution().executedPlan().toString())
    pruned = "PartitionFilters: [cell" in plan

    out = {
        "rows": args.rows, "dim": 64, "centroids": args.centroids,
        "n_probe": args.probe, "k": args.k,
        "index_build_sec": build_sec,
        "exact_sec": exact_sec, "exact_runs": exact_runs,
        "ivf_indexed_sec": ivf_sec, "ivf_runs": ivf_runs,
        "speedup": round(exact_sec / ivf_sec, 2),
        "recall_at_k": recall,
        "probed_bytes": probed_bytes, "index_bytes": index_bytes,
        "bytes_fraction_scanned": round(probed_bytes / index_bytes, 4),
        "partition_pruning_in_plan": pruned,
    }
    spark.stop()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
