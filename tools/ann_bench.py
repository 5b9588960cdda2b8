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
    ap.add_argument("--batch-queries", type=int, nargs="*", default=[64],
                    help="query-batch sizes for the topk_cosine_many "
                         "section (several sizes expose the IVF pruning "
                         "crossover; empty disables)")
    args = ap.parse_args()

    import bench
    from pyspark.sql import functions as F

    from go_jsonschema_spark.operators.ann import (
        ivf_write_index, kmeans_centroids, topk_cosine,
        topk_cosine_ivf_indexed, topk_cosine_many,
        topk_cosine_many_ivf_indexed,
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
        # exact segment match — a substring test would count cell=57
        # toward probe cell 5 and overstate the pruned fraction
        allowed = (None if probed is None
                   else {f"cell={int(p)}" for p in probed})
        total = 0
        for r, _d, files in os.walk(root):
            if allowed is not None and os.path.basename(r) not in allowed:
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

    # -- batch-query section (VERDICT r4 item 5): m queries, ONE scan ----
    # Several batch sizes expose the IVF boundary: pruning pays while the
    # UNION of the batch's probed cells stays well under n_centroids;
    # random queries cover ~C·(1-(1-p/C)^m) cells, so large random
    # batches degenerate to a full scan + mask overhead and the exact
    # batch matmul wins outright.
    out["batch"] = []
    for m in args.batch_queries:
        qdf = e.filter(F.col("vec_id") < m)

        bexact_rows, bexact_sec, bexact_runs = best(
            lambda: topk_cosine_many(e, qdf, k=args.k).collect())
        bivf_rows, bivf_sec, bivf_runs = best(
            lambda: topk_cosine_many_ivf_indexed(
                spark, idx_path, qdf, cent, k=args.k,
                n_probe=args.probe).collect())

        # mean recall of the batch IVF vs the batch exact, per query
        by_q_exact = {}
        for r in bexact_rows:
            by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
        by_q_ivf = {}
        for r in bivf_rows:
            by_q_ivf.setdefault(r["query_id"], set()).add(r["vec_id"])
        recalls = [len(by_q_exact[q] & by_q_ivf.get(q, set())) / args.k
                   for q in by_q_exact]
        Q = np.asarray([list(map(float, r["embedding"]))
                        for r in qdf.select("embedding").collect()])
        qd2 = ((Q[:, None, :] - np.asarray(cent)[None, :, :]) ** 2).sum(-1)
        union_cells = sorted({int(c) for j in range(m)
                              for c in qd2[j].argsort()[:args.probe]})
        out["batch"].append({
            "n_queries": m,
            "exact_one_scan_sec": bexact_sec,
            "exact_runs": bexact_runs,
            "exact_per_query_equiv_sec": round(exact_sec * m, 1),
            "exact_amortization": round(exact_sec * m / bexact_sec, 1),
            "ivf_one_scan_sec": bivf_sec,
            "ivf_runs": bivf_runs,
            "ivf_per_query_equiv_sec": round(ivf_sec * m, 1),
            "ivf_amortization": round(ivf_sec * m / bivf_sec, 1),
            "ivf_mean_recall_at_k": round(sum(recalls) / len(recalls), 3),
            "ivf_union_cells_scanned": len(union_cells),
            "ivf_union_bytes_fraction": round(
                _bytes(idx_path, union_cells) / index_bytes, 4),
        })
    spark.stop()
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ann_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
