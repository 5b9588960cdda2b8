"""A/B evidence for compact_latest's plan claim: one max(struct)
aggregation vs the textbook row_number window, on a 16M-row change log
with a HOT key (5% of all rows share one key — the shape that breaks
per-key sorts at scale).

Both forms produce identical output (asserted by full-count and
spot-key comparison); the artifact records gated best-of-3 wall times
for each plus the hot-key ratio.  Writes BENCH/compaction_ab.json.

Usage: python tools/compact_bench.py [--rows 16000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    args = ap.parse_args()

    import time

    import bench
    from pyspark.sql import Window, functions as F

    from go_jsonschema_spark.operators.uniqueness import compact_latest

    spark = bench._session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(bench.BENCH_DATA, f"changelog_{args.rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # 5% of rows hit key 0 (the hot key); the rest spread uniformly
        n_keys = args.rows // 8
        (
            spark.range(args.rows)
            .select(
                F.when(F.pmod(F.xxhash64("id"), F.lit(20)) == 0, F.lit(0))
                .otherwise(F.pmod(F.xxhash64("id", F.lit(1)),
                                  F.lit(n_keys)))
                .alias("k"),
                F.timestamp_seconds(F.col("id")).alias("ts"),
                F.xxhash64("id", F.lit(2)).alias("payload"),
            )
            .repartition(32)
            .write.mode("overwrite").parquet(path)
        )
    log = spark.read.parquet(path)

    def agg_form():
        return compact_latest(log, "k", "ts")

    def window_form():
        w = Window.partitionBy("k").orderBy(
            F.col("ts").desc(), F.col("payload").desc())
        return (log.withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") == 1).drop("__rn__"))

    # identical results (count + the hot key's chosen row)
    n_a = agg_form().count()
    n_w = window_form().count()
    hot_a = agg_form().filter(F.col("k") == 0).first()
    hot_w = window_form().filter(F.col("k") == 0).first()
    assert n_a == n_w, (n_a, n_w)
    assert (hot_a["ts"], hot_a["payload"]) == (hot_w["ts"], hot_w["payload"])

    def timed(fn):
        runs, attempts, probes, discarded, noisy = bench._probed_runs(
            lambda: (lambda t0: (fn().count(), time.time() - t0)[1])(
                time.time()))
        return {"best": min(runs), "runs": attempts, "probes": probes,
                "noisy": noisy}

    a = timed(agg_form)
    wf = timed(window_form)
    out = {
        "rows": args.rows,
        "hot_key_rows": int(log.filter(F.col("k") == 0).count()),
        "distinct_keys": n_a,
        "agg_form_sec": a, "window_form_sec": wf,
        "window_over_agg": round(wf["best"] / a["best"], 2),
    }
    spark.stop()
    with open(os.path.join(REPO, "BENCH", "compaction_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
