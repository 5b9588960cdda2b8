"""One-command Iceberg checkpoint-store smoke test.

Exercises :class:`IcebergCheckpointStore` (checkpoint.py) for real — table
creation, MERGE-based mark_complete (including the idempotent re-mark), a
changed-partition-set re-run, and a full ResumableValidation resume — on a
LOCAL hadoop catalog (a temp directory; no object store needed).

    python tools/iceberg_smoke.py            # downloads the runtime jar
    python tools/iceberg_smoke.py --offline  # classpath must already have it

The only thing this sandbox lacks is the runtime jar itself; on any host
with network (or a pre-fetched jar in ~/.ivy2) this runs as-is.  The jar
is pinned; bump the ``4.0`` suffix to match your Spark minor (Iceberg
publishes one runtime per Spark minor, e.g. ``iceberg-spark-runtime-4.0``
for Spark 4.x at Iceberg 1.10).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICEBERG_PKG = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default=None,
                    help="catalog warehouse dir (default: temp dir)")
    ap.add_argument("--offline", action="store_true",
                    help="don't add spark.jars.packages (jar already local)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    warehouse = args.warehouse or tempfile.mkdtemp(prefix="iceberg_smoke_")
    b = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.catalog.ck",
                "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ck.type", "hadoop")
        .config("spark.sql.catalog.ck.warehouse", warehouse)
    )
    if not args.offline:
        b = b.config("spark.jars.packages", ICEBERG_PKG)
    try:
        spark = b.getOrCreate()
    except Exception as e:  # gateway dies when the jar fetch has no network
        print(
            "SMOKE SKIP: could not launch Spark with "
            f"spark.jars.packages={ICEBERG_PKG}\n"
            f"  ({type(e).__name__}: likely no network to Maven Central "
            "in this environment)\n"
            "  on a connected host this script runs as-is; offline, "
            "pre-place the jar in ~/.ivy2 and rerun with --offline"
        )
        return 2
    spark.sparkContext.setLogLevel("ERROR")

    from go_jsonschema_spark.checkpoint import (
        IcebergCheckpointStore, ResumableValidation,
    )
    from go_jsonschema_spark.engine import ConstraintSuite
    from go_jsonschema_spark.sources import synth

    if not IcebergCheckpointStore.available(spark):
        print(
            "SMOKE SKIP: iceberg-spark-runtime not on the classpath.\n"
            f"  online : python tools/iceberg_smoke.py   (fetches {ICEBERG_PKG})\n"
            "  offline: pre-place the jar in ~/.ivy2 or pass it via "
            "--jars, then rerun with --offline"
        )
        spark.stop()
        return 2

    # 1. raw store protocol: create, mark, read back, idempotent re-mark
    store = IcebergCheckpointStore(spark, "ck.db.checkpoints")
    store.mark_complete("smoke", "b00000_x", ["0", "1"],
                        {"0": {"n_rows": 10}}, "/tmp/out")
    store.mark_complete("smoke", "b00000_x", ["0", "1"],
                        {"0": {"n_rows": 10}}, "/tmp/out")  # MERGE re-mark
    done = store.completed("smoke")
    assert set(done) == {"b00000_x"}, done
    assert done["b00000_x"]["partitions"] == ["0", "1"]
    print("store protocol: OK (mark/read/idempotent re-mark)")

    # 2. full resumable validation over the synthetic sequences table
    df = synth.sequences(spark, 2000)
    suite = ConstraintSuite(synth.sequences_table_spec(), key="doc_id")
    rv = ResumableValidation(store=store, suite=suite,
                             partition_col="part", batch_size=3)
    dims = {"sources_dim": synth.sources_dim(spark)}
    out = tempfile.mkdtemp(prefix="iceberg_smoke_out_")
    rep1 = rv.run(df, "run1", out, dims=dims)
    rep2 = rv.run(df, "run1", out, dims=dims)  # resume: all skipped
    assert rep2.batches_run == 0, rep2
    assert rep2.batches_skipped == rep1.batches_run + rep1.batches_skipped
    print(f"resume via Iceberg MERGE store: OK "
          f"(run1: {rep1.batches_run} run, resume: {rep2.batches_skipped} "
          f"skipped, 0 re-run)")

    spark.stop()
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
