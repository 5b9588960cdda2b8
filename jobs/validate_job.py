"""spark-submit entrypoint: resumable constraint validation of a sequences
table.

Cluster usage (the north-rule deployment shape)::

    spark-submit --py-files dist/go_jsonschema_spark.zip \\
        jobs/validate_job.py \\
        --input <parquet-path | iceberg-table> --input-format iceberg \\
        --spec <tablespec.json> \\
        --out <violations-root> --checkpoint <ckpt-dir> \\
        --iceberg-table ck.db.checkpoints \\
        --run-id run42 --partition-col part

(``--iceberg-table`` switches checkpoint state from the directory store
to the Iceberg MERGE store — north-rule "checkpointed Iceberg metadata
tables"; needs the runtime jar + catalog conf, see checkpoint.py.)

Sandbox smoke::

    python tools/package.py
    spark-submit --master 'local[8]' --py-files dist/go_jsonschema_spark.zip \\
        jobs/validate_job.py --synthetic 50000 --out /tmp/v_out \\
        --checkpoint /tmp/v_ckpt --run-id smoke

The job is idempotent per (run-id, partition batch): killing it and
re-submitting skips committed batches (checkpoint.py protocol).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet path of the sequences table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic rows instead of --input")
    ap.add_argument("--spec", help="TableSpec JSON file (default: the "
                                   "north-star sequences spec)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint",
                    help="checkpoint directory (required unless "
                         "--iceberg-table is given)")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--partition-col", default="part")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--iceberg-table", default=None,
                    help="checkpoint into this Iceberg table (e.g. "
                    "ck.db.checkpoints) instead of the --checkpoint "
                    "directory; needs the iceberg-spark-runtime jar + a "
                    "spark.sql.catalog.<name> conf")
    ap.add_argument("--trust-non-null-elements", default="",
                    help="comma-separated array columns whose ELEMENTS "
                    "the writer guarantees non-null (parquet footer / "
                    "Iceberg required element) — elides per-element "
                    "null scans, ~22%% of the 16M flagship pass; "
                    "trusting a wrong contract skips null detection "
                    "for those columns")
    ap.add_argument("--input-format", default="parquet",
                    choices=["parquet", "iceberg"],
                    help="read --input as a parquet path or an Iceberg "
                    "table identifier")
    ap.add_argument("--sketch-cols", default="",
                    help="comma-separated columns whose per-batch HLL "
                         "distinct sketches are stored in the checkpoint "
                         "manifests (running estimates via "
                         "operators.sketches.running_distinct, no rescan)")
    ap.add_argument("--quantile-cols", default="",
                    help="comma-separated non-negative integral columns "
                         "whose per-batch log-histogram quantile sketches "
                         "are stored in the checkpoint manifests (running "
                         "p50/p90/p99 estimates via "
                         "operators.sketches.running_quantiles, no rescan)")
    ap.add_argument("--drift-baseline-run", default=None,
                    help="run-id of a PRIOR checkpointed run (with the "
                         "same --quantile-cols) to compare against: the "
                         "summary gains per-column PSI computed from the "
                         "two runs' manifest histograms alone "
                         "(operators.sketches.drift_between_runs, no "
                         "rescan of either run)")
    ap.add_argument("--verdicts-baseline-run", default=None,
                    help="run-id of a PRIOR checkpointed run: the summary "
                         "gains per-partition verdict REGRESSIONS (newly "
                         "or more-failing partitions) computed from the "
                         "two runs' manifests alone "
                         "(operators.history.verdict_regressions)")
    ap.add_argument("--counts-only", action="store_true",
                    help="batch-gate mode: per-partition verdict counts "
                    "from ONE aggregation (engine.verdict_counts — no "
                    "violation rows materialized or written); prints the "
                    "verdict table as JSON and exits non-zero if any "
                    "partition failed.  Run the full job afterwards on "
                    "only the partitions this mode flags.")
    args = ap.parse_args()
    if not args.checkpoint and not args.iceberg_table:
        ap.error("one of --checkpoint or --iceberg-table is required")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        f"validate-{args.run_id}"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from go_jsonschema_spark.checkpoint import (
        CheckpointStore,
        ResumableValidation,
    )
    from go_jsonschema_spark.engine import ConstraintSuite
    from go_jsonschema_spark.sources import synth
    from go_jsonschema_spark.spec import TableSpec

    if args.synthetic:
        df = synth.sequences(spark, args.synthetic)
    elif args.input_format == "iceberg":
        df = spark.read.table(args.input)
    else:
        df = spark.read.parquet(args.input)

    if args.spec:
        with open(args.spec) as f:
            ts = TableSpec.from_json(f.read())
    else:
        ts = synth.sequences_table_spec()

    if args.iceberg_table:
        from go_jsonschema_spark.checkpoint import IcebergCheckpointStore

        store = IcebergCheckpointStore(spark, args.iceberg_table)
    else:
        store = CheckpointStore(args.checkpoint)
    nne = tuple(c for c in args.trust_non_null_elements.split(",") if c)
    suite = ConstraintSuite(ts, key="doc_id", non_null_elements=nne)

    if args.counts_only:
        rows = suite.verdict_counts(
            df, partition_col=args.partition_col).collect()
        verdicts = [
            {"partition": str(r["partition"]), "n_rows": r["n_rows"],
             "n_fail": r["n_fail"], "passed": bool(r["passed"])}
            for r in rows
        ]
        print(json.dumps({
            "run_id": args.run_id, "mode": "counts_only",
            "n_rows": sum(v["n_rows"] for v in verdicts),
            "n_fail": sum(v["n_fail"] for v in verdicts),
            "failed_partitions": sorted(
                v["partition"] for v in verdicts if not v["passed"]),
            "verdicts": sorted(verdicts, key=lambda v: v["partition"]),
        }))
        spark.stop()
        return 0 if all(v["passed"] for v in verdicts) else 3

    sketch_cols = tuple(
        c.strip() for c in args.sketch_cols.split(",") if c.strip())
    quantile_cols = tuple(
        c.strip() for c in args.quantile_cols.split(",") if c.strip())
    rv = ResumableValidation(
        suite, store,
        partition_col=args.partition_col, batch_size=args.batch_size,
        sketch_cols=sketch_cols, quantile_cols=quantile_cols,
    )
    dims = {"sources_dim": synth.sources_dim(spark)}
    report = rv.run(df, args.run_id, args.out, dims=dims)
    summary = {
        "run_id": report.run_id,
        "batches_run": report.batches_run,
        "batches_skipped": report.batches_skipped,
        "n_rows": sum(m["n_rows"] for m in report.partitions.values()),
        "n_fail": sum(m["n_fail"] for m in report.partitions.values()),
    }
    if sketch_cols:
        from go_jsonschema_spark.operators.sketches import running_distinct

        summary["distinct_estimates"] = running_distinct(
            spark, store, args.run_id, list(sketch_cols))
    if quantile_cols:
        from go_jsonschema_spark.operators.sketches import running_quantiles

        summary["quantile_estimates"] = {
            c: {str(q): v for q, v in qe.items()}
            for c, qe in running_quantiles(
                store, args.run_id, list(quantile_cols),
                [0.5, 0.9, 0.99]).items()
        }
    if args.drift_baseline_run and quantile_cols:
        from go_jsonschema_spark.operators.sketches import drift_between_runs

        summary["drift_psi_vs_baseline"] = drift_between_runs(
            store, args.drift_baseline_run, args.run_id,
            list(quantile_cols))
    if args.verdicts_baseline_run:
        from go_jsonschema_spark.operators.history import verdict_regressions

        regs = verdict_regressions(
            store, args.verdicts_baseline_run, args.run_id)
        summary["verdict_regressions"] = [
            r for r in regs if r["regressed"]]
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
