"""spark-submit entrypoint: profile a golden table and emit the inferred
TableSpec — the front half of the profile → spec → validate loop
(go_jsonschema_spark/infer.py; the back half is jobs/validate_job.py,
which accepts the emitted spec file via ``--spec``).

Cluster usage::

    spark-submit --py-files dist/go_jsonschema_spark.zip \\
        jobs/profile_job.py --input <golden.parquet> --out <dir> \\
        [--columns a,b,c] [--enum-max 16] [--key-hint doc_id] [--approx]

Writes ``<out>/profile.parquet`` (the per-column statistics, ONE
aggregation pass) and ``<out>/spec.json`` (TableSpec JSON consumable by
``validate_job.py --spec``), then prints a one-line summary.  ``--approx``
swaps exact distinct counts for HLL sketches — the 10^12-row form.

Sandbox smoke::

    python tools/package.py
    spark-submit --master 'local[8]' --py-files dist/go_jsonschema_spark.zip \\
        jobs/profile_job.py --input /root/testdata/sf0.001/documents.parquet \\
        --out /tmp/profile_out --key-hint doc_id
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path to profile")
    ap.add_argument("--out", required=True)
    ap.add_argument("--columns", default="",
                    help="comma list (default: every column)")
    ap.add_argument("--enum-max", type=int, default=16)
    ap.add_argument("--key-hint", default=None,
                    help="only this column may become a unique-key check")
    ap.add_argument("--approx", action="store_true",
                    help="HLL distinct counts instead of exact")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("go_jsonschema_spark-profile")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from go_jsonschema_spark.infer import infer_table_spec

    df = spark.read.parquet(args.input)
    cols = [c for c in args.columns.split(",") if c] or None
    spec, prof = infer_table_spec(
        df, cols, enum_max=args.enum_max, key_hint=args.key_hint,
        approx=args.approx)

    os.makedirs(args.out, exist_ok=True)
    prof.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.out, "profile.parquet"))
    spec_path = os.path.join(args.out, "spec.json")
    with open(spec_path, "w") as f:
        f.write(spec.to_json())

    print(json.dumps({
        "rows": int(prof.first()["n_rows"]),
        "columns_profiled": prof.count(),
        "columns_constrained": len(spec.columns),
        "unique_keys": [tc["columns"] for tc in spec.table_checks
                        if tc.get("kind") == "unique"],
        "spec": spec_path,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
