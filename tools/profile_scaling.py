"""Per-subjob scaling profile of the flagship validation job.

Runs each component of validate_sequences separately at one parallelism
level (fresh JVM per invocation) and prints one JSON line.  Interleave
bands externally for noise comparability.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cores: int) -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"prof-{cores}")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from go_jsonschema_spark.engine import ConstraintSuite
    from go_jsonschema_spark.sources import synth
    from go_jsonschema_spark.operators.uniqueness import duplicate_keys
    from go_jsonschema_spark.operators.referential import (
        referential_violations,
    )
    from go_jsonschema_spark.spec import TableSpec

    path = "/root/repo/.benchdata/sequences_16000000"
    df = spark.read.parquet(path)
    spec = synth.sequences_table_spec()
    row_spec = TableSpec(columns=spec.columns, row_checks=spec.row_checks,
                         table_checks=[], draft=spec.draft)
    suite = ConstraintSuite(row_spec, key="doc_id",
                            non_null_elements=("tokens",))

    def t(fn):
        fn()  # warm-up
        best = 9e9
        for _ in range(2):
            t0 = time.time(); fn(); best = min(best, time.time() - t0)
        return round(best, 3)

    out = {"cores": cores}
    out["scan_tokens"] = t(lambda: df.select(
        F.sum(F.size("tokens"))).first())
    res = suite.run(df, partition_col="part")
    out["predicate_pass"] = t(lambda: suite.run(
        df, partition_col="part").violations.count())
    out["uniqueness"] = t(lambda: duplicate_keys(df, "doc_id").count())
    out["fk"] = t(lambda: referential_violations(
        df, "source", synth.sources_dim(spark)).count())
    out["row_counts"] = t(lambda: df.groupBy("part").count().collect())
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
