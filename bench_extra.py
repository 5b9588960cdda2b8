"""Extra per-query benchmarks for the optimization round (guide §1).

NOT part of the frozen measurement contract — ``bench.py`` stays the
driver's instrument.  This harness exists to iterate quickly on single
queries:

* same session config, same data dir contract ($SPARK_GRAFT_SF_DIR /
  $SPARK_GRAFT_CPUS) and the same timing methodology as ``bench.py``
  (``fn(spark, sf_dir).count()``, cache cleared between queries,
  best-of-N) so numbers are comparable;
* ``--plans DIR`` captures ``.explain("formatted")`` of each query's
  returned DataFrame into ``DIR/<query>_<tag>.txt`` for the plan-diff
  evidence the round deliverables require;
* ``--noop`` times a full-materialization noop write instead of
  ``.count()`` (guide §1.4) to rule out count-only column pruning when
  interpreting a win.

Usage::

    python bench_extra.py [--runs 3] [--plans plans/r07 --tag before]
                          [--noop] query [query ...]
    python bench_extra.py --flagship          # sequences_validation only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )


def _clear(spark) -> None:
    try:
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
    except Exception:
        pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="time a noop write instead of .count()")
    ap.add_argument("--flagship", action="store_true",
                    help="run the sequences_validation flagship pass")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, object] = {}

    if args.flagship:
        import bench

        sf_name = os.path.basename(sf_dir.rstrip("/"))
        n_rows = bench.SEQ_ROWS.get(sf_name, 1_000_000)
        path = bench._seq_parquet(spark, n_rows)
        spark.sparkContext.setJobDescription("flagship warm-up")
        bench.validate_sequences(spark, path)  # warm-up
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"flagship run {i}")
            runs.append(round(bench.validate_sequences(spark, path)[1], 3))
        out["sequences_validation"] = {"best": min(runs), "runs": runs}
        print(json.dumps(out))
        spark.stop()
        return 0

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in args.queries:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            _clear(spark)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        runs = []
        for i in range(args.runs):
            _clear(spark)
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
