"""Local emulation of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, column names, and order-insensitive value equality.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
(with query names given, only those queries are checked)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    n_ok = n_bad = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = sorted(df.columns)
            rows = df.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s, no oracle)")
            continue
        o = con.execute(oracles[name])
        ocols = sorted(d[0] for d in o.description)
        orows = o.fetchall()
        if cols != ocols:
            print(f"FAIL  {name}: schema {cols} != oracle {ocols}")
            n_bad += 1
            continue
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(rows)} != oracle {len(orows)}")
            n_bad += 1
            continue
        def _key(row):
            return tuple((v is None, str(type(v)), v) for v in row)

        got = sorted(
            (tuple(norm_cell(r[c]) for c in cols) for r in rows), key=_key
        )
        names = [d[0] for d in o.description]
        idx = {c: names.index(c) for c in cols}
        want = sorted(
            (tuple(norm_cell(r[idx[c]]) for c in cols) for r in orows),
            key=_key,
        )
        if got != want:
            bad = next(
                (i for i, (g, w) in enumerate(zip(got, want)) if g != w), -1
            )
            print(
                f"FAIL  {name}: values differ at sorted row {bad}:\n"
                f"      got  {got[bad] if bad >= 0 else '?'}\n"
                f"      want {want[bad] if bad >= 0 else '?'}"
            )
            n_bad += 1
            continue
        print(f"OK    {name}: {len(rows)} rows match ({dt:.1f}s)")
        n_ok += 1
    n_rows_only = sum(1 for k in qs if k not in oracles)
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
