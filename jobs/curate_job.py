"""spark-submit entrypoint: end-to-end training-corpus curation.

The composition `_q_corpus_curation` exposes to the driver contract, as a
deployable job over an arbitrary documents table: exact dedup → near-dup
keeper selection (MinHash LSH + connected components) → quality floor →
language allowlist → deterministic split assignment, written as parquet
partitioned by split (so downstream training readers partition-prune
their own split).

    spark-submit --py-files dist/go_jsonschema_spark.zip \\
        jobs/curate_job.py --input <docs.parquet> --out <kept-dir> \\
        [--threshold 0.9] [--quality-floor 0.5] [--langs en,de,fr,es] \\
        [--budget 2048] [--gopher] [--redact] [--pack greedy|chunks]

Prints one JSON summary line (rows in/kept, drop counts per stage).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="near-dup Jaccard threshold")
    ap.add_argument("--quality-floor", type=float, default=0.5)
    ap.add_argument("--langs", default="en,es,de,fr")
    ap.add_argument("--budget", type=int, default=2048,
                    help="pack budget (tokens per training window)")
    ap.add_argument("--redact", action="store_true",
                    help="scrub emails/IPs/phones into typed placeholders "
                         "(functions/redact.py) before packing")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the Gopher repetition/shape keep-rule "
                         "(functions/text.py gopher_metrics) after the "
                         "quality floor")
    ap.add_argument("--pack", choices=["chunks", "greedy"],
                    default="chunks",
                    help="concat-and-chunk (pretraining) or greedy "
                         "no-straddle (SFT/eval) packing")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from go_jsonschema_spark.functions.text import (
        lang_id, quality_score, token_count,
    )
    from go_jsonschema_spark.operators.dedup import (
        duplicate_clusters, exact_duplicates, minhash_lsh_pairs,
    )
    from go_jsonschema_spark.operators.packing import pack_chunks
    from go_jsonschema_spark.operators.sampling import hash_split

    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    idc, txt = args.id_col, args.text_col

    ex_drop = exact_duplicates(docs, text_col=txt, id_col=idc).select(
        F.col(idc).alias("k"))
    near_drop = (
        duplicate_clusters(minhash_lsh_pairs(
            docs, text_col=txt, id_col=idc,
            threshold=args.threshold, k=64, bands=16))
        .filter(F.col("id") != F.col("cluster"))
        .select(F.col("id").alias("k"))
    )
    drops = ex_drop.unionByName(near_drop).distinct()
    n_dup = drops.count()

    kept = (
        docs.join(drops, docs[idc] == F.col("k"), "left_anti")
        .withColumn("pred_lang", lang_id(F.col(txt)))
        .withColumn("q", quality_score(F.col(txt)))
        .filter(F.col("q") >= args.quality_floor)
        .filter(F.col("pred_lang").isin(args.langs.split(",")))
    )
    n_gopher_drop = 0
    if args.gopher:
        from go_jsonschema_spark.functions.text import gopher_metrics

        # one aggregation over the keep flag instead of two count()
        # actions — before/after counts would each re-materialize the
        # whole upstream pipeline (dedup anti-join + quality/lang
        # filters) just for a summary field (ADVICE r4)
        # null keep counts as dropped — filter(keep) drops null too
        keep = gopher_metrics(F.col(txt))["keep"]
        n_gopher_drop = kept.agg(
            F.sum(F.when(keep, 0).otherwise(1))).first()[0] or 0
        kept = kept.filter(keep)
    if args.redact:
        from go_jsonschema_spark.functions.redact import redact_pii

        red = redact_pii(F.col(txt))
        kept = kept.select(
            *[c for c in kept.columns if c != txt],
            red["text"].alias(txt),
            (red["n_email"] + red["n_ipv4"] + red["n_phone"])
            .alias("n_pii_redacted"),
        )
    # token counts AFTER redaction (placeholders count as one token)
    kept = kept.withColumn("n_tok", token_count(F.col(txt)).cast("long"))
    kept = hash_split(kept, idc)
    if args.pack == "greedy":
        from go_jsonschema_spark.operators.packing import pack_greedy

        kept = pack_greedy(kept, token_col="n_tok", key=idc,
                           budget=args.budget, group_col="split")
    else:
        kept = pack_chunks(kept, token_col="n_tok", key=idc,
                           budget=args.budget, group_col="split")
    kept.write.mode("overwrite").partitionBy("split").parquet(args.out)

    out = spark.read.parquet(args.out)
    n_kept = out.count()
    summary = {
        "rows_in": n_in,
        "dups_dropped": n_dup,
        "gopher_dropped": n_gopher_drop,
        "rows_kept": n_kept,
        "tokens_kept": out.agg(F.sum("n_tok")).first()[0],
        "splits": {r["split"]: r["n"] for r in out.groupBy("split")
                   .agg(F.count(F.lit(1)).alias("n")).collect()},
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
