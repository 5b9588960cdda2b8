"""Cross-row uniqueness with explicit skew handling.

The reference's ``uniqueItems`` is intra-array only (validate_unique.go);
the north star demands global uniqueness of ``doc_id`` over 10^12 rows with
a hot key duplicated on ~5% of rows.  Strategy (SURVEY.md §4.3):

1. **Salted partial count** — group by ``(key, salt)`` where salt spreads a
   hot key over S reducers, so no single reducer receives 5% of the table.
   Spark's hash aggregation is already partial+final (map-side combine), so
   the salt matters for the *reduce* side distribution of distinct keys —
   i.e. when one key's pre-combined partial rows would still swamp one task.
2. **Final count** — re-aggregate the partial counts by ``key`` alone; at
   most S rows per key arrive, tiny.
3. Optional HLL pre-check: ``approx_count_distinct(key) ≈ count(*)`` means
   duplicates are rare → the exact pass confirms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["duplicate_keys", "uniqueness_violations", "approx_unique_ratio",
           "compact_latest"]


def _key_col(key: str | list[str]):
    """Single column or composite (struct) key expression + a display name.

    Composite keys build one struct column so the shuffle key is the full
    tuple — grouping on ``columns[0]`` alone would both miss true composite
    duplicates and falsely flag rows unique on the tuple."""
    if isinstance(key, str):
        return F.col(key), key
    if len(key) == 1:
        return F.col(key[0]), key[0]
    return F.struct(*[F.col(k) for k in key]), "(" + ",".join(key) + ")"


def duplicate_keys(
    df: DataFrame, key: str | list[str], *, salt_buckets: int | None = None,
    hash_compact: bool = False,
) -> DataFrame:
    """Keys occurring more than once, with their counts: ``(key, n_dup)``.
    ``key`` may be one column name or a list (composite key → struct).

    Default is a SINGLE count aggregation.  Skew is already handled:
    Spark's hash aggregation is partial+final, so a hot key collapses to
    ONE partial row per map task before the shuffle — the reduce side
    receives at most #map-tasks rows for it, never 5% of the table.
    Explicit salting (``salt_buckets=N``: phase 1 on ``(key, salt)``,
    phase 2 re-aggregating per key) pays a SECOND full shuffle of the
    distinct-key set, which an interleaved A/B at 16M rows measured at
    1.8× the single-phase cost (2.80 s vs 1.56 s, identical output).
    Reach for the salt only when partial aggregation cannot reduce
    map-side — high-cardinality intermediate state per key
    (``collect_list``, exact distinct), not ``count``.

    ``hash_compact=True`` is the MOSTLY-UNIQUE-keys path (validation's
    regime: duplicate doc_ids are rare defects, not the norm).  The big
    shuffle then carries ``xxhash64(key)`` — a fixed 8-byte row instead
    of the variable-width key — both shrinking shuffle write/read bytes
    and turning the aggregation hashmap into a fixed-width one (better
    cache behavior at high thread counts).  Candidate hashes with count
    > 1 (rare by assumption) join back against the key column
    (column-pruned scan; AQE broadcasts the candidate side when it is
    as small as the assumption says) and an exact per-KEY count over
    that tiny subset removes hash-collision false positives — output is
    EXACTLY the non-compacted result.  Do NOT use it when duplicates
    are pervasive: the candidate set then approaches the distinct-key
    set and the join-back degrades to a second full shuffle."""
    kcol, _ = _key_col(key)
    if hash_compact:
        if salt_buckets:
            raise ValueError(
                "duplicate_keys: hash_compact and salt_buckets are "
                "alternative shuffle strategies; pick one")
        h = F.xxhash64(kcol)
        cand = (
            df.select(h.alias("__h__"))
            .groupBy("__h__")
            .agg(F.count(F.lit(1)).alias("__hc__"))
            .filter(F.col("__hc__") > 1)
            .select("__h__")
        )
        subset = df.select(kcol.alias("key"), h.alias("__h__")).join(
            cand, "__h__")
        return (
            subset.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_dup"))
            .filter(F.col("n_dup") > 1)
        )
    if salt_buckets:
        salted = df.select(
            kcol.alias("key"),
            F.pmod(
                F.xxhash64(F.monotonically_increasing_id()),
                F.lit(salt_buckets),
            ).alias("__salt__"),
        )
        partial = salted.groupBy("key", "__salt__").agg(
            F.count(F.lit(1)).alias("__c__")
        )
        return (
            partial.groupBy("key")
            .agg(F.sum("__c__").alias("n_dup"))
            .filter(F.col("n_dup") > 1)
        )
    return (
        df.select(kcol.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def uniqueness_violations(
    df: DataFrame, key: str | list[str], *, constraint_id: str | None = None,
    salt_buckets: int | None = None, hash_compact: bool = False,
) -> DataFrame:
    """Violation rows ``(doc_id, constraint_id, observed)`` for duplicate
    keys — ``observed`` is the duplicate count as a string.  Composite keys
    serialize as JSON so the violation row stays one string column."""
    kcol, kname = _key_col(key)
    cid = constraint_id or f"unique:{kname}"
    dups = duplicate_keys(df, key, salt_buckets=salt_buckets,
                          hash_compact=hash_compact)
    doc_id = (
        F.to_json(F.col("key"))
        if isinstance(key, list) and len(key) > 1
        else F.col("key").cast("string")
    )
    return dups.select(
        doc_id.alias("doc_id"),
        F.lit(cid).alias("constraint_id"),
        F.concat(F.lit("count="), F.col("n_dup").cast("string")).alias("observed"),
    )


def approx_unique_ratio(df: DataFrame, key: str) -> DataFrame:
    """Cheap HLL++ pre-check: ``approx_distinct / count`` — a ratio ≈ 1.0
    means duplicates are rare and the exact pass is mostly confirmatory
    (SURVEY.md §2.8)."""
    return df.agg(
        F.count(key).alias("n"),
        F.approx_count_distinct(key).alias("n_distinct_approx"),
        (F.approx_count_distinct(key) / F.count(key)).alias("unique_ratio"),
    )


def compact_latest(
    df: DataFrame, key: str | list[str], ts_col: str
) -> DataFrame:
    """CDC/upsert compaction: the LATEST record per key by ``ts_col`` —
    the ingest primitive that folds an append-only change log down to
    current state (and the keep-one resolution for keys
    :func:`duplicate_keys` flags).

    ONE ``max(struct(ts, payload…))`` aggregation — partial+final with
    map-side combine (Spark plans the struct-max as SortAggregate,
    sorted by GROUP KEY only), so a hot key collapses to one partial row
    per map task and the exchange never carries per-version rows (a
    ``row_number`` window would shuffle AND sort every version of every
    key).  Ties on
    ``ts_col`` resolve deterministically by the remaining columns in
    DataFrame order (struct comparison is lexicographic); rows with null
    ``ts_col`` lose to any timestamped row (null-first struct ordering).
    Output keeps the input column order."""
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in df.columns if c not in keys and c != ts_col]
    packed = F.struct(
        F.col(ts_col), *[F.col(c) for c in payload])
    agged = df.groupBy(*keys).agg(F.max(packed).alias("__r__"))
    return agged.select(*[
        c if c in keys
        else F.col(f"__r__.{c}").alias(c)
        for c in df.columns
    ])
