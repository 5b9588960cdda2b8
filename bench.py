"""Benchmark harness.

Default mode: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line::

    {"metric": "headline suite wall time", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1,
     "seq_rows": N, "seq_validate_sec": s, "seq_per_sec": r}

The north-rule throughput number is ``seq_per_sec``: rows/sec of the FULL
constraint-validation pass (row predicates + per-partition verdicts +
salted uniqueness + broadcast referential check) over a pre-generated
synthetic sequences table (BASELINE.json input shape) read from parquet.

``--scaling`` mode: re-runs the sequences validation at local[8] and
local[32] in fresh subprocesses (one JVM each) on the SAME parquet input
and writes BENCH/BASELINE.md with throughput at both plus the scaling
efficiency T-based metric eff = (r32 / r8) / (32/8) — the sandbox stand-in
for the north rule's N→4N-executor criterion (see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# sf0.1 uses the SAME 16M-row table as the scaling evidence so the
# default-mode seq_per_sec and BENCH/BASELINE.md report the same job at
# the same scale.  Smaller tables measure fixed per-run cost, not the
# engine: after the round-3 items fast path a 4M-row pass finishes in
# ~4.6 s at local[32], roughly half of it scheduling/JVM-round-trip
# overhead (round-1 measured the same effect at 1M rows: 215k vs 540k
# rows/s for identical code).
SEQ_ROWS = {"sf0.001": 20_000, "sf0.01": 100_000, "sf0.1": 16_000_000}
BENCH_DATA = os.path.join(REPO, ".benchdata")


def _noise_probe() -> float:
    """Single-threaded CPU probe: ~1.3 s on this host when quiet, 1.9 s+
    under noisy-neighbor CPU steal.  Recorded in the bench JSON so a
    reader can tell a slow engine from a slow window (the round-1
    42k-vs-574k seq/s discrepancy was exactly this)."""
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.time() - t0, 3)


def _session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )


def _seq_parquet(spark, n_rows: int) -> str:
    """Generate-once parquet of the synthetic sequences table."""
    path = os.path.join(BENCH_DATA, f"sequences_{n_rows}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from go_jsonschema_spark.sources import synth

        (
            synth.sequences(spark, n_rows)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def validate_sequences(spark, path: str) -> tuple[int, float]:
    """The north-rule job: full validation pass.  Returns (rows, sec)."""
    from pyspark.sql import functions as F

    from go_jsonschema_spark.engine import ConstraintSuite
    from go_jsonschema_spark.sources import synth

    df = spark.read.parquet(path)
    # tokens elements are contractually non-null (synth writes parquet
    # footers saying so; Spark's reader coerces nullability away) — the
    # declared contract lets the compiler elide the per-element null scan
    suite = ConstraintSuite(synth.sequences_table_spec(), key="doc_id",
                            non_null_elements=("tokens",))
    t0 = time.time()
    res = suite.run(
        df, partition_col="part",
        dims={"sources_dim": synth.sources_dim(spark)},
        persist_violations=True,
    )
    # one heavy pass materializes row violations; verdicts then derive from
    # the persisted (small) violation set + a single-column row count
    n_viol = res.violations.count()
    verdicts = res.verdicts.collect()
    dt = time.time() - t0
    res.row_violations.unpersist()
    n_rows = sum(r["n_rows"] for r in verdicts)
    assert n_viol > 0  # plants present
    return n_rows, dt


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _scan_only(spark, path: str) -> tuple[int, float]:
    """Pure parquet-scan baseline: read the table, sum token counts.
    Isolates the memory/IO path from constraint evaluation — if THIS
    plateaus between parallelism bands, the band's efficiency ceiling is
    bandwidth, not the engine."""
    from pyspark.sql import functions as F

    t0 = time.time()
    n_tok = spark.read.parquet(path).select(
        F.sum(F.size("tokens")).alias("s")).first()["s"]
    return int(n_tok), time.time() - t0


def _verdict(eff: float, ceiling: float) -> str:
    if eff >= 0.8:
        return "MET"
    if eff >= ceiling:
        return ("HOST-BOUND: ≥ the zero-engine-code scan ceiling — the "
                "engine adds no scaling loss; a real N→4N cluster brings "
                "N× memory channels this single JVM does not")
    return "NOT MET"


def _git_head() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        )
        head = out.stdout.strip() or "unknown"
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        )
        # uncommitted engine changes must invalidate caches too
        return head + ("-dirty" if dirty.stdout.strip() else "")
    except Exception:
        return "unknown"


def _quick_probe() -> float:
    """Per-query noise probe: the 20M-iteration ``_noise_probe`` costs
    too much to bracket every attempt of 47 queries, so the suite loop
    uses a 5M-iteration version (~0.16 s quiet on this host, scaled
    quiet threshold ``QUICK_QUIET`` = _probed default 1.65 / 4)."""
    t0 = time.time()
    x = 0
    for i in range(5_000_000):
        x += i
    return round(time.time() - t0, 3)


QUICK_QUIET = 0.45


def run_headline(spark, sf_dir: str, *, n_runs: int = 3) -> tuple[
        dict[str, float], dict[str, list[float]], dict[str, list[float]],
        dict[str, int], list[str]]:
    """EVERY queries() entry (except the flagship, which runs first on a
    clean JVM) timed under the SAME probe+spread gating as the flagship
    (VERDICT r4 item 1: the r4 minhash/simhash 2.3-2.6× "regression" was
    recorded in a window only the flagship's gate could have rejected):
    each attempt is bracketed by quick probes, probe-polluted attempts
    are discarded and re-run, and a >2× best-3 spread tops up extra
    attempts.  Best + every raw attempt + per-attempt probes land in the
    artifact, so any future delta is attributable to plan vs host."""
    import __spark_entry__ as entry

    qs = entry.queries()
    best: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    probes: dict[str, list[float]] = {}
    discarded: dict[str, int] = {}
    noisy: list[str] = []
    for name, fn in qs.items():
        if name == "sequences_validation":
            continue

        # suite-position hygiene: with 90+ queries sharing one JVM,
        # accumulated memory-sink tables (streaming queries), cached
        # relations and broadcasts inflate LATE queries — measured
        # funnel_events 3.8s late-suite vs 0.78s fresh-JVM with quiet
        # probes both times.  Clear between queries so position in the
        # dict doesn't tax the measurement.
        try:
            spark.catalog.clearCache()
            for t in spark.catalog.listTables():
                if t.isTemporary:
                    spark.catalog.dropTempView(t.name)
        except Exception:
            pass

        def _once(fn=fn):
            t0 = time.time()
            fn(spark, sf_dir).count()
            return time.time() - t0

        b3, attempts, pr, disc, bad = _probed_runs(
            _once, n_runs=n_runs, probe=_quick_probe, quiet=QUICK_QUIET,
            max_total=6, max_discard=2)
        best[name] = b3[0]
        runs[name] = attempts
        probes[name] = pr
        if disc:
            discarded[name] = disc
        if bad:
            noisy.append(name)
    return best, runs, probes, discarded, noisy


def _next_round_file() -> str:
    """BENCH/rNN.json for the CURRENT round: one past the largest of the
    driver-recorded root markers (BENCH_r*.json) AND the BENCH/rNN.json
    artifacts bench.py itself wrote — so a missing root marker can never
    make two runs clobber the same artifact (ADVICE r4); repeated runs
    within one round produce distinct files, and
    BENCH/headline_latest.json always names the freshest."""
    import re

    n = 0
    bench_dir = os.path.join(REPO, "BENCH")
    for d, rx in ((REPO, r"BENCH_r(\d+)\.json"), (bench_dir, r"r(\d+)\.json")):
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            m = re.fullmatch(rx, fn)
            if m:
                n = max(n, int(m.group(1)))
    return os.path.join(bench_dir, f"r{n + 1:02d}.json")


def _probed_runs(run_once, *, n_runs: int = 3, probe=_noise_probe,
                 quiet: float = 1.65, max_total: int = 7,
                 max_discard: int = 3):
    """Probe- AND spread-gated timing (VERDICT r3 item 8, generalized to
    every suite query in r5 — VERDICT r4 item 1).

    Two pollution detectors, because they catch different noise: a
    single-thread probe bracketing each attempt catches sustained CPU
    steal (> ``quiet`` sec), and the best-3 spread catches the mid-run
    many-core steal the single-thread probe misses (observed: a 77 s run
    with a 1.0 s quiet probe next to 7.5 s repeats of the same job).
    Probe-polluted attempts are discarded and re-run; while the three
    FASTEST accepted attempts still spread more than 2× the loop tops up
    extra attempts (bounded by ``max_total``).

    ``run_once`` returns the attempt's wall seconds.  Returns (runs,
    all_attempts, probes, n_discarded, noisy): ``runs`` is the best-3
    window (what best-of selection uses), ``all_attempts`` keeps every
    accepted raw timing so nothing is hidden, ``noisy`` marks a window
    that stayed polluted through every retry — the recorded numbers are
    then explicit lower bounds on engine speed."""
    attempts, probes, discarded = [], [], 0

    def _best():
        return sorted(attempts)[:n_runs]

    def _spread_bad():
        b = _best()
        return len(b) >= n_runs and b[0] > 0 and b[-1] / b[0] > 2.0

    while len(attempts) < n_runs or (len(attempts) < max_total
                                     and _spread_bad()):
        p0 = probe()
        dt = run_once()
        p1 = probe()
        pm = max(p0, p1)
        if pm > quiet and discarded < max_discard:
            discarded += 1
            continue
        attempts.append(round(dt, 3))
        probes.append(round(pm, 3))
    noisy = _spread_bad() or all(p > quiet for p in probes)
    return _best(), attempts, probes, discarded, noisy


def _one_run(cores: int, seq_path: str) -> dict:
    probe = _noise_probe()
    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen/page cache, then probe+spread-gated best-of-3
    # (r5: the ladder bands now use the same gating as the suite — an
    # ungated band recorded a 69 s local[32] run next to 11 s repeats and
    # published a noise-floor efficiency)
    n, _ = validate_sequences(spark, seq_path)
    best3, attempts, run_probes, discarded, noisy = _probed_runs(
        lambda: validate_sequences(spark, seq_path)[1])
    best = min(best3)
    # per-band bytes evidence: the pure-scan baseline (same warm-up +
    # gated best-of-3 discipline) bounds what ANY job over this table can
    # reach at this parallelism; token_bytes is the decompressed array
    # volume the validation pass must stream
    n_tok, _ = _scan_only(spark, seq_path)
    sbest3, sattempts, sprobes, sdiscarded, snoisy = _probed_runs(
        lambda: _scan_only(spark, seq_path)[1])
    scan_sec = min(sbest3)
    token_bytes = n_tok * 4  # int32 tokens
    parquet_bytes = _dir_bytes(seq_path)
    spark.stop()
    return {"cores": cores, "rows": n, "sec": round(best, 3),
            "runs": attempts, "probe_sec": probe,
            "run_probes": run_probes, "runs_discarded": discarded,
            "window_noisy": bool(noisy or snoisy),
            "rows_per_sec": round(n / best, 1),
            "scan_sec": round(scan_sec, 3), "scan_runs": sattempts,
            "scan_run_probes": sprobes, "scan_runs_discarded": sdiscarded,
            "parquet_bytes": parquet_bytes, "token_bytes": token_bytes,
            "scan_token_gbps": round(token_bytes / scan_sec / 1e9, 2),
            "validate_token_gbps": round(token_bytes / best / 1e9, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--subprocess-cores", type=int, default=0,
                    help="internal: run one scaling measurement and print json")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    n_rows = SEQ_ROWS.get(sf_name, 1_000_000)

    # scaling evidence uses a larger table so compute dominates fixed
    # per-job overhead (scheduler, Python<->JVM round trips).  Re-sized to
    # 16M after the round-3 items fast path: the 2× faster engine finishes
    # 4M rows at local[32] in ~4.6 s, of which ~1.5-2 s is fixed overhead —
    # Amdahl turns that into an artificial efficiency ceiling that says
    # nothing about the operator pipeline.  16M rows keeps every band's
    # wall time compute-dominant.
    scaling_rows = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", 16_000_000))

    if args.subprocess_cores:
        spark = _session(cores)  # generation session only if needed
        spark.sparkContext.setLogLevel("ERROR")
        path = _seq_parquet(spark, scaling_rows)
        spark.stop()
        print(json.dumps(_one_run(args.subprocess_cores, path)))
        return 0

    if args.scaling:
        results = {}
        cache_dir = os.path.join(REPO, "BENCH")
        os.makedirs(cache_dir, exist_ok=True)
        # cache entries carry a code+data fingerprint: results measured on
        # a different engine version or table size are ignored, never
        # silently mixed into a published BASELINE.md (ADVICE r2)
        fingerprint = f"{_git_head()}:{scaling_rows}"
        for c in (2, 8, 32):
            # per-core results are cached so a long run can be split across
            # invocations (each level is its own fresh JVM either way)
            cache = os.path.join(cache_dir, f".scaling_c{c}.json")
            if os.path.exists(cache):
                with open(cache) as f:
                    prev = json.load(f)
                if prev.get("fingerprint") == fingerprint:
                    results[c] = prev
                    continue
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--subprocess-cores={c}"],
                capture_output=True, text=True, env=os.environ.copy(),
                cwd=REPO,
            )
            line = p.stdout.strip().splitlines()[-1]
            results[c] = json.loads(line)
            results[c]["fingerprint"] = fingerprint
            with open(cache, "w") as f:
                json.dump(results[c], f)
        r2, r8, r32 = results[2], results[8], results[32]
        eff_2_8 = (r8["rows_per_sec"] / r2["rows_per_sec"]) / 4.0
        eff_8_32 = (r32["rows_per_sec"] / r8["rows_per_sec"]) / 4.0
        scan_eff_2_8 = (r2["scan_sec"] / r8["scan_sec"]) / 4.0
        scan_eff_8_32 = (r8["scan_sec"] / r32["scan_sec"]) / 4.0
        md = f"""# BENCH — sandbox scaling evidence (north-rule criterion)

Same job (full constraint-validation pass over the identical
{r8['rows']:,}-row synthetic sequences parquet: compiled row predicates →
violation rows, per-partition verdicts derived from the violation set,
hash-compact uniqueness (8-byte key hashes ride the shuffle), the
referential check folded into the predicate pass as a driver-collected
isin — r6) at
three parallelism levels, one fresh JVM each, warm-up run + probe- and
spread-gated best-of-3 steady-state runs (polluted attempts discarded
and re-run; every accepted raw timing shown):

| parallelism | wall sec (gated best-of-3) | accepted runs | noise probe | validated sequences/sec |
|---|---|---|---|---|
| local[2]  | {r2['sec']} | {r2['runs']} | {r2['probe_sec']} | {r2['rows_per_sec']:,} |
| local[8]  | {r8['sec']} | {r8['runs']} | {r8['probe_sec']} | {r8['rows_per_sec']:,} |
| local[32] | {r32['sec']} | {r32['runs']} | {r32['probe_sec']} | {r32['rows_per_sec']:,} |

(noise probe = single-threaded 20M-iteration Python loop, ≈1.3 s when the
host is quiet, 1.9 s+ under noisy-neighbor CPU steal — readings above
~1.6 s mean the wall times are lower bounds on engine speed)

N→4N scaling efficiency (the north-rule criterion, ≥ 0.8).  The
"scan-only ceiling" column is the SAME band's efficiency for a pure
parquet scan with zero engine code (details below) — no job over this
table can scale past it on this host:

| band | validation efficiency | scan-only ceiling | verdict |
|---|---|---|---|
| local[2] → local[8]  | **{eff_2_8:.3f}** | {scan_eff_2_8:.3f} | {_verdict(eff_2_8, scan_eff_2_8)} |
| local[8] → local[32] | **{eff_8_32:.3f}** | {scan_eff_8_32:.3f} | {_verdict(eff_8_32, scan_eff_8_32)} |

## Per-band bytes evidence (is the ceiling the engine or the memory bus?)

The same table's PURE SCAN (read parquet, sum token counts — no
constraint evaluation at all) at each band, same warm-up + best-of-3
discipline.  Parquet on disk: {r8['parquet_bytes']/1e9:.2f} GB; decoded
token volume the pass must stream: {r8['token_bytes']/1e9:.2f} GB.

| parallelism | pure-scan sec (gated best-of-3) | accepted runs | scan token-GB/s | full-validation token-GB/s |
|---|---|---|---|---|
| local[2]  | {r2['scan_sec']} | {r2['scan_runs']} | {r2['scan_token_gbps']} | {r2['validate_token_gbps']} |
| local[8]  | {r8['scan_sec']} | {r8['scan_runs']} | {r8['scan_token_gbps']} | {r8['validate_token_gbps']} |
| local[32] | {r32['scan_sec']} | {r32['scan_runs']} | {r32['scan_token_gbps']} | {r32['validate_token_gbps']} |

| band | scan-only efficiency | full-validation efficiency |
|---|---|---|
| local[2] → local[8]  | {scan_eff_2_8:.3f} | {eff_2_8:.3f} |
| local[8] → local[32] | {scan_eff_8_32:.3f} | {eff_8_32:.3f} |

Reading: the scan-only job contains zero engine code — its 8→32
efficiency is the HOST's parquet-decode/memory-bandwidth ceiling for this
table in one JVM.  The validation pass cannot scale past the scan that
feeds it; the gap between the two columns (not the gap to 1.0) is what
constraint evaluation costs in scaling terms.

Note on the upper band: all threads share ONE JVM, one memory bus, one
page cache and one driver in local mode.  Between 8 and 32 threads the
job becomes memory-bandwidth-bound (the pass streams
{r8['token_bytes']/1e9:.1f} GB of token arrays) and loses CPU turbo
headroom, which a real 4×-executor cluster — each executor with its own
memory channels — does not suffer.  The engine-side evidence that the
design scales is shuffle discipline: the only shuffles in the pass are
O(#violations) and O(#keys) aggregations (map-side combined, salted
against hot keys) and a broadcast join; the O(rows·tokens) predicate work
is embarrassingly parallel per partition.

## Reconciling driver-bench vs builder-bench throughput

Both numbers now come from the SAME code path AND the same
{r8['rows']:,}-row parquet: `validate_sequences` (generation outside the
timed region), warm-up run first, best-of-3.  The round-1 reading of 42k
seq/s (driver) against 574k seq/s (builder) had two causes, both fixed:
(a) the default mode used a 1M-row table whose ~2.5 s fixed per-run cost
(scheduling, Python<->JVM round trips) is half the wall time — 1M rows
measures overhead, not the engine (measured same-window: 1M → 215k
rows/s, 4M → 540k rows/s); (b) the default mode ran the sequences pass
AFTER the 20-query headline suite in the same JVM, where pandas-UDF
worker-pool and GC pressure produced 11 s → 101 s swings under a QUIET
host probe — it now runs first.  The per-run timings and probe readings
embedded in both outputs (`seq_runs` / `noise_probe_sec` in the JSON, the
table above) make window quality visible in every future measurement.
"""
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
        # hand-maintained sections (measurement-variance record) survive
        # regeneration: everything from their first header on is re-appended
        keep = ""
        if os.path.exists(out_md):
            with open(out_md) as f:
                old = f.read()
            idx = old.find("## Measurement variance")
            if idx >= 0:
                keep = "\n" + old[idx:]
        with open(out_md, "w") as f:
            f.write(md + keep)
        print(json.dumps({
            "scaling": list(results.values()),
            "efficiency_2_8": round(eff_2_8, 3),
            "efficiency_8_32": round(eff_8_32, 3),
        }))
        return 0

    probe_before = _noise_probe()
    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    seq_path = _seq_parquet(spark, n_rows)

    t0 = time.time()
    # the north-rule number FIRST, on a fresh JVM: validation pass over
    # PRE-WRITTEN parquet (generation fully separated from validation),
    # warm-up + probe-gated best-of-3, all raw timings reported.  Running
    # it after the headline suite instead contaminates the measurement
    # (pandas-UDF worker pools + GC pressure from 40 prior queries —
    # observed 11 s → 101 s swings with a QUIET host probe).
    n_seq, _ = validate_sequences(spark, seq_path)  # warm-up: codegen+cache
    (seq_runs, seq_attempts, seq_probes, seq_discarded,
     seq_noisy) = _probed_runs(
        lambda: validate_sequences(spark, seq_path)[1])
    seq_sec = min(seq_runs)
    probe_mid = _noise_probe()
    (queries, query_runs, query_probes, query_discarded,
     noisy_queries) = run_headline(spark, sf_dir)
    total = time.time() - t0
    queries["sequences_validation"] = round(seq_sec, 3)
    query_runs["sequences_validation"] = seq_runs
    probe_after = _noise_probe()

    out = {
        "metric": ("headline suite time: sum of per-query best-of-3 "
                   "(constraint validation + analytics + dedup)"),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "wall_sec_all_runs": round(total, 3),
        "queries": queries,
        "sf": float(sf_name.replace("sf", "") or 0.1),
        "seq_rows": n_seq,
        "seq_validate_sec": round(seq_sec, 3),
        # best-3 window of the accepted attempts (spread-gated ≤ 2×
        # unless seq_window_noisy); every raw attempt is in seq_attempts
        "seq_runs": seq_runs,
        "seq_attempts": seq_attempts,
        # per accepted attempt: max(probe before, probe after); attempts
        # whose probes exceeded the quiet threshold were discarded + re-run
        "seq_run_probes": seq_probes,
        "seq_attempts_discarded": seq_discarded,
        "seq_window_noisy": seq_noisy,
        "seq_per_sec": round(n_seq / seq_sec, 1),
        "cores": cores,
        # host-noise context: quiet ≈ 1.3 s, noisy 1.9 s+ (single-thread
        # python loop), sampled before the seq pass / between seq and the
        # suite / after; scale per-query judgments accordingly
        "noise_probe_sec": [probe_before, probe_mid, probe_after],
        # per-query gating summary (full per-attempt arrays in full_json):
        # queries whose attempts were discarded for probe pollution, and
        # queries whose window stayed noisy through every retry
        "query_attempts_discarded": query_discarded,
        "noisy_queries": noisy_queries,
    }
    spark.stop()
    # the FULL artifact (incl. every per-query run array) goes to a file —
    # stdout tail-capture truncated it in round 3 (VERDICT item 4); the
    # printed line stays compact enough to always parse
    full = dict(out, query_runs=query_runs, query_probes=query_probes)
    round_file = _next_round_file()
    os.makedirs(os.path.dirname(round_file), exist_ok=True)
    for path in (round_file, os.path.join(REPO, "BENCH",
                                          "headline_latest.json")):
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
    out["full_json"] = os.path.relpath(round_file, REPO)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
