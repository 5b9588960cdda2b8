"""Multi-JVM standalone-cluster scaling evidence (VERDICT r3 item 3).

local-mode scaling tops out at the single JVM's parquet-decode/memory
ceiling (BENCH/BASELINE.md scan-only control).  This tool stands up a
real Spark STANDALONE cluster on localhost — one master + 4 worker
daemons via ``spark-class`` — and runs the identical 16M-row validation
pass as a ``spark-submit --py-files`` application at two cluster sizes:

* band N:  ``spark.cores.max=8``  → 1 executor JVM × 8 cores
* band 4N: ``spark.cores.max=32`` → 4 executor JVMs × 8 cores

Executor count is asserted from the driver, so the 4N band is proven to
run across four separate executor JVMs (own heap, GC, Python worker
pool) — the closest one host can get to the north rule's N→4N-executor
criterion; the remaining shared resource is the physical memory bus.

Usage::

    python tools/cluster_bench.py [--rows 16000000] [--runs 3]

Writes BENCH/cluster_scaling.json and appends/refreshes the
"Multi-executor" section of BENCH/BASELINE.md.  The scan-only control
runs at both bands too, bounding any job's achievable efficiency on
this host.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MASTER_PORT = 7901
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"
LOG_DIR = os.path.join(REPO, ".benchdata", "cluster_logs")


def _spark_class() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-class")


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            s.settimeout(1.0)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def _daemon(args: list[str], log: str) -> subprocess.Popen:
    os.makedirs(LOG_DIR, exist_ok=True)
    env = dict(os.environ,
               SPARK_NO_DAEMONIZE="1",
               PYSPARK_PYTHON=sys.executable)
    out = open(os.path.join(LOG_DIR, log), "w")
    return subprocess.Popen([_spark_class(), *args], stdout=out,
                            stderr=subprocess.STDOUT, env=env, cwd=REPO)


def start_cluster(n_workers: int = 4, cores: int = 8,
                  mem: str = "20g") -> list[subprocess.Popen]:
    procs = [_daemon(
        ["org.apache.spark.deploy.master.Master", "--host", "127.0.0.1",
         "--port", str(MASTER_PORT), "--webui-port", "8091"],
        "master.log")]
    _wait_port(MASTER_PORT)
    for i in range(n_workers):
        procs.append(_daemon(
            ["org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--cores", str(cores), "--memory", mem,
             "--webui-port", str(8092 + i)],
            f"worker{i}.log"))
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


# ---------------------------------------------------------------------------
# band driver (runs INSIDE spark-submit against the standalone master)
# ---------------------------------------------------------------------------

def band_main(cores_max: int, seq_path: str, n_runs: int) -> int:
    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder
        .appName(f"cluster-bench-{cores_max}")
        .config("spark.cores.max", str(cores_max))
        .config("spark.executor.cores", "8")
        .config("spark.executor.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # wait for the expected executor fleet before timing anything
    want = cores_max // 8
    t0 = time.time()
    while time.time() - t0 < 90:
        execs = [
            e for e in spark.sparkContext._jsc.sc()
            .statusTracker().getExecutorInfos()
        ]
        if len(execs) - 1 >= want:  # minus the driver entry
            break
        time.sleep(1)
    n_exec = len(spark.sparkContext._jsc.sc().statusTracker()
                 .getExecutorInfos()) - 1
    if n_exec != want:
        print(json.dumps({"error": f"expected {want} executors, "
                                   f"got {n_exec}"}))
        spark.stop()
        return 1

    bench.validate_sequences(spark, seq_path)  # warm-up
    runs, attempts, probes, discarded, noisy = bench._probed_seq_runs(
        lambda: bench.validate_sequences(spark, seq_path), n_runs=n_runs)
    n_rows, _ = bench.validate_sequences(spark, seq_path)

    bench._scan_only(spark, seq_path)  # warm-up
    scan_runs = []
    n_tok = 0
    for _ in range(n_runs):
        n_tok, sdt = bench._scan_only(spark, seq_path)
        scan_runs.append(round(sdt, 3))
    spark.stop()
    best = min(runs)
    print(json.dumps({
        "cores_max": cores_max, "executors": n_exec, "rows": n_rows,
        "sec": best, "runs": runs, "attempts": attempts,
        "probes": probes, "discarded": discarded, "noisy": noisy,
        "rows_per_sec": round(n_rows / best, 1),
        "scan_sec": min(scan_runs), "scan_runs": scan_runs,
        "token_bytes": n_tok * 4,
    }))
    return 0


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------

def _ensure_seq_parquet(rows: int) -> str:
    import bench

    spark = bench._session(16)
    spark.sparkContext.setLogLevel("ERROR")
    path = bench._seq_parquet(spark, rows)
    spark.stop()
    return path


def _submit_band(cores_max: int, seq_path: str, n_runs: int) -> dict:
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                          "spark-submit")
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
        cwd=REPO).stdout.strip().splitlines()[-1]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    p = subprocess.run(
        [submit, "--master", MASTER_URL,
         "--py-files", zip_path,
         "--driver-memory", "8g",
         os.path.abspath(__file__),
         "--band-cores-max", str(cores_max),
         "--seq-path", seq_path, "--runs", str(n_runs)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"band {cores_max}: no JSON in output\n--- stdout tail\n"
        f"{p.stdout[-2000:]}\n--- stderr tail\n{p.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int,
                    default=int(os.environ.get(
                        "SPARK_GRAFT_SCALING_ROWS", 16_000_000)))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--band-cores-max", type=int, default=0,
                    help="internal: run one band inside spark-submit")
    ap.add_argument("--seq-path", default="")
    args = ap.parse_args()

    if args.band_cores_max:
        return band_main(args.band_cores_max, args.seq_path, args.runs)

    seq_path = _ensure_seq_parquet(args.rows)
    procs = start_cluster()
    try:
        r8 = _submit_band(8, seq_path, args.runs)
        r32 = _submit_band(32, seq_path, args.runs)
    finally:
        stop_cluster(procs)

    eff = (r32["rows_per_sec"] / r8["rows_per_sec"]) / 4.0
    scan_eff = (r8["scan_sec"] / r32["scan_sec"]) / 4.0
    out = {
        "mode": "standalone cluster, 1 master + 4 worker daemons, "
                "executors of 8 cores / 16g each",
        "bands": {"N": r8, "4N": r32},
        "efficiency_N_4N": round(eff, 3),
        "scan_only_efficiency_N_4N": round(scan_eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "cluster_scaling.json"),
              "w") as f:
        json.dump(out, f, indent=1)

    md = f"""## Multi-executor (separate JVMs) scaling — standalone cluster

The same {r8['rows']:,}-row validation pass submitted via
``spark-submit --master {MASTER_URL} --py-files dist/go_jsonschema_spark.zip``
to a localhost STANDALONE cluster (1 master + 4 worker daemons started
with ``spark-class``), at two cluster sizes with fixed executor shape
(8 cores / 16g each) — executor counts asserted from the driver:

| band | executors × cores | wall sec (best of {len(r8['runs'])}) | accepted runs | validated seq/s | scan-only sec |
|---|---|---|---|---|---|
| N  | {r8['executors']} × 8 | {r8['sec']} | {r8['runs']} | {r8['rows_per_sec']:,} | {r8['scan_sec']} |
| 4N | {r32['executors']} × 8 | {r32['sec']} | {r32['runs']} | {r32['rows_per_sec']:,} | {r32['scan_sec']} |

**N→4N scaling efficiency: {eff:.3f}** (north-rule bar ≥ 0.8); the
zero-engine-code scan-only control scales at {scan_eff:.3f} on the same
bands.  Unlike the local-mode table above, each executor here is its own
JVM with its own heap, GC and Python worker pool; the one resource still
shared is the host's physical memory bus.
"""
    base_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    txt = open(base_md).read() if os.path.exists(base_md) else ""
    marker = "## Multi-executor (separate JVMs) scaling"
    if marker in txt:
        pre = txt[:txt.index(marker)]
        rest = txt[txt.index(marker):]
        nxt = rest.find("\n## ", 1)
        txt = pre + md + (rest[nxt + 1:] if nxt >= 0 else "")
    else:
        txt = txt + "\n" + md
    with open(base_md, "w") as f:
        f.write(txt)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
