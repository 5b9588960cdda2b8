"""Round-5 fixes (ADVICE r4): cosine_pairs_exact edge inputs, streaming
await timeout surfaced, bench round-file numbering, curate gopher
single-aggregation drop count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# -- cosine_pairs_exact: empty input and null vectors (ADVICE r4) -----------

def test_cosine_pairs_exact_empty_input(spark):
    from go_jsonschema_spark.operators.dedup import cosine_pairs_exact

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = cosine_pairs_exact(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["a", "b", "cosine"]


@pytest.mark.parametrize("rows", [
    [(1, [1.0, 0.0]), (2, None)],          # null vector
    [(1, [1.0, 0.0]), (2, [None, 1.0])],   # null element
])
def test_cosine_pairs_exact_null_vectors_raise(spark, rows):
    from go_jsonschema_spark.operators.dedup import cosine_pairs_exact

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="null"):
        cosine_pairs_exact(df)


def test_cosine_pairs_exact_still_correct(spark):
    from go_jsonschema_spark.operators.dedup import cosine_pairs_exact

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]): r["cosine"]
           for r in cosine_pairs_exact(df, threshold=0.9).collect()}
    assert got == {(1, 2): 1.0}


# -- bench round-file numbering (ADVICE r4) ---------------------------------

def test_next_round_file_numbers_off_both_sources(tmp_path, monkeypatch):
    import bench

    repo = tmp_path
    (repo / "BENCH").mkdir()
    monkeypatch.setattr(bench, "REPO", str(repo))
    # no markers at all -> r01
    assert bench._next_round_file().endswith("r01.json")
    # root marker only
    (repo / "BENCH_r03.json").write_text("{}")
    assert bench._next_round_file().endswith("r04.json")
    # bench.py's own artifact is AHEAD of the root marker (driver forgot
    # to write one): numbering must follow the artifact, never clobber
    (repo / "BENCH" / "r05.json").write_text("{}")
    assert bench._next_round_file().endswith("r06.json")


# -- probe-gated per-query timing (VERDICT r4 item 1) -----------------------

def test_probed_runs_discards_polluted_attempts():
    import bench

    # attempt 1's closing probe is noisy (pollutes the slow outlier);
    # every later probe is quiet — only the outlier is discarded
    probes = iter([0.1, 9.9, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1])
    runs = iter([50.0, 1.0, 1.1, 1.2])
    best, attempts, pr, discarded, noisy = bench._probed_runs(
        lambda: next(runs), probe=lambda: next(probes), quiet=1.65)
    assert discarded == 1
    assert best == [1.0, 1.1, 1.2]
    assert 50.0 not in attempts
    assert not noisy


def test_probed_runs_spread_gate_tops_up():
    import bench

    # all probes quiet, but one attempt is a 10x outlier -> spread gate
    # keeps sampling until the best-3 window is tight
    runs = iter([10.0, 1.0, 1.1, 1.05, 1.2])
    best, attempts, pr, discarded, noisy = bench._probed_runs(
        lambda: next(runs), probe=lambda: 0.1, quiet=1.65)
    assert best == [1.0, 1.05, 1.1]
    assert 10.0 in attempts  # nothing hidden
    assert not noisy
