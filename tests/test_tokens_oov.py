"""oov_rate / oov_rate_expr (operators/tokens.py)."""
import pytest
from pyspark.sql import functions as F

from go_jsonschema_spark.operators.tokens import oov_rate, oov_rate_expr


@pytest.fixture(scope="module")
def vocab(spark):
    return spark.createDataFrame(
        [(i,) for i in range(10)], ["token_id"])


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>")


def test_oov_counts(spark, vocab):
    df = _df(spark, [
        ("a", [1, 2, 3]),          # all in vocab
        ("b", [1, 99, 3, 100]),    # two OOV
        ("c", []),                 # empty -> 0/0 -> NULL rate
        ("d", None),               # NULL array -> same as empty
        ("e", [None, 5]),          # NULL element is OOV
    ])
    got = {r["doc_id"]: r for r in oov_rate(df, vocab).collect()}
    assert (got["a"]["n_tok"], got["a"]["n_oov"]) == (3, 0)
    assert got["a"]["oov_rate"] == 0.0
    assert (got["b"]["n_tok"], got["b"]["n_oov"]) == (4, 2)
    assert got["b"]["oov_rate"] == 0.5
    assert (got["c"]["n_tok"], got["c"]["n_oov"]) == (0, 0)
    assert got["c"]["oov_rate"] is None
    assert (got["d"]["n_tok"], got["d"]["n_oov"]) == (0, 0)
    assert (got["e"]["n_tok"], got["e"]["n_oov"]) == (2, 1)


def test_oov_vocab_nulls_ignored(spark):
    vocab = spark.createDataFrame(
        [(1,), (None,), (2,)], "token_id int")
    df = _df(spark, [("a", [1, 2, 3])])
    r = oov_rate(df, vocab).collect()[0]
    assert r["n_oov"] == 1  # 3 is OOV; NULL vocab row grants nothing


def test_oov_rate_expr_tiny_vocab(spark):
    df = _df(spark, [("a", [1, 2, 99])])
    out = df.select(oov_rate_expr(F.col("tokens"), [1, 2, 3]).alias("n"))
    assert out.collect()[0]["n"] == 1


def test_oov_rate_expr_rejects_big_vocab(spark):
    with pytest.raises(ValueError):
        oov_rate_expr(F.col("tokens"), list(range(100)))
