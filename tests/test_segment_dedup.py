"""segment_dedup (CCNet-style cross-corpus segment dedup): semantics and
edge cases — hot-segment stripping, order-preserving reassembly, the
short tail segment, whitespace-only documents, fully-stripped documents."""

from __future__ import annotations

from go_jsonschema_spark.operators.dedup import segment_dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_dedup(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_hot_segment_stripped_order_preserved(spark):
    # "a b c" appears in 3 docs (> max_docs=2) -> stripped everywhere;
    # the unique remainder survives in original order.
    rows = [
        (1, "a b c x y z"),
        (2, "p q r a b c"),
        (3, "a b c m n o"),
    ]
    got = _run(spark, rows, max_docs=2)
    assert got[1]["text_clean"] == "x y z"
    assert got[2]["text_clean"] == "p q r"
    assert got[3]["text_clean"] == "m n o"
    assert all(got[i]["n_seg_dropped"] == 1 for i in (1, 2, 3))


def test_fully_stripped_doc_null_text(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c")]
    got = _run(spark, rows, max_docs=2)
    assert all(got[i]["text_clean"] is None for i in (1, 2, 3))
    assert all(got[i]["n_seg_kept"] == 0 for i in (1, 2, 3))


def test_tail_segment_shorter_than_seg_words(spark):
    got = _run(spark, [(1, "one two three four five")])
    # segments: "one two three", "four five" -- both unique, both kept
    assert got[1]["text_clean"] == "one two three four five"
    assert got[1]["n_seg_kept"] == 2


def test_whitespace_only_and_null_text_dropped(spark):
    rows = [(1, "   "), (2, None), (3, "real words here")]
    got = _run(spark, rows)
    # no phantom segments from sequence(0, -1); empty/null docs vanish
    assert set(got) == {3}
    assert got[3]["text_clean"] == "real words here"


def test_max_docs_boundary_inclusive(spark):
    # exactly max_docs occurrences are KEPT (strict > threshold)
    rows = [(1, "a b c"), (2, "a b c")]
    got = _run(spark, rows, max_docs=2)
    assert got[1]["text_clean"] == "a b c"
    assert got[2]["text_clean"] == "a b c"


def test_case_insensitive_segments(spark):
    # words() lowercases: "A B C" and "a b c" are the same segment
    rows = [(1, "A B C"), (2, "a b c"), (3, "a B c")]
    got = _run(spark, rows, max_docs=2)
    assert all(got[i]["text_clean"] is None for i in (1, 2, 3))
