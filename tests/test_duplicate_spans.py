"""dedup.duplicate_spans: exact substring-dedup spans (Lee et al. 2022
shape) — hand-computed boundaries, window merging, within-doc repeats."""

from __future__ import annotations

import pytest

from go_jsonschema_spark.operators.dedup import duplicate_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_span_boundaries(spark):
    # docs 1 and 2 share words 2..6 of doc1 ("c d e f g") at k=3:
    # duplicated windows in doc1 start at pos 2,3,4 -> span [2, 7)
    d1 = "a b c d e f g h"
    d2 = "x y c d e f g z"
    got = {r["doc_id"]: r for r in duplicate_spans(
        _docs(spark, [(1, d1), (2, d2)]), k=3).collect()}
    assert (got[1]["span_start"], got[1]["span_end"],
            got[1]["n_windows"]) == (2, 7, 3)
    assert (got[2]["span_start"], got[2]["span_end"]) == (2, 7)


def test_no_cross_doc_duplicates_no_spans(spark):
    got = duplicate_spans(
        _docs(spark, [(1, "a b c d"), (2, "e f g h")]), k=3).collect()
    assert got == []


def test_within_doc_repeat_not_flagged_by_default(spark):
    # the same window twice INSIDE one doc is 1 distinct doc -> kept
    got = duplicate_spans(
        _docs(spark, [(1, "a b c x a b c")]), k=3).collect()
    assert got == []
    # max_docs=0 flags EVERY window (each occurs in >= 1 doc), so the
    # whole doc merges into one span — the count is distinct DOCUMENTS,
    # not occurrences (within-doc repetition is sequence_audit's job)
    got0 = {(r["span_start"], r["span_end"]) for r in duplicate_spans(
        _docs(spark, [(1, "a b c x a b c")]), k=3, max_docs=0).collect()}
    assert got0 == {(0, 7)}


def test_disjoint_spans_stay_separate(spark):
    # shared runs at both ends, unique middle -> two spans
    d1 = "p q r AAA m n o BBB s t u"
    d2 = "p q r CCC zz ww qq DDD s t u"
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(
            _docs(spark, [(1, d1.lower()), (2, d2.lower())]),
            k=3).collect()
        if r["doc_id"] == 1)
    assert got == [(0, 3), (8, 11)]


def test_full_duplicate_covers_whole_doc(spark):
    t = "one two three four five"
    got = {r["doc_id"]: r for r in duplicate_spans(
        _docs(spark, [(1, t), (2, t)]), k=3).collect()}
    assert (got[1]["span_start"], got[1]["span_end"],
            got[1]["n_windows"]) == (0, 5, 3)


def test_validation_and_short_docs(spark):
    with pytest.raises(ValueError, match="k must be"):
        duplicate_spans(_docs(spark, [(1, "a b")]), k=0)
    # docs shorter than k emit no windows and no error
    assert duplicate_spans(
        _docs(spark, [(1, "a b"), (2, "a b")]), k=5).collect() == []


def test_strip_spans_roundtrip(spark):
    from go_jsonschema_spark.operators.dedup import strip_spans

    docs = _docs(spark, [(1, "a b c d e f g h"), (2, "x y c d e f g z"),
                         (3, "untouched words here"), (4, None)])
    spans = duplicate_spans(docs, k=3)
    got = {r["doc_id"]: r for r in strip_spans(docs, spans).collect()}
    # doc1 span [2,7) removes c..g -> "a b h"
    assert got[1]["text_clean"] == "a b h"
    assert (got[1]["n_words_kept"], got[1]["n_words_removed"]) == (3, 5)
    assert got[2]["text_clean"] == "x y z"
    assert got[3]["text_clean"] == "untouched words here"
    assert got[3]["n_words_removed"] == 0
    assert got[4]["text_clean"] is None and got[4]["n_words_kept"] == 0


def test_strip_spans_full_coverage_nulls_text(spark):
    from go_jsonschema_spark.operators.dedup import strip_spans

    t = "one two three four five"
    docs = _docs(spark, [(1, t), (2, t)])
    got = {r["doc_id"]: r for r in strip_spans(
        docs, duplicate_spans(docs, k=3)).collect()}
    assert got[1]["text_clean"] is None
    assert got[1]["n_words_removed"] == 5
