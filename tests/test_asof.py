"""As-of join unit test with hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

from go_jsonschema_spark.operators.asof import asof_join


def test_asof_join_basic(spark):
    ts = datetime
    left = spark.createDataFrame(
        [
            ("L1", 1, ts(2024, 1, 1, 10, 0)),
            ("L2", 1, ts(2024, 1, 1, 12, 0)),
            ("L3", 2, ts(2024, 1, 1, 9, 0)),   # no prior right row
            ("L4", 2, ts(2024, 1, 1, 11, 0)),
            ("L5", 1, ts(2024, 1, 1, 11, 30)),  # exact-ts match at 11:30
        ],
        "id string, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1, 9, 30), 100.0),
            (1, ts(2024, 1, 1, 11, 30), 200.0),
            (2, ts(2024, 1, 1, 10, 0), 300.0),
        ],
        "user_id int, ts timestamp, rate double",
    )
    out = {
        r["id"]: r["rate_asof"]
        for r in asof_join(
            left, right, key="user_id", ts="ts", payload=["rate"]
        ).collect()
    }
    assert out == {
        "L1": 100.0,   # latest right <= 10:00 is 9:30
        "L2": 200.0,   # 11:30 <= 12:00
        "L3": None,    # nothing before 9:00
        "L4": 300.0,
        "L5": 200.0,   # right row AT the same ts is visible (<= semantics)
    }
