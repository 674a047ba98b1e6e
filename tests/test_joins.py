"""As-of join semantics: inclusive vs strict boundaries, left-outer nulls,
per-key isolation — the union + carry-forward window implementation
(operators/joins.py) against hand-computed expectations. The sf-scale
cross-engine check is the events_asof_join DuckDB ASOF JOIN oracle."""

from __future__ import annotations

from datetime import datetime

from adaptive_pdf_extractor_spark.operators.joins import asof_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_inclusive_strict_and_outer(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(1), 100),
            ("a", _ts(5), 101),
            ("a", _ts(10), 102),
            ("b", _ts(3), 200),   # b has no right rows at all
            ("c", _ts(2), 300),   # c's only right row is later
        ],
        "k string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(1), 1.0),
            ("a", _ts(6), 6.0),
            ("c", _ts(9), 9.0),
        ],
        "k string, ts timestamp, v double",
    )
    inclusive = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "k", "ts", "v").collect()
    }
    # ts == right ts matches inclusively; later rights are invisible
    assert inclusive == {100: 1.0, 101: 1.0, 102: 6.0, 200: None, 300: None}
    strict = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, "k", "ts", "v", strict=True).collect()
    }
    # strict: the equal-ts right row is NOT visible to event 100
    assert strict == {100: None, 101: 1.0, 102: 6.0, 200: None, 300: None}


def test_asof_join_preserves_left_shape(spark):
    """Left-outer contract: one output row per left row, left columns
    unchanged, only the as-of column added."""
    left = spark.createDataFrame(
        [("a", _ts(i), i) for i in range(20)],
        "k string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [("a", _ts(10), 10.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(left, right, "k", "ts", "v")
    assert out.columns == ["k", "ts", "event_id", "asof_value"]
    rows = out.collect()
    assert len(rows) == 20
    assert all(
        (r["asof_value"] is None) == (r["event_id"] < 10) for r in rows
    )
