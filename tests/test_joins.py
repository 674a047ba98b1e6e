"""As-of join semantics: inclusive vs strict boundaries, left-outer nulls,
per-key isolation — the union + carry-forward window implementation
(operators/joins.py) against hand-computed expectations. The sf-scale
cross-engine check is the events_asof_join DuckDB ASOF JOIN oracle."""

from __future__ import annotations

from datetime import datetime, timedelta

from adaptive_pdf_extractor_spark.operators.joins import asof_join, interval_join


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


def test_asof_join_null_right_value_is_not_skipped(spark):
    """A right row whose VALUE is null is still the matched as-of row —
    the carry must return its null, never reach past it to a stale older
    value (true ASOF semantics; the bare-value ignorenulls formulation got
    this wrong)."""
    left = spark.createDataFrame(
        [("a", _ts(10), 1), ("a", _ts(3), 2)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 5.0), ("a", _ts(8), None)],
        "k string, ts timestamp, v double",
    )
    got = {
        r["eid"]: r["asof_value"]
        for r in asof_join(left, right, "k", "ts", "v").collect()
    }
    assert got == {1: None, 2: 5.0}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-implementation pin: on pseudo-random (key, ts) data the
    union + carry-forward window must agree with pandas.merge_asof (a
    third independent implementation besides the DuckDB ASOF oracle)."""
    import pandas as pd

    for seed in (1, 2, 3):
        st = seed * 0x9E3779B9
        def nxt():
            nonlocal st
            st = (st * 6364136223846793005 + 1442695040888963407) % 2**64
            return st
        lrows = [
            (f"k{nxt() % 4}", _ts(nxt() % 50), i) for i in range(60)
        ]
        rrows_map = {}
        for j in range(25):
            rrows_map[(f"k{nxt() % 4}", _ts(nxt() % 50))] = float(j)
        rrows = [(k, t, v) for (k, t), v in rrows_map.items()]
        left = spark.createDataFrame(lrows, "k string, ts timestamp, eid int")
        right = spark.createDataFrame(rrows, "k string, ts timestamp, v double")
        got = {
            r["eid"]: r["asof_value"]
            for r in asof_join(left, right, "k", "ts", "v").collect()
        }
        lpd = pd.DataFrame(lrows, columns=["k", "ts", "eid"]).sort_values("ts", kind="stable")
        rpd = pd.DataFrame(rrows, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
        merged = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
        exp = {
            int(r.eid): (None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        }
        assert got == exp, seed


def test_interval_join_boundaries_and_bins(spark):
    """Half-open [start, end) semantics; pairs found across bin
    boundaries; empty intervals match nothing; per-key isolation."""
    events = spark.createDataFrame(
        [
            ("a", _ts(0), 1),    # == start: in
            ("a", _ts(9), 2),    # inside
            ("a", _ts(10), 3),   # == end: out
            ("b", _ts(5), 4),    # other key: only b's interval
        ],
        "k string, ts timestamp, eid int",
    )
    intervals = spark.createDataFrame(
        [
            ("a", _ts(0), _ts(10), 100),
            ("b", _ts(4), _ts(6), 200),
            ("a", _ts(7), _ts(7), 300),   # empty: end == start
        ],
        "k string, s timestamp, e timestamp, iid int",
    )
    # bin_seconds=3 forces every interval to span multiple bins
    pairs = {
        (r["eid"], r["iid"])
        for r in interval_join(
            events, intervals, "k", "ts", "s", "e", bin_seconds=3
        ).collect()
    }
    assert pairs == {(1, 100), (2, 100), (4, 200)}
    # long-bin path (one bin covers everything) gives the same answer
    pairs_big = {
        (r["eid"], r["iid"])
        for r in interval_join(
            events, intervals, "k", "ts", "s", "e", bin_seconds=86400
        ).collect()
    }
    assert pairs_big == pairs


def test_interval_join_matches_bruteforce(spark):
    """Pseudo-random sweep vs the O(n^2) definition."""
    rows_e, rows_i = [], []
    st = 0xC0FFEE
    def nxt():
        nonlocal st
        st = (st * 6364136223846793005 + 1442695040888963407) % 2**64
        return st
    for i in range(80):
        rows_e.append((f"k{nxt() % 3}", _ts(nxt() % 60), i))
    for j in range(30):
        s = nxt() % 60
        rows_i.append((f"k{nxt() % 3}", _ts(s), _ts(s) + timedelta(seconds=nxt() % 20), j))
    events = spark.createDataFrame(rows_e, "k string, ts timestamp, eid int")
    intervals = spark.createDataFrame(
        rows_i, "k string, s timestamp, e timestamp, iid int"
    )
    got = {
        (r["eid"], r["iid"])
        for r in interval_join(
            events, intervals, "k", "ts", "s", "e", bin_seconds=7
        ).collect()
    }
    exp = {
        (eid, iid)
        for (ke, ts, eid) in rows_e
        for (ki, s, e, iid) in rows_i
        if ke == ki and s <= ts < e
    }
    assert got == exp and len(exp) > 0


def test_asof_join_multi_column_carry(spark):
    """Multi-column as-of: all carried columns come from the SAME matched
    right row (atomic struct carry), with per-column defaults asof_<name>
    and explicit out_col naming."""
    left = spark.createDataFrame(
        [("a", _ts(5), 1), ("a", _ts(9), 2), ("b", _ts(5), 3)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(2), 2.0, "x"),
            ("a", _ts(7), None, "y"),  # null v rides with tag y atomically
        ],
        "k string, ts timestamp, v double, tag string",
    )
    out = asof_join(left, right, "k", "ts", ["v", "tag"])
    assert out.columns == ["k", "ts", "eid", "asof_v", "asof_tag"]
    got = {r["eid"]: (r["asof_v"], r["asof_tag"]) for r in out.collect()}
    # eid=2 matches the ts=7 row: v is genuinely null, tag is "y" — a
    # per-column carry would wrongly pair (2.0-stale? no: v=None) with "y"
    assert got == {1: (2.0, "x"), 2: (None, "y"), 3: (None, None)}
    named = asof_join(
        left, right, "k", "ts", ["v", "tag"], out_col=["val", "label"]
    )
    assert named.columns == ["k", "ts", "eid", "val", "label"]


def test_asof_join_null_keys_never_match(spark):
    """DuckDB ASOF JOIN never matches NULL keys; Spark windows group NULL
    keys together, so without the right-side filter a NULL-key left row
    would wrongly receive NULL-key right values."""
    left = spark.createDataFrame(
        [(None, _ts(5), 1), ("a", _ts(5), 2), ("a", None, 3)],
        "k string, ts timestamp, eid int",
    )
    right = spark.createDataFrame(
        [(None, _ts(1), 99.0), ("a", _ts(1), 7.0), ("a", None, 55.0)],
        "k string, ts timestamp, v double",
    )
    got = {
        r["eid"]: r["asof_value"]
        for r in asof_join(left, right, "k", "ts", "v").collect()
    }
    # NULL-key left -> no match; NULL-ts left -> no match; NULL-key and
    # NULL-ts right rows are invisible
    assert got == {1: None, 2: 7.0, 3: None}


def test_asof_join_reserved_name_collisions(spark):
    """Left frames owning columns named like the internal helpers (_k,
    _ts, _side, _rv) must pass through unharmed; an out_col colliding with
    a left column raises."""
    import pytest

    left = spark.createDataFrame(
        [("a", _ts(5), 1, "keepme")],
        "k string, ts timestamp, _rv int, _side string",
    )
    right = spark.createDataFrame(
        [("a", _ts(1), 3.0)], "k string, ts timestamp, v double"
    )
    out = asof_join(left, right, "k", "ts", "v")
    assert out.columns == ["k", "ts", "_rv", "_side", "asof_value"]
    row = out.collect()[0]
    assert (row["_rv"], row["_side"], row["asof_value"]) == (1, "keepme", 3.0)
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "ts", "v", out_col="_rv")


def test_interval_join_negative_epoch(spark):
    """Pre-1970 timestamps: epoch micros are negative, where truncation
    != floor — binning must stay uniform-width and exact (pmod floor
    arithmetic), and the pair set must match the containment definition."""
    old = datetime(1969, 12, 31, 23, 59, 30)  # 30s before the epoch
    events = spark.createDataFrame(
        [("a", old, 1), ("a", datetime(1970, 1, 1, 0, 0, 5), 2)],
        "k string, ts timestamp, eid int",
    )
    intervals = spark.createDataFrame(
        [("a", datetime(1969, 12, 31, 23, 59, 0),
          datetime(1970, 1, 1, 0, 0, 10), 100)],
        "k string, s timestamp, e timestamp, iid int",
    )
    got = {
        (r["eid"], r["iid"])
        for r in interval_join(
            events, intervals, "k", "ts", "s", "e", bin_seconds=7
        ).collect()
    }
    assert got == {(1, 100), (2, 100)}


def test_interval_join_auto_bin_and_replication_guard(spark):
    """Pathological interval lengths: stats-driven bin selection (p99,
    clamped by the replication budget) gives the right answer, and an
    explicit mis-chosen bin with max_replication set fails loudly instead
    of silently multiplying rows."""
    import pytest

    # 99 one-minute intervals + one 10-day outlier
    rows_i = [
        ("a", _ts(i), _ts(i) + timedelta(minutes=1), i) for i in range(49)
    ]
    rows_i.append(("a", _ts(0), _ts(0) + timedelta(days=10), 999))
    events = spark.createDataFrame(
        [("a", _ts(30), 1)], "k string, ts timestamp, eid int"
    )
    intervals = spark.createDataFrame(
        rows_i, "k string, s timestamp, e timestamp, iid int"
    )
    exp = {
        (1, iid)
        for (_, s, e, iid) in rows_i
        if s <= _ts(30) < e
    }
    got = {
        (r["eid"], r["iid"])
        for r in interval_join(
            events, intervals, "k", "ts", "s", "e", bin_seconds=None
        ).collect()
    }
    assert got == exp and len(exp) > 1
    # explicit 1-second bin: the 10-day interval would replicate 864000x
    with pytest.raises(ValueError, match="max_replication"):
        interval_join(
            events, intervals, "k", "ts", "s", "e",
            bin_seconds=1, max_replication=1000,
        )
    # max_replication=1 is unsatisfiable (a misaligned interval of any
    # length can straddle a bin boundary) — rejected up front
    with pytest.raises(ValueError, match=">= 2"):
        interval_join(
            events, intervals, "k", "ts", "s", "e",
            bin_seconds=None, max_replication=1,
        )


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
