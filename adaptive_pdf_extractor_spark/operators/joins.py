"""Temporal join operators Spark's DataFrame API lacks as primitives.

**As-of join** (each left row matched to the right row with the greatest
timestamp <= the left timestamp, per key) is the standard time-series
enrichment join — quotes-to-trades, feature-snapshot-to-event, config
version-to-log-line. Spark has no native ASOF JOIN; the naive formulation
(range join ``l.ts >= r.ts`` + per-pair row_number) explodes into
O(|L| x |R|) pairs per key.

The implementation here is the union + carry-forward pattern: tag both
sides, union them, and run ONE window per key ordered by (ts, side) where
``last(value, ignorenulls)`` carries the most recent right-side value
forward onto each left row. Cost: a single shuffle on the key, window
state = one value per partition-ordered scan — linear, not quadratic, and
exactly the shape that survives a 100 TB event stream. The DuckDB oracle
is a true ``ASOF JOIN`` (exact semantics, independently implemented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: all (event, interval) pairs with
    matching key and ``start <= ts < end`` — point-in-interval enrichment
    (log line -> deploy window, trade -> trading halt, event -> incident).

    Spark executes a raw inequality join as a nested-loop over every
    key-pair — quadratic per key. The scale formulation bins time:
    intervals explode to the fixed-width bins they touch, events map to
    their single bin, and the join becomes an EQUI-join on (key, bin)
    followed by the exact containment filter. Each qualifying pair meets
    in exactly one bin (the event's), so no dedup is needed. Cost: one
    hash shuffle; interval rows replicate by ceil(length/bin) — pick
    ``bin_seconds`` near the typical interval length.

    Intervals with ``end <= start`` are empty by the half-open contract
    and produce no pairs. Returns events.* + intervals.* (key column
    once)."""
    binus = int(bin_seconds) * 1_000_000
    # integer floor of epoch-micros / bin (micros < 2^53, exact in the
    # intermediate double; positive, so cast-to-long truncation == floor).
    # The cast("timestamp") makes TIMESTAMP_NTZ columns acceptable to
    # unix_micros (session TZ is pinned UTC in session.py, so the NTZ ->
    # instant mapping is deterministic); it is a no-op for TIMESTAMP.
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    ev = events.withColumn("_ebin", (micros(ts_col) / binus).cast("long"))
    iv = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_ibin",
            F.explode(
                F.sequence(
                    (micros(start_col) / binus).cast("long"),
                    ((micros(end_col) - 1) / binus).cast("long"),
                )
            ),
        )
        .withColumnRenamed(key_col, "_ikey")
    )
    joined = ev.join(
        iv,
        (F.col(key_col) == F.col("_ikey")) & (F.col("_ebin") == F.col("_ibin")),
    ).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_ebin", "_ibin", "_ikey")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    strict: bool = False,
    out_col: str = "asof_value",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``out_col`` = the
    ``value_col`` of the ``right`` row with the greatest ``ts_col`` <= the
    left row's (``<`` when ``strict``), matched per ``key_col``; null when
    no prior right row exists (left-outer semantics).

    Right rows must be unique per (key, ts) — enforce upstream (e.g.
    groupBy key, ts) — otherwise "the" as-of value is ill-defined; this
    matches ASOF JOIN engines, which require or assume it.

    Plan shape: union (no shuffle) -> one Exchange on the key -> one
    window sort on (ts, side). Nothing quadratic; the right side's values
    ride the same shuffle as the left rows.
    """
    lcols = left.columns
    # side orders right-before-left at equal ts so ts==ts matches
    # (inclusive as-of); strict mode orders left first so an equal-ts
    # right row is NOT visible to it.
    right_side, left_side = (0, 1) if not strict else (1, 0)
    # The carried marker is a STRUCT wrapping the value, not the bare
    # value: last(ignorenulls) must skip only the left-row placeholders,
    # never a right row whose value is genuinely NULL — a true ASOF join
    # matches the latest right ROW and returns its value even when that
    # value is null (a bare-value carry would reach past it to a stale
    # older value; verified divergence vs the DuckDB ASOF oracle).
    rv_struct = F.struct(F.col(value_col).alias("v"))
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(right_side).alias("_side"),
        rv_struct.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(left_side).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *lcols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).withColumn(
        out_col, F.last("_rv", ignorenulls=True).over(w)["v"]
    )
    return merged.filter(F.col("_side") == left_side).select(*lcols, out_col)
