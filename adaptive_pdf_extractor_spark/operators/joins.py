"""Temporal join operators Spark's DataFrame API lacks as primitives.

**As-of join** (each left row matched to the right row with the greatest
timestamp <= the left timestamp, per key) is the standard time-series
enrichment join — quotes-to-trades, feature-snapshot-to-event, config
version-to-log-line. Spark has no native ASOF JOIN; the naive formulation
(range join ``l.ts >= r.ts`` + per-pair row_number) explodes into
O(|L| x |R|) pairs per key.

The implementation here is the union + carry-forward pattern: tag both
sides, union them, and run ONE window per key ordered by (ts, side) where
``last(value, ignorenulls)`` carries the most recent right-side values
forward onto each left row. Cost: a single shuffle on the key, window
state = one struct per partition-ordered scan — linear, not quadratic, and
exactly the shape that survives a 100 TB event stream. The DuckDB oracle
is a true ``ASOF JOIN`` (exact semantics, independently implemented).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _floor_bin(micros, binus: int):
    """Exact floor(micros / binus) as Column algebra: ``pmod`` yields the
    positive remainder, so the numerator is an exact multiple of ``binus``
    and the double division is exact (IEEE division of exactly-representable
    operands with an exactly-representable quotient). A bare
    ``(micros / binus).cast('long')`` truncates toward zero — still monotone
    (so no pairs were dropped), but it makes the bin straddling epoch zero
    double-width (skewing replication counts for pre-1970 data) and leans on
    round-to-nearest staying under half an ulp at bin boundaries; the pmod
    form is exact by construction."""
    return ((micros - F.pmod(micros, F.lit(binus))) / F.lit(binus)).cast("long")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_seconds: int | None = 3600,
    max_replication: int | None = None,
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
    hash shuffle; interval rows replicate by ceil(length/bin).

    ``bin_seconds``:

    * an int — explicit bin width; pick it near the typical interval
      length. With ``max_replication`` set, one small agg over the
      intervals verifies the worst single interval replicates to at most
      that many bins and raises ``ValueError`` otherwise (a mis-chosen bin
      on long intervals otherwise multiplies rows SILENTLY).
    * ``None`` — stats-driven auto-selection: one small agg computes the
      p99 interval length (the bin, so ~99% of intervals land in one bin)
      and the max length; the bin is then clamped UP so the longest
      interval replicates to at most ``max_replication`` bins (default 256
      in auto mode). The agg is an eager driver-side job over the
      intervals side only — run it once and pass the chosen bin explicitly
      in loops.

    Intervals with ``end <= start`` are empty by the half-open contract
    and produce no pairs. Timestamps may be pre-1970 (binning floors, not
    truncates). Returns events.* + intervals.* (key column once)."""
    # The cast("timestamp") makes TIMESTAMP_NTZ columns acceptable to
    # unix_micros (session TZ is pinned UTC in session.py, so the NTZ ->
    # instant mapping is deterministic); it is a no-op for TIMESTAMP.
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    if max_replication is not None and max_replication < 2:
        # no finite bin bounds a bin-misaligned interval to ONE bin (it
        # always may straddle a boundary) — reject instead of silently
        # exceeding the budget or giving un-followable advice
        raise ValueError(
            f"max_replication must be >= 2 (got {max_replication}): a "
            "misaligned interval of any length can span 2 bins"
        )
    iv_valid = intervals.filter(F.col(end_col) > F.col(start_col))
    if bin_seconds is None:
        if max_replication is None:
            max_replication = 256
        length_s = (micros(end_col) - micros(start_col)) / 1e6
        stats = iv_valid.select(length_s.alias("_len")).agg(
            F.percentile("_len", F.lit(0.99)).alias("p99"),
            F.max("_len").alias("mx"),
        ).first()
        if stats["p99"] is None:  # no non-empty intervals: any bin works
            bin_seconds = 3600
        else:
            import math

            bin_seconds = max(1, math.ceil(stats["p99"]))
            # clamp UP so the longest interval stays within the
            # replication budget (the p99 choice alone lets one tail
            # interval fan out unboundedly). A bin-misaligned interval of
            # length L spans up to ceil(L/bin)+1 bins (one partial bin at
            # each end), hence the -1 in the divisor.
            bin_seconds = max(
                bin_seconds,
                math.ceil(stats["mx"] / max(1, max_replication - 1)),
            )
    elif max_replication is not None:
        mx = iv_valid.select(
            ((micros(end_col) - micros(start_col)) / 1e6).alias("_len")
        ).agg(F.max("_len").alias("mx")).first()["mx"]
        if mx is not None:
            import math

            # bin-misaligned worst case: a length-L interval spans up to
            # ceil(L/bin)+1 bins (one partial bin at each end)
            worst = math.ceil(mx / bin_seconds) + 1
            if worst > max_replication:
                raise ValueError(
                    f"interval_join: longest interval ({mx:.0f}s) replicates "
                    f"to up to {worst} bins at bin_seconds={bin_seconds}, "
                    f"over max_replication={max_replication}; raise "
                    "bin_seconds to >= "
                    f"{math.ceil(mx / max(1, max_replication - 1))} (or "
                    "pass bin_seconds=None for stats-driven selection)"
                )
    binus = int(bin_seconds) * 1_000_000
    ev = events.withColumn("_ebin", _floor_bin(micros(ts_col), binus))
    iv = (
        iv_valid.withColumn(
            "_ibin",
            F.explode(
                F.sequence(
                    _floor_bin(micros(start_col), binus),
                    _floor_bin(micros(end_col) - 1, binus),
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


def _fresh_name(base: str, taken: set[str]) -> str:
    name = base
    i = 0
    while name in taken:
        i += 1
        name = f"{base}_{i}"
    taken.add(name)
    return name


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | Sequence[str],
    *,
    strict: bool = False,
    out_col: str | Sequence[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``value_col``
    column(s) of the ``right`` row with the greatest ``ts_col`` <= the
    left row's (``<`` when ``strict``), matched per ``key_col``; null when
    no prior right row exists (left-outer semantics).

    ``value_col`` may be one column name or a sequence — the whole matched
    right row's payload carries through ONE struct (quote -> trade
    enrichment wants every quote column, not one). Output names come from
    ``out_col`` (same shape as ``value_col``); defaults: ``"asof_value"``
    for a single column, ``asof_<name>`` per column for a sequence.

    NULL semantics match ASOF JOIN engines (DuckDB is the oracle): right
    rows with a NULL key or NULL timestamp never match anything, and left
    rows with a NULL key or NULL timestamp match nothing (all their output
    columns are null). Without the explicit right-side filter, Spark's
    window partitioning would group NULL keys TOGETHER and wrongly carry
    NULL-key right rows onto NULL-key left rows.

    Right rows must be unique per (key, ts) — enforce upstream (e.g.
    groupBy key, ts) — otherwise "the" as-of row is ill-defined; this
    matches ASOF JOIN engines, which require or assume it.

    Plan shape: union (no shuffle) -> one Exchange on the key -> one
    window sort on (ts, side). Nothing quadratic; the right side's values
    ride the same shuffle as the left rows.
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    if out_col is None:
        out_cols = (
            ["asof_value"]
            if isinstance(value_col, str)
            else [f"asof_{c}" for c in value_cols]
        )
    else:
        out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(out_cols) != len(value_cols):
        raise ValueError(
            f"out_col count ({len(out_cols)}) != value_col count "
            f"({len(value_cols)})"
        )
    lcols = left.columns
    clash = [c for c in out_cols if c in lcols]
    if clash:
        raise ValueError(
            f"output column(s) {clash} collide with left columns; pass "
            "out_col with non-colliding names"
        )
    # helper columns must not collide with ANY left column (they ride the
    # same projection as *lcols); generate fresh names
    taken = set(lcols) | set(out_cols)
    k_c = _fresh_name("_k", taken)
    ts_c = _fresh_name("_ts", taken)
    side_c = _fresh_name("_side", taken)
    rv_c = _fresh_name("_rv", taken)
    # side orders right-before-left at equal ts so ts==ts matches
    # (inclusive as-of); strict mode orders left first so an equal-ts
    # right row is NOT visible to it.
    right_side, left_side = (0, 1) if not strict else (1, 0)
    # The carried marker is ONE STRUCT wrapping all value columns, not the
    # bare values: last(ignorenulls) must skip only the left-row
    # placeholders, never a right row whose values are genuinely NULL — a
    # true ASOF join matches the latest right ROW and returns its values
    # even when they are null (a bare-value carry would reach past it to a
    # stale older row; verified divergence vs the DuckDB ASOF oracle). One
    # struct (not one carry per column) also keeps the match atomic: all
    # outputs come from the SAME right row.
    rv_struct = F.struct(
        *[F.col(c).alias(f"v{i}") for i, c in enumerate(value_cols)]
    )
    # NULL-key / NULL-ts right rows can never be "the most recent prior
    # row" of anything (comparisons with NULL are false in ASOF engines) —
    # drop them before the union so the NULL window partition carries no
    # right payload.
    r = right.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias(k_c),
        F.col(ts_col).alias(ts_c),
        F.lit(right_side).alias(side_c),
        rv_struct.alias(rv_c),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(key_col).alias(k_c),
        F.col(ts_col).alias(ts_c),
        F.lit(left_side).alias(side_c),
        F.lit(None).cast(r.schema[rv_c].dataType).alias(rv_c),
        *lcols,
    )
    w = (
        Window.partitionBy(k_c)
        .orderBy(ts_c, side_c)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried_c = _fresh_name("_carried", taken)
    # NULL-ts left rows sort before every (non-null-ts) right row in the
    # partition, so they naturally carry nothing; NULL-key left rows live
    # in a partition holding no right rows (filtered above) — both yield
    # all-null outputs, matching the oracle.
    merged = r.unionByName(l).withColumn(
        carried_c, F.last(rv_c, ignorenulls=True).over(w)
    )
    return merged.filter(F.col(side_c) == left_side).select(
        *lcols,
        *[
            F.col(carried_c)[f"v{i}"].alias(out)
            for i, out in enumerate(out_cols)
        ],
    )
