"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full adaptive extraction pipeline
(bounded iterative broadcast rule mining -> converged fast-path extraction)
over an interleaved text+media span corpus keyed by sf0.001's documents
table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (SURVEY.md §2 + training-data-pipeline ops), each with a DuckDB
ANSI-SQL oracle where the semantics are SQL-expressible. Column names and
rounding are aligned on both sides (the driver value-hashes after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adaptive_pdf_extractor_spark.functions import text as T
from adaptive_pdf_extractor_spark.operators import dedup, similarity
from adaptive_pdf_extractor_spark.operators.stats import split_threshold_hex
from adaptive_pdf_extractor_spark.operators.extract import salted_repartition

SF0001 = "/root/testdata/sf0.001"

# run dirs created by _flagship in this process, removed at interpreter
# exit (PID-keyed names can't be reclaimed by the next process's rmtree)
_FLAGSHIP_CLEANUP_DIRS: set[str] = set()

# Event-type domain of the synthetic events table — the single source the
# pivot query AND its generated SQL oracle derive their columns from
# (repo rule: long SQL is generated from the same constants as the Spark
# side, never hand-duplicated).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def _flagship_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Scale-adaptive flagship partitioning (guide §2): derived from
    CORPUS SIZE (~500 docs/partition), clamped to [8, 2 x parallelism].
    The round-5 constant 8 was tuned on sf0.001 (50 docs) and left 24 of
    32 cores idle through every extraction pass at sf1.0 (measured
    31.1 s -> 22.7 s scratch at 64 parts), while a bare 2 x parallelism
    over-schedules tiny corpora (5k docs at 64 parts measured x0.7 vs
    ~10). One metadata-fast parquet count; output is
    partition-independent (per-id seeding, hash-sampled mining —
    A/B-verified row-identical at sf1.0)."""
    n_docs = _docs(spark, sf_dir).count()
    return max(
        8, min(2 * spark.sparkContext.defaultParallelism, n_docs // 500)
    )


def _flagship(
    spark: SparkSession, sf_dir: str, max_rounds: int = 3, fresh: bool = True
) -> DataFrame:
    """Adaptive extraction end-to-end: derive a deterministic interleaved
    span corpus keyed by the documents table's doc_ids, learn rules from
    scratch (miner + iterative broadcast), extract, and return the flat
    (doc_id, field, value) view of the output span table."""
    import os
    import shutil
    import tempfile

    from adaptive_pdf_extractor_spark.plans.pipeline import (
        ExtractionPipeline,
        PipelineConfig,
    )
    from adaptive_pdf_extractor_spark.sources import spark_io

    # Span corpus DERIVED from the sf's documents table itself: field
    # values are token windows of each row's real text and the raw text
    # rides along as body (corpus.record_from_text) — the flagship
    # exercises ingestion of driver-provided data, not a row-count-keyed
    # synthetic twin. Derivation runs distributed over the parquet scan.
    n_parts = _flagship_partitions(spark, sf_dir)
    docs = spark_io.corpus_from_documents_df(
        _docs(spark, sf_dir), seed=13, corpus="flagship", partitions=n_parts
    )
    # stable, reused run dir (a mkdtemp per call leaked snapshot dirs
    # across repeated bench/driver invocations); PID-keyed so two live
    # processes (a bench and a test session) can't rmtree each other's
    # run dir mid-pipeline — one dir per process, reused within it
    run_dir = os.path.join(
        tempfile.gettempdir(),
        f"flagship_run_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if fresh:
        shutil.rmtree(run_dir, ignore_errors=True)
    # fresh=False resumes from whatever this process's previous run
    # committed: a converged manifest skips the learn loop entirely and
    # pays only the final extraction pass — the steady-state cost of a
    # production rerun (bench.py's adaptive_extract_resume point).
    # PID-keyed dirs never collide across live processes, but they also
    # never match a dead process's leftovers — clean up our own at exit
    # so repeated bench/test/driver processes don't accumulate /tmp dirs.
    global _FLAGSHIP_CLEANUP_DIRS
    if run_dir not in _FLAGSHIP_CLEANUP_DIRS:
        if not _FLAGSHIP_CLEANUP_DIRS:
            import atexit

            atexit.register(
                lambda: [
                    shutil.rmtree(d, ignore_errors=True)
                    for d in _FLAGSHIP_CLEANUP_DIRS
                ]
            )
        _FLAGSHIP_CLEANUP_DIRS.add(run_dir)
    pipe = ExtractionPipeline(
        spark,
        run_dir,
        PipelineConfig(max_rounds=max_rounds, num_partitions=n_parts),
    )
    out = pipe.run(docs, initial_rules_rows=[], write_output=False)
    flat = (
        out.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "media")
        .select(
            "doc_id",
            F.col("s.kind").alias("field"),
            F.col("s.text").alias("value"),
            F.col("s.offset").alias("field_pos"),
        )
    )
    # run() unpersists its inputs on exit, so consuming the returned frame
    # would regenerate the corpus and re-run the final extraction; the
    # deferred localCheckpoint materializes the (small) flat view once at
    # the caller's first action and truncates that lineage.
    return flat.localCheckpoint(eager=False)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, SF0001)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier revenue by nation): six-table join
    exercising region + supplier (the dims no other query touches), with
    the customer-and-supplier-same-nation predicate. Dim tables broadcast;
    the fact-side joins shuffle on their keys — the canonical star-join
    plan Catalyst should pick at any scale."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_events_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth (SURVEY §2.5): per-user lag/lead of the
    event value, dense_rank over the (ts, event_id) order, and an ntile
    quartile — the navigation + ranking family next to row_number and the
    frame-spec running sum."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.lag("value", 1).over(w), 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 2).alias("next_value"),
        F.dense_rank().over(w).alias("rk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_events_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct sketches — THE 100 TB pattern for distinct
    counts: per-(event_type) HLL sketches built once (e.g. a daily rollup
    table), then MERGED for the global estimate without touching raw data
    again. Rows-only (sketch bytes are engine-specific); accuracy vs exact
    countDistinct is tolerance-pinned in tests/test_sketch_aggregates.py."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events",
    ).unionByName(
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        ).select(F.lit("ALL").alias("event_type"), "approx_users", "n_events")
    )


def q_top_orders_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rk",
        )
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q_events_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user value (explicit frame spec: rows between
    unbounded preceding and current row, deterministic tiebreak)."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3 breadth): every click event enriched with
    the user's most recent at-or-before purchase — BOTH its value and its
    same-timestamp purchase count, carried atomically from the one matched
    right row (multi-column struct carry) — union + carry-forward window
    (one shuffle on the key, nothing quadratic; operators/joins.py).
    Oracle: a true DuckDB ASOF LEFT JOIN, independently implemented
    semantics, selecting the same two carried columns."""
    from adaptive_pdf_extractor_spark.operators.joins import asof_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    right = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("value").alias("ref_value"),
            F.count("*").alias("n_at_ts"),
        )
    )
    left = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(left, right, "user_id", "ts", ["ref_value", "n_at_ts"])
    # named so the unique non-null event_id sorts first in column-name
    # order: a nullable primary sort column breaks order-insensitive row
    # comparison (None is unordered vs float in the compare harness)
    return out.select(
        "event_id",
        F.round("asof_ref_value", 2).alias("prior_purchase_value"),
        F.col("asof_n_at_ts").alias("prior_purchase_count"),
    )


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (SURVEY §2.3 breadth): clicks inside each user's error
    windows ([error_ts, error_ts + 30 min)) — binned equi-join
    (operators/joins.interval_join), never the nested-loop inequality
    join Spark would otherwise plan. Oracle: the plain inequality join in
    DuckDB (exact same pair set)."""
    from adaptive_pdf_extractor_spark.operators.joins import interval_join

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    intervals = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("w_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = interval_join(
        clicks, intervals, "user_id", "ts", "w_start", "w_end",
        bin_seconds=1800,
    )
    return out.select("event_id", "interval_id")


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user: start, end
    (last event + gap), event count, value sum. Spark's session_window in
    batch mode; oracle: gaps-and-islands SQL (lag -> break flag ->
    running-sum island id) in DuckDB."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = e.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return agg.select(
        "user_id",
        F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        "sum_value",
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (SURVEY §2.4 breadth): ROLLUP (hour,
    event_type) — per-(hour, type) counts, per-hour subtotals, grand
    total in one pass. Rollup nulls are coalesced to 'ALL' on BOTH sides
    (mixed null/str cells break order-insensitive value comparison)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    hours = e.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
        "value",
    )
    return (
        hours.rollup("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("hour", F.lit("ALL")).alias("hour"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE totals (SURVEY §2.4 breadth, completing the grouping-set
    family next to ROLLUP): per-(day, type), per-day, per-type and grand
    totals in one pass. Nulls coalesced to 'ALL' on both sides (mixed
    null/str cells break order-insensitive value comparison)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = e.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
    )
    return (
        days.cube("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per event type (SURVEY §2.4 breadth): p50/p90/p99
    of value with linear interpolation — Spark's exact `percentile`
    aggregate vs DuckDB's `quantile_cont` (same interpolation contract).
    The approximate twin (approx_percentile / HLL) is pinned by tolerance
    tests instead — sketches are not cross-engine reproducible."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (SURVEY §2.4 breadth): hours x event types -> one wide row
    per hour with each type's value sum. Explicit pivot value list (the
    implicit-discovery variant needs an extra distinct scan AND makes the
    output schema data-dependent — never do that at 100 TB); oracle is the
    equivalent conditional aggregation."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = EVENT_TYPES
    wide = (
        e.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
            "value",
        )
        .groupBy("hour")
        .pivot("event_type", types)
        .sum("value")
    )
    return wide.select(
        "hour",
        *[F.round(F.coalesce(t, F.lit(0.0)), 2).alias(f"sum_{t}") for t in types],
    )


def q_events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY §2.4 breadth — completing the
    grouping-set trio next to ROLLUP and CUBE): ((day, event_type),
    (event_type), ()) — the exact set a report wants, without CUBE's
    unused (day) stratum. One pass, grouping nulls coalesced to 'ALL'
    identically on both engines."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    return (
        e.select(day, "event_type", "value")
        .groupingSets(
            [["day", "event_type"], ["event_type"], []],
            "day",
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def q_events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (SURVEY §2.5 breadth next to the ROWS frame of
    events_running_sum): per-user rolling 1-hour sum/count — the frame is
    defined by the ORDER-key VALUE (all ts ties are peers, so the result
    is deterministic under any tie order, unlike a ROWS frame)."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts is TIMESTAMP_NTZ; the session tz is pinned UTC (session.py), so
    # the timestamp->long hop yields the same UTC epoch DuckDB's epoch()
    # computes (and rangeBetween is difference-based anyway)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("hour_value"),
        F.count("*").over(w).alias("hour_events"),
    )


def q_events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling (the training-pipeline
    rebalancer): keep 20% of clicks, 50% of purchases, ALL errors, 5%
    of everything else — selection is a pure function of event_id (md5
    key ranges, the hash_split trick), so the sample is identical at any
    parallelism and fully oracled row-for-row."""
    from adaptive_pdf_extractor_spark.operators import stats

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return stats.stratified_hash_sample(
        e,
        "event_id",
        "event_type",
        {"click": 0.2, "purchase": 0.5, "error": 1.0},
        default=0.05,
    ).select("event_id", "event_type")


def q_events_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (the 100 TB path for distincts/quantiles, where
    exact shuffles don't fit): HyperLogLog++ distinct users and a
    1000-bucket approx median per event type. Rows-only by nature —
    sketches are not cross-engine reproducible; accuracy vs the exact
    aggregates is pinned by tolerance tests
    (tests/test_sketch_aggregates.py)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.round(
            F.percentile_approx("value", F.lit(0.5), F.lit(1000)), 4
        ).alias("p50_approx"),
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        T.mean_word_length(F.col("text")).alias("mean_word_len"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
    )


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", T.bpe_token_count(F.col("text")).alias("n_bpe_tokens")
    )


def q_winnowing_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sketch sizes (rows-only: xxhash64-based
    fingerprints are not reproducible in ANSI SQL; the winnowing guarantee
    is property-tested in tests/)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(T.winnowing_fingerprints(F.col("text"))).alias("sketch_size"),
    )


def q_winnowing_sketch_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled winnowing: the engine-portable md5 variant exploded
    to (doc_id, fingerprint) rows so DuckDB verifies EVERY fingerprint
    value, not just sketch sizes (xxhash64 stays the production fast
    path — q_winnowing_sketch)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.explode(
            T.winnowing_fingerprints_md5(F.col("text"), k=7, window=4)
        ).alias("fingerprint"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        T.quality_score(F.col("text")).alias("quality"),
    )


def q_lang_id_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small single-file input arrives as 1 partition; spread before the
    # 25-marker scoring expressions (one idle-core fix, see dedup._spread)
    d = _docs(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return (
        d.select(T.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .count()
        .withColumnRenamed("count", "n_docs")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return dedup.exact_dedup_groups(d, "doc_id", "text")


def _planted_dups(
    spark: SparkSession, sf_dir: str, n: int | None = 100
) -> DataFrame:
    """documents(doc_id<n, or all of them when n is None) unioned with
    mutated copies (id+100000, first ten chars dropped) — deterministic
    near-duplicates for the dedup ops."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    if n is not None:
        d = d.filter(F.col("doc_id") < n)
    mutated = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 11)").alias("text"),
    )
    return d.unionByName(mutated)


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_bucket_size: the mega-cluster guard runs in the GATED query too
    # (buckets here are pair-sized, so output is bit-identical to the
    # unguarded path — pinned in tests/test_lsh_guard.py — while the
    # DuckDB hash check keeps the guarded code path honest).
    # NOTE: guard + persist_sigs eagerly materializes the signature cache
    # at plan-BUILD time (one count job — see minhash_lsh_pairs_from_sigs'
    # docstring), so merely constructing this DataFrame runs a Spark job.
    return dedup.minhash_lsh_pairs(
        _planted_dups(spark, sf_dir),
        "doc_id",
        "text",
        shingle_n=5,
        num_hashes=128,
        bands=32,
        threshold=0.8,
        max_bucket_size=256,
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=5, threshold=0.25)


def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact-Jaccard pair graph of the
    planted-dup corpus: (doc_id, canonical_id = min id in component,
    cluster_size). Oracle: recursive-CTE transitive closure in DuckDB."""
    docs = _planted_dups(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=5, threshold=0.8
    )
    return dedup.neardup_clusters(
        docs.select(F.col("doc_id").alias("id")), pairs
    )


def q_embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join: top-10 neighbors (vec_id >= 5) of each of the first
    five query vectors, one corpus scan."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_join(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        k=10,
    )


def q_embedding_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pre-pruned batch k-NN at 10x q_embedding_knn_join's query count
    (50 queries): each query scores only its nprobe=4 probed buckets of 16,
    not the corpus — the composition for large query batches. Rows-only
    (approximate by design); full-probe equality with the exact join and
    pruned recall are pinned in tests/test_dedup_similarity.py."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_join_ivf(
        e.filter(F.col("vec_id") >= 50),
        e.filter(F.col("vec_id") < 50),
        "vec_id",
        "embedding",
        k=10,
        n_centroids=16,
        nprobe=4,
    )


def q_embedding_knn_join_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-probe IVF k-NN join (nprobe == n_centroids): every bucket is
    probed, so the bucket equi-join must reproduce the exact knn_join
    answer row-for-row — this puts the IVF JOIN PATH itself (bucket
    assignment, exploded broadcast probes, numpy batch cosine, per-query
    window) under the DuckDB hash gate by reusing embedding_knn_join's
    oracle verbatim. The pruned nprobe<n variant stays rows-only by
    design (approximate); its recall is pinned in tests."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.knn_join_ivf(
        e.filter(F.col("vec_id") >= 5),
        e.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        k=10,
        n_centroids=16,
        nprobe=16,
    )


def q_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation leg (SURVEY §2.7): documents added since a prior
    snapshot — current EXCEPT prior by content identity (anti-join on the
    md5 fingerprint). The current side includes PLANTED re-ingestions
    (docs < 100 duplicated under new ids with identical text) that must
    NOT appear as new — the content-identity semantics are load-bearing in
    the gate, not vacuously true of the data."""
    base = _docs(spark, sf_dir).select("doc_id", "text")
    reingested = base.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    cur = base.unionByName(reingested)
    prior_fp = base.filter(F.col("doc_id") < 300).select(
        T.doc_fingerprint_md5(F.col("text")).alias("fp")
    )
    added = cur.withColumn(
        "fp", T.doc_fingerprint_md5(F.col("text"))
    ).join(prior_fp, "fp", "left_anti")
    return added.select("doc_id").orderBy("doc_id")


def q_corpus_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation breadth (SURVEY §2.7, the INTERSECT leg next to
    corpus_delta's EXCEPT): documents present in BOTH snapshots by content
    identity — current ∩ prior via left-semi join on the md5 fingerprint.
    The current side again carries planted re-ingestions (new ids,
    identical text) which MUST appear (content identity, not id identity,
    is what intersects)."""
    base = _docs(spark, sf_dir).select("doc_id", "text")
    reingested = base.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    cur = base.unionByName(reingested)
    prior_fp = base.filter(F.col("doc_id") < 300).select(
        T.doc_fingerprint_md5(F.col("text")).alias("fp")
    )
    common = cur.withColumn(
        "fp", T.doc_fingerprint_md5(F.col("text"))
    ).join(prior_fp.distinct(), "fp", "left_semi")
    return common.select("doc_id").orderBy("doc_id")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by md5 hex-key
    ranges: per-split doc counts (the split is a pure function of doc_id —
    stable across reruns, repartitions, cluster sizes)."""
    from adaptive_pdf_extractor_spark.operators import stats

    d = _docs(spark, sf_dir)
    return (
        stats.hash_split(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"))
    )


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 token frequencies (corpus vocabulary head) with a
    deterministic count-desc/term-asc tiebreak."""
    from adaptive_pdf_extractor_spark.operators import stats

    return stats.top_terms(_docs(spark, sf_dir), "text", k=25, min_len=2)


def q_approx_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters without shuffling the vocabulary (the 100 TB twin of
    top_terms): per-partition frequent-items summaries (Misra-Gries bound,
    vectorized value_counts) -> broadcast candidate recount. Counts are
    exact; rows-only in the gate because candidate generation is
    partitioning-dependent in the tail — equality with the exact operator
    whenever the k-th count clears the N/(summary+1) bound is pinned in
    tests/test_sketch_aggregates.py."""
    from adaptive_pdf_extractor_spark.operators import stats

    return stats.approx_top_terms(
        _docs(spark, sf_dir), "text", k=25, min_len=2
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (the pre-ship scrub of every training-data
    pipeline): documents deterministically seeded with planted emails
    and phone-shaped numbers (the corpus has none of its own) must come
    back with typed placeholders and untouched prose. Fully oracled —
    patterns are Java/RE2-identical by construction."""
    d = _docs(spark, sf_dir)
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-01"),
            F.lpad(F.pmod("doc_id", F.lit(100)).cast("string"), 2, "0"),
            F.lit("-4567 today"),
        ).alias("text"),
    )
    return seeded.select(
        "doc_id", T.redact_pii(F.col("text")).alias("clean")
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (SURVEY §2 text-quality breadth):
    duplicate-line fraction over documents wrapped in a deterministic
    3-line structure (docs with doc_id % 3 == 0 carry a DUPLICATED
    second line — the corpus has no newlines of its own, the
    boilerplate_strip planting pattern), and top-bigram coverage over
    the raw text (repeated word pairs exist naturally in the synthetic
    prose). Both fully oracled."""
    from adaptive_pdf_extractor_spark.operators import stats

    d = _docs(spark, sf_dir)
    head = F.concat(F.col("text"), F.lit("\n"), F.substring("text", 1, 40))
    wrapped = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(head, F.lit("\n"), F.substring("text", 1, 40)),
        )
        .otherwise(F.concat(head, F.lit("\n"), F.substring("text", 41, 40)))
        .alias("ltext"),
    )
    lines = wrapped.select(
        "doc_id",
        T.duplicate_line_fraction(F.col("ltext")).alias("dup_line_frac"),
    )
    return lines.join(
        stats.top_bigram_coverage(d, "doc_id", "text"), "doc_id"
    )


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scores over the documents table —
    the CCNet/RefinedWeb perplexity-filtering signal (corpus-trained
    add-one-smoothed bigram LM, vocabulary capped at 500 with <unk>
    mapping). Exact integer counts into one IEEE ln per bigram and one
    avg — fully oracled at round(6)."""
    from adaptive_pdf_extractor_spark.operators import stats

    return stats.bigram_lm_scores(
        _docs(spark, sf_dir), "doc_id", "text", vocab_size=500
    )


def q_tf_idf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (docs < 100): the keyword/relevance
    leg of the text-analytics surface. Exact integer counts into one IEEE
    ln — fully oracled."""
    from adaptive_pdf_extractor_spark.operators import stats

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return stats.tf_idf_top_terms(d, "doc_id", "text", k=5, min_len=2)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal leg: deterministic FAKEMEDIA binaries (count keyed by the
    documents table) -> Arrow-batched decode + per-channel feature stats
    (operators/media.py). Rows-only: binary decode is not ANSI-SQL; the
    decode/feature math is pinned by tests/test_media.py, and real codecs
    are import-gated behind the same operator surface."""
    from adaptive_pdf_extractor_spark.operators import media

    n = min(_docs(spark, sf_dir).count(), 500)
    m = media.synthetic_media_df(spark, int(n), partitions=4)
    return media.image_features(m.filter(F.col("kind") == "image"))


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate strip over documents wrapped in a
    synthetic site template (constant NAV/FOOTER lines): the frequent lines
    must vanish, unique body lines survive verbatim. Fully oracled — the
    line-frequency voting and positional re-assembly are ANSI-expressible."""
    from adaptive_pdf_extractor_spark.operators import layout

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    src = d.select(
        "doc_id",
        F.lit("siteA").alias("source"),
        F.concat(
            F.lit("NAV BAR\n"), F.col("text"), F.lit("\nFOOTER SITEA")
        ).alias("text"),
    )
    out = layout.boilerplate_strip(src, min_doc_frac=0.6, min_docs=5)
    return out.select("doc_id", "text_clean")


# The curation composition lives in the package (plans/curation.py) next
# to its manifest-committing run wrapper; re-exported here because the
# registered queries and tests compose it with different pair stages.
from adaptive_pdf_extractor_spark.plans.curation import (  # noqa: E402
    curation_pipeline,
)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation over the planted-dup corpus with
    the EXACT pair stage — the composition verified as ONE oracled query
    (quality + md5 groupBy + recursive-CTE components in DuckDB). The pair
    stage is quadratic by design (it's the oracle); the scale twin is
    q_corpus_curation_lsh."""
    return curation_pipeline(
        _planted_dups(spark, sf_dir),
        lambda kept: dedup.ngram_jaccard_pairs(
            kept, "doc_id", "text", shingle_n=5, threshold=0.8
        ),
    )


def q_corpus_curation_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same curation composition with minhash-LSH as the pair stage,
    over the FULL documents table + planted mutations (10-50x the oracle
    query's corpus depending on sf) — no quadratic stage anywhere: banded
    buckets cut candidates before any payload join, components contract in
    O(log n) rounds. Rows-only in the driver gate (the LSH path is verified
    equal to the exact composition on the oracled corpus in
    tests/test_dedup_similarity.py, the same pattern as
    embedding_neardup_lsh)."""
    # max_bucket_size=256: the mega-cluster guard — a template flood of m
    # near-identical docs costs O(m) star candidates per oversized bucket
    # instead of O(m²) pairs (the clustering consumer only needs
    # connectivity); under the cap the pair stage is bit-identical.
    # NOTE: guard + persist_sigs eagerly materializes the signature cache
    # at plan-BUILD time (one count job — see minhash_lsh_pairs_from_sigs'
    # docstring), so merely constructing this DataFrame runs a Spark job.
    return curation_pipeline(
        _planted_dups(spark, sf_dir, n=None),
        lambda kept: dedup.minhash_lsh_pairs(
            kept, "doc_id", "text",
            shingle_n=5, num_hashes=128, bands=32, threshold=0.8,
            max_bucket_size=256,
        ).select("id_a", "id_b"),
    )


def _exact_pair_fn(kept: DataFrame) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        kept, "doc_id", "text", shingle_n=5, threshold=0.8
    )


def _incremental_batches(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(old_kept, new_batch) for the incremental gate: old = curated
    docs < 60; new = fresh docs 60..79 + near-dup mutations of docs 0..19
    (+100000, first ten chars dropped) + verbatim re-ingestions of docs
    20..29 (+200000) — so the gate exercises keep, near-dup-drop and
    exact-drop paths. Every new id sorts after every old id (the
    precondition curate_increment documents)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    old_raw = d.filter(F.col("doc_id") < 60)
    old_kept = old_raw.join(
        curation_pipeline(old_raw, _exact_pair_fn).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    new = (
        d.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
        .unionByName(
            d.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                F.expr("substring(text, 11)").alias("text"),
            )
        )
        .unionByName(
            d.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 30)).select(
                (F.col("doc_id") + 200000).alias("doc_id"), "text"
            )
        )
    )
    return old_kept, new


def q_incremental_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental batch curation (the daily 100 TB form): curate a NEW
    batch against the existing curated corpus — only new docs hash;
    pairs = new x new ∪ new x old (plans.curation.curate_increment).
    Fully oracled: the DuckDB twin curates the old corpus, unions the
    new batch, re-curates from scratch and keeps the new ids — the
    incremental path must reproduce full re-curation row-for-row.
    bench.py times it against a PRECOMPUTED old signature table to show
    cost scaling with the delta."""
    from adaptive_pdf_extractor_spark.plans.curation import curate_increment

    old_kept, new = _incremental_batches(spark, sf_dir)
    return curate_increment(new, old_kept, threshold=0.8)


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.brute_force_topk(e, "vec_id", "embedding", qvec, k=10)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 1000
    )
    return similarity.embedding_neardup_pairs(
        e, "vec_id", "embedding", threshold=0.4, n_planes=0
    )


def perturbed_embedding_copy(e: DataFrame, j: int = 1) -> DataFrame:
    """Deterministically perturbed copy of an embeddings frame: vec_id
    shifts by j*100000, each element scales by 1 + 0.002*j*(pmod(i+vec_id,
    7)-3) (in [1-0.006j, 1+0.006j] -> cosine ~0.9999 at j=1). Shared by the
    registered near-dup query and bench.py's 10x scale-up so the benched
    workload can't drift from the oracled one."""
    return e.select(
        (F.col("vec_id") + 100000 * j).alias("vec_id"),
        F.expr(
            f"cast(transform(embedding, (x, i) -> x * (1.0 + 0.002 * {j}"
            " * (pmod(i + vec_id, 7) - 3))) as array<float>)"
        ).alias("embedding"),
    )


def _planted_vec_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings unioned with deterministically perturbed copies
    (vec_id+100000, cosine ~0.9999) — planted near-duplicate vectors, the
    embedding analog of :func:`_planted_dups`."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return e.unionByName(perturbed_embedding_copy(e, 1))


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-dup (OR-amplified hyperplane tables) over planted
    near-duplicate vectors at 2x the embeddings table — the scale path for
    q_embedding_neardup's quadratic small-N oracle. Rows-only: hyperplane
    sign buckets are float-fold-order sensitive, so no ANSI oracle; the
    pairs are verified against the exact path in
    tests/test_dedup_similarity.py (subset + identical cosines + planted
    recall), and bench.py times it at 10x the exact path's N."""
    return similarity.embedding_neardup_pairs(
        _planted_vec_dups(spark, sf_dir),
        "vec_id",
        "embedding",
        threshold=0.95,
        n_planes=8,
        n_tables=4,
        max_bucket_size=256,
    )


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.nullif(
            F.regexp_extract(F.col("text"), r"\b(spark|stream|vector)\b", 1), F.lit("")
        ).alias("first_kw"),
    )


def q_adaptive_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (rows-only check: the adaptive loop is not SQL-expressible)."""
    return _flagship(spark, sf_dir)


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on planted dups (rows-only: xxhash64-based
    signatures are not reproducible in ANSI SQL)."""
    return dedup.simhash_pairs(
        _planted_dups(spark, sf_dir),
        "doc_id",
        "text",
        max_hamming=12,
        n_rotations=4,
        max_bucket_size=256,
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (fuzzy) text join over planted mutations: q-gram
    count + length filters generate candidates, exact levenshtein
    verifies (operators/dedup.fuzzy_text_pairs). The planted copies drop
    the first ten chars, so every (original, mutation) pair sits at
    distance 10 <= 16 while unrelated docs are edit-far. Oracle: the
    quadratic cross join + DuckDB levenshtein — the same
    candidate-free definition."""
    d = _planted_dups(spark, sf_dir, n=30)
    return dedup.fuzzy_text_pairs(d, "doc_id", "text", max_distance=16, q=5)


def q_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled SimHash: the engine-portable md5 variant computed per
    planted-dup doc, with EVERY 64-bit signature value DuckDB-verified
    (the oracle rebuilds each bit from the md5 hex nibbles — generated
    SQL, one source of truth for positions/weights). The xxhash64 simhash
    stays the production path (q_simhash_neardup, rows-only)."""
    d = _planted_dups(spark, sf_dir)
    return d.select("doc_id", dedup.simhash64_md5(F.col("text")).alias("sig"))


DECON_CLEAN_TEXT = " ".join(f"zzqx{i}" for i in range(20))


def _decon_eval_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-document eval set for the decontamination gate:
    a VERBATIM copy of doc 3, a PARTIAL overlap (tokens 4..33 of doc 7 —
    inside every sf's token counts), and a CLEAN synthetic doc whose
    grams appear nowhere in the corpus."""
    d = _docs(spark, sf_dir)
    ev0 = d.filter(F.col("doc_id") == 3).select(
        F.lit(0).alias("eval_id"), F.col("text")
    )
    ev1 = d.filter(F.col("doc_id") == 7).select(
        F.lit(1).alias("eval_id"),
        F.array_join(F.slice(T.tokens(F.col("text")), 4, 30), " ").alias(
            "text"
        ),
    )
    ev2 = spark.range(1).select(
        F.lit(2).alias("eval_id"), F.lit(DECON_CLEAN_TEXT).alias("text")
    )
    return ev0.unionByName(ev1).unionByName(ev2)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the operator a curation user runs right
    after dedup): flag train docs sharing 13-token n-grams with an eval
    set. The eval set plants a verbatim copy of doc 3, a partial slice of
    doc 7, and a clean doc, so the gate checks hit, partial-hit and
    no-hit paths; docs under 13 tokens exercise the zero-gram path.
    Fully oracled — gram keys are md5-hex-16 on both engines."""
    d = _docs(spark, sf_dir)
    out = dedup.decontaminate(
        d, _decon_eval_set(spark, sf_dir), "doc_id", "text", n=13, min_hits=1
    )
    return out.withColumnRenamed("id", "doc_id")


def q_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracled MinHash SIGNATURES: the engine-portable md5 variant
    (uint64 parse of md5's first 16 hex chars per shingle, SAME
    multiply-shift permutation bank and mod-2^64 wraparound as the
    xxhash64 production path), exploded to (doc_id, slot, sig) rows so
    DuckDB verifies EVERY signature value — completing the md5 trilogy
    next to simhash_md5 and winnowing_sketch_md5: the signature math the
    curation pipeline rides is itself under the driver's hash gate.
    xxhash64 stays the production path (q_minhash_neardup's pair oracle);
    the two variants' band/pair behavior is pinned equal in
    tests/test_dedup_similarity.py."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    sigs = dedup.minhash_signatures_md5_df(
        d, "doc_id", "text", shingle_n=5, num_hashes=128
    )
    return sigs.select(
        F.col("id").alias("doc_id"),
        F.posexplode("sig").alias("slot", "sig"),
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (rows-only: approximate by design;
    verified against brute force in tests/).

    NOTE (r4 nit, documented deliberately): the three single-query ANN
    entries pull their query vector with ``.first()`` — one 1-row job at
    build time by construction (vec_id == 0 is unique). The batch path
    (``knn_join``) takes a query DataFrame and never collects; converting
    these single-query forms to that shape would change only plumbing."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.lsh_topk(
        e, "vec_id", "embedding", qvec, k=10, n_planes=4, n_probes=3
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (rows-only: approximate by design;
    recall verified vs brute force in tests/)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk(
        e, "vec_id", "embedding", qvec, k=10, n_centroids=16, nprobe=4
    )


def q_ann_ivf_topk_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-probe IVF top-k (nprobe == n_centroids): every bucket is
    probed, so the IVF single-query path (centroid training, distributed
    bucket assignment, probe selection, bucket filter, top-k) must equal
    brute_force_topk row-for-row — the embedding_knn_join_ivf_full move,
    one query wide: this reuses embedding_topk's DuckDB oracle verbatim
    and puts the ANN machinery itself under the driver's hash gate. The
    pruned nprobe<n variant stays rows-only by design (approximate); its
    recall is pinned in tests."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    return similarity.ivf_topk(
        e, "vec_id", "embedding", qvec, k=10, n_centroids=16, nprobe=16
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract (round-6, VERDICT #1): every query with an
    # oracle_sql() twin comes FIRST (47 entries), rows-only entries last —
    # the driver's correctness harness grades a registry-order prefix, and
    # round 5 left five oracled queries (decontaminate, minhash_md5,
    # ann_ivf_topk_full, fuzzy_match, simhash_md5) outside its 50-entry
    # window. New oracled queries must be inserted BEFORE the rows-only
    # block (test_entry_oracle pins the partition).
    return {
        # -- oracled (each key has an oracle_sql() entry) ------------------
        "tpch_q1": q_tpch_q1,
        "tpch_q5": q_tpch_q5,
        "revenue_by_nation": q_revenue_by_nation,
        "top_orders_window": q_top_orders_window,
        "events_lag_lead": q_events_lag_lead,
        "events_tumbling": q_events_tumbling,
        "events_running_sum": q_events_running_sum,
        "events_asof_join": q_events_asof_join,
        "events_interval_join": q_events_interval_join,
        "events_sessions": q_events_sessions,
        "events_rollup": q_events_rollup,
        "events_cube": q_events_cube,
        "events_grouping_sets": q_events_grouping_sets,
        "events_range_window": q_events_range_window,
        "events_stratified_sample": q_events_stratified_sample,
        "events_percentiles": q_events_percentiles,
        "events_pivot": q_events_pivot,
        "doc_token_stats": q_doc_token_stats,
        "doc_quality": q_doc_quality,
        "bpe_token_count": q_bpe_token_count,
        "winnowing_sketch_md5": q_winnowing_sketch_md5,
        "lang_id_dist": q_lang_id_dist,
        "exact_dedup": q_exact_dedup,
        "minhash_neardup": q_minhash_neardup,
        "ngram_jaccard": q_ngram_jaccard,
        "neardup_clusters": q_neardup_clusters,
        "corpus_curation": q_corpus_curation,
        "incremental_curation": q_incremental_curation,
        "boilerplate_strip": q_boilerplate_strip,
        "corpus_delta": q_corpus_delta,
        "corpus_common": q_corpus_common,
        "hash_split": q_hash_split,
        "top_terms": q_top_terms,
        "tf_idf_terms": q_tf_idf_terms,
        "lm_quality": q_lm_quality,
        "doc_repetition": q_doc_repetition,
        "pii_redact": q_pii_redact,
        "embedding_knn_join": q_embedding_knn_join,
        "embedding_knn_join_ivf_full": q_embedding_knn_join_ivf_full,
        "embedding_topk": q_embedding_topk,
        "embedding_neardup": q_embedding_neardup,
        "regex_extract": q_regex_extract,
        "simhash_md5": q_simhash_md5,
        "minhash_md5": q_minhash_md5,
        "decontaminate": q_decontaminate,
        "fuzzy_match": q_fuzzy_match,
        "ann_ivf_topk_full": q_ann_ivf_topk_full,
        # -- rows-only (no ANSI oracle; pinned by tests instead) -----------
        "events_hll_union": q_events_hll_union,
        "events_sketch_stats": q_events_sketch_stats,
        "winnowing_sketch": q_winnowing_sketch,
        "corpus_curation_lsh": q_corpus_curation_lsh,
        "approx_top_terms": q_approx_top_terms,
        "media_features": q_media_features,
        "embedding_knn_join_ivf": q_embedding_knn_join_ivf,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "adaptive_extract": q_adaptive_extract,
        "simhash_neardup": q_simhash_neardup,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — generated from the same constants as the Spark side
# ---------------------------------------------------------------------------


def _sql_occurrences(col: str, word: str) -> str:
    # mirror functions/text.word_occurrences exactly: whitespace-normalize,
    # double interior spaces (adjacent repeats must not share delimiter
    # spaces with the non-overlapping replace-count), then pad and count
    normalized = f"regexp_replace({col}, '[{_SQL_WS}]+', ' ', 'g')"
    padded = f"(' ' || replace({normalized}, ' ', '  ') || ' ')"
    needle = f" {word} "
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{needle}', '')))"
        f" / {len(needle)} AS INT)"
    )


# The shared explicit whitespace class (functions/text.py WS_CLASS): DuckDB
# SQL string literals pass backslash escapes through to RE2 verbatim, so the
# same raw pattern text drives both engines.
_SQL_WS = T.WS_CLASS


def _sql_token_count(col: str = "text") -> str:
    return (
        f"CASE WHEN trim({col}) = '' THEN 0 "
        f"ELSE len(regexp_extract_all(trim({col}), '[^{_SQL_WS}]+')) END"
    )


def _sql_stopword_ratio(col: str = "text") -> str:
    hits = " + ".join(_sql_occurrences(col, w) for w in T.STOPWORDS_EN)
    n = _sql_token_count(col)
    return f"CASE WHEN {n} > 0 THEN round(({hits}) * 1.0 / {n}, 4) ELSE 0.0 END"


def _sql_mean_word_len(col: str = "text") -> str:
    n = _sql_token_count(col)
    chars = f"length(regexp_replace({col}, '[{_SQL_WS}]+', '', 'g'))"
    return f"CASE WHEN {n} > 0 THEN round({chars} * 1.0 / {n}, 4) ELSE 0.0 END"


def _sql_punct_ratio(col: str = "text") -> str:
    stripped = f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g'))"
    return (
        f"CASE WHEN length({col}) > 0 "
        f"THEN round({stripped} * 1.0 / length({col}), 4) ELSE 0.0 END"
    )


def _sql_quality(col: str = "text") -> str:
    length_ok = f"(length({col}) >= 50 AND length({col}) <= 20000)"
    sw_ok = f"({_sql_stopword_ratio(col)} >= 0.05)"
    mwl = _sql_mean_word_len(col)
    mwl_ok = f"({mwl} >= 2.0 AND {mwl} <= 12.0)"
    punct_ok = f"({_sql_punct_ratio(col)} <= 0.2)"
    return (
        f"round((CAST({length_ok} AS INT) + CAST({sw_ok} AS INT) + "
        f"CAST({mwl_ok} AS INT) + CAST({punct_ok} AS INT)) / 4.0, 4)"
    )


def _sql_lang_pred(col: str = "text") -> str:
    scores = {
        lang: " + ".join(_sql_occurrences(col, w) for w in words)
        for lang, words in T.LANG_MARKERS.items()
    }
    exprs = {lang: f"({e})" for lang, e in scores.items()}
    best = "greatest(" + ", ".join(exprs[lang] for lang in sorted(exprs)) + ")"
    # descending lang-code order reproduces Spark's struct-max tie-break
    chain = " ".join(
        f"WHEN {exprs[lang]} = best THEN '{lang}'"
        for lang in sorted(exprs, reverse=True)
    )
    return (
        f"(SELECT CASE WHEN best = 0 THEN 'und' {chain} END "
        f"FROM (SELECT {best} AS best))"
    )


_SQL_FINGERPRINT = (
    f"md5(lower(regexp_replace(trim(text), '[{_SQL_WS}]+', ' ', 'g')))"
)

_SQL_SHINGLES_CTE = """
base AS (SELECT doc_id, lower(text) AS t FROM {src}),
idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - 4, 1))) AS i
        FROM base),
sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s FROM idx),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
shared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
           FROM sh x JOIN sh y USING (s) WHERE x.doc_id < y.doc_id
           GROUP BY 1, 2)
"""

_SQL_JACCARD_PAIRS = (
    "WITH "
    + _SQL_SHINGLES_CTE
    + """
SELECT id_a, id_b,
       round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
"""
)

# Connected components as a recursive transitive closure: reach(id, lab)
# grows the set of (node, reachable-node) facts until fixpoint (UNION
# dedups, so it terminates); min(lab) per id = min id in the component —
# the same answer the Spark side's min-label propagation converges to.
_SQL_CLUSTERS = (
    "WITH RECURSIVE "
    + _SQL_SHINGLES_CTE
    + """,
pairs AS (
    SELECT id_a, id_b FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
),
nodes AS (SELECT doc_id AS id FROM {src}),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, lab) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.dst AS id, reach.lab FROM reach JOIN e ON e.src = reach.id
),
comp AS (SELECT id AS doc_id, min(lab) AS canonical_id FROM reach GROUP BY id)
SELECT doc_id, canonical_id,
       count(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM comp
"""
)


def _sql_curation_ctes(p: str, src: str, threshold: float = 0.8) -> str:
    """CTE chain (every name prefixed with ``p`` so the chain can appear
    TWICE in one statement) computing the curation keep-set of ``src``:
    quality gate -> exact dedup -> 5-shingle Jaccard pairs -> recursive
    transitive closure -> cluster canonicals. Terminal CTE ``{p}out``
    carries (doc_id, cluster_size, text, quality) — the same construction
    as the corpus_curation oracle, factored for reuse by the incremental
    twin."""
    return f"""
{p}scored AS (SELECT doc_id, text, {_sql_quality()} AS quality FROM ({src})),
{p}qgate AS (SELECT * FROM {p}scored WHERE quality >= 0.5),
{p}fpg AS (SELECT {_SQL_FINGERPRINT} AS fp, min(doc_id) AS keep
           FROM {p}qgate GROUP BY 1),
{p}kept AS (SELECT q.* FROM {p}qgate q JOIN {p}fpg ON q.doc_id = {p}fpg.keep),
{p}base AS (SELECT doc_id, lower(text) AS t FROM {p}kept),
{p}idx AS (SELECT doc_id, t, unnest(generate_series(
               1, greatest(length(t) - 4, 1))) AS i FROM {p}base),
{p}sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
          FROM {p}idx),
{p}sizes AS (SELECT doc_id, count(*) AS n FROM {p}sh GROUP BY doc_id),
{p}shared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS c
              FROM {p}sh x JOIN {p}sh y USING (s) WHERE x.doc_id < y.doc_id
              GROUP BY 1, 2),
{p}pairs AS (SELECT id_a, id_b FROM {p}shared
             JOIN {p}sizes sa ON sa.doc_id = id_a
             JOIN {p}sizes sb ON sb.doc_id = id_b
             WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}),
{p}e AS (SELECT id_a AS src, id_b AS dst FROM {p}pairs
         UNION ALL SELECT id_b AS src, id_a AS dst FROM {p}pairs),
{p}reach(id, lab) AS (
    SELECT doc_id, doc_id FROM {p}kept
    UNION
    SELECT {p}e.dst AS id, {p}reach.lab
    FROM {p}reach JOIN {p}e ON {p}e.src = {p}reach.id),
{p}comp AS (SELECT id AS doc_id, min(lab) AS canonical_id
            FROM {p}reach GROUP BY id),
{p}sized AS (SELECT doc_id, canonical_id,
                    count(*) OVER (PARTITION BY canonical_id)
                        AS cluster_size
             FROM {p}comp),
{p}out AS (SELECT k.doc_id, s.cluster_size, k.text, k.quality
           FROM {p}kept k
           JOIN {p}sized s ON k.doc_id = s.doc_id
                          AND s.doc_id = s.canonical_id)
"""


def _sql_incremental_curation() -> str:
    """Incremental-curation oracle BY RE-CURATION: curate the old corpus
    (docs < 60), union the new batch (fresh 60..79 + mutations of 0..19
    + re-ingestions of 20..29 — same constants as the Spark side), curate
    the union FROM SCRATCH, keep the new ids. The incremental operator
    must reproduce this exactly (see curate_increment's id-order
    argument: no mixed cluster's canonical is ever a new doc, so
    kept-new and new-only cluster sizes agree with the full graph)."""
    old_src = "SELECT doc_id, text FROM documents WHERE doc_id < 60"
    new_src = """SELECT doc_id, text FROM documents
                 WHERE doc_id >= 60 AND doc_id < 80
                 UNION ALL
                 SELECT doc_id + 100000 AS doc_id, substr(text, 11) AS text
                 FROM documents WHERE doc_id < 20
                 UNION ALL
                 SELECT doc_id + 200000 AS doc_id, text
                 FROM documents WHERE doc_id >= 20 AND doc_id < 30"""
    union_src = f"SELECT doc_id, text FROM o_out UNION ALL {new_src}"
    return (
        "WITH RECURSIVE "
        + _sql_curation_ctes("o_", f"({old_src})")
        + ","
        + _sql_curation_ctes("f_", f"({union_src})")
        + f"""
SELECT doc_id, cluster_size,
       CAST({_sql_token_count('text')} AS BIGINT) AS n_tokens,
       quality
FROM f_out WHERE doc_id >= 60
"""
    )


def _sql_decontaminate(n: int = 13) -> str:
    """Generated decontamination oracle: token n-grams of the lowercased
    text keyed by md5-hex-16 on both engines; eval set = verbatim doc 3 +
    tokens 4..33 of doc 7 + the clean literal (same constants as the
    Spark side — one source of truth)."""
    lower = (
        "translate({c}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        " 'abcdefghijklmnopqrstuvwxyz')"
    )

    def toks(c: str) -> str:
        return (
            f"regexp_extract_all(trim({lower.format(c=c)}), '[^{_SQL_WS}]+')"
        )

    def grams(src: str, keep_id: bool) -> str:
        idc = "doc_id, " if keep_id else ""
        return f"""
            SELECT DISTINCT {idc}substring(md5(array_to_string(
                       list_slice(toks, i, i + {n - 1}), ' ')), 1, 16) AS g
            FROM (SELECT {idc}toks,
                         unnest(generate_series(
                             1, greatest(len(toks) - {n - 1}, 0))) AS i
                  FROM {src})
        """

    raw_toks7 = f"regexp_extract_all(trim(text), '[^{_SQL_WS}]+')"
    return f"""
        WITH tr AS (SELECT doc_id, {toks('text')} AS toks FROM documents),
        trg AS ({grams('tr', True)}),
        ev AS (
            SELECT text FROM documents WHERE doc_id = 3
            UNION ALL
            SELECT array_to_string(list_slice({raw_toks7}, 4, 33), ' ')
            FROM documents WHERE doc_id = 7
            UNION ALL
            SELECT '{DECON_CLEAN_TEXT}'
        ),
        evt AS (SELECT {toks('text')} AS toks FROM ev),
        evg AS ({grams('evt', False)}),
        stats AS (
            SELECT doc_id, count(DISTINCT g) AS n_grams,
                   count(DISTINCT CASE WHEN g IN (SELECT g FROM evg)
                                       THEN g END) AS n_hit
            FROM trg GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               coalesce(s.n_hit, 0) AS n_hit,
               coalesce(s.n_hit, 0) >= 1 AS contaminated
        FROM documents d LEFT JOIN stats s USING (doc_id)
    """


def _sql_minhash_md5(src: str, num_hashes: int = 128) -> str:
    """Generated md5-minhash signature oracle: per distinct 5-shingle of
    the lowercased text, h = uint64 parse of md5's first 16 hex chars;
    slot i of the signature = min over shingles of (a_i*h + b_i) mod 2^64
    with the SAME (a, b) bank as the Spark side (one source of truth:
    dedup._perm_params). HUGEINT carries the arithmetic; the multiply
    splits h into 32-bit halves so no intermediate exceeds ~2^97
    (a*h alone would overflow int128). The signed BIGINT cast at the end
    is the two's-complement view Spark's long carries."""
    from adaptive_pdf_extractor_spark.operators.dedup import _perm_params

    a, b = _perm_params(num_hashes)
    params = ",\n                ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(num_hashes)
    )
    m64 = "18446744073709551616::HUGEINT"  # 2^64
    return f"""
        WITH base AS (SELECT doc_id, lower(text) AS t FROM {src}),
        idx AS (SELECT doc_id, t, unnest(generate_series(
                    1, greatest(length(t) - 4, 1))) AS i FROM base),
        sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
               FROM idx),
        hv AS (SELECT doc_id,
                      ('0x' || substring(md5(s), 1, 16))::UBIGINT::HUGEINT
                          AS h
               FROM sh),
        params(slot, pa, pb) AS (VALUES
                {params}),
        sigs AS (
            SELECT doc_id, slot,
                   min((pa * (h % 4294967296)
                        + ((pa * (h // 4294967296)) % 4294967296)
                          * 4294967296
                        + pb) % {m64}) AS sigu
            FROM hv CROSS JOIN params GROUP BY doc_id, slot)
        SELECT doc_id, slot,
               CAST(CASE WHEN sigu >= 9223372036854775808::HUGEINT
                         THEN sigu - {m64} ELSE sigu END AS BIGINT) AS sig
        FROM sigs
    """


def _sql_simhash_md5(src: str) -> str:
    """Generated 64-bit SimHash oracle: per token, bit k of the uint64
    parse of md5's first 16 hex chars lives in 1-based hex char 16 - k//4
    at nibble bit k%4; the signature sets bit k iff the tokens' +-1 sum is
    positive (2*ones > n). Bit 63's weight is the two's-complement BIGINT
    minimum — the same representation Spark's signed long carries."""
    bit_sums = ",\n                   ".join(
        "sum(((strpos('0123456789abcdef', substr(hx, "
        f"{16 - k // 4}, 1)) - 1) >> {k % 4}) & 1) AS b{k}"
        for k in range(64)
    )
    sig = " + ".join(
        f"CASE WHEN 2 * b{k} > n THEN "
        + ("(-9223372036854775807 - 1)" if k == 63 else str(1 << k))
        + " ELSE 0 END"
        for k in range(64)
    )
    return f"""
        WITH src AS ({src}),
        toks AS (SELECT doc_id, unnest(regexp_extract_all(
                     trim(text), '[^{_SQL_WS}]+')) AS t FROM src),
        h AS (SELECT doc_id, substring(md5(t), 1, 16) AS hx FROM toks),
        bits AS (SELECT doc_id, count(*) AS n,
                   {bit_sums}
                 FROM h GROUP BY doc_id),
        sigs AS (SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM bits)
        SELECT s.doc_id, coalesce(g.sig, 0) AS sig
        FROM src s LEFT JOIN sigs g ON g.doc_id = s.doc_id
    """


# Exact single-query top-k as SQL — the oracle for BOTH embedding_topk and
# the full-probe IVF twin (nprobe == n_centroids prunes nothing, so the
# IVF path must reproduce brute force row-for-row).
_SQL_EMBEDDING_TOPK = """
    SELECT vec_id AS id,
           round(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]
           ), 6) AS cosine
    FROM embeddings
    ORDER BY cosine DESC, id ASC
    LIMIT 10
"""


# Exact batch k-NN as SQL — the oracle for BOTH embedding_knn_join and the
# full-probe IVF twin (nprobe == n_centroids prunes nothing, so the bucket
# equi-join must reproduce this row-for-row).
_SQL_KNN_JOIN = """
    SELECT query_id, neighbor_id, rk, round(cos, 6) AS cosine
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(
                   c.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cos,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       c.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                       c.vec_id ASC
               ) AS rk
        FROM embeddings c
        CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id < 5) q
        WHERE c.vec_id >= 5
    ) WHERE rk <= 10
"""


def oracle_sql() -> dict[str, str]:
    planted = (
        "SELECT doc_id, text FROM documents WHERE doc_id < 100 "
        "UNION ALL "
        "SELECT doc_id + 100000 AS doc_id, substr(text, 11) AS text "
        "FROM documents WHERE doc_id < 100"
    )
    return {
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q5": """
            SELECT r_name AS region, n_name AS nation,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
            GROUP BY r_name, n_name
        """,
        "events_lag_lead": """
            SELECT event_id, user_id,
                   round(lag(value, 1) OVER w, 2) AS prev_value,
                   round(lead(value, 1) OVER w, 2) AS next_value,
                   dense_rank() OVER w AS rk,
                   ntile(4) OVER w AS quartile
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        """,
        "revenue_by_nation": """
            SELECT n_name AS nation,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "top_orders_window": """
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice, 2) AS totalprice, rk
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rk
                FROM orders
            )
            WHERE rk <= 3
        """,
        "events_running_sum": """
            SELECT user_id, event_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_value
            FROM events
        """,
        "events_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        # True ASOF JOIN on the oracle side — independently implemented
        # semantics vs the Spark union+carry-forward window
        "events_asof_join": """
            WITH r AS (SELECT user_id, ts, max(value) AS ref_value,
                              count(*) AS n_at_ts
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY 1, 2),
                 l AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT l.event_id,
                   round(r.ref_value, 2) AS prior_purchase_value,
                   r.n_at_ts AS prior_purchase_count
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "events_interval_join": """
            WITH iv AS (SELECT event_id AS interval_id, user_id,
                               ts AS w_start,
                               ts + INTERVAL 30 MINUTE AS w_end
                        FROM events WHERE event_type = 'error'),
                 ev AS (SELECT event_id, user_id, ts FROM events
                        WHERE event_type = 'click')
            SELECT ev.event_id, iv.interval_id
            FROM ev JOIN iv
              ON ev.user_id = iv.user_id
             AND ev.ts >= iv.w_start AND ev.ts < iv.w_end
        """,
        # Session semantics: a gap of EXACTLY the window closes the session
        # (Spark session windows are [start, last+gap) half-open), hence >=
        "events_sessions": """
            WITH o AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (
                                PARTITION BY user_id ORDER BY ts
                            ) >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            i AS (SELECT *, sum(brk) OVER (
                      PARTITION BY user_id ORDER BY ts
                      ROWS UNBOUNDED PRECEDING) AS sess
                  FROM o)
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(ts) + INTERVAL 30 MINUTE,
                            '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM i GROUP BY user_id, sess
        """,
        "events_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.9), 4) AS p90,
                   round(quantile_cont(value, 0.99), 4) AS p99,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        # pivot columns generated from EVENT_TYPES — the same constant the
        # Spark side uses (one source of truth)
        "events_pivot": (
            """
            SELECT strftime(date_trunc('hour', ts),
                            '%Y-%m-%d %H:%M:%S') AS hour"""
            + "".join(
                f""",
                   round(coalesce(sum(CASE WHEN event_type = '{t}'
                                           THEN value END), 0), 2) AS sum_{t}"""
                for t in EVENT_TYPES
            )
            + """
            FROM events GROUP BY 1
        """
        ),
        "events_cube": """
            SELECT coalesce(day, 'ALL') AS day,
                   coalesce(event_type, 'ALL') AS event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                         event_type, value
                  FROM events)
            GROUP BY CUBE (day, event_type)
        """,
        "events_grouping_sets": """
            SELECT coalesce(day, 'ALL') AS day,
                   coalesce(event_type, 'ALL') AS event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                         event_type, value
                  FROM events)
            GROUP BY GROUPING SETS ((day, event_type), (event_type), ())
        """,
        # floor(epoch) — the Spark side's timestamp->long cast truncates
        # to whole seconds, and RANGE membership near the exact-3600s
        # boundary differs between fractional and truncated order keys
        # (one real divergent pair exists at sf0.1)
        "events_range_window": """
            SELECT event_id, user_id,
                   round(sum(value) OVER w, 2) AS hour_value,
                   count(*) OVER w AS hour_events
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        # ':sample' salt: the sampling key must be independent of
        # hash_split's unsalted key (same constant as the Spark side)
        "events_stratified_sample": f"""
            SELECT event_id, event_type FROM events
            WHERE substring(md5(CAST(event_id AS VARCHAR) || ':sample'),
                            25, 8) <
                CASE event_type
                    WHEN 'click' THEN '{split_threshold_hex(0.2)}'
                    WHEN 'purchase' THEN '{split_threshold_hex(0.5)}'
                    WHEN 'error' THEN 'g'
                    ELSE '{split_threshold_hex(0.05)}'
                END
        """,
        "events_rollup": """
            SELECT coalesce(hour, 'ALL') AS hour,
                   coalesce(event_type, 'ALL') AS event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM (SELECT strftime(date_trunc('hour', ts),
                                  '%Y-%m-%d %H:%M:%S') AS hour,
                         event_type, value
                  FROM events)
            GROUP BY ROLLUP (hour, event_type)
        """,
        "doc_token_stats": f"""
            SELECT doc_id,
                   {_sql_token_count()} AS n_tokens,
                   {_sql_mean_word_len()} AS mean_word_len,
                   {_sql_punct_ratio()} AS punct_ratio
            FROM documents
        """,
        "bpe_token_count": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{T.BPE_TOKEN_PATTERN}'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   {_sql_stopword_ratio()} AS stopword_ratio,
                   {_sql_quality()} AS quality
            FROM documents
        """,
        "lang_id_dist": f"""
            SELECT lang_pred, count(*) AS n_docs
            FROM (SELECT {_sql_lang_pred()} AS lang_pred FROM documents)
            GROUP BY lang_pred
        """,
        # Window minima over fixed-width md5-hex gram hashes: lexicographic
        # order on fixed-length lowercase hex IS numeric order, so min()
        # agrees across engines (same trick as hash_split). Frame CURRENT
        # ROW..3 FOLLOWING truncates at the partition end, so docs with
        # fewer grams than the window yield exactly one whole-array min —
        # matching the numpy branch for len(h) <= window.
        "winnowing_sketch_md5": """
            WITH base AS (SELECT doc_id, lower(text) AS t
                          FROM documents WHERE doc_id < 50),
            idx AS (SELECT doc_id, t,
                           unnest(generate_series(
                               1, greatest(length(t) - 6, 1))) AS i
                    FROM base),
            grams AS (SELECT doc_id, i,
                             substring(md5(substr(t, CAST(i AS INT), 7)),
                                       1, 16) AS gh
                      FROM idx),
            mins AS (SELECT doc_id, i,
                            min(gh) OVER (
                                PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                            ) AS m,
                            count(*) OVER (PARTITION BY doc_id) AS n
                     FROM grams)
            SELECT DISTINCT doc_id, m AS fingerprint
            FROM mins WHERE i <= greatest(n - 3, 1)
        """,
        "exact_dedup": f"""
            SELECT {_SQL_FINGERPRINT} AS fingerprint,
                   min(doc_id) AS canonical_id,
                   count(*) AS group_size
            FROM documents
            GROUP BY 1
        """,
        "minhash_neardup": _SQL_JACCARD_PAIRS.format(
            src=f"({planted})", threshold=0.8
        ),
        "simhash_md5": _sql_simhash_md5(planted),
        "minhash_md5": _sql_minhash_md5(
            "(SELECT doc_id, text FROM documents WHERE doc_id < 40)"
        ),
        "decontaminate": _sql_decontaminate(),
        "fuzzy_match": """
            WITH src AS (
                SELECT doc_id, text FROM documents WHERE doc_id < 30
                UNION ALL
                SELECT doc_id + 100000 AS doc_id, substr(text, 11) AS text
                FROM documents WHERE doc_id < 30
            )
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   levenshtein(lower(x.text), lower(y.text)) AS distance
            FROM src x JOIN src y ON x.doc_id < y.doc_id
            WHERE levenshtein(lower(x.text), lower(y.text)) <= 16
        """,
        "ngram_jaccard": _SQL_JACCARD_PAIRS.format(
            src="(SELECT doc_id, text FROM documents WHERE doc_id < 100)",
            threshold=0.25,
        ),
        "neardup_clusters": _SQL_CLUSTERS.format(
            src=f"({planted})", threshold=0.8
        ),
        "corpus_delta": f"""
            WITH cur AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 500000 AS doc_id, text
                FROM documents WHERE doc_id < 100
            ),
            prior AS (SELECT {_SQL_FINGERPRINT} AS fp
                      FROM documents WHERE doc_id < 300)
            -- NOT EXISTS, not NOT IN: anti-join semantics under NULLs
            SELECT doc_id FROM cur
            WHERE NOT EXISTS (
                SELECT 1 FROM prior p
                WHERE p.fp = md5(lower(regexp_replace(trim(cur.text),
                                 '[{_SQL_WS}]+', ' ', 'g')))
            )
            ORDER BY doc_id
        """,
        "corpus_common": f"""
            WITH cur AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 500000 AS doc_id, text
                FROM documents WHERE doc_id < 100
            ),
            prior AS (SELECT DISTINCT {_SQL_FINGERPRINT} AS fp
                      FROM documents WHERE doc_id < 300)
            SELECT doc_id FROM cur
            WHERE EXISTS (
                SELECT 1 FROM prior p
                WHERE p.fp = md5(lower(regexp_replace(trim(cur.text),
                                 '[{_SQL_WS}]+', ' ', 'g')))
            )
            ORDER BY doc_id
        """,
        "hash_split": f"""
            SELECT split, count(*) AS n_docs FROM (
                SELECT CASE
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 25, 8)
                         < '{split_threshold_hex(0.9)}'
                        THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 25, 8)
                         < '{split_threshold_hex(0.95)}'
                        THEN 'val'
                    ELSE 'test' END AS split
                FROM documents
            ) GROUP BY split
        """,
        "tf_idf_terms": f"""
            WITH src AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            toks AS (
                SELECT doc_id,
                       translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 'abcdefghijklmnopqrstuvwxyz') AS term
                FROM (SELECT doc_id, unnest(regexp_extract_all(
                          trim(text), '[^{_SQL_WS}]+')) AS t
                      FROM src)
                WHERE length(t) >= 2
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM src),
            scored AS (
                SELECT doc_id, term,
                       tf * ln((n.n + 1.0) / (df + 1.0)) AS s,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY tf * ln((n.n + 1.0) / (df + 1.0)) DESC,
                                    term ASC
                       ) AS rk
                FROM tf JOIN dfreq USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, round(s, 6) AS score, rk
            FROM scored WHERE rk <= 5
        """,
        "pii_redact": f"""
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           text || ' contact user' ||
                           CAST(doc_id AS VARCHAR) ||
                           '@example.com or +1 555-01' ||
                           lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
                           '-4567 today',
                           '{T.PII_EMAIL_PATTERN}', '<email>', 'g'),
                       '{T.PII_PHONE_PATTERN}', '<phone>', 'g') AS clean
            FROM documents
        """,
        "doc_repetition": f"""
            WITH w AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN text || chr(10) || substr(text, 1, 40)
                                      || chr(10) || substr(text, 1, 40)
                            ELSE text || chr(10) || substr(text, 1, 40)
                                      || chr(10) || substr(text, 41, 40)
                       END AS ltext
                FROM documents),
            lines AS (SELECT doc_id, trim(l) AS tl
                      FROM (SELECT doc_id,
                                   unnest(string_split(ltext, chr(10))) AS l
                            FROM w)
                      WHERE trim(l) <> ''),
            lf AS (SELECT doc_id,
                          round(1.0 - count(DISTINCT tl) * 1.0 / count(*),
                                4) AS dup_line_frac
                   FROM lines GROUP BY doc_id),
            tk AS (SELECT doc_id,
                          unnest(generate_series(1, len(ts))) AS pos,
                          unnest(ts) AS t
                   FROM (SELECT doc_id,
                                regexp_extract_all(trim(text),
                                    '[^{_SQL_WS}]+') AS ts
                         FROM documents)),
            toks AS (SELECT doc_id, pos,
                            translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                      'abcdefghijklmnopqrstuvwxyz') AS w
                     FROM tk),
            cb AS (SELECT a.doc_id, a.w AS w1, b.w AS w2, count(*) AS c
                   FROM toks a JOIN toks b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                   GROUP BY 1, 2, 3),
            mx AS (SELECT doc_id, max(c) AS mc, sum(c) AS ns
                   FROM cb GROUP BY doc_id)
            SELECT d.doc_id, lf.dup_line_frac,
                   coalesce(round(mx.mc * 1.0 / mx.ns, 4), 0.0)
                       AS top_bigram_frac
            FROM documents d
            JOIN lf USING (doc_id)
            LEFT JOIN mx USING (doc_id)
        """,
        "lm_quality": f"""
            WITH tk AS (
                SELECT doc_id,
                       unnest(generate_series(1, len(ts))) AS pos,
                       unnest(ts) AS t
                FROM (SELECT doc_id,
                             regexp_extract_all(trim(text),
                                 '[^{_SQL_WS}]+') AS ts
                      FROM documents)
            ),
            toks AS (SELECT doc_id, pos,
                            translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                      'abcdefghijklmnopqrstuvwxyz') AS term
                     FROM tk),
            vocab AS (SELECT term FROM (
                          SELECT term, count(*) AS n FROM toks GROUP BY 1
                          ORDER BY n DESC, term ASC LIMIT 500)),
            mapped AS (SELECT doc_id, pos,
                              CASE WHEN term IN (SELECT term FROM vocab)
                                   THEN term ELSE '<unk>' END AS w
                       FROM toks),
            big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
                    FROM mapped a JOIN mapped b
                      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            cbt AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
            cut AS (SELECT w1, sum(cb) AS cu FROM cbt GROUP BY 1),
            v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vt
                  FROM mapped),
            s AS (SELECT big.doc_id, count(*) AS n_bigrams,
                         round(avg(ln((cbt.cb + 1.0) / (cut.cu + v.vt))),
                               6) AS avg_logprob
                  FROM big JOIN cbt USING (w1, w2) JOIN cut USING (w1)
                  CROSS JOIN v
                  GROUP BY big.doc_id)
            SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
                   s.avg_logprob
            FROM documents d LEFT JOIN s USING (doc_id)
        """,
        "top_terms": f"""
            SELECT term, n FROM (
                SELECT translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 'abcdefghijklmnopqrstuvwxyz') AS term,
                       count(*) AS n
                FROM (SELECT unnest(regexp_extract_all(
                          trim(text), '[^{_SQL_WS}]+')) AS t
                      FROM documents)
                WHERE length(t) >= 2
                GROUP BY 1
            ) ORDER BY n DESC, term ASC LIMIT 25
        """,
        "boilerplate_strip": """
            WITH src AS (
                SELECT doc_id, 'siteA' AS source,
                       'NAV BAR' || chr(10) || text || chr(10) || 'FOOTER SITEA'
                           AS text
                FROM documents WHERE doc_id < 200
            ),
            lines AS (
                -- cid: the operator votes by distinct CONTENT, not doc_id
                -- (exact-dup copies count once) — mirror it
                SELECT doc_id, source, md5(source || chr(0) || text) AS cid,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(generate_series(
                           1, len(string_split(text, chr(10))))) AS pos
                FROM src
            ),
            totals AS (SELECT source,
                              count(DISTINCT md5(source || chr(0) || text)) AS n
                       FROM src GROUP BY source),
            freq AS (
                SELECT l.source, l.tline AS key
                FROM (SELECT DISTINCT source, cid, trim(line) AS tline
                      FROM lines
                      WHERE length(line) <= 200 AND trim(line) <> '') l
                JOIN totals t ON t.source = l.source
                GROUP BY l.source, l.tline, t.n
                HAVING count(*) >= 5 AND count(*) * 1.0 / t.n >= 0.6
            ),
            kept AS (
                -- only vote-eligible lines may be stripped
                SELECT l.doc_id, l.pos, l.line
                FROM lines l
                LEFT JOIN freq f
                  ON f.source = l.source AND f.key = trim(l.line)
                 AND length(l.line) <= 200 AND trim(l.line) <> ''
                WHERE f.key IS NULL
            )
            SELECT s.doc_id,
                   coalesce(k.text_clean, '') AS text_clean
            FROM src s
            LEFT JOIN (
                SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS text_clean
                FROM kept GROUP BY doc_id
            ) k ON k.doc_id = s.doc_id
        """,
        "corpus_curation": (
            "WITH RECURSIVE "
            + f"""
scored AS (SELECT doc_id, text, {_sql_quality()} AS quality
           FROM ({planted})),
qgate AS (SELECT * FROM scored WHERE quality >= 0.5),
fpg AS (SELECT {_SQL_FINGERPRINT} AS fp, min(doc_id) AS keep
        FROM qgate GROUP BY 1),
kept AS (SELECT q.* FROM qgate q JOIN fpg ON q.doc_id = fpg.keep),
"""
            + _SQL_SHINGLES_CTE.format(src="kept").lstrip()
            + """,
pairs AS (
    SELECT id_a, id_b FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
),
e AS (SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, lab) AS (
    SELECT doc_id, doc_id FROM kept
    UNION
    SELECT e.dst AS id, reach.lab FROM reach JOIN e ON e.src = reach.id
),
comp AS (SELECT id AS doc_id, min(lab) AS canonical_id FROM reach GROUP BY id),
sized AS (SELECT doc_id, canonical_id,
                 count(*) OVER (PARTITION BY canonical_id) AS cluster_size
          FROM comp),
canon AS (SELECT doc_id, cluster_size FROM sized WHERE doc_id = canonical_id)
"""
            + f"""
SELECT k.doc_id, canon.cluster_size,
       CAST({_sql_token_count('k.text')} AS BIGINT) AS n_tokens,
       k.quality
FROM kept k JOIN canon ON k.doc_id = canon.doc_id
"""
        ),
        "incremental_curation": _sql_incremental_curation(),
        "embedding_knn_join": _SQL_KNN_JOIN,
        # the full-probe IVF join must equal the exact join EXACTLY (each
        # corpus vector lives in one bucket; nprobe == n_centroids probes
        # all of them) — same oracle, so the IVF path gets its own hash gate
        "embedding_knn_join_ivf_full": _SQL_KNN_JOIN,
        "embedding_topk": _SQL_EMBEDDING_TOPK,
        # full-probe IVF top-k must equal exact brute force (all 16
        # buckets probed -> nothing pruned) — same oracle, so the IVF
        # single-query path gets its own hash gate
        "ann_ivf_topk_full": _SQL_EMBEDDING_TOPK,
        "embedding_neardup": """
            SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                   round(list_cosine_similarity(
                       x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings x
            JOIN embeddings y ON x.vec_id < y.vec_id
            WHERE x.vec_id < 1000 AND y.vec_id < 1000
              AND list_cosine_similarity(
                      x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= 0.4
        """,
        "regex_extract": r"""
            SELECT doc_id,
                   nullif(regexp_extract(text, '\b(spark|stream|vector)\b', 1), '')
                       AS first_kw
            FROM documents
        """,
        # adaptive_extract, simhash_neardup, ann_lsh_topk, ann_ivf_topk,
        # winnowing_sketch, embedding_neardup_lsh, corpus_curation_lsh,
        # embedding_knn_join_ivf, media_features: intentionally no oracle
        # (iterative/approximate/hash-engine-specific/binary-decode) ->
        # rows-only; each is pinned by a dedicated exactness/recall/decode
        # test instead.
    }
