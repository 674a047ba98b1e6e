"""Streaming ingestion + extraction.

The reference is batch-only; its only streaming-like trait is the cache
evolving mid-scan (SURVEY §2.9), which the round loop already recasts. This
module adds the forward-looking leg: documents arriving as a stream are
extracted with the **current converged rulebook** (frozen per micro-batch —
the broadcast is immutable within a batch, exactly like one refinement
round), with watermarked windowed metrics for late data.

Rule evolution stays in the batch round loop: streams extract, batches
learn. (Mining inside the stream would reintroduce the order-dependent
mutable cache the north_rule explicitly recasts away.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rules import RuleBook
from ..operators.extract import extract_documents
from ..sources.corpus import INPUT_DDL


def streaming_extract(stream_docs: DataFrame, rulebook: RuleBook) -> DataFrame:
    """Streaming span-table -> streaming extraction output. The fused
    operator (JVM prep + mapInPandas + JVM struct build) is stateless per
    batch, so it works identically on streaming DataFrames — one code path,
    two execution modes."""
    return extract_documents(stream_docs, rulebook)


def with_event_time(extracted: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
    return extracted.withColumn(ts_col, F.current_timestamp())


def windowed_extraction_metrics(
    extracted: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Watermarked tumbling-window metrics: docs, rule hits, unresolved
    fields per window — the streaming twin of the batch round metrics."""
    return (
        extracted.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count("*").alias("docs"),
            F.sum(
                F.size(F.filter("hits", lambda h: h["path"] == F.lit("rule")))
            ).alias("rule_hits"),
            F.sum(F.size("unresolved")).alias("unresolved_fields"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "docs",
            "rule_hits",
            "unresolved_fields",
        )
    )


def stateful_label_hit_rate(extracted: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: cumulative per-label rule hit
    rate across micro-batches via ``applyInPandasWithState``.

    State per label = (docs, rule_hits, total_fields), carried across
    batches by the state store (checkpointable, exactly-once under a real
    sink). This is the streaming twin of the batch round metrics — and the
    engine's example of the ``applyInPandasWithState`` escape hatch for
    semantics neither windows nor joins express (a monotonically growing
    per-key counter over an unbounded stream)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    flat = extracted.select(
        "label",
        F.size(F.filter("hits", lambda h: h["path"] == F.lit("rule"))).alias(
            "rule_hits"
        ),
        F.size("hits").alias("n_fields"),
    )

    output_schema = (
        "label string, docs bigint, rule_hits bigint, total_fields bigint, "
        "hit_rate double"
    )
    state_schema = "docs bigint, rule_hits bigint, total_fields bigint"

    def update(key, pdfs, state: GroupState):
        docs, hits, fields = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            docs += len(pdf)
            hits += int(pdf["rule_hits"].sum())
            fields += int(pdf["n_fields"].sum())
        state.update((docs, hits, fields))
        yield pd.DataFrame(
            [
                {
                    "label": key[0],
                    "docs": docs,
                    "rule_hits": hits,
                    "total_fields": fields,
                    "hit_rate": round(hits / fields, 6) if fields else 0.0,
                }
            ]
        )

    return flat.groupBy("label").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_expr: str | None = None,
    ts_col: str = "ingest_ts",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Watermarked streaming exact dedup: first-seen wins per content
    fingerprint (the streaming twin of operators.dedup.exact_dedup_keep).
    ``dropDuplicatesWithinWatermark`` bounds the dedup state store by event
    time — the only formulation that survives an unbounded stream; a plain
    dropDuplicates would grow state forever. Documents whose normalized
    text hashes equal within the watermark horizon emit once.

    If ``ts_col`` already exists it is used as-is (caller-supplied event
    time drives the watermark); only absent columns get a processing-time
    default."""
    from ..functions.text import doc_fingerprint_md5
    from ..operators.extract import span_text_expr

    # text assembly and content key are THE SAME definitions batch uses
    # (extract.span_text_expr; md5 like dedup.exact_dedup_groups) — batch
    # and streaming fingerprints are joinable, and the 128-bit key is
    # collision-safe on an unbounded stream where 64 bits would hit
    # birthday collisions around ~5B docs
    if text_expr is None:
        text_expr = span_text_expr()
    with_fp = docs.withColumn("_fp", doc_fingerprint_md5(F.expr(text_expr)))
    if ts_col not in docs.columns:
        with_fp = with_fp.withColumn(ts_col, F.current_timestamp())
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def file_stream_source(
    spark: SparkSession, path: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    """Span-table parquet directory as a stream (the Iceberg-shaped landing
    zone pattern: writers append files, the extractor tails them)."""
    reader = spark.readStream.schema(INPUT_DDL).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)
