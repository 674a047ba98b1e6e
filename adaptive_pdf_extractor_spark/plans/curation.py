"""Training-data curation plans: the end-to-end composition (quality gate
-> optional benchmark decontamination -> exact dedup -> near-dup pair
stage -> connected components -> canonical keep -> per-doc stats) and the
manifest-committing run wrapper that persists throughput AND mega-cluster
guard telemetry next to the run's output table.

The composition is parametric in the pair stage: the exact quadratic
generator is the DuckDB oracle twin, minhash-LSH (guarded) is the 100 TB
path — one composition, verified equal on the oracled corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import dedup
from .checkpoint import RunManifest


def curation_pipeline(
    docs: DataFrame,
    pair_fn,
    decontaminate_against: DataFrame | None = None,
    decon_n: int = 13,
) -> DataFrame:
    """The end-to-end training-data curation composition: quality gate ->
    [optional benchmark decontamination] -> exact dedup (min-id keeper
    per fingerprint) -> near-dup pair stage (``pair_fn``: kept-docs frame
    -> (id_a, id_b, ...) pairs) -> connected components -> keep cluster
    canonicals -> per-doc token stats. ONE composition, two registered
    pair stages: the exact quadratic generator (the DuckDB oracle) and
    minhash-LSH (the 100 TB path).

    ``decontaminate_against``: an eval-set frame (``text`` column) —
    quality-passing docs sharing ``decon_n``-token n-grams with it are
    dropped before dedup (broadcast membership, anti-join on flagged
    ids; see dedup.decontaminate for the plan shape)."""
    # Spread before the quality gate: the regex bank is compute-bound per
    # row and a small parquet input arrives as 1-2 splits (measured 23 s
    # on 2 cores vs 10.6 s spread for 100k docs at sf1.0 — the same
    # idle-core trap as dedup._spread, which only kicks in later, inside
    # the pair stage).
    docs = dedup._spread(docs)
    scored = docs.withColumn("quality", T.quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= 0.5)
    if decontaminate_against is not None:
        flagged = dedup.decontaminate(
            kept, decontaminate_against, "doc_id", "text", n=decon_n
        )
        kept = kept.join(
            flagged.filter(F.col("contaminated")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
    # Cache: kept feeds THREE consumers (the pair stage, the cluster id
    # set, and the final stats join) — without this the quality-score
    # regex bank and the dedup agg re-run per consumer (measured 2.6x on
    # the LSH variant at 10k docs). persist, NOT localCheckpoint: Spark's
    # CacheManager keys cache entries by canonical logical plan, so
    # repeated invocations of the same query (a) don't accumulate copies
    # (re-persisting an already-cached plan is a no-op hit on the existing
    # entry) and (b) REUSE the materialized gate across reruns — measured
    # 2x vs an eager localCheckpoint, which re-executes per invocation.
    # Entry count is bounded by distinct source frames, session-scoped.
    # At true corpus scale this is a table write (same role).
    kept = dedup.exact_dedup_keep(kept, "doc_id", "text").persist()
    pairs = pair_fn(kept)
    clusters = dedup.neardup_clusters(
        kept.select(F.col("doc_id").alias("id")), pairs
    )
    canon = clusters.filter(
        F.col("doc_id") == F.col("canonical_id")
    ).select("doc_id", "cluster_size")
    return kept.join(canon, "doc_id").select(
        "doc_id",
        "cluster_size",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        "quality",
    )


def curate_increment(
    new_docs: DataFrame,
    old_docs: DataFrame,
    *,
    old_sigs: DataFrame | None = None,
    shingle_n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    decontaminate_against: DataFrame | None = None,
    decon_n: int = 13,
    prune_verify: bool = False,
) -> DataFrame:
    """Curate a NEW document batch against an EXISTING curated corpus —
    the daily form of the 100 TB pipeline: only new docs quality-score,
    fingerprint and minhash; the old corpus contributes a fingerprint
    anti-join and its (persisted) signature table, and pairs are
    new x new ∪ new x old (dedup.minhash_lsh_pairs_incremental).

    ``old_docs`` is the already-curated corpus (pairwise non-near-dup
    canonicals — what curation_pipeline keeps). ``old_sigs`` is its
    signature table; pass the persisted one so cost scales with the
    delta (it is computed from ``old_docs`` only as a convenience
    fallback).

    Returns kept NEW docs as (doc_id, cluster_size, n_tokens, quality).
    Semantics: a new doc is kept iff full re-curation of
    (old_docs ∪ new_docs) would keep it — EXACT (pinned by test and by
    the DuckDB oracle) provided every new id sorts after every old id
    (so no mixed cluster's canonical is ever a new doc) and old_docs is
    pairwise non-near-dup at ``threshold`` (true of curation output;
    chain-merges ACROSS old canonicals keep both — the old corpus is
    immutable here, which is the point of incremental).
    cluster_size counts the NEW-only cluster, which equals the full
    graph's cluster for every KEPT doc (kept docs live in all-new
    clusters by the id-order argument)."""
    scored = new_docs.withColumn("quality", T.quality_score(F.col("text")))
    kept = scored.filter(F.col("quality") >= 0.5)
    if decontaminate_against is not None:
        flagged = dedup.decontaminate(
            kept, decontaminate_against, "doc_id", "text", n=decon_n
        )
        kept = kept.join(
            flagged.filter(F.col("contaminated")).select(
                F.col("id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
    # exact dedup WITHIN the batch, then content-identity anti-join
    # against the old corpus (a re-ingested doc must not come back)
    kept = dedup.exact_dedup_keep(kept, "doc_id", "text")
    old_fp = old_docs.select(
        T.doc_fingerprint_md5(F.col("text")).alias("fp")
    ).distinct()
    kept = (
        kept.withColumn("fp", T.doc_fingerprint_md5(F.col("text")))
        .join(old_fp, "fp", "left_anti")
        .drop("fp")
        .persist()
    )
    new_sigs = dedup.minhash_signatures_df(
        kept, "doc_id", "text", shingle_n=shingle_n, num_hashes=num_hashes
    )
    if old_sigs is None:
        old_sigs = dedup.minhash_signatures_df(
            old_docs, "doc_id", "text",
            shingle_n=shingle_n, num_hashes=num_hashes,
        )
    docs_all = kept.select("doc_id", "text").unionByName(
        old_docs.select("doc_id", "text")
    )
    pairs = dedup.minhash_lsh_pairs_incremental(
        new_sigs, old_sigs, docs_all, "doc_id", "text",
        shingle_n=shingle_n, num_hashes=num_hashes,
        bands=bands, threshold=threshold, prune_verify=prune_verify,
    )
    # classify endpoints: every pair touches >= 1 new id by construction
    new_ids = kept.select(F.col("doc_id").alias("id"))
    na = new_ids.select(F.col("id").alias("id_a"), F.lit(True).alias("_na"))
    nb = new_ids.select(F.col("id").alias("id_b"), F.lit(True).alias("_nb"))
    marked = pairs.join(na, "id_a", "left").join(nb, "id_b", "left").persist()
    pairs_nn = marked.filter(
        F.col("_na").isNotNull() & F.col("_nb").isNotNull()
    ).select("id_a", "id_b")
    # the new endpoint of each new-old pair: its whole (new-side) cluster
    # is tainted — full re-curation would fold it under the old canonical
    touched = marked.filter(
        F.col("_na").isNull() | F.col("_nb").isNull()
    ).select(
        F.when(F.col("_na").isNull(), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("doc_id")
    ).distinct()
    clusters = dedup.neardup_clusters(new_ids, pairs_nn)
    tainted = (
        clusters.join(touched, "doc_id").select("canonical_id").distinct()
    )
    keep = (
        clusters.filter(F.col("doc_id") == F.col("canonical_id"))
        .join(tainted, "canonical_id", "left_anti")
        .select("doc_id", "cluster_size")
    )
    return kept.join(keep, "doc_id").select(
        "doc_id",
        "cluster_size",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        "quality",
    )


def curation_run(
    docs: DataFrame,
    run_dir: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_bucket_size: int | None = 256,
    decontaminate_against: DataFrame | None = None,
    catalog: str = "parquet",
) -> dict:
    """Execute the guarded LSH curation composition as a COMMITTED run:
    the curated stats table lands at ``<run_dir>/curated.parquet``
    (catalog-dispatched) and the run manifest's summary persists the
    throughput metrics AND the mega-cluster guard telemetry
    (``star_candidate_rows`` / ``max_oversized_bucket``) — the
    template-flood signal, recorded next to the run it fired in instead
    of living only in a driver-side ``Observation.get``. Returns the
    summary dict.

    ``star_candidate_rows`` is 0 (and ``flood_regime`` False) on a clean
    corpus; nonzero means some band bucket blew the cap and the pair
    stage switched that bucket to O(m) star edges (still exactly
    verified — see dedup.minhash_lsh_pairs_from_sigs)."""
    from ..sources import spark_io

    # the Observation is only ever ATTACHED by the guarded pair stage —
    # with the guard off, obs.get would raise NO_OBSERVE_BEFORE_GET after
    # the output write, so skip the telemetry entirely in that case
    obs = Observation("lsh_guard") if max_bucket_size is not None else None
    out = curation_pipeline(
        docs,
        lambda kept: dedup.minhash_lsh_pairs(
            kept,
            "doc_id",
            "text",
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            observation=obs,
        ).select("id_a", "id_b"),
        decontaminate_against=decontaminate_against,
    )
    output_path = os.path.join(run_dir, "curated.parquet")
    # ONE action: the write executes the observed pair stage, so obs.get
    # is ready as soon as the table is committed
    spark_io.write_table(out, output_path, catalog=catalog)
    n_input = docs.count()
    n_output = spark_io.read_table(
        docs.sparkSession, output_path, catalog=catalog
    ).count()
    guard = obs.get if obs is not None else {}
    max_over = guard.get("max_oversized_bucket")
    summary = {
        "n_input": int(n_input),
        "n_output": int(n_output),
        "keep_rate": round(n_output / n_input, 4) if n_input else None,
        "guard": {
            "max_bucket_size": max_bucket_size,
            "star_candidate_rows": int(guard.get("star_candidate_rows") or 0),
            "max_oversized_bucket": (
                int(max_over) if max_over is not None else None
            ),
            "flood_regime": bool(guard.get("star_candidate_rows")),
        },
    }
    manifest = RunManifest(run_dir)
    manifest.finish(output_path, summary)
    return summary
