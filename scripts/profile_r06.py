#!/usr/bin/env python3
"""Round-6 stage-isolation profiler (guide §1.1/§1.4): times sub-stages of
the heavy bench queries with the noop sink so the computation is measured,
not the sink, and prints candidate volumes. NOT part of the frozen bench —
numbers land in OPTIMIZATION_r06.md.

Usage: python3 scripts/profile_r06.py [sf_dir] [which,which,...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
WHICH = sys.argv[2].split(",") if len(sys.argv) > 2 else ["emb", "minhash"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, trials=2, warm=True):
    if warm:
        fn()  # warmup (JIT/classload)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"  {label}: {best:.3f}s", flush=True)
    return best


def main():
    from pyspark.sql import functions as F

    from adaptive_pdf_extractor_spark.session import get_spark

    spark = get_spark(app_name="profile_r06", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    if "emb" in WHICH:
        profile_embedding_lsh(spark, F)
    if "minhash" in WHICH:
        profile_minhash(spark, F)
    if "decon" in WHICH:
        profile_decontaminate(spark, F)


def profile_embedding_lsh(spark, F):
    """embedding_neardup_lsh_10x decomposition (the 100.9s driver point)."""
    import __spark_entry__ as entry_mod
    from adaptive_pdf_extractor_spark.operators import similarity
    from adaptive_pdf_extractor_spark.operators.dedup import _spread

    print(f"== embedding_neardup_lsh_10x stages @ {SF_DIR}", flush=True)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    big = emb
    for j in range(1, 5):
        big = big.unionByName(entry_mod.perturbed_embedding_copy(emb, j))
    big = big.persist()
    n = big.count()
    dim = len(big.first()["embedding"])
    print(f"  vectors={n} dim={dim}", flush=True)

    base = (
        _spread(big)
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
        .withColumn("nrm", similarity._norm(F.col("vec")))
    )
    bucket_udf = similarity.lsh_table_buckets_np(
        [similarity.hyperplanes(dim, 8, 42 + 101 * t) for t in range(4)]
    )
    buck = base.select(
        "id", F.posexplode(bucket_udf(F.col("vec"))).alias("tab", "bucket")
    )
    timed("buckets (udf+posexplode)", lambda: noop(buck))
    cand = (
        buck.alias("x")
        .join(buck.alias("y"), ["tab", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    print(f"  raw candidate rows: {cand.count()}", flush=True)
    candd = cand.distinct()
    print(f"  distinct candidate pairs: {candd.count()}", flush=True)
    timed("candidates+distinct", lambda: noop(candd), trials=1, warm=False)
    full = similarity.embedding_neardup_pairs(
        big, "vec_id", "embedding", threshold=0.95, n_planes=8, n_tables=4
    )
    timed("full (verify incl.)", lambda: noop(full), trials=1, warm=False)
    print(f"  output pairs: {full.count()}", flush=True)
    big.unpersist()


def profile_minhash(spark, F):
    """minhash_lsh_full decomposition (the 42s driver point)."""
    from adaptive_pdf_extractor_spark.operators import dedup

    print(f"== minhash_lsh_full stages @ {SF_DIR}", flush=True)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"  docs={d.count()}", flush=True)

    shingled = dedup._shingled(d, "doc_id", "text", 5)
    timed("shingle only", lambda: noop(shingled))
    sigs = dedup.minhash_signatures_df(d, "doc_id", "text")
    timed("signatures", lambda: noop(sigs))

    sigs_p = sigs.persist()
    sigs_p.count()
    banded = dedup._banded(sigs_p, 32, 4)
    timed("banding (sigs cached)", lambda: noop(banded))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .count()
        .filter(F.col("count") >= 2)
        .select("id_a", "id_b")
    )
    print(f"  candidate pairs (>=2 bands): {cand.count()}", flush=True)
    timed("candidates (sigs cached)", lambda: noop(cand))
    sig_margin = 4.5 * (0.25 / 128) ** 0.5
    sa = sigs_p.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs_p.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
            )
        )
        / 128
    )
    pref = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(est >= 0.8 - sig_margin)
        .select("id_a", "id_b")
    )
    print(f"  prefiltered pairs: {pref.count()}", flush=True)
    timed("cand+prefilter (sigs cached)", lambda: noop(pref), trials=1, warm=False)
    sigs_p.unpersist()

    full = dedup.minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8)
    timed("full (verify incl.)", lambda: noop(full), trials=1, warm=False)
    print(f"  output pairs: {full.count()}", flush=True)


def profile_decontaminate(spark, F):
    import __spark_entry__ as entry_mod
    from adaptive_pdf_extractor_spark.functions.text import token_ngram_keys
    from adaptive_pdf_extractor_spark.operators.dedup import _spread

    print(f"== decontaminate stages @ {SF_DIR}", flush=True)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    grams = _spread(d).select(
        F.col("doc_id").alias("id"),
        token_ngram_keys(F.col("text"), 13).alias("grams"),
    )
    timed("train grams only", lambda: noop(grams))
    full = entry_mod.q_decontaminate(spark, SF_DIR)
    timed("full decontaminate", lambda: noop(full))


if __name__ == "__main__":
    main()
