"""Mega-cluster guard for the LSH pair stages (minhash, simhash,
embedding): a template cluster of m mutually-NEAR-identical documents
(NOT exact duplicates — exact dedup must not be the shield) must flow
through the pair stages with O(m) candidate rows per oversized bucket
instead of O(m²), while corpora whose buckets stay under the cap produce
bit-identical output to the unguarded path."""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from adaptive_pdf_extractor_spark.operators import dedup, similarity

# ~640 chars, stopword-rich (passes the curation quality gate), shared by
# every member of a planted mega-cluster; each doc appends a unique marker
# so no two docs are EXACT duplicates but every pair has jaccard ~0.94.
BASE = (
    "the quick brown fox jumps over the lazy dog and then runs down to the "
    "river where it drinks some cool water before returning to the den "
    "for a long rest in the warm afternoon sun with many other foxes "
    "that share the same quiet forest and enjoy the calm shade of old "
    "oak trees near the gentle stream that flows past mossy stones and "
    "reeds while birds sing in the branches above and small fish swim "
    "between the smooth pebbles of the river bed as the light fades and "
    "the evening settles softly over the hills and the meadow grass bends "
    "in the mild wind that carries the scent of pine across the valley"
)


def _mega_docs(spark, m: int, partitions: int = 8):
    """m near-identical documents: shared base + unique marker suffix."""
    return spark.range(0, m, 1, partitions).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(BASE + " unique marker u"),
            F.lpad(F.col("id").cast("string"), 7, "0"),
        ).alias("text"),
    )


def _mixed_docs(spark):
    """Small-cluster corpus (pairs only): base docs + one near-dup each —
    no bucket comes near any cap, so guarded == unguarded must hold
    bit-for-bit."""
    rows = []
    for i in range(30):
        t = f"document number {i:03d} " + BASE[: 400 + i]
        rows.append({"doc_id": i, "text": t})
        rows.append({"doc_id": 1000 + i, "text": t[12:]})
    return spark.createDataFrame(rows)


def test_minhash_guard_bit_compatible_under_cap(spark):
    docs = _mixed_docs(spark)
    unguarded = sorted(
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    )
    obs = Observation("cap_compat")
    guarded = sorted(
        tuple(r)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8,
            max_bucket_size=64, observation=obs,
        ).collect()
    )
    assert guarded == unguarded and len(guarded) >= 30
    got = obs.get
    assert got["star_candidate_rows"] == 0
    assert got["max_oversized_bucket"] is None


def test_minhash_guard_bounds_mega_cluster(spark):
    """m=400 near-identical docs: the unguarded path would enumerate
    ~m²/2 pairs per colliding band bucket; the guard emits star edges —
    O(m) candidates per oversized bucket — and the clustering consumer
    still sees ONE connected component covering every doc."""
    m, cap, bands = 400, 64, 32
    docs = _mega_docs(spark, m)
    obs = Observation("mega")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.8,
        bands=bands, max_bucket_size=cap, observation=obs,
    )
    clusters = dedup.neardup_clusters(
        docs.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    ).collect()
    got = obs.get
    # loud metric: the template-flood regime is visible and bounded
    assert got["max_oversized_bucket"] > cap
    assert 0 < got["star_candidate_rows"] <= bands * (m - 1)
    # connectivity preserved: one component, min id canonical
    assert {r["canonical_id"] for r in clusters} == {0}
    assert all(r["cluster_size"] == m for r in clusters)


def test_minhash_guard_star_edges_are_verified_true_pairs(spark):
    """Guard output is a SUBSET of the exact jaccard>=t pair set (star
    edges still pass signature prefilter + exact verification — the guard
    never invents a pair)."""
    m = 150
    docs = _mega_docs(spark, m)
    guarded = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, max_bucket_size=32
        ).collect()
    }
    # exact ground truth on a sample of guarded pairs: every emitted pair
    # must satisfy jaccard >= 0.8 by the brute-force definition
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8
        ).collect()
    }
    assert guarded and guarded <= exact


def test_curation_lsh_flows_5k_mega_cluster(spark):
    """The round-4 acceptance bar: 5,000 near-identical (non-exact-dup)
    docs flow through the LSH curation composition with candidate rows
    bounded by the star guard (metric-pinned), collapsing to a single
    canonical."""
    import __spark_entry__ as entry_mod

    m, cap, bands = 5000, 256, 32
    docs = _mega_docs(spark, m, partitions=16)
    obs = Observation("curation_mega")
    out = entry_mod.curation_pipeline(
        docs,
        lambda kept: dedup.minhash_lsh_pairs(
            kept, "doc_id", "text",
            shingle_n=5, num_hashes=128, bands=32, threshold=0.8,
            max_bucket_size=cap, observation=obs,
        ).select("id_a", "id_b"),
    ).collect()
    got = obs.get
    assert got["max_oversized_bucket"] > cap
    # bounded candidate generation: O(bands * m), nowhere near m²/2
    assert 0 < got["star_candidate_rows"] <= bands * (m - 1)
    # the whole flood collapses to (near-)one canonical; every kept doc is
    # accounted for in some cluster
    assert len(out) < 10
    assert sum(r["cluster_size"] for r in out) == m


def test_curation_run_manifest_persists_guard_metrics(spark, tmp_path):
    """curation_run commits the guard telemetry INTO the run manifest
    (round-5 ask): nonzero star_candidate_rows + flood_regime on a
    template flood, zero / False on a clean corpus — readable from
    manifest.json on disk, next to the committed output table."""
    import json
    import os

    from adaptive_pdf_extractor_spark.plans.curation import curation_run

    flood_dir = str(tmp_path / "flood")
    summary = curation_run(
        _mega_docs(spark, 1200, partitions=8), flood_dir, max_bucket_size=256
    )
    on_disk = json.load(open(os.path.join(flood_dir, "manifest.json")))
    assert on_disk["status"] == "complete"
    g = on_disk["summary"]["guard"]
    assert g["star_candidate_rows"] > 0
    assert g["max_oversized_bucket"] > 256
    assert g["flood_regime"] is True
    assert on_disk["summary"] == summary
    curated = spark.read.parquet(on_disk["output_path"])
    # the flood collapses: few canonicals, every input doc accounted for
    assert curated.count() < 10
    assert on_disk["summary"]["n_input"] == 1200

    clean_dir = str(tmp_path / "clean")
    s2 = curation_run(_mixed_docs(spark), clean_dir, max_bucket_size=256)
    on2 = json.load(open(os.path.join(clean_dir, "manifest.json")))
    assert on2["summary"]["guard"]["star_candidate_rows"] == 0
    assert on2["summary"]["guard"]["flood_regime"] is False
    assert on2["summary"]["guard"]["max_oversized_bucket"] is None
    assert s2["n_output"] > 0

    # guard OFF: the run must still complete and commit its manifest
    # (no Observation is ever attached -> no telemetry, not a crash)
    off_dir = str(tmp_path / "guard_off")
    s3 = curation_run(_mixed_docs(spark), off_dir, max_bucket_size=None)
    on3 = json.load(open(os.path.join(off_dir, "manifest.json")))
    assert on3["status"] == "complete"
    assert on3["summary"]["guard"]["max_bucket_size"] is None
    assert on3["summary"]["guard"]["star_candidate_rows"] == 0
    assert s3["n_output"] == s2["n_output"]


def test_simhash_guard_bit_compatible_and_bounded(spark):
    docs = _mixed_docs(spark)
    unguarded = sorted(
        tuple(r)
        for r in dedup.simhash_pairs(
            docs, "doc_id", "text", max_hamming=12, n_rotations=4
        ).collect()
    )
    guarded = sorted(
        tuple(r)
        for r in dedup.simhash_pairs(
            docs, "doc_id", "text", max_hamming=12, n_rotations=4,
            max_bucket_size=64,
        ).collect()
    )
    assert guarded == unguarded and len(guarded) >= 30
    # mega cluster: bounded star candidates, connectivity preserved
    m, cap = 300, 48
    mega = _mega_docs(spark, m)
    obs = Observation("simhash_mega")
    pairs = dedup.simhash_pairs(
        mega, "doc_id", "text", max_hamming=12, n_rotations=4,
        max_bucket_size=cap, observation=obs,
    )
    clusters = dedup.neardup_clusters(
        mega.select(F.col("doc_id").alias("id")), pairs.select("id_a", "id_b")
    ).collect()
    got = obs.get
    assert got["max_oversized_bucket"] > cap
    assert 0 < got["star_candidate_rows"] <= 4 * (m - 1)
    assert {r["canonical_id"] for r in clusters} == {0}


def test_embedding_guard_bit_compatible_and_bounded(spark):
    # small-bucket corpus: deterministic spread-out vectors + one planted
    # near-dup pair; guarded == unguarded bit-for-bit
    import math

    def vec(i: int, eps: float = 0.0):
        return [
            math.sin(0.7 * i + 0.31 * d) + eps * (1 + d % 3)
            for d in range(16)
        ]

    rows = [(i, vec(i)) for i in range(80)] + [
        (1000 + i, vec(i, eps=1e-4)) for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(threshold=0.95, n_planes=6, n_tables=3)
    unguarded = sorted(
        tuple(r)
        for r in similarity.embedding_neardup_pairs(
            docs, "vec_id", "embedding", **kw
        ).collect()
    )
    guarded = sorted(
        tuple(r)
        for r in similarity.embedding_neardup_pairs(
            docs, "vec_id", "embedding", max_bucket_size=64, **kw
        ).collect()
    )
    assert guarded == unguarded and len(guarded) >= 5
    # mega cluster: m near-identical embeddings land in one sign bucket
    # per table; the guard emits star candidates and the exact cosine
    # verify keeps them all (cosine ~1)
    m, cap = 300, 48
    mega_rows = [
        (i, [x * (1 + 1e-5 * ((i + d) % 7)) for d, x in enumerate(vec(3))])
        for i in range(m)
    ]
    mega = spark.createDataFrame(
        mega_rows, "vec_id long, embedding array<double>"
    )
    obs = Observation("embedding_mega")
    pairs = similarity.embedding_neardup_pairs(
        mega, "vec_id", "embedding", max_bucket_size=cap,
        observation=obs, **kw
    )
    clusters = dedup.neardup_clusters(
        mega.select(F.col("vec_id").alias("id")),
        pairs.select("id_a", "id_b"),
    ).collect()
    got = obs.get
    assert got["max_oversized_bucket"] > cap
    assert 0 < got["star_candidate_rows"] <= 3 * (m - 1)
    assert {r["canonical_id"] for r in clusters} == {0}


def test_minhash_guard_split_evidence_pair_survives(spark):
    """A true pair whose band collisions are SPLIT between an oversized
    bucket and a single small bucket must still be emitted: the oversized
    collision is invisible to the >=2-band count (those buckets emit star
    edges), so the cut relaxes to 1 band for pairs with an endpoint in
    any oversized bucket. Crafted signatures pin the scenario exactly;
    exact verification still gates the output on real text."""
    m, cap = 300, 256
    S = [i * 1000 + 7 for i in range(128)]  # the flood's signature
    rows = []
    # flood: identical signatures, mutually near-identical template texts
    for i in range(m):
        rows.append((1000 + i, BASE + f" flood u{i:04d}", list(S)))
    # a=1, b=2: texts near-identical to EACH OTHER, unrelated to the
    # flood; signatures share band 3 with the flood (slots 12..15) and a
    # private band 9 (slots 36..39), agree in 3 of 4 slots elsewhere (98
    # equal slots total -> passes the signature prefilter at j>=0.8)
    U = ("completely different subject matter about ships and harbors "
         "where the tide rises and the gulls wheel over the quay while "
         "fishermen mend their nets beside weathered boats and the "
         "lighthouse keeper climbs the spiral stair to trim the lamp "
         "before night settles on the cold grey water of the bay")
    siga, sigb = [], []
    for slot in range(128):
        band = slot // 4
        if band == 3:
            siga.append(S[slot]); sigb.append(S[slot])
        elif band == 9:
            siga.append(5_000_000 + slot); sigb.append(5_000_000 + slot)
        elif slot % 4 == 0:  # one differing slot per remaining band
            siga.append(6_000_000 + slot); sigb.append(7_000_000 + slot)
        else:
            siga.append(8_000_000 + slot); sigb.append(8_000_000 + slot)
    rows.append((1, U, siga))
    rows.append((2, U[10:], sigb))
    sigs_df = spark.createDataFrame(
        [(i, s) for i, _, s in rows], "id long, sig array<bigint>"
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "id long, text string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs_from_sigs(
            sigs_df, docs, "id", "text",
            threshold=0.8, max_bucket_size=cap,
        ).collect()
    }
    # the split-evidence pair survives the guard
    assert (1, 2) in pairs
    # star edges to the flood's bucket-min were candidates but exact
    # verification rejected the cross-topic ones
    assert not any({a, b} & {1, 2} and {a, b} & set(range(1000, 1000 + m))
                   for a, b in pairs)
    # the flood itself stays connected through verified star edges
    assert sum(1 for a, b in pairs if a >= 1000 and b >= 1000) >= m - 1
