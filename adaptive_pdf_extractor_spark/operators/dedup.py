"""Deduplication operators for web-scale corpora.

Four families, each a different cost/recall point at 100 TB:

* **exact** — hash-groupBy on a content fingerprint. One shuffle on a
  64-bit key; the cheapest and always the first pass.
* **MinHash + LSH** — shingle -> minhash signature -> banded bucket join ->
  exact-Jaccard verification of candidates. Near-dup detection whose cost
  is ~O(n · bands) instead of O(n²); the scale path. All hashing is
  JVM-side ``xxhash64`` (whole-stage codegen, deterministic across runs
  and cluster sizes).
* **SimHash** — 64-bit signature whose Hamming distance approximates
  cosine similarity of token multisets; near-dup via signature-prefix
  bucketing.
* **n-gram Jaccard brute force** — the exact quadratic reference
  implementation (explode + self-join); used as the oracle for the
  approximate families and directly on small candidate sets.

Embedding-cosine near-dup lives in operators.similarity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams, doc_fingerprint_md5, tokens


def _spread(df: DataFrame) -> DataFrame:
    """Repartition small-file inputs across the cluster before the
    compute-heavy shingling/signature stages. A 100 TB corpus arrives in
    thousands of splits, but a small parquet lands as ONE partition —
    leaving every core but one idle for the whole LSH job (measured: 30x
    on the bench corpus)."""
    target = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate groups by content fingerprint: one row per distinct
    content, with the canonical (min) id and the group size.

    Plan shape: project(fingerprint) -> hash-aggregate (partial+final) —
    a single shuffle on the fingerprint, no row data moved beyond the key
    and the aggregates."""
    return (
        df.select(
            doc_fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col).alias("id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count("*").alias("group_size"),
        )
    )


def exact_dedup_keep(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative row per distinct content (min id wins —
    deterministic). Expressed as window-free groupBy + self-join so the
    dedup side is only (fingerprint, canonical_id)."""
    groups = exact_dedup_groups(df, id_col, text_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(groups, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as an array<bigint>: for seed i, min over shingles
    of xxhash64(shingle, i). Entirely JVM-side.

    NOTE: higher-order Column functions are interpreted (no codegen), so at
    num_hashes=128 this costs ~n_shingles x 128 interpreted evals per row —
    measured 9x slower than :func:`minhash_signatures_np`, which is the
    path `minhash_lsh_pairs` uses. Kept as the reference formulation."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


# Permutation bank for the numpy signature path: sig_i = min over shingles
# of (a_i * h + b_i) mod 2^64, h = the shingle's JVM xxhash64. Odd a makes
# the multiply a bijection on [0, 2^64) (multiply-shift family), so each
# (a_i, b_i) is a genuine pseudo-permutation — natural uint64 wraparound is
# the modulus. (A bounded-parameter variant that never wrapped its modulus
# turned out to be monotone in h — i.e. not a permutation at all, every
# slot won by the same global-min shingle. Caught by the planted-dup recall
# test; don't "simplify" the wraparound away.)


def _perm_params(num_hashes: int, seed: int = 1):
    """Deterministic (a odd, b) uint64 parameter vectors (splitmix64)."""
    import numpy as np

    vals = []
    state = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(2 * num_hashes):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        vals.append(z ^ (z >> 31))
    a = np.array([v | 1 for v in vals[:num_hashes]], dtype=np.uint64)
    b = np.array(vals[num_hashes:], dtype=np.uint64)
    return a, b


def minhash_signatures_np(num_hashes: int = 128):
    """Arrow-batched signature computation: per-shingle xxhash64 values in,
    signature array out — one uint64 numpy broadcast per document, ~10x
    faster than the interpreted Column-lambda formulation (measured)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    a, b = _perm_params(num_hashes)

    def sig(hashes):
        out = []
        with np.errstate(over="ignore"):
            for hs in hashes:
                if hs is None or len(hs) == 0:
                    out.append(None)
                    continue
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                vals = a[:, None] * h[None, :] + b[:, None]  # mod 2^64 implicit
                out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    # set real (non-string) annotations: `from __future__ import annotations`
    # stringifies inline hints, which pyspark's eval-type inference rejects
    sig.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    return pandas_udf("array<bigint>")(sig)


def _shingled(df: DataFrame, id_col: str, text_col: str, shingle_n: int) -> DataFrame:
    # No size(shingles) > 0 filter: char_ngrams NEVER yields an empty
    # array (short text -> its whole lowered text as the one gram; "" ->
    # [""], NULL -> [NULL]), so the filter dropped nothing — but the
    # optimizer pushed the size(<whole gram expression>) predicate below
    # every join/repartition to the parquet SCAN, re-evaluating the gram
    # regex for the full corpus on the scan's 1-2 input splits (measured
    # 4.5 s vs 0.4 s for a 4.7k-doc pruned verify pass at sf1.0).
    return _spread(df).select(
        F.col(id_col).alias("id"),
        char_ngrams(F.col(text_col), shingle_n).alias("shingles"),
    )


def _position_gram_hashes(col: Column, n: int, hash_fn) -> Column:
    """Per-position n-gram hashes of the text column: one codegen'd regex
    gram pass (functions.text.char_grams_all) + one SINGLE-LEVEL hashing
    transform. Two load-bearing properties:

    * No ``array_distinct``: min over a multiset equals min over its
      distinct set, so every MinHash signature slot is BIT-IDENTICAL with
      or without deduplication — the distinct was pure cost here.
    * No nested lambdas: this array is a pandas-UDF input, and a
      PythonUDF whose input carries nested lambda bindings silently
      skips ExtractPythonUDFs on every query after a session's first
      (see functions/text._gram_hashes).

    The round-5 form (interpreted per-position substr over a captured
    ``lower(text)``) was O(len²) per row — the signature stage measured
    39.7 s for 50k docs at sf1.0; this form measures ~1 s, signatures
    bit-identical (verified corpus-wide)."""
    from ..functions.text import char_grams_all

    return F.transform(char_grams_all(col, n), hash_fn)


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
) -> DataFrame:
    """(id, sig) minhash signature table — the per-corpus one-time cost.
    Materialize/persist this once (a parquet/Iceberg table at scale, the
    streaming state table in micro-batch mode) and feed it to
    :func:`minhash_lsh_pairs_from_sigs`; only NEW documents ever hash.
    Gram hashing is the single-level position-gram pass
    (:func:`_position_gram_hashes`) — signatures are bit-identical to the
    shingle-set formulation (min is duplication-invariant), at O(len)
    instead of O(len²) per row."""
    # no size(gh) > 0 filter: the gram array is never empty (see
    # _shingled — and the pushed-to-scan predicate re-ran the gram regex
    # for the whole corpus on the scan's 1-2 input splits)
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        _position_gram_hashes(
            F.col(text_col), shingle_n, lambda g: F.xxhash64(g)
        ).alias("gh"),
    )
    sig_udf = minhash_signatures_np(num_hashes)
    return base.select("id", sig_udf(F.col("gh")).alias("sig"))


def minhash_signatures_md5_np(num_hashes: int = 128):
    """numpy fold for the engine-portable md5 minhash: arrays of 16-char
    md5-hex shingle hashes in, signature array out via the SAME
    multiply-shift permutation bank (:func:`_perm_params`, odd ``a``,
    natural uint64 wraparound) as :func:`minhash_signatures_np` — only the
    per-shingle hash differs (md5-hex parse instead of JVM xxhash64).
    Each hex string parses to uint64 (the winnowing_md5 pattern: numpy
    can't reduce string dtypes)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    a, b = _perm_params(num_hashes)

    def sig(hashes):
        out = []
        with np.errstate(over="ignore"):
            for hs in hashes:
                if hs is None or len(hs) == 0:
                    out.append(None)
                    continue
                h = np.array([int(x, 16) for x in hs], dtype=np.uint64)
                vals = a[:, None] * h[None, :] + b[:, None]  # mod 2^64
                out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    sig.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    return pandas_udf("array<bigint>")(sig)


def minhash_signatures_md5_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
) -> DataFrame:
    """Engine-portable (id, sig) minhash signature table: per-shingle hash
    = uint64 parse of the first 16 hex chars of md5(shingle), fed through
    the SAME multiply-shift bank as the xxhash64 production path
    (:func:`minhash_signatures_df`) — so a DuckDB oracle reproduces EVERY
    signature value bit-for-bit (the minhash analog of
    ``simhash64_md5`` / ``winnowing_fingerprints_md5``, completing the
    md5 trilogy: the curation pipeline's core hash math itself sits under
    the driver's hash gate). xxhash64 stays the production fast path;
    band/pair behavior of the two variants on the same corpus is pinned
    equal in tests. Same single-level position-gram pass as
    :func:`minhash_signatures_df` (signatures are duplication-invariant
    — bit-identical to the shingle-set formulation)."""
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        _position_gram_hashes(
            F.col(text_col),
            shingle_n,
            lambda g: F.substring(F.md5(g), 1, 16),
        ).alias("gh"),
    )
    sig_udf = minhash_signatures_md5_np(num_hashes)
    return base.select("id", sig_udf(F.col("gh")).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Stages: signature (narrow) -> explode bands -> shuffle on (band, band
    hash) -> within-bucket candidate pairs -> exact Jaccard verification on
    shingle sets. With 128/32x4 the recall at j=0.8 is 1-(1-0.8^4)^32
    ≈ 1-5e-8, so verified output equals the brute-force ground truth for
    practical purposes (tests plant dups and assert exact equality).

    Scale notes: candidate pairing joins only within buckets, carrying
    bare (id, id); exact verification is a narrow JVM re-shingling of the
    docs hash-joined against the few surviving pairs (a candidate-id
    semi-join pre-prune was measured 1.6x SLOWER — it re-evaluates the
    prefilter subtree before its cache populates). Composition of
    :func:`minhash_signatures_df` + :func:`minhash_lsh_pairs_from_sigs` —
    callers holding a persisted signature table use those directly.
    """
    sigs = minhash_signatures_df(
        df, id_col, text_col, shingle_n=shingle_n, num_hashes=num_hashes
    )
    return minhash_lsh_pairs_from_sigs(
        sigs,
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
        observation=observation,
    )


def _banded(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band, bucket) banding of a signature table: bucket = xxhash64
    of the band's signature slots — ONE formulation shared by the full and
    incremental pair stages so their buckets can never diverge."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_lsh_pairs_incremental(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    prune_verify: bool = False,
) -> DataFrame:
    """Pair stage for a NEW document batch against an existing signature
    table: candidates = new x new ∪ new x old — the batch twin of the
    streaming state pattern, and the form a daily 100 TB pipeline runs.
    Banding, the >=2-band evidence cut, the signature prefilter and the
    exact-Jaccard verification are semantically IDENTICAL to
    :func:`minhash_lsh_pairs_from_sigs` restricted to pairs touching a
    new id (pinned by test), but the bucket join probes only the banded
    NEW side, so candidate-generation cost scales with the DELTA, not
    the corpus — old documents never re-hash, never re-band against each
    other, and only candidate-joined rows are ever re-shingled.

    ``docs`` must cover every id in either signature table (it feeds the
    re-shingle verification — ONE linear narrow pass, evaluated once; see
    below). Per-batch cost: candidate generation probes only the banded
    NEW side (delta x bucket-density pairs), plus one linear narrow pass
    over the old corpus for banding and verification — no quadratic
    term, and crucially the EXPENSIVE per-doc work (the 128-hash
    signatures) runs for new docs only. No ``max_bucket_size`` guard
    here: an old-side flood bucket of size m costs O(|new ∩ bucket| x m)
    candidates — already delta-scaled; a flood INSIDE one batch is the
    full pair stage's regime.

    ``prune_verify``: semi-join the verification docs down to the
    candidate ids before shingling. The candidate set must materialize
    first (persist + one eager count job at plan-build), so the default
    stays lazy/single-action — right for bench-scale corpora; enable it
    when the old corpus is large relative to the delta (the daily
    production regime: measured 16.6s -> ~9s at 50k old docs x 500
    delta, and the gap grows with the corpus since the un-pruned verify
    shingles every old doc)."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"
    nsig = new_sigs.select("id", "sig").persist()
    osig = old_sigs.select("id", "sig")
    banded_new = _banded(nsig, bands, rows_per_band)
    banded_all = banded_new.unionByName(_banded(osig, bands, rows_per_band))
    # normalize (least, greatest) then DISTINCT per (pair, band): each id
    # holds one bucket per band, so distinct band rows == colliding-band
    # count (a new-new pair arrives twice from the asymmetric join —
    # once per orientation — and must not double its evidence)
    min_bands = 2 if bands >= 8 else 1
    cand = (
        banded_new.alias("x")
        .join(banded_all.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") != F.col("y.id"))
        .select(
            F.least("x.id", "y.id").alias("id_a"),
            F.greatest("x.id", "y.id").alias("id_b"),
            "band",
        )
        .distinct()
        .groupBy("id_a", "id_b")
        .count()
        .filter(F.col("count") >= min_bands)
        .select("id_a", "id_b")
    )
    # signature prefilter + exact verification: same two-stage shape (and
    # the same margin constant) as the full pair stage
    sig_margin = 4.5 * (0.25 / num_hashes) ** 0.5
    sigs_all = nsig.unionByName(osig)
    sa = sigs_all.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs_all.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
            )
        )
        / num_hashes
    )
    prefiltered = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(est >= threshold - sig_margin)
        .select("id_a", "id_b")
    )
    # Exact verification with ONE evaluation of the shingled corpus: the
    # full stage's two-sided (a ⋈ b) form embeds the shingle subtree
    # TWICE in the plan (computed twice per action — measured as the
    # whole verify stage doubling); here pairs explode to one row per
    # endpoint, join the shingled docs once, and regroup. The shuffle
    # carries candidate-scaled shingle arrays only; intersect/union are
    # symmetric, so the jaccard is identical to the two-sided form.
    verify_docs = docs
    if prune_verify:
        prefiltered = prefiltered.persist()
        prefiltered.count()  # candidate ids must exist before the prune
        cand_ids = prefiltered.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).distinct()
        # unconditional full-width repartition: AQE coalesces the tiny
        # semi-join output to ~1 partition and the interpreted shingle
        # projection is compute-bound per row (measured 3.7s single-core
        # vs 0.5s spread for 210 docs)
        verify_docs = docs.join(cand_ids, id_col, "left_semi").repartition(
            max(docs.sparkSession.sparkContext.defaultParallelism, 8)
        )
    cbase = _shingled(verify_docs, id_col, text_col, shingle_n)
    sides = prefiltered.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    gathered = (
        sides.join(cbase, "id")
        .groupBy("id_a", "id_b")
        .agg(F.collect_list("shingles").alias("sh"))
        .filter(F.size("sh") == 2)  # endpoint missing from docs -> no pair
    )
    jac = F.size(
        F.array_intersect(F.element_at("sh", 1), F.element_at("sh", 2))
    ) / F.size(F.array_union(F.element_at("sh", 1), F.element_at("sh", 2)))
    return (
        gathered.filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_lsh_pairs_from_sigs(
    sigs_df: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    persist_sigs: bool = True,
    max_bucket_size: int | None = None,
    observation=None,
    prune_verify: bool | None = None,
) -> DataFrame:
    """LSH pair stage over a PRECOMPUTED signature table ``sigs_df``
    (columns ``id``, ``sig``): banding, the >=2-band cut, and the
    signature prefilter never touch text; ``docs`` is re-shingled (narrow
    JVM projection) only for the exact-Jaccard check, hash-joined against
    the few surviving pairs. The incremental / streaming path: signatures
    persist, only new docs ever hash.

    ``prune_verify`` (default: follow ``persist_sigs``): semi-join the
    verification docs down to candidate endpoint ids before the shingle
    projection. Shingling is the dominant per-doc cost (measured 38.9 s
    for 50k docs at sf1.0 — interpreted per-position substr +
    array_distinct), and candidates are usually a tiny fraction of the
    corpus (2,544 pairs of 50k docs there), so the un-pruned verify paid
    a full second corpus shingling for rows the join immediately
    dropped. The prune requires the candidate set to exist first
    (persist + one eager count at plan build — the same fan-out-race
    rationale as the guarded signature cache below); streaming callers
    pass ``persist_sigs=False`` and keep the fully lazy single-action
    plan, managing caching themselves.

    ``persist_sigs=False`` for callers that manage the signature frame's
    caching themselves (the streaming loop persists per micro-batch and
    must unpersist after — an internal persist here would strand one
    CacheManager entry per batch, since each batch's plan is distinct).

    **Mega-cluster guard** (``max_bucket_size``): a template cluster of m
    near-identical documents (exact dedup does NOT catch near-identical)
    lands all m in the same band buckets, and the within-bucket self-join
    emits O(m²) candidate pairs — at web scale m can be 10⁶⁺, the one
    quadratic regime of the banded formulation. With ``max_bucket_size``
    set, buckets larger than the cap switch from all-pairs to STAR edges
    (bucket-min id -> member): O(m) candidates per oversized bucket,
    connectivity-preserving for the clustering consumer. Star edges
    bypass the >=2-band evidence cut (an oversized full-band collision is
    already overwhelming evidence) but still pass the signature prefilter
    and the exact-Jaccard verification, so the guard never ADDS a false
    pair — it can only omit non-spanning-tree pairs BETWEEN members of
    oversized buckets (callers consuming raw pairs per-pair, not as a
    graph, should size the cap above their largest expected true
    cluster). Pairs whose band evidence is SPLIT between small and
    oversized buckets are not lost: the >=min_bands cut relaxes to one
    band for pairs with BOTH endpoints in oversized buckets (co-occupying
    one is what makes collisions invisible to the count, and it implies
    both ids are flood members), and exact verification still gates the
    output. With no oversized bucket the
    guarded path's output is identical to the unguarded path's.

    Pass a ``pyspark.sql.Observation`` as ``observation`` for the loud
    metric: ``star_candidate_rows`` (0 when no bucket was oversized) and
    ``max_oversized_bucket`` arrive at ``observation.get`` after the
    query's first action — the production signal that a corpus is in the
    template-flood regime.

    NOTE: with BOTH ``max_bucket_size`` and ``persist_sigs`` set, this
    function EAGERLY materializes the signature cache (one count job at
    plan-build time): the guarded plan fans the signature subtree out to
    five consumers and Spark runs independent stages concurrently, so a
    lazily-filled cache gets recomputed per branch (measured 4x
    end-to-end). Callers needing a fully lazy plan should pass
    ``persist_sigs=False`` and manage caching themselves."""
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"

    # Signatures feed three join branches (banding + both prefilter
    # sides); persisting the compact sig table (~1 KB/doc) avoids
    # recomputing its subtree per branch.
    sigs = sigs_df.select("id", "sig")
    if persist_sigs:
        sigs = sigs.persist()
        if max_bucket_size is not None:
            # The guarded path fans the signature subtree out to MORE
            # consumers (three bucket-sizing branches + both prefilter
            # sides), and INDEPENDENT stages of one job run concurrently —
            # so an unfilled cache gets recomputed per branch (measured 4x
            # end-to-end at 10k docs). Fill it eagerly once; the count is
            # CacheManager-keyed by plan, so repeated invocations of the
            # same query pay it only while cold.
            sigs.count()
    banded = _banded(sigs, bands, rows_per_band)

    # Candidates must collide in >= 2 bands (when bands allow): a true
    # j>=0.8 pair collides in E[bands x j^rows] ~ 13 of 32 bands
    # (P(<2) ~ 5e-6), while the homogeneous-corpus noise floor (j ~ 0.2,
    # P(collision) = j^rows per band) almost never collides twice. This
    # count-based cut happens BEFORE any data is joined to the pairs, so
    # the million-candidate shuffle carries only (id, id) + a count.
    min_bands = 2 if bands >= 8 else 1
    if max_bucket_size is None:
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), ["band", "bucket"])
            .filter(F.col("x.id") < F.col("y.id"))
            .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .count()
            .filter(F.col("count") >= min_bands)
            .select("id_a", "id_b")
        )
    else:
        from pyspark.sql.window import Window

        # one shuffle on (band, bucket) annotates every banded row with
        # its bucket's size and min id; buckets under the cap take the
        # exact all-pairs path, oversized ones emit O(m) star edges
        wb = Window.partitionBy("band", "bucket")
        sized = banded.withColumn("_bsz", F.count("*").over(wb)).withColumn(
            "_bmin", F.min("id").over(wb)
        )
        small = sized.filter(F.col("_bsz") <= max_bucket_size).select(
            "id", "band", "bucket"
        )
        small_counted = (
            small.alias("x")
            .join(small.alias("y"), ["band", "bucket"])
            .filter(F.col("x.id") < F.col("y.id"))
            .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .count()
        )
        # Evidence dilution: a true pair's band collisions inside
        # OVERSIZED buckets are invisible to this count (those buckets
        # emit star edges, not pairs), so a pair with one small-bucket
        # collision plus flood-bucket co-membership would miss the
        # >=min_bands cut that the unguarded path would have passed.
        # Relax the cut to 1 band for co-flood pairs — BOTH endpoints in
        # some oversized bucket: a hidden collision means the pair
        # CO-OCCUPIED an oversized bucket, which puts both ids in
        # big_ids, so every pair whose evidence the guard could have
        # diluted is covered; the signature prefilter + exact verify
        # still reject every false positive, and the relaxation is empty
        # (bit-identical path) when no bucket is oversized.
        big_ids = (
            sized.filter(F.col("_bsz") > max_bucket_size)
            .select("id")
            .distinct()
        )
        # ONE pass over small_counted (it holds the expensive self-join +
        # groupBy — consuming it per-branch re-executed that subtree and
        # measured 2x on the curation bench): two left joins attach
        # endpoint-in-oversized-bucket flags, one filter applies the
        # possibly-relaxed cut. BOTH flags must be set: a hidden collision
        # means the pair CO-OCCUPIED an oversized bucket, which puts both
        # endpoints in big_ids — requiring only one would keep every
        # 1-band noise pair that merely touches a flood member, exactly
        # the volume the min_bands cut exists to drop.
        bia = big_ids.select(F.col("id").alias("id_a"), F.lit(True).alias("_ba"))
        bib = big_ids.select(F.col("id").alias("id_b"), F.lit(True).alias("_bb"))
        small_pairs = (
            small_counted.join(bia, "id_a", "left")
            .join(bib, "id_b", "left")
            .filter(
                (F.col("count") >= min_bands)
                | (F.col("_ba").isNotNull() & F.col("_bb").isNotNull())
            )
            .select("id_a", "id_b")
        )
        big = sized.filter(
            (F.col("_bsz") > max_bucket_size) & (F.col("id") != F.col("_bmin"))
        ).select(
            F.col("_bmin").alias("id_a"), F.col("id").alias("id_b"), "_bsz"
        )
        if observation is not None:
            big = big.observe(
                observation,
                F.count("*").alias("star_candidate_rows"),
                F.max("_bsz").alias("max_oversized_bucket"),
            )
        # distinct over the union: the same pair can arise as a small-
        # bucket pair in one band and a star edge in another — verifying
        # it twice would emit duplicate output rows
        cand = small_pairs.unionByName(big.drop("_bsz")).distinct()

    # Two-stage verification. On homogeneous corpora (web text hovers
    # around j~0.2 pairwise) band collisions produce ~P(j^rows) x n^2
    # candidates — verifying each with array_intersect over hundreds of
    # shingles dominated the job (measured ~80% of wall time). Stage 1
    # estimates jaccard from signature agreement (num_hashes int equality
    # ops, E[est]=j, sigma=sqrt(j(1-j)/num_hashes)); only candidates within
    # 4+ sigma of the threshold proceed to exact verification.
    sig_margin = 4.5 * (0.25 / num_hashes) ** 0.5  # sigma at j=0.5 (max)
    sa = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
            )
        )
        / num_hashes
    )
    prefiltered = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(est >= threshold - sig_margin)
        .select("id_a", "id_b")
    )

    # Exact verification: ONE evaluation of the shingled docs, pruned to
    # candidate endpoints when the candidate set is materialized. (Two
    # earlier formulations both lose: a LAZY semi-join pre-prune of docs
    # by candidate ids re-evaluates the banding/prefilter subtree before
    # its cache populates — measured 1.6x slower end-to-end, which is
    # why the prune below materializes the pairs eagerly first; and the
    # two-sided a ⋈ b join embeds the shingle subtree TWICE in the plan,
    # computing it twice per action — measured ~10% of the warm stage
    # and 3x of the cold one at 5k docs. Exploding each pair to one row
    # per endpoint joins the shingled docs ONCE and regroups; the
    # regroup shuffle carries candidate-scaled shingle arrays only, and
    # intersect/union are symmetric so the jaccard is unchanged.)
    verify_docs = docs
    if prune_verify is None:
        prune_verify = persist_sigs
    if prune_verify:
        prefiltered = prefiltered.persist()
        prefiltered.count()  # candidate ids must exist before the prune
        cand_ids = prefiltered.select(
            F.explode(F.array("id_a", "id_b")).alias(id_col)
        ).distinct()
        # unconditional full-width repartition: AQE coalesces the tiny
        # semi-join output to ~1 partition and the interpreted shingle
        # projection is compute-bound per row (the incremental path's
        # measured 3.7s-single-core-vs-0.5s-spread trap)
        verify_docs = docs.join(cand_ids, id_col, "left_semi").repartition(
            max(docs.sparkSession.sparkContext.defaultParallelism, 8)
        )
    cbase = _shingled(verify_docs, id_col, text_col, shingle_n)
    sides = prefiltered.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    gathered = (
        sides.join(cbase, "id")
        .groupBy("id_a", "id_b")
        .agg(F.collect_list("shingles").alias("sh"))
        .filter(F.size("sh") == 2)  # endpoint missing from docs -> no pair
    )
    jac = F.size(
        F.array_intersect(F.element_at("sh", 1), F.element_at("sh", 2))
    ) / F.size(F.array_union(F.element_at("sh", 1), F.element_at("sh", 2)))
    return (
        gathered.filter(jac >= threshold)  # exact check on the surviving few
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    eval_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing token
    ``n``-grams with an evaluation set (the standard 13-gram membership
    test — a real curation pipeline runs this right after dedup).

    Returns one row per train document: ``(id, n_grams, n_hit,
    contaminated)`` — distinct n-gram count, how many of those grams
    appear anywhere in the eval set, and the ``n_hit >= min_hits`` flag.

    Plan shape (the 100 TB path): the EVAL side is the small side by
    construction (an eval suite, not a corpus) — its distinct gram keys
    broadcast; the train side streams once through a narrow gram
    projection + explode, the broadcast hash join marks matches, and the
    single shuffle is the per-doc groupBy carrying (id, n_grams, 0/1).
    No text ever shuffles, and the corpus is never joined to itself.
    Gram keys are md5-hex-16 (engine-portable — the DuckDB oracle
    reproduces every key; at extreme eval sizes a Bloom filter over the
    same keys would trade the exact broadcast set for a documented FPR,
    but exact membership is the right default at eval-suite scale)."""
    from ..functions.text import token_ngram_keys

    eval_text = eval_text_col or text_col
    eval_keys = (
        eval_df.select(
            F.explode(token_ngram_keys(F.col(eval_text), n)).alias("gram")
        )
        .distinct()
        .withColumn("_m", F.lit(True))
    )
    grams = _spread(train).select(
        F.col(id_col).alias("id"),
        token_ngram_keys(F.col(text_col), n).alias("grams"),
    )
    # explode_outer keeps zero-gram (short) docs in the output with
    # n_grams = n_hit = 0; null grams can't match the broadcast side
    exploded = grams.select(
        "id", F.size("grams").alias("n_grams"), F.explode_outer("grams").alias("gram")
    )
    return (
        exploded.join(F.broadcast(eval_keys), "gram", "left")
        .groupBy("id", "n_grams")
        .agg(
            F.sum(F.when(F.col("_m"), 1).otherwise(0))
            .cast("long")
            .alias("n_hit")
        )
        .select(
            "id",
            F.greatest("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            "n_hit",
            (F.col("n_hit") >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_keys(
    eval_df: DataFrame, text_col: str = "text", n: int = 13
) -> list[str]:
    """Driver-side distinct gram keys of an eval set (bounded by
    construction — it's an eval suite, not a corpus): the closure /
    ``sc.broadcast`` form the STATELESS streaming filter needs
    (streaming.ingest.streaming_decontaminate), computed by the SAME
    ``token_ngram_keys`` definition the batch operator joins on — the
    two paths can never disagree on what a gram is."""
    from ..functions.text import token_ngram_keys

    rows = (
        eval_df.select(
            F.explode(token_ngram_keys(F.col(text_col), n)).alias("g")
        )
        .distinct()
        .collect()
    )
    return [r["g"] for r in rows]


def build_gram_bloom(keys, fpr: float = 1e-3):
    """Deterministic Bloom filter over md5-hex-16 gram keys — the
    extreme-eval-scale membership tier for decontamination: at ~10 bits
    per key (fpr 1e-3) a 100M-gram eval union broadcasts as ~120 MB of
    bits where the exact key set would be ~1.6 GB of strings. Standard
    sizing (m = -n ln fpr / ln²2, k = m/n ln 2) with Kirsch-Mitzenmacher
    double hashing over the key's uint64 value (h2 splitmix-mixed, forced
    odd; i*h2 wraps mod 2^64 by definition). Returns ``(bits: bytes,
    n_hashes, n_bits)``. NO false negatives ever; false positives inflate
    a doc's hit count at ~P(1-(1-fpr)^n_grams) — callers trading the
    exact set for this accept that a clean doc may be dropped at that
    rate (never the reverse)."""
    import math

    import numpy as np

    n = max(len(keys), 1)
    m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, int(round(m / n * math.log(2))))
    bits = np.zeros(m // 8, dtype=np.uint8)
    if keys:
        kv = np.array([int(x, 16) for x in keys], dtype=np.uint64)
        h1, h2 = _bloom_h1_h2(np, kv)
        with np.errstate(over="ignore"):
            for i in range(k):
                pos = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(
                    np.int64
                )
                np.bitwise_or.at(
                    bits, pos // 8, (1 << (pos % 8)).astype(np.uint8)
                )
    return bits.tobytes(), k, m


def _bloom_h1_h2(np, kv):
    """Double-hashing pair for a uint64 key array: h1 = the key itself
    (md5-derived, already uniform), h2 = splitmix64 mix forced odd (odd
    stride visits all of Z_m for power-free m often enough; the textbook
    construction)."""
    with np.errstate(over="ignore"):
        z = kv + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    return kv, h2


def bloom_contains(np, bits, k: int, m: int, kv):
    """Vectorized membership test: uint64 key array in, bool array out."""
    arr = np.frombuffer(bits, dtype=np.uint8)
    h1, h2 = _bloom_h1_h2(np, kv)
    out = np.ones(len(kv), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)
            out &= (arr[pos // 8] >> (pos % 8).astype(np.uint8)) & 1 == 1
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_fold_udf(decode):
    """Shared Arrow-batched sign-sum fold for both simhash variants:
    ``decode(np, tokens) -> uint64 ndarray`` supplies the per-token hash
    values (JVM xxhash64 longs or md5-hex parses); the bit unpack, +-1
    contribution sum, and signed 64-bit wrap are ONE implementation so the
    production and oracled paths can never silently diverge. Null / empty
    token arrays fold to signature 0 (the Column spec's when(null > 0)
    otherwise-branch behavior — pinned by test)."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    shifts = np.arange(64, dtype=np.uint64)
    weights = np.left_shift(np.uint64(1), shifts)

    def sim(hashes):
        out = []
        for hs in hashes:
            if hs is None or len(hs) == 0:
                out.append(0)
                continue
            h = decode(np, hs)
            n = len(h)
            bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
            contrib = 2 * bits.sum(axis=0, dtype=np.int64) - n
            sigu = int(weights[contrib > 0].sum(dtype=np.uint64))
            out.append(sigu - (1 << 64) if sigu >= (1 << 63) else sigu)
        return pd.Series(out)

    sim.__annotations__ = {"hashes": pd.Series, "return": pd.Series}
    return pandas_udf("bigint")(sim)


def simhash64_np():
    """Arrow-batched SimHash: per-token JVM xxhash64 values in (one
    interpreted ``transform`` pass, same as the minhash path), 64-bit
    signature out via one numpy unpack/sign-sum per document
    (:func:`_simhash_fold_udf`). Replaces the Column-algebra formulation
    below, whose 64 interpreted ``F.aggregate`` folds cost ~64 x n_tokens
    lambda evals per row (the interpreted-lambda anti-pattern already
    fixed for minhash — see minhash_signatures_np). Output is
    bit-identical to :func:`simhash64_columns` (pinned by test)."""
    return _simhash_fold_udf(
        lambda np, hs: np.asarray(hs, dtype=np.int64).astype(np.uint64)
    )


def simhash64_md5_np():
    """numpy fold for the engine-portable simhash variant: 16-char md5-hex
    token hashes in (bits 63..60 in the first hex char — ``int(hx, 16)``
    order), signed 64-bit signature out via the SAME sign-sum fold as
    :func:`simhash64_np` (:func:`_simhash_fold_udf`). Hex parses to uint64
    per token (the winnowing_md5 pattern: numpy can't reduce string
    dtypes)."""
    return _simhash_fold_udf(
        lambda np, hs: np.array([int(x, 16) for x in hs], dtype=np.uint64)
    )


def simhash64_md5(text_col: Column) -> Column:
    """Engine-portable SimHash: token hash = first 16 hex chars of
    md5(token) parsed as uint64, so a DuckDB oracle reproduces EVERY
    signature bit-for-bit (the simhash analog of
    functions.text.winnowing_fingerprints_md5; :func:`simhash64` with
    xxhash64 stays the production fast path). JVM md5 per token; one
    numpy parse + sign-sum per document."""
    hexes = F.transform(
        tokens(text_col), lambda t: F.substring(F.md5(t), 1, 16)
    )
    return simhash64_md5_np()(hexes)


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash over whitespace tokens: bit k of the signature = sign
    of sum over tokens of bit k (+-1) of the token's xxhash64. JVM hashes
    each token once; the 64-bit fold runs as numpy (simhash64_np)."""
    hashes = F.transform(tokens(text_col), lambda t: F.xxhash64(t))
    return simhash64_np()(hashes)


def simhash64_columns(text_col: Column) -> Column:
    """Reference formulation of :func:`simhash64`, entirely as Column
    algebra. Interpreted (not codegen'd): 64 ``F.aggregate`` folds per row.
    Kept as the executable spec the fast path is pinned against — do not
    use in the hot path."""
    toks = tokens(text_col)
    bit_cols = []
    for k in range(64):
        contrib = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        # shiftleft handles bit 63 (two's-complement negative); OR-fold the
        # disjoint bits — addition would overflow under ANSI mode
        bit_cols.append(
            F.when(
                contrib > 0, F.shiftleft(F.lit(1).cast("long"), k)
            ).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    n_rotations: int = 1,
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed by the top
    ``prefix_bits`` of the signature to avoid the full cross join.

    A single prefix misses pairs whose differing bits fall inside it;
    ``n_rotations > 1`` re-buckets on rotated signatures (rotation r shifts
    by r*64//n_rotations bits) so a pair is a candidate if ANY rotation
    agrees on its prefix — the OR-amplification that takes recall at
    hamming <= h from one prefix's (64-prefix_bits choose h)/(64 choose h)
    toward 1 while cost stays ~n_rotations buckets per row. Pairs dedupe as
    bare ids before the (verified, exact) hamming filter.

    ``max_bucket_size`` is the mega-cluster guard (same contract as
    ``minhash_lsh_pairs_from_sigs``): a prefix bucket larger than the cap
    emits star edges (bucket-min -> member, still exact-hamming-verified)
    instead of O(m²) all-pairs; ``observation`` receives
    ``star_candidate_rows`` / ``max_oversized_bucket``."""
    sigs = _spread(df).select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig")
    )
    step = 64 // max(1, n_rotations)
    rot_buckets = []
    for r in range(n_rotations):
        k = r * step
        # Java shift amounts are mod 64: rotate-by-0 must bypass the
        # `x >>> 64` formulation (which is a no-op shift, not zero)
        rotated = (
            F.col("sig")
            if k == 0
            else F.shiftleft("sig", k).bitwiseOR(
                F.shiftrightunsigned("sig", 64 - k)
            )
        )
        rot_buckets.append(
            F.struct(
                F.lit(r).alias("rot"),
                F.shiftrightunsigned(rotated, 64 - prefix_bits).alias("bucket"),
            )
        )
    buck = sigs.select(
        "id", "sig", F.explode(F.array(*rot_buckets)).alias("rb")
    ).select("id", "sig", "rb.rot", "rb.bucket")
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        wb = Window.partitionBy("rot", "bucket")
        # struct-min carries the bucket-min's SIGNATURE atomically with
        # its id (struct ordering compares id first), so star edges can
        # compute their exact hamming without a join back to sigs
        sized = buck.withColumn("_bsz", F.count("*").over(wb)).withColumn(
            "_bmin", F.min(F.struct("id", "sig")).over(wb)
        )
        small = sized.filter(F.col("_bsz") <= max_bucket_size).select(
            "id", "sig", "rot", "bucket"
        )
        big = sized.filter(
            (F.col("_bsz") > max_bucket_size)
            & (F.col("id") != F.col("_bmin.id"))
        ).select(
            F.col("_bmin.id").alias("id_a"),
            F.col("id").alias("id_b"),
            F.bit_count(
                F.col("_bmin.sig").bitwiseXOR(F.col("sig"))
            ).alias("hamming"),
            "_bsz",
        )
        if observation is not None:
            big = big.observe(
                observation,
                F.count("*").alias("star_candidate_rows"),
                F.max("_bsz").alias("max_oversized_bucket"),
            )
        star = (
            big.drop("_bsz")
            .filter(F.col("hamming") <= max_hamming)
        )
    else:
        small, star = buck, None
    x, y = small.alias("x"), small.alias("y")
    hamming = F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig")))
    pairs = (
        x.join(y, ["rot", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


# ---------------------------------------------------------------------------
# near-dup clustering (connected components over the pair graph)
# ---------------------------------------------------------------------------


def _star_edges(pairs: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Contract a pair graph to stars around each component's minimum id
    via alternating large-star/small-star rounds (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm). Returns the fixpoint edge set ``(u, v)`` with ``u`` = the
    component minimum and one row per non-center node ``v``.

    Round count is O(log n) INDEPENDENT of component diameter — the
    property min-label propagation lacks (a length-d chain costs d
    propagation rounds but only ~log d contraction rounds). Each round is
    two edge-list shuffles (groupBy u / groupBy v) + a distinct; nothing
    corpus-sized iterates, and the per-round localCheckpoint keeps the
    plan from growing with the loop.
    """
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("u"),
            F.greatest("id_a", "id_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.isEmpty():
        return e
    n_edges = e.count()
    for _ in range(max_rounds):
        # large-star: for every node u, connect each LARGER neighbor v to
        # m(u) = min(N(u) ∪ {u}). Connectivity-preserving; strictly shrinks
        # tall structures.
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e1 = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: direct edges large->small (key = the larger endpoint
        # v, neighbors = its smaller side u); connect each smaller neighbor
        # AND v itself to m(v) = min of that neighborhood. After e1 every
        # edge already has u < v, so e1 is that directed form.
        mins2 = e1.groupBy("v").agg(F.min("u").alias("m"))
        small = (
            e1.join(mins2, "v")
            .select(F.col("m").alias("u"), F.col("u").alias("v"))
            .unionByName(
                mins2.select(F.col("m").alias("u"), F.col("v").alias("v"))
            )
        )
        new_e = (
            small.filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_n = new_e.count()
        # fixpoint test on the canonical (u<v) distinct sets: equal counts
        # + empty one-sided difference <=> equal sets <=> stars reached
        if new_n == n_edges and new_e.join(e, ["u", "v"], "left_anti").isEmpty():
            return new_e
        e, n_edges = new_e, new_n
    # O(log n) rounds means 30 covers any graph that fits on Earth; if we
    # get here something is deeply wrong — never return a partial answer
    # (it would silently split components).
    raise RuntimeError(
        f"star contraction did not reach a fixpoint in {max_rounds} rounds"
    )


def neardup_clusters(
    ids: DataFrame, pairs: DataFrame, max_iterations: int = 30
) -> DataFrame:
    """Connected components over a near-dup pair graph: each node gets
    ``canonical_id`` = min id in its component (plus the component size) —
    the step after pair detection in every dedup pipeline (keep one doc per
    duplicate CLUSTER, not per pair: pairs (a,b),(b,c) must collapse to one
    keeper even though (a,c) was never emitted).

    Runs alternating large-star/small-star contraction (:func:`_star_edges`)
    — O(log n) rounds regardless of component diameter, so web-scale chain
    components (which broke the diameter-bound min-label propagation kept
    below as :func:`neardup_clusters_minlabel`) converge in a handful of
    edge-list shuffles.

    ids: one column ``id``; pairs: columns ``id_a``, ``id_b``.
    """
    from pyspark.sql.window import Window

    stars = _star_edges(pairs, max_rounds=max_iterations)
    centers = stars.groupBy(F.col("v").alias("id")).agg(
        F.min("u").alias("lab")
    )
    labels = ids.join(centers, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("lab", "id").alias("canonical_id"),
    )
    return labels.withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("canonical_id")),
    )


def neardup_clusters_minlabel(
    ids: DataFrame, pairs: DataFrame, max_iterations: int = 12
) -> DataFrame:
    """Reference formulation of :func:`neardup_clusters`: iterative
    min-label propagation over the symmetrized edge list. Converges in
    component-diameter + 1 rounds (the final round verifies zero changes),
    capped at ``max_iterations`` with a loud failure — which a chain-shaped
    component longer than the cap WILL trip; that diameter dependence is
    why the star-contraction version is the default. Kept as the executable
    spec the default is pinned against (tests assert identical output).
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .persist()
    )
    labels = ids.select(F.col("id"), F.col("id").alias("lab")).persist()
    try:
        converged = False
        for _ in range(max_iterations):
            nbr = (
                edges.join(
                    labels.select(F.col("id").alias("src"), "lab"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("lab").alias("nlab"))
            )
            # localCheckpoint, not persist: persist truncates recompute but
            # NOT the logical plan, and Catalyst's cost on a plan nesting N
            # rounds of joins grows super-linearly — ~10+ unconverged
            # rounds OOMed the driver (measured on a 40-node chain).
            # Checkpointing resets the plan to a leaf each round.
            new_labels = (
                labels.join(nbr, "id", "left")
                .select(
                    "id",
                    F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.lab") != F.col("o.lab"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # Returning the partial labels would silently split one real
            # component into several (wrong canonical_id AND cluster_size);
            # long chains (diameter > max_iterations) must fail loudly.
            raise RuntimeError(
                f"neardup_clusters_minlabel did not converge in "
                f"{max_iterations} rounds; rounds needed = graph diameter "
                "+ 1 (the final zero-change verification round). Raise "
                "max_iterations — or use neardup_clusters (star "
                "contraction), whose rounds are O(log n) regardless of "
                "diameter"
            )
        from pyspark.sql.window import Window

        # truncate the per-round join lineage and release the caches the
        # loop accumulated (labels is small: two columns, one row per node)
        final = labels.localCheckpoint(eager=True)
        return final.select(
            F.col("id").alias("doc_id"), F.col("lab").alias("canonical_id")
        ).withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("canonical_id")),
        )
    finally:
        labels.unpersist()
        edges.unpersist()


# ---------------------------------------------------------------------------
# edit-distance (fuzzy) text join
# ---------------------------------------------------------------------------


def fuzzy_text_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_distance: int = 16,
    q: int = 5,
) -> DataFrame:
    """All pairs with Levenshtein distance <= ``max_distance`` — the
    approximate STRING join (record linkage, OCR-noise dedup, title
    matching), a different similarity axis from Jaccard (ORDER matters:
    transposed halves are jaccard-identical but edit-far).

    Candidate generation is the classic q-gram count filter (Gravano et
    al., VLDB'01 — public algorithm): ``ed(a,b) <= d`` implies the q-gram
    MULTISETS share at least ``max(|a|,|b|) - q + 1 - d*q`` grams, and
    ``||a|-|b|| <= d``. Stages: per-doc q-gram counts (narrow) ->
    inverted-index equi-join on the gram -> per-pair multiset-intersection
    size ``sum(least(cnt_a, cnt_b))`` -> count + length filters -> exact
    ``levenshtein`` verification on the few survivors. Pairs where BOTH
    strings are shorter than ``q*(d+1)`` fall below the filter's guarantee
    (the bound goes nonpositive) and take a small all-pairs short-bucket
    instead — bounded by the short-doc population, and each verification
    there is on short strings.

    Scale notes: the inverted-index join shares the LSH stages' shape
    (bare ids + counts ride the shuffle; text joins back only for
    verification). Ubiquitous grams make hot buckets — the standard
    refinements are positional q-grams and prefix filtering (sort grams
    by global frequency, index only each doc's rarest ``d*q + 1``); at
    the gate scale the plain count filter is exact and sufficient.
    Levenshtein on the survivors is quadratic per PAIR in string length —
    bound ``max_distance`` accordingly (Spark's levenshtein(l, r, bound)
    threshold form short-circuits)."""
    d = int(max_distance)
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.lower(F.col(text_col)).alias("t"),
    ).withColumn("len", F.length("t"))
    short_cut = q * (d + 1)
    # q-gram occurrence counts per doc (multiset — the bound needs counts,
    # not the distinct-set shingles the jaccard family uses)
    grams = (
        base.filter(F.col("len") >= 1)
        .select(
            "id",
            "len",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(t) - {q - 1}, 1)),"
                    f" i -> substring(t, i, {q}))"
                )
            ).alias("g"),
        )
        .groupBy("id", "len", "g")
        .agg(F.count("*").alias("cnt"))
    )
    ga = grams.select(
        F.col("id").alias("id_a"), F.col("len").alias("la"),
        "g", F.col("cnt").alias("ca"),
    )
    gb = grams.select(
        F.col("id").alias("id_b"), F.col("len").alias("lb"),
        "g", F.col("cnt").alias("cb"),
    )
    shared = (
        ga.join(gb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("la") - F.col("lb") <= d) & (F.col("lb") - F.col("la") <= d))
        .groupBy("id_a", "id_b", "la", "lb")
        .agg(F.sum(F.least("ca", "cb")).alias("shared"))
    )
    bound = F.greatest("la", "lb") - (q - 1) - d * q
    cand_qgram = shared.filter(
        (F.col("shared") >= F.greatest(bound, F.lit(1)))
        # below the guarantee line both strings are short -> short bucket
        & (F.greatest("la", "lb") >= short_cut)
    ).select("id_a", "id_b")
    shorts = base.filter(F.col("len") < short_cut)
    cand_short = (
        shorts.select(F.col("id").alias("id_a"), F.col("len").alias("la"))
        .crossJoin(
            shorts.select(F.col("id").alias("id_b"), F.col("len").alias("lb"))
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("la") - F.col("lb") <= d) & (F.col("lb") - F.col("la") <= d))
        .select("id_a", "id_b")
    )
    cand = cand_qgram.unionByName(cand_short).distinct()
    ta = base.select(F.col("id").alias("id_a"), F.col("t").alias("ta"))
    tb = base.select(F.col("id").alias("id_b"), F.col("t").alias("tb"))
    dist = F.levenshtein("ta", "tb", d)
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= d))
        .select("id_a", "id_b", "distance")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard brute force (the exact oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard >= threshold via shingle inverted
    index (explode + equi-join on shingle, count shared, |A∪B| from set
    sizes). Quadratic in the worst case — use on candidate sets or small
    partitions; serves as ground truth for the LSH family."""
    # no size filter — vacuous and pushdown-hostile, see _shingled
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        char_ngrams(F.col(text_col), shingle_n).alias("shingles"),
    )
    sizes = base.select("id", F.size("shingles").alias("n_sh"))
    inv = base.select("id", F.explode("shingles").alias("sh"))
    shared = (
        inv.alias("x")
        .join(inv.alias("y"), "sh")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)  # threshold on the exact value, round after
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )
