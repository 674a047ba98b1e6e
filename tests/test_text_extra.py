"""BPE-ish token counting and winnowing fingerprints (the rolling-hash
document sketch): the winnowing guarantee and near-dup behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adaptive_pdf_extractor_spark.functions import text as T


def _sketch(spark, texts: list[str], k=7, window=4) -> list[set]:
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, t string")
    rows = df.select(
        "id", T.winnowing_fingerprints(F.col("t"), k=k, window=window).alias("fp")
    ).collect()
    return [set(r["fp"]) for r in sorted(rows, key=lambda r: r["id"])]


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [("hello world",), ("f(x)=3.14; y+=2",), ("",), ("   ",)], "t string"
    )
    got = [r[0] for r in df.select(T.bpe_token_count(F.col("t"))).collect()]
    # "f(x)=3.14; y+=2" -> f ( x )= 3 . 14 ; y += 2  => 11 units
    assert got == [2, 11, 0, 0]


def test_winnowing_guarantee(spark):
    """Any shared substring of length >= k + window - 1 must contribute at
    least one shared fingerprint (the winnowing theorem)."""
    k, w = 7, 4
    shared = "the quick brown fox jumps over the lazy dog"  # length 43 >= 10
    a = "PREFIX AAA " + shared + " SUFFIX BBB"
    b = "zzz totally different opening " + shared + " and closing qqq"
    c = "nothing in common with either of those two documents at all!"
    sa, sb, sc = _sketch(spark, [a, b, c], k=k, window=w)
    assert sa & sb, "documents sharing a long substring must share fingerprints"
    assert not (sa & sc) or len(sa & sc) < len(sa & sb)


def test_winnowing_neardup_ranking(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base[15:]          # same content, shifted
    far = "one two three four five six seven eight nine ten " * 5
    s_base, s_near, s_far = _sketch(spark, [base, near, far])
    overlap_near = len(s_base & s_near) / len(s_base | s_near)
    overlap_far = len(s_base & s_far) / len(s_base | s_far)
    assert overlap_near > 0.6 > overlap_far


def test_winnowing_short_and_empty(spark):
    s_tiny, s_empty = _sketch(spark, ["abc", ""])
    assert len(s_tiny) == 1  # single k-gram window on short text
    assert len(s_empty) == 1  # hash of the empty substring — defined, stable


def test_winnowing_np_matches_column_reference(spark):
    """The numpy sliding-min winnowing (hot path) must be bit-identical to
    the Column-algebra reference formulation, including the degenerate
    edges (empty text, text shorter than k, null -> [xxhash64(null)])."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abc", "", None, "x" * 500,
        " ".join(str(i) for i in range(300)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    rows = df.select(
        "id",
        T.winnowing_fingerprints(F.col("t")).alias("fast"),
        T.winnowing_fingerprints_columns(F.col("t")).alias("ref"),
        T.winnowing_fingerprints(F.col("t"), k=4, window=7).alias("fast2"),
        T.winnowing_fingerprints_columns(F.col("t"), k=4, window=7).alias("ref2"),
    ).collect()
    for r in rows:
        assert r["fast"] == r["ref"], r["id"]
        assert r["fast2"] == r["ref2"], r["id"]


def test_winnowing_md5_np_matches_column_reference(spark):
    """The md5 (engine-portable) winnowing fast path must be bit-identical
    to its Column-algebra spec on the same degenerate edges, and must obey
    the same guarantee shape as the xxhash64 variant (one fingerprint for
    short/empty text)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abc", "", None, "x" * 500,
        " ".join(str(i) for i in range(300)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    rows = df.select(
        "id",
        T.winnowing_fingerprints_md5(F.col("t")).alias("fast"),
        T.winnowing_fingerprints_md5_columns(F.col("t")).alias("ref"),
        T.winnowing_fingerprints_md5(F.col("t"), k=4, window=7).alias("fast2"),
        T.winnowing_fingerprints_md5_columns(F.col("t"), k=4, window=7).alias(
            "ref2"
        ),
    ).collect()
    for r in rows:
        assert r["fast"] == r["ref"], r["id"]
        assert r["fast2"] == r["ref2"], r["id"]
    by_id = {r["id"]: r for r in rows}
    assert len(by_id[1]["fast"]) == 1  # "abc": single whole-text window
    assert len(by_id[2]["fast"]) == 1  # "": hash of empty substring
    assert by_id[3]["fast"] is None or by_id[3]["fast"] == by_id[3]["ref"]


def test_tokens_boundary_whitespace_and_oracle_parity(spark):
    """Boundary whitespace (incl. non-space kinds F.trim misses) must not
    create counted empty tokens, and token/BPE counts plus the exact-dedup
    fingerprint input must agree with DuckDB RE2 semantics even on \\x0B
    (in Java \\s but not RE2 \\s)."""
    import duckdb

    texts = [
        "plain text here",
        "trailing newline\n",
        "\n\tleading\tand trailing \n",
        "\n",
        "a\x0bb c",
        "  spaces  ",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, t string")
    got = {
        r["id"]: (r["n"], r["bpe"], r["fp"])
        for r in df.select(
            "id",
            T.token_count(F.col("t")).cast("long").alias("n"),
            T.bpe_token_count(F.col("t")).alias("bpe"),
            F.md5(
                F.lower(F.regexp_replace(F.trim("t"), rf"[{T.WS_CLASS}]+", " "))
            ).alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        n, bpe, fp = con.execute(
            f"""SELECT
              CASE WHEN trim(?) = '' THEN 0
                   ELSE len(regexp_extract_all(trim(?), '[^{T.WS_CLASS}]+')) END,
              len(regexp_extract_all(?, '{T.BPE_TOKEN_PATTERN}')),
              md5(lower(regexp_replace(trim(?), '[{T.WS_CLASS}]+', ' ', 'g')))
            """,
            [t, t, t, t],
        ).fetchone()
        assert got[i] == (n, bpe, fp), (i, repr(t), got[i], (n, bpe, fp))
    # and no empty tokens regardless of boundary whitespace kind
    assert got[1][0] == 2 and got[3][0] == 0 and got[5][0] == 1


def test_hash_split_stable_and_proportional(spark):
    """hash_split is a pure function of the id: identical assignment at any
    partitioning, fractions roughly respected, thresholds exact."""
    from adaptive_pdf_extractor_spark.operators import stats

    ids = spark.range(0, 2000, 1, 4).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in stats.hash_split(
            ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in stats.hash_split(
            ids.repartition(13), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b  # partitioning-independent
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03


def test_hash_split_chi_square_uniformity(spark):
    """Distribution-tolerance property at 100k+ sequential ids: the
    3-way split's chi-square statistic (2 degrees of freedom) must stay
    below 30 — p < 1e-6 under uniformity would be ~27.6, so a key-
    derivation change that skews train/test (e.g. hashing only low bits,
    or a biased threshold) fails loudly while honest md5 noise (expected
    chi2 ~ 2) passes with two orders of margin. Sequential ids are the
    adversarial input here: a weak hash correlates adjacent ids."""
    from adaptive_pdf_extractor_spark.operators import stats

    n = 120_000
    fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    ids = spark.range(0, n, 1, 8).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["c"]
        for r in stats.hash_split(ids, "doc_id", fractions)
        .groupBy("split")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert set(counts) == set(fractions)
    chi2 = sum(
        (counts[s] - n * f) ** 2 / (n * f) for s, f in fractions.items()
    )
    assert chi2 < 30.0, (chi2, counts)


def test_word_occurrences_whitespace_kinds_and_adjacent_repeats(spark):
    """Newline/tab-separated tokens count, adjacent repeats count fully,
    and the SQL oracle mirror agrees on exactly these cases."""
    import duckdb

    texts = ["the\nthe\tthe", "the the the", "the", "xthe thex", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, t string")
    got = {
        r["id"]: (r["occ"], r["sw"])
        for r in df.select(
            "id",
            T.word_occurrences(F.col("t"), "the").alias("occ"),
            T.stopword_ratio(F.col("t")).alias("sw"),
        ).collect()
    }
    assert got[0][0] == 3 and got[0][1] == 1.0
    assert got[1][0] == 3 and got[1][1] == 1.0
    assert got[2][0] == 1
    assert got[3][0] == 0  # substrings are not tokens
    assert got[4][0] == 0
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for i, t in enumerate(texts):
        (occ,) = con.execute(
            f"SELECT {entry_mod._sql_occurrences('?', 'the')}".replace("?", "?"),
            [t, t],
        ).fetchone()
        assert occ == got[i][0], (i, repr(t))


def test_hash_split_validation_and_ascii_fold(spark):
    """hash_split rejects bad fractions loudly (no bare assert); top_terms'
    ASCII fold matches DuckDB on text where full Unicode lower() differs
    between engines (Java lower('İ') is 2 chars, utf8proc's is 1)."""
    import duckdb
    import pytest

    from adaptive_pdf_extractor_spark.operators import stats

    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to > 1"):
        stats.hash_split(ids, "doc_id", {"a": 0.9, "b": 0.9})
    with pytest.raises(ValueError, match="positive"):
        stats.hash_split(ids, "doc_id", {"a": 0.9, "b": -0.1})
    with pytest.raises(ValueError, match="non-empty"):
        stats.hash_split(ids, "doc_id", {})

    df = spark.createDataFrame(
        [(0, "İstanbul İstanbul Word word STRASSE")], "id int, t string"
    )
    got = sorted(
        (r["term"], r["n"])
        for r in stats.top_terms(df, "t", k=10, min_len=2).collect()
    )
    want = sorted(
        duckdb.sql(
            "SELECT translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
            " 'abcdefghijklmnopqrstuvwxyz') AS term, count(*) AS n"
            " FROM (SELECT unnest(string_split("
            "'İstanbul İstanbul Word word STRASSE', ' ')) AS t)"
            " GROUP BY 1"
        ).fetchall()
    )
    assert got == want
    assert ("İstanbul", 2) in got  # non-ASCII preserved identically


def test_token_ngram_keys_match_python_reference(spark):
    """token_ngram_keys (the decontamination gram primitive) against a
    straight-line Python reference over a seeded batch of edge-case and
    random ASCII texts: empty, whitespace-only, sub-n, exactly-n,
    repeated grams (distinct!), and every WS_CLASS char as a separator.
    One Spark job for the whole batch."""
    import hashlib
    import random
    import re

    n = 5  # smaller n than production's 13 so short random texts exercise grams
    ws = "\t\n\x0b\f\r "

    def ref(text: str) -> list[str]:
        folded = text.translate(str.maketrans(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
        ))  # ASCII fold, mirroring token_ngram_keys' translate
        cleaned = re.sub(rf"^[{ws}]+|[{ws}]+$", "", folded)
        toks = re.split(rf"[{ws}]+", cleaned) if cleaned else []
        if len(toks) < n:
            return []
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        seen: set = set()
        out = []
        for g in grams:
            k = hashlib.md5(g.encode("utf-8")).hexdigest()[:16]
            if k not in seen:
                seen.add(k)
                out.append(k)
        return out

    rng = random.Random(17)
    vocab = ["alpha", "beta", "Gamma", "d", "e1", "FF", "go"]
    texts = ["", "   ", "\t\n", "a b c d", "a b c d e", "one two one two one two one two"]
    for _ in range(60):
        k = rng.randrange(0, 20)
        toks = [rng.choice(vocab) for _ in range(k)]
        seps = [rng.choice(ws) * rng.randrange(1, 3) for _ in range(max(k - 1, 0))]
        t = "".join(
            tok + (seps[i] if i < len(seps) else "") for i, tok in enumerate(toks)
        )
        texts.append(rng.choice(ws) * rng.randrange(0, 2) + t)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, t string"
    )
    rows = {
        r["id"]: list(r["g"])
        for r in df.select(
            "id", T.token_ngram_keys(F.col("t"), n).alias("g")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert rows[i] == ref(t), (i, t)


def test_repetition_metrics_signal(spark):
    """duplicate_line_fraction and top_bigram_coverage actually separate
    spam shapes from prose: a doc of repeated lines scores dup-frac near
    1; a keyword-stuffed doc concentrates its bigram mass; varied prose
    scores low on both; sub-2-token docs get the 0.0 default."""
    from adaptive_pdf_extractor_spark.operators import stats

    rows = [
        (0, "menu\nmenu\nmenu\nmenu"),                       # line spam
        (1, "buy now " * 20),                                 # bigram stuffing
        (2, "one two three four five six seven eight nine"),  # varied prose
        (3, "solo"),                                          # no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lf = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id",
            T.duplicate_line_fraction(F.col("text")).alias("f"),
        ).collect()
    }
    assert lf[0] == 0.75  # 4 lines, 1 distinct
    assert lf[2] == 0.0
    bg = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in stats.top_bigram_coverage(df, "doc_id", "text").collect()
    }
    assert bg[1] > 0.5      # "now buy"/"buy now" dominate the slots
    assert bg[2] < 0.2      # every bigram distinct -> 1/8
    assert bg[3] == 0.0


def test_redact_pii_precision(spark):
    """redact_pii: emails and phone-shaped runs become typed tokens;
    bare small numbers, version strings and prose digits are NOT touched
    (precision-over-recall contract)."""
    rows = [
        (0, "mail a.b+tag@sub.example.org now"),
        (1, "call +55 (11) 98765-4321 or 555-0123-4567"),
        (2, "v2.3 has 12345 users and spark 4.1.2"),
        (3, "edge user@example.com."),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", T.redact_pii(F.col("text")).alias("c")
        ).collect()
    }
    assert got[0] == "mail <email> now"
    assert got[1] == "call <phone> or <phone>"
    assert got[2] == "v2.3 has 12345 users and spark 4.1.2"
    assert got[3] == "edge <email>."


def test_pandas_udf_gram_inputs_survive_repeated_queries(spark):
    """Regression for the round-6 lambda-binding landmine: a pandas UDF
    whose input expression carries NESTED lambda bindings (the
    functions.text._bind shape) silently skips Python-UDF extraction on
    every query after a session's first and dies with [INTERNAL_ERROR]
    Cannot evaluate expression. Every UDF-feeding gram pipeline must
    therefore stay single-lambda-level — pinned here by running each one
    TWICE against freshly-constructed source frames (the exact trigger)
    and requiring identical results."""
    from adaptive_pdf_extractor_spark.operators import dedup
    from adaptive_pdf_extractor_spark.streaming.ingest import (
        streaming_decontaminate,
    )

    sf = "/root/testdata/sf0.001"

    def sig_rows():
        d = spark.read.parquet(f"{sf}/documents.parquet").limit(20)
        return sorted(
            (r["id"], tuple(r["sig"]))
            for r in dedup.minhash_signatures_df(d, "doc_id", "text").collect()
        )

    assert sig_rows() == sig_rows()

    def md5_sig_rows():
        d = spark.read.parquet(f"{sf}/documents.parquet").limit(10)
        return sorted(
            (r["id"], tuple(r["sig"]))
            for r in dedup.minhash_signatures_md5_df(
                d, "doc_id", "text"
            ).collect()
        )

    assert md5_sig_rows() == md5_sig_rows()

    def winnow_rows():
        d = spark.read.parquet(f"{sf}/documents.parquet").limit(10)
        return sorted(
            (r["doc_id"], tuple(r["fp"]))
            for r in d.select(
                "doc_id",
                T.winnowing_fingerprints(F.col("text")).alias("fp"),
            ).collect()
        )

    assert winnow_rows() == winnow_rows()

    def decon_ids():
        d = spark.read.parquet(f"{sf}/documents.parquet").limit(20)
        keys = dedup.decontaminate_keys(
            d.filter(F.col("doc_id") == 3).select("text"), "text", n=13
        )
        return sorted(
            r["doc_id"]
            for r in streaming_decontaminate(d, keys, "text").collect()
        )

    assert decon_ids() == decon_ids()
