#!/usr/bin/env python3
"""Dump .explain("formatted") for the round-6 touched queries into
plans/r06/<query>_{before,after}.txt (suffix = argv[2], default after).

Usage: python3 scripts/dump_plans_r06.py [sf_dir] [suffix] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "after"
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None

# default set: every query touched by a round-6 optimization
TOUCHED = [
    "embedding_neardup_lsh",
    "embedding_neardup",
    "minhash_neardup",
    "corpus_curation_lsh",
    "incremental_curation",
    "decontaminate",
    "lm_quality",
    "simhash_neardup",
    "fuzzy_match",
    "approx_top_terms",
    "top_terms",
    "tf_idf_terms",
]


def main():
    import __spark_entry__ as entry_mod
    from adaptive_pdf_extractor_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = entry_mod.queries()
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in ONLY or TOUCHED:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({SUFFIX})\n{txt}")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
