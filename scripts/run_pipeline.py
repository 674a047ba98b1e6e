#!/usr/bin/env python3
"""Cluster job entrypoint: the full adaptive extraction pipeline.

Run via spark-submit (the north_star's deployment shape)::

    # package the engine
    cd /root/repo && python3 -m zipfile -c engine.zip adaptive_pdf_extractor_spark

    spark-submit --driver-memory 16g --py-files engine.zip \
        scripts/run_pipeline.py \
        --input  /data/corpus_spans/          # span-table parquet
        --run-dir /data/runs/run-001          # manifests + snapshots + output
        --rules  /data/rules/bootstrap.json   # optional: reference-format cache
        --max-rounds 5 --partitions 4096

NOTE: pass --driver-memory on the spark-submit command line — the session
builder's spark.driver.memory cannot apply once spark-submit has already
launched the JVM (the 1g default crashes Python workers at ~10^6 docs in
local mode; verified).

Re-running with the same --run-dir resumes from the last committed round
(exact resume); a completed run skips straight to the final pass.

Local smoke (no cluster): add --synthetic 10000 to generate the corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="span-table parquet path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--rules", help="bootstrap rules: reference-format cache JSON")
    ap.add_argument("--max-rounds", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--miner-sample-mod", type=int, default=1)
    ap.add_argument("--no-direct-fallback", action="store_true")
    ap.add_argument("--strip-boilerplate", action="store_true",
                    help="remove corpus-frequency boilerplate text spans "
                         "before extraction (main-content pre-stage)")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local mode only; ignored under a cluster master")
    args = ap.parse_args()
    if not args.synthetic and not args.input:
        # fail fast BEFORE paying JVM startup
        ap.error("one of --input / --synthetic is required")

    from adaptive_pdf_extractor_spark.plans.pipeline import (
        ExtractionPipeline,
        PipelineConfig,
    )
    from adaptive_pdf_extractor_spark.session import get_spark
    from adaptive_pdf_extractor_spark.sources import corpus as corpus_mod
    from adaptive_pdf_extractor_spark.sources import spark_io

    spark = get_spark(app_name="adaptive-extract-pipeline", cpus=args.cpus)

    if args.synthetic:
        docs = spark_io.synthetic_corpus_df(spark, seed=1, count=args.synthetic)
    else:
        docs = spark_io.read_table(spark, args.input)

    initial_rules = (
        corpus_mod.reference_cache_to_rule_rows(args.rules) if args.rules else []
    )

    pipe = ExtractionPipeline(
        spark,
        args.run_dir,
        PipelineConfig(
            max_rounds=args.max_rounds,
            num_partitions=args.partitions,
            miner_sample_mod=args.miner_sample_mod,
            direct_fallback=not args.no_direct_fallback,
            strip_boilerplate=args.strip_boilerplate,
        ),
    )
    out = pipe.run(docs, initial_rules_rows=initial_rules, write_output=True)
    n = out.count()
    summary = {
        "output_rows": n,
        "rounds": [
            {k: r[k] for k in ("round", "n_new_rules")}
            for r in pipe.manifest.state["rounds"]
        ],
        "n_rules": len(pipe.final_rules()),
        "output_path": pipe.manifest.state["output_path"],
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
