#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox; per driver instruction the evidence
is the same job + input at two parallelism levels. Methodology (full
analysis in BENCH.md):

* ``local[N]`` alone is NOT an N-core cluster: the JVM's pipeline threads
  (Arrow serde, codegen eval, GC) spill onto cores beyond the N task
  slots, inflating the small-N baseline. Each level is therefore pinned to
  a hard CPU budget with ``taskset`` — the faithful emulation of an
  N-core-executor cluster node.
* This machine's per-core throughput decays beyond ~16 active cores
  (memory/frequency wall — reproduced with plain multiprocessing, no
  Spark; see control_experiment()). The N vs 4N pair must sit inside the
  hardware's linear region, so the default pairing is 2 vs 8 cores.

Usage: python3 scripts/scaling_bench.py [n_docs] [trials] [N] [4N]
Writes scaling_result.json; prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from adaptive_pdf_extractor_spark.session import get_spark
from adaptive_pdf_extractor_spark.functions.rules import RuleBook
from adaptive_pdf_extractor_spark.operators.extract import extract_documents
from adaptive_pdf_extractor_spark.sources import corpus as corpus_mod, spark_io

cpus = %(cpus)d
n_docs = %(n_docs)d
trials = %(trials)d
spark = get_spark(app_name="scaling-%%d" %% cpus, cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

book = RuleBook.from_rows(corpus_mod.reference_cache_to_rule_rows(
    "/root/reference/data/fake/caches/fake_dataset_1000samples_seed_1_cache.json"))
corpus = spark_io.synthetic_corpus_df(spark, seed=99, count=n_docs,
                                      partitions=max(cpus * 2, 8)).persist()
corpus.count()

# Full-size warmup: spins up every Python worker (one per core, lazily
# created and module-import-heavy) and touches every cached partition —
# a limit() warmup leaves most workers cold and inflates trial 1 by ~3x.
extract_documents(corpus, book).count()

times = []
for t in range(trials):
    t0 = time.time()
    out = extract_documents(corpus, book)
    # realistic sink-side work: span count + rule-hit tally, not just count(*)
    out.select(F.sum(F.size("spans")), F.sum(F.size("unresolved"))).collect()
    times.append(time.time() - t0)
best = min(times)
print(json.dumps({"cpus": cpus, "n_docs": n_docs, "times": times,
                  "best_sec": round(best, 3),
                  "docs_per_sec": round(n_docs / best, 1)}))
spark.stop()
"""


def run(cpus: int, n_docs: int, trials: int, pin: bool = True) -> dict:
    code = WORKER % {"repo": REPO, "cpus": cpus, "n_docs": n_docs, "trials": trials}
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=2400, cwd=REPO
    )
    json_lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if out.returncode != 0 or not json_lines:
        # surface the worker's real traceback instead of an IndexError
        raise RuntimeError(
            f"scaling worker (cpus={cpus}) failed rc={out.returncode}\n"
            f"--- stdout tail ---\n{out.stdout[-2000:]}\n"
            f"--- stderr tail ---\n{out.stderr[-4000:]}"
        )
    res = json.loads(json_lines[-1])
    res["pinned"] = pin
    return res


def _control_work(n):
    """One control worker: the same normalize+rules work, no Spark."""
    import time

    import pandas as pd

    sys.path.insert(0, REPO)
    from adaptive_pdf_extractor_spark.functions.normalize import normalize_series
    from adaptive_pdf_extractor_spark.functions.rules import (
        RuleBook,
        apply_rules_vectorized,
    )
    from adaptive_pdf_extractor_spark.sources import corpus as c

    book = RuleBook.from_rows(
        c.reference_cache_to_rule_rows(
            "/root/reference/data/fake/caches/"
            "fake_dataset_1000samples_seed_1_cache.json"
        )
    )
    recs = [c.synth_record(3, f"p/{i}") for i in range(n)]
    texts = pd.Series([r["pdf_text"] for r in recs], dtype="object")
    fields = [f["name"] for f in recs[0]["schema_fields"]]
    t0 = time.time()
    norm = normalize_series(texts)
    for f in fields:
        apply_rules_vectorized(norm, book.rules_for("carteira_oab", f))
    return n / (time.time() - t0)


def control_experiment(workers_a: int = 4, workers_b: int = 16, n: int = 20000) -> dict:
    """Hardware control: the same normalize+rules work as plain Python
    processes (no Spark). Establishes the machine's own scaling curve."""
    import multiprocessing as mp

    work = _control_work
    out = {}
    for w in (workers_a, workers_b):
        with mp.Pool(w) as pool:
            import time as _t

            t0 = _t.time()
            pool.map(work, [n] * w)
            wall = _t.time() - t0
        out[f"procs_{w}"] = round(w * n / wall, 1)
    out["efficiency"] = round(
        (out[f"procs_{workers_b}"] / out[f"procs_{workers_a}"])
        / (workers_b / workers_a),
        3,
    )
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    lo = run(n_lo, n_docs, trials)
    hi = run(n_hi, n_docs, trials)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_hi / n_lo)
    result = {
        "workload": "fast-path extraction (converged rules, steady state)",
        "method": "whole-process CPU budgets pinned via taskset "
        "(local[N] alone lets JVM pipeline threads spill beyond N cores)",
        "n_docs": n_docs,
        "trials": trials,
        f"pinned_{n_lo}_cores": lo,
        f"pinned_{n_hi}_cores": hi,
        "speedup": round(hi["docs_per_sec"] / lo["docs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "hardware_control": control_experiment(),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(REPO, "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
