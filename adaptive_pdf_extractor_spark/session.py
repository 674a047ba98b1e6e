"""SparkSession factory with the engine's standard tuning.

Defaults are sized for the sandbox (local[32], 128 GiB) but every knob is
the one that matters on a real multi-executor cluster at 10^12-document
scale: AQE (runtime re-plan + skew-join splitting + partition coalescing),
Arrow-batched Python UDF transport, and an explicit shuffle-partition count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "adaptive-extractor",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    cpus: local parallelism (None -> $SPARK_GRAFT_CPUS or all cores).
    shuffle_partitions: default 2x cpus — extraction partitions are
    CPU-bound Arrow batches, slight over-partitioning smooths stragglers
    (large-document skew) while AQE coalesces the small ones.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Local-mode Python workers inherit the environment, not the driver's
    # sys.path — make sure they can import this package regardless of the
    # launch directory. (On a real cluster, ship the package with
    # spark-submit --py-files instead; this is a no-op there.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pythonpath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pythonpath}" if pythonpath else pkg_root
        )
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size: documents are ~0.2-2 KB of text; 10k rows/batch
        # keeps regex batches large enough to amortize per-batch overhead
        # without blowing Python-worker memory on pathological large docs.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
