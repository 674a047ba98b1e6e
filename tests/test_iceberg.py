"""Iceberg catalog round-trip — skipif-gated on the runtime jar, the same
pattern as the pypdf-gated real-PDF tests: collected (and skipped) in this
sandbox, green on any cluster that ships iceberg-spark-runtime. (The
jar-absent loud-failure contract is pinned separately in
test_real_dataset.py::test_catalog_dispatch_iceberg_requires_runtime.)"""

from __future__ import annotations

import glob
import os

import pytest

from adaptive_pdf_extractor_spark.sources import spark_io

ICEBERG_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def _iceberg_jar_present() -> bool:
    import pyspark

    jar_dirs = [os.path.join(os.path.dirname(pyspark.__file__), "jars")]
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    return any(
        glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        for d in jar_dirs
    )


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath",
)
def test_iceberg_write_read_roundtrip(spark, tmp_path):
    """With the runtime jar present: configure a hadoop catalog, write a
    table through the catalog dispatch, read it back identical, and append
    a second snapshot. (Extensions must be set at session build — when the
    shared test session lacks them, skip with the exact conf to add.)"""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if ICEBERG_EXT not in ext:
        pytest.skip(
            "jar present but session lacks the Iceberg extension; rerun "
            f"with spark.sql.extensions={ICEBERG_EXT} and a "
            "spark.sql.catalog.* entry"
        )
    df = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(50)], "doc_id long, text string"
    )
    path = str(tmp_path / "ice_tbl")
    spark_io.write_table(df, path, catalog="iceberg")
    back = spark_io.read_table(spark, path, catalog="iceberg")
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    spark_io.write_table(df, path, mode="append", catalog="iceberg")
    assert spark_io.read_table(spark, path, catalog="iceberg").count() == 100


@pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath",
)
def test_iceberg_versioned_state_strictly_below(spark, tmp_path):
    """Versioned micro-batch state through the Iceberg leg of the catalog
    seam: each commit snapshot-replaces ONE table, and
    read_state_version_below honors the strictly-below replay contract by
    walking snapshot history — the cluster form of the parquet
    v=<n>-directory fallback (streaming near-dup's state mechanics)."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    if ICEBERG_EXT not in ext:
        pytest.skip(
            "jar present but session lacks the Iceberg extension; rerun "
            f"with spark.sql.extensions={ICEBERG_EXT} and a "
            "spark.sql.catalog.* entry"
        )
    path = str(tmp_path / "ice_state")
    v0 = spark.createDataFrame([("a", 1)], "id string, n int")
    v1 = spark.createDataFrame([("b", 2), ("c", 3)], "id string, n int")
    assert (
        spark_io.read_state_version_below(spark, path, 1, catalog="iceberg")
        is None
    )
    spark_io.write_state_version(v0, path, 0, catalog="iceberg")
    spark_io.write_state_version(v1, path, 1, catalog="iceberg")
    # current snapshot qualifies (1 < 2)
    got = spark_io.read_state_version_below(spark, path, 2, catalog="iceberg")
    assert sorted(tuple(r) for r in got.collect()) == [("b", 2), ("c", 3)]
    # strictly-below: replaying batch 1 must see v0, not its own commit
    got = spark_io.read_state_version_below(spark, path, 1, catalog="iceberg")
    assert sorted(tuple(r) for r in got.collect()) == [("a", 1)]
    assert (
        spark_io.read_state_version_below(spark, path, 0, catalog="iceberg")
        is None
    )
    # EMPTY version: the sentinel row keeps it version-stamped, so an
    # empty commit shadows older (potentially dead-run) snapshots instead
    # of the history walk resurrecting them
    empty = spark.createDataFrame([], "id string, n int")
    spark_io.write_state_version(empty, path, 2, catalog="iceberg")
    got = spark_io.read_state_version_below(spark, path, 3, catalog="iceberg")
    assert got is not None and got.count() == 0
    assert got.columns == ["id", "n"]
