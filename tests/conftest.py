"""Shared fixtures. A single local SparkSession is reused across the whole
test run (JVM startup dominates otherwise)."""

from __future__ import annotations

import os

import pytest

REFERENCE = "/root/reference"
TESTDATA = "/root/testdata"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "data"))


@pytest.fixture(scope="session")
def spark():
    from adaptive_pdf_extractor_spark.session import get_spark

    spark = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()
