"""Shared Spark fixtures for the test suite.

Reference fixtures: /root/reference/tests/test.py:17-23 (smalldf) and
:84-91 (heterodf); exact values also pinned in /root/repo/FIXTURES.md.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("decision_tree_stuff_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture
def smalldf(spark) -> DataFrame:
    return spark.createDataFrame(
        [
            (1.0, 0.0, 1),
            (2.0, 0.0, 0),
            (3.0, 0.0, 0),
            (4.0, 0.0, 1),
            (5.0, 1.0, 0),
        ],
        "feature_1 double, feature_2 double, class bigint",
    )


@pytest.fixture
def heterodf(spark) -> DataFrame:
    """Classified by x_coord > 1."""
    return spark.createDataFrame(
        [
            (1.0, 0.0, 0),
            (2.0, 1.0, 1),
            (1.0, 1.0, 0),
            (1.0, 1.0, 0),
            (0.0, 0.0, 0),
            (2.0, 0.0, 1),
            (1.0, 1.0, 0),
        ],
        "x_coord double, y_coord double, color bigint",
    )


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
