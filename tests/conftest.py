from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    import tempfile

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("purescript-ifrit-spark-tests")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ifrit_wh_"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


# A nested-document fixture exercising the reference's document model
# (nested objects, arrays of numbers, arrays of objects). Designed by us —
# NOT the reference's FF "mages" fixture.
WIZARDS_SCHEMA = {
    "name": "string",
    "evil": "boolean",
    "profile": {
        "bio": {"age": "number", "school": "string"},
        "body": {"height": "number"},
    },
    "scores": ["number"],
    "wands": [{"wood": "string", "power": "number"}],
}

WIZARDS_ROWS = [
    ("aldric", False, ((34.0, "storm"), (1.81,)), [3.0, 5.0, 8.0],
     [("oak", 12.0), ("ash", 7.0)]),
    ("belra", True, ((41.0, "ember"), (1.65,)), [9.0, 9.0],
     [("yew", 21.0)]),
    ("coven", False, ((19.0, "storm"), (1.92,)), [1.0],
     [("elm", 4.0), ("oak", 16.0), ("ash", 2.0)]),
    ("dmira", True, ((27.0, "tide"), (1.70,)), [],
     []),
    ("elwin", False, ((27.0, "ember"), (1.75,)), [6.0, 2.0, 4.0, 4.0],
     [("oak", 9.0)]),
    ("fyra", True, ((55.0, "tide"), (1.60,)), [7.0],
     [("yew", 30.0), ("elm", 11.0)]),
]


@pytest.fixture(scope="session")
def wizards(spark):
    from purescript_ifrit_spark.schema import schema_from_json

    struct = schema_from_json(WIZARDS_SCHEMA).to_spark()
    return spark.createDataFrame(WIZARDS_ROWS, struct)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
