import pytest
from pyspark.sql import SparkSession


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: bench-scale (sf0.1) validation; deselect with -m 'not slow'",
    )


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("scio_sparql_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
