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
        # One session serves the whole ~520-test suite; at the default
        # 1g heap the accumulated codegen/plan state OOMs the JVM
        # around the fuzz files (r14: test_sparql_fuzz died and every
        # later test cascaded as Py4JJavaError) — each file passes
        # alone, so it is cumulative session wear, not a test bug.
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
