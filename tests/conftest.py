import pytest

from narowi_ocr_spark.config import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="narowi-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.pyspark.udf.faulthandler.enabled": "true"},
    )
    yield s
    s.stop()
