from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nametag3_spark.session import get_spark

    spark = get_spark(
        app_name="nametag3_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
