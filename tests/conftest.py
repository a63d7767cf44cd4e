import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small+fast for unit tests

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from kafka_es_spark.session import get_spark

    s = get_spark("kafka-es-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def pages(spark):
    from kafka_es_spark.sources.pages import gen_pages

    return gen_pages(spark, 400, seed=42, partitions=4).cache()
