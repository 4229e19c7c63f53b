import pytest


@pytest.fixture(scope="session")
def spark():
    from weakscraper_spark.plans.session import get_spark

    spark = get_spark("tests", master="local[2]", shuffle_partitions=4)
    yield spark
    spark.stop()
