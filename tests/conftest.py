import pytest


@pytest.fixture(scope="session")
def spark():
    from sprintz_spark.session import get_spark

    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from sprintz_spark.sources.pages import generate_pages

    return generate_pages(spark, 3000).cache()
