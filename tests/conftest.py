import pytest


@pytest.fixture(scope="session")
def spark():
    from crawlspark.session import get_spark

    s = get_spark(
        app_name="crawlspark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_pages(spark):
    from crawlspark.fixtures import fixture_pages_df
    from crawlspark.sources.pages import PagesSource

    df = fixture_pages_df(spark).cache()
    df.count()
    return PagesSource(df)
