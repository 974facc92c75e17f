import pytest

from faisssearcher_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from faisssearcher_spark.sources.catalog import load_table
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from faisssearcher_spark.sources.catalog import load_table
    return load_table(spark, sf_dir, "documents").cache()
