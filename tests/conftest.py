import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MEDIUM = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from table_versions_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="tvx-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture
def engine(spark, tmp_path):
    from table_versions_spark.engine import VersionedEngine

    return VersionedEngine(spark, str(tmp_path / "warehouse"))


@pytest.fixture(scope="session")
def sf_small():
    if not os.path.isdir(SF_SMALL):
        pytest.skip("testdata not available")
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    if not os.path.isdir(SF_MEDIUM):
        pytest.skip("testdata not available")
    return SF_MEDIUM
