import os

import pytest

# Dummy AWS credentials, set BEFORE the session JVM starts so that Spark's
# python workers (which inherit the JVM env captured at the first
# SparkSession) can sign requests against the moto *server* fixtures
# (tests/test_dv_cdc_s3_moto.py). moto ignores the values; having them set
# is also moto's own recommendation for the mock_aws suites.
for _k, _v in (("AWS_ACCESS_KEY_ID", "tvx-test"),
               ("AWS_SECRET_ACCESS_KEY", "tvx-test"),
               ("AWS_DEFAULT_REGION", "us-east-1")):
    os.environ.setdefault(_k, _v)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MEDIUM = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from table_versions_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="tvx-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(params=["local", "objectstore"])
def engine(spark, tmp_path, request):
    """Engine suite runs on BOTH storage backends: POSIX (rename/link/O_EXCL)
    and object-store semantics (copy+delete publish, conditional-put CAS)."""
    from table_versions_spark.core.storage import ObjectStoreStorage
    from table_versions_spark.engine import VersionedEngine

    storage = ObjectStoreStorage() if request.param == "objectstore" else None
    return VersionedEngine(spark, str(tmp_path / "warehouse"), storage)


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
