"""S3Storage over a real boto3 client mocked by moto — the integration
counterpart of ``tests/test_storage_s3.py``'s hand-rolled fake.

The reference gates its real-AWS integration suite behind the environment
(``glue/src/it/scala/com/gu/tableversions/glue/GlueMetastoreIntegrationSpec.scala:26-86``);
here the gate is "is moto importable": when it is, the SAME shared contract
suites that pin local/object-store/memory/fake-S3 backends run over
S3Storage + moto's S3 implementation, so the backend is exercised against
an independent implementation of S3's conditional-request semantics
(``If-None-Match: *`` create CAS, ``If-Match`` ETag loops, delimiter
pagination, server-side copy) rather than only our own fake.
"""

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from table_versions_spark.core.storage import S3Storage  # noqa: E402

from .test_storage import TestLogOnBackends as _LogSuite  # noqa: E402
from .test_storage import TestStorageContract as _ContractSuite  # noqa: E402
from .test_storage_s3 import _S3PathShim  # noqa: E402

BUCKET = "test-bucket"


@pytest.fixture
def moto_client():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield client


@pytest.fixture
def s3(moto_client):
    return S3Storage(client=moto_client, copy_workers=4)


class TestMotoS3StorageContract(_ContractSuite):
    """The generic storage contract over S3Storage + moto."""

    @pytest.fixture
    def storage(self, moto_client):
        return _S3PathShim(S3Storage(client=moto_client, copy_workers=4))

    def test_no_rename_semantics_on_object_store(self, tmp_path):
        pytest.skip("covered by the base ObjectStoreStorage param")


class TestMotoS3LogOnBackend(_LogSuite):
    """The commit log folds identically over moto-S3 primitives."""

    @pytest.fixture
    def storage(self, moto_client):
        return _S3PathShim(S3Storage(client=moto_client, copy_workers=4))


class TestMotoS3Primitives:
    def test_conditional_put_if_none_match(self, s3):
        assert s3.create_exclusive(f"s3://{BUCKET}/t/commit-0", "a") is True
        assert s3.create_exclusive(f"s3://{BUCKET}/t/commit-0", "b") is False
        assert s3.read_text(f"s3://{BUCKET}/t/commit-0") == "a"

    def test_update_atomic_etag_loop(self, s3):
        path = f"s3://{BUCKET}/t/pointer"
        s3.write_atomic(path, "v0")
        assert s3.update_atomic(path, lambda cur: cur + "+1") == "v0+1"
        assert s3.read_text(path) == "v0+1"
        # fn returning None leaves the object untouched
        assert s3.update_atomic(path, lambda cur: None) == "v0+1"

    def test_stale_etag_put_rejected_by_moto(self, s3, moto_client):
        """The CAS loop's premise, checked against moto directly: a PUT
        carrying a superseded ETag must 412."""
        path = f"s3://{BUCKET}/t/ptr2"
        s3.write_atomic(path, "v0")
        old_etag = moto_client.get_object(Bucket=BUCKET, Key="t/ptr2")["ETag"]
        s3.write_atomic(path, "v1")  # supersedes old_etag
        with pytest.raises(moto_client.exceptions.ClientError) as exc:
            moto_client.put_object(Bucket=BUCKET, Key="t/ptr2",
                                   Body=b"mine", IfMatch=old_etag)
        code = exc.value.response["ResponseMetadata"]["HTTPStatusCode"]
        assert code == 412
        assert s3.read_text(path) == "v1"

    def test_publish_dir_server_side_copy(self, s3):
        for i in range(3):
            s3.write_atomic(f"s3://{BUCKET}/stage/part-{i}", f"data{i}")
        s3.publish_dir(f"s3://{BUCKET}/stage", f"s3://{BUCKET}/final/v1")
        assert s3.list_dir(f"s3://{BUCKET}/final/v1") == [
            "part-0", "part-1", "part-2"]
        assert s3.read_text(f"s3://{BUCKET}/final/v1/part-1") == "data1"

    def test_list_dir_paginates_and_nests(self, s3):
        for i in range(5):
            s3.write_atomic(f"s3://{BUCKET}/d/f{i}.json", str(i))
        s3.write_atomic(f"s3://{BUCKET}/d/sub/a.json", "a")
        assert s3.list_dir(f"s3://{BUCKET}/d") == [
            "f0.json", "f1.json", "f2.json", "f3.json", "f4.json", "sub"]
