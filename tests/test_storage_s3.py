"""S3Storage primitive-layer tests against a fault-injecting fake client.

boto3 is not installed here, so the S3 backend is exercised the way the
reference tests its cloud metastore against stubbed AWS clients
(``glue/src/test`` fakes vs the ``glue/src/it`` integration spec): a fake
implementing exactly the boto3 surface :class:`S3Storage` touches —
conditional puts (``If-None-Match``/``If-Match`` + ETags), server-side
copy, paginated ``list_objects_v2`` with delimiters — plus injectable
races. The SAME contract suites that pin the local/object-store/memory
backends (`tests/test_storage.py`) run over S3Storage+fake via a path
shim, so all four backends satisfy one executable spec.
"""

import threading

import pytest

from table_versions_spark.core.storage import S3Storage

from .test_storage import TestLogOnBackends as _LogSuite
from .test_storage import TestStorageContract as _ContractSuite

BUCKET = "test-bucket"


class _FakeExceptions:
    class NoSuchKey(Exception):
        pass

    class ClientError(Exception):
        def __init__(self, status):
            super().__init__(f"HTTP {status}")
            self.response = {"ResponseMetadata": {"HTTPStatusCode": status}}


class _Body:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _FakePaginator:
    def __init__(self, client):
        self._client = client

    def paginate(self, **kw):
        # real pagination: chunk results into page_size pages so the
        # ContinuationToken loop in callers is actually exercised
        full = self._client._list_all(**kw)
        size = self._client.page_size
        contents = full.get("Contents", [])
        prefixes = full.get("CommonPrefixes", [])
        merged = ([("c", c) for c in contents]
                  + [("p", p) for p in prefixes])
        if not merged:
            yield {}
            return
        for i in range(0, len(merged), size):
            chunk = merged[i:i + size]
            yield {
                "Contents": [v for k, v in chunk if k == "c"],
                "CommonPrefixes": [v for k, v in chunk if k == "p"],
            }


class FakeS3Client:
    """In-memory boto3-shaped S3 with real conditional-request semantics.

    Fault injection:
    - ``fail_conditional_puts``: that many conditional puts raise HTTP 412
      even when the condition holds (transient CAS loss).
    - ``on_get``: hook called after each successful GET — lets a test
      mutate the object *between* a reader's GET and its ``If-Match`` PUT
      to force an ETag race.
    """

    exceptions = _FakeExceptions

    def __init__(self, page_size: int = 2):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.etags: dict[tuple[str, str], str] = {}
        self._ver = 0
        self.page_size = page_size
        self.lock = threading.RLock()
        self.fail_conditional_puts = 0
        self.on_get = None
        self.put_count = 0

    def _etag(self):
        self._ver += 1
        return f'"etag-{self._ver}"'

    def get_object(self, Bucket, Key):
        with self.lock:
            k = (Bucket, Key)
            if k not in self.objects:
                raise _FakeExceptions.NoSuchKey(Key)
            resp = {"Body": _Body(self.objects[k]), "ETag": self.etags[k]}
        if self.on_get is not None:
            self.on_get(Bucket, Key)
        return resp

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, IfMatch=None):
        with self.lock:
            k = (Bucket, Key)
            conditional = IfNoneMatch is not None or IfMatch is not None
            if conditional and getattr(self, "fail_conditional_409", 0) > 0:
                # ConditionalRequestConflict: outcome unknown, key absent
                self.fail_conditional_409 -= 1
                raise _FakeExceptions.ClientError(409)
            if conditional and self.fail_conditional_puts > 0:
                self.fail_conditional_puts -= 1
                raise _FakeExceptions.ClientError(412)
            if IfNoneMatch == "*" and k in self.objects:
                raise _FakeExceptions.ClientError(412)
            if IfMatch is not None and self.etags.get(k) != IfMatch:
                raise _FakeExceptions.ClientError(412)
            data = Body if isinstance(Body, bytes) else bytes(Body)
            self.objects[k] = data
            self.etags[k] = self._etag()
            self.put_count += 1

    def copy_object(self, Bucket, Key, CopySource):
        with self.lock:
            src = (CopySource["Bucket"], CopySource["Key"])
            if src not in self.objects:
                raise _FakeExceptions.NoSuchKey(CopySource["Key"])
            self.objects[(Bucket, Key)] = self.objects[src]
            self.etags[(Bucket, Key)] = self._etag()

    def delete_object(self, Bucket, Key):
        with self.lock:
            self.objects.pop((Bucket, Key), None)
            self.etags.pop((Bucket, Key), None)

    def delete_objects(self, Bucket, Delete):
        # boto3 DeleteObjects: up to 1000 keys per request; per-key
        # failures come back in Errors, not as an exception
        assert len(Delete["Objects"]) <= 1000
        deleted, errors = [], []
        with self.lock:
            for o in Delete["Objects"]:
                if o["Key"] in getattr(self, "fail_delete_keys", ()):
                    errors.append({"Key": o["Key"], "Code": "AccessDenied",
                                   "Message": "injected"})
                    continue
                self.objects.pop((Bucket, o["Key"]), None)
                self.etags.pop((Bucket, o["Key"]), None)
                deleted.append({"Key": o["Key"]})
        out = {"Deleted": deleted}
        if errors:
            out["Errors"] = errors
        return out

    def head_object(self, Bucket, Key):
        with self.lock:
            k = (Bucket, Key)
            if k not in self.objects:
                raise _FakeExceptions.ClientError(404)
            return {"ContentLength": len(self.objects[k])}

    def _list_all(self, Bucket, Prefix="", Delimiter=None, MaxKeys=None):
        with self.lock:
            keys = sorted(key for (b, key) in self.objects
                          if b == Bucket and key.startswith(Prefix))
        contents, prefixes, seen = [], [], set()
        for key in keys:
            rest = key[len(Prefix):]
            if Delimiter and Delimiter in rest:
                p = Prefix + rest.split(Delimiter, 1)[0] + Delimiter
                if p not in seen:
                    seen.add(p)
                    prefixes.append({"Prefix": p})
            else:
                contents.append({"Key": key})
        out = {"Contents": contents, "CommonPrefixes": prefixes,
               "KeyCount": len(contents) + len(prefixes)}
        if MaxKeys is not None:
            out["Contents"] = contents[:MaxKeys]
            out["KeyCount"] = min(out["KeyCount"], MaxKeys)
        return out

    def list_objects_v2(self, **kw):
        return self._list_all(**kw)

    def get_paginator(self, name):
        assert name == "list_objects_v2"
        return _FakePaginator(self)


class _S3PathShim:
    """Wraps S3Storage so the shared contract tests — which pass plain
    ``tmp_path`` POSIX strings — address ``s3://<bucket><path>`` keys.
    Only string positional args that look like absolute paths are
    rewritten; callables (update_atomic's fn) pass through untouched."""

    def __init__(self, inner):
        self._inner = inner

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if not callable(attr):
            return attr

        def wrap(*args, **kw):
            args = [f"s3://{BUCKET}{a}"
                    if isinstance(a, str) and a.startswith("/") else a
                    for a in args]
            return attr(*args, **kw)
        return wrap


@pytest.fixture
def fake_client():
    return FakeS3Client()


@pytest.fixture
def s3(fake_client):
    return S3Storage(client=fake_client, copy_workers=4)


class TestS3StorageContract(_ContractSuite):
    """The generic storage contract over S3Storage + fake client."""

    @pytest.fixture
    def storage(self, fake_client):
        return _S3PathShim(S3Storage(client=fake_client, copy_workers=4))

    def test_no_rename_semantics_on_object_store(self, tmp_path):
        pytest.skip("covered by the base ObjectStoreStorage param")


class TestS3LogOnBackend(_LogSuite):
    """The commit log folds identically over the S3 primitives."""

    @pytest.fixture
    def storage(self, fake_client):
        return _S3PathShim(S3Storage(client=fake_client, copy_workers=4))


class TestS3Primitives:
    def test_conditional_put_if_none_match(self, s3, fake_client):
        assert s3.create_exclusive(f"s3://{BUCKET}/t/commit-0", "a") is True
        # second writer loses the CAS — object unchanged
        assert s3.create_exclusive(f"s3://{BUCKET}/t/commit-0", "b") is False
        assert s3.read_text(f"s3://{BUCKET}/t/commit-0") == "a"

    def test_update_atomic_retries_on_etag_race(self, s3, fake_client):
        path = f"s3://{BUCKET}/t/pointer"
        s3.write_atomic(path, "v0")
        raced = {"done": False}

        def racing_get(bucket, key):
            # a competing writer bumps the object AFTER our read captured
            # its ETag, so the If-Match put must 412 and the loop re-read
            if not raced["done"]:
                raced["done"] = True
                fake_client.put_object(Bucket=bucket, Key=key, Body=b"raced")

        fake_client.on_get = racing_get
        result = s3.update_atomic(path, lambda cur: cur + "+mine")
        # fn was re-applied to the RACED value, not the stale first read
        assert result == "raced+mine"
        assert s3.read_text(path) == "raced+mine"

    def test_update_atomic_survives_transient_412(self, s3, fake_client):
        path = f"s3://{BUCKET}/t/pointer"
        s3.write_atomic(path, "v0")
        fake_client.fail_conditional_puts = 2
        assert s3.update_atomic(path, lambda cur: cur + "!") == "v0!"

    def test_list_paginates(self, s3, fake_client):
        # page_size=2 ⇒ 7 names arrive over 4 pages; all must surface
        for i in range(5):
            s3.write_atomic(f"s3://{BUCKET}/d/f{i}.json", str(i))
        s3.write_atomic(f"s3://{BUCKET}/d/sub/a.json", "a")
        s3.write_atomic(f"s3://{BUCKET}/d/sub2/b.json", "b")
        names = s3.list_dir(f"s3://{BUCKET}/d")
        assert names == ["f0.json", "f1.json", "f2.json", "f3.json",
                         "f4.json", "sub", "sub2"]

    def test_publish_dir_server_side_copies(self, s3, fake_client):
        for i in range(3):
            s3.write_atomic(f"s3://{BUCKET}/stage/date=1/p{i}", str(i))
        before = fake_client.put_count
        s3.publish_dir(f"s3://{BUCKET}/stage", f"s3://{BUCKET}/pub/v1")
        # publish is copy_object (server-side) — no client-side put of data
        assert fake_client.put_count == before
        assert s3.read_text(f"s3://{BUCKET}/pub/v1/date=1/p1") == "1"
        assert not s3.exists(f"s3://{BUCKET}/stage/date=1/p1")

    def test_s3a_scheme_accepted(self, s3):
        s3.write_atomic(f"s3a://{BUCKET}/x/y.json", "z")
        assert s3.read_text(f"s3://{BUCKET}/x/y.json") == "z"
        assert s3.spark_path(f"s3://{BUCKET}/x/y.json") == \
            f"s3a://{BUCKET}/x/y.json"

    def test_missing_key_raises_filenotfound(self, s3):
        with pytest.raises(FileNotFoundError):
            s3.read_text(f"s3://{BUCKET}/nope")


class TestS3WalkAndPickle:
    def test_walk_includes_key_that_is_both_object_and_prefix(
            self, s3, fake_client):
        """On S3, 'a' and 'a/b' can coexist; a delimited child-walk would
        classify 'a' as prefix-only and silently skip the object. The flat
        non-delimited LIST must return both."""
        fake_client.put_object(BUCKET, "root/a", b"obj")
        fake_client.put_object(BUCKET, "root/a/b", b"nested")
        assert s3._walk_files(f"s3://{BUCKET}/root") == ["a", "a/b"]

    def test_bulk_delete_used_by_remove_tree(self, s3, fake_client):
        for i in range(5):
            fake_client.put_object(BUCKET, f"rt/f{i}", b"x")
        s3.remove_tree(f"s3://{BUCKET}/rt")
        assert not [k for (_, k) in fake_client.objects if k.startswith("rt/")]

    def test_conditional_put_retries_on_409(self, s3, fake_client):
        """409 ConditionalRequestConflict leaves the outcome UNKNOWN (the
        key may remain absent): create_exclusive must probe-and-retry,
        never treat the slot as claimed — a skipped slot breaks the
        commit log's dense-sequence invariant."""
        fake_client.fail_conditional_409 = 1
        assert s3.create_exclusive(f"s3://{BUCKET}/log/409.json", "payload")
        assert s3.read_text(f"s3://{BUCKET}/log/409.json") == "payload"
        # 409 racing a put that DID land: resolves to 'claimed'
        fake_client.put_object(BUCKET, "log/409b.json", b"winner")
        fake_client.fail_conditional_409 = 1
        assert not s3.create_exclusive(f"s3://{BUCKET}/log/409b.json", "x")

    def test_bulk_delete_surfaces_per_key_failures(self, s3, fake_client):
        """DeleteObjects reports per-key failures in the response body, not
        as an exception — swallowing them makes vacuum report dirs as
        removed while the data persists. The storage must raise."""
        for i in range(3):
            fake_client.put_object(BUCKET, f"bd/f{i}", b"x")
        fake_client.fail_delete_keys = {"bd/f1"}
        with pytest.raises(OSError, match="AccessDenied"):
            s3.remove_tree(f"s3://{BUCKET}/bd")

    def test_custom_client_refuses_pickling(self, s3):
        import pickle

        with pytest.raises(TypeError, match="custom boto3 client"):
            pickle.dumps(s3)
