"""Storage abstraction: every filesystem touch of the engine goes through one
of these backends, so the commit log and publish protocol run unchanged on
POSIX disks and on object stores.

The reference achieves storage independence by riding Hadoop's ``FileSystem``
API (``spark/src/main/scala/com/gu/tableversions/spark/filesystem/
VersionedFileSystem.scala:36-98`` proxies an arbitrary underlying scheme).
This engine's data plane already does the same — Spark reads/writes the
parquet dirs through Hadoop, so ``s3a://`` paths work there for free. What
needs an explicit abstraction is the *metadata and publish plane*: the commit
log's compare-and-set, the pointer write, staging-dir publication, and
append-mode file linking, which round 1 hard-wired to ``os.rename`` /
``os.link`` / ``O_CREAT|O_EXCL``.

Three semantics-distinct backends:

- :class:`LocalStorage` — POSIX. Atomic rename, hardlinks, ``O_EXCL`` CAS.
- :class:`ObjectStoreStorage` — object-store SEMANTICS (emulatable on a local
  directory for tests): **no rename** (publish = per-file copy + delete
  source), **no hardlinks** (copy), CAS = conditional put (S3
  ``If-None-Match: *`` / GCS ``ifGenerationMatch=0``), atomic-overwrite PUT
  (readers see old or new object, never partial — so no tmp+rename dance).
- :class:`MemoryStorage` — in-process dict with the same object-store
  semantics; for metadata-plane unit tests with no Spark involved.

:class:`S3Storage` (bottom of this module) subclasses
:class:`ObjectStoreStorage` and swaps in boto3 primitives
(`_get/_put/_put_if_absent/_copy/_list`); the publish/CAS *protocol* above
them is exactly what the emulated backend exercises, and the executable
contract both must satisfy is ``tests/test_storage.py``. boto3 is not
bundled in this environment, so S3Storage imports it lazily and its
primitives are untested here; everything above the primitive layer is.

Scale notes (100 TB):

- Publish cost: LocalStorage publishes a partition in O(1) renames;
  ObjectStoreStorage in O(#files) server-side copies, parallelized with a
  thread pool (S3 COPY is a metadata operation up to 5 GB/object; with
  ``maxRecordsPerFile``-sized outputs a 1000-file partition publishes in a
  few round-trip batches). This matches the Hadoop S3A committers' magic/
  staging trade-off.
- The commit CAS is one small PUT per commit regardless of data volume.
- LIST calls are paginated by the real store; the emulation's ``list_dir``
  contract (names, not paths; missing dir = empty) is pagination-friendly.
"""

from __future__ import annotations

import io
import os
import shutil
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor


def _strip_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


class Storage:
    """Interface. Paths are plain strings; backends may accept scheme-full
    paths (``file:/x``). All ``list_dir`` results are NAMES, not paths."""

    # -- small objects (metadata plane) -------------------------------------

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        """Child names (files and dirs) of ``path``; [] if missing."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def open_input(self, path: str):
        """Binary file-like for reading (parquet footers etc.)."""
        raise NotImplementedError

    def open_output(self, path: str):
        """Binary file-like for writing one data file; the write becomes
        visible at ``close()`` (direct file on POSIX, buffered PUT on
        object stores). For files inside uncommitted version dirs —
        invisible to readers until the commit record lands — so no
        stronger atomicity is needed."""
        raise NotImplementedError

    def file_size(self, path: str) -> int:
        """Size in bytes of a single file/object (0 if unknown)."""
        raise NotImplementedError

    def file_mtime(self, path: str) -> "float | None":
        """Last-modified epoch seconds of a file/object, or None when the
        backend cannot tell (callers must treat None as 'unknown', never
        as old or new)."""
        return None

    def write_atomic(self, path: str, data: str) -> None:
        """Overwrite so that readers never observe partial content."""
        raise NotImplementedError

    def create_exclusive(self, path: str, data: str) -> bool:
        """Atomic create-if-absent — the commit CAS. True iff we created it."""
        raise NotImplementedError

    def update_atomic(self, path: str, fn) -> str | None:
        """Store-side serialized read-modify-write: ``fn(current: str | None)
        -> str | None`` — return new content, or None to leave unchanged.
        Returns the content ``fn`` produced (or saw, when unchanged). Used
        for the current-version pointer, whose advance must be monotone
        under racing writers. Local: flock; S3: If-Match ETag CAS loop."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove a single file; missing is not an error."""
        raise NotImplementedError

    # -- data directories (publish plane) ------------------------------------

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def publish_dir(self, src: str, dst: str) -> None:
        """Move a finished staging subtree to its final location. ``dst``'s
        parent may not exist; ``dst`` itself must not."""
        raise NotImplementedError

    def link_or_copy(self, src: str, dst: str) -> None:
        """Make ``dst`` contain ``src``'s bytes as cheaply as possible
        (hardlink on POSIX, server-side copy on object stores)."""
        raise NotImplementedError

    def move_file(self, src: str, dst: str) -> None:
        """Move one file (rename on POSIX, copy+delete on object stores).
        ``dst``'s parent may not exist."""
        raise NotImplementedError

    def remove_tree(self, path: str) -> None:
        """Recursively delete; missing is not an error."""
        raise NotImplementedError

    # -- Spark integration ----------------------------------------------------

    def spark_path(self, path: str) -> str:
        """The form of ``path`` to hand to spark.read/write (scheme-full on
        real remote stores)."""
        return path



def _claim_via_link(path: str, data: bytes) -> bool:
    """Atomic create-if-absent on a local filesystem: stage the payload to
    a tmp file FIRST, then hardlink into place — link() is the atomic
    claim (EEXIST on a lost race) and the claimed file is complete by
    construction. O_EXCL-then-write would leave a truncated commit file if
    the writer dies mid-write, permanently bricking the log (the slot is
    claimed, unreadable, and unrepairable). Real object stores give this
    via atomic conditional PUT (If-None-Match: *). Shared by LocalStorage
    and the object-store emulation so the claim protocol cannot drift."""
    path = _strip_scheme(path)
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".claim-")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
            f.flush()
            # fsync BEFORE the link lands the name: without it a power
            # loss can leave the claimed slot pointing at truncated bytes
            # — exactly the bricked-log state this protocol exists to
            # rule out
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
    finally:
        os.unlink(tmp)


def _flock_update(path: str, fn, read_current, put_text) -> "str | None":
    """Serialized read-modify-write under an flock sidecar: the local
    analogue of S3's GET-ETag -> PUT If-Match loop. ``read_current``
    returns the current text or None; ``put_text`` persists the new
    value. Shared by both local backends so the locking protocol cannot
    drift."""
    import fcntl

    p = _strip_scheme(path)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p + ".lock", "a") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            current = read_current()
            new = fn(current)
            if new is not None:
                put_text(new)
                return new
            return current
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


class LocalStorage(Storage):
    """POSIX backend — the round-1 behavior, verbatim."""

    def exists(self, path):
        return os.path.exists(_strip_scheme(path))

    def is_dir(self, path):
        return os.path.isdir(_strip_scheme(path))

    def list_dir(self, path):
        path = _strip_scheme(path)
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def read_text(self, path):
        with open(_strip_scheme(path)) as f:
            return f.read()

    def open_input(self, path):
        return open(_strip_scheme(path), "rb")

    def open_output(self, path):
        path = _strip_scheme(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return open(path, "wb")

    def file_size(self, path):
        try:
            return os.path.getsize(_strip_scheme(path))
        except OSError:
            return 0

    def file_mtime(self, path):
        try:
            return os.path.getmtime(_strip_scheme(path))
        except OSError:
            return None

    def write_atomic(self, path, data):
        path = _strip_scheme(path)
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=".json")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(data)
                f.flush()
                # fsync before the rename makes the name visible: a crash
                # must never surface an empty/truncated pointer or meta
                # file (the rename itself may be lost — that only leaves
                # the previous value, which is consistent)
                os.fsync(f.fileno())
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def create_exclusive(self, path, data):
        return _claim_via_link(path, data.encode("utf-8"))

    def update_atomic(self, path, fn):
        return _flock_update(
            path, fn,
            read_current=lambda: (self.read_text(path)
                                  if os.path.exists(_strip_scheme(path))
                                  else None),
            put_text=lambda new: self.write_atomic(path, new))

    def delete(self, path):
        try:
            os.unlink(_strip_scheme(path))
        except FileNotFoundError:
            pass

    def makedirs(self, path):
        os.makedirs(_strip_scheme(path), exist_ok=True)

    def publish_dir(self, src, dst):
        src, dst = _strip_scheme(src), _strip_scheme(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(src, dst)

    def link_or_copy(self, src, dst):
        src, dst = _strip_scheme(src), _strip_scheme(dst)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    def move_file(self, src, dst):
        src, dst = _strip_scheme(src), _strip_scheme(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)

    def remove_tree(self, path):
        shutil.rmtree(_strip_scheme(path), ignore_errors=True)


class ObjectStoreStorage(Storage):
    """Object-store semantics over primitive byte ops.

    The default primitives target a local directory (the *emulation*: tests
    run the full engine with object-store semantics — no rename, no links,
    conditional-put CAS — while Spark still reads/writes the same local
    paths). A real SDK backend (see ``S3Storage``) overrides the
    ``_``-prefixed primitives AND the local-FS conveniences the emulation
    inherits for free — ``file_size``, ``update_atomic``, ``makedirs``,
    ``_is_prefix``/``_exists_key``/``_list``/``_walk_files``,
    ``_cleanup_prefix``, ``_get_range`` — i.e. everything that touches
    ``os.*`` here; the publish/CAS *protocol* methods (``publish_dir``,
    ``create_exclusive`` wiring, ``remove_tree``, ``open_input``/
    ``open_output``) are what's actually inherited. Use ``S3Storage`` as
    the authoritative checklist when adding a backend.

    ``copy_workers`` parallelizes per-file publish copies, the way a real
    backend would issue concurrent server-side COPY requests.
    """

    def __init__(self, copy_workers: int = 16):
        self.copy_workers = copy_workers

    # ---- primitives a real SDK backend overrides ----------------------------

    def _get(self, path: str) -> bytes:
        with open(_strip_scheme(path), "rb") as f:
            return f.read()

    def _put(self, path: str, data: bytes) -> None:
        path = _strip_scheme(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # emulate PUT atomicity (readers see old or new object) with
        # write-to-tmp + replace; a real object store gives this natively
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".put-")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        except BaseException:
            # never leave the temp inside the destination tree: a later
            # _walk_files would treat the junk .put-* as a real key
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _put_if_absent(self, path: str, data: bytes) -> bool:
        """Conditional put: S3 ``If-None-Match: *``. True iff created.
        Emulated via the shared stage-tmp-then-link claim."""
        return _claim_via_link(path, data)

    def _copy(self, src: str, dst: str) -> None:
        """Server-side copy (S3 CopyObject). The local emulation streams
        chunked (copyfile) instead of buffering whole files: publish_dir
        runs up to copy_workers of these concurrently, and whole-file
        buffers would hold GBs in RAM for a large-partition publish."""
        src_p, dst_p = _strip_scheme(src), _strip_scheme(dst)
        os.makedirs(os.path.dirname(dst_p), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst_p),
                                   prefix=".put-")
        os.close(fd)
        try:
            shutil.copyfile(src_p, tmp)
            os.replace(tmp, dst_p)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _delete(self, path: str) -> None:
        try:
            os.unlink(_strip_scheme(path))
        except FileNotFoundError:
            pass

    def _list(self, path: str) -> list[str]:
        """Immediate child names under prefix ``path`` (LIST with
        delimiter='/'); [] if none."""
        path = _strip_scheme(path)
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def _is_prefix(self, path: str) -> bool:
        """Any key under ``path`` (object stores have no directories)."""
        return os.path.isdir(_strip_scheme(path))

    def _exists_key(self, path: str) -> bool:
        return os.path.isfile(_strip_scheme(path))

    # ---- protocol (inherited by real backends) -------------------------------

    def exists(self, path):
        return self._exists_key(path) or self._is_prefix(path)

    def is_dir(self, path):
        return self._is_prefix(path)

    def list_dir(self, path):
        return self._list(path)

    def read_text(self, path):
        return self._get(path).decode("utf-8")

    def _get_range(self, path: str, start: int, length: int) -> bytes:
        """Ranged GET (S3 ``Range: bytes=...``). Emulation: seek+read."""
        with open(_strip_scheme(path), "rb") as f:
            f.seek(start)
            return f.read(length)

    def open_input(self, path):
        # lazy seekable reader over ranged GETs: a parquet FOOTER read (or
        # a column-pruned read) fetches only the byte ranges pyarrow asks
        # for instead of downloading the whole object — the difference
        # between O(file) and O(footer) per file at commit/stats time
        return io.BufferedReader(_RangedReader(self, path),
                                 buffer_size=1 << 16)

    def open_output(self, path):
        return _PutOnClose(self, path)

    def file_size(self, path):
        try:
            return os.path.getsize(_strip_scheme(path))
        except OSError:
            return 0

    def file_mtime(self, path):
        try:
            return os.path.getmtime(_strip_scheme(path))
        except OSError:
            return None

    def write_atomic(self, path, data):
        self._put(path, data.encode("utf-8"))

    def create_exclusive(self, path, data):
        return self._put_if_absent(path, data.encode("utf-8"))

    def update_atomic(self, path, fn):
        # Emulation: flock beside the object. A real backend loops
        # GET (capturing ETag) → fn → PUT with If-Match until the
        # conditional write succeeds — same serialized semantics.
        return _flock_update(
            path, fn,
            read_current=lambda: (self.read_text(path)
                                  if self._exists_key(path) else None),
            put_text=lambda new: self._put(path, new.encode("utf-8")))

    def delete(self, path):
        self._delete(path)

    def makedirs(self, path):
        # object stores have no directories; the emulation needs real ones
        # only so Spark's local-FS writer can target them
        os.makedirs(_strip_scheme(path), exist_ok=True)

    def _walk_files(self, root: str) -> list[str]:
        """All file keys under prefix ``root``, as paths relative to it.

        ONE recursive enumeration — never a per-child existence/prefix
        probe (on a real object store that's one non-delimited paginated
        LIST; see the S3 override). A flat key listing also cannot miss a
        key that is simultaneously an object and a prefix of deeper keys
        ('a' and 'a/b' coexisting), which a delimited child-walk would
        classify as prefix-only and silently skip."""
        root_s = _strip_scheme(root)
        out: list[str] = []
        for dirpath, _dirs, files in os.walk(root_s):
            rel_base = os.path.relpath(dirpath, root_s)
            for f in files:
                out.append(f if rel_base == "." else
                           f"{rel_base.replace(os.sep, '/')}/{f}")
        return sorted(out)

    def _delete_many(self, paths: list[str]) -> None:
        """Bulk delete: concurrent single deletes by default; real
        backends override with native batch calls (S3 DeleteObjects)."""
        if not paths:
            return
        with ThreadPoolExecutor(max_workers=self.copy_workers) as pool:
            list(pool.map(self._delete, paths))

    def publish_dir(self, src, dst):
        """No rename on an object store: copy each staged object to its
        final key (concurrent server-side copies), then delete the staging
        keys (bulk). Readers can't observe the half-published prefix
        because nothing references it until the commit record lands — the
        log, not the directory move, is the atomicity point."""
        files = self._walk_files(src)
        with ThreadPoolExecutor(max_workers=self.copy_workers) as pool:
            list(pool.map(
                lambda rel: self._copy(os.path.join(src, rel),
                                       os.path.join(dst, rel)), files))
        self._delete_many([os.path.join(src, rel) for rel in files])
        self._cleanup_prefix(src)

    def _cleanup_prefix(self, path: str) -> None:
        # a real object store has nothing left once the keys are deleted;
        # the local emulation leaves empty dirs behind — clear them
        shutil.rmtree(_strip_scheme(path), ignore_errors=True)

    def link_or_copy(self, src, dst):
        self._copy(src, dst)

    def move_file(self, src, dst):
        self._copy(src, dst)
        self._delete(src)

    def remove_tree(self, path):
        self._delete_many([os.path.join(path, rel)
                           for rel in self._walk_files(path)])
        self._cleanup_prefix(path)


class _RangedReader(io.RawIOBase):
    """Seekable read-only file over an object store's ranged GETs —
    every ``read`` maps to one ``_get_range``; wrap in a BufferedReader
    so pyarrow's many small footer reads coalesce."""

    def __init__(self, storage: ObjectStoreStorage, path: str):
        self._storage = storage
        self._path = path
        self._size = storage.file_size(path)
        if self._size == 0 and not storage._exists_key(path):
            # parity with LocalStorage.open_input: a missing object is an
            # error, not a successful empty stream
            raise FileNotFoundError(path)
        self._pos = 0

    def readable(self):
        return True

    def seekable(self):
        return True

    def seek(self, offset, whence=io.SEEK_SET):
        if whence == io.SEEK_SET:
            pos = offset
        elif whence == io.SEEK_CUR:
            pos = self._pos + offset
        elif whence == io.SEEK_END:
            pos = self._size + offset
        else:
            raise ValueError(f"invalid whence: {whence}")
        if pos < 0:
            # io contract: negative positions raise — storing one would
            # later issue a malformed negative-start ranged GET
            raise ValueError(f"negative seek position {pos}")
        self._pos = pos
        return self._pos

    def tell(self):
        return self._pos

    def readinto(self, b):
        n = min(len(b), max(self._size - self._pos, 0))
        if n <= 0:
            return 0
        data = self._storage._get_range(self._path, self._pos, n)
        b[:len(data)] = data
        self._pos += len(data)
        return len(data)


class _PutOnClose(io.BytesIO):
    """Buffered object-store write: bytes accumulate locally, one PUT at
    close — the shape every object-store writer has (no partial keys)."""

    def __init__(self, storage: ObjectStoreStorage, path: str):
        super().__init__()
        self._storage = storage
        self._path = path

    def close(self):
        if not self.closed:
            self._storage._put(self._path, self.getvalue())
        super().close()


class MemoryStorage(ObjectStoreStorage):
    """Dict-backed object store for metadata-plane unit tests (no Spark).
    Keys are absolute paths; conditional put is lock-protected, modeling the
    store-side atomicity of S3's ``If-None-Match``."""

    def __init__(self):
        super().__init__(copy_workers=4)
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def _norm(self, path: str) -> str:
        return _strip_scheme(path).rstrip("/")

    def _get(self, path):
        try:
            return self._objects[self._norm(path)]
        except KeyError:
            raise FileNotFoundError(path) from None

    def _put(self, path, data):
        with self._lock:
            self._objects[self._norm(path)] = data

    def _put_if_absent(self, path, data):
        with self._lock:
            key = self._norm(path)
            if key in self._objects:
                return False
            self._objects[key] = data
            return True

    def _get_range(self, path, start, length):
        return self._get(path)[start:start + length]

    def _delete(self, path):
        with self._lock:
            self._objects.pop(self._norm(path), None)

    def _copy(self, src, dst):
        # dict-to-dict: the base class's chunked local-file copy does not
        # apply to in-memory objects
        self._put(dst, self._get(src))

    def _list(self, path):
        prefix = self._norm(path) + "/"
        names = set()
        with self._lock:  # concurrent _put/_delete mutate the dict
            for key in self._objects:
                if key.startswith(prefix):
                    names.add(key[len(prefix):].split("/", 1)[0])
        return sorted(names)

    def _is_prefix(self, path):
        prefix = self._norm(path) + "/"
        with self._lock:
            return any(k.startswith(prefix) for k in self._objects)

    def _walk_files(self, root):
        # flat key scan — the in-memory analogue of S3's non-delimited
        # LIST (the base class walks the local filesystem)
        prefix = self._norm(root) + "/"
        with self._lock:
            return sorted(k[len(prefix):] for k in self._objects
                          if k.startswith(prefix))

    def _exists_key(self, path):
        return self._norm(path) in self._objects

    def file_size(self, path):
        obj = self._objects.get(self._norm(path))
        return len(obj) if obj is not None else 0

    def update_atomic(self, path, fn):
        with self._lock:
            key = self._norm(path)
            current = self._objects.get(key)
            current = current.decode("utf-8") if current is not None else None
            new = fn(current)
            if new is not None:
                self._objects[key] = new.encode("utf-8")
                return new
            return current

    def makedirs(self, path):
        pass  # no directories in an object store

    def _cleanup_prefix(self, path):
        pass


DEFAULT_STORAGE = LocalStorage()


class S3Storage(ObjectStoreStorage):
    """Amazon-S3 backend: the :class:`ObjectStoreStorage` protocol over
    boto3 primitives. Paths are ``s3://bucket/key`` (the data plane hands
    Spark the same paths as ``s3a://`` via :meth:`spark_path`).

    Concurrency primitives map to S3's conditional requests (both GA on S3
    and implemented by MinIO/GCS-interop):

    - ``create_exclusive`` → ``PutObject`` with ``If-None-Match: *`` — the
      commit-slot CAS; a lost race surfaces as HTTP 412.
    - ``update_atomic``   → ``GET`` (capture ETag) → ``PUT`` with
      ``If-Match: <etag>`` retry loop — the pointer's serialized
      read-modify-write.
    - ``publish_dir``     → concurrent server-side ``CopyObject`` (inherited
      protocol) — no data moves through the client.

    boto3 is not bundled in this environment, so this class is exercised
    against the contract indirectly: ``tests/test_storage.py`` pins the
    protocol via the local emulation, and this subclass only swaps the
    byte-level primitives.
    """

    def __init__(self, copy_workers: int = 16, client=None,
                 endpoint_url: "str | None" = None,
                 region: "str | None" = None):
        """``endpoint_url``/``region`` configure an S3-compatible store
        (MinIO, moto server, on-prem gateways) as PLAIN data — unlike a
        prebuilt ``client=``, they survive pickling, so executors rebuild
        an identically-pointed client (see ``__reduce__``)."""
        super().__init__(copy_workers=copy_workers)
        self._custom_client = client is not None
        self.endpoint_url = endpoint_url
        self.region = region
        if client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "S3Storage requires boto3 (pip install boto3), or pass "
                    "a preconfigured client=") from e
            kwargs = {}
            if endpoint_url:
                kwargs["endpoint_url"] = endpoint_url
            if region:
                kwargs["region_name"] = region
            client = boto3.client("s3", **kwargs)
        self._s3 = client

    @staticmethod
    def _parse(path: str) -> tuple[str, str]:
        if path.startswith("s3a://"):
            path = "s3://" + path[len("s3a://"):]
        if not path.startswith("s3://"):
            raise ValueError(f"S3Storage paths must be s3:// URIs: {path!r}")
        bucket, _, key = path[len("s3://"):].partition("/")
        return bucket, key.rstrip("/")

    def spark_path(self, path: str) -> str:
        # Spark's Hadoop S3 connector uses the s3a:// scheme
        return "s3a://" + path[len("s3://"):] if path.startswith("s3://") else path

    # ---- primitives -------------------------------------------------------

    def _get(self, path):
        bucket, key = self._parse(path)
        try:
            return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()
        except self._s3.exceptions.NoSuchKey:
            raise FileNotFoundError(path) from None

    def _get_range(self, path, start, length):
        bucket, key = self._parse(path)
        resp = self._s3.get_object(
            Bucket=bucket, Key=key,
            Range=f"bytes={start}-{start + length - 1}")
        return resp["Body"].read()

    def _put(self, path, data):
        bucket, key = self._parse(path)
        self._s3.put_object(Bucket=bucket, Key=key, Body=data)

    # bounded CAS retries: racing conditional PUTs on ONE key produce
    # sustained 409s; an unbounded immediate-retry loop amplifies exactly
    # that contention (full-payload re-PUTs in a tight loop) and hangs
    # forever against a store that 409s persistently. Exponential backoff
    # with jitter, hard attempt cap, loud error after.
    _CAS_ATTEMPTS = 64

    @staticmethod
    def _cas_backoff(attempt: int) -> None:  # pragma: no cover - timing
        import random
        import time

        time.sleep(min(0.025 * (2 ** min(attempt, 6)), 1.6)
                   * (0.5 + random.random()))

    def _put_if_absent(self, path, data):
        bucket, key = self._parse(path)
        for attempt in range(self._CAS_ATTEMPTS):
            try:
                self._s3.put_object(Bucket=bucket, Key=key, Body=data,
                                    IfNoneMatch="*")
                return True
            except self._s3.exceptions.ClientError as e:  # pragma: no cover
                code = e.response["ResponseMetadata"]["HTTPStatusCode"]
                if code == 412:
                    return False  # key exists: the slot is claimed
                if code == 409:
                    # ConditionalRequestConflict: racing conditional PUTs,
                    # outcome UNKNOWN — the key may remain absent. Treating
                    # it as 'claimed' would skip a commit slot and break
                    # the log's dense-sequence invariant; probe and retry
                    # (update_atomic handles 409 the same way).
                    if self._exists_key(path):
                        return False
                    self._cas_backoff(attempt)
                    continue
                raise
        raise TimeoutError(  # pragma: no cover - requires persistent 409s
            f"conditional PUT of {path} still conflicted after "
            f"{self._CAS_ATTEMPTS} attempts — persistent "
            "ConditionalRequestConflict from the store")

    def update_atomic(self, path, fn):
        bucket, key = self._parse(path)
        for attempt in range(self._CAS_ATTEMPTS):
            etag = None
            current = None
            try:
                obj = self._s3.get_object(Bucket=bucket, Key=key)
                etag = obj["ETag"]
                current = obj["Body"].read().decode("utf-8")
            except self._s3.exceptions.NoSuchKey:
                pass
            new = fn(current)
            if new is None:
                return current
            try:
                if etag is None:
                    self._s3.put_object(Bucket=bucket, Key=key,
                                        Body=new.encode("utf-8"),
                                        IfNoneMatch="*")
                else:
                    self._s3.put_object(Bucket=bucket, Key=key,
                                        Body=new.encode("utf-8"),
                                        IfMatch=etag)
                return new
            except self._s3.exceptions.ClientError as e:  # pragma: no cover
                if e.response["ResponseMetadata"]["HTTPStatusCode"] in (409, 412):
                    # lost the CAS race: re-read and retry (with backoff —
                    # N writers on one key retry O(N²) times total without it)
                    self._cas_backoff(attempt)
                    continue
                raise
        raise TimeoutError(  # pragma: no cover - requires persistent races
            f"atomic update of {path} lost the CAS race "
            f"{self._CAS_ATTEMPTS} times in a row")

    def _copy(self, src, dst):
        sb, sk = self._parse(src)
        db, dk = self._parse(dst)
        self._s3.copy_object(Bucket=db, Key=dk,
                             CopySource={"Bucket": sb, "Key": sk})

    def _delete(self, path):
        bucket, key = self._parse(path)
        self._s3.delete_object(Bucket=bucket, Key=key)

    def _list(self, path):
        bucket, prefix = self._parse(path)
        prefix = prefix + "/" if prefix else ""
        names: set[str] = set()
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix,
                                       Delimiter="/"):
            for cp in page.get("CommonPrefixes", []):
                names.add(cp["Prefix"][len(prefix):].rstrip("/"))
            for obj in page.get("Contents", []):
                name = obj["Key"][len(prefix):]
                if name:
                    names.add(name)
        return sorted(names)

    def _is_prefix(self, path):
        bucket, prefix = self._parse(path)
        resp = self._s3.list_objects_v2(Bucket=bucket, Prefix=prefix + "/",
                                        MaxKeys=1)
        return resp.get("KeyCount", 0) > 0

    @staticmethod
    def _is_404(exc) -> bool:
        resp = getattr(exc, "response", None) or {}
        return (resp.get("ResponseMetadata", {}).get("HTTPStatusCode") == 404
                or resp.get("Error", {}).get("Code")
                in ("404", "NoSuchKey", "NotFound"))

    def _exists_key(self, path):
        bucket, key = self._parse(path)
        try:
            self._s3.head_object(Bucket=bucket, Key=key)
            return True
        except Exception as e:  # noqa: BLE001
            if self._is_404(e):
                return False
            # throttling/auth/transport errors must SURFACE — treating
            # them as "absent" silently skips vectors/stats/markers
            raise

    def file_size(self, path):
        bucket, key = self._parse(path)
        try:
            return self._s3.head_object(Bucket=bucket,
                                        Key=key)["ContentLength"]
        except Exception as e:  # noqa: BLE001
            if self._is_404(e):
                return 0
            raise

    def file_mtime(self, path):
        bucket, key = self._parse(path)
        try:
            return self._s3.head_object(
                Bucket=bucket, Key=key)["LastModified"].timestamp()
        except Exception as e:  # noqa: BLE001
            if self._is_404(e):
                return None
            raise

    def makedirs(self, path):
        pass  # no directories on S3

    def _cleanup_prefix(self, path):
        pass

    def _walk_files(self, root):
        """One non-delimited paginated LIST of the whole prefix — every
        file key in a single enumeration, no per-child round trips, and a
        key that is both an object and a prefix of deeper keys appears in
        Contents like any other."""
        bucket, prefix = self._parse(root)
        prefix = prefix + "/" if prefix else ""
        keys: list[str] = []
        paginator = self._s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
            for obj in page.get("Contents", []):
                rel = obj["Key"][len(prefix):]
                if rel and not rel.endswith("/"):
                    keys.append(rel)
        return sorted(keys)

    def _delete_many(self, paths):
        # native bulk delete: 1000 keys per DeleteObjects request instead
        # of one round trip per key
        by_bucket: dict[str, list[str]] = {}
        for p in paths:
            bucket, key = self._parse(p)
            by_bucket.setdefault(bucket, []).append(key)
        for bucket, keys in by_bucket.items():
            for i in range(0, len(keys), 1000):
                resp = self._s3.delete_objects(
                    Bucket=bucket,
                    Delete={"Objects": [{"Key": k}
                                        for k in keys[i:i + 1000]],
                            "Quiet": True})
                # Quiet mode still reports per-key failures in Errors —
                # the per-key delete_object this replaced raised on them,
                # and a silently-kept key means vacuum/publish report
                # success while the data persists
                errs = resp.get("Errors") or []
                if errs:
                    first = errs[0]
                    raise OSError(
                        f"S3 DeleteObjects left {len(errs)} key(s) "
                        f"undeleted in {bucket}; first: "
                        f"{first.get('Key')}: {first.get('Code')} "
                        f"{first.get('Message')}")

    def __reduce__(self):
        # executors get a fresh boto3 client on unpickle (clients hold
        # sockets/locks and cannot cross process boundaries). A CUSTOM
        # client (endpoint_url/credentials/region) cannot be rebuilt from
        # nothing — silently substituting boto3's defaults would point
        # executors at the wrong endpoint, so refuse loudly instead.
        if self._custom_client:
            raise TypeError(
                "S3Storage with a custom boto3 client cannot be pickled "
                "to executors; pass endpoint_url=/region= (plain data, "
                "rebuilt per worker) or configure credentials via the "
                "environment or AWS config files so a default "
                "boto3.client('s3') resolves them on every worker")
        return (S3Storage, (self.copy_workers, None,
                            self.endpoint_url, self.region))


def storage_from_name(name: "str | None") -> Storage:
    """Resolve a storage backend by the short name the ``tvx`` data source
    accepts as ``.option("storage", ...)``: ``local`` (default),
    ``object`` (object-store semantics emulated on local paths — the
    test/CI face), ``s3`` (boto3), or ``s3@<endpoint_url>`` for
    S3-compatible stores (MinIO, moto server) — the endpoint is plain
    data, so it reaches executors through the pickled backend.
    MemoryStorage is deliberately absent: its state lives in one process
    and executor writes would be lost."""
    key = (name or "").lower()
    if not key or key == "local":
        return DEFAULT_STORAGE
    if key in ("object", "objectstore"):
        return ObjectStoreStorage()
    if key == "s3":
        return S3Storage()
    if key.startswith("s3@"):
        return S3Storage(endpoint_url=name[len("s3@"):])
    raise ValueError(
        f"Unknown storage backend {name!r}; expected "
        "local | object | s3 | s3@<endpoint_url>")
