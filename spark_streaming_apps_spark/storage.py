"""FileStore: the storage seam under every ACID commit fence.

Every atomicity guarantee in the table layer reduces to three storage
primitives, isolated here behind one interface (Delta's LogStore
pattern — io.delta.storage.LogStore exists for exactly this reason):

* ``create_exclusive(path, data)`` — the COMMIT FENCE: publish a small
  metadata file iff absent, atomically; exactly one concurrent writer
  wins. This is what makes a manifest/catalog-entry/claim swap safe
  (reference analog: the transactional claim, FileWorkerApp.scala:
  207-227).
* ``link_or_copy(src, dst)`` — share an IMMUTABLE data file into a new
  commit dir without rewriting it (clone/convert).
* ``atomic_replace(tmp, final)`` — last-writer-wins replace for
  DERIVED data only (the ``_latest`` hint, parquet checkpoints):
  readers must never see a torn file, but losing a race only costs a
  lagging hint, never correctness.

Two implementations ship:

* :class:`PosixFileStore` (default) — ``open(..., "x")`` (O_CREAT|
  O_EXCL), ``os.link`` hardlinks, ``rename``-replace. Correct on local
  filesystems, NFSv4+, and HDFS mounted with POSIX semantics.
* :class:`RenameFileStore` — for stores WITHOUT hardlinks or O_EXCL
  open but WITH atomic no-overwrite rename (HDFS's
  ``FileContext.rename(..., Options.Rename.NONE)`` contract): the
  fence stages a temp file and atomically renames it onto the final
  path, failing if the destination exists; immutable files are COPIED
  (the real degradation on such stores — clone/convert pay O(bytes)
  instead of O(files)).

Object stores (S3/GCS) have NEITHER primitive natively; their
implementation maps ``create_exclusive`` to a conditional PUT
(``If-None-Match: *`` / ``x-goog-if-generation-match: 0``) or an
external CAS (Delta's DynamoDB LogStore), and ``link_or_copy`` to a
server-side COPY. The seam is the point: the ACID layer calls these
three verbs and nothing else, so porting to a new store is one class,
not an audit of every commit path.

Selection: ``set_store()`` / the ``SPARK_GRAFT_FILESTORE`` env var
(``posix`` | ``rename``). Data-plane IO (parquet writes/scans) never
goes through this seam — only the metadata fences do, so the
indirection costs nothing per row.
"""

from __future__ import annotations

import ctypes
import errno
import os
import shutil
import uuid
from pathlib import Path

__all__ = ["FileStore", "PosixFileStore", "RenameFileStore",
           "FaultyFileStore", "TransientStoreError",
           "get_store", "set_store", "crash_point"]


def crash_point(name: str) -> None:
    """Fault-injection seam for crash-recovery tests: when the
    ``SPARK_GRAFT_CRASH_POINT`` env var names this point, the process
    dies by SIGKILL — no exception handlers, no ``finally`` cleanup,
    exactly a writer crash at this boundary. One env-dict read when
    unset, so the production cost is nil. Points are planted at every
    stage boundary of the commit protocol (data staged, sidecars
    staged, change files staged, either side of the manifest fence,
    before the catalog pin); tests/test_crash_injection.py drives a
    subprocess writer into each and asserts the reader/vacuum/retry
    invariants the protocol claims."""
    if os.environ.get("SPARK_GRAFT_CRASH_POINT") == name:
        import signal
        os.kill(os.getpid(), signal.SIGKILL)


class FileStore:
    """The three-verb storage contract every commit path routes through."""

    name = "abstract"

    def create_exclusive(self, path, data: str) -> bool:
        """Atomically create ``path`` holding ``data`` iff it does not
        exist. Returns True if THIS caller created it, False if the
        path already existed (a concurrent writer won). Must never
        leave a partially-visible file at ``path``."""
        raise NotImplementedError

    def link_or_copy(self, src, dst) -> None:
        """Make the immutable file ``src`` available at ``dst``.
        Implementations may hardlink (O(1)) or copy (O(bytes)); callers
        must treat both ends as immutable afterwards."""
        raise NotImplementedError

    def atomic_replace(self, tmp, final) -> None:
        """Atomically replace ``final`` with the fully-written ``tmp``
        (last writer wins). For derived/advisory data only — the caller
        must tolerate losing the race."""
        raise NotImplementedError


class PosixFileStore(FileStore):
    """O_EXCL + hardlinks + rename: the POSIX-semantics default."""

    name = "posix"

    def create_exclusive(self, path, data: str) -> bool:
        # stage + hardlink-publish, NOT open(O_EXCL)+write: link() is
        # the atomic O_EXCL primitive whose target appears FULLY
        # WRITTEN or not at all. The naive open("x")+write exposes a
        # torn window — a concurrent reader that stats the manifest
        # between create and write reads 0 bytes / partial JSON, and a
        # writer crash inside the window leaves a permanently corrupt
        # "committed" version. Caught by the 4-process contention test.
        path = Path(path)
        tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex[:8]}.x")
        tmp.write_text(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)

    def link_or_copy(self, src, dst) -> None:
        try:
            os.link(src, dst)
        except OSError as e:
            if e.errno not in (errno.EXDEV, errno.EPERM, errno.EMLINK):
                raise
            # cross-device / link-forbidden mount: degrade to a copy
            shutil.copy2(src, dst)

    def atomic_replace(self, tmp, final) -> None:
        Path(tmp).replace(final)


_RENAME_NOREPLACE = 1  # linux/include/uapi/linux/fs.h


def _rename_noreplace(src: str, dst: str) -> None:
    """Atomic no-overwrite rename — renameat2(..., RENAME_NOREPLACE)
    on Linux (one syscall, kernel-atomic); emulated with a hardlink+
    unlink pair elsewhere (same visible contract: fails with EEXIST
    when dst exists, dst appears fully-written or not at all).

    CAVEAT: the non-Linux fallback uses os.link, which contradicts
    RenameFileStore's no-hardlink premise — unreachable on Linux
    (renameat2 always resolves), so today it documents intent rather
    than behavior; a macOS/mount port of the rename store must replace
    it with the platform's own no-replace rename (RENAME_EXCL on
    Darwin) before the no-hardlink claim holds there."""
    libc = getattr(_rename_noreplace, "_libc", None)
    if libc is None:
        try:
            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            libc.renameat2  # probe
        except (OSError, AttributeError):
            libc = False
        _rename_noreplace._libc = libc
    if libc:
        AT_FDCWD = -100
        r = libc.renameat2(AT_FDCWD, src.encode(), AT_FDCWD,
                           dst.encode(), _RENAME_NOREPLACE)
        if r != 0:
            err = ctypes.get_errno()
            raise OSError(err, os.strerror(err), dst)
        return
    os.link(src, dst)       # emulation: link fails if dst exists
    os.unlink(src)


class RenameFileStore(FileStore):
    """No hardlinks, no O_EXCL open — the HDFS-contract store: the
    fence is stage + atomic no-overwrite rename; immutable sharing is
    a copy."""

    name = "rename"

    def create_exclusive(self, path, data: str) -> bool:
        path = Path(path)
        if path.exists():       # cheap fast-path; the rename still fences
            return False
        tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex[:8]}.stage")
        tmp.write_text(data)
        try:
            _rename_noreplace(str(tmp), str(path))
            return True
        except FileExistsError:
            tmp.unlink(missing_ok=True)
            return False
        except OSError as e:
            tmp.unlink(missing_ok=True)
            if e.errno == errno.EEXIST:
                return False
            raise

    def link_or_copy(self, src, dst) -> None:
        shutil.copy2(src, dst)

    def atomic_replace(self, tmp, final) -> None:
        # plain rename IS atomic-replace on rename-capable stores
        Path(tmp).replace(final)


class TransientStoreError(OSError):
    """A 503-style retriable failure injected by FaultyFileStore."""


class FaultyFileStore(FileStore):
    """Object-store semantics TEST DOUBLE: proves the 3-verb seam is
    sufficient for the store class it was designed for (S3/GCS with a
    conditional-PUT fence). Semantics modeled:

    * ``create_exclusive`` = conditional PUT (``If-None-Match: *``).
      A fault may land before OR after the server applied the PUT; a
      client retry that then sees the key existing resolves ownership
      by CONTENT equality (the etag discipline Delta's S3 LogStores
      use) — byte-identical content means our payload won, so the
      retry reports success instead of a phantom lost race.
    * ``link_or_copy`` = server-side COPY, O(bytes). Never a hardlink
      (object stores have no inodes).
    * ``atomic_replace`` = unconditional PUT (last writer wins).
    * Every call pays injected latency and every ``fail_every``-th
      call raises a transient 503 that the client-side retry loop
      (the SDK discipline) absorbs with bounded retries.

    The double is deterministic (a call counter, no clocks/randomness)
    so failures land on different verbs across a run, and it counts
    ``faults``/``calls`` for assertions. NOT for multi-writer races
    across processes — each instance is its own 'server'; contention
    tests share one instance across threads."""

    name = "faulty"

    def __init__(self, fail_every: int = 7,
                 latency_s: float = 0.001, max_retries: int = 6):
        self.fail_every = fail_every
        self.latency_s = latency_s
        self.max_retries = max_retries
        self.calls = 0
        self.faults = 0

    def _roll(self) -> None:
        import time
        if self.latency_s:
            time.sleep(self.latency_s)
        self.calls += 1
        if self.fail_every and self.calls % self.fail_every == 0:
            self.faults += 1
            raise TransientStoreError("503 slow down (injected)")

    def _retrying(self, fn):
        last = None
        for _ in range(self.max_retries):
            try:
                self._roll()
                return fn()
            except TransientStoreError as e:
                last = e
                continue
        raise last

    def create_exclusive(self, path, data: str) -> bool:
        path = Path(path)

        def put():
            # the server's internal atomicity (a real store provides
            # this server-side); fault injection may fire between
            # apply and response via the NEXT _roll of a retry
            tmp = path.with_name(
                f".{path.name}.{uuid.uuid4().hex[:8]}.put")
            tmp.write_text(data)
            try:
                _rename_noreplace(str(tmp), str(path))
                # response leg: a fault HERE is a success lost on the
                # wire — the retry's conditional PUT sees the key and
                # the etag check resolves it as our win
                self._roll()
                return True
            except (FileExistsError, OSError) as e:
                tmp.unlink(missing_ok=True)
                if isinstance(e, FileExistsError) or \
                        getattr(e, "errno", None) == errno.EEXIST:
                    # precondition failed — OURS iff content matches
                    # (etag self-win resolution for retried PUTs)
                    try:
                        return path.read_text() == data
                    except OSError:
                        return False
                raise
        return self._retrying(put)

    def link_or_copy(self, src, dst) -> None:
        self._retrying(lambda: shutil.copy2(src, dst))

    def atomic_replace(self, tmp, final) -> None:
        self._retrying(lambda: Path(tmp).replace(final))


_STORES = {"posix": PosixFileStore, "rename": RenameFileStore,
           "faulty": FaultyFileStore}
_ACTIVE: FileStore | None = None


def get_store() -> FileStore:
    """The process-wide FileStore: explicit ``set_store`` wins, else
    the ``SPARK_GRAFT_FILESTORE`` env var, else POSIX."""
    global _ACTIVE
    if _ACTIVE is None:
        name = os.environ.get("SPARK_GRAFT_FILESTORE", "posix").lower()
        cls = _STORES.get(name)
        if cls is None:
            raise ValueError(
                f"unknown SPARK_GRAFT_FILESTORE {name!r}; "
                f"expected one of {sorted(_STORES)}")
        _ACTIVE = cls()
    return _ACTIVE


def set_store(store: FileStore | str | None) -> FileStore | None:
    """Install a FileStore (instance or registered name); ``None``
    resets to env/default resolution. Returns the PREVIOUS store so
    tests can restore it."""
    global _ACTIVE
    prev = _ACTIVE
    if store is None:
        _ACTIVE = None
    elif isinstance(store, str):
        _ACTIVE = _STORES[store]()
    else:
        _ACTIVE = store
    return prev
