"""Atomic manifest-swap table: the engine's ACID commit protocol.

The reference guards its queue state with a manual JDBC transaction
(FileWorkerApp.scala:207-227: BEGIN; SELECT ... FOR UPDATE; UPDATE;
COMMIT).  A 100-TB Spark pipeline has no row store to lock, so this module
provides the table-format answer instead — the Delta/Iceberg commit
discipline reduced to its two load-bearing ideas:

1. **Data is immutable.** Every commit writes a fresh parquet directory
   (``data/commit-<uuid>/``); nothing is ever modified in place, so
   readers are never torn and old versions remain readable (time travel).
2. **Visibility is one atomic create.** A commit becomes visible only
   when its manifest (``manifests/v{N}.json`` listing the data dir +
   schema) is created with O_CREAT|O_EXCL — the same exclusive-create
   primitive the claim protocol proved race-safe (operators/queue.py:72,
   tests/test_queue.py).  Exactly one writer can own version N; a loser
   sees ``FileExistsError``, re-reads the NEW snapshot (which includes the
   winner's rows), re-merges, and retries at N+1 — optimistic concurrency
   giving serializable MERGE without a coordinator.

On a real deployment the exclusive create maps to HDFS ``create(path,
overwrite=false)``, S3 conditional PUT (``If-None-Match: *``), or GCS
``x-goog-if-generation-match: 0`` — all atomic create-if-absent, so the
protocol carries to every storage tier Spark runs on.  The manifest is a
single small JSON: commit cost is O(1) in table size, and at 100 TB the
data write dominates while the swap stays instant.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage import crash_point, get_store
from pyspark.sql.types import (BooleanType, ByteType, DoubleType,
                               FloatType, IntegerType, LongType,
                               ShortType, StringType, StructType)


def collect_parquet_stats(dir_path) -> list[dict]:
    """Per-file [min, max] column stats harvested from the parquet
    footers just written — the manifest-level data-skipping index
    (Delta/Iceberg file stats): a reader with a range predicate opens
    only files whose extent overlaps it, without touching the others'
    footers. JSON-safe types only (int/float/str); columns without
    usable stats are simply absent (reader treats absent as
    can't-skip, never as wrong-skip). Module-level so SparkSession-free
    contexts (the Python DataSource stream WRITER's driver-side commit)
    can build manifests with the same index."""
    return collect_file_stats(sorted(Path(dir_path).glob("*.parquet")))


def collect_file_stats(paths) -> list[dict]:
    """``collect_parquet_stats`` over an explicit file list — the
    O(delta) form: a commit that links a parent snapshot reuses the
    parent's recorded entries and harvests footers ONLY for its new
    files, so commit cost never grows with table size."""
    import pyarrow.parquet as pq

    out = []
    for f in [Path(p) for p in paths]:
        size = f.stat().st_size
        md = pq.ParquetFile(f).metadata
        stats: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        continue
                if not isinstance(mn, (int, float, str)):
                    continue
                name = col.path_in_schema
                if name in stats:
                    stats[name] = [min(stats[name][0], mn),
                                   max(stats[name][1], mx)]
                else:
                    stats[name] = [mn, mx]
        out.append({"path": f.name, "rows": md.num_rows,
                    "bytes": size, "stats": stats})
    return out


_BLOOM_K = 7            # bits/n ~9.6 at the sizing below -> ~1% FPP
_BLOOM_MAX_BITS = 1 << 22          # 512 KiB sidecar cap per file-col


def _bloom_pair(value) -> tuple[int, int] | None:
    """Two independent 64-bit hashes of a JSON-scalar value (one md5,
    split — Kirsch-Mitzenmacher double hashing derives all K probe
    positions). Type-tagged so 1 and "1" never collide; md5 is stable
    across processes/executors, which PYTHONHASHSEED-salted hash() is
    not. None/unsupported types return None (never indexed, reader
    keeps the file conservatively)."""
    import hashlib
    if value is None or isinstance(value, bool):
        return None
    if isinstance(value, int):
        raw = b"i" + str(value).encode()
    elif isinstance(value, str):
        raw = b"s" + value.encode()
    else:
        return None
    d = hashlib.md5(raw).digest()
    return (int.from_bytes(d[:8], "big"),
            int.from_bytes(d[8:], "big") | 1)


def build_bloom(values) -> bytes:
    """Bloom bitset over ``values``, sized for ~1% FPP at the observed
    distinct count (pow2 bits, capped at 512 KiB). An empty input
    yields the minimum all-zero filter — 'value absent' is then exact,
    not probabilistic."""
    vals = {v for v in values if v is not None}
    bits = 1 << max(10, int(len(vals) * 9.6).bit_length())
    bits = min(bits, _BLOOM_MAX_BITS)
    mask = bits - 1
    buf = bytearray(bits >> 3)
    for v in vals:
        pair = _bloom_pair(v)
        if pair is None:
            continue
        h1, h2 = pair
        for i in range(_BLOOM_K):
            p = (h1 + i * h2) & mask
            buf[p >> 3] |= 1 << (p & 7)
    return bytes(buf)


_BLOOM_TYPES = ("byte", "short", "integer", "long", "string")


def _bloom_indexable(dtype) -> bool:
    """True when a column's declared Spark type can carry a bloom
    sidecar: only integral and string columns hash stably AND match
    the residual predicate's coercion under a canonicalized probe.
    Doubles/decimals/dates etc. are refused at declaration time — an
    all-zero bitset over them would read as definitive absence."""
    return dtype.typeName() in _BLOOM_TYPES


def _canon_probe(value, dtype) -> tuple[object, bool]:
    """(canonical probe value, probeable) for a point-equality probe
    against a column of declared ``dtype``. Canonicalizing to the
    column's type makes sidecar hashing agree with the residual Spark
    predicate's cast semantics (ANSI casts a string literal to the
    int column's type, so ``col = '5'`` matches rows holding 5 — the
    probe must hash the INT 5). Any mapping that could diverge from
    Spark's coercion (a STRING column probed with a number: ANSI casts
    each string VALUE to the numeric type, so '05' rows match lit 5 —
    no single string hash covers that) returns probeable=False and
    the reader keeps files conservatively."""
    name = dtype.typeName()
    if isinstance(value, bool) or value is None:
        return value, False
    if name in ("byte", "short", "integer", "long"):
        if isinstance(value, int):
            return value, True
        if isinstance(value, float) and value.is_integer():
            return int(value), True
        if isinstance(value, str):
            try:
                return int(value.strip()), True
            except ValueError:
                return value, False
        return value, False
    if name == "string" and isinstance(value, str):
        return value, True
    return value, False


def bloom_may_contain(buf: bytes, value) -> bool:
    """Membership test against a ``build_bloom`` bitset. True means
    'maybe present' (open the file); False is definitive absence."""
    return _bloom_hit(buf, _bloom_pair(value))


def _bloom_hit(buf: bytes, pair: tuple[int, int] | None) -> bool:
    """``bloom_may_contain`` with the value's hash pair precomputed —
    a K-needle × N-file prune hashes each needle ONCE instead of once
    per (file, needle) probe (the md5 dominated the driver-side prune
    at 4096 needles; pure CPU, no behavior change)."""
    if pair is None or not buf:
        return True
    h1, h2 = pair
    mask = (len(buf) << 3) - 1
    for i in range(_BLOOM_K):
        p = (h1 + i * h2) & mask
        if not buf[p >> 3] & (1 << (p & 7)):
            return False
    return True


def multiset_equal(a: DataFrame, b: DataFrame) -> bool:
    """Multiset equality of two same-schema DataFrames in ONE Spark
    job / one shuffle: union the sides with a ±1 sign column, group by
    every column (null-robust — grouping treats nulls as equal keys,
    unlike a join condition), and ask whether any signed count is
    non-zero. Value-equal to the classic two-``exceptAll().count()``
    conjunction (each distinct row's multiplicity difference must be
    zero) but computes each side ONCE and shuffles once, where the
    exceptAll pair computes each input subtree twice and shuffles both
    sides twice — the equality-pin primitive of the incremental-index
    scenarios (guide §1.2: don't compute things you throw away)."""
    cols = a.columns
    # the exceptAll pair this replaces raised on schema drift; keep
    # that contract — a silent unionByName type-coercion or a caller
    # colliding with the sentinel names would return an over-lenient
    # verdict instead of erroring (r16 ADVICE)
    if set(cols) != set(b.columns):
        raise ValueError(
            f"multiset_equal: column sets differ: {sorted(cols)} vs "
            f"{sorted(b.columns)}")
    if "__s" in cols or "__d" in cols:
        raise ValueError(
            "multiset_equal: input carries a reserved sentinel column "
            "('__s'/'__d')")
    signed = (a.select(*cols).withColumn("__s", F.lit(1))
              .unionByName(b.select(*cols).withColumn("__s", F.lit(-1))))
    diff = (signed.groupBy(*cols).agg(F.sum("__s").alias("__d"))
            .filter(F.col("__d") != 0))
    return diff.isEmpty()


def normalize_change_types(df: DataFrame) -> DataFrame:
    """Fold Delta's UPDATE image types back to the two-type algebra:
    update_preimage counts as a delete, update_postimage as an insert —
    so every multiset consumer (IVM, contract checks) works unchanged
    on feeds from tables with ``cdf_update_images`` enabled."""
    return df.withColumn(
        "_change_type",
        F.when(F.col("_change_type") == "update_preimage", "delete")
         .when(F.col("_change_type") == "update_postimage", "insert")
         .otherwise(F.col("_change_type")))


def _entry_refs(m: dict, f: dict) -> list[str]:
    """Every root-relative path a manifest entry pins: the data file
    plus any bloom sidecars — the reference set vacuum must respect."""
    return [_entry_rel(m, f)] + sorted((f.get("bloom") or {}).values())


def _entry_rel(m: dict, f: dict) -> str:
    """Table-root-relative path of a manifest file entry.

    New-scheme entries record the full relative path
    (``data/commit-X/add-....parquet``) — a file is referenced FROM THE
    COMMIT DIR WHERE IT WAS FIRST WRITTEN for its whole life, and
    commits never copy/relink old data (the manifest-list discipline of
    Delta/Iceberg: a commit is a pure metadata write, O(delta) in both
    IO and metadata, object-store-compatible). Legacy entries record a
    bare file name inside that manifest's own ``data`` dir; resolving
    through this helper makes both generations readable forever."""
    p = f["path"]
    return p if "/" in p else f"{m['data']}/{p}"


def _entry_name(f: dict) -> str:
    """The entry's FILE NAME — the stable physical identity deletion
    vectors and change-stream diffs key on (names are uuid-tagged at
    write time, so they stay unique across commit dirs)."""
    return f["path"].rsplit("/", 1)[-1]


# --------------------------------------------------------------- manifest
# file-list scale machinery: O(delta) encoded manifests, parquet
# checkpoints, and the vacuum write-ahead ledger. All module-level and
# SparkSession-free so the Python DataSource (stream sink/planner) uses
# the exact same resolution as AcidTable.

#: write a parquet checkpoint of the materialized file list every N
#: commits (Delta's checkpointInterval) — bounds delta-chain replay
CHECKPOINT_EVERY = 10

#: (root, version, commit ts) -> tuple of materialized root-relative
#: entries. Versions are immutable once committed; the commit TIMESTAMP
#: in the key fences table re-incarnations at the same path (a scratch
#: table dropped and recreated must never serve the old incarnation's
#: file lists). Entries are shallow-copied on the way out so callers
#: can mutate freely.
_FILES_CACHE: "dict[tuple[str, int, float], tuple]" = {}
_FILES_CACHE_CAP = 128


def _files_cache_put(key, entries: list[dict]) -> tuple:
    if len(_FILES_CACHE) >= _FILES_CACHE_CAP:
        # drop an arbitrary ~quarter; versions re-resolve cheaply
        for k in list(_FILES_CACHE)[:_FILES_CACHE_CAP // 4]:
            _FILES_CACHE.pop(k, None)
    val = tuple(entries)
    _FILES_CACHE[key] = val
    return val


def latest_committed_version(manifests_dir) -> int | None:
    """Newest committed version under a manifests dir — O(1) ``_latest``
    hint + forward probe, O(versions) glob only as the fallback.
    SparkSession-free and module-level so the Python DataSource stream
    planners (which poll this EVERY trigger) and the sink share the
    exact logic of ``AcidTable.latest_version``."""
    manifests = Path(manifests_dir)
    if not manifests.is_dir():
        return None
    hint = manifests / "_latest"
    try:
        v = int(hint.read_text())
        if not (manifests / f"v{v}.json").exists():
            raise ValueError              # corrupt/foreign hint
    except (OSError, ValueError):
        vs = [int(p.stem[1:]) for p in manifests.glob("v*.json")]
        return max(vs) if vs else None
    while (manifests / f"v{v + 1}.json").exists():
        v += 1                            # hint lagged: probe forward
    return v


def _checkpoint_path(root, version: int) -> Path:
    return Path(root) / "manifests" / f"ckpt-v{version}.parquet"


def write_files_checkpoint(root, version: int,
                           files_rr: list[dict]) -> None:
    """Best-effort PARQUET CHECKPOINT of a version's materialized file
    list (Delta's _checkpoint discipline): one columnar file a reader
    loads in a single IO instead of replaying the O(delta) manifest
    chain. Derived data only — a missing/failed checkpoint merely costs
    the chain replay, never correctness — so failures are swallowed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        tbl = pa.table({
            "path": pa.array([f["path"] for f in files_rr], pa.string()),
            "entry": pa.array([json.dumps(f) for f in files_rr],
                              pa.string())})
        final = _checkpoint_path(root, version)
        tmp = final.with_name(f".{final.name}.{uuid.uuid4().hex[:8]}.tmp")
        pq.write_table(tbl, tmp, compression="zstd")
        get_store().atomic_replace(tmp, final)
    except Exception:                              # noqa: BLE001
        pass


def _read_files_checkpoint(path) -> list[dict]:
    import pyarrow.parquet as pq

    col = pq.read_table(path, columns=["entry"]).column("entry")
    return [json.loads(s) for s in col.to_pylist()]


def resolve_manifest_files(root, m: dict) -> list[dict] | None:
    """The materialized ROOT-RELATIVE file entries of a manifest.
    Explicit lists are re-anchored through ``_entry_rel``; O(delta)
    manifests (``files_base``/``files_add``/``files_remove``) replay
    the parent chain ITERATIVELY, short-circuited by the newest parquet
    checkpoint at or below the target and by the in-process cache.
    Returns None for legacy manifests without per-file bookkeeping."""
    files = m.get("files")
    if files is not None:
        return [{**f, "path": _entry_rel(m, f)} for f in files]
    if "files_base" not in m:
        return None
    root = Path(root)
    rkey = str(root)
    # walk DOWN the chain until something resolves without recursion
    chain: list[dict] = []          # delta manifests to replay, newest last
    cur = m
    base: list[dict] | None = None
    while True:
        v = int(cur["version"])
        hit = _FILES_CACHE.get((rkey, v, cur.get("ts", 0.0)))
        if hit is not None:
            base = [dict(f) for f in hit]
            break
        ck = _checkpoint_path(root, v)
        if ck.exists():
            try:
                base = _read_files_checkpoint(ck)
                break
            except Exception:                      # noqa: BLE001
                pass                # corrupt checkpoint: replay instead
        if "files_base" not in cur:
            cfiles = cur.get("files")
            if cfiles is None:
                raise ValueError(
                    f"manifest v{m['version']} at {root} delta-encodes "
                    f"its file list over legacy v{cur['version']} which "
                    f"has no per-file bookkeeping")
            base = [{**f, "path": _entry_rel(cur, f)} for f in cfiles]
            break
        chain.append(cur)
        bv = int(cur["files_base"])
        cur = json.loads(
            (root / "manifests" / f"v{bv}.json").read_text())
    # replay UP: oldest delta first
    for dm in reversed(chain):
        rm = set(dm.get("files_remove", ()))
        if rm:
            base = [f for f in base if _entry_name(f) not in rm]
        base = base + [dict(f) for f in dm.get("files_add", ())]
        _files_cache_put((rkey, int(dm["version"]), dm.get("ts", 0.0)),
                         base)
    return [dict(f) for f in base]


def encode_manifest_files(manifest: dict, files_rr: list[dict],
                          parent_version: int | None,
                          parent_files_rr: list[dict] | None) -> None:
    """Record ``files_rr`` on ``manifest`` — O(delta) encoded against
    the parent's materialized list when that is smaller (adds + removed
    NAMES vs the full list), explicit otherwise. Carried entries are
    identical to the parent's by construction (files are immutable and
    uuid-named), so name-level diffing is exact."""
    if parent_version is None or parent_files_rr is None:
        manifest["files"] = files_rr
        return
    by_name = {_entry_name(f): f for f in parent_files_rr}
    nnames = {_entry_name(f) for f in files_rr}
    # content-aware: an entry whose name matches the parent's but whose
    # recorded metadata changed (e.g. a stats key dropped with its
    # column) is a remove+add of the same name — replay filters the old
    # entry out before appending the new one
    adds = [f for f in files_rr if by_name.get(_entry_name(f)) != f]
    add_names = {_entry_name(f) for f in adds}
    removes = sorted(n for n in by_name
                     if n not in nnames or n in add_names)
    if len(adds) + len(removes) <= max(1, len(files_rr) // 2):
        manifest["files_base"] = parent_version
        manifest["files_add"] = adds
        manifest["files_remove"] = removes
    else:
        manifest["files"] = files_rr


# ---- vacuum write-ahead ledger: membership checks instead of stats

#: ledger cache: root -> ((mtime_ns, size), (paths, dirs))
_LEDGER_CACHE: "dict[str, tuple]" = {}


def vacuumed_refs(root) -> tuple[set[str], set[str]] | None:
    """(deleted paths, fully-deleted dirs) recorded by the table's
    WRITE-AHEAD vacuum ledger, or None when no ledger exists (a table
    this code never vacuumed — callers fall back to per-file stats).
    The ledger is written BEFORE any deletion, so a file missing on
    disk is always in the ledger; a ledger entry whose file still
    exists (crash between ledger write and delete) errs on the loud
    side. Cached per (mtime, size)."""
    root = Path(root)
    ledger = root / "manifests" / "_vacuumed.jsonl"
    try:
        st = ledger.stat()
    except OSError:
        return None
    key = (st.st_mtime_ns, st.st_size)
    hit = _LEDGER_CACHE.get(str(root))
    if hit is not None and hit[0] == key:
        return hit[1]
    paths: set[str] = set()
    dirs: set[str] = set()
    for line in ledger.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue                # torn tail line: ignore
        paths.update(rec.get("paths", ()))
        dirs.update(rec.get("dirs", ()))
    _LEDGER_CACHE[str(root)] = (key, (paths, dirs))
    return paths, dirs


#: compact the ledger once it accumulates this many records — keeps
#: the cold-read GET bounded by the DELETED SET, not vacuum history
_LEDGER_COMPACT_AFTER = 64


def _locked_ledger_handle(ledger):
    """Open the ledger for append under an exclusive flock, re-opening
    if a concurrent compaction replaced the inode between open and
    lock (the classic lockfile-vs-rename race): every writer holds the
    lock on the LIVE file, so no append can land on an orphaned inode
    and vanish."""
    import fcntl
    import os

    while True:
        fh = open(ledger, "a")
        fcntl.flock(fh.fileno(), fcntl.LOCK_EX)
        try:
            if os.fstat(fh.fileno()).st_ino == os.stat(ledger).st_ino:
                return fh
        except OSError:
            pass
        fh.close()


def ledger_append(root, rec: dict) -> None:
    """Append one vacuum record, compacting the ledger in the same
    critical section once it exceeds ``_LEDGER_COMPACT_AFTER`` records.

    Compaction is SEMANTICS-PRESERVING — membership answers are
    identical before and after:
    * records merge into one canonical (paths, dirs) pair (dedup across
      vacuum history — repeated paths stop costing);
    * a path covered by a recorded dir entry drops (the dir answers);
    * paths whose parent dir no longer EXISTS collapse into a dir
      entry — exactly correct, since a file cannot outlive its dir, so
      claiming 'vacuumed' for any child of a gone dir is the truth.
    The steady-state ledger is O(vacuumed commit dirs) + O(files in
    PARTIALLY-live dirs), bounded by the table's live layout instead
    of growing with maintenance cadence forever."""
    import os

    root = Path(root)
    ledger = root / "manifests" / "_vacuumed.jsonl"
    fh = _locked_ledger_handle(ledger)
    try:
        fh.write(json.dumps(rec) + "\n")
        fh.flush()
        lines = [ln for ln in ledger.read_text().splitlines()
                 if ln.strip()]
        if len(lines) <= _LEDGER_COMPACT_AFTER:
            return
        paths: set[str] = set()
        dirs: set[str] = set()
        newest_ts = 0.0
        for ln in lines:
            try:
                r = json.loads(ln)
            except ValueError:
                continue                     # torn tail: superseded now
            paths.update(r.get("paths", ()))
            dirs.update(r.get("dirs", ()))
            newest_ts = max(newest_ts, r.get("ts", 0.0))
        for p in list(paths):
            d = p.rsplit("/", 1)[0]
            if d in dirs or not (root / d).is_dir():
                paths.discard(p)
                dirs.add(d)
        tmp = ledger.with_name(f".{ledger.name}.{uuid.uuid4().hex[:8]}")
        tmp.write_text(json.dumps(
            {"ts": newest_ts, "compacted": True,
             "paths": sorted(paths), "dirs": sorted(dirs)}) + "\n")
        # through the FileStore seam, like every other metadata swap
        # (write_files_checkpoint, the _latest hint) — a non-POSIX
        # store's replace contract must govern the ledger rewrite too
        get_store().atomic_replace(tmp, ledger)
        _LEDGER_CACHE.pop(str(root), None)
    finally:
        fh.close()                           # releases the flock


def first_vacuumed_ref(root, m: dict,
                       files_rr: list[dict] | None = None,
                       probe: bool = False) -> str | None:
    """First data file / DV dir of manifest ``m`` that vacuum dropped,
    or None if the version is fully intact. Ledger membership checks
    when the table has a vacuum ledger (ZERO filesystem stats — the
    100 TB cold-read path); per-file existence probes otherwise.

    ``probe=True`` (restore/clone cold paths) backs an intact ledger
    verdict with one ``listdir`` PER REFERENCED COMMIT DIR plus
    name-set membership for every referenced file: files deleted
    before this build's ledger existed (an old-build vacuum, or
    out-of-band cleanup) are absent from the ledger, and committing a
    new LATEST manifest against them would surface as a mid-query scan
    failure. The listdir-per-dir shape catches whole-dir AND partial
    deletions at O(dirs) syscalls — never the O(files) stat sweep the
    ledger exists to avoid."""
    root = Path(root)
    if files_rr is None:
        files_rr = resolve_manifest_files(root, m)
    refs = vacuumed_refs(root)
    if refs is not None:
        paths, dirs = refs
        if files_rr is None:        # legacy manifest: whole-dir check
            if m["data"] in dirs or m["data"] in paths:
                return m["data"]
        else:
            for f in files_rr:
                r = f["path"]
                if r in paths or r.rsplit("/", 1)[0] in dirs:
                    return r
        dv = m.get("dv")
        if dv is not None and (dv in dirs or dv in paths):
            return dv
        if probe:
            if files_rr is None:
                if not (root / m["data"]).is_dir():
                    return m["data"]
            else:
                # one listdir per referenced dir (still O(dirs)
                # syscalls), then NAME-SET membership for every
                # referenced file — catches a partial out-of-band
                # deletion that a single representative stat would
                # miss (some-but-not-all files gone while the probed
                # one survives)
                by_dir: dict[str, list[str]] = {}
                for f in files_rr:
                    d, name = f["path"].rsplit("/", 1)
                    by_dir.setdefault(d, []).append(name)
                for d, names in by_dir.items():
                    try:
                        on_disk = set(os.listdir(root / d))
                    except OSError:
                        return f"{d}/{names[0]}"
                    for n in names:
                        if n not in on_disk:
                            return f"{d}/{n}"
            if dv is not None and not (root / dv).is_dir():
                return dv
        return None
    # no ledger: the original stat probe
    if files_rr is None:
        if not (root / m["data"]).is_dir():
            return m["data"]
    else:
        for f in files_rr:
            if not (root / f["path"]).exists():
                return f["path"]
    dv = m.get("dv")
    if dv is not None and not (root / dv).is_dir():
        return dv
    return None


def _parse_hive_value(raw: str, dtype=None):
    """A Hive directory-name partition value back to a JSON-safe typed
    value, coerced by the COLUMN'S DECLARED TYPE (``dtype``, a Spark
    DataType) — never re-guessed from the string shape. Guessing
    corrupted metadata: string '007' became int 7 (so ``DELETE WHERE
    c='007'`` pruned away its own file), '1.50' became 1.5, and
    boolean True became the string 'true' (str(True)='True'!='true'
    pruned EVERYTHING). Hive's NULL sentinel maps to None; types
    without a JSON-native form (date/timestamp/decimal) keep the
    directory string — `_pins_match` and `_partition_tuples_of`
    comparisons go through str() for those. With no dtype (legacy
    caller), strings pass through untouched."""
    from urllib.parse import unquote

    s = unquote(raw)
    if s == "__HIVE_DEFAULT_PARTITION__":
        return None
    if dtype is None:
        return s
    if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        return int(s)
    if isinstance(dtype, (FloatType, DoubleType)):
        return float(s)
    if isinstance(dtype, BooleanType):
        return s.lower() == "true"
    return s


def _split_conjuncts(cond: str) -> list[str] | None:
    """Split ``cond`` into its top-level AND conjuncts with a
    quote-aware, paren-depth scanner. Returns None when the expression
    is NOT a pure top-level conjunction — i.e. any un-parenthesized OR
    exists (AND binds tighter than OR, so the fragments between ANDs
    would not be conjuncts of the whole predicate; pinning from them
    would prune WRONGLY — found by the hypothesis property test on
    ``a = 0 AND a = 0 OR a = 1``)."""
    terms: list[str] = []
    cur: list[str] = []
    depth, q, i, n = 0, None, 0, len(cond)
    up = cond.upper()

    def word_at(j: int, w: str) -> bool:
        if not up.startswith(w, j):
            return False
        before = up[j - 1] if j else " "
        after = up[j + len(w)] if j + len(w) < n else " "
        return not (before.isalnum() or before == "_") and \
            not (after.isalnum() or after == "_")

    while i < n:
        ch = cond[i]
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in ("'", '"'):
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif depth == 0 and word_at(i, "OR"):
            return None                  # not a conjunction at all
        elif depth == 0 and word_at(i, "AND"):
            terms.append("".join(cur))
            cur = []
            i += 3
            continue
        else:
            cur.append(ch)
        i += 1
    terms.append("".join(cur))
    return terms


def _partition_pins(cond: str, pcols: list[str]) -> dict | None:
    """{partition_col: literal} for every top-level AND conjunct of
    ``cond`` that pins a partition column with an equality — the shape
    that admits partition pruning. Only pure conjunctions pin (any
    top-level OR disables pruning entirely); range / parenthesized /
    unparseable conjuncts are conservatively ignored — pruning may
    keep too much, never too little. None when nothing pins."""
    import re

    low = {c.lower(): c for c in pcols}
    pins: dict = {}
    terms = _split_conjuncts(cond)
    if terms is None:
        return None
    for term in terms:
        if "(" in term or ")" in term:
            continue
        m = re.match(r"^\s*(\w+)\s*=\s*('([^']*)'|-?\d+(?:\.\d+)?)\s*$",
                     term)
        if not m:
            m2 = re.match(
                r"^\s*('([^']*)'|-?\d+(?:\.\d+)?)\s*=\s*(\w+)\s*$", term)
            if not m2:
                continue
            col, lit, quoted = m2.group(3), m2.group(1), m2.group(2)
        else:
            col, lit, quoted = m.group(1), m.group(2), m.group(3)
        if col.lower() not in low:
            continue
        if quoted is not None:
            pins[low[col.lower()]] = quoted
        else:
            pins[low[col.lower()]] = (float(lit) if "." in lit
                                      else int(lit))
    return pins or None


def _check_duckdb_enforceable(name: str, expr: str, schema) -> None:
    """Refuse a CHECK expression the streaming sink could not enforce.
    The sink commits without a SparkSession and probes staged parquet
    with DuckDB, so the accepted CHECK grammar is the ANSI
    comparison/boolean intersection BOTH engines parse identically —
    probed here by binding ``expr`` against a zero-row relation with
    the table's exact arrow schema. Failing at ADD CONSTRAINT time
    beats permanently refusing every future sink commit; it also makes
    the duckdb runtime dependency loud at declaration time."""
    try:
        import duckdb
        import pyarrow as pa
    except ImportError as e:                       # pragma: no cover
        raise ValueError(
            f"CHECK constraint {name!r} cannot be accepted: the duckdb "
            f"package (the streaming sink's validator) is unavailable "
            f"({e}); install duckdb or do not constrain sink-fed "
            f"tables") from e
    try:
        from pyspark.sql.pandas.types import to_arrow_schema
        a_schema = to_arrow_schema(schema)
    except Exception as e:                         # noqa: BLE001
        # Fail CLOSED: probing against a mis-typed (all-VARCHAR)
        # relation would accept constraints the sink later rejects and
        # spuriously reject valid numeric ones — the probe would no
        # longer predict sink-time enforceability.
        raise ValueError(
            f"CHECK constraint {name!r} cannot be validated for this "
            f"table's schema (arrow conversion failed: {e}); "
            f"constraints on tables with non-arrow-representable "
            f"column types are not supported") from e
    empty = pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in a_schema], schema=a_schema)
    con = duckdb.connect()
    try:
        con.register("__constraint_probe", empty)
        con.sql(f"SELECT * FROM __constraint_probe "
                f"WHERE NOT ({expr}) OR ({expr}) IS NULL").fetchall()
    except Exception as e:
        raise ValueError(
            f"CHECK constraint {name!r} ({expr}) is not enforceable by "
            f"the streaming sink's DuckDB validator: {e}. The accepted "
            f"CHECK grammar is the ANSI comparison/boolean subset both "
            f"Spark and DuckDB evaluate identically — refused at ADD "
            f"CONSTRAINT time so enforcement can never diverge or "
            f"refuse sink commits later") from e
    finally:
        con.close()


_DROP = object()          # sentinel: remove this recorded value


def _recoerce_partition_value(val, dtype):
    """A recorded manifest partition value checked against the column's
    DECLARED type. Manifests written before typed parsing may hold
    shape-guessed values (string '007' recorded as int 7, '1.50' as
    1.5) that are carried forward verbatim forever — a value whose
    python type disagrees with the declaration is re-coerced when that
    is lossless (a stored string re-parsed as the declared type; an int
    widened to a declared float) and DROPPED otherwise ('007'→7 lost
    the leading zeros; nothing can recover them). An absent value is
    conservatively kept by every pruner, so dropping can never cause a
    wrong skip — only a lost skip. Returns ``_DROP`` to signal
    removal."""
    if val is None:
        return None                     # __HIVE_DEFAULT_PARTITION__
    if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        if isinstance(val, bool):
            return _DROP
        if isinstance(val, int):
            return val
        if isinstance(val, str):
            try:
                return int(val)
            except ValueError:
                return _DROP
        return _DROP
    if isinstance(dtype, (FloatType, DoubleType)):
        if isinstance(val, bool):
            return _DROP
        if isinstance(val, (int, float)):
            return float(val)
        if isinstance(val, str):
            try:
                return float(val)
            except ValueError:
                return _DROP
        return _DROP
    if isinstance(dtype, BooleanType):
        if isinstance(val, bool):
            return val
        if isinstance(val, str):
            return val.lower() == "true"
        return _DROP
    # string / date / timestamp / decimal columns record the directory
    # string itself; a non-string here is a legacy mis-guess (7 for
    # '007', 1.5 for '1.50') that str() cannot faithfully undo
    return val if isinstance(val, str) else _DROP


def _sanitize_manifest_partitions(m: dict) -> dict:
    """Repair legacy shape-guessed partition values IN PLACE at
    manifest-load time, so every consumer (pruners, ``partitions()``,
    the carry in ``_carried_entries``) sees declaration-typed values —
    and every FUTURE commit writes the repaired entries forward."""
    files = m.get("files")
    if not files or not any(f.get("partition") for f in files):
        return m
    try:
        ptypes = {f.name: f.dataType
                  for f in StructType.fromJson(m["schema"]).fields}
    except Exception:                              # noqa: BLE001
        return m                        # unreadable schema: leave as-is
    for f in files:
        part = f.get("partition")
        if not part:
            continue
        fixed = {}
        for col, val in part.items():
            dt = ptypes.get(col)
            if dt is None:
                fixed[col] = val        # dropped column: keep verbatim
                continue
            nv = _recoerce_partition_value(val, dt)
            if nv is not _DROP:
                fixed[col] = nv
        f["partition"] = fixed
    return m


def _split_top_and(cond: str) -> list[str]:
    """Top-level AND conjuncts of a SQL predicate (paren- and
    string-literal-aware). Parenthesized ORs stay inside their
    conjunct; an UN-parenthesized depth-0 OR means the expression is
    not a pure conjunction at all (SQL precedence: ``A OR B AND C`` is
    ``A OR (B AND C)``, so the fragments between ANDs are NOT
    conjuncts of the whole predicate — pruning on them would silently
    skip rows matched via the OR arm). In that case return [] so the
    caller skips pruning entirely — the same guard `_split_conjuncts`
    documents."""
    parts: list[str] = []
    cur: list[str] = []
    depth, i, inq = 0, 0, False
    up = cond.upper()

    def _word(j: int, w: str) -> bool:
        if not up.startswith(w, j):
            return False
        before = cond[j - 1] if j else " "
        k = j + len(w)
        after = cond[k] if k < len(cond) else " "
        return not (before.isalnum() or before == "_") and \
            not (after.isalnum() or after == "_")

    while i < len(cond):
        ch = cond[i]
        if inq:
            cur.append(ch)
            if ch == "'":
                inq = False
            i += 1
            continue
        if ch == "'":
            inq = True
            cur.append(ch)
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and _word(i, "OR"):
            return []                    # not a conjunction: no prune
        if depth == 0 and _word(i, "AND"):
            parts.append("".join(cur).strip())
            cur = []
            i += 3
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur).strip())
    return [p for p in parts if p]


#: functions whose value could differ between the prune evaluation and
#: the residual row evaluation — conjuncts naming them are never used
#: for partition pruning (conservative keep)
_NONPRUNABLE_FN = re.compile(
    r"\b(?:(?:rand|randn|uuid|shuffle|monotonically_increasing_id|"
    r"now|unix_timestamp)\s*\(|"
    # Spark accepts these as bare keywords (no parens): `day <
    # current_date` evaluated at prune time vs residual time can
    # straddle midnight and wrongly prune
    r"(?:current_date|current_timestamp|localtimestamp)\b)",
    re.IGNORECASE)


def _pins_match(part: dict | None, pins: dict) -> bool:
    """True iff a file's recorded partition tuple can hold rows matching
    the equality pins. Files without partition metadata (pre-partition
    manifests, stream-sink commits) are conservatively kept."""
    if not part:
        return True
    for c, v in pins.items():
        have = part.get(c)
        if have is None:
            continue                    # unknown: cannot skip
        if have != v and str(have) != str(v):
            return False
    return True


class CommitConflict(Exception):
    """Another writer owns the attempted version; caller must re-read."""


class ConstraintViolation(Exception):
    """A commit produced rows that fail a table CHECK constraint; the
    commit is refused before any manifest is written (Delta CHECK
    semantics: the expression must evaluate TRUE — NULL violates)."""


class UnsupportedTableFeature(RuntimeError):
    """The table declares a reader feature this build doesn't
    implement (Delta's readerFeatures protocol gate): reading anyway
    would be silently WRONG (a column-mapping-unaware reader serves
    physical names; a DV-unaware reader resurrects deleted rows), so
    every access fails loudly with the feature named. This is how a
    gradually-upgrading 100 TB fleet stays safe — old readers refuse
    new tables instead of misreading them."""


#: reader-relevant features THIS build implements; a table whose
#: props declare anything else gates every read
SUPPORTED_READER_FEATURES = frozenset({
    "column_mapping", "deletion_vectors", "cdf_update_images"})


def check_reader_features(props: dict | None) -> None:
    """Raise UnsupportedTableFeature if ``props`` declares a reader
    feature outside SUPPORTED_READER_FEATURES. Shared by AcidTable and
    the SparkSession-free Python DataSource planners."""
    unknown = (set((props or {}).get("reader_features", ()))
               - SUPPORTED_READER_FEATURES)
    if unknown:
        raise UnsupportedTableFeature(
            f"table requires reader feature(s) {sorted(unknown)} this "
            f"build does not implement (supports "
            f"{sorted(SUPPORTED_READER_FEATURES)}); upgrade before "
            f"reading — proceeding would misread the table")


#: apply_cdf find-pass pruning gate: delete-key lists up to this many
#: distinct values prune candidate files through stats/bloom sidecars.
_EQ_PRUNE_CAP = 4096

#: Default deletion-vector fold bound the incremental-index
#: maintainers pass to ``maybe_autocompact(dv_fold_rows=...)``: past
#: this many live DV rows the hook materializes the vector
#: (O(dv-touched files)), bounding both the per-scan anti-join tax and
#: the per-commit sidecar rewrite of a long retire stream. Small
#: enough to fold within a maintenance turn, large enough that a
#: fixture-scale retire batch never churns.
DV_FOLD_ROWS = 32_768


class VersionVacuumedError(RuntimeError):
    """A read needs a version whose data files were vacuumed. Raised
    LOUDLY instead of serving a silently-empty snapshot or a partial
    change feed — the AcidTable analog of Delta reading past
    ``delta.logRetentionDuration``: the manifest (history) survives, the
    data does not, and any consumer whose range crosses the retention
    horizon must find out."""


class AcidTable:
    """A versioned parquet table with atomic commits and snapshot reads."""

    def __init__(self, spark: SparkSession, path) -> None:
        self.spark = spark
        self.path = Path(path)
        self._manifests = self.path / "manifests"
        self._data = self.path / "data"

    # ---------------------------------------------------------- lifecycle

    @classmethod
    def create(cls, spark: SparkSession, path, df: DataFrame,
               enable_cdf: bool = False,
               enable_dv: bool = False,
               partition_by: list[str] | None = None,
               bloom_by: list[str] | None = None,
               cdf_update_images: bool = False,
               generated: dict[str, str] | None = None) -> "AcidTable":
        """Create the table with ``df`` as version 0 (errors if it exists).

        ``enable_cdf=True`` is Delta's ``enableChangeDataFeed`` table
        property: every subsequent commit RECORDS its row-level deltas
        as change files next to the data (append/merge already know
        their deltas; layout-only ops record empty change sets), so
        ``read_changes`` and the CDF stream serve a distributed parquet
        scan instead of per-version snapshot diffs — and keep serving
        after the underlying snapshots are vacuumed.

        ``enable_dv=True`` is Delta's ``enableDeletionVectors``: the
        SQL front door's ``DELETE FROM`` serves merge-on-read
        (``delete_where_mor`` — O(matched rows), pure-metadata commits)
        instead of copy-on-write; OPTIMIZE/compact materializes the
        accumulated vectors.

        ``partition_by=["col", ...]`` declares partition columns — the
        Iceberg design, not Hive's: every data file holds exactly ONE
        partition tuple, and that tuple rides the file's MANIFEST entry
        (the partition columns stay in the data files, so reads never
        reconstruct values from paths and no directory listing is ever
        needed — at 100 TB the manifest IS the partition index). Every
        scan, COW DML find pass, MERGE, and the ``acidtable``
        DataSource split planner prunes by partition tuple BEFORE
        consulting per-file [min, max] stats."""
        t = cls(spark, path)
        t._manifests.mkdir(parents=True, exist_ok=True)
        t._data.mkdir(parents=True, exist_ok=True)
        cons = None
        if generated:
            # GENERATED ALWAYS AS (expr) — Delta generated columns:
            # writers that omit the column get it computed at write
            # time; writers that provide it are validated by an
            # implicit CHECK (cross-dialect null-safe equality, so the
            # SparkSession-free sink enforces it via DuckDB too). The
            # canonical use is a derived partition key (day from a
            # timestamp): declare partition_by on the generated column
            # and every pruner works off the recorded tuples.
            for col, expr in generated.items():
                if col not in df.columns:
                    df = df.withColumn(col, F.expr(expr))
            cons = {f"gen_{col}": f"(({col}) = ({expr})) OR "
                                  f"(({col}) IS NULL AND "
                                  f"({expr}) IS NULL)"
                    for col, expr in generated.items()}
            for name, expr in cons.items():
                _check_duckdb_enforceable(name, expr, df.schema)
        props = {}
        if generated:
            props["generated"] = dict(generated)
        if enable_cdf:
            props["cdf"] = True
        if cdf_update_images:
            if not enable_cdf:
                raise ValueError(
                    "cdf_update_images requires enable_cdf=True")
            # opt-in Delta parity: COW UPDATE records changed rows as
            # update_preimage/update_postimage instead of delete/insert
            # (consumers that fold the feed should map pre->delete,
            # post->insert: normalize_change_types)
            props["cdf_update_images"] = True
        if enable_dv:
            props["dv"] = True
        if partition_by:
            missing = [c for c in partition_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"partition_by column(s) {missing} not in schema "
                    f"{df.columns}")
            props["partition_by"] = list(partition_by)
        if bloom_by:
            missing = [c for c in bloom_by if c not in df.columns]
            if missing:
                raise ValueError(
                    f"bloom_by column(s) {missing} not in schema "
                    f"{df.columns}")
            bad = [c for c in bloom_by
                   if not _bloom_indexable(df.schema[c].dataType)]
            if bad:
                raise ValueError(
                    f"bloom_by column(s) {bad} are not integral/string"
                    " — bloom sidecars only index those types")
            props["bloom_by"] = list(bloom_by)
        rel, files = t._write_data_full(df, partition_by or [])
        if bloom_by:
            # props aren't committed yet, so v0's staging couldn't see
            # them — index its files explicitly
            files = t._attach_blooms(files, t.path / rel,
                                     cols=list(bloom_by))
        if not t._try_commit(0, rel, df.schema.jsonValue(),
                             op="create", props=props or None,
                             files=files, constraints=cons):
            raise FileExistsError(f"AcidTable already exists at {path}")
        return t

    def _materialize_generated(self, rows: DataFrame) -> DataFrame:
        """Compute any declared generated columns a writer omitted
        (Delta's write-time materialization); provided values pass
        through and are validated by the implicit CHECK instead."""
        for col, expr in (self._props().get("generated") or {}).items():
            if col not in rows.columns:
                rows = rows.withColumn(col, F.expr(expr))
        return rows

    def clone(self, path, version: int | None = None) -> "AcidTable":
        """SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE``): a
        NEW table whose v0 carries this table's ``version`` snapshot
        entirely by reference — hardlinked data files, the recorded
        per-file stats, and any deletion vector; zero data copied or
        scanned. Histories fork at the clone: commits to either table
        never affect the other, and inode refcounts make vacuum on
        either side safe (the manifest-list file-reference semantics
        of a real table format). Table properties (CDF) carry over."""
        import os

        v = self.latest_version() if version is None else version
        m = self._manifest(v)
        if not self._version_intact(m, probe=True):
            raise VersionVacuumedError(
                f"cannot clone vacuumed version {v} of {self.path}")
        new = AcidTable(self.spark, path)
        if new.latest_version() is not None:
            raise FileExistsError(f"AcidTable already exists at {path}")
        new._manifests.mkdir(parents=True, exist_ok=True)
        new._data.mkdir(parents=True, exist_ok=True)
        rel = f"data/commit-{uuid.uuid4().hex}"
        (new.path / rel).mkdir(parents=True)
        cloned_files = None
        if m.get("files") is not None:
            cloned_files = []
            for f in m["files"]:
                get_store().link_or_copy(
                    self.path / _entry_rel(m, f),
                    new.path / rel / _entry_name(f))
                e = {**f, "path": _entry_name(f)}
                if f.get("bloom"):
                    # bloom sidecars share their data file's lifecycle:
                    # link them too and re-anchor the entry's map
                    bl = {}
                    for c, side in f["bloom"].items():
                        name = Path(side).name
                        get_store().link_or_copy(
                            self.path / side, new.path / rel / name)
                        bl[c] = f"{rel}/{name}"
                    e["bloom"] = bl
                cloned_files.append(e)
        else:
            for f in sorted((self.path / m["data"]).glob("*.parquet")):
                get_store().link_or_copy(f, new.path / rel / f.name)
        dv_rel, dv_rows = None, 0
        if "dv" in m:
            dv_rel = f"data/dv-{uuid.uuid4().hex}"
            (new.path / dv_rel).mkdir(parents=True)
            for f in sorted((self.path / m["dv"]).glob("*.parquet")):
                get_store().link_or_copy(f, new.path / dv_rel / f.name)
            dv_rows = m.get("dv_rows", 0)
        props = dict(self._props(v)) or None
        new._try_commit(0, rel, m["schema"], "clone",
                        props=props, files=cloned_files,
                        dv_rel=dv_rel, dv_rows=dv_rows,
                        constraints=m.get("constraints"))
        return new

    def _props(self, version: int | None = None) -> dict:
        """The table properties in force at ``version`` (default:
        latest). Properties ride every manifest (inherited by
        _try_commit) so they can evolve; legacy chains whose newer
        manifests lack the key fall back to the nearest older manifest
        that has it."""
        v = self.latest_version() if version is None else version
        if v is None:
            return {}
        for vv in range(v, -1, -1):
            p = self._manifest(vv, with_files=False).get("props")
            if p is not None:
                return p
        return {}

    def cdf_enabled(self) -> bool:
        """True iff the table records commit-time change files (a
        Delta-style table property)."""
        return bool(self._props().get("cdf"))

    def dv_enabled(self) -> bool:
        """True iff DELETE statements serve merge-on-read (Delta's
        enableDeletionVectors property)."""
        return bool(self._props().get("dv"))

    def partition_cols(self) -> list[str]:
        """The partition columns declared for NEW writes ([] when
        unpartitioned). Evolvable via ``set_partition_by`` — Iceberg
        spec evolution: old files keep their recorded tuples (pruning
        stays per-file and conservative), only future commits follow
        the new spec."""
        if self.latest_version() is None:
            return []
        return list(self._props().get("partition_by", []) or [])

    def set_partition_by(self, cols: list[str] | None,
                         max_retries: int = 20) -> int:
        """Partition-spec evolution (Iceberg ALTER TABLE ... WRITE
        ORDERED/PARTITIONED BY analog): a PURE-METADATA commit that
        changes the spec for FUTURE writes only. Existing files keep
        the tuples they were written with — partition pruning is
        per-file, so mixed-spec tables prune each file by whatever it
        recorded (files without the pruned column are conservatively
        kept). Pass None/[] to stop partitioning new data."""
        cols = list(cols or [])
        for _ in range(max_retries):
            v, cur = self.snapshot()
            missing = [c for c in cols if c not in cur.columns]
            if missing:
                raise ValueError(
                    f"partition_by column(s) {missing} not in schema "
                    f"{cur.columns}")
            m = self._manifest(v)
            props = dict(self._props())
            if cols:
                props["partition_by"] = cols
            else:
                props.pop("partition_by", None)
            if self._try_commit(v + 1, m["data"], m["schema"],
                                "set_partition_by", props=props,
                                files=m.get("files"),
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up evolving partition spec after {max_retries} "
            f"conflicts")

    def compact_partition(self, pins: dict, target_files: int = 1,
                          max_retries: int = 20) -> int:
        """OPTIMIZE ... WHERE <partition pins>: compact ONLY the pinned
        partitions' files — table maintenance bounded by the partition,
        never the table (at 100 TB, OPTIMIZE runs per hot partition on
        a schedule; cold partitions cost nothing). Rows are unchanged;
        the pinned partitions' files rewrite into ``target_files``-ish
        files (per tuple), everything else carries by reference."""
        if not pins:
            raise ValueError("compact_partition needs partition pins; "
                             "use compact() for the whole table")
        return self._cow_commit(
            probe=lambda df: df,
            rewrite=lambda df: df.coalesce(target_files),
            op="compact_partition", max_retries=max_retries,
            partition_pins=pins)

    @classmethod
    def convert(cls, spark: SparkSession, parquet_dir,
                table_path) -> "AcidTable":
        """CONVERT TO ACID (Delta's ``CONVERT TO DELTA``): promote an
        existing PLAIN parquet directory to an AcidTable without
        copying or rewriting one byte of data — the files are carried
        by reference (hardlinked) into version 0's data dir and their
        footers harvested once into the manifest stats index. Cost is
        O(files) metadata; at 100 TB the convert runs in seconds and
        the full ACID surface (DML, time travel, CDF recording from v1
        on, streaming) applies immediately. Hive-partitioned layouts
        are refused: their files lack the partition columns this
        format keeps IN the data — rewrite through
        ``create(partition_by=...)`` instead."""
        import os

        src = Path(parquet_dir)
        files = sorted(src.glob("*.parquet"))
        if not files:
            sub = [p for p in src.glob("*/") if "=" in p.name]
            if sub:
                raise ValueError(
                    f"{src} is Hive-partitioned; its files lack the "
                    f"partition columns — rewrite via "
                    f"AcidTable.create(..., partition_by=[...])")
            raise FileNotFoundError(f"no parquet files in {src}")
        t = cls(spark, table_path)
        if t.latest_version() is not None:
            raise FileExistsError(
                f"AcidTable already exists at {table_path}")
        schema = spark.read.parquet(str(src)).schema
        t._manifests.mkdir(parents=True, exist_ok=True)
        t._data.mkdir(parents=True, exist_ok=True)
        rel = f"data/commit-{uuid.uuid4().hex}"
        dest = t.path / rel
        dest.mkdir(parents=True)
        for f in files:
            get_store().link_or_copy(f, dest / f.name)
        t._try_commit(0, rel, schema.jsonValue(), op="convert",
                      files=collect_parquet_stats(dest))
        return t

    @classmethod
    def exists(cls, spark: SparkSession, path) -> bool:
        t = cls(spark, path)
        return t.latest_version() is not None

    # ------------------------------------------------------------- reads

    def latest_version(self) -> int | None:
        """Newest committed version. Served from the ``_latest`` hint
        file when present — O(1) + a short forward probe instead of an
        O(versions) directory listing per call (Delta's
        _last_checkpoint idea): the hint is written best-effort AFTER
        each commit and may lag, never lead, so probing forward from it
        is always correct; a missing/corrupt hint falls back to the
        full listing."""
        return latest_committed_version(self._manifests)

    def _write_latest_hint(self, version: int) -> None:
        """Monotone best-effort hint update (atomic replace; losers of
        a concurrent update leave at worst a LAGGING hint, which
        latest_version's forward probe absorbs)."""
        try:
            tmp = self._manifests / f"._latest.{uuid.uuid4().hex[:8]}"
            tmp.write_text(str(version))
            get_store().atomic_replace(tmp, self._manifests / "_latest")
        except OSError:                   # best-effort only
            pass

    def _manifest(self, version: int, with_files: bool = True) -> dict:
        m = json.loads(
            (self._manifests / f"v{version}.json").read_text())
        # protocol gate: a manifest declaring a reader feature this
        # build lacks must fail EVERY access loudly, never misread
        check_reader_features(m.get("props"))
        if "files_base" in m and with_files:
            # O(delta) manifest: materialize the full root-relative
            # list (checkpoint/cache-backed) so every consumer keeps
            # seeing the explicit `files` shape
            m["files"] = resolve_manifest_files(self.path, m)
        return _sanitize_manifest_partitions(m)

    def _version_intact(self, m: dict, probe: bool = False) -> bool:
        """True iff every data file (and deletion vector) the manifest
        references still exists — the vacuum probe behind time travel,
        clone, restore and the change feed. Ledger membership checks
        (zero filesystem stats) on tables this code vacuumed; O(files)
        driver stats only as the no-ledger fallback, and only on those
        cold paths, never on a latest-snapshot read. ``probe=True``
        (restore/clone: verdicts that COMMIT new manifests against the
        files) additionally spot-checks one file per referenced commit
        dir against pre-ledger/out-of-band deletions."""
        return first_vacuumed_ref(self.path, m, probe=probe) is None

    def _scan_paths(self, m: dict, files: list[dict],
                    collapse: bool = True) -> list[str]:
        """Paths handed to the parquet scan: per-file paths COLLAPSED to
        their commit dir whenever the manifest references the dir's
        complete parquet set. Spark's file index pays a driver
        getFileStatus per explicit path — at a 100k-file table that is
        100k object-store HEADs per read; after collapse a compacted
        table costs O(commit dirs) listings instead. Sound because a
        commit dir's files are written exactly once by its creating
        commit (losers rmtree whole dirs) and vacuum only ever deletes
        files NO retained manifest references, so for an intact version
        referenced ⊆ existing ⊆ created — count equality ⇒ set
        equality. Any mismatch (e.g. a concurrent vacuum mid-listing)
        falls back to that dir's per-file paths, never wrong reads.

        ``collapse=False`` (time-travel reads): the count check runs at
        PLAN time but Spark lists the collapsed dir slightly later when
        the relation is built — a concurrent vacuum of a non-latest
        version in that window would make the dir scan silently return
        fewer rows, where explicit per-file paths fail loudly on the
        missing file. The latest version is vacuum-retained by contract
        (keep_last clamps to >=1), so only it collapses; a time-travel
        read keeps the loud per-file behavior."""
        if not collapse:
            return [str(self.path / _entry_rel(m, f)) for f in files]
        by_dir: dict[str, list[str]] = {}
        for f in files:
            rel = _entry_rel(m, f)
            d, _, _name = rel.rpartition("/")
            by_dir.setdefault(d, []).append(rel)
        out: list[str] = []
        for d, rels in by_dir.items():
            dp = self.path / d
            try:
                n_dir = sum(1 for p in dp.iterdir()
                            if p.name.endswith(".parquet"))
            except OSError:
                n_dir = -1
            if n_dir == len(rels):
                out.append(str(dp))
            else:
                out.extend(str(self.path / r) for r in rels)
        return out

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest committed).  Only
        files named by that manifest are visible — a concurrent writer's
        half-written data dir can never tear a read (time travel: any
        retained version stays readable forever)."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        mapping = self._mapping_at(v)
        pschema = self._physical_struct(schema, mapping)

        def to_logical(df: DataFrame) -> DataFrame:
            # column-mapping projection: physical scan names back to
            # the version's logical names (identity when unmapped)
            if not mapping:
                return df.select(*[f.name for f in schema.fields])
            return df.select(*[
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in schema.fields])

        files = m.get("files")
        if files is None:
            # legacy manifest (no per-file bookkeeping): plain dir scan
            if not (self.path / m["data"]).is_dir():
                raise VersionVacuumedError(
                    f"version {v} of {self.path} was vacuumed; its "
                    f"manifest survives as history but the data files "
                    f"are gone")
            base = (self.spark.read.schema(pschema)
                    .parquet(str(self.path / m["data"])))
        else:
            # MANIFEST-DRIVEN READ: the scan opens exactly the files the
            # manifest names, wherever their commit dir lives — no
            # physical data-dir rebuild ever happens at commit time.
            # The LATEST version is intact by the vacuum contract (its
            # files are always retained), so only time-travel reads pay
            # the per-file existence probe that turns a vacuumed
            # snapshot into a loud VersionVacuumedError instead of a
            # mid-query scan failure.
            is_latest = v == self.latest_version()
            if not is_latest:
                gone = first_vacuumed_ref(self.path, m)
                if gone is not None:
                    raise VersionVacuumedError(
                        f"version {v} of {self.path} was vacuumed "
                        f"({gone} is gone); its manifest survives as "
                        f"history but the data files do not")
            if not files:
                return self.spark.createDataFrame([], schema)
            base = (self.spark.read.schema(pschema)
                    .parquet(*self._scan_paths(m, files,
                                               collapse=is_latest)))
        if "dv" not in m:
            return to_logical(base)
        if not (self.path / m["dv"]).is_dir():
            raise VersionVacuumedError(
                f"version {v} of {self.path} lost its deletion vector "
                f"to vacuum; serving the bare files would RESURRECT "
                f"deleted rows")
        return to_logical(self._apply_dv(self._with_pos(base), m))

    # ------------------------------------------- deletion-vector plumbing

    def _with_pos(self, scan: DataFrame) -> DataFrame:
        """Tag a file-scan frame with the stable physical row identity
        ``(__dv_file, __dv_pos)`` = (file name, row index within the
        file). Data files are immutable and carried by NAME across
        linked commits, so the pair identifies a row for the life of
        the file — the anchor deletion vectors hang off."""
        return (scan
                .withColumn("__dv_file", F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1))
                .withColumn("__dv_pos", F.col("_metadata.row_index")))

    def _apply_dv(self, tagged: DataFrame, m: dict) -> DataFrame:
        """Anti-join out the rows a manifest's deletion vector marks
        dead. The DV is small by construction (it holds MATCHED rows —
        bulk deletes take the COW path), so AQE broadcasts it and the
        scan stays shuffle-free."""
        dv = (self.spark.read.parquet(str(self.path / m["dv"]))
              .select(F.col("file").alias("__dv_file"),
                      F.col("pos").alias("__dv_pos")))
        # broadcast is justified when the vector is SMALL — the normal
        # state (MOR holds matched rows only; bulk deletes fall back to
        # COW, and cow_fallback_rows bounds the SQL front door). But
        # direct delete_where_mor/update_where_mor calls CAN accumulate
        # an arbitrarily large vector across commits, and forcing a
        # broadcast there risks driver/executor OOM where a shuffle
        # join is right — so the hint applies only under a row
        # threshold (the manifest tracks dv_rows exactly; ~16 bytes/row
        # → 2M rows ≈ 32 MB, inside a default-config broadcast) and
        # AQE picks the strategy above it.
        if m.get("dv_rows", 0) <= 2_000_000:
            dv = F.broadcast(dv)
        return tagged.join(dv, ["__dv_file", "__dv_pos"], "left_anti")

    def version_at(self, ts) -> int:
        """The version serving at wall-clock ``ts`` (epoch seconds or an
        ISO-8601 string) — Delta's ``TIMESTAMP AS OF`` resolution: the
        NEWEST version whose commit timestamp is <= ts. Raises if ts
        predates the table (manifests from before timestamps existed
        count as epoch 0, i.e. always eligible)."""
        if isinstance(ts, str):
            from datetime import datetime
            ts = datetime.fromisoformat(ts).timestamp()
        latest = self.latest_version()
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        ok = [v for v in range(latest + 1)
              if self._manifest(v).get("ts", 0) <= ts]
        if not ok:
            raise ValueError(
                f"TIMESTAMP AS OF {ts} predates version 0 of {self.path}")
        return max(ok)

    def snapshot(self) -> tuple[int, DataFrame]:
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        return v, self.read(v)

    def pruned_files(self, col: str, lo, hi,
                     version: int | None = None) -> tuple[list[str], int]:
        """(paths overlapping [lo, hi] on ``col``, total file count) from
        the manifest's footer stats — no data file is opened to decide.
        Files without stats for ``col`` (or manifests from before stats
        existed) are conservatively kept. On a table partitioned by
        ``col``, the file's recorded partition VALUE decides first
        (exact, one comparison) and stats are only consulted for files
        without one."""
        v = self.latest_version() if version is None else version
        m = self._manifest(v)
        files = m.get("files")
        if not files:  # pre-stats manifest: no skipping possible
            paths = sorted(str(p) for p in
                           (self.path / m["data"]).glob("*.parquet"))
            return paths, len(paths)
        keep = []
        for f in files:
            pv = (f.get("partition") or {}).get(col)
            if pv is not None:           # partition pruning FIRST
                try:
                    if lo <= pv <= hi:
                        keep.append(str(self.path / _entry_rel(m, f)))
                    continue
                except TypeError:        # mixed types: fall to stats
                    pass
            st = f.get("stats", {}).get(col)
            if st is None or (st[0] <= hi and lo <= st[1]):
                keep.append(str(self.path / _entry_rel(m, f)))
        return keep, len(files)

    def read_range(self, col: str, lo, hi,
                   version: int | None = None) -> DataFrame:
        """Range read through manifest data skipping: open ONLY the files
        whose [min, max] extent overlaps [lo, hi], then apply the exact
        residual predicate. Identical rows to ``read().filter(...)`` by
        construction (skipped files provably hold no matching rows); IO
        is proportional to the matching extent, not the table."""
        v = self.latest_version() if version is None else version
        m = self._manifest(v)
        paths, _ = self.pruned_files(col, lo, hi, version=v)
        schema = StructType.fromJson(m["schema"])
        if not paths:
            return (self.spark.createDataFrame([], schema)
                    .filter(F.col(col).between(lo, hi)))
        df = self._tagged_physical_scan(m, schema, paths)
        if "dv" in m:
            df = self._apply_dv(df, m)
        return (df.select(*[f.name for f in schema.fields])
                .filter(F.col(col).between(lo, hi)))

    # ------------------------------------------------------------ commits

    def _mapping_at(self, version: int | None = None) -> dict:
        """The logical→PHYSICAL column-name map in force at ``version``
        (Delta columnMapping 'name' mode). Physical names are frozen at
        a column's birth; RENAME/DROP COLUMN only edit this map, so
        they are pure-metadata commits at any table size. Empty =
        identity — tables that never rename/drop pay no indirection."""
        return dict(self._props(version).get("column_mapping") or {})

    @staticmethod
    def _physical_struct(schema: StructType, mapping: dict) -> StructType:
        """``schema`` with each field renamed to its physical name — the
        schema data files are actually written/scanned with."""
        if not mapping:
            return schema
        from pyspark.sql.types import StructField
        return StructType([
            StructField(mapping.get(f.name, f.name), f.dataType,
                        f.nullable) for f in schema.fields])

    @staticmethod
    def _destat_entries(entries: list[dict], mapping: dict) -> list[dict]:
        """Manifest entries keep LOGICAL column names in their stats /
        partition metadata (harvested footers carry physical names on
        mapped tables) — so every pruner keeps working untranslated."""
        if not mapping:
            return entries
        inv = {p: l for l, p in mapping.items()}
        for e in entries:
            if e.get("stats"):
                e["stats"] = {inv.get(k, k): v
                              for k, v in e["stats"].items()}
            if e.get("partition"):
                e["partition"] = {inv.get(k, k): v
                                  for k, v in e["partition"].items()}
        return entries

    def _stage_rows(self, rows: DataFrame, dest: Path,
                    pcols: list[str],
                    order_by: list[str] | None = None,
                    lanes: int = 1) -> list[dict]:
        """Write ``rows`` as flat, uniquely-named parquet files under
        ``dest`` and return their manifest stats entries. On a
        partitioned table the batch is first hash-repartitioned on the
        partition columns (Delta optimized-write: each tuple lands on
        ONE task, so a commit adds one file per touched tuple instead
        of tasks×tuples small files), optionally sorted within tasks on
        ``order_by`` (relayout's within-partition clustering), then
        routed through ``partitionBy`` on DUPLICATED shadow columns (so
        the real columns stay inside the data files); each hive leaf
        file becomes one flat commit file and its partition tuple is
        recorded on the manifest entry — the Iceberg invariant: one
        partition tuple per file, tracked in metadata, never in
        paths."""
        # observability: distributed staging passes this handle paid
        # (contention tests assert O(committed writes), proving lost
        # races re-parent instead of re-staging)
        self.stage_count = getattr(self, "stage_count", 0) + 1
        mapping = self._mapping_at()
        if mapping:
            # column-mapping mode: data files ALWAYS hold the frozen
            # physical names; stats/partition metadata stays logical
            rows = rows.select([F.col(c).alias(mapping.get(c, c))
                                for c in rows.columns])
            pcols = [mapping.get(c, c) for c in pcols]
            if order_by:
                order_by = [mapping.get(c, c) for c in order_by]
        tmp = self.path / f"data/tmp-{uuid.uuid4().hex}"
        tag = uuid.uuid4().hex[:8]
        if not pcols:
            rows.write.parquet(str(tmp))
            for i, p in enumerate(sorted(tmp.glob("*.parquet"))):
                shutil.move(str(p), dest / f"add-{tag}-{i:05d}.parquet")
            shutil.rmtree(tmp, ignore_errors=True)
            entries = self._destat_entries(
                collect_file_stats(
                    sorted(dest.glob(f"add-{tag}-*.parquet"))),
                mapping)
            crash_point("after_stage_data")
            entries = self._attach_blooms(entries, dest, mapping)
            crash_point("after_bloom_sidecars")
            return entries
        if lanes == 0:
            # COW-rewrite path: the input is already partition-
            # clustered (touched files each hold ONE tuple), so
            # partitionBy alone splits correctly with NO shuffle and
            # full input parallelism; file fan-out is bounded by the
            # touched subset's task count, not the table's.
            dup = rows
        elif lanes > 1:
            # spread each tuple over `lanes` writer tasks (pre-shuffle
            # task id as the salt) — Delta's optimized-write/adaptive-
            # shuffle compromise for big shuffled batches
            dup = rows.repartition(
                *pcols, F.spark_partition_id() % lanes)
        else:
            # append path: one file per touched tuple per commit
            dup = rows.repartition(*pcols)
        if order_by:
            dup = dup.sortWithinPartitions(*pcols, *order_by)
        for c in pcols:
            dup = dup.withColumn(f"__pt_{c}", F.col(c))
        dup.write.partitionBy(*[f"__pt_{c}" for c in pcols]) \
            .parquet(str(tmp))
        ptypes = {f.name: f.dataType for f in rows.schema.fields}
        moved: list[tuple[str, dict]] = []
        for i, p in enumerate(sorted(tmp.rglob("*.parquet"))):
            part = {}
            for seg in p.relative_to(tmp).parts[:-1]:
                k, _, raw = seg.partition("=")
                col = k[len("__pt_"):]
                part[col] = _parse_hive_value(raw, ptypes.get(col))
            name = f"add-{tag}-{i:05d}.parquet"
            shutil.move(str(p), dest / name)
            moved.append((name, part))
        shutil.rmtree(tmp, ignore_errors=True)
        entries = collect_file_stats([dest / n for n, _ in moved])
        for e, (_, part) in zip(entries, moved):
            e["partition"] = part
        entries = self._destat_entries(entries, mapping)
        crash_point("after_stage_data")
        entries = self._attach_blooms(entries, dest, mapping)
        crash_point("after_bloom_sidecars")
        return entries

    def bloom_cols(self) -> list[str]:
        """Columns with a per-file bloom-filter index (Delta's bloom
        filter index): point-equality reads skip files whose bitset
        proves the value absent — the needle-in-haystack complement to
        [min, max] stats, which are useless on high-cardinality
        unclustered columns. [] when unindexed."""
        if self.latest_version() is None:
            return []
        return list(self._props().get("bloom_by", []) or [])

    def set_bloom_by(self, cols: list[str] | None,
                     max_retries: int = 20) -> int:
        """Declare (or clear) the bloom-indexed columns for FUTURE
        writes — a pure-metadata commit, same evolution contract as
        ``set_partition_by``: existing files without a sidecar are
        conservatively kept by every point read, and re-index
        naturally when a compact/relayout/optimize rewrites them."""
        cols = list(cols or [])
        for _ in range(max_retries):
            v, cur = self.snapshot()
            missing = [c for c in cols if c not in cur.columns]
            if missing:
                raise ValueError(
                    f"bloom_by column(s) {missing} not in schema "
                    f"{cur.columns}")
            bad = [c for c in cols
                   if not _bloom_indexable(cur.schema[c].dataType)]
            if bad:
                raise ValueError(
                    f"bloom_by column(s) {bad} are not integral/string"
                    " — bloom sidecars only index those types")
            m = self._manifest(v)
            props = dict(self._props())
            if cols:
                props["bloom_by"] = cols
            else:
                props.pop("bloom_by", None)
            if self._try_commit(v + 1, m["data"], m["schema"],
                                "set_bloom_by", props=props,
                                files=m.get("files"),
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up setting bloom index after {max_retries} "
            f"conflicts")

    def _attach_blooms(self, entries: list[dict], dest: Path,
                       mapping: dict | None = None,
                       cols: list[str] | None = None) -> list[dict]:
        """Build per-file bloom sidecars for the staged ``entries`` —
        ONE distributed pass over the new files only (the O(delta)
        discipline: index cost scales with the batch, never the
        table). Sidecars are hidden files (``_bloom-...``) in the same
        commit dir, so they share the data files' lifecycle and dir
        scans never see them; the entry records root-relative sidecar
        paths keyed by LOGICAL column (stats discipline under column
        mapping)."""
        cols = self.bloom_cols() if cols is None else list(cols)
        cols = [c for c in cols if c]
        if not cols or not entries:
            return entries
        mapping = mapping or {}
        rel = dest.relative_to(self.path).as_posix()
        jobs = [(str(dest / e["path"]), e["path"],
                 c, mapping.get(c, c)) for e in entries for c in cols]

        def work(it):
            import pyarrow.parquet as pq
            for path, name, logical, physical in it:
                try:
                    col = pq.read_table(
                        path, columns=[physical]).column(physical)
                    vals = {v for v in col.to_pylist()
                            if v is not None}
                    buf = build_bloom(vals)
                except (OSError, KeyError):
                    continue          # unindexable: reader keeps file
                if vals and not any(_bloom_pair(v) is not None
                                    for v in vals):
                    # values present but none hashable (legacy table
                    # declared a non-int/str column): an all-zero
                    # sidecar would be a false definitive-absence —
                    # write none, reader keeps the file
                    continue
                side = f"_bloom-{name}-{logical}.bin"
                with open(Path(path).parent / side, "wb") as fh:
                    fh.write(buf)
                yield (name, logical, side)

        import threading
        pooled = threading.current_thread().name.startswith("acid-commit")
        if len(jobs) <= 8 and not pooled:
            # micro-batch staging: the per-(file,col) work is one small
            # column read + hash — inline costs less than a Spark job
            # round-trip (the pruned_files_in <=64 rule). NOT inlined
            # from the multi-table commit pool: there the hashing would
            # serialize the concurrent commit chains on the driver GIL
            # (measured: inline-everywhere was a wash on the pooled
            # maintainers, 1.2 s win on single-table append scenarios).
            made = list(work(jobs))
        else:
            made = self.spark.sparkContext.parallelize(
                jobs, max(1, min(len(jobs), 64))).mapPartitions(
                work).collect()
        by_file: dict[str, dict] = {}
        for name, logical, side in made:
            by_file.setdefault(name, {})[logical] = f"{rel}/{side}"
        for e in entries:
            if e["path"] in by_file:
                e["bloom"] = by_file[e["path"]]
        return entries

    def pruned_files_eq(self, col: str, value,
                        version: int | None = None
                        ) -> tuple[list[str], int]:
        """(paths that may hold ``col = value``, total file count):
        partition pins and [min, max] stats decide first (pure
        manifest), then each surviving file's bloom sidecar — ~KBs
        read per file instead of the file itself, a definitive skip on
        a miss. Files without a sidecar (pre-index history, foreign
        writers) are conservatively kept.

        Sidecar probes DISTRIBUTE past a threshold: a needle lookup on
        a 100k-file table is 100k small sidecar reads — executors fan
        them out (bounded driver traffic: only surviving names return);
        small candidate sets stay driver-side (no job overhead).

        The single needle is the K=1 case of ``pruned_files_in`` —
        ONE implementation of the partition/stats/bloom protocol."""
        return self.pruned_files_in(col, [value], version)

    def read_eq(self, col: str, value,
                version: int | None = None) -> DataFrame:
        """Point-equality read through partition + stats + bloom
        skipping; the residual predicate still applies (bloom
        survivors are candidates, not matches)."""
        v = self.latest_version() if version is None else version
        paths, _ = self.pruned_files_eq(col, value, v)
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        if not paths:
            return (self.spark.createDataFrame([], schema)
                    .filter(F.col(col) == F.lit(value)))
        tagged = self._tagged_physical_scan(m, schema, paths)
        if "dv" in m:
            tagged = self._apply_dv(tagged, m)
        return (tagged.select(*[f.name for f in schema.fields])
                .filter(F.col(col) == F.lit(value)))

    def pruned_files_in(self, col: str, values: list,
                        version: int | None = None
                        ) -> tuple[list[str], int]:
        """Batched variant of ``pruned_files_eq``: (paths that may
        hold ``col IN (values)``, total file count). One manifest
        resolution and ONE sidecar read per candidate file serve ALL
        needles — a K-needle lookup is O(files + surviving bytes),
        never K serial prune passes. This is the point-lookup shape a
        serving layer actually runs (fetch these 50 ids), and the
        bench scenario's no-false-negative audit collapses from K
        Spark jobs to one."""
        v = self.latest_version() if version is None else version
        # memoized per (version, col, needles): a keyed DML's advisory
        # would-anything-prune check and _cow_commit's find pass probe
        # the SAME immutable manifest+sidecars — the sidecar sweep
        # (and its >64-file Spark job) must run once per attempt, not
        # twice (r16 ADVICE). Manifests and sidecar bytes are
        # immutable per version, so the memo is sound; unhashable
        # needle values just skip it.
        try:
            memo_key = (v, col, tuple(values))
        except TypeError:
            memo_key = None
        memo = getattr(self, "_prune_memo", None)
        if memo is None:
            memo = self._prune_memo = {}
        if memo_key is not None and memo_key in memo:
            keep, total = memo[memo_key]
            return list(keep), total
        m = self._manifest(v)
        files = m.get("files")
        if not files:
            paths = sorted(str(p) for p in
                           (self.path / m["data"]).glob("*.parquet"))
            return paths, len(paths)
        try:
            dt = StructType.fromJson(m["schema"])[col].dataType
        except (KeyError, TypeError):
            dt = None
        canon: list[tuple[object, bool, tuple[int, int] | None]] = []
        for value in values:
            if dt is not None:
                cv, probeable = _canon_probe(value, dt)
            else:
                cv, probeable = (value,
                                 isinstance(value, (int, str))
                                 and not isinstance(value, bool))
            # hash each needle ONCE for the whole file sweep — the
            # per-(file, needle) md5 dominated the driver prune at
            # _EQ_PRUNE_CAP needles
            canon.append((cv, probeable,
                          _bloom_pair(cv) if probeable else None))
        num = (int, float)

        def may_hold(f, value, probeable) -> tuple[bool, str | None]:
            """(survives partition+stats, sidecar rel to probe or
            None when the verdict is already final)."""
            pv = (f.get("partition") or {}).get(col)
            if pv is not None and pv != value:
                if type(pv) is type(value) or (
                        isinstance(pv, num) and isinstance(value, num)
                        and not isinstance(pv, bool)
                        and not isinstance(value, bool)):
                    return False, None
            st = f.get("stats", {}).get(col)
            if st is not None:
                try:
                    if not st[0] <= value <= st[1]:
                        return False, None
                except TypeError:
                    pass
            side = (f.get("bloom") or {}).get(col)
            if side and probeable:
                return True, side
            return True, None
        keep: list[str] = []
        to_probe: list[tuple[str, str, list]] = []
        for f in files:
            path = str(self.path / _entry_rel(m, f))
            side_vals: list = []
            side_rel: str | None = None
            kept = False
            for value, probeable, pair in canon:
                ok, side = may_hold(f, value, probeable)
                if not ok:
                    continue
                if side is None:
                    kept = True      # survives without a bloom verdict
                    break
                side_rel = side
                side_vals.append(pair)
            if kept:
                keep.append(path)
            elif side_vals:
                to_probe.append(
                    (str(self.path / side_rel), path, side_vals))

        def probe_one(side_path: str, pairs: list) -> bool:
            try:
                buf = Path(side_path).read_bytes()
            except OSError:
                return True           # sidecar gone: keep the file
            return any(_bloom_hit(buf, p) for p in pairs)
        if len(to_probe) <= 64:
            keep.extend(p for s, p, vals in to_probe
                        if probe_one(s, vals))
        else:
            def work(it):
                for s, p, vals in it:
                    if probe_one(s, vals):
                        yield p
            keep.extend(self.spark.sparkContext.parallelize(
                to_probe, max(1, min(len(to_probe) // 32, 256)))
                .mapPartitions(work).collect())
        if memo_key is not None:
            if len(memo) >= 8:
                memo.clear()         # tiny working set: advisory + find
            memo[memo_key] = (tuple(keep), len(files))
        return keep, len(files)

    def read_eq_any(self, col: str, values: list,
                    version: int | None = None) -> DataFrame:
        """``col IN (values)`` read through the batched prune: one
        scan over the union of surviving files, the residual IN
        predicate applied on top — K point lookups in ONE Spark job."""
        v = self.latest_version() if version is None else version
        paths, _ = self.pruned_files_in(col, values, v)
        m = self._manifest(v)
        schema = StructType.fromJson(m["schema"])
        if not paths:
            return (self.spark.createDataFrame([], schema)
                    .filter(F.col(col).isin(list(values))))
        tagged = self._tagged_physical_scan(m, schema, paths)
        if "dv" in m:
            tagged = self._apply_dv(tagged, m)
        return (tagged.select(*[f.name for f in schema.fields])
                .filter(F.col(col).isin(list(values))))

    def _write_data_full(self, df: DataFrame,
                         pcols: list[str] | None = None,
                         order_by: list[str] | None = None
                         ) -> tuple[str, list[dict]]:
        """Full-snapshot write into a fresh commit dir; returns
        (data_rel, manifest stats entries)."""
        if pcols is None:
            pcols = self.partition_cols()
        rel = f"data/commit-{uuid.uuid4().hex}"
        dest = self.path / rel
        dest.mkdir(parents=True)
        entries = self._stage_rows(df, dest, pcols, order_by=order_by)
        if order_by:
            # clustering provenance (Delta liquid's ZCube id analog):
            # files born range-clustered on these keys carry the fact,
            # so optimize_incremental can skip them by METADATA alone
            for e in entries:
                e["sort"] = list(order_by)
        return rel, entries

    def _carried_entries(self, parent: dict) -> list[dict]:
        """The parent snapshot's file entries, re-anchored to
        table-root-relative paths — a pure in-memory list concat, the
        manifest-list carry. A legacy parent (no per-file bookkeeping)
        pays a one-time footer harvest of its data dir; from then on
        every descendant carries entries by reference."""
        files = parent.get("files")
        if files is None:       # one-time legacy migration harvest
            files = collect_parquet_stats(self.path / parent["data"])
        return [{**f, "path": _entry_rel(parent, f)} for f in files]

    def _write_data_linked(self, parent: dict,
                           rows: DataFrame) -> tuple[str, list[dict]]:
        """APPEND fast path — O(delta) in IO AND metadata: write ONLY
        the new rows as parquet into a fresh commit dir; the parent
        snapshot's files are carried purely by MANIFEST REFERENCE (a
        file-list concat — no links, no copies, no per-file syscalls,
        the real Delta/Iceberg commit shape, object-store-compatible).
        Manifest stats = parent's recorded entries + footers of just
        the new files. Returns (data_rel, files stats list)."""
        rel = f"data/commit-{uuid.uuid4().hex}"
        dest = self.path / rel
        dest.mkdir(parents=True)
        new_stats = self._stage_rows(rows, dest, self.partition_cols())
        for e in new_stats:
            e["path"] = f"{rel}/{e['path']}"
        return rel, self._carried_entries(parent) + new_stats

    def _assemble_commit(self, rows: DataFrame, parent: dict,
                         link: list[dict]) -> tuple[str, list[dict]]:
        """Build a commit from freshly-written ``rows`` plus the
        specific parent entries in ``link``, carried by manifest
        reference only (each entry resolved against ``parent``). Stats
        are harvested from the NEW files' footers only; carried files
        reuse their recorded entries — no old data is opened, no links
        are made."""
        rel = f"data/commit-{uuid.uuid4().hex}"
        dest = self.path / rel
        dest.mkdir(parents=True)
        new_stats = self._stage_rows(rows, dest, self.partition_cols(),
                                     lanes=0)
        for e in new_stats:
            e["path"] = f"{rel}/{e['path']}"
        carried = [{**f, "path": _entry_rel(parent, f)} for f in link]
        return rel, carried + new_stats

    def _tagged_physical_scan(self, m: dict, schema: StructType,
                              paths: list[str]) -> DataFrame:
        """(file, pos)-tagged scan of explicit file paths under the
        version's column mapping: the parquet read binds PHYSICAL
        names, the projection restores the version's logical names —
        so caller predicates (DML conditions) keep binding correctly
        on renamed tables."""
        mapping = self._mapping_at(m["version"])
        tagged = self._with_pos(
            self.spark.read
            .schema(self._physical_struct(schema, mapping))
            .parquet(*paths))
        if mapping:
            tagged = tagged.select(
                *[F.col(mapping.get(f.name, f.name)).alias(f.name)
                  for f in schema.fields],
                F.col("__dv_file"), F.col("__dv_pos"))
        return tagged

    def _tuples_matching_cond(self, cond: str,
                              parts: list) -> set | None:
        """Partition tuples that MAY satisfy ``cond`` — the range
        extension of the equality-pin fast path (`DELETE WHERE day <
        '2025-01-01'` opens only matching partitions' files; retention
        deletes are THE canonical 100 TB DML). Top-level AND conjuncts
        that (a) ANALYZE against a schema holding ONLY the partition
        columns, (b) reference at least one column (checked by also
        analyzing against an EMPTY schema — a column-free conjunct
        like `rand() < 0.5` must not be evaluated per-tuple), and (c)
        name no time/randomness function are evaluated over the
        DISTINCT recorded tuples in one local DataFrame pass —
        Catalyst does the parsing and coercion, so '2025-01-01' vs a
        date partition behaves exactly like the residual predicate.
        Every other conjunct is ignored (conservative keep). Returns a
        set of tuple keys, or None when nothing was applicable."""
        pcols = self.partition_cols()
        tuples = {tuple(sorted(p.items())) for p in parts if p}
        if not pcols or not tuples:
            return None
        # files from OLDER partition specs carry different key sets
        # (spec evolution); a conjunct may only prune tuples whose
        # key set it analyzes against — evaluate PER KEY-SET GROUP so
        # an old-spec file is never NULL-pruned by a new-spec conjunct
        groups: dict[frozenset, set] = {}
        for t in tuples:
            groups.setdefault(frozenset(k for k, _ in t), set()).add(t)
        try:
            conjs = [c for c in _split_top_and(cond)
                     if not _NONPRUNABLE_FN.search(c)]
            empty = self.spark.createDataFrame([], "__never int")

            def column_free(conj) -> bool:
                try:
                    empty.filter(conj).schema
                    return True
                except Exception:                # noqa: BLE001
                    return False

            keep: set = set()
            pruned_any = False
            for keyset, grp in groups.items():
                tdf = self.spark.createDataFrame(
                    [dict(t) for t in sorted(grp)])
                applicable = []
                for conj in conjs:
                    try:
                        tdf.filter(conj).schema  # group-keys-only refs
                    except Exception:            # noqa: BLE001
                        continue
                    if column_free(conj):
                        continue
                    applicable.append(conj)
                if not applicable:
                    keep |= grp                  # conservative keep
                    continue
                pruned_any = True
                keep |= {tuple(sorted(r.asDict().items()))
                         for r in tdf.filter(" AND ".join(
                             f"({c})" for c in applicable)).collect()}
            return keep if pruned_any else None
        except Exception:                        # noqa: BLE001
            return None                          # conservative: no prune

    def _cow_commit(self, probe, rewrite, op: str,
                    max_retries: int = 20,
                    empty_noop: bool = True,
                    partition_pins: dict | None = None,
                    partition_in: list[dict] | None = None,
                    partition_cond: str | None = None,
                    row_local: bool = False,
                    txn: str | None = None,
                    eq_any_prune: tuple[str, list]
                    | list[tuple[str, list]] | None = None
                    ) -> int | None:
        """File-pruned copy-on-write commit — the Delta/Iceberg DML
        discipline, so a selective DELETE/UPDATE/MERGE costs O(matched
        files), never O(table):

        1. **Find pass** — scan ONLY the predicate columns (Catalyst
           prunes the rest; parquet row-group stats skip inside the
           scan) and collect the distinct ``_metadata.file_path`` of
           rows ``probe`` says need rewriting. Driver state is a file
           list — bounded by the manifest, which it already holds.
        2. **Rewrite pass** — read just the touched files, apply
           ``rewrite``, write the replacements; every untouched file is
           carried into the new commit as a hardlink with its recorded
           manifest stats (a file-list concat in a manifest-list
           format — no data IO).

        On a CDF table the change files are derived from the touched
        subset only (one exceptAll pair over the rewritten files, not
        the table). Falls back to the full-rewrite loop for legacy
        manifests without per-file stats.

        ``partition_pins`` ({col: literal}) / ``partition_in`` (list of
        acceptable partition tuples) make the FIND pass itself pruned:
        manifest entries whose recorded partition tuple cannot match
        are never even opened — at 100 TB the find pass is
        O(touched-partition files), not O(table files). Sets
        ``self.last_cow_stats`` = {files_scanned, files_rewritten,
        files_linked} for observability.

        DML-vs-append reconciliation (``row_local=True``; Delta's
        conflict rule for DELETE/UPDATE): a lost race keeps the staged
        replacements and re-probes ONLY the winner's added files —
        Delta raises ConcurrentAppendException on possible overlap, but
        a row-local op (probe = pure filter, rewrite = per-row map with
        no insertions) can do better: added files the predicate misses
        ride along untouched; added files it hits are incrementally
        rewritten (O(added files), never a re-run of the whole DML).
        Winners that changed schema/props/constraints, removed files,
        or moved the deletion vector force the full fallback."""
        cdf = self.cdf_enabled()
        staged = None  # (rel, stats, dv_rel, dv_rows, ch_rel, base_m)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            if txn is not None and self._txn_fenced(m, txn):
                # the fenced batch landed mid-retry (a zombie run
                # racing its restart — the at-least-once scenario the
                # fence targets): re-checked against EVERY attempt's
                # manifest, never just entry, so two concurrent
                # invocations of the same batch can't both commit
                if staged is not None:
                    shutil.rmtree(self.path / staged[0],
                                  ignore_errors=True)
                    for r in (staged[2], staged[4]):
                        if r and isinstance(r, str):
                            shutil.rmtree(self.path / r,
                                          ignore_errors=True)
                return None
            files = m.get("files")
            if not files:      # legacy manifest: no per-file bookkeeping
                if staged is not None:
                    shutil.rmtree(self.path / staged[0],
                                  ignore_errors=True)
                    for r in (staged[2], staged[4]):
                        if r and isinstance(r, str):
                            shutil.rmtree(self.path / r,
                                          ignore_errors=True)
                # the fence must ride the fallback commit too — a
                # fenced apply_cdf on a legacy/empty-files chain would
                # otherwise re-apply on replay
                return self._commit_loop(rewrite, op, max_retries,
                                         txn=txn)
            if staged is not None:
                rel0, stats0, dv_rel0, dv_rows0, ch_rel0, base_m = staged
                done = self._cow_rebase(
                    v, m, base_m, rel0, stats0, dv_rel0, dv_rows0,
                    ch_rel0, probe, rewrite, op, cur, row_local, cdf,
                    partition_pins, partition_in,
                    partition_cond, txn=txn)
                if done is not None:
                    if done >= 0:
                        return done
                    continue           # lost again; staged still valid
                # incompatible winner: drop the staged attempt, rebuild
                shutil.rmtree(self.path / rel0, ignore_errors=True)
                for r in (dv_rel0, ch_rel0):
                    if r and isinstance(r, str):
                        shutil.rmtree(self.path / r, ignore_errors=True)
                staged = None
            schema = StructType.fromJson(m["schema"])
            scols = [f.name for f in schema.fields]
            # partition pruning FIRST — metadata-only, before any IO
            eligible = files
            if partition_pins:
                eligible = [f for f in eligible if _pins_match(
                    f.get("partition"), partition_pins)]
            if partition_in is not None:
                def any_match(part):
                    return any(_pins_match(part, pins)
                               for pins in partition_in)
                eligible = [f for f in eligible
                            if not f.get("partition")
                            or any_match(f["partition"])]
            if partition_cond:
                # range/general predicate pruning, recomputed against
                # THIS attempt's manifest (a winner's new partitions
                # are re-evaluated, never skipped by a stale list)
                keep_t = self._tuples_matching_cond(
                    partition_cond,
                    [f.get("partition") for f in eligible])
                if keep_t is not None:
                    eligible = [
                        f for f in eligible if not f.get("partition")
                        or tuple(sorted(f["partition"].items()))
                        in keep_t]
            if eq_any_prune is not None:
                # key-equality pruning through stats + bloom sidecars
                # (pruned_files_in), recomputed against THIS attempt's
                # manifest like the partition prunes above — a keyed
                # DML's find pass opens only files that may hold a
                # key, never the table (apply_cdf's retire path). A
                # LIST of (col, vals) pairs is OR-of-columns: a file
                # survives when ANY listed column may hold a needle
                # (delete_semi's drop-every-pair-touching-a-key shape)
                prunes = (eq_any_prune
                          if isinstance(eq_any_prune, list)
                          else [eq_any_prune])
                keep_set: set[str] = set()
                for pc, pv in prunes:
                    kp, _ = self.pruned_files_in(pc, pv, v)
                    keep_set.update(kp)
                eligible = [f for f in eligible
                            if str(self.path / _entry_rel(m, f))
                            in keep_set]
            if len(eligible) < len(files):
                e_paths = [str(self.path / _entry_rel(m, f))
                           for f in eligible]
                if e_paths:
                    scan = self._tagged_physical_scan(m, schema,
                                                      e_paths)
                    if "dv" in m:
                        scan = self._apply_dv(scan, m)
                    touched_names = {
                        r["__dv_file"] for r in probe(scan)
                        .select("__dv_file").distinct().collect()}
                else:
                    touched_names = set()
            else:
                tagged = self._tagged_physical_scan(
                    m, schema, [str(self.path / _entry_rel(m, f))
                                for f in files])
                if "dv" in m:
                    tagged = self._apply_dv(tagged, m)
                touched_names = {
                    r["__dv_file"] for r in
                    probe(tagged).select("__dv_file").distinct().collect()}
            untouched = [f for f in files
                         if _entry_name(f) not in touched_names]
            self.last_cow_stats = {
                "files_scanned": len(eligible),
                "files_rewritten": len(files) - len(untouched),
                "files_linked": len(untouched)}
            cons = m.get("constraints", {})
            if not touched_names and empty_noop:
                # predicate matched nothing: pure-metadata commit that
                # shares the parent's data dir (the version still exists,
                # so the op is observable and CDF-consistent) — the
                # empty change set is recorded by reference, no write
                if self._try_commit(v + 1, m["data"], m["schema"], op,
                                    txn=txn,
                                    changes_ref=([] if cdf else None),
                                    files=files,
                                    dv_rel=m.get("dv"),
                                    dv_rows=m.get("dv_rows", 0)):
                    return v + 1
                continue
            t_paths = [str(self.path / _entry_rel(m, f)) for f in files
                       if _entry_name(f) in touched_names]
            if t_paths:
                tg = self._tagged_physical_scan(m, schema, t_paths)
                if "dv" in m:
                    tg = self._apply_dv(tg, m)
                touched = tg.select(*scols)
            else:
                touched = self.spark.createDataFrame([], schema)
            out = rewrite(touched).select(*cur.columns)
            if cons:
                # untouched files are untouched rows — only the
                # rewritten output needs re-validation
                self._check_constraints(out, cons)
            rel, stats = self._assemble_commit(out, m, untouched)
            # rewritten files materialize their share of the parent's
            # deletion vector; entries for carried files stay live
            dv_rel, dv_rows = None, 0
            if "dv" in m:
                live = (self.spark.read.parquet(str(self.path / m["dv"]))
                        .filter(F.col("file").isin(
                            [_entry_name(f) for f in untouched])))
                dv_rows = live.count()
                if dv_rows:
                    dv_rel = f"data/dv-{uuid.uuid4().hex}"
                    live.coalesce(1).write.parquet(
                        str(self.path / dv_rel))
            ch_rel = None
            ch_ref = None
            if cdf:
                if op in self._NO_CHANGE_OPS:   # layout-only: no diff
                    ch_ref = []     # recorded empty set, no write
                else:
                    t_w, o_w = self._widen_for_diff(touched, out)
                    if (op.startswith("update")
                            and self._props().get("cdf_update_images")):
                        # Delta UPDATE image types (opt-in property):
                        # only CHANGED rows appear (unchanged images
                        # cancel in the exceptAll pair), labeled as
                        # post/pre instead of insert/delete
                        ch_rel = self._write_changes_pair(
                            o_w.exceptAll(t_w), t_w.exceptAll(o_w),
                            ins_label="update_postimage",
                            del_label="update_preimage")
                    else:
                        ch_rel = self._write_changes_pair(
                            o_w.exceptAll(t_w), t_w.exceptAll(o_w))
            if self._try_commit(v + 1, rel, m["schema"], op, txn=txn,
                                changes_rel=ch_rel, changes_ref=ch_ref,
                                files=stats,
                                dv_rel=dv_rel, dv_rows=dv_rows):
                return v + 1
            # lost the race: the staged replacements only depend on the
            # BASE touched files — keep them for the rebase pass (the
            # ch slot carries a change-dir rel or a changes_ref list)
            staged = (rel, stats, dv_rel, dv_rows,
                      ch_rel if ch_rel is not None else ch_ref, m)
        if staged is not None:
            shutil.rmtree(self.path / staged[0], ignore_errors=True)
            for r in (staged[2], staged[4]):
                if r and isinstance(r, str):
                    shutil.rmtree(self.path / r, ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def _cow_rebase(self, v, m, base_m, rel0, stats0, dv_rel0,
                    dv_rows0, ch_rel0, probe, rewrite, op, cur,
                    row_local, cdf, partition_pins, partition_in,
                    partition_cond=None, txn=None):
        """One rebase attempt of a lost COW DML against winner ``m``.
        Returns the committed version (>=0), -1 when the rebase itself
        lost another race (staged state still valid), or None when the
        winner is incompatible and the caller must rebuild fully."""
        if not (m.get("schema") == base_m.get("schema")
                and m.get("props") == base_m.get("props")
                and m.get("constraints") == base_m.get("constraints")
                and m.get("dv") == base_m.get("dv")
                and m.get("dv_rows", 0) == base_m.get("dv_rows", 0)
                and base_m.get("files") is not None):
            return None
        base = self._carried_entries(base_m)
        cur_ents = self._carried_entries(m)
        base_paths = {f["path"] for f in base}
        if not base_paths <= {f["path"] for f in cur_ents}:
            return None          # winner removed/rewrote base files
        added = [f for f in cur_ents if f["path"] not in base_paths]
        extra_rel, extra_stats, un_added = None, [], added
        if added:
            if not row_local:
                return None      # rewrite may insert: can't compose
            # prune the added-file probe exactly like the find pass
            eligible = added
            if partition_pins:
                eligible = [f for f in eligible if _pins_match(
                    f.get("partition"), partition_pins)]
            if partition_in is not None:
                eligible = [f for f in eligible
                            if not f.get("partition")
                            or any(_pins_match(f["partition"], p)
                                   for p in partition_in)]
            if partition_cond:
                keep_t = self._tuples_matching_cond(
                    partition_cond,
                    [f.get("partition") for f in eligible])
                if keep_t is not None:
                    eligible = [
                        f for f in eligible if not f.get("partition")
                        or tuple(sorted(f["partition"].items()))
                        in keep_t]
            touched_add = set()
            if eligible:
                schema = StructType.fromJson(m["schema"])
                tg = self._tagged_physical_scan(
                    m, schema,
                    [str(self.path / f["path"]) for f in eligible])
                # the winner's dv equals the base's, whose entries name
                # only base files — added files carry no dv rows
                touched_add = {
                    r["__dv_file"] for r in probe(tg)
                    .select("__dv_file").distinct().collect()}
            if touched_add:
                if cdf:
                    # incremental change files would need a second
                    # changes dir per manifest — not worth the surface
                    return None
                schema = StructType.fromJson(m["schema"])
                scols = [f.name for f in schema.fields]
                t_paths = [str(self.path / f["path"]) for f in added
                           if _entry_name(f) in touched_add]
                out2 = rewrite(self._tagged_physical_scan(
                    m, schema, t_paths).select(*scols)
                ).select(*cur.columns)
                cons = m.get("constraints", {})
                if cons:
                    self._check_constraints(out2, cons)
                extra_rel, extra = self._write_data_full(out2)
                extra_stats = [{**f, "path": f"{extra_rel}/{f['path']}"}
                               for f in extra]
                un_added = [f for f in added
                            if _entry_name(f) not in touched_add]
        files = stats0 + un_added + extra_stats
        if self._try_commit(v + 1, rel0, m["schema"], op, txn=txn,
                            changes_rel=(ch_rel0 if isinstance(ch_rel0,
                                                               str)
                                         else None),
                            changes_ref=(ch_rel0 if isinstance(ch_rel0,
                                                               list)
                                         else None),
                            files=files,
                            dv_rel=dv_rel0, dv_rows=dv_rows0):
            self.rebase_commits = getattr(
                self, "rebase_commits", 0) + 1
            return v + 1
        if extra_rel:            # recompute against the next winner
            shutil.rmtree(self.path / extra_rel, ignore_errors=True)
        return -1

    def delete_where(self, cond: str, max_retries: int = 20,
                     op: str = "delete") -> int:
        """Row-level DELETE as file-pruned copy-on-write: only files
        holding a row where ``cond`` is TRUE are rewritten (without
        their matching rows); the rest of the table is carried by
        reference. NULL predicate rows survive (SQL DELETE semantics).
        On a partitioned table, equality conjuncts pinning partition
        columns prune the FIND pass to the matching partitions' files
        before any data IO."""
        with self._op_params(predicate=cond):
            return self._cow_commit(
                probe=lambda df: df.filter(cond),
                rewrite=lambda df: df.filter(
                    f"NOT ({cond}) OR ({cond}) IS NULL"),
                op=op, max_retries=max_retries,
                partition_pins=_partition_pins(cond,
                                               self.partition_cols()),
                partition_cond=cond,
                row_local=True)

    def delete_where_mor(self, cond: str, max_retries: int = 20,
                         cow_fallback_rows: int | None = None) -> int:
        """Row-level DELETE as merge-on-read deletion vectors — the
        third tier of the mutation-cost ladder (appends are O(batch),
        COW DML is O(matched files), this is O(matched rows)): no data
        file is read in full or rewritten. The find pass scans only the
        predicate columns and records each matched row's stable
        physical identity (file name, row index) into a small sidecar
        parquet (Delta/Iceberg deletion vectors); the commit is pure
        metadata sharing the parent's data dir. Every read applies the
        vector as a broadcast anti-join; ``compact``/``relayout`` (and
        any full-rewrite commit) materialize it away. Matching nothing
        still commits a metadata version. Sets ``last_mor_stats`` =
        {rows_deleted, dv_rows_total}."""
        with self._op_params(predicate=cond):
            return self._delete_where_mor(cond, max_retries,
                                          cow_fallback_rows)

    def _delete_where_mor(self, cond: str, max_retries: int = 20,
                          cow_fallback_rows: int | None = None) -> int:
        cdf = self.cdf_enabled()
        pins = _partition_pins(cond, self.partition_cols())
        staged = None          # (dv_rel, ch_rel, base_m, n_new)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            schema = StructType.fromJson(m["schema"])
            scols = [f.name for f in schema.fields]
            files = m.get("files")
            if staged is not None:
                dv_rel0, ch_rel0, base_m, n_new = staged
                ok = (m.get("schema") == base_m.get("schema")
                      and m.get("props") == base_m.get("props")
                      and m.get("constraints")
                      == base_m.get("constraints")
                      and m.get("dv") == base_m.get("dv")
                      and m.get("dv_rows", 0)
                      == base_m.get("dv_rows", 0)
                      and base_m.get("files") is not None
                      and files is not None)
                if ok:
                    base_paths = {f["path"] for f in
                                  self._carried_entries(base_m)}
                    cur_ents = self._carried_entries(m)
                    ok = base_paths <= {f["path"] for f in cur_ents}
                if ok:
                    # the staged vector (parent entries + this delete's
                    # matches) is valid iff the winner's ADDED files
                    # hold no matching rows — re-probe only those
                    added = [f for f in cur_ents
                             if f["path"] not in base_paths]
                    if pins:
                        added = [f for f in added if _pins_match(
                            f.get("partition"), pins)]
                    hits = 0
                    if added:
                        hits = (self._tagged_physical_scan(
                            m, schema,
                            [str(self.path / f["path"]) for f in added])
                            .filter(cond).limit(1).count())
                    if hits == 0 and self._try_commit(
                            v + 1, m["data"], m["schema"], "delete_mor",
                            changes_rel=ch_rel0, files=files,
                            dv_rel=dv_rel0,
                            dv_rows=m.get("dv_rows", 0) + n_new):
                        return v + 1
                    if hits == 0:
                        continue       # lost again; staged still valid
                # winner incompatible (or its added files match the
                # predicate): drop the staged vector, recompute fully
                shutil.rmtree(self.path / dv_rel0, ignore_errors=True)
                if ch_rel0:
                    shutil.rmtree(self.path / ch_rel0,
                                  ignore_errors=True)
                staged = None
            if files is None:
                scan_paths = [str(self.path / m["data"])]   # legacy
            else:
                # partition-first: the matched-row scan opens only the
                # pinned/predicate-matching partitions' files
                # (metadata decision, no IO)
                elig = ([f for f in files
                         if _pins_match(f.get("partition"), pins)]
                        if pins else files)
                keep_t = self._tuples_matching_cond(
                    cond, [f.get("partition") for f in elig])
                if keep_t is not None:
                    elig = [f for f in elig if not f.get("partition")
                            or tuple(sorted(f["partition"].items()))
                            in keep_t]
                scan_paths = [str(self.path / _entry_rel(m, f))
                              for f in elig]
            if scan_paths:
                tagged = self._tagged_physical_scan(m, schema,
                                                    scan_paths)
                if "dv" in m:
                    tagged = self._apply_dv(tagged, m)
                matched = tagged.filter(cond)
            else:                        # no partition can match
                matched = (self.spark.createDataFrame([], schema)
                           .withColumn("__dv_file", F.lit(""))
                           .withColumn("__dv_pos",
                                       F.lit(0).cast("long")))
            new_entries = matched.select(
                F.col("__dv_file").alias("file"),
                F.col("__dv_pos").alias("pos"))
            if "dv" in m:
                old = self.spark.read.parquet(str(self.path / m["dv"]))
                dv_all = old.unionByName(new_entries)
            else:
                dv_all = new_entries
            n_new = new_entries.count()
            self.last_mor_stats = {
                "rows_deleted": n_new,
                "dv_rows_total": m.get("dv_rows", 0) + n_new}
            if cow_fallback_rows is not None and n_new > cow_fallback_rows:
                # Delta's large-delete rule: a vector this big costs more
                # to anti-join on EVERY read than one COW rewrite costs
                # once — fall back and materialize
                return self.delete_where(cond, max_retries=max_retries,
                                         op="delete_mor_cow")
            if n_new == 0:
                # matched nothing: recorded empty change set, no write
                if self._try_commit(v + 1, m["data"], m["schema"],
                                    "delete_mor",
                                    changes_ref=([] if cdf else None),
                                    files=m.get("files"),
                                    dv_rel=m.get("dv"),
                                    dv_rows=m.get("dv_rows", 0)):
                    return v + 1
                continue
            dv_rel = f"data/dv-{uuid.uuid4().hex}"
            # the vector holds MATCHED rows only — small by contract
            # (bulk deletes belong on the COW path), so one file reads
            # back broadcast-cheap on every scan
            dv_all.coalesce(1).write.parquet(str(self.path / dv_rel))
            crash_point("after_dv_sidecar")
            ch_rel = (self._write_changes_pair(
                matched.select(*scols).limit(0),
                matched.select(*scols)) if cdf else None)
            if self._try_commit(v + 1, m["data"], m["schema"],
                                "delete_mor", changes_rel=ch_rel,
                                files=m.get("files"), dv_rel=dv_rel,
                                dv_rows=m.get("dv_rows", 0) + n_new):
                return v + 1
            # lost the race: the vector's entries name base files only —
            # keep it for the append-wins rebase next iteration
            staged = (dv_rel, ch_rel, m, n_new)
        if staged is not None:
            shutil.rmtree(self.path / staged[0], ignore_errors=True)
            if staged[1]:
                shutil.rmtree(self.path / staged[1], ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def _mor_image_commit(self, m: dict, cur: DataFrame,
                          old_images: DataFrame, new_rows: DataFrame,
                          op: str, n_marked: int,
                          txn: str | None = None) -> bool:
        """Shared merge-on-read image-swap commit (Delta/Iceberg v2 DV
        DML): the rows in ``old_images`` die by deletion-vector entry
        (their (file, pos) identities join the vector — no data file is
        read in full or rewritten), the replacement/insert rows in
        ``new_rows`` land as an O(delta) linked append, and one
        manifest publishes both — UPDATE and MERGE at O(matched rows)
        commit cost. Constraints validate the NEW images only (carried
        rows passed at their own commit time); CDF records the
        delete+insert pair."""
        schema = StructType.fromJson(m["schema"])
        scols = [f.name for f in schema.fields]
        # pin the staged images to the table's exact physical types —
        # a caller's double where the table holds decimal would write
        # mixed-type files the snapshot schema cannot read back
        new_rows = new_rows.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields])
        cons = m.get("constraints", {})
        if cons:
            self._check_constraints(new_rows, cons)
        new_entries = old_images.select(
            F.col("__dv_file").alias("file"),
            F.col("__dv_pos").alias("pos"))
        if "dv" in m:
            dv_all = self.spark.read.parquet(
                str(self.path / m["dv"])).unionByName(new_entries)
        else:
            dv_all = new_entries
        dv_rel = None
        dv_rows = m.get("dv_rows", 0) + n_marked
        if dv_rows:
            dv_rel = f"data/dv-{uuid.uuid4().hex}"
            dv_all.coalesce(1).write.parquet(str(self.path / dv_rel))
            crash_point("after_dv_sidecar")
        rel, files = self._write_data_linked(m, new_rows.select(*scols))
        ch_rel = None
        if self.cdf_enabled():
            ins = new_rows.select(*scols)
            dels = old_images.select(*scols)
            if (op.startswith("update")
                    and self._props().get("cdf_update_images")):
                # Delta UPDATE image types, same contract as the COW
                # path: only CHANGED rows appear (no-op assignments
                # cancel in the exceptAll pair), labeled post/pre.
                # MERGE keeps plain insert/delete (its new_rows mix
                # matched updates with unmatched inserts).
                ch_rel = self._write_changes_pair(
                    ins.exceptAll(dels), dels.exceptAll(ins),
                    ins_label="update_postimage",
                    del_label="update_preimage")
            else:
                ch_rel = self._write_changes_pair(ins, dels)
        if self._try_commit(m["version"] + 1, rel, m["schema"], op,
                            txn=txn, changes_rel=ch_rel, files=files,
                            dv_rel=dv_rel, dv_rows=dv_rows):
            return True
        shutil.rmtree(self.path / rel, ignore_errors=True)
        if dv_rel:
            shutil.rmtree(self.path / dv_rel, ignore_errors=True)
        if ch_rel:
            shutil.rmtree(self.path / ch_rel, ignore_errors=True)
        return False

    def _mor_scan(self, m: dict, pins: dict | None = None,
                  part_in: list[dict] | None = None,
                  cond: str | None = None,
                  eq_in: tuple[str, list]
                  | list[tuple[str, list]] | None = None) -> DataFrame:
        """The (file, pos)-tagged, DV-applied snapshot scan a MOR DML
        find pass reads — partition-pruned to the pinned/batch-touched
        tuples when the table is partitioned; ``cond`` extends the
        prune to range predicates on partition columns (same
        _tuples_matching_cond machinery as the COW find pass), and
        ``eq_in`` (one or more (col, values) pairs, OR across pairs)
        extends it to key equality through per-file stats + bloom
        sidecars (``pruned_files_in``) — a keyed MOR retire opens only
        files that may hold a key, never the table."""
        schema = StructType.fromJson(m["schema"])
        mapping = self._mapping_at(m["version"])
        pschema = self._physical_struct(schema, mapping)
        files = m.get("files")
        if files is None:
            scan_paths = [str(self.path / m["data"])]   # legacy
        else:
            elig = files
            if pins:
                elig = [f for f in elig
                        if _pins_match(f.get("partition"), pins)]
            if part_in is not None:
                elig = [f for f in elig
                        if not f.get("partition")
                        or any(_pins_match(f["partition"], p)
                               for p in part_in)]
            if cond:
                keep_t = self._tuples_matching_cond(
                    cond, [f.get("partition") for f in elig])
                if keep_t is not None:
                    elig = [f for f in elig if not f.get("partition")
                            or tuple(sorted(f["partition"].items()))
                            in keep_t]
            scan_paths = [str(self.path / _entry_rel(m, f))
                          for f in elig]
        if eq_in is not None and m.get("files") is not None:
            prunes = eq_in if isinstance(eq_in, list) else [eq_in]
            keep: set[str] = set()
            for pc, pv in prunes:
                kp, _ = self.pruned_files_in(pc, pv, m["version"])
                keep.update(kp)
            scan_paths = [p for p in scan_paths if p in keep]
        if not scan_paths:
            return (self.spark.createDataFrame([], schema)
                    .withColumn("__dv_file", F.lit(""))
                    .withColumn("__dv_pos", F.lit(0).cast("long")))
        tagged = self._with_pos(
            self.spark.read.schema(pschema).parquet(*scan_paths))
        if mapping:    # logical names for the caller's predicates
            tagged = tagged.select(
                *[F.col(mapping.get(f.name, f.name)).alias(f.name)
                  for f in schema.fields],
                F.col("__dv_file"), F.col("__dv_pos"))
        if "dv" in m:
            tagged = self._apply_dv(tagged, m)
        return tagged

    def _mor_retire(self, match, ins: DataFrame | None, op: str,
                    txn: str | None,
                    part_in: list[dict] | None,
                    eq_prune, max_retries: int = 20) -> int | None:
        """Merge-on-read RETIRE shared by ``apply_cdf`` (DV tables) and
        ``delete_semi``: ``match(tagged_scan) -> matched rows`` names
        the victims (a semi-join against the batch's keys — the keys
        stay a DataFrame end-to-end, nothing collects to the driver),
        which die by deletion-vector entry; the optional ``ins`` rows
        land as an O(delta) linked append in the SAME commit
        (``_mor_image_commit``). Commit cost is O(matched rows) — no
        data file is read in full or rewritten, which is the only
        retire shape that survives a scattered-key retention delete at
        100 TB. The find scan is partition- (``part_in``) and
        key-equality- (``eq_prune``, via stats/bloom sidecars) pruned;
        the writer fence is re-checked against EVERY attempt's
        manifest. Sets ``last_mor_stats``."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            if txn is not None and self._txn_fenced(m, txn):
                return None          # replayed batch landed mid-retry
            tagged = self._mor_scan(m, part_in=part_in, eq_in=eq_prune)
            # one DV entry per physical row, even when the caller's
            # match hits a row through several key groups (delete_semi
            # on a pair with BOTH endpoints deleted): duplicate
            # (file, pos) entries would inflate dv_rows — skewing the
            # materialization cadence forever — and double-record the
            # row in the CDF delete images
            matched = (match(tagged)
                       .dropDuplicates(["__dv_file", "__dv_pos"]))
            n = matched.count()
            self.last_mor_stats = {
                "rows_deleted": n,
                "dv_rows_total": m.get("dv_rows", 0) + n}
            schema = StructType.fromJson(m["schema"])
            new_rows = (ins if ins is not None
                        else self.spark.createDataFrame([], schema))
            if self._mor_image_commit(m, cur, matched, new_rows, op,
                                      n, txn=txn):
                return v + 1
            # lost the race: recompute against the winner (retires are
            # serial per maintainer by contract, so contention is rare
            # and a plain re-scan beats staged-rebase bookkeeping here)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at "
            f"{self.path}")

    def delete_semi(self, keys: DataFrame, on: list[list[str]],
                    app_id: str | None = None,
                    batch_id: int | None = None,
                    max_retries: int = 20) -> int | None:
        """DELETE every row whose column tuple equals a key row on ANY
        of the ``on`` groups — the distributed retire for OR-of-keys
        predicates (drop every pair touching a deleted doc:
        ``pairs.delete_semi(dels, on=[["doc1"], ["doc2"]])``). Each
        group lists table columns positionally matching ``keys``'
        columns. The keys stay a DataFrame end-to-end: the find pass
        is one semi-join per group and the rewrite an anti-join chain,
        so the driver never materializes the key set — replacing the
        r14 scale-killer (an uncapped ``collect()`` spliced into a SQL
        ``IN (...)`` string, unbounded driver memory on a retention
        DELETE whose one CDF micro-batch carries the whole slice).

        With ``(app_id, batch_id)`` the commit carries the writer
        fence (checked at entry AND re-checked per retry attempt), so
        a replayed micro-batch commits nothing — and a fenced call
        that matches nothing still commits the fence. On a DV table
        the matched rows die by deletion-vector entry (O(matched
        rows)); otherwise file-pruned copy-on-write. Find-pass pruning
        rides partition tuples and, when the key set fits a capped
        driver list (``_EQ_PRUNE_CAP``), per-file stats + bloom
        sidecars on each group's first column."""
        kcols = list(keys.columns)
        groups = [list(g) for g in on]
        if not groups:
            raise ValueError("delete_semi: 'on' needs >= 1 group")
        for g in groups:
            if len(g) != len(kcols):
                raise ValueError(
                    f"delete_semi: group {g} arity != key columns "
                    f"{kcols} — groups map positionally onto the key "
                    f"DataFrame's columns")
        txn = None
        if app_id is not None:
            if batch_id is None:
                raise ValueError("delete_semi: batch_id is required "
                                 "when app_id is given")
            txn = f"{app_id}#{batch_id}"
            if self._txn_entry_fenced(app_id, batch_id):
                return None              # replayed batch: fenced out
        keys = keys.distinct()

        def probe(df: DataFrame) -> DataFrame:
            out = None
            for g in groups:
                hit = df.join(keys.toDF(*g), g, "semi")
                out = hit if out is None else out.unionByName(hit)
            return out

        def rewrite(touched: DataFrame) -> DataFrame:
            for g in groups:
                touched = touched.join(keys.toDF(*g), g, "left_anti")
            return touched
        # ONE bounded collect serves the partition tuples of EVERY
        # group and the stats/bloom prune values (previously one
        # ``_partition_tuples_of`` job per group plus one
        # ``_eq_prune_vals`` job). Partition pruning stays sound only
        # when EVERY group prunes (a row can match through any group,
        # so the union of per-group tuple lists must cover all of
        # them).
        krows = keys.limit(_EQ_PRUNE_CAP + 1).collect()
        capped = len(krows) > _EQ_PRUNE_CAP
        eq_prune = None
        if not capped:
            vals = list({r[kcols[0]] for r in krows})
            eq_prune = [(g[0], vals) for g in groups]
        else:
            # a wide multi-column batch can blow the ROW cap while its
            # first column stays narrow (the pre-r16 _eq_prune_vals
            # shape) — fall back to a distinct probe on that column
            # alone before giving up on stats/bloom pruning (r16
            # ADVICE; performance-only, both paths value-equal)
            fvals = (keys.select(kcols[0]).distinct()
                     .limit(_EQ_PRUNE_CAP + 1).collect())
            if len(fvals) <= _EQ_PRUNE_CAP:
                vals = [r[kcols[0]] for r in fvals]
                eq_prune = [(g[0], vals) for g in groups]
        pcols = self.partition_cols()
        part_in: list[dict] | None = []
        for g in groups:
            pt = None
            if (pcols and {c.lower() for c in pcols}
                    <= {c.lower() for c in g}):
                if not capped:
                    # map the key DataFrame's positional columns onto
                    # this group's table columns, then project the
                    # group's partition columns
                    pos = {gc.lower(): kc for gc, kc in zip(g, kcols)}
                    seen = {tuple(r[pos[c.lower()]] for c in pcols)
                            for r in krows}
                    pt = [dict(zip(pcols, t)) for t in seen]
                else:
                    pt = self._partition_tuples_of(keys.toDF(*g),
                                                   key=g)
            if pt is None:
                part_in = None
                break
            part_in.extend(pt)
        with self._op_params(delete_on=[list(g) for g in groups]):
            if self.dv_enabled():
                return self._mor_retire(probe, None, "delete_semi_mor",
                                        txn, part_in, eq_prune,
                                        max_retries)
            return self._cow_commit(
                probe, rewrite, "delete_semi", max_retries,
                empty_noop=txn is None, partition_in=part_in,
                txn=txn, eq_any_prune=eq_prune)

    def update_where_mor(self, assigns: dict[str, str], cond: str,
                         max_retries: int = 20,
                         cow_fallback_rows: int | None = None) -> int:
        """Row-level UPDATE as merge-on-read: matched rows' OLD images
        die by deletion-vector entry, their NEW images (each assigned
        column a CASE over the predicate — here always matched, so just
        the expression) append as an O(delta) linked commit — the whole
        statement costs O(matched rows), never a file rewrite (Delta
        DV-enabled UPDATE). ``compact``/``relayout`` still materialize
        the vector away. Sets ``last_mor_stats`` = {rows_updated,
        dv_rows_total}."""
        low = {c.lower(): e for c, e in assigns.items()}
        pcols = self.partition_cols()
        if any(c.lower() in low for c in pcols):
            raise ValueError(
                f"UPDATE may not assign partition column(s) "
                f"{[c for c in pcols if c.lower() in low]} — rewrite "
                f"as DELETE + INSERT (a row never migrates partitions "
                f"in place)")
        with self._op_params(predicate=cond,
                             set_columns=sorted(assigns)):
            return self._update_where_mor(assigns, low, cond,
                                          max_retries,
                                          cow_fallback_rows, pcols)

    def _update_where_mor(self, assigns: dict, low: dict, cond: str,
                          max_retries: int,
                          cow_fallback_rows: int | None,
                          pcols: list) -> int:
        pins = _partition_pins(cond, pcols)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            scols = [f["name"] for f in m["schema"]["fields"]]
            unknown = set(low) - {c.lower() for c in scols}
            if unknown:
                raise ValueError(
                    f"UPDATE SET of unknown column(s) {unknown}")
            # the matched set feeds three consumers (count, the vector,
            # the new images) — cache it so the table is scanned ONCE,
            # not once per consumer (matched is O(statement), small)
            matched = self._mor_scan(
                m, pins=pins, cond=cond).filter(cond).cache()
            try:
                n = matched.count()
                self.last_mor_stats = {
                    "rows_updated": n,
                    "dv_rows_total": m.get("dv_rows", 0) + n}
                if cow_fallback_rows is not None \
                        and n > cow_fallback_rows:
                    return self.update_where(assigns, cond,
                                             max_retries=max_retries,
                                             op="update_mor_cow")
                if n == 0:
                    # matched nothing: recorded empty set, no write
                    if self._try_commit(v + 1, m["data"], m["schema"],
                                        "update_mor",
                                        changes_ref=(
                                            [] if self.cdf_enabled()
                                            else None),
                                        files=m.get("files"),
                                        dv_rel=m.get("dv"),
                                        dv_rows=m.get("dv_rows", 0)):
                        return v + 1
                    continue
                new_rows = matched.selectExpr(*[
                    f"({low[c.lower()]}) AS {c}" if c.lower() in low
                    else c for c in scols])
                if self._mor_image_commit(m, cur, matched, new_rows,
                                          "update_mor", n):
                    return v + 1
            finally:
                matched.unpersist()
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def merge_mor(self, updates: DataFrame, key: list[str],
                  max_retries: int = 20,
                  evolve_schema: bool = False) -> int:
        """ANSI MERGE as merge-on-read (Delta/Iceberg v2 DV MERGE):
        matched target rows die by deletion-vector entry and their new
        images (update values, last-writer-wins like ``merge``) append
        together with the unmatched updates' inserts in ONE O(delta)
        linked commit — MERGE at O(matched + inserted rows), no file
        rewrite. The matched scan is partition-pruned to the batch's
        tuples on a partitioned table. ``updates`` must be key-unique
        (the ANSI MERGE cardinality contract, same as ``merge``: a
        duplicate-key batch would fan the inner join out). Sets
        ``last_mor_stats`` = {rows_updated, rows_inserted,
        dv_rows_total}.

        ``evolve_schema=True`` on a WIDENING batch delegates to the
        COW ``merge`` (a schema change can't ride a same-schema linked
        commit); same-width batches keep the O(delta) MOR path."""
        if evolve_schema:
            _, cur0 = self.snapshot()
            if any(c not in cur0.columns for c in updates.columns):
                return self.merge(updates, key, max_retries,
                                  evolve_schema=True)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            scols = [f["name"] for f in m["schema"]["fields"]]
            val_cols = [c for c in scols if c not in key]
            part_in = self._partition_tuples_of(updates, key=key)
            tagged = self._mor_scan(m, part_in=part_in)
            u = updates.select(*key, *[F.col(c).alias(f"__u_{c}")
                                       for c in val_cols])
            # one keyed scan feeds matched images, the vector, and the
            # new images — cache the (small, O(batch)) join result
            joined = tagged.join(u, key, "inner").cache()
            try:
                matched = joined.select(*scols, "__dv_file", "__dv_pos")
                new_images = joined.select(
                    *key, *[F.coalesce(f"__u_{c}", c).alias(c)
                            for c in val_cols]).select(*scols)
                inserts = (updates.select(*scols)
                           .join(cur.select(*key), key, "left_anti"))
                n_upd = matched.count()
                n_ins = inserts.count()
                self.last_mor_stats = {
                    "rows_updated": n_upd, "rows_inserted": n_ins,
                    "dv_rows_total": m.get("dv_rows", 0) + n_upd}
                new_rows = new_images.unionByName(inserts)
                if n_upd == 0 and n_ins == 0:
                    # matched nothing: recorded empty set, no write
                    if self._try_commit(v + 1, m["data"], m["schema"],
                                        "merge_mor",
                                        changes_ref=(
                                            [] if self.cdf_enabled()
                                            else None),
                                        files=m.get("files"),
                                        dv_rel=m.get("dv"),
                                        dv_rows=m.get("dv_rows", 0)):
                        return v + 1
                    continue
                if self._mor_image_commit(m, cur, matched, new_rows,
                                          "merge_mor", n_upd):
                    return v + 1
            finally:
                joined.unpersist()
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def update_where(self, assigns: dict[str, str], cond: str,
                     max_retries: int = 20, op: str = "update") -> int:
        """Row-level UPDATE as file-pruned copy-on-write: files with no
        row matching ``cond`` are provably unchanged and carried by
        reference; touched files are rewritten with each assigned
        column as a CASE over the predicate."""
        low = {c.lower(): e for c, e in assigns.items()}

        def rewrite(df: DataFrame) -> DataFrame:
            unknown = set(low) - {c.lower() for c in df.columns}
            if unknown:
                raise ValueError(
                    f"UPDATE SET of unknown column(s) {unknown}")
            return df.selectExpr(*[
                (f"CASE WHEN ({cond}) THEN ({low[c.lower()]}) "
                 f"ELSE {c} END AS {c}") if c.lower() in low else c
                for c in df.columns])
        pcols = self.partition_cols()
        if any(c.lower() in low for c in pcols):
            raise ValueError(
                f"UPDATE may not assign partition column(s) "
                f"{[c for c in pcols if c.lower() in low]}"
                f" — rewrite as DELETE + INSERT (the Iceberg rule: a "
                f"row never migrates partitions in place)")
        with self._op_params(predicate=cond,
                             set_columns=sorted(assigns)):
            return self._cow_commit(
                probe=lambda df: df.filter(cond), rewrite=rewrite,
                op=op, max_retries=max_retries,
                partition_pins=_partition_pins(cond, pcols),
                partition_cond=cond,
                row_local=True)

    def _collect_stats(self, data_rel: str) -> list[dict]:
        return collect_parquet_stats(self.path / data_rel)

    def _parent_txns(self, version: int) -> dict:
        """The cumulative {app_id: latest batch_id} writer-transaction map
        carried by ``version``'s parent. A parent from before the map
        existed triggers a ONE-TIME harvest of every legacy manifest's
        ``txn`` marker — without it, the first new-code commit would
        start an empty map and a replay of a legacy batch would apply
        twice (the map, once present, short-circuits the scan forever
        after)."""
        if version == 0:
            return {}
        parent = self._manifest(version - 1, with_files=False)
        if "txns" in parent:
            return parent["txns"]
        txns: dict = {}
        for v in range(version):
            txn = self._manifest(v).get("txn")
            if txn:
                app_id, _, batch = txn.rpartition("#")
                txns[app_id] = max(int(batch), txns.get(app_id, -1))
        return txns

    #: commits that rewrite layout only — rows identical, delta empty by
    #: construction, no diff needed
    _NO_CHANGE_OPS = frozenset({"relayout", "compact",
                                "compact_partition",
                                "optimize_incremental",
                                "compact_small"})

    def _widen_for_diff(self, a: DataFrame, b: DataFrame):
        """Project both frames onto their merged column superset
        (NULL-widened) so exceptAll works across schema evolution."""
        cols = list(b.columns) + [c for c in a.columns if c not in b.columns]
        types = {**dict(a.dtypes), **dict(b.dtypes)}

        def w(df: DataFrame) -> DataFrame:
            have = set(df.columns)
            out = df
            for c in cols:
                if c not in have:
                    out = out.withColumn(c, F.lit(None).cast(types[c]))
            return out.select(cols)
        return w(a), w(b)

    def _write_changes(self, cur: DataFrame, out: DataFrame, op: str,
                       insert_hint: DataFrame | None = None) -> str:
        """Record this commit's row-level deltas as change files (Delta
        CDF's _change_data): inserts ∪ deletes with a ``_change_type``
        column, one parquet dir per commit. Appends skip the diff — the
        appended rows ARE the delta; layout-only ops record an empty
        set; everything else pays one distributed exceptAll pair at
        WRITE time so every future change read is a plain parquet scan."""
        if op in self._NO_CHANGE_OPS:
            ins = out.limit(0)
            dels = out.limit(0)
        elif insert_hint is not None:
            ins, dels = insert_hint, insert_hint.limit(0)
        else:
            cur_w, out_w = self._widen_for_diff(cur, out)
            ins, dels = out_w.exceptAll(cur_w), cur_w.exceptAll(out_w)
        return self._write_changes_pair(ins, dels)

    def _write_changes_pair(self, ins: DataFrame, dels: DataFrame,
                            ins_label: str = "insert",
                            del_label: str = "delete") -> str:
        """Write an (inserts, deletes) pair as this commit's change
        files. Non-default labels carry Delta's UPDATE image types
        (update_postimage/update_preimage) when the table opted in."""
        ch = (ins.withColumn("_change_type", F.lit(ins_label))
              .unionByName(dels.withColumn("_change_type",
                                           F.lit(del_label))))
        rel = f"data/changes-{uuid.uuid4().hex}"
        ch.write.parquet(str(self.path / rel))
        return rel

    def constraints(self) -> dict[str, str]:
        """{name: CHECK expression} currently in force (rides every
        manifest from the add_constraint commit onward)."""
        v = self.latest_version()
        if v is None:
            return {}
        return self._manifest(v).get("constraints", {})

    def _check_constraints(self, out: DataFrame,
                           cons: dict[str, str]) -> None:
        for name, expr in cons.items():
            bad = out.filter(f"NOT ({expr}) OR ({expr}) IS NULL") \
                .limit(1).take(1)
            if bad:
                raise ConstraintViolation(
                    f"constraint {name!r} ({expr}) violated, e.g. by row "
                    f"{bad[0].asDict()}; commit refused")

    def add_constraint(self, name: str, expr: str,
                       max_retries: int = 20) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr): existing rows
        must already satisfy it (Delta's rule), then the constraint
        rides every future manifest and every subsequent commit is
        validated against it before any manifest is written. The commit
        SHARES the parent's data dir — a pure metadata version.

        The expression is validated against BOTH engines that enforce
        it before it is accepted: Spark (every batch write path) and
        DuckDB (the streaming sink commits without a SparkSession and
        probes staged parquet with DuckDB). Rejecting a
        Spark-only/dialect-divergent expression HERE — instead of at
        the first sink commit — keeps the accepted CHECK grammar the
        ANSI intersection and guarantees a constraint that exists can
        always be enforced, never silently re-interpreted."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            self._check_constraints(cur, {name: expr})
            _check_duckdb_enforceable(name, expr, cur.schema)
            m = self._manifest(v)
            if self._try_commit(
                    v + 1, m["data"], m["schema"], "add_constraint",
                    constraints={**m.get("constraints", {}), name: expr},
                    files=m.get("files"), dv_rel=m.get("dv"),
                    dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up adding constraint after {max_retries} conflicts")

    def add_column(self, name: str, dtype: str,
                   max_retries: int = 20) -> int:
        """ALTER TABLE ADD COLUMN — PURE METADATA (the Delta/Iceberg
        schema-evolution contract): the widened schema rides the new
        manifest and the commit shares the parent's data dir; existing
        files simply read NULL for the new column (schema-on-read —
        ``read`` scans with an explicit schema, so a missing parquet
        column materializes as NULL). No data IO at any table size.
        Older versions keep their narrower schema (time travel
        preserves what each version looked like)."""
        from pyspark.sql.types import StructField, _parse_datatype_string

        dt = _parse_datatype_string(dtype)
        for _ in range(max_retries):
            v = self.latest_version()
            m = self._manifest(v)
            schema = StructType.fromJson(m["schema"])
            if any(f.name.lower() == name.lower() for f in schema.fields):
                raise ValueError(
                    f"column {name!r} already exists in {self.path}")
            widened = StructType(
                list(schema.fields) + [StructField(name, dt)])
            # column-mapping mode: if the new logical name collides
            # with a LIVE or RETIRED physical name, mint a fresh
            # physical identity — old files must read NULL for the new
            # column, never resurrect a dropped/renamed-away column's
            # bytes (Delta mapping semantics)
            props = None
            mprops = self._props(v)
            if "column_mapping" in mprops:
                mapping = dict(mprops["column_mapping"] or {})
                retired = set(mprops.get("retired_physical", ()))
                live = {f.name for f in schema.fields}
                changed = False
                stale = [k for k in mapping if k not in live]
                for k in stale:
                    # STALE mapping key (not a live column — e.g. props
                    # inherited across a legacy restore that predated
                    # restore carrying the target's mapping): drop it,
                    # or the inherited entry would bind a re-added
                    # column of the same logical name to the
                    # renamed-away column's bytes
                    stale_phys = mapping.pop(k)
                    changed = True
                    live_phys = {mapping.get(f.name, f.name)
                                 for f in schema.fields}
                    if stale_phys not in live_phys:
                        # the physical may still hold bytes in
                        # referenced data files — retire it so no
                        # future column ever binds to it
                        retired.add(stale_phys)
                used = ({mapping.get(f.name, f.name)
                         for f in schema.fields} | retired)
                if name in used:
                    mapping[name] = f"col_{uuid.uuid4().hex[:8]}"
                    changed = True
                if changed:
                    props = {**mprops, "column_mapping": mapping,
                             "retired_physical": sorted(retired)}
            # no row changes: recorded empty change set, no write
            if self._try_commit(v + 1, m["data"], widened.jsonValue(),
                                "add_column",
                                changes_ref=([] if self.cdf_enabled()
                                             else None),
                                props=props,
                                files=m.get("files"),
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up adding column after {max_retries} conflicts")

    def _refuse_schema_change_conflicts(self, col: str,
                                        verb: str) -> None:
        import re as _re

        if col in self.partition_cols():
            raise ValueError(
                f"cannot {verb} partition column {col!r}; evolve the "
                f"spec first (set_partition_by)")
        for cname, expr in self.constraints().items():
            if _re.search(rf"\b{_re.escape(col)}\b", expr,
                          _re.IGNORECASE):
                raise ValueError(
                    f"cannot {verb} column {col!r}: CHECK constraint "
                    f"{cname!r} ({expr}) references it; drop the "
                    f"constraint first")

    def rename_column(self, old: str, new: str,
                      max_retries: int = 20) -> int:
        """ALTER TABLE RENAME COLUMN — PURE METADATA via column
        mapping (Delta columnMapping 'name' mode): the logical name
        changes in the manifest schema while the PHYSICAL parquet
        column name stays frozen at the column's birth and is recorded
        in the table's logical→physical map. No data file is touched
        at any table size; reads scan by physical name and project
        back; new writes keep writing the physical name. Older
        versions keep the old logical name (time travel exact).
        Partition columns and constraint-referenced columns are
        refused — evolve/drop those first."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            if old not in cur.columns:
                raise ValueError(f"no column {old!r} in {cur.columns}")
            if any(c.lower() == new.lower() for c in cur.columns):
                raise ValueError(f"column {new!r} already exists")
            self._refuse_schema_change_conflicts(old, "rename")
            m = self._manifest(v)
            schema = StructType.fromJson(m["schema"])
            from pyspark.sql.types import StructField
            renamed = StructType([
                StructField(new if f.name == old else f.name,
                            f.dataType, f.nullable)
                for f in schema.fields])
            mapping = self._mapping_at(v)
            mapping[new] = mapping.pop(old, old)   # physical is frozen
            props = {**self._props(v), "column_mapping": mapping}
            # no row changes: recorded empty change set, no write
            if self._try_commit(v + 1, m["data"], renamed.jsonValue(),
                                "rename_column", props=props,
                                changes_ref=([] if self.cdf_enabled()
                                             else None),
                                files=m.get("files"),
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up renaming column after {max_retries} conflicts")

    def drop_column(self, name: str, max_retries: int = 20) -> int:
        """ALTER TABLE DROP COLUMN — PURE METADATA via column mapping:
        the field leaves the manifest schema; the physical column stays
        in the old data files but is never scanned (explicit-schema
        reads project only mapped fields). The retired physical name is
        recorded so a later ADD COLUMN of the same name gets a FRESH
        physical identity — re-adding a dropped column must read NULL,
        never resurrect the dropped values (Delta mapping semantics).
        Older versions keep the column (time travel exact)."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            if name not in cur.columns:
                raise ValueError(f"no column {name!r} in {cur.columns}")
            if len(cur.columns) == 1:
                raise ValueError("cannot drop the only column")
            self._refuse_schema_change_conflicts(name, "drop")
            m = self._manifest(v)
            schema = StructType.fromJson(m["schema"])
            narrowed = StructType(
                [f for f in schema.fields if f.name != name])
            mapping = self._mapping_at(v)
            phys = mapping.pop(name, name)
            mprops = self._props(v)
            retired = sorted(set(mprops.get("retired_physical", ()))
                             | {phys})
            props = {**mprops, "column_mapping": mapping,
                     "retired_physical": retired}
            # stats/partition metadata of carried entries stay keyed by
            # logical names — drop the dead key so pruners never match
            # a future column of the same name against stale extents
            files = m.get("files")
            if files is not None:
                files = [{**f,
                          "stats": {k: s for k, s in
                                    (f.get("stats") or {}).items()
                                    if k != name}} for f in files]
            # no row changes: recorded empty change set, no write
            if self._try_commit(v + 1, m["data"], narrowed.jsonValue(),
                                "drop_column", props=props,
                                changes_ref=([] if self.cdf_enabled()
                                             else None),
                                files=files,
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up dropping column after {max_retries} conflicts")

    def drop_constraint(self, name: str, max_retries: int = 20) -> int:
        for _ in range(max_retries):
            v, _cur = self.snapshot()
            m = self._manifest(v)
            cons = {k: x for k, x in m.get("constraints", {}).items()
                    if k != name}
            if self._try_commit(v + 1, m["data"], m["schema"],
                                "drop_constraint", constraints=cons,
                                files=m.get("files"), dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up dropping constraint after {max_retries} conflicts")

    def _op_params(self, **params):
        """Scope Delta-style operationParameters onto every manifest
        committed inside the ``with`` block (the DML predicate, MERGE
        key, layout columns). Pure audit metadata — readers never
        consult it; ``history()`` surfaces it JSON-encoded. Keyed per
        THREAD so concurrent statements on one handle never stamp each
        other's params (the threaded-appender pattern in
        tests/test_storage.py is supported usage)."""
        import threading
        from contextlib import contextmanager

        @contextmanager
        def scope():
            by_thread = getattr(self, "_pending_op_params", None)
            if by_thread is None:
                by_thread = self._pending_op_params = {}
            tid = threading.get_ident()
            by_thread[tid] = {
                k: v for k, v in params.items() if v is not None}
            try:
                yield
            finally:
                by_thread.pop(tid, None)
        return scope()

    def _current_op_params(self) -> dict | None:
        import threading
        by_thread = getattr(self, "_pending_op_params", None) or {}
        return by_thread.get(threading.get_ident())

    def _try_commit(self, version: int, data_rel: str, schema,
                    op: str, txn: str | None = None,
                    changes_rel: str | None = None,
                    changes_ref: list[str] | None = None,
                    props: dict | None = None,
                    constraints: dict | None = None,
                    files: list | None = None,
                    dv_rel: str | None = None, dv_rows: int = 0) -> bool:
        # Every manifest carries the CUMULATIVE {app_id: latest batch_id}
        # map (Delta's setTransactions pattern), so the streaming replay
        # check in append_txn reads ONE manifest — O(1) per commit instead
        # of O(versions) driver IO over the table's life.
        txns = self._parent_txns(version)
        if txn is not None:
            app_id, _, batch = txn.rpartition("#")
            txns = {**txns, app_id: max(int(batch), txns.get(app_id, -1))}
        import time
        manifest = {"version": version, "data": data_rel, "schema": schema,
                    "op": op, "parent": version - 1 if version else None,
                    "ts": time.time(),      # commit time: TIMESTAMP AS OF
                    "txns": txns}
        files_full = (files if files is not None
                      else self._collect_stats(data_rel))
        # normalize to ROOT-RELATIVE paths (bare names were staged into
        # this commit's own data dir), then record O(delta) against the
        # parent when that is smaller — commit metadata scales with the
        # batch, never the table (Delta log-action discipline)
        files_full = [f if "/" in f["path"]
                      else {**f, "path": f"{data_rel}/{f['path']}"}
                      for f in files_full]
        parent_m: dict = {}
        if version > 0:
            try:
                parent_m = self._manifest(version - 1)
            except (OSError, ValueError):
                parent_m = {}
        parent_files = parent_m.get("files")
        encode_manifest_files(
            manifest, files_full,
            version - 1 if parent_files is not None else None,
            parent_files)
        if txn is not None:
            manifest["txn"] = txn
        if changes_rel is not None:
            manifest["changes"] = changes_rel
        if changes_ref is not None:
            # CDF-BY-REFERENCE (Delta derives append-commit CDF from the
            # added data files): the commit's change set IS the listed
            # data files, every row an insert — no second write of the
            # batch. [] = recorded EMPTY change set (property/layout
            # commits), replacing a whole Spark write of an empty dir.
            manifest["changes_ref"] = changes_ref
        if dv_rel is not None:
            manifest["dv"] = dv_rel
            manifest["dv_rows"] = dv_rows
        # props ride every manifest once set (like txns/constraints):
        # explicit on create/clone/set_partition_by, inherited otherwise
        # — so table properties can EVOLVE and readers ask the newest
        # manifest, not v0
        if props is None and version > 0:
            props = parent_m.get("props")
        # auto-maintain the reader-feature declaration (Delta protocol
        # discipline): any commit that makes the table depend on a
        # read-semantics feature records it, so a build WITHOUT that
        # feature gates loudly instead of misreading
        feats = set((props or {}).get("reader_features", ()))
        if ((props or {}).get("column_mapping")
                or (props or {}).get("retired_physical")):
            feats.add("column_mapping")
        if (props or {}).get("cdf_update_images"):
            feats.add("cdf_update_images")
        if dv_rel is not None:
            feats.add("deletion_vectors")
        if feats != set((props or {}).get("reader_features", ())):
            props = {**(props or {}), "reader_features": sorted(feats)}
        if props is not None:
            manifest["props"] = props
        # constraints ride every manifest once added (like txns):
        # explicit param on the add/drop commits, inherited otherwise
        if constraints is None and version > 0:
            constraints = parent_m.get("constraints")
        if constraints:
            manifest["constraints"] = constraints
        cur_params = self._current_op_params()
        if cur_params:
            manifest["op_params"] = cur_params
        # the atomic swap: exactly one creator per manifest path —
        # routed through the FileStore seam so the fence primitive is
        # pluggable per storage backend (LogStore pattern)
        crash_point("before_manifest_fence")
        if get_store().create_exclusive(
                self._manifests / f"v{version}.json",
                json.dumps(manifest)):
            crash_point("after_manifest_fence")
            self._write_latest_hint(version)
            # seed the resolution cache (we hold the materialized list)
            _files_cache_put(
                (str(self.path), version, manifest["ts"]), files_full)
            if version > 0 and version % CHECKPOINT_EVERY == 0:
                # periodic parquet checkpoint bounds delta-chain replay
                # for cold readers (best-effort, derived data only)
                write_files_checkpoint(self.path, version, files_full)
            return True
        return False

    def _commit_loop(self, build, op: str, max_retries: int = 20,
                     insert_hint: DataFrame | None = None,
                     order_by: list[str] | None = None,
                     txn: str | None = None) -> int | None:
        """Optimistic-concurrency commit: ``build(cur)`` produces the full
        next table state from the current snapshot; on manifest conflict
        the LOSER's data dir is dropped and build re-runs against the
        winner's snapshot, so no committed update is ever lost or applied
        twice (serializable: every commit is a function of its direct
        parent). On a CDF-enabled table each attempt also writes the
        commit's change files (``insert_hint`` short-circuits the diff
        for pure appends).

        Logical conflict resolution (Delta's reconciliation rules): a
        loser that staged parent-independent bytes re-parents them
        against the winner instead of re-staging, provided the winner
        changed nothing the staged bytes depend on (schema, props
        [column-mapping identity, partition spec, cdf/dv flags],
        constraints). Two shapes qualify:

        - **append-wins**: a LINKED append's files never referenced the
          old parent — rebased commit = winner's entries + staged
          batch. A lost race costs ONE manifest write; under N
          concurrent appenders total IO is O(N batches), not O(N²
          retried stages).
        - **layout-vs-append**: ``compact``/``relayout`` output replaces
          exactly the BASE snapshot's rows; if every base file is still
          in the winner (pure additions) and the deletion vector is
          unchanged, rebased commit = staged layout + the winner's
          added files (which simply stay unclustered — Delta's OPTIMIZE
          rule). A lost compaction costs one manifest write, not a full
          table rewrite."""
        cdf = self.cdf_enabled()
        layout_op = op in ("relayout", "compact")
        staged = None  # (kind, rel, new_stats, ch_rel, schema_json, base_m)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            if txn is not None and self._txn_fenced(m, txn):
                # fenced batch committed mid-retry (zombie vs restart
                # race): re-checked per attempt — a replayed merge_add
                # can never double-count its partials through a lost
                # CAS race (ADVICE r14, the append_txn discipline)
                if staged is not None:
                    _, s_rel, _, s_ch, _, _ = staged
                    shutil.rmtree(self.path / s_rel,
                                  ignore_errors=True)
                    if s_ch and isinstance(s_ch, str):
                        # ref lists live under s_rel: already gone
                        shutil.rmtree(self.path / s_ch,
                                      ignore_errors=True)
                return None
            cons = m.get("constraints", {})
            if staged is not None:
                kind, rel, new_stats, ch_rel, schema_json, base_m = staged
                rebased = None
                if (m.get("schema") == base_m.get("schema")
                        and m.get("props") == base_m.get("props")
                        and m.get("constraints")
                        == base_m.get("constraints")):
                    if kind == "append":
                        # constraints already passed (unchanged set)
                        rebased = (self._carried_entries(m) + new_stats,
                                   m.get("dv"), m.get("dv_rows", 0))
                    elif (m.get("dv") == base_m.get("dv")
                          and m.get("dv_rows", 0)
                          == base_m.get("dv_rows", 0)
                          and base_m.get("files") is not None):
                        # layout rebase: sound iff the winner only ADDED
                        # files (its commits carried every base file) —
                        # the staged output materializes exactly the
                        # base rows, the winner's additions ride along
                        base = self._carried_entries(base_m)
                        cur_ents = self._carried_entries(m)
                        cur_paths = {f["path"] for f in cur_ents}
                        if {f["path"] for f in base} <= cur_paths:
                            added = [f for f in cur_ents
                                     if f["path"] not in
                                     {b["path"] for b in base}]
                            rebased = (new_stats + added, None, 0)
                if rebased is not None:
                    files, dv_rel, dv_rows = rebased
                    if self._try_commit(
                            v + 1, rel, schema_json, op, txn=txn,
                            changes_rel=(ch_rel if isinstance(ch_rel, str)
                                         else None),
                            changes_ref=(ch_rel if isinstance(ch_rel, list)
                                         else None),
                            files=files,
                            dv_rel=dv_rel, dv_rows=dv_rows):
                        # observability: lost races resolved WITHOUT
                        # re-staging (contention tests read this)
                        self.rebase_commits = getattr(
                            self, "rebase_commits", 0) + 1
                        return v + 1
                    continue
                # the winner changed schema/props/constraints (or
                # removed files under a layout rebase): the staged
                # bytes may be stale — drop them and rebuild
                shutil.rmtree(self.path / rel, ignore_errors=True)
                if ch_rel and isinstance(ch_rel, str):
                    shutil.rmtree(self.path / ch_rel, ignore_errors=True)
                staged = None
            # pure same-schema appends take the O(delta) linked path:
            # only the new rows are written; the parent's files are
            # hardlinked and its recorded stats reused — commit cost
            # scales with the batch, never the table
            linked = (insert_hint is not None
                      and set(insert_hint.columns) == set(cur.columns))
            if cons:                     # refuse BEFORE any data IO;
                # appends only need the NEW rows checked (existing rows
                # passed at their own commit time)
                self._check_constraints(
                    insert_hint if insert_hint is not None
                    else build(cur), cons)
            if linked:
                rows = insert_hint.select(*cur.columns)
                rel, files = self._write_data_linked(m, rows)
                schema_json = cur.schema.jsonValue()
                # linked files keep their names, so the parent's
                # deletion vector stays valid and is shared, not copied
                dv_rel, dv_rows = m.get("dv"), m.get("dv_rows", 0)
            else:
                # a full rewrite reads through read(v) with the DV
                # applied, so the output MATERIALIZES the deletes and
                # the new manifest carries no vector
                out = build(cur)
                rel, files = self._write_data_full(out,
                                                    order_by=order_by)
                schema_json = out.schema.jsonValue()
                dv_rel, dv_rows = None, 0
            ch_rel = ch_ref = None
            if cdf:
                if linked and not self._mapping_at():
                    # CDF by reference: a linked append's change set IS
                    # its staged files (every row an insert) — record
                    # their paths instead of writing the batch a second
                    # time as a change dir (Delta derives append CDF
                    # from added files the same way). Gated off under
                    # column mapping: data files hold PHYSICAL names,
                    # change files logical — the readers expect logical.
                    ch_ref = [f["path"] for f in files
                              if f["path"].startswith(f"{rel}/")]
                elif op in self._NO_CHANGE_OPS:
                    # layout op: recorded EMPTY change set, no write
                    ch_ref = []
                else:
                    ch_rel = self._write_changes(
                        cur, None if linked else out, op, insert_hint)
            crash_point("after_change_files")
            if self._try_commit(v + 1, rel, schema_json, op, txn=txn,
                                changes_rel=ch_rel, changes_ref=ch_ref,
                                files=files,
                                dv_rel=dv_rel, dv_rows=dv_rows):
                return v + 1
            if linked:
                # lost the race, but the staged files are parent-free:
                # keep them for the append-wins rebase next iteration
                # (the ch slot carries either a change-dir rel or a
                # changes_ref list — the rebase commit discriminates)
                staged = ("append", rel,
                          [f for f in files
                           if f["path"].startswith(f"{rel}/")],
                          ch_rel if ch_rel is not None else ch_ref,
                          schema_json, m)
                continue
            if layout_op:
                # full-rewrite of a row-preserving layout op: keep the
                # staged output for the layout-vs-append rebase
                staged = ("layout", rel,
                          [f if "/" in f["path"]
                           else {**f, "path": f"{rel}/{f['path']}"}
                           for f in files],
                          ch_rel if ch_rel is not None else ch_ref,
                          schema_json, m)
                continue
            shutil.rmtree(self.path / rel, ignore_errors=True)
            if ch_rel:
                shutil.rmtree(self.path / ch_rel, ignore_errors=True)
        if staged is not None:
            shutil.rmtree(self.path / staged[1], ignore_errors=True)
            if staged[3] and isinstance(staged[3], str):
                shutil.rmtree(self.path / staged[3], ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def append(self, rows: DataFrame, max_retries: int = 20) -> int:
        rows = self._materialize_generated(rows)
        return self._commit_loop(lambda cur: cur.unionByName(rows),
                                 "append", max_retries, insert_hint=rows)

    def merge(self, updates: DataFrame, key: list[str],
              max_retries: int = 20,
              evolve_schema: bool = False) -> int:
        """ANSI MERGE, last-writer-wins per key: matched target rows take
        the update's non-key columns, unmatched updates insert, untouched
        target rows carry over.  The full-outer formulation keeps the
        merge one keyed shuffle — at scale both sides hash-partition on
        the key and AQE broadcasts a small update batch on its own.

        ``evolve_schema=True`` is Delta's ``withSchemaEvolution()``:
        source-only columns WIDEN the target schema in the same commit
        (carried/unmatched target rows read NULL there), exactly the
        ``append_evolve`` contract — transactional, time travel keeps
        each version's own width, CDF diffs ride ``_widen_for_diff``.
        Without it a source-only column is silently dropped (the
        historical MERGE projection, Delta's default too). Shared
        columns must agree on type either way — so partition,
        constraint, and generated columns can never be rewritten
        implicitly (they are always live schema columns); a new column
        that merely case-varies an existing name is refused."""
        def build(cur: DataFrame) -> DataFrame:
            u_all = updates
            if evolve_schema:
                cur = self._widen_target(cur, u_all, "merge")
            val_cols = [c for c in cur.columns if c not in key]
            if not evolve_schema:
                # strict projection: a target value column missing
                # from the source is an error, not a silent carry —
                # otherwise a typo'd source column becomes a no-op
                # update. The lenient carry (target keeps its value
                # where the source has no such column) is reserved
                # for evolve_schema=True, where mixed-width sources
                # are the declared contract.
                missing = [c for c in val_cols
                           if c not in u_all.columns]
                if missing:
                    raise ValueError(
                        f"merge source is missing target value "
                        f"column(s) {missing} at {self.path}; pass "
                        f"evolve_schema=True to merge a narrower "
                        f"source (target keeps its value there)")
            u = u_all.select(
                *key, *[F.col(c).alias(f"__u_{c}")
                        for c in val_cols if c in u_all.columns])
            merged = cur.join(u, key, "full_outer")
            return merged.select(
                *key,
                *[(F.coalesce(f"__u_{c}", c) if f"__u_{c}" in
                   merged.columns else F.col(c)).alias(c)
                  for c in val_cols])
        with self._op_params(merge_key=list(key),
                             schema_evolution=evolve_schema or None):
            return self._commit_loop(build, "merge", max_retries)

    def _widen_target(self, cur: DataFrame, source: DataFrame,
                      op: str) -> DataFrame:
        """``cur`` widened with ``source``-only columns (NULL-filled) —
        the schema-evolution half every evolving writer shares. Shared
        columns must agree on type (silently widening int→bigint or
        dying in an opaque Spark cast is worse than refusing); new
        columns are refused when a constraint or generated-column
        definition already names them."""
        cur_t, new_t = dict(cur.dtypes), dict(source.dtypes)
        conflicts = {c: (cur_t[c], new_t[c]) for c in new_t
                     if c in cur_t and cur_t[c] != new_t[c]}
        if conflicts:
            detail = ", ".join(f"{c}: table={a} vs source={b}"
                               for c, (a, b) in sorted(conflicts.items()))
            raise TypeError(
                f"{op} schema-evolution conflict at {self.path} — "
                f"shared column(s) change type ({detail}); cast the "
                f"source explicitly to evolve a column's type")
        new_cols = [c for c in source.columns if c not in cur_t]
        if not new_cols:
            return cur
        # partition / constraint / generated columns are always LIVE
        # schema columns (drop_column refuses referenced ones), so a
        # same-named source column is a SHARED column handled above;
        # the reachable hazard is a case-variant name minting a
        # duplicate under Spark's case-insensitive resolution
        lower = {c.lower() for c in cur_t}
        clash = [c for c in new_cols if c.lower() in lower]
        if clash:
            raise ValueError(
                f"{op} schema evolution refuses new column(s) {clash}:"
                f" case-insensitive clash with existing columns "
                f"(partition/constraint/generated columns included) — "
                f"match the target's spelling or rename the source "
                f"column")
        for c in new_cols:
            cur = cur.withColumn(c, F.lit(None).cast(new_t[c]))
        return cur

    def merge_pruned(self, updates: DataFrame, key: list[str],
                     max_retries: int = 20,
                     evolve_schema: bool = False) -> int:
        """``merge()`` with Delta-style touched-file pruning: the find
        pass is a key-column-only semi-join scan collecting the files
        that share a key with the update batch; only those files join
        the updates (matched rows take update values), every other file
        is carried by reference, and updates matching NO file insert —
        they fall out of the same full-outer join, because a key absent
        from every touched file is by construction absent from the
        table. On a key-clustered table (``relayout(key)``) a narrow
        update batch touches O(batch-extent) files, not the table. On
        a PARTITIONED table whose partition columns appear in the
        update batch, the find pass first prunes to the partitions the
        batch actually touches — metadata only, before any file IO."""
        if evolve_schema:
            _, cur = self.snapshot()
            if any(c not in cur.columns for c in updates.columns):
                # a WIDENING merge rewrites through the full path (the
                # rare schema-change commit pays O(table) once; routine
                # same-width batches keep the pruned fast path)
                return self.merge(updates, key, max_retries,
                                  evolve_schema=True)
        dedup_keys = updates.select(*key).distinct()

        def probe(df: DataFrame) -> DataFrame:
            return df.join(dedup_keys, key, "semi")

        def rewrite(touched: DataFrame) -> DataFrame:
            val_cols = [c for c in touched.columns if c not in key]
            u = updates.select(*key, *[F.col(c).alias(f"__u_{c}")
                                       for c in val_cols])
            return (touched.join(u, key, "full_outer")
                    .select(*key,
                            *[F.coalesce(f"__u_{c}", c).alias(c)
                              for c in val_cols]))
        part_in = self._partition_tuples_of(updates, key=key)
        with self._op_params(merge_key=list(key)):
            return self._cow_commit(probe, rewrite, "merge_pruned",
                                    max_retries, empty_noop=False,
                                    partition_in=part_in)

    def _partition_tuples_of(self, batch: DataFrame,
                             key: list[str] | None = None,
                             cap: int = 10_000) -> list[dict] | None:
        """The distinct partition tuples present in ``batch`` (for
        partition-first DML pruning), or None when the table is
        unpartitioned, the batch lacks a partition column, or the
        batch spans more than ``cap`` tuples (at which point pruning
        buys nothing and the collect is not worth it). The collect is
        bounded: one small driver list of partition VALUES, the same
        class of driver state as the touched-file name list.

        When ``key`` (a MERGE key) is given, pruning is offered ONLY
        if every partition column is part of the key: otherwise a
        target row matching on the key may live in a partition the
        batch does not name (the batch's partition value is data, not
        identity), and pruning it away would make merge_pruned insert
        a duplicate-key row and merge_mor silently drop the update."""
        pcols = self.partition_cols()
        if not pcols or any(c not in batch.columns for c in pcols):
            return None
        if key is not None and not (
                {c.lower() for c in pcols}
                <= {c.lower() for c in key}):
            return None
        vals = (batch.select(*pcols).distinct().limit(cap + 1).collect())
        if len(vals) > cap:
            return None
        return [{c: r[c] for c in pcols} for r in vals]

    def _batch_prune_signals(self, keys_df: DataFrame, key: list[str],
                             prune_col: str
                             ) -> tuple[int | None,
                                        list[dict] | None,
                                        tuple[str, list] | None]:
        """ONE bounded collect serving every per-DML driver signal —
        the keyed DML entries (apply_cdf / merge_add_pruned /
        delete_semi) each needed up to three separate Spark jobs per
        call (emptiness probe, ``_partition_tuples_of``,
        ``_eq_prune_vals``) over the SAME distinct-key projection; one
        ``limit(cap+1).collect()`` answers all three (guide §1.2:
        remove redundant passes). ``keys_df`` must be the DISTINCT key
        rows with exactly ``key``'s columns.

        Returns ``(n, partition_in, eq_prune)``: ``n`` is the distinct
        key-row count when it fits ``_EQ_PRUNE_CAP`` (0 = empty batch)
        or None past the cap; past the cap the partition tuples fall
        back to their own capped job (cap 10_000 > _EQ_PRUNE_CAP, so
        tuple pruning can still engage) and ``eq_prune`` is None —
        marginally more conservative than probing ``prune_col`` alone
        (a multi-column key can blow the tuple cap while one column
        stays narrow) but that regime has partition pruning on the
        same column in every product layout, and the choice is
        performance-only (both paths are value-equal)."""
        rows = keys_df.limit(_EQ_PRUNE_CAP + 1).collect()
        if len(rows) > _EQ_PRUNE_CAP:
            return (None, self._partition_tuples_of(keys_df, key=key),
                    None)
        if not rows:
            return 0, None, None
        eq = (prune_col, list({r[prune_col] for r in rows}))
        part_in = None
        pcols = self.partition_cols()
        if (pcols and all(c in keys_df.columns for c in pcols)
                and {c.lower() for c in pcols}
                <= {c.lower() for c in key}):
            seen = {tuple(r[c] for c in pcols) for r in rows}
            part_in = [dict(zip(pcols, t)) for t in seen]
        return len(rows), part_in, eq

    def merge_keep_latest(self, updates: DataFrame, key: list[str],
                          version_col: str, max_retries: int = 20) -> int:
        """CDC MERGE: per key keep the row with the greatest
        ``version_col`` across current state and the update batch — the
        idempotent upsert a change-data stream needs (replays and batch
        re-splits converge to the same state)."""
        from pyspark.sql import Window
        w = (Window.partitionBy(*key)
             .orderBy(F.desc(version_col)))

        def build(cur: DataFrame) -> DataFrame:
            return (cur.unionByName(updates.select(*cur.columns))
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn"))
        return self._commit_loop(build, "merge_keep_latest", max_retries)

    def restore(self, version: int, max_retries: int = 20) -> int:
        """RESTORE TABLE ... TO VERSION AS OF: make ``version``'s state
        the NEW latest as a forward commit (history is never rewritten —
        the restore is itself a version, Delta semantics). Pure metadata:
        the new manifest shares the target version's data dir and file
        stats; on CDF tables the restore records its effective deltas
        (current→target diff) so downstream feeds see the rollback as
        ordinary changes. Raises VersionVacuumedError if the target's
        data is gone."""
        target = self._manifest(version)
        if not self._version_intact(target, probe=True):
            raise VersionVacuumedError(
                f"cannot restore {self.path} to vacuumed version {version}")
        cdf = self.cdf_enabled()
        for _ in range(max_retries):
            v = self.latest_version()
            # the restored state must carry the TARGET version's
            # column-mapping identity, not inherit the latest's: the
            # restored manifest references the target's data files,
            # whose physical layout the target's mapping describes.
            # Inheriting the latest mapping left a stale {new: old_phys}
            # entry after restore(pre-rename), and a later
            # add_column(new) silently bound the fresh column to the
            # renamed-away column's bytes. Other props (cdf/dv/
            # partition spec) stay at their latest values — Delta
            # RESTORE likewise restores data+schema, not properties.
            props = dict(self._props(v))
            tprops = self._props(version)
            restore_changed = False
            for k in ("column_mapping", "retired_physical"):
                if tprops.get(k) != props.get(k):
                    restore_changed = True
                if k in tprops:
                    props[k] = tprops[k]
                else:
                    props.pop(k, None)
            ch_rel = None
            if cdf:
                ch_rel = self._write_changes(
                    self.read(v), self.read(version), "restore")
            if self._try_commit(v + 1, target["data"], target["schema"],
                                "restore", changes_rel=ch_rel,
                                props=props if (props or restore_changed)
                                else None,
                                files=target.get("files"),
                                dv_rel=target.get("dv"),
                                dv_rows=target.get("dv_rows", 0)):
                return v + 1
            if ch_rel:
                shutil.rmtree(self.path / ch_rel, ignore_errors=True)
        raise CommitConflict(
            f"gave up restoring after {max_retries} conflicted commits")

    def partitions(self) -> DataFrame:
        """SHOW PARTITIONS: one row per partition tuple of the latest
        snapshot with file/row counts — pure manifest metadata (plus
        the small deletion-vector sidecar for exact live-row counts);
        no data file is opened at any table size."""
        pcols = self.partition_cols()
        if not pcols:
            raise ValueError(f"{self.path} is not partitioned")
        m = self._manifest(self.latest_version())
        dead: dict[str, int] = {}
        if "dv" in m:
            import pyarrow.parquet as pq
            t = pq.read_table(str(self.path / m["dv"]), columns=["file"])
            for name in t.column("file").to_pylist():
                dead[name] = dead.get(name, 0) + 1
        agg: dict[tuple, list] = {}
        for f in m.get("files") or []:
            part = f.get("partition") or {}
            key = tuple(part.get(c) for c in pcols)
            n_r = agg.setdefault(key, [0, 0])
            n_r[0] += 1
            n_r[1] += f.get("rows", 0) - dead.get(_entry_name(f), 0)
        schema = StructType.fromJson(m["schema"])
        ptypes = {f.name: f.dataType for f in schema.fields}
        rows = [(*k, n, r) for k, (n, r) in
                sorted(agg.items(), key=lambda kv: tuple(
                    (x is None, str(x)) for x in kv[0]))]
        # date/timestamp/decimal partition values ride the manifest as
        # their Hive directory strings (no JSON-native form) — build
        # those columns as strings and CAST into the declared type so
        # createDataFrame never sees a mis-typed python value
        native = (IntegerType, LongType, ShortType, ByteType,
                  FloatType, DoubleType, BooleanType, StringType)
        ddl = ", ".join(
            f"{c} {ptypes[c].simpleString()}"
            if isinstance(ptypes[c], native) else f"{c} string"
            for c in pcols)
        out = self.spark.createDataFrame(
            rows, f"{ddl}, n_files int, n_rows long")
        for c in pcols:
            if not isinstance(ptypes[c], native):
                out = out.withColumn(c, F.col(c).cast(ptypes[c]))
        return out

    def detail(self) -> DataFrame:
        """DESCRIBE DETAIL: one row of table-level facts straight from
        the newest manifest — version, file/row/byte counts, partition
        columns, properties, constraints. O(manifest)."""
        v = self.latest_version()
        m = self._manifest(v)
        files = m.get("files") or []
        props = self._props()
        # clustering health: files per curve/sort provenance — the
        # number an operator reads before deciding whether OPTIMIZE
        # CLUSTER/ZORDER maintenance is due (unclustered = arrivals)
        clustered: dict[str, int] = {}
        for f in files:
            if f.get("zorder"):
                tag = "zorder(" + ",".join(f["zorder"]) + ")"
            elif f.get("sort"):
                tag = "sort(" + ",".join(f["sort"]) + ")"
            else:
                tag = "unclustered"
            clustered[tag] = clustered.get(tag, 0) + 1
        return self.spark.createDataFrame(
            [(str(self.path), v, m["op"], len(files),
              sum(f.get("rows", 0) for f in files) - m.get("dv_rows", 0),
              sum(f.get("bytes", 0) for f in files),
              self.partition_cols(),
              bool(props.get("cdf")), bool(props.get("dv")),
              sorted(m.get("constraints", {})),
              list(props.get("bloom_by", []) or []),
              sorted(props.get("generated", {}) or {}),
              sorted(props.get("reader_features", []) or []),
              sorted(f"{k}:{n}" for k, n in clustered.items()))],
            "location string, version int, last_op string, "
            "n_files int, n_rows long, size_bytes long, "
            "partition_by array<string>, cdf_enabled boolean, "
            "dv_enabled boolean, constraints array<string>, "
            "bloom_by array<string>, generated_columns array<string>, "
            "reader_features array<string>, clustering array<string>")

    def history(self) -> DataFrame:
        """DESCRIBE HISTORY: one row per committed version straight from
        the manifests (version, op, parent, file/row counts) — the audit
        surface time travel needs to be usable. Per-commit operation
        metrics (Delta's operationMetrics) AND the snapshot totals come
        from the O(delta) encoding itself: each RAW manifest is read
        exactly once and ``n_files``/``n_rows`` roll forward from the
        parent's totals via files_add/files_remove (a name→rows map
        supplies removed-file row counts), so the whole audit is
        O(versions + delta entries) driver work — never a per-version
        full-list resolution. ``operation_parameters`` is Delta's
        operationParameters: the DML predicate / MERGE key / layout
        columns a commit ran with, JSON-encoded (null for commits
        predating the column or carrying none)."""
        rows = []
        rowmap: dict[str, int] = {}       # live file name -> row count
        total_rows = 0
        for v in range(self.latest_version() + 1):
            raw = json.loads(
                (self._manifests / f"v{v}.json").read_text())
            if "files_base" in raw:
                added = raw.get("files_add") or []
                removed = raw.get("files_remove") or []
                fa = len(added)
                ra = sum(f.get("rows", 0) for f in added)
                fr = len(removed)
                for n in removed:
                    total_rows -= rowmap.pop(n, 0)
                for f in added:
                    rowmap[_entry_name(f)] = f.get("rows", 0)
                total_rows += ra
            else:
                # v0, or a full-list manifest (a rewrite shares nothing
                # with its parent, so delta encoding didn't win): the
                # whole list is the add, the parent's count the remove
                files = raw.get("files") or []
                fa = len(files)
                ra = sum(f.get("rows", 0) for f in files)
                fr = len(rowmap)
                rowmap = {_entry_name(f): f.get("rows", 0)
                          for f in files}
                total_rows = ra
            params = raw.get("op_params")
            rows.append((raw["version"], raw["op"], raw["parent"],
                         len(rowmap),
                         total_rows - raw.get("dv_rows", 0),
                         fa, ra, fr,
                         json.dumps(params, sort_keys=True)
                         if params else None))
        return self.spark.createDataFrame(
            rows, "version int, op string, parent int, n_files int, "
                  "n_rows long, files_added int, rows_added long, "
                  "files_removed int, operation_parameters string")

    @staticmethod
    def _txn_fenced(m: dict, txn: str) -> bool:
        """True when manifest ``m``'s cumulative txns map already
        carries this writer fence at or past ``txn``'s batch id — the
        O(1) replay test every fenced commit path runs against EACH
        attempt's freshly-read manifest (not just method entry), so a
        zombie query run racing its restart can never double-apply a
        batch through the optimistic retry loop (the append_txn
        discipline, generalized). A manifest without a txns map gives
        no verdict (legacy chain: callers do the one-time walk)."""
        tmap = m.get("txns")
        if tmap is None:
            return False
        app_id, _, batch = txn.rpartition("#")
        return int(batch) <= tmap.get(app_id, -1)

    def _txn_entry_fenced(self, app_id: str, batch_id: int) -> bool:
        """Method-entry replay check shared by the fenced writers:
        O(1) against the newest manifest's cumulative txns map, with
        the one-time chain walk for legacy manifests predating it."""
        latest = self.latest_version()
        if latest is None:
            return False
        newest = self._manifest(latest, with_files=False)
        if "txns" in newest:
            return batch_id <= newest["txns"].get(app_id, -1)
        return self.txn_version(app_id, batch_id) is not None

    def append_txn(self, rows: DataFrame, app_id: str, batch_id: int,
                   max_retries: int = 20) -> int | None:
        """Idempotent streaming append: the (app_id, batch_id) writer
        transaction rides the manifest, and a replayed batch (foreachBatch
        re-delivery after a checkpoint restart) is SKIPPED if any
        committed manifest already carries it — exactly-once table
        appends from an at-least-once stream, the Delta txn-marker
        pattern. Returns the committed version, or None if this batch
        was already applied.

        The replay check is O(1): the newest manifest carries the
        cumulative {app_id: latest batch_id} map, and foreachBatch batch
        ids are monotonic per query, so ``batch_id <= latest committed``
        means this batch is already visible.  Manifests from before the
        map existed fall back to the full scan once; the next commit
        starts the map."""
        txn = f"{app_id}#{batch_id}"
        rows = self._materialize_generated(rows)
        for _ in range(max_retries):
            v, cur = self.snapshot()
            newest = self._manifest(v)
            if "txns" in newest:
                if batch_id <= newest["txns"].get(app_id, -1):
                    return None  # replayed batch: already visible
            elif any(self._manifest(i).get("txn") == txn
                     for i in range(v + 1)):
                return None  # legacy manifest chain: one-time full scan
            cons = newest.get("constraints", {})
            if cons:
                # appends only need the NEW rows checked
                self._check_constraints(rows, cons)
            # O(delta) linked append — same fast path as append()
            rel, files = self._write_data_linked(
                newest, rows.select(*cur.columns))
            ch_rel = ch_ref = None
            if self.cdf_enabled():
                if not self._mapping_at():
                    # CDF by reference — the staged files ARE the
                    # change set (see _commit_loop's linked path)
                    ch_ref = [f["path"] for f in files
                              if f["path"].startswith(f"{rel}/")]
                else:
                    ch_rel = self._write_changes(cur, None, "append_txn",
                                                 insert_hint=rows)
            if self._try_commit(v + 1, rel, cur.schema.jsonValue(),
                                op="append_txn", txn=txn,
                                changes_rel=ch_rel, changes_ref=ch_ref,
                                files=files,
                                dv_rel=newest.get("dv"),
                                dv_rows=newest.get("dv_rows", 0)):
                return v + 1
            shutil.rmtree(self.path / rel, ignore_errors=True)
            if ch_rel:
                shutil.rmtree(self.path / ch_rel, ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def txn_version(self, app_id: str, batch_id: int) -> int | None:
        """The version at which writer transaction (app_id, batch_id)
        COMMITTED, or None if no manifest carries it. Walks the chain
        newest-first — O(chain) worst case, but only consulted on the
        rare replay path (append_txn already answered the O(1)
        \"was it applied?\" question from the cumulative txns map)."""
        txn = f"{app_id}#{batch_id}"
        latest = self.latest_version()
        if latest is None:
            return None
        for v in range(latest, -1, -1):
            # with_files=False: only the 'txn' scalar is needed — never
            # replay each version's delta-encoded file list
            if self._manifest(v, with_files=False).get("txn") == txn:
                return v
        return None

    def apply_cdf(self, changes: DataFrame, key: list[str],
                  app_id: str | None = None,
                  batch_id: int | None = None,
                  max_retries: int = 20) -> int | None:
        """Apply one CDF micro-batch — rows of this table's schema plus
        ``_change_type`` in ('insert'|'delete') — as ONE file-pruned
        copy-on-write commit: files holding a DELETED key are rewritten
        without those keys' rows, every other file is carried by
        manifest reference, and the batch's insert rows land as new
        files in the same commit. An update (its delete+insert pair at
        one key) nets to the post-image. This is how a downstream index
        follows its source's change feed: inserts stay O(batch), a
        delete costs O(files holding the key), never O(table) — and on
        a table whose partition columns are part of ``key`` the find
        pass prunes to the touched partitions by metadata alone (the
        IVF index routes deletes as (cell, vec_id) for exactly this).

        With ``(app_id, batch_id)`` the commit carries the writer fence
        (the ``append_txn`` discipline): a replayed at-least-once
        micro-batch commits NOTHING and returns None, so mixed
        insert+delete maintenance stays exactly-once. The fence is
        checked at entry against the cumulative txns map (same O(1)
        read as append_txn) AND re-checked against each retry
        attempt's manifest inside the commit loops, so a zombie run
        racing its restart can't double-apply through a lost CAS race.

        On a table created with ``enable_dv=True`` the delete side
        serves MERGE-ON-READ: matched rows die by deletion-vector
        entry — O(matched rows), no data file read in full or
        rewritten — and the inserts land as an O(delta) linked append
        in the SAME commit. That is the retire shape that survives
        100 TB: a scattered-key retention delete under COW rewrites
        every file holding a deleted key (the r14 cost cliff); under
        MOR it rewrites none, and compaction materializes the
        accumulated vectors away on its own cadence.
        """
        txn = None
        if app_id is not None:
            if batch_id is None:
                raise ValueError("apply_cdf: batch_id is required "
                                 "when app_id is given")
            txn = f"{app_id}#{batch_id}"
            if self._txn_entry_fenced(app_id, batch_id):
                return None              # replayed batch: fenced out
        if "_change_type" not in changes.columns:
            raise ValueError(
                "apply_cdf expects a _change_type column "
                "('insert'|'delete') — feed it CDF rows")
        dels = (changes.filter(F.col("_change_type") == "delete")
                .select(*key).distinct())
        ins = changes.filter(F.col("_change_type") == "insert")
        # ONE bounded collect answers emptiness + partition tuples +
        # the stats/bloom prune values (three separate jobs before);
        # prefer a bloom-indexed key column for the equality prune —
        # it makes a retire pass candidate-file-bounded (the
        # dedup/text index shape)
        prune_col = next((c for c in key if c in self.bloom_cols()),
                         key[0])
        n_dels, part_in, eq_prune = self._batch_prune_signals(
            dels, key, prune_col)
        if n_dels == 0:
            # pure-insert batch (the common arrival): O(delta) linked
            # append, no find-pass scan at all
            clean = ins.drop("_change_type", "_commit_version")
            if txn is not None:
                return self.append_txn(clean, app_id, batch_id,
                                       max_retries)
            return self.append(clean, max_retries=max_retries)

        # a DELETE-ONLY batch needs just the key columns (+ change
        # type) in ``changes`` — a retire pass shouldn't have to
        # fabricate null images of columns it never touches
        ins_empty = ins.isEmpty()

        if self.dv_enabled():
            ins_clean = (None if ins_empty else
                         ins.drop("_change_type", "_commit_version"))
            with self._op_params(apply_key=list(key)):
                return self._mor_retire(
                    lambda df: df.join(dels, key, "semi"),
                    ins_clean, "apply_cdf_mor", txn,
                    part_in, eq_prune, max_retries)

        def probe(df: DataFrame) -> DataFrame:
            return df.join(dels, key, "semi")

        def rewrite(touched: DataFrame) -> DataFrame:
            kept = touched.join(dels, key, "left_anti")
            if ins_empty:
                return kept
            return kept.unionByName(ins.select(*touched.columns))
        with self._op_params(apply_key=list(key)):
            return self._cow_commit(probe, rewrite, "apply_cdf",
                                    max_retries, empty_noop=False,
                                    partition_in=part_in, txn=txn,
                                    eq_any_prune=eq_prune)

    def read_changes(self, v_from: int, v_to: int) -> DataFrame:
        """Change data feed: the row-level deltas between two committed
        versions (Delta CDF's ``table_changes`` analog) — the missing link
        between time travel (any version is readable) and a downstream
        incremental consumer (what CHANGED between them).

        Output schema = the table's columns (widened across any schema
        evolution in the range) plus ``_change_type`` ('insert'|'delete')
        and ``_commit_version`` (the version that introduced the change).
        An update appears as its delete+insert pair at the same version.
        Contract: for any committed pair, ``read(v_from)`` ⊎ inserts ∖
        deletes == ``read(v_to)`` as a multiset (tests/test_acid.py pins
        this, and the acid_change_feed oracle re-derives it in DuckDB).

        Serving: versions whose commit RECORDED change files (the table
        was created with ``enable_cdf=True``) are a plain distributed
        parquet scan of those files — no snapshots touched, so the feed
        keeps serving after old snapshots are vacuumed. Versions without
        recorded changes fall back to ONE pair of ``exceptAll``s per
        step (a keyed shuffle on the row hash, no driver-side data
        movement) — the audit/backfill path, which needs both bounding
        snapshots retained."""
        latest = self.latest_version()
        if not (0 <= v_from <= v_to <= (latest if latest is not None else -1)):
            raise ValueError(
                f"read_changes({v_from}, {v_to}) outside committed range "
                f"[0, {latest}] at {self.path}")
        # Epoch gate: the feed cannot mix schema epochs whose COLUMN
        # IDENTITIES differ (Delta refuses CDF across column-mapping
        # schema changes the same way). That is any commit that edits
        # the logical→physical map or the retired set — rename_column,
        # drop_column (recorded change files written before the drop
        # still carry the dropped column's values; after a re-add of
        # the same name the union would resurrect them under the new
        # column identity), and an add_column that minted a fresh
        # physical identity for a previously-recorded name. Plain
        # add_column inherits props unchanged and passes. One O(range)
        # forward walk over raw manifests, no per-version props chase.
        eff = self._props(v_from)
        ident = (eff.get("column_mapping"),
                 eff.get("retired_physical"))
        for vv in range(v_from + 1, v_to + 1):
            mv = self._manifest(vv, with_files=False)
            p = mv.get("props")
            if p is not None:
                eff = p
            nxt = (eff.get("column_mapping"),
                   eff.get("retired_physical"))
            if mv["op"] == "rename_column" or nxt != ident:
                raise ValueError(
                    f"read_changes({v_from}, {v_to}) spans the column-"
                    f"mapping schema change ({mv['op']}) at version "
                    f"{vv}; the change feed cannot mix schema epochs "
                    f"with different column identities (Delta refuses "
                    f"CDF across column-mapping schema changes the "
                    f"same way) — read each epoch separately, or use "
                    f"read_changes_mapped for a rename-spanning feed "
                    f"served in the target schema")
            ident = nxt

        def recorded(m: dict):
            """("dir", path) / ("ref", rel paths) if this commit
            recorded its deltas (change dir, or CDF-by-reference data
            files — every row an insert; [] = recorded empty set)."""
            if "changes_ref" in m:
                refs = m["changes_ref"]
                if all((self.path / r).exists() for r in refs):
                    return ("ref", refs)
                return None             # vacuumed past change retention
            if "changes" not in m:
                return None
            p = self.path / m["changes"]
            return ("dir", p) if p.is_dir() else None

        # retention guard: a version serves from its recorded change
        # files, else from the (v-1, v) snapshot diff — and EVERY needed
        # snapshot must still exist; a vacuumed one would yield PARTIAL
        # deltas that look valid
        need_data: set[int] = set()
        for v in range(v_from + 1, v_to + 1):
            if recorded(self._manifest(v)) is None:
                need_data.update((v - 1, v))
        vacuumed = [v for v in sorted(need_data)
                    if not self._version_intact(self._manifest(v))]
        if vacuumed:
            raise VersionVacuumedError(
                f"read_changes({v_from}, {v_to}) needs vacuumed "
                f"version(s) {vacuumed} of {self.path}; start the feed at "
                f"a retained version, or create the table with "
                f"enable_cdf=True so commits record their own deltas")

        def widened(df: DataFrame, cols: list[str],
                    types: dict[str, str]) -> DataFrame:
            have = set(df.columns)
            out = df
            for c in cols:
                if c not in have:
                    out = out.withColumn(c, F.lit(None).cast(types[c]))
            return out.select(cols)

        frames = []
        for v in range(v_from + 1, v_to + 1):
            m = self._manifest(v)
            ch = recorded(m)
            if ch is not None:
                kind, val = ch
                if kind == "ref":
                    if not val:
                        continue       # recorded empty change set
                    f = (self.spark.read.parquet(
                            *[str(self.path / r) for r in val])
                         .withColumn("_change_type", F.lit("insert")))
                else:
                    f = self.spark.read.parquet(str(val))
                cols = [c for c in f.columns if c != "_change_type"]
                frames.append(f.select(
                    *cols, "_change_type",
                    F.lit(v).alias("_commit_version")))
                continue
            old, new = self.read(v - 1), self.read(v)
            old_t, new_t = dict(old.dtypes), dict(new.dtypes)
            cols = list(new.columns) + [c for c in old.columns
                                        if c not in new_t]
            types = {**old_t, **new_t}
            o, n = widened(old, cols, types), widened(new, cols, types)
            frames.append(
                n.exceptAll(o)
                .select(*cols, F.lit("insert").alias("_change_type"),
                        F.lit(v).alias("_commit_version"))
                .unionByName(
                    o.exceptAll(n)
                    .select(*cols, F.lit("delete").alias("_change_type"),
                            F.lit(v).alias("_commit_version"))))
        if not frames:
            base = self.read(v_to)
            return (base.select(*base.columns,
                                F.lit("").alias("_change_type"),
                                F.lit(0).alias("_commit_version"))
                    .limit(0))
        out = frames[0]
        for df in frames[1:]:
            # align BOTH frames to the merged column superset: schema
            # evolution is add-only today, but projecting to one side's
            # list would silently drop the other side's extras the day a
            # column-drop op exists — the superset keeps every column,
            # NULL-widened where a frame lacks it
            cols = list(out.columns) + [c for c in df.columns
                                        if c not in out.columns]
            types = {**dict(out.dtypes), **dict(df.dtypes)}
            out = widened(out, cols, types) \
                .unionByName(widened(df, cols, types))
        return out

    def _translate_to_schema(self, df: DataFrame, src_mapping: dict,
                             target_schema: StructType,
                             target_mapping: dict,
                             extra: list[str] = ()) -> DataFrame:
        """Project ``df`` (whose columns are one epoch's LOGICAL names
        under ``src_mapping``) onto ``target_schema``'s logical names,
        matching columns by their frozen PHYSICAL identity — the
        schema-tracking translation (Delta's schemaTrackingLocation
        idea): a rename is a no-op in physical space, a column absent
        from the target identity set is dropped, a target column with
        no source identity reads NULL. ``extra`` columns (metadata like
        _change_type) pass through untouched."""
        have = set(df.columns)
        # physical identity of every SOURCE column: an explicit mapping
        # entry wins; an unmapped column's physical is its own name —
        # but only for columns the frame actually has. (Matching a
        # target physical by bare name would mis-bind when a source
        # LOGICAL of that name is mapped elsewhere: post-drop re-added
        # 'score' has physical 'score', but epoch-v frame column
        # 'score' may represent physical 'val'.)
        phys_to_src = {src_mapping.get(l, l): l
                       for l in have if l not in extra}
        cols = []
        for fld in target_schema.fields:
            phys = target_mapping.get(fld.name, fld.name)
            src = phys_to_src.get(phys)
            if src is not None:
                cols.append(F.col(src).cast(fld.dataType)
                            .alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType)
                            .alias(fld.name))
        return df.select(*cols, *[F.col(c) for c in extra if c in have])

    def read_mapped(self, version: int, schema_of: int) -> DataFrame:
        """``read(version)`` served in the LOGICAL schema of
        ``schema_of`` — columns matched by physical identity (renames
        collapse, dropped-then-re-added columns read NULL). The
        projection half of the mapped change feed's multiset
        contract."""
        return self._translate_to_schema(
            self.read(version), self._mapping_at(version),
            StructType.fromJson(
                self._manifest(schema_of, with_files=False)["schema"]),
            self._mapping_at(schema_of))

    def read_changes_mapped(self, v_from: int, v_to: int,
                            schema_of: int | None = None) -> DataFrame:
        """Change data feed ACROSS column-mapping schema changes,
        served in one declared target schema (default: ``v_to``'s) —
        the schema-tracking read ``read_changes`` refuses to fake.
        Delta answers this with a schemaTrackingLocation; here the
        table's own logical→physical map IS the tracking state, so the
        translation needs no side files: every epoch's deltas are
        projected onto the target schema by frozen physical identity
        (``_translate_to_schema``): renames collapse to one column,
        columns dropped before the target read as absent, re-added
        columns (fresh physical identity) read NULL for pre-add
        epochs — never the old bytes.

        Contract (the mapped multiset equation, pinned in tests):
        ``read_mapped(v_from, schema_of)`` ⊎ inserts ∖ deletes ==
        ``read_mapped(v_to, schema_of)``. Serving cost matches
        ``read_changes``: recorded change files stream as parquet
        scans; unrecorded versions pay one distributed exceptAll pair
        (translated FIRST, so the diff runs in one schema)."""
        latest = self.latest_version()
        if not (0 <= v_from <= v_to
                <= (latest if latest is not None else -1)):
            raise ValueError(
                f"read_changes_mapped({v_from}, {v_to}) outside "
                f"committed range [0, {latest}] at {self.path}")
        tv = v_to if schema_of is None else schema_of
        target_schema = StructType.fromJson(
            self._manifest(tv, with_files=False)["schema"])
        target_mapping = self._mapping_at(tv)

        def recorded(m: dict):
            if "changes_ref" in m:
                refs = m["changes_ref"]
                if all((self.path / r).exists() for r in refs):
                    return ("ref", refs)
                return None
            if "changes" not in m:
                return None
            p = self.path / m["changes"]
            return ("dir", p) if p.is_dir() else None

        # retention guard — identical to read_changes: every snapshot a
        # fallback diff needs must still exist
        need_data: set[int] = set()
        for v in range(v_from + 1, v_to + 1):
            if recorded(self._manifest(v, with_files=False)) is None:
                need_data.update((v - 1, v))
        vacuumed = [v for v in sorted(need_data)
                    if not self._version_intact(self._manifest(v))]
        if vacuumed:
            raise VersionVacuumedError(
                f"read_changes_mapped({v_from}, {v_to}) needs vacuumed "
                f"version(s) {vacuumed} of {self.path}")

        frames = []
        meta = ["_change_type", "_commit_version"]
        for v in range(v_from + 1, v_to + 1):
            m = self._manifest(v, with_files=False)
            mv = self._mapping_at(v)
            ch = recorded(m)
            if ch is not None:
                kind, val = ch
                if kind == "ref":
                    if not val:
                        continue       # recorded empty change set
                    # ref commits are gated to mapping-free epochs at
                    # write time, so file columns ARE logical names
                    f = (self.spark.read.parquet(
                            *[str(self.path / r) for r in val])
                         .withColumn("_change_type", F.lit("insert"))
                         .withColumn("_commit_version", F.lit(v)))
                else:
                    f = (self.spark.read.parquet(str(val))
                         .withColumn("_commit_version", F.lit(v)))
                frames.append(self._translate_to_schema(
                    f, mv, target_schema, target_mapping, extra=meta))
                continue
            # fallback diff: translate BOTH snapshots into the target
            # schema first, then diff — a pure-rename commit diffs
            # empty here, exactly as its recorded (empty) pair would
            old = self.read_mapped(v - 1, tv)
            new = self.read_mapped(v, tv)
            frames.append(
                new.exceptAll(old)
                .select("*", F.lit("insert").alias("_change_type"),
                        F.lit(v).alias("_commit_version"))
                .unionByName(
                    old.exceptAll(new)
                    .select("*", F.lit("delete").alias("_change_type"),
                            F.lit(v).alias("_commit_version"))))
        if not frames:
            base = self.read_mapped(v_to, tv)
            return (base.select(
                "*", F.lit("").alias("_change_type"),
                F.lit(0).alias("_commit_version")).limit(0))
        out = frames[0]
        for df in frames[1:]:
            out = out.unionByName(df)
        return out

    def backfill_changes(self, v_from: int = 1,
                         v_to: int | None = None) -> list[int]:
        """Record change files for versions that predate (or lack)
        commit-time CDF recording — the migration path onto the
        streaming connectors, which serve ONLY recorded change files
        (a per-row driver diff does not scale; the batch
        ``read_changes`` keeps its distributed exceptAll fallback for
        audits). Each missing version pays ONE distributed exceptAll
        pair (a keyed shuffle — no rows ever touch the driver), written
        exactly like commit-time change files; the version's manifest
        is then atomically re-pointed at them (additive metadata
        repair, the moral equivalent of Iceberg's rewrite_manifests —
        data and history bytes untouched). Needs both bounding
        snapshots retained; raises VersionVacuumedError otherwise.
        Returns the versions backfilled."""
        latest = self.latest_version()
        v_to = latest if v_to is None else v_to
        done = []
        for v in range(max(1, v_from), v_to + 1):
            m = self._manifest(v)
            if "changes" in m and (self.path / m["changes"]).is_dir():
                continue
            if "changes_ref" in m and all(
                    (self.path / r).exists() for r in m["changes_ref"]):
                continue               # CDF-by-reference: recorded
            new = self.read(v)
            if m["op"] in self._NO_CHANGE_OPS:
                # row-preserving op: recorded empty set by reference
                m.pop("changes", None)
                m["changes_ref"] = []
                tmp = self._manifests / f".v{v}.json.tmp"
                tmp.write_text(json.dumps(m))
                get_store().atomic_replace(
                    tmp, self._manifests / f"v{v}.json")
                done.append(v)
                continue
            old = self.read(v - 1)
            o, n = self._widen_for_diff(old, new)
            ch = self._write_changes_pair(n.exceptAll(o),
                                          o.exceptAll(n))
            m["changes"] = ch
            tmp = self._manifests / f".v{v}.json.tmp"
            tmp.write_text(json.dumps(m))
            get_store().atomic_replace(
                tmp, self._manifests / f"v{v}.json")
            done.append(v)
        return done

    # ------------------------------------------------------------ hygiene

    def _ref_pinned_versions(self) -> set[int]:
        """Versions of THIS table pinned by catalog refs — retention
        ROOTS vacuum must honor regardless of keep_last/retain_hours
        (Iceberg's expire-snapshots-respects-refs semantics; before
        this, a branch parked longer than the retention window got its
        pinned snapshot vacuumed from under it and the WAP audit died
        with VersionVacuumedError).

        Auto-discovered from the table's location: a catalog-managed
        table lives at ``<catalog_root>/tables/<name>``; the roots are
        (a) the LATEST catalog entry's pin (a catalog reader resolves
        through it, which may lag the table's own newest version), (b)
        every tag's pin (``refs/tags/*.json`` — immutable, readable by
        name), and (c) every branch HEAD's pin (``refs/heads/<b>/bN``
        with max N — the WAP audit reads there). Historical catalog
        entries and non-head branch entries are expirable history,
        exactly like table versions outside the keep window. Expire a
        ref (``AcidCatalog.expire_tag`` / ``drop_branch``) to release
        its files at the next vacuum."""
        parent = self.path.parent
        croot = parent.parent
        if parent.name != "tables" or not (croot / "commits").is_dir():
            return set()
        name = self.path.name
        pinned: set[int] = set()

        def _pin_of(payload: dict) -> None:
            v = (payload.get("pins") or {}).get(name)
            if v is not None:
                pinned.add(int(v))
        commits = croot / "commits"
        es = [int(p.stem[1:]) for p in commits.glob("c*.json")]
        if es:
            try:
                latest = json.loads(
                    (commits / f"c{max(es)}.json").read_text())
                if name in latest:
                    pinned.add(int(latest[name]))
            except (OSError, ValueError):
                pass
        for tag in (croot / "refs" / "tags").glob("*.json"):
            try:
                _pin_of(json.loads(tag.read_text()))
            except (OSError, ValueError):
                continue
        heads = croot / "refs" / "heads"
        if heads.is_dir():
            for bdir in heads.iterdir():
                bs = [int(p.stem[1:]) for p in bdir.glob("b*.json")]
                if not bs:
                    continue
                try:
                    _pin_of(json.loads(
                        (bdir / f"b{max(bs)}.json").read_text()))
                except (OSError, ValueError):
                    continue
        return pinned

    def vacuum(self, keep_last: int = 2,
               keep_changes_last: int | None = None,
               retain_hours: float | None = None,
               orphan_grace_s: float = 300.0,
               dry_run: bool = False) -> list[str]:
        """Drop data dirs not referenced by the ``keep_last`` newest
        manifests — including orphans from conflicted (never-committed)
        writes.  Old manifests stay as history; their data is gone, which
        is exactly Delta's VACUUM trade-off.

        REF-AWARE: versions pinned by catalog refs (latest catalog
        entry, tags, branch heads — see ``_ref_pinned_versions``) are
        retention roots and survive any window; expire the ref to
        release them.

        Recorded CHANGE files have their own retention: by default every
        committed version's change files are kept (they are the small,
        append-only CDC log — the whole point of recording them is that
        the feed outlives the snapshots), so the change feed keeps
        serving from version 0 after snapshot vacuum. Pass
        ``keep_changes_last=N`` to also prune change files beyond the N
        newest versions (Delta's logRetentionDuration knob).

        ``retain_hours`` switches retention to WALL-CLOCK age (Delta's
        own ``VACUUM ... RETAIN n HOURS`` spelling): every version
        whose commit timestamp falls inside the window survives, plus
        the latest version always; ``keep_last`` is ignored.

        ``orphan_grace_s``: a file NO manifest has ever referenced is
        either a dead writer's leftover or a LIVE writer's in-flight
        staging (``tmp-``/``stage-``/not-yet-committed commit dirs) —
        indistinguishable by path, so never-referenced files are only
        deleted once older than this grace window (Delta's retention-
        window rationale: VACUUM must not race in-flight writers).
        Committed-but-unretained history deletes regardless of age."""
        import time

        latest = self.latest_version()
        if latest is None:
            return []
        if retain_hours is not None:
            cutoff = time.time() - retain_hours * 3600.0
            keep_versions = [v for v in range(latest + 1)
                             if self._manifest(v).get("ts", 0) >= cutoff]
            keep_versions.append(latest)      # newest always readable
        else:
            # clamp to >=1: read() trusts that the latest version's
            # files always survive vacuum (it skips the per-file
            # existence probe there), so keep_last=0 (reachable via
            # `VACUUM t RETAIN 0 VERSIONS`) must still retain the
            # newest snapshot — mirroring the retain_hours path's
            # "newest always readable" append above
            keep_last = max(1, keep_last)
            keep_versions = list(
                range(max(0, latest - keep_last + 1), latest + 1))
        # catalog refs are retention ROOTS: versions pinned by the
        # latest catalog entry, any tag, or any branch head survive
        # regardless of the window (see _ref_pinned_versions)
        keep_versions.extend(
            v for v in self._ref_pinned_versions() if v <= latest)
        keep_versions = sorted(set(keep_versions))
        keep_dirs: set[str] = set()    # whole dirs (dv/changes/legacy)
        keep_files: set[str] = set()   # root-relative referenced files
        for v in keep_versions:
            m = self._manifest(v)
            files = m.get("files")
            if files is None:          # legacy: whole data dir
                keep_dirs.add(m["data"])
            else:
                for f in files:        # data file + bloom sidecars
                    keep_files.update(_entry_refs(m, f))
            if "dv" in m:      # a readable version needs its vector
                keep_dirs.add(m["dv"])
        ch_from = 0 if keep_changes_last is None \
            else max(0, latest - keep_changes_last + 1)
        for v in range(ch_from, latest + 1):
            mf = self._manifest(v)
            ch = mf.get("changes")
            if ch:
                keep_dirs.add(ch)
            # CDF-by-reference: the commit's change set is its added
            # data files — they must survive snapshot vacuum exactly
            # like recorded change dirs (the feed outlives snapshots)
            keep_files.update(mf.get("changes_ref") or [])
        removed = []
        # EVER-REFERENCED sweep: every file/dir any manifest (retained
        # or not) has ever named. Committed history outside the keep
        # window deletes regardless of age; a path NO manifest knows is
        # either crash garbage or an IN-FLIGHT writer's staging — only
        # deletable past the grace window (never race a live writer).
        ever_files: set[str] = set()
        ever_dirs: set[str] = set()
        for v in range(latest + 1):
            # RAW manifests: the union over versions is v0's list plus
            # every delta's adds — O(distinct files) total, no chain
            # replay per version
            mv = json.loads(
                (self._manifests / f"v{v}.json").read_text())
            for f in (mv.get("files") or []) + (mv.get("files_add")
                                                or []):
                ever_files.update(_entry_refs(mv, f))
            if mv.get("files") is None and "files_base" not in mv:
                ever_dirs.add(mv["data"])
            if "dv" in mv:
                ever_dirs.add(mv["dv"])
            if mv.get("changes"):
                ever_dirs.add(mv["changes"])
        grace_cutoff = time.time() - orphan_grace_s

        def _deletable(p: Path, rel_child: str, rel_dir: str) -> bool:
            if rel_child in ever_files or rel_dir in ever_dirs:
                return True                     # committed history
            try:
                return p.stat().st_mtime < grace_cutoff
            except OSError:
                return True                     # already gone: moot
        # Files are shared across versions by manifest reference, so
        # retention is PER FILE: a commit dir dies only when no kept
        # version references anything inside it (the manifest-list
        # vacuum discipline — never delete a dir a retained snapshot
        # still reads through).
        plan: list[tuple[Path, list[Path], bool, str, int]] = []
        ledger_paths: list[str] = []
        ledger_dirs: list[str] = []
        for d in self._data.iterdir():
            rel = f"data/{d.name}"
            if rel in keep_dirs or not d.is_dir():
                continue
            children = list(d.iterdir())
            victims = [p for p in children
                       if f"{rel}/{p.name}" not in keep_files
                       and _deletable(p, f"{rel}/{p.name}", rel)]
            if not victims:
                continue
            whole = len(victims) == len(children)
            plan.append((d, victims, whole, rel, len(children)))
            ledger_paths.extend(f"{rel}/{p.name}" for p in victims)
            if whole:
                ledger_dirs.append(rel)
        if dry_run:
            # Delta's VACUUM ... DRY RUN: report what WOULD die, touch
            # nothing — no ledger entry, no deletion, no checkpoint
            # pruning (the pre-flight a 100 TB operator runs before
            # committing to a retention change)
            return [rel if whole
                    else f"{rel} ({len(victims)}/{n_children} files)"
                    for _, victims, whole, rel, n_children in plan]
        if plan:
            ledger = self._manifests / "_vacuumed.jsonl"
            if not ledger.exists():
                # SEED the new ledger from one full stat sweep: files a
                # PRE-LEDGER vacuum (old build) already deleted must be
                # members too, or ledger-mode intact checks would call
                # their versions readable. One-time cost at the first
                # ledgered vacuum of a legacy table; the sweep covers
                # every manifest's referenced files + DV/legacy dirs.
                seen: set[str] = set()
                seed_paths: list[str] = []
                seed_dirs: set[str] = set()
                for v in range(latest + 1):
                    mv = self._manifest(v)
                    fv = mv.get("files")
                    if fv is None:
                        d = mv["data"]
                        if d not in seen:
                            seen.add(d)
                            if not (self.path / d).is_dir():
                                seed_dirs.add(d)
                    else:
                        for f in fv:
                            r = _entry_rel(mv, f)
                            if r not in seen:
                                seen.add(r)
                                if not (self.path / r).exists():
                                    seed_paths.append(r)
                    dvd = mv.get("dv")
                    if dvd and dvd not in seen:
                        seen.add(dvd)
                        if not (self.path / dvd).is_dir():
                            seed_dirs.add(dvd)
                for r in seed_paths:
                    d = r.rsplit("/", 1)[0]
                    if not (self.path / d).is_dir():
                        seed_dirs.add(d)
                if seed_paths or seed_dirs:
                    ledger_append(self.path, {
                        "ts": time.time(), "seed": True,
                        "paths": seed_paths,
                        "dirs": sorted(seed_dirs)})
            # WRITE-AHEAD ledger: record what dies BEFORE deleting, so
            # cold reads answer "was this vacuumed?" with membership
            # checks instead of O(files) filesystem stats — and a crash
            # mid-delete still fails loudly, never silently partially.
            # Appends flock the live inode and auto-compact past the
            # record threshold (ledger_append).
            ledger_append(self.path, {
                "ts": time.time(),
                "paths": ledger_paths, "dirs": ledger_dirs})
        # DELETE EXECUTION distributes past a threshold (the
        # pruned_files_eq discipline): a 100k-orphan vacuum on a real
        # table is an executor fan-out of unlinks, not 100k serial
        # driver syscalls; small plans stay driver-side (no job
        # overhead). Dir removal stays on the driver — O(dirs).
        all_victims = [str(p) for _, victims, *_ in plan
                       for p in victims]
        if len(all_victims) > 512 and self.spark is not None:
            def _rm(it):
                import os as _os
                import shutil as _shutil
                from pathlib import Path as _P
                for s in it:
                    p = _P(s)
                    if p.is_dir():
                        _shutil.rmtree(p, ignore_errors=True)
                    else:
                        try:
                            _os.unlink(s)
                        except OSError:
                            pass
                return iter(())
            (self.spark.sparkContext
             .parallelize(all_victims,
                          max(1, min(len(all_victims) // 256, 256)))
             .mapPartitions(_rm).count())
            for d, victims, whole, rel, n_children in plan:
                if whole:
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(rel)
                else:
                    removed.append(
                        f"{rel} ({len(victims)}/{n_children} files)")
        else:
            for d, victims, whole, rel, n_children in plan:
                for p in victims:
                    (shutil.rmtree(p, ignore_errors=True) if p.is_dir()
                     else p.unlink(missing_ok=True))
                if whole:
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(rel)
                else:
                    removed.append(
                        f"{rel} ({len(victims)}/{n_children} files)")
        # STALE STAGING-TEMP sweep: a writer crash between write_text
        # and the publish primitive leaks dotfile temps next to the
        # manifests ('.{name}.{hex}.x' hardlink stages, '.*.stage'
        # rename stages, '._latest.*' pointer stages, '.*.tmp'
        # checkpoint/repair stages) — no manifest ever references
        # them, so the ever-referenced sweep above never sees them.
        # Same grace discipline as data orphans: only delete past the
        # window, never race a live writer mid-publish.
        for p in self._manifests.iterdir():
            if not p.name.startswith("."):
                continue
            if not (p.name.endswith((".x", ".stage", ".tmp"))
                    or p.name.startswith("._latest.")):
                continue
            try:
                if p.stat().st_mtime < grace_cutoff:
                    p.unlink(missing_ok=True)
            except OSError:
                pass
        # checkpoint retention: keep the parquet checkpoints of
        # retained versions plus the NEWEST one at-or-below the oldest
        # retained version (the chain-replay short-circuit for every
        # retained delta manifest); the rest are derived data —
        # dropping one only costs a replay, never correctness
        keep_set = set(keep_versions)
        ck_vs = sorted(int(p.stem[len("ckpt-v"):])
                       for p in self._manifests.glob("ckpt-v*.parquet"))
        floor_candidates = [cv for cv in ck_vs
                            if cv <= min(keep_set, default=0)]
        ck_floor = max(floor_candidates, default=None)
        for cv in ck_vs:
            if cv in keep_set or cv == ck_floor:
                continue
            (self._manifests / f"ckpt-v{cv}.parquet").unlink(
                missing_ok=True)
        return removed

    def merge_add(self, partials: DataFrame, key: list[str],
                  max_retries: int = 20,
                  app_id: str | None = None,
                  batch_id: int | None = None) -> int | None:
        """Incremental-view-maintenance MERGE: non-key columns are
        mergeable partial aggregates (counts / decimal sums) and matched
        rows ADD instead of replacing — the commit that maintains an
        aggregate table under a stream of deltas without ever
        recomputing from the full log.  Same optimistic commit loop, so
        concurrent maintainers serialize and no delta is lost or applied
        twice.

        With ``(app_id, batch_id)`` the commit carries the writer fence
        (the ``append_txn`` discipline): a replayed at-least-once
        micro-batch's partials add NOTHING and the call returns None —
        additive counters from a stream stay exactly-once. (This closes
        the round-13 caveat that made the text index's counter
        maintenance at-most-once-only.) Fence checked at entry against
        the cumulative txns map AND re-checked against each retry
        attempt's manifest inside ``_commit_loop`` (two concurrent
        invocations of the same fenced batch — a zombie run racing its
        restart — can never both commit and double-count); concurrent
        writers with the SAME app_id are otherwise out of contract (a
        streaming query's batches are serial)."""
        txn = None
        if app_id is not None:
            if batch_id is None:
                raise ValueError("merge_add: batch_id is required "
                                 "when app_id is given")
            txn = f"{app_id}#{batch_id}"
            if self._txn_entry_fenced(app_id, batch_id):
                return None              # replayed batch: fenced out

        def build(cur: DataFrame) -> DataFrame:
            val_cols = [c for c in cur.columns if c not in key]
            u = partials.select(*key, *[F.col(c).alias(f"__u_{c}")
                                        for c in val_cols])
            zero = F.lit(0)
            return (cur.join(u, key, "full_outer")
                    .select(*key,
                            *[(F.coalesce(F.col(c), zero)
                               + F.coalesce(F.col(f"__u_{c}"), zero))
                              .cast(dict(cur.dtypes)[c]).alias(c)
                              for c in val_cols]))
        return self._commit_loop(build, "merge_add", max_retries,
                                 txn=txn)

    def merge_add_pruned(self, partials: DataFrame, key: list[str],
                         max_retries: int = 20,
                         app_id: str | None = None,
                         batch_id: int | None = None) -> int | None:
        """``merge_add`` with Delta-style touched-file pruning — the
        IVM counter commit that stays O(touched files) while the
        counter table grows (proper incremental view maintenance
        touches only the delta's groups, never the whole view): the
        find pass is a key-column-only semi-join scan collecting the
        files that share a key with the partials batch; only those
        files full-outer-ADD the partials, every other file is carried
        into the new commit by manifest reference, and partials
        matching NO file insert (a key absent from every touched file
        is by construction absent from the table — merge_pruned's
        argument verbatim). On a key-clustered or key-partitioned
        table (e.g. ``term_df`` bucketed by ``crc32(token)`` like the
        postings layout) a batch's vocabulary touches O(batch-buckets)
        files, not the table: the counter-maintenance cost a
        forever-running text maintainer needs at 100 TB, where the
        vocabulary is ~10^8-10^9 rows and ``merge_add``'s full-outer
        rewrite would pay O(vocabulary) per micro-batch.

        Same contract as ``merge_add`` otherwise: non-key columns are
        additive partials pre-aggregated to ONE row per key, matched
        rows ADD, and with ``(app_id, batch_id)`` the commit carries
        the writer fence — checked at entry and re-checked against
        every retry attempt's manifest inside ``_cow_commit``, so a
        replayed or zombie-raced micro-batch adds nothing (returns
        None). Find-pass pruning rides partition tuples (metadata
        only, sound because pruning is offered only when every
        partition column is part of the key) and, when the batch's
        distinct first-key values fit a capped driver list, per-file
        stats + bloom sidecars."""
        txn = None
        if app_id is not None:
            if batch_id is None:
                raise ValueError("merge_add_pruned: batch_id is "
                                 "required when app_id is given")
            txn = f"{app_id}#{batch_id}"
            if self._txn_entry_fenced(app_id, batch_id):
                return None              # replayed batch: fenced out
        dedup_keys = partials.select(*key).distinct()

        def probe(df: DataFrame) -> DataFrame:
            return df.join(dedup_keys, key, "semi")

        def rewrite(touched: DataFrame) -> DataFrame:
            val_cols = [c for c in touched.columns if c not in key]
            types = dict(touched.dtypes)
            u = partials.select(*key, *[F.col(c).alias(f"__u_{c}")
                                        for c in val_cols])
            zero = F.lit(0)
            return (touched.join(u, key, "full_outer")
                    .select(*key,
                            *[(F.coalesce(F.col(c), zero)
                               + F.coalesce(F.col(f"__u_{c}"), zero))
                              .cast(types[c]).alias(c)
                              for c in val_cols]))
        # ONE bounded collect answers emptiness + partition tuples +
        # the stats/bloom prune values (two separate jobs before)
        _n, part_in, eq_prune = self._batch_prune_signals(
            dedup_keys, key, key[0])
        if _n == 0:
            # empty batch: keep the pruned commit shape (same op name,
            # carries every file, writes the empty insert) — the
            # empty needle list prunes every file by itself
            eq_prune = (key[0], [])
        prune_can_prune = part_in is not None or eq_prune is not None
        if _n != 0 and prune_can_prune:
            # Would the find pass actually SKIP anything? Decide from
            # the manifest + sidecars (driver-side up to 64 candidate
            # files, one parallelize job past that; the result is
            # memoized per version, so when pruning DOES engage the
            # find pass reuses this sweep instead of re-running it):
            # when every live file survives both the partition
            # tuples and the stats/bloom probe — the small-table/
            # wide-batch regime, e.g. a text micro-batch whose
            # vocabulary hashes into all 16 buckets at bench scale;
            # at 100 TB the bucket count is the knob and batches
            # cover a fraction — the pruned shape pays a full-scan
            # find pass ahead of a near-total rewrite, and the
            # one-shot full merge writes the same bytes in one pass
            # (the r16 SCALING rung's scattered row: pruned 3.53 s vs
            # full 2.42 s at 30x for identical MB). Advisory and
            # value-equal on both paths, so a racing commit can't
            # make the choice wrong.
            v = self.latest_version()
            if v is not None:
                m = self._manifest(v)
                files = m.get("files") or []
                eligible = files
                if part_in is not None:
                    eligible = [f for f in eligible if not
                                f.get("partition")
                                or any(_pins_match(f["partition"], p)
                                       for p in part_in)]
                if files and len(eligible) == len(files) \
                        and eq_prune is not None:
                    keep, total = self.pruned_files_in(
                        eq_prune[0], eq_prune[1], v)
                    if len(keep) == total:
                        prune_can_prune = False
                elif files and len(eligible) == len(files):
                    prune_can_prune = False
        if not prune_can_prune:
            # no pruning signal can skip a file: the find pass would
            # be a full scan ahead of a near-total rewrite — the
            # one-shot full-outer merge writes the same bytes in one
            # pass (the r16 SCALING rung's scattered row: pruned
            # 3.53 s vs full 2.42 s at 30x for identical MB). Fence
            # semantics are identical (merge_add re-checks per
            # attempt).
            return self.merge_add(partials, key, max_retries,
                                  app_id=app_id, batch_id=batch_id)
        with self._op_params(merge_key=list(key)):
            # empty_noop=False: an all-inserts batch matches no file
            # but must still write its rows (they fall out of the
            # full-outer join over the empty touched set)
            return self._cow_commit(probe, rewrite, "merge_add_pruned",
                                    max_retries, empty_noop=False,
                                    partition_in=part_in, txn=txn,
                                    eq_any_prune=eq_prune)

    def relayout(self, cols: list[str], target_files: int = 8,
                 max_retries: int = 20) -> int:
        """OPTIMIZE-by-key: rewrite the snapshot range-sorted on ``cols``
        into ``target_files`` files with disjoint extents, as one atomic
        commit — no logical change, but the manifest's per-file stats
        become maximally selective, so ``read_range`` on those columns
        prunes to the matching extent. The table-format answer to a
        B-tree rebuild: cluster once, skip on every read after."""
        with self._op_params(cluster_by=list(cols),
                             target_files=target_files):
            return self._commit_loop(
                lambda cur: (cur.repartitionByRange(target_files, *cols)
                             .sortWithinPartitions(*cols)),
                "relayout", max_retries, order_by=cols)

    def optimize_incremental(self, cols: list[str],
                             target_files: int = 4,
                             max_retries: int = 20,
                             partition_pins: dict | None = None) -> int:
        """Incremental clustering — Delta liquid clustering's OPTIMIZE
        shape: rewrite ONLY the files not already range-clustered on
        ``cols`` (append-born files, COW replacements), carrying every
        clustered file untouched by manifest reference. The candidate
        set is a pure METADATA decision (the ``sort`` provenance each
        relayout/optimize stamps on its entries) — no probe scan. Cost
        is O(unclustered bytes) per run regardless of table size, which
        is the only clustering maintenance shape that survives 100 TB:
        a full ``relayout`` re-writes the table, this re-writes the
        day's arrivals. Extents of successive generations overlap, so
        per-file stats pruning stays correct and merely loses a little
        selectivity vs a full re-cluster (Delta makes the same trade).
        Returns the current version unchanged when everything is
        already clustered (no empty commits)."""
        key = list(cols)
        pins = dict(partition_pins or {})

        def pick(f):
            if pins and not _pins_match(f.get("partition"), pins):
                return False      # out-of-scope partitions untouched
            return f.get("sort") != key
        with self._op_params(cluster_by=key,
                             target_files=target_files,
                             partition_pins=pins or None):
            r = self._rewrite_subset(
                pick,
                lambda df: (df.repartitionByRange(target_files, *key)
                            .sortWithinPartitions(*key)),
                "optimize_incremental", stamp_sort=key,
                max_retries=max_retries)
        if r is None:                       # legacy: no provenance
            return self.relayout(key, target_files, max_retries)
        return r

    _ZBITS = 8           # 2^8 rank buckets per dimension

    def _z_transform(self, cols: list[str], target_files: int):
        """Morton-curve shaper: per-column 256-way width bucket over
        the SUBSET's [min, max] (two driver scalars per column), bits
        round-robin-interleaved across the N dimensions, then one
        range shuffle + in-task sort on the z value. Generations
        bucket by their own extent, so successive incremental passes
        tile independently — overlapping tiles lose a little
        selectivity, never correctness (the stats-pruning trade
        optimize_incremental already documents)."""
        def transform(df: DataFrame) -> DataFrame:
            n = len(cols)
            # interleaved bit positions run to bits*n - 1; keep them
            # off long bit 63 (sign) — Java shift masking would wrap
            # b*n+i >= 64 and corrupt curve ordering silently
            bits = min(self._ZBITS, 63 // n)
            nums = []
            for c in cols:
                dt = df.schema[c].dataType.typeName()
                if dt == "date":
                    nums.append(F.datediff(F.col(c),
                                           F.lit("1970-01-01")))
                elif dt == "timestamp":
                    nums.append(F.unix_timestamp(F.col(c)))
                elif dt in ("byte", "short", "integer", "long",
                            "float", "double", "decimal"):
                    nums.append(F.col(c).cast("double"))
                else:
                    raise ValueError(
                        f"ZORDER BY column {c!r} has non-orderable-"
                        f"numeric type {dt}; use relayout() for "
                        f"lexicographic clustering")
            bounds = df.agg(*[f(x).alias(f"{k}{i}")
                              for i, x in enumerate(nums)
                              for k, f in (("lo", F.min),
                                           ("hi", F.max))]).collect()[0]
            buckets = 1 << bits
            codes = []
            for i, x in enumerate(nums):
                lo = float(bounds[f"lo{i}"] or 0)
                hi = float(bounds[f"hi{i}"] or 0)
                span = (hi - lo) or 1.0
                codes.append(F.least(
                    F.lit(buckets - 1),
                    F.floor((x.cast("double") - F.lit(lo))
                            / F.lit(span) * buckets)).cast("long"))
            z = F.lit(0).cast("long")
            for b in range(bits):
                for i, code in enumerate(codes):
                    z = z + F.shiftleft(
                        F.shiftright(code, b).bitwiseAND(1), b * n + i)
            return (df.withColumn("__z", z)
                    .repartitionByRange(target_files, "__z")
                    .sortWithinPartitions("__z")
                    .drop("__z"))
        return transform

    def zorder(self, cols: list[str], target_files: int = 8,
               max_retries: int = 20,
               partition_pins: dict | None = None) -> int:
        """OPTIMIZE ZORDER BY — Morton-curve clustering with
        INCREMENTAL maintenance built in: files already stamped with
        this curve's provenance are carried untouched by metadata
        alone; only unclustered arrivals (and files clustered on a
        different key set) are rewritten. The first run over an
        unstamped table therefore rewrites everything (the classic
        full ZORDER), and every later run costs O(arrivals) — the
        liquid-clustering maintenance shape, now for 2-D+ curves.
        Returns the current version unchanged when everything is
        already clustered."""
        key = list(cols)
        pins = dict(partition_pins or {})

        def pick(f):
            if pins and not _pins_match(f.get("partition"), pins):
                return False      # out-of-scope partitions untouched
            return f.get("zorder") != key
        with self._op_params(zorder_by=key,
                             target_files=target_files,
                             partition_pins=pins or None):
            r = self._rewrite_subset(
                pick,
                self._z_transform(key, target_files),
                "zorder", stamp_zorder=key,
                max_retries=max_retries)
        if r is None:           # legacy manifest: no per-file metadata
            return self._commit_loop(
                self._z_transform(key, target_files), "zorder",
                max_retries)
        return r

    def set_autocompact(self, max_bytes: int | None = 32 << 20,
                        min_files: int = 16,
                        max_dv_rows: int | None = None,
                        max_retries: int = 20) -> int:
        """Opt into AUTO-compaction (Delta autoCompact): writers that
        honor the hook (``maybe_autocompact`` — the streaming sink and
        the index maintenance loops call it after every batch commit)
        fold files under ``max_bytes`` back together whenever at least
        ``min_files`` of them have accumulated, so a per-batch append
        stream keeps a BOUNDED live-file count instead of one file per
        batch forever. ``max_dv_rows`` adds the MERGE-ON-READ leg: once
        the deletion vector exceeds that many rows, the hook folds it
        away (``materialize_dv`` — O(dv-touched files)), bounding the
        per-scan anti-join tax a retire stream would otherwise grow
        forever (Delta pairs enableDeletionVectors with OPTIMIZE the
        same way). Pass ``max_bytes=None`` to clear. Pure-metadata
        property commit; compaction itself is row-preserving
        (``compact_small``/``materialize_dv``), CDF-silent, and
        carries the writer-fence txns map, so table streams and replay
        fences ride through it untouched."""
        def mutate(props: dict) -> None:
            if max_bytes is None:
                props.pop("autocompact", None)
            else:
                props["autocompact"] = {
                    "max_bytes": int(max_bytes),
                    "min_files": int(min_files),
                    **({"max_dv_rows": int(max_dv_rows)}
                       if max_dv_rows is not None else {})}
        return self._commit_props("set_autocompact", mutate,
                                  max_retries)

    def maybe_autocompact(self,
                          dv_fold_rows: int | None = None
                          ) -> int | None:
        """The auto-compaction HOOK: no-op unless the table opted in
        via ``set_autocompact`` AND the newest manifest already counts
        ``min_files`` files under ``max_bytes`` — both pure manifest
        reads, no data IO on the no-op path. Returns the compaction's
        version when one ran, else None. Called by the acidtable
        streaming sink and the incremental-index maintainers after
        each per-batch commit (Delta autoCompact's
        post-commit-in-the-writer placement).

        ``dv_fold_rows`` is the CALLER-side deletion-vector bound (a
        maintainer's own policy — no table-property commit needed):
        when the live vector exceeds it, the hook folds it away
        (``materialize_dv``, O(dv-touched files)) even on a table
        that never opted into small-file compaction. The table
        property's ``max_dv_rows`` composes (tighter bound wins).
        Without a bound, a retire stream's vector grows per batch and
        EVERY commit re-writes the accumulated sidecar — the
        O(retired²) write the bound exists to prevent."""
        ac = self._props().get("autocompact") or {}
        latest = self.latest_version()
        if latest is None:
            return None
        m = self._manifest(latest)
        # MOR leg first: a deletion vector past the policy bound is a
        # per-SCAN tax (broadcast anti-join on every read), costlier
        # than small-file overhead — fold it away in one O(dv-touched
        # files) pass
        bounds = [b for b in (dv_fold_rows, ac.get("max_dv_rows"))
                  if b is not None]
        if bounds and m.get("dv_rows", 0) > min(bounds):
            return self.materialize_dv()
        if not ac:
            return None
        files = m.get("files")
        if files is None:
            return None
        # count only COMPACTABLE small files: ones whose partition
        # holds >= 2 (compact_small's own candidate rule) — a lone
        # small file per partition must never re-trigger the hook
        # forever
        small_groups: dict = {}
        for f in files:
            if f.get("bytes", 0) < ac["max_bytes"]:
                k = tuple(sorted((f.get("partition") or {}).items()))
                small_groups[k] = small_groups.get(k, 0) + 1
        n_small = sum(c for c in small_groups.values() if c >= 2)
        if n_small < ac["min_files"]:
            return None
        return self.compact_small(max_bytes=ac["max_bytes"],
                                  min_files=ac["min_files"])

    def materialize_dv(self, max_retries: int = 20) -> int | None:
        """Fold the deletion vector away WITHOUT a table rewrite:
        rewrite ONLY the files the vector names (their MOR-dead rows
        drop out), carry every other file by reference — O(dv-touched
        files), the bounded maintenance step that keeps the MOR read
        tax (a broadcast anti-join per scan) from growing forever
        under a retire stream (Delta's OPTIMIZE-rewrites-DV rule,
        scoped to the touched subset). No-op without a vector. A
        concurrent MOR delete landing mid-race may re-introduce
        entries for files this pass carried — they fold on the next
        call (subset materialization is always correct: rewritten
        files drop exactly their own share)."""
        latest = self.latest_version()
        if latest is None:
            return latest
        m = self._manifest(latest, with_files=False)
        if "dv" not in m:
            return latest
        names = {r["file"] for r in self.spark.read.parquet(
            str(self.path / m["dv"])).select("file")
            .distinct().collect()}       # bounded by the file count

        def pick(f) -> bool:
            return _entry_name(f) in names
        r = self._rewrite_subset(pick, lambda df: df,
                                 "materialize_dv",
                                 max_retries=max_retries)
        return self.compact(max_retries=max_retries) if r is None \
            else r

    def set_autovacuum(self, every: int | None = 16,
                       keep_last: int = 4,
                       keep_changes_last: int | None = None,
                       expire_entries_keep: int | None = None,
                       max_retries: int = 20) -> int:
        """Opt into AUTO-vacuum — the retention twin of
        ``set_autocompact``: writers that honor the hook
        (``maybe_autovacuum`` — the streaming sink and the
        incremental-index maintenance loops call it after each
        per-batch commit) run a ref-aware ``vacuum(keep_last=...)``
        every ``every`` commits, so a maintenance loop's on-disk
        footprint stays O(keep window), never O(batches): without it,
        every COW retire strands its replaced files and a 50-batch
        drain leaves 50 commit dirs of history. Cadence is
        VERSION-number based (deterministic, no wall clock), refs
        (latest catalog entry, tags, branch heads) stay retention
        roots, manifests are never deleted (the cumulative txns map —
        every replay fence — rides them), and ``keep_changes_last``
        defaults to None = keep ALL change files, so CDF consumers
        resume across the vacuum untouched. Pass ``every=None`` to
        clear.

        ``expire_entries_keep=N`` extends the same cadence to the
        owning CATALOG's entry ledger when the table is
        catalog-managed: each hook-run also calls
        ``AcidCatalog.expire_entries(keep_last=N)``, so a
        one-publish-per-micro-batch maintainer leaves O(N + refs)
        catalog files instead of O(batches) (tags/branch bases stay
        retention roots — see expire_entries). Ignored on tables
        outside a catalog."""
        if every is not None and every < 1:
            raise ValueError("set_autovacuum: every >= 1")
        # validate NOW, not at hook time: a bad value committed here
        # would otherwise raise from expire_entries inside EVERY later
        # maybe_autovacuum call — after the vacuum ran but before the
        # watermark marker landed, so each batch re-vacuums and
        # re-raises (r16 review finding)
        if expire_entries_keep is not None and expire_entries_keep < 1:
            raise ValueError("set_autovacuum: expire_entries_keep >= 1")

        def mutate(props: dict) -> None:
            if every is None:
                props.pop("autovacuum", None)
            else:
                props["autovacuum"] = {
                    "every": int(every),
                    "keep_last": int(keep_last),
                    **({"keep_changes_last": int(keep_changes_last)}
                       if keep_changes_last is not None else {}),
                    **({"expire_entries_keep": int(expire_entries_keep)}
                       if expire_entries_keep is not None else {})}
        return self._commit_props("set_autovacuum", mutate,
                                  max_retries)

    def _commit_props(self, op: str, mutate,
                      max_retries: int = 20) -> int:
        """Optimistic PROPERTY commit shared by the maintenance knobs
        (set_autocompact/set_autovacuum): ``mutate(props)`` edits a
        copy of the live props; the commit carries the snapshot's
        files/vector untouched and records an EMPTY change set on CDF
        tables (property commits are row-preserving, so the change
        feed keeps serving across them after snapshot vacuum)."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            props = dict(self._props())
            mutate(props)
            # property commits record an EMPTY change set by reference
            # (changes_ref=[]) — a maintenance loop's per-cadence props
            # commit otherwise paid a whole Spark write of an empty
            # parquet dir
            if self._try_commit(v + 1, m["data"], m["schema"], op,
                                props=props,
                                changes_ref=([] if self.cdf_enabled()
                                             else None),
                                files=m.get("files"),
                                dv_rel=m.get("dv"),
                                dv_rows=m.get("dv_rows", 0)):
                return v + 1
        raise CommitConflict(
            f"gave up on {op} after {max_retries} races")

    def maybe_autovacuum(self) -> list[str] | None:
        """The auto-vacuum HOOK: no-op unless the table opted in via
        ``set_autovacuum`` AND at least ``every`` versions landed
        since the last hook-run (a WATERMARK in
        ``manifests/_autovacuum_at``, not an exact-multiple test — a
        loop committing a stride > 1 per batch would step OVER every
        multiple and never vacuum; r15 review finding). One
        manifest-props read + one marker read on the no-op path, zero
        data IO. Returns vacuum's removed list when one ran, else
        None. The marker is derived state: losing it merely re-fires
        the next hook. Best-effort by placement (callers invoke it
        AFTER their batch commit is durable); Spark-free, so the
        SparkSession-less acidtable sink can call it too (vacuum
        distributes unlink fan-out only when a session exists)."""
        av = self._props().get("autovacuum")
        if not av:
            return None
        v = self.latest_version()
        if not v:
            return None
        marker = self._manifests / "_autovacuum_at"
        try:
            last = int(marker.read_text())
        except (OSError, ValueError):
            last = 0
        if v - last < int(av["every"]):
            return None
        out = self.vacuum(keep_last=int(av["keep_last"]),
                          keep_changes_last=av.get("keep_changes_last"))
        ek = av.get("expire_entries_keep")
        if ek is not None:
            # catalog-entry retention rides the same cadence: pure
            # JSON-file work (no SparkSession needed — the sink's
            # Spark-free call path stays valid), auto-discovered from
            # the table's location like _ref_pinned_versions
            parent, croot = self.path.parent, self.path.parent.parent
            if parent.name == "tables" and (croot / "commits").is_dir():
                from .acid_catalog import AcidCatalog
                try:
                    AcidCatalog(self.spark, croot).expire_entries(
                        keep_last=int(ek))
                except OSError:
                    # retention is hygiene, not correctness: a
                    # transient IO failure (e.g. the floor-marker
                    # write) must not fail the maintainer's batch or
                    # wedge the hook mid-way between vacuum and the
                    # watermark marker — the next cadence retries
                    pass
        try:
            marker.write_text(str(v))
        except OSError:
            pass                     # derived state: next hook refires
        return out

    def compact_small(self, max_bytes: int = 32 << 20,
                      target_files: int = 1, min_files: int = 2,
                      max_retries: int = 20) -> int:
        """Small-file compaction — Delta auto-compaction's primitive
        (``minFileSize``/``minNumFiles``): rewrite ONLY files under
        ``max_bytes`` (a pure manifest decision off recorded sizes),
        carrying every full-size file by reference. The steady-state
        answer to streaming-sink small-file pressure: maintenance cost
        is O(small files), never O(table), so it can run at every few
        commits instead of as a rare whole-table OPTIMIZE. Fewer than
        ``min_files`` candidates is a no-op without a commit.

        On a PARTITIONED table a small file is a candidate only when
        its partition holds >= 2 of them: the rewrite lands one file
        per partition, so folding a lone small file makes no progress
        — and a maintenance loop calling this every batch would
        otherwise re-rewrite the same lone files forever. The group
        counts are recomputed from EACH retry attempt's manifest
        (``prepare``), so a lost race never selects off a stale count
        — no no-progress lone-file rewrites, no newly-eligible groups
        skipped (ADVICE r14)."""
        groups: dict = {}

        def prepare(files: list[dict]) -> None:
            groups.clear()
            for f in files:
                if f.get("bytes", 0) < max_bytes:
                    k = tuple(sorted((f.get("partition") or {})
                                     .items()))
                    groups[k] = groups.get(k, 0) + 1

        def pick(f) -> bool:
            if f.get("bytes", 0) >= max_bytes:
                return False
            k = tuple(sorted((f.get("partition") or {}).items()))
            return groups.get(k, 0) >= 2
        r = self._rewrite_subset(
            pick,
            lambda df: df.coalesce(target_files),
            "compact_small", min_stale=min_files,
            max_retries=max_retries, prepare=prepare)
        if r is None:                       # legacy: no per-file sizes
            return self.compact(target_files, max_retries)
        return r

    def _rewrite_subset(self, pick, transform, op: str,
                        stamp_sort: list[str] | None = None,
                        stamp_zorder: list[str] | None = None,
                        min_stale: int = 1,
                        max_retries: int = 20,
                        prepare=None) -> int | None:
        """Partial-rewrite commit shared by ``optimize_incremental``
        and ``compact_small``: rewrite ONLY the entries ``pick``
        selects (a metadata-only decision — no probe scan), carry the
        rest by reference; rewritten files materialize their deletion-
        vector share, carried files keep their entries; CDF records an
        empty change set (row-preserving op). Returns None on a legacy
        manifest (caller falls back to the whole-table path), the
        current version when there is nothing to do (no empty
        commits). ``prepare(files)`` runs before ``pick`` on EACH
        attempt, so a predicate that depends on cross-file state
        (compact_small's per-partition group counts) tracks the
        snapshot being rewritten, never a pre-race one."""
        for _ in range(max_retries):
            v, cur = self.snapshot()
            m = self._manifest(v)
            files = m.get("files")
            if files is None:
                return None
            if prepare is not None:
                prepare(files)
            stale = [f for f in files if pick(f)]
            if len(stale) < min_stale:
                self.last_optimize_stats = {"files_rewritten": 0,
                                            "files_carried": len(files)}
                return v
            keep = [f for f in files if not pick(f)]
            schema = StructType.fromJson(m["schema"])
            scols = [f.name for f in schema.fields]
            tg = self._tagged_physical_scan(
                m, schema,
                [str(self.path / _entry_rel(m, f)) for f in stale])
            if "dv" in m:
                # rewritten files materialize their share of the vector
                tg = self._apply_dv(tg, m)
            out = transform(tg.select(*scols))
            rel, new_stats = self._write_data_full(out,
                                                   order_by=stamp_sort)
            if stamp_zorder:
                # curve provenance (the liquid ZCube analog for Morton
                # layouts): the next zorder() skips these by metadata
                for e in new_stats:
                    e["zorder"] = list(stamp_zorder)
            new_stats = [f if "/" in f["path"]
                         else {**f, "path": f"{rel}/{f['path']}"}
                         for f in new_stats]
            carried = [{**f, "path": _entry_rel(m, f)} for f in keep]
            dv_rel, dv_rows = None, 0
            if "dv" in m:
                live = (self.spark.read
                        .parquet(str(self.path / m["dv"]))
                        .filter(F.col("file").isin(
                            [_entry_name(f) for f in keep])))
                dv_rows = live.count()
                if dv_rows:
                    dv_rel = f"data/dv-{uuid.uuid4().hex}"
                    live.coalesce(1).write.parquet(
                        str(self.path / dv_rel))
            self.last_optimize_stats = {"files_rewritten": len(stale),
                                        "files_carried": len(keep)}
            # row-preserving layout op: recorded empty set, no write
            if self._try_commit(v + 1, rel, m["schema"], op,
                                changes_ref=([] if self.cdf_enabled()
                                             else None),
                                files=carried + new_stats,
                                dv_rel=dv_rel, dv_rows=dv_rows):
                return v + 1
            shutil.rmtree(self.path / rel, ignore_errors=True)
            if dv_rel:
                shutil.rmtree(self.path / dv_rel, ignore_errors=True)
        raise CommitConflict(
            f"gave up after {max_retries} conflicted commits at {self.path}")

    def append_evolve(self, rows: DataFrame, max_retries: int = 20) -> int:
        rows = self._materialize_generated(rows)
        return self._append_evolve_inner(rows, max_retries)

    def _append_evolve_inner(self, rows: DataFrame,
                             max_retries: int = 20) -> int:
        """Schema-evolving append: columns new to ``rows`` widen the table
        schema (existing rows read NULL there), columns missing from
        ``rows`` null-fill — the mergeSchema contract, but transactional:
        the widened schema rides the new manifest, so concurrent readers
        of older versions keep their own (narrower) schema and time
        travel preserves what each version actually looked like."""
        def build(cur: DataFrame) -> DataFrame:
            cur_t, new_t = dict(cur.dtypes), dict(rows.dtypes)
            # A column present on BOTH sides must agree on type: letting it
            # fall through to unionByName would silently widen the table
            # schema (int -> bigint) or die with an opaque Spark error.
            conflicts = {c: (cur_t[c], new_t[c]) for c in new_t
                         if c in cur_t and cur_t[c] != new_t[c]}
            if conflicts:
                detail = ", ".join(f"{c}: table={a} vs rows={b}"
                                   for c, (a, b) in sorted(conflicts.items()))
                raise TypeError(
                    f"append_evolve schema conflict at {self.path} — shared "
                    f"column(s) change type ({detail}); cast the incoming "
                    f"rows explicitly to evolve a column's type")
            wide_cur = cur
            for c in rows.columns:
                if c not in cur_t:
                    wide_cur = wide_cur.withColumn(
                        c, F.lit(None).cast(new_t[c]))
            wide_new = rows
            for c in cur.columns:
                if c not in new_t:
                    wide_new = wide_new.withColumn(
                        c, F.lit(None).cast(cur_t[c]))
            return wide_cur.unionByName(wide_new.select(wide_cur.columns))
        return self._commit_loop(build, "append_evolve", max_retries)

    def compact(self, target_files: int = 1, max_retries: int = 20) -> int:
        """OPTIMIZE: rewrite the current snapshot into ``target_files``
        data files as one atomic commit — no logical change, so readers
        on any version see identical rows; small-file pressure from many
        incremental commits resets without blocking writers (a conflicting
        writer just wins the version and the compaction retries on top)."""
        with self._op_params(target_files=target_files):
            return self._commit_loop(
                lambda cur: cur.coalesce(target_files), "compact",
                max_retries)
