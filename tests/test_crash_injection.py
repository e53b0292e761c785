"""Crash-point fault injection over the ACID commit protocol.

The commit path stages data files, bloom sidecars, change files, and
deletion vectors BEFORE the manifest fence; the design claims (argued
individually in round 10, reasoned-not-injected until now) are:

* a reader never sees a torn version — everything staged before the
  fence is invisible until the manifest lands, and a manifest that
  landed is complete;
* ``vacuum(orphan_grace_s=0)`` reclaims every orphan a dead writer
  left behind;
* a retried writer completes normally on top of the crash debris;
* the catalog never exposes committed-but-unpinned table versions
  (reference analog: the transactional claim fence,
  FileWorkerApp.scala:207-227).

This test makes each claim an injected fact: a SUBPROCESS writer with
``SPARK_GRAFT_CRASH_POINT=<point>`` dies by real SIGKILL (no excepts,
no ``finally`` cleanup — see storage.crash_point) at every stage
boundary, parametrized over BOTH FileStores, and the parent asserts
the invariants on the survivor state.
"""
import json
import os
import signal
import subprocess
import sys
from pathlib import Path

import pytest

# subprocess JVM per case: the slow tier (see pytest.ini)
pytestmark = pytest.mark.slow

from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.acid_catalog import AcidCatalog

REPO = str(Path(__file__).resolve().parents[1])

WRITER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
os.environ["SPARK_GRAFT_FILESTORE"] = {store!r}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.acid_catalog import AcidCatalog
op = {op!r}
if op == "append":
    t = AcidTable(spark, {root!r})
    t.append(spark.createDataFrame(
        [(100 + i, f"new{{i}}") for i in range(5)], "k long, s string"))
elif op == "delete_mor":
    t = AcidTable(spark, {root!r})
    t.delete_where_mor("k >= 8")
elif op == "commit_multi":
    cat = AcidCatalog(spark, {root!r})
    cat.commit_multi({{
        "a": ("append", spark.createDataFrame(
            [(200, "txa")], "k long, s string")),
        "b": ("append", spark.createDataFrame(
            [(300, "txb")], "k long, s string")),
    }})
print("COMMIT-COMPLETED", flush=True)
"""

# (crash point, op, commit lands?)
POINTS = [
    ("after_stage_data", "append", False),
    ("after_bloom_sidecars", "append", False),
    ("after_change_files", "append", False),
    ("before_manifest_fence", "append", False),
    ("after_manifest_fence", "append", True),
    ("after_dv_sidecar", "delete_mor", False),
]


def _run_writer(point, store, root, op):
    script = WRITER.format(repo=REPO, point=point, store=store,
                           root=str(root), op=op)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, (
        f"writer was expected to die at {point}, got rc="
        f"{proc.returncode}\n{proc.stderr[-2000:]}")
    assert "COMMIT-COMPLETED" not in proc.stdout
    return proc


def _data_listing(root: Path) -> set[str]:
    return {str(p.relative_to(root))
            for p in (root / "data").rglob("*") if p.is_file()}


def _referenced(root: Path) -> set[str]:
    """Every root-relative path any RETAINABLE manifest references
    (data files + bloom sidecars + dv dirs + change dirs)."""
    from spark_streaming_apps_spark.acid import (_entry_refs,
                                                 resolve_manifest_files)
    refs: set[str] = set()
    for mp in sorted((root / "manifests").glob("v*.json")):
        m = json.loads(mp.read_text())
        for f in resolve_manifest_files(root, m) or []:
            refs.update(_entry_refs(m, f))
        for key in ("dv", "changes"):
            d = m.get(key)
            if d:
                refs.update(str(p.relative_to(root))
                            for p in (root / d).rglob("*")
                            if p.is_file())
    return refs


@pytest.mark.parametrize("store", ["posix", "rename"])
@pytest.mark.parametrize("point,op,lands", POINTS,
                         ids=[p for p, _, _ in POINTS])
def test_writer_crash_leaves_consistent_table(spark, tmp_path, store,
                                              point, op, lands):
    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root,
        spark.createDataFrame([(i, f"s{i}") for i in range(10)],
                              "k long, s string"),
        enable_cdf=True, enable_dv=True, bloom_by=["s"])
    t.append(spark.createDataFrame([(10, "s10")], "k long, s string"))
    v_before = t.latest_version()
    rows_before = {(r.k, r.s) for r in t.read().collect()}
    listing_before = _data_listing(root)

    _run_writer(point, store, root, op)

    # 1. the reader never sees a torn version
    t2 = AcidTable(spark, root)           # fresh handle: no warm caches
    v_after = t2.latest_version()
    if not lands:
        assert v_after == v_before, f"torn version visible at {point}"
        assert {(r.k, r.s) for r in t2.read().collect()} == rows_before
    else:
        # the fence landed before the crash: the commit is COMPLETE
        # (all 5 rows) even though hint/checkpoint staging died
        assert v_after == v_before + 1
        got = {(r.k, r.s) for r in t2.read().collect()}
        assert got == rows_before | {(100 + i, f"new{i}")
                                     for i in range(5)}

    # 2. vacuum with zero grace reclaims every orphan the dead writer
    # staged (data, sidecars, change files, dv) and nothing referenced
    t2.vacuum(keep_last=1, keep_changes_last=1, orphan_grace_s=0.0)
    leftover = _data_listing(root) - _referenced(root)
    orphans = leftover & (  # staged-then-crashed debris only
        _data_listing(root) - listing_before)
    assert not orphans, f"unreclaimed crash debris at {point}: {orphans}"

    # 3. a retried writer completes on top of the debris
    t3 = AcidTable(spark, root)
    if op == "append":
        t3.append(spark.createDataFrame([(500, "retry")],
                                        "k long, s string"))
        assert (500, "retry") in {(r.k, r.s) for r in t3.read().collect()}
    else:
        t3.delete_where_mor("k >= 8")
        assert {r.k for r in t3.read().collect()} == set(range(8))


@pytest.mark.parametrize("store", ["posix", "rename"])
def test_catalog_never_exposes_unpinned_versions(spark, tmp_path, store):
    """Crash between the per-table commits and the catalog pin: the
    table versions are durable but UNPINNED — catalog readers must
    keep serving the previous entry in full, and the next successful
    publish exposes a consistent (max-merged) snapshot."""
    croot = tmp_path / "cat"
    cat = AcidCatalog(spark, croot)
    cat.create_table("a", spark.createDataFrame([(1, "a1")],
                                                "k long, s string"))
    cat.create_table("b", spark.createDataFrame([(2, "b1")],
                                                "k long, s string"))
    entry_before = cat.latest_entry()
    pins_before = cat.snapshot()

    _run_writer("before_catalog_pin", store, croot, "commit_multi")

    cat2 = AcidCatalog(spark, croot)
    # both tables advanced durably...
    assert cat2.table("a").latest_version() > pins_before["a"]
    assert cat2.table("b").latest_version() > pins_before["b"]
    # ...but the catalog exposes NONE of it: same entry, same pins,
    # same rows
    assert cat2.latest_entry() == entry_before
    assert cat2.snapshot() == pins_before
    assert {r.k for r in cat2.read("a").collect()} == {1}
    assert {r.k for r in cat2.read("b").collect()} == {2}

    # a retried transaction publishes; the new entry pins max versions,
    # so the crashed txn's durable commits become visible ATOMICALLY
    # with it — all-or-none per entry, never a half-exposed txn.
    # (writers needing exactly-once across the crash use append_txn's
    # per-table batch fence; commit_multi is at-least-once by design)
    cat2.commit_multi({
        "a": ("append", spark.createDataFrame([(9, "a2")],
                                              "k long, s string")),
        "b": ("append", spark.createDataFrame([(9, "b2")],
                                              "k long, s string"))})
    assert {r.k for r in cat2.read("a").collect()} == {1, 200, 9}
    assert {r.k for r in cat2.read("b").collect()} == {2, 300, 9}


@pytest.mark.parametrize("point,op,lands", [
    ("before_manifest_fence", "append", False),
    ("after_manifest_fence", "append", True),
], ids=["before_fence", "after_fence"])
def test_writer_crash_under_faulty_object_store(spark, tmp_path,
                                                point, op, lands):
    """Composition of the crash harness with the object-store double:
    the fence-adjacent crash invariants hold when the fence is a
    conditional PUT with injected transients and copy-only sharing."""
    test_writer_crash_leaves_consistent_table(
        spark, tmp_path, "faulty", point, op, lands)


SINK_WRITER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
os.environ["SPARK_GRAFT_FILESTORE"] = {store!r}
import pyarrow as pa
from spark_streaming_apps_spark.sources.pysource import AcidStreamWriter
w = AcidStreamWriter({root!r}, [("k", pa.int64()), ("s", pa.string())],
                     "crash-sink")
msg = w.write(iter([(100 + j, f"new{{j}}") for j in range(5)]))
w.commit([msg], 0)
print("COMMIT-COMPLETED", flush=True)
"""

SINK_POINTS = [
    ("sink_after_link", False),
    ("sink_before_fence", False),
    ("sink_after_fence", True),
]


@pytest.mark.parametrize("store", ["posix", "rename", "faulty"])
@pytest.mark.parametrize("point,lands", SINK_POINTS,
                         ids=[p for p, _ in SINK_POINTS])
def test_sink_writer_crash(spark, tmp_path, store, point, lands):
    """The SparkSession-free streaming sink shares the fence but has
    its OWN staging sequence (stage dir -> linked commit dir -> change
    files -> manifest CAS) — same invariants, subprocess cost ~1 s."""
    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root,
        spark.createDataFrame([(i, f"s{i}") for i in range(10)],
                              "k long, s string"), enable_cdf=True)
    v_before = t.latest_version()
    rows_before = {(r.k, r.s) for r in t.read().collect()}
    listing_before = _data_listing(root)

    script = SINK_WRITER.format(repo=REPO, point=point, store=store,
                                root=str(root))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-1500:]
    assert "COMMIT-COMPLETED" not in proc.stdout

    t2 = AcidTable(spark, root)
    if not lands:
        assert t2.latest_version() == v_before
        assert {(r.k, r.s) for r in t2.read().collect()} == rows_before
    else:
        assert t2.latest_version() == v_before + 1
        got = {(r.k, r.s) for r in t2.read().collect()}
        assert got == rows_before | {(100 + j, f"new{j}")
                                     for j in range(5)}
        # the CDF record landed with the fence, not after it
        ch = t2.read_changes(v_before, v_before + 1)
        assert ch.filter("_change_type = 'insert'").count() == 5

    t2.vacuum(keep_last=1, keep_changes_last=1, orphan_grace_s=0.0)
    orphans = (_data_listing(root) - _referenced(root)) & (
        _data_listing(root) - listing_before)
    assert not orphans, orphans
    # a retried sink writer completes (fresh app id: the crashed batch
    # never fenced, so at-least-once redelivery is the contract)
    import pyarrow as pa
    from spark_streaming_apps_spark.sources.pysource import (
        AcidSinkMessage, AcidStreamWriter)
    w = AcidStreamWriter(str(root), [("k", pa.int64()),
                                     ("s", pa.string())], "retry-app")
    msg = w.write(iter([(500, "retry")]))
    w.commit([msg], 0)
    assert (500, "retry") in {(r.k, r.s)
                              for r in AcidTable(spark, root)
                              .read().collect()}


RETRY_SINK_WRITER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = "sink_retry_after_parent_reread"
import pyarrow as pa
from spark_streaming_apps_spark.storage import FaultyFileStore, set_store
from spark_streaming_apps_spark.sources.pysource import AcidStreamWriter

APP = "crash-sink"

class RacingStore(FaultyFileStore):
    '''FaultyFileStore (lost-response/etag semantics + injected 503s
    intact) whose FIRST manifest create_exclusive is won by a
    synthetic competitor: a row-neutral carry-only manifest derived
    from the loser's own attempt (our staged adds and txn fence
    stripped), written under the contended name. The sink must then
    re-enter its CAS loop — where the planted kill point fires.'''
    def __init__(self):
        super().__init__(fail_every=5)
        self.raced = False
    def create_exclusive(self, path, data):
        p = str(path)
        if not self.raced and "manifests" in p and "/v" in p \
                and p.endswith(".json"):
            self.raced = True
            comp = json.loads(data)
            comp["op"] = "competitor_noop"
            comp["txns"] = {{k: v for k, v in
                             (comp.get("txns") or {{}}).items()
                             if k != APP}}
            comp.pop("txn", None)
            comp.pop("changes", None)
            comp.pop("changes_ref", None)
            if "files" in comp:
                comp["files"] = [f for f in comp["files"]
                                 if not f["path"].startswith(
                                     comp["data"])]
            else:
                comp["files_add"] = []
                comp["files_remove"] = []
            assert super().create_exclusive(path, json.dumps(comp))
            return False                     # the loser's view
        return super().create_exclusive(path, data)

set_store(RacingStore())
w = AcidStreamWriter({root!r}, [("k", pa.int64()), ("s", pa.string())],
                     APP)
msg = w.write(iter([(100 + j, f"new{{j}}") for j in range(5)]))
w.commit([msg], 0)
print("COMMIT-COMPLETED", flush=True)
"""


def test_sink_crash_inside_cas_retry_loop(spark, tmp_path):
    """Round-13 point: SIGKILL INSIDE the sink's CAS retry loop —
    after losing a manifest race (FaultyFileStore lost-response mode:
    the competitor's PUT stands, ours resolved as a loss), re-reading
    the winner's parent, and dying before our own create_exclusive.
    The winner's commit must be the table's head, the crashed batch
    stays unfenced, vacuum sweeps the loser's staging, and a retried
    sink delivers the batch exactly once on top."""
    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root,
        spark.createDataFrame([(i, f"s{i}") for i in range(10)],
                              "k long, s string"))
    v0 = t.latest_version()
    rows0 = {(r.k, r.s) for r in t.read().collect()}

    script = RETRY_SINK_WRITER.format(repo=REPO, root=str(root))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    assert "COMMIT-COMPLETED" not in proc.stdout

    t2 = AcidTable(spark, root)
    # the competitor's carry-only commit IS the head; no batch rows
    assert t2.latest_version() == v0 + 1
    assert t2._manifest(v0 + 1)["op"] == "competitor_noop"
    assert {(r.k, r.s) for r in t2.read().collect()} == rows0
    # the crashed batch never fenced
    assert "crash-sink" not in (t2._manifest(v0 + 1).get("txns") or {})

    # loser staging is crash garbage: vacuum past the grace sweeps it
    t2.vacuum(keep_last=2, orphan_grace_s=0.0)
    orphans = _data_listing(root) - _referenced(root)
    assert not orphans, orphans

    # redelivery lands exactly once
    import pyarrow as pa
    from spark_streaming_apps_spark.sources.pysource import \
        AcidStreamWriter
    w = AcidStreamWriter(str(root), [("k", pa.int64()),
                                     ("s", pa.string())], "crash-sink")
    msg = w.write(iter([(100 + j, f"new{j}") for j in range(5)]))
    w.commit([msg], 0)
    got = {(r.k, r.s) for r in AcidTable(spark, root).read().collect()}
    assert got == rows0 | {(100 + j, f"new{j}") for j in range(5)}
    # a REPLAY of the same batch is fenced to a no-op
    w2 = AcidStreamWriter(str(root), [("k", pa.int64()),
                                      ("s", pa.string())], "crash-sink")
    msg2 = w2.write(iter([(100 + j, f"new{j}") for j in range(5)]))
    w2.commit([msg2], 0)
    assert AcidTable(spark, root).latest_version() == v0 + 2


# ------------------------------------------------- round-15 commit kinds

R15_WRITER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
os.environ["SPARK_GRAFT_FILESTORE"] = {store!r}
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
from spark_streaming_apps_spark.acid import AcidTable
t = AcidTable(spark, {root!r})
op = {op!r}
if op == "apply_cdf_mor":
    ch = (spark.createDataFrame([(0,), (1,), (2,)], "k long")
          .join(t.read(), "k").withColumn("_change_type",
                                          F.lit("delete"))
          .unionByName(spark.createDataFrame(
              [(700 + i, f"n{{i}}") for i in range(3)],
              "k long, s string").withColumn("_change_type",
                                             F.lit("insert"))))
    t.apply_cdf(ch, ["k"], app_id="m", batch_id=9)
elif op == "delete_semi":
    keys = spark.createDataFrame([(2,), (8,)], "kk long")
    t.delete_semi(keys, on=[["k"]], app_id="ds", batch_id=4)
elif op == "materialize_dv":
    t.materialize_dv()
print("COMMIT-COMPLETED", flush=True)
"""

#: (crash point, op, commit lands?) — the round-15 commit kinds join
#: the SIGKILL suite: the MOR retire (apply_cdf on a DV table), the
#: OR-of-keys retire (delete_semi, MOR path), and the vector fold
#: (materialize_dv).
R15_POINTS = [
    ("after_dv_sidecar", "apply_cdf_mor", False),
    ("before_manifest_fence", "apply_cdf_mor", False),
    ("after_manifest_fence", "apply_cdf_mor", True),
    ("after_dv_sidecar", "delete_semi", False),
    ("after_manifest_fence", "delete_semi", True),
    ("before_manifest_fence", "materialize_dv", False),
    ("after_manifest_fence", "materialize_dv", True),
]


def _run_r15_writer(point, store, root, op):
    script = R15_WRITER.format(repo=REPO, point=point, store=store,
                               root=str(root), op=op)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, (
        f"writer was expected to die at {point}, got rc="
        f"{proc.returncode}\n{proc.stderr[-2000:]}")
    assert "COMMIT-COMPLETED" not in proc.stdout
    return proc


@pytest.mark.parametrize("point,op,lands", R15_POINTS,
                         ids=[f"{o}-{p}" for p, o, _ in R15_POINTS])
def test_r15_writer_crash_exactly_once(spark, tmp_path, point, op,
                                       lands):
    """SIGKILL at each stage boundary of the round-15 commit kinds:
    no torn version, zero-grace vacuum reclaims the debris, and the
    FENCED ops stay exactly-once across the crash — a redelivered
    batch either applies once (crash before the fence) or commits
    nothing (crash after it)."""
    import pyspark.sql.functions as F

    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root,
        spark.createDataFrame([(i, f"s{i}") for i in range(10)],
                              "k long, s string"),
        enable_cdf=True, enable_dv=True, bloom_by=["s"])
    t.append(spark.createDataFrame([(10, "s10")], "k long, s string"))
    if op == "materialize_dv":
        t.delete_where_mor("k >= 8")        # seed a live vector
    v_before = t.latest_version()
    rows_before = {(r.k, r.s) for r in t.read().collect()}
    listing_before = _data_listing(root)

    _run_r15_writer(point, "posix", root, op)

    t2 = AcidTable(spark, root)
    v_after = t2.latest_version()
    if not lands:
        assert v_after == v_before, f"torn version visible at {point}"
        assert {(r.k, r.s) for r in t2.read().collect()} == rows_before
    else:
        assert v_after == v_before + 1

    # zero-grace vacuum reclaims every byte the dead writer staged
    t2.vacuum(keep_last=1, keep_changes_last=1, orphan_grace_s=0.0)
    leftover = _data_listing(root) - _referenced(root)
    orphans = leftover & (_data_listing(root) - listing_before)
    assert not orphans, f"unreclaimed crash debris at {point}: {orphans}"

    # redelivery after the crash: exactly-once end state either way
    t3 = AcidTable(spark, root)
    if op == "apply_cdf_mor":
        ch = (spark.createDataFrame([(0,), (1,), (2,)], "k long")
              .join(t3.read(), "k")
              .withColumn("_change_type", F.lit("delete"))
              .unionByName(spark.createDataFrame(
                  [(700 + i, f"n{i}") for i in range(3)],
                  "k long, s string")
                  .withColumn("_change_type", F.lit("insert"))))
        r = t3.apply_cdf(ch, ["k"], app_id="m", batch_id=9)
        assert (r is None) == lands        # landed commit fences out
        got = {(r2.k, r2.s) for r2 in t3.read().collect()}
        want = ({(k, s) for k, s in rows_before if k > 2}
                | {(700 + i, f"n{i}") for i in range(3)})
        assert got == want
        # a second redelivery is ALWAYS fenced
        assert t3.apply_cdf(ch, ["k"], app_id="m", batch_id=9) is None
    elif op == "delete_semi":
        keys = spark.createDataFrame([(2,), (8,)], "kk long")
        r = t3.delete_semi(keys, on=[["k"]], app_id="ds", batch_id=4)
        assert (r is None) == lands
        got = {r2.k for r2 in t3.read().collect()}
        assert got == {k for k, _ in rows_before} - {2, 8}
        assert t3.delete_semi(keys, on=[["k"]],
                              app_id="ds", batch_id=4) is None
    else:                                   # materialize_dv
        t3.materialize_dv()
        m = t3._manifest(t3.latest_version(), with_files=False)
        assert "dv" not in m               # vector folded away
        assert {(r2.k, r2.s) for r2 in t3.read().collect()} \
            == rows_before                 # row-preserving
