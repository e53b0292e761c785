"""Round-16 IVM-merge scale fixes (the r15 verdict's shared root
cause: full-table-rewrite merges inside forever-running maintenance
loops):

- ``AcidTable.merge_add_pruned``: the additive counter merge with
  Delta's touched-file discipline — a batch's partials rewrite only
  the files holding a batch key (partition- and bloom-pruned find
  pass), every other file is carried by manifest reference, inserts
  fall out of the same full-outer join; commit cost O(touched files),
  never O(counter table). Fenced twin re-checks the (app_id,
  batch_id) fence per retry attempt (the zombie-race discipline).
- The dedup stream's ``pairs`` results surface becomes an append-only
  fenced log (each pair is detected by exactly one batch), replacing
  the O(accumulated-results) full-outer MERGE per micro-batch.
"""
import json
import signal
import subprocess
import sys
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.acid_catalog import AcidCatalog

REPO = str(Path(__file__).resolve().parents[1])


def _counters(spark, rows):
    return spark.createDataFrame(rows, "k long, n long")


def _state(t):
    return {r.k: r.n for r in t.read().collect()}


# ----------------------------------------------------- value semantics


def test_merge_add_pruned_equals_merge_add(spark, tmp_path):
    """Same partials through merge_add and merge_add_pruned land the
    same state: matched keys ADD, unmatched keys INSERT, untouched
    keys carry."""
    base = [(i, i * 10) for i in range(20)]
    batch = [(3, 5), (7, -2), (100, 1), (101, -4)]
    a = AcidTable.create(spark, tmp_path / "a", _counters(spark, base))
    b = AcidTable.create(spark, tmp_path / "b", _counters(spark, base))
    a.merge_add(_counters(spark, batch), ["k"])
    b.merge_add_pruned(_counters(spark, batch), ["k"])
    assert _state(a) == _state(b)
    assert _state(b)[3] == 35 and _state(b)[100] == 1
    assert _state(b)[101] == -4                 # signed insert kept


def test_merge_add_pruned_rewrites_touched_files_only(spark, tmp_path):
    """On a key-clustered counter table a narrow batch rewrites only
    the files whose extent holds a batch key — the rest are carried by
    manifest reference (files_linked > 0)."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _counters(spark, [(i, i) for i in range(400)]))
    t.relayout(["k"], target_files=8)
    n_files = len(t._manifest(t.latest_version())["files"])
    assert n_files >= 8
    # batch confined to one extent: keys 0..9 live in the first file
    t.merge_add_pruned(_counters(spark, [(i, 1) for i in range(10)]),
                       ["k"])
    st = t.last_cow_stats
    assert st["files_rewritten"] <= 2, st
    assert st["files_linked"] >= n_files - 2, st
    got = _state(t)
    assert all(got[i] == i + 1 for i in range(10))
    assert all(got[i] == i for i in range(10, 400))


def test_merge_add_pruned_partition_pruned_find(spark, tmp_path):
    """When the partition column is part of the merge key, the find
    pass prunes to the batch's partitions by metadata — files_scanned
    counts only those partitions' files (the term_df token-bucket
    layout)."""
    df = (spark.range(0, 300)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 4).cast("int").alias("b"),
                  F.lit(1).cast("long").alias("n")))
    t = AcidTable.create(spark, tmp_path / "t", df,
                         partition_by=["b"])
    total = len(t._manifest(t.latest_version())["files"])
    batch = (spark.range(0, 8)
             .select((F.col("id") * 4).alias("k"),       # all b == 0
                     F.lit(0).cast("int").alias("b"),
                     F.lit(5).cast("long").alias("n")))
    t.merge_add_pruned(batch, ["k", "b"])
    st = t.last_cow_stats
    assert st["files_scanned"] < total, (st, total)
    got = {(r.k, r.b): r.n for r in t.read().collect()}
    assert got[(0, 0)] == 6 and got[(4, 0)] == 6
    assert got[(1, 1)] == 1


def test_merge_add_pruned_wide_batch_falls_back_to_full(spark, tmp_path):
    """A batch past BOTH driver-list caps (no partition tuples, more
    distinct keys than _EQ_PRUNE_CAP) leaves the find pass unpruned —
    merge_add_pruned routes it through the one-shot full merge (same
    bytes, one pass; the r16 SCALING scattered row priced the two-pass
    shape slower), recorded as a plain ``merge_add`` commit."""
    base = [(i, i) for i in range(6000)]
    batch = [(i, 1) for i in range(3000, 9000)]   # 6000 keys > cap
    a = AcidTable.create(spark, tmp_path / "a", _counters(spark, base))
    b = AcidTable.create(spark, tmp_path / "b", _counters(spark, base))
    a.merge_add(_counters(spark, batch), ["k"])
    v = b.merge_add_pruned(_counters(spark, batch), ["k"])
    assert _state(a) == _state(b)
    assert b._manifest(v)["op"] == "merge_add"    # fallback taken
    # and the fence rides through the fallback: a replay adds nothing
    assert b.merge_add_pruned(_counters(spark, batch), ["k"],
                              app_id="w", batch_id=7) is not None
    assert b.merge_add_pruned(_counters(spark, batch), ["k"],
                              app_id="w", batch_id=7) is None


def test_merge_add_pruned_total_partition_coverage_falls_back(
        spark, tmp_path):
    """When the batch's keys blow the eq-prune cap AND its partition
    tuples cover every LIVE partition, the find pass cannot skip a
    file — merge_add_pruned takes the one-shot full merge instead of
    paying an unprunable probe (the small-table/wide-batch regime a
    text micro-batch hits at bench scale). Partial coverage keeps the
    pruned path."""
    def cdf(n, bvals):
        return (spark.range(n)
                .select(F.col("id").alias("k"),
                        (F.col("id") % len(bvals)).alias("b"),
                        F.lit(1).alias("n")))
    base = cdf(6000, [0, 1])
    a = AcidTable.create(spark, tmp_path / "a", base,
                         partition_by=["b"])
    b = AcidTable.create(spark, tmp_path / "b", base,
                         partition_by=["b"])
    wide = cdf(5000, [0, 1])                  # >cap keys, both buckets
    a.merge_add(wide, ["k", "b"])
    v = b.merge_add_pruned(wide, ["k", "b"])
    assert b._manifest(v)["op"] == "merge_add"      # fallback taken
    sa = {(r.k, r.b): r.n for r in a.read().collect()}
    sb = {(r.k, r.b): r.n for r in b.read().collect()}
    assert sa == sb
    # partial coverage (only bucket 0) stays on the pruned path even
    # past the eq-prune cap: the untouched partition is carried
    narrow = (spark.range(5000)
              .select((F.col("id") * 2).alias("k"),
                      F.lit(0).alias("b"), F.lit(1).alias("n")))
    v2 = b.merge_add_pruned(narrow, ["k", "b"])
    assert b._manifest(v2)["op"] == "merge_add_pruned"
    a.merge_add(narrow, ["k", "b"])
    sa = {(r.k, r.b): r.n for r in a.read().collect()}
    sb = {(r.k, r.b): r.n for r in b.read().collect()}
    assert sa == sb


def test_merge_add_pruned_all_inserts_and_empty(spark, tmp_path):
    """A batch matching NO file still writes its rows (empty_noop=False
    — the inserts fall out of the full-outer join over the empty
    touched set)."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _counters(spark, [(1, 1)]))
    t.merge_add_pruned(_counters(spark, [(50, 7), (51, 8)]), ["k"])
    assert _state(t) == {1: 1, 50: 7, 51: 8}


# ----------------------------------------------------------- the fence


def test_merge_add_pruned_fence_replay_adds_nothing(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _counters(spark, [(1, 1), (2, 2)]))
    batch = _counters(spark, [(1, 10), (3, 30)])
    v = t.merge_add_pruned(batch, ["k"], app_id="m", batch_id=0)
    assert v is not None
    assert t.merge_add_pruned(batch, ["k"], app_id="m",
                              batch_id=0) is None
    assert _state(t) == {1: 11, 2: 2, 3: 30}    # applied exactly once


def test_merge_add_pruned_zombie_race_applies_once(spark, tmp_path,
                                                   monkeypatch):
    """Two concurrent invocations of the SAME fenced batch (zombie run
    racing its restart): both pass the entry check, the zombie commits
    first, and the loser's retry must see the fence in the fresh
    manifest and add NOTHING — the per-attempt re-check inside
    _cow_commit (r15 discipline, extended to the new commit kind)."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _counters(spark, [(1, 10), (2, 20)]))
    zombie = AcidTable(spark, tmp_path / "t")
    partials = _counters(spark, [(1, 5), (3, 7)])
    state = {"fired": False}
    orig = AcidTable._try_commit

    def racy(self, *a, **kw):
        if not state["fired"] and self is t:
            state["fired"] = True
            assert zombie.merge_add_pruned(
                partials, ["k"], app_id="app", batch_id=0) is not None
        return orig(self, *a, **kw)
    monkeypatch.setattr(AcidTable, "_try_commit", racy)
    assert t.merge_add_pruned(partials, ["k"], app_id="app",
                              batch_id=0) is None
    assert _state(t) == {1: 15, 2: 20, 3: 7}


# ------------------------------------------------- catalog write kinds


def test_commit_multi_merge_add_pruned_kinds(spark, tmp_path):
    """Both new write kinds dispatch; the fenced twin follows the
    append_txn replay pin rule (a replayed batch pins the version at
    which the fenced batch actually committed)."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("c", _counters(spark, [(1, 1)]))
    cat.commit_multi(
        {"c": ("merge_add_pruned", _counters(spark, [(1, 2), (5, 5)]),
               ["k"])}, op="t1")
    assert _state(cat.table("c")) == {1: 3, 5: 5}
    e1 = cat.commit_multi(
        {"c": ("merge_add_pruned_txn", _counters(spark, [(5, 1)]),
               ["k"], "app", 0)}, op="t2")
    v_committed = cat.snapshot(e1)["c"]
    # replay: adds nothing, pins the ORIGINAL commit's version
    e2 = cat.commit_multi(
        {"c": ("merge_add_pruned_txn", _counters(spark, [(5, 1)]),
               ["k"], "app", 0)}, op="t2-replay")
    assert cat.snapshot(e2)["c"] == v_committed
    assert _state(cat.table("c")) == {1: 3, 5: 6}


# ------------------------------------------- crash injection (SIGKILL)

R16_WRITER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
from spark_streaming_apps_spark.acid import AcidTable
t = AcidTable(spark, {root!r})
batch = spark.createDataFrame([(1, 100), (900, 9)], "k long, n long")
t.merge_add_pruned(batch, ["k"], app_id="cm", batch_id=3)
print("COMMIT-COMPLETED", flush=True)
"""


@pytest.mark.parametrize("point,lands", [
    ("before_manifest_fence", False),
    ("after_manifest_fence", True),
])
def test_merge_add_pruned_writer_crash_exactly_once(
        spark, tmp_path, point, lands):
    """SIGKILL around the manifest fence of a fenced merge_add_pruned:
    no torn version, and the redelivered batch applies exactly once
    either way."""
    root = tmp_path / "t"
    t = AcidTable.create(spark, root,
                         _counters(spark, [(i, i) for i in range(10)]))
    v0 = t.latest_version()
    script = R16_WRITER.format(repo=REPO, point=point, root=str(root))
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    assert "COMMIT-COMPLETED" not in proc.stdout
    t2 = AcidTable(spark, root)
    assert t2.latest_version() == v0 + (1 if lands else 0)
    # redelivery: fenced out iff the crashed commit landed
    batch = _counters(spark, [(1, 100), (900, 9)])
    r = t2.merge_add_pruned(batch, ["k"], app_id="cm", batch_id=3)
    assert (r is None) == lands
    got = _state(t2)
    assert got[1] == 101 and got[900] == 9      # exactly once
    # zero-grace vacuum reclaims any staged debris without breaking
    # the committed state
    t2.vacuum(keep_last=1, orphan_grace_s=0.0)
    assert _state(AcidTable(spark, root)) == got


# --------------------------------------- the append-only pairs surface


def test_pairs_append_only_replay_is_noop(spark, tmp_path):
    """The dedup stream's pairs log: a replayed (app_id, batch_id)
    append commits nothing — the fence that makes append-only
    value-equal to the old MERGE."""
    t = AcidTable.create(
        spark, tmp_path / "pairs",
        spark.createDataFrame([],
                              "doc1 long, doc2 long, est_jaccard double"))
    found = spark.createDataFrame([(1, 2, 0.75)],
                                  "doc1 long, doc2 long, est_jaccard double")
    assert t.append_txn(found, "dedup-pairs", 1) is not None
    assert t.append_txn(found, "dedup-pairs", 1) is None
    assert t.read().count() == 1


# ------------------------------------------- catalog-entry retention


def _publish_n(cat, spark, n, start=0):
    for i in range(start, start + n):
        cat.commit_multi(
            {"t": ("append",
                   spark.createDataFrame([(i,)], "k long"))},
            op=f"p{i}")


def _entry_nums(cat):
    return sorted(int(p.stem[1:]) for p in
                  (cat.root / "commits").glob("c*.json"))


def test_expire_entries_bounds_ledger_refs_survive(spark, tmp_path):
    """A per-batch publisher leaves O(batches) commits/c{N}.json
    forever (r15 verdict) — expire_entries bounds the ledger to
    keep_last + refs, with tags readable by name AND by entry
    afterwards, and the latest snapshot untouched."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 6)
    tag_entry = cat.tag("keeper")            # pins entry 6
    _publish_n(cat, spark, 10, start=6)
    assert len(_entry_nums(cat)) == 17       # 0..16: O(batches) growth
    before = cat.snapshot()
    removed = cat.expire_entries(keep_last=3)
    nums = _entry_nums(cat)
    assert nums == [tag_entry, 14, 15, 16]
    assert set(removed) == set(range(0, 14)) - {tag_entry}
    # latest snapshot, hint path, and tag reads all survive
    assert cat.snapshot() == before
    assert cat.latest_entry() == 16
    assert cat.read_tag("keeper", "t").count() > 0
    assert cat.snapshot(tag_entry)["t"] == json.loads(
        (cat.root / "refs" / "tags" / "keeper.json")
        .read_text())["pins"]["t"]
    # a second run is a no-op (idempotent)
    assert cat.expire_entries(keep_last=3) == []


def test_expire_entries_keeps_branch_base_range(spark, tmp_path):
    """Everything from a live branch's fork base forward survives (the
    publish landed-retry evidence walk reads that range); dropping the
    branch releases it."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    cat.create_table("u", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 3)                # entries on table t
    b = cat.branch("wip")
    base = b.base_entry()
    for i in range(8):                       # main moves on u only —
        cat.commit_multi(                    # branch stays publishable
            {"u": ("append",
                   spark.createDataFrame([(i,)], "k long"))},
            op=f"u{i}")
    head = cat.latest_entry()
    cat.expire_entries(keep_last=2)
    nums = _entry_nums(cat)
    assert set(range(base, head + 1)) <= set(nums)  # base..head kept
    assert min(nums) == base                  # pre-fork history expired
    # branch commit + WAP publish still work across the expiry
    b.commit_multi({"t": ("append",
                          spark.createDataFrame([(99,)], "k long"))},
                   op="wip")
    cat.publish("wip")
    # dropping the branch releases its range on the next run
    cat.drop_branch("wip")
    cat.expire_entries(keep_last=2)
    assert len(_entry_nums(cat)) == 2


def test_autovacuum_expires_catalog_entries(spark, tmp_path):
    """The maybe_autovacuum hook extends to the owning catalog's entry
    ledger when expire_entries_keep is set: a maintenance loop's
    commits/ file count stays O(keep), never O(batches)."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    t = cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    t.set_autovacuum(every=4, keep_last=2, expire_entries_keep=4)
    for i in range(14):
        cat.commit_multi(
            {"t": ("append",
                   spark.createDataFrame([(i,)], "k long"))},
            op=f"p{i}")
        t.maybe_autovacuum()
    nums = _entry_nums(cat)
    assert len(nums) <= 4 + 4, nums          # keep window + cadence lag
    assert cat.read("t").count() == 15       # serving state untouched


def test_expire_entries_stale_hint_on_kept_root(spark, tmp_path):
    """r16 review finding: a stalled publisher's stale ``_latest``
    hint landing on a kept BELOW-WINDOW root (a tag pin) must not
    stop latest_entry's forward probe at the gap expiry created —
    pre-fix it returned the ancient entry and the next ``_publish``
    re-minted an expired entry number with stale pins, erasing every
    newer pin from 'latest' forever. The monotonic ``_floor`` marker
    (raised BEFORE any deletion) clamps the hint above every gap."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 6)
    tag_entry = cat.tag("keeper")            # entry 6 kept as a root
    _publish_n(cat, spark, 10, start=6)
    cat.expire_entries(keep_last=3)          # c7..c13 gone, c6 kept
    head_pins = cat.snapshot()
    assert (cat._commits / "_floor").read_text() == "14"
    # the stalled publisher wakes and clobbers the hint with the root
    (cat._commits / "_latest").write_text(str(tag_entry))
    assert cat.latest_entry() == 16          # clamped past the gap
    assert cat.snapshot() == head_pins
    # and the next publish mints 17 — never an expired number
    e = cat.commit_multi(
        {"t": ("append", spark.createDataFrame([(1,)], "k long"))},
        op="after")
    assert e == 17
    assert cat.snapshot()["t"] > head_pins["t"]


def test_expire_entries_sweeps_stale_pointer_temps(spark, tmp_path):
    """A publisher crash between write_text and atomic_replace leaks
    '._latest.*'/'._floor.*' dotfile temps in commits/ — expire_entries
    sweeps them past the grace window (the table vacuum's staging-temp
    discipline), and never races a fresh one."""
    import os
    import time

    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 2)
    stale_l = cat._commits / "._latest.deadbeef"
    stale_f = cat._commits / "._floor.deadbeef"
    fresh = cat._commits / "._latest.cafecafe"
    for p in (stale_l, stale_f, fresh):
        p.write_text("0")
    old = time.time() - 3600
    os.utime(stale_l, (old, old))
    os.utime(stale_f, (old, old))
    cat.expire_entries(keep_last=16)         # no-entry-expiry path too
    assert not stale_l.exists() and not stale_f.exists()
    assert fresh.exists()                    # grace window respected
    assert cat.latest_entry() == 2


def test_set_autovacuum_validates_expire_entries_keep(spark, tmp_path):
    """A bad expire_entries_keep must fail at SET time, not raise from
    inside every later maybe_autovacuum hook after the vacuum ran but
    before the watermark marker landed (r16 review finding)."""
    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(0,)], "k long"))
    with pytest.raises(ValueError, match="expire_entries_keep"):
        t.set_autovacuum(every=4, keep_last=2, expire_entries_keep=0)


EXPIRE_WRITER = r"""
import os, sys, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
from spark_streaming_apps_spark.acid_catalog import AcidCatalog
AcidCatalog(spark, {root!r}).expire_entries(keep_last=3)
print("EXPIRE-COMPLETED", flush=True)
"""


def test_expire_entries_crash_mid_delete(spark, tmp_path):
    """SIGKILL in the middle of the expiry loop: no torn state (each
    entry file is independent, roots untouched) — every reader keeps
    serving and a re-run finishes the job."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 12)
    before = cat.snapshot()
    script = EXPIRE_WRITER.format(repo=REPO, root=str(cat.root),
                                  point="during_entry_expire")
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    assert "EXPIRE-COMPLETED" not in proc.stdout
    # partial expiry: latest window intact, catalog serves
    cat2 = AcidCatalog(spark, cat.root)
    assert cat2.snapshot() == before
    assert cat2.latest_entry() == 12
    # the re-run completes the job
    cat2.expire_entries(keep_last=3)
    assert _entry_nums(cat2) == [10, 11, 12]
    assert cat2.snapshot() == before


def test_expire_entries_crash_after_floor_raise(spark, tmp_path):
    """SIGKILL right after the ``_floor`` marker lands, before ANY
    entry deletion: the floor is raised over an intact ledger — every
    reader serves (the clamp can only land on an existing entry, the
    probe walks forward normally), publishes keep minting, and the
    re-run completes the expiry."""
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(0,)], "k long"))
    _publish_n(cat, spark, 12)
    before = cat.snapshot()
    script = EXPIRE_WRITER.format(repo=REPO, root=str(cat.root),
                                  point="after_floor_raise")
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, proc.stderr[-2000:]
    cat2 = AcidCatalog(spark, cat.root)
    assert (cat2._commits / "_floor").read_text() == "10"
    assert _entry_nums(cat2) == list(range(13))   # nothing deleted
    assert cat2.snapshot() == before
    assert cat2.latest_entry() == 12
    # a publish across the crash-era floor mints 13 normally
    e = cat2.commit_multi(
        {"t": ("append", spark.createDataFrame([(1,)], "k long"))},
        op="after")
    assert e == 13
    cat2.expire_entries(keep_last=3)
    assert _entry_nums(cat2) == [11, 12, 13]
