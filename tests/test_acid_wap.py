"""Named catalog refs + write-audit-publish (round 13).

Branches are movable pointer chains under ``refs/heads/<name>`` (pins
maps, CAS-advanced); tags are immutable pins under ``refs/tags``.
``publish`` fast-forwards the MAIN pointer to the branch head in one
entry after the audit passes — crash and contention coverage ride the
existing harnesses (crash_point subprocess SIGKILL; concurrent
publishers through the CAS loop).
"""
import json
import signal
import subprocess
import sys
from pathlib import Path

import pytest

from spark_streaming_apps_spark.acid_catalog import (AcidCatalog,
                                                     AuditFailed,
                                                     CatalogBranch)
from spark_streaming_apps_spark.acid import CommitConflict

REPO = str(Path(__file__).resolve().parents[1])


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _seed(spark, root) -> AcidCatalog:
    cat = AcidCatalog(spark, root)
    cat.create_table("q", _df(spark, [(1, 0), (2, 0), (3, 3)],
                              "file_id long, status int"))
    return cat


def _census(df):
    return {(r.file_id, r.status) for r in df.collect()}


def test_branch_isolation_and_publish(spark, tmp_path):
    cat = _seed(spark, tmp_path / "c")
    before = _census(cat.read("q"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    # branch sees its write; main does not
    assert (1, 1) in _census(br.read("q"))
    assert _census(cat.read("q")) == before
    # publish: one pointer fast-forward exposes it
    e = cat.publish("wap")
    assert cat.latest_entry() == e
    assert (1, 1) in _census(cat.read("q"))


def test_audit_failure_leaves_main_untouched(spark, tmp_path):
    cat = _seed(spark, tmp_path / "c")
    entry0, before = cat.latest_entry(), _census(cat.read("q"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("append", _df(spark, [(9, 9)],
                                         "file_id long, status int"))})
    with pytest.raises(AuditFailed):
        cat.publish("wap", audit=lambda b: b.read("q")
                    .filter("status > 3").count() == 0)
    assert cat.latest_entry() == entry0
    assert _census(cat.read("q")) == before
    # fix on the branch, audit passes, publish lands
    br.commit_multi({"q": ("delete", "status > 3")})
    cat.publish("wap", audit=lambda b: b.read("q")
                .filter("status > 3").count() == 0)
    assert _census(cat.read("q")) == before


def test_publish_refuses_non_fast_forward(spark, tmp_path):
    """A main-side write to a branch-changed table between fork and
    publish makes the branch non-fast-forwardable — refused, never a
    silent lost update; main writes to OTHER tables merge fine."""
    cat = _seed(spark, tmp_path / "c")
    cat.create_table("other", _df(spark, [(1, 1)], "k long, v int"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "2"}, "file_id = 2")})
    # concurrent main write to the SAME table
    cat.commit_multi({"q": ("append", _df(spark, [(50, 0)],
                                          "file_id long, status int"))})
    with pytest.raises(CommitConflict, match="not fast-forwardable"):
        cat.publish("wap")
    # a branch touching only an unrelated table publishes fine
    br2 = cat.branch("side")
    br2.commit_multi({"other": ("append", _df(spark, [(2, 2)],
                                              "k long, v int"))})
    cat.commit_multi({"q": ("append", _df(spark, [(60, 0)],
                                          "file_id long, status int"))})
    cat.publish("side")
    assert (2, 2) in {(r.k, r.v) for r in cat.read("other").collect()}
    # and the merged entry kept main's own q pin
    assert 60 in {r.file_id for r in cat.read("q").collect()}


def test_tags_are_immutable_time_travel(spark, tmp_path):
    cat = _seed(spark, tmp_path / "c")
    cat.tag("v0")
    before = _census(cat.read("q"))
    cat.commit_multi({"q": ("append", _df(spark, [(7, 0)],
                                          "file_id long, status int"))})
    assert _census(cat.read_tag("v0", "q")) == before
    with pytest.raises(FileExistsError, match="immutable"):
        cat.tag("v0")


def test_branch_survives_contended_advance(spark, tmp_path):
    """Two logical writers advancing the same branch: the CAS loop
    serializes them; both pins land (per-table max, no lost update)."""
    cat = _seed(spark, tmp_path / "c")
    cat.create_table("b2", _df(spark, [(1, 1)], "k long, v int"))
    br = cat.branch("wap")
    h0 = br.head()
    br.commit_multi({"q": ("append", _df(spark, [(70, 0)],
                                         "file_id long, status int"))})
    # a second handle to the same branch (stale head view) advances too
    br_b = CatalogBranch(cat, "wap")
    br_b.commit_multi({"b2": ("append", _df(spark, [(2, 2)],
                                            "k long, v int"))})
    assert br.head() == h0 + 2
    pins = br.snapshot()
    assert pins["q"] >= 1 and pins["b2"] >= 1
    cat.publish("wap")
    assert 70 in {r.file_id for r in cat.read("q").collect()}
    assert (2, 2) in {(r.k, r.v) for r in cat.read("b2").collect()}


# --------------------------------------------------- crash injection

WRITER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_CRASH_POINT"] = {point!r}
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
from spark_streaming_apps_spark.acid_catalog import AcidCatalog
cat = AcidCatalog(spark, {root!r})
op = {op!r}
if op == "branch_commit":
    br = cat.branch("wap")
    br.commit_multi({{"q": ("append", spark.createDataFrame(
        [(500, 0)], "file_id long, status int"))}})
elif op == "publish":
    cat.publish("wap")
elif op == "rebase":
    from spark_streaming_apps_spark.acid_catalog import CatalogBranch
    CatalogBranch(cat, "wap").rebase()
print("COMMIT-COMPLETED", flush=True)
"""


def _run_crash(point, root, op):
    script = WRITER.format(repo=REPO, point=point, root=str(root),
                           op=op)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == -signal.SIGKILL, (
        f"writer expected to die at {point}, got rc="
        f"{proc.returncode}\n{proc.stderr[-2000:]}")
    assert "COMMIT-COMPLETED" not in proc.stdout


def test_crash_before_branch_pin_leaves_branch_clean(spark, tmp_path):
    """SIGKILL between the table commit and the branch-pointer CAS:
    the table version is durable but the branch head is unmoved —
    branch readers keep the old pins; a retry re-publishes (the
    at-least-once commit_multi contract, scoped to the branch)."""
    root = tmp_path / "c"
    cat = _seed(spark, root)
    br = cat.branch("wap")
    h0, pins0 = br.head(), br.snapshot()
    main0 = cat.latest_entry()

    _run_crash("before_branch_pin", root, "branch_commit")

    cat2 = AcidCatalog(spark, root)
    br2 = CatalogBranch(cat2, "wap")
    assert br2.head() == h0 and br2.snapshot() == pins0
    assert cat2.latest_entry() == main0      # main never involved
    # durable-but-unpinned table version exists
    assert cat2.table("q").latest_version() > pins0["q"]
    # retry lands and max-merge exposes the crashed commit atomically
    br2.commit_multi({"q": ("append", _df(spark, [(501, 0)],
                                          "file_id long, status int"))})
    ids = {r.file_id for r in br2.read("q").collect()}
    assert {500, 501} <= ids


def test_crash_before_wap_publish_keeps_readers_on_old_pointer(
        spark, tmp_path):
    """SIGKILL inside publish after the audit but before the main CAS:
    readers keep the old entry; a re-publish is idempotent and lands
    the same pins."""
    root = tmp_path / "c"
    cat = _seed(spark, root)
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    main0, census0 = cat.latest_entry(), _census(cat.read("q"))

    _run_crash("before_wap_publish", root, "publish")

    cat2 = AcidCatalog(spark, root)
    assert cat2.latest_entry() == main0
    assert _census(cat2.read("q")) == census0
    cat2.publish("wap")
    assert (1, 1) in _census(cat2.read("q"))


def test_publish_toctou_window_is_conditional(spark, tmp_path,
                                              monkeypatch):
    """A main write landing BETWEEN publish's fast-forward check and
    the pointer CAS (injected at the before_wap_publish point — the
    exact window) must raise, never be silently max-merged away: the
    swap re-validates the expected pins INSIDE the CAS loop."""
    from spark_streaming_apps_spark import acid_catalog as ac

    cat = _seed(spark, tmp_path / "c")
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "2"}, "file_id = 1")})

    real_cp = ac.crash_point

    def racing_cp(name):
        if name == "before_wap_publish":
            # the concurrent main writer wins the window
            cat.commit_multi({"q": ("append", _df(
                spark, [(77, 0)], "file_id long, status int"))})
        return real_cp(name)

    monkeypatch.setattr(ac, "crash_point", racing_cp)
    with pytest.raises(CommitConflict, match="conditional publish"):
        cat.publish("wap")
    # main kept ITS write and its OWN pointer advance — the publish
    # never max-merged the branch pin in. (The racing main writer's
    # append built on the branch's committed-but-unpinned table
    # version — the documented read-committed/single-table carve-out
    # of linear table histories; the POINTER-level guarantee is what
    # the conditional swap protects: no silent branch publish.)
    ids = {r.file_id for r in cat.read("q").collect()}
    assert 77 in ids
    b_pin = CatalogBranch(cat, "wap").snapshot()["q"]
    assert cat.snapshot()["q"] > b_pin  # main's append, not a publish


def test_publish_retry_after_landing_is_idempotent(spark, tmp_path):
    """The post-CAS half of the crash window: a re-publish of a branch
    whose pins already landed returns the current entry as a no-op —
    never a spurious 'not fast-forwardable' conflict."""
    cat = _seed(spark, tmp_path / "c")
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    e1 = cat.publish("wap")
    assert cat.publish("wap") == e1          # retry: no-op, same entry
    assert cat.latest_entry() == e1


def test_commit_multi_append_txn_kind_fences_replays(spark, tmp_path):
    """The append_txn write kind: a replayed (app_id, batch_id)
    transaction re-commits nothing on the fenced tables and the retry
    still publishes a complete entry."""
    cat = _seed(spark, tmp_path / "c")
    rows = _df(spark, [(100, 0)], "file_id long, status int")
    e1 = cat.commit_multi(
        {"q": ("append_txn", rows, "app", 0)})
    v1 = cat.snapshot(e1)["q"]
    # replay of batch 0: table version unmoved, entry republished
    cat.commit_multi({"q": ("append_txn", rows, "app", 0)})
    assert cat.table("q").latest_version() == v1
    assert cat.read("q").filter("file_id = 100").count() == 1
    # next batch advances
    cat.commit_multi({"q": ("append_txn", _df(
        spark, [(101, 0)], "file_id long, status int"), "app", 1)})
    assert cat.table("q").latest_version() == v1 + 1


# --------------------------------------------------- ref-aware retention

def test_vacuum_respects_branch_and_catalog_pins(spark, tmp_path):
    """A parked branch and the main catalog pointer are retention
    ROOTS: aggressive vacuum must not release the versions they pin
    (Iceberg expire-snapshots-respects-refs), so a WAP audit that
    waits past the retention window still publishes."""
    cat = _seed(spark, tmp_path / "c")
    before = _census(cat.read("q"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    # an unpinned direct write makes the table's LATEST (v2) newer
    # than both the main pin (v0) and the branch pin (v1)
    t = cat.table("q")
    t.append(_df(spark, [(7, 7)], "file_id long, status int"))
    assert t.latest_version() == 2
    t.vacuum(keep_last=1)
    # main catalog readers (pin v0) and the parked branch (pin v1)
    # both survive the aggressive window
    assert _census(cat.read("q")) == before
    assert (1, 1) in _census(br.read("q"))
    # ... and the parked publish still lands
    cat.publish("wap", audit=lambda b: (1, 1) in _census(b.read("q")))
    assert (1, 1) in _census(cat.read("q"))


def test_tag_reads_survive_vacuum_until_expired(spark, tmp_path):
    from spark_streaming_apps_spark.acid import VersionVacuumedError

    cat = _seed(spark, tmp_path / "c")
    before = _census(cat.read("q"))
    cat.tag("rel0")
    for i in range(3):
        cat.commit_multi({"q": ("append", _df(
            spark, [(100 + i, 0)], "file_id long, status int"))})
    t = cat.table("q")
    t.vacuum(keep_last=1)
    # the tag pins v0: readable by name after aggressive vacuum
    assert _census(cat.read_tag("rel0", "q")) == before
    # expire the ref -> the pinned version stops being a root
    assert cat.expire_tag("rel0") is True
    assert cat.expire_tag("rel0") is False
    t.vacuum(keep_last=1)
    with pytest.raises((VersionVacuumedError, FileNotFoundError)):
        cat.read_tag("rel0", "q").collect()


def test_drop_branch_releases_its_pinned_version(spark, tmp_path):
    from spark_streaming_apps_spark.acid import VersionVacuumedError

    cat = _seed(spark, tmp_path / "c")
    br = cat.branch("wap")
    br.commit_multi({"q": ("append", _df(
        spark, [(9, 9)], "file_id long, status int"))})      # v1
    t = cat.table("q")
    # v2 REWRITES v1's appended file (copy-on-write update), so that
    # file is referenced by v1 alone - releasable once the branch ref
    # goes away, but a root while the branch is parked
    t.update_where({"status": "5"}, "file_id = 9")           # v2
    t.vacuum(keep_last=1)
    assert (9, 9) in _census(br.read("q"))     # branch pin survives
    assert cat.drop_branch("wap") is True
    assert cat.drop_branch("wap") is False
    t.vacuum(keep_last=1)
    # v1 no longer a root: its unique file is gone
    with pytest.raises((VersionVacuumedError, FileNotFoundError)):
        t.read(1).collect()


# --------------------------------------------------------- branch rebase

def test_rebase_refreshes_unchanged_pins_then_publishes(spark, tmp_path):
    """The contended WAP loop closed: main moves on OTHER tables while
    the branch is parked; rebase re-forks the branch onto current main
    (unchanged tables pick up main's pins, changed tables keep the
    branch's), and the publish lands."""
    cat = _seed(spark, tmp_path / "c")
    cat.create_table("r", _df(spark, [(1, 1)], "k long, v int"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    # main moves on a table the branch did NOT change
    cat.commit_multi({"r": ("append", _df(spark, [(2, 2)],
                                          "k long, v int"))})
    # fork-time staleness: the parked branch still serves old r
    assert (2, 2) not in {(x.k, x.v) for x in br.read("r").collect()}
    h = br.rebase()
    assert br.head() == h
    assert br.base_entry() == cat.latest_entry()
    # post-rebase the branch reads fresh r AND keeps its q work
    assert (2, 2) in {(x.k, x.v) for x in br.read("r").collect()}
    assert (1, 1) in _census(br.read("q"))
    cat.publish("wap")
    assert (1, 1) in _census(cat.read("q"))
    assert (2, 2) in {(x.k, x.v) for x in cat.read("r").collect()}


def test_rebase_refuses_true_conflict(spark, tmp_path):
    """Main moved on a table the branch CHANGED: divergent claims on
    one linear history — rebase must refuse, exactly like publish."""
    cat = _seed(spark, tmp_path / "c")
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    cat.commit_multi({"q": ("append", _df(spark, [(9, 9)],
                                          "file_id long, status int"))})
    with pytest.raises(CommitConflict, match="not fast-forwardable"):
        cat.publish("wap")
    with pytest.raises(CommitConflict, match="cannot rebase"):
        br.rebase()


def test_crash_before_rebase_keeps_old_head(spark, tmp_path):
    """SIGKILL inside rebase before the branch-pointer CAS: the old
    head keeps serving; a retried rebase lands and publish follows."""
    root = tmp_path / "c"
    cat = _seed(spark, root)
    cat.create_table("r", _df(spark, [(1, 1)], "k long, v int"))
    br = cat.branch("wap")
    br.commit_multi({"q": ("update", {"status": "1"}, "file_id = 1")})
    cat.commit_multi({"r": ("append", _df(spark, [(2, 2)],
                                          "k long, v int"))})
    h0, pins0 = br.head(), br.snapshot()

    _run_crash("before_branch_rebase", root, "rebase")

    cat2 = AcidCatalog(spark, root)
    br2 = CatalogBranch(cat2, "wap")
    assert br2.head() == h0 and br2.snapshot() == pins0
    # retry: rebase lands, publish follows
    br2.rebase()
    cat2.publish("wap")
    assert (1, 1) in _census(cat2.read("q"))
