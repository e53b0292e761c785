"""File-pruned copy-on-write DML (AcidTable.delete_where / update_where /
merge_pruned): the Delta/Iceberg touched-file discipline — a selective
mutation rewrites O(matched files), carries every other file by
reference, and stays exactly equivalent to the full-rewrite build.  The
reference's worker mutates its queue with row-level UPDATE/DELETE
(FileWorkerApp.scala:207-227); at 100 TB those must not rewrite the
table."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import (AcidTable,
                                             ConstraintViolation)


def _clustered(spark, tmp_path, n=1000, files=8, cdf=False):
    """A table range-clustered on id into `files` files with disjoint
    extents, so a narrow id predicate provably touches few files."""
    df = spark.createDataFrame(
        [(i, i % 7, f"tag{i % 3}") for i in range(n)],
        "id long, status int, tag string")
    t = AcidTable.create(spark, tmp_path / "t", df, enable_cdf=cdf)
    t.relayout(["id"], target_files=files)
    return t


def test_delete_where_prunes_files_and_matches_filter(spark, tmp_path):
    t = _clustered(spark, tmp_path)
    n_files = len(t._manifest(t.latest_version())["files"])
    v = t.delete_where("id BETWEEN 100 AND 140")
    assert v == 2
    # correctness: identical to the logical anti-filter
    got = {r.id for r in t.read().select("id").collect()}
    assert got == {i for i in range(1000) if not (100 <= i <= 140)}
    # pruning: a 41-row range on an 8-file clustered table must NOT
    # rewrite every file
    st = t.last_cow_stats
    assert st["files_rewritten"] + st["files_linked"] == n_files
    assert st["files_rewritten"] < n_files / 2
    assert st["files_linked"] > 0
    # the new manifest still carries a full stats entry per live file
    m = t._manifest(v)
    assert sum(f["rows"] for f in m["files"]) == 1000 - 41


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, x int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.delete_where("x > 15")
    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 2]        # NULL predicate row is NOT deleted


def test_delete_where_no_match_is_metadata_only_commit(spark, tmp_path):
    t = _clustered(spark, tmp_path, n=50, files=2)
    m_before = t._manifest(t.latest_version())
    v = t.delete_where("id > 100000")
    m = t._manifest(v)
    assert m["data"] == m_before["data"]        # shares the parent dir
    assert m["op"] == "delete"
    assert t.read().count() == 50
    assert t.last_cow_stats == {"files_scanned": 2, "files_rewritten": 0, "files_linked": 2}


def test_update_where_prunes_and_matches_case_projection(spark, tmp_path):
    t = _clustered(spark, tmp_path)
    v = t.update_where({"status": "status + 100", "tag": "'hot'"},
                       "id BETWEEN 900 AND 920")
    rows = {r.id: r for r in t.read().collect()}
    assert len(rows) == 1000
    assert rows[910].status == 910 % 7 + 100 and rows[910].tag == "hot"
    assert rows[10].status == 10 % 7 and rows[10].tag == f"tag{10 % 3}"
    assert t.last_cow_stats["files_linked"] > 0
    assert t._manifest(v)["op"] == "update"


def test_update_where_unknown_column_raises(spark, tmp_path):
    t = _clustered(spark, tmp_path, n=50, files=2)
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where({"nope": "1"}, "id < 10")


def test_update_where_respects_check_constraints(spark, tmp_path):
    t = _clustered(spark, tmp_path, n=50, files=2)
    t.add_constraint("status_band", "status BETWEEN 0 AND 10")
    with pytest.raises(ConstraintViolation):
        t.update_where({"status": "99"}, "id < 5")
    # refused commit left no trace
    assert t.read().filter("status = 99").count() == 0
    v = t.update_where({"status": "9"}, "id < 5")
    assert t.read().filter("status = 9").count() == 5
    assert t._manifest(v)["op"] == "update"


def test_merge_pruned_equals_full_merge(spark, tmp_path):
    t = _clustered(spark, tmp_path)
    t2 = _clustered(spark, tmp_path / "ref")
    ups = spark.createDataFrame(
        [(150, 50, "upd"), (155, 51, "upd"),        # matched, same extent
         (5000, 52, "new")],                        # unmatched -> insert
        "id long, status int, tag string")
    t.merge_pruned(ups, key=["id"])
    t2.merge(ups, key=["id"])
    a = t.read()
    b = t2.read()
    assert a.count() == b.count() == 1001
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the two matched keys sit in one extent; inserts add files but
    # never force rewrites of unrelated extents
    assert t.last_cow_stats["files_linked"] > 0


def test_merge_pruned_pure_insert_batch(spark, tmp_path):
    """No key matches any file: every update row must still insert."""
    t = _clustered(spark, tmp_path, n=100, files=4)
    ups = spark.createDataFrame(
        [(10_000 + i, 1, "new") for i in range(5)],
        "id long, status int, tag string")
    t.merge_pruned(ups, key=["id"])
    assert t.read().count() == 105
    assert t.read().filter("id >= 10000").count() == 5
    assert t.last_cow_stats["files_rewritten"] == 0
    assert t.last_cow_stats["files_linked"] == 4


def test_cow_delete_update_record_cdf_deltas(spark, tmp_path):
    """The change feed contract holds across COW commits: read(v0) plus
    inserts minus deletes == read(v_to), with deltas derived from the
    touched subset only."""
    t = _clustered(spark, tmp_path, n=200, files=4, cdf=True)
    t.delete_where("id BETWEEN 10 AND 19")           # v2
    t.update_where({"status": "status + 50"}, "id BETWEEN 30 AND 34")  # v3
    ch = t.read_changes(1, 3)
    ins = ch.filter("_change_type = 'insert'")
    dels = ch.filter("_change_type = 'delete'")
    assert dels.filter("_commit_version = 2").count() == 10
    assert ins.filter("_commit_version = 2").count() == 0
    # an update appears as its delete+insert pair at the same version
    assert ins.filter("_commit_version = 3").count() == 5
    assert dels.filter("_commit_version = 3").count() == 5
    base = t.read(1).select("id", "status", "tag")
    rebuilt = (base.unionByName(ins.select("id", "status", "tag"))
               .exceptAll(dels.select("id", "status", "tag")))
    final = t.read(3).select("id", "status", "tag")
    assert rebuilt.exceptAll(final).count() == 0
    assert final.exceptAll(rebuilt).count() == 0


def test_cow_conflict_retries_against_winner(spark, tmp_path):
    """A COW delete that loses the version race must retry against the
    winner's snapshot — the winner's appended rows survive."""
    t = _clustered(spark, tmp_path, n=100, files=4)
    real_try = t._try_commit
    state = {"raced": False}

    def racing_try(version, *a, **k):
        if not state["raced"]:
            state["raced"] = True
            # another writer appends and takes this version first
            AcidTable(t.spark, t.path).append(
                t.spark.createDataFrame([(7777, 1, "winner")],
                                        "id long, status int, tag string"))
        return real_try(version, *a, **k)

    t._try_commit = racing_try
    t.delete_where("id < 10")
    got = t.read()
    assert got.filter("id < 10 AND id >= 0").count() == 0
    assert got.filter("id = 7777").count() == 1       # winner survived
    assert state["raced"]


def test_linked_append_then_cow_delete_roundtrip(spark, tmp_path):
    """O(delta) linked appends and COW deletes compose: hardlinked
    carryover files stay readable across both commit kinds and vacuum
    of old versions."""
    t = _clustered(spark, tmp_path, n=100, files=4)
    t.append(spark.createDataFrame([(200 + i, 1, "late") for i in range(10)],
                                   "id long, status int, tag string"))
    t.delete_where("status = 1 AND tag = 'late' AND id >= 205")
    assert t.read().count() == 105
    t.vacuum(keep_last=1)
    assert t.read().count() == 105
    assert t.read().filter("tag = 'late'").count() == 5
