"""Merge-on-read deletion vectors (AcidTable.delete_where_mor): DELETE
as an O(matched rows) pure-metadata commit — no data file read in full
or rewritten; reads apply the sidecar as an anti-join on the stable
(file, row-index) row identity; rewrites materialize it away.  The
third tier of the mutation-cost ladder after O(batch) linked appends
and O(matched files) copy-on-write."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import AcidTable, VersionVacuumedError


def _mk(spark, tmp_path, n=400, files=4, cdf=False):
    df = spark.createDataFrame(
        [(i, i % 5, f"p{i % 3}") for i in range(n)],
        "id long, status int, tag string")
    t = AcidTable.create(spark, tmp_path / "t", df, enable_cdf=cdf)
    t.relayout(["id"], target_files=files)
    return t


def test_mor_delete_is_pure_metadata_and_row_exact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    parent = t._manifest(t.latest_version())
    v = t.delete_where_mor("id BETWEEN 50 AND 69")
    m = t._manifest(v)
    assert m["data"] == parent["data"]          # no data rewrite at all
    assert m["op"] == "delete_mor" and m["dv_rows"] == 20
    assert t.last_mor_stats == {"rows_deleted": 20, "dv_rows_total": 20}
    got = {r.id for r in t.read().select("id").collect()}
    assert got == {i for i in range(400) if not (50 <= i <= 69)}
    # time travel: the pre-delete version still serves every row
    assert t.read(v - 1).count() == 400


def test_mor_deletes_accumulate_and_never_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id < 10")
    v = t.delete_where_mor("id >= 390")
    assert t._manifest(v)["dv_rows"] == 20
    assert t.read().count() == 380
    # a row already dead cannot match again: re-running the first
    # predicate adds nothing
    v2 = t.delete_where_mor("id < 10")
    assert t._manifest(v2)["dv_rows"] == 20
    assert t.last_mor_stats["rows_deleted"] == 0
    assert t._manifest(v2)["data"] == t._manifest(v)["data"]


def test_mor_no_match_commits_metadata_version(spark, tmp_path):
    t = _mk(spark, tmp_path, n=40, files=2)
    v = t.delete_where_mor("id > 99999")
    assert t._manifest(v)["op"] == "delete_mor"
    assert "dv" not in t._manifest(v)
    assert t.read().count() == 40


def test_compact_materializes_the_vector(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("status = 2")
    n = t.read().count()
    v = t.compact(target_files=2)
    m = t._manifest(v)
    assert "dv" not in m                        # rewrite cleared it
    assert t.read().count() == n
    assert t.read().filter("status = 2").count() == 0


def test_linked_append_carries_the_vector(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor("id < 20")
    v = t.append(t.spark.createDataFrame(
        [(1000 + i, 1, "new") for i in range(5)],
        "id long, status int, tag string"))
    m = t._manifest(v)
    assert m.get("dv_rows") == 20               # vector shared forward
    assert t.read().count() == 400 - 20 + 5
    assert t.read().filter("id < 20").count() == 0


def test_cow_after_mor_prunes_vector_to_carried_files(spark, tmp_path):
    """A COW delete on a DV table materializes the touched files' dead
    rows and keeps only the carried files' vector entries."""
    t = _mk(spark, tmp_path, n=1000, files=8)
    t.delete_where_mor("id BETWEEN 0 AND 4")        # extent of file 0
    t.delete_where_mor("id BETWEEN 995 AND 999")    # extent of file 7
    v = t.delete_where("id BETWEEN 10 AND 19")      # COW touches file 0
    m = t._manifest(v)
    assert t.read().count() == 1000 - 5 - 5 - 10
    assert t.read().filter("id < 20").count() == 5   # ids 5..9 alive
    # vector pruned: only file-7's 5 entries remain live
    assert m.get("dv_rows") == 5
    assert t.last_cow_stats["files_linked"] > 0


def test_update_where_on_dv_table_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=4)
    t.delete_where_mor("id BETWEEN 10 AND 14")
    t.update_where({"tag": "'upd'"}, "id BETWEEN 12 AND 20")
    got = t.read()
    assert got.count() == 95
    assert got.filter("id BETWEEN 10 AND 14").count() == 0
    assert {r.id for r in got.filter("tag = 'upd'").collect()} == \
        set(range(15, 21))


def test_merge_pruned_on_dv_table(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=4)
    t.delete_where_mor("id = 30")
    ups = spark.createDataFrame([(31, 9, "m"), (30, 9, "back")],
                                "id long, status int, tag string")
    t.merge_pruned(ups, key=["id"])
    rows = {r.id: r for r in t.read().collect()}
    assert rows[31].status == 9
    # id=30 was deleted; the merge re-INSERTS it (unmatched source row)
    assert rows[30].tag == "back"
    assert len(rows) == 100


def test_mor_delete_records_cdf_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=4, cdf=True)
    v = t.delete_where_mor("id BETWEEN 40 AND 44")
    ch = t.read_changes(v - 1, v)
    assert ch.filter("_change_type = 'delete'").count() == 5
    assert ch.filter("_change_type = 'insert'").count() == 0
    base = t.read(v - 1).select("id", "status", "tag")
    rebuilt = base.exceptAll(
        ch.filter("_change_type = 'delete'").select("id", "status", "tag"))
    assert rebuilt.exceptAll(t.read(v).select("id", "status", "tag")) \
        .count() == 0


def test_read_range_applies_the_vector(spark, tmp_path):
    t = _mk(spark, tmp_path, n=1000, files=8)
    t.delete_where_mor("id BETWEEN 100 AND 109")
    band = t.read_range("id", 90, 120)
    assert {r.id for r in band.select("id").collect()} == \
        (set(range(90, 100)) | set(range(110, 121)))


def test_datasource_read_applies_the_vector(spark, tmp_path):
    """`spark.read.format(\"acidtable\")` on a DV table drops dead rows
    executor-side (vectorized mask per Arrow batch)."""
    from spark_streaming_apps_spark.sources.pysource import \
        AcidTableDataSource
    spark.dataSource.register(AcidTableDataSource)
    t = _mk(spark, tmp_path, n=300, files=4)
    t.delete_where_mor("status = 1")
    via_ds = (spark.read.format("acidtable")
              .option("path", str(tmp_path / "t")).load())
    expect = t.read()
    assert via_ds.count() == expect.count()
    assert via_ds.exceptAll(expect).count() == 0
    assert expect.exceptAll(via_ds).count() == 0


def test_vacuumed_vector_fails_loudly(spark, tmp_path):
    t = _mk(spark, tmp_path, n=40, files=2)
    v_dv = t.delete_where_mor("id < 5")
    t.compact(target_files=1)        # materializes; v_dv's dv now old
    t.vacuum(keep_last=1)
    with pytest.raises(VersionVacuumedError):
        t.read(v_dv)
    assert t.read().count() == 35    # latest unaffected


def test_restore_to_dv_version_carries_vector(spark, tmp_path):
    t = _mk(spark, tmp_path, n=60, files=2)
    v_dv = t.delete_where_mor("id < 6")
    t.append(spark.createDataFrame([(900, 0, "x")],
                                   "id long, status int, tag string"))
    v = t.restore(v_dv)
    assert t._manifest(v).get("dv_rows") == 6
    assert t.read().count() == 54
    assert t.read().filter("id < 6").count() == 0


def test_history_counts_net_of_vector(spark, tmp_path):
    t = _mk(spark, tmp_path, n=50, files=2)
    t.delete_where_mor("id < 10")
    hist = {r.version: r.n_rows for r in t.history().collect()}
    assert hist[t.latest_version()] == 40


def test_shallow_clone_shares_files_and_forks_history(spark, tmp_path):
    t = _mk(spark, tmp_path, n=100, files=4)
    t.delete_where_mor("id < 10")                    # clone carries the DV
    c = t.clone(tmp_path / "c")
    assert c._manifest(0)["op"] == "clone"
    assert c.read().count() == 90
    assert c.read().exceptAll(t.read()).count() == 0
    # histories fork: mutate each side independently
    c.delete_where("id >= 95")
    t.append(t.spark.createDataFrame([(500, 0, "src-only")],
                                     "id long, status int, tag string"))
    assert c.read().count() == 85
    assert t.read().count() == 91
    assert c.read().filter("id = 500").count() == 0
    # vacuum on the source never breaks the clone (refcounted links)
    t.compact(); t.vacuum(keep_last=1)
    assert c.read().count() == 85
    with pytest.raises(FileExistsError):
        t.clone(tmp_path / "c")


def test_clone_of_vacuumed_version_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, files=2)
    t.compact()
    t.vacuum(keep_last=1)
    with pytest.raises(VersionVacuumedError):
        t.clone(tmp_path / "c2", version=0)


def test_timestamp_as_of(spark, tmp_path):
    import time

    from spark_streaming_apps_spark.merge_sql import acid_sql
    t = _mk(spark, tmp_path, n=30, files=2)
    v1 = t.latest_version()
    time.sleep(0.05)
    mid = time.time()
    time.sleep(0.05)
    t.delete_where("id < 10")
    assert t.version_at(mid) == v1
    assert t.version_at(time.time()) == t.latest_version()
    with pytest.raises(ValueError):
        t.version_at(0.5)                 # predates the table
    from datetime import datetime
    iso = datetime.fromtimestamp(mid).isoformat()
    got = acid_sql(spark,
                   f"SELECT COUNT(*) AS n FROM q TIMESTAMP AS OF '{iso}'",
                   tables={"q": t}).collect()[0].n
    assert got == 30
    assert t.read().count() == 20


def test_enable_dv_routes_sql_delete_to_mor(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql
    df = spark.createDataFrame([(i, i % 3) for i in range(60)],
                               "id long, s int")
    t = AcidTable.create(spark, tmp_path / "t", df, enable_dv=True)
    assert t.dv_enabled()
    parent = t._manifest(t.latest_version())
    v = acid_sql(spark, "DELETE FROM q WHERE id < 12", tables={"q": t})
    m = t._manifest(v)
    assert m["op"] == "delete_mor"
    assert m["data"] == parent["data"]       # pure metadata
    assert t.read().count() == 48
    # OPTIMIZE materializes the vector
    acid_sql(spark, "OPTIMIZE q", tables={"q": t})
    assert "dv" not in t._manifest(t.latest_version())
    assert t.read().count() == 48
    # the property survives a clone
    c = t.clone(tmp_path / "c")
    assert c.dv_enabled()


# ---------------- merge-on-read UPDATE and MERGE (DV image swap)

def test_mor_update_swaps_images_without_rewrite(spark, tmp_path):
    from spark_streaming_apps_spark.acid import _entry_name

    t = _mk(spark, tmp_path)
    names_before = {_entry_name(f) for f in
                    t._manifest(t.latest_version())["files"]}
    v = t.update_where_mor({"tag": "'hit'"}, "id BETWEEN 10 AND 19")
    m = t._manifest(v)
    assert m["op"] == "update_mor"
    assert m["dv_rows"] == 10
    assert t.last_mor_stats == {"rows_updated": 10, "dv_rows_total": 10}
    # every parent file carried by MANIFEST REFERENCE (not rewritten):
    # identity is the uuid-tagged FILE NAME (_entry_name) — carried
    # entries are re-anchored to root-relative paths, so path strings
    # differ while the physical file is the same
    names_after = {_entry_name(f) for f in m["files"]}
    assert names_before <= names_after
    assert t.read().filter("tag = 'hit'").count() == 10
    assert t.read().count() == 400                # images swapped 1:1
    # time travel: the parent version still reads pre-update images
    assert t.read(v - 1).filter("tag = 'hit'").count() == 0


def test_mor_update_of_already_updated_row(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.update_where_mor({"status": "100"}, "id = 7")
    v = t.update_where_mor({"status": "status + 1"}, "id = 7")
    assert t.read().filter("id = 7").collect()[0].status == 101
    assert t._manifest(v)["dv_rows"] == 2         # both old images dead
    assert t.read().count() == 400


def test_mor_update_empty_match_is_metadata_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t._manifest(t.latest_version())["data"]
    v = t.update_where_mor({"tag": "'x'"}, "id > 99999")
    m = t._manifest(v)
    assert m["op"] == "update_mor" and m["data"] == before
    assert "dv" not in m


def test_mor_merge_updates_and_inserts_one_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    up = spark.createDataFrame(
        [(3, 90, "u"), (399, 91, "u"), (9001, 1, "i"), (9002, 2, "i")],
        "id long, status int, tag string")
    v = t.merge_mor(up, key=["id"])
    assert t.last_mor_stats == {"rows_updated": 2, "rows_inserted": 2,
                                "dv_rows_total": 2}
    assert t._manifest(v)["op"] == "merge_mor"
    got = {(r.id, r.status) for r in
           t.read().filter("id IN (3, 399, 9001, 9002)").collect()}
    assert got == {(3, 90), (399, 91), (9001, 1), (9002, 2)}
    assert t.read().count() == 402


def test_mor_merge_cdf_records_delta_pair(spark, tmp_path):
    t = _mk(spark, tmp_path, cdf=True)
    up = spark.createDataFrame([(0, 77, "u"), (8888, 1, "i")],
                               "id long, status int, tag string")
    v = t.merge_mor(up, key=["id"])
    ch = t.read_changes(v - 1, v)
    ins = {(r.id, r.status) for r in
           ch.filter("_change_type = 'insert'").collect()}
    dels = {(r.id, r.status) for r in
            ch.filter("_change_type = 'delete'").collect()}
    assert ins == {(0, 77), (8888, 1)}
    assert dels == {(0, 0)}


def test_sql_update_routes_mor_and_bulk_falls_back(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = spark.createDataFrame([(i, i % 5) for i in range(500)],
                               "id long, s long")
    t = AcidTable.create(spark, tmp_path / "t", df, enable_dv=True)
    v = acid_sql(spark, "UPDATE tbl SET s = 99 WHERE id < 10",
                 tables={"tbl": t})
    assert t._manifest(v)["op"] == "update_mor"
    assert t.read().filter("s = 99").count() == 10
    # bulk update (~all rows): COW fallback, vector never table-sized
    v = acid_sql(spark, "UPDATE tbl SET s = s + 1 WHERE id >= 0",
                 tables={"tbl": t})
    assert t._manifest(v)["op"] == "update_mor_cow"
    assert t.read().filter("s = 100").count() == 10


def test_mor_update_respects_constraints(spark, tmp_path):
    from spark_streaming_apps_spark.acid import ConstraintViolation

    t = _mk(spark, tmp_path)
    t.add_constraint("s_band", "status BETWEEN 0 AND 200")
    with pytest.raises(ConstraintViolation):
        t.update_where_mor({"status": "999"}, "id = 1")
    assert t.read().filter("status = 999").count() == 0


def test_compact_materializes_update_and_merge_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.update_where_mor({"tag": "'m'"}, "id < 5")
    t.merge_mor(spark.createDataFrame([(5, 50, "m")],
                                      "id long, status int, tag string"),
                key=["id"])
    t.compact(2)
    m = t._manifest(t.latest_version())
    assert "dv" not in m
    assert t.read().filter("tag = 'm'").count() == 6
    assert t.read().count() == 400


# ---------- property: MOR and COW must agree on every predicate

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ATOMS = [
    lambda d: f"status = {d.draw(st.integers(-1, 6))}",
    lambda d: f"id < {d.draw(st.integers(0, 250))}",
    lambda d: f"id >= {d.draw(st.integers(0, 250))}",
    lambda d: f"tag = 'p{d.draw(st.integers(0, 3))}'",
    lambda d: (f"status = {d.draw(st.integers(0, 4))} OR "
               f"status = {d.draw(st.integers(0, 4))}"),
    lambda d: "status IS NULL",
    lambda d: f"(id % 7) = {d.draw(st.integers(0, 6))}",
]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_mor_delete_equals_cow_delete(spark, tmp_path_factory, data):
    """For ANY predicate, merge-on-read DELETE (vector) and
    copy-on-write DELETE (rewrite) must leave IDENTICAL tables — the
    vector read path is an implementation detail, never a semantic."""
    n_atoms = data.draw(st.integers(1, 2))
    cond = " AND ".join(
        data.draw(st.sampled_from(_ATOMS))(data) for _ in range(n_atoms))
    d = tmp_path_factory.mktemp("morprop")
    df = spark.createDataFrame(
        [(i, i % 5, f"p{i % 3}") for i in range(200)],
        "id long, status int, tag string")
    a = AcidTable.create(spark, d / "cow", df)
    b = AcidTable.create(spark, d / "mor", df, enable_dv=True)
    a.delete_where(cond)
    b.delete_where_mor(cond)
    rows_a = sorted(tuple(r) for r in a.read().collect())
    rows_b = sorted(tuple(r) for r in b.read().collect())
    assert rows_a == rows_b, f"MOR != COW for {cond!r}"
    # and the DV table still round-trips through the connector
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)
    spark.dataSource.register(AcidTableDataSource)
    via = sorted(tuple(r) for r in
                 spark.read.format("acidtable")
                 .option("path", str(d / "mor")).load().collect())
    assert via == rows_b, f"connector DV mask != anti-join for {cond!r}"
