"""AcidCatalog: cross-table atomic commits + snapshot-isolated reads —
the engine's analog of the reference's multi-table transactions
(get_highwater_mark writes hw_table AND highwatermark_log in one
PL/pgSQL call, StreamingApp.scala:223-256)."""
from __future__ import annotations

import threading

from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid_catalog import AcidCatalog


def _mk(spark, tmp_path):
    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("hw", spark.createDataFrame(
        [(0, 0)], "case_id long, hw long"))
    cat.create_table("log", spark.createDataFrame(
        [], "case_id long, previous long, current long"))
    return cat


def test_create_read_roundtrip_and_pins(spark, tmp_path):
    cat = _mk(spark, tmp_path)
    assert cat.snapshot() == {"hw": 0, "log": 0}
    assert cat.read("hw").count() == 1
    assert cat.read("log").count() == 0


def test_multi_commit_is_atomic_through_the_catalog(spark, tmp_path):
    """The hw-release transaction: bump hw_table AND append the log row
    in one publish. A catalog entry taken BEFORE the publish keeps
    serving the consistent old pair forever."""
    cat = _mk(spark, tmp_path)
    before = cat.latest_entry()
    e = cat.commit_multi({
        "hw": ("update", {"hw": "7"}, "case_id = 0"),
        "log": ("append", spark.createDataFrame(
            [(0, 0, 7)], "case_id long, previous long, current long")),
    })
    assert e == before + 1
    # new entry: both halves visible together
    assert cat.read("hw").collect()[0].hw == 7
    assert cat.read("log").count() == 1
    # old entry: NEITHER half visible (snapshot isolation)
    assert cat.read("hw", entry=before).collect()[0].hw == 0
    assert cat.read("log", entry=before).count() == 0
    # invariant a cross-table reader can rely on at ANY entry:
    # log rows == number of hw releases
    for entry in range(cat.latest_entry() + 1):
        pins = cat.snapshot(entry)
        if not {"hw", "log"} <= set(pins):
            continue                      # entry predates a table
        hw = cat.read("hw", entry=entry).collect()[0].hw
        n_log = cat.read("log", entry=entry).count()
        assert (hw == 0 and n_log == 0) or (hw == 7 and n_log == 1)


def test_unpinned_table_versions_stay_invisible(spark, tmp_path):
    """A writer that commits table versions but dies before publishing
    leaves the catalog view untouched (the Iceberg orphan-snapshot
    case) — direct table reads see them, catalog reads do not."""
    cat = _mk(spark, tmp_path)
    cat.table("hw").update_where({"hw": "99"}, "case_id = 0")   # no publish
    assert cat.table("hw").read().collect()[0].hw == 99         # direct
    assert cat.read("hw").collect()[0].hw == 0                  # catalog


def test_concurrent_multi_commits_merge_without_lost_pins(spark, tmp_path):
    """Two threads each run N hw-release transactions; every log row
    lands exactly once and the final catalog pins both tables at their
    newest versions (per-table max merge under pointer races)."""
    cat = _mk(spark, tmp_path)
    N = 4
    errs = []

    def worker(tag):
        try:
            for i in range(N):
                cat.commit_multi({
                    "hw": ("update", {"hw": "hw + 1"}, "case_id = 0"),
                    "log": ("append", spark.createDataFrame(
                        [(0, -1, tag * 100 + i)],
                        "case_id long, previous long, current long")),
                })
        except Exception as ex:              # noqa: BLE001
            errs.append(ex)

    ts = [threading.Thread(target=worker, args=(k,)) for k in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert cat.read("hw").collect()[0].hw == 2 * N
    log = cat.read("log")
    assert log.count() == 2 * N
    assert log.select("current").distinct().count() == 2 * N
    # pins match the tables' true latest versions
    pins = cat.snapshot()
    assert pins["hw"] == cat.table("hw").latest_version()
    assert pins["log"] == cat.table("log").latest_version()


def test_single_table_writers_compose_with_catalog(spark, tmp_path):
    """A direct writer's version becomes catalog-visible at the NEXT
    publish touching any table (pins merge forward, never backward)."""
    cat = _mk(spark, tmp_path)
    cat.table("log").append(spark.createDataFrame(
        [(9, 0, 1)], "case_id long, previous long, current long"))
    cat.commit_multi({"hw": ("update", {"hw": "1"}, "case_id = 0")})
    # hw advanced; log pin unchanged (the direct append stays unpinned
    # until something publishes log)
    assert cat.read("log").count() == 0
    cat.commit_multi({"log": ("append", spark.createDataFrame(
        [(9, 1, 2)], "case_id long, previous long, current long"))})
    assert cat.read("log").count() == 2


# --------------------- SQL transaction blocks through the catalog

def test_acid_sql_txn_publishes_atomically(spark, tmp_path):
    """BEGIN; UPDATE a; INSERT INTO b; COMMIT — both tables' new
    versions land in ONE catalog entry: no entry ever pins one side of
    the block without the other."""
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.merge_sql import acid_sql_txn

    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("hw", spark.createDataFrame(
        [(0, 0)], "case_id long, hw long"))
    cat.create_table("log", spark.createDataFrame(
        [], "case_id long, previous long, current long"))
    e = acid_sql_txn(spark, """
        BEGIN;
        UPDATE hw SET hw = 50 WHERE case_id = 0;
        INSERT INTO log VALUES (0, 0, 50);
        COMMIT;""", cat)
    pins = cat.snapshot(e)
    assert pins["hw"] == 1 and pins["log"] == 1
    assert cat.read("hw").collect()[0].hw == 50
    assert cat.read("log").count() == 1
    # list form, second release
    acid_sql_txn(spark, [
        "UPDATE hw SET hw = 90 WHERE case_id = 0",
        "INSERT INTO log VALUES (0, 50, 90)"], cat)
    for entry in range(cat.latest_entry() + 1):
        pins = cat.snapshot(entry)
        if {"hw", "log"} <= set(pins):
            hw = cat.read("hw", entry=entry).collect()[0].hw
            logmax = (cat.read("log", entry=entry)
                      .agg({"current": "max"}).collect()[0][0]) or 0
            assert hw == logmax                   # never torn


def test_acid_sql_txn_ctas_and_semicolon_in_string(spark, tmp_path):
    """CTAS inside a block joins the same catalog entry; the statement
    splitter honors quoted semicolons."""
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.merge_sql import acid_sql_txn

    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("src", spark.createDataFrame(
        [(1, "a;b"), (2, "c")], "id long, tag string"))
    e = acid_sql_txn(spark, """
        BEGIN;
        INSERT INTO src VALUES (3, 'x;y');
        CREATE TABLE derived AS SELECT COUNT(*) AS n FROM src;
        COMMIT;""", cat)
    pins = cat.snapshot(e)
    assert pins["src"] == 1 and pins["derived"] == 0
    assert cat.read("derived").collect()[0].n == 3
    assert cat.read("src").filter("tag = 'x;y'").count() == 1


def test_acid_sql_txn_empty_block_refused(spark, tmp_path):
    import pytest

    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.merge_sql import acid_sql_txn

    cat = AcidCatalog(spark, tmp_path / "cat")
    cat.create_table("t", spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="committed nothing"):
        acid_sql_txn(spark, "BEGIN; SELECT * FROM t; COMMIT;", cat)
