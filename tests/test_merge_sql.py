"""SQL MERGE INTO surface: clause coverage and ANSI cardinality rule."""
from __future__ import annotations

import pytest

from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.merge_sql import merge_into_sql, parse_merge


def _mk(spark, tmp_path, rows=((1, 10), (2, 20), (3, 30))):
    df = spark.createDataFrame(list(rows), "id long, val int")
    return AcidTable.create(spark, tmp_path / "t", df)


def _state(t):
    return {(r.id, r.val) for r in t.read().collect()}


def test_update_and_insert(spark, tmp_path):
    t = _mk(spark, tmp_path)
    spark.createDataFrame([(2, 99), (4, 40)], "id long, val int") \
        .createOrReplaceTempView("upd1")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING upd1 AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
    """, tables={"tgt": t})
    assert _state(t) == {(1, 10), (2, 99), (3, 30), (4, 40)}


def test_conditional_update_and_delete(spark, tmp_path):
    t = _mk(spark, tmp_path)
    spark.createDataFrame([(1, 0), (2, 5), (3, 7)], "id long, flag int") \
        .createOrReplaceTempView("upd2")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING upd2 AS s ON t.id = s.id
        WHEN MATCHED AND s.flag = 0 THEN DELETE
        WHEN MATCHED AND s.flag > 5 THEN UPDATE SET val = t.val + s.flag
    """, tables={"tgt": t})
    # id=1 deleted; id=2 matched but flag=5 satisfies neither clause
    # (unchanged); id=3 updated 30 + 7
    assert _state(t) == {(2, 20), (3, 37)}


def test_insert_only_merge_with_expression(spark, tmp_path):
    t = _mk(spark, tmp_path)
    spark.createDataFrame([(3, 1), (9, 2)], "id long, k int") \
        .createOrReplaceTempView("upd3")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING upd3 s ON t.id = s.id
        WHEN NOT MATCHED AND s.k > 1 THEN
          INSERT (id, val) VALUES (s.id, s.k * 100)
    """, tables={"tgt": t})
    # id=3 matched (no matched clause: untouched); id=9 inserted via expr
    assert _state(t) == {(1, 10), (2, 20), (3, 30), (9, 200)}


def test_subquery_source(spark, tmp_path):
    t = _mk(spark, tmp_path)
    spark.createDataFrame([(1, 1), (1, 2), (2, 7)], "id long, v int") \
        .createOrReplaceTempView("raw4")
    merge_into_sql(spark, """
        MERGE INTO tgt t
        USING (SELECT id, max(v) AS v FROM raw4 GROUP BY id) s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.v
    """, tables={"tgt": t})
    assert _state(t) == {(1, 2), (2, 7), (3, 30)}


def test_cardinality_violation_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    spark.createDataFrame([(2, 1), (2, 2)], "id long, val int") \
        .createOrReplaceTempView("upd5")
    with pytest.raises(ValueError, match="cardinality"):
        merge_into_sql(spark, """
            MERGE INTO tgt t USING upd5 s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET val = s.val
        """, tables={"tgt": t})
    assert _state(t) == {(1, 10), (2, 20), (3, 30)}   # nothing committed


def test_unmodified_columns_survive_insert_as_null(spark, tmp_path):
    df = spark.createDataFrame([(1, 10, "a")], "id long, val int, tag string")
    t = AcidTable.create(spark, tmp_path / "t", df)
    spark.createDataFrame([(2, 20)], "id long, val int") \
        .createOrReplaceTempView("upd6")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING upd6 s ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
    """, tables={"tgt": t})
    rows = {(r.id, r.val, r.tag) for r in t.read().collect()}
    assert rows == {(1, 10, "a"), (2, 20, None)}      # tag NULL-typed


def test_parse_rejects_malformed(spark):
    with pytest.raises(ValueError):
        parse_merge("SELECT 1")
    with pytest.raises(ValueError):
        parse_merge("MERGE INTO a t USING b s ON t.x = s.x "
                    "WHEN NOT MATCHED THEN UPDATE SET x = 1")


def test_not_matched_by_source_delete_and_update(spark, tmp_path):
    """SQL:2023 / Delta 2.4 clause pair: target rows with no source
    match can be deleted (full-snapshot sync) or flagged, in the same
    statement as the matched-side upsert."""
    t = _mk(spark, tmp_path)                      # {1:10, 2:20, 3:30}
    spark.createDataFrame([(2, 99), (4, 40)], "id long, val int") \
        .createOrReplaceTempView("snap7")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING snap7 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """, tables={"tgt": t})
    # target becomes exactly the source snapshot
    assert _state(t) == {(2, 99), (4, 40)}


def test_not_matched_by_source_conditional_update(spark, tmp_path):
    t = _mk(spark, tmp_path)                      # {1:10, 2:20, 3:30}
    spark.createDataFrame([(2, 0)], "id long, k int") \
        .createOrReplaceTempView("snap8")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING snap8 s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE AND t.val < 30 THEN
          UPDATE SET val = -1
    """, tables={"tgt": t})
    # id=1 target-only & val<30 -> flagged; id=3 target-only but val=30
    # (cond false) -> kept; id=2 matched, no matched clause -> kept
    assert _state(t) == {(1, -1), (2, 20), (3, 30)}


def test_by_source_insert_rejected(spark):
    with pytest.raises(ValueError, match="INSERT requires"):
        parse_merge("MERGE INTO a t USING b s ON t.x = s.x "
                    "WHEN NOT MATCHED BY SOURCE THEN "
                    "INSERT (x) VALUES (1)")
    with pytest.raises(ValueError, match="BY SOURCE/TARGET"):
        parse_merge("MERGE INTO a t USING b s ON t.x = s.x "
                    "WHEN MATCHED BY SOURCE THEN DELETE")


def test_acid_sql_version_as_of_and_dispatch(spark, tmp_path):
    """acid_sql front door: VERSION AS OF binds committed snapshots
    (both Delta and Iceberg spellings, several versions in one query),
    bare names bind the latest snapshot, MERGE INTO dispatches to the
    merge compiler, and unknown time-travel names raise."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = _mk(spark, tmp_path)                       # v0: {1:10,2:20,3:30}
    t.append(spark.createDataFrame([(4, 40)], "id long, val int"))  # v1
    got = {(r.version, r.n) for r in acid_sql(spark, """
        SELECT 0 AS version, COUNT(*) AS n FROM tbl VERSION AS OF 0
        UNION ALL
        SELECT 1, COUNT(*) FROM tbl FOR VERSION AS OF 1
        UNION ALL
        SELECT 2, COUNT(*) FROM tbl
    """, tables={"tbl": t}).collect()}
    assert got == {(0, 3), (1, 4), (2, 4)}

    v = acid_sql(spark, """
        MERGE INTO tbl t USING (SELECT 1 AS id, 99 AS val) s
        ON t.id = s.id WHEN MATCHED THEN UPDATE SET val = s.val
    """, tables={"tbl": t})
    assert v == 2 and _state(t) == {(1, 99), (2, 20), (3, 30), (4, 40)}

    with pytest.raises(ValueError, match="unregistered"):
        acid_sql(spark, "SELECT * FROM ghost VERSION AS OF 0",
                 tables={"tbl": t})


def test_update_and_delete_statements(spark, tmp_path):
    """acid_sql row-level DML: UPDATE is a CASE projection (matched rows
    take the SET expressions, NULL-predicate rows untouched), DELETE
    drops only predicate-TRUE rows (three-valued logic: NULL keeps)."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = spark.createDataFrame(
        [(1, 10, None), (2, 20, 5), (3, 30, 0)],
        "id long, val int, flag int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    v = acid_sql(spark, "UPDATE tbl SET val = val * 2 WHERE flag > 0",
                 tables={"tbl": t})
    assert v == 1
    rows = {(r.id, r.val) for r in t.read().collect()}
    assert rows == {(1, 10), (2, 40), (3, 30)}    # NULL flag untouched
    v = acid_sql(spark, "DELETE FROM tbl WHERE flag IS NULL",
                 tables={"tbl": t})
    assert v == 2
    assert {r.id for r in t.read().collect()} == {2, 3}
    # NULL predicate rows survive a different DELETE
    v = acid_sql(spark, "DELETE FROM tbl WHERE flag > 100",
                 tables={"tbl": t})
    assert {r.id for r in t.read().collect()} == {2, 3}
    assert {r.id for r in t.read(1).collect()} == {1, 2, 3}  # history

    import pytest
    with pytest.raises(ValueError, match="unknown column"):
        acid_sql(spark, "UPDATE tbl SET ghost = 1", tables={"tbl": t})
    with pytest.raises(ValueError, match="unknown UPDATE target"):
        acid_sql(spark, "UPDATE nope SET val = 1", tables={"tbl": t})


def test_cardinality_check_allows_duplicate_target_rows(spark, tmp_path):
    """The ANSI rule is per target ROW: two identical target rows each
    matching the same single source row is legal (each row matched
    once) — the check must key on row identity, not row values."""
    from spark_streaming_apps_spark.merge_sql import merge_into_sql

    df = spark.createDataFrame([(1, 10), (1, 10), (2, 20)],
                               "id long, val int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    spark.createDataFrame([(1, 99)], "id long, val int") \
        .createOrReplaceTempView("dup_tgt_src")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING dup_tgt_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
    """, tables={"tgt": t})
    rows = sorted((r.id, r.val) for r in t.read().collect())
    assert rows == [(1, 99), (1, 99), (2, 20)]


def test_maintenance_statements(spark, tmp_path):
    """DESCRIBE HISTORY / OPTIMIZE [ZORDER BY] / VACUUM RETAIN through
    the SQL front door — the Delta maintenance trio."""
    from spark_streaming_apps_spark.acid import VersionVacuumedError
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = spark.createDataFrame([(i, i % 3) for i in range(100)],
                               "id long, s int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    acid_sql(spark, "UPDATE tbl SET s = 9 WHERE id < 5", tables={"tbl": t})
    v = acid_sql(spark, "OPTIMIZE tbl ZORDER BY (id)", tables={"tbl": t})
    assert t._manifest(v)["op"] == "relayout"
    v = acid_sql(spark, "OPTIMIZE tbl", tables={"tbl": t})
    assert t._manifest(v)["op"] == "compact"
    hist = acid_sql(spark, "DESCRIBE HISTORY tbl", tables={"tbl": t})
    assert [r.op for r in hist.orderBy("version").collect()] == \
        ["create", "update_sql", "relayout", "compact"]
    acid_sql(spark, "VACUUM tbl RETAIN 1 VERSIONS", tables={"tbl": t})
    assert t.read().count() == 100                 # latest still serves
    import pytest
    with pytest.raises(VersionVacuumedError):
        t.read(0)


def test_merge_sql_prunes_touched_files(spark, tmp_path):
    """An equi-ON MERGE with no BY SOURCE clause takes the COW path:
    files sharing no join key with the source carry by reference."""
    df = spark.createDataFrame([(i, i) for i in range(400)],
                               "id long, val long")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.relayout(["id"], target_files=8)
    spark.createDataFrame([(100, 999), (5000, 1)], "id long, val long") \
        .createOrReplaceTempView("updp")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING updp AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
    """, tables={"tgt": t})
    rows = {r.id: r.val for r in t.read().collect()}
    assert len(rows) == 401
    assert rows[100] == 999 and rows[5000] == 1 and rows[7] == 7
    st = t.last_cow_stats
    assert st["files_linked"] > 0            # pruning actually happened
    assert st["files_rewritten"] < 8


def test_merge_sql_by_source_falls_back_to_full_rewrite(spark, tmp_path):
    """NOT MATCHED BY SOURCE acts on target rows everywhere — no
    pruning is sound, and the full-outer rewrite must still run."""
    df = spark.createDataFrame([(i, i) for i in range(100)],
                               "id long, val long")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.relayout(["id"], target_files=4)
    t.last_cow_stats = None
    spark.createDataFrame([(5, 50)], "id long, val long") \
        .createOrReplaceTempView("updnb")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING updnb AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN DELETE
    """, tables={"tgt": t})
    rows = {r.id: r.val for r in t.read().collect()}
    assert len(rows) == 90 and rows[5] == 50
    assert t.last_cow_stats is None          # COW path never ran


def test_merge_sql_non_equi_on_falls_back(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.last_cow_stats = None
    spark.createDataFrame([(2, 7)], "lo long, add int") \
        .createOrReplaceTempView("updne")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING updne AS s ON t.id >= s.lo
        WHEN MATCHED THEN UPDATE SET val = t.val + s.add
    """, tables={"tgt": t})
    assert _state(t) == {(1, 10), (2, 27), (3, 37)}
    assert t.last_cow_stats is None


def test_merge_sql_pruned_insert_only_into_empty_extent(spark, tmp_path):
    """Every source key misses the table: zero files rewritten, all
    rows inserted (empty_noop=False path through the SQL surface)."""
    df = spark.createDataFrame([(i, i) for i in range(40)],
                               "id long, val long")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.relayout(["id"], target_files=2)
    spark.createDataFrame([(1000, 1), (1001, 2)], "id long, val long") \
        .createOrReplaceTempView("updio")
    merge_into_sql(spark, """
        MERGE INTO tgt AS t USING updio AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
    """, tables={"tgt": t})
    assert t.read().count() == 42
    assert t.last_cow_stats == {"files_scanned": 2, "files_rewritten": 0, "files_linked": 2}


def test_bulk_delete_on_dv_table_takes_cow_path(spark, tmp_path):
    """Delta's large-delete rule through the SQL front door: on an
    enableDeletionVectors table, an unconditional DELETE (or one
    matching more than half the live rows) must NOT build a table-sized
    vector — it falls back to copy-on-write."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = spark.createDataFrame([(i, i % 5) for i in range(500)],
                               "id long, s long")
    t = AcidTable.create(spark, tmp_path / "t", df, enable_dv=True)
    # selective delete: MOR as before
    v = acid_sql(spark, "DELETE FROM tbl WHERE id < 10", tables={"tbl": t})
    assert t._manifest(v)["op"] == "delete_mor"
    assert t._manifest(v)["dv_rows"] == 10
    # bulk delete (matches ~80% of live rows): COW fallback, no vector
    v = acid_sql(spark, "DELETE FROM tbl WHERE s > 0", tables={"tbl": t})
    assert t._manifest(v)["op"] == "delete_mor_cow"
    assert "dv" not in t._manifest(v)
    assert t.read().count() == 98                 # s==0, id>=10
    # unconditional DELETE: straight to COW
    v = acid_sql(spark, "DELETE FROM tbl", tables={"tbl": t})
    assert t._manifest(v)["op"] == "delete_sql"
    assert t.read().count() == 0


def test_acid_sql_preserves_user_temp_view_sharing_table_name(
        spark, tmp_path):
    """The generic read path binds registered tables under uuid views:
    a pre-existing USER temp view that shares a registered table's name
    survives the statement untouched (it is neither shadow-read nor
    dropped)."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 100)], "id long, val long"))
    spark.createDataFrame([(77,)], "marker long") \
        .createOrReplaceTempView("shared_name")
    got = acid_sql(spark, "SELECT val FROM shared_name",
                   tables={"shared_name": t}).collect()
    assert [r.val for r in got] == [100]          # read the ACID table
    # the user's view is intact and still queryable afterwards
    assert spark.table("shared_name").collect()[0].marker == 77
    spark.catalog.dropTempView("shared_name")


def test_insert_sql_values_and_column_list(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 10.0, "a")],
                              "id long, val double, tag string"))
    tabs = {"tbl": t}
    acid_sql(spark, "INSERT INTO tbl VALUES (2, 20.5, 'b'), (3, 30.0, 'c')",
             tabs)
    assert t.read().count() == 3
    assert t._manifest(t.latest_version())["op"] == "append"
    # named column list NULL-fills the rest (ANSI)
    acid_sql(spark, "INSERT INTO tbl (id, tag) VALUES (4, 'd')", tabs)
    r = t.read().filter("id = 4").collect()[0]
    assert (r.val, r.tag) == (None, "d")
    # count mismatch / unknown column refused
    import pytest
    with pytest.raises(ValueError, match="column"):
        acid_sql(spark, "INSERT INTO tbl (id) VALUES (5, 6)", tabs)
    with pytest.raises(ValueError, match="unknown"):
        acid_sql(spark, "INSERT INTO tbl (ghost) VALUES (5)", tabs)


def test_ctas_and_insert_select_with_time_travel(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, i % 3) for i in range(30)],
                              "id long, s int"))
    tabs = {"tbl": t}
    t2 = acid_sql(spark, f"""
        CREATE TABLE agg PARTITIONED BY (s)
        LOCATION '{tmp_path / "agg"}' AS
        SELECT s, COUNT(*) AS n FROM tbl GROUP BY s""", tabs)
    assert t2.partition_cols() == ["s"]
    assert "agg" in tabs                          # registered for later
    assert {(r.s, r.n) for r in t2.read().collect()} == \
        {(0, 10), (1, 10), (2, 10)}
    t.delete_where("s = 2")                       # tbl moves on
    acid_sql(spark, """
        INSERT INTO agg SELECT s, COUNT(*) AS n
        FROM tbl VERSION AS OF 0 WHERE s = 2 GROUP BY s""", tabs)
    assert t2.read().count() == 4                 # pinned pre-delete
    assert t2.read().filter("s = 2").count() == 2
    # CTAS without LOCATION or base_dir refuses
    import pytest
    with pytest.raises(ValueError, match="LOCATION"):
        acid_sql(spark, "CREATE TABLE x AS SELECT 1 AS a", tabs)


def test_alter_table_add_column_is_pure_metadata(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 2)], "id long, s int"))
    before = t._manifest(t.latest_version())["data"]
    v = acid_sql(spark, "ALTER TABLE tbl ADD COLUMN score double", tabs := {"tbl": t})
    m = t._manifest(v)
    assert m["op"] == "add_column" and m["data"] == before
    assert t.read().columns == ["id", "s", "score"]
    assert t.read().collect()[0].score is None
    # older version keeps its narrower schema (time travel exact)
    assert t.read(v - 1).columns == ["id", "s"]
    # appends carry the widened schema; duplicate add refused
    acid_sql(spark, "INSERT INTO tbl VALUES (2, 3, 1.5)", tabs)
    assert t.read().filter("id = 2").collect()[0].score == 1.5
    import pytest
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("SCORE", "int")


def test_merge_star_shorthands(spark, tmp_path):
    """Delta's UPDATE SET * / INSERT *: every target column takes the
    source's same-named column."""
    from spark_streaming_apps_spark.merge_sql import (
        merge_into_sql, parse_merge)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")],
                              "id long, val long, tag string"))
    spark.createDataFrame([(2, 99, "B"), (3, 30, "c")],
                          "id long, val long, tag string") \
        .createOrReplaceTempView("star_src")
    merge_into_sql(spark, """
        MERGE INTO tgt t USING star_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
    """, tables={"tgt": t})
    got = {(r.id, r.val, r.tag) for r in t.read().collect()}
    assert got == {(1, 10, "a"), (2, 99, "B"), (3, 30, "c")}
    import pytest
    with pytest.raises(ValueError, match="BY SOURCE"):
        parse_merge("""
            MERGE INTO tgt t USING star_src s ON t.id = s.id
            WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *
        """)


def test_table_changes_tvf_and_restore_timestamp(spark, tmp_path):
    """Delta parity: SELECT ... FROM table_changes('t', a[, b]) binds
    the change feed; RESTORE TABLE ... TO TIMESTAMP AS OF resolves
    through commit timestamps."""
    import time

    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0), (2, 0)], "id long, s int"),
        enable_cdf=True)
    t.append(spark.createDataFrame([(3, 1)], "id long, s int"))   # v1
    ts_mid = time.time()
    time.sleep(0.05)
    t.delete_where("id = 1")                                      # v2
    got = acid_sql(spark, """
        SELECT _change_type, COUNT(*) AS n
        FROM table_changes('tbl', 0) GROUP BY _change_type
    """, {"tbl": t}).collect()
    assert {(r._change_type, r.n) for r in got} == \
        {("insert", 1), ("delete", 1)}
    # bounded range
    one = acid_sql(spark, "SELECT COUNT(*) AS n FROM "
                          "table_changes('tbl', 0, 1)",
                   {"tbl": t}).collect()[0].n
    assert one == 1
    # restore to the instant between v1 and v2
    import datetime
    iso = datetime.datetime.fromtimestamp(ts_mid).isoformat()
    v = acid_sql(spark,
                 f"RESTORE TABLE tbl TO TIMESTAMP AS OF '{iso}'",
                 {"tbl": t})
    assert t._manifest(v)["op"] == "restore"
    assert t.read().count() == 3                  # v1 state is back
    import pytest
    with pytest.raises(ValueError, match="unregistered"):
        acid_sql(spark, "SELECT * FROM table_changes('ghost', 0)",
                 {"tbl": t})


def test_read_sql_rewrites_only_table_positions(spark, tmp_path):
    """ADVICE r8: the generic read path's name binding must be
    quote-aware and position-aware — a column sharing the table's
    name, a string literal mentioning it, and a CTE shadowing it are
    NOT table references and must survive untouched."""
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.merge_sql import acid_sql

    # table named `hw` WITH a column named `hw`
    t = AcidTable.create(
        spark, tmp_path / "hw",
        spark.createDataFrame([(1, 100), (2, 200)], "id long, hw long"))
    got = acid_sql(spark, "SELECT hw FROM hw WHERE id = 2",
                   tables={"hw": t}).collect()
    assert [r.hw for r in got] == [200]

    # string literal containing the table name must not be rewritten
    got = acid_sql(spark,
                   "SELECT id, 'see hw docs' AS note FROM hw",
                   tables={"hw": t}).collect()
    assert sorted(r.note for r in got) == ["see hw docs"] * 2

    # a CTE named like the table shadows it (standard SQL scoping)
    got = acid_sql(spark, """
        WITH hw AS (SELECT 7 AS id)
        SELECT id FROM hw
    """, tables={"hw": t}).collect()
    assert [r.id for r in got] == [7]

    # FROM-list commas and joins still bind every real reference
    u = AcidTable.create(
        spark, tmp_path / "u",
        spark.createDataFrame([(1, "a")], "id long, tag string"))
    got = acid_sql(spark, """
        SELECT h.id, u.tag FROM hw h JOIN u ON h.id = u.id
    """, tables={"hw": t, "u": u}).collect()
    assert [(r.id, r.tag) for r in got] == [(1, "a")]


def test_cte_self_reference_resolves_to_outer_table(spark, tmp_path):
    """ADVICE r9: a (non-recursive) CTE's name is visible only AFTER
    its own body closes — `WITH hw AS (SELECT ... FROM hw)` reads the
    REGISTERED table inside the body (standard SQL scoping), while the
    outer query reads the CTE. A registered name used as a QUALIFIER
    (`hw.tbl`) must pass through untouched, not be mangled."""
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "hw",
        spark.createDataFrame([(1, 100), (2, 200), (3, 300)],
                              "id long, v long"))
    # self-named CTE: inner `hw` = registered table, outer `hw` = CTE
    got = acid_sql(spark, """
        WITH hw AS (SELECT id, v FROM hw WHERE v > 100)
        SELECT count(*) AS n, sum(v) AS s FROM hw
    """, tables={"hw": t}).collect()
    assert (got[0].n, got[0].s) == (2, 500)
    # column-list CTE spelling binds the same way
    got = acid_sql(spark, """
        WITH hw(a, b) AS (SELECT id, v FROM hw WHERE v >= 200)
        SELECT max(b) AS m FROM hw
    """, tables={"hw": t}).collect()
    assert got[0].m == 300
    # a later CTE sees the earlier one, not the table
    got = acid_sql(spark, """
        WITH a AS (SELECT v FROM hw WHERE id = 1),
             b AS (SELECT v + 1 AS v FROM a)
        SELECT v FROM b
    """, tables={"hw": t}).collect()
    assert [r.v for r in got] == [101]
    # registered name as a QUALIFIER is NOT a table reference: the
    # rewriter must restore the original token when the '.' arrives,
    # never emit the invalid `V_hw AS hw.tbl`
    from spark_streaming_apps_spark.merge_sql import _rewrite_table_refs
    out = _rewrite_table_refs("SELECT * FROM hw.tbl",
                              ["hw"], lambda n: "V_" + n)
    assert out == "SELECT * FROM hw.tbl"
    out = _rewrite_table_refs(
        "SELECT * FROM hw.tbl t JOIN hw ON t.k = hw.k",
        ["hw"], lambda n: "V_" + n)
    assert out == "SELECT * FROM hw.tbl t JOIN V_hw AS hw ON t.k = hw.k"
