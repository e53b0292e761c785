"""Partition columns on AcidTable (Iceberg-style: one partition tuple
per data file, tracked in the MANIFEST, never in paths): partition-first
pruning in the DML find pass, MERGE, pruned_files, and the acidtable
DataSource split planner; the one-way door rules (no UPDATE of a
partition column)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import (
    AcidTable, _partition_pins, _pins_match)


def _mk(spark, path, n=400, nb=4):
    df = spark.createDataFrame(
        [(i, i % nb, f"t{i % nb}") for i in range(n)],
        "id long, bucket int, tag string")
    return AcidTable.create(spark, path, df.repartition(nb, "bucket"),
                            partition_by=["bucket"])


def test_create_records_partition_tuples(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.partition_cols() == ["bucket"]
    files = t._manifest(0)["files"]
    assert len(files) == 4                        # one file per bucket
    assert sorted(f["partition"]["bucket"] for f in files) == [0, 1, 2, 3]
    # partition columns STAY in the data files — reads never
    # reconstruct values from paths
    assert t.read().count() == 400
    assert t.read().filter("bucket = 2").count() == 100


def test_append_keeps_single_tuple_invariant(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(spark.createDataFrame(
        [(1000 + i, i % 2, "x") for i in range(20)],
        "id long, bucket int, tag string"))
    files = t._manifest(1)["files"]
    assert len(files) == 6                        # 4 linked + 2 new
    assert all("partition" in f for f in files)
    assert t.read().count() == 420


def test_delete_find_pass_scans_pinned_partition_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(spark.createDataFrame(
        [(1000 + i, i % 4, "x") for i in range(40)],
        "id long, bucket int, tag string").repartition(4, "bucket"))
    # 8 files total, 2 per bucket; the pinned predicate must scan 2
    v = t.delete_where("bucket = 1 AND id < 50")
    assert t.last_cow_stats["files_scanned"] == 2
    assert t.last_cow_stats["files_rewritten"] == 1
    assert t.last_cow_stats["files_linked"] == 7
    assert t._manifest(v)["op"] == "delete"
    assert t.read().filter("bucket = 1 AND id < 50").count() == 0
    assert t.read().count() == 440 - 13  # ids 1,5,...,49 in bucket 1


def test_delete_pinned_to_absent_partition_is_metadata_noop(
        spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = t._manifest(0)["data"]
    v = t.delete_where("bucket = 99")
    assert t.last_cow_stats["files_scanned"] == 0  # nothing opened
    assert t._manifest(v)["data"] == before        # shares parent dir
    assert t.read().count() == 400


def test_update_pinned_partition_and_forbidden_partition_assign(
        spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update_where({"tag": "'hit'"}, "bucket = 2 AND id >= 200")
    assert t.last_cow_stats["files_scanned"] == 1
    assert t.read().filter("tag = 'hit'").count() == \
        t.read().filter("bucket = 2 AND id >= 200").count() > 0
    with pytest.raises(ValueError, match="partition column"):
        t.update_where({"bucket": "bucket + 1"}, "id = 0")


def test_merge_pruned_partition_discipline(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    up = spark.createDataFrame(
        [(1, 1, "upd"), (9999, 3, "ins")],
        "id long, bucket int, tag string")
    t.merge_pruned(up, key=["id", "bucket"])
    # batch touches buckets {1, 3} -> 2 of 4 files scanned
    assert t.last_cow_stats["files_scanned"] == 2
    assert t.read().filter("id = 1").collect()[0].tag == "upd"
    assert t.read().filter("id = 9999").count() == 1


def test_pruned_files_partition_value_decides_first(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    paths, total = t.pruned_files("bucket", 2, 3)
    assert (len(paths), total) == (2, 4)
    # range read equals exact filter
    got = {r.id for r in t.read_range("bucket", 2, 3).collect()}
    want = {r.id for r in t.read().filter("bucket BETWEEN 2 AND 3")
            .collect()}
    assert got == want


def test_datasource_split_planner_prunes_by_partition(spark, tmp_path):
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    t = _mk(spark, tmp_path / "t")
    spark.dataSource.register(AcidTableDataSource)
    df = (spark.read.format("acidtable")
          .option("path", str(tmp_path / "t"))
          .option("col", "bucket").option("lo", "1").option("hi", "1")
          .load())
    assert df.rdd.getNumPartitions() == 1         # 1 split of 4 files
    assert df.filter("bucket = 1").count() == 100


def test_string_partition_values_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["us", "eu", "ap"][i % 3]) for i in range(90)],
        "id long, region string")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(3, "region"),
                         partition_by=["region"])
    parts = {f["partition"]["region"] for f in t._manifest(0)["files"]}
    assert parts == {"us", "eu", "ap"}
    t.delete_where("region = 'eu' AND id < 10")
    assert t.last_cow_stats["files_scanned"] == 1
    assert t.read().count() == 90 - 3             # ids 1, 4, 7 in eu
    assert t.read().filter("region = 'eu'").count() == 27


def test_full_rewrite_ops_preserve_partition_metadata(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.compact(target_files=1)                     # full rewrite
    files = t._manifest(t.latest_version())["files"]
    # partitioned write re-splits by tuple: still one tuple per file
    assert all("partition" in f for f in files)
    assert sorted(f["partition"]["bucket"] for f in files) == [0, 1, 2, 3]
    assert t.read().count() == 400


def test_mor_delete_scans_pinned_partition_only(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 4, f"t{i}") for i in range(400)],
        "id long, bucket int, tag string")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(4, "bucket"),
                         partition_by=["bucket"], enable_dv=True)
    v = t.delete_where_mor("bucket = 3 AND id < 20")
    assert t._manifest(v)["op"] == "delete_mor"
    assert t.read().filter("bucket = 3 AND id < 20").count() == 0
    assert t.read().count() == 395                # ids 3,7,11,15,19
    # no-match pinned partition: metadata no-op, no scan error
    v2 = t.delete_where_mor("bucket = 77")
    assert t.read().count() == 395
    assert t._manifest(v2)["op"] == "delete_mor"


def test_clone_carries_partitioning(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    c = t.clone(tmp_path / "c")
    assert c.partition_cols() == ["bucket"]
    c.delete_where("bucket = 0")
    assert c.last_cow_stats["files_scanned"] == 1
    assert c.read().count() == 300
    assert t.read().count() == 400                # histories forked


def test_partition_pins_parser_conservative():
    pc = ["bucket", "region"]
    assert _partition_pins("bucket = 3 AND id < 9", pc) == {"bucket": 3}
    assert _partition_pins("region = 'eu' AND 2 = bucket", pc) == \
        {"region": "eu", "bucket": 2}
    # OR / parenthesized / range terms never pin
    assert _partition_pins("bucket = 1 OR bucket = 2", pc) is None
    assert _partition_pins("(bucket = 1) AND id = 5", pc) is None
    assert _partition_pins("bucket > 2", pc) is None
    # hypothesis-found: an UN-parenthesized top-level OR means the AND
    # fragments are not conjuncts of the whole predicate (precedence);
    # pinning from them pruned wrongly — must disable pruning entirely
    assert _partition_pins("bucket = 0 AND bucket = 0 OR bucket = 1",
                           pc) is None
    assert _partition_pins("bucket = 3 AND id < 5 OR region = 'eu'",
                           pc) is None
    # ...but a quoted 'or'/'and' inside a string literal is just data
    assert _partition_pins("region = 'a or b' AND bucket = 2", pc) == \
        {"region": "a or b", "bucket": 2}
    assert _partition_pins("region = 'x and y'", pc) == \
        {"region": "x and y"}
    # parenthesized OR keeps the other conjuncts pinnable
    assert _partition_pins("(id = 1 OR id = 2) AND bucket = 3", pc) == \
        {"bucket": 3}
    # files without partition metadata are conservatively kept
    assert _pins_match(None, {"bucket": 1})
    assert _pins_match({}, {"bucket": 1})
    assert not _pins_match({"bucket": 2}, {"bucket": 1})
    assert _pins_match({"region": "eu"}, {"bucket": 1})


def test_show_partitions_and_describe_detail(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(300)],
        "id long, bucket int, val double")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(3, "bucket"),
                         partition_by=["bucket"], enable_dv=True)
    t.delete_where_mor("bucket = 1 AND id < 30")
    got = {(r.bucket, r.n_files, r.n_rows) for r in
           acid_sql(spark, "SHOW PARTITIONS tbl",
                    {"tbl": t}).collect()}
    assert got == {(0, 1, 100), (1, 1, 90), (2, 1, 100)}
    d = acid_sql(spark, "DESCRIBE DETAIL tbl", {"tbl": t}).collect()[0]
    assert d.version == 1 and d.n_files == 3 and d.n_rows == 290
    assert d.partition_by == ["bucket"]
    assert d.dv_enabled and not d.cdf_enabled
    assert d.size_bytes > 0
    import pytest
    with pytest.raises(ValueError, match="not partitioned"):
        AcidTable.create(
            spark, tmp_path / "u",
            spark.createDataFrame([(1,)], "id long")).partitions()


def test_stream_sink_into_partitioned_table_keeps_invariant(
        spark, tmp_path):
    """The acidtable sink on a partitioned table splits each task's
    rows by tuple — sink-written files carry partition metadata, so
    pruning keeps working over streamed data."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    src = tmp_path / "src"
    src.mkdir()
    duckdb.sql(f"""
        COPY (SELECT CAST(range AS BIGINT) AS id,
                     CAST(range % 3 AS INT) AS bucket
              FROM range(0, 90))
        TO '{src}/f0.parquet' (FORMAT PARQUET)""")
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "id long, bucket int"),
        partition_by=["bucket"])
    spark.dataSource.register(AcidTableDataSource)
    q = (spark.readStream.schema("id long, bucket int")
         .parquet(str(src))
         .writeStream.format("acidtable")
         .option("path", str(tmp_path / "t")).option("appId", "pS")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    files = t._manifest(t.latest_version())["files"]
    assert all(f.get("partition") is not None for f in files)
    assert {f["partition"]["bucket"] for f in files} == {0, 1, 2}
    assert t.read().count() == 90
    # pruning works over the sink-written files
    t.delete_where("bucket = 1 AND id < 10")
    assert t.last_cow_stats["files_scanned"] < len(files)
    assert t.read().count() == 90 - 3             # ids 1, 4, 7 under 10


def test_partition_spec_evolution(spark, tmp_path):
    """set_partition_by: pure-metadata spec change for FUTURE writes —
    old files keep their recorded tuples (mixed-spec pruning stays
    per-file and conservative), new appends follow the new spec."""
    df = spark.createDataFrame(
        [(i, i % 4, i % 2) for i in range(200)],
        "id long, bucket int, half int")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(4, "bucket"),
                         partition_by=["bucket"])
    before = t._manifest(t.latest_version())["data"]
    v = t.set_partition_by(["half"])
    m = t._manifest(v)
    assert m["op"] == "set_partition_by" and m["data"] == before
    assert t.partition_cols() == ["half"]
    t.append(spark.createDataFrame([(1000, 0, 0), (1001, 1, 1)],
                                   "id long, bucket int, half int"))
    files = t._manifest(t.latest_version())["files"]
    new = [f for f in files if "half" in (f.get("partition") or {})]
    old = [f for f in files if "bucket" in (f.get("partition") or {})]
    assert len(new) == 2 and len(old) == 4        # mixed specs coexist
    # pruning on the NEW spec: old files conservatively kept
    v = t.delete_where("half = 1 AND id >= 1000")
    assert t.last_cow_stats["files_scanned"] == 5  # 4 old + 1 new
    assert t.read().count() == 201
    # un-partition future writes
    t.set_partition_by(None)
    assert t.partition_cols() == []
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_by(["ghost"])


def test_compact_partition_scoped_maintenance(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = _mk(spark, tmp_path / "t")
    # three appends -> bucket files pile up
    for i in range(3):
        t.append(spark.createDataFrame(
            [(2000 + 10 * i + j, j % 2, "x") for j in range(10)],
            "id long, bucket int, tag string"))
    files = t._manifest(t.latest_version())["files"]
    b0 = [f for f in files if f["partition"]["bucket"] == 0]
    assert len(b0) == 4                           # 1 create + 3 appends
    n_before = t.read().count()
    v = acid_sql(spark, "OPTIMIZE tbl WHERE bucket = 0", {"tbl": t})
    m = t._manifest(v)
    assert m["op"] == "compact_partition"
    after = m["files"]
    b0_after = [f for f in after if f["partition"]["bucket"] == 0]
    b1_after = [f for f in after if f["partition"]["bucket"] == 1]
    assert len(b0_after) == 1                     # compacted
    assert len(b1_after) == 4                     # untouched, carried
    assert t.last_cow_stats["files_scanned"] == 4  # only bucket 0's
    assert t.read().count() == n_before           # rows unchanged
    with pytest.raises(ValueError, match="pin partition"):
        acid_sql(spark, "OPTIMIZE tbl WHERE id < 10", {"tbl": t})
    # round 12: scoped ZORDER/CLUSTER BY is now supported; a scoped
    # SINGLE-column ZORDER still refuses, pointing at CLUSTER BY
    with pytest.raises(ValueError, match="CLUSTER BY"):
        acid_sql(spark, "OPTIMIZE tbl ZORDER BY (id) WHERE bucket = 0",
                 {"tbl": t})


def test_compact_partition_cdf_and_stream_transparent(spark, tmp_path):
    """compact_partition records an EMPTY change set on CDF tables and
    is skipped silently by the appends-only table stream."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource)

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(40)], "id long, bucket int")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(2, "bucket"),
                         partition_by=["bucket"], enable_cdf=True)
    t.append(spark.createDataFrame([(100, 0)], "id long, bucket int"))
    v = t.compact_partition({"bucket": 0}, target_files=1)
    assert t.read_changes(v - 1, v).count() == 0  # layout-only
    spark.dataSource.register(AcidTableStreamDataSource)
    q = (spark.readStream.format("acidtable-stream")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("ts_cp").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table("ts_cp").count() == 41     # no dup from compact


# ------------- property: partition pruning can never change results

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ATOMS = [
    lambda d: f"bucket = {d.draw(st.integers(-1, 6))}",
    lambda d: f"{d.draw(st.integers(0, 4))} = bucket",
    lambda d: f"id < {d.draw(st.integers(0, 500))}",
    lambda d: f"id >= {d.draw(st.integers(0, 500))}",
    lambda d: f"bucket > {d.draw(st.integers(-1, 4))}",
    lambda d: (f"bucket = {d.draw(st.integers(0, 3))} OR "
               f"bucket = {d.draw(st.integers(0, 3))}"),
    lambda d: f"(bucket = {d.draw(st.integers(0, 3))} AND id < 100)",
    lambda d: f"tag = 't{d.draw(st.integers(0, 4))}'",
    lambda d: "bucket IS NULL",
]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_partition_pruned_find_pass_equals_full_scan(
        spark, tmp_path_factory, data):
    """For ANY predicate the pins parser sees, the partition-pruned
    find scan must select exactly the rows the full scan selects —
    pruning may open fewer files, never lose (or invent) a match."""
    import spark_streaming_apps_spark.acid as A

    global _PROP_T
    try:
        t = _PROP_T
    except NameError:
        d = tmp_path_factory.mktemp("pprop")
        df = spark.createDataFrame(
            [(i, i % 4, f"t{i % 5}") for i in range(400)],
            "id long, bucket int, tag string")
        t = _PROP_T = AcidTable.create(
            spark, d / "t", df.repartition(4, "bucket"),
            partition_by=["bucket"])
    n_atoms = data.draw(st.integers(1, 3))
    cond = " AND ".join(
        data.draw(st.sampled_from(_ATOMS))(data) for _ in range(n_atoms))
    m = t._manifest(t.latest_version())
    pins = A._partition_pins(cond, t.partition_cols())
    full = t._mor_scan(m).filter(cond).count()
    pruned = t._mor_scan(m, pins=pins).filter(cond).count()
    assert pruned == full, f"pruning changed the result for {cond!r}"


def test_concurrent_partitioned_writers_serialize(spark, tmp_path):
    """Racing appends + a pinned DELETE on a PARTITIONED table: the
    optimistic loop serializes them, partition staging re-runs on every
    retry, no batch is lost or doubled, and every surviving file still
    records its tuple."""
    import threading

    t = _mk(spark, tmp_path / "t")
    errs = []

    def appender(w):
        try:
            for i in range(3):
                t2 = AcidTable(spark, tmp_path / "t")
                t2.append(spark.createDataFrame(
                    [(10_000 * (w + 1) + 10 * i + j, j % 4, f"w{w}")
                     for j in range(8)],
                    "id long, bucket int, tag string"))
        except Exception as e:                     # noqa: BLE001
            errs.append(e)

    def deleter():
        try:
            AcidTable(spark, tmp_path / "t").delete_where(
                "bucket = 2 AND id < 100")
        except Exception as e:                     # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(w,))
               for w in range(3)] + [threading.Thread(target=deleter)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    # 400 base - deleted band (bucket 2, id<100 -> 25 ids) + 3x3x8
    assert t.read().count() == 400 - 25 + 72
    assert t.read().filter("bucket = 2 AND id < 100").count() == 0
    files = t._manifest(t.latest_version())["files"]
    assert all("partition" in f for f in files)
    # every appended batch present exactly once
    for w in range(3):
        assert t.read().filter(f"tag = 'w{w}'").count() == 24


def test_merge_no_prune_when_partition_not_in_key(spark, tmp_path):
    """ADVICE r8: merging on a key that does NOT include the partition
    columns must not prune the find pass to the batch's partition
    tuples — the matching target row can live in a partition the batch
    doesn't name (its partition value is data, not identity). Pruning
    made merge_pruned insert a duplicate-key row and merge_mor
    silently drop the update."""
    t = _mk(spark, tmp_path / "t")          # partitioned by bucket
    # target row id=5 lives in bucket 1; the update batch claims
    # bucket 3 for it (bucket is a VALUE column under key=["id"])
    up = spark.createDataFrame([(5, 3, "moved")],
                               "id long, bucket int, tag string")
    t.merge_pruned(up, key=["id"])
    got = t.read().filter("id = 5").collect()
    assert len(got) == 1                    # no duplicate-key row
    assert (got[0].bucket, got[0].tag) == (3, "moved")

    t2 = _mk(spark, tmp_path / "t2")
    up2 = spark.createDataFrame([(6, 3, "moved2")],
                                "id long, bucket int, tag string")
    t2.merge_mor(up2, key=["id"])
    got2 = t2.read().filter("id = 6").collect()
    assert len(got2) == 1                   # update applied, not dropped
    assert (got2[0].bucket, got2[0].tag) == (3, "moved2")
    assert t2.last_mor_stats["rows_updated"] == 1
    assert t2.last_mor_stats["rows_inserted"] == 0


def test_merge_still_prunes_when_partition_in_key(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    up = spark.createDataFrame([(1, 1, "upd")],
                               "id long, bucket int, tag string")
    t.merge_pruned(up, key=["id", "bucket"])
    assert t.last_cow_stats["files_scanned"] == 1   # pruned to bucket 1


def test_string_partition_values_keep_their_type(spark, tmp_path):
    """ADVICE r8: partition values are coerced by the column's DECLARED
    type, never re-guessed from the directory string — string '007'
    must stay '007' (int-guessing recorded 7, and DELETE WHERE
    c='007' then pruned away its own file, deleting nothing)."""
    df = spark.createDataFrame(
        [(i, "007" if i % 2 else "1.50", "x") for i in range(40)],
        "id long, code string, tag string")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(2, "code"),
                         partition_by=["code"])
    vals = sorted(f["partition"]["code"]
                  for f in t._manifest(0)["files"])
    assert vals == ["007", "1.50"]          # strings, not 7 / 1.5
    t.delete_where("code = '007'")
    assert t.last_cow_stats["files_scanned"] == 1
    assert t.read().filter("code = '007'").count() == 0
    assert t.read().count() == 20


def test_boolean_partition_values_round_trip(spark, tmp_path):
    """Boolean partitions: recorded as real bools so batch-tuple
    pruning (str(True)='True' vs dir 'true') can never prune every
    file and silently no-op a MERGE."""
    df = spark.createDataFrame(
        [(i, i % 2 == 0, "x") for i in range(20)],
        "id long, flag boolean, tag string")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(2, "flag"),
                         partition_by=["flag"])
    assert sorted(f["partition"]["flag"]
                  for f in t._manifest(0)["files"]) == [False, True]
    up = spark.createDataFrame([(2, True, "upd")],
                               "id long, flag boolean, tag string")
    t.merge_pruned(up, key=["id", "flag"])
    assert t.last_cow_stats["files_scanned"] == 1
    got = t.read().filter("id = 2").collect()
    assert len(got) == 1 and got[0].tag == "upd"
    parts = {(r.flag, r.n_rows) for r in t.partitions().collect()}
    assert parts == {(True, 10), (False, 10)}


def test_legacy_misguessed_partition_values_repaired_at_load(
        spark, tmp_path):
    """ADVICE r9: manifests written before typed parsing recorded
    shape-guessed values (string '007' as int 7, '1.50' as float 1.5).
    _manifest() repairs them against the DECLARED schema at load time:
    string-typed columns DROP the unrecoverable guess (absent = kept
    by every pruner, so DML can never silently no-op), numeric-typed
    columns re-coerce stored strings losslessly. partitions() and
    DELETE on such tables work again."""
    import json

    df = spark.createDataFrame(
        [(1, "007"), (2, "007"), (3, "100")], "id long, code string")
    t = AcidTable.create(spark, tmp_path / "t",
                         df.repartition(2, "code"),
                         partition_by=["code"])
    # corrupt the manifest the way the pre-fix parser did: '007' -> 7
    mp = t._manifests / "v0.json"
    m = json.loads(mp.read_text())
    for f in m["files"]:
        if f["partition"].get("code") == "007":
            f["partition"]["code"] = 7            # legacy guess
    mp.write_text(json.dumps(m))
    # loader drops the unrecoverable value -> file conservatively kept
    loaded = t._manifest(0)
    assert all("code" not in f["partition"] or
               isinstance(f["partition"]["code"], str)
               for f in loaded["files"])
    # partitions() no longer crashes on the int-in-string-column value
    assert t.partitions().count() >= 1
    # DELETE WHERE code='007' finds its rows (no silent prune-away)
    t.delete_where("code = '007'")
    assert t.read().count() == 1
    assert t.read().collect()[0].id == 3

    # numeric declared type with a stored STRING re-coerces losslessly
    df2 = spark.createDataFrame([(1, 7), (2, 8)], "id long, b int")
    t2 = AcidTable.create(spark, tmp_path / "t2",
                          df2.repartition(2, "b"), partition_by=["b"])
    mp2 = t2._manifests / "v0.json"
    m2 = json.loads(mp2.read_text())
    for f in m2["files"]:
        f["partition"]["b"] = str(f["partition"]["b"])   # legacy string
    mp2.write_text(json.dumps(m2))
    assert sorted(f["partition"]["b"] for f in t2._manifest(0)["files"]) \
        == [7, 8]
    t2.delete_where("b = 7")
    assert [r.b for r in t2.read().collect()] == [8]


def test_vacuum_keep_last_zero_clamped_to_latest(spark, tmp_path):
    """ADVICE r9: `VACUUM t RETAIN 0 VERSIONS` (keep_last=0) must still
    retain the latest version's files — read() skips the existence
    probe for the latest snapshot on that contract."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(1,)], "id long"))
    t.update_where({"id": "id + 10"}, "id >= 0")   # COW: v0 orphans
    acid_sql(spark, "VACUUM tbl RETAIN 0 VERSIONS", {"tbl": t})
    assert [r.id for r in t.read().collect()] == [11]


def test_range_predicate_partition_pruning(spark, tmp_path):
    """Retention DELETE (`day < cutoff`) prunes the FIND pass to the
    matching partitions by metadata — the range extension of the
    equality-pin fast path (the canonical 100-TB DML shape)."""
    import pyspark.sql.functions as F

    from spark_streaming_apps_spark.acid import AcidTable

    df = (spark.range(0, 40_000)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 8).alias("day"),
                  F.floor(F.col("id") / 8).alias("v")))
    t = AcidTable.create(spark, tmp_path / "t", df,
                         partition_by=["day"])
    n_parts = 8
    v = t.delete_where("day < 2")
    st = t.last_cow_stats
    # find pass opened ONLY the 2 matching partitions' files
    assert st["files_scanned"] < st["files_scanned"] + 1  # present
    total = len(t._manifest(0)["files"])
    per_part = total // n_parts
    assert st["files_scanned"] <= 2 * per_part + 1, st
    assert {r.day for r in t.read().collect()} == set(range(2, 8))

    # mixed conjuncts: only the partition-only conjunct prunes, the
    # residual still applies exactly
    t.delete_where("day >= 6 AND v % 2 = 0")
    st = t.last_cow_stats
    assert st["files_scanned"] <= 2 * per_part + 1, st
    got = {(r.day, r.v % 2) for r in t.read().collect()}
    assert (6, 0) not in got and (7, 0) not in got
    assert (6, 1) in got and (7, 1) in got   # odd-v rows survive

    # an OR mixing partition and data columns must NOT prune (sound:
    # a row in any partition could match) — and still answers right
    before = t.read().count()
    t.delete_where("day = 5 OR v = 9")     # v=9 -> k in 72..79, all days
    st = t.last_cow_stats
    assert st["files_scanned"] >= 6 * per_part - 1, st  # no false prune
    after = {(r.k, r.day) for r in t.read().collect()}
    assert all(d != 5 for _, d in after)
    assert (75, 3) not in after            # v=9 victim outside day 5
    assert before - t.read().count() > 0

    # column-free / nondeterministic conjuncts never prune
    t.update_where({"v": "v + 1"}, "rand() < 2.0 AND day >= 0")
    assert t.read().count() > 0


def test_range_predicate_pruning_mor_paths(spark, tmp_path):
    """The MOR find scans share the range partition prune."""
    import pyspark.sql.functions as F

    from spark_streaming_apps_spark.acid import AcidTable

    df = (spark.range(0, 8_000)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 4).alias("day"),
                  F.floor(F.col("id") / 4).alias("v")))
    t = AcidTable.create(spark, tmp_path / "t", df,
                         partition_by=["day"], enable_dv=True)
    t.delete_where_mor("day < 1 AND v < 10")
    assert t.read().filter("day < 1 AND v < 10").count() == 0
    assert t.read().count() == 8_000 - 10
    t.update_where_mor({"v": "v + 1000000"}, "day >= 3 AND v < 5")
    assert t.read().filter("v >= 1000000").count() == 5
    assert t.read().count() == 8_000 - 10
