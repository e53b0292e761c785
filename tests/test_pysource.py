"""Python DataSource connectors: the LCG demo source and the AcidTable
connector (time travel + manifest-stats split pruning through
spark.read.format("acidtable"))."""
from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import AcidTable
from spark_streaming_apps_spark.sources.pysource import (
    AcidTableDataSource, python_datasource)


def _mk_table(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(400)], "file_id long, status int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.relayout(["file_id"], target_files=8)
    return t


def test_lcg_source_partition_parallel(spark):
    df = python_datasource(spark)
    assert df.count() == 16


def test_acid_connector_reads_snapshots(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge(spark.createDataFrame([(0, 9)], "file_id long, status int"),
            key=["file_id"])
    spark.dataSource.register(AcidTableDataSource)
    latest = (spark.read.format("acidtable")
              .option("path", str(tmp_path / "t")).load())
    v0 = (spark.read.format("acidtable")
          .option("path", str(tmp_path / "t")).option("version", 0).load())
    assert latest.filter("file_id = 0").first().status == 9
    assert v0.filter("file_id = 0").first().status == 0
    assert latest.count() == v0.count() == 400


def test_acid_connector_prunes_splits_from_manifest_stats(spark, tmp_path):
    """The (col, lo, hi) options must drop provably-non-overlapping
    files at the SPLIT level (fewer InputPartitions), while the rows
    that could match all survive."""
    _mk_table(spark, tmp_path)
    opts = {"path": str(tmp_path / "t")}
    full = AcidTableDataSource(opts).reader(None).partitions()
    pruned_reader = AcidTableDataSource(
        {**opts, "col": "file_id", "lo": "100", "hi": "149"}).reader(None)
    pruned = pruned_reader.partitions()
    assert len(full) == 8
    assert len(pruned) < len(full)
    spark.dataSource.register(AcidTableDataSource)
    got = (spark.read.format("acidtable")
           .option("path", str(tmp_path / "t"))
           .option("col", "file_id").option("lo", "100").option("hi", "149")
           .load().filter(F.col("file_id").between(100, 149)))
    assert got.count() == 50
    assert got.agg(F.min("file_id"), F.max("file_id")).first() == (100, 149)


def test_acid_cdf_stream_resumes_from_version_offset(spark, tmp_path):
    """Offsets are table versions: a restarted stream with the same
    checkpoint must emit ONLY the deltas committed since its last
    drained version — never replaying history."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource)

    df = spark.createDataFrame(
        [(i, 0) for i in range(20)], "file_id long, status int")
    t = AcidTable.create(spark, tmp_path / "t", df)
    t.merge(spark.createDataFrame([(3, 1)], "file_id long, status int"),
            key=["file_id"])                                   # v1
    t.backfill_changes()          # non-CDF table: record deltas first
    spark.dataSource.register(AcidCdfStreamDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("acidtable-cdf")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()                                      # batch 1: v0 -> v1
    first = spark.read.parquet(out)
    assert first.count() == 2                    # one delete + one insert
    assert {r._commit_version for r in first.collect()} == {1}

    t.append(spark.createDataFrame([(100, 0)], "file_id long, status int"))
    t.backfill_changes()                         # record v2's delta
    drain()                                      # batch 2: v1 -> v2 only
    both = spark.read.parquet(out).collect()
    assert len(both) == 3
    v2 = [r for r in both if r._commit_version == 2]
    assert len(v2) == 1 and v2[0].file_id == 100 \
        and v2[0]._change_type == "insert"


def test_walog_resumes_from_committed_offsets(spark, tmp_path):
    """Kafka contract: a restarted consumer with the same checkpoint
    resumes from its committed {partition: offset} map — a third produce
    round after the first drain yields ONLY the new segment's records,
    with offsets continuing each partition's sequence."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        WALOG_PARTS, WalogDataSource, _stage_walog)

    root = tmp_path / "topic"
    _stage_walog("/root/testdata/sf0.001", root)
    spark.dataSource.register(WalogDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("walog")
             .option("path", str(root)).load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(out).count()
    assert n0 == 1000
    # produce round 3: one more record per partition
    con = duckdb.connect()
    for part in range(WALOG_PARTS):
        con.execute(f"""
            COPY (SELECT CAST(1000000 + {part} AS BIGINT) AS event_id,
                         CAST({part} AS BIGINT) AS user_id,
                         'late' AS event_type)
            TO '{root}/p{part}/segment-002.parquet' (FORMAT PARQUET)""")
    drain()
    allrows = spark.read.parquet(out)
    assert allrows.count() == n0 + WALOG_PARTS
    late = allrows.filter("event_type = 'late'").collect()
    assert len(late) == WALOG_PARTS
    per_part_max = {r.part: r.mx for r in
                    allrows.filter("event_type != 'late'")
                    .groupBy("part").agg(F.max("offset").alias("mx"))
                    .collect()}
    for r in late:
        assert r.offset == per_part_max[r.part] + 1   # sequence continues


def test_acid_cdf_stream_spans_schema_evolution(spark, tmp_path):
    """A stream declared after append_evolve must replay the PRE-evolve
    versions with NULL in the new column (the batch read_changes
    widening) instead of emitting short tuples that crash the batch."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(2, 1)], "file_id long, status int"))
    t.append_evolve(spark.createDataFrame(
        [(3, 0, "x")], "file_id long, status int, tag string"))
    t.backfill_changes()
    spark.dataSource.register(AcidCdfStreamDataSource)
    q = (spark.readStream.format("acidtable-cdf")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("cdfevo").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.file_id, r.status, r.tag, r._change_type, r._commit_version)
            for r in spark.table("cdfevo").collect()}
    assert (2, 1, None, "insert", 1) in rows       # pre-evolve: NULL tag
    assert (3, 0, "x", "insert", 2) in rows

def test_walog_read_limit_drains_one_segment_per_batch(spark, tmp_path):
    """maxSegmentsPerTrigger=1 under the default trigger must drain the
    two-segment backlog as exactly TWO data micro-batches with no row
    duplicated — the genuine multi-batch engine path (availableNow on a
    Python source collapses to a single batch)."""
    from spark_streaming_apps_spark.sources.pysource import (
        WalogDataSource, _drain_incremental, _stage_walog)

    root = tmp_path / "topic"
    _stage_walog("/root/testdata/sf0.001", root)
    spark.dataSource.register(WalogDataSource)
    nb, _ = _drain_incremental(
        spark.readStream.format("walog").option("path", str(root))
        .option("maxSegmentsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName("wl_mb"))
    assert nb == 2
    out = spark.table("wl_mb")
    assert out.count() == 1000                       # sf0.001 events
    assert out.select("event_id").distinct().count() == 1000  # no dups


def test_walog_read_limit_restart_never_duplicates(spark, tmp_path):
    """Checkpointed restart with the read limit: the fresh reader's first
    capped offer steps from zero — BEHIND the checkpoint — and the
    engine plans that stale range anyway. The partitions() floor clip
    must serve it empty: after a third produce round, a limited
    restarted drain yields ONLY the new rows, never re-emitting."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        WALOG_PARTS, WalogDataSource, _stage_walog)

    root = tmp_path / "topic"
    _stage_walog("/root/testdata/sf0.001", root)
    spark.dataSource.register(WalogDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("walog")
             .option("path", str(root))
             .option("maxSegmentsPerTrigger", "1").load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    drain()
    assert spark.read.parquet(out).count() == 1000
    con = duckdb.connect()
    for part in range(WALOG_PARTS):
        con.execute(f"""
            COPY (SELECT CAST(1000000 + {part} AS BIGINT) AS event_id,
                         CAST({part} AS BIGINT) AS user_id,
                         'late' AS event_type)
            TO '{root}/p{part}/segment-002.parquet' (FORMAT PARQUET)""")
    drain()                                  # fresh reader, same checkpoint
    allrows = spark.read.parquet(out)
    assert allrows.count() == 1000 + WALOG_PARTS
    assert allrows.select("part", "offset").distinct().count() == \
        1000 + WALOG_PARTS                   # offsets unique => no replay


def test_acid_cdf_read_limit_one_version_per_batch(spark, tmp_path):
    """maxVersionsPerTrigger=1: three committed versions drain as three
    micro-batches, each batch's rows carrying exactly one
    _commit_version."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource, _drain_incremental)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(2, 1)], "file_id long, status int"))
    t.append(spark.createDataFrame([(3, 0)], "file_id long, status int"))
    t.merge(spark.createDataFrame([(1, 9)], "file_id long, status int"),
            key=["file_id"])
    t.backfill_changes()
    spark.dataSource.register(AcidCdfStreamDataSource)
    nb, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf")
        .option("path", str(tmp_path / "t"))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName("cdf_mb"))
    assert nb == 3                           # one batch per version 1..3
    rows = spark.table("cdf_mb").collect()
    assert {r._commit_version for r in rows} == {1, 2, 3}


def test_cdf_parallel_stream_multibatch_and_resume(spark, tmp_path):
    """Partition-parallel CDF connector: recorded change files are the
    splits; a read-limited drain is one micro-batch per version, and a
    restarted stream with the same checkpoint emits ONLY versions
    committed since — served entirely from change files (no snapshots
    needed: they are vacuumed before the resume)."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfParallelStreamDataSource, _drain_incremental)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(20)],
                              "file_id long, status int"), enable_cdf=True)
    t.merge(spark.createDataFrame([(3, 1)], "file_id long, status int"),
            key=["file_id"])                                   # v1
    t.append(spark.createDataFrame([(100, 0)],
                                   "file_id long, status int"))  # v2
    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("acidtable-cdf-parallel")
             .option("path", str(tmp_path / "t"))
             .option("maxVersionsPerTrigger", "1").load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    drain()                                       # v1 + v2: 2 limited batches
    first = spark.read.parquet(out)
    assert first.count() == 3                     # del+ins (v1) + ins (v2)
    assert {r._commit_version for r in first.collect()} == {1, 2}

    t.vacuum(keep_last=1)                         # snapshots gone, feed lives
    t.append(spark.createDataFrame([(200, 0)],
                                   "file_id long, status int"))  # v3
    drain()                                       # resume: only v3
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    v3 = [r for r in rows if r._commit_version == 3]
    assert len(v3) == 1 and v3[0].file_id == 200

    # memory-sink multi-batch proof on a fresh checkpoint
    nb, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf-parallel")
        .option("path", str(tmp_path / "t"))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName("cdfp_mb"))
    assert nb == 3                                # one batch per version


def test_cdf_parallel_stream_requires_cdf_table(spark, tmp_path):
    import pytest

    from pyspark.errors.exceptions.captured import StreamingQueryException
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfParallelStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(2, 0)], "file_id long, status int"))
    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    q = (spark.readStream.format("acidtable-cdf-parallel")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("cdfp_nocdf").start())
    with pytest.raises(StreamingQueryException,
                       match="recorded no change files"):
        q.processAllAvailable()
    q.stop()


def test_acid_stream_sink_exactly_once_and_cdf(spark, tmp_path):
    """writeStream.format('acidtable'): one batch-fenced commit per
    micro-batch; a re-drain of the same checkpoint replays nothing; on
    a CDF-enabled table the sink records its batches as insert change
    files readable via read_changes after snapshot vacuum."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    src = tmp_path / "src"
    src.mkdir()
    con = duckdb.connect()
    for i in range(3):
        con.execute(f"""
            COPY (SELECT CAST(range AS BIGINT) AS event_id,
                         CAST({i} AS BIGINT) AS user_id
                  FROM range({i * 10}, {i * 10 + 10}))
            TO '{src}/f{i}.parquet' (FORMAT PARQUET)""")
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"),
        enable_cdf=True)
    spark.dataSource.register(AcidTableDataSource)
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.schema("event_id long, user_id long")
             .option("maxFilesPerTrigger", 1).parquet(str(src))
             .writeStream.format("acidtable")
             .option("path", str(tmp_path / "t"))
             .option("appId", "sinkT")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    v_after = t.latest_version()
    assert t.read().count() == 30
    ops = [t._manifest(v)["op"] for v in range(v_after + 1)]
    assert ops.count("stream_sink") == 3          # one commit per batch
    drain()                                       # replay: all fenced
    assert t.latest_version() == v_after
    assert t.read().count() == 30
    # CDF recorded by the sink: feed survives snapshot vacuum
    t.vacuum(keep_last=1)
    ch = t.read_changes(0, v_after)
    assert ch.count() == 30
    assert {r._change_type for r in ch.collect()} == {"insert"}
    # pruning still works off the sink-built manifest stats
    files, total = t.pruned_files("event_id", 0, 5)
    assert len(files) < total


def test_acid_stream_sink_concurrent_writers(spark, tmp_path):
    """Two streaming writers (distinct appIds) race commits into ONE
    table: the optimistic manifest swap serializes them — every batch
    from both lands exactly once, whatever the interleaving."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    con = duckdb.connect()
    srcs = []
    for w in range(2):
        src = tmp_path / f"src{w}"
        src.mkdir()
        for i in range(3):
            con.execute(f"""
                COPY (SELECT CAST(range AS BIGINT) AS event_id,
                             CAST({w} AS BIGINT) AS user_id
                      FROM range({w * 1000 + i * 10},
                                 {w * 1000 + i * 10 + 10}))
                TO '{src}/f{i}.parquet' (FORMAT PARQUET)""")
        srcs.append(src)
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"))
    spark.dataSource.register(AcidTableDataSource)

    qs = []
    for w, src in enumerate(srcs):
        qs.append(
            spark.readStream.schema("event_id long, user_id long")
            .option("maxFilesPerTrigger", 1).parquet(str(src))
            .writeStream.format("acidtable")
            .option("path", str(tmp_path / "t"))
            .option("appId", f"w{w}")
            .option("checkpointLocation", str(tmp_path / f"ck{w}"))
            .trigger(availableNow=True).start())
    for q in qs:
        q.awaitTermination(180)
    assert t.read().count() == 60                 # 2 writers x 30 rows
    assert t.read().select("event_id").distinct().count() == 60
    ops = [t._manifest(v)["op"] for v in range(t.latest_version() + 1)]
    assert ops.count("stream_sink") == 6          # 3 commits per writer
    txns = t._manifest(t.latest_version())["txns"]
    assert txns == {"w0": 2, "w1": 2}             # both fenced at batch 2


def test_acid_stream_sink_carries_deletion_vector(spark, tmp_path):
    """Sinking into an enableDeletionVectors table must CARRY the
    parent's vector (linked files keep their names, so the DV stays
    valid) — a sink commit that dropped it would resurrect MOR-deleted
    rows."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    src = tmp_path / "src"
    src.mkdir()
    duckdb.sql(f"""
        COPY (SELECT CAST(range AS BIGINT) AS event_id,
                     CAST(9 AS BIGINT) AS user_id FROM range(100, 110))
        TO '{src}/f0.parquet' (FORMAT PARQUET)""")
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(50)],
                              "event_id long, user_id long"),
        enable_dv=True)
    t.delete_where_mor("event_id < 10")
    assert t.read().count() == 40
    spark.dataSource.register(AcidTableDataSource)
    q = (spark.readStream.schema("event_id long, user_id long")
         .parquet(str(src))
         .writeStream.format("acidtable")
         .option("path", str(tmp_path / "t")).option("appId", "dvS")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    m = t._manifest(t.latest_version())
    assert "dv" in m and m["dv_rows"] == 10       # vector carried
    got = {r.event_id for r in t.read().collect()}
    assert len(got) == 50                         # 40 live + 10 streamed
    assert not (got & set(range(10)))             # deletes NOT resurrected


def test_acid_stream_sink_enforces_constraints(spark, tmp_path):
    """A CHECK-constrained table refuses a streamed batch that violates
    the constraint (validated over the staged parquet BEFORE the
    manifest exists) and carries the constraint on every sink commit —
    enforcement is never silently severed."""
    import duckdb
    import pytest

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    good, bad = tmp_path / "good", tmp_path / "bad"
    good.mkdir(), bad.mkdir()
    duckdb.sql(f"""
        COPY (SELECT CAST(range AS BIGINT) AS event_id,
                     CAST(1 AS BIGINT) AS user_id FROM range(100, 105))
        TO '{good}/f0.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""
        COPY (SELECT CAST(range AS BIGINT) AS event_id,
                     CAST(-5 AS BIGINT) AS user_id FROM range(200, 205))
        TO '{bad}/f0.parquet' (FORMAT PARQUET)""")
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 3)], "event_id long, user_id long"))
    t.add_constraint("pos_user", "user_id >= 0")
    spark.dataSource.register(AcidTableDataSource)

    def drain(src, ck):
        # distinct appId per drain: the txn fence is per-writer, and a
        # fresh checkpoint under a reused appId would re-fence batch 0
        q = (spark.readStream.schema("event_id long, user_id long")
             .parquet(str(src))
             .writeStream.format("acidtable")
             .option("path", str(tmp_path / "t")).option("appId", ck)
             .option("checkpointLocation", str(tmp_path / ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain(good, "ck1")                            # passes the CHECK
    m = t._manifest(t.latest_version())
    assert m["op"] == "stream_sink"
    assert m.get("constraints") == {"pos_user": "user_id >= 0"}
    with pytest.raises(Exception, match="pos_user"):
        drain(bad, "ck2")                         # violates: refused
    assert t.read().filter("user_id < 0").count() == 0
    # a LATER api-side append still enforces (constraints not severed)
    from spark_streaming_apps_spark.acid import ConstraintViolation
    with pytest.raises(ConstraintViolation):
        t.append(spark.createDataFrame([(9, -1)],
                                       "event_id long, user_id long"))


def test_cdf_stream_refuses_unrecorded_versions(spark, tmp_path):
    """A non-CDF, non-backfilled table must fail the stream LOUDLY
    (there is no driver-side snapshot-diff fallback), pointing at
    enable_cdf / backfill_changes; after backfill the same stream
    drains."""
    import pytest

    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(2, 1)], "file_id long, status int"))
    spark.dataSource.register(AcidCdfStreamDataSource)

    def drain(q_name, ck):
        q = (spark.readStream.format("acidtable-cdf")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.outputMode("append").format("memory")
             .queryName(q_name)
             .option("checkpointLocation", str(tmp_path / ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    with pytest.raises(Exception, match="backfill_changes"):
        drain("cdf_refuse", "ck1")
    assert t.backfill_changes() == [1]
    drain("cdf_ok", "ck2")
    assert spark.table("cdf_ok").count() == 1     # v1's insert


# ---------------- acidtable-stream (plain appends-only table stream)

def test_acid_table_stream_snapshot_then_appends(spark, tmp_path):
    """First batch = starting snapshot, each later append = one batch
    (read-limited); row-preserving commits (compact) contribute
    nothing; totals exact."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource, _drain_incremental)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, 0) for i in range(10)],
                              "id long, s int"))
    t.append(spark.createDataFrame([(100, 1)], "id long, s int"))
    t.compact(2)                                   # row-preserving
    t.append(spark.createDataFrame([(200, 2)], "id long, s int"))
    spark.dataSource.register(AcidTableStreamDataSource)
    nb, _ = _drain_incremental(
        spark.readStream.format("acidtable-stream")
        .option("path", str(tmp_path / "t"))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName("ts_snap"))
    rows = spark.table("ts_snap").collect()
    assert nb == 3                                 # snap, v1, v3
    assert len(rows) == 12
    assert {r.id for r in rows} == set(range(10)) | {100, 200}


def test_acid_table_stream_fails_on_change_commit_unless_skipped(
        spark, tmp_path):
    """A merge commit breaks the appends-only contract: the stream
    fails loudly by default and skips it under skipChangeCommits."""
    import pytest

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0), (2, 0)], "id long, s int"))
    t.merge(spark.createDataFrame([(1, 9)], "id long, s int"),
            key=["id"])
    t.append(spark.createDataFrame([(3, 1)], "id long, s int"))
    spark.dataSource.register(AcidTableStreamDataSource)

    def drain(qn, ck, skip):
        q = (spark.readStream.format("acidtable-stream")
             .option("path", str(tmp_path / "t"))
             .option("skipChangeCommits", skip)
             .option("startingVersion", "0").load()
             .writeStream.outputMode("append").format("memory")
             .queryName(qn)
             .option("checkpointLocation", str(tmp_path / ck))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    with pytest.raises(Exception, match="skipChangeCommits"):
        drain("ts_fail", "ck1", "false")
    drain("ts_skip", "ck2", "true")
    got = {(r.id, r.s) for r in spark.table("ts_skip").collect()}
    # snapshot v0 + v2's append; the merge's rewrite is skipped
    assert got == {(1, 0), (2, 0), (3, 1)}


def test_acid_table_stream_resumes_after_vacuum(spark, tmp_path):
    """Vacuum between drains: on an append-only history per-file
    retention drops nothing (every file is referenced by the latest
    manifest), so the checkpointed stream resumes cleanly; after a COW
    rewrite genuinely orphans the old snapshots, a FRESH stream from
    the vacuumed version fails loudly."""
    import pytest

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "id long, s int"))
    t.append(spark.createDataFrame([(2, 0)], "id long, s int"))
    spark.dataSource.register(AcidTableStreamDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("acidtable-stream")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 2
    t.append(spark.createDataFrame([(3, 0)], "id long, s int"))
    assert t.vacuum(keep_last=1) == []             # append-only: no-op
    drain()                                        # resume: v2 only
    assert {r.id for r in spark.read.parquet(out).collect()} == {1, 2, 3}
    # COW rewrite orphans v0-v2's images; vacuum drops them
    t.update_where({"s": "s + 1"}, "id >= 1")                    # v3
    assert t.vacuum(keep_last=1)
    # a fresh stream needing the vacuumed snapshot must refuse
    q = (spark.readStream.format("acidtable-stream")
         .option("path", str(tmp_path / "t"))
         .option("startingVersion", "0").load()
         .writeStream.outputMode("append").format("memory")
         .queryName("ts_vac")
         .option("checkpointLocation", str(tmp_path / "ck_fresh"))
         .trigger(availableNow=True).start())
    with pytest.raises(Exception, match="vacuumed"):
        q.awaitTermination(120)


def test_acidtable_format_reads_column_mapped_table(spark, tmp_path):
    """The batch Python DataSource projects PHYSICAL parquet columns to
    the declared LOGICAL names on column-mapped tables (executor-side
    arrow rename), null-fills columns a file predates, and serves a
    re-added dropped column as NULL (fresh physical identity)."""
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 10.0, "a"), (2, 20.0, "b")],
                              "id long, val double, tag string"))
    t.rename_column("val", "score")                              # v1
    t.append(spark.createDataFrame([(3, 30.0, "c")],
                                   "id long, score double, tag string"))
    t.drop_column("tag")                                         # v3
    t.add_column("tag", "string")                                # v4
    spark.dataSource.register(AcidTableDataSource)
    df = (spark.read.format("acidtable")
          .option("path", str(tmp_path / "t")).load())
    assert df.columns == ["id", "score", "tag"]
    got = {(r.id, r.score, r.tag) for r in df.collect()}
    assert got == {(1, 10.0, None), (2, 20.0, None), (3, 30.0, None)}
    # matches the AcidTable read path exactly
    a = {(r.id, r.score, r.tag) for r in t.read().collect()}
    assert got == a


def test_read_acid_auto_broadcasts_small_snapshot(spark, tmp_path):
    """Planner-visible sizing for the acidtable DataSource: a small
    snapshot read via read_acid joins as BroadcastHashJoin with NO
    manual hint at the call site, while the raw format("acidtable")
    read (unknown size = Long.Max) plans sort-merge — the documented
    Python-DataSource stats gate and its wrapper-side answer."""
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource, read_acid)

    dim_dir = tmp_path / "dim"
    dim = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "k long, name string")
    AcidTable.create(spark, dim_dir, dim)
    # big enough that ITS size estimate (range stats) exceeds the
    # broadcast threshold — so any BroadcastHashJoin in these plans
    # can only come from the acidtable side
    big = spark.range(0, 3_000_000).select(
        (F.col("id") % 20).alias("k"), F.col("id").alias("v"))

    joined = big.join(read_acid(spark, dim_dir), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchScan acidtable" in plan
    assert joined.count() == 3_000_000

    # control: the raw DataSource read has no stats -> no auto BHJ
    spark.dataSource.register(AcidTableDataSource)
    raw = (spark.read.format("acidtable")
           .option("path", str(dim_dir)).load())
    plan_raw = (big.join(raw, "k")._jdf.queryExecution()
                .executedPlan().toString())
    assert "BroadcastHashJoin" not in plan_raw

    # a snapshot OVER the threshold is never force-broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        plan_big = (big.join(read_acid(spark, dim_dir), "k")
                    ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" not in plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       "10485760b")


def test_read_acid_time_travel_and_legacy_conservatism(spark, tmp_path):
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.sources.pysource import read_acid

    d = tmp_path / "t"
    t = AcidTable.create(spark, d, spark.createDataFrame(
        [(1, "a")], "k long, s string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, s string"))
    assert read_acid(spark, d, version=0).count() == 1
    assert read_acid(spark, d).count() == 2
    # foreign/legacy manifest with stripped byte stats: resolution
    # re-harvests sizes from the parquet footers (the legacy-migration
    # harvest), so the wrapper still sizes the snapshot correctly —
    # reads stay exact and the hint decision still matches the
    # threshold (disabled here by setting it to 1 byte)
    import json
    for mp in (d / "manifests").glob("v*.json"):
        m = json.loads(mp.read_text())
        for key in ("files", "files_add"):
            for f in m.get(key) or []:
                f.pop("bytes", None)
        mp.write_text(json.dumps(m))
    for ck in (d / "manifests").glob("ckpt-v*.parquet"):
        ck.unlink()          # checkpoints re-carry the recorded bytes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        df = read_acid(spark, d)
        plan = (spark.range(10).select(F.col("id").alias("k"))
                .join(df, "k")._jdf.queryExecution()
                .executedPlan().toString())
        assert "BroadcastHashJoin" not in plan
        assert df.count() == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       "10485760b")


def test_acid_stream_sink_autocompacts_when_opted_in(spark, tmp_path):
    """The sink honors the autocompact table property: a many-batch
    drain keeps the live-file count bounded, rows and the batch fence
    are untouched (compaction is row-preserving and carries txns)."""
    import duckdb

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)

    src = tmp_path / "src"
    src.mkdir()
    con = duckdb.connect()
    for i in range(12):
        con.execute(f"""
            COPY (SELECT CAST(range AS BIGINT) AS event_id,
                         CAST({i} AS BIGINT) AS user_id
                  FROM range({i * 5}, {i * 5 + 5}))
            TO '{src}/f{i}.parquet' (FORMAT PARQUET)""")
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"))
    t.set_autocompact(max_bytes=1 << 20, min_files=4)
    spark.dataSource.register(AcidTableDataSource)
    q = (spark.readStream.schema("event_id long, user_id long")
         .option("maxFilesPerTrigger", 1).parquet(str(src))
         .writeStream.format("acidtable")
         .option("path", str(tmp_path / "t"))
         .option("appId", "sinkAC")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    files = t._manifest(t.latest_version())["files"]
    assert len(files) < 8, f"live files unbounded: {len(files)}"
    assert t.read().count() == 60
    ops = [t._manifest(v)["op"] for v in range(t.latest_version() + 1)]
    assert ops.count("stream_sink") == 12       # every batch committed
    assert "compact_small" in ops               # and compaction ran
