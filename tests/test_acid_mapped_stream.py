"""Schema-tracking CDF and streaming ACROSS column-mapping changes —
the two Delta-parity gates round 10 documented, now closed:

* ``read_changes_mapped`` serves one feed across rename/drop/re-add
  epochs in a declared target schema, matching columns by frozen
  PHYSICAL identity (Delta's schemaTrackingLocation semantics with the
  table's own map as the tracking state). Contract pinned here:
  read_mapped(v_from) ⊎ inserts ∖ deletes == read_mapped(v_to).
* The ``acidtable-cdf`` / ``acidtable-cdf-parallel`` / ``acidtable-
  stream`` sources and the ``acidtable`` sink stream column-mapped
  tables: readers translate each epoch onto the stream's declared
  schema; the sink writes frozen physical names and fences on
  identity-epoch changes (restart picks up the new schema).
"""
from collections import Counter

import pytest

from spark_streaming_apps_spark.acid import AcidTable


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _mapped_history(spark, path, cdf=True):
    """v0 create(id,val) → v1 append → v2 rename val→score →
    v3 append → v4 delete → v5 drop score → v6 re-add → v7 append."""
    t = AcidTable.create(
        spark, path, _df(spark, [(1, 10.0), (2, 20.0)],
                         "id long, val double"), enable_cdf=cdf)
    t.append(_df(spark, [(3, 30.0)], "id long, val double"))     # v1
    t.rename_column("val", "score")                              # v2
    t.append(_df(spark, [(4, 40.0)], "id long, score double"))   # v3
    t.delete_where("id = 1")                                     # v4
    t.drop_column("score")                                       # v5
    t.add_column("score", "double")                              # v6
    t.append(_df(spark, [(5, 50.0)], "id long, score double"))   # v7
    return t


def _contract_holds(t, v_from, v_to):
    ch = t.read_changes_mapped(v_from, v_to)
    base = Counter(tuple(r) for r in t.read_mapped(v_from, v_to).collect())
    for r in ch.collect():
        k = tuple(r)[:-2]
        if r._change_type == "insert":
            base[k] += 1
        else:
            base[k] -= 1
    return +base == Counter(
        tuple(r) for r in t.read_mapped(v_to, v_to).collect())


def test_read_changes_mapped_recorded(spark, tmp_path):
    t = _mapped_history(spark, tmp_path / "t", cdf=True)
    rows = sorted((r.id, r.score, r._change_type, r._commit_version)
                  for r in t.read_changes_mapped(0, 7).collect())
    # v1 insert + v4 delete happened in the val/score[phys val] epochs
    # — the target 'score' was re-minted at v6, so they read NULL;
    # only the post-re-add insert carries a value
    assert rows == [(1, None, "delete", 4), (3, None, "insert", 1),
                    (4, None, "insert", 3), (5, 50.0, "insert", 7)]
    assert _contract_holds(t, 0, 7)
    assert _contract_holds(t, 1, 4)
    assert _contract_holds(t, 3, 6)


def test_read_changes_mapped_rename_only_carries_values(spark, tmp_path):
    """Across a RENAME alone, the physical identity is unchanged — the
    feed carries the values under the target name (never NULLs them),
    and the fallback (non-CDF) diff path agrees with the recorded
    one."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"))
    t.append(_df(spark, [(2, 20.0)], "id long, val double"))     # v1
    t.rename_column("val", "score")                              # v2
    t.append(_df(spark, [(3, 30.0)], "id long, score double"))   # v3
    rows = sorted((r.id, r.score, r._change_type, r._commit_version)
                  for r in t.read_changes_mapped(0, 3).collect())
    assert rows == [(2, 20.0, "insert", 1), (3, 30.0, "insert", 3)]
    assert _contract_holds(t, 0, 3)
    # read_changes still refuses the span and names the mapped API
    with pytest.raises(ValueError, match="read_changes_mapped"):
        t.read_changes(0, 3)


def test_cdf_stream_serves_mapped_table(spark, tmp_path):
    """The simple CDF stream drains a table renamed mid-history: every
    epoch's recorded change files translate onto the CURRENT logical
    schema by physical identity."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"),
                         enable_cdf=True)
    t.append(_df(spark, [(2, 20.0)], "id long, val double"))     # v1
    t.rename_column("val", "score")                              # v2
    t.append(_df(spark, [(3, 30.0)], "id long, score double"))   # v3
    spark.dataSource.register(AcidCdfStreamDataSource)
    q = (spark.readStream.format("acidtable-cdf")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("cdfmapped").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.id, r.score, r._change_type, r._commit_version)
                 for r in spark.sql("select * from cdfmapped").collect())
    # pre-rename insert carries its value under the NEW name (same
    # physical identity); the rename itself contributes nothing
    assert got == [(2, 20.0, "insert", 1), (3, 30.0, "insert", 3)]


def test_cdf_parallel_stream_serves_mapped_table(spark, tmp_path):
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfParallelStreamDataSource)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"),
                         enable_cdf=True)
    t.append(_df(spark, [(2, 20.0)], "id long, val double"))     # v1
    t.rename_column("val", "score")                              # v2
    t.delete_where("id = 1")                                     # v3
    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    q = (spark.readStream.format("acidtable-cdf-parallel")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("cdfpmapped").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.id, r.score, r._change_type, r._commit_version)
                 for r in spark.sql("select * from cdfpmapped").collect())
    assert got == [(1, 10.0, "delete", 3), (2, 20.0, "insert", 1)]


def test_table_stream_serves_mapped_table(spark, tmp_path):
    """The appends-only stream reads files by FROZEN physical name, so
    a rename mid-history is a silent row-preserving commit and every
    row serves under the current logical schema."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"))
    t.append(_df(spark, [(2, 20.0)], "id long, val double"))     # v1
    t.rename_column("val", "score")                              # v2
    t.append(_df(spark, [(3, 30.0)], "id long, score double"))   # v3
    spark.dataSource.register(AcidTableStreamDataSource)
    q = (spark.readStream.format("acidtable-stream")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("tsmapped").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.id, r.score) for r in
                 spark.sql("select * from tsmapped").collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_sink_refuses_logical_schema_mismatch_on_mapped_table(
        spark, tmp_path):
    """The sink's schema check binds LOGICAL names: streaming (id,
    score) into a mapped table whose logical columns are (id, pts)
    refuses loudly instead of writing under stale names."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidStreamWriter)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(0, 0.0)], "id long, score double"))
    t.rename_column("score", "pts")
    w = AcidStreamWriter(str(tmp_path / "t"),
                         [("id", None), ("score", None)], "app",
                         {"pts": "score"})
    with pytest.raises(RuntimeError, match="does not match"):
        w.commit([], 0)


def test_sink_appends_into_renamed_table(spark, tmp_path):
    """Happy path: sink schema matches the mapped table's LOGICAL
    columns; staged data lands under the physical name."""
    from spark_streaming_apps_spark.acid import _entry_rel
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource, AcidTableStreamDataSource)

    src = AcidTable.create(spark, tmp_path / "src",
                           _df(spark, [(7, 70.0), (8, 80.0)],
                               "id long, score double"))
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"))
    t.rename_column("val", "score")                              # v1
    spark.dataSource.register(AcidTableDataSource)
    spark.dataSource.register(AcidTableStreamDataSource)
    q = (spark.readStream.format("acidtable-stream")
         .option("path", str(tmp_path / "src")).load()
         .writeStream.format("acidtable")
         .option("path", str(tmp_path / "t"))
         .option("appId", "mapped-sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r.id, r.score) for r in t.read().collect())
    assert got == [(1, 10.0), (7, 70.0), (8, 80.0)]
    # the sink-written files hold the PHYSICAL column name
    import pyarrow.parquet as pq
    m = t._manifest(t.latest_version())
    sink_files = [f for f in m["files"] if "sink-" in f["path"]]
    assert sink_files
    cols = pq.ParquetFile(
        tmp_path / "t" / _entry_rel(m, sink_files[0])).schema_arrow.names
    assert "val" in cols and "score" not in cols
    # and the manifest stats stayed LOGICAL
    assert all("val" not in (f.get("stats") or {}) for f in sink_files)


def test_sink_fences_identity_change_mid_stream(spark, tmp_path):
    """A rename between writer creation and commit must refuse the
    commit (restart re-resolves the mapping) — never write stale
    physical names."""
    from spark_streaming_apps_spark.sources.pysource import (
        AcidStreamWriter)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, 10.0)], "id long, val double"))
    w = AcidStreamWriter(str(tmp_path / "t"),
                         [("id", None), ("val", None)], "app", {})
    t.rename_column("val", "score")     # identity changes under the writer
    with pytest.raises(RuntimeError, match="identity"):
        w.commit([], 0)
