"""CDF-by-reference (r17): append/layout commits record their change
set as a reference to the commit's own added data files
(``changes_ref``) instead of writing the batch a second time as a
change dir — Delta derives append-commit CDF from added files the same
way. Pins: the manifest shape, feed equivalence with the diff-computed
feed, vacuum retention of referenced files, and the parallel stream
source serving ref commits."""
from __future__ import annotations

import json


from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import AcidTable


def _manifest(t: AcidTable, v: int) -> dict:
    return json.loads((t._manifests / f"v{v}.json").read_text())


def test_append_records_changes_ref_not_a_change_dir(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a")], "k long, s string"),
        enable_cdf=True)
    t.append(spark.createDataFrame([(2, "b"), (3, "c")],
                                   "k long, s string"))
    m = _manifest(t, 1)
    assert "changes" not in m
    refs = m["changes_ref"]
    assert refs and all(r.startswith(m["data"]) for r in refs)
    # every referenced file is a data file of this commit's file list
    paths = {f["path"] for f in t._manifest(1)["files"]}
    assert set(refs) <= paths
    got = sorted((r.k, r.s, r._change_type, r._commit_version)
                 for r in t.read_changes(0, 1).collect())
    assert got == [(2, "b", "insert", 1), (3, "c", "insert", 1)]


def test_property_and_noop_commits_record_empty_ref(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a")], "k long, s string"),
        enable_cdf=True)
    t.set_autocompact(max_bytes=1 << 20, min_files=64)      # props commit
    t.delete_where("k = 999")                               # matches nothing
    for v in (1, 2):
        m = _manifest(t, v)
        assert m["changes_ref"] == [], m["op"]
    assert t.read_changes(0, 2).count() == 0


def test_feed_equals_diff_feed_and_survives_vacuum(spark, tmp_path):
    base = spark.createDataFrame([(i, i % 3) for i in range(30)],
                                 "k long, g int")
    rec = AcidTable.create(spark, tmp_path / "rec", base, enable_cdf=True)
    diff = AcidTable.create(spark, tmp_path / "diff", base)
    for t in (rec, diff):
        t.append(spark.createDataFrame([(100, 7), (101, 8)],
                                       "k long, g int"))
        t.delete_where("k % 10 = 3")
        t.append(spark.createDataFrame([(102, 9)], "k long, g int"))

    def rows(t):
        return sorted((r.k, r.g, r._change_type, r._commit_version)
                      for r in t.read_changes(0, 3).collect())

    want = rows(diff)
    assert rows(rec) == want
    # vacuum every snapshot but the newest: the ref'd append files
    # survive (change retention), the feed keeps serving from v0
    rec.vacuum(keep_last=1, orphan_grace_s=0)
    assert rows(rec) == want


def test_parallel_cdf_stream_serves_ref_commits(spark, tmp_path):
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfParallelStreamDataSource, _drain_incremental)
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a")], "k long, s string"),
        enable_cdf=True)
    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    seen: list[tuple] = []

    def sink(batch, _bid):
        seen.extend((r.k, r.s, r._change_type, r._commit_version)
                    for r in batch.collect())

    stream = (spark.readStream.format("acidtable-cdf-parallel")
              .option("path", str(tmp_path / "t"))
              .option("startingVersion", "0")
              .option("maxVersionsPerTrigger", "1").load()
              .writeStream.outputMode("append").foreachBatch(sink))
    t.append(spark.createDataFrame([(2, "b")], "k long, s string"))
    t.delete_where("k = 1")
    _drain_incremental(stream)
    assert sorted(seen) == [(1, "a", "delete", 2), (2, "b", "insert", 1)]
