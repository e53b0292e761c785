"""Incremental clustering (Delta liquid clustering's OPTIMIZE shape).

``optimize_incremental(cols)`` rewrites ONLY files not already
range-clustered on ``cols`` — a metadata-only candidate decision via
the ``sort`` provenance relayout/optimize stamp on manifest entries —
and carries every clustered file by reference. The maintenance cost is
O(unclustered bytes), never O(table): the only clustering shape that
survives a 100 TB table under steady appends.
"""
import pyspark.sql.functions as F

from spark_streaming_apps_spark.acid import AcidTable


def _rows(spark, lo, hi, shuffled=True):
    df = (spark.range(lo, hi)
          .select(F.col("id").alias("k"),
                  (F.col("id") % 7).alias("v")))
    return df.orderBy(F.rand(42)) if shuffled else df


def test_optimize_rewrites_only_unclustered_files(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 20_000))
    t.relayout(["k"], target_files=4)                     # v1
    t.append(_rows(spark, 20_000, 25_000))                # v2
    t.append(_rows(spark, 25_000, 30_000))                # v3
    m = t._manifest(3)
    stale = [f for f in m["files"] if f.get("sort") != ["k"]]
    keep_paths = {f["path"] for f in m["files"]
                  if f.get("sort") == ["k"]}
    assert len(keep_paths) == 4 and stale

    v = t.optimize_incremental(["k"], target_files=2)

    assert v == 4
    assert t.last_optimize_stats == {
        "files_rewritten": len(stale), "files_carried": 4}
    m4 = t._manifest(4)
    # every clustered file carried untouched, every file now stamped
    assert keep_paths <= {f["path"] for f in m4["files"]}
    assert all(f.get("sort") == ["k"] for f in m4["files"])
    # content identical across the optimize
    assert (t.read(3).exceptAll(t.read(4)).count() == 0
            and t.read(4).exceptAll(t.read(3)).count() == 0)


def test_optimize_noop_when_fully_clustered(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 5_000))
    t.relayout(["k"], target_files=3)
    v = t.latest_version()
    assert t.optimize_incremental(["k"]) == v        # no empty commit
    assert t.last_optimize_stats["files_rewritten"] == 0
    assert t.latest_version() == v


def test_optimize_restores_pruning_selectivity(spark, tmp_path):
    """Append-born files span the whole key range, so a narrow range
    read must open them all; after optimize_incremental the arrivals
    are re-clustered and the range read prunes again."""
    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 40_000))
    t.relayout(["k"], target_files=8)
    for lo in (40_000, 45_000, 50_000, 55_000):
        # arrivals whose keys SPAN the whole space (the usual shape:
        # new data isn't key-ordered) — every appended file overlaps
        # any range predicate until re-clustered
        t.append(spark.range(lo, lo + 5_000)
                 .select(((F.col("id") * 7919) % 40_000).alias("k"),
                         (F.col("id") % 7).alias("v")))
    before_total = len(t._manifest(t.latest_version())["files"])
    before = len(t.pruned_files("k", 100, 200)[0])

    t.optimize_incremental(["k"], target_files=8)

    after = len(t.pruned_files("k", 100, 200)[0])
    # before: 1 clustered extent + every appended file; after: a
    # bounded number of extents
    assert before > after, (before, after, before_total)
    got = t.read_range("k", 100, 200).count()
    assert got == t.read().filter("k between 100 and 200").count()


def test_optimize_preserves_mor_deletes(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _rows(spark, 0, 10_000), enable_dv=True)
    t.relayout(["k"], target_files=2)
    t.append(_rows(spark, 10_000, 12_000))
    # hits BOTH a clustered file (k<50) and the appended files
    t.delete_where_mor("k < 50 or (k >= 10000 and k < 10050)")
    dv_before = t._manifest(t.latest_version()).get("dv_rows", 0)
    assert dv_before > 0

    t.optimize_incremental(["k"], target_files=2)

    m = t._manifest(t.latest_version())
    # rewritten (stale) files materialized their share; clustered
    # files' vector entries survive
    assert 0 < m.get("dv_rows", 0) < dv_before
    assert t.read().filter(
        "k < 50 or (k >= 10000 and k < 10050)").count() == 0
    assert t.read().count() == 12_000 - 100


def test_optimize_cluster_by_sql(spark, tmp_path):
    """``OPTIMIZE t CLUSTER BY (k)`` is the SQL spelling of
    optimize_incremental; ZORDER BY stays the full relayout."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 8_000))
    t.relayout(["k"], target_files=2)
    t.append(_rows(spark, 8_000, 9_000))
    before = {f["path"] for f in
              t._manifest(t.latest_version())["files"]
              if f.get("sort") == ["k"]}

    v = acid_sql(spark, "OPTIMIZE tbl CLUSTER BY (k)",
                 tables={"tbl": t})

    m = t._manifest(t.latest_version())
    assert t.latest_version() == v
    assert before <= {f["path"] for f in m["files"]}   # carried
    assert all(f.get("sort") == ["k"] for f in m["files"])
    assert t.read().count() == 9_000
    assert t.last_optimize_stats["files_carried"] == 2


def test_optimize_is_silent_for_table_stream(spark, tmp_path):
    """The acidtable-stream reader must treat optimize_incremental as
    a row-preserving commit: no duplicated rows, no failure."""
    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 3_000))
    t.relayout(["k"], target_files=2)
    t.append(_rows(spark, 3_000, 4_000))
    t.optimize_incremental(["k"])
    t.append(_rows(spark, 4_000, 5_000))

    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableStreamDataSource)
    spark.dataSource.register(AcidTableStreamDataSource)
    q = (spark.readStream.format("acidtable-stream")
         .option("path", str(tmp_path / "t"))
         .load()
         .writeStream.format("memory").queryName("liq_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct k) d "
                    "from liq_stream").collect()[0]
    assert (got.n, got.d) == (5_000, 5_000)
