"""compact_small (Delta auto-compaction's primitive) and
VACUUM ... DRY RUN."""
import pyspark.sql.functions as F

from spark_streaming_apps_spark.acid import AcidTable


def _rows(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 5).alias("v")))


def test_compact_small_rewrites_only_small_files(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 200_000)
                         .coalesce(2))
    for lo in range(200_000, 200_500, 100):       # 5 tiny appends
        t.append(_rows(spark, lo, lo + 100).coalesce(1))
    m = t._manifest(t.latest_version())
    big = {f["path"] for f in m["files"] if f["bytes"] >= 100_000}
    assert len(big) == 2 and len(m["files"]) == 7

    v = t.compact_small(max_bytes=100_000, target_files=1)

    m2 = t._manifest(v)
    assert t.last_optimize_stats == {"files_rewritten": 5,
                                     "files_carried": 2}
    assert big <= {f["path"] for f in m2["files"]}   # carried by path
    assert len(m2["files"]) == 3                     # 2 big + 1 merged
    assert t.read().count() == 200_500
    # below min_files: no-op without a commit
    assert t.compact_small(max_bytes=100_000) == v
    assert t.latest_version() == v


def test_history_operation_metrics(spark, tmp_path):
    """DESCRIBE HISTORY carries per-commit operationMetrics read off
    the O(delta) encoding — no chain replay."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _rows(spark, 0, 1_000).coalesce(2))
    t.append(_rows(spark, 1_000, 1_500).coalesce(1))
    t.compact(1)
    h = {r.version: r for r in t.history().collect()}
    assert (h[0].files_added, h[0].rows_added) == (2, 1_000)
    assert (h[1].files_added, h[1].rows_added,
            h[1].files_removed) == (1, 500, 0)
    assert h[2].rows_added == 1_500 and h[2].files_removed == 3
    assert h[2].n_rows == 1_500


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(spark, tmp_path / "t", _rows(spark, 0, 1_000))
    t.append(_rows(spark, 1_000, 2_000))
    t.compact(1)
    t.append(_rows(spark, 2_000, 3_000))

    would = t.vacuum(keep_last=1, orphan_grace_s=0.0, dry_run=True)
    assert would                                   # something to drop
    # nothing deleted, no ledger written, history still readable
    assert not (t._manifests / "_vacuumed.jsonl").exists()
    assert t.read(0).count() == 1_000
    sql_would = acid_sql(
        spark, "VACUUM tbl RETAIN 1 VERSIONS DRY RUN", {"tbl": t})
    assert sql_would == would
    assert t.read(1).count() == 2_000

    removed = t.vacuum(keep_last=1, orphan_grace_s=0.0)
    assert sorted(removed) == sorted(would)        # the report was exact


def test_history_cumulative_totals_equal_full_resolution(spark, tmp_path):
    """history()'s n_files/n_rows are maintained cumulatively from the
    O(delta) encoding (no per-version full-list resolve); pin equality
    against the independently-resolved file lists over a mixed chain
    of appends, COW + MOR DML, compact, and restore — and pin the new
    operation_parameters column."""
    import json

    t = AcidTable.create(
        spark, tmp_path / "t", _rows(spark, 0, 1_000).coalesce(2),
        enable_cdf=True)
    t.append(_rows(spark, 1_000, 1_500).coalesce(1))       # v1
    t.delete_where("k >= 1400")                            # v2 COW
    t.delete_where_mor("k < 10")                           # v3 DV
    t.update_where({"v": "v + 1"}, "k BETWEEN 100 AND 110")  # v4
    t.compact(2)                                           # v5
    t.restore(1)                                           # v6
    t.append(_rows(spark, 9_000, 9_100))                   # v7

    h = {r.version: r for r in t.history().collect()}
    assert len(h) == t.latest_version() + 1
    for v in range(t.latest_version() + 1):
        m = t._manifest(v)                 # the old O(V×F) computation
        files = m.get("files") or []
        assert h[v].n_files == len(files), f"v{v} n_files"
        assert h[v].n_rows == (sum(f.get("rows", 0) for f in files)
                               - m.get("dv_rows", 0)), f"v{v} n_rows"
        # and the audit row agrees with the actual snapshot
        assert h[v].n_rows == t.read(v).count(), f"v{v} vs read()"

    assert json.loads(h[2].operation_parameters) == {
        "predicate": "k >= 1400"}
    assert json.loads(h[3].operation_parameters) == {
        "predicate": "k < 10"}
    assert json.loads(h[4].operation_parameters) == {
        "predicate": "k BETWEEN 100 AND 110", "set_columns": ["v"]}
    assert json.loads(h[5].operation_parameters) == {"target_files": 2}
    assert h[0].operation_parameters is None
    assert h[7].operation_parameters is None


def test_vacuum_distributes_large_victim_sets(spark, tmp_path):
    """Past 512 victims the delete execution fans out to executors
    (the pruned_files_eq discipline) — a 100k-orphan vacuum must not
    be 100k serial driver syscalls. Same observable outcome as the
    driver-side path: victims gone, retained snapshot intact."""
    t = AcidTable.create(spark, tmp_path / "t",
                         spark.range(0, 6000).repartition(600)
                         .selectExpr("id AS k"))
    assert len(t._manifest(0)["files"]) == 600
    t.compact(2)
    removed = t.vacuum(keep_last=1, orphan_grace_s=0.0)
    assert removed
    live = list((t.path / "data").rglob("*.parquet"))
    assert len(live) == 2                       # only the compacted files
    assert t.read().count() == 6000


def test_autocompact_bounds_live_files_and_keeps_fence(spark, tmp_path):
    """Opt-in auto-compaction: a per-batch append stream's live-file
    count stays BOUNDED over a long drain, rows are preserved, and the
    writer fence (cumulative txns map) rides through compaction — a
    replayed old batch still commits nothing afterwards."""
    from spark_streaming_apps_spark.acid import AcidTable

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(0, 0)], "k long, b long"))
    t.set_autocompact(max_bytes=1 << 20, min_files=4)
    for b in range(1, 21):                      # 20 arrival batches
        rows = spark.createDataFrame([(b * 10 + i, b)
                                      for i in range(3)],
                                     "k long, b long")
        assert t.append_txn(rows, "app", b) is not None
        t.maybe_autocompact()                  # the maintainer hook
    files = t._manifest(t.latest_version())["files"]
    # without compaction this is >= 21 files; the property bounds it
    assert len(files) < 8, f"live files unbounded: {len(files)}"
    assert t.read().count() == 61
    # fence intact across compactions: any replayed batch is a no-op
    assert t.append_txn(
        spark.createDataFrame([(999, 5)], "k long, b long"),
        "app", 5) is None
    assert t.read().count() == 61


def test_autocompact_is_noop_without_property(spark, tmp_path):
    from spark_streaming_apps_spark.acid import AcidTable

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(0, 0)], "k long, b long"))
    for b in range(6):
        t.append(spark.createDataFrame([(b, b)], "k long, b long"))
    v = t.latest_version()
    assert t.maybe_autocompact() is None
    assert t.latest_version() == v
    # clearing an enabled property restores the no-op
    t.set_autocompact(max_bytes=1 << 20, min_files=2)
    assert t.maybe_autocompact() is not None
    t.set_autocompact(None)
    t.append(spark.createDataFrame([(99, 9)], "k long, b long"))
    t.append(spark.createDataFrame([(98, 9)], "k long, b long"))
    assert t.maybe_autocompact() is None
