"""Morton ZORDER with built-in incremental maintenance.

``zorder(cols)`` stamps curve provenance on the files it writes, so a
later run carries every stamped file by METADATA and rewrites only
unclustered arrivals — the liquid-clustering O(arrivals) maintenance
shape, extended from linear keys to 2-D+ curves. Pins: 2-D range-scan
candidate counts before/after, rewrite counts per pass, no-op reuse.
"""
import pyspark.sql.functions as F

from spark_streaming_apps_spark.acid import AcidTable


def _grid(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS rid",
        "id % 1024 AS x",
        "(id * 7919) % 1024 AS y")


def _candidates_2d(t, lo, hi):
    """Files that survive BOTH single-dim range prunes — the 2-D tile
    query a Morton layout exists for."""
    px = set(t.pruned_files("x", lo, hi)[0])
    py = set(t.pruned_files("y", lo, hi)[0])
    return len(px & py)


def test_zorder_full_then_incremental(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _grid(spark, 0, 200_000).repartition(8))
    n0 = len(t._manifest(0)["files"])

    v1 = t.zorder(["x", "y"], target_files=16)
    st = t.last_optimize_stats
    assert st == {"files_rewritten": n0, "files_carried": 0}
    m = t._manifest(v1)
    assert all(f.get("zorder") == ["x", "y"] for f in m["files"])
    total = len(m["files"])
    c_tiled = _candidates_2d(t, 100, 131)
    # a 32x32 tile query opens a small corner of the table, not all of
    # it — both dimensions' spans are bounded per file
    assert c_tiled < total / 2, (c_tiled, total)

    # arrivals spanning the whole space pollute the 2-D scan
    t.append(_grid(spark, 500_000, 520_000).repartition(6))
    c_polluted = _candidates_2d(t, 100, 131)
    assert c_polluted > c_tiled

    # incremental pass: ONLY the 6 arrival files rewrite; the 16
    # clustered files are carried by metadata
    v2 = t.zorder(["x", "y"], target_files=4)
    st = t.last_optimize_stats
    assert st["files_carried"] == total
    assert st["files_rewritten"] == 6
    c_after = _candidates_2d(t, 100, 131)
    assert c_after < c_polluted
    # rows preserved through both layout passes
    assert t.read().count() == 220_000
    assert t.read(v2 - 1).count() == 220_000

    # nothing stale: a third pass is a version-preserving no-op
    assert t.zorder(["x", "y"]) == v2
    assert t.latest_version() == v2

    # the audit trail records the curve
    import json
    h = {r.version: r for r in t.history().collect()}
    assert json.loads(h[v1].operation_parameters)["zorder_by"] == \
        ["x", "y"]


def test_sql_optimize_zorder_is_incremental(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(spark, tmp_path / "t",
                         _grid(spark, 0, 50_000).repartition(4))
    acid_sql(spark, "OPTIMIZE tbl ZORDER BY (x, y)", {"tbl": t})
    assert t.last_optimize_stats["files_rewritten"] == 4
    t.append(_grid(spark, 60_000, 62_000).coalesce(1))
    acid_sql(spark, "OPTIMIZE tbl ZORDER BY (x, y)", {"tbl": t})
    st = t.last_optimize_stats
    assert st["files_rewritten"] == 1 and st["files_carried"] >= 4
    assert t.read().count() == 52_000


def test_zorder_refuses_string_dim_points_at_relayout(spark, tmp_path):
    import pytest

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a")], "x long, s string"))
    with pytest.raises(ValueError, match="relayout"):
        t.zorder(["x", "s"])


def test_partition_scoped_incremental_maintenance(spark, tmp_path):
    """OPTIMIZE t WHERE <partition pins> ZORDER/CLUSTER BY: clustering
    maintenance scoped to the pinned partitions — out-of-scope
    partitions' files are carried untouched BY PATH, so a hot-partition
    re-cluster never pays for the cold ones."""
    from spark_streaming_apps_spark.acid import (AcidTable,
                                                 resolve_manifest_files)
    from spark_streaming_apps_spark.merge_sql import acid_sql

    df = (_grid(spark, 0, 40_000)
          .withColumn("bucket", F.col("rid") % 2))
    t = AcidTable.create(spark, tmp_path / "t", df.repartition(4),
                         partition_by=["bucket"])
    before = {f["path"]: f for f in resolve_manifest_files(
        t.path, t._manifest(t.latest_version()))}
    acid_sql(spark, "OPTIMIZE tbl WHERE bucket = 1 ZORDER BY (x, y)",
             {"tbl": t})
    st = t.last_optimize_stats
    assert st["files_rewritten"] > 0
    after = {f["path"]: f for f in resolve_manifest_files(
        t.path, t._manifest(t.latest_version()))}
    # bucket-0 files carried byte-identical by path; bucket-1 rewritten
    for p, f in after.items():
        if (f.get("partition") or {}).get("bucket") == 0:
            assert p in before and f.get("zorder") is None
        else:
            assert f.get("zorder") == ["x", "y"]
    assert t.read().count() == 40_000
    # scoped CLUSTER BY takes the same path
    acid_sql(spark, "OPTIMIZE tbl WHERE bucket = 0 CLUSTER BY (x)",
             {"tbl": t})
    after2 = {f["path"]: f for f in resolve_manifest_files(
        t.path, t._manifest(t.latest_version()))}
    for f in after2.values():
        b = (f.get("partition") or {}).get("bucket")
        assert (f.get("sort") == ["x"]) == (b == 0)
    assert t.read().count() == 40_000
