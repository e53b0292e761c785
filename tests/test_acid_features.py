"""Reader-feature protocol gate (Delta readerFeatures discipline)."""
import json

import pytest

from spark_streaming_apps_spark.acid import (
    AcidTable, UnsupportedTableFeature)


def _mk(spark, path, **kw):
    return AcidTable.create(
        spark, path,
        spark.createDataFrame([(i, i * 2) for i in range(20)],
                              "id long, val long"), **kw)


def test_features_recorded_when_first_used(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", enable_dv=True, enable_cdf=True,
            cdf_update_images=True)
    # cdf_update_images is declared at create; DV only once a vector
    # actually exists; column_mapping only once a rename happens
    assert t._props().get("reader_features") == ["cdf_update_images"]
    t.delete_where_mor("id >= 18")
    assert set(t._props()["reader_features"]) == {
        "cdf_update_images", "deletion_vectors"}
    t.rename_column("val", "score")
    assert set(t._props()["reader_features"]) == {
        "cdf_update_images", "column_mapping", "deletion_vectors"}
    # plain tables never grow the key
    t2 = _mk(spark, tmp_path / "t2")
    t2.append(spark.createDataFrame([(99, 0)], "id long, val long"))
    assert "reader_features" not in t2._props()


def test_unknown_feature_gates_every_access(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v = t.append(spark.createDataFrame([(99, 0)],
                                       "id long, val long"))
    mp = t._manifests / f"v{v}.json"
    m = json.loads(mp.read_text())
    m["props"] = {"reader_features": ["time_crystal_v2"]}
    mp.write_text(json.dumps(m))

    with pytest.raises(UnsupportedTableFeature, match="time_crystal"):
        t.read()
    with pytest.raises(UnsupportedTableFeature):
        t.read(v)
    with pytest.raises(UnsupportedTableFeature):
        t.append(spark.createDataFrame([(1, 1)], "id long, val long"))

    # the SparkSession-free planner path refuses too
    from spark_streaming_apps_spark.sources.pysource import _walk_props
    with pytest.raises(UnsupportedTableFeature):
        _walk_props(t.path)


def test_known_features_pass_the_gate(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", enable_dv=True)
    t.delete_where_mor("id >= 15")
    t.rename_column("val", "score")
    assert t.read().count() == 15
    assert t.read().columns == ["id", "score"]


def test_describe_detail_surfaces_round11_properties(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "id long, s string"),
        bloom_by=["s"], generated={"b": "id % 2"}, enable_dv=True)
    t.delete_where_mor("id = 2")          # real vector -> DV feature
    d = t.detail().collect()[0]
    assert d.bloom_by == ["s"]
    assert d.generated_columns == ["b"]
    assert d.reader_features == ["deletion_vectors"]


def test_describe_detail_clustering_summary(spark, tmp_path):
    """DESCRIBE DETAIL reports files per clustering provenance — the
    operator's is-maintenance-due signal."""
    import pyspark.sql.functions as F

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.range(0, 20_000).selectExpr(
            "id AS k", "id % 100 AS x", "(id * 7) % 100 AS y")
        .repartition(4))
    assert t.detail().collect()[0].clustering == ["unclustered:4"]
    t.zorder(["x", "y"], target_files=2)
    assert t.detail().collect()[0].clustering == ["zorder(x,y):2"]
    t.append(spark.range(30_000, 31_000).selectExpr(
        "id AS k", "id % 100 AS x", "(id * 7) % 100 AS y").coalesce(1))
    got = t.detail().collect()[0].clustering
    assert sorted(got) == ["unclustered:1", "zorder(x,y):2"]
