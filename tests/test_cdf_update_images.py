"""Opt-in Delta CDF UPDATE image types (cdf_update_images property)."""
import pytest

from spark_streaming_apps_spark.acid import (
    AcidTable, normalize_change_types)


def _mk(spark, path, **kw):
    return AcidTable.create(
        spark, path,
        spark.createDataFrame([(i, i * 10) for i in range(10)],
                              "id long, val long"), **kw)


def test_update_records_image_pairs_changed_rows_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", enable_cdf=True,
            cdf_update_images=True)
    # id<3 changes; id=3 is "assigned" its own value -> cancels out
    t.update_where({"val": "CASE WHEN id < 3 THEN val+1 ELSE val END"},
                   "id < 4")
    ch = t.read_changes(0, 1).collect()
    got = {(r.id, r.val, r._change_type) for r in ch}
    assert got == ({(i, i * 10, "update_preimage") for i in range(3)}
                   | {(i, i * 10 + 1, "update_postimage")
                      for i in range(3)})
    # normalization folds to the two-type algebra
    norm = {r._change_type for r in normalize_change_types(
        t.read_changes(0, 1)).collect()}
    assert norm == {"insert", "delete"}


def test_delete_labels_unaffected_and_default_off(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", enable_cdf=True,
            cdf_update_images=True)
    t.delete_where("id >= 8")
    assert {r._change_type for r in t.read_changes(0, 1).collect()} \
        == {"delete"}
    # default-off table keeps plain insert/delete for UPDATE
    t2 = _mk(spark, tmp_path / "t2", enable_cdf=True)
    t2.update_where({"val": "val+1"}, "id = 0")
    assert {r._change_type for r in t2.read_changes(0, 1).collect()} \
        == {"insert", "delete"}


def test_images_require_cdf(spark, tmp_path):
    with pytest.raises(ValueError, match="enable_cdf"):
        _mk(spark, tmp_path / "t", cdf_update_images=True)


def test_mor_update_records_image_pairs(spark, tmp_path):
    """The MOR UPDATE path honors cdf_update_images the same way the
    COW path does: changed rows only, post/pre labels, MERGE stays
    plain insert/delete (its commit mixes updates with inserts)."""
    t = _mk(spark, tmp_path / "t", enable_cdf=True, enable_dv=True,
            cdf_update_images=True)
    v = t.update_where_mor(
        {"val": "CASE WHEN id < 3 THEN val+1 ELSE val END"}, "id < 4")
    assert t._manifest(v)["op"] == "update_mor"
    got = {(r.id, r.val, r._change_type)
           for r in t.read_changes(v - 1, v).collect()}
    assert got == ({(i, i * 10, "update_preimage") for i in range(3)}
                   | {(i, i * 10 + 1, "update_postimage")
                      for i in range(3)})
    # the IVM contract still holds through normalization
    norm = normalize_change_types(t.read_changes(v - 1, v))
    ins = {(r.id, r.val) for r in
           norm.filter("_change_type = 'insert'").collect()}
    dels = {(r.id, r.val) for r in
            norm.filter("_change_type = 'delete'").collect()}
    before = {(r.id, r.val) for r in t.read(v - 1).collect()}
    after = {(r.id, r.val) for r in t.read(v).collect()}
    assert (before | ins) - dels == after
    # MOR MERGE on the same table keeps plain labels
    vm = t.merge_mor(spark.createDataFrame([(0, 999), (77, 770)],
                                           "id long, val long"), ["id"])
    labels = {r._change_type
              for r in t.read_changes(vm - 1, vm).collect()}
    assert labels == {"insert", "delete"}
