"""Generated columns (Delta GENERATED ALWAYS AS): write-time
materialization + implicit CHECK validation, with the canonical use —
a derived partition key writers never compute by hand."""
import pytest

from spark_streaming_apps_spark.acid import AcidTable, ConstraintViolation


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"d{i}") for i in range(lo, hi)], "id long, payload string")


def test_generated_column_materializes_on_append(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t", _rows(spark, 0, 100),
        generated={"bucket": "id % 4"},
        partition_by=["bucket"])
    assert t.read().columns == ["id", "payload", "bucket"]
    t.append(_rows(spark, 100, 200))            # no bucket provided
    got = t.read().filter("bucket != id % 4").count()
    assert got == 0 and t.read().count() == 200
    # the generated value landed as the partition tuple on every file
    m = t._manifest(t.latest_version())
    assert all("bucket" in (f.get("partition") or {})
               for f in m["files"])


def test_generated_partition_key_prunes_dml(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t", _rows(spark, 0, 400),
        generated={"bucket": "id % 4"}, partition_by=["bucket"])
    t.append(_rows(spark, 400, 800))
    total = len(t._manifest(t.latest_version())["files"])
    t.delete_where("bucket = 3 AND id >= 700")
    assert t.last_cow_stats["files_scanned"] < total
    assert t.read().filter("id >= 700 and id % 4 = 3").count() == 0


def test_explicit_values_validated(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t", _rows(spark, 0, 10),
        generated={"bucket": "id % 4"})
    ok = t.read().select("id", "payload", "bucket")
    t.append(ok)                                 # correct values pass
    bad = spark.createDataFrame([(1000, "x", 999)],
                                "id long, payload string, bucket long")
    with pytest.raises(ConstraintViolation, match="gen_bucket"):
        t.append(bad)
    assert t.read().filter("bucket = 999").count() == 0


def test_insert_sql_and_append_txn_materialize(spark, tmp_path):
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t", _rows(spark, 0, 10),
        generated={"bucket": "id % 4"})
    acid_sql(spark, "INSERT INTO tbl (id, payload) VALUES (50, 'i')",
             tables={"tbl": t})
    assert t.read().filter("id = 50").collect()[0].bucket == 2
    v = t.append_txn(_rows(spark, 60, 61), "app", 0)
    assert v is not None
    assert t.read().filter("id = 60").collect()[0].bucket == 0
