"""Round-12 regression pins for the audited edge cases:

1. bloom_by refuses non-integral/non-string columns at declaration
   (create + set_bloom_by) — an all-zero bitset over unhashable values
   would read as definitive absence.
2. Point-equality probes are CANONICALIZED to the column's declared
   type before bloom hashing / partition / stats pruning, so pruning
   agrees with the residual Spark predicate's coercion (col = '5' on
   an int column matches rows holding 5).
3. Legacy tables that declared a non-indexable bloom column get NO
   sidecar for it (reader keeps files conservatively) instead of an
   all-zero false-absence bitset.
4. The vacuum-ledger compaction swap routes through the FileStore
   seam (get_store().atomic_replace), like every other metadata swap.
5. first_vacuumed_ref(probe=True) catches PARTIAL out-of-band
   deletions inside a commit dir (one listdir per dir + name-set
   membership), not just whole-dir removals.
6. The acidtable stream sink re-checks the column-mapping identity
   INSIDE the manifest-CAS retry loop — a drop+re-add pair landing in
   the window restores the logical names while minting a fresh
   physical identity, and must still force a restart.
"""
import json

import pyspark.sql.functions as F
import pytest

from spark_streaming_apps_spark.acid import (
    AcidTable, _canon_probe, build_bloom, bloom_may_contain,
    first_vacuumed_ref, ledger_append, resolve_manifest_files)


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


# ---------------------------------------------------------- 1: typing

def test_bloom_by_rejects_non_indexable_types(spark, tmp_path):
    df = _df(spark, [(1, 1.5, "a")], "id long, price double, s string")
    with pytest.raises(ValueError, match="not integral/string"):
        AcidTable.create(spark, tmp_path / "t1", df,
                         bloom_by=["price"])
    t = AcidTable.create(spark, tmp_path / "t2", df)
    with pytest.raises(ValueError, match="not integral/string"):
        t.set_bloom_by(["price"])
    # integral + string stay declarable
    t.set_bloom_by(["id", "s"])
    assert t.bloom_cols() == ["id", "s"]


# --------------------------------------------- 2: probe canonicalization

def test_canon_probe_unit():
    from pyspark.sql.types import (DoubleType, LongType, StringType)
    assert _canon_probe("5", LongType()) == (5, True)
    assert _canon_probe(5.0, LongType()) == (5, True)
    assert _canon_probe("5.5", LongType())[1] is False
    assert _canon_probe(5.5, LongType())[1] is False
    assert _canon_probe("x", StringType()) == ("x", True)
    # numeric probe on a string column compares as double in Spark
    # ('5.0' rows match lit 5) — never bloom-probeable
    assert _canon_probe(5, StringType())[1] is False
    assert _canon_probe(5, DoubleType())[1] is False
    assert _canon_probe(True, LongType())[1] is False
    assert _canon_probe(None, LongType())[1] is False


def test_int_column_probed_with_string(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.range(0, 4000).select(
            F.col("id").alias("k"),
            (F.col("id") * 7).alias("num")).repartition(4),
        bloom_by=["num"])
    t.append(spark.range(4000, 8000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("num"))
        .repartition(4))
    # '35007' canonicalizes to 35007 -> bloom still prunes AND the
    # holding file survives (the residual predicate coerces the same
    # way, so the row comes back)
    paths, total = t.pruned_files_eq("num", "35007")
    assert paths and len(paths) < total
    assert [r.k for r in t.read_eq("num", "35007").collect()] == [5001]
    # float-shaped probe of an integral value canonicalizes too
    assert [r.k for r in t.read_eq("num", 35007.0).collect()] == [5001]
    # absent canonicalized value: bloom proves absence everywhere
    assert t.pruned_files_eq("num", "35009")[0] == []
    assert t.read_eq("num", "35009").count() == 0


def test_string_column_probed_with_int_is_conservative(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, "5"), (2, "05"), (3, "7")], "k long, s string")
        .repartition(2),
        bloom_by=["s"])
    # Spark (ANSI) casts the STRING side to the int literal's type:
    # both '5' and '05' match lit 5 — an int probe must NOT consult
    # the bloom (which only holds exact-string hashes, so '05' would
    # be a false definitive absence)
    paths, total = t.pruned_files_eq("s", 5)
    assert len(paths) == total            # conservative: no skip
    got = sorted(r.k for r in t.read_eq("s", 5).collect())
    assert got == [1, 2]


# ------------------------------------------ 3: legacy non-indexable col

def test_legacy_nonindexable_bloom_col_gets_no_sidecar(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 5.0, "a")], "k long, price double, s string"),
        bloom_by=["s"])
    # simulate an old-build table that declared a double bloom column
    mpath = t.path / "manifests" / "v0.json"
    m = json.loads(mpath.read_text())
    m["props"]["bloom_by"] = ["s", "price"]
    mpath.write_text(json.dumps(m))
    t.append(_df(spark, [(2, 6.0, "b")], "k long, price double, s string"))
    m1 = t._manifest(1)
    import pyarrow.parquet as pq
    for f in resolve_manifest_files(t.path, m1) or []:
        blooms = f.get("bloom") or {}
        rows = pq.read_metadata(t.path / f["path"]).num_rows
        if rows:                          # no all-zero false-absence
            assert "price" not in blooms  # on files that HOLD values
        # (0-row files may keep one: definitive absence is exact there)
    # the read keeps every candidate file and the residual finds 6.0
    assert t.read_eq("price", 6).count() == 1
    assert t.read_eq("price", 6.0).count() == 1


def test_build_bloom_unindexable_values_still_conservative():
    # the unit primitive keeps its contract: unsupported types are
    # never indexed, and probing any value against their bitset says
    # 'maybe' only via the explicit guard in _attach_blooms (which
    # skips the sidecar) — bare build_bloom over floats is all-zero
    buf = build_bloom([1.5, 2.5])
    assert bloom_may_contain(buf, None)   # unsupported probe: maybe


# ------------------------------------------------ 4: ledger via store

def test_ledger_compaction_routes_through_filestore(tmp_path):
    from spark_streaming_apps_spark import storage
    from spark_streaming_apps_spark.acid import (_LEDGER_COMPACT_AFTER,
                                                 vacuumed_refs)

    class RecordingStore(storage.PosixFileStore):
        def __init__(self):
            self.replaced = []

        def atomic_replace(self, tmp, final):
            self.replaced.append(str(final))
            super().atomic_replace(tmp, final)

    root = tmp_path / "t"
    (root / "manifests").mkdir(parents=True)
    rec = RecordingStore()
    prev = storage.set_store(rec)
    try:
        for i in range(_LEDGER_COMPACT_AFTER + 4):
            ledger_append(root, {"ts": float(i),
                                 "paths": [f"data/c{i}/f.parquet"],
                                 "dirs": []})
    finally:
        storage.set_store(prev)
    assert any(p.endswith("_vacuumed.jsonl") for p in rec.replaced)
    paths, dirs = vacuumed_refs(root)
    # membership preserved across compaction (parent dirs don't exist
    # on disk, so paths collapse into dir entries — still members)
    assert all(f"data/c{i}" in dirs or f"data/c{i}/f.parquet" in paths
               for i in range(_LEDGER_COMPACT_AFTER + 4))


# ------------------------------------------- 5: partial-deletion probe

def test_probe_catches_partial_dir_deletion(spark, tmp_path):
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.range(0, 3000).select(F.col("id").alias("k"))
        .repartition(4))
    # a ledger exists (so the fast membership path answers 'intact')
    # but records nothing about this table's files
    ledger_append(t.path, {"ts": 0.0, "paths": [], "dirs": []})
    m = t._manifest(t.latest_version())
    files_rr = resolve_manifest_files(t.path, m)
    assert len(files_rr) >= 2
    assert first_vacuumed_ref(t.path, m, files_rr, probe=True) is None
    # out-of-band deletion of a NON-representative file (the last one
    # in its dir's reference list — the old single-stat probe only
    # checked the first)
    victim = files_rr[-1]["path"]
    (t.path / victim).unlink()
    assert first_vacuumed_ref(t.path, m, files_rr,
                              probe=True) == victim


# --------------------------------------------- 6: in-loop sink fence

def test_stream_sink_mapping_fence_inside_cas_loop(spark, tmp_path):
    """Drive the sink writer's commit() in-process with _walk_props
    staged to diverge AFTER the pre-loop fence — the in-loop re-check
    must refuse the commit before any manifest lands."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_apps_spark.sources import pysource

    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "id long, val long"))
    # the drop+re-add race: logical names end up IDENTICAL, physical
    # identity of 'val' is fresh
    t.drop_column("val")
    t.add_column("val", "long")
    new_mapping = dict(t._props().get("column_mapping") or {})
    assert new_mapping.get("val") not in (None, "val")

    writer = pysource.AcidStreamWriter(
        str(t.path), [("id", pa.int64()), ("val", pa.int64())],
        app_id="fence-test", mapping={})      # captured pre-race
    stage = tmp_path / "stage"
    stage.mkdir()
    fp = stage / "part-0.parquet"
    pq.write_table(pa.table({"id": [9], "val": [90]}), fp)
    msg = pysource.AcidSinkMessage([str(fp)], [str(stage)])

    real = pysource._walk_props

    def staged_walk(root):
        # pre-loop fence sees the STALE (captured) identity; the
        # in-loop re-check reads the CAS parent manifest's props
        # directly (zero extra IO), so it sees the real divergence
        props = dict(real(root))
        props["column_mapping"] = {}
        return props

    before = t.latest_version()
    orig = pysource._walk_props
    pysource._walk_props = staged_walk
    try:
        with pytest.raises(RuntimeError, match="restart the streaming"):
            writer.commit([msg], batchId=0)
    finally:
        pysource._walk_props = orig
    assert t.latest_version() == before      # nothing committed
