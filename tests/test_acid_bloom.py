"""Per-file bloom-filter index (Delta's bloom filter index).

Point-equality reads on high-cardinality unclustered columns are the
one case [min, max] stats can't help (every file's range spans the
space). ``bloom_by`` columns get a per-file bitset sidecar built in
one distributed pass over each commit's NEW files; ``read_eq`` skips
files whose bitset proves the value absent. False positives cost an
open; false negatives are impossible by construction (pinned here).
"""
import pyspark.sql.functions as F
import pytest

from spark_streaming_apps_spark.acid import (
    AcidTable, bloom_may_contain, build_bloom)


def _docs(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("k"),
                    F.md5(F.col("id").cast("string")).alias("doc_id"),
                    (F.col("id") % 13).alias("v")))


def test_bloom_unit_no_false_negatives_and_fpp():
    vals = [f"v{i}" for i in range(5_000)]
    buf = build_bloom(vals)
    assert all(bloom_may_contain(buf, v) for v in vals)
    fp = sum(bloom_may_contain(buf, f"absent{i}") for i in range(10_000))
    assert fp < 300          # ~1% design FPP, wide margin
    # ints and strings never collide by type tag
    assert not bloom_may_contain(build_bloom([1, 2, 3]), "1")
    # None/unsupported: unindexed, reader must keep
    assert bloom_may_contain(build_bloom(["x"]), None)


def test_point_lookup_skips_files(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 50_000),
                         bloom_by=["doc_id"])
    for lo in (50_000, 60_000, 70_000):
        t.append(_docs(spark, lo, lo + 10_000))
    needle = t.read().filter("k = 61234").collect()[0].doc_id

    paths, total = t.pruned_files_eq("doc_id", needle)
    assert total > 8 and len(paths) <= max(2, total // 4), (len(paths),
                                                            total)
    got = t.read_eq("doc_id", needle).collect()
    assert [(r.k, r.doc_id) for r in got] == [(61234, needle)]
    # absent value: every file's bitset proves absence
    none_paths, _ = t.pruned_files_eq("doc_id", "no-such-hash")
    assert none_paths == []
    assert t.read_eq("doc_id", "no-such-hash").count() == 0


def test_set_bloom_by_indexes_future_and_rewrites(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 20_000))
    t.append(_docs(spark, 20_000, 30_000))
    needle = t.read().filter("k = 25000").collect()[0].doc_id
    # unindexed: stats can't skip md5s -> everything is a candidate
    paths, total = t.pruned_files_eq("doc_id", needle)
    assert len(paths) == total

    t.set_bloom_by(["doc_id"])
    t.append(_docs(spark, 30_000, 40_000))      # indexed at write
    paths2, total2 = t.pruned_files_eq("doc_id", "absent")
    # old files conservatively kept, the new commit's files skipped
    assert len(paths2) < total2

    t.compact(target_files=4)                   # full rewrite re-indexes
    paths3, total3 = t.pruned_files_eq("doc_id", "absent")
    assert paths3 == [] and total3 == 4
    assert t.read_eq("doc_id", needle).count() == 1


def test_bloom_survives_vacuum_and_clone(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 10_000),
                         bloom_by=["doc_id"])
    for lo in (10_000, 20_000, 30_000):
        t.append(_docs(spark, lo, lo + 10_000))
    needle = t.read().filter("k = 31234").collect()[0].doc_id

    t.vacuum(keep_last=1, orphan_grace_s=0.0)
    paths, total = t.pruned_files_eq("doc_id", needle)
    assert 0 < len(paths) < total
    assert t.read_eq("doc_id", needle).count() == 1

    c = t.clone(tmp_path / "c")
    cp, ctotal = c.pruned_files_eq("doc_id", needle)
    assert 0 < len(cp) < ctotal
    assert c.read_eq("doc_id", needle).count() == 1
    # absent lookups skip everything on the clone too
    assert c.pruned_files_eq("doc_id", "nope")[0] == []


def test_bloom_after_delete_rewrite(spark, tmp_path):
    """COW DELETE rewrites touched files through the staging hook, so
    the replacement files are re-indexed: a deleted value's lookup
    skips every file and returns nothing."""
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 20_000),
                         bloom_by=["doc_id"])
    needle = t.read().filter("k = 7777").collect()[0].doc_id
    t.delete_where(f"doc_id = '{needle}'")
    assert t.pruned_files_eq("doc_id", needle)[0] == []
    assert t.read_eq("doc_id", needle).count() == 0
    assert t.read().count() == 19_999


def test_bloom_probe_distributes_past_threshold(spark, tmp_path):
    """>64 bloom candidates fan the sidecar probes out to executors
    (the 100k-file shape); results identical to the driver-side path:
    present needle -> few candidates, absent -> none."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _docs(spark, 0, 36_000).repartition(72), bloom_by=["doc_id"])
    m = t._manifest(0)
    assert len(m["files"]) == 72
    needle = t.read().filter("k = 123").collect()[0].doc_id

    paths, total = t.pruned_files_eq("doc_id", needle)
    assert total == 72 and 1 <= len(paths) <= 4, (len(paths), total)
    assert t.read_eq("doc_id", needle).count() == 1
    assert t.pruned_files_eq("doc_id", "nope")[0] == []


def test_bloom_conservative_after_rename(spark, tmp_path):
    """Column mapping: a rename leaves old sidecars keyed by the old
    logical name — lookups on the new name degrade to conservative
    keeps (correct, never a wrong skip)."""
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 5_000),
                         bloom_by=["doc_id"])
    needle = t.read().filter("k = 123").collect()[0].doc_id
    t.rename_column("doc_id", "fingerprint")
    paths, total = t.pruned_files_eq("fingerprint", needle)
    assert len(paths) == total            # conservative, not skipped
    assert t.read_eq("fingerprint", needle).count() == 1


def test_read_eq_any_batched_lookup(spark, tmp_path):
    """K-needle batched lookup: union of the per-needle pruned sets,
    one sidecar read per candidate file, one Spark job — results equal
    the union of K read_eq calls; absent needles add nothing; pruning
    still skips a strict majority of files."""
    t = AcidTable.create(spark, tmp_path / "t", _docs(spark, 0, 50_000),
                         bloom_by=["doc_id"])
    for lo in (50_000, 60_000, 70_000):
        t.append(_docs(spark, lo, lo + 10_000))
    ks = [7, 51_234, 61_234, 79_999]
    needles = [r.doc_id for r in
               t.read().filter(F.col("k").isin(ks)).collect()]
    assert len(needles) == len(ks)

    paths, total = t.pruned_files_in("doc_id", needles)
    # union prune: more than one needle's files, still a minority
    per = [set(t.pruned_files_eq("doc_id", n)[0]) for n in needles]
    assert set(paths) == set().union(*per)
    assert len(paths) < total

    got = {(r.k, r.doc_id) for r in
           t.read_eq_any("doc_id", needles).collect()}
    assert len(got) == len(ks)
    assert {r[0] for r in got} == set(ks)
    assert {r[1] for r in got} == set(needles)
    # absent-only batch: every file skipped, empty result
    misses = ["no-such-1", "no-such-2"]
    assert t.pruned_files_in("doc_id", misses)[0] == []
    assert t.read_eq_any("doc_id", misses).count() == 0
    # mixed present/absent == present-only result
    mixed = {(r.k, r.doc_id) for r in
             t.read_eq_any("doc_id", needles + misses).collect()}
    assert mixed == got


def test_read_eq_any_distributes_and_canonicalizes(spark, tmp_path):
    """Past the 64-candidate threshold the batched probe fans out to
    executors; int-typed columns canonicalize string spellings of the
    probe the same way read_eq does."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _docs(spark, 0, 36_000).repartition(72), bloom_by=["k"])
    m = t._manifest(0)
    assert len(m["files"]) == 72
    got = {r.k for r in t.read_eq_any("k", [123, "456"]).collect()}
    assert got == {123, 456}
