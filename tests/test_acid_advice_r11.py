"""Round-11 regression pins for the audited ACID edge cases:

1. restore() carries the TARGET version's column-mapping identity, so
   a later add_column can never bind a fresh column to a renamed-away
   column's bytes (the stale-inherited-mapping resurrection).
2. add_column defends against STALE mapping keys left by legacy
   restores: the stale physical is retired and a fresh identity minted.
3. The batch ``acidtable`` DataSource projects on drop-only tables
   (mapping == {} but files carry the dropped physical column) and
   applies the mapping in force AT THE READ VERSION, not the latest.
4. read_changes gates drop_column and identity-minting add_column the
   same way it gates rename_column (Delta's CDF epoch rule).
5. The vacuum ledger is seeded from a stat sweep when first created on
   a table with pre-ledger deletions, and restore/clone intact checks
   spot-probe one file per commit dir against out-of-band deletions.
6. Time-travel reads keep explicit per-file scan paths (loud failure);
   only the latest (vacuum-retained) version collapses to dir scans.
"""
import json
import shutil

import pytest

from spark_streaming_apps_spark.acid import AcidTable, VersionVacuumedError


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_restore_carries_target_mapping_no_resurrection(spark, tmp_path):
    """rename -> restore(pre-rename) -> add_column(renamed name): the
    new column must read NULL, never the renamed-away column's bytes."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10), (2, 20)], "id long, val long"))
    t.rename_column("val", "score")                        # v1
    assert t._props()["column_mapping"] == {"score": "val"}
    t.restore(0)                                           # v2
    # the restored state carries v0's (empty) mapping, not the stale
    # {score: val} entry from the rename
    assert t._props().get("column_mapping") in (None, {})
    assert t.read().columns == ["id", "val"]
    v = t.add_column("score", "long")                      # v3
    got = {(r.id, r.val, r.score) for r in t.read(v).collect()}
    assert got == {(1, 10, None), (2, 20, None)}


def test_add_column_defends_against_stale_mapping_key(spark, tmp_path):
    """A legacy restore (pre-round-11) inherited the LATEST props, so
    the mapping could hold a key no live column owns. add_column of
    that name must retire the stale physical and mint a fresh one."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "id long, val long"))
    t.rename_column("val", "score")                        # v1
    # simulate the legacy restore: v0's data+schema, LATEST (stale) props
    m0 = t._manifest(0)
    stale_props = dict(t._props(1))
    assert stale_props["column_mapping"] == {"score": "val"}
    assert t._try_commit(2, m0["data"], m0["schema"], "restore",
                         props=stale_props, files=m0.get("files"))
    assert t.read().columns == ["id", "val"]
    t.add_column("score", "long")                          # v3
    # the stale {score: val} entry is pruned — the new column never
    # binds to physical 'val' (still owned by live column 'val'), so
    # it reads NULL, not val's bytes
    assert t._props()["column_mapping"].get("score") != "val"
    got = {(r.id, r.val, r.score) for r in t.read().collect()}
    assert got == {(1, 10, None)}


def test_batch_datasource_drop_only_table(spark, tmp_path):
    """DROP COLUMN on a never-renamed table leaves mapping == {} but
    the data files still carry the dropped physical column — the batch
    reader must project it away instead of failing the schema-count
    check."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10, "a"), (2, 20, "b")],
            "id long, val long, tag string"))
    t.drop_column("tag")                                   # v1
    assert t._props()["column_mapping"] == {}
    from spark_streaming_apps_spark.sources.pysource import \
        AcidTableDataSource
    spark.dataSource.register(AcidTableDataSource)
    df = (spark.read.format("acidtable")
          .option("path", str(tmp_path / "t")).load())
    assert df.columns == ["id", "val"]
    assert {(r.id, r.val) for r in df.collect()} == {(1, 10), (2, 20)}


def test_batch_datasource_version_pinned_mapping(spark, tmp_path):
    """Time travel through the DataSource applies the mapping in force
    AT the pinned version: a drop-then-re-add after it must not remap
    the old version's column onto the re-added fresh physical."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10), (2, 20)], "id long, val long"))
    t.drop_column("val")                                   # v1
    t.add_column("val", "long")                            # v2: fresh phys
    assert t._props()["column_mapping"]["val"].startswith("col_")
    from spark_streaming_apps_spark.sources.pysource import \
        AcidTableDataSource
    spark.dataSource.register(AcidTableDataSource)
    old = (spark.read.format("acidtable")
           .option("path", str(tmp_path / "t"))
           .option("version", "0").load())
    assert {(r.id, r.val) for r in old.collect()} == {(1, 10), (2, 20)}
    new = (spark.read.format("acidtable")
           .option("path", str(tmp_path / "t")).load())
    assert {(r.id, r.val) for r in new.collect()} == {(1, None), (2, None)}


def test_read_changes_gates_drop_and_minting_add(spark, tmp_path):
    """CDF epoch gate covers drop_column and the add_column that mints
    a fresh physical identity; a plain add_column still passes."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "id long, val long"), enable_cdf=True)
    t.append(_df(spark, [(2, 20)], "id long, val long"))   # v1
    assert t.read_changes(0, 1).count() == 1               # pre-gate ok
    t.add_column("extra", "string")                        # v2: plain add
    assert t.read_changes(0, 2).count() == 1               # still passes
    t.drop_column("val")                                   # v3
    with pytest.raises(ValueError, match="column-mapping schema change"):
        t.read_changes(0, 3)
    with pytest.raises(ValueError, match="column-mapping schema change"):
        t.read_changes(2, 3)
    t.add_column("val", "long")                            # v4: MINTS
    assert t._props()["column_mapping"]["val"].startswith("col_")
    with pytest.raises(ValueError, match="column-mapping schema change"):
        t.read_changes(3, 4)
    # within one epoch the feed still serves
    t.append(_df(spark, [(3, "x", 30)],
                 "id long, extra string, val long"))       # v5
    assert t.read_changes(4, 5).count() == 1


def test_vacuum_seeds_ledger_from_pre_ledger_deletions(spark, tmp_path):
    """Files deleted before this build's ledger existed (old-build
    vacuum) must become ledger members at the first ledgered vacuum —
    otherwise ledger-mode intact checks call their versions readable
    and restore() commits a manifest referencing missing files."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1,)], "id long"))
    t.compact()                                            # v1: new file
    t.compact()                                            # v2: new file
    m0 = t._manifest(0)
    # simulate a PRE-LEDGER vacuum: delete v0's commit dir by hand
    shutil.rmtree(tmp_path / "t" / m0["data"])
    assert not (tmp_path / "t" / "manifests" / "_vacuumed.jsonl").exists()
    t.append(_df(spark, [(2,)], "id long"))                # v3
    t.compact()                                            # v4
    removed = t.vacuum(keep_last=2)                        # creates ledger
    assert removed                                         # something died
    ledger = (tmp_path / "t" / "manifests" / "_vacuumed.jsonl")
    recs = [json.loads(x) for x in ledger.read_text().splitlines()]
    assert any(r.get("seed") for r in recs)
    # ledger-mode verdict now knows v0 is gone
    with pytest.raises(VersionVacuumedError):
        t.restore(0)
    with pytest.raises(VersionVacuumedError):
        t.clone(tmp_path / "c0", version=0)


def test_restore_probe_catches_out_of_band_deletion(spark, tmp_path):
    """With a ledger already in place, a file deleted OUT OF BAND (not
    through vacuum) is absent from the ledger; the restore/clone
    per-dir spot probe must still refuse instead of committing a
    manifest against missing files."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1,)], "id long"))
    t.compact()                                            # v1
    t.compact()                                            # v2
    t.compact()                                            # v3
    t.vacuum(keep_last=3)                                  # ledger: v0 dies
    assert (tmp_path / "t" / "manifests" / "_vacuumed.jsonl").exists()
    m1 = t._manifest(1)                                    # retained
    shutil.rmtree(tmp_path / "t" / m1["data"])             # out-of-band
    with pytest.raises(VersionVacuumedError):
        t.restore(1)
    with pytest.raises(VersionVacuumedError):
        t.clone(tmp_path / "c1", version=1)


def test_vacuum_ledger_compacts_and_keeps_membership(spark, tmp_path):
    """Heavy maintenance cadence must not grow the ledger forever: past
    the record threshold the ledger compacts to its canonical deleted
    set (dedup + gone-dir collapse) under an flock, and every
    membership answer is unchanged — all vacuumed versions still gate,
    all retained versions still serve."""
    import json

    from spark_streaming_apps_spark.acid import (_LEDGER_CACHE,
                                                 _LEDGER_COMPACT_AFTER,
                                                 vacuumed_refs)

    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(0,)], "id long"))
    n_cycles = _LEDGER_COMPACT_AFTER + 8
    for i in range(n_cycles):                 # each: rewrite + vacuum
        t.compact(target_files=1)
        t.vacuum(keep_last=1)
    ledger = tmp_path / "t" / "manifests" / "_vacuumed.jsonl"
    recs = [json.loads(x) for x in ledger.read_text().splitlines()]
    # bounded: far fewer records than vacuum invocations
    assert len(recs) < _LEDGER_COMPACT_AFTER
    assert any(r.get("compacted") for r in recs)
    # membership semantics: every pre-latest version gates, latest serves
    latest = t.latest_version()
    gated = 0
    for v in range(latest):
        try:
            t.read(v).count()
        except VersionVacuumedError:
            gated += 1
    assert gated == latest                    # all history vacuumed
    assert t.read().count() == 1
    # the cache revalidates against the compacted file
    _LEDGER_CACHE.clear()
    paths, dirs = vacuumed_refs(tmp_path / "t")
    assert dirs                               # gone dirs collapsed
    # within the COMPACTED record itself, no path is redundant with a
    # dir entry (post-compaction appends may briefly duplicate until
    # the next threshold crossing — that is the design)
    comp = next(r for r in recs if r.get("compacted"))
    assert all(p.rsplit("/", 1)[0] not in set(comp["dirs"])
               for p in comp["paths"])


def test_scan_paths_collapse_only_latest(spark, tmp_path):
    """Dir-collapse applies to the latest (vacuum-retained) version
    only; time-travel reads keep explicit per-file paths so a missing
    file fails loudly instead of silently shrinking the scan."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1,), (2,)], "id long")
                         .repartition(2))
    t.compact()                                            # v1
    m0, m1 = t._manifest(0), t._manifest(1)
    # latest: fully-referenced commit dirs collapse
    latest_paths = t._scan_paths(m1, m1["files"], collapse=True)
    assert all(not p.endswith(".parquet") for p in latest_paths)
    # time travel: explicit per-file paths
    old_paths = t._scan_paths(m0, m0["files"], collapse=False)
    assert len(old_paths) == len(m0["files"])
    assert all(p.endswith(".parquet") for p in old_paths)
    assert t.read(0).count() == 2
