"""Blind-append conflict resolution (Delta's append-wins rule).

A linked append that loses the manifest race must RE-PARENT its
already-staged files against the winner — one manifest retry, not a
re-stage of the batch — whenever the winner left schema, props
(column-mapping identity, partition spec, cdf/dv flags) and the
constraint set untouched. When the winner DID change one of those, the
staged bytes may be stale, so the loser must fall back to the full
rebuild path. Either way no committed update is ever lost.

Reference analog: FileWorkerApp.scala:207-227's transactional claim —
two workers race one queue row; the loser retries against the winner's
state instead of double-applying.
"""
import pyspark.sql.functions as F

from spark_streaming_apps_spark.acid import AcidTable


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _race(t1, t2, winner_commit):
    """Make t1's next commit lose its first manifest race: the first
    time t1 reaches _try_commit (data already staged), winner_commit()
    runs through t2 and takes the version slot."""
    real = t1._try_commit
    state = {"fired": False, "tries": 0}

    def fenced(version, *a, **k):
        state["tries"] += 1
        if not state["fired"]:
            state["fired"] = True
            winner_commit()
        return real(version, *a, **k)

    t1._try_commit = fenced
    return state


def _count_stages(t):
    """Count _write_data_linked calls (each is one full batch stage)."""
    real = t._write_data_linked
    box = {"n": 0}

    def counted(parent, rows):
        box["n"] += 1
        return real(parent, rows)

    t._write_data_linked = counted
    return box


def test_lost_append_race_rebases_without_restaging(spark, tmp_path):
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, "a")], "id long, s string"))
    t2 = AcidTable(spark, tmp_path / "t")
    state = _race(t1, t2, lambda: t2.append(
        _df(spark, [(2, "winner")], "id long, s string")))
    stages = _count_stages(t1)

    v = t1.append(_df(spark, [(3, "loser")], "id long, s string"))

    # the loser staged ONCE, lost once, rebased, committed second try
    assert stages["n"] == 1
    assert state["tries"] == 2
    assert v == 2
    got = {(r.id, r.s) for r in t1.read().collect()}
    assert got == {(1, "a"), (2, "winner"), (3, "loser")}
    # the rebased manifest carries the winner's files by reference
    m = t1._manifest(2)
    paths = {f["path"] for f in m["files"]}
    assert {f["path"] for f in t1._manifest(1)["files"]} <= paths


def test_lost_append_race_vs_schema_change_restages(spark, tmp_path):
    """Winner renames a column: the staged parquet carries the OLD
    physical layout assumptions, so the loser must rebuild fully."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "id long, val long"))
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.rename_column("val", "score"))
    stages = _count_stages(t1)

    # the append binds OLD names at call time; after the winner's
    # rename the loser's re-derived snapshot no longer matches the
    # insert columns, so the fallback goes through the full build path
    # (unionByName raises on the mismatch — loud, never silent)
    import pytest
    from pyspark.errors import AnalysisException
    with pytest.raises(AnalysisException):
        t1.append(_df(spark, [(3, 30)], "id long, val long"))
    assert stages["n"] == 1          # staged once, then fell back
    # the winner's rename is intact and no phantom rows landed
    assert {(r.id, r.score) for r in t2.read().collect()} == {(1, 10)}


def test_lost_append_race_vs_new_constraint_rechecks(spark, tmp_path):
    """Winner adds a CHECK constraint the loser's rows violate: the
    rebase must NOT fire (constraint set changed); the fallback path
    re-checks and refuses, so the invalid rows never land."""
    import pytest

    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, 10)], "id long, val long"))
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.add_constraint("val_pos", "val > 0"))

    with pytest.raises(Exception, match="val_pos"):
        t1.append(_df(spark, [(3, -5)], "id long, val long"))
    # table state: winner's constraint holds, no invalid row committed
    assert {(r.id, r.val) for r in t2.read().collect()} == {(1, 10)}
    assert t2._manifest(t2.latest_version()).get(
        "constraints", {}).get("val_pos")


def test_rebased_append_keeps_cdf_contract(spark, tmp_path):
    """On a CDF table the rebased commit reuses its recorded change
    files; the multiset contract read(v0) + inserts == read(v2) must
    hold across the raced commits."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(1, "a")], "id long, s string"),
        enable_cdf=True)
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.append(
        _df(spark, [(2, "w")], "id long, s string")))
    stages = _count_stages(t1)
    t1.append(_df(spark, [(3, "l")], "id long, s string"))
    assert stages["n"] == 1

    ch = t1.read_changes(0, 2)
    ins = {(r.id, r.s) for r in
           ch.filter(F.col("_change_type") == "insert").collect()}
    assert ins == {(2, "w"), (3, "l")}
    assert ch.filter(F.col("_change_type") == "delete").count() == 0


def _count_full_writes(t):
    real = t._write_data_full
    box = {"n": 0}

    def counted(df, pcols=None, order_by=None):
        box["n"] += 1
        return real(df, pcols, order_by)

    t._write_data_full = counted
    return box


def test_lost_compaction_race_rebases_file_level(spark, tmp_path):
    """OPTIMIZE loses to a concurrent append: the compacted output must
    be re-parented (staged once), with the winner's appended file
    carried alongside — never a second full-table rewrite."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, f"r{i}") for i in range(20)],
            "id long, s string"))
    t1.append(_df(spark, [(100, "x")], "id long, s string"))
    t2 = AcidTable(spark, tmp_path / "t")
    state = _race(t1, t2, lambda: t2.append(
        _df(spark, [(200, "winner")], "id long, s string")))
    writes = _count_full_writes(t1)

    v = t1.compact(target_files=1)

    assert writes["n"] == 1          # ONE rewrite despite the loss
    assert state["tries"] == 2
    assert v == 3
    got = {(r.id, r.s) for r in t1.read().collect()}
    assert got == ({(i, f"r{i}") for i in range(20)}
                   | {(100, "x"), (200, "winner")})
    # manifest shape: the staged compacted file(s) + the winner's
    # appended file, carried by reference
    m = t1._manifest(3)
    winner_paths = {f["path"] for f in t1._carried_entries(
        t1._manifest(2))} - {f["path"] for f in t1._carried_entries(
        t1._manifest(1))}
    assert winner_paths <= {f["path"] for f in m["files"]}


def test_lost_compaction_vs_mor_delete_restages(spark, tmp_path):
    """Winner MOR-deletes rows (new deletion vector): the staged
    compaction would RESURRECT them, so the loser must fall back to a
    full rebuild against the winner's snapshot."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i * 10) for i in range(10)],
            "id long, val long"),
        enable_dv=True)
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.delete_where_mor("id >= 8"))
    writes = _count_full_writes(t1)

    t1.compact(target_files=1)

    assert writes["n"] == 2          # staged, fell back, re-staged
    got = {(r.id, r.val) for r in t1.read().collect()}
    assert got == {(i, i * 10) for i in range(8)}   # deletes honored


def _count_dml_stages(t):
    """Count _assemble_commit calls (each is one staged DML rewrite)."""
    real = t._assemble_commit
    box = {"n": 0}

    def counted(rows, parent, link):
        box["n"] += 1
        return real(rows, parent, link)

    t._assemble_commit = counted
    return box


def test_lost_delete_race_vs_nonmatching_append_rebases(spark, tmp_path):
    """DELETE loses to an append whose rows the predicate MISSES: the
    staged replacements re-parent, the winner's file rides along —
    no second find/rewrite pass (Delta would abort here only if the
    added files might match; ours re-probes just the added file)."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i % 3) for i in range(30)], "id long, k long"))
    t2 = AcidTable(spark, tmp_path / "t")
    state = _race(t1, t2, lambda: t2.append(
        _df(spark, [(1000, 2)], "id long, k long")))
    stages = _count_dml_stages(t1)

    v = t1.delete_where("k = 0")

    assert stages["n"] == 1          # ONE staged rewrite despite loss
    assert state["tries"] == 2
    assert v == 2
    got = {r.id for r in t1.read().collect()}
    assert got == ({i for i in range(30) if i % 3} | {1000})


def test_lost_delete_race_vs_matching_append_incremental(spark,
                                                         tmp_path):
    """DELETE loses to an append whose rows MATCH the predicate: the
    added file is incrementally rewritten (serial-equivalent to
    append-then-delete) — never a full re-run of the DML."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i % 3) for i in range(30)], "id long, k long"))
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.append(
        _df(spark, [(1000, 0), (1001, 1)], "id long, k long")))
    stages = _count_dml_stages(t1)

    v = t1.delete_where("k = 0")

    assert stages["n"] == 1          # base rewrite staged exactly once
    assert v == 2
    got = {r.id for r in t1.read().collect()}
    # 1000 (k=0) deleted with the rest; 1001 (k=1) survives
    assert got == ({i for i in range(30) if i % 3} | {1001})


def test_lost_delete_race_vs_file_rewrite_restages(spark, tmp_path):
    """Winner UPDATEd rows (rewrote base files): base files are gone
    from the winner's snapshot, so the staged delete must rebuild —
    and the final state reflects update-then-delete serially."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i % 3) for i in range(30)], "id long, k long"))
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.update_where({"k": "0"}, "id = 5"))
    stages = _count_dml_stages(t1)

    t1.delete_where("k = 0")

    assert stages["n"] == 2          # staged, fell back, re-staged
    got = {r.id for r in t1.read().collect()}
    expect = {i for i in range(30) if i % 3} - {5}
    assert got == expect


def test_lost_mor_delete_race_rebases_vector(spark, tmp_path):
    """MOR DELETE loses to a non-matching append: the staged deletion
    vector re-parents after probing ONLY the winner's added file —
    never a second full find scan."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i % 3) for i in range(30)], "id long, k long"),
        enable_dv=True)
    t2 = AcidTable(spark, tmp_path / "t")
    state = _race(t1, t2, lambda: t2.append(
        _df(spark, [(1000, 2)], "id long, k long")))
    real_scan = t1._tagged_physical_scan
    scans = []

    def counted(m, schema, paths):
        scans.append(len(paths))
        return real_scan(m, schema, paths)

    t1._tagged_physical_scan = counted

    v = t1.delete_where_mor("k = 0")

    assert state["tries"] == 2
    assert v == 2
    # scan #1: the full find pass; scan #2: the rebase probe over just
    # the winner's added file(s) — strictly narrower than the table
    assert len(scans) == 2 and scans[1] < scans[0], scans
    got = {r.id for r in t1.read().collect()}
    assert got == ({i for i in range(30) if i % 3} | {1000})


def test_lost_mor_delete_vs_matching_append_recomputes(spark,
                                                       tmp_path):
    """MOR DELETE loses to an append whose rows MATCH: the staged
    vector misses them, so the delete recomputes against the winner
    and the appended matching row dies too (serial equivalence)."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(i, i % 3) for i in range(30)], "id long, k long"),
        enable_dv=True)
    t2 = AcidTable(spark, tmp_path / "t")
    _race(t1, t2, lambda: t2.append(
        _df(spark, [(1000, 0), (1001, 1)], "id long, k long")))

    t1.delete_where_mor("k = 0")

    got = {r.id for r in t1.read().collect()}
    assert got == ({i for i in range(30) if i % 3} | {1001})


def test_rebase_chain_under_many_losses(spark, tmp_path):
    """Several consecutive lost races: the staged batch is written once
    and re-parented each time until it wins."""
    t1 = AcidTable.create(
        spark, tmp_path / "t",
        _df(spark, [(0, "base")], "id long, s string"))
    t2 = AcidTable(spark, tmp_path / "t")
    real = t1._try_commit
    box = {"losses": 3, "tries": 0}

    def fenced(version, *a, **k):
        box["tries"] += 1
        if box["losses"]:
            box["losses"] -= 1
            t2.append(_df(spark, [(100 + box["losses"], "w")],
                          "id long, s string"))
        return real(version, *a, **k)

    t1._try_commit = fenced
    stages = _count_stages(t1)
    v = t1.append(_df(spark, [(1, "loser")], "id long, s string"))
    assert stages["n"] == 1          # one stage despite three losses
    assert box["tries"] == 4
    assert v == 4
    assert t1.read().count() == 5    # base + 3 winners + loser
