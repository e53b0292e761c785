"""AcidTable.apply_cdf — one fenced file-pruned commit per CDF batch
(insert rows appended, delete keys' files rewritten, rest carried)."""
import pyspark.sql.functions as F
import pytest

from spark_streaming_apps_spark.acid import AcidTable


def _df(spark, rows, ddl="k long, v string"):
    return spark.createDataFrame(rows, ddl)


def _ch(spark, rows, ddl="k long, v string, _change_type string"):
    return spark.createDataFrame(rows, ddl)


def _state(t):
    return {(r.k, r.v) for r in t.read().collect()}


def test_mixed_batch_is_one_commit(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    v = t.apply_cdf(_ch(spark, [(2, "b", "delete"), (9, "z", "insert")]),
                    key=["k"])
    assert v == 1                     # ONE commit for delete + insert
    assert _state(t) == {(1, "a"), (3, "c"), (9, "z")}


def test_update_pair_nets_to_postimage(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, "a"), (2, "b")]))
    t.apply_cdf(_ch(spark, [(1, "a", "delete"), (1, "A", "insert")]),
                key=["k"])
    assert _state(t) == {(1, "A"), (2, "b")}


def test_fence_blocks_replay(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _df(spark, [(1, "a")]))
    batch = _ch(spark, [(1, "a", "delete"), (5, "e", "insert")])
    assert t.apply_cdf(batch, key=["k"], app_id="m", batch_id=0) == 1
    after = _state(t)
    # replay: fenced out, nothing commits
    assert t.apply_cdf(batch, key=["k"], app_id="m", batch_id=0) is None
    assert t.latest_version() == 1 and _state(t) == after
    # next batch advances; pure-insert fast path rides append_txn
    assert t.apply_cdf(_ch(spark, [(6, "f", "insert")]),
                       key=["k"], app_id="m", batch_id=1) == 2
    assert t._manifest(2)["op"] == "append_txn"
    # and its replay is fenced too
    assert t.apply_cdf(_ch(spark, [(6, "f", "insert")]),
                       key=["k"], app_id="m", batch_id=1) is None


def test_untouched_files_carried_by_reference(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _df(spark, [(1, "a")]))
    for i in range(2, 6):
        t.append(_df(spark, [(i, f"v{i}")]))      # 5 files total
    total = len(t._manifest(t.latest_version())["files"])
    t.apply_cdf(_ch(spark, [(3, "v3", "delete")]), key=["k"])
    st = t.last_cow_stats
    assert st["files_rewritten"] == 1
    assert st["files_linked"] == total - 1
    assert _state(t) == {(1, "a"), (2, "v2"), (4, "v4"), (5, "v5")}


def test_partition_pruned_find_pass(spark, tmp_path):
    rows = [(c, i, f"r{c}{i}") for c in range(4) for i in range(3)]
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, rows, "cell int, k long, v string"),
                         partition_by=["cell"])
    total = len(t._manifest(t.latest_version())["files"])
    ch = spark.createDataFrame(
        [(2, 1, "r21", "delete")],
        "cell int, k long, v string, _change_type string")
    t.apply_cdf(ch, key=["cell", "k"])
    # the find pass opened only partition cell=2's files
    assert t.last_cow_stats["files_scanned"] < total
    got = {(r.cell, r.k) for r in t.read().collect()}
    assert (2, 1) not in got and len(got) == 11


def test_requires_change_type_column(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="_change_type"):
        t.apply_cdf(_df(spark, [(2, "b")]), key=["k"])
    with pytest.raises(ValueError, match="batch_id"):
        t.apply_cdf(_ch(spark, [(2, "b", "insert")]), key=["k"],
                    app_id="m")


def test_cdf_table_records_the_batch_as_changes(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(1, "a"), (2, "b")]),
                         enable_cdf=True)
    t.apply_cdf(_ch(spark, [(2, "b", "delete"), (7, "g", "insert")]),
                key=["k"])
    ch = t.read_changes(0, 1)     # exclusive-start: v1's deltas
    got = {(r.k, r.v, r._change_type) for r in ch.collect()}
    assert got == {(2, "b", "delete"), (7, "g", "insert")}


def test_delete_find_pass_is_bloom_pruned(spark, tmp_path):
    """With a bloom-indexed key, apply_cdf's find pass opens only the
    files whose sidecars may hold a deleted key — a retire pass is
    candidate-file-bounded, never a table scan."""
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, [(0, "a")]), bloom_by=["k"])
    for i in range(1, 8):
        t.append(_df(spark, [(i * 10 + j, f"v{i}")
                             for j in range(3)]))
    total = len(t._manifest(t.latest_version())["files"])
    t.apply_cdf(_ch(spark, [(31, "v3", "delete")]), key=["k"])
    st = t.last_cow_stats
    assert st["files_scanned"] < total, st
    assert st["files_rewritten"] == 1
    got = {r.k for r in t.read().collect()}
    assert 31 not in got and {30, 32} <= got


def test_fence_holds_on_empty_files_fallback(spark, tmp_path):
    """A fenced apply_cdf that lands through the full-rewrite fallback
    (no per-file bookkeeping to prune — e.g. a table born from an
    empty DataFrame) must still record the writer fence: the replayed
    batch commits nothing."""
    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([], "k long, v string"))
    batch = _ch(spark, [(1, "a", "insert"), (2, "b", "delete")])
    v1 = t.apply_cdf(batch, key=["k"], app_id="m", batch_id=0)
    assert v1 is not None
    after = _state(t)
    assert t.apply_cdf(batch, key=["k"], app_id="m", batch_id=0) is None
    assert _state(t) == after and t.latest_version() == v1


def test_autocompact_no_progress_loop_on_partitioned(spark, tmp_path):
    """One small file per partition must NOT re-trigger auto-compaction
    forever: lone small files are not candidates (the rewrite would
    land the same one-file-per-partition layout)."""
    rows = [(c, c * 10, "x") for c in range(6)]
    t = AcidTable.create(spark, tmp_path / "t",
                         _df(spark, rows, "cell int, k long, v string"),
                         partition_by=["cell"])
    t.set_autocompact(max_bytes=1 << 20, min_files=2)
    # every partition holds exactly one (small) file -> no-op
    v = t.latest_version()
    assert t.maybe_autocompact() is None
    assert t.latest_version() == v
    # add a second small file to two partitions -> those compact once,
    # then the hook goes quiet again
    t.append(_df(spark, [(0, 100, "y"), (1, 110, "y")],
                 "cell int, k long, v string"))
    assert t.maybe_autocompact() is not None
    v2 = t.latest_version()
    assert t.maybe_autocompact() is None
    assert t.latest_version() == v2


def test_commit_multi_rejects_four_tuple_apply_cdf(spark, tmp_path):
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog

    cat = AcidCatalog(spark, tmp_path / "c")
    cat.create_table("t", _df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="apply_cdf spec"):
        cat.commit_multi({"t": ("apply_cdf",
                                _ch(spark, [(2, "b", "insert")]),
                                ["k"], "app")})
