"""AcidTable: atomic manifest-swap commits, MERGE semantics, concurrent
writers, time travel, vacuum.  The concurrency test is the contract the
reference's JDBC transaction makes (FileWorkerApp.scala:207-227): two
independent writers MERGE-ing the same table never lose or double an
update."""
from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from spark_streaming_apps_spark.acid import AcidTable, CommitConflict


def _mk(spark, tmp_path, rows=None):
    rows = rows if rows is not None else [(i, 0, "init") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, status int, tag string")
    return AcidTable.create(spark, tmp_path / "t", df)


def test_create_read_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.latest_version() == 0
    got = t.read().orderBy("id").collect()
    assert len(got) == 20 and got[0].tag == "init"
    # second create on the same path must refuse, not clobber
    with pytest.raises(FileExistsError):
        _mk(spark, tmp_path)


def test_merge_semantics(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ups = spark.createDataFrame(
        [(3, 1, "claimed"), (99, 5, "new")], "id long, status int, tag string")
    v = t.merge(ups, key=["id"])
    assert v == 1
    rows = {r.id: r for r in t.read().collect()}
    assert len(rows) == 21                       # 20 kept/updated + 1 insert
    assert rows[3].status == 1 and rows[3].tag == "claimed"   # matched
    assert rows[99].status == 5                               # inserted
    assert rows[4].status == 0 and rows[4].tag == "init"      # untouched


def test_merge_null_update_keeps_current(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ups = spark.createDataFrame([(5, 7, None)], "id long, status int, tag string")
    t.merge(ups, key=["id"])
    r = {x.id: x for x in t.read().collect()}[5]
    assert r.status == 7 and r.tag == "init"     # null never overwrites


def test_concurrent_writers_lose_nothing(spark, tmp_path):
    """Two real threads race disjoint MERGE batches through the optimistic
    commit loop.  Exactly one wins each version; the loser re-merges onto
    the winner's snapshot — the final state must contain EVERY update
    exactly once, whatever the interleaving."""
    t = _mk(spark, tmp_path, rows=[(i, 0, "init") for i in range(40)])
    errs: list[Exception] = []

    def writer(ids, tag):
        try:
            ups = spark.createDataFrame(
                [(i, 1, tag) for i in ids], "id long, status int, tag string")
            t.merge(ups, key=["id"])
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    a = threading.Thread(target=writer, args=(range(0, 20), "wa"))
    b = threading.Thread(target=writer, args=(range(20, 40), "wb"))
    a.start(); b.start(); a.join(); b.join()
    assert not errs
    assert t.latest_version() == 2               # both committed, serially
    rows = {r.id: r for r in t.read().collect()}
    assert len(rows) == 40
    assert all(rows[i].tag == "wa" and rows[i].status == 1 for i in range(20))
    assert all(rows[i].tag == "wb" and rows[i].status == 1 for i in range(20, 40))


def test_conflict_is_detected_not_clobbered(spark, tmp_path):
    """Simulate a writer that lost the race: a manifest for the next
    version appears between its snapshot and its commit.  The stale commit
    must fail atomically (manifest untouched) and the retry must build on
    the interloper's state."""
    t = _mk(spark, tmp_path)
    # interloper commits v1 out from under the writer
    other = AcidTable(spark, t.path)
    other.merge(spark.createDataFrame([(0, 9, "other")],
                                      "id long, status int, tag string"),
                key=["id"])
    assert t._try_commit(1, "data/bogus", {"type": "struct", "fields": []}, "merge") is False
    assert json.loads((t._manifests / "v1.json").read_text())["data"] != "data/bogus"
    # normal merge now lands at v2 on top of the interloper's row
    t.merge(spark.createDataFrame([(1, 2, "mine")],
                                  "id long, status int, tag string"), key=["id"])
    rows = {r.id: r for r in t.read().collect()}
    assert rows[0].tag == "other" and rows[1].tag == "mine"


def test_merge_keep_latest_cdc(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10, "u1", 1.0), (2, 11, "u1", 2.0)],
        "event_id long, user_id long, event_type string, value double")
    t = AcidTable.create(spark, tmp_path / "cdc", df)
    # older event must NOT overwrite, newer must; replay is idempotent
    batch = spark.createDataFrame(
        [(0, 10, "u1", 9.0), (5, 11, "u1", 5.0)],
        "event_id long, user_id long, event_type string, value double")
    t.merge_keep_latest(batch, key=["user_id", "event_type"],
                        version_col="event_id")
    t.merge_keep_latest(batch, key=["user_id", "event_type"],
                        version_col="event_id")       # replay
    rows = {(r.user_id): r for r in t.read().collect()}
    assert rows[10].event_id == 1 and rows[10].value == 1.0
    assert rows[11].event_id == 5 and rows[11].value == 5.0


def test_time_travel_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for s in (1, 2, 3):
        t.merge(spark.createDataFrame([(0, s, f"v{s}")],
                                      "id long, status int, tag string"),
                key=["id"])
    assert t.read(0).filter(F.col("id") == 0).first().status == 0
    assert t.read(2).filter(F.col("id") == 0).first().status == 2
    assert t.read().filter(F.col("id") == 0).first().status == 3
    removed = t.vacuum(keep_last=2)
    assert len(removed) == 2                     # v0+v1 data gone, v2+v3 kept
    assert t.read(2).count() == 20 and t.read(3).count() == 20


def test_commit_conflict_gives_up(spark, tmp_path):
    t = _mk(spark, tmp_path)
    orig = t._try_commit
    t._try_commit = lambda *a, **k: False
    with pytest.raises(CommitConflict):
        t.merge(spark.createDataFrame([(0, 1, "x")],
                                      "id long, status int, tag string"),
                key=["id"], max_retries=3)
    t._try_commit = orig


def test_concurrent_merge_add_sums_exactly_once(spark, tmp_path):
    """IVM contract under racing maintainers: two threads merge_add
    overlapping delta partials; optimistic retry must apply each delta
    exactly once, so per-key totals equal the arithmetic sum whatever
    the commit interleaving."""
    df = spark.createDataFrame([(i, 0) for i in range(10)], "id long, n long")
    t = AcidTable.create(spark, tmp_path / "ivm", df)
    errs: list[Exception] = []

    def maintainer(add):
        try:
            ups = spark.createDataFrame(
                [(i, add) for i in range(10)], "id long, n long")
            t.merge_add(ups, key=["id"])
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    ts = [threading.Thread(target=maintainer, args=(a,)) for a in (1, 10, 100)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs
    assert t.latest_version() == 3
    rows = {r.id: r.n for r in t.read().collect()}
    assert rows == {i: 111 for i in range(10)}


def test_merge_add_inserts_unseen_keys(spark, tmp_path):
    df = spark.createDataFrame([(0, 5)], "id long, n long")
    t = AcidTable.create(spark, tmp_path / "ivm2", df)
    t.merge_add(spark.createDataFrame([(0, 2), (7, 3)], "id long, n long"),
                key=["id"])
    rows = {r.id: r.n for r in t.read().collect()}
    assert rows == {0: 7, 7: 3}


def test_compact_preserves_rows_and_history(spark, tmp_path):
    """OPTIMIZE is physical only: fewer files, identical rows, and the
    pre-compaction version stays readable (time travel)."""
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, g long").repartition(8)
    t = AcidTable.create(spark, tmp_path / "opt", df)
    before = sorted((r.id, r.g) for r in t.read().collect())
    v = t.compact(target_files=1)
    data_rel = t._manifest(v)["data"]
    files = [p for p in (t.path / data_rel).glob("*.parquet")]
    assert len(files) == 1
    assert sorted((r.id, r.g) for r in t.read().collect()) == before
    assert sorted((r.id, r.g) for r in t.read(0).collect()) == before


def test_reader_snapshot_isolated_from_commits(spark, tmp_path):
    """Snapshot isolation: a DataFrame resolved at version v keeps
    reading v's files even after later commits land — a reader never
    observes a half-applied merge or a version mix."""
    t = _mk(spark, tmp_path)
    v0, snap = t.snapshot()
    t.merge(spark.createDataFrame([(0, 9, "late")],
                                  "id long, status int, tag string"),
            key=["id"])
    assert t.latest_version() == v0 + 1
    # the old handle still serves version v0 in full
    rows = {r.id: r.tag for r in snap.collect()}
    assert rows[0] == "init" and len(rows) == 20


def test_eight_way_merge_add_contention(spark, tmp_path):
    """Higher-contention IVM race: 8 maintainers, each one +1 per key —
    the retry loop must serialize all of them without loss (final n = 8
    everywhere, version = 8)."""
    df = spark.createDataFrame([(i, 0) for i in range(5)], "id long, n long")
    t = AcidTable.create(spark, tmp_path / "c8", df)
    errs: list[Exception] = []

    def one():
        try:
            t.merge_add(spark.createDataFrame(
                [(i, 1) for i in range(5)], "id long, n long"),
                key=["id"], max_retries=60)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=one) for _ in range(8)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs
    assert t.latest_version() == 8
    assert {r.n for r in t.read().collect()} == {8}


def test_manifest_stats_skip_files_exactly(spark, tmp_path):
    """Range-sorted layout -> disjoint per-file extents in the manifest;
    a band read must (a) open strictly fewer files than the table holds,
    (b) return exactly the rows the full-scan filter returns."""
    df = (spark.range(0, 8000)
          .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
          .repartitionByRange(8, "k").sortWithinPartitions("k"))
    t = AcidTable.create(spark, tmp_path / "skip", df)
    paths, total = t.pruned_files("k", 1000, 1999)
    assert total == 8
    assert 0 < len(paths) < total, (len(paths), total)
    got = sorted(r.k for r in t.read_range("k", 1000, 1999).collect())
    want = sorted(r.k for r in
                  t.read().filter(F.col("k").between(1000, 1999)).collect())
    assert got == want and len(got) == 1000
    # empty band: no file opened, empty result with the table schema
    none_paths, _ = t.pruned_files("k", 90000, 99000)
    assert none_paths == []
    assert t.read_range("k", 90000, 99000).count() == 0


def test_relayout_makes_stats_selective(spark, tmp_path):
    """A hash-scattered table skips nothing (every file spans the key
    range); after relayout(["k"]) the same band prunes to a strict
    subset, with identical rows at both versions."""
    df = (spark.range(0, 8000)
          .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
          .repartition(8, "v"))  # scatter: every file spans all of k
    t = AcidTable.create(spark, tmp_path / "relayout", df)
    before, total0 = t.pruned_files("k", 1000, 1999)
    assert len(before) == total0  # no skipping possible
    v = t.relayout(["k"], target_files=8)
    after, total1 = t.pruned_files("k", 1000, 1999)
    assert 0 < len(after) < total1
    assert t.read(v).count() == 8000
    assert (sorted(r.k for r in t.read_range("k", 1000, 1999).collect())
            == list(range(1000, 2000)))


def test_append_evolve_widens_schema_with_time_travel(spark, tmp_path):
    """New column widens the latest schema (old rows NULL); version 0
    still reads its own narrower schema."""
    t = AcidTable.create(
        spark, tmp_path / "evolve",
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.append_evolve(spark.createDataFrame(
        [(3, "c", 9.5)], "k int, v string, score double"))
    latest = t.read()
    assert set(latest.columns) == {"k", "v", "score"}
    rows = {r.k: r.score for r in latest.collect()}
    assert rows == {1: None, 2: None, 3: 9.5}
    assert set(t.read(0).columns) == {"k", "v"}
    # reverse direction: an update missing a column null-fills it
    t.append_evolve(spark.createDataFrame([(4,)], "k int"))
    r4 = t.read().filter(F.col("k") == 4).first()
    assert r4.v is None and r4.score is None


def test_merge_add_random_delta_sequences(spark, tmp_path):
    """Property fuzz over the IVM contract: ANY sequence of pre-aggregated
    delta batches (negative deltas, unseen keys, repeated keys across
    batches) must leave the table equal to the per-key sum of everything
    ever merged — no delta lost, none applied twice, inserts and updates
    interchangeable."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ids = itertools.count()
    batch = st.dictionaries(st.integers(0, 5), st.integers(-100, 100),
                            min_size=1, max_size=4)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(batch, min_size=1, max_size=4))
    def run(batches):
        t = AcidTable.create(
            spark, tmp_path / f"fuzz{next(ids)}",
            spark.createDataFrame([(0, 0)], "k int, s long"))
        expected = {0: 0}
        for b in batches:
            t.merge_add(spark.createDataFrame(
                [(k, v) for k, v in b.items()], "k int, s long"), ["k"])
            for k, v in b.items():
                expected[k] = expected.get(k, 0) + v
        got = {r.k: r.s for r in t.read().collect()}
        assert got == expected, (got, expected)

    run()


def test_append_txn_replayed_batch_applies_once(spark, tmp_path):
    """The at-least-once -> exactly-once repair at the TABLE: a replayed
    (app_id, batch_id) append is a no-op even across a different table
    handle (restart), while the next batch id still lands."""
    t = AcidTable.create(
        spark, tmp_path / "txn",
        spark.createDataFrame([(1, "a")], "k int, v string"))
    b0 = spark.createDataFrame([(2, "b")], "k int, v string")
    assert t.append_txn(b0, "app", 0) == 1
    assert t.append_txn(b0, "app", 0) is None            # same handle replay
    t2 = AcidTable(spark, tmp_path / "txn")              # "restarted" writer
    assert t2.append_txn(b0, "app", 0) is None           # replay after restart
    assert t2.append_txn(
        spark.createDataFrame([(3, "c")], "k int, v string"), "app", 1) == 2
    assert t2.read().count() == 3                        # no double row 2
    hist = {r.version: r.op for r in t2.history().collect()}
    assert hist == {0: "create", 1: "append_txn", 2: "append_txn"}


def test_concurrent_append_txn_same_batch_applies_once(spark, tmp_path):
    """Two racing writers deliver the SAME (app_id, batch_id) — the
    at-least-once duplicate delivery in its worst interleaving. Exactly
    one commit may land: the loser either loses the version race and
    finds the winner's txn marker on retry, or sees it up front."""
    t = AcidTable.create(
        spark, tmp_path / "txnrace",
        spark.createDataFrame([(0, "seed")], "k int, v string"))
    rows = spark.createDataFrame([(1, "dup")], "k int, v string")
    results, errs = [], []

    def writer():
        try:
            results.append(t.append_txn(rows, "app", 7))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    applied = [r for r in results if r is not None]
    assert len(applied) == 1, results
    assert t.read().filter(F.col("k") == 1).count() == 1


def test_append_txn_replay_check_reads_one_manifest(spark, tmp_path):
    """The replay check is O(1): every manifest carries the cumulative
    {app_id: latest batch_id} map, so append_txn consults ONLY the newest
    manifest — including across non-txn commits in between."""
    t = AcidTable.create(
        spark, tmp_path / "txnmap",
        spark.createDataFrame([(1, "a")], "k int, v string"))
    t.append_txn(spark.createDataFrame([(2, "b")], "k int, v string"),
                 "app", 0)
    t.append(spark.createDataFrame([(3, "c")], "k int, v string"))
    t.compact()
    # the map survived two non-txn commits
    newest = json.loads(
        (tmp_path / "txnmap" / "manifests"
         / f"v{t.latest_version()}.json").read_text())
    assert newest["txns"] == {"app": 0}
    assert t.append_txn(
        spark.createDataFrame([(2, "b")], "k int, v string"),
        "app", 0) is None                                 # replay skipped
    # earlier batch id than the latest committed is also a replay
    t.append_txn(spark.createDataFrame([(4, "d")], "k int, v string"),
                 "app", 5)
    assert t.append_txn(
        spark.createDataFrame([(9, "x")], "k int, v string"),
        "app", 3) is None
    # a different app is independent
    assert t.append_txn(
        spark.createDataFrame([(5, "e")], "k int, v string"),
        "other", 0) is not None


def test_append_evolve_type_conflict_raises(spark, tmp_path):
    """A shared column changing type is an evolve CONFLICT, not a silent
    widen or an opaque union error."""
    t = _mk(spark, tmp_path)
    bad = spark.createDataFrame([(99, "1", "late")],
                                "id long, status string, tag string")
    with pytest.raises(TypeError, match="status: table=int vs rows=string"):
        t.append_evolve(bad)
    assert t.latest_version() == 0                        # nothing committed
    # same types still evolve fine
    ok = spark.createDataFrame([(99, 1, "late", 3.5)],
                               "id long, status int, tag string, w double")
    t.append_evolve(ok)
    assert dict(t.read().dtypes)["w"] == "double"


def _apply_changes(base, ch):
    cols = [c for c in ch.columns
            if c not in ("_change_type", "_commit_version")]
    ins = ch.filter(F.col("_change_type") == "insert").select(cols)
    dels = ch.filter(F.col("_change_type") == "delete").select(cols)
    return base.select(cols).unionByName(ins).exceptAll(dels)


def _multiset(df):
    from collections import Counter
    return Counter(tuple(r) for r in df.collect())


def test_read_changes_reconstructs_every_version(spark, tmp_path):
    """CDF contract: for every committed pair (i, j), read(i) ⊎ inserts ∖
    deletes == read(j) as a multiset — across append, merge, merge_add
    and a no-op compact."""
    t = _mk(spark, tmp_path)                                          # v0
    t.append(spark.createDataFrame([(100, 0, "new"), (101, 1, "new")],
                                   "id long, status int, tag string"))  # v1
    t.merge(spark.createDataFrame([(0, 3, "done"), (100, 3, "done")],
                                  "id long, status int, tag string"),
            key=["id"])                                               # v2
    t.compact()                                                       # v3
    latest = t.latest_version()
    for i in range(latest + 1):
        for j in range(i, latest + 1):
            got = _multiset(_apply_changes(t.read(i), t.read_changes(i, j)))
            want = _multiset(t.read(j))
            assert got == want, (i, j)
    # the compact step is change-free
    assert t.read_changes(2, 3).count() == 0
    # an update surfaces as its delete+insert pair at the same version
    v2 = {(r._change_type, r.id, r.status, r.tag)
          for r in t.read_changes(1, 2).collect()}
    assert ("delete", 0, 0, "init") in v2
    assert ("insert", 0, 3, "done") in v2


def test_read_changes_across_schema_evolution(spark, tmp_path):
    """A range spanning append_evolve widens the feed's schema; pre-widen
    rows read NULL in the new column and the contract still holds."""
    t = _mk(spark, tmp_path)                                          # v0
    t.append_evolve(spark.createDataFrame(
        [(200, 0, "w", 1.5)],
        "id long, status int, tag string, score double"))             # v1
    ch = t.read_changes(0, 1)
    assert "score" in ch.columns
    got = _multiset(_apply_changes(t.read(0).withColumn(
        "score", F.lit(None).cast("double")), ch))
    assert got == _multiset(t.read(1))


def test_read_changes_bounds_and_empty_range(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.read_changes(0, 0).count() == 0
    cols = t.read_changes(0, 0).columns
    assert cols[-2:] == ["_change_type", "_commit_version"]
    with pytest.raises(ValueError, match="outside committed range"):
        t.read_changes(0, 5)


def test_change_feed_from_foreach_batch(spark, tmp_path):
    """The CDF driven the way a production consumer meets it: a file
    stream lands micro-batches on the table through foreachBatch +
    append_txn (exactly-once), then read_changes over the streamed
    versions yields exactly the streamed rows as inserts."""
    src = tmp_path / "src"
    src.mkdir()
    for b in range(3):
        spark.createDataFrame([(100 * b + i, b, "s") for i in range(4)],
                              "id long, status int, tag string") \
            .coalesce(1).write.parquet(str(src / f"b{b}"), mode="overwrite")
    t = _mk(spark, tmp_path, rows=[(i, 9, "seed") for i in range(3)])
    v0 = t.latest_version()

    stream = (spark.readStream
              .schema("id long, status int, tag string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src / "b*")))
    q = (stream.writeStream
         .foreachBatch(lambda df, bid: t.append_txn(df, "cdf-stream", bid))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    ch = t.read_changes(v0, t.latest_version())
    assert {r._change_type for r in ch.collect()} == {"insert"}
    assert ch.count() == 12                      # 3 batches x 4 rows, once
    got = _multiset(_apply_changes(t.read(v0), ch))
    assert got == _multiset(t.read())


def test_read_changes_random_commit_sequences(spark, tmp_path):
    """Property fuzz over the CDF contract: after ANY sequence of
    append / merge / merge_keep_latest / compact commits, applying
    read_changes(i, j) deltas to version i reconstructs version j
    exactly, for every adjacent pair plus the full range."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    ids = itertools.count()
    op = st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.tuples(st.integers(50, 99), st.integers(0, 3)),
                           min_size=1, max_size=3)),
        st.tuples(st.just("merge"),
                  st.lists(st.tuples(st.integers(0, 9), st.integers(0, 3)),
                           min_size=1, max_size=3, unique_by=lambda t: t[0])),
        st.tuples(st.just("compact"), st.just(None)),
    )

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(op, min_size=1, max_size=4))
    def run(ops):
        t = AcidTable.create(
            spark, tmp_path / f"cdffuzz{next(ids)}",
            spark.createDataFrame([(i, 0, "init") for i in range(10)],
                                  "id long, status int, tag string"))
        for kind, arg in ops:
            if kind == "append":
                t.append(spark.createDataFrame(
                    [(k, v, "new") for k, v in arg],
                    "id long, status int, tag string"))
            elif kind == "merge":
                t.merge(spark.createDataFrame(
                    [(k, v, "upd") for k, v in arg],
                    "id long, status int, tag string"), key=["id"])
            else:
                t.compact(2)
        latest = t.latest_version()
        pairs = [(i, i + 1) for i in range(latest)] + [(0, latest)]
        for i, j in pairs:
            got = _multiset(_apply_changes(t.read(i), t.read_changes(i, j)))
            assert got == _multiset(t.read(j)), (ops, i, j)

    run()


def test_append_txn_harvests_legacy_txn_markers(spark, tmp_path):
    """A table whose manifests predate the cumulative txns map must have
    its legacy per-manifest txn markers HARVESTED into the first
    new-style manifest — otherwise a replay arriving after any new
    commit would apply twice."""
    t = AcidTable.create(
        spark, tmp_path / "legacy",
        spark.createDataFrame([(1, "a")], "k int, v string"))
    t.append_txn(spark.createDataFrame([(2, "b")], "k int, v string"),
                 "appA", 7)
    # simulate legacy manifests: strip the txns map from every manifest
    for mp in sorted((tmp_path / "legacy" / "manifests").glob("v*.json")):
        m = json.loads(mp.read_text())
        m.pop("txns", None)
        mp.write_text(json.dumps(m))
    # a NEW (non-txn) commit must carry the harvested map forward
    t.append(spark.createDataFrame([(3, "c")], "k int, v string"))
    newest = json.loads(
        (tmp_path / "legacy" / "manifests"
         / f"v{t.latest_version()}.json").read_text())
    assert newest["txns"] == {"appA": 7}
    # and the legacy batch now replays as a no-op
    assert t.append_txn(
        spark.createDataFrame([(2, "b")], "k int, v string"),
        "appA", 7) is None
    assert t.read().filter("k = 2").count() == 1


def test_vacuum_inside_cdf_range_fails_loudly(spark, tmp_path):
    """Retention guard under PER-FILE reference retention: on an
    append-only history every file is still referenced by the latest
    manifest, so vacuum correctly drops NOTHING and every old version
    stays readable (Delta semantics). Files only orphan when a COW
    rewrite replaces them — after that, vacuum drops the replaced
    images and read_changes/read over the vacuumed range must raise
    VersionVacuumedError, never return partial deltas."""
    import pytest

    from spark_streaming_apps_spark.acid import VersionVacuumedError

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    for i in range(2, 5):
        t.append(spark.createDataFrame([(i, 0)],
                                       "file_id long, status int"))   # v1-v3
    # append-only: nothing is orphaned, ALL history keeps serving
    assert t.vacuum(keep_last=2) == []
    assert t.read(0).count() == 1
    assert t.read_changes(0, 3).count() == 3
    assert t.read_changes(1, 2).count() == 1
    # COW rewrite replaces every touched file → old images orphan
    t.update_where({"status": "9"}, "file_id >= 1")            # v4
    removed = t.vacuum(keep_last=1)                 # keeps v4 only
    assert removed                                  # something was dropped
    with pytest.raises(VersionVacuumedError, match=r"vacuumed"):
        t.read_changes(0, 3)
    with pytest.raises(VersionVacuumedError):
        t.read_changes(1, 2)                        # diff base v1 is gone
    with pytest.raises(VersionVacuumedError):
        t.read(0)                                   # snapshot read, too
    # the retained latest still serves
    assert t.read().count() == 4
    assert t.read().filter("status = 9").count() == 4


def test_cdf_stream_resumes_across_vacuum_of_drained_versions(
        spark, tmp_path):
    """A CDF stream that already drained versions 0..N keeps resuming
    after those versions' SNAPSHOTS are vacuumed — recorded change
    files are retained independently (backfill_changes records them
    for this non-CDF table) — while a fresh stream whose change files
    were pruned fails loudly instead of emitting empty deltas."""
    import pytest

    from pyspark.errors.exceptions.captured import StreamingQueryException
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfStreamDataSource)

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(2, 0)], "file_id long, status int"))
    t.append(spark.createDataFrame([(3, 0)], "file_id long, status int"))
    t.backfill_changes()
    spark.dataSource.register(AcidCdfStreamDataSource)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("acidtable-cdf")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.outputMode("append")
             .foreachBatch(lambda b, i: b.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()                                        # drained v1, v2
    assert spark.read.parquet(out).count() == 2
    t.vacuum(keep_last=2)                          # v0, v1 data dropped
    t.append(spark.createDataFrame([(4, 0)], "file_id long, status int"))
    t.backfill_changes()                           # records v3's delta
    drain()                                        # resume: v3's files
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    assert {r._commit_version for r in rows} == {1, 2, 3}

    # prune the recorded change files beyond the newest version: a
    # FRESH stream from version 0 now crosses the retention horizon
    t.vacuum(keep_last=2, keep_changes_last=1)
    q = (spark.readStream.format("acidtable-cdf")
         .option("path", str(tmp_path / "t")).load()
         .writeStream.outputMode("append").format("memory")
         .queryName("cdf_vac_fresh").trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException,
                       match="backfill_changes|vacuumed"):
        q.awaitTermination(120)


def test_cdf_recorded_changes_equal_snapshot_diff(spark, tmp_path):
    """A CDF-enabled table's recorded change files must reproduce
    EXACTLY what the snapshot-diff path derives on an identical twin —
    across append, merge (update pairs), layout-only relayout (empty
    delta), and schema evolution."""
    def scenario(t):
        t.append(spark.createDataFrame([(100, 1)], "id long, s int"))
        t.merge(spark.createDataFrame([(3, 9)], "id long, s int"),
                key=["id"])
        t.relayout(["id"], target_files=2)
        t.append_evolve(spark.createDataFrame(
            [(200, 0, "x")], "id long, s int, tag string"))

    base = spark.createDataFrame([(i, 0) for i in range(10)],
                                 "id long, s int")
    rec = AcidTable.create(spark, tmp_path / "rec", base, enable_cdf=True)
    diff = AcidTable.create(spark, tmp_path / "diff", base)
    scenario(rec)
    scenario(diff)
    assert rec.cdf_enabled() and not diff.cdf_enabled()
    # commits record deltas either as change files ("changes") or by
    # reference to their added data files ("changes_ref" — append/
    # layout commits, Delta's derive-CDF-from-added-files shape)
    assert all("changes" in rec._manifest(v)
               or "changes_ref" in rec._manifest(v)
               for v in range(1, 5))
    assert all("changes" not in diff._manifest(v)
               and "changes_ref" not in diff._manifest(v)
               for v in range(1, 5))

    def rows(t):
        return sorted((r.id, r.s, r.tag, r._change_type, r._commit_version)
                      for r in t.read_changes(0, 4).collect())

    got, want = rows(rec), rows(diff)
    assert got == want
    assert (3, 0, None, "delete", 2) in got       # merge = delete+insert
    assert (3, 9, None, "insert", 2) in got
    assert not [r for r in got if r[4] == 3]      # relayout: empty delta


def test_cdf_feed_survives_snapshot_vacuum(spark, tmp_path):
    """The point of commit-time change files: vacuum every snapshot but
    the newest and the FULL-history feed still serves from the recorded
    changes. Under per-file retention an append-only history even
    survives change-log pruning (snapshot-diff fallback still has its
    files); the feed only fails loudly once a COW rewrite orphans the
    old snapshots AND the change log is pruned."""
    import pytest

    from spark_streaming_apps_spark.acid import VersionVacuumedError

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0)], "id long, s int"), enable_cdf=True)
    for i in range(2, 6):
        t.append(spark.createDataFrame([(i, 0)], "id long, s int"))  # v1-v4
    before = sorted((r.id, r._change_type, r._commit_version)
                    for r in t.read_changes(0, 4).collect())
    t.vacuum(keep_last=1)
    assert sorted((r.id, r._change_type, r._commit_version)
                  for r in t.read_changes(0, 4).collect()) == before
    # prune the change log: only the 2 newest versions keep theirs.
    # Append-only history → every old snapshot file is still referenced
    # by the latest manifest, so the pruned range KEEPS serving via
    # snapshot diffs (strictly better than failing)
    t.vacuum(keep_last=1, keep_changes_last=2)
    assert t.read_changes(2, 4).count() == 2      # retained tail (v3, v4)
    assert sorted((r.id, r._change_type, r._commit_version)
                  for r in t.read_changes(0, 4).collect()) == before
    # COW rewrite orphans the old images; with change files pruned AND
    # snapshots vacuumed, the pruned range must refuse loudly
    t.update_where({"s": "1"}, "id >= 1")                        # v5
    t.vacuum(keep_last=1, keep_changes_last=1)
    with pytest.raises(VersionVacuumedError):
        t.read_changes(0, 4)                      # pruned range is loud


def test_check_constraints_enforced_on_commits(spark, tmp_path):
    """Delta CHECK semantics: adding a constraint validates existing
    rows; every later commit (merge, append, append_txn, SQL DML) is
    refused before any manifest is written if its result violates; NULL
    violates; drop lifts enforcement."""
    import pytest

    from spark_streaming_apps_spark.acid import ConstraintViolation
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0), (2, 3)], "id long, s int"))
    acid_sql(spark,
             "ALTER TABLE tbl ADD CONSTRAINT s_band CHECK (s BETWEEN 0 AND 4)",
             tables={"tbl": t})
    assert t.constraints() == {"s_band": "s BETWEEN 0 AND 4"}
    v_ok = t.append(spark.createDataFrame([(3, 4)], "id long, s int"))
    with pytest.raises(ConstraintViolation, match="s_band"):
        t.append(spark.createDataFrame([(4, 9)], "id long, s int"))
    with pytest.raises(ConstraintViolation):
        t.merge(spark.createDataFrame([(1, -1)], "id long, s int"),
                key=["id"])
    with pytest.raises(ConstraintViolation):    # NULL violates
        t.append(spark.createDataFrame([(5, None)], "id long, s int"))
    with pytest.raises(ConstraintViolation):
        acid_sql(spark, "UPDATE tbl SET s = 99 WHERE id = 1",
                 tables={"tbl": t})
    assert t.latest_version() == v_ok           # nothing committed
    assert t.read().count() == 3
    # existing violations block ADD
    with pytest.raises(ConstraintViolation):
        t.add_constraint("impossible", "s > 100")
    acid_sql(spark, "ALTER TABLE tbl DROP CONSTRAINT s_band",
             tables={"tbl": t})
    t.append(spark.createDataFrame([(4, 9)], "id long, s int"))  # now fine
    assert t.read().count() == 4


def test_restore_to_version(spark, tmp_path):
    """RESTORE is a forward commit sharing the target's data: history
    survives, constraints stay in force, and on CDF tables the rollback
    emits ordinary deltas so incremental consumers track it."""
    import pytest

    from spark_streaming_apps_spark.acid import VersionVacuumedError
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 0), (2, 0)], "id long, s int"),
        enable_cdf=True)
    t.merge(spark.createDataFrame([(1, 5)], "id long, s int"),
            key=["id"])                                      # v1
    t.append(spark.createDataFrame([(3, 0)], "id long, s int"))  # v2
    v = acid_sql(spark, "RESTORE TABLE tbl TO VERSION AS OF 0",
                 tables={"tbl": t})
    assert v == 3
    assert {(r.id, r.s) for r in t.read().collect()} == {(1, 0), (2, 0)}
    assert t.read(2).count() == 3                  # history intact
    # CDF sees the rollback as deltas: v3 deletes (1,5) and (3,0),
    # inserts (1,0)
    ch = {(r.id, r.s, r._change_type)
          for r in t.read_changes(2, 3).collect()}
    assert ch == {(1, 5, "delete"), (3, 0, "delete"), (1, 0, "insert")}
    with pytest.raises(ValueError):
        acid_sql(spark, "RESTORE TABLE ghost TO VERSION AS OF 0",
                 tables={"tbl": t})
    t.vacuum(keep_last=1)
    with pytest.raises(VersionVacuumedError):
        t.restore(1)


def test_rename_and_drop_column(spark, tmp_path):
    """RENAME/DROP COLUMN as PURE-METADATA commits via column mapping
    (Delta columnMapping 'name' mode): the physical parquet column name
    is frozen at birth, so no data file is touched; new snapshot has
    the new shape, older versions keep theirs; partition/constraint-
    referenced columns are refused."""
    import pytest

    from spark_streaming_apps_spark.acid import _entry_name
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")],
                              "id long, val long, tag string"))
    names_before = {_entry_name(f) for f in t._manifest(0)["files"]}
    v = acid_sql(spark, "ALTER TABLE tbl RENAME COLUMN val TO score",
                 {"tbl": t})
    assert t._manifest(v)["op"] == "rename_column"
    # PURE METADATA: every data file carried by reference, none written
    assert {_entry_name(f) for f in t._manifest(v)["files"]} \
        == names_before
    assert t._props(v)["column_mapping"] == {"score": "val"}
    assert t.read().columns == ["id", "score", "tag"]
    assert t.read(v - 1).columns == ["id", "val", "tag"]  # time travel
    assert {(r.id, r.score) for r in t.read().collect()} == \
        {(1, 10), (2, 20)}
    # writes through the mapping: appended rows land under the FROZEN
    # physical name and read back logically
    t.append(spark.createDataFrame([(3, 30, "c")],
                                   "id long, score long, tag string"))
    assert {(r.id, r.score) for r in t.read().collect()} == \
        {(1, 10), (2, 20), (3, 30)}
    # predicates and DML bind to the logical name
    t.delete_where("score = 30")
    assert t.read().count() == 2
    v = acid_sql(spark, "ALTER TABLE tbl DROP COLUMN tag", {"tbl": t})
    assert t.read().columns == ["id", "score"]
    assert t.read(v - 1).columns == ["id", "score", "tag"]
    # re-adding a dropped column must read NULL, never resurrect bytes
    t.add_column("tag", "string")
    assert [r.tag for r in t.read().collect()] == [None, None]
    assert t._props()["column_mapping"]["tag"].startswith("col_")
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("ghost")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "SCORE")
    # guarded columns refuse
    t.add_constraint("pos", "score >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("score", "points")
    p = AcidTable.create(
        spark, tmp_path / "p",
        spark.createDataFrame([(1, 0)], "id long, b int"),
        partition_by=["b"])
    with pytest.raises(ValueError, match="partition"):
        p.drop_column("b")


def test_latest_version_hint_is_lag_safe(spark, tmp_path):
    """The _latest hint may lag (stale/missing/corrupt) but the forward
    probe always lands on the true newest manifest."""
    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(1,)], "id long"))
    t.append(spark.createDataFrame([(2,)], "id long"))
    t.append(spark.createDataFrame([(3,)], "id long"))
    hint = t._manifests / "_latest"
    assert hint.read_text() == "2"
    hint.write_text("0")                           # stale: probes forward
    assert t.latest_version() == 2
    hint.write_text("999")                         # corrupt: full listing
    assert t.latest_version() == 2
    hint.unlink()                                  # missing: full listing
    assert t.latest_version() == 2
    t.append(spark.createDataFrame([(4,)], "id long"))
    assert hint.read_text() == "3"                 # rewritten on commit
    assert t.read().count() == 4


def test_convert_to_acid_zero_copy_and_refusals(spark, tmp_path):
    """CONVERT promotes a plain parquet dir by reference: inodes
    shared, stats harvested, full DML immediately; hive-layout and
    occupied targets refuse."""
    import os

    import pytest

    src = tmp_path / "plain"
    spark.createDataFrame([(i, i % 3) for i in range(300)],
                          "id long, s int") \
        .repartitionByRange(3, "id").write.parquet(str(src))
    t = AcidTable.convert(spark, src, tmp_path / "t")
    m = t._manifest(0)
    assert m["op"] == "convert" and len(m["files"]) == 3
    from spark_streaming_apps_spark.acid import _entry_rel
    src_ino = {os.stat(p).st_ino for p in src.glob("*.parquet")}
    assert all(os.stat(t.path / _entry_rel(m, f)).st_ino in src_ino
               for f in m["files"])
    assert t.read().count() == 300
    # the harvested stats prune immediately
    paths, total = t.pruned_files("id", 0, 10)
    assert len(paths) < total
    t.delete_where("id < 100")
    assert t.read().count() == 200
    assert t.last_cow_stats["files_linked"] > 0
    # mutations never touch the SOURCE directory's view of the data
    assert spark.read.parquet(str(src)).count() == 300
    with pytest.raises(FileExistsError):
        AcidTable.convert(spark, src, tmp_path / "t")
    hive = tmp_path / "hive"
    spark.createDataFrame([(1, 0)], "id long, p int") \
        .write.partitionBy("p").parquet(str(hive))
    with pytest.raises(ValueError, match="Hive-partitioned"):
        AcidTable.convert(spark, hive, tmp_path / "t2")


def test_vacuum_retain_hours(spark, tmp_path):
    """Time-based retention (Delta's RETAIN n HOURS spelling): versions
    inside the window survive, the latest always survives."""
    from spark_streaming_apps_spark.merge_sql import acid_sql

    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(1,)], "id long"))
    t.append(spark.createDataFrame([(2,)], "id long"))
    t.append(spark.createDataFrame([(3,)], "id long"))
    # generous window: everything survives
    acid_sql(spark, "VACUUM tbl RETAIN 48 HOURS", {"tbl": t})
    assert t.read(0).count() == 1
    # zero window on an APPEND-ONLY history: per-file retention keeps
    # every file (all are referenced by the latest manifest), so old
    # snapshots stay readable — correct, not a missed delete
    t.vacuum(retain_hours=0)
    assert t.read().count() == 3
    assert t.read(0).count() == 1
    # a COW rewrite orphans the old images; NOW the zero window drops
    # them and the old snapshots fail loudly
    t.update_where({"id": "id + 0"}, "id >= 1")                  # v3
    removed = t.vacuum(retain_hours=0)
    assert removed
    assert t.read().count() == 3                  # newest always readable
    import pytest

    from spark_streaming_apps_spark.acid import VersionVacuumedError
    with pytest.raises(VersionVacuumedError):
        t.read(0)


def test_add_constraint_rejects_sink_unenforceable_expr(spark, tmp_path):
    """ADVICE r8: the CHECK grammar is validated against BOTH engines
    at ADD CONSTRAINT time — an expression only Spark can evaluate
    (the streaming sink probes staged parquet with DuckDB) is refused
    LOUDLY here instead of permanently refusing every sink commit."""
    import pytest

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(1, "a")], "id long, tag string"))
    with pytest.raises(ValueError, match="not enforceable"):
        t.add_constraint("sparkonly", "crc32(tag) >= 0")
    assert t.constraints() == {}
    # the ANSI intersection still works end-to-end
    t.add_constraint("id_pos", "id > 0")
    assert t.constraints() == {"id_pos": "id > 0"}


def test_recreated_table_at_same_path_never_serves_stale_cache(
        spark, tmp_path):
    """The file-list resolution cache is fenced by commit TIMESTAMP: a
    table dropped and recreated at the SAME path (bench/scratch reuse)
    must resolve the new incarnation's files, never the old one's."""
    import shutil

    p = tmp_path / "t"
    t = AcidTable.create(spark, p,
                         spark.createDataFrame([(1,)], "id long"))
    t.append(spark.createDataFrame([(2,)], "id long"))
    assert t.read().count() == 2          # warms the resolution cache
    shutil.rmtree(p)
    t2 = AcidTable.create(spark, p,
                          spark.createDataFrame([(7,), (8,), (9,)],
                                                "id long"))
    t2.append(spark.createDataFrame([(10,)], "id long"))
    assert sorted(r.id for r in t2.read().collect()) == [7, 8, 9, 10]


def test_column_mapping_clone_restore_partitioned(spark, tmp_path):
    """Column mapping composes with the rest of the surface: a clone
    carries the logical→physical map in its props (hardlinked physical
    files read back logically); RESTORE to a pre-rename version serves
    the old logical names (the inherited mapping entry is simply
    unused); renames on a PARTITIONED table work for non-partition
    columns (partition columns stay identity — renames refused)."""
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(8)],
        "id long, b int, val double")
    t = AcidTable.create(spark, tmp_path / "t", df.repartition(2, "b"),
                         partition_by=["b"])
    t.rename_column("val", "score")                               # v1
    t.append(spark.createDataFrame([(100, 0, 9.5)],
                                   "id long, b int, score double"))
    c = t.clone(tmp_path / "c")
    assert c.read().columns == ["id", "b", "score"]
    assert c.read().filter("score = 9.5").count() == 1
    assert c._props().get("column_mapping") == {"score": "val"}
    # partition pruning still binds after the rename
    assert t.read().filter("b = 0").count() == 5
    t.delete_where("score = 9.5")
    assert t.read().count() == 8
    # restore to the pre-rename shape: old logical names serve
    v = t.restore(0)
    assert t.read().columns == ["id", "b", "val"]
    assert t.read(v).count() == 8
    # and appends after the restore write/read correctly
    t.append(spark.createDataFrame([(200, 1, 3.25)],
                                   "id long, b int, val double"))
    assert t.read().filter("val = 3.25").count() == 1


def test_vacuum_prunes_stale_checkpoints_but_keeps_replay_floor(
        spark, tmp_path):
    """Vacuum drops parquet checkpoints of unretained versions but
    keeps the newest one at-or-below the oldest retained version — the
    chain-replay short-circuit every retained delta manifest resolves
    through. Dropping a checkpoint is always safe (replay fallback);
    this pins the retention RULE."""
    from spark_streaming_apps_spark.acid import (CHECKPOINT_EVERY,
                                                 _checkpoint_path)

    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(0,)], "id long"))
    for i in range(1, 2 * CHECKPOINT_EVERY + 2):      # v1..v21
        t.append(spark.createDataFrame([(i,)], "id long"))
    v = t.latest_version()
    assert _checkpoint_path(t.path, CHECKPOINT_EVERY).exists()
    assert _checkpoint_path(t.path, 2 * CHECKPOINT_EVERY).exists()
    t.vacuum(keep_last=2)            # keeps v20, v21
    # v20's own checkpoint is retained (in keep window); v10's is the
    # floor ONLY if no newer ckpt <= min(keep) exists — here v20 <= 20
    # is itself the floor, so v10's checkpoint goes
    assert _checkpoint_path(t.path, 2 * CHECKPOINT_EVERY).exists()
    assert not _checkpoint_path(t.path, CHECKPOINT_EVERY).exists()
    # everything still reads (append-only: no data was orphaned)
    assert t.read().count() == 2 * CHECKPOINT_EVERY + 2
    assert t.read(CHECKPOINT_EVERY).count() == CHECKPOINT_EVERY + 1


def test_scan_paths_collapse_to_dirs_when_fully_referenced(
        spark, tmp_path):
    """read() hands the parquet scan COMMIT DIRS when the manifest
    references a dir's complete file set (O(dirs) driver listings, not
    O(files) statuses at 100k-file tables), and falls back to per-file
    paths for partially-referenced dirs (post-COW parents)."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, i % 4) for i in range(40)],
                              "id long, s int").repartition(4))
    t.append(spark.createDataFrame([(100, 9)], "id long, s int"))
    m = t._manifest(t.latest_version())
    paths = t._scan_paths(m, m["files"])
    # fully-referenced dirs collapse: 2 commit dirs, not 5 files
    assert len(paths) == 2
    assert all(not p.endswith(".parquet") for p in paths)
    assert t.read().count() == 41
    # COW rewrite: the parent dir is now PARTIALLY referenced (the
    # rewritten file's old image stays for time travel) → per-file
    t.update_where({"s": "99"}, "id = 0")
    m2 = t._manifest(t.latest_version())
    paths2 = t._scan_paths(m2, m2["files"])
    assert any(p.endswith(".parquet") for p in paths2)
    assert t.read().count() == 41
    assert t.read().filter("s = 99").count() == 1
    # time travel still exact through the collapsed scan
    assert t.read(0).count() == 40


def test_readded_column_stats_strip_survives_delta_encoding(
        spark, tmp_path):
    """DROP COLUMN strips the dead column's stats from carried entries
    (through the CONTENT-AWARE delta encoder: same-name entries with
    changed metadata re-record as remove+add). A re-added column of
    the same name therefore never prunes against the old extents:
    pre-drop files read NULL, only the post-re-add file serves the
    range."""
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([(i, i) for i in range(10)],
                              "id long, v long").coalesce(1))
    assert "v" in t._manifest(0)["files"][0]["stats"]
    t.drop_column("v")                                           # v1
    assert all("v" not in f.get("stats", {})
               for f in t._manifest(1)["files"])
    t.add_column("v", "long")                                    # v2
    t.append(spark.createDataFrame([(100, 100)], "id long, v long"))
    # stats for the re-added logical column ride the NEW file only
    m = t._manifest(t.latest_version())
    with_v = [f for f in m["files"] if "v" in f.get("stats", {})]
    assert len(with_v) == 1
    # range reads: old rows are NULL in v — never resurrected, never
    # wrong-skipped
    assert t.read_range("v", 100, 100).count() == 1
    assert t.read_range("v", 0, 9).count() == 0
    assert t.read().filter("v IS NULL").count() == 10
