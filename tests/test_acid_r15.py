"""Round-15 scale/consistency fixes:

- writer fences re-checked per RETRY ATTEMPT (a zombie query run racing
  its restart can't double-apply a batch through a lost CAS race) —
  ADVICE r14 medium;
- ``delete_semi``: OR-of-keys retire with the keys as a DataFrame
  end-to-end (replaces the r14 scale-killer: uncapped collect into a
  SQL IN-string);
- ``apply_cdf`` on ``enable_dv`` tables serves merge-on-read: deletes
  cost O(matched rows) deletion-vector entries, never O(touched files)
  copy-on-write;
- ``set_autovacuum``/``maybe_autovacuum``: bounded on-disk footprint
  for maintenance loops, fences and the CDF feed surviving;
- ``compact_small`` recounts its per-partition candidate groups on
  every retry attempt (no stale-count lone-file rewrites).
"""
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from spark_streaming_apps_spark.acid import AcidTable, _EQ_PRUNE_CAP

REPO = str(Path(__file__).resolve().parents[1])


def _kv(spark, lo, hi, mult=2):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * mult).alias("v"))


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc1 long, doc2 long, est double")


# ---------------------------------------------------------------- fences


def test_merge_add_zombie_race_applies_once(spark, tmp_path, monkeypatch):
    """Two concurrent invocations of the SAME fenced merge_add batch
    (zombie run racing its restart): both pass the entry check, the
    zombie commits first, and the loser's retry must see the fence in
    the fresh manifest and add NOTHING — without the per-attempt
    re-check both commit and the counters double."""
    t = AcidTable.create(spark, tmp_path / "t",
                         spark.createDataFrame([(1, 10), (2, 20)],
                                               "k long, n long"))
    zombie = AcidTable(spark, tmp_path / "t")
    partials = spark.createDataFrame([(1, 5), (3, 7)], "k long, n long")
    state = {"fired": False}
    orig = AcidTable._try_commit

    def racy(self, *a, **kw):
        if not state["fired"] and self is t:
            state["fired"] = True
            # the zombie lands the SAME fenced batch between our
            # snapshot read and our commit attempt
            assert zombie.merge_add(partials, ["k"], app_id="app",
                                    batch_id=0) is not None
        return orig(self, *a, **kw)
    monkeypatch.setattr(AcidTable, "_try_commit", racy)
    assert t.merge_add(partials, ["k"], app_id="app", batch_id=0) is None
    got = {r.k: r.n for r in t.read().collect()}
    assert got == {1: 15, 2: 20, 3: 7}          # applied exactly once


def test_apply_cdf_zombie_race_applies_once(spark, tmp_path, monkeypatch):
    """Same zombie interleaving through apply_cdf's COW loop: the
    loser's retry re-checks the fence against the winner's manifest and
    commits nothing — the batch's inserts land exactly once."""
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 100))
    zombie = AcidTable(spark, tmp_path / "t")
    ch = (_kv(spark, 0, 10).withColumn("_change_type", F.lit("delete"))
          .unionByName(_kv(spark, 200, 210)
                       .withColumn("_change_type", F.lit("insert"))))
    state = {"fired": False}
    orig = AcidTable._try_commit

    def racy(self, *a, **kw):
        if not state["fired"] and self is t:
            state["fired"] = True
            assert zombie.apply_cdf(ch, ["k"], app_id="app",
                                    batch_id=0) is not None
        return orig(self, *a, **kw)
    monkeypatch.setattr(AcidTable, "_try_commit", racy)
    assert t.apply_cdf(ch, ["k"], app_id="app", batch_id=0) is None
    assert t.read().count() == 100              # 100 - 10 + 10, once
    assert t.read().filter("k >= 200").count() == 10


# ------------------------------------------------------------ delete_semi


def test_delete_semi_or_of_keys(spark, tmp_path):
    p = AcidTable.create(spark, tmp_path / "p", _pairs(
        spark, [(1, 2, .9), (2, 3, .8), (3, 4, .7), (5, 6, .6)]))
    keys = spark.createDataFrame([(2,), (5,)], "doc_id long")
    v = p.delete_semi(keys, on=[["doc1"], ["doc2"]],
                      app_id="retire", batch_id=0)
    assert v is not None
    assert [(r.doc1, r.doc2) for r in p.read().collect()] == [(3, 4)]
    # replayed batch: fenced out, even though it would match nothing
    assert p.delete_semi(keys, on=[["doc1"], ["doc2"]],
                         app_id="retire", batch_id=0) is None
    # a fenced call matching NOTHING still commits the fence
    k2 = spark.createDataFrame([(99,)], "doc_id long")
    v2 = p.delete_semi(k2, on=[["doc1"], ["doc2"]],
                       app_id="retire", batch_id=1)
    assert v2 is not None
    assert p.delete_semi(k2, on=[["doc1"], ["doc2"]],
                         app_id="retire", batch_id=1) is None


def test_delete_semi_beyond_prune_cap_stays_distributed(spark, tmp_path):
    """A retention-delete slice LARGER than the eq-prune cap (the r14
    scale-killer scenario: one CDF micro-batch carrying the whole
    deleted slice) — the key set must never materialize on the driver;
    past the cap the find pass simply falls back to the full semi-join
    (graceful, still distributed)."""
    n = _EQ_PRUNE_CAP + 1000
    pairs = (spark.range(0, 3 * n)
             .select(F.col("id").alias("doc1"),
                     (F.col("id") + 1_000_000).alias("doc2"),
                     F.lit(0.9).alias("est")))
    p = AcidTable.create(spark, tmp_path / "p", pairs)
    dels = spark.range(0, n).select(F.col("id").alias("doc_id"))
    v = p.delete_semi(dels, on=[["doc1"], ["doc2"]],
                      app_id="retire", batch_id=0)
    assert v is not None
    assert p.read().count() == 2 * n
    assert p.read().filter(f"doc1 < {n}").count() == 0


def test_delete_semi_mor_on_dv_table(spark, tmp_path):
    p = AcidTable.create(spark, tmp_path / "p", _pairs(
        spark, [(1, 2, .9), (2, 3, .8), (3, 4, .7)]), enable_dv=True)
    keys = spark.createDataFrame([(2,)], "doc_id long")
    v = p.delete_semi(keys, on=[["doc1"], ["doc2"]])
    m = p._manifest(v, with_files=False)
    assert m["op"] == "delete_semi_mor" and m.get("dv_rows") == 2
    assert [(r.doc1, r.doc2) for r in p.read().collect()] == [(3, 4)]


# --------------------------------------------------------- apply_cdf MOR


def test_apply_cdf_mor_commits_vector_not_rewrite(spark, tmp_path):
    """On an enable_dv table a mixed insert+delete batch must commit a
    deletion vector plus an O(delta) linked append: every parent data
    file is CARRIED by reference (zero rewritten), dv_rows == matched
    rows, and the CDF pair records the batch."""
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 500),
                         enable_cdf=True, enable_dv=True)
    t.append(_kv(spark, 500, 1000))
    parent = t._manifest(t.latest_version())
    parent_paths = {f["path"] for f in parent["files"]}
    ch = (_kv(spark, 0, 50).withColumn("_change_type", F.lit("delete"))
          .unionByName(_kv(spark, 2000, 2050, mult=3)
                       .withColumn("_change_type", F.lit("insert"))))
    v = t.apply_cdf(ch, ["k"], app_id="m", batch_id=0)
    m = t._manifest(v)
    assert m["op"] == "apply_cdf_mor"
    assert m.get("dv_rows") == 50
    assert t.last_mor_stats == {"rows_deleted": 50, "dv_rows_total": 50}
    new_paths = {f["path"] for f in m["files"]}
    assert parent_paths <= new_paths             # nothing rewritten
    assert len(new_paths - parent_paths) >= 1    # inserts linked in
    assert t.read().count() == 1000
    assert t.read().filter("k < 50").count() == 0
    assert t.read().filter("k >= 2000 AND v = k * 3").count() == 50
    chg = t.read_changes(v - 1, v)       # exclusive start: v's deltas
    assert chg.filter("_change_type = 'delete'").count() == 50
    assert chg.filter("_change_type = 'insert'").count() == 50
    # update at one key (delete+insert pair) nets to the post-image
    up = (_kv(spark, 100, 101).withColumn("_change_type",
                                          F.lit("delete"))
          .unionByName(_kv(spark, 100, 101, mult=9)
                       .withColumn("_change_type", F.lit("insert"))))
    t.apply_cdf(up, ["k"], app_id="m", batch_id=1)
    assert [r.v for r in t.read().filter("k = 100").collect()] == [900]
    # compaction materializes the vectors away
    t.compact(target_files=2)
    mm = t._manifest(t.latest_version(), with_files=False)
    assert "dv" not in mm and t.read().count() == 1000


def test_apply_cdf_mor_pure_delete_and_replay(spark, tmp_path):
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 300),
                         enable_dv=True)
    ch = (spark.range(0, 30).select(F.col("id").alias("k"))
          .withColumn("_change_type", F.lit("delete")))
    v = t.apply_cdf(ch, ["k"], app_id="m", batch_id=0)
    assert t._manifest(v, with_files=False)["op"] == "apply_cdf_mor"
    assert t.read().count() == 270
    assert t.apply_cdf(ch, ["k"], app_id="m", batch_id=0) is None
    assert t.read().count() == 270


# ------------------------------------------------------------- autovacuum


def test_autovacuum_bounds_footprint_fences_and_cdf_survive(
        spark, tmp_path):
    """A fenced maintenance loop with autovacuum on: on-disk data dirs
    stay O(keep window) instead of O(batches); the replay fence (txns
    map on manifests, which vacuum never deletes) still fences; the
    CDF feed still serves from version 0 (change files default to full
    retention)."""
    def run_loop(t: AcidTable, autovacuum: bool) -> None:
        for b in range(12):
            assert t.append_txn(
                _kv(spark, 100 * (b + 1), 100 * (b + 1) + 5),
                "loop", b) is not None
            if b % 3 == 1:
                # a COW retire strands its replaced files — the
                # history autovacuum exists to reclaim
                t.delete_where(f"k = {100 * (b + 1)}")
            if autovacuum:
                t.maybe_autovacuum()

    def n_parquet(p) -> int:
        return sum(1 for _ in (p / "data").rglob("*.parquet"))

    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 10),
                         enable_cdf=True)
    t.set_autovacuum(every=3, keep_last=1)
    twin = AcidTable.create(spark, tmp_path / "twin",
                            _kv(spark, 0, 10), enable_cdf=True)
    run_loop(t, autovacuum=True)
    run_loop(twin, autovacuum=False)
    latest = t.latest_version()         # twin lags by the one
    # set_autovacuum property commit
    # bounded footprint: the autovacuumed table holds strictly fewer
    # files on disk than the never-vacuumed twin of the same history
    assert n_parquet(tmp_path / "t") < n_parquet(tmp_path / "twin")
    # replay fence intact across the vacuums (manifests never die)
    assert t.append_txn(_kv(spark, 0, 1), "loop", 5) is None
    assert t.read().count() == twin.read().count()
    # the CDF feed still serves the full history
    chg = t.read_changes(1, latest)
    assert chg.filter("_change_type = 'insert'").count() == 5 * 12
    # clearing the property stops the hook
    t.set_autovacuum(every=None)
    assert t.maybe_autovacuum() is None


def test_autovacuum_reclaims_cow_retire_history(spark, tmp_path):
    """COW retires strand their replaced files; autovacuum reclaims
    them past the keep window (the footprint half of the r15 rung)."""
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 1000))
    t.set_autovacuum(every=2, keep_last=1)
    removed_any = False
    for b in range(6):
        t.delete_where(f"k >= {100 * b} AND k < {100 * b + 50}")
        if t.maybe_autovacuum():
            removed_any = True
    assert removed_any
    assert t.read().count() == 1000 - 6 * 50


# ------------------------------------------------------------ compact_small


def test_compact_small_recounts_groups_per_attempt(
        spark, tmp_path, monkeypatch):
    """A lost compaction race must re-derive the per-partition
    candidate counts from the WINNER's manifest: a partition that
    became eligible mid-race (second small file appended) is folded on
    the retry instead of being skipped by the stale pre-loop count."""
    base = spark.createDataFrame([(1, 1)], "p int, x int")
    t = AcidTable.create(spark, tmp_path / "t", base,
                         partition_by=["p"])
    # p=1 lone small file; p=2 two small files (the only candidates)
    t.append(spark.createDataFrame([(2, 1)], "p int, x int"))
    t.append(spark.createDataFrame([(2, 2)], "p int, x int"))
    racer = AcidTable(spark, tmp_path / "t")
    state = {"fired": False}
    orig = AcidTable._try_commit

    def racy(self, *a, **kw):
        if not state["fired"] and self is t:
            state["fired"] = True
            # mid-race: p=1 gains a second small file
            racer.append(spark.createDataFrame([(1, 2)],
                                               "p int, x int"))
        return orig(self, *a, **kw)
    monkeypatch.setattr(AcidTable, "_try_commit", racy)
    t.compact_small(max_bytes=32 << 20, min_files=2)
    monkeypatch.setattr(AcidTable, "_try_commit", orig)
    m = t._manifest(t.latest_version())
    per_part: dict = {}
    for f in m["files"]:
        k = tuple(sorted((f.get("partition") or {}).items()))
        per_part[k] = per_part.get(k, 0) + 1
    # BOTH partitions folded to one file — the retry saw p=1's new
    # eligibility (stale counts would have left p=1 with 2 files)
    assert set(per_part.values()) == {1}
    assert t.read().count() == 4


# ------------------------------------------------------- sink hygiene


def _drain_sink(spark, src, table_path, ckpt, app_id):
    from spark_streaming_apps_spark.sources.pysource import (
        AcidTableDataSource)
    spark.dataSource.register(AcidTableDataSource)
    q = (spark.readStream.schema("event_id long, user_id long")
         .option("maxFilesPerTrigger", 1).parquet(str(src))
         .writeStream.format("acidtable")
         .option("path", str(table_path))
         .option("appId", app_id)
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def _seed_parquet(src, n_files=12, rows_per=5):
    import duckdb
    src.mkdir()
    con = duckdb.connect()
    for i in range(n_files):
        con.execute(f"""
            COPY (SELECT CAST(range AS BIGINT) AS event_id,
                         CAST({i} AS BIGINT) AS user_id
                  FROM range({i * rows_per}, {i * rows_per + rows_per}))
            TO '{src}/f{i}.parquet' (FORMAT PARQUET)""")


def test_sink_attaches_and_rebuilds_bloom_sidecars(spark, tmp_path):
    """The SparkSession-free sink indexes a bloom_by table: every
    batch-born file carries sidecars, and sink-side compaction
    REBUILDS them for the folded files — point-probe pruning survives
    the whole sink lifecycle (ADVICE r15: compacted files previously
    lost their sidecars)."""
    src = tmp_path / "src"
    _seed_parquet(src)
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"),
        bloom_by=["event_id"])
    t.set_autocompact(max_bytes=1 << 20, min_files=4)
    _drain_sink(spark, src, tmp_path / "t", tmp_path / "ckpt", "blm")
    m = t._manifest(t.latest_version())
    ops = [t._manifest(v)["op"] for v in range(t.latest_version() + 1)]
    assert "compact_small" in ops
    assert all("bloom" in f and "event_id" in f["bloom"]
               for f in m["files"]), m["files"]
    # definitive absence: an out-of-range needle prunes EVERY file
    kept, total = t.pruned_files_in("event_id", [10_000_000])
    assert total >= 1 and kept == []
    # presence stays correct through the folds
    assert [r.user_id for r in
            t.read_eq_any("event_id", [57]).collect()] == [11]


def test_sink_autocompact_fold_cap_limits_one_invocation(
        spark, tmp_path):
    """max_fold_bytes caps bytes folded per sink invocation: with a
    cap below the full backlog, one compaction pass folds only some
    groups (progress, bounded memory) and later passes finish the
    job — rows always intact."""
    src = tmp_path / "src"
    _seed_parquet(src)
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"))
    # one parquet file of 5 longs is ~1-2 KB: cap at 3 KB so a single
    # invocation cannot fold the whole 12-file backlog at once
    t.set_autocompact(max_bytes=1 << 20, min_files=4)
    v = t.latest_version()
    m = t._manifest(v, with_files=False)
    props = dict(m.get("props") or {})
    props["autocompact"]["max_fold_bytes"] = 3 << 10
    assert t._try_commit(v + 1, m["data"], m["schema"],
                         "set_autocompact", props=props,
                         files=t._manifest(v).get("files"))
    _drain_sink(spark, src, tmp_path / "t", tmp_path / "ckpt", "cap")
    assert t.read().count() == 60
    # compaction ran more than once (the cap forced multiple passes)
    ops = [t._manifest(vv)["op"]
           for vv in range(t.latest_version() + 1)]
    assert ops.count("compact_small") >= 2, ops


def test_sink_runs_autovacuum(spark, tmp_path):
    """The sink honors set_autovacuum from its SparkSession-free
    process: a many-batch drain reclaims out-of-window history (the
    vacuum ledger appears), rows and the batch fence intact."""
    src = tmp_path / "src"
    _seed_parquet(src)
    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([], "event_id long, user_id long"),
        enable_cdf=True)
    t.set_autocompact(max_bytes=1 << 20, min_files=4)
    t.set_autovacuum(every=5, keep_last=2)
    _drain_sink(spark, src, tmp_path / "t", tmp_path / "ckpt", "av")
    assert t.read().count() == 60
    # compaction strands replaced files; autovacuum reclaimed some
    assert (tmp_path / "t" / "manifests" / "_vacuumed.jsonl").exists()
    # every version still has its manifest (fences ride manifests)
    latest = t.latest_version()
    assert all((tmp_path / "t" / "manifests" / f"v{v}.json").exists()
               for v in range(latest + 1))
    # the CDF feed still serves the full insert history
    chg = t.read_changes(0, latest)
    assert chg.filter("_change_type = 'insert'").count() == 60


# --------------------------------------------------------- materialize_dv


def test_materialize_dv_folds_only_touched_files(spark, tmp_path):
    """materialize_dv rewrites ONLY the files the vector names (their
    MOR-dead rows drop), carries the rest — and the vector is gone."""
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 400),
                         enable_dv=True, partition_by=[])
    t.append(_kv(spark, 400, 800))
    t.append(_kv(spark, 800, 1200))
    # MOR delete touching only the FIRST slice's file(s)
    t.delete_where_mor("k < 40")
    m0 = t._manifest(t.latest_version())
    assert "dv" in m0 and m0["dv_rows"] == 40
    before = {f["path"] for f in m0["files"]}
    v = t.materialize_dv()
    m = t._manifest(v)
    assert m["op"] == "materialize_dv" and "dv" not in m
    after = {f["path"] for f in m["files"]}
    # files the vector never named are CARRIED by path; only the
    # dv-touched subset was rewritten
    assert before & after, "every file rewritten — not subset-scoped"
    assert before - after, "no file rewritten — vector not folded"
    assert t.read().count() == 1200 - 40
    assert t.read().filter("k < 40").count() == 0
    # no-op without a vector
    assert t.materialize_dv() == v


def test_autocompact_max_dv_rows_triggers_materialize(spark, tmp_path):
    """The maintenance hook folds the deletion vector once it passes
    the policy bound — a retire stream's per-scan anti-join tax stays
    bounded without any explicit OPTIMIZE call."""
    t = AcidTable.create(spark, tmp_path / "t", _kv(spark, 0, 1000),
                         enable_dv=True)
    t.set_autocompact(max_bytes=1 << 20, min_files=999,
                      max_dv_rows=100)
    for b in range(4):
        ch = (spark.range(b * 40, b * 40 + 40)
              .select(F.col("id").alias("k"))
              .withColumn("_change_type", F.lit("delete")))
        t.apply_cdf(ch, ["k"], app_id="ret", batch_id=b)
        t.maybe_autocompact()
    ops = [t._manifest(v)["op"] for v in range(t.latest_version() + 1)]
    assert "materialize_dv" in ops
    m = t._manifest(t.latest_version(), with_files=False)
    # the live vector never exceeds the bound for long: folded away
    assert m.get("dv_rows", 0) <= 100
    assert t.read().count() == 1000 - 160
