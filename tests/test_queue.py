"""desh_files status-machine algebra (SURVEY.md §2.G)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import queue


def test_claim_flips_exactly_one(tables):
    q = queue.queue_df(tables["orders"])
    before_avail = q.filter(F.col("status") == 0).count()
    after = queue.claim_one(q)
    assert after.filter(F.col("status") == 0).count() == before_avail - 1
    claimed = after.filter(F.col("removed").isNotNull()).collect()
    assert len(claimed) == 1
    # deterministic victim: the min available id
    min_avail = q.filter(F.col("status") == 0).agg(F.min("file_id")).first()[0]
    assert claimed[0].file_id == min_avail
    assert claimed[0].status == 1


def test_transitions_reach_finished(tables):
    q = queue.queue_df(tables["orders"])
    out = queue.status_transitions(q)
    # every claimed (1) input ends finished (3) with both stamps
    n_claimed = q.filter(F.col("status") == 1).count()
    finished = out.filter(F.col("started").isNotNull()
                          & F.col("finished").isNotNull())
    assert finished.count() == n_claimed
    assert finished.filter(F.col("status") != 3).count() == 0
    # untouched statuses pass through
    assert out.filter(F.col("status") == 0).count() == \
        q.filter(F.col("status") == 0).count()


def test_reset_errors_targets_resident_errors(tables):
    q = queue.queue_df(tables["orders"])
    out = queue.reset_errors(q)
    expected = q.filter((F.col("error_status") == 1)
                        & (F.col("resident") == 1)).count()
    assert out.count() == expected
    assert out.filter(F.col("status") != 0).count() == 0


def test_concurrent_workers_never_double_claim(tables, tmp_path):
    """FileWorkerApp.scala:207-227 semantics under real concurrency: four
    workers race 20 claims against one queue; the exclusive-create
    protocol must hand out 20 DISTINCT files, and (since losers skip
    forward in id order) exactly the 20 lowest available ids."""
    from concurrent.futures import ThreadPoolExecutor

    q = queue.queue_df(tables["orders"]).localCheckpoint()
    claim_dir = tmp_path / "claims"

    def worker(wid: str):
        return [queue.claim_one_exclusive(q, claim_dir, wid,
                                          candidate_batch=4)
                for _ in range(5)]

    with ThreadPoolExecutor(max_workers=4) as ex:
        got = [fid for fids in ex.map(worker, ["w0", "w1", "w2", "w3"])
               for fid in fids]

    assert None not in got, "queue drained prematurely"
    assert len(set(got)) == 20, f"double-claim: {sorted(got)}"
    lowest = [r.file_id for r in
              q.filter(F.col("status") == 0).select("file_id")
               .orderBy("file_id").limit(20).collect()]
    assert sorted(got) == lowest
    # post-state audit view: exactly the claimed rows flip to status 1
    view = queue.claimed_view(q, claim_dir)
    claimed_rows = view.filter(F.col("worker").isNotNull())
    assert claimed_rows.count() == 20
    assert claimed_rows.filter(F.col("status") != 1).count() == 0
