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
