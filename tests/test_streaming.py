"""Structured Streaming jobs (§2.H): the streamed computation must converge
to the batch recompute once the backlog drains."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import highwater
from spark_streaming_apps_spark.streaming import (
    highwater_state_stream, micro_batch_counts, offset_replay_job)

SF_DIR = "/root/testdata/sf0.001"


def test_streamed_counts_equal_batch(spark, tables):
    got = {r.event_type: r.n
           for r in micro_batch_counts(spark, SF_DIR).collect()}
    want = {r.event_type: r["count"] for r in
            tables["events"].groupBy("event_type").count().collect()}
    assert got == want


def test_stateful_hw_equals_batch_recompute(spark, tables):
    streamed = {r.user_id: (r.hw_bytes, r.last_seq, r.n_chunks)
                for r in highwater_state_stream(spark, SF_DIR).collect()}
    batch = {r.user_id: (r.hw_bytes, r.last_seq, r.n_chunks)
             for r in highwater.highwater_per_key(tables["events"]).collect()}
    assert streamed == batch


def test_offset_replay_consistent(spark):
    row = offset_replay_job(spark, SF_DIR).first()
    assert row.replay_consistent == 1
    assert row.run1_rows == 1000
