"""Structured Streaming jobs (§2.H): the streamed computation must converge
to the batch recompute once the backlog drains."""

from __future__ import annotations

import pytest
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


def test_hw_gap_carryover_across_batches(spark, tmp_path):
    """The strongest streaming-semantics claim the reference makes
    (StreamingApp.scala:238-246): a chunk gap that OPENS in micro-batch 1
    must hold the per-case high-water mark flat through batch 2 and
    advance it only when batch 3 CLOSES the gap — parked chunks carried
    in state across batch boundaries, never dropped or double-counted.

    Three single-file triggers for one key:
      batch 1: seq 0,1 absorbed (hw=3.0), seq 3 parked (gap: seq 2)
      batch 2: seq 4 parked too — hw must NOT move
      batch 3: seq 2 arrives — hw absorbs 2,3,4 in one advance (hw=15.0)
    """
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.streaming.state import GroupStateTimeout

    from spark_streaming_apps_spark.streaming.jobs import (
        HW_OUT_SCHEMA, STATE_SCHEMA, _hw_state_fn, _run_available_now)

    src = tmp_path / "gap_src"
    src.mkdir()
    batches = [[(7, 0, "1.0000"), (7, 1, "2.0000"), (7, 3, "4.0000")],
               [(7, 4, "5.0000")],
               [(7, 2, "3.0000")]]
    schema = pa.schema([("user_id", pa.int64()), ("seq", pa.int64()),
                        ("sz", pa.decimal128(18, 4))])
    from decimal import Decimal
    for i, rows in enumerate(batches):
        tbl = pa.Table.from_pylist(
            [{"user_id": u, "seq": s, "sz": Decimal(v)} for u, s, v in rows],
            schema=schema)
        f = src / f"b{i}.parquet"
        pq.write_table(tbl, f)
        os.utime(f, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    stream = (spark.readStream
              .schema("user_id long, seq long, sz decimal(18,4)")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    states = stream.groupBy("user_id").applyInPandasWithState(
        _hw_state_fn, HW_OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
    qname = f"gap_{uuid.uuid4().hex[:8]}"
    _run_available_now(states.writeStream.outputMode("update")
                       .format("memory").queryName(qname))
    got = [(r.hw_bytes, r.last_seq, r.n_chunks)
           for r in spark.sql(
               f"SELECT * FROM {qname} ORDER BY n_chunks").collect()]
    # batch 1 and 2 both emit the STALLED mark; only batch 3 advances it
    assert got == [(3.0, 1, 2), (3.0, 1, 2), (15.0, 4, 5)]


def test_offset_replay_consistent(spark):
    row = offset_replay_job(spark, SF_DIR).first()
    assert row.replay_consistent == 1
    assert row.run1_rows == 1000


def test_stream_stream_left_outer_emits_watermark_evicted_nulls(spark):
    """The left-outer stream-stream join must emit null-error rows for
    unmatched clicks — INCLUDING the max-event-time click, which only
    evicts if the flush sentinels actually reach the watermark node.
    Catalyst pushes plain event_type filters below the watermark into
    the parquet scan (this silently ate the sentinels and lost exactly
    one row); this pins the fixed behavior: drained output == batch
    left join, null rows present, max-ts click among them if unmatched."""
    from spark_streaming_apps_spark.sources.tables import load_table
    from spark_streaming_apps_spark.streaming.jobs import (
        stream_stream_left_outer_job)

    sf = "/root/testdata/sf0.001"
    out = stream_stream_left_outer_job(spark, sf).toPandas()

    ev = (load_table(spark, sf, "events")
          .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                  "user_id", "event_type"))
    c = ev.filter("event_type = 'click'").alias("c")
    e = ev.filter("event_type = 'error'").alias("e")
    batch = c.join(
        e, F.expr("c.user_id = e.user_id AND "
                  "e.ts BETWEEN c.ts - INTERVAL 1 HOUR AND c.ts"),
        "leftOuter").select(
        F.col("c.event_id").alias("click_id"),
        F.col("e.event_id").alias("error_id")).toPandas()

    assert len(out) == len(batch)
    assert out.error_id.isna().sum() == batch.error_id.isna().sum()
    assert out.error_id.isna().sum() > 0, "no null emissions - not outer"
    # the max-ts click is the one the watermark can only pass via flush
    last_click = ev.filter("event_type = 'click'") \
        .orderBy(F.desc("ts")).first().event_id
    assert (out.click_id == last_click).any()


def test_transform_with_state_totals(spark):
    """transformWithState (Spark 4 typed stateful API): per-user running
    totals tracked in a ValueState across micro-batches; the final
    snapshot per user must equal the batch GROUP BY. Skips where the
    google.protobuf runtime (the API's state-server wire dependency) is
    absent — the container gate, not a semantics gap."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState needs the protobuf runtime "
               "(absent in this container; present on standard clusters)")
    from spark_streaming_apps_spark.sources.tables import load_table
    from spark_streaming_apps_spark.streaming.jobs import (
        transform_with_state_job)

    sf = "/root/testdata/sf0.001"
    out = transform_with_state_job(spark, sf).toPandas()
    ev = load_table(spark, sf, "events")
    batch = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000)
                        .cast("bigint")).alias("sum_v6"))).toPandas()
    assert len(out) == len(batch)
    merged = out.merge(batch, on="user_id", suffixes=("", "_b"))
    assert (merged.n_events == merged.n_events_b).all()
    assert (merged.sum_v6 == merged.sum_v6_b).all()


def test_streaming_ivm_equals_full_log_aggregate(spark):
    """IVM batch-equivalence: the drained merge_add state must equal the
    one-shot aggregate over the full log, however the backlog split into
    micro-batches."""
    from pyspark.sql import functions as F

    from spark_streaming_apps_spark.sources.tables import load_table
    from spark_streaming_apps_spark.streaming.jobs import streaming_ivm_job

    sf = "/root/testdata/sf0.001"
    got = {r.user_id: (r.n_events, r.total)
           for r in streaming_ivm_job(spark, sf).collect()}
    want = {r.user_id: (r.n_events, r.total)
            for r in (load_table(spark, sf, "events")
                      .groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n_events"),
                           F.sum(F.col("value").cast("decimal(28,2)"))
                            .cast("double").alias("total"))).collect()}
    assert got == want


def test_dedup_within_watermark_swallows_replays(spark):
    """State-bounded dedup totality: the staged backlog re-delivers every
    10th event of each file between that file and the next; the drained
    sink must carry each event exactly once (duplicates die in the dedup
    state while inside the watermark delay, as late rows after it)."""
    from pathlib import Path

    from spark_streaming_apps_spark.sources.tables import load_table
    from spark_streaming_apps_spark.streaming import (
        streaming_dedup_watermarked_job)
    from spark_streaming_apps_spark.streaming.jobs import SCRATCH

    out = streaming_dedup_watermarked_job(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events
    # the replays must actually exist in the backlog, or this test is vacuous
    src = Path(str(SCRATCH)) / "dedupwm_sf0.001"
    dups = spark.read.parquet(*[str(p) for p in src.glob("*.dup")]).count()
    assert dups > 0


def test_watermarked_dedup_on_rocksdb_state_store(spark):
    """The same bounded-dedup stream on the PRODUCTION state backend:
    RocksDBStateStoreProvider (what a 1000-executor cluster runs, spilling
    state off-heap) must produce the identical exactly-once result the
    default HDFS-backed provider does."""
    from spark_streaming_apps_spark.sources.tables import load_table
    from spark_streaming_apps_spark.streaming import (
        streaming_dedup_watermarked_job)

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    try:
        out = streaming_dedup_watermarked_job(spark, SF_DIR)
        n_events = load_table(spark, SF_DIR, "events").count()
        assert out.count() == n_events
        assert out.select("event_id").distinct().count() == n_events
    finally:
        spark.conf.set(key, old)

def test_left_outer_shared_drain_equals_dedicated_stream(spark):
    """Guard rail for the shared-drain serving arrangement: the
    `stream_stream_left_outer` catalog key filters the memoized
    full-outer drain; this pins, row for row, that the DEDICATED
    leftOuter streaming plan still produces the identical result on the
    same staged corpus. If either path drifts — the shared filter, the
    dedicated job, or the watermark/sentinel discipline feeding both —
    this fails, so the shared serving path can never silently diverge
    from the genuine code path it stands in for."""
    from spark_streaming_apps_spark.streaming.jobs import (
        stream_stream_left_outer_job, stream_stream_left_outer_shared)

    sf = "/root/testdata/sf0.001"
    dedicated = stream_stream_left_outer_job(spark, sf)
    shared = stream_stream_left_outer_shared(spark, sf)
    assert sorted(dedicated.columns) == sorted(shared.columns)
    # exact multiset equality, both directions
    assert dedicated.exceptAll(shared).count() == 0
    assert shared.exceptAll(dedicated).count() == 0
    assert shared.count() == dedicated.count() > 0
