"""Structured Streaming jobs — the §2.H surface of the reference.

Reference shape: `createDirectStream → map → transform/mapPartitions →
repartition(1) → foreachRDD` on 60 s micro-batches (StreamingApp.scala:
309-312, 327-395, 557-560), with `auto.offset.reset=smallest` replay (:309)
and a graceful stop when the image completes (:482-484).

Spark-first re-expression: a file stream over the events fixture plays the
Kafka topic (each staged file = one micro-batch via maxFilesPerTrigger=1);
`foreachBatch` replaces foreachRDD/mapPartitions side effects (Spark's
writers already amortize per-partition connections); `Trigger.AvailableNow`
is the bounded-run stop; the monotonic high-water state machine runs as
`applyInPandasWithState` keyed by case (user_id) — one state per disk
image, all images in parallel, which is the 100 TB layout.

Every job here drains the stream to completion and returns a DETERMINISTIC
batch DataFrame (final aggregate / final state), so the driver can check it
against a DuckDB oracle even though the computation ran as a stream.
"""

from __future__ import annotations

import shutil
import uuid
from contextlib import contextmanager
from decimal import Decimal
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.queue import queue_df
from ..sources.tables import load_table

SCRATCH = Path(__file__).resolve().parents[2] / ".scratch" / "streaming"
N_STREAM_FILES = 4
SEQ_DROP = 13  # per-key missing-chunk plant, matches highwater_per_key

#: State-store partition count for the stateful streams. Stateful queries
#: pin their state layout to spark.sql.shuffle.partitions at FIRST start,
#: and every micro-batch commits one state-store delta per partition — so
#: partitions should track the per-batch volume, not the session default
#: (32 partitions × 4 batches = 128 near-empty store commits dominated the
#: runtime: 2× the whole job). On a real cluster size this to ~2-3× total
#: executor cores; it cannot be changed after the first checkpoint.
N_STATE_PARTITIONS = 8


@contextmanager
def _state_sized(spark: SparkSession, parts: int = N_STATE_PARTITIONS):
    """Temporarily size spark.sql.shuffle.partitions for a stateful stream
    start; restores the session default afterwards (the setting is only
    read when the streaming query starts)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _fresh(name: str) -> tuple[str, str]:
    """(output_dir, checkpoint_dir) — wiped per run so replays start from
    the earliest offset (auto.offset.reset=smallest, StreamingApp.scala:309)."""
    base = SCRATCH / name
    shutil.rmtree(base, ignore_errors=True)
    return str(base / "out"), str(base / "ckpt")


def _staged_ok(src: Path, n_parts: int) -> bool:
    """True if a staged backlog at `src` is complete: committed (_SUCCESS)
    with exactly the expected part files. Staging is deterministic per
    sf_dir (hash repartition of immutable test parquet), so a complete
    backlog is reusable across runs — restaging was pure overhead in every
    bench/selfcheck iteration. A crash mid-write fails the part count."""
    return (src / "_SUCCESS").exists() and \
        sum(1 for p in src.glob("part-*")) == n_parts


def stage_stream_files(spark: SparkSession, sf_dir: str,
                       n_files: int = N_STREAM_FILES) -> str:
    """Stage the events table as `n_files` parquet files — the topic's
    backlog; one file per micro-batch (maxFilesPerTrigger=1)."""
    src = SCRATCH / f"src_{Path(sf_dir).name}"
    if _staged_ok(src, n_files):
        return str(src)
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props")
    shutil.rmtree(src, ignore_errors=True)
    events.repartition(n_files).write.parquet(str(src))
    return str(src)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kafka_source streaming analog: file stream, earliest offsets,
    one staged file per micro-batch."""
    src = stage_stream_files(spark, sf_dir)
    schema = ("event_id long, user_id long, event_type string, "
              "value double, props string")
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src))


def _run_available_now(writer) -> None:
    """Start a bounded (AvailableNow) run with right-sized state partitions
    and drain it. Every stream here starts from a fresh checkpoint, so the
    temporary spark.sql.shuffle.partitions is safe to pin per run."""
    spark = SparkSession.getActiveSession()
    with _state_sized(spark):
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()


# ---------------------------------------------------------------- §2.H keys

def micro_batch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """micro_batch_trigger: fixed-size micro-batches feeding a running
    aggregate (StreamingApp.scala:557-560); after the bounded run drains
    the backlog, the complete-mode aggregate equals the batch GROUP BY."""
    qname = f"mb_{uuid.uuid4().hex[:8]}"
    agg = (events_stream(spark, sf_dir)
           .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
    _run_available_now(
        agg.writeStream.outputMode("complete").format("memory").queryName(qname))
    return spark.sql(f"SELECT event_type, n FROM {qname}")


def per_batch_transform_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """per_batch_transform: per-micro-batch rewrite (DStream.transform,
    StreamingApp.scala:327-393) as a foreachBatch projection+filter whose
    appended union over all batches is checked against the batch twin."""
    out, ckpt = _fresh("per_batch_transform")

    def xform(batch: DataFrame, batch_id: int) -> None:
        (batch.filter(F.col("event_type") == "click")
         .select("event_id", "user_id", F.octet_length("props").alias("n_bytes"))
         .write.mode("append").parquet(out))

    _run_available_now(
        events_stream(spark, sf_dir).writeStream
        .foreachBatch(xform).option("checkpointLocation", ckpt))
    return spark.read.parquet(out)


def mapPartitions_sideeffect_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapPartitions_sideeffect: per-partition side-effecting I/O while
    iterating a batch (StreamingApp.scala:330-391). Spark-native: the
    foreachBatch writer opens one output per partition (same connection
    amortization); the readback aggregate proves every partition's side
    effect landed exactly once."""
    out, ckpt = _fresh("mapPartitions_sideeffect")

    def sink(batch: DataFrame, batch_id: int) -> None:
        (batch.select("event_id", F.octet_length("props").alias("n_bytes"))
         .write.mode("append").parquet(out))

    _run_available_now(
        events_stream(spark, sf_dir).writeStream
        .foreachBatch(sink).option("checkpointLocation", ckpt))
    return (spark.read.parquet(out)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_bytes").alias("total_bytes")))


def repartition_serialize_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartition_serialize: the reference forces its HW section through
    repartition(1) (StreamingApp.scala:395). Reproduced per batch — each
    micro-batch collapses to one partition before the serial write — while
    the output stays value-identical to the parallel plan (the point: at
    scale, DON'T do this; highwater_state below is the keyed form)."""
    out, ckpt = _fresh("repartition_serialize")

    def sink(batch: DataFrame, batch_id: int) -> None:
        (batch.repartition(1).select("event_id", "value")
         .write.mode("append").parquet(out))

    _run_available_now(
        events_stream(spark, sf_dir).writeStream
        .foreachBatch(sink).option("checkpointLocation", ckpt))
    return (spark.read.parquet(out)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("total_value")))


STATE_SCHEMA = "next_needed long, hw string, n_absorbed long, pending string"
HW_OUT_SCHEMA = "user_id long, hw_bytes double, last_seq long, n_chunks long"


def _hw_state_fn(key, pdf_iter, state: GroupState):
    """Incremental contiguous-prefix watermark: absorb out-of-order chunk
    arrivals into a pending buffer, advance hw while the next-needed
    sequence is present (StreamingApp.scala:238-252 semantics, incremental).
    Sums are exact Decimals carried in the state as strings. At 100 TB the
    pending buffer is bounded by the gap width, not the stream length —
    chunks beyond an open gap park here exactly like the reference's
    unreleased files."""
    if state.exists:
        next_needed, hw_s, n_absorbed, pending_s = state.get
        hw = Decimal(hw_s)
        pending = {int(k): Decimal(v)
                   for k, v in (kv.split(":") for kv in pending_s.split(",") if kv)}
    else:
        next_needed, hw, n_absorbed, pending = 0, Decimal(0), 0, {}
    for pdf in pdf_iter:
        for seq, sz in zip(pdf["seq"], pdf["sz"]):
            pending[int(seq)] = sz  # sz is already Decimal (parquet decimal)
    while next_needed in pending:
        hw += pending.pop(next_needed)
        next_needed += 1
        n_absorbed += 1
    state.update((next_needed, str(hw), n_absorbed,
                  ",".join(f"{k}:{v}" for k, v in pending.items())))
    yield pd.DataFrame([{
        "user_id": key[0],
        "hw_bytes": float(hw) if n_absorbed else None,
        "last_seq": next_needed - 1 if n_absorbed else None,
        "n_chunks": n_absorbed,
    }])


def highwater_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """highwater_state: the monotonic per-case watermark as TRUE streaming
    state (applyInPandasWithState keyed by user_id) instead of the
    reference's PostgreSQL singleton row (StreamingApp.scala:212-259).

    Chunks (user_id, seq, size) are staged across micro-batch files in
    arbitrary order with the same per-key drops as highwater_per_key; after
    the bounded run, the latest emitted state per key must equal the batch
    recompute — which is exactly what the driver's oracle checks."""
    src = SCRATCH / f"hwsrc_{Path(sf_dir).name}"
    if not _staged_ok(src, N_STREAM_FILES):
        events = load_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy("event_id")
        staged = (events.select(
            "user_id", "event_id",
            F.col("value").cast("decimal(18,4)").alias("sz"))
            .withColumn("seq", F.row_number().over(w) - 1)
            .filter(F.col("seq") % SEQ_DROP != SEQ_DROP - 1)
            .select("user_id", "seq", "sz"))
        shutil.rmtree(src, ignore_errors=True)
        staged.repartition(N_STREAM_FILES).write.parquet(str(src))

    # 2 files per trigger: cross-batch state still exercised (2 batches),
    # at half the per-batch python-state-exchange fixed cost of 1-per.
    stream = (spark.readStream.schema("user_id long, seq long, sz decimal(18,4)")
              .option("maxFilesPerTrigger", 2).parquet(str(src)))
    states = stream.groupBy("user_id").applyInPandasWithState(
        _hw_state_fn, HW_OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
    qname = f"hw_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        states.writeStream.outputMode("update").format("memory").queryName(qname))
    # latest state per key = the row with the most absorbed chunks
    return spark.sql(f"""
        SELECT user_id, max_by(hw_bytes, n_chunks) AS hw_bytes,
               max_by(last_seq, n_chunks) AS last_seq,
               max(n_chunks) AS n_chunks
        FROM {qname} GROUP BY user_id""")


N_LATE_PLANT = 20
WM_DELAY = "10 minutes"


def watermark_late_drop_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time watermark semantics: a windowed streaming aggregate with
    `withWatermark` must DROP late data once the watermark has passed.

    Deterministic construction: the {N_LATE_PLANT} globally-oldest events
    are re-routed to arrive in the LAST micro-batch (files are staged in
    strict event-time order otherwise, with explicit mtimes so the file
    source replays them in order). By then the watermark sits 10 minutes
    behind the 30-day maximum — the planted stragglers' hour-windows closed
    weeks earlier, so the final counts equal the batch aggregate WITHOUT
    them, which is exactly what the oracle computes."""
    import os

    src = SCRATCH / f"wmsrc_{Path(sf_dir).name}"
    if sum(1 for p in src.glob("*.parquet")) == 4:  # 3 ordered + 1 late
        return _watermark_drive(spark, src)
    shutil.rmtree(src, ignore_errors=True)
    src.mkdir(parents=True)
    events = (load_table(spark, sf_dir, "events")
              .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                      "event_type"))
    ranked = events.withColumn(
        "rk", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ranked.count()
    cut = (n - N_LATE_PLANT) // 3
    chunks = [
        ranked.filter((F.col("rk") > N_LATE_PLANT + i * cut)
                      & (F.col("rk") <= (N_LATE_PLANT + (i + 1) * cut
                                         if i < 2 else n))).drop("rk")
        for i in range(3)
    ] + [ranked.filter(F.col("rk") <= N_LATE_PLANT).drop("rk")]
    for i, chunk in enumerate(chunks):
        tmp = SCRATCH / f"wmtmp_{i}"
        shutil.rmtree(tmp, ignore_errors=True)
        chunk.coalesce(1).write.parquet(str(tmp))
        part = next(Path(tmp).glob("part-*.parquet"))
        dest = src / f"{i:02d}.parquet"
        shutil.move(str(part), dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp, ignore_errors=True)
    return _watermark_drive(spark, src)


def _watermark_drive(spark: SparkSession, src: Path) -> DataFrame:
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, event_type string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    agg = (stream.withWatermark("ts", WM_DELAY)
           .groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    qname = f"wm_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        agg.writeStream.outputMode("update").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT unix_micros(w.start) AS window_start_us, max(n) AS n
        FROM {qname} GROUP BY 1""")


def late_data_retry_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """late_data_retry: errored resident files re-enqueued when 50% / 100%
    of the image has arrived (StreamingApp.scala:428-445). The stream
    accumulates arrived bytes per batch; once the backlog drains, arrival
    is 100% and the post-state re-opens exactly the errored resident rows."""
    seen = {"bytes": 0.0, "batches": 0}

    def track(batch: DataFrame, batch_id: int) -> None:
        b = batch.agg(F.sum("value")).first()[0]
        seen["bytes"] += b or 0.0
        seen["batches"] += 1

    _run_available_now(
        events_stream(spark, sf_dir).writeStream.foreachBatch(track)
        .option("checkpointLocation", _fresh("late_data_retry")[1]))
    image_size = (load_table(spark, sf_dir, "events")
                  .agg(F.sum("value")).first()[0])
    arrived_frac = seen["bytes"] / image_size if image_size else 0.0
    q = queue_df(load_table(spark, sf_dir, "orders"))
    retry = (F.col("error_status") == 1) & (F.col("resident") == 1)
    threshold_hit = F.lit(arrived_frac >= 0.5)
    return q.select(
        "file_id",
        F.when(retry & threshold_hit, 0).otherwise(F.col("status")).alias("status"),
        "resident", "error_status",
        retry.cast("int").alias("requeued"),
    )


def stop_on_complete_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stop_on_complete: graceful stop once the whole image is in
    (`image_size <= hw_after` → ssc.stop, StreamingApp.scala:434-440,
    482-484) — Spark-native as Trigger.AvailableNow: the query stops by
    itself when the backlog is drained, and the drained totals prove
    completeness."""
    qname = f"sc_{uuid.uuid4().hex[:8]}"
    agg = (events_stream(spark, sf_dir)
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("arrived_bytes")))
    _run_available_now(
        agg.writeStream.outputMode("complete").format("memory").queryName(qname))
    done = spark.sql(f"SELECT n_rows, arrived_bytes FROM {qname}")
    return done.select(
        "n_rows", "arrived_bytes",
        F.lit(1).alias("stopped"))  # AvailableNow terminated on its own


def offset_replay_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """offset_replay: earliest-offset replay (auto.offset.reset=smallest,
    StreamingApp.scala:309) — two independent runs from scratch checkpoints
    must consume the identical backlog."""
    def one_run() -> int:
        qname = f"rp_{uuid.uuid4().hex[:8]}"
        agg = events_stream(spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
        _run_available_now(
            agg.writeStream.outputMode("complete").format("memory").queryName(qname))
        return spark.sql(f"SELECT n FROM {qname}").first()[0]

    n1, n2 = one_run(), one_run()
    return spark.createDataFrame(
        [(n1, n2, int(n1 == n2))],
        "run1_rows long, run2_rows long, replay_consistent int")


def _stage_ts_ordered(spark: SparkSession, sf_dir: str, name: str,
                      cols: list) -> str:
    """Stage events as N_STREAM_FILES parquet files in strict event-time
    order with ascending mtimes, so the file source replays the stream
    in-order (no event is ever late relative to the watermark)."""
    import os

    src = SCRATCH / f"{name}_{Path(sf_dir).name}"
    if sum(1 for p in src.glob("*.parquet")) == N_STREAM_FILES:
        return str(src)  # deterministic per sf_dir — reuse across runs
    shutil.rmtree(src, ignore_errors=True)
    src.mkdir(parents=True)
    events = (load_table(spark, sf_dir, "events")
              .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                      *cols))
    ranked = events.withColumn(
        "rk", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ranked.count()
    cut = n // N_STREAM_FILES
    for i in range(N_STREAM_FILES):
        lo, hi = i * cut, (i + 1) * cut if i < N_STREAM_FILES - 1 else n
        chunk = ranked.filter((F.col("rk") > lo) & (F.col("rk") <= hi)).drop("rk")
        tmp = SCRATCH / f"{name}_tmp_{i}"
        shutil.rmtree(tmp, ignore_errors=True)
        chunk.coalesce(1).write.parquet(str(tmp))
        part = next(Path(tmp).glob("part-*.parquet"))
        dest = src / f"{i:02d}.parquet"
        shutil.move(str(part), dest)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp, ignore_errors=True)
    return str(src)


def streaming_session_window_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows as TRUE streaming state: `session_window` under a
    watermark, sessions growing across micro-batches. Files are staged in
    event-time order (same mtime trick as the watermark job), so a
    session's start is fixed the moment it opens and only its extent
    grows — the final snapshot per (user, session_start) is the converged
    session, which must equal the batch gaps-and-islands computation."""
    src = _stage_ts_ordered(spark, sf_dir, "sesssrc", ["user_id"])
    stream = (spark.readStream.schema("event_id long, ts timestamp, user_id long")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
           .agg(F.count(F.lit(1)).alias("n")))
    qname = f"sess_{uuid.uuid4().hex[:8]}"
    # session-window aggs support complete/append but not update mode; in
    # complete mode the memory table IS the converged session set
    _run_available_now(
        agg.writeStream.outputMode("complete").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT user_id, unix_micros(w.start) AS session_start_us, n
        FROM {qname}""")


def stream_stream_join_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: every click joined to the SAME USER's
    error events from the preceding hour — two watermarked streams, a
    range condition bounding the buffered state (Spark evicts join state
    once the watermark passes the interval). Inner joins emit matches
    eagerly, and in-order staging means nothing arrives late, so the
    drained output equals the batch interval join exactly."""
    src = _stage_ts_ordered(spark, sf_dir, "ssjsrc", ["user_id", "event_type"])
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def side(kind: str, prefix: str) -> DataFrame:
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .filter(F.col("event_type") == kind)
                .select(F.col("event_id").alias(f"{prefix}_id"),
                        F.col("user_id").alias(f"{prefix}_user"),
                        F.col("ts").alias(f"{prefix}_ts"))
                .withWatermark(f"{prefix}_ts", "10 minutes"))

    clicks, errors = side("click", "c"), side("error", "e")
    joined = clicks.join(
        errors,
        F.expr("c_user = e_user AND "
               "e_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"))
    qname = f"ssj_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        joined.writeStream.outputMode("append").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT c_id AS click_id, e_id AS error_id, c_user AS user_id,
               unix_micros(c_ts) - unix_micros(e_ts) AS lag_us
        FROM {qname}""")


def exactly_once_sink_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once sink semantics: the run writes each micro-batch into a
    batch_id-keyed partition; restarting the SAME query (same checkpoint)
    over an unchanged backlog replays nothing, so the sink holds each
    record exactly once — the upgrade over the reference's at-least-once
    `auto.offset.reset=smallest` replay (StreamingApp.scala:309). The
    checkpoint is deliberately KEPT between the two runs (unlike every
    other job here)."""
    base = SCRATCH / "exactly_once"
    shutil.rmtree(base, ignore_errors=True)
    out, ckpt = str(base / "out"), str(base / "ckpt")
    src = stage_stream_files(spark, sf_dir)
    schema = ("event_id long, user_id long, event_type string, "
              "value double, props string")

    def run_once() -> None:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        def sink(batch: DataFrame, batch_id: int) -> None:
            (batch.withColumn("batch_id", F.lit(batch_id))
             .write.mode("append").parquet(out))

        _run_available_now(
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt))

    run_once()
    run_once()  # restart against the same checkpoint: zero new batches
    return (spark.read.parquet(out)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("event_id").alias("n_distinct")))


def streaming_dedup_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: `dropDuplicates` keyed state across
    micro-batches — the at-least-once→exactly-once repair for the
    reference's `auto.offset.reset=smallest` replays (StreamingApp.scala:
    309), where a restarted consumer re-delivers old chunks. The staged
    backlog ends with a REPLAY file (every 10th event re-delivered after
    the whole topic); the dedup state swallows it, so the drained sink
    equals the distinct batch projection exactly. State is keyed by
    event_id only — at 100 TB bound it with
    `dropDuplicatesWithinWatermark` so keys age out with event time."""
    out, ckpt = _fresh("streaming_dedup")
    src = SCRATCH / f"dedupsrc_{Path(sf_dir).name}"
    if not _staged_ok(src, N_STREAM_FILES + 1):  # +1: the REPLAY file
        shutil.rmtree(src, ignore_errors=True)
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type")
        events.repartition(N_STREAM_FILES).write.parquet(str(src))
        (events.filter(F.col("event_id") % 10 == 0)
         .coalesce(1).write.mode("append").parquet(str(src)))

    deduped = (spark.readStream
               .schema("event_id long, user_id long, event_type string")
               .option("maxFilesPerTrigger", 1).parquet(str(src))
               .dropDuplicates(["event_id"]))

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out)

    _run_available_now(
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(out)


def streaming_dedup_watermarked_job(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """`dropDuplicatesWithinWatermark` — the state-BOUNDED streaming dedup
    (Spark 3.5+) that plain `dropDuplicates` (streaming_dedup_job) is not:
    each key's dedup state expires once the watermark passes its event
    time + delay, so state size is bounded by delay x arrival rate instead
    of growing with every key ever seen — the only dedup that survives an
    unbounded 100-TB replay (reference replays: auto.offset.reset=smallest,
    StreamingApp.scala:309). The staged backlog replays in event-time
    order with every 10th event of each file RE-DELIVERED between that
    file and the next (same event time — a redelivered chunk lands within
    the watermark delay): the dedup state swallows replays still inside
    the delay and the watermark drops the rest as late, so the drained
    sink equals the batch projection exactly (duplicates never re-emit
    either way — that totality is the exactly-once claim)."""
    import os

    out, ckpt = _fresh("streaming_dedup_wm")
    src = Path(_stage_ts_ordered(spark, sf_dir, "dedupwm",
                                 ["user_id", "event_type"]))
    if sum(1 for _ in src.glob("*.dup")) != N_STREAM_FILES - 1:
        for p in src.glob("*.dup"):
            p.unlink()
        files = sorted(src.glob("*.parquet"))
        for i, f in enumerate(files[:-1]):
            dup = (spark.read.parquet(str(f))
                   .filter(F.col("event_id") % 10 == 0))
            tmp = SCRATCH / "dedupwm_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            dup.coalesce(1).write.parquet(str(tmp))
            dest = src / f"{i:02d}r.dup"
            shutil.move(str(next(Path(tmp).glob("part-*.parquet"))), dest)
            # mtime between file i and file i+1: replay arrives next batch
            os.utime(dest, (1_700_000_000 + i * 10 + 5,) * 2)
            shutil.rmtree(tmp, ignore_errors=True)

    deduped = (spark.readStream
               .schema("event_id long, ts timestamp, user_id long, "
                       "event_type string")
               .option("maxFilesPerTrigger", 1).parquet(str(src))
               .withWatermark("ts", "30 minutes")
               .dropDuplicatesWithinWatermark(["event_id"]))

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out)

    _run_available_now(
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(out).select("event_id", "user_id",
                                          "event_type")


DEDUP_WM_ORACLE = """
SELECT event_id, user_id, event_type FROM events
"""


def stream_static_join_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: every micro-batch joins the event stream
    against a STATIC dimension (customer) — the standard lookup-join
    pattern for enriching a firehose with slowly-changing reference data
    (the reference's per-record `selectHW`/case-config lookups,
    StreamingApp.scala:341-353, done set-at-a-time instead of
    row-at-a-time JDBC). The static side is stateless for the stream
    (re-resolved per micro-batch, so a refreshed dim table picks up
    automatically) and broadcast by size — no stream-side shuffle, no
    watermark, no state store. Drained result equals the batch join."""
    out, ckpt = _fresh("stream_static_join")
    dim = (load_table(spark, sf_dir, "customer")
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    enriched = (events_stream(spark, sf_dir)
                .select("event_id", "user_id", "event_type")
                .join(dim, "user_id"))

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out)

    _run_available_now(
        enriched.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt))
    return spark.read.parquet(out)


def streaming_cdc_upsert_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: every micro-batch MERGES into a keep-latest
    state table — the stream twin of the batch `cdc_compact_latest`
    (there, one window over the full log; here, the same final state
    reached incrementally, version = event_id so the outcome is
    independent of how the backlog splits into batches). State lives in
    the engine's ACID table (acid.AcidTable): every micro-batch is ONE
    atomic merge_keep_latest commit — readers always see a committed
    snapshot, a crashed batch leaves only an unreferenced data dir, and
    a replayed batch re-merges idempotently (keep-max-version), which is
    exactly the foreachBatch at-least-once contract. The drained state
    equals the batch compaction exactly."""
    from ..acid import AcidTable
    out, ckpt = _fresh("streaming_cdc_upsert")
    schema = "event_id long, user_id long, event_type string, value double"
    table = AcidTable.create(spark, Path(out) / "state",
                             spark.createDataFrame([], schema))

    def sink(batch: DataFrame, batch_id: int) -> None:
        table.merge_keep_latest(batch, key=["user_id", "event_type"],
                                version_col="event_id")

    stream = (events_stream(spark, sf_dir)
              .select("event_id", "user_id", "event_type", "value"))
    _run_available_now(
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt))
    return (table.read()
            .select("event_id", "user_id", "event_type",
                    F.round("value", 6).alias("value")))


def poll_wait_loop_job(spark: SparkSession, sf_dir: str,
                       n_polls: int = 5) -> DataFrame:
    """poll_wait_loop: the worker's claim-poll loop (FileWorkerApp.scala:
    153-160,207-227) — n sequential polls, each claiming the lowest
    available file, each seeing the previous poll's post-state."""
    q = queue_df(load_table(spark, sf_dir, "orders")).select("file_id", "status")
    claimed: list[tuple[int, int]] = []
    for i in range(n_polls):
        cid = (q.filter(F.col("status") == 0)
               .agg(F.min("file_id")).first()[0])
        if cid is None:
            break  # queue empty → the reference sleeps; bounded run stops
        claimed.append((i + 1, cid))
        q = q.select(
            "file_id",
            F.when(F.col("file_id") == cid, 1)
             .otherwise(F.col("status")).alias("status")).cache()
    return spark.createDataFrame(claimed, "iter int, file_id long")


def _stage_with_flush(spark: SparkSession, sf_dir: str, name: str,
                      cols: list) -> str:
    """Event-time-ordered backlog PLUS two trailing watermark-flush
    sentinel files (event_type='flush', ts far past the data). Outer-join
    null emission is watermark-DRIVEN: unmatched state rows only emit
    once the watermark provably rules out future matches, and a drained
    backlog alone leaves the watermark 10 min short of its own tail. The
    sentinels push the watermark past every possible match window; TWO of
    them because the advance registers at end-of-batch N and the state
    eviction that emits the nulls runs inside batch N+1. Sentinel files
    are named *.flush so _stage_ts_ordered's *.parquet reuse-count still
    sees exactly N_STREAM_FILES (the source lists every non-hidden file
    regardless of extension)."""
    import os

    src = Path(_stage_ts_ordered(spark, sf_dir, name, cols))
    if sum(1 for _ in src.glob("*.flush")) == 2:
        return str(src)
    max_ts = (load_table(spark, sf_dir, "events")
              .agg(F.max(F.col("ts").cast("timestamp"))).first()[0])
    for i in range(2):
        row = spark.createDataFrame(
            [(-(i + 1), max_ts, -1, "flush")],
            "event_id long, ts timestamp, user_id long, event_type string"
        ).select("event_id",
                 (F.col("ts") + F.expr(f"INTERVAL {2 + i} DAYS")).alias("ts"),
                 "user_id", "event_type")
        tmp = SCRATCH / f"{name}_flush_tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        row.coalesce(1).write.parquet(str(tmp))
        dest = src / f"zz{i}.flush"
        shutil.move(str(next(Path(tmp).glob("part-*.parquet"))), dest)
        os.utime(dest, (1_700_001_000 + i * 10, 1_700_001_000 + i * 10))
        shutil.rmtree(tmp, ignore_errors=True)
    return str(src)


def stream_stream_left_outer_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click joined to the
    same user's errors from the preceding hour; clicks with NO such error
    still emit (null error side) — but only once the watermark passes the
    click's match window, because until then a matching error could still
    arrive. That eviction-driven null emission is the semantics inner
    joins never exercise, and the part that makes outer stream joins
    hard: state is held exactly until provably unmatchable, so state
    size is bounded by watermark delay + interval, not by the stream.

    The flush sentinels must reach the WATERMARK NODE: a plain
    `event_type = kind` filter gets pushed by Catalyst below the
    watermark operator into the parquet scan (filter pushdown commutes
    with watermarks), which silently eliminates the sentinels at the
    source — the watermark then stops 10 min short and the max-ts click
    never evicts (observed: exactly one null row missing). So each side
    keeps `kind OR 'flush'`: sentinel rows flow through the watermark
    and into the join with user_id -1 (join-neutral — the two sentinels
    are a day apart, outside each other's interval), and the `c_id >= 0`
    filter that drops their own unmatched-left emissions runs on the
    DRAINED sink, outside the streaming plan — inside it, Catalyst would
    push that null-intolerant left-side predicate down the same way.
    Drained output must equal the batch left join exactly (the oracle)."""
    src = _stage_with_flush(spark, sf_dir, "ssloj", ["user_id", "event_type"])
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def side(kind: str, prefix: str) -> DataFrame:
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .select(F.col("event_id").alias(f"{prefix}_id"),
                        F.col("user_id").alias(f"{prefix}_user"),
                        F.col("ts").alias(f"{prefix}_ts"),
                        F.col("event_type").alias(f"{prefix}_type"))
                .withWatermark(f"{prefix}_ts", "10 minutes")
                .filter(F.col(f"{prefix}_type").isin(kind, "flush"))
                .drop(f"{prefix}_type"))

    clicks, errors = side("click", "c"), side("error", "e")
    joined = clicks.join(
        errors,
        F.expr("c_user = e_user AND "
               "e_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
        "leftOuter")
    qname = f"ssloj_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        joined.writeStream.outputMode("append").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT c_id AS click_id, e_id AS error_id, c_user AS user_id,
               unix_micros(c_ts) - unix_micros(e_ts) AS lag_us
        FROM {qname} WHERE c_id >= 0""")


def transform_with_state_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's transformWithState API (the typed successor to
    applyInPandasWithState — explicit named state variables on a
    StatefulProcessor instead of one opaque GroupState): per-user
    running totals over the replayed backlog. Each micro-batch updates a
    ValueState and APPENDS a snapshot row tagged with an update
    generation; the post-drain keep-latest picks each user's final
    snapshot, which must equal the batch GROUP BY exactly.

    Money math never touches Python floats: `value` is cast
    double→decimal(18,6)→int micro-units JVM-SIDE before the processor,
    so the pandas state sums int64 and the oracle's decimal sum matches
    bit-for-bit regardless of summation order."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    src = stage_stream_files(spark, sf_dir)
    schema = ("event_id long, user_id long, event_type string, "
              "value double, props string")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .select("user_id",
                      (F.col("value").cast("decimal(18,6)") * 1_000_000)
                      .cast("bigint").alias("v6")))

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState(
                "tot", "cnt long, sv6 long, upd long")

        def handleInputRows(self, key, rows, timer_values):
            cnt, sv6, upd = (self._tot.get() if self._tot.exists()
                             else (0, 0, 0))
            for pdf in rows:
                cnt += len(pdf)
                sv6 += int(pdf["v6"].sum())
            upd += 1
            self._tot.update((cnt, sv6, upd))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt],
                                "sum_v6": [sv6], "upd": [upd]})

        def close(self) -> None:
            pass

    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType="user_id long, n_events long, sum_v6 long, upd long",
        outputMode="append", timeMode="none")
    qname = f"tws_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        out.writeStream.outputMode("append").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT user_id, n_events, sum_v6,
               round(sum_v6 / 1e6, 6) AS sum_value
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY upd DESC) AS rk
              FROM {qname})
        WHERE rk = 1""")


def streaming_ivm_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental view maintenance: each micro-batch reduces to
    mergeable per-user partials (count + DECIMAL sum over the DELTA only)
    and lands as ONE atomic `AcidTable.merge_add` commit — the streaming
    twin of the batch `incremental_agg`, and the additive counterpart of
    `streaming_cdc_upsert` (keep-latest there, merge-add here). A crashed
    batch leaves only an unreferenced data dir; a replayed batch would
    double-add, which is why the real exactly-once contract pairs this
    sink with the batch-id fencing shown in `exactly_once_sink` — here
    the drained availableNow run applies each batch once and the final
    state must equal the full-log aggregate exactly (the oracle)."""
    from ..acid import AcidTable
    out, ckpt = _fresh("streaming_ivm")
    schema = "user_id long, n_events long, total decimal(28,2)"
    table = AcidTable.create(spark, Path(out) / "state",
                             spark.createDataFrame([], schema))

    def sink(batch: DataFrame, batch_id: int) -> None:
        partial = (batch.groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        F.sum(F.col("value").cast("decimal(28,2)"))
                         .alias("total")))
        table.merge_add(partial, key=["user_id"])

    stream = (events_stream(spark, sf_dir)
              .select("user_id", "value"))
    _run_available_now(
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt))
    return table.read().select(
        "user_id", "n_events", F.col("total").cast("double").alias("total"))


def stream_stream_full_outer_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — completes the outer-join
    matrix (inner: stream_stream_join, left: stream_stream_left_outer):
    unmatched CLICKS *and* unmatched ERRORS both emit null-padded rows,
    each only when the watermark proves its match window closed. Both
    eviction directions run in one query, which doubles the
    watermark-correctness surface: the same flush-sentinel discipline as
    the left join (sentinels must survive filter pushdown to reach BOTH
    watermark nodes; their own emissions are dropped on the drained sink
    via the sentinel user -1, never inside the streaming plan where the
    null-intolerant predicate would be pushed below the join). Drained
    output must equal the batch FULL OUTER join exactly (the oracle)."""
    src = _stage_with_flush(spark, sf_dir, "ssfoj", ["user_id", "event_type"])
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def side(kind: str, prefix: str) -> DataFrame:
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .select(F.col("event_id").alias(f"{prefix}_id"),
                        F.col("user_id").alias(f"{prefix}_user"),
                        F.col("ts").alias(f"{prefix}_ts"),
                        F.col("event_type").alias(f"{prefix}_type"))
                .withWatermark(f"{prefix}_ts", "10 minutes")
                .filter(F.col(f"{prefix}_type").isin(kind, "flush"))
                .drop(f"{prefix}_type"))

    clicks, errors = side("click", "c"), side("error", "e")
    joined = clicks.join(
        errors,
        F.expr("c_user = e_user AND "
               "e_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
        "fullOuter")
    qname = f"ssfoj_{uuid.uuid4().hex[:8]}"
    _run_available_now(
        joined.writeStream.outputMode("append").format("memory").queryName(qname))
    return spark.sql(f"""
        SELECT c_id AS click_id, e_id AS error_id,
               coalesce(c_user, e_user) AS user_id,
               unix_micros(c_ts) - unix_micros(e_ts) AS lag_us
        FROM {qname} WHERE coalesce(c_user, e_user) >= 0""")


def _ss_outer_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE staged full-outer interval-join drain shared by the left- and
    full-outer serving keys. The full-outer stream's drained output is a
    superset that contains the left join EXACTLY (left = full_outer
    WHERE the click side is present): matched rows are identical, and
    unmatched-click null-emissions fire under the same watermark
    eviction in both join types — so a second streaming run for the
    left key re-paid ~6s of micro-batch machinery (the per-batch cost
    floor; state-partition count is immaterial, measured) to recompute
    a filter of rows the full-outer drain already holds. Memoized per
    (session, corpus): the trio of streaming bench keys now stages and
    drains this stream once.  The dedicated leftOuter streaming plan
    (`stream_stream_left_outer_job`) remains the genuine code path and
    is exercised against the batch oracle in tests/test_streaming.py."""
    from ..operators.dedup import _memo, _materialize

    def build() -> DataFrame:
        src = _stage_with_flush(spark, sf_dir, "ssoj",
                                ["user_id", "event_type"])
        schema = "event_id long, ts timestamp, user_id long, event_type string"

        # maxFilesPerTrigger=3 folds the 6-file backlog to THREE
        # micro-batches — [d0..d2], [d3, flush0], [flush1] — instead of
        # six: the staged files are strict event-time order (no row is
        # ever late), so batching data files costs nothing, while the
        # two flush sentinels still land in two SEPARATE trailing
        # batches (the watermark advance registers at end-of-batch N and
        # the eviction that emits the nulls runs in batch N+1 — flush0's
        # batch pushes the watermark past every data window, flush1's
        # batch performs the final eviction). Cuts the per-micro-batch
        # machinery floor (~0.6s/batch) in half; the dedicated
        # per-file-batch jobs keep maxFilesPerTrigger=1 and the coupling
        # test pins output equality between the two paths.
        def side(kind: str, prefix: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 3).parquet(src)
                    .select(F.col("event_id").alias(f"{prefix}_id"),
                            F.col("user_id").alias(f"{prefix}_user"),
                            F.col("ts").alias(f"{prefix}_ts"),
                            F.col("event_type").alias(f"{prefix}_type"))
                    .withWatermark(f"{prefix}_ts", "10 minutes")
                    .filter(F.col(f"{prefix}_type").isin(kind, "flush"))
                    .drop(f"{prefix}_type"))

        joined = side("click", "c").join(
            side("error", "e"),
            F.expr("c_user = e_user AND "
                   "e_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
            "fullOuter")
        qname = f"ssoj_{uuid.uuid4().hex[:8]}"
        _run_available_now(
            joined.writeStream.outputMode("append")
            .format("memory").queryName(qname))
        return _materialize(spark.table(qname))

    corpus = load_table(spark, sf_dir, "events")
    return _memo(corpus, "ss_outer_drained", build)


def stream_stream_left_outer_shared(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """stream_stream_left_outer served from the shared full-outer drain
    (see `_ss_outer_drained`): keep rows whose click side is present
    (`c_id >= 0` also drops the flush sentinels, c_id < 0) — exactly the
    rows the dedicated leftOuter stream emits, per its unchanged batch
    oracle."""
    d = _ss_outer_drained(spark, sf_dir)
    return (d.filter(F.col("c_id") >= 0)
            .select(F.col("c_id").alias("click_id"),
                    F.col("e_id").alias("error_id"),
                    F.col("c_user").alias("user_id"),
                    (F.unix_micros("c_ts")
                     - F.unix_micros("e_ts")).alias("lag_us")))


def stream_stream_full_outer_shared(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """stream_stream_full_outer served from the shared drain: both
    eviction directions, sentinels (user -1) dropped post-drain."""
    d = _ss_outer_drained(spark, sf_dir)
    return (d.filter(F.coalesce("c_user", "e_user") >= 0)
            .select(F.col("c_id").alias("click_id"),
                    F.col("e_id").alias("error_id"),
                    F.coalesce("c_user", "e_user").alias("user_id"),
                    (F.unix_micros("c_ts")
                     - F.unix_micros("e_ts")).alias("lag_us")))


def streaming_observe_job(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability: `df.observe` metrics attached INSIDE a
    streaming plan, harvested per micro-batch through a
    StreamingQueryListener — the production pattern for per-batch row
    counts / control sums without a second pass over the stream (the
    reference prints per-batch counts from a separate count() action,
    StreamingApp.scala:557-560). Each batch's observed (n, decimal sum)
    lands in its QueryProgress event; the totals across the drained
    backlog must equal the batch aggregate (the oracle), proving the
    metrics saw every row exactly once. Per-batch metric rows also
    carry the batch count, pinning that the stream really ran
    multi-batch."""
    import json as _json
    import threading

    from pyspark.sql.streaming import StreamingQueryListener

    got: dict[int, tuple[int, str]] = {}
    done = threading.Event()

    class Harvest(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            om = e.progress.observedMetrics
            if "ev" in om:
                row = om["ev"]
                if row["n"] is not None:
                    got[e.progress.batchId] = (row["n"], str(row["s6"]))

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            done.set()

    listener = Harvest()
    spark.streams.addListener(listener)
    try:
        observed = (events_stream(spark, sf_dir)
                    .observe("ev",
                             F.count(F.lit(1)).alias("n"),
                             F.sum(F.col("value").cast("decimal(18,6)"))
                             .alias("s6")))
        _run_available_now(
            observed.writeStream.outputMode("append").format("noop"))
        done.wait(60)
    finally:
        spark.streams.removeListener(listener)
    n_batches = len(got)
    total_n = sum(n for n, _ in got.values())
    total_s = sum(Decimal(s) for _, s in got.values())
    return spark.createDataFrame(
        [(n_batches, total_n, float(round(total_s, 6)))],
        "n_batches int, n_rows long, sum_value double")


STREAMING_OBSERVE_ORACLE = """
SELECT 4 AS n_batches, COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
"""
