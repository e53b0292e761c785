"""Event-time windowing over the events stream table.

The reference has NO event-time windows — its only "watermark" is the
byte-offset high-water mark (SURVEY.md §2.H note). This module adds the
Spark-native event-time surface a streaming analytics engine is expected to
carry: tumbling and sliding window aggregates (`F.window`) and a
watermark-driven late-data drop (streaming/jobs.py handles the stateful
variant).

Engine parity: window bounds are emitted as epoch microseconds (DuckDB
`time_bucket` + `epoch_us` reproduce them exactly); value sums go through
DECIMAL. Timestamps in the fixture span a contiguous range, so every bucket
is non-empty and boundary behavior ([start, end) half-open on both engines)
is genuinely exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TUMBLE = "1 hour"
SLIDE_WIDTH = "1 hour"
SLIDE_STEP = "30 minutes"


def tumbling_window_agg(events: DataFrame) -> DataFrame:
    """Per-hour tumbling window: count + exact value sum per event_type.
    One shuffle on (window, event_type) with map-side partial aggregation —
    the canonical streaming-aggregate shape, run batch-wise here."""
    w = F.window(F.col("ts").cast("timestamp"), TUMBLE)
    return (events
            .groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("double").alias("total"))
            .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                    "event_type", "n", "total"))


TUMBLING_ORACLE = """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


def sliding_window_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in
    width/step = 2 windows. Spark's F.window(ts, width, step) expands rows
    window-wise before the keyed aggregation — same plan family as
    tumbling, 2x the shuffle rows."""
    w = F.window(F.col("ts").cast("timestamp"), SLIDE_WIDTH, SLIDE_STEP)
    return (events
            .groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros(F.col("w.start")).alias("window_start_us"),
                    F.unix_micros(F.col("w.end")).alias("window_end_us"),
                    "n"))


#: each event belongs to the windows starting at time_bucket(30m, ts) - i*30m
#: for i in {0, 1} — the two half-open hour windows covering it.
SLIDING_ORACLE = """
WITH assigned AS (
  SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)
                  - i * INTERVAL '30 minutes') AS window_start_us
  FROM events, (SELECT unnest([0, 1]) AS i) shifts)
SELECT window_start_us, window_start_us + 3600000000 AS window_end_us,
       COUNT(*) AS n
FROM assigned GROUP BY 1
"""

SESSION_GAP = "6 hours"


def session_window_agg(events: DataFrame) -> DataFrame:
    """Per-user session windows: a session breaks after a {SESSION_GAP}
    silence (`F.session_window`). The gap-merge runs inside the keyed
    aggregation — state per (user, open session), the streaming-safe shape."""
    w = F.session_window(F.col("ts").cast("timestamp"), SESSION_GAP)
    return (events
            .groupBy("user_id", w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id",
                    F.unix_micros(F.col("w.start")).alias("session_start_us"),
                    "n"))


#: classic gaps-and-islands: a new session starts where the lag-gap reaches
#: the threshold. `>=`, not `>`: Spark's session window is half-open
#: [ts, ts+gap), so an event landing exactly at prev_ts + gap is OUTSIDE the
#: previous session and must start a new one.
SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1
              ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
g AS (SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
SELECT user_id, epoch_us(min(ts)) AS session_start_us, COUNT(*) AS n
FROM g GROUP BY user_id, sid
"""


# ----------------------------------------------------- continuous-aggregate

def hypertable_rollup(events: DataFrame) -> DataFrame:
    """Two-grain continuous-aggregate rollup (the hypertable pattern):
    daily per-type stats derived FROM the hourly partials, never from the
    raw events — count/sum re-aggregate exactly, max folds over hourly
    maxes. At 100 TB the hourly layer is the materialized one (see
    `incremental_agg` / `AcidTable.merge_add` for its maintenance); every
    coarser grain is a cheap keyed aggregation over partials that are
    ~1/3600th of the raw rows. Sums ride DECIMAL so the two-step
    re-aggregation is bit-identical to a one-shot daily aggregate, which
    is exactly what the oracle computes — proving the rollup lattice
    collapses losslessly.
    """
    hourly = (events
              .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp"))
                       .alias("h"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
                   F.max("value").alias("mx")))
    return (hourly
            .groupBy(F.date_trunc("day", F.col("h")).alias("d"), "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("total").cast("double").alias("total"),
                 F.max("mx").alias("mx"))
            .select(F.unix_micros(F.col("d")).alias("day_start_us"),
                    "event_type", "n", "total", "mx"))


HYPERTABLE_ORACLE = """
SELECT epoch_us(time_bucket(INTERVAL '1 day', ts)) AS day_start_us,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
       MAX(value) AS mx
FROM events GROUP BY 1, 2
"""
