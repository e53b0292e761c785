"""The high-water-mark computation — the reference's raison d'être.

Reference: PL/pgSQL UDTF ``get_highwater_mark()`` (StreamingApp.scala:223-256,
variant DatabasePrepare.scala:107-139), invoked once per micro-batch through a
``repartition(1)`` choke point (StreamingApp.scala:395,405-406). It:

1. loads the current HW row,
2. requires the ``$MFT`` extent to be fully received
   (``max(byte_start+byte_len)`` 2-way join, :237),
3. walks ``row_number() over (order by sequence)`` of the chunk table and
   accumulates ``hw += size`` while ``row_num == sequence+1`` — i.e. the byte
   length of the longest gap-free chunk prefix (:238-246),
4. advances the stored HW monotonically (:247-252),
5. returns the *delta*: files whose max extent lands in ``[old_hw, new_hw)``
   via 3-way join + GROUP BY/HAVING (:253).

Spark-first re-expression, two forms:

* single-case (`contiguous_prefix_hw`): NO global window at all. The first
  gap of a 0-based sequence set S is ``min({0} ∪ {s+1 : s ∈ S}) \\ S`` — one
  keyed left-anti self-join + two aggregations, every shuffle hash-keyed, no
  "move all data to a single partition" stage. This deliberately beats the
  reference's own ``repartition(1)`` choke (StreamingApp.scala:395).
* multi-case (`highwater_per_key`): window functions PARTITIONED by case key
  — one modest sorted partition per disk image, all images in parallel; this
  is the form a 1000-executor cluster runs.

Sums are done in DECIMAL so results are exact and engine-independent, then
cast back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Drop sequence numbers ≡ GAP_DROP-1 (mod GAP_DROP) to synthesize missing
#: chunks in the fixture stream, so the contiguous prefix genuinely stops.
GAP_DROP = 97


def chunk_table(events: DataFrame) -> DataFrame:
    """events → the `tsk_image_sizes` analog (obj_id, name, sequence, size).

    Reference DDL at StreamingApp.scala:149: (obj_id, name, sequence, size);
    sequence parsed from the filename extension (StreamingDiskUtil.scala:31).
    """
    return events.select(
        F.col("event_id").alias("sequence"),
        F.concat(F.lit("chunk."), F.col("event_id")).alias("name"),
        F.col("value").alias("size"),
    )


def contiguous_prefix_hw(chunks: DataFrame,
                         seq: str = "sequence",
                         size: str = "size") -> DataFrame:
    """Single-row DataFrame: (hw_bytes, last_seq, n_chunks) — the longest
    gap-free 0-based prefix of `chunks` by `seq`.

    Set-oriented form of reference StreamingApp.scala:238-246: the first
    missing sequence g = min(({0} ∪ {s+1 | s ∈ S}) − S); the HW is the size
    sum over seq < g. One anti-join + two aggregations — no global-order
    window, so the plan has no single-partition stage at any scale.
    """
    arrived = chunks.select(
        F.col(seq).cast("long").alias("_seq"),
        F.col(size).cast("decimal(18,4)").alias("_sz"),
    )
    cand = arrived.select((F.col("_seq") + 1).alias("_cand")).unionByName(
        arrived.select(F.lit(0).cast("long").alias("_cand")).limit(1))
    first_gap = (
        cand.join(arrived.select(F.col("_seq").alias("_cand")), "_cand", "left_anti")
        .agg(F.min("_cand").alias("_first_gap"))
    )
    return (
        arrived.crossJoin(F.broadcast(first_gap))  # 1-row gap dim
        .filter(F.col("_seq") < F.col("_first_gap"))
        .agg(
            F.sum("_sz").cast("double").alias("hw_bytes"),
            F.max("_seq").alias("last_seq"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )


def hw_scalar_sql(src: str = "events", gap_drop: int = GAP_DROP) -> str:
    """DuckDB twin of chunk_table → contiguous_prefix_hw over `events`."""
    return f"""
arrived AS (SELECT event_id AS seq, CAST(value AS DECIMAL(18,4)) AS sz
            FROM {src} WHERE event_id % {gap_drop} != {gap_drop - 1}),
g AS (SELECT min(c) AS first_gap FROM (
        SELECT seq + 1 AS c FROM arrived UNION ALL SELECT 0) cands
      WHERE c NOT IN (SELECT seq FROM arrived)),
hw AS (SELECT CAST(sum(sz) AS DOUBLE) AS hw_bytes, max(seq) AS last_seq,
              count(*) AS n_chunks
       FROM arrived, g WHERE seq < first_gap)"""


def highwater_per_key(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Multi-case HW: one watermark per `key` — the horizontally-scalable
    form of the reference's single-case state (it runs one Spark app per
    case/topic, StreamingApp.scala:274-277; we run all cases in one job).

    Per key: sequence = 0-based arrival index of event_id; a deterministic
    subset (seq % 13 == 12) is "missing"; HW = decimal cumsum of `value`
    over the gap-free prefix.
    """
    w_all = Window.partitionBy(key).orderBy("event_id")
    seqd = events.select(
        key, "event_id", F.col("value").cast("decimal(18,4)").alias("_sz")
    ).withColumn("_seq", F.row_number().over(w_all) - 1)
    arrived = seqd.filter(F.col("_seq") % 13 != 12)
    w_arr = Window.partitionBy(key).orderBy("_seq")
    w_run = w_arr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        arrived
        .withColumn("_rn", F.row_number().over(w_arr))
        .withColumn("_gap", (F.col("_seq") != F.col("_rn") - 1).cast("int"))
        .withColumn("_bad", F.max("_gap").over(w_run))
        .withColumn("_cum", F.sum("_sz").over(w_run))
    )
    return (
        flagged.filter(F.col("_bad") == 0)
        .groupBy(key)
        .agg(
            F.max("_cum").cast("double").alias("hw_bytes"),
            F.max("_seq").alias("last_seq"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
    )


def update_hw_monotonic(events: DataFrame,
                        prev_cutoff: int = 50) -> DataFrame:
    """Monotonic high-water advance + log row (StreamingApp.scala:247-252;
    `highwatermark(previous, current, current_seq, status)` DDL :218):
    recompute the HW, advance the stored row only if the new HW is greater.

    Batch-checkable twin: the "stored" HW is the watermark of the first
    `prev_cutoff` sequences (the previous batch's arrivals; 50 < the
    first planted gap at 96, so the full recompute genuinely advances); `current` =
    greatest(stored, computed). Output is the post-update highwatermark row
    — (previous, current, current_seq, advanced).
    """
    stored = contiguous_prefix_hw(chunk_table(
        events.filter((F.col("event_id") % GAP_DROP != GAP_DROP - 1)
                      & (F.col("event_id") < prev_cutoff)))) \
        .select(F.col("hw_bytes").alias("stored_hw"),
                F.col("last_seq").alias("stored_seq"))
    computed = contiguous_prefix_hw(chunk_table(
        events.filter(F.col("event_id") % GAP_DROP != GAP_DROP - 1))) \
        .select(F.col("hw_bytes").alias("new_hw"),
                F.col("last_seq").alias("new_seq"))
    adv = F.col("new_hw") > F.col("stored_hw")
    return (stored.crossJoin(computed)  # two 1-row states
            .select(
                F.col("stored_hw").alias("previous"),
                F.when(adv, F.col("new_hw")).otherwise(F.col("stored_hw"))
                 .alias("current"),
                F.when(adv, F.col("new_seq")).otherwise(F.col("stored_seq"))
                 .alias("current_seq"),
                adv.cast("int").alias("advanced"),
            ))


def hw_monotonic_oracle_sql(prev_cutoff: int = 50,
                            gap_drop: int = GAP_DROP) -> str:
    return f"""
WITH prev_arr AS (SELECT event_id AS seq, CAST(value AS DECIMAL(18,4)) AS sz
                  FROM events WHERE event_id % {gap_drop} != {gap_drop - 1}
                    AND event_id < {prev_cutoff}),
prev_g AS (SELECT min(c) AS fg FROM (
             SELECT seq + 1 AS c FROM prev_arr UNION ALL SELECT 0) x
           WHERE c NOT IN (SELECT seq FROM prev_arr)),
prev_hw AS (SELECT CAST(sum(sz) AS DOUBLE) AS stored_hw, max(seq) AS stored_seq
            FROM prev_arr, prev_g WHERE seq < fg),
cur_arr AS (SELECT event_id AS seq, CAST(value AS DECIMAL(18,4)) AS sz
            FROM events WHERE event_id % {gap_drop} != {gap_drop - 1}),
cur_g AS (SELECT min(c) AS fg FROM (
            SELECT seq + 1 AS c FROM cur_arr UNION ALL SELECT 0) x
          WHERE c NOT IN (SELECT seq FROM cur_arr)),
cur_hw AS (SELECT CAST(sum(sz) AS DOUBLE) AS new_hw, max(seq) AS new_seq
           FROM cur_arr, cur_g WHERE seq < fg)
SELECT stored_hw AS previous,
       CASE WHEN new_hw > stored_hw THEN new_hw ELSE stored_hw END AS current,
       CASE WHEN new_hw > stored_hw THEN new_seq ELSE stored_seq END AS current_seq,
       CAST(new_hw > stored_hw AS INT) AS advanced
FROM prev_hw, cur_hw"""


def released_files(extents: DataFrame, hw_before, hw_after,
                   file_key: str = "file_id",
                   extent_end: str = "extent_end") -> DataFrame:
    """Step 5 of the UDTF: file ids whose max extent falls in
    [hw_before, hw_after) — GROUP BY + HAVING band (StreamingApp.scala:253).
    """
    agg = extents.groupBy(file_key).agg(F.max(extent_end).alias("max_extent"))
    return agg.filter((F.col("max_extent") >= hw_before) &
                      (F.col("max_extent") < hw_after))


def hw_release_sql_query(spark, sf_dir: str) -> DataFrame:
    """The flagship in PURE SQL — `spark.sql` over temp views, one CTE
    chain: gap detection (NOT IN anti-join), HW scalar, extent
    aggregation, release band. Reference users write SQL
    (StreamingApp.scala embeds its queries as strings; the PL/pgSQL body
    is itself SQL), so engine parity includes running that dialect
    directly: this text is within a cast of the DuckDB oracle, and
    Catalyst compiles it to the same shape as the DataFrame flagship
    (the NOT IN over the non-null sequence column becomes a plain
    anti-join, the 1-row hw CTE broadcasts). Same oracle as
    hw_release."""
    from ..sources.tables import load_table

    for t in ("events", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(f"""
WITH {hw_scalar_sql()},
extents AS (
  SELECT o_orderkey AS file_id, l_extendedprice + l_quantity AS extent_end
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_linenumber != 3)
SELECT file_id, max(extent_end) AS max_extent, hw_bytes
FROM extents, hw
GROUP BY file_id, hw_bytes
HAVING max(extent_end) >= hw_bytes / 2 AND max(extent_end) < hw_bytes
""")


def hw_release_query(events: DataFrame, orders: DataFrame,
                     lineitem: DataFrame) -> DataFrame:
    """Flagship end-to-end query (SURVEY.md §7 Phase 0): compute the HW from
    the chunk stream, then release the orders whose max line extent lies in
    [hw/2, hw) — sort + window + cumsum + join + group/having in one plan,
    exactly the shape of get_highwater_mark() (StreamingApp.scala:223-256).

    `lineitem` plays tsk_file_layout (extents), `orders` plays tsk_files,
    `l_linenumber = 3` plays dir_type=3 (directories are never released,
    StreamingApp.scala:253).
    """
    hw = contiguous_prefix_hw(chunk_table(
        events.filter(F.col("event_id") % GAP_DROP != GAP_DROP - 1)))
    # Aggregate extents BEFORE touching orders: the join key IS the group
    # key (l_orderkey = o_orderkey), so max(extent) per file is identical
    # on either side of the join — aggregating first shrinks the relation
    # ~4x (map-side partial agg) and the band filter then cuts it to the
    # release delta, which broadcasts into a semi-join against orders
    # (existence check, StreamingApp.scala:253) with no orders shuffle.
    banded = (
        lineitem.filter(F.col("l_linenumber") != 3)
        .groupBy(F.col("l_orderkey").alias("file_id"))
        .agg(F.max(F.col("l_extendedprice") + F.col("l_quantity"))
              .alias("max_extent"))
        .crossJoin(F.broadcast(hw))  # 1-row HW dim → broadcast, no shuffle
        .filter((F.col("max_extent") >= F.col("hw_bytes") / 2) &
                (F.col("max_extent") < F.col("hw_bytes")))
    )
    # Existence check against orders WITHOUT shuffling orders: a
    # left-semi keeping `banded` would have to BUILD from orders (Spark
    # cannot broadcast the left/stream side of a semi join — the hint
    # is ignored with a HintErrorLogger warning and the full orders
    # table shuffles). Instead stream orders and broadcast the tiny
    # release delta as the BUILD side of an inner join on the key;
    # o_orderkey is the table's primary key (TPC-H: one row per order;
    # reference tsk_files keys by file_id, StreamingApp.scala:253), so
    # the inner join emits each banded row at most once — exactly the
    # semi-join's semantics, as a supported BroadcastHashJoin with zero
    # exchanges on the 100×-scale side.
    released = (orders.select(F.col("o_orderkey").alias("file_id"))
                .join(F.broadcast(banded), "file_id"))
    return released.select("file_id", "max_extent", "hw_bytes")
