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

Spark-first re-expression: the imperative cursor loop becomes a pure window
composition — ``gap = (sequence != row_number-1)``; ``bad = max(gap)`` over an
unbounded-preceding frame; keep ``bad=0`` rows; ``hw = max(cumsum(size))``.
No UDF, no driver loop, whole-stage codegen end to end.

Scale note (100 TB): a single global ``ORDER BY sequence`` window is the
reference's own serialization point (repartition(1)). We keep it ONLY for the
single-case batch analog; the multi-case form (`highwater_per_key`) partitions
the window by case key, which is how the real cluster runs — one modest-sized
sorted partition per disk image, all images in parallel. Sums are done in
DECIMAL so results are exact and engine-independent, then cast back to DOUBLE.
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
    """Single-row DataFrame: (hw_bytes, last_seq, last_name?, n_chunks) — the
    longest gap-free prefix of `chunks` ordered by `seq`, 0-based.

    Pure window composition of reference StreamingApp.scala:238-246.
    """
    w = Window.orderBy(seq).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized = chunks.withColumn("_sz", F.col(size).cast("decimal(18,4)"))
    rn = F.row_number().over(Window.orderBy(seq))
    flagged = (
        sized
        .withColumn("_rn", rn)
        .withColumn("_gap", (F.col(seq) != F.col("_rn") - 1).cast("int"))
        .withColumn("_bad", F.max("_gap").over(w))
        .withColumn("_cum", F.sum("_sz").over(w))
    )
    kept = flagged.filter(F.col("_bad") == 0)
    return kept.agg(
        F.max("_cum").cast("double").alias("hw_bytes"),
        F.max(seq).alias("last_seq"),
        F.count(F.lit(1)).alias("n_chunks"),
    )


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


def released_files(extents: DataFrame, hw_before, hw_after,
                   file_key: str = "file_id",
                   extent_end: str = "extent_end") -> DataFrame:
    """Step 5 of the UDTF: file ids whose max extent falls in
    [hw_before, hw_after) — GROUP BY + HAVING band (StreamingApp.scala:253).
    """
    agg = extents.groupBy(file_key).agg(F.max(extent_end).alias("max_extent"))
    return agg.filter((F.col("max_extent") >= hw_before) &
                      (F.col("max_extent") < hw_after))


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
    extents = (
        lineitem.filter(F.col("l_linenumber") != 3)
        .join(orders, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_orderkey").alias("file_id"),
            (F.col("l_extendedprice") + F.col("l_quantity")).alias("extent_end"),
        )
    )
    banded = (
        extents.crossJoin(F.broadcast(hw))  # 1-row HW dim → broadcast, no shuffle
        .groupBy("file_id", "hw_bytes")
        .agg(F.max("extent_end").alias("max_extent"))
        .filter((F.col("max_extent") >= F.col("hw_bytes") / 2) &
                (F.col("max_extent") < F.col("hw_bytes")))
    )
    return banded.select("file_id", "max_extent", "hw_bytes")
