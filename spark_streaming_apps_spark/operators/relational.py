"""Small relational operators from SURVEY.md §2.B-§2.F.

Each function here is one §2 key that is a single declarative DataFrame
expression — the point is not the (trivial) logic but that every one is
registered in the driver contract with a DuckDB oracle, and that each keeps
its filter/projection at the parquet scan (predicate pushdown + column
pruning — verified in tests/test_plans.py).

Reference citations per function; fixture role mapping per FIXTURES.md:
`part` plays the `$`-metafile name filters, `orders ⋈ lineitem (⋈ customer)`
plays `tsk_files ⋈ tsk_file_layout (⋈ tsk_fs_info)`, `events` plays the
chunk stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import portable_hash64

N_BUCKETS = 32


def project_value(events: DataFrame) -> DataFrame:
    """Drop-the-key projection — `map(_._2)` (StreamingApp.scala:312)."""
    return events.select("event_id", F.col("props").alias("value"))


def kafka_source_batch(events: DataFrame, n: int = 200) -> DataFrame:
    """Batch analog of the direct Kafka source (StreamingApp.scala:309-312):
    the earliest `n` records of the stream in event-time order, timestamps
    as epoch micros (engine-portable)."""
    return (events
            .orderBy("ts", "event_id")
            .limit(n)
            .select("event_id", "user_id", "event_type",
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")))


def avro_decode(documents: DataFrame) -> DataFrame:
    """Wire-format decode of the 3-field ImageBlock record
    (AvroUtil.scala:24-35; fields filename/localHash/data at
    StreamingApp.scala:84). `from_avro` needs the external spark-avro
    artifact, so the fixture serializes the same struct through JSON —
    identical decode shape (binary value column → typed struct → fields)."""
    wire = documents.select(F.to_json(F.struct(
        F.concat(F.lit("doc."), F.col("doc_id").cast("string")).alias("filename"),
        F.md5("text").alias("local_hash"),
        F.col("n_chars").alias("n_bytes"),
    )).alias("value"))
    schema = "filename string, local_hash string, n_bytes long"
    return wire.select(F.from_json("value", schema).alias("r")).select("r.*")


def filter_neq(lineitem: DataFrame) -> DataFrame:
    """`dir_type != 3` (StreamingApp.scala:190,253) → `l_linenumber != 3`."""
    return (lineitem.filter(F.col("l_linenumber") != 3)
            .select("l_orderkey", "l_linenumber", "l_quantity"))


def filter_not_like(part: DataFrame) -> DataFrame:
    """`name not like '$%'` NTFS-metafile exclusion (StreamingApp.scala:253)
    → part names not starting with 'small'."""
    return (part.filter(~F.col("p_name").like("small%"))
            .select("p_partkey", "p_name"))


def filter_eq_literal(part: DataFrame) -> DataFrame:
    """`name = '$MFT' and parent_path = '/'` (StreamingApp.scala:237)."""
    return (part.filter((F.col("p_name") == "small ring")
                        & (F.col("p_type") == "ECONOMY"))
            .select("p_partkey", "p_name", "p_size"))


def range_band_check(queue: DataFrame) -> DataFrame:
    """Half-open band membership tests — the driver-side 25%/50%/100%
    arrival checkpoints (StreamingApp.scala:424-440):
    `image_size/4 ∈ [hw_before, hw_after)` re-expressed per queue row."""
    q = F.col("hw_after")
    return queue.select(
        "file_id",
        ((q / 4 >= 10_000) & (q / 4 < 20_000)).cast("int").alias("quarter_in_band"),
        ((q / 2 >= 10_000) & (q / 2 < 20_000)).cast("int").alias("half_in_band"),
        (q >= 40_000).cast("int").alias("complete"),
    )


def join_left_anti(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Resident files = rows with no layout extents: `LEFT OUTER JOIN …
    WHERE t2.obj_id IS NULL` (StreamingApp.scala:185-193) → orders with no
    lineitem."""
    return (orders.join(lineitem.select(F.col("l_orderkey").alias("o_orderkey")),
                        "o_orderkey", "left_anti")
            .select("o_orderkey", "o_orderstatus"))


def insert_select_literals(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The `INSERT INTO desh_files … SELECT t1.obj_id, 1, 0, …` projection
    with literal columns over the anti-join (StreamingApp.scala:186-192)."""
    return join_left_anti(orders, lineitem).select(
        F.col("o_orderkey").alias("file_id"),
        F.lit(1).alias("resident"),
        F.lit(0).alias("status"),
        F.lit(0).alias("error_status"),
    )


def join_inner_2way(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """`tsk_files ⋈ tsk_file_layout` on obj_id (StreamingApp.scala:237)."""
    return (lineitem.filter(F.col("l_linenumber") != 3)
            .join(orders, orders.o_orderkey == lineitem.l_orderkey)
            .select("o_orderkey", "l_linenumber", "l_quantity", "o_totalprice"))


def join_inner_3way(orders: DataFrame, lineitem: DataFrame,
                    customer: DataFrame) -> DataFrame:
    """`tsk_file_layout ⋈ tsk_files ⋈ tsk_fs_info` (StreamingApp.scala:253)
    → lineitem ⋈ orders ⋈ customer; the small dim is explicitly broadcast."""
    return (lineitem
            .join(orders, orders.o_orderkey == lineitem.l_orderkey)
            .join(F.broadcast(customer), customer.c_custkey == orders.o_custkey)
            .select("c_custkey", "o_orderkey", "l_linenumber", "l_extendedprice"))


def agg_max_expr(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """`max(byte_start + byte_len)` of the $MFT extents under a 2-way join
    (StreamingApp.scala:237) — the MFT-fully-arrived gate."""
    return (lineitem
            .join(orders.filter(F.col("o_orderstatus") == "O"),
                  orders.o_orderkey == lineitem.l_orderkey)
            .agg(F.max(F.col("l_extendedprice") + F.col("l_quantity"))
                 .alias("max_extent")))


def groupby_having_band(lineitem: DataFrame, lo: float = 30_000.0,
                        hi: float = 60_000.0) -> DataFrame:
    """`GROUP BY obj_id HAVING max(extent_end) >= lo AND < hi` — the
    newly-available-files query (StreamingApp.scala:253)."""
    return (lineitem.groupBy("l_orderkey")
            .agg(F.max(F.col("l_extendedprice") + F.col("l_quantity"))
                 .alias("max_extent"))
            .filter((F.col("max_extent") >= lo) & (F.col("max_extent") < hi)))


def count_rows(lineitem: DataFrame) -> DataFrame:
    """`rdd.count()` / `select count(*)` (StreamingApp.scala:487)."""
    return lineitem.agg(F.count(F.lit(1)).alias("n"))


def partition_counts(lineitem: DataFrame) -> DataFrame:
    """Per-partition processed tally (StreamingApp.scala:348-390). The
    physical `spark_partition_id()` is engine-local, so the checkable form
    tallies the HASH-PARTITIONER bucket each row would land in — the same
    per-partition histogram a keyed exchange produces, but deterministic
    across engines via the portable hash."""
    bucket = F.pmod(portable_hash64(F.col("l_orderkey").cast("string")),
                    F.lit(N_BUCKETS)).cast("int")
    return (lineitem.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows")))


def window_row_number(events: DataFrame) -> DataFrame:
    """`row_number() over (order by sequence)` (StreamingApp.scala:238) —
    partitioned by case key (user_id), the scale-safe form."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "user_id", "event_id",
        F.row_number().over(w).cast("long").alias("rn"))


def sort_asc(events: DataFrame, n: int = 100) -> DataFrame:
    """`order by sequence asc` (StreamingApp.scala:238); bounded top-n so
    the sort is a TakeOrdered, not a global exchange."""
    return (events.orderBy("event_id").limit(n)
            .select("event_id", "user_id", "value"))


def scalar_lookup(events: DataFrame) -> DataFrame:
    """Single-row state lookups — `select current_seq from highwatermark`,
    `select size from tsk_image_info` (FileWorkerApp.scala:145-152,
    StreamingApp.scala:408-422) as one scalar aggregate row."""
    return events.agg(
        F.max("event_id").alias("current_seq"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("image_size"),
        F.count(F.lit(1)).alias("n_chunks"),
    )


def json_props(events: DataFrame) -> DataFrame:
    """Typed extraction from the JSON payload column (`events.props`,
    the §2.K json_props fixture): `get_json_object` + aggregation by the
    extracted value."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (events.select(k.alias("k"))
            .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("k").isNotNull()))


def cdc_compact_latest(events: DataFrame) -> DataFrame:
    """CDC log compaction: keep each key's LATEST record — the
    read-side of every upsert stream (the reference's status machine
    keeps last-write state in PostgreSQL; set-at-a-time this is one
    partitioned row_number window, ties broken by event_id so replays
    compact identically). Key = (user_id, event_type); at 100 TB the
    key is the shuffle partitioning and compaction runs per partition."""
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts_us"), F.desc("event_id")))
    return (events.select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round("value", 6).alias("value"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn"))


CDC_COMPACT_ORACLE = """
SELECT event_id, user_id, event_type, ts_us, value FROM (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         round(value, 6) AS value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


def variant_json_stats(events: DataFrame) -> DataFrame:
    """VARIANT ingestion (Spark 4): parse the JSON payload ONCE into the
    binary-encoded VARIANT type, then typed `variant_get` extraction —
    the modern semi-structured path (get_json_object re-parses the
    string per access; a variant column parses at ingest and serves
    every extraction from the binary encoding, which is the 100 TB
    difference between one parse and N parses per row). Integer sums
    keep the aggregate exact across engines."""
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k")))


VARIANT_ORACLE = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type
"""
