"""Extension-mechanism surface (SURVEY.md §2.J) + data-layout management.

The reference's two extension points are the Autopsy `IngestModule` Java
interface (scalar, row-at-a-time — PipelineStreamProcessor.scala:140-143)
and the PL/pgSQL set-returning function `get_highwater_mark()`
(StreamingApp.scala:223-256). Their PySpark-native equivalents, each
demonstrated here with exact oracle parity:

* scalar module      → Arrow-vectorized ``@pandas_udf``
* set-returning UDTF → Python UDTF (``@udtf``, Spark 3.5+) under a lateral
  join
* grouped rebuild    → ``applyInPandas`` grouped-map (the TSK file-rebuild
  shape, PipelineStreamProcessor.scala:117)

Plus `compact_range_write`: range-partitioned compaction, the Spark-native
replacement for the reference's B-tree indexes (StreamingApp.scala:152-155)
— sorted, non-overlapping parquet files give min/max data skipping on the
key (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf, udtf

N_RANGE_FILES = 8


def _md5_hex_udf():
    """Arrow-vectorized scalar module: the hash module of the worker
    pipeline (ClusterHashDbIngestModule, FileWorkerApp.scala:127-131) as a
    pandas UDF — batch-at-a-time Python, bit-identical to F.md5. Built
    lazily: the decorator parses its return type via the active session."""
    @pandas_udf("string")
    def md5_hex(s: pd.Series) -> pd.Series:
        return s.map(lambda x: hashlib.md5(x.encode("utf-8")).hexdigest())
    return md5_hex


def pandas_udf_module(documents: DataFrame) -> DataFrame:
    """Run the vectorized scalar module over the corpus. The JVM expr
    (F.md5) is the production path; this key proves the pandas-UDF seam
    produces identical bytes, so real Python-only modules can plug in."""
    md5_hex = _md5_hex_udf()
    return documents.select(
        "doc_id",
        md5_hex("text").alias("content_md5"),
        F.md5("text").alias("builtin_md5"),
    ).withColumn("agree", (F.col("content_md5") == F.col("builtin_md5")).cast("int"))


PANDAS_UDF_ORACLE = """
SELECT doc_id, md5(text) AS content_md5, md5(text) AS builtin_md5, 1 AS agree
FROM documents
"""


@udtf(returnType="band_id int, lo double, hi double")
class ReleaseBands:
    """Set-returning function: the release-band table for a given HW —
    the UDTF shape of get_highwater_mark()'s setof return
    (StreamingApp.scala:223-256). One input row → 3 band rows (the 25%,
    50%, 100% checkpoints of StreamingApp.scala:424-440)."""

    def eval(self, hw: float):
        yield 0, hw / 4.0, hw / 2.0
        yield 1, hw / 2.0, hw * 0.75
        yield 2, hw * 0.75, hw


def udtf_release_bands(spark: SparkSession, events: DataFrame,
                       orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """HW scalar → UDTF band expansion → per-band released-order counts.
    The UDTF runs laterally over the 1-row HW relation; band membership is
    then a broadcast range join against the order extents."""
    from .highwater import GAP_DROP, chunk_table, contiguous_prefix_hw

    spark.udtf.register("release_bands", ReleaseBands)
    hw = contiguous_prefix_hw(chunk_table(
        events.filter(F.col("event_id") % GAP_DROP != GAP_DROP - 1)))
    hw.createOrReplaceTempView("hw_row")
    bands = spark.sql(
        "SELECT b.band_id, b.lo, b.hi FROM hw_row, "
        "LATERAL release_bands(hw_bytes) b")
    extents = (lineitem.join(orders, orders.o_orderkey == lineitem.l_orderkey)
               .groupBy("o_orderkey")
               .agg(F.max(F.col("l_extendedprice") + F.col("l_quantity"))
                    .alias("max_extent")))
    return (extents.join(F.broadcast(bands),
                         (F.col("max_extent") >= F.col("lo"))
                         & (F.col("max_extent") < F.col("hi")))
            .groupBy("band_id", "lo", "hi")
            .agg(F.count(F.lit(1)).alias("n_released")))


def _seam_parts(df: DataFrame) -> int:
    """Task count for a python-seam (grouped-map / cogroup) stage whose
    input is small in BYTES but expensive per GROUP: AQE's byte-based
    coalescing collapses such stages to one task (measured: 150 groups
    serialized at ~10-20ms of Arrow IPC each), so the seam pins its
    parallelism with an explicit keyed repartition — exempt from AQE
    coalescing, and it already satisfies the grouped-map hash
    distribution, so no extra exchange is added."""
    return max(8, df.sparkSession.sparkContext.defaultParallelism // 2)


def applyinpandas_rebuild(events: DataFrame) -> DataFrame:
    """Grouped-map rebuild: per case, reassemble the logical blob from its
    chunks in sequence order inside an Arrow-batched pandas group — the
    applyInPandas form of file_rebuild (TSK JNI reconstruction,
    PipelineStreamProcessor.scala:117). Byte-identical to the expression
    form (worker.file_rebuild) and to the SQL oracle. Parallelism pinned
    per `_seam_parts` (few groups, per-group Arrow cost AQE can't see)."""
    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["event_id"])
        blob = "".join(pdf["event_type"])
        return pd.DataFrame([{
            "user_id": pdf["user_id"].iloc[0],
            "rebuilt_md5": hashlib.md5(blob.encode("utf-8")).hexdigest(),
            "n_chunks": len(pdf),
        }])

    return (events.select("user_id", "event_id", "event_type")
            .repartition(_seam_parts(events), "user_id")
            .groupBy("user_id")
            .applyInPandas(rebuild,
                           "user_id long, rebuilt_md5 string, n_chunks long"))


APPLYINPANDAS_ORACLE = """
SELECT user_id, md5(string_agg(event_type, '' ORDER BY event_id)) AS rebuilt_md5,
       COUNT(*) AS n_chunks
FROM events GROUP BY user_id
"""


def compact_range_write(spark: SparkSession, sf_dir: str,
                        scratch: Path) -> DataFrame:
    """Range-partitioned compaction: sort-by-key layout so every parquet
    file owns a disjoint key range — point/range predicates then prune to
    one file via footer min/max stats (the B-tree replacement; see
    tests/test_plans.py::test_range_layout_skips_files). Output proves the
    layout: {N_RANGE_FILES} files, disjoint [min,max] key ranges, nothing
    lost."""
    from ..sources.tables import load_table

    out = str(scratch / "compact_range")
    li = load_table(spark, sf_dir, "lineitem")
    (li.repartitionByRange(N_RANGE_FILES, "l_orderkey")
       .sortWithinPartitions("l_orderkey")
       .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out).withColumn("f", F.input_file_name())
    per_file = (back.groupBy("f")
                .agg(F.min("l_orderkey").alias("lo"),
                     F.max("l_orderkey").alias("hi"),
                     F.count(F.lit(1)).alias("n")))
    # files are an implementation detail; the checkable facts are the file
    # count, total rows, and that the key ranges do not overlap
    overlaps = (per_file.alias("a").join(
        per_file.alias("b"),
        (F.col("a.f") < F.col("b.f"))
        & (F.col("a.lo") <= F.col("b.hi")) & (F.col("b.lo") <= F.col("a.hi")))
        .count())
    n_files = per_file.count()
    total = back.count()
    return spark.createDataFrame(
        [(int(n_files), int(total), int(overlaps))],
        "n_files int, total_rows int, n_overlapping_ranges int")


COMPACT_ORACLE = f"""
SELECT {N_RANGE_FILES} AS n_files, CAST(COUNT(*) AS INT) AS total_rows,
       0 AS n_overlapping_ranges
FROM lineitem
"""

N_BUCKETS_TBL = 8


def bucketed_join(spark: SparkSession, sf_dir: str,
                  scratch: Path) -> DataFrame:
    """Co-located join via bucketed tables: orders and lineitem are both
    written `bucketBy({N_BUCKETS_TBL}, key)` + sorted, so the join reads
    bucket i against bucket i with NO shuffle exchange on either side
    (asserted in tests/test_plans.py::test_bucketed_join_has_no_exchange).
    At 100 TB this is the difference between re-shuffling 100 TB per join
    and reading co-partitioned files — the Spark-native analog of the
    reference keeping its joins inside indexed PostgreSQL."""
    import shutil

    from ..sources.tables import load_table

    base = scratch / "bucketed"
    shutil.rmtree(base, ignore_errors=True)
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}_bkt")
        (load_table(spark, sf_dir, name)
         .write.bucketBy(N_BUCKETS_TBL, key).sortBy(key)
         .option("path", str(base / name))
         .mode("overwrite").saveAsTable(f"{name}_bkt"))
    o, li = spark.table("orders_bkt"), spark.table("lineitem_bkt")
    return (li.join(o, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("sum_qty")))


BUCKETED_JOIN_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


def merge_upsert(spark: SparkSession, sf_dir: str,
                 scratch: Path) -> DataFrame:
    """MERGE-style upsert into a durable state table — the write-path form
    of the claim/transition projections (reference: transactional UPDATEs,
    FileWorkerApp.scala:207-227). State lives as parquet; an update batch
    (the 5 lowest available file_ids flip to claimed, plus one brand-new
    row) is merged via full-outer join on the key: matched rows take the
    update, unmatched keep the current state, inserts append. The merged
    state is committed through the engine's ACID table (acid.AcidTable):
    version 0 is the loaded queue, the update batch lands as one atomic
    MERGE commit, and the result is the committed snapshot re-read
    through its manifest.

    CONCURRENCY CONTRACT: safe for N independent writers. Each MERGE is
    an optimistic manifest-swap commit — the O_EXCL manifest create
    admits exactly one writer per version, losers re-merge onto the
    winner's snapshot and retry (race-tested: tests/test_acid.py
    ::test_concurrent_writers_lose_nothing). This is the engine's answer
    to the reference's row-lock transaction (FileWorkerApp.scala:
    207-227) at table-format granularity; row granularity remains
    available via queue.try_claim/claim_one_exclusive."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "merge_state_acid"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status", "resident", "error_status")
    t = AcidTable.create(spark, table_dir, state)

    cur = t.read()
    # claims update only `status`; NULL value columns never overwrite
    # (AcidTable.merge coalesces update-first, current as fallback)
    claims = (cur.filter(F.col("status") == 0)
              .orderBy("file_id").limit(5)
              .select("file_id", F.lit(1).alias("status"),
                      F.lit(None).cast("int").alias("resident"),
                      F.lit(None).cast("int").alias("error_status")))
    new_row = spark.createDataFrame(
        [(999_999_999, 0, 0, 0)],
        "file_id long, status int, resident int, error_status int")
    t.merge(claims.unionByName(new_row), key=["file_id"])
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id")))


def merge_upsert_sql(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """The merge_upsert scenario expressed as the user writes it — a SQL
    ``MERGE INTO`` statement (merge_sql.merge_into_sql) — because the
    reference's mutation surface is embedded SQL (FileWorkerApp.scala:
    207-227): claims flip matched rows' status via WHEN MATCHED UPDATE,
    the brand-new row lands via WHEN NOT MATCHED INSERT, and the result
    is the committed AcidTable snapshot. Same census, same oracle as
    merge_upsert: the statement form and the API form must be
    indistinguishable at the data level."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import merge_into_sql
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "merge_state_sql"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status", "resident", "error_status")
    t = AcidTable.create(spark, table_dir, state)

    updates = (t.read().filter(F.col("status") == 0)
               .orderBy("file_id").limit(5)
               .select("file_id", F.lit(1).alias("status"))
               .unionByName(spark.createDataFrame(
                   [(999_999_999, 0)], "file_id long, status int")))
    updates.createOrReplaceTempView("merge_sql_updates")
    merge_into_sql(spark, """
        MERGE INTO queue_state AS t
        USING merge_sql_updates AS s
        ON t.file_id = s.file_id
        WHEN MATCHED THEN UPDATE SET status = s.status
        WHEN NOT MATCHED THEN
          INSERT (file_id, status, resident, error_status)
          VALUES (s.file_id, s.status, 0, 0)
    """, tables={"queue_state": t})
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id")))


def merge_full_sync_sql(spark: SparkSession, sf_dir: str,
                        scratch: Path) -> DataFrame:
    """Full-snapshot sync in ONE statement — the SQL:2023
    `WHEN NOT MATCHED BY SOURCE` MERGE (Delta 2.4's flagship clause):
    the queue state is reconciled against a snapshot holding only the
    currently-claimable rows (status 0, file_id in band), so matched
    rows take the snapshot's status, snapshot-only rows insert, and
    every target row the snapshot no longer covers is DELETED. After
    the commit the table IS the snapshot — the idempotent 'mirror this
    feed' shape a dimension-sync pipeline runs hourly. One keyed
    full-outer shuffle + the O(1) manifest swap, like every merge."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import merge_into_sql
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "merge_full_sync_sql"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)

    snap = (state.filter((F.col("status") == 0)
                         & (F.col("file_id") % 7 < 3))
            .select("file_id", F.lit(1).alias("status"))
            .unionByName(spark.createDataFrame(
                [(999_999_998, 0)], "file_id long, status int")))
    snap.createOrReplaceTempView("merge_sync_snapshot")
    merge_into_sql(spark, """
        MERGE INTO queue_state AS t
        USING merge_sync_snapshot AS s
        ON t.file_id = s.file_id
        WHEN MATCHED THEN UPDATE SET status = s.status
        WHEN NOT MATCHED THEN INSERT (file_id, status)
          VALUES (s.file_id, s.status)
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """, tables={"queue_state": t})
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id")))


MERGE_FULL_SYNC_ORACLE = """
WITH queue AS ({queue_sql}),
snap AS (
  SELECT file_id, 1 AS status FROM queue
  WHERE status = 0 AND file_id % 7 < 3
  UNION ALL SELECT 999999998, 0)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id, max(file_id) AS max_id
FROM snap GROUP BY status
"""


def schema_evolution_read(spark: SparkSession, sf_dir: str,
                          scratch: Path) -> DataFrame:
    """Schema evolution across parquet batches: batch 1 writes the v1
    schema, batch 2 adds a column; `mergeSchema` unifies the read and the
    missing column is NULL for the old batch — the real-world shape of a
    long-lived 100 TB table whose producers upgrade over time."""
    import shutil

    from ..sources.tables import load_table

    out = str(scratch / "schema_evolution")
    shutil.rmtree(out, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    v2 = (docs.filter(F.col("doc_id") % 2 == 1)
          .select("doc_id", "source", F.octet_length("text").alias("n_bytes")))
    v1.write.mode("append").parquet(out)
    v2.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.select(
        "doc_id", "source",
        F.col("n_bytes").cast("int").alias("n_bytes"),
        F.col("n_bytes").isNull().cast("int").alias("pre_evolution"))


SCHEMA_EVOLUTION_ORACLE = """
SELECT doc_id, source,
       CASE WHEN doc_id % 2 = 1 THEN CAST(strlen(text) AS INT) END AS n_bytes,
       CAST(doc_id % 2 = 0 AS INT) AS pre_evolution
FROM documents
"""


def json_corrupt_tolerant(events: DataFrame) -> DataFrame:
    """Corrupt-record tolerance in semi-structured parsing: a deterministic
    1% of payloads are mangled; `from_json` yields NULL structs for them
    instead of failing the job, and the query reports parsed vs corrupt —
    the PERMISSIVE posture a 100 TB ingest needs (one bad record must not
    kill a 10-hour job)."""
    # coalesce: a NULL props must still mangle to a non-NULL corrupt string
    # (concat with NULL yields NULL → from_json returns a NULL struct →
    # is_corrupt would read 0 while the oracle flags the row).
    mangled = F.when(F.col("event_id") % 100 == 99,
                     F.concat(F.lit("{corrupt"),
                              F.coalesce(F.col("props"), F.lit(""))))  \
        .otherwise(F.col("props"))
    parsed = events.select(
        "event_id",
        F.from_json(mangled, "k INT, _corrupt_record STRING",
                    {"columnNameOfCorruptRecord": "_corrupt_record"})
         .alias("r"))
    return (parsed.select(
        "event_id",
        F.col("r.k").alias("k"),
        F.col("r._corrupt_record").isNotNull().cast("int").alias("is_corrupt")))


JSON_CORRUPT_ORACLE = """
SELECT event_id,
       CASE WHEN event_id % 100 != 99
            THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k,
       CAST(event_id % 100 = 99 AS INT) AS is_corrupt
FROM events
"""


MERGE_UPSERT_ORACLE = """
WITH queue AS ({queue_sql}),
claims AS (SELECT file_id FROM queue WHERE status = 0
           ORDER BY file_id LIMIT 5),
merged AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM claims) THEN 1
              ELSE status END AS status
  FROM queue
  UNION ALL SELECT 999999999, 0)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id, max(file_id) AS max_id
FROM merged GROUP BY status
"""


def acid_time_travel(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """Time travel over the ACID table: three committed versions of the
    queue state (v0 = loaded, v1 = five lowest available claimed, v2 =
    those five completed), then a status census of EVERY version read
    back through its own manifest. Old versions stay readable because
    commits never mutate data — the audit/debug superpower the
    reference's UPDATE-in-place queue fundamentally cannot offer
    (FileWorkerApp.scala:207-227 destroys the prior state on commit)."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "acid_time_travel"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    claims = low5.select("file_id", F.lit(1).alias("status"))
    t.merge(claims, key=["file_id"])                       # v1: claimed
    t.merge(low5.select("file_id", F.lit(3).alias("status")),
            key=["file_id"])                               # v2: completed
    per_version = [
        t.read(v).groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(v).alias("version"), "status", "n")
        for v in range(3)]
    out = per_version[0]
    for df in per_version[1:]:
        out = out.unionByName(df)
    return out


def acid_change_feed(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """Change-data-feed over the ACID table (Delta CDF's table_changes
    analog): three committed versions — v0 = queue loaded, v1 = five
    lowest available claimed (MERGE), v2 = three new files appended —
    then ``read_changes(0, 2)`` yields the row-level +/- deltas and this
    query proves them TWO ways in one result:

    * section='delta': per (version, change type, status) census of the
      feed itself with min/max file_id — the MERGE at v1 must appear as
      its delete(status 0)+insert(status 1) pairs, the append at v2 as
      bare inserts;
    * section='replay': the census of v0 ⊎ inserts ∖ deletes — which the
      DuckDB oracle computes as the census of v2 DIRECTLY, so a hash
      match certifies the deltas reconstruct the target snapshot.

    The reference's queue offers no such feed — a consumer of
    desh_files updates must poll and diff (FileWorkerApp.scala:207-227
    destroys the preimage on UPDATE); here every version step's changes
    are derivable forever."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "acid_change_feed"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1: claimed
    appended = spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int")
    t.append(appended)                                      # v2: new files
    ch = t.read_changes(0, 2)

    delta = (ch.groupBy(F.col("_commit_version").alias("version"),
                        F.col("_change_type").alias("change_type"),
                        "status")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("file_id").alias("min_id"),
                  F.max("file_id").alias("max_id"))
             .select(F.lit("delta").alias("section"), "version",
                     "change_type", "status", "n", "min_id", "max_id"))
    ins = (ch.filter(F.col("_change_type") == "insert")
           .select("file_id", "status"))
    dels = (ch.filter(F.col("_change_type") == "delete")
            .select("file_id", "status"))
    replay = (t.read(0).unionByName(ins).exceptAll(dels)
              .groupBy("status")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.min("file_id").alias("min_id"),
                   F.max("file_id").alias("max_id"))
              .select(F.lit("replay").alias("section"),
                      F.lit(-1).alias("version"),
                      F.lit("state").alias("change_type"),
                      "status", "n", "min_id", "max_id"))
    return delta.unionByName(replay)


def acid_cdf_consumer(spark: SparkSession, sf_dir: str,
                      scratch: Path) -> DataFrame:
    """The CDF consumed the way production uses it: a DOWNSTREAM
    aggregate table maintained purely from `read_changes` deltas —
    never rescanning the source. Source table: v0 = queue loaded, v1 =
    five lowest claimed (MERGE), v2 = three files appended (same
    committed scenario as acid_change_feed). Downstream: a per-status
    count table seeded from v0's census, then per version step the
    consumer applies (+1 per insert, -1 per delete) via
    `AcidTable.merge_add` — each application an atomic commit on the
    downstream table. Final downstream state must equal the census of
    the source's LATEST snapshot (the oracle computes that directly),
    proving the incremental consumer converges to the rescan answer.

    At 100 TB this is why the feed exists: the source table re-derives
    nothing, the consumer reads only the deltas (proportional to churn,
    not table size), and both sides commit atomically."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    src_dir = scratch / "acid_cdf_src"
    down_dir = scratch / "acid_cdf_down"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(down_dir, ignore_errors=True)

    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, src_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1
    t.append(spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int"))                        # v2

    down = AcidTable.create(
        spark, down_dir,
        t.read(0).groupBy("status").agg(F.count(F.lit(1)).alias("n")))
    for v in range(1, t.latest_version() + 1):
        ch = t.read_changes(v - 1, v)
        delta = (ch.groupBy("status")
                 .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                            .otherwise(-1)).alias("n")))
        down.merge_add(delta, key=["status"])
    return (down.read().filter(F.col("n") != 0)
            .select("status", "n"))


ACID_CDF_CONSUMER_ORACLE = """
WITH queue AS ({queue_sql}),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
v2 AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM low5) THEN 1
              ELSE status END AS status
  FROM queue
  UNION ALL
  SELECT * FROM (VALUES (999999901, 0), (999999902, 1),
                        (999999903, 0)) AS a(file_id, status))
SELECT status, COUNT(*) AS n FROM v2 GROUP BY status
"""


ACID_CHANGE_FEED_ORACLE = """
WITH queue AS ({queue_sql}),
base AS (SELECT file_id, status FROM queue),
low5 AS (SELECT file_id FROM base WHERE status = 0
         ORDER BY file_id LIMIT 5),
appended(file_id, status) AS (
  VALUES (999999901, 0), (999999902, 1), (999999903, 0)),
deltas AS (
  SELECT 1 AS version, 'delete' AS change_type, file_id, status
  FROM base WHERE file_id IN (SELECT file_id FROM low5)
  UNION ALL
  SELECT 1, 'insert', file_id, 1 FROM low5
  UNION ALL
  SELECT 2, 'insert', file_id, status FROM appended),
v2 AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM low5) THEN 1
              ELSE status END AS status
  FROM base
  UNION ALL SELECT file_id, status FROM appended)
SELECT 'delta' AS section, version, change_type, status,
       COUNT(*) AS n, min(file_id) AS min_id, max(file_id) AS max_id
FROM deltas GROUP BY version, change_type, status
UNION ALL
SELECT 'replay', -1, 'state', status,
       COUNT(*), min(file_id), max(file_id)
FROM v2 GROUP BY status
"""


def acid_cdf_recorded(spark: SparkSession, sf_dir: str,
                      scratch: Path) -> DataFrame:
    """The change feed served ENTIRELY from commit-time recorded change
    files (AcidTable.create(enable_cdf=True)): the acid_change_feed
    scenario, then every snapshot but the newest is VACUUMED before the
    feed is read — `read_changes(0, 2)` must still produce the exact
    delta census, because no snapshot is touched on the recorded path
    (a non-CDF table raises VersionVacuumedError here, test-pinned).
    This is the architecture Delta CDC ships: the feed is its own
    small append-only log, with retention independent of the data."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "acid_cdf_recorded"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state, enable_cdf=True)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1: claimed
    t.append(spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int"))                        # v2: new files
    t.vacuum(keep_last=1)                 # v0, v1 snapshots GONE
    ch = t.read_changes(0, 2)             # serves from recorded changes
    return (ch.groupBy(F.col("_commit_version").alias("version"),
                       F.col("_change_type").alias("change_type"), "status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id")))


ACID_CDF_RECORDED_ORACLE = """
WITH queue AS ({queue_sql}),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
deltas AS (
  SELECT 1 AS version, 'delete' AS change_type, file_id, status
  FROM queue WHERE file_id IN (SELECT file_id FROM low5)
  UNION ALL
  SELECT 1, 'insert', file_id, 1 FROM low5
  UNION ALL
  SELECT 2, 'insert', file_id, status
  FROM (VALUES (999999901, 0), (999999902, 1),
               (999999903, 0)) AS a(file_id, status))
SELECT version, change_type, status, COUNT(*) AS n,
       min(file_id) AS min_id, max(file_id) AS max_id
FROM deltas GROUP BY version, change_type, status
"""


def update_delete_sql(spark: SparkSession, sf_dir: str,
                      scratch: Path) -> DataFrame:
    """Row-level mutation STATEMENTS through the SQL front door — the
    two DMLs the reference's worker runs constantly as embedded SQL
    (status transitions + purges, FileWorkerApp.scala:207-227): one
    atomic `UPDATE ... SET ... WHERE` (a pure narrow transformation —
    CASE projection, no shuffle) then one atomic `DELETE FROM ...
    WHERE` (anti-filter), each its own committed version with history
    retained. Census oracle over the final snapshot."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "update_delete_sql"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status", "error_status")
    t = AcidTable.create(spark, table_dir, state)
    acid_sql(spark, "UPDATE q SET status = 3 WHERE status = 2",
             tables={"q": t})                               # v1
    acid_sql(spark,
             "DELETE FROM q WHERE error_status > 0 AND status = 0",
             tables={"q": t})                               # v2
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id")))


UPDATE_DELETE_SQL_ORACLE = """
WITH queue AS ({queue_sql}),
upd AS (SELECT file_id,
               CASE WHEN status = 2 THEN 3 ELSE status END AS status,
               error_status
        FROM queue),
fin AS (SELECT * FROM upd
        WHERE NOT (error_status > 0 AND status = 0))
SELECT status, COUNT(*) AS n, min(file_id) AS min_id, max(file_id) AS max_id
FROM fin GROUP BY status
"""


def acid_constraints(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """Table CHECK constraints enforced at commit time (Delta's ALTER
    TABLE ADD CONSTRAINT): the queue table takes `status BETWEEN 0 AND
    4` and `file_id IS NOT NULL` via SQL, a legal claim transition
    commits, and an illegal one (status 99) is REFUSED before any
    manifest is written — the census proves the violating batch left no
    trace. Validation is one filter scan of the commit's result
    (appends check only the new rows); at 100 TB the check rides the
    same job that writes the data."""
    import shutil

    from ..acid import AcidTable, ConstraintViolation
    from ..merge_sql import acid_sql
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "acid_constraints"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)
    acid_sql(spark, "ALTER TABLE q ADD CONSTRAINT status_band "
                    "CHECK (status BETWEEN 0 AND 4)", tables={"q": t})
    acid_sql(spark, "ALTER TABLE q ADD CONSTRAINT pk_not_null "
                    "CHECK (file_id IS NOT NULL)", tables={"q": t})
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                       # legal transition
    refused = 0
    try:
        acid_sql(spark, "UPDATE q SET status = 99 WHERE status = 1",
                 tables={"q": t})
    except ConstraintViolation:
        refused = 1                                # illegal: no trace
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id"))
            .withColumn("n_constraints", F.lit(len(t.constraints())))
            .withColumn("refused", F.lit(refused)))


ACID_CONSTRAINTS_ORACLE = """
WITH queue AS ({queue_sql}),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
post AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM low5) THEN 1
              ELSE status END AS status
  FROM queue)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id,
       max(file_id) AS max_id, 2 AS n_constraints, 1 AS refused
FROM post GROUP BY status
"""


def time_travel_sql(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """acid_time_travel's statement twin: the three-version claim
    scenario queried as the user writes it — one `acid_sql` statement
    unioning `VERSION AS OF 0/1/2` censuses (Delta spelling; the
    binding resolves each reference to its committed snapshot). Same
    oracle as the API form: the SQL surface and `t.read(v)` must be
    indistinguishable at the data level."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..operators.queue import queue_df
    from ..sources.tables import load_table

    table_dir = scratch / "time_travel_sql"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1: claimed
    t.merge(low5.select("file_id", F.lit(3).alias("status")),
            key=["file_id"])                                # v2: completed
    return acid_sql(spark, """
        SELECT 0 AS version, status, COUNT(*) AS n
        FROM queue_hist VERSION AS OF 0 GROUP BY status
        UNION ALL
        SELECT 1, status, COUNT(*) FROM queue_hist VERSION AS OF 1
        GROUP BY status
        UNION ALL
        SELECT 2, status, COUNT(*) FROM queue_hist VERSION AS OF 2
        GROUP BY status
    """, tables={"queue_hist": t})


ACID_TIME_TRAVEL_ORACLE = """
WITH queue AS ({queue_sql}),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
versions AS (
  SELECT 0 AS version, status FROM queue
  UNION ALL
  SELECT 1, CASE WHEN file_id IN (SELECT file_id FROM low5)
                 THEN 1 ELSE status END FROM queue
  UNION ALL
  SELECT 2, CASE WHEN file_id IN (SELECT file_id FROM low5)
                 THEN 3 ELSE status END FROM queue)
SELECT version, status, COUNT(*) AS n FROM versions GROUP BY 1, 2
"""


# --------------------------------------------------------------- data layout

ZORDER_BITS = 8
ZORDER_BUCKET_SHIFT = 8  # bucket = z >> shift → 256 buckets / 16x16 tiles


def _z_interleave(x: str, y: str) -> str:
    """16-bit Morton code: bit b of x → bit 2b, bit b of y → bit 2b+1.
    Plain shift/mask sum — identical in Spark SQL and DuckDB."""
    terms = [f"(shiftleft(shiftright({x}, {b}) & 1, {2 * b}) "
             f"+ shiftleft(shiftright({y}, {b}) & 1, {2 * b + 1}))"
             for b in range(ZORDER_BITS)]
    return "(" + " + ".join(terms) + ")"


def _z_interleave_duck(x: str, y: str) -> str:
    terms = [f"(((({x} >> {b}) & 1) << {2 * b}) + ((({y} >> {b}) & 1) << {2 * b + 1}))"
             for b in range(ZORDER_BITS)]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(orders: DataFrame) -> DataFrame:
    """Z-order (Morton) layout audit over (customer, order-day): interleave
    the low 8 bits of both dims, bucket by the top z-bits, and report each
    bucket's span in BOTH dimensions. Every bucket covers a 16x16 tile —
    bounded spans in two dimensions at once, which is what lets parquet
    min/max pruning serve predicates on either column; a single-column
    range layout bounds one span and leaves the other at full width
    (SURVEY.md §4: the reference's CREATE INDEX has no Spark analog —
    layout + statistics pruning replaces it). At scale the z-value is the
    repartitionByRange key at write time; this operator IS the audit
    query one runs over the written files' footer stats."""
    mask = (1 << ZORDER_BITS) - 1
    zed = orders.selectExpr(
        "o_orderkey",
        f"o_custkey & {mask} AS ck",
        f"unix_micros(cast(o_orderdate as timestamp)) div 86400000000 & {mask} AS dy",
    ).selectExpr("o_orderkey", "ck", "dy",
                 f"{_z_interleave('ck', 'dy')} AS z")
    return (zed.groupBy((F.shiftright("z", ZORDER_BUCKET_SHIFT)).alias("zbucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.max("ck") - F.min("ck")).alias("ck_span"),
                 (F.max("dy") - F.min("dy")).alias("dy_span")))


ZORDER_ORACLE = f"""
WITH zed AS (
  SELECT o_orderkey,
         o_custkey & {(1 << ZORDER_BITS) - 1} AS ck,
         (epoch_us(o_orderdate) // 86400000000) & {(1 << ZORDER_BITS) - 1} AS dy
  FROM orders),
zz AS (SELECT o_orderkey, ck, dy, {_z_interleave_duck('ck', 'dy')} AS z FROM zed)
SELECT z >> {ZORDER_BUCKET_SHIFT} AS zbucket, COUNT(*) AS n_rows,
       max(ck) - min(ck) AS ck_span, max(dy) - min(dy) AS dy_span
FROM zz GROUP BY 1
"""


def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `spark.udf.register` + SQL-invocation seam: a Python scalar
    function registered into the SQL function catalog and called from a
    SQL string — how notebook/SQL-first users extend the engine (the
    complement of the DataFrame-side pandas-UDF key). The function
    (token count) is deliberately SQL-expressible so the oracle checks
    the registration round trip, not novel math; the Arrow-batched
    pandas variant is the production registration (row-at-a-time
    `udf()` would be the 10-100x-slower trap)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def py_token_count(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len([w for w in
                                        __import__("re").split(r"\W+",
                                                               t.lower())
                                        if w]))

    spark.udf.register("py_token_count", py_token_count)
    from ..sources.tables import load_table
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udf_view")
    return spark.sql("""
        SELECT doc_id, py_token_count(text) AS n_tokens
        FROM docs_udf_view
    """)


SQL_UDF_ORACLE = """
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\W+'),
                            t -> t <> '')) AS INT) AS n_tokens
FROM documents
"""


def grouped_agg_pandas_udaf(lineitem: DataFrame) -> DataFrame:
    """GROUPED_AGG pandas UDF — the third Arrow extension seam (scalar
    pandas_udf and GROUPED_MAP applyInPandas are covered by their own
    keys): a custom aggregate that receives each group's columns as
    whole pandas Series and returns one scalar. Spark runs it as a real
    aggregate (partial per-partition batches, keyed shuffle), so the
    plan scales like any hash aggregate — the seam to plug in
    numpy/scipy reducers the SQL surface lacks. The demo aggregate
    (quantity-weighted mean price) is deliberately SQL-expressible so
    the oracle checks the Arrow round trip, not novel math."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    # Spark refuses to mix GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a
    # second pandas aggregate rather than F.count.
    @pandas_udf("long")
    def ngroup(price: pd.Series) -> int:
        return len(price)

    return (lineitem.groupBy("l_orderkey")
            .agg(F.round(wmean("l_extendedprice", "l_quantity"), 6)
                 .alias("wmean_price"),
                 ngroup("l_extendedprice").alias("n_lines")))


GROUPED_AGG_ORACLE = """
SELECT l_orderkey,
       round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6)
         AS wmean_price,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def map_in_arrow(documents: DataFrame) -> DataFrame:
    """mapInArrow — the zero-copy tier below mapInPandas: the UDF sees
    raw pyarrow RecordBatches, skipping the Arrow→pandas conversion
    entirely (no object-dtype strings, no index allocation — for
    byte/metadata passes over huge batches the conversion IS the cost).
    The batch pass computes per-doc byte length and an 8-bucket byte
    histogram slot, all in pyarrow compute; SQL-expressible on purpose
    so the oracle checks the Arrow round trip."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_batch(batches):
        for b in batches:
            n = pc.binary_length(pc.cast(b.column("text"), pa.binary()))
            # pyarrow.compute has no mod kernel; n - (n/8)*8 in int space
            bucket = pc.subtract(
                n, pc.multiply(pc.divide(n, 8), 8))
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), n, pc.cast(bucket, pa.int32())],
                ["doc_id", "n_bytes", "bucket"])

    return documents.select("doc_id", "text").mapInArrow(
        per_batch, schema="doc_id long, n_bytes int, bucket int")


MAP_IN_ARROW_ORACLE = """
SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
       CAST(strlen(text) % 8 AS INT) AS bucket
FROM documents
"""


def observe_metrics(lineitem: DataFrame) -> DataFrame:
    """Observation API — the engine's accumulator seam (the reference
    counts processed records in driver-side counters, StreamingApp.scala:
    557-560): named aggregate metrics ride ON the action that runs the
    real query, costing zero extra passes. Here the observed query is a
    filtered projection; the key returns the observed metrics so the
    oracle value-checks what the monitoring hook reported."""
    from pyspark.sql import Observation
    obs = Observation("lineitem_scan")
    observed = (lineitem.filter(F.col("l_quantity") >= 25)
                .observe(obs,
                         F.count(F.lit(1)).alias("n_rows"),
                         F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                          .cast("double").alias("sum_qty"),
                         F.max("l_orderkey").alias("max_orderkey")))
    observed.write.mode("overwrite").format("noop").save()  # the action
    m = obs.get
    return lineitem.sparkSession.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["max_orderkey"])],
        "n_rows long, sum_qty double, max_orderkey long")


OBSERVE_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       MAX(l_orderkey) AS max_orderkey
FROM lineitem WHERE l_quantity >= 25
"""


def incremental_agg(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """Incremental view maintenance: a per-user (count, revenue-sum)
    aggregate table maintained under three successive delta batches —
    each batch reduces to mergeable partials (one keyed aggregation over
    the DELTA only) and lands as one atomic `AcidTable.merge_add`
    commit. The maintained state equals the from-scratch aggregate
    exactly (the oracle recomputes over the full log), which is the IVM
    correctness contract.

    100-TB shape: per batch the work is O(delta) + one keyed merge join
    against the state table — never a rescan of the log; sums ride
    DECIMAL so merge order can't perturb them. This is the batch twin of
    `streaming_cdc_upsert` (there keep-latest, here additive partials —
    the two mergeable-state families)."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    table_dir = scratch / "incremental_agg_acid"
    shutil.rmtree(table_dir, ignore_errors=True)
    events = load_table(spark, sf_dir, "events")
    schema = "user_id long, n_events long, total decimal(28,2)"
    t = AcidTable.create(spark, table_dir, spark.createDataFrame([], schema))
    for chunk in range(3):
        delta = events.filter(F.col("event_id") % 3 == chunk)
        partial = (delta.groupBy("user_id")
                   .agg(F.count(F.lit(1)).alias("n_events"),
                        F.sum(F.col("value").cast("decimal(28,2)"))
                         .alias("total")))
        t.merge_add(partial, key=["user_id"])
    return (t.read().select("user_id", "n_events",
                            F.col("total").cast("double").alias("total")))


INCREMENTAL_AGG_ORACLE = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
FROM events GROUP BY user_id
"""


def dynamic_partition_pruning(spark: SparkSession, sf_dir: str,
                              scratch: Path) -> DataFrame:
    """Dynamic partition pruning proof: the fact side is a parquet layout
    partitioned by event_type; the selective filter lives on a DIMENSION
    (a 2-row segment table), so static pruning can't help — the partition
    filter must be injected at runtime from the join's build side
    (Spark's DPP: a `dynamicpruningexpression` on the scan, asserted in
    tests/test_plans.py). At 100 TB this is THE difference between
    scanning 2 of N partitions and scanning the whole fact table when
    the predicate arrives via a star-schema join, which is how real
    predicates arrive.  Layout written once per (session, sf) and reused."""
    from ..sources.tables import load_table

    layout = scratch / f"dpp_events_{Path(sf_dir).name}"
    marker = layout / "_SUCCESS"
    if not marker.exists():
        (load_table(spark, sf_dir, "events")
         .select("event_id", "user_id", "value", "event_type")
         .write.mode("overwrite").partitionBy("event_type")
         .parquet(str(layout)))
    fact = spark.read.parquet(str(layout))
    # the dim carries every type; the SELECTIVE predicate (seg <= 2) is
    # what DPP requires on the build side before it injects the runtime
    # partition filter — an unfiltered dim never triggers pruning
    dim = (spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("error", 4),
         ("scroll", 5)], "event_type string, seg int")
        .filter(F.col("seg") <= 2))
    return (fact.join(F.broadcast(dim), "event_type")
            .groupBy("event_type", "seg")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total")))


DPP_ORACLE = """
SELECT event_type, CASE event_type WHEN 'click' THEN 1 ELSE 2 END AS seg,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events WHERE event_type IN ('click', 'view')
GROUP BY 1, 2
"""


def runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction — the shuffle-join twin of
    the DPP proof: when the selective predicate lives on the SMALL side of
    a shuffle join (here urgent orders -> lineitem), Spark builds a bloom
    filter from the build side's join keys at runtime and injects a
    `might_contain` pre-filter into the big side's scan stage, so
    non-matching fact rows die before the exchange instead of shuffling.
    At 100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~matching fraction — the optimizer feature
    that replaces hand-written semi-join prefilters.

    Runs in a forked `newSession()` (own SQLConf, shared catalog/executors)
    so lowering the application-side threshold for THIS plan — the fixture
    scan is KB, the gate defaults to 10GB — and pinning the join to
    shuffle (no broadcast at fixture scale) cannot leak into sibling
    queries. tests/test_plans.py asserts `might_contain` reaches the
    lineitem side."""
    from ..sources.tables import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    urgent = (load_table(s2, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey", "o_totalprice"))
    line = load_table(s2, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
    return (line.join(urgent, line.l_orderkey == urgent.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum((F.col("l_extendedprice").cast("decimal(18,2)")
                        * (1 - F.col("l_discount").cast("decimal(18,2)")))
                       .cast("decimal(38,4)"))
                 .cast("double").alias("revenue")))


BLOOM_JOIN_ORACLE = """
SELECT l_returnflag, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
"""


def aqe_join_upgrade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime join-strategy upgrade: with the STATIC broadcast
    threshold off (what a planner sees when stats are missing or wrong —
    the normal state at 100 TB), the optimizer plans lineitem JOIN
    filtered-orders as a sort-merge join; at runtime AQE measures the
    filtered side's actual shuffle output, sees it is tiny, and rewrites
    the running plan to a broadcast-hash join, cancelling the fact-side
    sort+merge. This is the safety net under every size-gated join in
    this engine — the keyed dedup/ANN joins lean on it instead of forced
    hints (BASELINE.md's broadcast rule). Forked newSession confines the
    thresholds; tests/test_plans.py asserts the FINAL adaptive plan
    broadcast-upgraded."""
    from ..sources.tables import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "8m")
    urgent = (load_table(s2, sf_dir, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_orderkey"))
    line = load_table(s2, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linestatus")
    return (line.join(urgent, line.l_orderkey == urgent.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                 .cast("double").alias("qty")))


AQE_UPGRADE_ORACLE = """
SELECT l_linestatus, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_linestatus
"""


SKIP_LO, SKIP_HI = 1000, 5000


def acid_file_skipping(spark: SparkSession, sf_dir: str,
                       scratch: Path) -> DataFrame:
    """Manifest min/max data skipping on the ACID table — the other half
    of what a table format's metadata buys (after atomic commits): every
    commit harvests per-file [min, max] column stats from the parquet
    footers into the manifest, and a range read opens ONLY the files
    whose extent overlaps the predicate — file-level pruning decided
    entirely from one small JSON, no footer IO on the skipped files.
    Combined with the range-sorted layout (compact_range_write's
    B-tree-replacement stance, reference StreamingApp.scala:152-155),
    band-read IO is proportional to the band, not the table.
    tests/test_acid.py pins that files are actually skipped AND that the
    pruned read equals the full-scan filter row-for-row."""
    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_skip_{Path(sf_dir).name}"
    if AcidTable.exists(spark, path):
        table = AcidTable(spark, path)
    else:
        li = (load_table(spark, sf_dir, "lineitem")
              .select("l_orderkey", "l_quantity", "l_extendedprice")
              .repartitionByRange(N_RANGE_FILES, "l_orderkey")
              .sortWithinPartitions("l_orderkey"))
        table = AcidTable.create(spark, path, li)
    band = table.read_range("l_orderkey", SKIP_LO, SKIP_HI)
    return band.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"))


ACID_SKIP_ORACLE = f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
FROM lineitem WHERE l_orderkey BETWEEN {SKIP_LO} AND {SKIP_HI}
"""


#: disjoint l_orderkey bands for the COW DML demo (populated at every sf)
COW_DEL_LO, COW_DEL_HI = 320, 960
COW_UPD_LO, COW_UPD_HI = 64, 256


def acid_pruned_dml(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """Row-level DELETE + UPDATE as file-pruned copy-on-write — the
    Delta/Iceberg DML discipline the reference's queue mutations
    (FileWorkerApp.scala:207-227) need at 100 TB: a find pass scans
    ONLY the predicate column and collects the touched
    ``_metadata.file_path`` set, the rewrite pass rewrites just those
    files, and every untouched file carries into the new commit as a
    reference with its recorded manifest stats. On this key-clustered
    table each narrow band touches O(band-extent) of the
    {n_files} files; the ``*_pruned`` columns PROVE files were carried
    by reference (the census oracle proves the rows are exactly the
    logical filter/CASE result)."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_cow_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .repartitionByRange(N_RANGE_FILES, "l_orderkey")
          .sortWithinPartitions("l_orderkey"))
    t = AcidTable.create(spark, path, li)
    t.delete_where(f"l_orderkey BETWEEN {COW_DEL_LO} AND {COW_DEL_HI}")
    del_st = t.last_cow_stats
    t.update_where({"l_quantity": "l_quantity + 100"},
                   f"l_orderkey BETWEEN {COW_UPD_LO} AND {COW_UPD_HI}")
    upd_st = t.last_cow_stats
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
         .cast("double").alias("price"))
        .withColumn("delete_pruned",
                    F.lit(del_st["files_linked"] > 0
                          and del_st["files_rewritten"] > 0))
        .withColumn("update_pruned",
                    F.lit(upd_st["files_linked"] > 0
                          and upd_st["files_rewritten"] > 0)))


#: l_orderkey band for the merge-on-read delete (populated at every sf)
DV_LO, DV_HI = 500, 540


def acid_deletion_vectors(spark: SparkSession, sf_dir: str,
                          scratch: Path) -> DataFrame:
    """DELETE as merge-on-read deletion vectors — O(matched rows), the
    cheapest tier of the table's mutation-cost ladder: the find pass
    scans only the predicate column and records each matched row's
    stable (file, row-index) identity into a small parquet sidecar;
    the commit is PURE METADATA (``pure_metadata`` pins that the new
    manifest shares the parent's data dir byte-for-byte). Reads apply
    the vector as a broadcast anti-join; ``compact``/COW rewrites
    materialize it away. The census oracle proves row-exactness;
    ``rows_deleted`` is pinned against the oracle's own band count."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_dv_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .repartitionByRange(N_RANGE_FILES, "l_orderkey")
          .sortWithinPartitions("l_orderkey"))
    t = AcidTable.create(spark, path, li)
    parent = t._manifest(t.latest_version())
    v = t.delete_where_mor(f"l_orderkey BETWEEN {DV_LO} AND {DV_HI}")
    pure_metadata = t._manifest(v)["data"] == parent["data"]
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"))
        .withColumn("rows_deleted",
                    F.lit(t.last_mor_stats["rows_deleted"]).cast("long"))
        .withColumn("pure_metadata", F.lit(bool(pure_metadata))))


ACID_DV_ORACLE = f"""
SELECT COUNT(*) FILTER (WHERE NOT (l_orderkey BETWEEN {DV_LO} AND {DV_HI}))
         AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE NOT (l_orderkey BETWEEN {DV_LO} AND {DV_HI}))
            AS DOUBLE) AS qty,
       COUNT(*) FILTER (WHERE l_orderkey BETWEEN {DV_LO} AND {DV_HI})
         AS rows_deleted,
       TRUE AS pure_metadata
FROM lineitem
"""


#: l_orderkey bounds for the three highwater releases (all sf-populated)
HW_TXN_BOUNDS = (400, 800, 1200)


def acid_multi_table_txn(spark: SparkSession, sf_dir: str,
                         scratch: Path) -> DataFrame:
    """Cross-table atomic transactions through AcidCatalog — the
    reference's multi-table writes (``get_highwater_mark`` updates
    hw_table AND inserts into highwatermark_log in ONE PL/pgSQL call,
    StreamingApp.scala:223-256) re-expressed as catalog-level commits:
    each release updates the hw table and appends the log row, then
    publishes both new versions in one O_EXCL catalog-pointer swap.
    ``atomic`` scans EVERY catalog entry and pins that no entry ever
    exposes a moved highwater without its log row (or vice versa) —
    the cross-table snapshot-isolation contract itself, in-artifact."""
    import shutil

    from ..acid_catalog import AcidCatalog
    from ..sources.tables import load_table

    root = scratch / f"acid_cat_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    cat = AcidCatalog(spark, root)
    cat.create_table("hw", spark.createDataFrame(
        [(0, 0)], "case_id long, hw long"))
    cat.create_table("log", spark.createDataFrame(
        [], "case_id long, previous long, current long"))
    li = load_table(spark, sf_dir, "lineitem")
    prev = 0
    for bound in HW_TXN_BOUNDS:
        cur = li.filter(F.col("l_orderkey") <= bound) \
            .agg(F.max("l_orderkey")).collect()[0][0]   # bounded scalar
        cat.commit_multi({
            "hw": ("update", {"hw": str(cur)}, "case_id = 0"),
            "log": ("append", spark.createDataFrame(
                [(0, prev, cur)],
                "case_id long, previous long, current long")),
        })
        prev = cur
    atomic = True
    for entry in range(cat.latest_entry() + 1):
        pins = cat.snapshot(entry)
        if not {"hw", "log"} <= set(pins):
            continue
        hw_v = cat.read("hw", entry=entry).collect()[0].hw
        last = (cat.read("log", entry=entry).agg(
            F.coalesce(F.max("current"), F.lit(0))).collect()[0][0])
        atomic = atomic and hw_v == last
    log = cat.read("log")
    return (log.agg(
        F.count(F.lit(1)).alias("n_log"),
        F.min("current").alias("first_release"),
        F.max("current").alias("last_release"))
        .withColumn("hw_final",
                    F.lit(cat.read("hw").collect()[0].hw).cast("long"))
        .withColumn("atomic", F.lit(bool(atomic))))


ACID_MULTI_TXN_ORACLE = f"""
WITH m AS (SELECT
  (SELECT MAX(l_orderkey) FROM lineitem
    WHERE l_orderkey <= {HW_TXN_BOUNDS[0]}) AS c1,
  (SELECT MAX(l_orderkey) FROM lineitem
    WHERE l_orderkey <= {HW_TXN_BOUNDS[1]}) AS c2,
  (SELECT MAX(l_orderkey) FROM lineitem
    WHERE l_orderkey <= {HW_TXN_BOUNDS[2]}) AS c3)
SELECT 3 AS n_log, c1 AS first_release, c3 AS last_release,
       c3 AS hw_final, TRUE AS atomic
FROM m
"""


ACID_COW_ORACLE = f"""
WITH fin AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey BETWEEN {COW_UPD_LO} AND {COW_UPD_HI}
              THEN l_quantity + 100 ELSE l_quantity END AS l_quantity,
         l_extendedprice
  FROM lineitem
  WHERE NOT (l_orderkey BETWEEN {COW_DEL_LO} AND {COW_DEL_HI}))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price,
       TRUE AS delete_pruned, TRUE AS update_pruned
FROM fin
"""


# ------------------------------------------------- Observation metrics

def observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.observe` — query-attached metrics collected DURING the action
    (one pass, no second scan): the production way to get row counts /
    control sums out of a pipeline run without re-executing it (the
    reference prints per-batch counts from a separate count() pass,
    StreamingApp.scala:557-560 — a full extra evaluation). The observed
    values must equal the direct aggregation (the oracle), proving the
    metrics see exactly the rows the query processed."""
    from pyspark.sql import Observation

    from ..sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("li_metrics")
    flowed = (li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("sum_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"))
        .filter(F.col("l_quantity") >= 0))       # pass-through: observe
    flowed.write.mode("overwrite").format("noop").save()  # sees ALL rows
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["min_key"], m["max_key"])],
        "n_rows long, sum_qty double, min_key long, max_key long")


OBSERVED_METRICS_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
FROM lineitem
"""


# --------------------------------------------- cogrouped applyInPandas

def cogroup_user_profile(events: DataFrame) -> DataFrame:
    """`cogroup(...).applyInPandas` — the two-sided Arrow seam: clicks
    and errors grouped by user arrive as PAIRED pandas frames in one
    function call (the API a custom as-of matcher or per-key
    reconciliation uses when neither side fits a join). Profile per
    user: counts on both sides plus each side's max event id —
    deterministic, so the DuckDB twin is a full-outer join of two
    aggregates. Scale: one co-partitioned shuffle on user_id, Arrow
    batches per group, no driver involvement.

    Seam-cost discipline, two measured fixes (4.1s -> ~0.7s at sf0.1):

    * Each side is PRE-AGGREGATED to exactly the partials the profile
      consumes (count + max per user — JVM-side, map-side-combined)
      before the cogroup, so the Arrow payload is one row per user per
      side instead of every raw event — the pattern for ANY cogroup
      whose per-group logic only needs aggregates of a side.
    * The seam's parallelism is PINNED with an explicit keyed
      repartition. AQE's byte-based coalescing sees 150 tiny rows and
      collapses the python stage to ONE task — but the cogroup's cost
      is per-GROUP (an Arrow IPC round-trip each, ~20ms), which AQE's
      size heuristic cannot see, and the serialized stage ran 6s where
      32 tasks run 1s. A user repartition is exempt from AQE
      coalescing and already satisfies the cogroup's hash-distribution
      requirement, so it adds no extra exchange. Same trade at cluster
      scale: size python-seam stages by group count, not bytes."""
    import pandas as pd

    seam_parts = _seam_parts(events)
    clicks = (events.filter(F.col("event_type") == "click")
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.max("event_id").alias("max_id"))
              .repartition(seam_parts, "user_id"))
    errors = (events.filter(F.col("event_type") == "error")
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.max("event_id").alias("max_id"))
              .repartition(seam_parts, "user_id"))

    def profile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": [key[0]],
            "n_clicks": [int(left["n"].iloc[0]) if len(left) else 0],
            "n_errors": [int(right["n"].iloc[0]) if len(right) else 0],
            "max_click_id": [left["max_id"].iloc[0]
                             if len(left) else None],
            "max_error_id": [right["max_id"].iloc[0]
                             if len(right) else None]})

    return (clicks.groupBy("user_id").cogroup(errors.groupBy("user_id"))
            .applyInPandas(profile,
                           schema="user_id long, n_clicks long, "
                                  "n_errors long, max_click_id long, "
                                  "max_error_id long"))


COGROUP_PROFILE_ORACLE = """
WITH c AS (SELECT user_id, COUNT(*) AS n_clicks, max(event_id) AS max_click_id
           FROM events WHERE event_type = 'click' GROUP BY user_id),
e AS (SELECT user_id, COUNT(*) AS n_errors, max(event_id) AS max_error_id
      FROM events WHERE event_type = 'error' GROUP BY user_id)
SELECT coalesce(c.user_id, e.user_id) AS user_id,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_errors, 0) AS n_errors,
       max_click_id, max_error_id
FROM c FULL OUTER JOIN e ON c.user_id = e.user_id
"""


# ------------------------------------------ Partitioned-table pruning

#: appended-batch key offset (keeps appended l_orderkey disjoint)
PART_OFFSET = 100_000_000


def acid_partitioned_prune(spark: SparkSession, sf_dir: str,
                           scratch: Path) -> DataFrame:
    """Partition columns on AcidTable (the Iceberg design: one
    partition tuple per data file, tracked in the MANIFEST, never in
    directory paths — no listing, partition evolution possible): the
    layout-level analog of the reference's B-tree index
    (StreamingApp.scala:152-155). Each staged batch hash-repartitions
    on the partition columns (one file per touched tuple — the
    optimized-write shape), so this table is deterministic: create
    writes 4 files (pmod 0-3), the append adds 2 (pmod 1-2). DML pinned
    to one partition then proves the partition-FIRST find pass: the
    pinned DELETE/UPDATE each open exactly the 2 files of their
    partition, never the other 4 — at 100 TB every scan, COW rewrite
    and OPTIMIZE is O(touched partitions). The ``*_scanned``/
    ``n_files`` columns pin those counts in the oracle; the census
    pins the rows."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_part_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice")
          .withColumn("pmod", (F.col("l_orderkey") % 4).cast("int")))
    t = AcidTable.create(spark, path, li, partition_by=["pmod"])
    t.append(li.filter(F.col("pmod").isin(1, 2))
             .withColumn("l_orderkey",
                         F.col("l_orderkey") + F.lit(PART_OFFSET)))
    n_files = len(t._manifest(t.latest_version())["files"])
    t.delete_where("pmod = 1 AND l_quantity <= 5")
    del_scanned = t.last_cow_stats["files_scanned"]
    t.update_where({"l_extendedprice": "l_extendedprice + 1000"},
                   "pmod = 2 AND l_quantity >= 45")
    upd_scanned = t.last_cow_stats["files_scanned"]
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
         .cast("double").alias("price"))
        .withColumn("n_files", F.lit(n_files))
        .withColumn("delete_scanned", F.lit(del_scanned))
        .withColumn("update_scanned", F.lit(upd_scanned)))


ACID_PART_ORACLE = f"""
WITH base AS (
  SELECT l_orderkey, l_quantity, l_extendedprice,
         CAST(l_orderkey % 4 AS INT) AS pmod
  FROM lineitem),
all_rows AS (
  SELECT * FROM base
  UNION ALL
  SELECT l_orderkey + {PART_OFFSET}, l_quantity, l_extendedprice, pmod
  FROM base WHERE pmod IN (1, 2)),
fin AS (
  SELECT l_orderkey, l_quantity,
         CASE WHEN pmod = 2 AND l_quantity >= 45
              THEN l_extendedprice + 1000
              ELSE l_extendedprice END AS l_extendedprice
  FROM all_rows
  WHERE NOT (pmod = 1 AND l_quantity <= 5))
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price,
       6 AS n_files, 2 AS delete_scanned, 2 AS update_scanned
FROM fin
"""


# ---------------------------------------- MOR UPDATE / MERGE (DV v2)

#: l_orderkey bands for the merge-on-read UPDATE and MERGE images
MOR_UPD_LO, MOR_UPD_HI = 120, 160
MOR_MRG_LO, MOR_MRG_HI = 700, 710


def acid_mor_dml(spark: SparkSession, sf_dir: str,
                 scratch: Path) -> DataFrame:
    """The FULL merge-on-read DML surface (Delta/Iceberg v2 deletion
    vectors, not just DELETE): UPDATE swaps each matched row's image —
    old image dies by (file, row-index) vector entry, new image appends
    as an O(delta) linked commit — and MERGE does the same for matched
    keys while unmatched source rows insert in the SAME commit. Whole
    statements cost O(matched rows); no data file is read in full or
    rewritten (``no_rewrite`` pins that every parent file was carried
    by reference through both commits). The census oracle recomputes
    the final table; ``rows_updated``/``rows_merged``/``dv_rows`` pin
    the vector bookkeeping against the oracle's own band counts."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_mor_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice")
          .repartitionByRange(N_RANGE_FILES, "l_orderkey")
          .sortWithinPartitions("l_orderkey"))
    t = AcidTable.create(spark, path, li, enable_dv=True)
    parent_files = {f["path"] for f in
                    t._manifest(t.latest_version())["files"]}
    t.update_where_mor(
        {"l_quantity": "l_quantity + 100"},
        f"l_orderkey BETWEEN {MOR_UPD_LO} AND {MOR_UPD_HI}")
    n_upd = t.last_mor_stats["rows_updated"]
    # key-unique update batch (the ANSI MERGE cardinality contract —
    # the fixture's lineitem holds duplicate (orderkey, linenumber)
    # pairs): per key keep the max quantity, zero the price
    mrg = (li.filter(F.col("l_orderkey")
                     .between(MOR_MRG_LO, MOR_MRG_HI))
           .groupBy("l_orderkey", "l_linenumber")
           .agg(F.max("l_quantity").alias("l_quantity"))
           .withColumn("l_extendedprice", F.lit(0.0)))
    ins = spark.createDataFrame(
        [(900000001, 1, 1.0, 1.0), (900000002, 1, 2.0, 2.0)],
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double").select(*li.columns)
    v = t.merge_mor(mrg.unionByName(ins.select(*mrg.columns)),
                    key=["l_orderkey", "l_linenumber"])
    m = t._manifest(v)
    no_rewrite = parent_files <= {f["path"] for f in m["files"]}
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
         .cast("double").alias("price"))
        .withColumn("rows_updated", F.lit(n_upd).cast("long"))
        .withColumn("rows_merged",
                    F.lit(t.last_mor_stats["rows_updated"]).cast("long"))
        .withColumn("rows_inserted",
                    F.lit(t.last_mor_stats["rows_inserted"]).cast("long"))
        .withColumn("dv_rows", F.lit(m["dv_rows"]).cast("long"))
        .withColumn("no_rewrite", F.lit(bool(no_rewrite))))


ACID_MOR_ORACLE = f"""
WITH upd AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey BETWEEN {MOR_UPD_LO} AND {MOR_UPD_HI}
              THEN l_quantity + 100 ELSE l_quantity END AS l_quantity,
         l_extendedprice
  FROM lineitem),
mrg AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey BETWEEN {MOR_MRG_LO} AND {MOR_MRG_HI}
              THEN MAX(l_quantity) OVER (PARTITION BY l_orderkey,
                                                      l_linenumber)
              ELSE l_quantity END AS l_quantity,
         CASE WHEN l_orderkey BETWEEN {MOR_MRG_LO} AND {MOR_MRG_HI}
              THEN 0.0 ELSE l_extendedprice END AS l_extendedprice
  FROM upd),
fin AS (
  SELECT * FROM mrg
  UNION ALL
  SELECT * FROM (VALUES (900000001, 1, 1.0, 1.0),
                        (900000002, 1, 2.0, 2.0))
         AS a(l_orderkey, l_linenumber, l_quantity, l_extendedprice)),
bands AS (
  SELECT COUNT(*) FILTER (WHERE l_orderkey BETWEEN {MOR_UPD_LO}
                            AND {MOR_UPD_HI}) AS n_upd,
         COUNT(*) FILTER (WHERE l_orderkey BETWEEN {MOR_MRG_LO}
                            AND {MOR_MRG_HI}) AS n_mrg
  FROM lineitem)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price,
       (SELECT n_upd FROM bands) AS rows_updated,
       (SELECT n_mrg FROM bands) AS rows_merged,
       2 AS rows_inserted,
       (SELECT n_upd + n_mrg FROM bands) AS dv_rows,
       TRUE AS no_rewrite
FROM fin
"""


# ------------------------------------- SQL INSERT / CTAS / ADD COLUMN

def acid_insert_sql(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """The SQL front door's WRITE-side completion — reference users
    speak SQL for everything (FileWorkerApp.scala:207-227 embeds its
    whole mutation surface as SQL strings), so the table format's
    creation/ingest path must too: CREATE TABLE ... PARTITIONED BY ...
    AS SELECT (CTAS onto a partitioned AcidTable, registered for later
    statements), ALTER TABLE ADD COLUMN (pure-metadata schema widening
    — the commit shares the parent's data dir), INSERT INTO ...
    VALUES with a named column list (ANSI NULL-fill), and INSERT INTO
    ... SELECT reading another registered table AT A PINNED VERSION
    through the shared time-travel binder. The census oracle recomputes
    the final table from the same statements' algebra."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..sources.tables import load_table

    path = scratch / f"acid_ins_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_quantity")
    src = AcidTable.create(spark, path / "src", li)
    tabs = {"src": src}
    acid_sql(spark, """
        CREATE TABLE summary PARTITIONED BY (bucket) AS
        SELECT CAST(l_orderkey % 8 AS INT) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS qty
        FROM src GROUP BY CAST(l_orderkey % 8 AS INT)""",
        tabs, base_dir=path)
    t = tabs["summary"]
    data_before = t._manifest(t.latest_version())["data"]
    acid_sql(spark, "ALTER TABLE summary ADD COLUMN note string", tabs)
    pure_metadata = \
        t._manifest(t.latest_version())["data"] == data_before
    acid_sql(spark, "INSERT INTO summary (bucket, n, qty, note) "
                    "VALUES (100, 1, 0.5, 'manual')", tabs)
    acid_sql(spark, """
        INSERT INTO summary (bucket, n, qty)
        SELECT CAST(200 + l_orderkey % 2 AS INT) AS bucket, COUNT(*),
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        FROM src VERSION AS OF 0 WHERE l_orderkey <= 100
        GROUP BY CAST(200 + l_orderkey % 2 AS INT)""", tabs)
    return (t.read()
            .select("bucket", "n", "qty", "note")
            .withColumn("ctas_partitioned",
                        F.lit(t.partition_cols() == ["bucket"]))
            .withColumn("add_col_pure_metadata",
                        F.lit(bool(pure_metadata))))


ACID_INSERT_SQL_ORACLE = """
WITH base AS (
  SELECT CAST(l_orderkey % 8 AS INT) AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(NULL AS VARCHAR) AS note
  FROM lineitem GROUP BY 1),
ins2 AS (
  SELECT CAST(200 + l_orderkey % 2 AS INT) AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
         CAST(NULL AS VARCHAR) AS note
  FROM lineitem WHERE l_orderkey <= 100 GROUP BY 1),
fin AS (
  SELECT * FROM base
  UNION ALL
  SELECT 100, 1, 0.5, 'manual'
  UNION ALL
  SELECT * FROM ins2)
SELECT bucket, n, qty, note, TRUE AS ctas_partitioned,
       TRUE AS add_col_pure_metadata
FROM fin
"""


# ---------------------------------------- SQL transactions (catalog)

def acid_txn_sql(spark: SparkSession, sf_dir: str,
                 scratch: Path) -> DataFrame:
    """The reference's PL/pgSQL ``get_highwater_mark`` transaction
    (StreamingApp.scala:223-256: UPDATE hw_table + INSERT INTO
    highwatermark_log, atomically) spoken as SQL through the catalog:
    each release is one ``BEGIN; UPDATE hw ...; INSERT INTO log ...;
    COMMIT`` block — every statement commits via its table's optimistic
    loop, then ONE catalog-pointer swap publishes both versions, so no
    catalog reader can ever see a moved highwater without its log row.
    ``atomic`` re-verifies that invariant across EVERY catalog entry
    in-artifact (same contract as acid_multi_table_txn, now reachable
    from the SQL front door)."""
    import shutil

    from ..acid_catalog import AcidCatalog
    from ..merge_sql import acid_sql_txn
    from ..sources.tables import load_table

    root = scratch / f"acid_txnsql_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    cat = AcidCatalog(spark, root)
    cat.create_table("hw", spark.createDataFrame(
        [(0, 0)], "case_id long, hw long"))
    cat.create_table("log", spark.createDataFrame(
        [], "case_id long, previous long, current long"))
    li = load_table(spark, sf_dir, "lineitem")
    prev = 0
    for bound in HW_TXN_BOUNDS:
        cur = li.filter(F.col("l_orderkey") <= bound) \
            .agg(F.max("l_orderkey")).collect()[0][0]   # bounded scalar
        acid_sql_txn(spark, f"""
            BEGIN;
            UPDATE hw SET hw = {cur} WHERE case_id = 0;
            INSERT INTO log VALUES (0, {prev}, {cur});
            COMMIT;""", cat)
        prev = cur
    atomic = True
    for entry in range(cat.latest_entry() + 1):
        pins = cat.snapshot(entry)
        if not {"hw", "log"} <= set(pins):
            continue
        hw_v = cat.read("hw", entry=entry).collect()[0].hw
        last = (cat.read("log", entry=entry).agg(
            F.coalesce(F.max("current"), F.lit(0))).collect()[0][0])
        atomic = atomic and hw_v == last
    log = cat.read("log")
    return (log.agg(
        F.count(F.lit(1)).alias("n_log"),
        F.min("current").alias("first_release"),
        F.max("current").alias("last_release"))
        .withColumn("hw_final",
                    F.lit(cat.read("hw").collect()[0].hw).cast("long"))
        .withColumn("atomic", F.lit(bool(atomic))))


ACID_TXN_SQL_ORACLE = ACID_MULTI_TXN_ORACLE


def acid_show_partitions(spark: SparkSession, sf_dir: str,
                         scratch: Path) -> DataFrame:
    """SHOW PARTITIONS through the SQL front door: one row per
    partition tuple with file/row counts from PURE manifest metadata
    (plus the small DV sidecar, so live-row counts stay exact after a
    merge-on-read delete — no data file opened at any table size). The
    oracle recomputes the per-partition census, pinning both the
    partition bookkeeping and the DV accounting."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..sources.tables import load_table

    path = scratch / f"acid_showp_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity")
          .withColumn("pmod", (F.col("l_orderkey") % 4).cast("int")))
    t = AcidTable.create(spark, path, li, partition_by=["pmod"],
                         enable_dv=True)
    t.delete_where_mor("pmod = 2 AND l_orderkey BETWEEN 100 AND 200")
    return acid_sql(spark, "SHOW PARTITIONS tbl", {"tbl": t})


ACID_SHOW_PARTITIONS_ORACLE = """
SELECT CAST(l_orderkey % 4 AS INT) AS pmod, 1 AS n_files,
       COUNT(*) AS n_rows
FROM lineitem
WHERE NOT (l_orderkey % 4 = 2 AND l_orderkey BETWEEN 100 AND 200)
GROUP BY 1
"""


# ------------------------------------ table_changes TVF + schema DDL

TC_DEL_LO, TC_DEL_HI = 40, 80


def acid_table_changes_sql(spark: SparkSession, sf_dir: str,
                           scratch: Path) -> DataFrame:
    """The change feed through its SQL spelling — Delta's
    ``table_changes('t', a[, b])`` table-valued function — composed
    with the round's schema DDL: the CDF table is widened by a
    pure-metadata ADD COLUMN, rows append and a band deletes, then a
    column is RENAMED (pure-metadata column-mapping commit). The feed
    ACROSS the rename is gated (Delta refuses CDF across
    column-mapping schema changes); the pre-rename epoch aggregates
    through the TVF's two-version form, and the ``gated`` column pins
    that the cross-epoch read refused loudly. The oracle recomputes
    every (version, change_type) census."""
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..sources.tables import load_table

    path = scratch / f"acid_tc_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity")
          .filter(F.col("l_orderkey") <= 200))
    t = AcidTable.create(spark, path, li, enable_cdf=True)
    tabs = {"tbl": t}
    acid_sql(spark, "ALTER TABLE tbl ADD COLUMN note string", tabs)  # v1
    acid_sql(spark, "INSERT INTO tbl (l_orderkey, l_quantity, note) "
                    "VALUES (900000001, 5.0, 'x'), "
                    "(900000002, 7.0, 'y')", tabs)                   # v2
    acid_sql(spark, f"DELETE FROM tbl WHERE l_orderkey BETWEEN "
                    f"{TC_DEL_LO} AND {TC_DEL_HI}", tabs)            # v3
    acid_sql(spark, "ALTER TABLE tbl RENAME COLUMN note TO tag",
             tabs)                                                   # v4
    # the WHOLE-feed read spans the rename: must refuse loudly
    try:
        acid_sql(spark,
                 "SELECT * FROM table_changes('tbl', 0)", tabs)
        gated = False
    except ValueError:
        gated = True
    return acid_sql(spark, """
        SELECT _commit_version AS version, _change_type AS change_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS qty
        FROM table_changes('tbl', 0, 3)
        GROUP BY _commit_version, _change_type
    """, tabs).withColumn("gated", F.lit(bool(gated)))


ACID_TABLE_CHANGES_ORACLE = f"""
WITH base AS (SELECT l_orderkey, l_quantity FROM lineitem
              WHERE l_orderkey <= 200),
deltas AS (
  SELECT 2 AS version, 'insert' AS change_type, l_quantity
  FROM (VALUES (5.0), (7.0)) AS a(l_quantity)
  UNION ALL
  SELECT 3, 'delete', l_quantity FROM base
  WHERE l_orderkey BETWEEN {TC_DEL_LO} AND {TC_DEL_HI})
  -- the rename at v4 is a PURE-METADATA column-mapping commit: no row
  -- changes, nothing in the feed; reads across it are gated
SELECT version, change_type, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       true AS gated
FROM deltas GROUP BY version, change_type
"""


# ------------------------------------------ partition-spec evolution

PE_OFF_A, PE_OFF_B = 100_000_000, 200_000_000


def acid_partition_evolution(spark: SparkSession, sf_dir: str,
                             scratch: Path) -> DataFrame:
    """Iceberg-style partition-spec EVOLUTION, value-pinned: the table
    starts partitioned by ``pmod``, appends under that spec, then
    ``set_partition_by(["half"])`` switches the spec as a PURE-METADATA
    commit — old files keep the tuples they were written with, new
    appends follow the new spec, and a DML pinned on the NEW spec
    prunes exactly as far as the metadata allows (new-spec files decide
    by tuple; old-spec files are conservatively scanned). The pinned
    ``*_files``/``*_scanned`` columns prove the mixed-spec discipline;
    the census oracle proves no row was wrongly pruned."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_pevo_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    df = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") <= 400)
          .select("l_orderkey", "l_quantity")
          .withColumn("pmod", (F.col("l_orderkey") % 4).cast("int"))
          .withColumn("half", (F.col("l_orderkey") % 2).cast("int")))
    t = AcidTable.create(spark, path, df, partition_by=["pmod"])
    t.append(df.filter(F.col("pmod") <= 1)
             .withColumn("l_orderkey",
                         F.col("l_orderkey") + F.lit(PE_OFF_A)))
    t.set_partition_by(["half"])               # metadata-only
    spec_meta = t._manifest(t.latest_version())["data"] == \
        t._manifest(t.latest_version() - 1)["data"]
    t.append(df.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(PE_OFF_B)))
    n_files = len(t._manifest(t.latest_version())["files"])
    t.delete_where(f"half = 1 AND l_orderkey >= {PE_OFF_B}")
    st = t.last_cow_stats
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"))
        .withColumn("spec_change_pure_metadata", F.lit(bool(spec_meta)))
        .withColumn("n_files", F.lit(n_files))
        .withColumn("delete_scanned", F.lit(st["files_scanned"]))
        .withColumn("delete_rewritten", F.lit(st["files_rewritten"])))


ACID_PEVO_ORACLE = f"""
WITH base AS (
  SELECT l_orderkey, l_quantity,
         CAST(l_orderkey % 4 AS INT) AS pmod,
         CAST(l_orderkey % 2 AS INT) AS half
  FROM lineitem WHERE l_orderkey <= 400),
fin AS (
  SELECT l_quantity FROM base
  UNION ALL
  SELECT l_quantity FROM base WHERE pmod <= 1
  UNION ALL
  SELECT l_quantity FROM base WHERE half = 0)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       TRUE AS spec_change_pure_metadata,
       8 AS n_files, 7 AS delete_scanned, 1 AS delete_rewritten
FROM fin
"""


# ------------------------------------------------- CONVERT TO ACID

CONV_DEL_LO, CONV_DEL_HI = 128, 256


def acid_convert(spark: SparkSession, sf_dir: str,
                 scratch: Path) -> DataFrame:
    """CONVERT TO ACID — the onboarding door (Delta's CONVERT TO
    DELTA): an existing plain-parquet directory becomes an AcidTable
    by REFERENCE — zero bytes copied (``zero_copy`` pins that every v0
    data file shares its inode with a source file), footers harvested
    once into the manifest stats index, and the full surface applies
    immediately: the banded DELETE right after the convert takes the
    file-pruned COW path off the harvested stats (``pruned`` pins
    untouched files carried by reference). With ``backfill_changes``
    this completes the migration story: any parquet lake walks into
    the format without a rewrite."""
    import os
    import shutil

    from ..acid import AcidTable
    from ..merge_sql import acid_sql
    from ..sources.tables import load_table

    src_dir = scratch / f"conv_src_{Path(sf_dir).name}"
    path = scratch / f"acid_conv_{Path(sf_dir).name}"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    (load_table(spark, sf_dir, "lineitem")
     .select("l_orderkey", "l_quantity")
     .repartitionByRange(4, "l_orderkey")
     .sortWithinPartitions("l_orderkey")
     .write.parquet(str(src_dir)))
    t = acid_sql(spark, f"CONVERT TO ACID '{src_dir}' AS conv "
                        f"LOCATION '{path}'", {})
    m = t._manifest(0)
    from ..acid import _entry_rel
    src_inodes = {os.stat(p).st_ino
                  for p in Path(src_dir).glob("*.parquet")}
    zero_copy = all(
        os.stat(t.path / _entry_rel(m, f)).st_ino in src_inodes
        for f in m["files"])
    n_files = len(m["files"])
    t.delete_where(
        f"l_orderkey BETWEEN {CONV_DEL_LO} AND {CONV_DEL_HI}")
    st = t.last_cow_stats
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("qty"))
        .withColumn("zero_copy", F.lit(bool(zero_copy)))
        .withColumn("n_files", F.lit(n_files))
        .withColumn("delete_pruned",
                    F.lit(st["files_linked"] > 0
                          and st["files_rewritten"] > 0)))


ACID_CONVERT_ORACLE = f"""
SELECT COUNT(*) FILTER (WHERE NOT (l_orderkey BETWEEN {CONV_DEL_LO}
         AND {CONV_DEL_HI})) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            FILTER (WHERE NOT (l_orderkey BETWEEN {CONV_DEL_LO}
              AND {CONV_DEL_HI})) AS DOUBLE) AS qty,
       TRUE AS zero_copy, 4 AS n_files, TRUE AS delete_pruned
FROM lineitem
"""


# ------------------------------------------------ round 10: scale metadata

CMAP_MAX_KEY = 400
CMAP_DEL_LO, CMAP_DEL_HI = 50, 80


def acid_column_mapping(spark: SparkSession, sf_dir: str,
                        scratch: Path) -> DataFrame:
    """RENAME/DROP COLUMN as PURE-METADATA commits (Delta columnMapping
    'name' mode), end-to-end: the physical parquet column name is
    frozen at birth and recorded in a logical→physical map, so a
    rename touches no data file at any table size. The scenario:
    create from lineitem → RENAME l_quantity→qty (pin: the file set is
    IDENTICAL across the commit) → INSERT through the mapping (new
    files write the frozen physical name) → DELETE binding the logical
    name → DROP l_returnflag → re-ADD it (pin: reads NULL — a fresh
    physical identity, never the dropped bytes) → time travel serves
    the old names. (Reference analog: the work tables evolve only by
    DDL re-creation, StreamingApp.scala:201-219 — this engine evolves
    in place.)"""
    import shutil

    from ..acid import AcidTable, _entry_name
    from ..merge_sql import acid_sql
    from ..sources.tables import load_table

    path = scratch / f"acid_cmap_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_returnflag")
          .filter(F.col("l_orderkey") <= CMAP_MAX_KEY))
    t = AcidTable.create(spark, path, li)
    tabs = {"tbl": t}
    names0 = {_entry_name(f) for f in t._manifest(0)["files"]}
    acid_sql(spark, "ALTER TABLE tbl RENAME COLUMN l_quantity TO qty",
             tabs)                                               # v1
    m1 = t._manifest(1)
    metadata_only = (m1["op"] == "rename_column" and
                     {_entry_name(f) for f in m1["files"]} == names0)
    acid_sql(spark, "INSERT INTO tbl (l_orderkey, qty, l_returnflag) "
                    "VALUES (900000001, 5.0, 'through-mapping')",
             tabs)                                               # v2
    acid_sql(spark, f"DELETE FROM tbl WHERE l_orderkey BETWEEN "
                    f"{CMAP_DEL_LO} AND {CMAP_DEL_HI}", tabs)    # v3
    acid_sql(spark, "ALTER TABLE tbl DROP COLUMN l_returnflag", tabs)  # v4
    t.add_column("l_returnflag", "string")                          # v5
    null_readd = (t.read().filter("l_returnflag IS NOT NULL").count() == 0)
    tt_ok = (t.read(0).columns
             == ["l_orderkey", "l_quantity", "l_returnflag"])
    mapping = t._props().get("column_mapping", {})
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("qty").cast("decimal(18,2)"))
         .cast("double").alias("qty_sum"))
        .withColumn("metadata_only", F.lit(bool(metadata_only)))
        .withColumn("mapping_ok",
                    F.lit(mapping.get("qty") == "l_quantity"))
        .withColumn("null_readd", F.lit(bool(null_readd)))
        .withColumn("time_travel_ok", F.lit(bool(tt_ok))))


ACID_COLUMN_MAPPING_ORACLE = f"""
WITH live AS (
  SELECT l_orderkey, l_quantity AS qty FROM lineitem
  WHERE l_orderkey <= {CMAP_MAX_KEY}
    AND NOT (l_orderkey BETWEEN {CMAP_DEL_LO} AND {CMAP_DEL_HI})
  UNION ALL SELECT 900000001, 5.0)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
       TRUE AS metadata_only, TRUE AS mapping_ok,
       TRUE AS null_readd, TRUE AS time_travel_ok
FROM live
"""


def acid_cdf_mapped(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """Change feed ACROSS a column-mapping RENAME — the schema-tracking
    read (Delta's schemaTrackingLocation semantics, served from the
    table's own logical→physical map): create a CDF table from
    lineitem → append → RENAME l_quantity→qty (pure metadata) →
    append through the new name → DELETE — then ``read_changes_mapped``
    serves ONE feed over the whole span in the target (renamed)
    schema, pre-rename values carried through the frozen physical
    identity (never NULLed, never resurrected). Pins: per-type
    counts/sums of the feed AND the mapped multiset contract
    read_mapped(0) ⊎ inserts ∖ deletes == read_mapped(latest),
    verified with two distributed exceptAlls. (Reference analog:
    schema DDL on the work tables, StreamingApp.scala:140-259.)"""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_cdfmap_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity")
          .filter(F.col("l_orderkey") <= CMAP_MAX_KEY))
    t = AcidTable.create(spark, path, li.filter("l_orderkey % 7 = 0"),
                         enable_cdf=True)
    t.append(li.filter("l_orderkey % 7 = 1"))                    # v1
    t.rename_column("l_quantity", "qty")                         # v2
    t.append(li.filter("l_orderkey % 7 = 2")
             .withColumnRenamed("l_quantity", "qty"))            # v3
    t.delete_where("l_orderkey % 3 = 0")                         # v4
    feed = t.read_changes_mapped(0, 4)
    # mapped multiset contract, distributed: base ⊎ ins ∖ dels == final
    ins = feed.filter("_change_type = 'insert'").drop(
        "_change_type", "_commit_version")
    dels = feed.filter("_change_type = 'delete'").drop(
        "_change_type", "_commit_version")
    lhs = t.read_mapped(0, 4).unionByName(ins).exceptAll(dels)
    rhs = t.read_mapped(4, 4)
    contract_ok = (lhs.exceptAll(rhs).count() == 0
                   and rhs.exceptAll(lhs).count() == 0)
    return (feed.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("qty").cast("decimal(18,2)"))
                  .cast("double").alias("qty_sum"))
            .withColumn("contract_ok", F.lit(bool(contract_ok)))
            .orderBy("_change_type"))


ACID_CDF_MAPPED_ORACLE = f"""
WITH sub AS (
  SELECT l_orderkey, l_quantity AS qty FROM lineitem
  WHERE l_orderkey <= {CMAP_MAX_KEY}),
ins AS (
  SELECT * FROM sub WHERE l_orderkey % 7 IN (1, 2)),
dels AS (
  SELECT * FROM sub
  WHERE l_orderkey % 7 IN (0, 1, 2) AND l_orderkey % 3 = 0)
SELECT * FROM (
  SELECT 'insert' AS _change_type, COUNT(*) AS n,
         CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
         TRUE AS contract_ok
  FROM ins
  UNION ALL
  SELECT 'delete', COUNT(*),
         CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE), TRUE
  FROM dels)
ORDER BY _change_type
"""


def acid_checkpoint(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """O(delta) manifest encoding + the PARQUET CHECKPOINT (Delta's
    _checkpoint discipline): each commit's manifest records only its
    adds/removes against the parent (metadata cost scales with the
    batch, never the table); every CHECKPOINT_EVERY commits the
    materialized file list lands in ONE columnar file, so a cold
    reader resolves the snapshot in one IO instead of replaying the
    chain. Pins: the periodic checkpoint EXISTS; resolving through it
    yields the SAME file set as the pure chain replay (checkpoint
    moved aside, caches cleared); post-v0 manifests are delta-encoded;
    and the snapshot content matches the oracle. At the 100 TB
    contract's 100k-file tables this is what keeps commits and cold
    reads O(delta)/O(1)-IO."""
    import json as _json
    import shutil

    from ..acid import (CHECKPOINT_EVERY, AcidTable, _FILES_CACHE,
                        _checkpoint_path, resolve_manifest_files)
    from ..sources.tables import load_table

    path = scratch / f"acid_ckpt_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(spark, path, od.filter("o_orderkey % 13 = 0"))
    for k in range(1, 13):                        # v1..v12
        t.append(od.filter(f"o_orderkey % 13 = {k}"))
    v = t.latest_version()
    ckv = (v // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
    ck = _checkpoint_path(t.path, ckv)
    ck_exists = ck.exists()
    raw_latest = _json.loads((t._manifests / f"v{v}.json").read_text())
    delta_encoded = "files_base" in raw_latest
    m_ck = _json.loads((t._manifests / f"v{ckv}.json").read_text())
    ck_matches = False
    if ck_exists:
        _FILES_CACHE.clear()
        via_ckpt = {f["path"]
                    for f in resolve_manifest_files(t.path, m_ck)}
        aside = ck.with_suffix(".aside")
        ck.rename(aside)                  # force the pure chain replay
        try:
            _FILES_CACHE.clear()
            replay = {f["path"]
                      for f in resolve_manifest_files(t.path, m_ck)}
        finally:
            aside.rename(ck)
            _FILES_CACHE.clear()
        ck_matches = bool(via_ckpt) and via_ckpt == replay
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("price_sum"))
        .withColumn("ckpt_exists", F.lit(bool(ck_exists)))
        .withColumn("ckpt_matches_replay", F.lit(bool(ck_matches)))
        .withColumn("delta_encoded", F.lit(bool(delta_encoded))))


ACID_CHECKPOINT_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       TRUE AS ckpt_exists, TRUE AS ckpt_matches_replay,
       TRUE AS delta_encoded
FROM orders
"""

def acid_liquid_optimize(spark: SparkSession, sf_dir: str,
                         scratch: Path) -> DataFrame:
    """Incremental clustering (Delta liquid clustering's OPTIMIZE
    shape; reference analog: the nightly Solr re-index the worker
    pipeline replaces, FileWorkerApp.scala:94-117 — maintenance must
    not scale with the corpus). ``optimize_incremental(cols)`` rewrites
    ONLY files not already range-clustered on ``cols`` — a metadata
    decision via the ``sort`` provenance stamped on manifest entries —
    and carries clustered files by reference, so clustering maintenance
    is O(arrivals), never O(table). Pins: only the stale files were
    rewritten (clustered files carried BY PATH), every entry ends
    stamped, range pruning tightens back to (or below) the pre-append
    file count, a second run is a no-op WITHOUT a commit, and the
    content is byte-identical to the oracle."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_liquid_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(spark, path, od.filter("o_orderkey % 3 = 0"))
    t.relayout(["o_orderkey"], target_files=4)               # v1
    t.append(od.filter("o_orderkey % 3 = 1"))                # v2
    t.append(od.filter("o_orderkey % 3 = 2"))                # v3
    m3 = t._manifest(3)
    keep_paths = {f["path"] for f in m3["files"]
                  if f.get("sort") == ["o_orderkey"]}
    n_stale = sum(1 for f in m3["files"]
                  if f.get("sort") != ["o_orderkey"])
    lo, hi = 1000, 2000
    before = len(t.pruned_files("o_orderkey", lo, hi)[0])

    v4 = t.optimize_incremental(["o_orderkey"], target_files=4)

    m4 = t._manifest(v4)
    after = len(t.pruned_files("o_orderkey", lo, hi)[0])
    stats = dict(t.last_optimize_stats)
    noop_v = t.optimize_incremental(["o_orderkey"], target_files=4)
    ok_scope = (stats == {"files_rewritten": n_stale,
                          "files_carried": len(keep_paths)}
                and keep_paths <= {f["path"] for f in m4["files"]})
    ok_stamped = all(f.get("sort") == ["o_orderkey"]
                     for f in m4["files"])
    ok_pruning = after < before
    ok_noop = (noop_v == v4 and t.latest_version() == v4)
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("price_sum"))
        .withColumn("only_stale_rewritten", F.lit(bool(ok_scope)))
        .withColumn("all_stamped", F.lit(bool(ok_stamped)))
        .withColumn("pruning_tightened", F.lit(bool(ok_pruning)))
        .withColumn("second_run_noop", F.lit(bool(ok_noop))))


ACID_LIQUID_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       TRUE AS only_stale_rewritten, TRUE AS all_stamped,
       TRUE AS pruning_tightened, TRUE AS second_run_noop
FROM orders
"""

def acid_bloom_index(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """Per-file bloom-filter index for point lookups (Delta's bloom
    filter index; reference analog: the Solr hash-lookup the worker
    pipeline consults per file, FileWorkerApp.scala:129-141 — a
    needle-in-haystack membership probe that must not scan the
    corpus). [min, max] stats are useless on a high-cardinality
    unclustered column (every file's range spans the space), so
    ``bloom_by`` columns get a per-file bitset sidecar built in ONE
    distributed pass over each commit's new files; ``read_eq`` skips
    files whose bitset proves the value absent — KBs of sidecar read
    instead of the file. Pins: a present-value lookup opens a strict
    minority of files and returns exactly the oracle rows; an absent
    value skips EVERY file; the false-negative-free contract holds for
    a sample of present keys; vacuum keeps sidecars alive with their
    data files."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_bloom_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey",
                  F.md5(F.col("o_orderkey").cast("string"))
                   .alias("order_hash"),
                  "o_totalprice"))
    t = AcidTable.create(spark, path, od.filter("o_orderkey % 4 = 0"),
                         bloom_by=["order_hash"])
    for k in (1, 2, 3):
        t.append(od.filter(f"o_orderkey % 4 = {k}"))
    t.vacuum(keep_last=1, orphan_grace_s=0.0)
    probe = od.orderBy("o_orderkey").limit(6).collect()
    needle = probe[0].order_hash

    paths, total = t.pruned_files_eq("order_hash", needle)
    skipped_some = 0 < len(paths) < total
    absent_all_skipped = (
        t.pruned_files_eq("order_hash", "absent")[0] == [])
    # no-false-negative audit over ALL sample keys in ONE Spark job:
    # the batched prune reads each sidecar once for every needle
    # (read_eq_any), instead of K serial point-lookup jobs
    hashes = [r.order_hash for r in probe]
    found = {r.order_hash: r.n for r in
             (t.read_eq_any("order_hash", hashes)
              .groupBy("order_hash")
              .agg(F.count(F.lit(1)).alias("n")).collect())}
    no_false_neg = all(found.get(h) == 1 for h in hashes)
    return (t.read_eq("order_hash", needle)
            .select("o_orderkey", "order_hash",
                    F.col("o_totalprice").cast("decimal(18,2)")
                     .cast("double").alias("price"))
            .withColumn("skipped_files", F.lit(bool(skipped_some)))
            .withColumn("absent_skips_all",
                        F.lit(bool(absent_all_skipped)))
            .withColumn("no_false_negatives",
                        F.lit(bool(no_false_neg))))


ACID_BLOOM_ORACLE = """
SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS order_hash,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       TRUE AS skipped_files, TRUE AS absent_skips_all,
       TRUE AS no_false_negatives
FROM orders
WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
"""

def acid_cdf_update_images(spark: SparkSession, sf_dir: str,
                           scratch: Path) -> DataFrame:
    """Delta CDF UPDATE image types, opt-in per table
    (``cdf_update_images``): a COW UPDATE records its CHANGED rows as
    update_preimage/update_postimage pairs instead of delete/insert
    (unchanged rows cancel in the diff and never appear — Delta's
    contract), while ``normalize_change_types`` folds the feed back to
    the two-type algebra so every multiset consumer (IVM, contract
    checks) is unaffected. (Reference analog: the status-transition
    UPDATE audit, StreamingApp.scala:204-228 — who changed, from what,
    to what.) Pins: the labeled feed matches the oracle's
    reconstructed pre/post rows exactly, and the normalized multiset
    contract read(v0) + inserts - deletes == read(v1) holds."""
    import shutil

    from ..acid import AcidTable, normalize_change_types
    from ..sources.tables import load_table

    path = scratch / f"acid_cdf_img_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .filter("o_orderkey % 7 = 0"))
    t = AcidTable.create(spark, path, od, enable_cdf=True,
                         cdf_update_images=True)
    t.update_where({"o_totalprice": "o_totalprice + 1"},
                   "o_orderkey % 14 = 0")
    ch = t.read_changes(0, 1)
    norm = normalize_change_types(ch)
    ins = (norm.filter("_change_type = 'insert'")
           .select("o_orderkey", "o_totalprice"))
    dels = (norm.filter("_change_type = 'delete'")
            .select("o_orderkey", "o_totalprice"))
    lhs = t.read(0).unionByName(ins).exceptAll(dels)
    contract = (lhs.exceptAll(t.read(1)).count() == 0
                and t.read(1).exceptAll(lhs).count() == 0)
    return (ch.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)")
         .cast("double").alias("price"),
        F.col("_change_type").alias("change_type"))
        .withColumn("contract_holds", F.lit(bool(contract))))


ACID_CDF_IMAGES_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       'update_preimage' AS change_type, TRUE AS contract_holds
FROM orders WHERE o_orderkey % 14 = 0
UNION ALL
SELECT o_orderkey,
       CAST(CAST(o_totalprice + 1 AS DECIMAL(18,2)) AS DOUBLE),
       'update_postimage', TRUE
FROM orders WHERE o_orderkey % 14 = 0
"""

def acid_generated_columns(spark: SparkSession, sf_dir: str,
                           scratch: Path) -> DataFrame:
    """Generated columns (Delta GENERATED ALWAYS AS; reference analog:
    the derived seq/topic columns every insert recomputes,
    StreamingApp.scala:171-199): declared once at CREATE, computed at
    write time for any writer that omits them, validated by an
    implicit cross-dialect CHECK for any writer that provides them —
    and usable as the PARTITION key, the canonical 100-TB shape
    (partition by a derived bucket/day; writers just append facts;
    every pruner works off recorded tuples). Pins: appends without the
    column materialize it; the partition-pinned DML find pass scans a
    strict subset of files; a wrong explicit value is REFUSED; content
    equals the oracle's recomputation."""
    import shutil

    from ..acid import AcidTable, ConstraintViolation
    from ..sources.tables import load_table

    path = scratch / f"acid_gen_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(spark, path, od.filter("o_orderkey % 2 = 0"),
                         generated={"o_bucket": "o_orderkey % 8"},
                         partition_by=["o_bucket"])
    t.append(od.filter("o_orderkey % 2 = 1"))   # no o_bucket supplied
    total = len(t._manifest(t.latest_version())["files"])
    t.delete_where("o_bucket = 3 AND o_totalprice < 0")   # no-op rows,
    pruned_find = t.last_cow_stats["files_scanned"] < total
    refused = False
    try:
        t.append(spark.createDataFrame(
            [(2, 1.0, 777)],
            "o_orderkey long, o_totalprice double, o_bucket long"))
    except ConstraintViolation:
        refused = True
    return (t.read()
            .groupBy("o_bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .cast("double").alias("price_sum"))
            .withColumn("pruned_find", F.lit(bool(pruned_find)))
            .withColumn("bad_value_refused", F.lit(bool(refused))))


ACID_GENERATED_ORACLE = """
SELECT o_orderkey % 8 AS o_bucket, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       TRUE AS pruned_find, TRUE AS bad_value_refused
FROM orders
GROUP BY o_orderkey % 8
"""

def acid_compact_small(spark: SparkSession, sf_dir: str,
                       scratch: Path) -> DataFrame:
    """Small-file compaction (Delta auto-compaction's minFileSize/
    minNumFiles primitive; reference analog: the chunked file-sink's
    16 MB segments, FileChunkSink.scala:18-40 — steady small-file
    pressure is the sink's natural output shape). Candidates are a
    pure manifest decision off recorded sizes: rewrite only files
    under the threshold, carry full-size files by reference —
    O(small files) maintenance at any table size. Pins: only the
    small files merged (big files carried BY PATH), a second run is a
    no-op without a commit, content equality."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_csml_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(spark, path,
                         od.filter("o_orderkey % 6 = 0").coalesce(1))
    for k in range(1, 6):                 # 5 small appends
        t.append(od.filter(f"o_orderkey % 6 = {k}").coalesce(1))
    m = t._manifest(t.latest_version())
    sizes = sorted(f["bytes"] for f in m["files"])
    cutoff = sizes[-1]                    # keep only the biggest file
    big = {f["path"] for f in m["files"] if f["bytes"] >= cutoff}

    v = t.compact_small(max_bytes=cutoff, target_files=1)

    m2 = t._manifest(v)
    stats = dict(t.last_optimize_stats)
    ok_scope = (stats["files_carried"] == len(big)
                and big <= {f["path"] for f in m2["files"]}
                and len(m2["files"]) == len(big) + 1)
    noop = (t.compact_small(max_bytes=cutoff) == v
            and t.latest_version() == v)
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("price_sum"))
        .withColumn("only_small_rewritten", F.lit(bool(ok_scope)))
        .withColumn("second_run_noop", F.lit(bool(noop))))


ACID_COMPACT_SMALL_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       TRUE AS only_small_rewritten, TRUE AS second_run_noop
FROM orders
"""

def acid_reader_features(spark: SparkSession, sf_dir: str,
                         scratch: Path) -> DataFrame:
    """Reader-feature protocol gate (Delta readerFeatures; reference
    analog: the schema_version column every worker checks before
    touching a case row, FileWorkerApp.scala:58-63). Commits that make
    the table depend on a read-semantics feature (column mapping,
    deletion vectors, CDF update images) record it in
    props.reader_features; a build that lacks a declared feature
    refuses EVERY access with the feature named — a misread (physical
    column names, resurrected deleted rows) is never possible on a
    gradually-upgrading fleet. Pins: features auto-record exactly when
    first used; a declared-but-unknown feature gates reads AND the
    SparkSession-free planner; known features pass; content equality."""
    import json as _json
    import shutil

    from ..acid import AcidTable, UnsupportedTableFeature
    from ..sources.pysource import _walk_props
    from ..sources.tables import load_table

    path = scratch / f"acid_feat_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(spark, path, od, enable_dv=True)
    t.delete_where_mor("o_orderkey % 100 = 7")
    t.rename_column("o_totalprice", "price")
    recorded = set(t._props().get("reader_features", ())) == {
        "column_mapping", "deletion_vectors"}

    mp = t._manifests / f"v{t.latest_version()}.json"
    saved = mp.read_text()
    m = _json.loads(saved)
    m["props"] = {**m["props"],
                  "reader_features": ["from_the_future"]}
    mp.write_text(_json.dumps(m))
    gated = planner_gated = False
    try:
        t.read().count()
    except UnsupportedTableFeature:
        gated = True
    try:
        _walk_props(t.path)
    except UnsupportedTableFeature:
        planner_gated = True
    mp.write_text(saved)                      # restore: features known

    return (t.read()
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("price").cast("decimal(18,2)"))
                  .cast("double").alias("price_sum"))
            .withColumn("features_recorded", F.lit(bool(recorded)))
            .withColumn("unknown_feature_gates", F.lit(bool(gated)))
            .withColumn("planner_gates", F.lit(bool(planner_gated))))


ACID_READER_FEATURES_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       TRUE AS features_recorded, TRUE AS unknown_feature_gates,
       TRUE AS planner_gates
FROM orders
WHERE o_orderkey % 100 != 7
"""


def acid_merge_evolve(spark: SparkSession, sf_dir: str,
                      scratch: Path) -> DataFrame:
    """MERGE schema evolution (Delta ``withSchemaEvolution``): one
    widening MERGE both updates matched keys AND adds a source-only
    ``tier`` column to the table schema in the same commit — carried
    target rows read NULL there, time travel keeps the pre-merge
    width, and the recorded CDF for the widened commit serves at the
    new width. The oracle recomputes the merged table and the change
    counts from the same orders parquet in DuckDB."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_evolve_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    o = (load_table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_totalprice"))
    t = AcidTable.create(
        spark, path,
        o.repartitionByRange(N_RANGE_FILES, "o_orderkey")
         .sortWithinPartitions("o_orderkey"),
        enable_cdf=True)
    tier = (F.when(F.col("o_totalprice") > 100000, "big")
            .otherwise("small"))
    # tier binds the ORIGINAL price (compute before the price bump —
    # the oracle does the same); the bumped price casts back to the
    # table's exact decimal type (shared columns must agree on type)
    ptype = dict(o.dtypes)["o_totalprice"]
    matched = (o.filter(F.col("o_orderkey") % 10 == 0)
               .withColumn("tier", tier)
               .withColumn("o_totalprice",
                           (F.col("o_totalprice") + 1000).cast(ptype)))
    inserted = (o.filter(F.col("o_orderkey") % 10 == 7)
                .withColumn("o_orderkey",
                            F.col("o_orderkey") + 900000000)
                .withColumn("tier", tier)
                .withColumn("o_totalprice",
                            (F.col("o_totalprice") + 1000).cast(ptype)))
    v = t.merge(matched.unionByName(inserted), ["o_orderkey"],
                evolve_schema=True)
    assert t.read(v - 1).columns == ["o_orderkey", "o_totalprice"]
    ch = t.read_changes(v - 1, v)
    n_ins = ch.filter("_change_type = 'insert'").count()
    n_del = ch.filter("_change_type = 'delete'").count()
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("total_price"),
        F.count(F.when(F.col("tier") == "big", 1)).alias("n_big"),
        F.count(F.when(F.col("tier").isNull(), 1)).alias("n_null_tier"))
        .withColumn("cdf_inserts", F.lit(n_ins).cast("long"))
        .withColumn("cdf_deletes", F.lit(n_del).cast("long"))
        .withColumn("n_cols", F.lit(len(t.read().columns))
                    .cast("int")))


ACID_MERGE_EVOLVE_ORACLE = """
WITH src AS (
  SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice,
         CASE WHEN o_totalprice > 100000 THEN 'big'
              ELSE 'small' END AS tier
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 900000000, o_totalprice + 1000,
         CASE WHEN o_totalprice > 100000 THEN 'big'
              ELSE 'small' END
  FROM orders WHERE o_orderkey % 10 = 7),
tgt AS (SELECT o_orderkey, o_totalprice FROM orders),
merged AS (
  SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
         s.tier AS tier
  FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey),
counts AS (
  SELECT COUNT(*) FILTER (WHERE o_orderkey % 10 = 0) AS n_matched,
         COUNT(*) FILTER (WHERE o_orderkey % 10 = 7) AS n_new
  FROM orders)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       COUNT(*) FILTER (WHERE tier = 'big') AS n_big,
       COUNT(*) FILTER (WHERE tier IS NULL) AS n_null_tier,
       (SELECT n_matched + n_new FROM counts) AS cdf_inserts,
       (SELECT n_matched FROM counts) AS cdf_deletes,
       3 AS n_cols
FROM merged
"""


def acid_zorder_incremental(spark: SparkSession, sf_dir: str,
                            scratch: Path) -> DataFrame:
    """Morton ZORDER with built-in incremental maintenance (OPTIMIZE t
    ZORDER BY (a, b) — Delta's multi-dimensional clustering, extended
    with the liquid O(arrivals) maintenance shape). Pins: the first
    run rewrites everything and stamps curve provenance; arrivals are
    the ONLY files the second run rewrites (tiles carried BY PATH); a
    2-D range query's candidate set (files surviving BOTH single-dim
    prunes) tightens back after maintenance; a third run is a no-op
    without a commit; content stays byte-identical to the oracle."""
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table

    path = scratch / f"acid_zorder_{Path(sf_dir).name}"
    shutil.rmtree(path, ignore_errors=True)
    od = (load_table(spark, sf_dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"))
    t = AcidTable.create(spark, path,
                         od.filter("o_orderkey % 3 > 0").repartition(4))
    v1 = t.zorder(["o_custkey", "o_totalprice"], target_files=8)
    m1 = t._manifest(v1)
    ok_first = (t.last_optimize_stats["files_carried"] == 0
                and all(f.get("zorder") == ["o_custkey", "o_totalprice"]
                        for f in m1["files"]))
    tiles = {f["path"] for f in m1["files"]}

    def cands():
        a = set(t.pruned_files("o_custkey", 100, 400)[0])
        b = set(t.pruned_files("o_totalprice", 50_000, 90_000)[0])
        return len(a & b)
    tiled = cands()
    t.append(od.filter("o_orderkey % 3 = 0").repartition(3))
    polluted = cands()
    v3 = t.zorder(["o_custkey", "o_totalprice"], target_files=2)
    stats = dict(t.last_optimize_stats)
    m3 = t._manifest(v3)
    ok_scope = (stats == {"files_rewritten": 3,
                          "files_carried": len(tiles)}
                and tiles <= {f["path"] for f in m3["files"]})
    ok_pruning = cands() <= polluted and tiled <= polluted
    ok_noop = (t.zorder(["o_custkey", "o_totalprice"]) == v3
               and t.latest_version() == v3)
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
         .cast("double").alias("price_sum"),
        F.sum("o_custkey").alias("cust_sum"))
        .withColumn("first_run_full_and_stamped",
                    F.lit(bool(ok_first)))
        .withColumn("arrivals_only_rewritten", F.lit(bool(ok_scope)))
        .withColumn("pruning_recovered", F.lit(bool(ok_pruning)))
        .withColumn("third_run_noop", F.lit(bool(ok_noop))))


ACID_ZORDER_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS price_sum,
       SUM(o_custkey) AS cust_sum,
       TRUE AS first_run_full_and_stamped,
       TRUE AS arrivals_only_rewritten,
       TRUE AS pruning_recovered,
       TRUE AS third_run_noop
FROM orders
"""


def acid_wap_publish(spark: SparkSession, sf_dir: str,
                     scratch: Path) -> DataFrame:
    """WRITE-AUDIT-PUBLISH over named catalog refs (Iceberg's WAP /
    Nessie branch pattern; reference analog: the staged claim/status
    machine, FileWorkerApp.scala:207-227 — work becomes visible only
    at the status flip). A branch takes the writes, a data-quality
    audit gates them, and `publish` fast-forwards the MAIN catalog
    pointer in one atomic entry.

    Script: tag v0 → fork branch `wap` → branch commit claims the 5
    lowest available files AND inserts an out-of-contract row
    (status=9) → audit ("no status outside the state machine") FAILS
    → main readers still serve v0 (pinned) → branch commit deletes the
    bad row → audit passes → publish (one pointer CAS) → main serves
    the branch head; tag v0 still time-travels by name. Pins
    (in-result booleans): audit_blocked, main_was_unchanged after the
    failed audit, tag_ok after publish."""
    import shutil

    from ..acid_catalog import AcidCatalog, AuditFailed
    from ..sources.tables import load_table
    from .queue import queue_df

    root = scratch / f"acid_wap_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 0)
             .select("file_id", "status"))
    cat = AcidCatalog(spark, root)
    cat.create_table("q", state)
    cat.tag("v0")
    v0_census = {(r.status, r.n) for r in
                 (cat.read("q").groupBy("status")
                  .agg(F.count(F.lit(1)).alias("n")).collect())}

    br = cat.branch("wap")
    low5 = (br.read("q").filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    br.commit_multi({"q": ("merge",
                           low5.select("file_id",
                                       F.lit(1).alias("status"))
                           .unionByName(spark.createDataFrame(
                               [(999999909, 9)],
                               "file_id long, status int")),
                           ["file_id"])})

    def audit(b) -> bool:
        return b.read("q").filter(
            "status NOT IN (0, 1, 2, 3)").count() == 0

    audit_blocked = False
    try:
        cat.publish("wap", audit=audit)
    except AuditFailed:
        audit_blocked = True
    main_census = {(r.status, r.n) for r in
                   (cat.read("q").groupBy("status")
                    .agg(F.count(F.lit(1)).alias("n")).collect())}
    main_was_unchanged = main_census == v0_census

    br.commit_multi({"q": ("delete", "status NOT IN (0, 1, 2, 3)")})
    cat.publish("wap", audit=audit)         # passes: one pointer CAS

    tag_census = {(r.status, r.n) for r in
                  (cat.read_tag("v0", "q").groupBy("status")
                   .agg(F.count(F.lit(1)).alias("n")).collect())}
    tag_ok = tag_census == v0_census
    return (cat.read("q").groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"))
            .withColumn("audit_blocked", F.lit(bool(audit_blocked)))
            .withColumn("main_was_unchanged",
                        F.lit(bool(main_was_unchanged)))
            .withColumn("tag_ok", F.lit(bool(tag_ok))))


ACID_WAP_ORACLE = """
WITH queue AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 0),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
final AS (SELECT file_id,
                 CASE WHEN file_id IN (SELECT file_id FROM low5)
                      THEN 1 ELSE status END AS status
          FROM queue)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id,
       TRUE AS audit_blocked, TRUE AS main_was_unchanged,
       TRUE AS tag_ok
FROM final GROUP BY status
"""


def acid_ref_retention(spark: SparkSession, sf_dir: str,
                       scratch: Path) -> DataFrame:
    """REF-AWARE RETENTION (round 14): catalog refs — the latest
    catalog entry, tags, branch heads — are retention ROOTS vacuum
    must honor (Iceberg expire-snapshots-respects-refs), so a WAP
    audit parked past the retention window still publishes and a tag
    keeps time-traveling; a DELIBERATE ``expire_tag`` releases the
    pinned files at the next vacuum. (Reference analog: ``desh_files``
    rows surviving until the worker finishes —
    FileWorkerApp.scala:207-227 — the claim outlives any GC cadence.)

    Script: seed `q` → tag rel0 → branch `park` claims the 5 lowest
    available files → three direct (unpinned) table appends push the
    table's latest FAR past both pins → ``vacuum(keep_last=1)`` —
    aggressive, but the tag pin (v0), the main entry pin (v0), and the
    branch head pin (v1) all survive as roots → the tag still reads,
    the parked audit+publish lands → ``expire_tag`` + vacuum → the
    tag's version is GONE (loud VersionVacuumedError). Pins
    (in-result booleans): tag_survived_vacuum, publish_ok,
    released_after_expire."""
    import shutil

    from ..acid import CommitConflict, VersionVacuumedError
    from ..acid_catalog import AcidCatalog, AuditFailed
    from ..sources.tables import load_table
    from .queue import queue_df

    root = scratch / f"acid_refret_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 1)
             .select("file_id", "status"))
    cat = AcidCatalog(spark, root)
    cat.create_table("q", state)
    cat.tag("rel0")
    v0_census = {(r.status, r.n) for r in
                 (cat.read("q").groupBy("status")
                  .agg(F.count(F.lit(1)).alias("n")).collect())}

    br = cat.branch("park")
    low5 = (br.read("q").filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    br.commit_multi({"q": ("merge",
                           low5.select("file_id",
                                       F.lit(1).alias("status")),
                           ["file_id"])})                    # q v1
    t = cat.table("q")
    for i in range(3):              # unpinned direct writers: latest
        t.append(spark.createDataFrame(                    # v2..v4
            [(900000201 + i, 0)], "file_id long, status int"))
    t.vacuum(keep_last=1)           # aggressive; refs are roots

    tag_census = {(r.status, r.n) for r in
                  (cat.read_tag("rel0", "q").groupBy("status")
                   .agg(F.count(F.lit(1)).alias("n")).collect())}
    tag_survived = tag_census == v0_census
    publish_ok = True
    try:
        cat.publish("park", audit=lambda b: b.read("q")
                    .filter("status NOT IN (0, 1, 2, 3)").count() == 0)
    except (AuditFailed, CommitConflict):
        # the two CONTRACT failures a parked publish can legitimately
        # hit (oracle pins publish_ok=TRUE, so either is caught) —
        # anything else should surface with its own traceback, not
        # vanish into a boolean (r14 VERDICT cosmetic)
        publish_ok = False

    cat.expire_tag("rel0")          # deliberate release
    t.vacuum(keep_last=1)
    released = False
    try:                 # the ref is gone AND its version's files are
        t.read(0).count()
    except (VersionVacuumedError, FileNotFoundError):
        released = not (root / "refs" / "tags" / "rel0.json").exists()
    return (cat.read("q").groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"))
            .withColumn("tag_survived_vacuum", F.lit(bool(tag_survived)))
            .withColumn("publish_ok", F.lit(bool(publish_ok)))
            .withColumn("released_after_expire", F.lit(bool(released))))


def acid_autovacuum(spark: SparkSession, sf_dir: str,
                    scratch: Path) -> DataFrame:
    """AUTOVACUUM (round 15): the retention twin of autocompact — a
    fenced maintenance drain (12 append_txn batches with periodic COW
    retention deletes) on a table that opted into
    ``set_autovacuum(every=6, keep_last=2)``, the hook invoked
    post-commit exactly as the index maintainers and the
    SparkSession-free sink do. Pins (in-result booleans):
    ``vacuum_ran`` (the write-ahead vacuum ledger exists and names
    reclaimed paths — COW deletes strand replaced files, autovacuum
    reclaims them), ``fence_ok`` (a replayed batch id still commits
    nothing — the cumulative txns map rides manifests, which vacuum
    never deletes), ``cdf_ok`` (the change feed serves the WHOLE drain
    after the vacuums: recorded change files are retained by default,
    and property commits record empty change sets). The row census is
    the DuckDB-checked value surface. (Reference analog: the
    ``desh_files`` cleanup cadence, FileWorkerApp.scala:207-227 —
    bounded state under a forever-running loop.)"""
    import json as _json
    import shutil

    from ..acid import AcidTable
    from ..sources.tables import load_table
    from .queue import queue_df

    root = scratch / f"acid_autovac_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 3)
             .select("file_id", "status"))
    t = AcidTable.create(spark, root, state.limit(0), enable_cdf=True)
    t.set_autocompact(max_bytes=8 << 20, min_files=8)
    t.set_autovacuum(every=6, keep_last=2)
    for b in range(12):
        t.append_txn(state.filter(F.col("file_id") % 12 == b),
                     "drain", b)
        if b in (3, 7, 11):
            # retention DELETE of the slice appended two batches ago
            # (fully present, never re-appended) — a COW rewrite that
            # strands its replaced files for autovacuum to reclaim
            t.delete_where(f"file_id % 12 = {b - 2}")
        t.maybe_autocompact()
        t.maybe_autovacuum()
    ledger = root / "manifests" / "_vacuumed.jsonl"
    vacuum_ran = ledger.exists() and any(
        _json.loads(line).get("paths")
        for line in ledger.read_text().splitlines() if line)
    fence_ok = t.append_txn(state.limit(1), "drain", 5) is None
    latest = t.latest_version()
    n_appended = state.count()
    cdf_ok = (t.read_changes(0, latest)
              .filter("_change_type = 'insert'")
              .count() == n_appended)
    return (t.read().groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"))
            .withColumn("vacuum_ran", F.lit(bool(vacuum_ran)))
            .withColumn("fence_ok", F.lit(bool(fence_ok)))
            .withColumn("cdf_ok", F.lit(bool(cdf_ok))))


ACID_AUTOVACUUM_ORACLE = """
WITH q AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 3),
final AS (SELECT file_id, status FROM q
          WHERE file_id % 12 NOT IN (1, 5, 9))
SELECT status, COUNT(*) AS n, min(file_id) AS min_id,
       TRUE AS vacuum_ran, TRUE AS fence_ok, TRUE AS cdf_ok
FROM final GROUP BY status
"""


ACID_REF_RETENTION_ORACLE = """
WITH queue AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 1),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
final AS (SELECT file_id,
                 CASE WHEN file_id IN (SELECT file_id FROM low5)
                      THEN 1 ELSE status END AS status
          FROM queue)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id,
       TRUE AS tag_survived_vacuum, TRUE AS publish_ok,
       TRUE AS released_after_expire
FROM final GROUP BY status
"""


def catalog_rebase(spark: SparkSession, sf_dir: str,
                   scratch: Path) -> DataFrame:
    """BRANCH REBASE (round 14): the contended WAP loop closed without
    manual re-forking — a parked branch re-forks onto current main
    (unchanged tables pick up main's pins, changed tables keep the
    branch's), while a TRUE conflict (main moved on a branch-changed
    table) refuses, exactly like publish.

    Script: seed `q` + `audit_log` → branch `wap` claims the 5 lowest
    available files → main appends 3 rows to `audit_log` (the branch's
    view of it goes stale) → ``rebase()`` → branch reads fresh
    audit_log AND keeps its q claim → publish lands → a second branch
    updates q, main then appends to q → both its publish AND its
    rebase refuse (CommitConflict). Pins (in-result booleans):
    stale_before_rebase, fresh_after_rebase, conflict_refused."""
    import shutil

    from ..acid import CommitConflict
    from ..acid_catalog import AcidCatalog
    from ..sources.tables import load_table
    from .queue import queue_df

    root = scratch / f"acid_rebase_{Path(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 2)
             .select("file_id", "status"))
    cat = AcidCatalog(spark, root)
    cat.create_table("q", state)
    cat.create_table("audit_log", spark.createDataFrame(
        [(0, "seed")], "entry_id long, note string"))

    br = cat.branch("wap")
    low5 = (br.read("q").filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    br.commit_multi({"q": ("merge",
                           low5.select("file_id",
                                       F.lit(1).alias("status")),
                           ["file_id"])})
    # main moves on a table the branch did NOT change
    cat.commit_multi({"audit_log": ("append", spark.createDataFrame(
        [(i, f"main-{i}") for i in (1, 2, 3)],
        "entry_id long, note string"))})
    stale_before = br.read("audit_log").count() == 1
    br.rebase()
    fresh_after = br.read("audit_log").count() == 4
    cat.publish("wap")

    # a true conflict: main moves on the table branch b2 CHANGED.
    # b2's update matches NO rows (a metadata-only version — the
    # divergence is structural, per the linear-history carve-out a
    # row-changing branch commit would ride into main's next append)
    b2 = cat.branch("b2")
    b2.commit_multi({"q": ("update", {"status": "7"}, "status = 99")})
    cat.commit_multi({"q": ("append", spark.createDataFrame(
        [(900000301, 0)], "file_id long, status int"))})
    conflict_refused = False
    try:
        b2.rebase()
    except CommitConflict:
        try:
            cat.publish("b2")
        except CommitConflict:
            conflict_refused = True
    return (cat.read("q").groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"))
            .withColumn("stale_before_rebase", F.lit(bool(stale_before)))
            .withColumn("fresh_after_rebase", F.lit(bool(fresh_after)))
            .withColumn("conflict_refused",
                        F.lit(bool(conflict_refused))))


CATALOG_REBASE_ORACLE = """
WITH queue AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 2),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
final AS (SELECT file_id,
                 CASE WHEN file_id IN (SELECT file_id FROM low5)
                      THEN 1 ELSE status END AS status
          FROM queue
          UNION ALL SELECT 900000301, 0)
SELECT status, COUNT(*) AS n, min(file_id) AS min_id,
       TRUE AS stale_before_rebase, TRUE AS fresh_after_rebase,
       TRUE AS conflict_refused
FROM final GROUP BY status
"""
