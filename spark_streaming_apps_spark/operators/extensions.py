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


def applyinpandas_rebuild(events: DataFrame) -> DataFrame:
    """Grouped-map rebuild: per case, reassemble the logical blob from its
    chunks in sequence order inside an Arrow-batched pandas group — the
    applyInPandas form of file_rebuild (TSK JNI reconstruction,
    PipelineStreamProcessor.scala:117). Byte-identical to the expression
    form (worker.file_rebuild) and to the SQL oracle."""
    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["event_id"])
        blob = "".join(pdf["event_type"])
        return pd.DataFrame([{
            "user_id": pdf["user_id"].iloc[0],
            "rebuilt_md5": hashlib.md5(blob.encode("utf-8")).hexdigest(),
            "n_chunks": len(pdf),
        }])

    return (events.select("user_id", "event_id", "event_type")
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
