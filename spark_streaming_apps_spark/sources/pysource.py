"""Python DataSource API (Spark 4) — the connector extension seam.

The reference's front door is a custom source feeding the engine
(Kafka + Avro chunks, StreamingApp.scala:309-318); Spark 4's Python
DataSource API is where a user plugs an equivalent custom feed into THIS
engine without touching the JVM: implement `partitions()` for the split
plan and `read(partition)` per task, and the source runs
partition-parallel across executors like any native scan.

The demo source is a deterministic LCG row generator — fixture-free and
bit-reproducible in the DuckDB oracle (integer math only), so the
correctness gate checks the full connector round trip: option plumbing,
split planning, per-partition reads, Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 1 << 31
N_ROWS = 100_000
N_PARTS = 8
N_BUCKETS = 16


class LcgPartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class LcgDataSource(DataSource):
    """`spark.read.format("lcg").option("rows", n).load()` — each of the
    `parts` splits generates its id range independently on an executor;
    no partition ever sees another's rows (the split plan IS the
    parallelism, exactly like file splits for a parquet scan)."""

    @classmethod
    def name(cls) -> str:
        return "lcg"

    def schema(self) -> str:
        return "id bigint, bucket int, lcg bigint"

    def reader(self, schema) -> DataSourceReader:
        return LcgReader(int(self.options.get("rows", N_ROWS)),
                         int(self.options.get("parts", N_PARTS)))


class LcgReader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        self.rows, self.parts = rows, parts

    def partitions(self):
        per = self.rows // self.parts
        return [LcgPartition(p * per,
                             (p + 1) * per if p < self.parts - 1 else self.rows)
                for p in range(self.parts)]

    def read(self, partition: LcgPartition):
        for i in range(partition.lo, partition.hi):
            yield (i, i % N_BUCKETS, (LCG_A * i + LCG_C) % LCG_M)


def python_datasource(spark: SparkSession) -> DataFrame:
    """Register + scan the custom source, then a per-bucket aggregate
    whose sums are EXACT integers (float summation order would differ
    between engines): n, sum of the raw LCG values, id extent, and the
    mean value derived from the exact sum at the end."""
    spark.dataSource.register(LcgDataSource)
    df = spark.read.format("lcg") \
        .option("rows", N_ROWS).option("parts", N_PARTS).load()
    return (df.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("lcg").alias("sum_lcg"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id"))
            .withColumn("avg_val",
                        F.round(F.col("sum_lcg")
                                / (F.col("n") * float(LCG_M)), 6)))


PYTHON_DATASOURCE_ORACLE = f"""
WITH g AS (SELECT i AS id, i % {N_BUCKETS} AS bucket,
                  ({LCG_A} * i + {LCG_C}) % {LCG_M} AS lcg
           FROM generate_series(0, {N_ROWS - 1}) AS t(i))
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
       CAST(SUM(lcg) AS BIGINT) AS sum_lcg,
       MIN(id) AS min_id, MAX(id) AS max_id,
       round(CAST(SUM(lcg) AS BIGINT) / (COUNT(*) * {float(LCG_M)}), 6)
         AS avg_val
FROM g GROUP BY bucket
"""
