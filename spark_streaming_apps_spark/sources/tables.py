"""Batch sources: the fixture parquet tables.

Reference analog: the Kafka direct stream + PostgreSQL tables
(StreamingApp.scala:309-312 and the DDL at :140-259). Here every durable
table is a parquet scan — columnar, splittable, predicate-pushdown-capable —
instead of a row store behind JDBC. At 100 TB these reads parallelize across
executors with partition pruning + min/max skipping, which is the Spark-native
replacement for the reference's B-tree indexes (StreamingApp.scala:152-155).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..session import tune

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    `events.ts` is stored as parquet TIMESTAMP(NANOS) which Spark cannot map
    directly; with ``spark.sql.legacy.parquet.nanosAsLong`` we read it as
    nanos-since-epoch and convert with exact integer division (``DIV 1000``
    — float division would lose precision above 2^53 ns). Values carry no
    sub-microsecond component (verified against the generator output), so the
    conversion is lossless.
    """
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register every fixture table as a temp view (`<name><suffix>`), so
    operators can also be expressed via ``spark.sql``."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}{suffix}")
