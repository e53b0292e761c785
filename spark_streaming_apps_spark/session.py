"""SparkSession construction & tuning.

Scale stance: these defaults are what we would ship to a 1000-executor
cluster — AQE on (runtime re-plan, skew-join splitting, partition
coalescing), broadcast threshold left at default so Catalyst broadcasts
small dims, Arrow enabled for every pandas-UDF exchange. Local tests only
shrink ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set on an already-running session.
#: - nanosAsLong: the `events` fixture stores TIMESTAMP(NANOS) which Spark's
#:   parquet reader rejects by default (PARQUET_TYPE_ILLEGAL); reading nanos
#:   as long + explicit µs conversion in sources.tables is lossless here.
#: - UTC session timezone keeps TimestampType values aligned with the naive
#:   timestamps DuckDB produces for the same files.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}

BUILD_CONFS = {
    # local-mode runs every executor thread inside the driver JVM; the 1g
    # default heap full-GCs for seconds under 32 concurrent tasks at sf0.1
    # (random queries spiked 1s -> 8-10s). On a real cluster this maps to
    # ordinary executor sizing, not a special conf.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Shuffle partition count: sized for local[N]; a real cluster would use
    # ~2-3x total cores or rely on AQE coalescing from a higher initial value.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not build (e.g. the
    driver's). Idempotent; call at the top of every public query builder."""
    import warnings

    from pyspark.errors import AnalysisException

    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except AnalysisException as e:  # CANNOT_MODIFY_CONFIG: static/locked
            warnings.warn(
                f"could not set {k}={v} ({e.getErrorClass()}); "
                "events.ts parquet reads may fail without it", stacklevel=2)
    return spark


def get_spark(app_name: str = "spark_streaming_apps_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a tuned SparkSession.

    ``master`` defaults to local[$SPARK_GRAFT_CPUS] (env, default all cores)
    so tests and bench share one code path.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS}.items():
        b = b.config(k, v)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
