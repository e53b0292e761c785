"""Real Kafka source wiring (gated — no broker or connector in this
container).

The reference consumes `topic_case_<case>` with a receiver-less direct
stream from the earliest offset (StreamingApp.scala:309-312) and
Avro-decodes 3-field ImageBlock records (AvroUtil.scala:24-35). This is the
Structured Streaming equivalent a user with a real cluster runs; the rest
of the engine is source-agnostic (every job in jobs.py takes any streaming
DataFrame with the events schema), so swapping the file-stream analog for
this is one call site.

Requires the `spark-sql-kafka-0-10` connector package on the classpath
(and `spark-avro` for from_avro instead of the JSON decode below); both
are standard published Spark artifacts. Calling without them raises with
a clear message instead of a ClassNotFoundException deep in a stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

IMAGE_BLOCK_SCHEMA = "filename string, local_hash string, n_bytes long"


def kafka_image_block_stream(spark: SparkSession, bootstrap_servers: str,
                             topic: str) -> DataFrame:
    """readStream from a case topic, earliest offsets, value decoded to the
    ImageBlock triple. JSON stands in for Avro wire format exactly as in
    the batch `avro_decode` key; with spark-avro on the classpath replace
    `from_json` with `from_avro(col("value"), schema_json)`."""
    try:
        reader = (spark.readStream.format("kafka")
                  .option("kafka.bootstrap.servers", bootstrap_servers)
                  .option("subscribe", topic)
                  .option("startingOffsets", "earliest"))
        raw = reader.load()
    except Exception as e:  # connector jar absent in this container
        raise RuntimeError(
            "Kafka source needs the spark-sql-kafka-0-10 connector on the "
            "classpath (--packages org.apache.spark:spark-sql-kafka-0-10_2.13); "
            f"underlying error: {e}") from e
    return (raw.select(F.col("value").cast("string").alias("value"))
            .select(F.from_json("value", IMAGE_BLOCK_SCHEMA).alias("r"))
            .select("r.*")
            .withColumn("case_name",
                        F.lit(topic).substr(F.lit(12), F.length(F.lit(topic)))))
