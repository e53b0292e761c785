"""Real Kafka source wiring (gated — no broker or connector in this
container).

The reference consumes `topic_case_<case>` with a receiver-less direct
stream from the earliest offset (StreamingApp.scala:309-312) and
Avro-decodes 3-field ImageBlock records (AvroUtil.scala:24-35). This is the
Structured Streaming equivalent a user with a real cluster runs; the rest
of the engine is source-agnostic (every job in jobs.py takes any streaming
DataFrame with the events schema), so swapping the file-stream analog for
this is one call site.

The VALUE decode is the same tested surface batch uses
(functions/avro.py: JVM from_avro when spark-avro is on the classpath,
Arrow-batched wire-spec decode otherwise — exercised end-to-end by the
`avro_decode_binary` catalog key and tests/test_avro.py). Only the
readStream reader itself needs the `spark-sql-kafka-0-10` connector
package; calling without it raises with a clear message instead of a
ClassNotFoundException deep in a stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.avro import decode_image_blocks

TOPIC_PREFIX = "topic_case_"


def kafka_image_block_stream(spark: SparkSession, bootstrap_servers: str,
                             topic: str) -> DataFrame:
    """readStream from a case topic, earliest offsets, Avro-binary value
    decoded to the ImageBlock triple (filename, local_hash, data) plus
    the case name stripped from the topic (StreamingApp.scala:313)."""
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
    decoded = decode_image_blocks(raw.select("value"), "value")
    return decoded.withColumn(
        "case_name", F.lit(topic[len(TOPIC_PREFIX):]
                           if topic.startswith(TOPIC_PREFIX) else topic))
