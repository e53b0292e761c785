"""Avro BINARY wire-format support for the ImageBlock record.

The reference's front door is Avro-over-Kafka: AvroUtil.scala:24-35 decodes
each Kafka message body into the 3-field ImageBlock record
(filename, local_hash, data) with a SpecificDatumReader; StreamingApp.scala
:309-318 maps it over the direct stream. This module gives the engine the
same wire format, Spark-first:

- ``IMAGE_BLOCK_AVRO_SCHEMA``: the record schema as canonical Avro JSON.
- A pure-Python encoder/decoder for that record implementing the PUBLIC
  Avro 1.x binary spec (zigzag-varint longs, length-prefixed utf8/bytes;
  https://avro.apache.org/docs/current/specification/) — used to produce
  wire-format test fixtures and as the decode fallback.
- ``decode_image_blocks(df, value_col)``: decodes a binary column of Avro
  message bodies into the three fields. Uses the JVM
  ``pyspark.sql.avro.functions.from_avro`` when the spark-avro module is
  on the classpath (the fast path — stays in Tungsten); otherwise an
  Arrow-batched ``mapInPandas`` decode of the identical bytes. Both paths
  produce the same columns, so callers are classpath-agnostic.

The pip-distributed pyspark ships avro-core but NOT the spark-avro
datasource jar, so the fallback is what exercises in this container; the
unit tests pin the encoder to fixed spec vectors so the bytes are the real
wire format either way.
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType)

IMAGE_BLOCK_AVRO_SCHEMA = json.dumps({
    "type": "record",
    "name": "ImageBlock",
    "fields": [
        {"name": "filename", "type": "string"},
        {"name": "local_hash", "type": "string"},
        {"name": "data", "type": "bytes"},
    ],
})

_DECODED_FIELDS = [
    StructField("filename", StringType()),
    StructField("local_hash", StringType()),
    StructField("data", BinaryType()),
]


# ----------------------------------------------------- binary codec (spec)

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(n: int) -> bytes:
    """Avro long: zigzag, then little-endian base-128 varint."""
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: bytes, pos: int) -> Tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def encode_image_block(filename: str, local_hash: str, data: bytes) -> bytes:
    """One ImageBlock record as Avro binary (record = fields in schema
    order; string/bytes = length-prefixed)."""
    fn = filename.encode("utf-8")
    lh = local_hash.encode("utf-8")
    return (_write_long(len(fn)) + fn
            + _write_long(len(lh)) + lh
            + _write_long(len(data)) + data)


def decode_image_block(buf: bytes) -> Tuple[str, str, bytes]:
    """Inverse of encode_image_block; raises on trailing garbage so a
    framing bug can't pass silently."""
    n, pos = _read_long(buf, 0)
    fn = bytes(buf[pos:pos + n]).decode("utf-8")
    pos += n
    n, pos = _read_long(buf, pos)
    lh = bytes(buf[pos:pos + n]).decode("utf-8")
    pos += n
    n, pos = _read_long(buf, pos)
    data = bytes(buf[pos:pos + n])
    pos += n
    if pos != len(buf):
        raise ValueError(f"trailing bytes in ImageBlock record: {len(buf) - pos}")
    return fn, lh, data


# --------------------------------------------------------- Spark surface

def spark_avro_available(spark) -> bool:
    """True iff the spark-avro datasource module is on the JVM classpath
    (pip pyspark ships without it)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def encode_image_blocks(df: DataFrame, out_col: str = "value") -> DataFrame:
    """(filename, local_hash, data) columns → one Avro-binary column, via
    an Arrow-batched pandas UDF (the producer side of the wire; the
    reference's producer is outside the engine, so this exists for tests
    and loopback pipelines)."""
    @F.pandas_udf(BinaryType())
    def enc(fn: pd.Series, lh: pd.Series, dt: pd.Series) -> pd.Series:
        return pd.Series([
            encode_image_block(f, h, bytes(d))
            for f, h, d in zip(fn, lh, dt)])

    return df.withColumn(out_col, enc("filename", "local_hash", "data"))


def decode_image_blocks(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary Avro message bodies → decoded (filename, local_hash, data)
    columns, other columns preserved. JVM from_avro when available, else
    Arrow-batched mapInPandas over the same wire bytes."""
    spark = df.sparkSession
    if spark_avro_available(spark):
        from pyspark.sql.avro.functions import from_avro
        return (df.withColumn(
            "_r", from_avro(F.col(value_col), IMAGE_BLOCK_AVRO_SCHEMA))
            .select(*[c for c in df.columns if c != value_col], "_r.*"))

    passthrough = [f for f in df.schema.fields if f.name != value_col]
    out_schema = StructType(passthrough + _DECODED_FIELDS)
    names = [f.name for f in passthrough]

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_image_block(v) for v in pdf[value_col]]
            out = pdf[names].copy() if names else pd.DataFrame(index=pdf.index)
            out["filename"] = [d[0] for d in decoded]
            out["local_hash"] = [d[1] for d in decoded]
            out["data"] = [d[2] for d in decoded]
            yield out

    return df.mapInPandas(decode_batches, out_schema)
