"""Multimodal (binary) column handling.

The reference's core payload IS a binary column — `ImageBlock.data`
(ByteBuffer, StreamingApp.scala:84; hashed at HashUtil.scala:27, written to
the shared FS at :356-367). This module treats image/audio/video payloads the
same way: opaque `binary` columns + typed metadata, with decode / feature
extraction as Arrow-batched `mapInPandas` stages.

The actual codec step is STUBBED (no PIL/ffmpeg in this container): with
``fake=True`` (default) it derives deterministic metadata from the payload
bytes — making the Spark-side plumbing (schema, batching, partitioning) real
and testable; with ``fake=False`` it raises NotImplementedError exactly where
a PIL/soundfile call would go.

Scale: mapInPandas streams Arrow batches, so a 100 TB binary corpus flows
through Python at batch granularity with no per-row overhead; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so a batch of decoded
frames fits in executor-python memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = ("doc_id long, width int, height int, n_frames int, "
                 "fmt string, payload_bytes long")


def binary_payload(documents: DataFrame) -> DataFrame:
    """Text → opaque binary payload column with content hash + byte length —
    the ImageBlock (filename, hash, data) triple re-expressed
    (StreamingApp.scala:84, HashUtil.scala:24-29)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.md5(F.encode("text", "UTF-8")).alias("payload_md5"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


def decode_metadata(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    fake=True derives (width, height, n_frames, fmt) deterministically from
    the first payload bytes; fake=False is the marked seam for a real
    decoder (PIL.Image.open / soundfile.read / pyav frame sampling).
    """
    payloads = documents.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs an image/audio codec (PIL/soundfile); "
                    "not available in this environment")
            b0 = pdf["payload"].map(lambda b: b[0] if len(b) > 0 else 0)
            b1 = pdf["payload"].map(lambda b: b[1] if len(b) > 1 else 0)
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": ((b0 % 64) * 16 + 16).astype("int32"),
                "height": ((b1 % 64) * 16 + 16).astype("int32"),
                "n_frames": (n % 8 + 1).astype("int32"),
                "fmt": (n % 3).map({0: "png", 1: "jpeg", 2: "webp"}),
                "payload_bytes": n.astype("int64"),
            })

    return payloads.mapInPandas(decode, schema=DECODE_SCHEMA)


#: DuckDB twin of the fake decode (ASCII text ⇒ byte k == ascii(char k)).
DECODE_ORACLE_SQL = """
SELECT doc_id,
       CAST((ascii(substr(text, 1, 1)) % 64) * 16 + 16 AS INT) AS width,
       CAST((ascii(substr(text, 2, 1)) % 64) * 16 + 16 AS INT) AS height,
       CAST(strlen(text) % 8 + 1 AS INT) AS n_frames,
       CASE strlen(text) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS fmt,
       CAST(strlen(text) AS BIGINT) AS payload_bytes
FROM documents
"""
