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

RESIZE_TARGET = 256
FRAME_SAMPLE_K = 3


def resize_metadata(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Resize stage: fit each decoded image into a {RESIZE_TARGET}² box
    preserving aspect ratio. The geometry is pure integer math
    ((dim * target) // max_dim) so both engines agree bit-for-bit; the
    pixel resample itself is the marked real-codec seam (PIL.Image.resize
    would slot into the same mapInPandas batch loop)."""
    decoded = decode_metadata(documents, fake=fake)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mx = pdf[["width", "height"]].max(axis=1)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "out_width": (pdf["width"] * RESIZE_TARGET // mx).astype("int32"),
                "out_height": (pdf["height"] * RESIZE_TARGET // mx).astype("int32"),
            })

    return decoded.mapInPandas(
        resize, schema="doc_id long, width int, height int, "
                       "out_width int, out_height int")


RESIZE_ORACLE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST((ascii(substr(text, 1, 1)) % 64) * 16 + 16 AS INT) AS width,
         CAST((ascii(substr(text, 2, 1)) % 64) * 16 + 16 AS INT) AS height
  FROM documents)
SELECT doc_id, width, height,
       CAST(width * {RESIZE_TARGET} // greatest(width, height) AS INT) AS out_width,
       CAST(height * {RESIZE_TARGET} // greatest(width, height) AS INT) AS out_height
FROM d
"""


def frame_sample(documents: DataFrame, fake: bool = True,
                 k: int = FRAME_SAMPLE_K) -> DataFrame:
    """Frame-sampling stage: k evenly-spaced frame indices per video
    (floor(j*n/k), deduped when n < k), one output row per sampled frame —
    the one-to-many mapInPandas shape a real pyav frame grab would use.
    Each frame gets a deterministic content tag (md5 of payload-hash +
    index) standing in for the decoded frame bytes."""
    import hashlib

    meta = (decode_metadata(documents, fake=fake)
            .join(binary_payload(documents).select("doc_id", "payload_md5"),
                  "doc_id"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n, pmd5 in zip(pdf["doc_id"], pdf["n_frames"],
                                       pdf["payload_md5"]):
                for idx in sorted({j * int(n) // k for j in range(k)}):
                    tag = hashlib.md5(f"{pmd5}:{idx}".encode()).hexdigest()
                    rows.append((doc_id, idx, tag))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return meta.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame_md5 string")


FRAME_SAMPLE_ORACLE_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(strlen(text) % 8 + 1 AS INT) AS n_frames,
         md5(text) AS payload_md5
  FROM documents)
SELECT DISTINCT doc_id,
       CAST(j * n_frames // {FRAME_SAMPLE_K} AS INT) AS frame_idx,
       md5(payload_md5 || ':' || CAST(j * n_frames // {FRAME_SAMPLE_K} AS VARCHAR))
         AS frame_md5
FROM d, (SELECT unnest(generate_series(0, {FRAME_SAMPLE_K - 1})) AS j) js
"""
