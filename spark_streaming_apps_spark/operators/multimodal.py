"""Multimodal (binary) column handling.

The reference's core payload IS a binary column — `ImageBlock.data`
(ByteBuffer, StreamingApp.scala:84; hashed at HashUtil.scala:27, written to
the shared FS at :356-367). This module treats image/audio/video payloads the
same way: opaque `binary` columns + typed metadata, with decode / feature
extraction as Arrow-batched `mapInPandas` stages.

Codec status, honestly split by format class: COMPRESSED formats
(JPEG/PNG/audio/video) are stubbed — no PIL/ffmpeg in this container;
``fake=True`` (default) derives deterministic metadata from the payload
bytes (plumbing real and testable), ``fake=False`` raises
NotImplementedError exactly where the PIL/soundfile call would go.
UNCOMPRESSED wire formats are REAL: `real_decode` parses genuine P6 PPM
bytes (magic + header + raw RGB plane, numpy only) and computes channel
sums and a sampled-grayscale aHash from the decoded pixels, with the
DuckDB oracle re-deriving every value from the generative formula — a
parse bug cannot hash-match.

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


# --------------------------------------------------------- real PPM codec
#
# The "no codec in this container" gate only applies to COMPRESSED formats
# (JPEG/PNG need PIL). The uncompressed wire formats — PPM/PGM, the
# interchange format every imaging tool emits — need nothing but numpy,
# so this path is a REAL decoder: actual P6 bytes are parsed (magic,
# whitespace-delimited header, maxval, raw RGB plane) and the features
# (channel sums, sampled-grayscale aHash) are computed from the DECODED
# PIXELS. Fixture payloads are deterministic generated images, so the
# DuckDB oracle re-derives every value from the generative formula while
# Spark derives them from the bytes — a decode bug on either side breaks
# the hash match.

PPM_W0, PPM_WMOD = 16, 16      # width  = 16 + doc_id % 16  ∈ [16, 31]
PPM_H0, PPM_HMOD = 16, 8       # height = 16 + doc_id % 8   ∈ [16, 23]
PPM_GRID = 8                   # aHash sampling grid (8x8 = 64 bits)


def _ppm_payload(doc_id: int) -> bytes:
    """A real P6 PPM image, deterministic per doc: pixel (x, y) channels
    are affine-mod-256 in (x, y, doc_id)."""
    import numpy as np

    w = PPM_W0 + doc_id % PPM_WMOD
    h = PPM_H0 + doc_id % PPM_HMOD
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y * 13 + doc_id) % 256
    g = (x * 3 + y * 5 + 2 * doc_id) % 256
    b = (x * 11 + y * 2 + 3 * doc_id) % 256
    return (f"P6\n{w} {h}\n255\n".encode()
            + np.stack([r, g, b], axis=-1).astype(np.uint8).tobytes())


def _parse_ppm(buf: bytes):
    """Spec-conformant P6 parser: magic, three whitespace-delimited
    header tokens (width, height, maxval) with '#'-to-end-of-line
    comments allowed anywhere whitespace is (per the netpbm spec),
    single whitespace, then the raw RGB plane. Returns
    (w, h, HxWx3 uint8 array)."""
    import numpy as np

    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks, pos, tok = [], 2, b""
    while len(toks) < 3:
        if pos >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[pos:pos + 1]
        pos += 1
        if c == b"#":
            # comment: terminates any in-progress token, then runs to
            # end of line; the newline doubles as the whitespace that
            # would have followed the token
            if tok:
                toks.append(int(tok))
                tok = b""
            nl = buf.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM header comment")
            pos = nl + 1
            continue
        if c.isspace():
            if tok:
                toks.append(int(tok))
                tok = b""
        else:
            if not c.isdigit():
                raise ValueError(
                    f"non-numeric byte {c!r} in PPM header")
            tok += c
    # pos is now one past the single whitespace terminating maxval
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    arr = np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos)
    return w, h, arr.reshape(h, w, 3)


def real_decode(documents: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads: stage 1 materializes
    genuine P6 bytes per doc (mapInPandas producer), stage 2 — sharing
    nothing with the producer but the bytes — parses them and computes
    features from decoded pixels: exact per-channel sums (bigint) and a
    64-bit aHash over the {PPM_GRID}x{PPM_GRID} nearest-neighbor-sampled
    grayscale (bit k set iff gray_k * 64 > sum(grays); same integer-
    exact compare as `phash_near_dup`). At 100 TB both stages are the
    Arrow-batched mapInPandas shape; swap stage 1 for a parquet/blob
    read of stored payloads and nothing else changes."""
    import numpy as np

    ids = documents.select("doc_id")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [_ppm_payload(int(d)) for d in pdf["doc_id"]]})

    payloads = ids.mapInPandas(encode, schema="doc_id long, payload binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _parse_ppm(bytes(buf))
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                grays = [
                    int(px[i * h // PPM_GRID, j * w // PPM_GRID].sum()) // 3
                    for i in range(PPM_GRID) for j in range(PPM_GRID)]
                total = sum(grays)
                hsh = 0
                for k, gr in enumerate(grays):
                    if gr * len(grays) > total:
                        hsh |= 1 << k
                if hsh >= (1 << 63):
                    hsh -= 1 << 64
                rows.append((doc_id, w, h, int(sums[0]), int(sums[1]),
                             int(sums[2]), hsh))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "sum_r", "sum_g", "sum_b",
                "ahash"])

    return payloads.mapInPandas(
        decode, schema="doc_id long, width int, height int, sum_r long, "
                       "sum_g long, sum_b long, ahash long")


def arrow_decode(documents: DataFrame) -> DataFrame:
    """The same real PPM decode through `mapInArrow` — pyarrow
    RecordBatches in and out, no pandas materialization between Arrow
    and the decoder (the fastest Python seam Spark offers; for binary
    payloads it avoids pandas' object-dtype copy of every blob). Same
    output contract as `real_decode`, same oracle."""
    import pyarrow as pa

    ids = documents.select("doc_id")

    def produce(batches):
        for batch in batches:
            d = batch.column("doc_id").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(d, pa.int64()),
                 pa.array([_ppm_payload(int(x)) for x in d], pa.binary())],
                names=["doc_id", "payload"])

    payloads = ids.mapInArrow(produce, schema="doc_id long, payload binary")

    def decode(batches):
        import numpy as np
        for batch in batches:
            ids_, bufs = (batch.column("doc_id").to_pylist(),
                          batch.column("payload").to_pylist())
            cols = {k: [] for k in ("doc_id", "width", "height", "sum_r",
                                    "sum_g", "sum_b", "ahash")}
            for doc_id, buf in zip(ids_, bufs):
                w, h, px = _parse_ppm(bytes(buf))
                sums = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                grays = [
                    int(px[i * h // PPM_GRID, j * w // PPM_GRID].sum()) // 3
                    for i in range(PPM_GRID) for j in range(PPM_GRID)]
                total = sum(grays)
                hsh = 0
                for k, gr in enumerate(grays):
                    if gr * len(grays) > total:
                        hsh |= 1 << k
                if hsh >= (1 << 63):
                    hsh -= 1 << 64
                for k, v in zip(cols, (doc_id, w, h, int(sums[0]),
                                       int(sums[1]), int(sums[2]), hsh)):
                    cols[k].append(v)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["doc_id"], pa.int64()),
                 pa.array(cols["width"], pa.int32()),
                 pa.array(cols["height"], pa.int32()),
                 pa.array(cols["sum_r"], pa.int64()),
                 pa.array(cols["sum_g"], pa.int64()),
                 pa.array(cols["sum_b"], pa.int64()),
                 pa.array(cols["ahash"], pa.int64())],
                names=list(cols))

    return payloads.mapInArrow(
        decode, schema="doc_id long, width int, height int, sum_r long, "
                       "sum_g long, sum_b long, ahash long")


def real_decode_oracle_sql() -> str:
    """DuckDB re-derives every feature from the GENERATIVE formula (it
    never sees the bytes): a decode/parse bug on the Spark side cannot
    hash-match."""
    g = PPM_GRID
    r = "((x * 7 + y * 13 + doc_id) % 256)"
    gc = "((x * 3 + y * 5 + 2 * doc_id) % 256)"
    b = "((x * 11 + y * 2 + 3 * doc_id) % 256)"
    # sampled coords inlined in k (1-indexed): i=(k-1)//g row, j=(k-1)%g col
    xg = f"((((k - 1) % {g}) * w) // {g})"
    yg = f"((((k - 1) // {g}) * h) // {g})"
    gray = (f"((({xg} * 7 + {yg} * 13 + doc_id) % 256) "
            f"+ (({xg} * 3 + {yg} * 5 + 2 * doc_id) % 256) "
            f"+ (({xg} * 11 + {yg} * 2 + 3 * doc_id) % 256)) // 3")
    return f"""
WITH dims AS (
  SELECT doc_id,
         {PPM_W0} + doc_id % {PPM_WMOD} AS w,
         {PPM_H0} + doc_id % {PPM_HMOD} AS h
  FROM documents),
sums AS (
  SELECT d.doc_id,
         SUM({r}) AS sum_r, SUM({gc}) AS sum_g, SUM({b}) AS sum_b
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) xs,
       LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) ys
  GROUP BY d.doc_id),
grays AS (
  SELECT doc_id,
         [{gray} FOR k IN generate_series(1, {g * g})] AS px
  FROM dims),
sig AS (
  SELECT doc_id,
         CAST(list_sum(
           [CASE WHEN px[k] * {g * g} <= list_sum(px) THEN 0
                 WHEN k = {g * g}
                 THEN CAST(-9223372036854775808 AS BIGINT)
                 ELSE CAST(1 AS BIGINT) << (k - 1) END
            FOR k IN generate_series(1, {g * g})]) AS BIGINT) AS ahash
  FROM grays)
SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
       CAST(s.sum_r AS BIGINT) AS sum_r, CAST(s.sum_g AS BIGINT) AS sum_g,
       CAST(s.sum_b AS BIGINT) AS sum_b, g.ahash
FROM dims d JOIN sums s ON d.doc_id = s.doc_id
JOIN sig g ON d.doc_id = g.doc_id
"""


PHASH_PIXELS = 64          # 8x8 fake-grayscale block from the payload head
PHASH_BANDS = 4
PHASH_HAMMING_MAX = 6


def phash_near_dup(documents: DataFrame, fake: bool = True) -> DataFrame:
    """Perceptual-hash (average-hash) near-dup over DECODED image blocks —
    the multimodal member of the dedup family: re-encoded or
    metadata-stripped copies of an image keep their pixel structure, so
    their aHashes collide even when byte hashes don't.

    The decode seam follows this module's contract: fake=True reads the
    first {PHASH_PIXELS} payload bytes as the 8x8 grayscale block
    (deterministic, oracle-checkable); fake=False is where
    PIL.Image.resize((8,8)).convert('L') slots in. The hash itself is
    REAL aHash math and stays integer-exact: bit i = pixel_i *
    {PHASH_PIXELS} > sum(pixels) (scaled integer compare — no float mean
    to disagree on). Near-dup pairs come from a {PHASH_BANDS}-band
    bucket join over the 64-bit hash with hamming ≤ {PHASH_HAMMING_MAX}
    verify — the simhash geometry, applied to pixels. Planted
    near-identical docs (suffix mutation leaves the payload head intact)
    give hamming-0 positives."""
    from .dedup import PLANT_EVERY, PLANT_OFFSET, PLANT_SUFFIX

    corpus = documents.select("doc_id", "text").unionByName(
        documents.filter(F.col("doc_id") % PLANT_EVERY == 0)
        .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(PLANT_SUFFIX)).alias("text")))
    payloads = corpus.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode needs an image codec (PIL); "
                    "not available in this environment")
            out_hash = []
            for b in pdf["payload"]:
                px = [(b[i] if i < len(b) else 0) for i in range(PHASH_PIXELS)]
                total = sum(px)
                h = 0
                for i, p in enumerate(px):
                    if p * PHASH_PIXELS > total:
                        h |= 1 << i
                # two's-complement into int64: bit 63 is the sign bit on
                # both engines (DuckDB packs it as the min-long constant)
                out_hash.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ahash": out_hash})

    from .dedup import _memo, _materialize
    # both band-join sides read this
    sig = _memo(documents, f"phash_sig_fake{fake}", lambda: _materialize(
        payloads.mapInPandas(ahash, schema="doc_id long, ahash long")))
    band_bits = PHASH_PIXELS // PHASH_BANDS
    mask = (1 << band_bits) - 1
    stack = ", ".join(
        f"{j}, shiftright(ahash, {j * band_bits}) & {mask}"
        for j in range(PHASH_BANDS))
    bands = sig.selectExpr(
        "doc_id", "ahash",
        f"stack({PHASH_BANDS}, {stack}) as (band_id, band_key)")
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"),
                    F.expr("bit_count(a.ahash ^ b.ahash)").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= PHASH_HAMMING_MAX))


def phash_oracle_sql() -> str:
    from .dedup import PLANT_EVERY, PLANT_OFFSET, PLANT_SUFFIX
    n = PHASH_PIXELS
    band_bits = n // PHASH_BANDS
    mask = (1 << band_bits) - 1
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, ahash, {j} AS band_id, "
        f"(ahash >> {j * band_bits}) & {mask} AS band_key FROM sig"
        for j in range(PHASH_BANDS))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents UNION ALL
  SELECT doc_id + {PLANT_OFFSET}, text || '{PLANT_SUFFIX}'
  FROM documents WHERE doc_id % {PLANT_EVERY} = 0),
px AS (SELECT doc_id,
              [CASE WHEN strlen(text) >= i THEN ascii(substr(text, i, 1))
                    ELSE 0 END FOR i IN generate_series(1, {n})] AS p
       FROM corpus),
sig AS (SELECT doc_id,
               -- cast back down: list_sum widens to HUGEINT, and xor/
               -- bit_count in 128-bit space sign-extend negative hashes
               CAST(list_sum([CASE WHEN p[i] * {n} <= list_sum(p) THEN 0
                              WHEN i = {n}
                              THEN CAST(-9223372036854775808 AS BIGINT)
                              ELSE CAST(1 AS BIGINT) << (i - 1) END
                         FOR i IN generate_series(1, {n})]) AS BIGINT) AS ahash
        FROM px),
bands AS ({band_sel})
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       bit_count(xor(a.ahash, b.ahash)) AS hamming
FROM bands a JOIN bands b ON a.band_id = b.band_id
 AND a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {PHASH_HAMMING_MAX}
"""
