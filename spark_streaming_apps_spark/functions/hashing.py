"""Portable 64-bit hashing.

MinHash/SimHash need hash functions that produce IDENTICAL values in Spark
and in the DuckDB oracle. Spark's xxhash64 and DuckDB's hash() are different
algorithms, so we derive a 60-bit integer from MD5 (both engines agree on
MD5): take the first 15 hex chars of md5(seed || ':' || value) and parse as
base-16. Verified bit-identical across engines.

This is the generalization of the reference's MD5 usage (HashUtil.scala:24-29)
into a keyed hash family h_i(x) = H(i || x) for sketching.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def portable_hash64(col, seed: int = 0) -> Column:
    """Spark side: conv(substr(md5(seed:x),1,15),16,10)::bigint (60 bits)."""
    c = F.col(col) if isinstance(col, str) else col
    tagged = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int = 0) -> str:
    """DuckDB side, value-identical to :func:`portable_hash64`."""
    return f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 15)) AS BIGINT)"
