"""The portable MD5-derived hash family must be bit-identical between Spark
and DuckDB — every sketch (minhash, simhash) depends on it."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_streaming_apps_spark.functions.hashing import (
    portable_hash64, portable_hash64_sql)


def test_hash_parity_spark_vs_duckdb(spark):
    values = ["", "a", "hello world", "chunk.42", "ünïcode", "0:nested:colons"]
    for seed in (0, 7, 99):
        df = spark.createDataFrame([(v,) for v in values], "v string")
        got_spark = [r[0] for r in
                     df.select(portable_hash64("v", seed)).collect()]
        con = duckdb.connect()
        got_duck = [
            con.execute("SELECT " + portable_hash64_sql("?", seed),
                        [v]).fetchone()[0]
            for v in values
        ]
        assert got_spark == got_duck, f"seed={seed}"


def test_hash_is_60_bits(spark):
    df = spark.createDataFrame([(str(i),) for i in range(1000)], "v string")
    mx = df.select(F.max(portable_hash64("v"))).first()[0]
    assert 0 < mx < (1 << 60)
