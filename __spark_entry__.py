"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All wiring lives in ``spark_streaming_apps_spark.catalog`` — one
registered (builder, oracle) pair per SURVEY.md §2 operator key.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.operators.highwater import hw_release_query  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The high-water-mark release query (SURVEY.md §3.3): contiguous-prefix
    watermark over the event stream, then the band release over
    orders ⋈ lineitem extents.
    """
    events = load_table(spark, SMOKE_SF_DIR, "events")
    orders = load_table(spark, SMOKE_SF_DIR, "orders")
    lineitem = load_table(spark, SMOKE_SF_DIR, "lineitem")
    return hw_release_query(events, orders, lineitem)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extension keys). Each callable takes
    (spark, sf_dir) and returns a DataFrame."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible key; keys
    absent here (streaming/stateful ops) get the driver's rows-only check."""
    return catalog.oracles()
