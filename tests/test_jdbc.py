"""REAL JDBC (embedded Derby, Spark's bundled derby*.jar): round-trip
fidelity, partitioned parallel reads, filter pushdown into the remote
WHERE clause, and the reference's claim transaction run against a real
database (FileWorkerApp.scala:207-227)."""
from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.sources import jdbc as J
from spark_streaming_apps_spark.plans import physical_plan

SF = "/root/testdata/sf0.001"


def test_roundtrip_census_matches_source(spark, tmp_path):
    from spark_streaming_apps_spark.operators.queue import queue_df
    from spark_streaming_apps_spark.sources.tables import load_table

    got = {r.status: (r.n, r.min_id, r.max_id)
           for r in J.jdbc_roundtrip(spark, SF, tmp_path).collect()}
    want = {r.status: (r.n, r.min_id, r.max_id)
            for r in (queue_df(load_table(spark, SF, "orders"))
                      .groupBy("status")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.min("file_id").alias("min_id"),
                           F.max("file_id").alias("max_id"))).collect()}
    assert got == want


def test_partitioned_read_parallelism_and_pushdown(spark, tmp_path):
    """The read must fan out over numPartitions key ranges (each executor
    its own connection) and the filter must reach the JDBC scan as a
    pushed predicate — Derby prunes, not Spark."""
    J.jdbc_roundtrip(spark, SF, tmp_path)
    url = J._derby_url(tmp_path, SF)
    back = spark.read.jdbc(url, "queue_rt", properties=J.DERBY_PROPS,
                           column="file_id", lowerBound=0,
                           upperBound=6_000_001, numPartitions=8)
    assert back.rdd.getNumPartitions() == 8
    plan = physical_plan(back.filter(F.col("status") == 0))
    assert "PushedFilters" in plan and "status" in plan, plan


def test_exclusive_claim_census(spark, tmp_path):
    """After five CAS claim transactions, exactly the five lowest
    available rows are status 1 (on a fresh sf0.001 queue: statuses
    shift 0->1 for those five, everything else untouched)."""
    from spark_streaming_apps_spark.operators.queue import queue_df
    from spark_streaming_apps_spark.sources.tables import load_table

    q = queue_df(load_table(spark, SF, "orders")).select("file_id", "status")
    low5 = {r.file_id for r in q.filter("status = 0")
            .orderBy("file_id").limit(5).collect()}
    got = {r.status: r.n
           for r in J.jdbc_exclusive_claim(spark, SF, tmp_path).collect()}
    base = {r.status: r.n for r in q.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got[0] == base[0] - 5
    assert got.get(1, 0) == base.get(1, 0) + 5
    # and the claimed rows really are the five lowest
    url = J._derby_url(tmp_path, SF)
    claimed_now = {r.file_id for r in
                   spark.read.jdbc(url, "queue_claim",
                                   properties=J.DERBY_PROPS)
                   .filter("status = 1").collect()}
    originally_claimed = {r.file_id for r in
                          q.filter("status = 1").collect()}
    assert claimed_now - originally_claimed == low5
