"""Planted zipfian skew: the salted per-level top-k must (a) equal the
naive window exactly and (b) never build the naive plan's pathological
reducer — the hot level's rows fan out across salts instead of landing in
one task.  The load assertions are structural (row distribution), not
timing, so they hold on a noisy shared host; the measured naive-vs-salted
wall-clock lives in SCALING.md."""
from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import analytics
from spark_streaming_apps_spark.operators.analytics import (
    N_SALT, ZIPF_AMPLIFY, zipf_fixture, zipf_topk_naive, zipf_topk_salted)

N_TEST = 200_000


def test_zipf_fixture_is_skewed(spark):
    """Level 0 really is the hot key: ~50% of all rows."""
    counts = {r.level: r.n
              for r in (zipf_fixture(spark, N_TEST).groupBy("level")
                        .agg(F.count(F.lit(1)).alias("n")).collect())}
    assert counts[0] == N_TEST // 2
    assert counts[1] == N_TEST // 4
    assert counts[0] > 10 * counts[5]


def test_salted_equals_naive(spark, tables):
    got = sorted(map(tuple, zipf_topk_salted(spark, tables["events"])
                     .collect()))
    want = sorted(map(tuple, zipf_topk_naive(spark, tables["events"])
                      .collect()))
    assert got == want and len(got) > 0


def test_salted_reducer_load_is_flat(spark):
    """The naive window's worst partition holds 50% of ALL rows; after
    salting, the worst (level, salt) cell holds ~1/(2*N_SALT) — the skew
    is structurally gone before any sort happens."""
    df = zipf_fixture(spark, N_TEST)
    naive_max = (df.groupBy("level").count()
                 .agg(F.max("count")).first()[0])
    salted_max = (df.withColumn("salt", F.expr(f"(id div 2) % {N_SALT}"))
                  .groupBy("level", "salt").count()
                  .agg(F.max("count")).first()[0])
    assert naive_max == N_TEST // 2
    assert salted_max <= N_TEST // (2 * N_SALT) + 1
    assert naive_max / salted_max >= N_SALT * 0.9


def test_salted_plan_has_no_hot_window(spark, tables):
    """Plan shape: the heavy phase-1 window partitions by (level, salt),
    and only the trivial candidate re-rank partitions by level alone."""
    plan = zipf_topk_salted(spark, tables["events"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "salt" in plan
    # phase-1 window must come before (deeper than) the level-only window
    assert plan.count("Window") >= 2
