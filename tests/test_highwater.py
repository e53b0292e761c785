"""High-water-mark semantics: the contiguous-prefix watermark must stop at
the first gap, advance monotonically, and the flagship release band must be
consistent with the computed HW."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import highwater
from spark_streaming_apps_spark.plans import global_sort_count


def test_prefix_stops_at_first_gap(spark):
    # sequences 0,1,2,4,5 → prefix is 0..2, hw = 10+20+30
    rows = [(0, 10.0), (1, 20.0), (2, 30.0), (4, 40.0), (5, 50.0)]
    df = spark.createDataFrame(rows, "sequence long, size double")
    got = highwater.contiguous_prefix_hw(df).first()
    assert got.hw_bytes == 60.0
    assert got.last_seq == 2
    assert got.n_chunks == 3


def test_prefix_zero_when_first_chunk_missing(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "sequence long, size double")
    got = highwater.contiguous_prefix_hw(df).first()
    assert got.hw_bytes is None  # empty prefix: no rows below the gap at 0
    assert got.n_chunks == 0


def test_fixture_hw_matches_gap_plant(tables):
    # GAP_DROP plants the first missing sequence at 96: HW covers 0..95.
    events = tables["events"].filter(
        F.col("event_id") % highwater.GAP_DROP != highwater.GAP_DROP - 1)
    got = highwater.contiguous_prefix_hw(highwater.chunk_table(events)).first()
    assert got.last_seq == highwater.GAP_DROP - 2
    assert got.n_chunks == highwater.GAP_DROP - 1
    expected = (tables["events"]
                .filter(F.col("event_id") < highwater.GAP_DROP - 1)
                .agg(F.sum(F.col("value").cast("decimal(18,4)"))).first()[0])
    assert abs(got.hw_bytes - float(expected)) < 1e-6


def test_hw_monotonic_advances(tables):
    row = highwater.update_hw_monotonic(tables["events"]).first()
    assert row.advanced == 1
    assert row.current > row.previous
    assert row.current_seq == highwater.GAP_DROP - 2


def test_flagship_band_consistent(tables):
    out = highwater.hw_release_query(
        tables["events"], tables["orders"], tables["lineitem"])
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.hw_bytes / 2 <= r.max_extent < r.hw_bytes


def test_flagship_has_no_global_sort(tables):
    out = highwater.hw_release_query(
        tables["events"], tables["orders"], tables["lineitem"])
    assert global_sort_count(out) == 0


def test_per_key_hw_all_keys_present(tables):
    out = highwater.highwater_per_key(tables["events"])
    n_keys = tables["events"].select("user_id").distinct().count()
    assert out.count() == n_keys
    bad = out.filter((F.col("hw_bytes") <= 0) | F.col("hw_bytes").isNull())
    assert bad.count() == 0
