"""The driver contract must stay complete: every SURVEY.md §2 operator key
registered, with an oracle, and the registry callable shape intact."""

from __future__ import annotations

from spark_streaming_apps_spark import catalog

SURVEY_S2_KEYS = {
    # §2.A sources / sinks / DDL
    "kafka_source", "avro_decode", "file_chunk_sink", "jdbc_insert_row",
    "jdbc_batch_insert", "table_ddl", "scalar_lookup",
    # §2.B projection / scalar
    "project_value", "md5_hash", "parse_seq_from_name", "path_concat",
    "topic_strip", "regexp_extract_offset", "length_bytes",
    "current_timestamp_cols",
    # §2.C filters
    "filter_neq", "filter_not_like", "filter_eq_literal", "filter_status",
    "range_band_check",
    # §2.D joins
    "join_left_anti", "join_inner_2way", "join_inner_3way",
    # §2.E aggregations
    "agg_max_expr", "groupby_having_band", "count_rows", "partition_counts",
    # §2.F windows / sort / limit
    "window_row_number", "sort_asc", "contiguous_prefix_cumsum", "limit_claim",
    # §2.G mutation / status machine
    "update_claim", "update_status_transitions", "update_hw_monotonic",
    "update_reset_errors", "insert_select_literals",
    # §2.H streaming
    "micro_batch_trigger", "per_batch_transform", "mapPartitions_sideeffect",
    "repartition_serialize", "highwater_state", "late_data_retry",
    "stop_on_complete", "offset_replay", "poll_wait_loop",
    # §2.I worker pipeline
    "pipeline_module_loop", "hash_lookup_module", "keyword_search_module",
    "error_classify", "file_rebuild",
    # §2.K north-star extensions
    "dedup_exact", "dedup_approx", "similarity_topk", "text_tokens",
    "json_props", "multimodal_binary",
}


def test_every_survey_key_registered():
    missing = SURVEY_S2_KEYS - set(catalog.REGISTRY)
    assert not missing, f"§2 keys missing from catalog: {sorted(missing)}"


def test_every_key_has_an_oracle():
    no_oracle = [k for k, e in catalog.REGISTRY.items() if e.oracle is None]
    assert not no_oracle, f"keys without oracles: {no_oracle}"


def test_driver_contract_shape():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 78
    assert all(callable(v) for v in qs.values())


def test_priority_and_bench_keys_exist():
    """PRIORITY (the driver-window ordering) and BENCH_KEYS must never
    name an unregistered key — a typo there silently drops coverage."""
    import bench
    assert not [k for k in catalog.PRIORITY if k not in catalog.REGISTRY]
    assert not [k for k in bench.BENCH_KEYS if k not in catalog.REGISTRY]
    # the §2 contract must fully occupy the driver's 50-key window
    assert len(catalog.PRIORITY) >= 50
    assert SURVEY_S2_KEYS - {"project_value", "md5_hash", "path_concat",
                             "length_bytes", "count_rows", "sort_asc"} \
        <= set(catalog.PRIORITY[:50])


def test_registry_scale_round4():
    assert len(catalog.REGISTRY) >= 150, len(catalog.REGISTRY)


def test_correctness_full_covers_registry_at_head():
    """The committed CORRECTNESS_FULL.json must cover EVERY registered
    key — the artifact can never lag the registry (round-7 verdict ask:
    re-run `tools/selfcheck.py --json CORRECTNESS_FULL.json` as the
    last commit of any round that registers keys)."""
    import json
    from pathlib import Path

    from spark_streaming_apps_spark import catalog as cat

    p = Path(__file__).resolve().parents[1] / "CORRECTNESS_FULL.json"
    full = json.loads(p.read_text())
    missing = sorted(set(cat.REGISTRY) - set(full))
    assert not missing, (
        f"CORRECTNESS_FULL.json lags the registry by {missing}; re-run "
        f"python tools/selfcheck.py --json CORRECTNESS_FULL.json")
