"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints TWO JSON lines to stdout — the full
per-query/recall detail first, then a compact headline as the LAST line
(guaranteed to fit a bounded tail capture):

    {"metric": "headline_queries_detail", "queries": {...}, ...}
    {"metric": "headline_queries_total_sec", "value": N, "unit": "sec", ...}

Each query is fully materialized via the noop sink (count() alone can skip
column evaluation). A warmup query amortizes JVM/codegen startup out of the
per-query numbers. Logs go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CORES_HINT = int(CPUS) if CPUS.isdigit() else os.cpu_count() or 8

#: Headline set: the flagship, every shuffle-heavy relational shape, the
#: full dedup/similarity/text pipeline family, and the stateful stream.
BENCH_KEYS = [
    "hw_release",
    "contiguous_prefix_cumsum",
    "join_inner_3way",
    "groupby_having_band",
    "window_row_number",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "similarity_topk",
    "similarity_ivf_topk",
    "embedding_near_dup",
    "text_tokens",
    "quality_score",
    "doc_fingerprint",
    "multimodal_decode",
    "file_rebuild",
    "json_props",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "salted_skew_agg",
    "zipf_topk_salted",
    "window_tumbling",
    "window_session",
    "highwater_state",
    "contamination_check",
    "sequence_packing",
    "pagerank_nations",
    "zorder_layout",
    "bm25_rank",
    "vocab_topk",
    "repetition_filter",
    "srp_near_dup",
    "skew_join_salted",
    "cube_counts",
    "streaming_dedup",
    "knn_graph",
    "semdedup",
    "inverted_index",
    "quality_funnel",
    "kmeans_refine",
    "embedding_quantize",
    "ivf_topk_trained",
    "pq_encode",
    "pq_adc_topk",
    "avro_decode_binary",
    "levenshtein_near_dup",
    "window_stats",
    "scd2_history",
    "ivf_partitioned_probe",
    "bigram_perplexity",
    "corpus_curate",
    "minhash_containment",
    "multimodal_phash_near_dup",
    # round 5
    "substring_dup_spans",
    "stream_stream_left_outer",
    "unpivot_melt",
    "lateral_topk_per_group",
    "record_linkage",
    "triangle_count",
    "time_decay_agg",
    "tfidf_cosine_topk",
    "incremental_agg",
    "hypertable_rollup",
    "pareto_front",
    "dynamic_partition_pruning",
    "stream_stream_full_outer",
    "histogram_quantiles",
    "pq_rerank_topk",
    "matryoshka_rerank_topk",
    "ivf_adc_rerank_topk",
    "runtime_bloom_join",
    "aqe_join_upgrade",
    "streaming_dedup_within_watermark",
    "acid_file_skipping",
    # round 6
    "dedup_collapse_lsh",
    "heavy_hitters_cms",
    "multimodal_real_decode",
    "acid_change_feed",
    "jdbc_roundtrip",
    "acid_cdf_stream",
    "url_dedup",
    "kafka_mock_stream",
    "hw_release_sql",
    "cogroup_user_profile",
    "doc_chunking",
    "dq_suite",
    "anomaly_zscore",
    "streaming_observe",
    # round 7
    "merge_upsert_sql",
    "merge_full_sync_sql",
    "jdbc_exactly_once_stream",
    "acid_cdf_parallel_stream",
    "acid_cdf_recorded",
    "update_delete_sql",
    "time_travel_sql",
    "acid_constraints",
    "streaming_cdf_ivm",
    "acid_stream_sink",
    "acid_pruned_dml",
    "acid_deletion_vectors",
    "acid_multi_table_txn",
    # round 8
    "acid_partitioned_prune",
    "acid_mor_dml",
    "acid_insert_sql",
    "acid_txn_sql",
    "acid_table_stream",
    "acid_show_partitions",
    "acid_table_changes_sql",
    "acid_partition_evolution",
    # round 11
    "acid_liquid_optimize",
    "acid_bloom_index",
    "acid_generated_columns",
    "acid_compact_small",
    "acid_reader_features",
    "acid_merge_evolve",
    "acid_zorder_incremental",
    # round 13
    "dedup_incremental",
    "ivf_incremental_index",
    "acid_wap_publish",
    "dedup_incremental_stream",
    "text_index_incremental",
    # round 14
    "acid_ref_retention",
    "catalog_rebase",
    "text_index_incremental_stream",
    # round 15
    "knn_graph_banded",
    "acid_autovacuum",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


#: ANN quality: recall@k is the metric the DuckDB oracle CANNOT see (its
#: twin shares the blocking), so the bench emits it next to the timings —
#: a speed/recall trade-off auditable per round. Ground truth is the
#: brute-force scan at the SAME sf: full-dim cosine for the IVF/MRL
#: family, exact L2 for PQ-ADC (its native metric).
RECALL_QUERY_IDS = (0, 3, 7, 11, 40)


def ann_recall(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    from spark_streaming_apps_spark.operators import similarity as S
    from spark_streaming_apps_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    e = emb.withColumn(
        "e", F.expr("transform(embedding, x -> cast(x as double))"))
    l2 = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
          "cast(0.0 as double), (a, v) -> a + v)")

    def topk_ids(df) -> set:
        return {r.vec_id for r in df.collect()}

    recalls: dict[str, list[float]] = {
        "similarity_ivf_topk": [], "ivf_topk_trained": [],
        "matryoshka_topk": [], "matryoshka_trained_topk": [],
        "pq_adc_topk": [],
        "pq_rerank_topk": [], "matryoshka_rerank_topk": [],
        "ivf_adc_rerank_topk": []}
    for qid in RECALL_QUERY_IDS:
        cos_truth = topk_ids(S.cosine_topk(emb, qid))
        q = e.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        l2_truth = {r.vec_id for r in
                    e.filter(F.col("vec_id") != qid).join(F.broadcast(q))
                    .select("vec_id", F.expr(l2).alias("d"))
                    .orderBy("d", "vec_id").limit(S.TOP_K).collect()}
        recalls["similarity_ivf_topk"].append(
            len(cos_truth & topk_ids(S.ivf_topk(emb, qid))) / len(cos_truth))
        recalls["ivf_topk_trained"].append(
            len(cos_truth & topk_ids(S.ivf_topk_trained(emb, qid)))
            / len(cos_truth))
        recalls["matryoshka_topk"].append(
            len(cos_truth & topk_ids(S.matryoshka_topk(emb, qid)))
            / len(cos_truth))
        # untrained (above) stays as the contrast row; the TRAINED
        # prefix must clear the 0.5 pre-rerank floor (MRL_TRAINED_DIM
        # calibration)
        recalls["matryoshka_trained_topk"].append(
            len(cos_truth & topk_ids(S.matryoshka_trained_topk(emb, qid)))
            / len(cos_truth))
        recalls["pq_adc_topk"].append(
            len(l2_truth & topk_ids(S.pq_adc_topk(emb, qid))) / len(l2_truth))
        recalls["pq_rerank_topk"].append(
            len(l2_truth & topk_ids(S.pq_rerank_topk(emb, qid)))
            / len(l2_truth))
        recalls["matryoshka_rerank_topk"].append(
            len(cos_truth & topk_ids(S.matryoshka_rerank_topk(emb, qid)))
            / len(cos_truth))
        recalls["ivf_adc_rerank_topk"].append(
            len(l2_truth & topk_ids(S.ivf_adc_rerank_topk(emb, qid)))
            / len(l2_truth))
    out = {k: round(sum(v) / len(v), 3) for k, v in recalls.items()}
    # the recall/IO knob, quantified: trained-IVF recall as the probe
    # count sweeps (scanned fraction ~= probes/n_cells)
    sweep = {}
    for probes in (1, 2, 4, 8):
        rs = []
        for qid in RECALL_QUERY_IDS:
            truth = topk_ids(S.cosine_topk(emb, qid))
            got = topk_ids(S.ivf_topk_trained(emb, qid, probes=probes))
            rs.append(len(truth & got) / len(truth))
        sweep[f"probes={probes}"] = round(sum(rs) / len(rs), 3)
    out["ivf_probe_sweep"] = sweep
    # the funnel SERVES at the calibrated config (SERVE_PROBES /
    # SERVE_SHORTLIST, pinned from probes_for_recall at a 0.9 floor) —
    # that is what the ivf_adc_rerank_topk rows above already measure.
    # The calibration is re-run here to confirm the pinned default still
    # clears the floor on this corpus...
    probes, shortlist, r90 = S.probes_for_recall(emb, target=0.9)
    out["ivf_adc_rerank_calibration"] = {
        "probes": probes, "shortlist": shortlist, "recall_at_10": r90,
        "served_default": {"probes": S.SERVE_PROBES,
                           "shortlist": S.SERVE_SHORTLIST}}
    # ...and the legacy cheap 2-probe config stays as TELEMETRY: its
    # recall + cost beside the served default, so the recall/IO
    # trade-off the default embodies is auditable every round
    rs = []
    for qid in RECALL_QUERY_IDS:
        q = e.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        l2_truth = {r.vec_id for r in
                    e.filter(F.col("vec_id") != qid).join(F.broadcast(q))
                    .select("vec_id", F.expr(l2).alias("d"))
                    .orderBy("d", "vec_id").limit(S.TOP_K).collect()}
        got = topk_ids(S.ivf_adc_rerank_topk(emb, qid, probes=2,
                                             shortlist=50))
        rs.append(len(l2_truth & got) / len(l2_truth))
    t0 = time.perf_counter()
    materialize(S.ivf_adc_rerank_topk(emb, probes=2, shortlist=50))
    out["ivf_adc_rerank_2probe_telemetry"] = {
        "probes": 2, "shortlist": 50,
        "recall_at_10": round(sum(rs) / len(rs), 3),
        "sec": round(time.perf_counter() - t0, 3)}
    return out


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]")
    qs = catalog.queries()
    # warmup: JVM + codegen + parquet footer caches
    materialize(qs["count_rows"](spark, SF_DIR))
    # warmup the Python worker pool + Arrow serializers too, so daemon
    # spawn cost doesn't land on the first mapInPandas query in the list
    materialize(
        spark.range(0, CORES_HINT * 4, 1, CORES_HINT)
        .mapInPandas(lambda it: it, schema="id long"))
    # and the OS page cache for every table the headline set reads, so the
    # first query per table measures compute, not disk state
    from spark_streaming_apps_spark.sources.tables import load_table
    for t in ("events", "orders", "lineitem", "customer",
              "documents", "embeddings"):
        materialize(load_table(spark, SF_DIR, t))
    # one tiny stateful stream at sf0.001 warms the streaming stack
    # (state-store provider, python state serializer, memory sink) so the
    # sf0.1 streaming keys measure the stream, not first-use init
    from spark_streaming_apps_spark.streaming import jobs as _sj
    materialize(_sj.highwater_state_stream(spark, "/root/testdata/sf0.001"))

    # The host is a shared VM with visible CPU steal: single-shot timings
    # spiked 1s -> 8-10s on random queries run-to-run. Per-query min over
    # REPS full passes measures the engine, not the neighbors. The shared
    # sketch-layer memo (dedup.clear_sketch_cache) is released at the top of each
    # pass so its one-time build cost stays inside exactly one dedup query
    # per pass (same accounting as a single cold run).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    from spark_streaming_apps_spark.operators import dedup
    from spark_streaming_apps_spark.operators import similarity as _sim
    # Honest train-once accounting: drop any persisted quantizer so pass
    # 0 pays the full training cost (reported as train_once_sec) and
    # later passes measure the serve path (what a query actually costs
    # once the write-once artifact exists).
    import shutil as _sh
    _sh.rmtree(_sim._ANN_STORE, ignore_errors=True)
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    # per-key phase splits (telemetry.timed): min across passes, like
    # the headline per-key numbers — lets a key whose scenario folds a
    # structurally-separate phase (the incremental keys' retention-path
    # retire) stay mechanically comparable across rounds
    from spark_streaming_apps_spark import telemetry
    splits_min: dict[str, float] = {}
    for rep in range(reps):
        dedup.clear_sketch_cache()
        for key in BENCH_KEYS:
            telemetry.splits.clear()
            t0 = time.perf_counter()
            materialize(qs[key](spark, SF_DIR))
            t = round(time.perf_counter() - t0, 3)
            if rep == 0:
                cold[key] = t
            times[key] = min(times.get(key, t), t)
            for name, val in telemetry.splits.items():
                splits_min[name] = min(splits_min.get(name, val), val)
            print(f"  [{rep}] {key}: {t:.3f}s", file=sys.stderr)

    recall = ann_recall(spark)
    for key, r in recall.items():
        print(f"  recall@10 {key}: {r}", file=sys.stderr)

    # The Structured Streaming machinery FLOOR: an empty 2-micro-batch
    # rate stream through the memory sink — no rows, no state, no table.
    # Six of the ten most expensive bench keys are ~this floor x their
    # batch count; recording it lets every streaming key be read as
    # floor + work (the train_once_sec discipline applied to streams).
    stream_floor = None
    try:
        t0 = time.perf_counter()
        q = (spark.readStream.format("rate")
             .option("rowsPerSecond", "1").load().limit(0)
             .writeStream.format("memory").queryName("bench_floor")
             .trigger(availableNow=True).start())
        done1 = q.awaitTermination(60)
        if not done1:
            q.stop()
        q2 = (spark.readStream.format("rate")
              .option("rowsPerSecond", "1").load().limit(0)
              .writeStream.format("memory").queryName("bench_floor2")
              .trigger(availableNow=True).start())
        done2 = q2.awaitTermination(60)
        if not done2:
            q2.stop()
        if done1 and done2:
            stream_floor = round((time.perf_counter() - t0) / 2, 3)
            print(f"  stream_floor_sec (per start+drain): "
                  f"{stream_floor}", file=sys.stderr)
        else:
            # a query outlived its 60 s window: the second start would
            # overlap the first and the clamped wall-clock would be
            # poisoned telemetry — discard rather than record
            print("  stream_floor probe timed out; floor discarded",
                  file=sys.stderr)
    except Exception as e:                             # noqa: BLE001
        print(f"  stream_floor probe failed: {e}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Two stdout lines, both valid JSON. The FULL per-query/recall map goes
    # first; the LAST line is a compact headline that always fits a bounded
    # tail capture (round 5's driver artifact recorded parsed:null because
    # the 75-query map outgrew it — the head of the single line, with
    # "value", was cut off).
    train_keys = ("kmeans_refine", "pq_encode", "ivf_topk_trained",
                  "pq_adc_topk", "pq_rerank_topk", "ivf_adc_rerank_topk")
    # keys that serve from one shared computation: their per-key numbers
    # are NOT independent (the shared cost lands on whichever key runs
    # first in a pass, the other pays a filter over the cached result) —
    # compare the combined_sec across rounds, never the split
    shared_groups = {
        "ss_outer_drain": {
            "keys": ["stream_stream_left_outer", "stream_stream_full_outer"],
            "combined_sec": round(
                times.get("stream_stream_left_outer", 0.0)
                + times.get("stream_stream_full_outer", 0.0), 3),
        },
    }
    def _git_head():
        import subprocess
        try:
            return subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True,
                text=True, timeout=10,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip() or None
        except Exception:                              # noqa: BLE001
            return None

    detail = {
        "metric": "headline_queries_detail",
        "verified_at": _git_head(),
        "queries": times,
        "recall_at_10": recall,
        "train_once_sec": {k: cold[k] for k in train_keys if k in cold},
        "stream_floor_sec": stream_floor,
        "retire_sec": {k: v for k, v in sorted(splits_min.items())
                       if k.endswith(".retire_sec")},
        # full-recompute equality pins are deliberately part of the
        # incremental keys' scenarios (they prove the maintained state
        # equals a from-scratch build) but are NOT serving cost — the
        # split keeps headline rows adjudicable as coverage evolves
        # (r15 ADVICE: the pins are ~40% of dedup_incremental's row)
        "pin_sec": {k: v for k, v in sorted(splits_min.items())
                    if k.endswith(".pin_sec")},
        "shared_cost_groups": shared_groups,
        "sf": float(sf),
    }
    print(json.dumps(detail))
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "sf": float(sf),
        "n_queries": len(times),
        # the per-key map RIDES THE LAST LINE so the driver's bounded
        # tail capture gets per-key attribution (r16 PERF had
        # n_common=1: the map only rode the first line, which the tail
        # truncated). ~2.5 KB for 127 keys — well within a tail.
        # "total" is kept: entries are only ever added, never
        # removed/renamed (driver contract).
        "queries": {"total": round(sum(times.values()), 3), **times},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
