"""Scale-contract assertions: the physical plans must be the ones you'd
ship to a 1000-executor cluster — filters at the scan, pruned columns,
broadcast dims, no unconditioned joins except deliberate 1-row broadcasts,
no quadratic candidate steps in the dedup/similarity paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import (
    dedup, highwater, relational, similarity)
from spark_streaming_apps_spark.plans import (
    bnlj_count, broadcast_join_count, cartesian_join_count, equi_join_on,
    has_pushed_filter, read_schemas, shuffled_hash_join_count,
    sort_merge_join_count)


def test_filter_pushdown_reaches_scan(tables):
    out = relational.filter_neq(tables["lineitem"])
    assert has_pushed_filter(out, "l_linenumber")


def test_projection_prunes_columns(tables):
    out = relational.filter_neq(tables["lineitem"])
    schemas = read_schemas(out)
    assert schemas, "no ReadSchema found"
    # 11-column lineitem must scan only the 3 projected columns
    assert all(len(s.split(",")) == 3 for s in schemas), schemas


def test_3way_join_broadcasts_dim(tables):
    out = relational.join_inner_3way(
        tables["orders"], tables["lineitem"], tables["customer"])
    assert broadcast_join_count(out) >= 1


def test_flagship_only_broadcast_crossjoin(tables):
    out = highwater.hw_release_query(
        tables["events"], tables["orders"], tables["lineitem"])
    # the only nested-loop joins allowed are broadcasts of 1-row dims
    # (first-gap scalar, HW scalar)
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) <= 3


def test_flagship_release_join_broadcasts(tables):
    """The release existence-check must stream `orders` past a
    broadcast build of the tiny release delta — a BroadcastHashJoin
    with ZERO shuffle joins anywhere in the plan. (Round-8 regression:
    a broadcast hint on the LEFT of a left-semi join is unsupported —
    HintErrorLogger dropped it and the full orders table shuffled.)"""
    out = highwater.hw_release_query(
        tables["events"], tables["orders"], tables["lineitem"])
    assert broadcast_join_count(out) >= 1
    assert sort_merge_join_count(out) == 0
    assert shuffled_hash_join_count(out) == 0


def test_ngram_jaccard_no_unblocked_selfjoin(tables):
    out = dedup.ngram_jaccard_pairs(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    assert equi_join_on(out, "sh_h")


def test_near_dup_no_allpairs_crossjoin(tables):
    out = similarity.embedding_near_dup_pairs(tables["embeddings"])
    # pair generation must be keyed on the IVF cell; only the tiny centroid
    # broadcast (8 rows) may be a nested loop
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) <= 2
    assert equi_join_on(out, "cell")


def test_range_layout_skips_files(spark, tables):
    """compact_range_write produces a sorted, range-disjoint layout; a
    point predicate on the layout key must reach the scan (footer min/max
    stats then skip every non-matching row group — the B-tree-index
    replacement, SURVEY.md §4)."""
    from spark_streaming_apps_spark.catalog import SCRATCH
    from spark_streaming_apps_spark.operators.extensions import (
        compact_range_write)

    row = compact_range_write(spark, "/root/testdata/sf0.001", SCRATCH).first()
    assert row.n_overlapping_ranges == 0
    assert row.n_files == 8
    back = spark.read.parquet(str(SCRATCH / "compact_range"))
    probe = back.filter(F.col("l_orderkey") == 42).select("l_orderkey",
                                                          "l_quantity")
    assert has_pushed_filter(probe, "l_orderkey")


def test_bucketed_join_has_no_join_exchange(spark):
    """Both join inputs are bucketed+sorted on the key, so with broadcast
    disabled the sort-merge join must consume the buckets directly — the
    ONLY exchange in the plan is the post-join aggregation, never the join
    inputs (at 100 TB: no re-shuffle of the fact tables per join)."""
    from spark_streaming_apps_spark.catalog import SCRATCH
    from spark_streaming_apps_spark.operators.extensions import bucketed_join
    from spark_streaming_apps_spark.plans import _op_count, physical_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, "/root/testdata/sf0.001", SCRATCH)
        plan = physical_plan(out)
        assert "SortMergeJoin" in plan
        assert _op_count(out, "Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_band_join_is_equi(tables):
    out = dedup.minhash_pairs(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    assert equi_join_on(out, "band_hash")


def test_knn_graph_cell_keyed_no_product(tables):
    out = similarity.knn_graph(tables["embeddings"])
    # candidate pairs must come from the cell equi-join; the only nested
    # loop allowed is the tiny centroid broadcast
    assert cartesian_join_count(out) == 0
    assert equi_join_on(out, "cell")


def test_knn_graph_never_forces_corpus_broadcast(tables):
    """The vector fetch must be a keyed join whose strategy AQE picks by
    size — a forced broadcast of the corpus vector table cannot survive a
    100x scale-up. The memoized index layer is persisted with lineage
    KEPT (fault tolerance — see dedup._materialize), so the analyzed plan
    shows the index's own bounded 32-row centroid hint once per lineage
    copy: knn_graph references the assigned layer 8x (cand a+b, va, vb,
    then the union mirrors all four). The assertion is therefore
    relative — knn_graph must add ZERO hints beyond those copies."""
    from spark_streaming_apps_spark.plans import forced_broadcast_count
    emb = tables["embeddings"]
    per_copy = forced_broadcast_count(
        similarity._ivf_assigned(emb, similarity.N_PROBES))
    out = similarity.knn_graph(emb)
    assert forced_broadcast_count(out) == 8 * per_copy


def test_semdedup_cell_keyed_no_product(tables):
    out = similarity.semdedup(tables["embeddings"])
    assert cartesian_join_count(out) == 0
    assert equi_join_on(out, "cell")


def test_inverted_index_prunes_documents_scan(tables):
    from spark_streaming_apps_spark.operators import text
    out = text.inverted_index(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0


def test_quality_funnel_no_joins_beyond_rep(tables):
    from spark_streaming_apps_spark.operators import training
    out = training.quality_funnel(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    # 5-column documents scans must read only doc_id + text
    schemas = read_schemas(out)
    assert schemas and all(len(s.split(",")) <= 2 for s in schemas), schemas


def test_interval_join_is_equi_not_nested_loop(tables):
    from spark_streaming_apps_spark.operators import analytics
    out = analytics.interval_join_bucketed(tables["events"])
    # the whole point: bucket blocking turns the BETWEEN theta join into
    # an equi-join on the bucket key — no nested-loop/cartesian anywhere
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    assert equi_join_on(out, "bucket")


def test_pq_adc_no_product_and_broadcast_dtab(tables):
    """ADC's joins are tiny-side broadcasts (codebook, distance table) or
    keyed aggregations — a cartesian anywhere would mean codes are being
    paired all-against-all."""
    out = similarity.pq_adc_topk(tables["embeddings"])
    assert cartesian_join_count(out) == 0
    assert broadcast_join_count(out) >= 1


def test_levenshtein_candidates_are_band_keyed(tables):
    """The O(len^2) DP must only run on band-bucket collisions: the pair
    join is keyed on band_hash, never a cross product."""
    out = dedup.levenshtein_near_dup(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    assert equi_join_on(out, "band_hash")


def test_ivf_partitioned_probe_prunes_cells(spark):
    """The cell filter must execute as directory-level partition pruning
    at the scan — probe IO proportional to probes/n_cells of the index,
    the layout contract that makes ANN serving scale."""
    from spark_streaming_apps_spark.catalog import SCRATCH
    from spark_streaming_apps_spark.plans import partition_filters
    out = similarity.ivf_partitioned_probe(
        spark, "/root/testdata/sf0.001", SCRATCH)
    assert partition_filters(out), "cell predicate did not reach the scan"


def test_record_linkage_block_keyed(tables):
    """Linkage candidates must come from the block equi-join — never an
    unblocked part × part product."""
    from spark_streaming_apps_spark.operators.dedup import record_linkage
    out = record_linkage(tables["part"])
    assert cartesian_join_count(out) == 0
    assert bnlj_count(out) == 0
    assert equi_join_on(out, "a_block")


def test_triangle_count_all_keyed_joins(tables):
    """Triangle enumeration = oriented keyed equi-joins; k-bounded degree
    means no join key can explode, and no cartesian may appear."""
    from spark_streaming_apps_spark.operators.graph import triangle_count
    out = triangle_count(tables["embeddings"])
    assert cartesian_join_count(out) == 0
    # only the knn subplan's bounded centroid broadcast (N_CELLS rows)
    # may be a nested loop — same allowance as the near-dup plan test
    assert bnlj_count(out) <= 2


def test_time_decay_single_user_shuffle(tables):
    """Both windows and the final aggregate must ride ONE user_id
    exchange (Catalyst reuses the partitioning) — the whole op is a
    single-pass windowed aggregation."""
    from spark_streaming_apps_spark.operators.analytics import time_decay_agg
    from spark_streaming_apps_spark.plans import physical_plan
    out = time_decay_agg(tables["events"])
    plan = physical_plan(out)
    assert plan.lower().count("exchange hashpartitioning") <= 1, plan


def test_tfidf_join_is_token_keyed(tables):
    """Sparse cosine accumulation must join on the token key (bounded
    posting lists), never an all-pairs product."""
    from spark_streaming_apps_spark.operators.text import tfidf_cosine_topk
    out = tfidf_cosine_topk(tables["documents"])
    assert cartesian_join_count(out) == 0
    assert equi_join_on(out, "token")


def test_dpp_injects_runtime_partition_filter(spark):
    """The event_type partition filter must be injected at runtime from
    the dim join (dynamicpruningexpression on the scan) — scanning 2 of
    N partitions instead of the whole fact layout."""
    from spark_streaming_apps_spark.catalog import SCRATCH
    from spark_streaming_apps_spark.operators.extensions import (
        dynamic_partition_pruning)
    from spark_streaming_apps_spark.plans import partition_filters

    out = dynamic_partition_pruning(spark, "/root/testdata/sf0.001", SCRATCH)
    pf = " ".join(partition_filters(out)).lower()
    assert "dynamicpruning" in pf, pf


def test_pareto_front_windows_levels_not_rows(tables):
    """The skyline's only global sort is over DISTINCT price levels (the
    aggregated table), and the join back to rows is keyed on price."""
    from spark_streaming_apps_spark.operators.analytics import pareto_front
    out = pareto_front(tables["part"])
    assert cartesian_join_count(out) == 0
    assert equi_join_on(out, "p_retailprice")


def test_ivf_adc_rerank_stack_plan(tables):
    """The three-stage funnel must stay keyed end-to-end: cell prune is a
    semi-join on cell, candidate restriction a semi-join on vec_id, the
    rerank a 50-row broadcast probe — never a cartesian; the only nested
    loops are the 1-row query-vector broadcasts."""
    out = similarity.ivf_adc_rerank_topk(tables["embeddings"])
    assert cartesian_join_count(out) == 0
    assert broadcast_join_count(out) >= 2


def test_runtime_bloom_filter_reaches_fact_side(tables, spark):
    """The runtime bloom filter must actually inject: a bloom aggregate
    built from the filtered orders keys, and a might_contain pre-filter
    on the lineitem side before its exchange."""
    from spark_streaming_apps_spark.operators import extensions
    from spark_streaming_apps_spark.plans import physical_plan
    out = extensions.runtime_bloom_join(spark, "/root/testdata/sf0.001")
    p = physical_plan(out)
    assert "might_contain" in p, p[:2000]
    assert "bloom_filter" in p.lower()


def test_aqe_upgrades_smj_to_broadcast(tables, spark):
    """With the static broadcast threshold off, the initial plan must be a
    sort-merge join; after execution AQE's final plan must have upgraded
    it to a broadcast-hash join off the measured tiny build side."""
    from spark_streaming_apps_spark.operators import extensions
    out = extensions.aqe_join_upgrade(spark, "/root/testdata/sf0.01")
    before = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in before or "AdaptiveSparkPlan" in before
    out.collect()  # finalize THIS DataFrame's adaptive plan (a write
    # action would plan a fresh QueryExecution and leave this one initial)
    after = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in after
    assert "BroadcastHashJoin" in after, after[:3000]


def test_aqe_splits_skewed_join_partition(spark):
    """The planted 50%-hot key must trigger AQE's OptimizeSkewedJoin:
    the FINAL adaptive plan's sort-merge join carries the skew handling
    marker (the hot partition was split across tasks), and results are
    unchanged vs the oracle (covered by selfcheck)."""
    from spark_streaming_apps_spark.operators import analytics
    out = analytics.aqe_skew_join(spark, "/root/testdata/sf0.01")
    out.collect()  # finalize THIS DataFrame's adaptive plan
    after = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in after
    assert "skew=true" in after, after[:3000]


def test_merge_sql_compiles_to_single_keyed_exchange(spark, tmp_path):
    """The compiled MERGE's data plane must stay ONE keyed full-outer
    shuffle — the statement form may not plan worse than the
    AcidTable.merge API it mirrors (cardinality check off: that extra
    aggregate is an opt-out validation pass, not the data plane)."""
    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.merge_sql import parse_merge
    from spark_streaming_apps_spark.plans import _op_count

    df = spark.createDataFrame([(i, i) for i in range(100)],
                               "id long, val long")
    t = AcidTable.create(spark, tmp_path / "t", df)
    spark.createDataFrame([(1, 99), (200, 5)], "id long, val long") \
        .createOrReplaceTempView("plan_merge_src")
    # compile the statement's build plan without committing
    import spark_streaming_apps_spark.merge_sql as M
    mg = parse_merge("""
        MERGE INTO tgt t USING plan_merge_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val
        WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
    """)
    captured = {}
    # equi-join MERGE serves from the touched-file-pruned COW path;
    # capture the compiled rewrite applied to a full snapshot (same
    # statement plan the full-rewrite path would run)
    orig = AcidTable._cow_commit

    def spy(self, probe, rewrite, op, max_retries=20, empty_noop=True,
            **kw):
        captured["plan_df"] = rewrite(self.read())
        return orig(self, probe, rewrite, op, max_retries, empty_noop,
                    **kw)
    AcidTable._cow_commit = spy
    try:
        M.merge_into_sql(spark, """
            MERGE INTO tgt t USING plan_merge_src s ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET val = s.val
            WHEN NOT MATCHED THEN INSERT (id, val) VALUES (s.id, s.val)
        """, tables={"tgt": t}, check_cardinality=False)
    finally:
        AcidTable._cow_commit = orig
    out = captured["plan_df"]
    # small source side: AQE/Catalyst may broadcast it (0 join exchange)
    # or shuffle both sides (2); it must never exceed the keyed pair
    assert _op_count(out, "Exchange") <= 2
    assert _op_count(out, "CartesianProduct") == 0
    assert mg.update_set == {"val": "s.val"}
