"""Invariants for the training-data curation, graph, and layout operators
(value-level parity vs DuckDB lives in tools/selfcheck.py; these pin the
semantic properties parity alone can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import extensions, graph, training


def test_stratified_sample_rate_per_stratum(tables):
    docs = tables["documents"]
    sampled = training.stratified_sample(docs)
    per = (docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
           .join(sampled.groupBy("source").agg(F.count(F.lit(1)).alias("k")),
                 "source", "left").fillna(0, ["k"]).collect())
    for r in per:
        # hash sampling at 25 docs/stratum: rate within a loose binomial band
        assert 0 <= r["k"] <= r["n"]
    total = sum(r["n"] for r in per)
    kept = sum(r["k"] for r in per)
    assert abs(kept / total - training.SAMPLE_PCT / 100) < 0.15


def test_train_test_split_disjoint_and_complete(tables):
    out = {r["split"]: r for r in
           training.train_test_split(tables["documents"]).collect()}
    n_docs = tables["documents"].count()
    assert set(out) == {"train", "test"}
    assert out["train"]["n_docs"] + out["test"]["n_docs"] == n_docs
    for r in out.values():  # hash split can't duplicate a doc
        assert r["n_docs"] == r["n_distinct"]


def test_sequence_packing_covers_each_doc_once(tables):
    docs = tables["documents"]
    packed = training.sequence_packing(docs)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    bad = packed.filter(F.col("first_pack") > F.col("last_pack")).count()
    assert bad == 0
    # bucket-local layout: per bucket, token ranges tile without gaps —
    # total tokens equals the last doc's start + its length
    chk = (packed.groupBy("bucket")
           .agg(F.sum("n_tokens").alias("tot"),
                F.max(F.struct("doc_id", "n_tokens")).alias("_last"))
           .count())
    assert chk == training.PACK_BUCKETS


def test_pii_redact_finds_planted_pii(tables):
    out = training.pii_redact(tables["documents"])
    planted_email = out.filter((F.col("doc_id") % 7 == 0)
                               & (F.col("n_emails") == 0)).count()
    planted_phone = out.filter((F.col("doc_id") % 11 == 0)
                               & (F.col("n_phones") == 0)).count()
    assert planted_email == 0 and planted_phone == 0


def test_contamination_excludes_benchmark_docs(tables):
    out = training.contamination_check(tables["documents"])
    assert out.filter(F.col("doc_id") % training.CONTAM_BENCH_MOD == 0).count() == 0
    mislabeled = out.filter(
        (F.col("contaminated") == 1)
        != (F.col("n_overlap") >= training.CONTAM_MIN_OVERLAP)).count()
    assert mislabeled == 0


def test_pagerank_mass_conserved(tables):
    ranks = graph.pagerank_nations(
        tables["customer"], tables["orders"], tables["lineitem"],
        tables["supplier"])
    total = ranks.agg(F.sum("rank")).first()[0]
    # no dangling nations in the trade graph → PageRank mass sums to 1
    assert abs(total - 1.0) < 1e-4


def test_zorder_buckets_bound_both_dims(tables):
    out = extensions.zorder_layout(tables["orders"])
    tile = 1 << (extensions.ZORDER_BITS - extensions.ZORDER_BUCKET_SHIFT // 2)
    too_wide = out.filter((F.col("ck_span") >= 16) | (F.col("dy_span") >= 16)).count()
    assert too_wide == 0, f"z-order tile bound violated (tile={tile})"


def test_text_index_maintain_is_o_batch_and_additive(spark, tmp_path):
    """The text index's maintenance contract: each arrival is one
    linked catalog entry; postings/doc_len only APPEND (no history
    rewrite), term_df/corpus_stats counters stay exactly additive
    (pinned in-result by the scenario; re-checked here structurally)."""
    from pathlib import Path

    import pyspark.sql.functions as F

    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.operators import text

    out = text.text_index_incremental(spark, "/root/testdata/sf0.001",
                                      tmp_path)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.stats_fresh_equal for r in rows)
    cat = AcidCatalog(spark, Path(tmp_path) / "text_index_sf0.001")
    # one pure-insert arrival + one MIXED (arrival + retention delete)
    # batch = two maintenance entries on every table
    for t in ("postings", "doc_len", "term_df", "corpus_stats"):
        assert cat.table(t).latest_version() == 2, t
    # the arrival was a linked O(batch) append, the mixed batch an
    # apply_cdf; counters merged both times
    assert cat.table("postings")._manifest(1)["op"] == "append"
    assert cat.table("postings")._manifest(2)["op"] in (
        "apply_cdf", "apply_cdf_mor")
    # r16: term_df rides the touched-file-pruned additive merge
    assert cat.table("term_df")._manifest(1)["op"] == "merge_add_pruned"
    assert cat.table("term_df")._manifest(2)["op"] == "merge_add_pruned"
    # the one-row corpus counter stayed one row
    assert cat.read("corpus_stats").count() == 1
    # doc_len rows = FINAL-corpus docs with tokens (deleted slice out)
    n = (text._index_batch_tables(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter(f"NOT ({text.TEXT_INC_DELETE_PRED})"))[1].count())
    assert cat.read("doc_len").count() == n


def test_text_index_postings_probe_is_bucket_bounded(spark, tmp_path):
    """The serve-path layout contract: postings files are single-
    token-bucket (partition_by) with token bloom sidecars, so a query
    for K terms opens only files in those terms' buckets — frequent
    terms included — never the whole table."""
    import zlib
    from pathlib import Path

    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.operators import text

    text.text_index_incremental(spark, "/root/testdata/sf0.001",
                                tmp_path)
    cat = AcidCatalog(spark, Path(tmp_path) / "text_index_sf0.001")
    t = cat.table("postings")
    terms = list(text.BM25_TERMS)
    want_buckets = {zlib.crc32(s.encode()) % text.TEXT_BUCKETS
                    for s in terms}
    paths, total = t.pruned_files_in("token", terms)
    assert 0 < len(paths) < total, (len(paths), total)
    # every opened file sits in a queried term's bucket (bloom false
    # positives could add others in principle; at this size the
    # single-bucket layout makes the probe exact)
    m = t._manifest(t.latest_version())
    by_path = {str(t.path / f["path"]): (f.get("partition") or {})
               for f in m["files"]}
    opened_buckets = {by_path[p].get("tbucket") for p in paths}
    assert opened_buckets <= want_buckets, (opened_buckets,
                                            want_buckets)


def test_fenced_merge_add_blocks_replay(spark, tmp_path):
    """merge_add with (app_id, batch_id): a replayed batch's partials
    add NOTHING — the additive-counter double-count caveat, closed."""
    from spark_streaming_apps_spark.acid import AcidTable

    t = AcidTable.create(
        spark, tmp_path / "t",
        spark.createDataFrame([("a", 1)], "k string, n long"))
    p = spark.createDataFrame([("a", 2), ("b", 5)], "k string, n long")
    assert t.merge_add(p, ["k"], app_id="m", batch_id=0) == 1
    state = {(r.k, r.n) for r in t.read().collect()}
    assert state == {("a", 3), ("b", 5)}
    # replay: fenced out, counters unchanged
    assert t.merge_add(p, ["k"], app_id="m", batch_id=0) is None
    assert {(r.k, r.n) for r in t.read().collect()} == state
    # next batch adds once
    assert t.merge_add(p, ["k"], app_id="m", batch_id=1) == 2
    assert {(r.k, r.n) for r in t.read().collect()} \
        == {("a", 5), ("b", 10)}


def test_text_index_apply_fenced_replay_changes_nothing(spark,
                                                        tmp_path):
    """A replayed fenced text_index_apply batch re-commits NOTHING on
    any of the four index tables (appends, retires, AND the signed
    counter partials)."""
    from pathlib import Path

    from spark_streaming_apps_spark.acid_catalog import AcidCatalog
    from spark_streaming_apps_spark.operators import text

    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))
    initial = docs.filter("doc_id % 3 != 0")
    cat = AcidCatalog(spark, Path(tmp_path) / "ti")
    p, dl, df, c = text._index_batch_tables(initial)
    cat.create_table("postings", p, partition_by=["tbucket"],
                     bloom_by=["token"])
    cat.create_table("doc_len", dl)
    cat.create_table("term_df", df)
    cat.create_table("corpus_stats", c)
    mixed = (docs.filter("doc_id % 3 = 0").limit(40)
             .withColumn("_change_type", F.lit("insert"))
             .unionByName(initial.limit(10)
                          .withColumn("_change_type",
                                      F.lit("delete"))))
    text.text_index_apply(cat, mixed, txn=("tm", 0))
    vs = {t: cat.table(t).latest_version()
          for t in ("postings", "doc_len", "term_df", "corpus_stats")}
    counts = {t: cat.read(t).count() for t in vs}
    stats = cat.read("corpus_stats").collect()
    # REPLAY the same fenced batch: no table moves, no counter drifts
    text.text_index_apply(cat, mixed, txn=("tm", 0))
    assert {t: cat.table(t).latest_version() for t in vs} == vs
    assert {t: cat.read(t).count() for t in vs} == counts
    assert cat.read("corpus_stats").collect() == stats
