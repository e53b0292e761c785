"""Planted-near-duplicate recall for all three near-dup detectors, plus the
exact/approx paths.

dedup.planted_corpus plants a mutated copy of every 50th doc at
doc_id+1_000_000 (true 3-gram Jaccard of the planted pairs at sf0.001:
0.75-0.96). Each detector's recall floor below is CALIBRATED to its known,
deterministic behavior on those pairs — all hashes are seeded, so the
outcome is stable, and a regression below the floor means real breakage:

* minhash (16 hashes, 4 bands): P(candidate) at J=0.77 is ~0.78, so one
  borderline pair (doc 400) is legitimately missed → floor 9/10.
* ngram-jaccard (rare-shingle blocking, df<=4): doc 50's shingles are all
  common, so the pair is never a candidate → floor 9/10.
* simhash (48-bit, hamming<=6): the 4-token suffix shifts many bits of
  SHORT docs — 4 short-doc pairs exceed the radius → floor 6/10.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import dedup

PLANTED = {(i, i + dedup.PLANT_OFFSET) for i in range(0, 500, dedup.PLANT_EVERY)}


def recovered(pairs_df):
    return {(r[0], r[1]) for r in pairs_df.collect()} & PLANTED


def test_minhash_recovers_planted(tables):
    got = recovered(dedup.minhash_pairs(tables["documents"]))
    assert len(got) >= 9, f"minhash recall regressed: {sorted(got)}"


def test_ngram_jaccard_recovers_planted(tables):
    got = recovered(dedup.ngram_jaccard_pairs(tables["documents"]))
    assert len(got) >= 9, f"ngram-jaccard recall regressed: {sorted(got)}"


def test_simhash_recovers_planted(tables):
    got = recovered(dedup.simhash_pairs(tables["documents"]))
    assert len(got) >= 6, f"simhash recall regressed: {sorted(got)}"


def test_detectors_only_report_high_similarity(tables):
    """Every reported pair must carry a score consistent with its filter."""
    mh = dedup.minhash_pairs(tables["documents"])
    assert mh.filter(F.col("est_jaccard") < 0.5).count() == 0
    sh = dedup.simhash_pairs(tables["documents"])
    assert sh.filter(F.col("hamming") > dedup.SIM_HAMMING_MAX).count() == 0
    nj = dedup.ngram_jaccard_pairs(tables["documents"])
    assert nj.filter(F.col("jaccard") < dedup.JACCARD_MIN).count() == 0


def test_dedup_exact_counts(tables):
    events = tables["events"]
    out = dedup.dedup_exact(events)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == events.count()
    n_groups = events.select("props").distinct().count()
    assert out.count() == n_groups


def test_dedup_approx_within_tolerance(tables):
    row = dedup.dedup_approx(tables["events"]).first()
    assert row.approx_ok == 1
    assert row.exact_distinct > 0


def test_collapse_lsh_is_copy_invariant(spark, tables):
    """The exact-collapse front end makes LSH cost AND output track
    DISTINCT payloads: replicating every document 5x (distinct doc_ids,
    identical text) must yield the same representative pairs with the
    same estimates — only the carried multiplicities grow 5x."""
    docs = tables["documents"].select("doc_id", "text", "lang",
                                      "source", "n_chars")
    base = {(r.doc1, r.doc2, r.est_jaccard): (r.copies1, r.copies2)
            for r in dedup.dedup_collapse_lsh(docs).collect()}
    copies = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 100_000))
              for i in range(5)]
    rep = copies[0]
    for c in copies[1:]:
        rep = rep.unionByName(c)
    got = {(r.doc1, r.doc2, r.est_jaccard): (r.copies1, r.copies2)
           for r in dedup.dedup_collapse_lsh(rep).collect()}
    assert set(got) == set(base)
    assert all(got[k] == (5 * base[k][0], 5 * base[k][1]) for k in base)


def test_dedup_incremental_maintains_index(spark, tmp_path):
    """Incremental dedup mechanics: the batch probe never re-signs the
    corpus, the linked commit appends exactly the batch's rows to BOTH
    index tables atomically, and the maintained index equals a
    from-scratch build (pinned in-result)."""
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog

    sf = "/root/testdata/sf0.001"
    out = dedup.dedup_incremental(spark, sf, tmp_path)
    rows = out.collect()
    assert rows, "expected at least one batch-touching near-dup pair"
    assert all(r.matches_full for r in rows)
    assert all(r.index_fresh_equal for r in rows)
    # every reported pair touches the batch
    assert all(r.doc1 % dedup.BATCH_MOD == dedup.BATCH_REM
               or r.doc2 % dedup.BATCH_MOD == dedup.BATCH_REM
               for r in rows)
    # at least one CORPUS<->BATCH pair exists (the plant split
    # guarantees it), not just batch-internal ones
    assert any((r.doc1 % dedup.BATCH_MOD == dedup.BATCH_REM)
               != (r.doc2 % dedup.BATCH_MOD == dedup.BATCH_REM)
               for r in rows)

    # the index catalog: v0 create + ONE linked append entry covering
    # both tables; appended row count == 4 bands + 1 sig per batch doc
    from pathlib import Path
    cat = AcidCatalog(spark, Path(tmp_path) / "dedup_index_sf0.001")
    sigs, bands = cat.table("sigs"), cat.table("bands")
    # v0 create, v1 retention retire (apply_cdf), v2 batch append
    assert sigs.latest_version() == 2 and bands.latest_version() == 2
    assert sigs._manifest(1)["op"] in ("apply_cdf",
                                   "apply_cdf_mor", "delete")
    planted = dedup.planted_corpus(
        spark.read.parquet(f"{sf}/documents.parquet"))
    n_batch = (planted
               .filter(F.col("doc_id") % dedup.BATCH_MOD
                       == dedup.BATCH_REM)
               .count())
    n_del = (planted
             .filter((F.col("doc_id") % dedup.BATCH_MOD
                      == dedup.DEL_REM))
             .count())
    assert (sigs.read().count() - sigs.read(0).count()) \
        == n_batch - n_del
    assert (bands.read().count() - bands.read(0).count()) \
        == 4 * (n_batch - n_del)
    # catalog readers see both writes or neither (one entry pins both)
    snap = cat.snapshot()
    assert snap == {"sigs": 2, "bands": 2}


def test_pairwise_verifiers_collapse_path_equals_raw(spark, tables):
    """The adaptive duplicate gate: a dup-heavy corpus takes the
    collapse-first path; its result must be ROW-IDENTICAL to the raw
    band path (the expansion proof, executed). Built from sf0.001 docs
    replicated 3x by id offset — every payload has 3 exact copies."""
    import pyspark.sql.functions as F

    base = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # duplicate EMPTY payloads ride along: the raw path's rel_dist for
    # two empty texts is NULL (0/0) and drops the pair — the collapse
    # path must agree (ids avoid % 50 == 0 so planting skips them)
    base = base.unionByName(spark.createDataFrame(
        [(99_001, ""), (99_002, "")], "doc_id long, text string"))
    docs = base
    for i in (1, 2):
        docs = docs.unionByName(base.select(
            (F.col("doc_id") + 100_000 * i).alias("doc_id"), "text"))

    dedup.clear_sketch_cache()
    assert not dedup._dup_light(docs)          # gate: dup-heavy
    assert dedup._dup_light(base)              # gate: clean corpus

    collapse = {tuple(r) for r in
                dedup.minhash_containment(docs).collect()}
    lev_collapse = {tuple(r) for r in
                    dedup.levenshtein_near_dup(docs).collect()}
    # force the raw path over the same corpus
    try:
        key = (docs.sparkSession.sparkContext.applicationId,
               dedup.planted_corpus(docs)._jdf.queryExecution()
               .analyzed().semanticHash())
        dedup._DUP_GATE_CACHE[key] = True
        raw = {tuple(r) for r in
               dedup.minhash_containment(docs).collect()}
        lev_raw = {tuple(r) for r in
                   dedup.levenshtein_near_dup(docs).collect()}
    finally:
        dedup.clear_sketch_cache()
    assert collapse == raw
    assert lev_collapse == lev_raw
    # the copies actually produced intra-group pairs (the expansion
    # did real work, this wasn't a trivially-empty comparison)
    assert any(r[2] == 0 for r in lev_collapse)          # lev == 0
    assert any(r[2] == 1.0 and r[3] == 1.0 for r in collapse)


def test_dedup_incremental_stream_maintains_both_tables(spark, tmp_path):
    """Streaming self-maintenance: 3 CDF micro-batches (2 arrivals +
    1 retention delete) each maintain the index in one linked catalog
    commit — appends sign+append, deletes retire band+sig rows and
    drop stale pairs — pins ride the result; the index version count
    proves per-batch maintenance."""
    from pathlib import Path

    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog

    out = dedup.dedup_incremental_stream(spark, "/root/testdata/sf0.001",
                                         tmp_path)
    rows = out.collect()
    assert rows, "expected arrival-touching near-dup pairs"
    assert all(r.matches_full for r in rows)
    assert all(r.index_fresh_equal for r in rows)
    assert rows[0].n_batches == 3
    root = Path(tmp_path) / "dedup_stream_sf0.001"
    cat = AcidCatalog(spark, root / "index")
    # one linked commit per micro-batch on BOTH index tables
    # (2 arrival appends + 1 retire)
    assert cat.table("sigs").latest_version() == 3
    assert cat.table("bands").latest_version() == 3
    # pairs: one fenced APPEND per batch that found pairs plus the
    # retire's stale-pair delete — count ROW-CHANGING commits (the
    # r16 autocompact/autovacuum opt-ins add two property commits)
    pair_ops = [r.op for r in
                AcidTable(spark, root / "pairs").history().collect()]
    row_changing = [o for o in pair_ops
                    if not o.startswith("set_auto") and o != "create"]
    assert 1 <= len(row_changing) <= 3, pair_ops


def test_dedup_batch_txn_fence_blocks_replay(spark, tmp_path):
    """An at-least-once redelivery of the same maintenance micro-batch
    (same app_id/batch_id) appends NOTHING to the index — the
    double-count the round-13 review flagged."""
    from spark_streaming_apps_spark.acid_catalog import AcidCatalog

    base = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))
    corpus = base.filter("doc_id % 2 = 0")
    batch = base.filter("doc_id % 2 = 1").limit(40)
    cat = dedup.build_dedup_index(spark, tmp_path / "idx", corpus)
    first = dedup.dedup_batch(spark, cat, batch, txn=("maint", 0))
    sig_v = cat.table("sigs").latest_version()
    n_sigs = cat.read("sigs").count()
    # REPLAY: same batch id — nothing re-commits, and the RESULT is
    # value-identical: the batch's own rows already sit in the index,
    # so without the batch anti-join the corpus-vs-batch probe would
    # emit (d,d) self-pairs at est_jaccard 1.0 and duplicate rows
    replay = dedup.dedup_batch(spark, cat, batch, txn=("maint", 0))
    assert cat.table("sigs").latest_version() == sig_v
    assert cat.read("sigs").count() == n_sigs
    assert replay.filter("doc1 = doc2").count() == 0
    assert replay.count() == replay.distinct().count()
    assert (replay.exceptAll(first).count() == 0
            and first.exceptAll(replay).count() == 0)
    # next batch id advances normally
    batch2 = batch.select((F.col("doc_id") + 500_000).alias("doc_id"),
                          "text")
    dedup.dedup_batch(spark, cat, batch2, txn=("maint", 1))
    assert cat.table("sigs").latest_version() == sig_v + 1


def test_dedup_verify_side_is_bloom_pruned(spark, tmp_path):
    """The verify pass's sigs IO is bounded by the CANDIDATE set: the
    sigs table carries doc_id bloom sidecars and a small batch's
    candidate docs probe a strict minority of sigs files."""
    base = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))
    corpus = base.filter("doc_id % 2 = 0")
    cat = dedup.build_dedup_index(spark, tmp_path / "idx", corpus)
    sigs = cat.table("sigs")
    # grow the sigs table to several files so pruning is observable
    for k in (1, 3):
        dedup.dedup_batch(
            spark, cat,
            base.filter(f"doc_id % 4 = {k}").limit(60))
    total = len(sigs._manifest(sigs.latest_version())["files"])
    assert total >= 3
    ids = [r.doc_id for r in corpus.limit(5).collect()]
    paths, tot = sigs.pruned_files_in("doc_id", ids)
    assert tot == total
    assert 0 < len(paths) < tot, (len(paths), tot)
