"""Planted-pair recall for the embedding near-dup detector.

`embedding_near_dup_pairs` plants a near-identical copy of every 50th
vector at vec_id+1_000_000 (+0.01 on coordinate 0 → cosine ≈ 1-ε, far
above the 0.99 threshold). Because the implementation AND its oracle use
the same IVF-cell blocking, the oracle alone can't detect recall loss (a
pair split across cells by a centroid-assignment tie would vanish from
both sides) — this test pins recall against ground truth instead:
multi-probe (2 probes) must keep every planted pair co-bucketed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import similarity


def test_embedding_near_dup_recovers_planted(tables):
    emb = tables["embeddings"]
    planted = {(i, i + 1_000_000)
               for (i,) in emb.select("vec_id").collect() if i % 50 == 0}
    got = {(r["vec1"], r["vec2"])
           for r in similarity.embedding_near_dup_pairs(emb).collect()}
    missed = planted - got
    assert not missed, f"planted near-dup pairs lost to cell blocking: {sorted(missed)}"


def test_near_dup_pairs_meet_threshold(tables):
    out = similarity.embedding_near_dup_pairs(tables["embeddings"])
    assert out.filter(F.col("sim") < similarity.NEAR_DUP_COS).count() == 0


def test_kmeans_refine_matches_numpy(tables):
    import numpy as np
    from spark_streaming_apps_spark.operators.similarity import (
        KM_ITERS, N_CELLS, kmeans_refine)

    rows = sorted(tables["embeddings"].collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    X = np.array([[float(x) for x in r.embedding] for r in rows], dtype=np.float64)
    cents = {int(i): X[ids == i][0] for i in ids if i < N_CELLS}
    for _ in range(KM_ITERS):
        cells = sorted(cents)
        C = np.stack([cents[c] for c in cells])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        # ties break to the smallest cell id: argmin picks first occurrence
        asg = np.array(cells)[np.argmin(d2, axis=1)]
        cents = {}
        for c in np.unique(asg):
            m = X[asg == c]
            # decimal(18,6) per-element quantum: EXACT integer micro-unit
            # sums (matching the engines' decimal aggregation), then one
            # double cast + division — bit-identical to the Spark plan
            q_int = np.round(m * 1e6).astype(np.int64).sum(axis=0)
            cents[int(c)] = (q_int / 1e6) / len(m)

    def half_up6(x: float) -> float:
        # Spark's round(double) goes through BigDecimal.valueOf, i.e. the
        # SHORTEST decimal string of the double (same as Python repr), not
        # its exact binary expansion — mirror that exactly.
        from decimal import ROUND_HALF_UP, Decimal
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    got = {r.cell: r for r in kmeans_refine(tables["embeddings"]).collect()}
    want_sizes = {int(c): int((asg == c).sum()) for c in np.unique(asg)}
    assert {c: r.n_members for c, r in got.items()} == want_sizes
    for c, ctr in cents.items():
        assert got[c].c0 == half_up6(float(ctr[0])), c
        assert abs(got[c].c_norm - half_up6(float(np.sqrt((ctr * ctr).sum())))) <= 1e-6, c


def test_embedding_quantize_matches_numpy(tables):
    import numpy as np
    from spark_streaming_apps_spark.operators.similarity import (
        Q_LEVELS, embedding_quantize)

    rows = sorted(tables["embeddings"].collect(), key=lambda r: r.vec_id)
    X = np.array([[float(x) for x in r.embedding] for r in rows], dtype=np.float64)
    mn, mx = X.min(axis=0), X.max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = np.minimum(np.floor((X - mn) * Q_LEVELS / span), Q_LEVELS)
    codes = np.where(mx > mn, codes, 0.0).astype(int)
    deq = mn + (codes + 0.5) * (mx - mn) / Q_LEVELS
    got = {r.vec_id: r for r in embedding_quantize(tables["embeddings"]).collect()}
    assert len(got) == len(rows)
    for i, r in enumerate(rows):
        g = got[r.vec_id]
        assert (g.code_sum, g.code_min, g.code_max) == (
            int(codes[i].sum()), int(codes[i].min()), int(codes[i].max())), r.vec_id
        assert abs(g.mse6 - round(float(((X[i] - deq[i]) ** 2).sum()), 6)) <= 2e-6


def test_ivf_topk_trained_recall_vs_brute_force(tables):
    """The point of training the quantizer: serving against the Lloyd
    centroids must recover most of the true (brute-force) top-k from only
    N_PROBES cells. Recall is the un-oracle-able metric (the DuckDB twin
    shares the blocking), so it's pinned here against ground truth."""
    emb = tables["embeddings"]
    recalls = []
    for qid in (0, 3, 7, 11, 40):
        truth = {r.vec_id for r in similarity.cosine_topk(emb, qid).collect()}
        trained = {r.vec_id
                   for r in similarity.ivf_topk_trained(emb, qid).collect()}
        recalls.append(len(truth & trained) / len(truth))
    mean = sum(recalls) / len(recalls)
    # random 2-of-32-cell probing would give ~0.06; the fixture corpus is
    # near-isotropic, so 0.4 is a conservative floor for working blocking
    # (measured 0.64 at pin time)
    assert mean >= 0.4, f"trained-IVF mean recall@10 = {mean} ({recalls})"


def test_trained_centroids_moved_from_seeds(tables):
    """Lloyd must actually refine: at least one trained centroid differs
    from its seed vector (otherwise ivf_topk_trained silently serves the
    arbitrary first-32 quantizer the verdict flagged)."""
    emb = tables["embeddings"]
    seeds = {r.vec_id: [float(x) for x in r.embedding]
             for r in emb.filter(F.col("vec_id") < similarity.N_CELLS).collect()}
    trained = {r.cell: [float(x) for x in r.c]
               for r in similarity._trained_centroids(emb).collect()}
    moved = [c for c, v in trained.items()
             if any(abs(a - b) > 1e-9 for a, b in zip(v, seeds[c]))]
    assert moved, "trained centroids identical to seeds - Lloyd loop is a no-op"


def test_pq_training_tightens_reconstruction(tables):
    """The served codebook is the Lloyd-refined one; k-means
    monotonicity says one exact iteration can never increase total
    reconstruction error vs the seed codebook — the invariant that pins
    the training step without an external lib (the old seed-identity
    check died with training: codewords move off the seed vectors, by
    design). Codes must also stay in [0, PQ_KS)."""
    emb = tables["embeddings"]

    def total_mse(cb):
        return (similarity._pq_subvectors(emb).alias("s")
                .join(F.broadcast(cb).alias("c"),
                      F.col("s.m") == F.col("c.m"))
                .withColumn("d", F.expr(similarity._sq_dist("s.sub", "c.cw")))
                .groupBy("s.vec_id", "s.m").agg(F.min("d").alias("dmin"))
                .agg(F.sum("dmin")).first()[0])

    seed_mse = total_mse(similarity._pq_codebook(emb))
    trained_mse = total_mse(similarity._pq_trained_codebook(emb))
    assert trained_mse <= seed_mse + 1e-9, (trained_mse, seed_mse)
    codes = (similarity.pq_encode(emb)
             .select(F.split("codes", ",").alias("cs")).collect())
    assert all(0 <= int(c) < similarity.PQ_KS for r in codes for c in r.cs)


def test_pq_adc_recall_vs_exact_l2(tables):
    """ADC scans codes, not floats; recall vs exact L2 top-10 is the
    quality metric (measured 0.34 mean at pin time with the 16-codeword
    seed codebook; random would be 10/500 = 0.02)."""
    emb = tables["embeddings"]
    e = emb.withColumn("e", F.expr("transform(embedding, x -> cast(x as double))"))
    d = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
         "cast(0.0 as double), (a, v) -> a + v)")
    recalls = []
    for qid in (0, 3, 7, 11, 40):
        q = e.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        truth = {r.vec_id for r in
                 e.filter(F.col("vec_id") != qid).join(F.broadcast(q))
                 .select("vec_id", F.expr(d).alias("d"))
                 .orderBy("d", "vec_id").limit(10).collect()}
        adc = {r.vec_id for r in similarity.pq_adc_topk(emb, qid).collect()}
        recalls.append(len(truth & adc) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.15, f"PQ-ADC mean recall@10 = {mean} ({recalls})"


def test_phash_recovers_planted(tables):
    """Perceptual-hash dedup must catch every planted near-identical doc:
    the suffix mutation leaves the payload head (the fake 8x8 block)
    untouched, so planted pairs collide at hamming 0."""
    from spark_streaming_apps_spark.operators import multimodal
    emb = tables["documents"]
    planted = {(i, i + 1_000_000)
               for (i,) in emb.select("doc_id").collect() if i % 50 == 0}
    got = {(r.doc1, r.doc2): r.hamming
           for r in multimodal.phash_near_dup(emb).collect()}
    missed = planted - set(got)
    assert not missed, f"planted pairs lost: {sorted(missed)}"
    assert all(got[p] == 0 for p in planted)


def test_matryoshka_recall_vs_full_dim(tables):
    """The truncation is only justified if the 16-dim prefix keeps most
    of the full-dim top-10 — pinned over 5 queries (random baseline
    would be ~0.02)."""
    emb = tables["embeddings"]
    recalls = []
    for qid in (0, 3, 7, 11, 40):
        truth = {r.vec_id for r in similarity.cosine_topk(emb, qid).collect()}
        got = {r.vec_id for r in similarity.matryoshka_topk(emb, qid).collect()}
        recalls.append(len(truth & got) / len(truth))
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.15, f"matryoshka mean recall@10 = {mean} ({recalls})"


def test_matryoshka_trained_prefix_clears_recall_floor(tables):
    """The TRAINED prefix (PCA at MRL_TRAINED_DIM, exact-integer
    moments, artifact-cached) must clear the 0.5 pre-rerank recall
    floor the untrained 32-prefix misses — the calibration
    MRL_TRAINED_DIM encodes. Also pins trained > untrained on the same
    queries, and that the second serve reuses the artifact (no
    retrain)."""
    emb = tables["embeddings"]
    trained, untrained = [], []
    for qid in (0, 3, 7, 11, 40):
        truth = {r.vec_id
                 for r in similarity.cosine_topk(emb, qid).collect()}
        trained.append(len(truth & {
            r.vec_id for r in
            similarity.matryoshka_trained_topk(emb, qid).collect()})
            / len(truth))
        untrained.append(len(truth & {
            r.vec_id for r in
            similarity.matryoshka_topk(emb, qid).collect()})
            / len(truth))
    m = lambda xs: sum(xs) / len(xs)        # noqa: E731
    assert m(trained) >= 0.5, (trained, untrained)
    assert m(trained) > m(untrained), (trained, untrained)
    # artifact is cached: the store holds exactly one trained dir for
    # this corpus+dim and a re-serve resolves it without retraining
    key = similarity._mrl_fingerprint(emb.inputFiles())
    path = similarity._ANN_STORE / \
        f"mrl{similarity.MRL_TRAINED_DIM}_{key}"
    assert (path / "_DONE").exists()
    mtime = (path / "_DONE").stat().st_mtime_ns
    similarity.matryoshka_trained_topk(emb, 0).collect()
    assert (path / "_DONE").stat().st_mtime_ns == mtime


def test_rerank_beats_raw_quantized_recall(tables):
    """The funnel's whole claim: exact rerank over a quantized shortlist
    must recover (nearly) the exact top-10 that the raw quantized scan
    loses. Pin each rerank key strictly above its one-stage parent AND
    above an absolute floor that one-stage scans don't reach here."""
    emb = tables["embeddings"]
    e = emb.withColumn(
        "e", F.expr("transform(embedding, x -> cast(x as double))"))
    d = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
         "cast(0.0 as double), (a, v) -> a + v)")
    pq_base, pq_rr, mrl_base, mrl_rr = [], [], [], []
    for qid in (0, 3, 7, 11, 40):
        q = e.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        l2_truth = {r.vec_id for r in
                    e.filter(F.col("vec_id") != qid).join(F.broadcast(q))
                    .select("vec_id", F.expr(d).alias("d"))
                    .orderBy("d", "vec_id").limit(10).collect()}
        cos_truth = {r.vec_id
                     for r in similarity.cosine_topk(emb, qid).collect()}
        pq_base.append(len(l2_truth & {
            r.vec_id for r in similarity.pq_adc_topk(emb, qid).collect()}) / 10)
        pq_rr.append(len(l2_truth & {
            r.vec_id
            for r in similarity.pq_rerank_topk(emb, qid).collect()}) / 10)
        mrl_base.append(len(cos_truth & {
            r.vec_id
            for r in similarity.matryoshka_topk(emb, qid).collect()}) / 10)
        mrl_rr.append(len(cos_truth & {
            r.vec_id
            for r in similarity.matryoshka_rerank_topk(emb, qid).collect()})
            / 10)
    m = lambda xs: sum(xs) / len(xs)
    assert m(pq_rr) > m(pq_base), (pq_rr, pq_base)
    assert m(mrl_rr) > m(mrl_base), (mrl_rr, mrl_base)
    assert m(pq_rr) >= 0.6, f"PQ rerank mean recall@10 = {m(pq_rr)} ({pq_rr})"
    assert m(mrl_rr) >= 0.5, f"MRL rerank mean recall@10 = {m(mrl_rr)} ({mrl_rr})"


def test_ivf_adc_rerank_stack_recall(tables):
    """IVFADC+R composes three prunes; its recall is bounded above by the
    coarse probe's ceiling and below pinned here (measured 0.70 mean at
    pin time vs exact L2; 2-probe IVF alone ceilings ~0.72)."""
    emb = tables["embeddings"]
    e = emb.withColumn(
        "e", F.expr("transform(embedding, x -> cast(x as double))"))
    d = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
         "cast(0.0 as double), (a, v) -> a + v)")
    recalls = []
    for qid in (0, 3, 7, 11, 40):
        q = e.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        truth = {r.vec_id for r in
                 e.filter(F.col("vec_id") != qid).join(F.broadcast(q))
                 .select("vec_id", F.expr(d).alias("d"))
                 .orderBy("d", "vec_id").limit(10).collect()}
        got = {r.vec_id
               for r in similarity.ivf_adc_rerank_topk(emb, qid).collect()}
        recalls.append(len(truth & got) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.5, f"IVFADC+R mean recall@10 = {mean} ({recalls})"


def test_trained_artifacts_serve_from_disk(tables, tmp_path, monkeypatch):
    """Training artifacts are write-once: a fresh session (memo cleared)
    must serve the SAME codebook/centroids from the disk store without
    retraining, and a publish race must leave exactly one artifact."""
    from spark_streaming_apps_spark.operators import dedup

    emb = tables["embeddings"]
    monkeypatch.setattr(similarity, "_ANN_STORE", tmp_path / "ann_store")
    dedup.clear_sketch_cache()
    trained = sorted(map(tuple, similarity._pq_trained_codebook(emb)
                         .select("m", "j", "cw").collect()))
    stores = list((tmp_path / "ann_store").glob("pq_codebook_*"))
    assert len(stores) == 1 and (stores[0] / "_SUCCESS").exists()

    # simulate a new session: memo gone, artifact present -> parquet load
    dedup.clear_sketch_cache()
    reloaded = sorted(map(tuple, similarity._pq_trained_codebook(emb)
                          .select("m", "j", "cw").collect()))
    assert reloaded == trained
    assert len(list((tmp_path / "ann_store").glob("pq_codebook_*"))) == 1

    # lloyd chain: same contract, one artifact dir with both pieces
    dedup.clear_sketch_cache()
    a1, c1 = similarity._lloyd_chain(emb)
    cents1 = sorted(map(tuple, c1.collect()))
    dedup.clear_sketch_cache()
    a2, c2 = similarity._lloyd_chain(emb)
    assert sorted(map(tuple, c2.collect())) == cents1
    assert a2.count() == a1.count()
    lloyds = list((tmp_path / "ann_store").glob("lloyd_*"))
    assert len(lloyds) == 1 and (lloyds[0] / "_DONE").exists()
    dedup.clear_sketch_cache()


def test_ivf_incremental_index_maintains_and_prunes(spark, tmp_path):
    """Self-maintaining IVF: the CDF-fed maintenance keeps the index
    hash-equal to a from-scratch build at the same frozen centroids
    (pinned in-result), changes (2 arrivals + 1 delete) land as 3
    micro-batches, the probe
    read opens ONLY the probe cells' partition files, and a THIRD
    append after the drain is absorbed by restarting the maintenance
    stream (the index follows the data, never a rebuild)."""
    from pathlib import Path

    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.sources.pysource import (
        AcidCdfParallelStreamDataSource, _drain_incremental)
    from spark_streaming_apps_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = similarity.ivf_incremental_index(spark, sf, tmp_path)
    rows = out.collect()
    assert len(rows) == similarity.TOP_K
    assert all(r.index_fresh_equal for r in rows)
    assert all(r.recall_ok for r in rows)
    assert rows[0].n_batches == 3

    idx = AcidTable(spark, Path(tmp_path) / "ivf_inc_idx_sf0.001")
    # maintenance committed one index commit per source commit
    # (2 arrival appends + 1 delete retire)
    assert idx.latest_version() == 3
    # probe-side partition pruning: the 2 probe cells' files are a
    # strict minority of the index's files
    some_cell = int(idx.read().limit(1).collect()[0].cell)
    paths, total = idx.pruned_files_in("cell", [some_cell])
    assert 0 < len(paths) < total

    # third arrival after the first drain: restart the maintenance
    # stream (checkpoint-free restart re-reads from startingVersion 0
    # exclusive; already-applied versions would re-apply, so restart
    # from the INDEX's high water = source version it last absorbed)
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", "label",
        similarity._as_double("embedding").alias("e"))
    cents = similarity._trained_centroids(
        load_table(spark, sf, "embeddings")
        .filter(similarity.IVF_INC_TRAIN_PRED))
    src = AcidTable(spark, Path(tmp_path) / "ivf_inc_vec_sf0.001")
    late = emb.filter("vec_id % 10 = 7").select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "label", "e")
    src.append(late)                                           # v4

    def maintain(batch, batch_id):
        ins = (batch.filter(F.col("_change_type") == "insert")
               .select("vec_id", "label", "e"))
        rows2 = similarity._km_assign(ins, cents).select(
            "vec_id", "label", "e", "cell")
        if not rows2.isEmpty():
            idx.append(rows2)

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    n2, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf-parallel")
        .option("path", str(Path(tmp_path) / "ivf_inc_vec_sf0.001"))
        .option("startingVersion", "3")       # exclusive: v4 only
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").foreachBatch(maintain))
    assert n2 == 1
    fresh = similarity._km_assign(
        emb.filter(f"NOT ({similarity.IVF_INC_DELETE_PRED})")
        .unionByName(late), cents).select("vec_id", "label", "e",
                                          "cell")
    now = idx.read().select("vec_id", "label", "e", "cell")
    assert now.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(now).count() == 0


def test_ivf_incremental_index_compacts_under_maintenance(spark,
                                                          tmp_path):
    """Per-batch appends leave small files per cell partition; the
    liquid-maintenance composition (compact_small) merges them without
    breaking partition pruning or the fresh-equality contract."""
    from pathlib import Path

    from spark_streaming_apps_spark.acid import AcidTable
    from spark_streaming_apps_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = similarity.ivf_incremental_index(spark, sf, tmp_path)
    out.collect()
    idx = AcidTable(spark, Path(tmp_path) / "ivf_inc_idx_sf0.001")
    files_before = len(idx._manifest(idx.latest_version())["files"])
    before = {(r.vec_id, r.cell) for r in
              idx.read().select("vec_id", "cell").collect()}
    v = idx.compact_small(max_bytes=1 << 20)
    files_after = len(idx._manifest(v)["files"])
    assert files_after < files_before
    after = {(r.vec_id, r.cell) for r in
             idx.read().select("vec_id", "cell").collect()}
    assert after == before
    # partition pruning still bites post-compaction
    some_cell = int(idx.read().limit(1).collect()[0].cell)
    paths, total = idx.pruned_files_in("cell", [some_cell])
    assert 0 < len(paths) < total


def test_knn_band_occupancy_adaptive(spark):
    """The band cap engages per cell by occupancy: in a cell past
    KNN_BAND_ENGAGE*band members, pairs beyond the band are absent;
    in a small cell, all within-cell pairs survive (the uncapped
    shape — r16). Built directly on the banded candidate logic via a
    tiny band so both branches run on fixture-sized data."""
    import pyspark.sql.functions as F

    from spark_streaming_apps_spark.operators import similarity as S

    # 4 axis-aligned centroids; the BIG population spans cells {0,1}
    # (top-2 probes), the small one cells {2,3} — with 2 probes the
    # populations stay disjoint, so occupancy differs per cell.
    # band=2 => engage threshold 8
    band = 2
    rows = []
    for c in range(4):
        e = [0.0] * 4
        e[c] = 10.0
        rows.append((c, e))
    # big cells: 20 members (> engage) probing cells 0 then 1
    for i in range(20):
        rows.append((100 + i, [10.0 + i * 0.01, 0.001 * i, 0.0, 0.0]))
    # small cells: 4 members (<= engage) probing cells 2 then 3
    for i in range(4):
        rows.append((200 + i, [0.0, 0.0, 10.0 - i * 0.01, 0.001 * i]))
    emb = spark.createDataFrame(
        [(v, "x", e) for v, e in rows],
        "vec_id long, label string, embedding array<double>")
    out = S.knn_graph(emb, k=50, n_cells=4, band=band).collect()
    edges = {(r.vec_id, r.nbr_id) for r in out}
    # small cell: every member sees every other (all-pairs survived)
    for a in range(200, 204):
        for b in range(200, 204):
            if a != b:
                assert (a, b) in edges, (a, b)
    # big cell: the band binds — members far apart in the 1-D
    # centroid-score order may not be candidates. The order within
    # cell 0 is by dot with centroid 0 (desc), i.e. by coordinate 0:
    # vec 119 (highest dot) .. vec 100; |ord diff| > band pairs absent
    assert (119, 100) not in edges and (100, 119) not in edges
    # but immediate order-neighbors are present
    assert any((110, n) in edges for n in (109, 111))
