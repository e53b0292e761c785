"""Round-3 continuation additions: knn_graph, semdedup, dedup_apply,
inverted_index, quality_funnel."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import dedup, similarity, text, training


def test_knn_graph_ranks_are_dense_and_sorted(tables):
    rows = similarity.knn_graph(tables["embeddings"]).collect()
    assert rows, "knn graph is empty"
    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vec, nbrs in by_vec.items():
        nbrs.sort(key=lambda r: r.rank)
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1)), vec
        assert len(nbrs) <= similarity.KNN_K
        sims = [r.sim for r in nbrs]
        assert sims == sorted(sims, reverse=True), vec
        assert all(r.nbr_id != vec for r in nbrs)


def test_knn_graph_rank1_is_within_cell_argmax(tables):
    """rank-1 neighbor must have the max sim among that vector's edges."""
    out = similarity.knn_graph(tables["embeddings"])
    agg = (out.groupBy("vec_id")
           .agg(F.max("sim").alias("mx"),
                F.max(F.when(F.col("rank") == 1, F.col("sim"))).alias("r1"))
           .collect())
    assert all(r.mx == r.r1 for r in agg)


def test_semdedup_drops_planted_copies(tables):
    out = similarity.semdedup(tables["embeddings"]).collect()
    planted = [r for r in out if r.vec_id >= 1_000_000]
    assert planted, "no planted copies in output"
    # a planted copy is near-identical to its original; with single-probe
    # cell assignment a tie can split a pair across cells, so assert a
    # recall floor rather than 100%
    dropped = sum(1 for r in planted if r.kept == 0)
    assert dropped >= 0.8 * len(planted), (dropped, len(planted))
    # dedup never invents drops among centroid seeds' originals entirely:
    # something must survive in every non-empty cell
    kept_cells = {r.cell for r in out if r.kept == 1}
    all_cells = {r.cell for r in out}
    assert kept_cells == all_cells


def test_dedup_apply_keeps_one_per_cluster(tables):
    out = dedup.dedup_apply(tables["documents"]).collect()
    kept_by_cluster = Counter(r.cluster_id for r in out if r.kept == 1)
    # exactly one survivor per cluster, and it is the label itself
    assert all(n == 1 for n in kept_by_cluster.values())
    for r in out:
        if r.kept == 1:
            assert r.cluster_id == r.doc_id
    # every planted mutation that clustered with its original is dropped
    clustered_plants = [r for r in out
                        if r.doc_id >= dedup.PLANT_OFFSET
                        and r.cluster_id != r.doc_id]
    assert clustered_plants, "no planted mutation clustered"
    assert all(r.kept == 0 for r in clustered_plants)


def test_inverted_index_postings_capped_and_consistent(tables):
    rows = text.inverted_index(tables["documents"]).collect()
    assert rows
    for r in rows:
        posting = [int(x) for x in r.postings.split(",") if x]
        assert posting == sorted(posting)
        assert len(posting) <= text.IDX_POSTINGS_CAP
        assert len(posting) <= r.df
        assert r.df <= r.tf
        if r.df <= text.IDX_POSTINGS_CAP:
            assert len(posting) == r.df


def test_inverted_index_matches_manual_count(tables):
    docs = {r.doc_id: r.text for r in tables["documents"].collect()}
    import re
    tf = Counter()
    df = Counter()
    for did, txt in docs.items():
        toks = [t for t in re.split(r"\W+", txt.lower()) if t]
        tf.update(toks)
        df.update(set(toks))
    got = {r.term: r for r in text.inverted_index(tables["documents"]).collect()}
    assert set(got) == set(tf)
    for term, r in got.items():
        assert (r.tf, r.df) == (tf[term], df[term]), term


def test_quality_funnel_monotonic(tables):
    rows = sorted(training.quality_funnel(tables["documents"]).collect(),
                  key=lambda r: r.stage)
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    counts = [r.n_docs for r in rows]
    assert counts[0] == tables["documents"].count()
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts


def _py_tokens(txt):
    import re
    return [t for t in re.split(r"\W+", txt.lower()) if t]


def test_bpe_merge_topk_matches_manual(tables):
    mirror = Counter()
    for r in tables["documents"].collect():
        tk = _py_tokens(r.text)
        mirror.update(f"{a} {b}" for a, b in zip(tk, tk[1:]))
    want = sorted(mirror.items(), key=lambda kv: (-kv[1], kv[0]))[:text.BPE_TOP_K]
    got = [(r.pair, r.n) for r in text.bpe_merge_topk(tables["documents"]).collect()]
    assert got == want


def test_winnow_fingerprint_matches_manual(tables):
    from hashlib import md5
    from spark_streaming_apps_spark.operators.dedup import MH_COMBINE, MH_P

    def tok_hash(t):
        return int(md5(t.encode()).hexdigest()[:15], 16) % MH_P

    w = text.WINNOW_W
    want = {}
    for r in tables["documents"].collect():
        tkh = [tok_hash(t) for t in _py_tokens(r.text)]
        hs = [((tkh[i] * MH_COMBINE + tkh[i + 1]) * MH_COMBINE + tkh[i + 2]) % MH_P
              for i in range(len(tkh) - 2)]
        fps = ([min(hs[i:i + w]) for i in range(len(hs) - w + 1)]
               if len(hs) >= w else hs)
        # order-preserving distinct, as array_distinct does
        fps = list(dict.fromkeys(fps))
        if fps:
            xor = 0
            for x in fps:
                xor ^= x
            want[r.doc_id] = (len(fps), min(fps), xor)
    got = {r.doc_id: (r.n_fps, r.fp_min, r.fp_xor)
           for r in text.winnow_fingerprint(tables["documents"]).collect()}
    assert got == want


def test_winnow_every_window_has_a_fingerprint(tables):
    """The Schleimer local-algorithm guarantee: each length-W window of the
    positional shingle-hash sequence contributes its min, so any W
    consecutive shingles share at least one selected fingerprint."""
    from hashlib import md5
    from spark_streaming_apps_spark.operators.dedup import MH_COMBINE, MH_P

    def tok_hash(t):
        return int(md5(t.encode()).hexdigest()[:15], 16) % MH_P

    w = text.WINNOW_W
    got = {r.doc_id: r for r in
           text.winnow_fingerprint(tables["documents"]).collect()}
    checked = 0
    for r in tables["documents"].limit(50).collect():
        tkh = [tok_hash(t) for t in _py_tokens(r.text)]
        hs = [((tkh[i] * MH_COMBINE + tkh[i + 1]) * MH_COMBINE + tkh[i + 2]) % MH_P
              for i in range(len(tkh) - 2)]
        if len(hs) < w or r.doc_id not in got:
            continue
        fps = {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
        for i in range(len(hs) - w + 1):
            assert fps & set(hs[i:i + w]), (r.doc_id, i)
        checked += 1
    assert checked > 0


def test_unigram_surprisal_matches_manual(tables):
    import math
    corpus = {r.doc_id: _py_tokens(r.text)
              for r in tables["documents"].collect()}
    freq = Counter()
    for tk in corpus.values():
        freq.update(tk)
    total = float(sum(freq.values()))
    got = {r.doc_id: r for r in
           text.unigram_surprisal(tables["documents"]).collect()}
    want_ids = {d for d, tk in corpus.items() if tk}
    assert set(got) == want_ids
    for d in want_ids:
        tk = corpus[d]
        nll = sum(-math.log(freq[t] / total) for t in tk) / len(tk)
        assert got[d].n_tokens == len(tk)
        assert abs(got[d].mean_nll - nll) <= 2e-6, d


def test_interval_join_matches_manual(tables):
    from spark_streaming_apps_spark.operators import analytics
    evs = [(r.event_id, r.ts, float(r.value))
           for r in tables["events"].selectExpr(
               "event_id", "unix_micros(cast(ts as timestamp)) AS ts", "value")
           .collect()]
    want = {}
    for iv_id, t0, _ in evs:
        if iv_id % analytics.IV_EVERY:
            continue
        t1 = t0 + (iv_id % 7 + 1) * analytics.IV_HOUR_US
        hits = [(e, v) for e, t, v in evs if t0 <= t < t1]
        if hits:
            want[iv_id] = (len(hits), round(sum(round(v, 4) for _, v in hits), 4))
    got = {r.iv_id: (r.n_events, round(r.total, 4))
           for r in analytics.interval_join_bucketed(tables["events"]).collect()}
    assert got == want


def test_event_funnel_monotonic_and_manual(tables):
    from spark_streaming_apps_spark.operators import analytics
    rows = tables["events"].selectExpr(
        "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) AS t").collect()
    firsts = {}
    for r in rows:
        d = firsts.setdefault(r.user_id, {})
        d[r.event_type] = min(d.get(r.event_type, r.t), r.t)
    s0, s1, s2 = analytics.FUNNEL_STAGES
    n = [0, 0, 0]
    for d in firsts.values():
        if s0 in d:
            n[0] += 1
            if s1 in d and d[s1] > d[s0]:
                n[1] += 1
                if s2 in d and d[s2] > d[s1]:
                    n[2] += 1
    got = {r.stage: r.users for r in
           analytics.event_funnel(tables["events"]).collect()}
    assert got == {0: n[0], 1: n[1], 2: n[2]}
    assert got[0] >= got[1] >= got[2]


def test_cohort_retention_week0_covers_all_users(tables):
    from spark_streaming_apps_spark.operators import analytics
    out = analytics.cohort_retention(tables["events"]).collect()
    total_users = tables["events"].select("user_id").distinct().count()
    week0 = sum(r.users for r in out if r.week_offset == 0)
    # every user appears in their own cohort's offset-0 cell exactly once
    assert week0 == total_users
    assert all(r.week_offset >= 0 for r in out)


def test_time_gapfill_dense_spine_and_locf(tables):
    from spark_streaming_apps_spark.operators import analytics
    out = analytics.time_gapfill(tables["events"]).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    hour = 3_600_000_000
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.bucket_us)
        # spine is dense: consecutive hourly buckets, no holes
        assert [r.bucket_us for r in rs] == [
            rs[0].bucket_us + i * hour for i in range(len(rs))], t
        # endpoints observed, gaps carry the last total forward
        assert rs[0].n > 0 and rs[-1].n > 0
        last = None
        for r in rs:
            if r.n == 0:
                assert r.total_locf == last, t
            last = r.total_locf


def test_cms_overestimate_invariant_random_corpora(spark):
    """CMS one-sided guarantee, fuzzed: est >= exact for EVERY audited
    token on random small corpora (including adversarial repetition)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from spark_streaming_apps_spark.operators.text import heavy_hitters_cms

    word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "g", "hh"])
    doc = st.lists(word, min_size=1, max_size=30).map(" ".join)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(doc, min_size=1, max_size=8))
    def run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        rows = heavy_hitters_cms(df).collect()
        assert rows, texts
        for r in rows:
            assert r.est_n >= r.exact_n, (r, texts)
            assert r.overestimate == r.est_n - r.exact_n

    run()


def test_url_dedup_canonical_is_fixed_point(spark, tables):
    """Canonicalization must be idempotent: every canonical URL is
    already in canonical form (lowercase host, no :80, no fragment, no
    trailing slash, no utm_ params, sorted query)."""
    import re

    from spark_streaming_apps_spark.operators.dedup import url_dedup

    for r in url_dedup(tables["documents"]).collect():
        u = r.canonical_url
        host = re.match(r"^http://([^/?#]+)", u).group(1)
        assert host == host.lower() and not host.endswith(":80")
        assert "#" not in u and "utm_" not in u
        path = re.match(r"^http://[^/?#]+([^?#]*)", u).group(1)
        assert not path.endswith("/")
        q = u.split("?", 1)[1] if "?" in u else ""
        if q:
            parts = q.split("&")
            assert parts == sorted(parts) and all(parts)
