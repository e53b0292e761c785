"""Round-3 operators: BM25 ranking, vocabulary top-k, repetition filters,
SRP (random-hyperplane) near-dup, salted skew join, CUBE, streaming dedup.

Every assertion is deterministic: hashes are seeded, fixtures are static,
and the SRP recall floor is calibrated the same way test_dedup.py's are.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_apps_spark.operators import analytics, similarity, text

PLANTED_VEC = {(i, i + 1_000_000) for i in range(0, 500, 50)}


def test_srp_recovers_planted(tables):
    """All 10 planted near-identical embedding pairs survive 2-band SRP
    blocking at sf0.001 (a +0.01 single-coordinate nudge flips at most a
    few of 16 signature bits, and both bands matching is not required)."""
    got = {(r["vec1"], r["vec2"])
           for r in similarity.srp_near_dup_pairs(tables["embeddings"]).collect()}
    assert len(got & PLANTED_VEC) >= 9, f"SRP recall regressed: {sorted(got)}"


def test_srp_only_reports_near_dups(tables):
    out = similarity.srp_near_dup_pairs(tables["embeddings"])
    assert out.filter(F.col("sim") < similarity.NEAR_DUP_COS).count() == 0


def test_bm25_shape_and_order(tables):
    rows = text.bm25_rank(tables["documents"]).collect()
    assert 0 < len(rows) <= text.BM25_TOP_K
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_term_presence(tables):
    """Every ranked doc must actually contain at least one query term."""
    top = text.bm25_rank(tables["documents"])
    docs = tables["documents"].join(top, "doc_id")
    pat = "|".join(text.BM25_TERMS)
    assert docs.filter(~F.lower("text").rlike(pat)).count() == 0


def test_vocab_topk_matches_manual_count(tables):
    rows = text.vocab_topk(tables["documents"], k=5).collect()
    assert len(rows) == 5
    manual = (tables["documents"]
              .select(F.explode(F.filter(F.split(F.lower("text"), r"\W+"),
                                         lambda t: t != "")).alias("t"))
              .groupBy("t").count().orderBy(F.desc("count"), "t").first())
    assert (rows[0]["token"], rows[0]["tf"]) == (manual["t"], manual["count"])


def test_repetition_stats_invariants(tables):
    out = text.repetition_stats(tables["documents"])
    bad = out.filter(
        (F.col("n_distinct") > F.col("n_bigrams"))
        | (F.col("dup_bigram_frac") < 0) | (F.col("dup_bigram_frac") > 1)
        | (F.col("top_bigram_frac") <= 0) | (F.col("top_bigram_frac") > 1)
        | (F.col("keep")
           != (F.col("top_bigram_frac") <= text.TOP_BIGRAM_MAX).cast("int")))
    assert bad.count() == 0
    # the word-salad fixture has both repetitive and diverse docs
    kept = out.filter(F.col("keep") == 1).count()
    assert 0 < kept < out.count()


def test_skew_join_salted_equals_plain_join(tables):
    """The salted plan must be value-identical to the direct join+agg."""
    events = tables["events"]
    key = (F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
           .otherwise(F.concat(F.lit("cold_"), F.col("user_id").cast("string"))))
    fact = events.select(key.alias("k"),
                         F.col("value").cast("decimal(18,4)").alias("v"))
    dim = (fact.select("k").distinct()
           .withColumn("weight", F.when(F.col("k") == "hot", F.lit(0.5))
                       .otherwise(F.lit(1.5))))
    plain = {r["k"]: (r["n_rows"], r["weighted_value"])
             for r in (fact.join(dim, "k").groupBy("k")
                       .agg(F.count(F.lit(1)).alias("n_rows"),
                            F.round(F.sum(F.col("v").cast("double")
                                          * F.col("weight")), 4)
                             .alias("weighted_value"))).collect()}
    salted = {r["k"]: (r["n_rows"], r["weighted_value"])
              for r in analytics.skew_join_salted(events).collect()}
    assert salted == plain


def test_cube_counts_groupings(tables):
    rows = analytics.cube_counts(tables["lineitem"]).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2, 3}
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1
    assert total[0]["n"] == tables["lineitem"].count()


def test_streaming_dedup_swallows_replay(spark):
    """The replayed backlog file must add nothing: the drained sink equals
    the distinct batch projection."""
    from spark_streaming_apps_spark.streaming import streaming_dedup_job

    sf_dir = "/root/testdata/sf0.001"
    out = streaming_dedup_job(spark, sf_dir)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out.count() == events.count()
    assert out.select("event_id").distinct().count() == events.count()
