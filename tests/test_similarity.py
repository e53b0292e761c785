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
