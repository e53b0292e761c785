"""LLM-pipeline families at synthesized sf1 (round 13, VERDICT item 6):
the round-6 sf0.3/1/3 curves predate the rerank funnels, collapse-LSH,
substring spans, and the round-13 incremental keys — this sweep re-runs
the full dedup/ANN/text key set at sf0.1 and sf1 (10x data) ISOLATED,
and pins recall@10 at sf1 against a brute-force oracle computed once
and persisted.

Synthesized sf1 = 10 key-offset copies of sf0.1 (identical payloads —
the all-duplicate worst case for dedup AND a degenerate-but-honest
recall corpus: every query has 9 exact copies, which both the truth
and the index must rank).

Usage: python tools/scaling_llm_sf1.py   (appends to SCALING.md)
Run ALONE — shared-VM discipline.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.operators import dedup  # noqa: E402
from spark_streaming_apps_spark.operators import similarity as S  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402
from tools.scaling_ext import synth_dir  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
BASE_SF = "/root/testdata/sf0.1"
RECALL_QUERY_IDS = (0, 3, 7, 11, 40)

FAMILIES = {
    "dedup": ["dedup_minhash_lsh", "dedup_collapse_lsh",
              "dedup_simhash", "dedup_ngram_jaccard",
              "substring_dup_spans", "minhash_containment",
              "levenshtein_near_dup", "dedup_incremental"],
    "ann": ["ivf_topk_trained", "pq_adc_topk", "pq_rerank_topk",
            "ivf_adc_rerank_topk", "matryoshka_rerank_topk",
            "semdedup", "knn_graph", "ivf_incremental_index"],
    "text": ["bm25_rank", "inverted_index", "tfidf_cosine_topk",
             "bigram_perplexity", "heavy_hitters_cms"],
}
RECALL_KEYS = {          # key -> (builder, truth metric)
    "ivf_topk_trained": ("cos", lambda emb, q: S.ivf_topk_trained(emb, q)),
    "pq_rerank_topk": ("l2", lambda emb, q: S.pq_rerank_topk(emb, q)),
    "ivf_adc_rerank_topk": ("l2",
                            lambda emb, q: S.ivf_adc_rerank_topk(emb, q)),
    "matryoshka_rerank_topk": ("cos", lambda emb, q:
                               S.matryoshka_rerank_topk(emb, q)),
}


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def _truth_at(spark, sf_dir: str, cache: Path) -> dict:
    """Brute-force top-10 per query id (cosine AND l2) — computed once
    per synthesized corpus and PERSISTED, so re-pins are free."""
    if cache.exists():
        return json.loads(cache.read_text())
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.withColumn(
        "e", F.expr("transform(embedding, x -> cast(x as double))"))
    l2 = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
          "cast(0.0 as double), (a, v) -> a + v)")
    cos = ("aggregate(zip_with(e, q, (x, y) -> x * y), cast(0.0 as "
           "double), (a, v) -> a + v) / (sqrt(aggregate(e, cast(0.0 as"
           " double), (a, x) -> a + x * x)) * sqrt(aggregate(q, "
           "cast(0.0 as double), (a, x) -> a + x * x)))")
    out: dict = {"cos": {}, "l2": {}}
    for qid in RECALL_QUERY_IDS:
        q = (e.filter(F.col("vec_id") == qid)
             .select(F.col("e").alias("q")))
        base = (e.filter(F.col("vec_id") != qid)
                .join(F.broadcast(q)))
        out["cos"][str(qid)] = [
            r.vec_id for r in base.select(
                "vec_id", F.expr(cos).alias("s"))
            .orderBy(F.desc("s"), "vec_id").limit(S.TOP_K).collect()]
        out["l2"][str(qid)] = [
            r.vec_id for r in base.select(
                "vec_id", F.expr(l2).alias("d"))
            .orderBy("d", "vec_id").limit(S.TOP_K).collect()]
    cache.parent.mkdir(parents=True, exist_ok=True)
    cache.write_text(json.dumps(out))
    return out


def main() -> None:
    spark = get_spark("scaling-llm-sf1", master="local[32]")
    qs = catalog.queries()
    _force(qs["count_rows"](spark, BASE_SF))       # warmup
    d1 = synth_dir(spark, "1", 10,
                   tables={"documents", "embeddings"})

    times: dict[str, dict[str, float]] = {}
    for sf, d in (("0.1", BASE_SF), ("1", d1)):
        for fam, keys in FAMILIES.items():
            for k in keys:
                dedup.clear_sketch_cache()
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    _force(qs[k](spark, d))
                    dt = round(time.perf_counter() - t0, 2)
                    best = dt if best is None else min(best, dt)
                times.setdefault(k, {})[sf] = best
                print(f"  sf{sf} {k}: {best}s", file=sys.stderr)

    # recall@10 at sf1 against the persisted brute-force oracle
    truth = _truth_at(spark, d1,
                      REPO / ".scratch" / "scale" / "sf1"
                      / "recall_truth.json")
    emb1 = load_table(spark, d1, "embeddings")
    recalls: dict[str, float] = {}
    for key, (metric, builder) in RECALL_KEYS.items():
        rs = []
        for qid in RECALL_QUERY_IDS:
            want = set(truth[metric][str(qid)])
            got = {r.vec_id for r in builder(emb1, qid).collect()}
            rs.append(len(want & got) / len(want))
        recalls[key] = round(sum(rs) / len(rs), 3)
        print(f"  recall@10 sf1 {key}: {recalls[key]}", file=sys.stderr)

    sha = subprocess.run(["git", "rev-parse", "HEAD"],
                         capture_output=True, text=True,
                         cwd=REPO).stdout.strip()
    lines = [
        "", "",
        "## LLM-pipeline families at sf1 (round 13)",
        "",
        f"verified_at: {sha}",
        "",
        "Full dedup/ANN/text key set at sf0.1 vs synthesized sf1 (10x",
        "data, all-duplicate synthesis), min-of-2 per key, isolated",
        "local[32]. recall@10 at sf1 is pinned against a brute-force",
        "oracle computed once and persisted",
        "(.scratch/scale/sf1/recall_truth.json). A fixed-overhead key",
        "reads ~1x; a scale-safe data-bound key should read well under",
        "10x.",
        "",
        "| family | key | sf0.1 | sf1 | ratio (10x data) |",
        "|---|---|---|---|---|",
    ]
    for fam, keys in FAMILIES.items():
        for k in keys:
            r = times[k]
            lines.append(
                f"| {fam} | {k} | {r['0.1']} s | {r['1']} s | "
                f"{round(r['1'] / r['0.1'], 2)}x |")
    lines += ["", "recall@10 at sf1 (pinned): "
              + ", ".join(f"{k} {v}" for k, v in recalls.items()), ""]
    out = REPO / "SCALING.md"
    out.write_text(out.read_text() + "\n".join(lines) + "\n")
    print("appended to SCALING.md")
    print(json.dumps({"times": times, "recall_sf1": recalls}))


if __name__ == "__main__":
    main()
