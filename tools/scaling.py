"""Scaling-curve measurement: representative queries across all three SFs.

Evidence for the 100 TB question — does runtime grow sub-linearly /
linearly with data (good: scan/shuffle bound) or super-linearly (bad:
a quadratic step survived)? Writes SCALING.md.

Usage: python tools/scaling.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]
KEYS = [
    "hw_release",              # flagship: anti-join HW + band release
    "join_inner_3way",         # shuffle join family
    "groupby_having_band",     # keyed aggregation
    "dedup_minhash_lsh",       # banded sketch join
    "dedup_ngram_jaccard",     # candidate-blocked verify
    "embedding_near_dup",      # cell-blocked pair generation
    "q1_pricing_summary",      # wide aggregation
    "knn_graph",               # IVF-blocked k-NN graph
    "inverted_index",          # capped posting-list build
    "quality_funnel",          # single-scan filter funnel
    "pq_adc_topk",             # code-lookup ANN scan (round 4)
    "ivf_topk_trained",        # trained-quantizer serving (round 4)
    "levenshtein_near_dup",    # band-blocked edit-distance verify (round 4)
    "scd2_history",            # partitioned lag/lead dimension history (round 4)
    "corpus_curate",           # composed curation pipeline (round 4)
    "minhash_containment",     # asymmetric containment verify (round 4)
    "multimodal_phash_near_dup",  # banded perceptual-hash dedup (round 4)
    "zipf_topk_salted",        # salted hot-key window (round 5)
    "record_linkage",          # blocked entity resolution (round 5)
    "triangle_count",          # mutual-kNN triangle enumeration (round 5)
    "time_decay_agg",          # single-shuffle EWMA (round 5)
    "pq_rerank_topk",          # ADC shortlist + exact rerank (round 5)
    "ivf_adc_rerank_topk",     # full IVFADC+R funnel (round 5)
    "runtime_bloom_join",      # runtime bloom semi-join reduction (round 5)
    "dedup_collapse_lsh",      # exact-collapse -> LSH composition (round 6)
    "url_dedup",               # canonical-key shuffle on URLs alone (round 6)
    "heavy_hitters_cms",       # mergeable CMS + exactness audit (round 6)
    "doc_chunking",            # sliding-window RAG chunking (round 6)
    "dq_suite",                # cross-table quality suite (round 6)
    "anomaly_zscore",          # decimal-partial 3-sigma census (round 6)
    "hw_release_sql",          # the flagship via pure SQL (round 6)
]


def main() -> None:
    spark = get_spark("scaling", master="local[32]")
    qs = catalog.queries()
    qs["count_rows"](spark, "/root/testdata/sf0.1") \
        .write.mode("overwrite").format("noop").save()  # warmup

    results: dict[str, dict[str, float]] = {k: {} for k in KEYS}
    for sf in SFS:
        d = f"/root/testdata/sf{sf}"
        for k in KEYS:
            best = None
            for _ in range(2):  # min-of-2: shared-host steal guard
                t0 = time.perf_counter()
                qs[k](spark, d).write.mode("overwrite").format("noop").save()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            results[k][sf] = round(best, 2)
            print(f"sf{sf} {k}: {results[k][sf]}s", file=sys.stderr)

    lines = [
        "# SCALING — runtime vs scale factor (local[32], noop sink)",
        "",
        "Per-cell MIN of 2 runs (shared-host steal guard); memoized",
        "index/sketch layers are warm by run 2, so cells read as serve-path",
        "time — training cost is accounted in bench.py's per-pass story.",
        "",
        "Data grows 100x from sf0.001 to sf0.1. A scale-safe plan should",
        "grow far slower than 100x at these sizes (fixed per-query overhead",
        "dominates small SFs); any super-linear step would show a blowup in",
        "the last column.",
        "",
        "| query | sf0.001 | sf0.01 | sf0.1 | t(0.1)/t(0.001) |",
        "|---|---|---|---|---|",
    ]
    for k in KEYS:
        r = results[k]
        ratio = round(r["0.1"] / r["0.001"], 1) if r["0.001"] else float("nan")
        lines.append(f"| {k} | {r['0.001']} | {r['0.01']} | {r['0.1']} "
                     f"| {ratio}x |")

    # Planted-skew A/B: the naive hot-key window vs the salted two-phase
    # plan over the SAME zipf fixture (level 0 = 50% of all rows). The
    # naive plan sorts the hot level in ONE task, so its growth curve is
    # the data's; the salted plan fans the hot level over N_SALT reducers.
    from spark_streaming_apps_spark.operators import analytics
    lines += ["", "## Planted zipf skew: naive window vs salted two-phase",
              "",
              "Same fixture, same answer; level 0 holds 50% of all rows.",
              "The naive plan sorts that level in ONE task, so its curve is",
              "a single core's; the salted plan fans it over N_SALT",
              "reducers and should grow ~linearly with rows/core.",
              "",
              "| zipf rows | naive (1-task hot sort) | salted | speedup |",
              "|---|---|---|---|"]
    for n in (4_500_000, 15_000_000, 45_000_000):
        ts = {}
        for name, fn in (("naive", analytics.zipf_topk_naive_at),
                         ("salted", analytics.zipf_topk_salted_at)):
            best = None
            for _ in range(2):  # min-of-2: shared-host steal guard
                t0 = time.perf_counter()
                fn(spark, n).write.mode("overwrite").format("noop").save()
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            ts[name] = round(best, 2)
            print(f"n={n} zipf_{name}: {ts[name]}s", file=sys.stderr)
        lines.append(f"| {n:,} | {ts['naive']} | {ts['salted']} "
                     f"| {round(ts['naive'] / ts['salted'], 1)}x |")
    # preserve the extended sf0.3-sf3 section scaling_ext.py appends — a
    # full rewrite here must not silently drop that evidence
    out_path = Path(__file__).resolve().parents[1].joinpath("SCALING.md")
    ext = ""
    if out_path.exists():
        old = out_path.read_text()
        marker = "## Extended curves"
        if marker in old:
            ext = "\n" + old[old.index(marker):]
    try:
        import subprocess
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True, timeout=10,
            cwd=Path(__file__).resolve().parents[1]).stdout.strip()
        lines.append(f"\n_verified at commit {head}_")
    except Exception:                                  # noqa: BLE001
        pass
    out_path.write_text("\n".join(lines) + "\n" + ext)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
