"""Extended scaling curves: sf0.3 / sf1 / sf3 for the keys whose
sf0.001→sf0.1 growth was worst (round-4 verdict item 6) — at small SFs
fixed per-query overhead dominates, so the interesting question ("does
the curve stay sublinear once data dominates?") needs bigger inputs.

The driver only ships sf≤0.1, so larger SFs are SYNTHESIZED from sf0.1 by
key-offset replication into .scratch/scale/sf{X}/ (3x / 10x / 30x):

  lineitem    l_orderkey += copy*10^7  → group count scales with data
  embeddings  vec_id     += copy*10^5  → IVF cell occupancy scales
  documents   doc_id     += copy*10^5  → every doc gains copy-duplicates

Replicated text/vectors are IDENTICAL across copies, so the dedup keys
see a worst-case all-duplicate corpus (every span/signature collides
across copies) — an upper bound on span-frequency and bucket skew, which
is exactly the stress the scaling claim should survive.

Usage: python tools/scaling_ext.py   (appends a section to SCALING.md)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.operators import dedup  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = Path(__file__).resolve().parents[1] / ".scratch" / "scale"
SFS = [("0.1", 1), ("0.3", 3), ("1", 10), ("3", 30)]
#: the worst-case dedup stress gets one more decade: at sf10 every
#: payload exists 100x, so every band bucket is maximally hot
SFS_DEDUP_EXT = [("10", 100)]
OFFSETS = {"lineitem": ("l_orderkey", 10_000_000),
           "embeddings": ("vec_id", 100_000),
           "documents": ("doc_id", 100_000)}
KEYS = {  # key -> table it reads (for synth-dir population)
    "q1_pricing_summary": ["lineitem"],
    "groupby_having_band": ["lineitem"],
    "ivf_topk_trained": ["embeddings"],
    "dedup_minhash_lsh": ["documents"],
    "dedup_collapse_lsh": ["documents"],
    "substring_dup_spans": ["documents"],
    "pq_rerank_topk": ["embeddings"],
    "ivf_adc_rerank_topk": ["embeddings"],
}
#: keys that also run the sf10 point (the dedup worst case under test:
#: raw pairwise LSH vs the exact-collapse composition)
DEDUP_EXT_KEYS = ("dedup_minhash_lsh", "dedup_collapse_lsh")


def synth_dir(spark, sf: str, copies: int, tables: set | None = None) -> str:
    if copies == 1:
        return BASE_SF
    out = SCRATCH / f"sf{sf}"
    tables = tables or {t for ts in KEYS.values() for t in ts}
    if all((out / f"{t}.parquet").exists() for t in tables):
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    for t in tables:
        dest = out / f"{t}.parquet"
        if dest.exists():
            continue
        base = load_table(spark, BASE_SF, t)
        key, off = OFFSETS[t]
        parts = [base.withColumn(key, F.col(key) + F.lit(i * off))
                 for i in range(copies)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(str(dest))
        print(f"  synthesized {dest} ({copies}x)", file=sys.stderr)
    return str(out)


def main() -> None:
    spark = get_spark("scaling-ext", master="local[32]")
    qs = catalog.queries()
    qs["count_rows"](spark, BASE_SF).write.mode("overwrite") \
        .format("noop").save()  # warmup

    results: dict[str, dict[str, float]] = {k: {} for k in KEYS}
    for sf, copies in SFS:
        d = synth_dir(spark, sf, copies)
        dedup.clear_sketch_cache()
        for k in KEYS:
            t0 = time.perf_counter()
            qs[k](spark, d).write.mode("overwrite").format("noop").save()
            results[k][sf] = round(time.perf_counter() - t0, 2)
            print(f"sf{sf} {k}: {results[k][sf]}s", file=sys.stderr)
    for sf, copies in SFS_DEDUP_EXT:
        d = synth_dir(spark, sf, copies,
                      tables={t for k in DEDUP_EXT_KEYS for t in KEYS[k]})
        dedup.clear_sketch_cache()
        for k in DEDUP_EXT_KEYS:
            t0 = time.perf_counter()
            qs[k](spark, d).write.mode("overwrite").format("noop").save()
            results[k][sf] = round(time.perf_counter() - t0, 2)
            print(f"sf{sf} {k}: {results[k][sf]}s", file=sys.stderr)

    lines = [
        "",
        "## Extended curves at synthesized sf0.3 / sf1 / sf3 (round 6)",
        "",
        "sf0.1 is the real driver fixture; larger SFs are key-offset",
        "replications of it (see tools/scaling_ext.py) — identical",
        "payloads per copy, so the dedup keys face a worst-case",
        "all-duplicate corpus. Data grows 30x from sf0.1 to sf3; a",
        "scale-safe plan should grow well below 30x.",
        "",
        "| query | sf0.1 | sf0.3 | sf1 | sf3 | t(3)/t(0.1) |",
        "|---|---|---|---|---|---|",
    ]
    for k in KEYS:
        r = results[k]
        ratio = round(r["3"] / r["0.1"], 1) if r["0.1"] else float("nan")
        lines.append(f"| {k} | {r['0.1']} | {r['0.3']} | {r['1']} "
                     f"| {r['3']} | {ratio}x |")
    lines += ["",
              "Single-shot timings (each sf's first touch pays codegen +",
              "index/codebook training for its corpus — the honest cold",
              "read); sublinear growth columns are the claim under test.",
              "",
              "### Worst-case dedup, one more decade: sf10 (100 copies "
              "of every payload)",
              "",
              "| query | sf0.1 | sf3 | sf10 | t(10)/t(3) | data 10/3 |",
              "|---|---|---|---|---|---|"]
    for k in DEDUP_EXT_KEYS:
        r = results[k]
        ratio = round(r["10"] / r["3"], 1) if r.get("3") else float("nan")
        lines.append(f"| {k} | {r['0.1']} | {r['3']} | {r['10']} "
                     f"| {ratio}x | 3.3x |")
    lines += [
        "",
        "Raw pairwise LSH cannot stay bounded here and that is",
        "structural: with every payload repeated c times the near-dup",
        "PAIR SET is itself O(c²·distinct) — candidates/verify/output",
        "all grow with the square of the copy factor. The composition",
        "that survives is `dedup_collapse_lsh` (the production shape):",
        "exact-collapse identical payloads first (one 16-byte-key",
        "shuffle, a LINEAR scan), then LSH over representatives — the",
        "LSH stage is flat in the copy factor and the hot-bucket",
        "failure mode is structurally gone. The pair of rows above is",
        "the measured claim."]
    # replace any existing extended section instead of stacking duplicates
    out_path = Path(__file__).resolve().parents[1] / "SCALING.md"
    old = out_path.read_text()
    marker = "## Extended curves"
    if marker in old:
        old = old[:old.index(marker)].rstrip() + "\n"
    out_path.write_text(old + "\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
