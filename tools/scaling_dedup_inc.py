"""Incremental-dedup scaling rung (round 13): per-batch cost against a
persisted index as the INDEXED CORPUS grows 10x and 30x, vs the full
recompute every other dedup key pays per run.

Corpus rungs are the scaling_ext key-offset synthesis of sf0.1
documents (identical text across copies — the all-duplicate worst
case, so candidate fan-out grows WITH the corpus, stressing the
verify join, not just the probe). The batch is FIXED (500 docs,
ids remapped into a disjoint range): if the incremental claim holds,
its cost must stay ~flat while full recompute grows ~linearly.

Usage: python tools/scaling_dedup_inc.py   (appends to SCALING.md)
Run ALONE (no other Spark process) — shared-VM discipline.
"""
from __future__ import annotations

import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark.operators import dedup  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402
from tools.scaling_ext import synth_dir  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = Path(__file__).resolve().parents[1] / ".scratch" / "dedup_inc"
REPO = Path(__file__).resolve().parents[1]
RUNGS = [("0.1", 1), ("1", 10), ("3", 30)]
BATCH_OFFSET = 77_000_000


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> None:
    spark = get_spark("scaling-dedup-inc", master="local[32]")
    # fixed batch: 500 sf0.1 docs remapped into a disjoint id range
    batch = (load_table(spark, BASE_SF, "documents")
             .filter(F.col("doc_id") % 10 == 1)
             .select((F.col("doc_id") + BATCH_OFFSET).alias("doc_id"),
                     "text"))
    batch.count()  # warm page cache + JVM
    rows = []
    for sf, copies in RUNGS:
        sf_dir = synth_dir(spark, sf, copies, tables={"documents"})
        corpus = (load_table(spark, sf_dir, "documents")
                  .select("doc_id", "text"))
        n_corpus = corpus.count()
        def _force(df):
            df.write.mode("overwrite").format("noop").save()
            return df

        dedup.clear_sketch_cache()
        root = SCRATCH / f"idx_{sf}"
        t_build, cat = _timed(
            lambda: dedup.build_dedup_index(spark, root, corpus))
        dedup.clear_sketch_cache()   # batch signing must not reuse it
        t_batch, pairs = _timed(
            lambda: _force(dedup.dedup_batch(spark, cat, batch)))
        n_pairs = pairs.count()
        # second arrival against the GROWN index (maintenance holds)
        batch2 = batch.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        dedup.clear_sketch_cache()
        t_batch2, _ = _timed(
            lambda: _force(dedup.dedup_batch(spark, cat, batch2)))
        # SMALL arrival (100 docs -> <=400 band hashes): the probe
        # drops to a bloom-pruned point lookup (read_eq_any) instead
        # of an index scan
        small = (batch.filter(F.col("doc_id") % 5 == 1)
                 .select((F.col("doc_id") + 2_000_000).alias("doc_id"),
                         "text"))
        dedup.clear_sketch_cache()
        t_small, _ = _timed(
            lambda: _force(dedup.dedup_batch(spark, cat, small)))
        # full recompute over corpus+batch — what every non-indexed
        # dedup run pays
        dedup.clear_sketch_cache()
        full_docs = corpus.unionByName(batch)
        t_full, _ = _timed(lambda: _force(_full_pairs(full_docs)))
        rows.append((sf, n_corpus, t_build, t_batch, t_batch2,
                     t_small, n_pairs, t_full))
        print(f"  sf{sf}: corpus={n_corpus} build={t_build}s "
              f"batch={t_batch}s batch2={t_batch2}s small={t_small}s "
              f"full={t_full}s", file=sys.stderr)
        shutil.rmtree(root, ignore_errors=True)

    sha = subprocess.run(["git", "rev-parse", "HEAD"],
                         capture_output=True, text=True,
                         cwd=REPO).stdout.strip()
    base = rows[0]
    lines = [
        "", "",
        "## Incremental dedup vs full recompute (round 13)",
        "",
        f"verified_at: {sha}",
        "",
        "Fixed 500-doc batch against a persisted band/sig index as the",
        "indexed corpus grows 10x and 30x (scaling_ext all-duplicate",
        "synthesis — candidate fan-out grows WITH the corpus). Build is",
        "the one-time index cost; per-batch = sign batch + broadcast",
        "band probe + sig verify + one linked append (commit_multi).",
        "Run alone on local[32].",
        "",
        "| corpus | docs | index build (once) | batch #1 | batch #2 "
        "(grown index) | small batch (bloom probe) | pairs | "
        "full recompute | batch/full |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for sf, n, tb, t1, t2, ts_, np_, tf in rows:
        lines.append(
            f"| sf{sf} ({n // base[1]}x) | {n:,} | {tb} s | {t1} s "
            f"| {t2} s | {ts_} s | {np_:,} | {tf} s | "
            f"{round(t1 / tf, 2)}x |")
    g = rows[-1]
    lines += [
        "",
        f"Reading the decade: corpus grew {g[1] // base[1]}x; "
        f"per-batch cost moved {base[3]} s -> {g[3]} s "
        f"({round(g[3] / base[3], 2)}x) while full recompute moved "
        f"{base[7]} s -> {g[7]} s ({round(g[7] / base[7], 2)}x). "
        "The residual per-batch growth is the verify join's candidate",
        "fan-out (every batch doc collides with every synthesized copy",
        "— the worst case by construction) plus the column-pruned",
        "3-column scan of the bands table; the O(corpus) text re-read,",
        "re-tokenize, and re-minhash that dominate full recompute are",
        "gone from the arrival path entirely.",
    ]
    out = REPO / "SCALING.md"
    out.write_text(out.read_text() + "\n".join(lines) + "\n")
    print("appended to SCALING.md")


def _full_pairs(docs):
    """minhash_pairs without planting, over an explicit doc set."""
    sig = dedup._materialize(dedup._sig_of(docs))
    bands = dedup._bands_of(sig)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2")).distinct())
    s1 = sig.select(F.col("doc_id").alias("doc1"),
                    *[F.col(f"mh{i}").alias(f"a{i}")
                      for i in range(dedup.N_HASHES)])
    s2 = sig.select(F.col("doc_id").alias("doc2"),
                    *[F.col(f"mh{i}").alias(f"b{i}")
                      for i in range(dedup.N_HASHES)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(dedup.N_HASHES))
    return (cand.join(s1, "doc1").join(s2, "doc2")
            .select("doc1", "doc2",
                    (agree / F.lit(float(dedup.N_HASHES)))
                    .alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5))


if __name__ == "__main__":
    main()
