"""Round-14 scaling rungs (appends to SCALING.md). Run ALONE.

A. Token-probed BM25 serve: postings partitioned by token bucket with
   per-file token blooms — a K-term query's IO is bounded by its
   terms' buckets at any corpus size (files-opened column), while the
   unpruned scan grows with the corpus.
B. Auto-compaction drain: 50 per-batch fenced appends with the
   autocompact table property on vs off — live-file count stays
   bounded, point probes stay pruned, the replay fence holds.
C. sqrt(n) cell scaling for the cell-blocked ANN family: semdedup and
   knn_graph at 10x the corpus with cells held at 32 (the round-13
   reading — per-cell occupancy grows linearly) vs cells ~= 32*sqrt(10)
   — the within-cell quadratic term drops back toward the 1x cost.

Usage: python tools/scaling_r14.py [A|B|C ...]   (default: all)
"""
from __future__ import annotations

import shutil
import sys
import time
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark.acid import AcidTable  # noqa: E402
from spark_streaming_apps_spark.acid_catalog import AcidCatalog  # noqa: E402
from spark_streaming_apps_spark.operators import dedup as D  # noqa: E402
from spark_streaming_apps_spark.operators import similarity as S  # noqa: E402
from spark_streaming_apps_spark.operators import text as T  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402
from tools.scaling_ext import synth_dir  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
BASE_SF = "/root/testdata/sf0.1"
SCRATCH = REPO / ".scratch" / "r14"
RUNGS = [("0.1", 1), ("1", 10), ("3", 30)]


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def _sha() -> str:
    import subprocess
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True
                          ).stdout.strip()


def rung_text(spark) -> str:
    terms = list(T.BM25_TERMS)
    rows = []
    for sf, copies in RUNGS:
        d = synth_dir(spark, sf, copies, tables={"documents"})
        docs = (load_table(spark, d, "documents")
                .select("doc_id", "text"))
        n_docs = docs.count()
        root = SCRATCH / f"text_{sf}"
        shutil.rmtree(root, ignore_errors=True)
        cat = AcidCatalog(spark, root)
        postings, doc_len, term_df, corpus = T._index_batch_tables(docs)
        cat.create_table("postings", postings,
                         partition_by=["tbucket"], bloom_by=["token"])
        t_p = cat.table("postings")
        v = t_p.latest_version()
        n_post = t_p.read(v).count()
        t_probe, (paths, total) = _timed(
            lambda: t_p.pruned_files_in("token", terms, v))
        m = t_p._manifest(v)
        by_path = {str(t_p.path / f["path"]): f.get("bytes", 0)
                   for f in m["files"]}
        b_open = sum(by_path.get(p2, 0) for p2 in paths)
        b_tot = sum(by_path.values())
        t_fetch, n_hits = _timed(
            lambda: t_p.read_eq_any("token", terms, version=v).count())
        t_scan, n_scan = _timed(
            lambda: t_p.read(v).filter(F.col("token").isin(terms))
            .count())
        assert n_hits == n_scan, (n_hits, n_scan)
        mb = f"{b_open / 1e6:.1f}/{b_tot / 1e6:.1f} MB"
        rows.append((sf, copies, n_docs, n_post, t_probe,
                     f"{len(paths)}/{total}", mb, t_fetch, t_scan))
        print(f"  text {sf}: docs={n_docs} postings={n_post} "
              f"opened={len(paths)}/{total} bytes={mb} "
              f"probed={t_fetch}s scan={t_scan}s", file=sys.stderr)
    want = {zlib.crc32(s.encode()) % T.TEXT_BUCKETS for s in terms}
    lines = [
        "\n\n## Token-probed text-index serve (round 14)\n",
        f"\nverified_at: {_sha()}\n",
        f"\nPostings partitioned by crc32 token bucket "
        f"({T.TEXT_BUCKETS} buckets at fixture scale — the knob rises "
        f"with corpus so per-bucket bytes stay bounded) with per-file "
        f"token bloom sidecars; the {len(terms)}-term BM25 query "
        f"hashes to {len(want)} bucket(s), so its IO is that slice of "
        f"the table at ANY corpus size. 'probed fetch' = read_eq_any "
        f"(manifest prune + sidecar probes + scan of survivors); "
        f"'full scan' = the round-13 shape (filter over the whole "
        f"postings table). Isolated local[32].\n",
        "\n| corpus | docs | postings rows | probe (manifest+sidecars)"
        " | files opened | bytes opened | probed fetch | full scan |\n",
        "|---|---|---|---|---|---|---|---|\n"]
    for sf, copies, n_docs, n_post, t_probe, opened, mb, t_fetch, \
            t_scan in rows:
        lines.append(f"| sf{sf} ({copies}x) | {n_docs:,} | "
                     f"{n_post:,} | {t_probe} s | {opened} | {mb} | "
                     f"{t_fetch} s | {t_scan} s |\n")
    f30 = rows[-1]
    lines.append(
        f"\nReading the decade: the corpus grew 30x; the probed fetch "
        f"opens {f30[5]} files / {f30[6]} (the query terms' buckets — "
        f"the bloom verdict is exact here because every file is "
        f"single-bucket) while the full scan reads every byte. At "
        f"fixture scale both paths time alike (page-cached data, job "
        f"overhead dominates); the structural difference is the IO "
        f"bound, and on an object store the probed path costs the "
        f"terms' buckets' GETs only. At 100 TB the bucket count "
        f"scales with the corpus, holding per-query IO constant — "
        f"the Solr term-sharding shape the reference delegated to "
        f"its search tier (PipelineStreamProcessor.scala:76-94), "
        f"expressed as a partition spec + bloom index.\n")
    return "".join(lines)


def rung_autocompact(spark) -> str:
    docs = (load_table(spark, BASE_SF, "documents")
            .select("doc_id", "text"))
    docs.count()
    out = {}
    for mode in ("off", "on"):
        root = SCRATCH / f"ac_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        t = AcidTable.create(spark, root, docs.limit(0),
                             bloom_by=["doc_id"])
        if mode == "on":
            t.set_autocompact(max_bytes=8 << 20, min_files=8)
        t0 = time.perf_counter()
        for b in range(50):
            batch = docs.filter(F.col("doc_id") % 50 == b)
            t.append_txn(batch, "drain", b)
            t.maybe_autocompact()            # the maintainer hook
        drain_s = round(time.perf_counter() - t0, 3)
        m = t._manifest(t.latest_version())
        live = len(m["files"])
        compacts = sum(
            1 for v in range(t.latest_version() + 1)
            if t._manifest(v)["op"] == "compact_small")
        # point probe after the drain: bloom sidecars of rewritten
        # files are rebuilt by the staged write, so pruning holds
        ids = [r.doc_id for r in docs.limit(5).collect()]
        t_probe, (paths, total) = _timed(
            lambda: t.pruned_files_in("doc_id", ids))
        # replay fence across compactions
        fence_ok = t.append_txn(docs.limit(1), "drain", 7) is None
        n_rows = t.read().count()
        out[mode] = dict(drain_s=drain_s, live=live, compacts=compacts,
                         probe=f"{len(paths)}/{total}",
                         probe_s=t_probe, fence_ok=fence_ok,
                         rows=n_rows)
        print(f"  autocompact {mode}: {out[mode]}", file=sys.stderr)
    assert out["on"]["rows"] == out["off"]["rows"]
    assert out["on"]["fence_ok"] and out["off"]["fence_ok"]
    return (
        "\n\n## Auto-compaction drain (round 14)\n"
        f"\nverified_at: {_sha()}\n"
        "\n50 fenced per-batch appends (append_txn + the maintainer "
        "hook maybe_autocompact) into one table, with the autocompact "
        "property off vs on (max_bytes 8 MiB, min_files 8). Rows, "
        "point-probe pruning (doc_id blooms), and the replay fence "
        "are checked after the drain in both modes. Isolated "
        "local[32].\n"
        "\n| mode | drain (50 batches) | live files | compactions | "
        "5-id probe opens | replay fenced | rows |\n|---|---|---|---|"
        "---|---|---|\n"
        f"| off | {out['off']['drain_s']} s | {out['off']['live']} | "
        f"{out['off']['compacts']} | {out['off']['probe']} | "
        f"{out['off']['fence_ok']} | {out['off']['rows']:,} |\n"
        f"| on | {out['on']['drain_s']} s | {out['on']['live']} | "
        f"{out['on']['compacts']} | {out['on']['probe']} | "
        f"{out['on']['fence_ok']} | {out['on']['rows']:,} |\n"
        f"\nReading it: without the property the table ends the drain "
        f"at {out['off']['live']} live files (one per batch, forever "
        f"— the 100 TB small-file death); with it the count stays "
        f"bounded at {out['on']['live']} across "
        f"{out['on']['compacts']} row-preserving compactions, the "
        f"probe opens {out['on']['probe']} files, and a replayed "
        f"batch id still commits nothing (the cumulative txns map "
        f"rides every compaction manifest). The acidtable streaming "
        f"sink honors the same property post-commit "
        f"(SparkSession-free pyarrow fold; tests/test_pysource.py).\n")


def rung_cells(spark) -> str:
    rows = []
    for sf, copies, cells in (("0.1", 1, 32), ("1", 10, 32),
                              ("1", 10, 101)):
        d = synth_dir(spark, sf, copies, tables={"embeddings"})
        emb = load_table(spark, d, "embeddings")
        emb.count()
        t_sd, sd = _timed(lambda: S.semdedup(emb, n_cells=cells)
                          .collect())
        planted = [r for r in sd if r.vec_id >= 1_000_000]
        sd_drop = (sum(1 for r in planted if r.kept == 0)
                   / max(1, len(planted)))
        t_knn, knn = _timed(lambda: S.knn_graph(emb, n_cells=cells)
                            .filter(F.col("rank") == 1).collect())
        top1 = {r.vec_id: r.nbr_id for r in knn}
        # recall@1 vs brute force on 20 sampled nodes (the honest
        # cost-of-more-cells trade: fewer candidates per cell)
        from pyspark.sql import Window
        sample = [i * 37 for i in range(20)]
        e = emb.select("vec_id", S._as_double("embedding").alias("e"))
        q = (e.filter(F.col("vec_id").isin(sample))
             .select(F.col("vec_id").alias("qid"),
                     F.col("e").alias("qe")))
        w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
        exact = {r.qid: r.vec_id for r in
                 e.join(F.broadcast(q))
                 .filter(F.col("vec_id") != F.col("qid"))
                 .select("qid", "vec_id",
                         S._cosine("e", "qe").alias("sim"))
                 .withColumn("rn", F.row_number().over(w))
                 .filter("rn = 1").collect()}
        knn_hit = (sum(1 for qid, nbr in exact.items()
                       if top1.get(qid) == nbr)
                   / max(1, len(exact)))
        D.clear_sketch_cache()
        spark.catalog.clearCache()
        rows.append((sf, copies, cells, t_sd, round(sd_drop, 3),
                     t_knn, round(knn_hit, 3)))
        print(f"  cells sf{sf} x{copies} cells={cells}: "
              f"semdedup={t_sd}s drop={sd_drop:.3f} "
              f"knn={t_knn}s top1={knn_hit:.3f}", file=sys.stderr)
    lines = [
        "\n\n## sqrt(n) cell scaling for the ANN family (round 14)\n",
        f"\nverified_at: {_sha()}\n",
        "\nThe round-13 sf1 rung read semdedup 6.4x / knn_graph 4.8x "
        "over 10x data WITH THE CELL COUNT HELD at 32 — per-cell "
        "occupancy grows linearly and the within-cell pair term "
        "quadratically. The scale knob is the quantizer's cell count "
        "(~sqrt(n)): re-run at 10x with cells = 32 vs 101 = "
        "32*sqrt(10). Quality pins: fraction of planted near-identical "
        "copies dropped by semdedup, and fraction of planted copies "
        "knn_graph recall@1 vs brute force on 20 sampled nodes — "
        "the planted pin must hold at any cell count (a "
        "near-identical pair lands in the same cell under any argmax "
        "quantizer), while recall@1 prices the candidate-set "
        "shrink.\n",
        "\n| corpus | cells | semdedup | planted-drop | knn_graph | "
        "knn recall@1 |\n|---|---|---|---|---|---|\n"]
    for sf, copies, cells, t_sd, sd_drop, t_knn, knn_hit in rows:
        lines.append(f"| sf{sf} ({copies}x) | {cells} | {t_sd} s | "
                     f"{sd_drop} | {t_knn} s | {knn_hit} |\n")
    base, fixed, scaled = rows
    lines.append(
        f"\nReading it: at 10x data with cells fixed at 32, semdedup "
        f"costs {fixed[3]} s and knn_graph {fixed[5]} s "
        f"({round(fixed[3] / max(base[3], 1e-9), 1)}x / "
        f"{round(fixed[5] / max(base[5], 1e-9), 1)}x over 1x); with "
        f"cells scaled to 101 they read {scaled[3]} s / {scaled[5]} s "
        f"({round(scaled[3] / max(base[3], 1e-9), 1)}x / "
        f"{round(scaled[5] / max(base[5], 1e-9), 1)}x) while the "
        f"planted-duplicate pins hold — the within-cell quadratic "
        f"term is the knob, not the algorithm. The production keys "
        f"keep N_CELLS=32 (the fixture's sqrt(n)); at real scale the "
        f"trained quantizer's cell count rides the artifact store and "
        f"retrains as the corpus grows (similarity.py:28).\n")
    return "".join(lines)


def main() -> None:
    which = set(a.upper() for a in sys.argv[1:]) or {"A", "B", "C"}
    SCRATCH.mkdir(parents=True, exist_ok=True)
    spark = get_spark("scaling-r14", master="local[32]")
    sections = []
    if "A" in which:
        sections.append(rung_text(spark))
    if "B" in which:
        sections.append(rung_autocompact(spark))
    if "C" in which:
        sections.append(rung_cells(spark))
    with open(REPO / "SCALING.md", "a") as f:
        f.write("".join(sections))
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
