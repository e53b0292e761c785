"""Many-file manifest rung for SCALING.md (round 10).

Plants a table whose snapshot holds ~1,200 data files (the shape a
100 TB table's partition slice has), then measures the metadata paths
the round-10 redesign targets:

1. append commit latency — O(batch) manifest encoding vs table size
   (files_add/files_remove against the parent, never the full list)
2. cold file-list resolution — parquet CHECKPOINT (one IO) vs the
   pure delta-chain replay it short-circuits
3. the retention probe — vacuum LEDGER membership check vs the
   O(files) per-file stat fallback

Run ALONE (no concurrent Spark): `python tools/manifest_scale.py`.
Prints one markdown block to append to SCALING.md.
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_apps_spark.acid import (
        _FILES_CACHE, AcidTable, _checkpoint_path, first_vacuumed_ref,
        resolve_manifest_files, vacuumed_refs)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    root = Path(__file__).resolve().parents[1] / ".scratch" / "manifest_scale"
    shutil.rmtree(root, ignore_errors=True)

    n_files = 1200
    base = spark.range(0, 6_000_000).selectExpr(
        "id", "id % 97 AS k", "CAST(id AS DOUBLE) / 7 AS v")
    t0 = time.time()
    t = AcidTable.create(spark, root / "t", base.repartition(n_files))
    create_s = time.time() - t0
    assert len(t._manifest(0)["files"]) == n_files

    # 25 small appends → delta manifests + checkpoints at v10/v20
    batch = spark.range(0, 10_000).selectExpr(
        "id + 9000000 AS id", "id % 97 AS k", "CAST(id AS DOUBLE) AS v")
    times = []
    for _ in range(25):
        s = time.time()
        t.append(batch)
        times.append(time.time() - s)
    append_s = min(times)
    v = t.latest_version()
    raw = json.loads((t._manifests / f"v{v}.json").read_text())
    assert "files_base" in raw, "append manifests must be delta-encoded"
    manifest_bytes = (t._manifests / f"v{v}.json").stat().st_size

    # cold resolution: checkpoint vs forced chain replay
    ckv = 20
    ck = _checkpoint_path(t.path, ckv)
    assert ck.exists(), "periodic checkpoint missing"
    m = json.loads((t._manifests / f"v{ckv}.json").read_text())
    _FILES_CACHE.clear()
    s = time.time()
    via_ck = resolve_manifest_files(t.path, m)
    ck_resolve_s = time.time() - s
    aside = ck.with_suffix(".aside")
    ck.rename(aside)
    try:
        _FILES_CACHE.clear()
        s = time.time()
        via_chain = resolve_manifest_files(t.path, m)
        chain_resolve_s = time.time() - s
    finally:
        aside.rename(ck)
    assert {f["path"] for f in via_ck} == {f["path"] for f in via_chain}

    # retention probe: ledger membership vs per-file stats
    t.update_where({"v": "v + 0"}, "id % 97 = 13")   # orphan a slice
    t.vacuum(keep_last=1)
    assert vacuumed_refs(t.path) is not None
    m0 = t._manifest(0)
    s = time.time()
    gone = first_vacuumed_ref(t.path, m0)
    ledger_probe_s = time.time() - s
    assert gone is not None
    ledger = t._manifests / "_vacuumed.jsonl"
    led_aside = ledger.with_suffix(".aside")
    ledger.rename(led_aside)
    try:
        s = time.time()
        gone2 = first_vacuumed_ref(t.path, m0)
        stat_probe_s = time.time() - s
    finally:
        led_aside.rename(ledger)
    # NOTE stat fallback short-circuits on the FIRST missing file, so
    # also time the worst case: a fully-INTACT version probe
    mv = t._manifest(t.latest_version())
    s = time.time()
    assert first_vacuumed_ref(t.path, mv) is None     # ledger path
    ledger_intact_s = time.time() - s
    ledger.rename(led_aside)
    try:
        s = time.time()
        assert first_vacuumed_ref(t.path, mv) is None  # stats all files
        stat_intact_s = time.time() - s
    finally:
        led_aside.rename(ledger)
    assert gone2 is not None

    print(f"""
## Many-file manifest rung (round 10): O(delta) commits, checkpoint reads, ledger probes

Planted table: {n_files} data files / 6M rows (create {create_s:.1f}s),
then 25 small appends (10k rows each).

| metadata path | old shape | new shape | measured |
|---|---|---|---|
| append commit (min of 25) | O(table) full file list per manifest | files_add/files_remove delta ({manifest_bytes} B manifest at v{v}) | {append_s:.2f} s |
| cold file-list resolve @v{ckv} | replay {ckv} delta manifests | ONE parquet checkpoint read | chain {chain_resolve_s * 1000:.0f} ms -> checkpoint {ck_resolve_s * 1000:.0f} ms |
| vacuumed-version probe ({n_files} files) | per-file stat until first miss | ledger membership check | stats {stat_probe_s * 1000:.0f} ms -> ledger {ledger_probe_s * 1000:.0f} ms |
| INTACT-version probe ({n_files} files, worst case) | stat EVERY file | ledger membership check | stats {stat_intact_s * 1000:.0f} ms -> ledger {ledger_intact_s * 1000:.0f} ms |

At 100k-file tables the old probe is 100k driver syscalls per cold
read; the ledger is one cached file read + set lookups, and the
checkpoint keeps resolution O(1) IOs regardless of commit count.
""")
    spark.stop()


if __name__ == "__main__":
    main()
