"""Multi-process cache coherence for the metadata layer.

A long-lived reader session consults three caches while OTHER
processes mutate the table: ``_FILES_CACHE`` (keyed by (root, version,
commit ts)), ``_LEDGER_CACHE`` (revalidated by ledger mtime+size), and
the parquet-checkpoint short-circuit. The streaming planners poll the
same state every trigger, so a stale file list served here would be a
silently-wrong micro-batch — the hazard class round 10 only caught by
accident through the bench's path-reuse fence. This test makes it a
tested invariant:

* a SECOND PROCESS drives the SparkSession-free sink committer
  (AcidStreamWriter.commit — staged pyarrow parquet + the same
  O_EXCL/FileStore manifest swap) through dozens of commits,
  interleaved with vacuum and the automatic every-10-commits parquet
  checkpoint, publishing each version's expected row count in a
  sidecar AFTER the commit lands;
* the READER (this session) repeatedly resolves the latest version
  and asserts its snapshot row count matches the sidecar — never a
  stale list, never a torn manifest;
* afterwards the reader asserts vacuumed old versions raise
  VersionVacuumedError (the ledger cache must revalidate against the
  OTHER process's ledger writes) while every retained version still
  serves exactly its recorded count.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

import pytest

from spark_streaming_apps_spark.acid import (AcidTable, CommitConflict,
                                              VersionVacuumedError)

WRITER_SCRIPT = r"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, {repo!r})
import pyarrow as pa
from spark_streaming_apps_spark.acid import AcidTable

# multi-process contention drains: the slow tier (see pytest.ini)
pytestmark = pytest.mark.slow
from spark_streaming_apps_spark.sources.pysource import AcidStreamWriter

root = Path({root!r})
sidecar = Path({sidecar!r})
pa_fields = [("id", pa.int64())]
w = AcidStreamWriter(str(root), pa_fields, "proc2")
counts = json.loads(sidecar.read_text())
total = max(int(v) for v in counts.values())
for batch in range(60):
    msg = w.write(iter([(total + j,) for j in range(3)]))
    total += 3
    w.commit([msg], batch)
    v = AcidTable(None, root).latest_version()
    counts[str(v)] = total
    tmp = sidecar.with_suffix(".tmp")
    tmp.write_text(json.dumps(counts))
    tmp.replace(sidecar)
    if batch and batch % 7 == 0:
        AcidTable(None, root).vacuum(keep_last=10)
    time.sleep(0.2)
print("writer done", total)
"""


def test_reader_never_serves_stale_state_under_foreign_commits(
        spark, tmp_path):
    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root, spark.createDataFrame([(0,)], "id long"))
    sidecar = tmp_path / "counts.json"
    sidecar.write_text(json.dumps({"0": 1}))
    repo = str(Path(__file__).resolve().parents[1])
    script = WRITER_SCRIPT.format(repo=repo, root=str(root),
                                  sidecar=str(sidecar))
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    checked, vacuum_races = 0, 0
    try:
        while proc.poll() is None:
            v = t.latest_version()
            counts = json.loads(sidecar.read_text())
            if str(v) not in counts:      # commit landed, sidecar not yet
                time.sleep(0.02)
                continue
            try:
                n = t.read(v).count()
            except VersionVacuumedError:
                vacuum_races += 1         # v aged out mid-iteration: loud,
                continue                  # never silently wrong
            assert n == counts[str(v)], (
                f"STALE STATE: version {v} served {n} rows, "
                f"writer recorded {counts[str(v)]}")
            checked += 1
            if checked % 3 == 2:
                # reader-side OPTIMIZE races the foreign commits
                # (row-preserving, so every sidecar count stays valid)
                # and strands the pre-compact files, giving the foreign
                # vacuum real victims — the full two-writer contention.
                # Losing every retry to a hot writer is a legitimate
                # outcome (Delta's OPTIMIZE loses to busy writers too).
                try:
                    t.compact(target_files=1)
                except CommitConflict:
                    pass
    finally:
        out, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"writer failed: {err[-2000:]}"
    assert "writer done" in out
    assert checked >= 5, f"only {checked} coherent reads observed"
    assert vacuum_races < checked  # loud races must be the exception

    # deterministic tail: with the writer gone, compact TWICE so the
    # keep_last=2 window holds only post-compact manifests (sink
    # appends carry every parent file by reference, so a window that
    # still contains a writer manifest retains the whole history) —
    # then vacuum has real victims
    t.compact(target_files=1)
    t.compact(target_files=1)
    assert t.vacuum(keep_last=2)

    # final sweep: every retained version serves exactly its recorded
    # count; vacuumed versions fail loudly through the ledger the
    # OTHER process wrote (the _LEDGER_CACHE mtime revalidation)
    counts = json.loads(sidecar.read_text())
    latest = t.latest_version()
    # the latest snapshot (post-compact) holds every row ever written
    assert t.read().count() == max(counts.values())
    served, gated = 0, 0
    for v in range(1, latest + 1):
        if str(v) not in counts:          # vacuum bookkeeping versions
            continue
        try:
            assert t.read(v).count() == counts[str(v)]
            served += 1
        except VersionVacuumedError:
            gated += 1
    # the live loop (checked >= 5 above) proved retained serving;
    # after the aggressive tail vacuum, the whole writer-era history
    # must gate LOUDLY through the foreign-written ledger — a stale
    # _LEDGER_CACHE would serve a phantom snapshot instead
    assert gated >= 5
    assert served + gated == len(
        [v for v in range(1, latest + 1) if str(v) in counts])
    # checkpoint short-circuit wrote by the foreign process
    assert list((root / "manifests").glob("ckpt-v*.parquet"))
