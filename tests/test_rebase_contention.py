"""Multi-process conflict-rebase contention — the round-11 rebase
rules under GENUINE interleaving, not scripted losses.

Four real writer processes hammer one table concurrently:

* two SparkSession-free sink appenders (the cache-coherence pattern —
  staged pyarrow parquet through the same manifest CAS),
* one Spark compactor (full-rewrite layout op: the layout-vs-append
  rebase path),
* one Spark COW-delete storm over pre-seeded keys (the row-local
  DML-vs-append rebase path).

Assertions: the final state is SERIAL-EQUIVALENT (key spaces are
disjoint, so every serialization yields the same rows), the version
chain is exactly one commit per committed write, and staging waste is
O(1) — lost races re-parent their staged bytes instead of re-staging,
so on-disk commit dirs unreferenced by any manifest stay near zero
(rebase rules: acid.py _commit_loop/_cow_rebase)."""
import json
import subprocess
import sys
import time
from pathlib import Path

import pytest

from spark_streaming_apps_spark.acid import AcidTable

# multi-process contention drains: the slow tier (see pytest.ini)
pytestmark = pytest.mark.slow

REPO = str(Path(__file__).resolve().parents[1])

APPENDER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import pyarrow as pa
from spark_streaming_apps_spark.sources.pysource import AcidStreamWriter

w = AcidStreamWriter({root!r}, [("k", pa.int64())], {app!r})
base = {base}
done = 0
# keep appending until the parent signals the Spark writers are done,
# so the compact/delete commits land INSIDE a live append stream
for batch in range(400):
    if os.path.exists({stop!r}) and batch >= 10:
        break
    msg = w.write(iter([(base + batch * 3 + j,) for j in range(3)]))
    w.commit([msg], batch)
    done += 1
    time.sleep(0.05)
print(json.dumps({{"commits": done, "rows": done * 3}}))
"""

COMPACTOR = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
from spark_streaming_apps_spark.acid import AcidTable, CommitConflict
t = AcidTable(spark, {root!r})
done = 0
for _ in range(3):
    try:
        t.compact(target_files=2)
        done += 1
    except CommitConflict:
        pass
    time.sleep(0.5)
print(json.dumps({{"commits": done,
                   "rebases": getattr(t, "rebase_commits", 0),
                   "stagings": getattr(t, "stage_count", 0)}}))
"""

DELETER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
from spark_streaming_apps_spark.acid import AcidTable, CommitConflict
t = AcidTable(spark, {root!r})
done = 0
for lo in range(0, 900, 100):
    try:
        t.delete_where(f"k >= {{lo}} AND k < {{lo + 100}}")
        done += 1
    except CommitConflict:
        pass
    time.sleep(0.2)
print(json.dumps({{"commits": done,
                   "rebases": getattr(t, "rebase_commits", 0),
                   "stagings": getattr(t, "stage_count", 0)}}))
"""


def test_four_process_rebase_contention(spark, tmp_path):
    root = tmp_path / "t"
    t = AcidTable.create(
        spark, root,
        spark.createDataFrame([(i,) for i in range(1000)], "k long")
        .repartition(8))

    def launch(script, **kw):
        return subprocess.Popen(
            [sys.executable, "-c", script.format(repo=REPO,
                                                 root=str(root), **kw)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)

    t0 = time.time()
    stop = tmp_path / "stop"
    procs = {
        "app1": launch(APPENDER, app="app1", base=10_000,
                       stop=str(stop)),
        "app2": launch(APPENDER, app="app2", base=20_000,
                       stop=str(stop)),
        "compact": launch(COMPACTOR),
        "delete": launch(DELETER),
    }
    reports = {}
    for name in ("compact", "delete"):
        out, err = procs[name].communicate(timeout=600)
        assert procs[name].returncode == 0, f"{name} failed: {err[-3000:]}"
        reports[name] = json.loads(out.strip().splitlines()[-1])
    stop.write_text("done")              # release the appenders
    for name in ("app1", "app2"):
        out, err = procs[name].communicate(timeout=600)
        assert procs[name].returncode == 0, f"{name} failed: {err[-3000:]}"
        reports[name] = json.loads(out.strip().splitlines()[-1])
    wall = time.time() - t0

    # --- serial equivalence: disjoint key spaces make every
    # serialization yield the same final rows
    expected = (set(range(900, 1000))
                | {10_000 + i for i in range(reports["app1"]["rows"])}
                | {20_000 + i for i in range(reports["app2"]["rows"])})
    t2 = AcidTable(spark, root)
    got = {r.k for r in t2.read().collect()}
    assert got == expected, (
        f"lost/duplicated writes: missing={sorted(expected - got)[:10]} "
        f"extra={sorted(got - expected)[:10]}")

    # --- one commit per committed write, a pure serial chain
    n_commits = sum(r["commits"] for r in reports.values())
    assert t2.latest_version() == n_commits
    # spot-check the chain is readable end to end
    for v in range(0, n_commits + 1, max(1, n_commits // 6)):
        t2.read(v).count()

    # --- O(N) stagings: lost races re-parented their staged bytes
    # (append-wins / layout / row-local rebases); dirs no manifest
    # ever referenced = wasted re-stagings
    ever: set = set()
    for mp in (root / "manifests").glob("v*.json"):
        m = json.loads(mp.read_text())
        for f in (m.get("files") or []) + (m.get("files_add") or []):
            p = f["path"]
            if "/" in p:
                ever.add(p.rsplit("/", 1)[0])
            else:
                ever.add(m["data"])
        ever.add(m["data"])
    on_disk = {f"data/{d.name}" for d in (root / "data").iterdir()
               if d.is_dir() and not d.name.startswith(("tmp-",
                                                        "stage-"))}
    wasted = on_disk - ever
    assert len(wasted) <= 3, (
        f"{len(wasted)} wasted stagings (rebase should re-parent): "
        f"{sorted(wasted)[:5]}")

    # --- genuine interleaving happened: the Spark writers resolved
    # lost races by REBASE (not luck-of-no-conflict) — appenders at a
    # 30 ms cadence against multi-second compact/delete commits make
    # losses near-certain; a zero here means the run never contended
    total_rebases = (reports["compact"].get("rebases", 0)
                     + reports["delete"].get("rebases", 0))
    assert total_rebases >= 1, (
        f"no lost race was rebased — contention never happened? "
        f"{reports}")
    # O(N) DISTRIBUTED STAGING PASSES, directly counted: each Spark
    # writer paid at most one staging per committed write plus a
    # small slack for unrebaseable losses — never a per-retry restage
    for name in ("compact", "delete"):
        r = reports[name]
        assert r["stagings"] <= r["commits"] + 2, (
            f"{name} staged {r['stagings']}x for {r['commits']} "
            f"commits — lost races are re-staging instead of rebasing")

    # telemetry for the SCALING rung
    print(json.dumps({
        "commits": n_commits, "versions": t2.latest_version(),
        "staged_dirs": len(on_disk), "wasted_stagings": len(wasted),
        "wall_s": round(wall, 1), "rebases": total_rebases,
        "per_writer": reports}))
