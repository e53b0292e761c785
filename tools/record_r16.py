"""Round-16 bench record refresh (the IVM-merge keys now commit
O(delta) — merge_add_pruned term_df, append-only pairs log — plus the
pin_sec split and every prior key as its own control).

Runs bench.py N times back-to-back (run ISOLATED — nothing else on
the VM), takes the per-key MIN across runs, writes BENCH_SELF_r16.json
stamped with the HEAD sha, regenerates BASELINE.md's table via
record_baseline.py, and prints an adjudication list: every key whose
clean-window min exceeds 1.3x of the PREVIOUS record (parsed from
BASELINE.md before regeneration) needs a code answer, not a weather
pass.

Usage: python tools/record_r16.py [n_runs=3]
"""
from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def parse_old_record() -> dict[str, float]:
    out: dict[str, float] = {}
    for ln in (ROOT / "BASELINE.md").read_text().splitlines():
        m = re.match(r"\|\s*`?([\w.]+)`?\s*\|\s*[\d.]+\s*\|"
                     r"\s*([\d.]+)\s*\|", ln)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out


def one_run(i: int) -> dict:
    print(f"--- bench run {i + 1} ---", file=sys.stderr)
    p = subprocess.run([sys.executable, str(ROOT / "bench.py")],
                       capture_output=True, text=True, timeout=3000,
                       cwd=ROOT)
    if p.returncode != 0:
        raise RuntimeError(f"bench run {i} failed: {p.stderr[-3000:]}")
    objs = [json.loads(ln) for ln in p.stdout.splitlines() if ln.strip()]
    art = next(o for o in objs if "queries" in o
               and o.get("metric") == "headline_queries_detail")
    raw = ROOT / ".scratch" / f"bench_r16_run{i + 1}.json"
    raw.parent.mkdir(exist_ok=True)
    raw.write_text(json.dumps(art))
    tot = round(sum(art["queries"].values()), 1)
    print(f"    total {tot}s / {len(art['queries'])} keys",
          file=sys.stderr)
    return art


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old = parse_old_record()
    runs = [one_run(i) for i in range(n)]

    keys = sorted({k for r in runs for k in r["queries"]})
    merged = dict(runs[-1])                  # meta from the last run
    merged["queries"] = {
        k: min(r["queries"][k] for r in runs if k in r["queries"])
        for k in keys}
    # keep artifact order stable: bench key order of the last run,
    # then any key present only in EARLIER runs (never silently drop a
    # measured key — a regressed-then-vanished key must still land in
    # the artifact and the adjudication list)
    ordered = list(runs[-1]["queries"]) + [
        k for k in keys if k not in runs[-1]["queries"]]
    merged["queries"] = {k: merged["queries"][k] for k in ordered}
    merged["stream_floor_sec"] = min(
        (r["stream_floor_sec"] for r in runs
         if r.get("stream_floor_sec")), default=None)
    if all(r.get("train_once_sec") for r in runs):
        merged["train_once_sec"] = {
            k: min(r["train_once_sec"][k] for r in runs)
            for k in runs[0]["train_once_sec"]}
    # per-key telemetry splits (retire_sec + NEW r16 pin_sec): min
    # across runs, like the headline numbers — BASELINE.md's
    # incremental-key notes read them
    for split in ("retire_sec", "pin_sec"):
        sk = sorted({k for r in runs for k in (r.get(split) or {})})
        if sk:
            merged[split] = {
                k: min(r[split][k] for r in runs
                       if k in (r.get(split) or {}))
                for k in sk}
    head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True
                          ).stdout.strip()
    merged["verified_at"] = head
    merged["note"] = (f"round-16 record refresh: per-key MIN over {n} "
                      f"isolated bench.py passes (each itself "
                      f"min-of-2) at HEAD {head[:8]}, nothing else on "
                      f"the VM; every previously-recorded key is its "
                      f"own control vs the prior record table")
    out = ROOT / "BENCH_SELF_r16.json"
    out.write_text(json.dumps(merged) + "\n")
    print(f"wrote {out}", file=sys.stderr)

    worse = []
    for k, v in merged["queries"].items():
        if k in old and old[k] > 0 and v / old[k] > 1.3:
            worse.append((k, old[k], v, round(v / old[k], 2)))
    print(json.dumps({
        "total_min_s": round(sum(merged["queries"].values()), 1),
        "keys": len(merged["queries"]),
        "over_1p3x_vs_old_record": [
            {"key": k, "old": o, "new": nv, "ratio": r}
            for k, o, nv, r in sorted(worse, key=lambda t: -t[3])],
    }, indent=1))

    subprocess.run([sys.executable, str(ROOT / "tools" /
                                        "record_baseline.py"),
                    "BENCH_SELF_r16.json"], cwd=ROOT, check=True)
    print("BASELINE.md table regenerated", file=sys.stderr)


if __name__ == "__main__":
    main()
