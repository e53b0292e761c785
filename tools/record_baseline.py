"""Regenerate BASELINE.md's per-key table from a bench artifact.

Usage: python tools/record_baseline.py [BENCH_SELF_r05.json]

Reads the artifact written by `python bench.py > BENCH_SELF_rN.json`,
rewrites the `| query key | sf | sec/query | config | notes |` table in
BASELINE.md in artifact order, and PRESERVES the per-key notes column
(notes for new keys start empty — fill them in by hand). The prose above
the table (methodology, totals, recall story) is hand-maintained; update
it in the same commit so the text matches the numbers.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> None:
    art_path = ROOT / (sys.argv[1] if len(sys.argv) > 1
                       else "BENCH_SELF_r05.json")
    # round-6 artifacts are two JSON lines (full detail first, compact
    # headline last); older ones are a single object
    objs = [json.loads(ln) for ln in art_path.read_text().splitlines()
            if ln.strip()]
    art = next((o for o in objs if "queries" in o and
                len(o["queries"]) > 1), objs[0])
    md_path = ROOT / "BASELINE.md"
    md = md_path.read_text()

    notes: dict[str, str] = {}
    for m in re.finditer(
            r'^\| (\S+) \| [\d.]+ \| [\d.]+ \| local\[\d+\] \|(.*)\|$',
            md, re.M):
        notes[m.group(1)] = m.group(2).strip()

    sf = art.get("sf", 0.1)
    rows = "\n".join(
        f"| {k} | {sf} | {round(v, 3)} | local[32] | {notes.get(k, '')} |"
        for k, v in art["queries"].items())
    hdr = ("| query key | sf | sec/query | config | notes |\n"
           "|---|---|---|---|---|\n")

    start = md.index("| query key |")
    lines = md[start:].split("\n")
    last = 0
    for i, ln in enumerate(lines):
        if ln.startswith("|"):
            last = i
        elif ln.strip():
            break
    table_end = start + len("\n".join(lines[:last + 1]))
    md_path.write_text(md[:start] + hdr + rows + md[table_end:])
    missing = [k for k in art["queries"] if not notes.get(k)]
    print(f"wrote {len(art['queries'])} rows; keys needing notes: {missing}")


if __name__ == "__main__":
    main()
