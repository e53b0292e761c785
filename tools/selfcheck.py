"""Local mimic of the driver's correctness gate.

Runs every ``queries()[key]`` at sf0.01 on local Spark, runs the matching
``oracle_sql()[key]`` in DuckDB over the same parquet files, and compares
row count, column-name set, and order-insensitive values (columns sorted by
name, every cell stringified, rows sorted). Keys without an oracle get a
rows-only check (runs + row count printed).

Usage: python tools/selfcheck.py [--json OUT] [key ...]   (no args = all keys)

With --json, also writes a driver-format report ({key: {rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}}) — committed as
CORRECTNESS_FULL.json because the driver's own gate caps at the first 50
registry keys and the catalog registers more than that.
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    named = [cols[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return named, data


def main() -> int:
    from __spark_entry__ import oracle_sql, queries
    from spark_streaming_apps_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    report: dict[str, dict] = {}
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, os_ = queries(), oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for key, builder in qs.items():
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = builder(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {key}: SPARK ERROR")
            traceback.print_exc(limit=6)
            report[key] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": None,
                           "oracle_rows": None, "err": "spark error"}
            n_fail += 1
            continue
        if key not in os_:
            print(f"rows  {key}: {len(srows)} rows (rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            report[key] = {"rows_match": len(srows) > 0, "schema_match": None,
                           "hash_match": None, "spark_rows": len(srows),
                           "oracle_rows": None, "err": None}
            n_rows_only += 1
            continue
        try:
            res = con.execute(os_[key])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {key}: DUCKDB ERROR {e}")
            report[key] = {"rows_match": False, "schema_match": False,
                           "hash_match": False, "spark_rows": len(srows),
                           "oracle_rows": None, "err": f"duckdb error: {e}"}
            n_fail += 1
            continue
        sc, sv = frame_fingerprint(scols, srows)
        dc, dv = frame_fingerprint(dcols, drows)
        rec = {"rows_match": len(sv) == len(dv), "schema_match": sc == dc,
               "hash_match": sc == dc and sv == dv,
               "spark_rows": len(sv), "oracle_rows": len(dv), "err": None}
        report[key] = rec
        if sc != dc:
            print(f"FAIL  {key}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sv) != len(dv):
            print(f"FAIL  {key}: rows spark={len(sv)} duck={len(dv)}")
            n_fail += 1
            continue
        if sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b]
            print(f"FAIL  {key}: {len(diffs)} value diffs; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
            continue
        print(f"ok    {key}: {len(sv)} rows [{time.time()-t0:.1f}s]")
        n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} fail")
    if json_out:
        # provenance header: "green at HEAD" must be checkable from the
        # artifact itself, not from commit messages
        report = {"_meta": {"verified_at": _git_head(),
                            "ts": time.time(),
                            "n_pass": n_pass, "n_fail": n_fail,
                            "n_rows_only": n_rows_only}, **report}
        Path(json_out).write_text(json.dumps(report, indent=2) + "\n")
        print(f"wrote {json_out} ({len(report) - 1} keys)")
    return 1 if n_fail else 0


def _git_head() -> str | None:
    import subprocess
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True,
            text=True, timeout=10,
            cwd=Path(__file__).resolve().parent.parent,
        ).stdout.strip() or None
    except Exception:                                  # noqa: BLE001
        return None


if __name__ == "__main__":
    raise SystemExit(main())
