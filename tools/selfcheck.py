"""Local mimic of the driver's correctness gate.

Runs every ``queries()[key]`` at sf0.01 on local Spark, runs the matching
``oracle_sql()[key]`` in DuckDB over the same parquet files, and compares
row count, column-name set, and order-insensitive values (columns sorted by
name, every cell stringified, rows sorted). Keys without an oracle get a
rows-only check (runs + row count printed).

Usage: python tools/selfcheck.py [key ...]   (no args = all keys)
"""

from __future__ import annotations

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

    only = set(sys.argv[1:])
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
            n_fail += 1
            continue
        if key not in os_:
            print(f"rows  {key}: {len(srows)} rows (rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(os_[key])
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {key}: DUCKDB ERROR {e}")
            n_fail += 1
            continue
        sc, sv = frame_fingerprint(scols, srows)
        dc, dv = frame_fingerprint(dcols, drows)
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
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
