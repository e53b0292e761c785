"""Round-17 sf1 rung: which bench keys actually parallelize (appends to
SCALING.md). Run ALONE — one phase per process.

The r16 driver's c8/c32 ratio on the sf0.1 bench was 0.99: at fixture
scale the whole bench measures commit machinery and driver round-trips,
so core-count work is invisible (VERDICT r16 item 4). This rung builds a
10x corpus (.scratch/sf1x10: every sf0.1 table unioned 10 times with
remapped primary ids — deterministic, same distributions per id-mod
selections) and times a mixed key set there at local[32] vs local[8]:
the data-parallel keys should approach the core ratio, the
scenario/commit keys stay near 1.0 — identifying which keys are
genuinely serial, which is the honest reading of the sf0.1 bench.

Timing only — the 10x corpus has no DuckDB oracle (ids remapped), every
key is materialized through the noop sink exactly like bench.py.

Usage:
    python tools/scaling_r17.py prep
    SPARK_GRAFT_CPUS=32 python tools/scaling_r17.py run out32.json
    SPARK_GRAFT_CPUS=8  python tools/scaling_r17.py run out8.json
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = ROOT / ".scratch" / "sf1x10"
COPIES = 10

#: (table, primary id column) — ids remap to id*COPIES+k so every copy
#: stays unique; id-mod-based scenario selections keep ~the same
#: fractions. Dim tables copy once (they are the broadcast side).
FACTS = [("documents", "doc_id"), ("embeddings", "vec_id"),
         ("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
         ("events", "event_id"), ("customer", "c_custkey")]
DIMS = ["region", "nation", "supplier", "part"]

#: the timed set: data-parallel scans/joins/aggs vs the incremental
#: scenario keys the sf0.1 bench is dominated by
KEYS = [
    # data-parallel: should approach the core ratio at 10x
    "q1_pricing_summary", "dedup_minhash_lsh", "bm25_rank",
    "tfidf_cosine_topk", "salted_skew_agg", "knn_graph",
    "sequence_packing", "quality_funnel",
    # scenario/commit-machinery: expected near-serial
    "dedup_incremental", "text_index_incremental",
    "ivf_incremental_index", "acid_autovacuum",
]


def prep() -> None:
    import duckdb
    if (OUT_DIR / "_STAGED").exists():
        print("already staged", file=sys.stderr)
        return
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t, idc in FACTS:
        src = f"{SF_DIR}/{t}.parquet"
        sel = " UNION ALL ".join(
            f"SELECT * REPLACE ({idc} * {COPIES} + {k} AS {idc}) "
            f"FROM read_parquet('{src}')" for k in range(COPIES))
        con.execute(f"COPY ({sel}) TO '{OUT_DIR}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
        print(f"staged {t}", file=sys.stderr)
    for t in DIMS:
        con.execute(f"COPY (SELECT * FROM read_parquet("
                    f"'{SF_DIR}/{t}.parquet')) TO "
                    f"'{OUT_DIR}/{t}.parquet' (FORMAT PARQUET)")
    (OUT_DIR / "_STAGED").touch()


def run(out_path: str) -> None:
    from spark_streaming_apps_spark import catalog
    from spark_streaming_apps_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scaling_r17", master=f"local[{cpus}]")
    qs = catalog.queries()
    sf = str(OUT_DIR)

    def materialize(df):
        df.write.mode("overwrite").format("noop").save()

    materialize(qs["count_rows"](spark, sf))
    from spark_streaming_apps_spark.sources.tables import load_table
    for t in ("documents", "embeddings", "orders", "lineitem"):
        materialize(load_table(spark, sf, t))
    from spark_streaming_apps_spark.operators import dedup
    times: dict[str, float] = {}
    for rep in range(2):
        dedup.clear_sketch_cache()
        for key in KEYS:
            t0 = time.perf_counter()
            try:
                materialize(qs[key](spark, sf))
            except Exception as e:                     # noqa: BLE001
                print(f"  [{rep}] {key}: FAILED {e}", file=sys.stderr)
                times[key] = None
                continue
            t = round(time.perf_counter() - t0, 3)
            times[key] = min(times.get(key) or t, t)
            print(f"  [{rep}] {key}: {t:.3f}s", file=sys.stderr)
    Path(out_path).write_text(json.dumps(
        {"cpus": int(cpus), "sf": "sf0.1 x10 (remapped ids)",
         "queries": times}))
    print(json.dumps({"cpus": cpus, "queries": times}))


if __name__ == "__main__":
    if sys.argv[1] == "prep":
        prep()
    else:
        run(sys.argv[2])
