"""Round-13 adjudication: isolated min-of-3 for acid_bloom_index (the
one >2x driver reading in BENCH_r12) with >=2 untouched control keys
timed in the SAME session, per the BASELINE.md:170 protocol."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import CPUS, SF_DIR, materialize  # noqa: E402
from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

KEYS = ["acid_bloom_index",          # the mover (now batched audit)
        "url_dedup",                 # controls: untouched short keys
        "heavy_hitters_cms",
        "acid_pruned_dml"]
RECORD = {"acid_bloom_index": 4.007, "url_dedup": 0.357,
          "heavy_hitters_cms": 0.584, "acid_pruned_dml": 1.587}


def main():
    spark = get_spark("adjudicate", master=f"local[{CPUS}]")
    qs = catalog.queries()
    materialize(qs["count_rows"](spark, SF_DIR))
    from spark_streaming_apps_spark.sources.tables import load_table
    for t in ("orders", "documents"):
        materialize(load_table(spark, SF_DIR, t))
    best = {}
    for rep in range(3):
        for k in KEYS:
            t0 = time.perf_counter()
            materialize(qs[k](spark, SF_DIR))
            dt = round(time.perf_counter() - t0, 3)
            best[k] = min(best.get(k, dt), dt)
            print(f"  [{rep}] {k}: {dt:.3f}s", file=sys.stderr)
    out = {k: {"min3": v, "record": RECORD[k],
               "ratio": round(v / RECORD[k], 3)} for k, v in best.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
