"""Time a subset of bench keys with bench.py's methodology (same
warmup, noop sink, min over N passes). For fast optimization
iterations; the full bench.py stays the official record.

Usage: python tools/time_keys.py <key> [<key>...]   (REPS env, default 2)
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    keys = sys.argv[1:]
    reps = int(os.environ.get("REPS", "2"))
    spark = get_spark("time_keys", master=f"local[{CPUS}]")
    qs = catalog.queries()
    materialize(qs["count_rows"](spark, SF_DIR))
    materialize(spark.range(0, 128, 1, 32)
                .mapInPandas(lambda it: it, schema="id long"))
    from spark_streaming_apps_spark.sources.tables import load_table
    for t in ("events", "orders", "lineitem", "customer",
              "documents", "embeddings"):
        materialize(load_table(spark, SF_DIR, t))
    from spark_streaming_apps_spark.streaming import jobs as _sj
    materialize(_sj.highwater_state_stream(spark, "/root/testdata/sf0.001"))

    from spark_streaming_apps_spark import telemetry
    from spark_streaming_apps_spark.operators import dedup
    times: dict[str, float] = {}
    splits_min: dict[str, float] = {}
    for rep in range(reps):
        dedup.clear_sketch_cache()
        for key in keys:
            telemetry.splits.clear()
            t0 = time.perf_counter()
            materialize(qs[key](spark, SF_DIR))
            t = round(time.perf_counter() - t0, 3)
            times[key] = min(times.get(key, t), t)
            for name, val in telemetry.splits.items():
                splits_min[name] = min(splits_min.get(name, val), val)
            print(f"  [{rep}] {key}: {t:.3f}s", file=sys.stderr)
    print(json.dumps({"queries": times, "splits": splits_min}))


if __name__ == "__main__":
    main()
