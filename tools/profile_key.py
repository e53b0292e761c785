"""Profile one bench key under cProfile (driver-side attribution).

These scenario keys are driver-orchestrated (dozens of small Spark
actions per run); every blocking py4j call is charged to the Python
frame that made it, so cumulative time per repo call-site is exactly
where the wall-clock goes. Usage:

    python tools/profile_key.py <key> [<key>...]

Runs the same warmup as bench.py, then each key once WARM (a throwaway
pass first), profiled on the second pass, printing the top repo-file
call sites by cumulative time.
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
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
    spark = get_spark("profile", master=f"local[{CPUS}]")
    qs = catalog.queries()
    materialize(qs["count_rows"](spark, SF_DIR))
    materialize(
        spark.range(0, 128, 1, 32).mapInPandas(lambda it: it,
                                               schema="id long"))
    from spark_streaming_apps_spark.sources.tables import load_table
    for t in ("events", "orders", "lineitem", "customer",
              "documents", "embeddings"):
        materialize(load_table(spark, SF_DIR, t))
    from spark_streaming_apps_spark.streaming import jobs as _sj
    materialize(_sj.highwater_state_stream(spark, "/root/testdata/sf0.001"))

    for key in keys:
        t0 = time.perf_counter()
        materialize(qs[key](spark, SF_DIR))      # warm pass (untimed)
        warm = time.perf_counter() - t0
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        materialize(qs[key](spark, SF_DIR))
        pr.disable()
        total = time.perf_counter() - t0
        print(f"\n===== {key}: {total:.2f}s (warm pass {warm:.2f}s) =====")
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
        st.print_stats("spark_streaming_apps_spark", 45)
        print(buf.getvalue())


if __name__ == "__main__":
    main()
