"""Capture .explain("formatted") for bench keys into plans/<tag>/.

Usage: python tools/capture_plans.py <tag-dir-suffix> <key> [<key>...]

Writes plans/$SPARK_GRAFT_PLAN_DIR (default r17)/<key>_<tag>.txt for each key (tag = 'before'/'after').
Scenario keys execute their maintenance as a side effect of building the
returned DataFrame; the captured plan is the plan of the DataFrame the
driver materializes.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from spark_streaming_apps_spark import catalog  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = ROOT / "plans" / os.environ.get("SPARK_GRAFT_PLAN_DIR", "r17")


def main() -> None:
    tag, keys = sys.argv[1], sys.argv[2:]
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plans", master=f"local[{CPUS}]")
    qs = catalog.queries()
    for key in keys:
        df = qs[key](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (OUT / f"{key}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {OUT.name}/{key}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
