"""ACID serving-path scaling rung: sf0.1 → sf1 (10x data).

Round-11 verdict task #8: the O(delta)/O(arrivals) claims for the
ACID family are measured at sf0.001-0.1 plus targeted 10M-row rungs;
this script extends the curve one more decade for the serving paths —
snapshot read, pruned COW DML, CDF read, bloom point lookup, linked
append — using the scaling_ext key-offset synthesis of sf1 lineitem
(6M rows) from the driver's sf0.1.

Expected law: snapshot read is O(table) (ratio ≈ data ratio); pruned
DML / CDF / point lookup / linked append are O(matched | delta | KB
probes | batch) and must stay FLAT-OR-SUBLINEAR across the decade.

Run ALONE (no concurrent Spark — the bench-contention rule).
Usage: python tools/scaling_acid.py   (appends a section to SCALING.md)
"""
from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_apps_spark.acid import AcidTable  # noqa: E402
from spark_streaming_apps_spark.session import get_spark  # noqa: E402
from spark_streaming_apps_spark.sources.tables import load_table  # noqa: E402
from tools.scaling_ext import synth_dir  # noqa: E402

SCRATCH = Path(__file__).resolve().parents[1] / ".scratch" / "acid_sf1"
REPO = Path(__file__).resolve().parents[1]


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def measure(spark, sf_dir: str, tag: str) -> dict:
    path = SCRATCH / f"t_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice")
          .withColumn("row_md5", F.md5(F.concat_ws(
              "#", "l_orderkey", "l_linenumber")))
          .repartitionByRange(32, "l_orderkey")
          .sortWithinPartitions("l_orderkey"))
    t = AcidTable.create(spark, path, li, enable_cdf=True,
                         bloom_by=["row_md5"])
    n = t.read().count()
    needle_key = int(t.read().agg(
        F.min("l_orderkey")).collect()[0][0]) + 1000
    needle = t.read().filter(
        f"l_orderkey = {needle_key}").collect()[0].row_md5

    out = {"rows": n}
    out["snapshot_read_s"], _ = _timed(
        lambda: t.read().agg(F.sum("l_quantity")).collect())
    # O(batch) linked append: 1k rows against the whole table
    batch = (load_table(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_linenumber", "l_quantity",
                     "l_extendedprice").limit(1000)
             .withColumn("l_orderkey", F.col("l_orderkey")
                         + 900_000_000)
             .withColumn("row_md5", F.md5(F.concat_ws(
                 "#", "l_orderkey", "l_linenumber"))))
    out["linked_append_s"], _ = _timed(lambda: t.append(batch))
    # O(matched files) pruned COW delete: a 2k-orderkey band on the
    # clustered key
    lo = needle_key + 5_000
    out["pruned_delete_s"], _ = _timed(
        lambda: t.delete_where(
            f"l_orderkey BETWEEN {lo} AND {lo + 2000}"))
    cow = dict(t.last_cow_stats)
    out["cow_files_rewritten"] = cow.get("files_rewritten")
    # O(delta) CDF read of the delete's recorded change files
    v = t.latest_version()
    out["cdf_read_s"], nch = _timed(
        lambda: t.read_changes(v - 1, v).count())
    out["cdf_rows"] = nch
    # bloom point lookup on the md5 column (stats useless by design)
    out["point_lookup_s"], hit = _timed(
        lambda: t.read_eq("row_md5", needle).count())
    assert hit == 1, (tag, hit)
    pruned, total = t.pruned_files_eq("row_md5", needle)
    out["lookup_files"] = f"{len(pruned)} of {total}"
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark()
    sf01 = "/root/testdata/sf0.1"
    sf1 = synth_dir(spark, "1", 10, tables={"lineitem"})
    # throwaway warm-up pass (codegen + JVM JIT) so the sf0.1 cells
    # don't carry the cold-start the sf1 cells then get for free —
    # the ladder protocol's "JVM warmed on a throwaway delete" rule
    measure(spark, "/root/testdata/sf0.01", "warmup")
    rows = {}
    for tag, d in (("sf0.1", sf01), ("sf1", sf1)):
        rows[tag] = measure(spark, d, tag)
        print(json.dumps({tag: rows[tag]}), file=sys.stderr)

    a, b = rows["sf0.1"], rows["sf1"]

    def ratio(k):
        return round(b[k] / a[k], 2) if a[k] else float("inf")

    lines = [
        "",
        "## ACID serving-path rung at sf1 (round 12): one more decade",
        "",
        f"sf0.1 lineitem ({a['rows']:,} rows) vs key-offset-synthesized"
        f" sf1 ({b['rows']:,} rows, 10x) — the scaling_ext synthesis,",
        "32-file orderkey-clustered AcidTable with CDF + a bloom index",
        "on a row-md5 column. Run alone on local[32]; data grows 10x,",
        "the O(delta) paths must not.",
        "",
        "| path | law | sf0.1 | sf1 | ratio |",
        "|---|---|---|---|---|",
        f"| snapshot read (full agg) | O(table) | {a['snapshot_read_s']} s"
        f" | {b['snapshot_read_s']} s | {ratio('snapshot_read_s')}x |",
        f"| linked append (1k rows) | O(batch) | {a['linked_append_s']} s"
        f" | {b['linked_append_s']} s | {ratio('linked_append_s')}x |",
        f"| pruned COW DELETE (2k-key band) | O(matched files) |"
        f" {a['pruned_delete_s']} s ({a['cow_files_rewritten']} files)"
        f" | {b['pruned_delete_s']} s ({b['cow_files_rewritten']} files)"
        f" | {ratio('pruned_delete_s')}x |",
        f"| CDF read of that commit | O(delta) | {a['cdf_read_s']} s"
        f" ({a['cdf_rows']} rows) | {b['cdf_read_s']} s"
        f" ({b['cdf_rows']} rows) | {ratio('cdf_read_s')}x |",
        f"| bloom point lookup | O(probes) | {a['point_lookup_s']} s"
        f" ({a['lookup_files']}) | {b['point_lookup_s']} s"
        f" ({b['lookup_files']}) | {ratio('point_lookup_s')}x |",
        "",
    ]
    with open(REPO / "SCALING.md", "a") as fh:
        fh.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
