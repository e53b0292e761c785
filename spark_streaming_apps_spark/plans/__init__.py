"""Plan-inspection helpers: assert the physical plan is the one you'd want.

The 100 TB contract is enforced here: tests use these to check that filters
reach the parquet scan (PushedFilters), that projections prune columns
(ReadSchema), that small dims broadcast, and that no operator sneaks in an
unconditioned cross join or a global single-partition sort.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def partition_filters(df: DataFrame) -> list[str]:
    """Every non-empty PartitionFilters list at a scan — evidence a
    predicate prunes partition DIRECTORIES (no IO at all for pruned
    cells), stronger than a row-group PushedFilter."""
    return [f for f in
            re.findall(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df))
            if f.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reaches a scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every ReadSchema struct at a scan (column pruning evidence)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df))

def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in any scan's PushedFilters."""
    return any(fragment in f for f in pushed_filters(df))


def _op_count(df: DataFrame, name: str) -> int:
    """Occurrences of a physical operator, counted from the details-section
    headers ``(N) OperatorName`` (the tree render repeats each name)."""
    return len(re.findall(rf"^\(\d+\) {name}\b", physical_plan(df), re.M))


def broadcast_join_count(df: DataFrame) -> int:
    return _op_count(df, "BroadcastHashJoin")


def cartesian_join_count(df: DataFrame) -> int:
    """True unconditioned shuffle cross joins — quadratic at scale."""
    return _op_count(df, "CartesianProduct")


def bnlj_count(df: DataFrame) -> int:
    """Broadcast nested-loop joins. Legit ONLY when the build side is a
    bounded tiny dim (1-row scalar, centroid table); tests allowing those
    assert an explicit upper bound."""
    return _op_count(df, "BroadcastNestedLoopJoin")


def equi_join_on(df: DataFrame, key: str) -> bool:
    """True if some equi join (SMJ / SHJ / BHJ) uses `key` as a join key —
    evidence a pair-generation step is keyed, not all-pairs."""
    return re.search(rf"keys \[\d+\]: \[[^\]]*\b{key}#",
                     physical_plan(df)) is not None


def forced_broadcast_count(df: DataFrame) -> int:
    """User-forced broadcast hints surviving in the analyzed logical plan
    (`ResolvedHint (strategy=broadcast)`). A forced broadcast is a scale
    hazard unless the side is provably bounded (1-row scalar, k-row
    centroid table): it overrides AQE's size gate, so a growing side
    becomes a driver/executor OOM instead of a shuffle join."""
    return len(re.findall(
        r"ResolvedHint.*broadcast",
        df._jdf.queryExecution().analyzed().toString()))


def sort_merge_join_count(df: DataFrame) -> int:
    """Shuffle-based sort-merge joins — each one is a full exchange of
    BOTH sides on the key. Zero in a plan whose big side was supposed
    to stream past a broadcast build."""
    return _op_count(df, "SortMergeJoin")


def shuffled_hash_join_count(df: DataFrame) -> int:
    return _op_count(df, "ShuffledHashJoin")


def global_sort_count(df: DataFrame) -> int:
    """Global (single-partition-range) sort exchanges — the scale smell the
    reference's repartition(1) had. TakeOrderedAndProject (bounded top-k)
    does NOT count."""
    return len(re.findall(r"Exchange rangepartitioning", physical_plan(df)))
