"""The `desh_files` work-queue status machine (SURVEY.md §2.G).

Reference: `desh_files(file_id, resident, status, added, hw_before, hw_after,
removed, started, finished, error_status)` created at StreamingApp.scala:201;
status transitions 0=available (insert :404) → 1=claimed
(FileWorkerApp.scala:211, inside a manual JDBC transaction :207-227) →
2=started (:115,326-328) → 3=finished (:114,330-334); `error_status=1` flags
failures; `resident=1` marks files with no layout extents
(StreamingApp.scala:186-190).

Spark-first stance: a mutable row-store queue becomes (a) for batch analysis,
pure projections of the post-update state (`F.when` status algebra — Catalyst
folds these into the scan), and (b) for a live pipeline, MERGE-style upserts
done in `foreachBatch` by a single writer per key range (streaming/jobs.py),
which is the Spark-native replacement for row-level locks.

The batch fixture derives the queue deterministically from `orders`:
file_id=o_orderkey, status O→0/P→1/F→3, resident = orderkey%5==0,
error_status = orderkey%11==0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: deterministic timestamp literals standing in for wall-clock stamps
#: (StreamingApp.scala:454-455, FileWorkerApp.scala:214-215,324-334) so the
#: oracle can reproduce them.
TS_CLAIM = "2026-01-01 00:00:00"
TS_DONE = "2026-01-01 00:05:00"

QUEUE_SQL = (
    "SELECT o_orderkey AS file_id, "
    "CASE o_orderstatus WHEN 'O' THEN 0 WHEN 'P' THEN 1 ELSE 3 END AS status, "
    "CAST(o_orderkey % 5 = 0 AS INT) AS resident, "
    "CAST(o_orderkey % 11 = 0 AS INT) AS error_status, "
    "o_totalprice AS hw_after FROM orders"
)


def queue_df(orders: DataFrame) -> DataFrame:
    """orders → desh_files analog (see module docstring for the mapping)."""
    return orders.select(
        F.col("o_orderkey").alias("file_id"),
        F.when(F.col("o_orderstatus") == "O", 0)
         .when(F.col("o_orderstatus") == "P", 1)
         .otherwise(3).alias("status"),
        (F.col("o_orderkey") % 5 == 0).cast("int").alias("resident"),
        (F.col("o_orderkey") % 11 == 0).cast("int").alias("error_status"),
        F.col("o_totalprice").alias("hw_after"),
    )


def claim_one(q: DataFrame) -> DataFrame:
    """Post-state of the exactly-once claim: the lowest available file flips
    status 0→1 and gets a `removed` stamp (FileWorkerApp.scala:207-227;
    `limit 1` claim :210). Deterministic twin of `SELECT … LIMIT 1` +
    `UPDATE`: min(file_id) over status=0. All queue columns are carried so
    the output composes as a desh_files post-state."""
    claimed = q.filter(F.col("status") == 0).agg(F.min("file_id").alias("cid"))
    hit = F.col("file_id") == F.col("cid")
    return (
        q.join(F.broadcast(claimed))
        .select(
            "file_id", "resident", "error_status", "hw_after",
            F.when(hit, 1).otherwise(F.col("status")).alias("status"),
            F.when(hit, F.lit(TS_CLAIM).cast("timestamp_ntz")).alias("removed"),
        )
    )


def try_claim(claim_dir, file_id: int, worker_id: str) -> bool:
    """Atomically claim `file_id`: exclusive create of a claim marker.
    POSIX open(O_CREAT|O_EXCL) is atomic per path on local FS and on
    HDFS/object-store create-if-absent semantics, so exactly ONE
    concurrent caller can win a given file — the engine's row-lock
    replacement for the reference's manual JDBC transaction
    (FileWorkerApp.scala:207-227: BEGIN; SELECT … LIMIT 1; UPDATE …;
    COMMIT). The marker records the winning worker for audit."""
    from pathlib import Path

    from ..storage import get_store
    return get_store().create_exclusive(
        Path(claim_dir) / f"{int(file_id)}.claim", worker_id)


def claim_one_exclusive(q: DataFrame, claim_dir, worker_id: str,
                        candidate_batch: int = 64):
    """EXACTLY-ONCE claim under concurrent workers: returns the claimed
    file_id, or None once the queue is drained. Candidates stream to the
    driver in bounded batches of the lowest available ids (a claim is ONE
    row by contract — the reference's limit-1 poll, FileWorkerApp.scala:
    210 — so this is a control-plane fetch, not a data-plane collect);
    each candidate is raced through `try_claim`, whose exclusive create
    makes double-claims impossible by construction, with no coordination
    service and no single-writer constraint. Losers skip forward; the
    claimed sets of any number of workers are provably disjoint
    (tests/test_queue.py races 4 workers to verify)."""
    import os
    os.makedirs(claim_dir, exist_ok=True)
    last = None
    while True:
        avail = q.filter(F.col("status") == 0)
        if last is not None:
            avail = avail.filter(F.col("file_id") > last)
        cands = [r.file_id for r in (avail.select("file_id")
                 .orderBy("file_id").limit(candidate_batch).collect())]
        if not cands:
            return None
        for fid in cands:
            if try_claim(claim_dir, fid, worker_id):
                return fid
        last = cands[-1]


def claimed_view(q: DataFrame, claim_dir) -> DataFrame:
    """The desh_files post-state after exclusive claims: queue LEFT JOIN
    the claim log (markers read back as a tiny (file_id, worker) table).
    Claimed rows show status 1 + the claiming worker — the batch-readable
    audit surface of the claim protocol."""
    import os
    from pathlib import Path
    spark = q.sparkSession
    rows = []
    for p in sorted(Path(claim_dir).glob("*.claim")):
        rows.append((int(p.stem), p.read_text() or None))
    log = spark.createDataFrame(rows or [(None, None)],
                                "file_id bigint, worker string")
    if not rows:
        log = log.filter(F.col("file_id").isNotNull())
    hit = F.col("worker").isNotNull()
    return (q.join(F.broadcast(log), "file_id", "left")
            .select("file_id", "resident", "error_status", "hw_after",
                    F.when(hit, 1).otherwise(F.col("status")).alias("status"),
                    "worker"))


def status_transitions(q: DataFrame) -> DataFrame:
    """The claimed→started→finished progression (FileWorkerApp.scala:
    114-117,324-334) applied as two chained projections, so status 2 is
    genuinely populated and then finished: claimed(1) files get a `started`
    stamp and move to 2; started(2) files get a `finished` stamp and move
    to 3. All queue columns are carried through."""
    started = q.select(
        "file_id", "resident", "error_status", "hw_after",
        F.when(F.col("status") == 1, 2).otherwise(F.col("status")).alias("status"),
        F.when(F.col("status") == 1,
               F.lit(TS_CLAIM).cast("timestamp_ntz")).alias("started"),
    )
    return started.select(
        "file_id", "resident", "error_status", "hw_after", "started",
        F.when(F.col("status") == 2, 3).otherwise(F.col("status")).alias("status"),
        F.when(F.col("status") == 2,
               F.lit(TS_DONE).cast("timestamp_ntz")).alias("finished"),
    )


def reset_errors(q: DataFrame) -> DataFrame:
    """Re-enqueue errored resident files — `update desh_files set status=0
    where error_status=1 and resident=1` (StreamingApp.scala:443, fired at
    the 50%/100% arrival checkpoints :428-445)."""
    return (
        q.filter((F.col("error_status") == 1) & (F.col("resident") == 1))
        .select("file_id", F.lit(0).alias("status"),
                F.lit(1).alias("error_status"))
    )
