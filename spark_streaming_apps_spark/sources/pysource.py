"""Python DataSource API (Spark 4) — the connector extension seam.

The reference's front door is a custom source feeding the engine
(Kafka + Avro chunks, StreamingApp.scala:309-318); Spark 4's Python
DataSource API is where a user plugs an equivalent custom feed into THIS
engine without touching the JVM: implement `partitions()` for the split
plan and `read(partition)` per task, and the source runs
partition-parallel across executors like any native scan.

The demo source is a deterministic LCG row generator — fixture-free and
bit-reproducible in the DuckDB oracle (integer math only), so the
correctness gate checks the full connector round trip: option plumbing,
split planning, per-partition reads, Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter, InputPartition,
                                    SimpleDataSourceStreamReader,
                                    WriterCommitMessage)

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 1 << 31
N_ROWS = 100_000
N_PARTS = 8
N_BUCKETS = 16
#: Max bytes the SparkSession-free sink autocompaction folds per
#: invocation (largest small-file groups first; the remainder folds on
#: later batches) — bounds the writer process's memory by POLICY
#: instead of backlog size. Overridable per table via the autocompact
#: prop's ``max_fold_bytes``.
_FOLD_CAP_BYTES = 256 << 20


def _write_bloom_sidecar(vals: set, name: str, logical: str,
                         dest, new_rel: str) -> str | None:
    """Write one per-file bloom sidecar (AcidTable._attach_blooms'
    wire format) next to data file ``name`` in ``dest``; returns the
    root-relative sidecar path, or None when no value is hashable (an
    all-zero bitset would read as definitive absence — the reader
    conservatively keeps sidecar-less files)."""
    from ..acid import _bloom_pair, build_bloom
    if vals and not any(_bloom_pair(v) is not None for v in vals):
        return None
    side = f"_bloom-{name}-{logical}.bin"
    (dest / side).write_bytes(build_bloom(vals))
    return f"{new_rel}/{side}"


class LcgPartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class LcgDataSource(DataSource):
    """`spark.read.format("lcg").option("rows", n).load()` — each of the
    `parts` splits generates its id range independently on an executor;
    no partition ever sees another's rows (the split plan IS the
    parallelism, exactly like file splits for a parquet scan)."""

    @classmethod
    def name(cls) -> str:
        return "lcg"

    def schema(self) -> str:
        return "id bigint, bucket int, lcg bigint"

    def reader(self, schema) -> DataSourceReader:
        return LcgReader(int(self.options.get("rows", N_ROWS)),
                         int(self.options.get("parts", N_PARTS)))


class LcgReader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        self.rows, self.parts = rows, parts

    def partitions(self):
        per = self.rows // self.parts
        return [LcgPartition(p * per,
                             (p + 1) * per if p < self.parts - 1 else self.rows)
                for p in range(self.parts)]

    def read(self, partition: LcgPartition):
        for i in range(partition.lo, partition.hi):
            yield (i, i % N_BUCKETS, (LCG_A * i + LCG_C) % LCG_M)


def python_datasource(spark: SparkSession) -> DataFrame:
    """Register + scan the custom source, then a per-bucket aggregate
    whose sums are EXACT integers (float summation order would differ
    between engines): n, sum of the raw LCG values, id extent, and the
    mean value derived from the exact sum at the end."""
    spark.dataSource.register(LcgDataSource)
    df = spark.read.format("lcg") \
        .option("rows", N_ROWS).option("parts", N_PARTS).load()
    return (df.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("lcg").alias("sum_lcg"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id"))
            .withColumn("avg_val",
                        F.round(F.col("sum_lcg")
                                / (F.col("n") * float(LCG_M)), 6)))


PYTHON_DATASOURCE_ORACLE = f"""
WITH g AS (SELECT i AS id, i % {N_BUCKETS} AS bucket,
                  ({LCG_A} * i + {LCG_C}) % {LCG_M} AS lcg
           FROM generate_series(0, {N_ROWS - 1}) AS t(i))
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
       CAST(SUM(lcg) AS BIGINT) AS sum_lcg,
       MIN(id) AS min_id, MAX(id) AS max_id,
       round(CAST(SUM(lcg) AS BIGINT) / (COUNT(*) * {float(LCG_M)}), 6)
         AS avg_val
FROM g GROUP BY bucket
"""


# ------------------------------------------------ AcidTable as a DataSource
#
# The table format exposed through the SAME seam: `spark.read
# .format("acidtable").option("path", p).option("version", v)` gives any
# consumer time travel and manifest-stats file pruning WITHOUT importing
# this package's Python API — the manifest is the split plan (one
# InputPartition per committed data file, so a snapshot scan is
# partition-parallel exactly like a native parquet read), and optional
# (col, lo, hi) options prune splits from the manifest's per-file
# [min, max] stats before a single file is opened.

class AcidFilePartition(InputPartition):
    def __init__(self, path: str, dv_dir: str | None = None,
                 fields=None):
        self.path = path
        self.dv_dir = dv_dir    # deletion-vector sidecar dir, if any
        #: column-mapping projection: [(physical, logical, pa type)]
        #: per declared field, or None for identity tables
        self.fields = fields


class AcidTableDataSource(DataSource):
    """`spark.read.format("acidtable")` — options:

    * ``path`` (required): table root
    * ``version``: snapshot to read (default: latest committed)
    * ``col``/``lo``/``hi``: prune data files whose manifest [min, max]
      extent on ``col`` cannot overlap [lo, hi] (the reader still
      applies no residual filter — pair with `.filter` for exactness,
      as `read_range` does; pruning here only removes provably-empty
      IO, never rows that could match).

    WRITE side (`df.writeStream.format("acidtable")`): an exactly-once
    streaming SINK through the same seam — executors write each
    partition's rows as staged parquet, and one driver-side commit per
    micro-batch links staged + parent files into a new version with the
    (appId, batchId) fence riding the manifest's txn map, so a replayed
    batch after restart is a no-op (the `AcidTable.append_txn` contract
    without a SparkSession anywhere in the sink path). Option ``appId``
    names the writer (default ``acid-sink``)."""

    @classmethod
    def name(cls) -> str:
        return "acidtable"

    def streamWriter(self, schema, overwrite: bool):
        from pyspark.sql.pandas.types import to_arrow_type
        pa_fields = [(f.name, to_arrow_type(f.dataType))
                     for f in schema.fields]
        # column-mapped tables: staged files must write the FROZEN
        # physical names; the mapping is captured at stream start and
        # re-checked at every commit (identity-epoch fence)
        mapping = (_walk_props(self.options["path"])
                   .get("column_mapping") or {})
        return AcidStreamWriter(self.options["path"], pa_fields,
                                self.options.get("appid", "acid-sink"),
                                mapping)

    def _manifest(self) -> dict:
        import json
        from pathlib import Path

        from ..acid import resolve_manifest_files

        root = Path(self.options["path"])
        v = self.options.get("version")
        if v is None:
            from ..acid import latest_committed_version
            v = latest_committed_version(root / "manifests")
        m = json.loads(
            (root / "manifests" / f"v{int(v)}.json").read_text())
        if "files_base" in m:    # O(delta) manifest: materialize
            m["files"] = resolve_manifest_files(root, m)
        return m

    def schema(self):
        from pyspark.sql.types import StructType
        return StructType.fromJson(self._manifest()["schema"])

    def reader(self, schema) -> DataSourceReader:
        m = self._manifest()
        root = self.options["path"]
        files = m.get("files") or []

        def rel(f: dict) -> str:
            # root-relative entry (new scheme) vs bare name inside the
            # manifest's own data dir (legacy) — same resolution rule
            # as acid._entry_rel, kept SparkSession-free here
            p = f["path"]
            return p if "/" in p else f'{m["data"]}/{p}'

        col = self.options.get("col")
        if col and files:
            lo, hi = float(self.options["lo"]), float(self.options["hi"])
            keep = []
            for f in files:
                pv = (f.get("partition") or {}).get(col)
                if isinstance(pv, (int, float)):
                    # partition value decides FIRST (exact — one
                    # comparison per file, before stats)
                    if lo <= pv <= hi:
                        keep.append(rel(f))
                    continue
                st = f.get("stats", {}).get(col)
                if st is None or (st[0] <= hi and lo <= st[1]):
                    keep.append(rel(f))
        else:
            from pathlib import Path
            keep = ([rel(f) for f in files] if files else
                    sorted(f'{m["data"]}/{p.name}' for p in
                           (Path(root) / m["data"]).glob("*.parquet")))
        dv_dir = f'{root}/{m["dv"]}' if "dv" in m else None
        fields = None
        # props AT THE READ VERSION (time travel must apply that
        # version's mapping, not the latest's — a drop-then-re-add
        # after ``m`` would otherwise bind the old logical name to the
        # re-added column's fresh physical and read NULL)
        props = _walk_props(root, version=m["version"])
        mapping = props.get("column_mapping") or {}
        if mapping or props.get("retired_physical"):
            # build an explicit projection whenever ANY mapped or
            # dropped column exists. A drop-only table (never renamed)
            # has mapping == {} but its data files still carry the
            # dropped physical column; without the projection the
            # reader yields batches with an extra column and pyspark
            # fails the DATA_SOURCE_RETURN_SCHEMA_MISMATCH count check.
            from pyspark.sql.pandas.types import to_arrow_type
            from pyspark.sql.types import StructType
            base = StructType.fromJson(m["schema"])
            fields = [(mapping.get(f.name, f.name), f.name,
                       to_arrow_type(f.dataType)) for f in base.fields]
        return AcidTableReader([f"{root}/{p}" for p in keep], dv_dir,
                               fields)


def _walk_props(path, version: int | None = None) -> dict:
    """Table properties in force at ``version`` (default: the newest
    manifest) — SparkSession-free twin of AcidTable._props: walk back
    to the nearest manifest carrying a props key — they are inherited
    forward, so this is the evolved value, not v0's."""
    import json
    from pathlib import Path

    from ..acid import latest_committed_version

    manifests = Path(path) / "manifests"
    latest = (latest_committed_version(manifests)
              if version is None else int(version))
    vs = range(latest, -1, -1) if latest is not None else ()
    for v in vs:
        props = json.loads(
            (manifests / f"v{v}.json").read_text()).get("props")
        if props is not None:
            # protocol gate (Delta readerFeatures): a planner on a
            # build lacking a declared reader feature must refuse,
            # never misread — same rule as AcidTable._manifest
            from ..acid import check_reader_features
            check_reader_features(props)
            return props
    return {}


class AcidSinkMessage(WriterCommitMessage):
    def __init__(self, files: list, stages: list,
                 parts: list | None = None):
        self.files, self.stages = files, stages
        #: per-file partition tuple ({col: val} or None), aligned with
        #: ``files`` — lets the driver-side commit record partition
        #: metadata without reopening the staged files
        self.parts = parts or [None] * len(files)


class AcidStreamWriter(DataSourceStreamWriter):
    """Exactly-once AcidTable sink — the data plane is pure executor
    parquet IO, the control plane one optimistic manifest swap:

    * ``write(iterator)`` (executor, per partition): batch the rows
      into one staged parquet file under ``data/stage-*`` via pyarrow.
    * ``commit(messages, batchId)`` (driver): if the manifest's txn map
      already fences (appId, batchId) → clean staging and return (the
      replayed-batch no-op); else build ``data/commit-*`` by
      HARDLINKING the parent snapshot's files plus the staged files
      (metadata ops, no data copied — the local-FS stand-in for a
      manifest-list format, where this step is pure metadata too),
      harvest footer stats, and O_EXCL-create the next manifest.
      Conflicts with concurrent writers retry against the winner, same
      as every AcidTable commit. On CDF tables the staged rows are also
      recorded as insert change files.
    * ``abort``: remove staged files.
    """

    def __init__(self, path: str, pa_fields, app_id: str,
                 mapping: dict | None = None):
        self.path = path
        self.pa_fields = pa_fields
        self.app_id = app_id
        #: logical->physical map captured at stream start; staged
        #: parquet writes physical names, everything else stays logical
        self.mapping = dict(mapping or {})
        self.phys_names = [self.mapping.get(n, n)
                           for n, _ in pa_fields]
        self._pcols: list | None = None      # lazy v0-props read

    def _partition_cols(self) -> list:
        if self._pcols is None:
            self._pcols = list(
                (_walk_props(self.path) or {}).get("partition_by")
                or [])
        return self._pcols

    def write(self, iterator):
        import uuid as _uuid
        from pathlib import Path

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return AcidSinkMessage([], [])
        stage = Path(self.path) / "data" / f"stage-{_uuid.uuid4().hex}"
        stage.mkdir(parents=True, exist_ok=True)
        names = [n for n, _ in self.pa_fields]

        def write_group(group_rows):
            cols = list(zip(*group_rows))
            arrays = [pa.array(list(c), type=t)
                      for c, (_, t) in zip(cols, self.pa_fields)]
            f = stage / f"sink-{_uuid.uuid4().hex}.parquet"
            # data files ALWAYS hold the frozen physical names
            pq.write_table(
                pa.Table.from_arrays(arrays, self.phys_names), f)
            return str(f)

        pcols = self._partition_cols()
        if not pcols:
            return AcidSinkMessage([write_group(rows)], [str(stage)])
        # partitioned table: split this task's rows by partition tuple
        # so every staged file keeps the one-tuple-per-file invariant
        # (and with it, partition pruning over sink-written data)
        idx = [names.index(c) for c in pcols]
        groups: dict = {}
        for r in rows:
            groups.setdefault(tuple(r[i] for i in idx), []).append(r)
        files, parts = [], []
        for key, grp in groups.items():
            files.append(write_group(grp))
            parts.append(dict(zip(pcols, key)))
        return AcidSinkMessage(files, [str(stage)], parts)

    def _cleanup(self, messages) -> None:
        import shutil
        for m in messages:
            for s in getattr(m, "stages", []):
                shutil.rmtree(s, ignore_errors=True)

    def _check_staged_constraints(self, cons: dict, staged: list) -> None:
        """Validate the staged rows against the table's CHECK
        constraints BEFORE the manifest exists (the AcidTable commit
        contract: appends only need the NEW rows checked). No
        SparkSession exists in the sink path, so the staged parquet is
        probed with DuckDB — the CHECK grammar this engine accepts is
        plain ANSI comparisons, which both dialects parse identically;
        an expression DuckDB cannot evaluate refuses the commit loudly
        rather than skipping enforcement."""
        import duckdb

        files = ", ".join(f"'{p}'" for p in staged)
        # mapped tables: staged files carry physical names, CHECK
        # expressions bind logical ones — alias in the probe
        sel = ", ".join(
            f'"{p}" AS "{l}"' for (l, _t), p
            in zip(self.pa_fields, self.phys_names))
        for name, expr in cons.items():
            try:
                bad = duckdb.sql(
                    f"SELECT * FROM (SELECT {sel} "
                    f"FROM read_parquet([{files}])) "
                    f"WHERE NOT ({expr}) OR ({expr}) IS NULL "
                    f"LIMIT 1").fetchall()
            except Exception as e:             # noqa: BLE001
                raise RuntimeError(
                    f"acidtable sink cannot validate CHECK constraint "
                    f"{name!r} ({expr}) over the staged batch: {e}; "
                    f"commit refused — enforcement is never skipped"
                ) from e
            if bad:
                raise RuntimeError(
                    f"acidtable sink: constraint {name!r} ({expr}) "
                    f"violated by streamed row {bad[0]}; commit refused")

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        import shutil
        import uuid as _uuid
        from pathlib import Path

        from ..acid import collect_file_stats, collect_parquet_stats

        root = Path(self.path)
        # identity-epoch fence (Delta schema-tracking): the sink may
        # stream INTO a column-mapped table — staged files write the
        # physical names captured at start — but if the identity map
        # changed mid-stream (RENAME/DROP/re-ADD COLUMN), those
        # physicals may be stale; refuse and ask for a restart, which
        # re-resolves the mapping
        cur_mapping = _walk_props(root).get("column_mapping") or {}
        if cur_mapping != self.mapping:
            raise RuntimeError(
                f"acidtable sink: column-mapping identity of "
                f"{self.path} changed since this stream started "
                f"({self.mapping} -> {cur_mapping}); restart the "
                f"streaming query to pick up the new schema")
        manifests = root / "manifests"
        staged, staged_parts = [], []
        for msg in messages:
            fs = getattr(msg, "files", [])
            ps = getattr(msg, "parts", None) or [None] * len(fs)
            staged.extend(fs)
            staged_parts.extend(ps)
        try:
            from ..acid import latest_committed_version
            from ..storage import crash_point
            for attempt in range(20):
                v = latest_committed_version(manifests)
                m = json.loads((manifests / f"v{v}.json").read_text())
                txns = m.get("txns") or {}
                if batchId <= txns.get(self.app_id, -1):
                    return                    # replayed batch: fenced
                if attempt:
                    # kill window INSIDE the CAS retry loop: a writer
                    # that lost a race, re-read the winner's parent,
                    # and dies before its own create_exclusive — the
                    # winner's commit must stand untouched and the
                    # crashed batch must stay unfenced (redeliverable)
                    crash_point("sink_retry_after_parent_reread")
                table_cols = [f["name"] for f in m["schema"]["fields"]]
                if table_cols != [n for n, _ in self.pa_fields]:
                    raise RuntimeError(
                        f"acidtable sink schema {self.pa_fields} does "
                        f"not match table columns {table_cols}")
                # re-check the identity epoch INSIDE the CAS loop: a
                # drop+re-add pair landing mid-retry restores the
                # LOGICAL names (so the check above passes) while
                # minting a fresh physical identity — committing the
                # staged files' stale physicals would make the re-added
                # column read NULL for these rows. The CAS parent m is
                # already in hand and props ride every manifest once
                # set, so the common case costs ZERO extra reads; only
                # a props-less legacy chain pays the walk.
                live_mapping = ((m["props"] or {}) if "props" in m
                                else _walk_props(root)
                                ).get("column_mapping") or {}
                if live_mapping != self.mapping:
                    raise RuntimeError(
                        f"acidtable sink: column-mapping identity of "
                        f"{self.path} changed since this stream "
                        f"started ({self.mapping} -> {live_mapping}); "
                        f"restart the streaming query to pick up the "
                        f"new schema")
                cons = m.get("constraints") or {}
                if cons and staged:
                    self._check_staged_constraints(cons, staged)
                new_rel = f"data/commit-{_uuid.uuid4().hex}"
                dest = root / new_rel
                dest.mkdir(parents=True)
                # the commit dir holds ONLY this batch's files (linked
                # out of the stage dir — the stage is removed after
                # commit); the parent snapshot is carried purely by
                # MANIFEST REFERENCE, so the commit is O(batch) in IO
                # and metadata regardless of table file count — the
                # manifest-list shape (no per-table-file syscalls,
                # object-store-compatible)
                from ..storage import crash_point, get_store
                for fp in staged:
                    # this batch (hardlink or copy per the FileStore)
                    get_store().link_or_copy(fp, dest / Path(fp).name)
                crash_point("sink_after_link")
                # O(delta) stats, mirroring _write_data_linked: footers
                # of the STAGED files only; carried parent entries are
                # re-anchored to root-relative paths (pure list concat)
                new_stats = collect_file_stats(
                    dest / Path(fp).name for fp in staged)
                inv = {p: l for l, p in self.mapping.items()}
                # bloom sidecars for THIS batch's files (bloom_by
                # tables): O(batch) column reads in this process, same
                # wire format as AcidTable._attach_blooms — without
                # them every sink-born file is conservatively kept by
                # point probes forever
                blm = self._stage_blooms(
                    m, dest, new_rel, [Path(fp).name for fp in staged])
                for e, part in zip(new_stats, staged_parts):
                    if inv and e.get("stats"):
                        # manifest stats stay LOGICAL (pruners never
                        # translate) — same rule as _destat_entries
                        e["stats"] = {inv.get(k, k): v
                                      for k, v in e["stats"].items()}
                    if part is not None:   # partitioned table: the
                        e["partition"] = part  # tuple rides the entry
                    if e["path"] in blm:
                        e["bloom"] = blm[e["path"]]
                    e["path"] = f'{new_rel}/{e["path"]}'
                from ..acid import (encode_manifest_files,
                                    resolve_manifest_files)
                carried = resolve_manifest_files(root, m)
                legacy_parent = carried is None
                if legacy_parent:      # legacy parent: one-time harvest
                    carried = [
                        {**f, "path": f'{m["data"]}/{f["path"]}'}
                        for f in collect_parquet_stats(root / m["data"])]
                files = carried + new_stats
                import time
                manifest = {
                    "version": v + 1, "data": new_rel,
                    "schema": m["schema"], "op": "stream_sink",
                    "parent": v, "ts": time.time(),
                    "txns": {**txns, self.app_id: batchId},
                    "txn": f"{self.app_id}#{batchId}",
                }
                # O(delta) encoding vs the parent (explicit when the
                # parent was legacy-harvested), same rule as AcidTable
                encode_manifest_files(
                    manifest, files,
                    None if legacy_parent else v,
                    None if legacy_parent else carried)
                # table-property composability: linked files keep their
                # names, so the parent's deletion vector stays valid —
                # carried, not discarded (dropping it would RESURRECT
                # MOR-deleted rows); constraints ride every manifest
                if "dv" in m:
                    manifest["dv"] = m["dv"]
                    manifest["dv_rows"] = m.get("dv_rows", 0)
                if cons:
                    manifest["constraints"] = cons
                if m.get("props") is not None:   # inherit forward
                    manifest["props"] = m["props"]
                if _walk_props(root).get("cdf"):
                    if not self.mapping:
                        # CDF-by-reference (same rule as AcidTable's
                        # linked append): the staged files ARE the
                        # change set — no pyarrow rewrite of the batch.
                        # Gated to mapping-free tables: data files hold
                        # physical names, the feed serves logical.
                        manifest["changes_ref"] = [e["path"]
                                                   for e in new_stats]
                    else:
                        ch_rel = f"data/changes-{_uuid.uuid4().hex}"
                        self._record_changes(root, ch_rel, staged)
                        manifest["changes"] = ch_rel
                from ..storage import crash_point
                crash_point("sink_before_fence")
                if get_store().create_exclusive(
                        manifests / f"v{v + 1}.json",
                        json.dumps(manifest)):
                    crash_point("sink_after_fence")
                    from ..acid import (CHECKPOINT_EVERY,
                                        _files_cache_put,
                                        write_files_checkpoint)
                    _files_cache_put(
                        (str(root), v + 1, manifest["ts"]), files)
                    if (v + 1) % CHECKPOINT_EVERY == 0:
                        write_files_checkpoint(root, v + 1, files)
                    try:                     # best-effort O(1) hint
                        tmp = manifests / f"._latest.{_uuid.uuid4().hex[:8]}"
                        tmp.write_text(str(v + 1))
                        get_store().atomic_replace(
                            tmp, manifests / "_latest")
                    except OSError:
                        pass
                    # opt-in auto-compaction (Delta autoCompact): the
                    # batch is DURABLY committed above, so maintenance
                    # is best-effort — a failed/raced compaction must
                    # never fail the stream. No-op unless the table
                    # property is set AND enough small files piled up
                    # (pure manifest reads).
                    try:
                        self._maybe_autocompact(root, manifests)
                    except (OSError, ValueError, KeyError):
                        pass
                    # opt-in retention hygiene (set_autovacuum):
                    # vacuum is pure manifest/filesystem work — it
                    # only uses a SparkSession to fan out unlinks on
                    # huge plans and skips that when spark is None —
                    # so the SparkSession-free writer process can run
                    # it directly. Same best-effort contract: a
                    # failed vacuum never fails the stream.
                    try:
                        from ..acid import AcidTable
                        AcidTable(None, root).maybe_autovacuum()
                    except (OSError, ValueError, KeyError):
                        pass
                    return
                else:                         # lost the race: retry on top
                    shutil.rmtree(dest, ignore_errors=True)
                    if "changes" in manifest:
                        shutil.rmtree(root / manifest["changes"],
                                      ignore_errors=True)
            raise RuntimeError(
                f"acidtable sink gave up after 20 conflicted commits "
                f"at {self.path}")
        finally:
            self._cleanup(messages)

    def _stage_blooms(self, m: dict, dest, new_rel: str,
                      names: list[str]) -> dict:
        """Per-file bloom sidecars for a batch's staged files on a
        ``bloom_by`` table — the SparkSession-free twin of
        ``AcidTable._attach_blooms`` (same sidecar wire format, keyed
        by LOGICAL column): one O(batch) column read per (file, col)
        in this process. Unreadable/unhashable columns are skipped —
        the reader conservatively keeps sidecar-less files."""
        import pyarrow.parquet as pq

        root = dest.parent.parent
        props = ((m["props"] or {}) if "props" in m
                 else _walk_props(root)) or {}
        cols = list(props.get("bloom_by") or [])
        if not cols:
            return {}
        out: dict = {}
        for name in names:
            for logical in cols:
                physical = self.mapping.get(logical, logical)
                try:
                    col = pq.read_table(
                        str(dest / name),
                        columns=[physical]).column(physical)
                except (OSError, KeyError):
                    continue
                vals = {v for v in col.to_pylist() if v is not None}
                rel = _write_bloom_sidecar(vals, name, logical,
                                           dest, new_rel)
                if rel is not None:
                    out.setdefault(name, {})[logical] = rel
        return out

    def _maybe_autocompact(self, root, manifests) -> None:
        """Post-commit AUTO-compaction (Delta autoCompact's
        in-the-writer placement), SparkSession-FREE: the Python
        DataSource writer commits from a plain Python process, so the
        fold is a pyarrow concat of the small files — they are small
        by definition (that's the trigger), which is exactly why a
        cluster job would be the wrong tool — committed through the
        same manifest CAS as every other version. One attempt, best
        effort: losing the race just means the next batch retries.

        Scope guards: tables with a live deletion vector are skipped
        (materializing DV shares needs the Spark-side
        ``compact_small``); partitioned tables compact per partition
        tuple (the one-tuple-per-file invariant holds); bytes folded
        per invocation are CAPPED (``_FOLD_CAP_BYTES``, largest
        groups first) so a deep backlog never spikes this process's
        memory — the remainder folds on later batches; rewritten
        files get their bloom sidecars REBUILT from the in-hand
        pyarrow table (bloom_by prop), so point-probe pruning
        survives sink-side compaction; CDF tables record an empty
        change set (compaction is row-preserving, the
        ``_NO_CHANGE_OPS`` contract), so table streams skip it
        silently."""
        import json
        import time
        import uuid as _uuid
        from pathlib import Path

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..acid import (collect_file_stats, encode_manifest_files,
                            latest_committed_version,
                            resolve_manifest_files)
        from ..storage import get_store

        v = latest_committed_version(manifests)
        m = json.loads((manifests / f"v{v}.json").read_text())
        ac = (m.get("props") or {}).get("autocompact")
        if not ac or "dv" in m:
            return
        files = resolve_manifest_files(root, m)
        if files is None:
            return                          # legacy chain: skip
        small = [f for f in files
                 if f.get("bytes", 0) < ac["max_bytes"]]
        if len(small) < ac["min_files"]:
            return
        groups: dict = {}
        for f in small:
            key = tuple(sorted((f.get("partition") or {}).items()))
            groups.setdefault(key, []).append(f)
        groups = {k: g for k, g in groups.items() if len(g) >= 2}
        if not groups:
            return
        # BYTE CAP (largest units first): this fold runs on the
        # writer's plain Python process, so bytes concatenated per
        # invocation must be bounded by policy, not by backlog size.
        # A group LARGER than the cap is CHUNKED into <=cap fold
        # units first — an unpartitioned table is exactly one group,
        # so skipping oversized groups alone would make the cap a
        # no-op there (the r15 review's finding). The remainder folds
        # on later batches.
        fold_cap = int(ac.get("max_fold_bytes", _FOLD_CAP_BYTES))
        units: list = []      # (partition key, files chunk <= cap)
        for key, grp in groups.items():
            grp = sorted(grp, key=lambda f: f.get("bytes", 0))
            cur: list = []
            cur_sz = 0
            for f in grp:
                if (len(cur) >= 2
                        and cur_sz + f.get("bytes", 0) > fold_cap):
                    units.append((key, cur))
                    cur, cur_sz = [], 0
                cur.append(f)
                cur_sz += f.get("bytes", 0)
            if len(cur) >= 2:
                units.append((key, cur))
        units.sort(key=lambda ku: sum(f.get("bytes", 0)
                                      for f in ku[1]), reverse=True)
        budget, picked = fold_cap, []
        for key, grp in units:
            sz = sum(f.get("bytes", 0) for f in grp)
            if picked and sz > budget:
                continue          # always fold >=1 unit (progress)
            picked.append((key, grp))
            budget -= sz
        bloom_cols = list((m.get("props") or {}).get("bloom_by") or [])
        new_rel = f"data/commit-{_uuid.uuid4().hex}"
        dest = root / new_rel
        dest.mkdir(parents=True)
        drop: set = set()
        written: list[tuple[str, dict | None]] = []
        blooms: dict[str, dict] = {}    # data-file name -> {col: rel}
        for key, grp in picked:
            tbl = pa.concat_tables(
                [pq.read_table(str(root / f["path"])) for f in grp])
            out = dest / f"compact-{_uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, str(out))
            # bloom sidecars rebuilt from the table already in hand
            # (same wire format as AcidTable._attach_blooms, keyed by
            # LOGICAL column) — point-probe pruning survives the fold
            for logical in bloom_cols:
                physical = self.mapping.get(logical, logical)
                if physical not in tbl.column_names:
                    continue
                vals = {v for v in tbl.column(physical).to_pylist()
                        if v is not None}
                rel = _write_bloom_sidecar(vals, out.name, logical,
                                           dest, new_rel)
                if rel is not None:
                    blooms.setdefault(out.name, {})[logical] = rel
            drop.update(f["path"] for f in grp)
            written.append((str(out), dict(key) or None))
        new_stats = collect_file_stats(p for p, _ in written)
        inv = {p: l for l, p in self.mapping.items()}
        for e, (_, part) in zip(new_stats, written):
            if inv and e.get("stats"):      # stats stay LOGICAL
                e["stats"] = {inv.get(k, k): v2
                              for k, v2 in e["stats"].items()}
            if part is not None:
                e["partition"] = part
            if e["path"] in blooms:
                e["bloom"] = blooms[e["path"]]
            e["path"] = f'{new_rel}/{e["path"]}'
        keep = [f for f in files if f["path"] not in drop]
        manifest = {
            "version": v + 1, "data": new_rel, "schema": m["schema"],
            "op": "compact_small", "parent": v, "ts": time.time(),
            "txns": m.get("txns") or {},    # writer fences carried
        }
        encode_manifest_files(manifest, keep + new_stats, v, files)
        for k in ("constraints", "props"):
            if m.get(k) is not None:
                manifest[k] = m[k]
        if (m.get("props") or {}).get("cdf"):
            # row-preserving op: record an EMPTY change set BY
            # REFERENCE (changes_ref=[]) — the feed serves this version
            # without a snapshot diff and without writing an empty
            # parquet file
            manifest["changes_ref"] = []
        if not get_store().create_exclusive(
                manifests / f"v{v + 1}.json", json.dumps(manifest)):
            # lost the pointer race: abandon (next batch retries)
            import shutil as _sh
            _sh.rmtree(dest, ignore_errors=True)
            if "changes" in manifest:
                _sh.rmtree(root / manifest["changes"],
                           ignore_errors=True)
            return
        try:                                 # best-effort O(1) hint
            tmp = manifests / f"._latest.{_uuid.uuid4().hex[:8]}"
            tmp.write_text(str(v + 1))
            get_store().atomic_replace(tmp, manifests / "_latest")
        except OSError:
            pass

    def _record_changes(self, root, ch_rel: str, staged: list) -> None:
        """CDF tables: the appended rows ARE the delta — rewrite each
        staged file with a constant _change_type='insert' column into
        the commit's change dir."""
        from pathlib import Path

        import pyarrow as pa
        import pyarrow.parquet as pq

        chdir = root / ch_rel
        chdir.mkdir(parents=True)
        logical = [n for n, _ in self.pa_fields]
        for fp in staged:
            tbl = pq.read_table(fp)
            if self.mapping:      # physical names back to logical —
                tbl = tbl.rename_columns(logical)  # CDF stays logical
            tbl = tbl.append_column(
                "_change_type",
                pa.array(["insert"] * tbl.num_rows, pa.string()))
            pq.write_table(tbl, chdir / Path(fp).name)

    def abort(self, messages, batchId: int) -> None:
        self._cleanup(messages)


class AcidTableReader(DataSourceReader):
    def __init__(self, paths: list[str], dv_dir: str | None = None,
                 fields=None):
        self.paths = paths
        self.dv_dir = dv_dir
        self.fields = fields

    def partitions(self):
        return [AcidFilePartition(p, self.dv_dir, self.fields)
                for p in self.paths]

    @staticmethod
    def _project(b, fields):
        """Column-mapping projection executor-side: physical parquet
        columns out, LOGICAL declared columns in (missing physical =
        a column added after this file was written: NULL)."""
        import pyarrow as pa
        have = {n: i for i, n in enumerate(b.schema.names)}
        arrays, names = [], []
        for phys, logical, patype in fields:
            names.append(logical)
            arrays.append(b.column(have[phys]).cast(patype)
                          if phys in have
                          else pa.nulls(b.num_rows, patype))
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def read(self, partition: AcidFilePartition):
        import pyarrow.parquet as pq
        if partition.dv_dir is None:
            # Arrow batches straight through — no per-row Python
            for b in pq.ParquetFile(partition.path).iter_batches():
                yield (self._project(b, partition.fields)
                       if partition.fields else b)
            return
        # deletion-vector table: each split loads ONLY its own file's
        # dead positions (predicate-pushed parquet read of the small
        # sidecar) and drops them with one vectorized mask per batch —
        # the executor-side twin of AcidTable._apply_dv
        import os

        import numpy as np
        import pyarrow as pa

        name = os.path.basename(partition.path)
        dead = pq.read_table(
            partition.dv_dir, filters=[("file", "=", name)],
            columns=["pos"]).column("pos").to_numpy()
        off = 0
        for b in pq.ParquetFile(partition.path).iter_batches():
            n = b.num_rows
            if len(dead):
                mask = ~np.isin(np.arange(off, off + n), dead)
                if not mask.all():
                    b = b.filter(pa.array(mask))
            off += n
            yield (self._project(b, partition.fields)
                   if partition.fields else b)


# --------------------------------------------- Kafka-contract WAL source
#
# The Kafka ingestion CONTRACT — named topic partitions, monotone
# per-partition offsets, earliest replay (auto.offset.reset=smallest,
# reference StreamingApp.scala:309), offset-committed resume,
# partition-PARALLEL reads (one executor task per topic partition per
# micro-batch; the reference consumes its chunk topic the same way,
# StreamingApp.scala:309-318) — implemented as a custom streaming
# connector over an append-only on-disk log. The real `readStream.format("kafka")` wiring
# exists (streaming/kafka.py, gated on the connector jar); this source
# proves the engine drives the same semantics through Spark 4's
# DataSourceStreamReader: offsets are {partition: row_count} dicts
# exactly like Kafka's {TopicPartition: offset} map, `partitions()`
# plans one split per topic partition per batch, and `read()` runs on
# executors slicing only its [start, end) rows via parquet footers.

class WalogSlice(InputPartition):
    def __init__(self, part_id: int, pdir: str, start: int, end: int):
        self.part_id, self.pdir = part_id, pdir
        self.start, self.end = start, end


class WalogDataSource(DataSource):
    """`spark.readStream.format("walog").option("path", root)` — root
    holds `p{i}/segment-*.parquet` append-only topic partitions.

    Option ``maxSegmentsPerTrigger`` (default 0 = unlimited) is the
    source's READ LIMIT — Kafka's maxOffsetsPerTrigger analog: each
    micro-batch advances every partition at most that many segment
    boundaries past the last COMMITTED offset, so a backlog drains as a
    sequence of bounded micro-batches instead of one giant batch."""

    @classmethod
    def name(cls) -> str:
        return "walog"

    def schema(self) -> str:
        return ("part int, offset long, event_id long, user_id long, "
                "event_type string")

    def streamReader(self, schema):
        return WalogStreamReader(
            self.options["path"],
            int(self.options.get("maxsegmentspertrigger", "0")))


class WalogStreamReader(DataSourceStreamReader):
    """Read-limit design note: the Python streaming API gives
    ``latestOffset()`` no start-offset argument (unlike DSv2 Scala's
    SupportsAdmissionControl), and the engine may call it BEFORE
    ``initialOffset()`` on a fresh stream — so a limiter cannot trust
    any single state source. Two cooperating pieces make the limit both
    deterministic and replay-safe:

    * ``latestOffset`` steps at most ``max_seg`` segment boundaries past
      the elementwise max of (last commit, learned floor, previous
      offer). Folding the previous OFFER in means every poll that finds
      backlog advances and yields a batch — one micro-batch per segment
      window, no reliance on commit-callback timing.
    * ``partitions`` learns a monotone per-partition FLOOR (max of every
      start/end the engine has ever planned) and clips slices to it —
      if a capped offer ever lands behind the engine's true position
      (possible on a checkpointed restart, where the first offer steps
      from zero), the stale range serves ZERO rows instead of
      re-emitting data. Offsets self-heal forward; no duplication, no
      livelock."""

    def __init__(self, path: str, max_segments_per_trigger: int = 0):
        self.path = path
        self.max_seg = max_segments_per_trigger     # 0 = unlimited
        self._committed: dict | None = None         # last commit() offsets
        self._offered: dict = {}                    # hwm of our own offers
        self._floor: dict = {}                      # hwm of planned ranges

    def _pdirs(self):
        from pathlib import Path
        return sorted(Path(self.path).glob("p[0-9]*"))

    def initialOffset(self) -> dict:
        off = {p.name: 0 for p in self._pdirs()}    # earliest replay
        self._committed = dict(off)
        return off

    def _segment_bounds(self) -> dict:
        """{partition: [cumulative row count at each segment end]} — from
        parquet footers only, no data IO."""
        import pyarrow.parquet as pq
        out = {}
        for p in self._pdirs():
            acc, cum = 0, []
            for f in sorted(p.glob("segment-*.parquet")):
                acc += pq.ParquetFile(f).metadata.num_rows
                cum.append(acc)
            out[p.name] = cum
        return out

    def latestOffset(self) -> dict:
        bounds = self._segment_bounds()
        full = {k: (v[-1] if v else 0) for k, v in bounds.items()}
        if not self.max_seg:
            return full
        committed = self._committed or {}
        out = {}
        for k, cum in bounds.items():
            cur = max(committed.get(k, 0), self._floor.get(k, 0),
                      self._offered.get(k, 0))
            ahead = [b for b in cum if b > cur][:self.max_seg]
            out[k] = ahead[-1] if ahead else cur
        self._offered = {k: max(self._offered.get(k, 0), v)
                         for k, v in out.items()}
        return out

    def partitions(self, start: dict, end: dict):
        out = []
        for p in self._pdirs():
            floor = self._floor.get(p.name, 0)
            lo = max(start.get(p.name, 0), floor)   # never re-serve rows
            hi = end.get(p.name, 0)
            if hi > lo:
                out.append(WalogSlice(int(p.name[1:]), str(p), lo, hi))
        for off in (start, end):                    # learn the floor
            for k, v in off.items():
                self._floor[k] = max(self._floor.get(k, 0), v)
        return out or [WalogSlice(-1, self.path, 0, 0)]  # no-data batch

    def read(self, sl: WalogSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pathlib import Path

        if sl.part_id < 0:
            return
        pos = 0
        for f in sorted(Path(sl.pdir).glob("segment-*.parquet")):
            n = pq.ParquetFile(f).metadata.num_rows
            seg_lo, seg_hi = pos, pos + n
            pos = seg_hi
            if seg_hi <= sl.start:
                continue
            if seg_lo >= sl.end:
                break
            tbl = pq.read_table(f)
            lo = max(sl.start, seg_lo) - seg_lo
            hi = min(sl.end, seg_hi) - seg_lo
            sliced = tbl.slice(lo, hi - lo)
            offs = pa.array(range(seg_lo + lo, seg_lo + hi), pa.int64())
            part = pa.array([sl.part_id] * (hi - lo), pa.int32())
            yield pa.RecordBatch.from_arrays(
                [part, offs] + [sliced.column(c).combine_chunks()
                                for c in ("event_id", "user_id",
                                          "event_type")],
                names=["part", "offset", "event_id", "user_id",
                       "event_type"])

    def commit(self, end: dict) -> None:
        # durable offsets live in the query checkpoint, like Kafka's;
        # the reader only advances its read-limit base (monotone)
        prev = self._committed or {}
        self._committed = {k: max(prev.get(k, 0), v) for k, v in end.items()}


def _drain_incremental(writer) -> tuple[int, object]:
    """Start a default-trigger (continuous micro-batch) run, block until
    the source reports no more available data, and return
    (n_data_batches, query). This is the REAL multi-batch engine path:
    `trigger(availableNow=True)` on a Python DataSource falls back to
    single-batch execution (MicroBatchExecution WARNs and collapses the
    drain), so a read-limited source must be driven by the default
    trigger + `processAllAvailable()` to exercise one micro-batch per
    limit window. n_data_batches counts batches that carried rows —
    the proof the drain was genuinely incremental."""
    import time

    q = writer.start()
    q.processAllAvailable()

    def snap():
        tot = nb = 0
        for p in q.recentProgress:
            rows = p["numInputRows"] if isinstance(p, dict) \
                else getattr(p, "numInputRows", 0)
            tot += rows
            nb += 1 if rows else 0
        return tot, nb
    # progress events post asynchronously after the data is committed;
    # wait until the accounted totals go stable before counting
    prev, deadline = snap(), time.time() + 10
    while time.time() < deadline:
        time.sleep(0.2)
        cur = snap()
        if cur == prev:
            break
        prev = cur
    q.stop()
    return prev[1], q


WALOG_PARTS = 4


def _stage_walog(sf_dir: str, root) -> None:
    """Produce the topic: {WALOG_PARTS} partitions keyed user_id %
    {WALOG_PARTS}, two segments each (event_id parity — two produce
    rounds), rows sorted by event_id within a segment. Deterministic, so
    every (partition, offset) assignment is oracle-computable."""
    from pathlib import Path

    import duckdb

    root = Path(root)
    if (root / "_STAGED").exists():
        return
    con = duckdb.connect()
    for part in range(WALOG_PARTS):
        pdir = root / f"p{part}"
        pdir.mkdir(parents=True, exist_ok=True)
        for seg in range(2):
            con.execute(f"""
                COPY (SELECT event_id, user_id, event_type
                      FROM read_parquet('{sf_dir}/events.parquet')
                      WHERE user_id % {WALOG_PARTS} = {part}
                        AND event_id % 2 = {seg}
                      ORDER BY event_id)
                TO '{pdir}/segment-00{seg}.parquet' (FORMAT PARQUET)""")
    (root / "_STAGED").touch()


def kafka_mock_stream(spark: SparkSession, sf_dir: str, scratch) -> DataFrame:
    """Drain the walog topic from earliest and return every record WITH
    its (partition, offset) assignment — the full consumer contract,
    value-checked: the oracle recomputes each record's partition
    (user_id % {WALOG_PARTS}) and offset (rank by segment round, then
    event_id) from the staging rule. The drain is read-limited
    (maxSegmentsPerTrigger=1) and driven by the default trigger, so the
    two-segment backlog lands as exactly TWO micro-batches; the emitted
    `n_batches` column pins that in the oracle — a single-batch
    fallback would turn the whole key red, not silently pass.
    Restart/resume semantics are pinned in tests/test_pysource.py (a
    second drain after a third produce round reads ONLY the new
    segment, offsets continuing)."""
    import uuid as _uuid

    root = scratch / f"walog_{sf_dir.rstrip('/').rsplit('sf', 1)[-1]}"
    _stage_walog(sf_dir, root)
    spark.dataSource.register(WalogDataSource)
    qname = f"walog_{_uuid.uuid4().hex[:8]}"
    n_batches, _ = _drain_incremental(
        spark.readStream.format("walog").option("path", str(root))
        .option("maxSegmentsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname))
    return spark.table(qname).withColumn("n_batches", F.lit(n_batches))


KAFKA_MOCK_ORACLE = f"""
SELECT CAST(user_id % {WALOG_PARTS} AS INT) AS part,
       row_number() OVER (PARTITION BY user_id % {WALOG_PARTS}
                          ORDER BY event_id % 2, event_id) - 1 AS offset,
       event_id, user_id, event_type, 2 AS n_batches
FROM events
"""


# ------------------------------------------- AcidTable CDF as a STREAM
#
# The change feed exposed as a STREAMING source: offsets ARE table
# versions, each micro-batch emits the row-level +/- deltas committed
# since the last offset — `spark.readStream.format("acidtable-cdf")`
# is Delta's readChangeFeed re-expressed through Spark 4's Python
# streaming DataSource seam. This uses SimpleDataSourceStreamReader
# (driver-side reads — right for a low-rate control table); the
# partition-parallel variant EXISTS above (`acidtable-cdf-parallel`,
# AcidCdfParallelStreamDataSource): one split per recorded change file,
# same version offsets, executors stream the Arrow batches.

class AcidCdfStreamDataSource(DataSource):
    """Options: ``path`` (table root), ``startingVersion`` (default 0:
    the first batch replays history from v0), ``maxVersionsPerTrigger``
    (default 0 = unlimited) — the read limit: each micro-batch covers at
    most that many committed versions, so a long history drains as one
    micro-batch PER version window (Delta's maxFilesPerTrigger analog
    at version granularity).

    Serves RECORDED change files only (enable_cdf tables, or
    ``AcidTable.backfill_changes()`` for historical versions); a
    version without them fails the stream loudly — there is no
    driver-side snapshot-diff fallback."""

    @classmethod
    def name(cls) -> str:
        return "acidtable-cdf"

    def schema(self):
        import json
        from pathlib import Path

        from pyspark.sql.types import (IntegerType, StringType, StructField,
                                       StructType)
        root = Path(self.options["path"])
        from ..acid import latest_committed_version
        m = json.loads(
            (root / "manifests" /
             f"v{latest_committed_version(root / 'manifests')}.json"
             ).read_text())
        base = StructType.fromJson(m["schema"])
        return StructType(list(base.fields) + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", IntegerType())])

    def simpleStreamReader(self, schema):
        # schema-tracking stream over mapped tables: the stream serves
        # the CURRENT logical schema; each field carries its frozen
        # PHYSICAL identity so every epoch's recorded change files
        # translate onto it (renames collapse, re-added columns read
        # NULL for pre-add epochs) — Delta's schemaTrackingLocation
        # semantics with the table's own map as the tracking state
        mapping = (_walk_props(self.options["path"])
                   .get("column_mapping") or {})
        base_fields = [(f.name, mapping.get(f.name, f.name))
                       for f in schema.fields
                       if f.name not in ("_change_type",
                                         "_commit_version")]
        return AcidCdfStreamReader(
            self.options["path"], base_fields,
            int(self.options.get("startingversion", "0")),
            int(self.options.get("maxversionspertrigger", "0")))


class AcidCdfStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, path: str, base_fields: list,
                 starting_version: int, max_versions: int = 0):
        self.path = path
        #: [(logical, physical)] — declared output order and the
        #: frozen identity each column matches change files by
        self.base_fields = ([(c, c) for c in base_fields]
                            if base_fields and
                            isinstance(base_fields[0], str)
                            else base_fields)
        self.start_version = starting_version
        self.max_versions = max_versions          # 0 = unlimited

    def _latest(self) -> int:
        from pathlib import Path

        from ..acid import latest_committed_version
        return latest_committed_version(Path(self.path) / "manifests")

    def _recorded_changes(self, version: int):
        """Rows from the commit's RECORDED change files (enable_cdf
        tables), projected to the declared column order — or None when
        this version has none and must be snapshot-diffed."""
        import json
        from pathlib import Path

        import pyarrow.parquet as pq
        m = json.loads((Path(self.path) / "manifests"
                        / f"v{version}.json").read_text())
        if "changes_ref" in m:
            # CDF-by-reference: the commit's added data files ARE the
            # change set, every row an insert ([] = recorded empty)
            files = [Path(self.path) / r for r in m["changes_ref"]]
            if not all(f.exists() for f in files):
                return None            # vacuumed past change retention
            const_ct = "insert"
        elif "changes" not in m:
            return None
        else:
            chdir = Path(self.path) / m["changes"]
            if not chdir.is_dir():
                return None
            files = sorted(chdir.glob("*.parquet"))
            const_ct = None
        # the epoch's logical->physical map (inherited props walk)
        # decides which recorded column carries each declared field's
        # physical identity; a field whose identity has no source in
        # this epoch (dropped/not-yet-added) reads NULL
        mapping_v = (_walk_props(self.path, version=version)
                     .get("column_mapping") or {})
        out = []
        for f in files:
            tbl = pq.read_table(f)
            have = set(tbl.column_names)
            phys_to_src = {mapping_v.get(c, c): c for c in have
                           if c != "_change_type"}
            cols = []
            for _logical, phys in self.base_fields:
                src = phys_to_src.get(phys)
                cols.append(tbl.column(src).to_pylist()
                            if src is not None
                            else [None] * tbl.num_rows)
            ctypes = (const_ct,) * tbl.num_rows if const_ct \
                else tbl.column("_change_type").to_pylist()
            for r, ct in zip(zip(*cols), ctypes):
                out.append(r + (ct, version))
        return out

    def _deltas(self, v_from: int, v_to: int):
        """Rows for versions (v_from, v_to], ALWAYS from recorded change
        files. A version without them fails the stream LOUDLY — the old
        per-version snapshot diff loaded whole versions into driver
        Counters (O(table) driver memory, per-row Python), which is not
        a streaming path at any scale; non-CDF tables migrate via
        ``AcidTable.backfill_changes()`` (one distributed exceptAll per
        historical version) or are created with enable_cdf=True."""
        out = []
        for v in range(v_from + 1, v_to + 1):
            rec = self._recorded_changes(v)
            if rec is None:
                raise RuntimeError(
                    f"acidtable-cdf: version {v} of {self.path} has no "
                    f"recorded change files (table not CDF-enabled, or "
                    f"changes vacuumed). Create the table with "
                    f"enable_cdf=True, or run "
                    f"AcidTable.backfill_changes() to record deltas "
                    f"for historical versions; resume offsets must "
                    f"start at a version with retained change files")
            out.extend(rec)
        return out

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict):
        v0 = start["version"]
        latest = self._latest()
        if latest <= v0:
            return iter([]), start
        if self.max_versions:                     # read limit: bounded batch
            latest = min(latest, v0 + self.max_versions)
        return iter(self._deltas(v0, latest)), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay of a PLANNED batch must honor its recorded end offset:
        # versions committed after the plan belong to the NEXT batch, and
        # reading past `end` here would deliver them twice after a
        # mid-batch restart
        return iter(self._deltas(start["version"], end["version"]))

    def commit(self, end: dict) -> None:
        pass  # offsets are table versions; nothing to clean up


# ---------------- partition-parallel CDF stream (recorded change files)
#
# The SCALE path the simple reader's docstring promised: when the table
# records its deltas at commit time (AcidTable.create(enable_cdf=True) —
# Delta's enableChangeDataFeed), the stream needs no snapshot diffing at
# all. Offsets are still table versions, but planning yields ONE SPLIT
# PER CHANGE FILE, and each executor task streams its file's Arrow
# batches straight through — rows never touch the driver, and a commit
# written as N files fans out over N tasks exactly like a native scan.

class CdfFileSlice(InputPartition):
    def __init__(self, path: str, version: int, colmap=None,
                 const_ct: str | None = None):
        self.path, self.version = path, version
        #: source column per declared field (None = no identity in
        #: this epoch: NULL), resolved driver-side at plan time
        self.colmap = colmap
        #: constant _change_type for CDF-by-reference slices (the
        #: file is a raw data file — no _change_type column inside)
        self.const_ct = const_ct


class AcidCdfParallelStreamDataSource(DataSource):
    """``readStream.format("acidtable-cdf-parallel")`` — options:
    ``path``, ``startingVersion`` (default 0), ``maxVersionsPerTrigger``
    (default 0 = unlimited). Requires a CDF-enabled table; a version
    without recorded change files fails the stream loudly."""

    @classmethod
    def name(cls) -> str:
        return "acidtable-cdf-parallel"

    def schema(self):
        import json
        from pathlib import Path

        from pyspark.sql.types import (IntegerType, StringType, StructField,
                                       StructType)
        root = Path(self.options["path"])
        from ..acid import latest_committed_version
        m = json.loads(
            (root / "manifests" /
             f"v{latest_committed_version(root / 'manifests')}.json"
             ).read_text())
        base = StructType.fromJson(m["schema"])
        return StructType(list(base.fields) + [
            StructField("_change_type", StringType()),
            StructField("_commit_version", IntegerType())])

    def streamReader(self, schema):
        from pyspark.sql.pandas.types import to_arrow_type
        # (logical, physical identity, arrow type) per served field —
        # the schema-tracking translation state (see the simple
        # reader's docstring); the driver resolves each VERSION's
        # source column at plan time and ships it on the slice
        mapping = (_walk_props(self.options["path"])
                   .get("column_mapping") or {})
        pa_fields = [(f.name, mapping.get(f.name, f.name),
                      to_arrow_type(f.dataType))
                     for f in schema.fields
                     if f.name not in ("_change_type", "_commit_version")]
        return AcidCdfParallelReader(
            self.options["path"], pa_fields,
            int(self.options.get("startingversion", "0")),
            int(self.options.get("maxversionspertrigger", "0")))


class AcidCdfParallelReader(DataSourceStreamReader):
    """Version offsets with the same three-way monotone base as the
    walog reader (committed / learned floor / own offers), so the read
    limit is deterministic per trigger and a stale capped offer after a
    checkpointed restart plans zero duplicate versions (partitions()
    clips to the learned floor)."""

    def __init__(self, path: str, pa_fields, start_version: int,
                 max_versions: int):
        self.path = path
        self.pa_fields = pa_fields
        self.start_version = start_version
        self.max_versions = max_versions
        self._committed: int | None = None
        self._offered = start_version
        self._floor = start_version

    def _latest(self) -> int:
        from pathlib import Path

        from ..acid import latest_committed_version
        return latest_committed_version(Path(self.path) / "manifests")

    def _manifest(self, v: int) -> dict:
        # this reader consumes only "changes"/"schema"/"op" — never the
        # file list — so O(delta) manifests need NO materialization
        # (and the planner worker never pays the acid-module import)
        import json
        from pathlib import Path
        return json.loads((Path(self.path) / "manifests"
                           / f"v{v}.json").read_text())

    def initialOffset(self) -> dict:
        self._committed = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        latest = self._latest()
        if not self.max_versions:
            return {"version": latest}
        base = max(self._committed or 0, self._floor, self._offered)
        off = min(latest, base + self.max_versions)
        off = max(off, base)                        # never go backwards
        self._offered = max(self._offered, off)
        return {"version": off}

    def partitions(self, start: dict, end: dict):
        from pathlib import Path
        s, e = start["version"], end["version"]
        lo = max(s, self._floor)                    # clip: no re-plans
        self._floor = max(self._floor, s, e)
        out = []
        for v in range(lo + 1, e + 1):
            m = self._manifest(v)
            if "changes" not in m and "changes_ref" not in m:
                raise RuntimeError(
                    f"acidtable-cdf-parallel: version {v} of {self.path} "
                    f"recorded no change files — create the table with "
                    f"enable_cdf=True")
            # epoch translation: which of version v's logical columns
            # (the manifest schema = the change files' columns)
            # carries each declared field's physical identity
            mapping_v = (_walk_props(self.path, version=v)
                         .get("column_mapping") or {})
            epoch_cols = [f["name"] for f in m["schema"]["fields"]]
            phys_to_src = {mapping_v.get(c, c): c for c in epoch_cols}
            colmap = [phys_to_src.get(phys)
                      for _l, phys, _t in self.pa_fields]
            if "changes_ref" in m:
                # CDF-by-reference: one slice per referenced DATA file,
                # _change_type synthesized as 'insert' ([] = no rows)
                for r in m["changes_ref"]:
                    f = Path(self.path) / r
                    if not f.exists():
                        raise RuntimeError(
                            f"acidtable-cdf-parallel: version {v} "
                            f"change files were vacuumed; resume at a "
                            f"retained version")
                    out.append(CdfFileSlice(str(f), v, colmap,
                                            const_ct="insert"))
                continue
            chdir = Path(self.path) / m["changes"]
            if not chdir.is_dir():
                raise RuntimeError(
                    f"acidtable-cdf-parallel: version {v} change files "
                    f"were vacuumed; resume at a retained version")
            out.extend(CdfFileSlice(str(f), v, colmap)
                       for f in sorted(chdir.glob("*.parquet")))
        return out or [CdfFileSlice("", -1)]        # no-data batch

    def read(self, sl: CdfFileSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if sl.version < 0:
            return
        tbl = pq.read_table(sl.path)
        n = tbl.num_rows
        if not n:
            return
        have = set(tbl.column_names)
        colmap = sl.colmap or [l for l, _p, _t in self.pa_fields]
        arrays, names = [], []
        for (logical, _phys, patype), src in zip(self.pa_fields, colmap):
            arrays.append(
                tbl.column(src).combine_chunks().cast(patype)
                if src is not None and src in have
                else pa.nulls(n, patype))
            names.append(logical)
        const_ct = getattr(sl, "const_ct", None)   # pre-ref checkpoints
        arrays.append(pa.array([const_ct] * n) if const_ct
                      else tbl.column("_change_type").combine_chunks())
        arrays.append(pa.array([sl.version] * n, pa.int32()))
        names += ["_change_type", "_commit_version"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)

    def commit(self, end: dict) -> None:
        self._committed = max(self._committed or 0, end["version"])


# ------------------------------- AcidTable as a plain streaming SOURCE
#
# Delta's bread-and-butter `readStream.format("delta")` analog: the
# FIRST batch is the starting snapshot, every later batch is the rows
# APPENDED by commits since the last offset — offsets are table
# versions, splits are the manifest diff (the files a commit ADDED vs
# its parent: pure metadata, no data compared), executors stream the
# Arrow batches. Row-preserving commits (compact/relayout/constraints/
# add_column/clone) contribute nothing and are skipped silently; a
# commit that CHANGED rows (merge/delete/update/restore/*_mor) fails
# the stream loudly unless skipChangeCommits=true (Delta's option) —
# an appends-only contract must never silently miss churn.

class AcidStreamSlice(InputPartition):
    def __init__(self, path: str, version: int, dv_dir: str | None = None):
        self.path, self.version, self.dv_dir = path, version, dv_dir


#: ops whose commits change no row — nothing to emit, never an error.
#: rename/drop_column qualify: under column mapping they are pure
#: metadata, and this reader matches files by FROZEN physical name,
#: which a rename never changes (a re-added column mints a fresh
#: physical, so old files correctly read NULL for it)
_ROW_PRESERVING_OPS = frozenset({
    "compact", "relayout", "compact_partition",
    "optimize_incremental", "compact_small", "add_constraint",
    "drop_constraint", "add_column", "set_partition_by",
    "set_bloom_by", "clone", "rename_column", "drop_column"})

#: ops that only add rows — the appended files ARE the batch
_APPEND_OPS = frozenset({"append", "append_txn", "stream_sink"})


class AcidTableStreamDataSource(DataSource):
    """``spark.readStream.format("acidtable-stream")`` — options:
    ``path``, ``startingVersion`` (default 0: the first batch is that
    version's full snapshot), ``maxVersionsPerTrigger`` (default 0 =
    unlimited), ``skipChangeCommits`` (default false)."""

    @classmethod
    def name(cls) -> str:
        return "acidtable-stream"

    def schema(self):
        import json
        from pathlib import Path

        from pyspark.sql.types import StructType
        root = Path(self.options["path"])
        from ..acid import latest_committed_version
        m = json.loads(
            (root / "manifests" /
             f"v{latest_committed_version(root / 'manifests')}.json"
             ).read_text())
        return StructType.fromJson(m["schema"])

    def streamReader(self, schema):
        from pyspark.sql.pandas.types import to_arrow_type
        # data files hold FROZEN physical names at every epoch, so one
        # start-time resolution (logical -> physical identity) serves
        # the whole stream: later renames change nothing physical,
        # later drops/re-adds NULL-widen exactly like schema evolution
        mapping = (_walk_props(self.options["path"])
                   .get("column_mapping") or {})
        pa_fields = [(mapping.get(f.name, f.name), f.name,
                      to_arrow_type(f.dataType))
                     for f in schema.fields]
        return AcidTableStreamReader(
            self.options["path"], pa_fields,
            int(self.options.get("startingversion", "0")),
            int(self.options.get("maxversionspertrigger", "0")),
            self.options.get("skipchangecommits", "false").lower()
            == "true")


class AcidTableStreamReader(DataSourceStreamReader):
    """Offsets: {"version": v, "snap": 0|1} — snap flips once the
    starting snapshot has been planned; the same three-way monotone
    base as the other readers keeps the read limit deterministic and
    restart-safe (a stale capped offer plans zero duplicate
    versions)."""

    def __init__(self, path: str, pa_fields, start_version: int,
                 max_versions: int, skip_change: bool):
        self.path = path
        self.pa_fields = pa_fields
        self.start_version = start_version
        self.max_versions = max_versions
        self.skip_change = skip_change
        self._committed: int | None = None
        self._offered = start_version
        self._floor = start_version
        self._snap_planned = False
        self._snap_offered = False

    def _latest(self) -> int:
        from pathlib import Path

        from ..acid import latest_committed_version
        return latest_committed_version(Path(self.path) / "manifests")

    def _manifest(self, v: int) -> dict:
        import json
        from pathlib import Path

        from ..acid import resolve_manifest_files
        m = json.loads((Path(self.path) / "manifests"
                        / f"v{v}.json").read_text())
        if "files_base" in m:    # O(delta) manifest: materialize
            m["files"] = resolve_manifest_files(Path(self.path), m)
        return m

    def initialOffset(self) -> dict:
        self._committed = self.start_version
        return {"version": self.start_version, "snap": 0}

    def latestOffset(self) -> dict:
        latest = self._latest()
        base = max(self._committed or 0, self._floor, self._offered)
        if self.max_versions and not self._snap_offered:
            # under a read limit the starting snapshot fills the FIRST
            # micro-batch alone (versions start advancing next poll);
            # on a checkpointed restart this offer equals the restored
            # offset, so no duplicate snapshot batch is ever planned
            self._snap_offered = True
            return {"version": base, "snap": 1}
        self._snap_offered = True
        if self.max_versions:
            off = max(base, min(latest, base + self.max_versions))
        else:
            off = max(base, latest)
        self._offered = max(self._offered, off)
        return {"version": off, "snap": 1}

    def partitions(self, start: dict, end: dict):
        from pathlib import Path

        out = []
        root = Path(self.path)
        def rel(m: dict, f: dict) -> str:
            p = f["path"]
            return p if "/" in p else f'{m["data"]}/{p}'

        sv = start["version"]
        if not start.get("snap") and not self._snap_planned:
            m = self._manifest(sv)
            snaps = [root / rel(m, f) for f in (m.get("files") or [])]
            gone = next((p for p in snaps if not p.exists()), None)
            if gone is not None or (m.get("files") is None
                                    and not (root / m["data"]).is_dir()):
                raise RuntimeError(
                    f"acidtable-stream: starting version {sv} of "
                    f"{self.path} was vacuumed; start at a retained "
                    f"version")
            dv_dir = str(root / m["dv"]) if "dv" in m else None
            out.extend(AcidStreamSlice(str(p), sv, dv_dir)
                       for p in snaps)
            self._snap_planned = True
        lo = max(sv, self._floor)
        self._floor = max(self._floor, sv, end["version"])
        for v in range(lo + 1, end["version"] + 1):
            m = self._manifest(v)
            op = m["op"]
            if op in _ROW_PRESERVING_OPS:
                continue
            if op not in _APPEND_OPS:
                if self.skip_change:
                    continue
                raise RuntimeError(
                    f"acidtable-stream: version {v} of {self.path} is "
                    f"a {op!r} commit, which CHANGED existing rows — "
                    f"an appends-only stream cannot represent it. Use "
                    f"readStream.format('acidtable-cdf') for the full "
                    f"change feed, or set skipChangeCommits=true to "
                    f"ignore such commits")
            # diff by FILE NAME (unique, stable across the re-anchoring
            # of carried entries) — a carried file must never replay as
            # if it were new
            parent_names = {f["path"].rsplit("/", 1)[-1] for f in
                            (self._manifest(v - 1).get("files") or [])}
            fresh = [f for f in (m.get("files") or [])
                     if f["path"].rsplit("/", 1)[-1] not in parent_names]
            paths = [root / rel(m, f) for f in fresh]
            if any(not p.exists() for p in paths):
                raise RuntimeError(
                    f"acidtable-stream: version {v} of {self.path} was "
                    f"vacuumed; resume at a retained version")
            out.extend(AcidStreamSlice(str(p), v) for p in paths)
        return out or [AcidStreamSlice("", -1)]    # no-data batch

    def read(self, sl: AcidStreamSlice):
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        if sl.version < 0:
            return
        dead = None
        if sl.dv_dir is not None:
            name = os.path.basename(sl.path)
            dead = pq.read_table(
                sl.dv_dir, filters=[("file", "=", name)],
                columns=["pos"]).column("pos").to_numpy()
        off = 0
        for b in pq.ParquetFile(sl.path).iter_batches():
            n = b.num_rows
            if dead is not None and len(dead):
                mask = ~np.isin(np.arange(off, off + n), dead)
                off += n
                if not mask.all():
                    b = b.filter(pa.array(mask))
                    n = b.num_rows
            else:
                off += n
            if not n:
                continue
            have = {n2: i for i, n2 in enumerate(b.schema.names)}
            arrays, names = [], []
            for field in self.pa_fields:
                phys, logical, patype = (
                    field if len(field) == 3
                    else (field[0], field[0], field[1]))
                if phys in have:
                    arrays.append(b.column(have[phys]).cast(patype))
                else:   # pre-evolution / post-drop file: NULL-widen
                    arrays.append(pa.nulls(n, patype))
                names.append(logical)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def commit(self, end: dict) -> None:
        self._committed = max(self._committed or 0, end["version"])


def acid_table_stream(spark: SparkSession, sf_dir: str,
                      scratch) -> DataFrame:
    """The appends-only table stream end-to-end: an AcidTable seeded
    with a third of the staged events backlog (the starting snapshot),
    grown by two O(delta) appends and one OPTIMIZE (row-preserving —
    skipped silently, proving layout churn never duplicates a row),
    then drained read-limited (one version per micro-batch, default
    trigger): snapshot batch + one batch per append = exactly 3
    micro-batches, pinned as `n_batches`. The census must equal the
    batch aggregate over the whole events table — no row lost to the
    manifest diff, none doubled by the compaction commit."""
    import shutil
    import uuid as _uuid

    from ..acid import AcidTable
    from .tables import load_table

    table_dir = scratch / f"acid_tstream_{sf_dir.rstrip('/').rsplit('sf', 1)[-1]}"
    shutil.rmtree(table_dir, ignore_errors=True)
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "user_id",
                  (F.col("value").cast("decimal(18,6)") * 1_000_000)
                  .cast("bigint").alias("value6")))
    t = AcidTable.create(spark, table_dir,
                         ev.filter(F.col("event_id") % 3 == 0))
    t.append(ev.filter(F.col("event_id") % 3 == 1))       # v1
    t.compact(target_files=4)                             # v2: no rows
    t.append(ev.filter(F.col("event_id") % 3 == 2))       # v3

    spark.dataSource.register(AcidTableStreamDataSource)
    qname = f"tstream_{_uuid.uuid4().hex[:8]}"
    n_batches, _ = _drain_incremental(
        spark.readStream.format("acidtable-stream")
        .option("path", str(table_dir))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname))
    return (spark.table(qname).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
        (F.sum("value6").cast("double") / 1e6).alias("sum_value"))
        .withColumn("n_batches", F.lit(n_batches)))


ACID_TABLE_STREAM_ORACLE = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_distinct,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
            AS DOUBLE) / 1e6 AS sum_value,
       3 AS n_batches
FROM events
"""


def acid_cdf_parallel_stream(spark: SparkSession, sf_dir: str,
                             scratch) -> DataFrame:
    """The claim scenario streamed through the PARTITION-PARALLEL CDF
    connector: the table is created with enable_cdf=True, so each
    commit's recorded change files are the stream's splits — executors
    read them as Arrow batches, the driver plans offsets only. Drained
    read-limited (one version per micro-batch, n_batches pinned 2) and
    censused against the same delta oracle as the simple reader: the
    two connectors must be indistinguishable at the data level."""
    import shutil
    import uuid as _uuid

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from .tables import load_table

    table_dir = scratch / "acid_cdf_parallel"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 0)
             .select("file_id", "status"))
    t = AcidTable.create(spark, table_dir, state, enable_cdf=True)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1
    t.append(spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int"))                        # v2

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    qname = f"cdfp_{_uuid.uuid4().hex[:8]}"
    n_batches, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf-parallel")
        .option("path", str(table_dir))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname))
    return (spark.table(qname)
            .groupBy(F.col("_commit_version").alias("version"),
                     F.col("_change_type").alias("change_type"), "status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id"))
            .withColumn("n_batches", F.lit(n_batches)))


def acid_stream_sink(spark: SparkSession, sf_dir: str,
                     scratch) -> DataFrame:
    """The Python DataSource WRITE seam, exactly-once: the staged events
    backlog streams INTO an AcidTable via
    ``writeStream.format("acidtable")`` — executors stage parquet,
    each micro-batch lands as one batch-fenced manifest commit (one
    table version per micro-batch). The stream is drained TWICE against
    the same checkpoint (restart/replay: the second drain's batches are
    fenced no-ops), then the committed snapshot's census must equal the
    batch aggregate over the events table exactly — no row lost, none
    doubled — and the version history must show one stream_sink commit
    per micro-batch."""
    import shutil
    from pathlib import Path as _P

    from ..acid import AcidTable
    from ..streaming.jobs import _fresh, _run_available_now, events_stream

    table_dir = scratch / "acid_stream_sink"
    shutil.rmtree(table_dir, ignore_errors=True)
    AcidTable.create(
        spark, table_dir,
        spark.createDataFrame([], "event_id long, user_id long, "
                              "value6 long"))
    spark.dataSource.register(AcidTableDataSource)
    _, ckpt = _fresh(f"acid_sink_{_P(sf_dir).name}")
    for _ in range(2):                     # second drain = restart/replay
        _run_available_now(
            events_stream(spark, sf_dir)
            .select("event_id", "user_id",
                    (F.col("value").cast("decimal(18,6)") * 1_000_000)
                    .cast("bigint").alias("value6"))
            .writeStream.format("acidtable")
            .option("path", str(table_dir)).option("appId", "eo-acid")
            .option("checkpointLocation", ckpt))
    t = AcidTable(spark, table_dir)
    n_commits = sum(
        1 for v in range(t.latest_version() + 1)
        if t._manifest(v)["op"] == "stream_sink")
    return (t.read().agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_distinct"),
        (F.sum("value6").cast("double") / 1e6).alias("sum_value"))
        .withColumn("n_commits", F.lit(n_commits)))


ACID_STREAM_SINK_ORACLE = """
SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_distinct,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT))
            AS DOUBLE) / 1e6 AS sum_value,
       {n_stream_files} AS n_commits
FROM events
"""


def streaming_cdf_ivm(spark: SparkSession, sf_dir: str,
                      scratch) -> DataFrame:
    """The full CDC architecture in one flow — recorded change files →
    partition-parallel CDF stream → incrementally-maintained downstream
    table: a per-status count table is seeded from the source's v0
    census, then each micro-batch of the `acidtable-cdf-parallel`
    stream (one commit per batch, read-limited) applies its deltas
    (+1 per insert, −1 per delete) through `AcidTable.merge_add` — an
    atomic commit per batch on the downstream side. The final
    downstream state must equal the census of the source's LATEST
    snapshot (the oracle computes that directly), with `n_batches`
    pinned: the consumer read two bounded delta batches, never the
    source table. At 100 TB this is the whole point of the stack: churn
    flows as change files sized by the delta, the stream fans them over
    executors, and the maintained aggregate never rescans anything."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from .tables import load_table

    src_dir = scratch / "cdf_ivm_src"
    down_dir = scratch / "cdf_ivm_down"
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(down_dir, ignore_errors=True)
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 0)
             .select("file_id", "status"))
    src = AcidTable.create(spark, src_dir, state, enable_cdf=True)
    down = AcidTable.create(
        spark, down_dir,
        src.read().groupBy("status")
        .agg(F.count(F.lit(1)).alias("n")))          # seeded from v0
    low5 = (src.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    src.merge(low5.select("file_id", F.lit(1).alias("status")),
              key=["file_id"])                               # v1
    src.append(spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int"))                         # v2

    def apply_deltas(batch: DataFrame, batch_id: int) -> None:
        partial = (batch.groupBy("status")
                   .agg(F.sum(F.when(F.col("_change_type") == "insert", 1)
                              .otherwise(-1)).alias("n")))
        down.merge_add(partial, key=["status"])

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    n_batches, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf-parallel")
        .option("path", str(src_dir))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").foreachBatch(apply_deltas))
    return (down.read().filter(F.col("n") > 0)
            .withColumn("n_batches", F.lit(n_batches)))


STREAMING_CDF_IVM_ORACLE = """
WITH queue AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 0),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
latest AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM low5) THEN 1
              ELSE status END AS status
  FROM queue
  UNION ALL
  SELECT * FROM (VALUES (999999901, 0), (999999902, 1),
                        (999999903, 0)) AS a(file_id, status))
SELECT status, COUNT(*) AS n, 2 AS n_batches
FROM latest GROUP BY status
"""


def acid_cdf_stream(spark: SparkSession, sf_dir: str, scratch) -> DataFrame:
    """The CDF consumed as a STREAM: commit the three-version claim
    scenario, then drain `readStream.format("acidtable-cdf")` from
    version 0 and census the emitted deltas — which must equal the
    batch `read_changes` censuses (the acid_change_feed delta oracle).
    The drain is read-limited (maxVersionsPerTrigger=1) under the
    default trigger, so the two committed versions land as exactly TWO
    micro-batches; the `n_batches` column pins that against the
    oracle's literal 2 — a single-batch fallback fails the gate."""
    import shutil
    import uuid as _uuid

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from .tables import load_table

    table_dir = scratch / "acid_cdf_stream"
    shutil.rmtree(table_dir, ignore_errors=True)
    # every 10th queue row: SimpleDataSourceStreamReader is the
    # driver-side path for LOW-RATE control tables (its documented
    # contract) — a right-sized fixture, not a shortcut; the oracle
    # applies the same subset
    state = (queue_df(load_table(spark, sf_dir, "orders"))
             .filter(F.col("file_id") % 10 == 0)
             .select("file_id", "status"))
    t = AcidTable.create(spark, table_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1
    t.append(spark.createDataFrame(
        [(999999901, 0), (999999902, 1), (999999903, 0)],
        "file_id long, status int"))                        # v2
    # the table was NOT created CDF-enabled: this is the MIGRATION
    # path — one distributed exceptAll per historical version records
    # its change files, after which the stream serves recorded files
    # only (the per-row driver snapshot diff no longer exists)
    t.backfill_changes()

    spark.dataSource.register(AcidCdfStreamDataSource)
    qname = f"cdfs_{_uuid.uuid4().hex[:8]}"
    n_batches, _ = _drain_incremental(
        spark.readStream.format("acidtable-cdf")
        .option("path", str(table_dir))
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append").format("memory")
        .queryName(qname))
    return (spark.table(qname)
            .groupBy(F.col("_commit_version").alias("version"),
                     F.col("_change_type").alias("change_type"), "status")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("file_id").alias("min_id"),
                 F.max("file_id").alias("max_id"))
            .withColumn("n_batches", F.lit(n_batches)))


ACID_CDF_STREAM_ORACLE = """
WITH queue AS (SELECT * FROM ({queue_sql}) q WHERE file_id % 10 = 0),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
deltas AS (
  SELECT 1 AS version, 'delete' AS change_type, file_id, status
  FROM queue WHERE file_id IN (SELECT file_id FROM low5)
  UNION ALL
  SELECT 1, 'insert', file_id, 1 FROM low5
  UNION ALL
  SELECT 2, 'insert', file_id, status
  FROM (VALUES (999999901, 0), (999999902, 1),
               (999999903, 0)) AS a(file_id, status))
SELECT version, change_type, status, COUNT(*) AS n,
       min(file_id) AS min_id, max(file_id) AS max_id, 2 AS n_batches
FROM deltas GROUP BY version, change_type, status
"""


def _parse_size_conf(v: str) -> int:
    """Spark size conf string → bytes ('10485760b', '10MB', '-1')."""
    import re
    m = re.fullmatch(r"\s*(-?\d+)\s*([kmgt]?)b?\s*", str(v),
                     re.IGNORECASE)
    if not m:
        return -1
    n = int(m.group(1))
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20,
            "g": 1 << 30, "t": 1 << 40}[m.group(2).lower()]
    return n * mult


def read_acid(spark: SparkSession, path, version: int | None = None
              ) -> DataFrame:
    """``spark.read.format("acidtable")`` with PLANNER-VISIBLE sizing.

    DOCUMENTED GATE (the transform_with_state stance): the Python
    DataSource API in this Spark build exposes no statistics hook
    (DataSourceReader has pushFilters but no SupportsReportStatistics
    analog), so every ``format("acidtable")`` relation plans at
    ``spark.sql.defaultSizeInBytes`` = Long.Max — a 3-row acidtable
    dimension joins as sort-merge unless hand-broadcast. Until the
    hook exists, this wrapper makes the SAME decision the planner
    would make with real stats: it sums the manifest's RECORDED
    per-file byte totals (an O(files) driver read of metadata the
    manifest already holds — no filesystem stats) and applies the
    broadcast hint when the snapshot is at or under
    ``spark.sql.autoBroadcastJoinThreshold``. Entries without recorded
    bytes (foreign/legacy manifests) disable the hint — conservative,
    never a forced broadcast of an unknown size. When the stats hook
    lands, delete the hint and report the same number through it."""
    from ..acid import AcidTable, resolve_manifest_files

    spark.dataSource.register(AcidTableDataSource)
    reader = spark.read.format("acidtable").option("path", str(path))
    if version is not None:
        reader = reader.option("version", version)
    df = reader.load()
    try:
        t = AcidTable(spark, path)
        v = t.latest_version() if version is None else version
        m = t._manifest(v)
        files = resolve_manifest_files(t.path, m)
        sizes = [f.get("bytes") for f in (files or [])]
        thresh = _parse_size_conf(spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760b"))
    except Exception:                                # noqa: BLE001
        return df
    if (files is not None and all(s is not None for s in sizes)
            and thresh > 0 and sum(sizes) <= thresh):
        return F.broadcast(df)
    return df


def acid_datasource(spark: SparkSession, sf_dir: str, scratch) -> DataFrame:
    """Time travel THROUGH the connector: three committed versions —
    v0 = queue loaded, v1 = five lowest claimed (MERGE), v2 = relayout
    range-sorted on file_id so the manifest stats become selective
    (rows unchanged from v1) — then read v0 and the latest snapshot
    back via `format("acidtable")` and census both, plus a stats-pruned
    range read whose result must equal the exact filter (pruning
    removes files, never rows)."""
    import shutil

    from ..acid import AcidTable
    from ..operators.queue import queue_df
    from .tables import load_table

    table_dir = scratch / "acid_datasource"
    shutil.rmtree(table_dir, ignore_errors=True)
    state = queue_df(load_table(spark, sf_dir, "orders")) \
        .select("file_id", "status")
    t = AcidTable.create(spark, table_dir, state)
    low5 = (t.read().filter(F.col("status") == 0)
            .orderBy("file_id").limit(5).select("file_id"))
    t.merge(low5.select("file_id", F.lit(1).alias("status")),
            key=["file_id"])                                # v1
    t.relayout(["file_id"], target_files=8)                 # v2: stats
    spark.dataSource.register(AcidTableDataSource)

    def census(df: DataFrame, tag: str) -> DataFrame:
        return (df.groupBy("status")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.min("file_id").alias("min_id"),
                     F.max("file_id").alias("max_id"))
                .select(F.lit(tag).alias("snapshot"), "status", "n",
                        "min_id", "max_id"))

    v0 = (spark.read.format("acidtable")
          .option("path", str(table_dir)).option("version", 0).load())
    latest = (spark.read.format("acidtable")
              .option("path", str(table_dir)).load())
    lo, hi = 100, 2000
    pruned = (spark.read.format("acidtable")
              .option("path", str(table_dir))
              .option("col", "file_id")
              .option("lo", str(lo)).option("hi", str(hi)).load()
              .filter(F.col("file_id").between(lo, hi)))
    return (census(v0, "v0")
            .unionByName(census(latest, "latest"))
            .unionByName(census(pruned, "range")))


ACID_DATASOURCE_ORACLE = """
WITH queue AS ({queue_sql}),
low5 AS (SELECT file_id FROM queue WHERE status = 0
         ORDER BY file_id LIMIT 5),
latest AS (
  SELECT file_id,
         CASE WHEN file_id IN (SELECT file_id FROM low5) THEN 1
              ELSE status END AS status
  FROM queue),
snaps AS (
  SELECT 'v0' AS snapshot, status, file_id FROM queue
  UNION ALL SELECT 'latest', status, file_id FROM latest
  UNION ALL SELECT 'range', status, file_id FROM latest
            WHERE file_id BETWEEN 100 AND 2000)
SELECT snapshot, status, COUNT(*) AS n,
       min(file_id) AS min_id, max(file_id) AS max_id
FROM snaps GROUP BY snapshot, status
"""
