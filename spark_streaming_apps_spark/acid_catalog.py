"""Cross-table atomic commits and consistent snapshots: AcidCatalog.

The reference needs MULTI-table transactions, not just row transactions:
``get_highwater_mark()`` updates ``hw_table`` AND inserts the release
into ``highwatermark_log`` in one PL/pgSQL call (StreamingApp.scala:
223-256), and the ingest writes ``tsk_image_names`` + ``tsk_image_sizes``
together (StreamingApp.scala:341-342). A table format whose commit unit
is one table cannot express that — Delta still can't; Iceberg answers
with CATALOG-level commits (a Nessie/REST-catalog pointer swap), and
that is the design here:

* every table keeps its own manifest chain (single-table ACID exactly
  as before — AcidTable is unchanged);
* the catalog adds ONE more swap point: ``commits/c{N}.json`` pins a
  ``{table_name: version}`` map, created with the same O_CREAT|O_EXCL
  primitive as table manifests;
* a multi-table commit stages each table's new version through that
  table's own optimistic loop, then PUBLISHES all of them in one
  catalog entry — a reader resolving tables through the catalog can
  never see table A's half of a transaction without table B's.

Consistency contract (the honest one): direct AcidTable reads remain
read-committed per table; reads through ``catalog.read`` are
cross-table snapshot-isolated at a catalog entry.  A writer that dies
between its table commits and its catalog publish leaves committed but
UNPINNED table versions — invisible through the catalog, re-publishable,
never torn (the Iceberg orphan-snapshot case).  Version numbers are
monotone per table, so concurrent publishes merge with per-table
``max`` and no pin can move backwards.

At 100 TB the catalog entry is a few hundred bytes regardless of data
size, and the publish maps to the same conditional-PUT primitive as the
table manifests — one extra O(1) swap per transaction.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .acid import AcidTable, CommitConflict
from .storage import crash_point, get_store

#: ONE long-lived pool for multi-table commit dispatch, created
#: lazily. Under PySpark's pinned-thread mode (default since 3.2)
#: every Python worker thread pins a dedicated JVM thread that is NOT
#: released when the Python thread exits — a pool per commit_multi
#: (the previous shape) minted up to 4 fresh threads per micro-batch,
#: so a forever-running maintainer accumulated JVM threads and py4j
#: connections between GCs (r16 ADVICE). A module-level pool keeps
#: the pinned-thread set bounded at 4 for the process lifetime.
_COMMIT_POOL = None


def _commit_pool():
    global _COMMIT_POOL
    if _COMMIT_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _COMMIT_POOL = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="acid-commit")
    return _COMMIT_POOL


def _apply_writes(table_of, writes: dict[str, tuple],
                  max_retries: int) -> dict[str, int]:
    """The transaction write dispatch shared by main-catalog and
    branch commits — each table's change goes through that table's own
    optimistic loop; the caller decides which POINTER pins the
    resulting versions. ``table_of(name) -> AcidTable``.

    DIFFERENT tables' commits are independent until the pointer
    publishes (readers serve the previous entry across any partial
    state — the crash-window contract), so a multi-table transaction
    runs them from a small thread pool: each commit is a chain of
    short Spark jobs whose driver round-trips would otherwise
    serialize; overlapped, the next table's tasks back-fill executors
    the current one's tail leaves idle (guide §2.6). Single-write
    transactions keep the plain in-thread path. Commit ORDER between
    tables was never part of the contract (concurrent single-table
    writers already interleave with a transaction); a failure in any
    write re-raises after the pool drains, leaving the same
    at-least-once partial state a sequential failure could."""
    if len(writes) > 1:
        futs = {name: _commit_pool().submit(
                    _apply_one, table_of(name), name, spec, max_retries)
                for name, spec in writes.items()}
        # drain every future before raising so a failed write can't
        # leave siblings running unobserved (same contract as the
        # previous with-block pool)
        errs = []
        out = {}
        for name, f in futs.items():
            try:
                out[name] = f.result()
            except BaseException as e:       # noqa: BLE001
                errs.append(e)
        if errs:
            raise errs[0]
        return out
    return {name: _apply_one(table_of(name), name, spec, max_retries)
            for name, spec in writes.items()}


def _apply_one(t, name: str, spec: tuple, max_retries: int) -> int:
    """Dispatch ONE table's write spec through its optimistic loop."""
    kind = spec[0]
    if kind == "append":
        v = t.append(spec[1], max_retries=max_retries)
    elif kind == "append_txn":
        # fenced: a replayed (app_id, batch_id) commits NOTHING
        # (returns None) — pin the version at which the fenced
        # batch ACTUALLY committed, not latest_version(): latest
        # may include a concurrent transaction's committed-but-
        # unpinned version of this table, and publishing that pin
        # would expose one half of the other transaction early
        # (torn cross-table read in a double-crash interleaving)
        v = t.append_txn(spec[1], spec[2], spec[3],
                         max_retries=max_retries)
        if v is None:
            v = t.txn_version(spec[2], spec[3])
            if v is None:
                # legacy chain predating per-commit txn markers:
                # fall back to latest (pre-fix behavior)
                v = t.latest_version()
    elif kind == "apply_cdf":
        # ("apply_cdf", changes_df, key_list[, app_id, batch_id])
        # — one commit applying a CDF batch (inserts appended,
        # delete keys' files rewritten); the 5-tuple form is
        # fenced like append_txn, with the same replay pin rule
        if len(spec) == 5:
            v = t.apply_cdf(spec[1], spec[2], spec[3], spec[4],
                            max_retries=max_retries)
            if v is None:
                v = t.txn_version(spec[3], spec[4])
                if v is None:
                    v = t.latest_version()
        elif len(spec) == 3:
            v = t.apply_cdf(spec[1], spec[2],
                            max_retries=max_retries)
        else:
            # a 4-tuple is a caller who MEANT the fence but forgot
            # batch_id — refusing beats silently running unfenced
            raise ValueError(
                f"apply_cdf spec for table {name!r} must be "
                f"(kind, changes, key) or (kind, changes, key, "
                f"app_id, batch_id); got {len(spec)} elements")
    elif kind == "merge":
        v = t.merge(spec[1], spec[2], max_retries=max_retries)
    elif kind == "merge_add":
        v = t.merge_add(spec[1], spec[2], max_retries=max_retries)
    elif kind == "merge_add_txn":
        # fenced additive counters: a replayed (app_id, batch_id)
        # adds nothing — same replay pin rule as append_txn
        v = t.merge_add(spec[1], spec[2], max_retries=max_retries,
                        app_id=spec[3], batch_id=spec[4])
        if v is None:
            v = t.txn_version(spec[3], spec[4])
            if v is None:
                v = t.latest_version()
    elif kind == "merge_add_pruned":
        # touched-file-pruned additive counters — O(touched files)
        # per batch on a key-clustered counter table, not O(table)
        v = t.merge_add_pruned(spec[1], spec[2],
                               max_retries=max_retries)
    elif kind == "merge_add_pruned_txn":
        # fenced twin — same replay pin rule as merge_add_txn
        v = t.merge_add_pruned(spec[1], spec[2],
                               max_retries=max_retries,
                               app_id=spec[3], batch_id=spec[4])
        if v is None:
            v = t.txn_version(spec[3], spec[4])
            if v is None:
                v = t.latest_version()
    elif kind == "delete":
        v = t.delete_where(spec[1], max_retries=max_retries)
    elif kind == "update":
        v = t.update_where(spec[1], spec[2],
                           max_retries=max_retries)
    else:
        raise ValueError(f"unknown write kind {kind!r} for "
                         f"table {name!r}")
    return v


class AcidCatalog:
    """A directory of AcidTables plus an atomic cross-table pointer."""

    def __init__(self, spark: SparkSession, root) -> None:
        self.spark = spark
        self.root = Path(root)
        self._commits = self.root / "commits"
        self._tables = self.root / "tables"

    # ----------------------------------------------------------- tables

    def create_table(self, name: str, df: DataFrame, **kw) -> AcidTable:
        """Create ``name`` under the catalog root and pin its v0 in a
        new catalog entry, so the table is born visible to catalog
        readers."""
        self._commits.mkdir(parents=True, exist_ok=True)
        self._tables.mkdir(parents=True, exist_ok=True)
        t = AcidTable.create(self.spark, self._tables / name, df, **kw)
        self._publish({name: 0})
        return t

    def table(self, name: str) -> AcidTable:
        """Direct handle (read-committed, single-table semantics)."""
        return AcidTable(self.spark, self._tables / name)

    # --------------------------------------------------------- snapshots

    def latest_entry(self) -> int | None:
        """Newest catalog entry — served from the ``_latest`` hint
        plus a forward probe (the AcidTable.latest_version discipline:
        the hint may lag, never lead; missing/corrupt falls back to
        the listing). The hint is clamped to the ``_floor`` marker
        ``expire_entries`` maintains: entries >= floor are contiguous,
        entries below it may be isolated retention roots (tag pins,
        branch bases) whose successor was expired — probing forward
        from one of those would stop at the gap and resurrect an
        ancient entry (r16 review finding: a stalled publisher's
        stale hint landing on a kept root made ``_publish`` re-mint
        an expired entry number with stale pins)."""
        if not self._commits.is_dir():
            return None
        hint = self._commits / "_latest"
        floor = 0
        try:
            floor = int((self._commits / "_floor").read_text())
        except (OSError, ValueError):
            pass
        try:
            e = max(int(hint.read_text()), floor)
            if not (self._commits / f"c{e}.json").exists():
                raise ValueError
        except (OSError, ValueError):
            cs = [int(p.stem[1:]) for p in self._commits.glob("c*.json")]
            return max(cs) if cs else None
        while (self._commits / f"c{e + 1}.json").exists():
            e += 1
        return e

    def snapshot(self, entry: int | None = None) -> dict[str, int]:
        """The ``{table: version}`` pins of a catalog entry (default:
        latest) — a cross-table-consistent point in time."""
        e = self.latest_entry() if entry is None else entry
        if e is None:
            return {}
        return json.loads((self._commits / f"c{e}.json").read_text())

    def read(self, name: str, entry: int | None = None) -> DataFrame:
        """Snapshot-isolated read: ``name`` at the version the catalog
        entry pins. Two ``read`` calls against the same entry are
        mutually consistent no matter what writers do in between."""
        pins = self.snapshot(entry)
        if name not in pins:
            raise FileNotFoundError(
                f"table {name!r} not in catalog entry; pinned: "
                f"{sorted(pins)}")
        return self.table(name).read(pins[name])

    # ----------------------------------------------------------- commits

    def _publish(self, new_pins: dict[str, int],
                 max_retries: int = 50,
                 expect: dict[str, int] | None = None) -> int:
        """One atomic pointer swap: next entry = latest pins merged with
        ``new_pins`` (per-table ``max``, so a concurrent publisher can
        never move a pin backwards). ``expect`` ({table: pin}) makes
        the swap CONDITIONAL: each attempt re-validates that the live
        entry still pins those exact versions, raising CommitConflict
        otherwise — the WAP publish's fast-forward guard evaluated
        INSIDE the CAS loop, so a concurrent main write landing between
        the caller's check and the swap can never be silently
        max-merged away. Returns the entry number."""
        self._commits.mkdir(parents=True, exist_ok=True)
        for _ in range(max_retries):
            e = self.latest_entry()
            pins = self.snapshot(e) if e is not None else {}
            if expect is not None:
                stale = {t for t, v in expect.items()
                         if pins.get(t) != v}
                if stale:
                    raise CommitConflict(
                        f"conditional publish refused: table(s) "
                        f"{sorted(stale)} moved past the expected "
                        f"pins at {self.root}; rebase and retry")
            merged = dict(pins)
            for name, v in new_pins.items():
                merged[name] = max(v, merged.get(name, -1))
            nxt = (e if e is not None else -1) + 1
            # the catalog pointer swap IS the natural CAS point on
            # object stores — routed through the same FileStore seam
            # as table manifests
            if get_store().create_exclusive(
                    self._commits / f"c{nxt}.json", json.dumps(merged)):
                try:                        # best-effort O(1) hint
                    import uuid as _uuid
                    tmp = self._commits / f"._latest.{_uuid.uuid4().hex[:8]}"
                    tmp.write_text(str(nxt))
                    get_store().atomic_replace(
                        tmp, self._commits / "_latest")
                except OSError:
                    pass
                return nxt
            continue                        # lost the pointer race: merge
        raise CommitConflict(
            f"gave up publishing catalog entry after {max_retries} races")

    def commit_multi(self, writes: dict[str, tuple], op: str = "multi",
                     max_retries: int = 20) -> int:
        """Atomic multi-table transaction. ``writes`` maps table name →
        one of::

            ("append", rows_df)
            ("append_txn", rows_df, app_id, batch_id)
            ("apply_cdf", changes_df, key_list[, app_id, batch_id])
            ("merge", updates_df, key_list)
            ("merge_add", partials_df, key_list)
            ("merge_add_txn", partials_df, key_list, app_id, batch_id)
            ("merge_add_pruned", partials_df, key_list)
            ("merge_add_pruned_txn", partials_df, key_list, app_id,
             batch_id)
            ("delete", cond_str)
            ("update", assigns_dict, cond_str)

        Each table's change commits through its OWN optimistic loop
        (so single-table writers serialize with it normally), then one
        catalog entry publishes every new version together. Catalog
        readers see all of the transaction or none of it. Returns the
        catalog entry number.

        Replay semantics: plain kinds are AT-LEAST-ONCE across a
        caller crash (a retried transaction re-applies); the
        ``append_txn`` kind carries the (app_id, batch_id) writer
        fence, so a replayed streaming micro-batch re-commits nothing
        and the retry just re-publishes the pointer — exactly-once
        appends from an at-least-once stream."""
        new_pins = _apply_writes(self.table, writes, max_retries)
        # crash window the catalog contract closes: table versions are
        # committed but UNPINNED until the entry publishes — catalog
        # readers must keep serving the previous entry's pins
        crash_point("before_catalog_pin")
        return self._publish(new_pins)

    # ------------------------------------------------ named refs

    def branch(self, name: str) -> CatalogBranch:
        """Get-or-create branch ``name``, forked from the CURRENT main
        entry (its pins become the branch's base — Iceberg's
        branch-from-snapshot)."""
        b = CatalogBranch(self, name)
        if b.head() is None:
            base = self.latest_entry()
            if base is None:
                raise FileNotFoundError(
                    f"catalog at {self.root} has no entries to branch "
                    f"from")
            b._dir.mkdir(parents=True, exist_ok=True)
            get_store().create_exclusive(
                b._dir / "b0.json",
                json.dumps({"pins": self.snapshot(base), "base": base}))
            # lost race: another forker created b0 — both forked from
            # a live entry; first writer wins, semantics identical
        return b

    def tag(self, name: str, entry: int | None = None) -> int:
        """IMMUTABLE named ref: pin ``entry`` (default latest) under
        ``refs/tags/<name>.json``. Re-tagging an existing name is
        refused — tags never move (Iceberg tag semantics)."""
        e = self.latest_entry() if entry is None else entry
        if e is None:
            raise FileNotFoundError(f"catalog at {self.root} is empty")
        tags = self.root / "refs" / "tags"
        tags.mkdir(parents=True, exist_ok=True)
        if not get_store().create_exclusive(
                tags / f"{name}.json",
                json.dumps({"entry": e, "pins": self.snapshot(e)})):
            raise FileExistsError(
                f"tag {name!r} already exists (tags are immutable)")
        return e

    def expire_entries(self, keep_last: int = 16) -> list[int]:
        """Catalog-entry retention — the catalog twin of the table-side
        vacuum ledger discipline: a forever-running maintainer
        publishes one ``commits/c{N}.json`` per micro-batch, so
        without an expire API the catalog directory grows O(batches)
        files forever (r15 verdict). Deletes every entry file older
        than the newest ``keep_last`` EXCEPT the retention roots:

        * the newest ``keep_last`` entries (the serving window — the
          ``_latest`` hint always lands inside it);
        * every tag's pinned entry (tags stay readable by name either
          way — ``read_tag`` serves from the tag file's own pins —
          but the entry is kept so ``snapshot(tag_entry)`` time travel
          keeps working);
        * for every LIVE branch, its fork base and everything after
          it (``publish``'s landed-retry evidence walk reads each
          entry from head down to the base — expiring inside that
          range would turn an idempotent publish retry into a
          spurious conflict). Drop the branch to release them.

        Crash-safe without a swap: BEFORE any deletion the monotonic
        ``_floor`` marker is raised to the kept window's first entry
        (atomic replace), so ``latest_entry`` clamps a stale or
        crash-era ``_latest`` hint above every gap this run creates —
        a hint landing on a kept below-window root (tag pin, branch
        base) can no longer stop the forward probe early and let
        ``_publish`` re-mint an expired entry number. Each entry file
        is then deleted independently and the roots are never
        touched, so a writer SIGKILLed mid-expire leaves only SOME
        expired entries deleted — every reader keeps serving and the
        next run finishes the job. Concurrent publishers only ever
        ADD entries newer than the window. Returns the expired entry
        numbers."""
        if keep_last < 1:
            raise ValueError("expire_entries: keep_last >= 1")
        if not self._commits.is_dir():
            return []
        # STALE STAGING-TEMP sweep (the table vacuum's dotfile
        # discipline, catalog twin): a publisher crash between
        # write_text and atomic_replace leaks '._latest.*' /
        # '._floor.*' pointer stages in commits/ — no entry ever
        # references them, so entry expiry never sees them. Grace
        # window so a live publisher mid-swap is never raced (the
        # temp lives milliseconds on the happy path).
        import time as _time
        cutoff = _time.time() - 900
        for p in self._commits.iterdir():
            if not p.name.startswith(("._latest.", "._floor.")):
                continue
            try:
                if p.stat().st_mtime < cutoff:
                    p.unlink(missing_ok=True)
            except OSError:
                pass
        entries = sorted(int(p.stem[1:])
                         for p in self._commits.glob("c*.json"))
        if len(entries) <= keep_last:
            return []
        keep = set(entries[-keep_last:])
        # raise the contiguity floor FIRST — if this write fails the
        # exception propagates and nothing is deleted (deleting with a
        # stale floor is the unsafe order). Monotonic max-merge: a
        # smaller concurrent window never lowers it.
        floor = entries[-keep_last]
        fp = self._commits / "_floor"
        try:
            cur_floor = int(fp.read_text())
        except (OSError, ValueError):
            cur_floor = -1
        if floor > cur_floor:
            import uuid as _uuid
            tmp = self._commits / f"._floor.{_uuid.uuid4().hex[:8]}"
            tmp.write_text(str(floor))
            get_store().atomic_replace(tmp, fp)
        crash_point("after_floor_raise")
        for tag in (self.root / "refs" / "tags").glob("*.json"):
            try:
                e = json.loads(tag.read_text()).get("entry")
                if e is not None:
                    keep.add(int(e))
            except (OSError, ValueError):
                continue
        heads = self.root / "refs" / "heads"
        min_base = None
        if heads.is_dir():
            for bdir in heads.iterdir():
                for bp in bdir.glob("b*.json"):
                    try:
                        base = json.loads(bp.read_text()).get("base")
                    except (OSError, ValueError):
                        continue
                    if base is not None and (min_base is None
                                             or base < min_base):
                        min_base = int(base)
        removed: list[int] = []
        for e in entries[:-keep_last]:
            if e in keep or (min_base is not None and e >= min_base):
                continue
            crash_point("during_entry_expire")
            try:
                (self._commits / f"c{e}.json").unlink()
                removed.append(e)
            except FileNotFoundError:
                continue             # concurrent expirer got it first
        return removed

    def expire_tag(self, name: str) -> bool:
        """DELIBERATE ref cleanup: drop tag ``name`` so the versions it
        pinned stop being retention roots — the next ``vacuum`` on each
        table may release their files (Iceberg's remove-tag +
        expire-snapshots pairing). Returns False if the tag did not
        exist. Irreversible by design: tags are immutable while alive,
        expiry is the one mutation."""
        p = self.root / "refs" / "tags" / f"{name}.json"
        try:
            p.unlink()
            return True
        except FileNotFoundError:
            return False

    def drop_branch(self, name: str) -> bool:
        """Drop branch ``name`` (its whole pointer chain). Unpublished
        branch work becomes unreachable through any ref and its table
        versions fall out of vacuum's retention roots. Returns False
        if the branch did not exist."""
        import shutil

        d = self.root / "refs" / "heads" / name
        if not d.is_dir():
            return False
        shutil.rmtree(d, ignore_errors=True)
        return True

    def read_tag(self, tag_name: str, table: str) -> DataFrame:
        """Snapshot-isolated read at a tag — time travel by name."""
        p = self.root / "refs" / "tags" / f"{tag_name}.json"
        pins = json.loads(p.read_text())["pins"]
        if table not in pins:
            raise FileNotFoundError(
                f"table {table!r} not pinned by tag {tag_name!r}")
        return self.table(table).read(pins[table])

    def publish(self, branch_name: str, audit=None,
                max_retries: int = 50) -> int:
        """WRITE-AUDIT-PUBLISH: fast-forward the MAIN pointer to the
        branch head in one catalog entry — Iceberg's WAP publish, the
        production answer to "validate before readers see it".

        * ``audit`` (optional callable ``branch -> bool``) runs against
          the BRANCH's snapshot first; a falsy return raises
          ``AuditFailed`` and the main pointer is untouched — readers
          keep serving the old entry.
        * Fast-forward safety: for every table the branch CHANGED, the
          main pointer must still pin the branch's BASE version —
          a concurrent main-side write to the same table makes the
          branch non-fast-forwardable and the publish refuses
          (``CommitConflict``) rather than silently dropping the main
          write. Main-side writes to OTHER tables merge fine (the
          pointer merge is per-table).
        * The swap itself is the same one-entry CAS as every
          ``commit_multi`` — atomic, all-or-nothing — and CONDITIONAL:
          the expected base pins are re-validated inside the CAS loop,
          so a main write landing between this method's check and the
          swap raises instead of being silently max-merged away.

        Carve-out (linear table histories): a main writer that writes
        a branch-DIRTY table builds on the branch's committed-but-
        unpinned table version (read-committed per table, as
        documented on commit_multi) — the guarantee here is
        POINTER-level: branch work is never published without passing
        this gate, and main readers resolving through the catalog only
        ever see pinned versions."""
        b = CatalogBranch(self, branch_name)
        h = b.head()
        if h is None:
            raise FileNotFoundError(f"branch {branch_name!r} not found")
        ent = b._entry(h)
        pins_b, base = ent["pins"], ent["base"]
        base_pins = self.snapshot(base)
        changed = {t: v for t, v in pins_b.items()
                   if base_pins.get(t) != v}
        if audit is not None and not audit(b):
            raise AuditFailed(
                f"audit rejected branch {branch_name!r}; main pointer "
                f"untouched")
        cur = self.snapshot()
        if changed and all(cur.get(t) is not None and cur.get(t) >= v
                           for t, v in changed.items()):
            # possible retry of a publish that already LANDED (crash
            # after the CAS): main pins the branch head — or a LATER
            # version of every changed table. Pin dominance alone is
            # NOT proof (a main writer that built on the branch's
            # committed-but-unpinned table version also dominates, the
            # documented carve-out, and that branch was never
            # audited-published) — so demand evidence: some entry
            # AFTER the fork pinned EXACTLY the branch-head versions,
            # which only the publish swap writes (a main commit mints
            # its own fresh table version, skipping the branch's).
            # O(entries-since-fork) walk, paid only on this rare path.
            e = self.latest_entry()
            for n in range(e, base, -1):
                pins_n = self.snapshot(n)
                if all(pins_n.get(t) == v for t, v in changed.items()):
                    # the landed publish's entry: idempotent no-op,
                    # not a spurious conflict (a post-publish main
                    # write no longer fails the retry)
                    return e
            # no entry ever pinned the branch head: fall through to
            # the fast-forward check, which will refuse
        stale = {t for t in changed
                 if cur.get(t) != base_pins.get(t)}
        if stale:
            raise CommitConflict(
                f"branch {branch_name!r} is not fast-forwardable: "
                f"main moved on table(s) {sorted(stale)} since the "
                f"fork (base entry {base}); rebase the branch")
        crash_point("before_wap_publish")
        # conditional swap: the fast-forward guard above re-validates
        # INSIDE the CAS loop (expect=), so a main write landing in
        # this window raises instead of being silently max-merged away
        return self._publish(changed,
                             expect={t: base_pins.get(t)
                                     for t in changed})


class AuditFailed(Exception):
    """The write-audit-publish audit rejected the branch; the main
    pointer was not touched — readers keep the pre-branch snapshot."""


class CatalogBranch:
    """A NAMED, MOVABLE ref over catalog pins — Iceberg/Nessie branch
    semantics for the write-audit-publish pattern: commits land on the
    branch's own pointer chain (each table's versions still commit
    through that table's normal optimistic loop, so single-table
    writers serialize with branch writers as usual), main-catalog
    readers never see them, and ``AcidCatalog.publish`` fast-forwards
    the main pointer to the branch head in ONE entry after an audit
    passes. (Reference analog: the staged claim/status machine —
    FileWorkerApp.scala:207-227 — where work becomes visible only at
    the status flip, never mid-processing.)

    The branch chain lives at ``refs/heads/<name>/b{N}.json``; each
    entry is ``{"pins": {...}, "base": <main entry at fork>}`` and
    advances with the same create_exclusive CAS as every other pointer
    in the stack."""

    def __init__(self, catalog: "AcidCatalog", name: str) -> None:
        self.catalog = catalog
        self.name = name
        self._dir = catalog.root / "refs" / "heads" / name

    # ----------------------------------------------------- pointer chain

    def head(self) -> int | None:
        if not self._dir.is_dir():
            return None
        es = [int(p.stem[1:]) for p in self._dir.glob("b*.json")]
        return max(es) if es else None

    def _entry(self, n: int) -> dict:
        return json.loads((self._dir / f"b{n}.json").read_text())

    def base_entry(self) -> int | None:
        h = self.head()
        return None if h is None else self._entry(h).get("base")

    def snapshot(self) -> dict[str, int]:
        """The branch's ``{table: version}`` pins (base pins + every
        branch commit's overrides)."""
        h = self.head()
        if h is None:
            raise FileNotFoundError(
                f"branch {self.name!r} does not exist under "
                f"{self.catalog.root}")
        return dict(self._entry(h)["pins"])

    def read(self, name: str) -> DataFrame:
        """Snapshot-isolated read AT THE BRANCH HEAD."""
        pins = self.snapshot()
        if name not in pins:
            raise FileNotFoundError(
                f"table {name!r} not pinned on branch {self.name!r}; "
                f"pinned: {sorted(pins)}")
        return self.catalog.table(name).read(pins[name])

    def _advance(self, new_pins: dict[str, int],
                 max_retries: int = 50) -> int:
        """CAS-advance the branch pointer with merged pins (per-table
        max — same monotonicity as the main chain)."""
        for _ in range(max_retries):
            h = self.head()
            if h is None:
                raise FileNotFoundError(
                    f"branch {self.name!r} does not exist")
            cur = self._entry(h)
            merged = dict(cur["pins"])
            for t, v in new_pins.items():
                merged[t] = max(v, merged.get(t, -1))
            crash_point("before_branch_pin")
            if get_store().create_exclusive(
                    self._dir / f"b{h + 1}.json",
                    json.dumps({"pins": merged, "base": cur["base"]})):
                return h + 1
        raise CommitConflict(
            f"gave up advancing branch {self.name!r} after "
            f"{max_retries} races")

    def rebase(self, max_retries: int = 50) -> int:
        """Re-fork the branch onto the CURRENT main entry without
        losing its work — the missing step of the WAP loop when main
        moves while a branch is parked: tables the branch left
        UNCHANGED re-pin to main's current versions (so branch reads
        stop serving fork-time staleness and the eventual publish's
        base reflects reality); tables the branch CHANGED keep the
        branch's versions.

        REFUSED (CommitConflict) when main itself moved on a table the
        branch changed since the fork — a true conflict: the branch's
        version and main's version are divergent claims on one linear
        table history, and silently preferring either would drop the
        other's write. Re-apply the branch's work on a fresh fork (or
        publish-retry if the branch head already landed).

        Returns the new branch head entry number. The pointer advance
        is the same create_exclusive CAS as every other swap;
        ``crash_point('before_branch_rebase')`` covers the
        died-before-swap window (the old head keeps serving)."""
        for _ in range(max_retries):
            h = self.head()
            if h is None:
                raise FileNotFoundError(
                    f"branch {self.name!r} does not exist under "
                    f"{self.catalog.root}")
            ent = self._entry(h)
            pins_b, base = ent["pins"], ent["base"]
            base_pins = self.catalog.snapshot(base)
            changed = {t: v for t, v in pins_b.items()
                       if base_pins.get(t) != v}
            cur_e = self.catalog.latest_entry()
            cur = self.catalog.snapshot(cur_e)
            stale = {t for t in changed
                     if cur.get(t) != base_pins.get(t)}
            if stale:
                raise CommitConflict(
                    f"branch {self.name!r} cannot rebase: main moved "
                    f"on changed table(s) {sorted(stale)} since the "
                    f"fork (base entry {base}) — divergent writes on "
                    f"a linear history; re-apply the branch's work on "
                    f"a fresh fork")
            merged = dict(cur)
            merged.update(changed)
            crash_point("before_branch_rebase")
            if get_store().create_exclusive(
                    self._dir / f"b{h + 1}.json",
                    json.dumps({"pins": merged, "base": cur_e})):
                return h + 1
            # lost a race against a concurrent branch commit or
            # rebase: recompute against the new head
        raise CommitConflict(
            f"gave up rebasing branch {self.name!r} after "
            f"{max_retries} races")

    # ----------------------------------------------------------- writes

    def commit_multi(self, writes: dict[str, tuple], op: str = "multi",
                     max_retries: int = 20) -> int:
        """The catalog ``commit_multi`` contract (same write kinds,
        same ``_apply_writes`` dispatch), but the publish lands on the
        BRANCH pointer: table versions commit normally (and are
        therefore visible to direct table readers — the documented
        read-committed/single-table carve-out), while catalog and
        branch readers each see their own pointer's pins."""
        new_pins = _apply_writes(self.catalog.table, writes,
                                 max_retries)
        return self._advance(new_pins)
