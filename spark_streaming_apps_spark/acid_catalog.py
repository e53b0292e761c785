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
        the listing)."""
        if not self._commits.is_dir():
            return None
        hint = self._commits / "_latest"
        try:
            e = int(hint.read_text())
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
                 max_retries: int = 50) -> int:
        """One atomic pointer swap: next entry = latest pins merged with
        ``new_pins`` (per-table ``max``, so a concurrent publisher can
        never move a pin backwards). Returns the entry number."""
        self._commits.mkdir(parents=True, exist_ok=True)
        for _ in range(max_retries):
            e = self.latest_entry()
            pins = self.snapshot(e) if e is not None else {}
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
            ("merge", updates_df, key_list)
            ("merge_add", partials_df, key_list)
            ("delete", cond_str)
            ("update", assigns_dict, cond_str)

        Each table's change commits through its OWN optimistic loop
        (so single-table writers serialize with it normally), then one
        catalog entry publishes every new version together. Catalog
        readers see all of the transaction or none of it. Returns the
        catalog entry number."""
        new_pins: dict[str, int] = {}
        for name, spec in writes.items():
            t = self.table(name)
            kind = spec[0]
            if kind == "append":
                v = t.append(spec[1], max_retries=max_retries)
            elif kind == "merge":
                v = t.merge(spec[1], spec[2], max_retries=max_retries)
            elif kind == "merge_add":
                v = t.merge_add(spec[1], spec[2], max_retries=max_retries)
            elif kind == "delete":
                v = t.delete_where(spec[1], max_retries=max_retries)
            elif kind == "update":
                v = t.update_where(spec[1], spec[2],
                                   max_retries=max_retries)
            else:
                raise ValueError(f"unknown write kind {kind!r} for "
                                 f"table {name!r}")
            new_pins[name] = v
        # crash window the catalog contract closes: table versions are
        # committed but UNPINNED until the entry publishes — catalog
        # readers must keep serving the previous entry's pins
        crash_point("before_catalog_pin")
        return self._publish(new_pins)
