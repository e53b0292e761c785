"""SQL ``MERGE INTO`` surface for AcidTable — the statement form of the
mutation API.

Reference users write their mutations as SQL (the claim / transition
UPDATEs are embedded SQL strings, FileWorkerApp.scala:207-227), so the
engine's table format needs a MERGE statement, not just a Python method.
Spark's own parser accepts MERGE INTO only for catalogs implementing
row-level operations; this module provides the same surface for
AcidTable the way Delta first did — parse the statement, compile it to
ONE declarative Spark SQL SELECT, and commit the result through the
table's optimistic commit loop.

Grammar (ANSI subset — the clauses Delta/Iceberg users actually write)::

    MERGE INTO <target-name> [AS] <t-alias>
    USING <view-name | (subquery)> [AS] <s-alias>
    ON <condition>
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr [, ...]]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
        INSERT (cols) VALUES (exprs)]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN UPDATE SET ...]
    [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]

(`NOT MATCHED BY SOURCE` is the SQL:2023 / Delta 2.4 clause pair that
acts on target rows with no source match — full-snapshot sync in one
statement. At most one UPDATE and one DELETE per match class; their AND
conditions must be disjoint, as the compiled CASE checks UPDATE first.)

Compilation: both sides get a presence marker and meet in a single
FULL OUTER JOIN on the user's ON condition; every target column becomes
one CASE expression (matched+update-cond → the SET expression, matched
otherwise → current value, source-only → the INSERT expression), and the
WHERE clause drops DELETE-matched rows and source-only rows without an
insert clause. All user expressions pass through verbatim into Spark SQL
under their own aliases — Catalyst resolves, type-checks, and optimizes
them; this module never evaluates an expression itself.

Scale shape: identical to ``AcidTable.merge`` — one keyed shuffle for
the join (AQE broadcasts a small source), and the commit is the same
O(1) manifest swap. The ANSI cardinality rule (a target row matching
more than one source row is an error) is enforced with a cheap
aggregate on the join keys when ``check_cardinality`` is on (default);
on the touched-file-pruned path the check runs over the PRUNED subset
only (build() receives the touched frame), so its cost tracks the
statement, not the table; a caller who has already deduplicated the
source can turn the pass off entirely.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .acid import AcidTable, _partition_pins

_HEAD_RE = re.compile(
    r"^\s*MERGE\s+(?P<evolve>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
    r"INTO\s+(?P<target>[\w.]+)(?:\s+AS)?\s+(?P<talias>\w+)\s+"
    r"USING\s+", re.IGNORECASE | re.DOTALL)

_TAIL_RE = re.compile(
    r"^\s*(?:AS\s+)?(?P<salias>\w+)\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>(?:\s+WHEN\s+(?:NOT\s+)?MATCHED\b.*)?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+BY\s+(?P<by>SOURCE|TARGET))?"
    r"\s*(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s*\*|"
    r"INSERT\s*\(.+?\)\s*"
    r"VALUES\s*\(.+?\))\s*(?=WHEN\s+(?:NOT\s+)?MATCHED|$)",
    re.IGNORECASE | re.DOTALL)


@dataclass
class _Merge:
    target: str
    t_alias: str
    source: str
    s_alias: str
    on: str
    update_cond: str | None = None
    update_set: dict = field(default_factory=dict)
    delete_cond: str | None = None        # "TRUE" when unconditional
    insert_cond: str | None = None
    insert_cols: list = field(default_factory=list)
    insert_vals: list = field(default_factory=list)
    # WHEN NOT MATCHED BY SOURCE — acts on target-only rows
    nmbs_update_cond: str | None = None
    nmbs_update_set: dict = field(default_factory=dict)
    nmbs_delete_cond: str | None = None
    # MERGE WITH SCHEMA EVOLUTION (Delta syntax): source-only columns
    # widen the target schema in the same commit
    evolve: bool = False


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses (SET a = f(x, y))."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def parse_merge(stmt: str) -> _Merge:
    head = _HEAD_RE.match(stmt)
    if not head:
        raise ValueError(f"not a MERGE INTO statement: {stmt[:80]!r}")
    rest = stmt[head.end():]
    if rest.startswith("("):               # (subquery) — balanced parens
        depth = 0
        for i, ch in enumerate(rest):
            depth += 1 if ch == "(" else (-1 if ch == ")" else 0)
            if depth == 0:
                break
        else:
            raise ValueError("unbalanced parentheses in MERGE source")
        source, rest = rest[:i + 1], rest[i + 1:]
    else:
        sm = re.match(r"[\w.]+", rest)
        if not sm:
            raise ValueError("missing MERGE source")
        source, rest = sm.group(0), rest[sm.end():]
    tail = _TAIL_RE.match(rest)
    if not tail:
        raise ValueError(f"malformed MERGE statement after USING: "
                         f"{rest[:80]!r}")
    g = tail.groupdict()
    merge = _Merge(target=head.group("target"), t_alias=head.group("talias"),
                   source=source, s_alias=g["salias"],
                   on=g["on"].strip(),
                   evolve=bool(head.group("evolve")))
    for c in _CLAUSE_RE.finditer(g["clauses"] or ""):
        is_not = bool(c.group("not"))
        by = (c.group("by") or "").upper() or None
        if by and not is_not:
            raise ValueError("BY SOURCE/TARGET requires WHEN NOT MATCHED")
        by_source = is_not and by == "SOURCE"      # target-only rows
        cond = (c.group("cond") or "").strip() or None
        action = c.group("action").strip()
        upper = action.upper()
        if upper.startswith("UPDATE"):
            if is_not and not by_source:
                raise ValueError("WHEN NOT MATCHED [BY TARGET] "
                                 "cannot UPDATE")
            body = action[action.upper().index("SET") + 3:]
            if body.strip() == "*":
                # Delta's UPDATE SET * — every target column takes the
                # source's same-named column; expanded at compile time
                # when the target schema is known
                if by_source:
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE cannot UPDATE "
                        "SET * (there is no source row)")
                assigns = {"*": "*"}
            else:
                assigns = {}
                for a in _split_top_level(body):
                    col, expr = a.split("=", 1)
                    assigns[col.strip().lower()] = expr.strip()
            if by_source:
                merge.nmbs_update_cond = cond or "TRUE"
                merge.nmbs_update_set = assigns
            else:
                merge.update_cond = cond or "TRUE"
                merge.update_set = assigns
        elif upper == "DELETE":
            if is_not and not by_source:
                raise ValueError("WHEN NOT MATCHED [BY TARGET] "
                                 "cannot DELETE")
            if by_source:
                merge.nmbs_delete_cond = cond or "TRUE"
            else:
                merge.delete_cond = cond or "TRUE"
        elif upper.startswith("INSERT"):
            if not is_not or by_source:
                raise ValueError(
                    "INSERT requires WHEN NOT MATCHED [BY TARGET]")
            merge.insert_cond = cond or "TRUE"
            if re.fullmatch(r"INSERT\s*\*", action, re.IGNORECASE):
                # Delta's INSERT * — every target column from the
                # source's same-named column (compile-time expansion)
                merge.insert_cols = ["*"]
                merge.insert_vals = ["*"]
            else:
                cols_part, vals_part = re.split(
                    r"\)\s*VALUES\s*\(", action[
                        action.index("(") + 1:].rstrip()[:-1],
                    flags=re.IGNORECASE)
                merge.insert_cols = [c2.strip().lower()
                                     for c2 in _split_top_level(cols_part)]
                merge.insert_vals = _split_top_level(vals_part)
        else:                                        # pragma: no cover
            raise ValueError(f"unsupported MERGE action: {action[:40]!r}")
    if merge.insert_cols and \
            len(merge.insert_cols) != len(merge.insert_vals):
        raise ValueError("INSERT column/value count mismatch")
    return merge


_EQUI_RE = re.compile(r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")


def _equi_pairs(mg: _Merge) -> list[tuple[str, str]] | None:
    """[(target_col, source_col)] when the ON clause is a flat
    conjunction of alias-qualified column equalities between the two
    sides — the shape that admits touched-file pruning. None otherwise
    (any parenthesized / non-equi / same-side term falls back to the
    full-outer rewrite, which is always correct)."""
    if "(" in mg.on:
        return None
    pairs = []
    t, s = mg.t_alias.lower(), mg.s_alias.lower()
    for term in re.split(r"\s+AND\s+", mg.on, flags=re.IGNORECASE):
        m = _EQUI_RE.match(term)
        if not m:
            return None
        la, lc, ra, rc = m.groups()
        if la.lower() == t and ra.lower() == s:
            pairs.append((lc, rc))
        elif la.lower() == s and ra.lower() == t:
            pairs.append((rc, lc))
        else:
            return None
    return pairs or None


def merge_into_sql(spark: SparkSession, stmt: str,
                   tables: dict[str, AcidTable],
                   check_cardinality: bool = True) -> int:
    """Execute a ``MERGE INTO`` statement against a registered AcidTable.

    ``tables`` maps the statement's target name to its AcidTable; the
    source may be any temp view / catalog table name or an inline
    ``(subquery)``. Returns the committed version."""
    mg = parse_merge(stmt)
    if mg.target not in tables:
        raise ValueError(f"unknown MERGE target {mg.target!r}; "
                         f"registered: {sorted(tables)}")
    table = tables[mg.target]
    uid = uuid.uuid4().hex[:8]
    tv = f"__merge_t_{uid}"
    tp, sp = "__tp", "__sp"
    t, s = mg.t_alias, mg.s_alias

    src0 = (mg.source if mg.source.startswith("(")
            else f"(SELECT * FROM {mg.source})")
    # MERGE WITH SCHEMA EVOLUTION: resolve the source's schema once so
    # build() can widen the target with source-only columns (the
    # AcidTable._widen_target contract — type-checked, NULL-filled)
    src_schema = (spark.sql(f"SELECT * FROM {src0} __s LIMIT 0")
                  if mg.evolve else None)

    def build(cur: DataFrame) -> DataFrame:
        if src_schema is not None:
            cur = table._widen_target(cur, src_schema, "merge_sql")
        cur.createOrReplaceTempView(tv)
        dtypes = dict(cur.dtypes)
        src = mg.source if mg.source.startswith("(") else f"(SELECT * FROM {mg.source})"
        t_side = f"(SELECT *, 1 AS {tp} FROM {tv}) AS {t}"
        s_side = f"(SELECT *, 1 AS {sp} FROM {src} __src) AS {s}"
        matched = f"{t}.{tp} IS NOT NULL AND {s}.{sp} IS NOT NULL"
        if check_cardinality:
            # ANSI rule: no target ROW may match two source rows. The
            # grouping key is a per-row id, not the value columns — two
            # legitimately identical target rows each matching one
            # source row must NOT trip the check.
            t_chk = (f"(SELECT *, monotonically_increasing_id() AS __rid "
                     f"FROM {tv}) AS {t}")
            dup = spark.sql(
                f"SELECT count(*) AS n FROM {t_chk} JOIN {s_side} "
                f"ON {mg.on} GROUP BY {t}.__rid "
                f"HAVING count(*) > 1 LIMIT 1").take(1)
            if dup:
                raise ValueError(
                    "MERGE cardinality violation: a target row matches "
                    "multiple source rows")
        t_only = f"{t}.{tp} IS NOT NULL AND {s}.{sp} IS NULL"
        # star shorthands expand HERE, where the target schema is known:
        # SET * / INSERT * take every target column from the source's
        # same-named column (Delta semantics; Catalyst raises on a
        # source missing one)
        upd_set = mg.update_set
        if upd_set.get("*") == "*":
            upd_set = {c.lower(): f"{s}.{c}" for c in cur.columns}
        ins_cols, ins_vals = mg.insert_cols, mg.insert_vals
        if ins_cols == ["*"]:
            ins_cols = [c.lower() for c in cur.columns]
            ins_vals = [f"{s}.{c}" for c in cur.columns]
        proj = []
        for c in cur.columns:
            upd = upd_set.get(c, f"{t}.{c}")
            nmbs_upd = mg.nmbs_update_set.get(c, f"{t}.{c}")
            if ins_cols and c in ins_cols:
                ins = ins_vals[ins_cols.index(c)]
            else:
                ins = f"CAST(NULL AS {dtypes[c]})"
            proj.append(
                f"CASE WHEN {matched} AND ({mg.update_cond or 'FALSE'}) "
                f"THEN ({upd}) "
                f"WHEN {t_only} AND ({mg.nmbs_update_cond or 'FALSE'}) "
                f"THEN ({nmbs_upd}) "
                f"WHEN {t}.{tp} IS NOT NULL THEN {t}.{c} "
                f"ELSE ({ins}) END AS {c}")
        keep = (f"CASE WHEN {matched} THEN NOT ({mg.delete_cond or 'FALSE'}) "
                f"WHEN {t_only} "
                f"THEN NOT ({mg.nmbs_delete_cond or 'FALSE'}) "
                f"ELSE ({mg.insert_cond or 'FALSE'}) END")
        return spark.sql(
            f"SELECT {', '.join(proj)} FROM {t_side} "
            f"FULL OUTER JOIN {s_side} ON {mg.on} WHERE {keep}")

    try:
        # Delta's MERGE pruning: with a flat equi-join ON and no
        # NOT-MATCHED-BY-SOURCE clause (those act on target rows
        # EVERYWHERE, so every file is touched by definition), only
        # files sharing a join key with the source can change — rewrite
        # just those through the same compiled statement; unmatched
        # source rows still insert out of the full-outer join over the
        # touched subset
        widening = src_schema is not None and any(
            c not in {tc.lower() for tc in table.snapshot()[1].columns}
            for c in (cc.lower() for cc in src_schema.columns))
        pairs = _equi_pairs(mg)
        if pairs and not mg.nmbs_update_set \
                and mg.nmbs_delete_cond is None and not widening:
            src = (mg.source if mg.source.startswith("(")
                   else f"(SELECT * FROM {mg.source})")
            sel = ", ".join(f"{mg.s_alias}.{sc} AS {tc}"
                            for tc, sc in pairs)
            src_keys = spark.sql(
                f"SELECT DISTINCT {sel} FROM {src} {mg.s_alias}")
            tcols = [tc for tc, _ in pairs]
            # on a partitioned target whose partition columns are all
            # join keys, prune the find pass to the partitions the
            # source batch actually names — metadata-first discipline
            part_in = table._partition_tuples_of(src_keys)
            return table._cow_commit(
                probe=lambda df: df.join(src_keys, tcols, "semi"),
                rewrite=build, op="merge_sql", empty_noop=False,
                partition_in=part_in)
        return table._commit_loop(build, "merge_sql")
    finally:
        spark.catalog.dropTempView(tv)


_VERSION_AS_OF_RE = re.compile(
    r"(?P<tbl>[\w.]+)\s+(?:FOR\s+)?VERSION\s+AS\s+OF\s+(?P<v>\d+)",
    re.IGNORECASE)

_TIMESTAMP_AS_OF_RE = re.compile(
    r"(?P<tbl>[\w.]+)\s+(?:FOR\s+)?TIMESTAMP\s+AS\s+OF\s+"
    r"'(?P<ts>[^']+)'", re.IGNORECASE)

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[\w.]+)"
    r"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<tbl>[\w.]+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<cond>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)


def delete_sql(spark: SparkSession, stmt: str,
               tables: dict[str, AcidTable]) -> int:
    """``DELETE FROM <t> [WHERE cond]`` as one atomic commit: the new
    snapshot keeps exactly the rows the predicate does NOT match —
    no row locks, old versions stay readable. Served by the
    file-pruned copy-on-write path (AcidTable.delete_where): only
    files holding a matching row are rewritten, the rest carry over
    by reference. Returns the committed version."""
    m = _DELETE_RE.match(stmt)
    if not m:
        raise ValueError(f"not a DELETE statement: {stmt[:80]!r}")
    name, cond = m.group("tbl"), (m.group("cond") or "TRUE").strip()
    if name not in tables:
        raise ValueError(f"unknown DELETE target {name!r}")
    t = tables[name]
    if t.dv_enabled() and cond != "TRUE":
        # enableDeletionVectors: merge-on-read for SELECTIVE deletes
        # only. An unconditional DELETE FROM t (no WHERE) or one whose
        # match exceeds half the live rows takes copy-on-write instead —
        # a table-sized vector would tax every later read with a
        # table-sized anti-join (Delta's large-delete rule).
        m = t._manifest(t.latest_version())
        live = sum(f.get("rows", 0) for f in (m.get("files") or [])) \
            - m.get("dv_rows", 0)
        return t.delete_where_mor(cond, cow_fallback_rows=max(1, live // 2))
    return t.delete_where(cond, op="delete_sql")


def update_sql(spark: SparkSession, stmt: str,
               tables: dict[str, AcidTable]) -> int:
    """``UPDATE <t> SET col = expr [, ...] [WHERE cond]`` as one atomic
    commit: every column becomes a CASE over the predicate — a pure
    narrow transformation, no shuffle at all. Served by the file-pruned
    copy-on-write path (AcidTable.update_where): files with no matching
    row are provably unchanged and carry over by reference. Returns
    the committed version."""
    m = _UPDATE_RE.match(stmt)
    if not m:
        raise ValueError(f"not an UPDATE statement: {stmt[:80]!r}")
    name, cond = m.group("tbl"), (m.group("cond") or "TRUE").strip()
    if name not in tables:
        raise ValueError(f"unknown UPDATE target {name!r}")
    assigns = {}
    for a in _split_top_level(m.group("sets")):
        col, expr = a.split("=", 1)
        assigns[col.strip().lower()] = expr.strip()
    t = tables[name]
    if t.dv_enabled() and cond != "TRUE":
        # enableDeletionVectors: merge-on-read UPDATE (old images die
        # by vector entry, new images append — O(matched rows)); bulk
        # updates fall back to copy-on-write, same rule as DELETE
        mf = t._manifest(t.latest_version())
        live = sum(f.get("rows", 0) for f in (mf.get("files") or [])) \
            - mf.get("dv_rows", 0)
        return t.update_where_mor(assigns, cond,
                                  cow_fallback_rows=max(1, live // 2))
    return t.update_where(assigns, cond, op="update_sql")


_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)\s+ADD\s+CONSTRAINT\s+"
    r"(?P<name>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)\s+DROP\s+CONSTRAINT\s+"
    r"(?P<name>\w+)\s*;?\s*$", re.IGNORECASE)

_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<tbl>[\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+"
    r"(?P<v>\d+)\s*;?\s*$", re.IGNORECASE)

_RESTORE_TS_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<tbl>[\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF"
    r"\s+'(?P<ts>[^']+)'\s*;?\s*$", re.IGNORECASE)

#: Delta's table_changes('t', a[, b]) table-valued function — rewritten
#: to a bound snapshot of read_changes(a, b)
_TABLE_CHANGES_RE = re.compile(
    r"table_changes\s*\(\s*'(?P<tbl>[\w.]+)'\s*,\s*(?P<a>\d+)"
    r"\s*(?:,\s*(?P<b>\d+)\s*)?\)", re.IGNORECASE)

_HISTORY_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<tbl>[\w.]+)\s*;?\s*$", re.IGNORECASE)

_SHOW_PARTITIONS_RE = re.compile(
    r"^\s*SHOW\s+PARTITIONS\s+(?P<tbl>[\w.]+)\s*;?\s*$", re.IGNORECASE)

_DETAIL_RE = re.compile(
    r"^\s*DESCRIBE\s+DETAIL\s+(?P<tbl>[\w.]+)\s*;?\s*$", re.IGNORECASE)

_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<tbl>[\w.]+)"
    r"(?:"
    # with a clustering clause, WHERE may come before (Delta's order)
    # or after it
    r"(?:\s+WHERE\s+(?P<cond1>.+?))?"
    r"\s+(?P<kind>ZORDER|CLUSTER)\s+BY\s*"
    r"\(\s*(?P<cols>[\w.,\s]+?)\s*\)"
    r"(?:\s+WHERE\s+(?P<cond2>.+?))?"
    r"|"
    r"(?:\s+WHERE\s+(?P<cond3>.+?))?"        # plain [scoped] compact
    r")\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<tbl>[\w.]+)"
    r"(?:\s+RETAIN\s+(?P<keep>\d+(?:\.\d+)?)\s+"
    r"(?P<unit>VERSIONS|HOURS))?"
    r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
    re.IGNORECASE)

_CONVERT_RE = re.compile(
    r"^\s*CONVERT\s+TO\s+ACID\s+'(?P<src>[^']+)'\s+AS\s+(?P<tbl>\w+)"
    r"(?:\s+LOCATION\s+'(?P<loc>[^']+)')?\s*;?\s*$", re.IGNORECASE)

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<tbl>[\w.]+)"
    r"(?:\s*\((?P<cols>[\w,\s]+)\))?\s*"
    r"(?P<query>VALUES\s*\(.+|SELECT\b.+)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<tbl>[\w.]+)"
    r"(?:\s+PARTITIONED\s+BY\s*\(\s*(?P<pcols>[\w,\s]+?)\s*\))?"
    r"(?:\s+LOCATION\s+'(?P<loc>[^']+)')?"
    r"\s+AS\s+(?P<query>SELECT\b.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL)

_RENAME_COLUMN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*;?\s*$", re.IGNORECASE)

_DROP_COLUMN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)\s+DROP\s+COLUMNS?\s*"
    r"\(?\s*(?P<name>\w+)\s*\)?\s*;?\s*$", re.IGNORECASE)

_ADD_COLUMN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)\s+ADD\s+COLUMNS?\s*"
    r"\(?\s*(?P<name>\w+)\s+(?P<type>[\w()<>,\s]+?)\s*\)?\s*;?\s*$",
    re.IGNORECASE)


def insert_sql(spark: SparkSession, stmt: str,
               tables: dict[str, AcidTable]) -> int:
    """``INSERT INTO <t> [(cols)] VALUES (...), (...)`` or
    ``INSERT INTO <t> [(cols)] SELECT ...`` — the O(delta) linked
    append through the SQL front door. A named column list NULL-fills
    the unnamed columns (ANSI semantics); values are cast to the
    table's exact physical types; a SELECT source reads registered
    tables' snapshots through the same binder as the read path (so
    ``INSERT INTO a SELECT ... FROM b VERSION AS OF 2`` works).
    Returns the committed version."""
    m = _INSERT_RE.match(stmt)
    if not m:
        raise ValueError(f"not an INSERT statement: {stmt[:80]!r}")
    t = _lookup(tables, m.group("tbl"), "INSERT")
    query = m.group("query").strip()
    if query.upper().startswith("VALUES"):
        df = spark.sql(f"SELECT * FROM ({query})")
    else:
        df = _read_sql(spark, query, tables)
    schema = t.read().schema
    cols = m.group("cols")
    if cols:
        names = [c.strip() for c in cols.split(",")]
    else:
        names = [f.name for f in schema.fields]
    if len(names) != len(df.columns):
        raise ValueError(
            f"INSERT supplies {len(df.columns)} column(s) for "
            f"{len(names)} target column(s) {names}")
    unknown = {n.lower() for n in names} - \
        {f.name.lower() for f in schema.fields}
    if unknown:
        raise ValueError(f"INSERT INTO unknown column(s) {unknown}")
    df = df.toDF(*names)
    have = {c.lower() for c in df.columns}
    gen = {c.lower() for c in (t._props().get("generated") or {})}
    for f in schema.fields:
        if f.name.lower() not in have and f.name.lower() not in gen:
            # ANSI NULL-fill — but never for a GENERATED column: left
            # absent, append() computes it (Delta's write-time rule)
            df = df.withColumn(f.name, F.lit(None))
    present = {c.lower() for c in df.columns}
    out = df.select(*[F.col(f.name).cast(f.dataType).alias(f.name)
                      for f in schema.fields
                      if f.name.lower() in present])
    return t.append(out)


def ctas_sql(spark: SparkSession, stmt: str,
             tables: dict[str, AcidTable],
             base_dir=None) -> AcidTable:
    """``CREATE TABLE <name> [PARTITIONED BY (cols)]
    [LOCATION '<path>'] AS SELECT ...`` — CTAS onto a new AcidTable:
    the query reads registered tables' snapshots through the shared
    binder, the result becomes version 0 (partitioned when asked), and
    the new table is added to the ``tables`` registry so later
    statements in the session can address it. Location = the LOCATION
    clause, else ``base_dir/<name>``."""
    m = _CTAS_RE.match(stmt)
    if not m:
        raise ValueError(f"not a CREATE TABLE AS statement: {stmt[:80]!r}")
    name = m.group("tbl")
    if name in tables:
        raise ValueError(f"table {name!r} already registered")
    loc = m.group("loc")
    if loc is None:
        if base_dir is None:
            raise ValueError(
                "CREATE TABLE AS needs a LOCATION '<path>' clause or "
                "acid_sql(..., base_dir=...)")
        loc = str(Path(base_dir) / name)
    df = _read_sql(spark, m.group("query"), tables)
    pcols = ([c.strip() for c in m.group("pcols").split(",")]
             if m.group("pcols") else None)
    t = AcidTable.create(spark, loc, df, partition_by=pcols)
    tables[name] = t
    return t


def _lookup(tables: dict[str, AcidTable], name: str, verb: str) -> AcidTable:
    if name not in tables:
        raise ValueError(f"unknown {verb} target {name!r}; "
                         f"registered: {sorted(tables)}")
    return tables[name]


def acid_sql(spark: SparkSession, stmt: str,
             tables: dict[str, AcidTable],
             base_dir=None) -> DataFrame | int | AcidTable:
    """The table format's SQL front door — reference users write SQL, so
    AcidTable's full surface is reachable from one entry point:

    * ``MERGE INTO <t> ...`` → :func:`merge_into_sql` (returns the
      committed version);
    * ``DELETE FROM <t> [WHERE ...]`` / ``UPDATE <t> SET ... [WHERE
      ...]`` → :func:`delete_sql` / :func:`update_sql` — atomic
      row-level mutations (returns the committed version);
    * ``INSERT INTO <t> [(cols)] VALUES ... | SELECT ...`` →
      :func:`insert_sql` (O(delta) linked append);
      ``CREATE TABLE <n> [PARTITIONED BY (c)] [LOCATION 'p'] AS
      SELECT ...`` → :func:`ctas_sql` (registers the new table);
      ``ALTER TABLE <t> ADD COLUMN <name> <type>`` → pure-metadata
      schema widening (``AcidTable.add_column``);
    * ``DESCRIBE HISTORY <t>`` → the audit DataFrame;
      ``DESCRIBE DETAIL <t>`` / ``SHOW PARTITIONS <t>`` → table-level
      facts / per-partition census, both pure manifest metadata;
      ``OPTIMIZE <t> [ZORDER BY (cols)]`` → compact / relayout;
      ``VACUUM <t> [RETAIN n VERSIONS]`` → snapshot retention — the
      Delta maintenance-statement trio;
    * ``... <t> VERSION AS OF n ...`` (Delta spelling; Iceberg's
      ``FOR VERSION AS OF`` accepted too) → each time-travel reference
      is bound to that registered table's snapshot ``n`` as a temp view
      and the rewritten statement runs through ``spark.sql`` — any
      number of versions of any number of tables in one query (e.g. a
      self-join diffing v0 against v2); ``<t> TIMESTAMP AS OF
      '<iso-8601>'`` resolves through each manifest's commit timestamp
      to the version serving at that instant (Delta spelling);
    * anything else → ``spark.sql(stmt)`` with each registered table's
      LATEST snapshot bound under its name.

    Rewrites are name-scoped to the ``tables`` registry — unknown names
    in a VERSION AS OF clause raise rather than silently reading a
    catalog table of the same name."""
    if re.match(r"\s*MERGE\s+(?:WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\b",
                stmt, re.IGNORECASE):
        return merge_into_sql(spark, stmt, tables)
    if re.match(r"\s*DELETE\s+FROM\b", stmt, re.IGNORECASE):
        return delete_sql(spark, stmt, tables)
    if re.match(r"\s*UPDATE\b", stmt, re.IGNORECASE):
        return update_sql(spark, stmt, tables)
    if re.match(r"\s*INSERT\s+INTO\b", stmt, re.IGNORECASE):
        return insert_sql(spark, stmt, tables)
    m = _CTAS_RE.match(stmt)
    if m:                                # CREATE TABLE ... AS SELECT
        return ctas_sql(spark, stmt, tables, base_dir=base_dir)
    m = _ADD_COLUMN_RE.match(stmt)
    if m:                                # ALTER TABLE ADD COLUMN
        return _lookup(tables, m.group("tbl"), "ALTER TABLE") \
            .add_column(m.group("name"), m.group("type").strip())
    m = _RENAME_COLUMN_RE.match(stmt)
    if m:                                # ALTER TABLE RENAME COLUMN
        return _lookup(tables, m.group("tbl"), "ALTER TABLE") \
            .rename_column(m.group("old"), m.group("new"))
    m = _DROP_COLUMN_RE.match(stmt)
    if m:                                # ALTER TABLE DROP COLUMN
        return _lookup(tables, m.group("tbl"), "ALTER TABLE") \
            .drop_column(m.group("name"))
    m = _ADD_CONSTRAINT_RE.match(stmt)
    if m:                                # ALTER TABLE ADD CONSTRAINT
        return _lookup(tables, m.group("tbl"), "ALTER TABLE") \
            .add_constraint(m.group("name"), m.group("expr").strip())
    m = _DROP_CONSTRAINT_RE.match(stmt)
    if m:                                # ALTER TABLE DROP CONSTRAINT
        return _lookup(tables, m.group("tbl"), "ALTER TABLE") \
            .drop_constraint(m.group("name"))
    m = _RESTORE_RE.match(stmt)
    if m:                                # RESTORE TABLE <t> TO VERSION
        return _lookup(tables, m.group("tbl"), "RESTORE") \
            .restore(int(m.group("v")))
    m = _RESTORE_TS_RE.match(stmt)
    if m:                                # RESTORE TABLE <t> TO TIMESTAMP
        t = _lookup(tables, m.group("tbl"), "RESTORE")
        return t.restore(t.version_at(m.group("ts")))
    m = _HISTORY_RE.match(stmt)
    if m:                                # DESCRIBE HISTORY <t>
        return _lookup(tables, m.group("tbl"), "DESCRIBE HISTORY").history()
    m = _SHOW_PARTITIONS_RE.match(stmt)
    if m:                                # SHOW PARTITIONS <t>
        return _lookup(tables, m.group("tbl"),
                       "SHOW PARTITIONS").partitions()
    m = _DETAIL_RE.match(stmt)
    if m:                                # DESCRIBE DETAIL <t>
        return _lookup(tables, m.group("tbl"), "DESCRIBE DETAIL").detail()
    m = _OPTIMIZE_RE.match(stmt)
    if m:  # OPTIMIZE <t> [ZORDER|CLUSTER BY (cols)] [WHERE part pins]
        t = _lookup(tables, m.group("tbl"), "OPTIMIZE")
        cols = m.group("cols")
        cond = m.group("cond1") or m.group("cond2") or m.group("cond3")
        pins = None
        if cond:
            pins = _partition_pins(cond, t.partition_cols())
            if not pins:
                raise ValueError(
                    f"OPTIMIZE WHERE must pin partition column(s) "
                    f"{t.partition_cols()} with equality conjuncts; "
                    f"got {cond!r}")
            if not cols:
                return t.compact_partition(pins)
        if cols:
            names = [c.strip() for c in cols.split(",")]
            if (m.group("kind") or "").upper() == "CLUSTER":
                # Delta liquid clustering's OPTIMIZE: rewrite only the
                # files not already clustered on these keys (scoped to
                # the pinned partitions when WHERE is given)
                return t.optimize_incremental(names,
                                              partition_pins=pins)
            if len(names) >= 2:
                # true Morton curve with built-in incremental
                # maintenance: only unstamped arrivals rewrite
                return t.zorder(names, partition_pins=pins)
            if pins:
                raise ValueError(
                    "OPTIMIZE WHERE ... ZORDER BY needs >=2 columns "
                    "(single-column scoped maintenance is CLUSTER BY)")
            return t.relayout(names)
        return t.compact()
    m = _VACUUM_RE.match(stmt)
    if m:        # VACUUM <t> [RETAIN n VERSIONS | n HOURS] [DRY RUN]
        t = _lookup(tables, m.group("tbl"), "VACUUM")
        unit = (m.group("unit") or "VERSIONS").upper()
        dry = bool(m.group("dry"))
        if m.group("keep") and unit == "HOURS":
            would = t.vacuum(retain_hours=float(m.group("keep")),
                             dry_run=dry)
        else:
            keep = int(float(m.group("keep"))) if m.group("keep") else 2
            would = t.vacuum(keep_last=keep, dry_run=dry)
        if dry:      # Delta's DRY RUN: report, touch nothing
            return would
        return t.latest_version()
    m = _CONVERT_RE.match(stmt)
    if m:                    # CONVERT TO ACID '<dir>' AS <name>
        name = m.group("tbl")
        if name in tables:
            raise ValueError(f"table {name!r} already registered")
        loc = m.group("loc")
        if loc is None:
            if base_dir is None:
                raise ValueError(
                    "CONVERT TO ACID needs a LOCATION '<path>' clause "
                    "or acid_sql(..., base_dir=...)")
            loc = str(Path(base_dir) / name)
        t = AcidTable.convert(spark, m.group("src"), loc)
        tables[name] = t
        return t
    return _read_sql(spark, stmt, tables)


_TARGET_RES = [re.compile(p, re.IGNORECASE) for p in (
    r"^\s*MERGE\s+(?:WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+"
    r"(?P<tbl>[\w.]+)",
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[\w.]+)",
    r"^\s*UPDATE\s+(?P<tbl>[\w.]+)",
    r"^\s*INSERT\s+INTO\s+(?P<tbl>[\w.]+)",
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.]+)",
    r"^\s*RESTORE\s+TABLE\s+(?P<tbl>[\w.]+)",
    r"^\s*OPTIMIZE\s+(?P<tbl>[\w.]+)",
)]


def _stmt_target(stmt: str) -> str | None:
    for r in _TARGET_RES:
        m = r.match(stmt)
        if m:
            return m.group("tbl")
    return None


def _split_statements(block: str) -> list[str]:
    """';'-separated statements, quote-aware; BEGIN/COMMIT/END wrapper
    tokens are dropped."""
    out, cur, q = [], [], None
    for ch in block:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in ("'", '"'):
            q = ch
            cur.append(ch)
        elif ch == ";":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [s.strip() for s in out
            if s.strip() and s.strip().upper() not in
            ("BEGIN", "COMMIT", "END")]


def acid_sql_txn(spark: SparkSession, stmts,
                 catalog) -> int:
    """``BEGIN ... COMMIT`` for the SQL front door — the reference's
    PL/pgSQL transaction (StreamingApp.scala:223-256) at CATALOG level:
    every statement executes through :func:`acid_sql` against the
    catalog's tables (each commit via its table's own optimistic loop),
    then ONE catalog entry publishes all touched tables' new versions
    together — a reader resolving tables through ``catalog.read`` sees
    the whole transaction or none of it. (Direct AcidTable reads remain
    read-committed per table — the documented AcidCatalog contract; a
    writer that dies mid-block leaves committed but UNPINNED table
    versions, invisible through the catalog and never torn.)

    ``stmts``: a list of statements, or a single string of
    ';'-separated statements optionally wrapped in BEGIN/COMMIT.
    ``CREATE TABLE ... AS`` inside a block lands under the catalog's
    tables dir and its v0 joins the same entry. Returns the published
    catalog entry number."""
    if isinstance(stmts, str):
        stmts = _split_statements(stmts)
    tables = {name: catalog.table(name) for name in catalog.snapshot()}
    pins: dict[str, int] = {}
    for stmt in stmts:
        tgt = _stmt_target(stmt)
        res = acid_sql(spark, stmt, tables, base_dir=catalog._tables)
        if isinstance(res, AcidTable):               # CTAS in the block
            m = _CTAS_RE.match(stmt)
            pins[m.group("tbl")] = res.latest_version()
        elif isinstance(res, int) and tgt:
            pins[tgt] = max(res, pins.get(tgt, -1))
    if not pins:
        raise ValueError("transaction block committed nothing "
                         "(no DML/DDL statement with a target)")
    return catalog._publish(pins)


_SQL_TOKEN_RE = re.compile(
    r"'(?:[^']|'')*'"         # single-quoted string ('' escape)
    r'|"(?:[^"]|"")*"'        # double-quoted identifier
    r"|`[^`]*`"               # backquoted identifier
    r"|--[^\n]*"              # line comment
    r"|/\*.*?\*/"             # block comment
    r"|[A-Za-z_][\w$]*"       # bare word
    r"|\S",                   # any other single char
    re.S)

# keywords that put the parser in "next word is a table reference"
_TABLE_ARMS = {"from", "join", "into", "update", "table"}
# words allowed BETWEEN a FROM-item and the JOIN keyword without
# leaving the from-clause (so `LEFT OUTER JOIN x` still arms on JOIN)
_JOIN_MODS = {"inner", "left", "right", "full", "outer", "cross",
              "semi", "anti", "natural", "lateral", "as"}
# clause keywords that END the from-clause (a comma after these is a
# select-list comma, never a table separator)
_CLAUSE_RESETS = {"select", "where", "group", "order", "having",
                  "limit", "on", "set", "union", "intersect", "except",
                  "window", "values", "when", "qualify", "distribute",
                  "sort", "cluster"}


def _rewrite_table_refs(sql: str, names, repl) -> str:
    """Rewrite registered-table names to bound views ONLY where they
    are table references — after FROM / JOIN / INTO / UPDATE / TABLE,
    and after commas in a FROM list. Quote-aware: string literals,
    quoted identifiers, and comments pass through untouched; columns
    that share a table's name (``SELECT hw FROM hw``), aliases, and
    dotted field accesses (``t.hw``) are never rewritten. WITH-clause
    CTE names shadow registered tables, matching standard SQL scoping:
    a (non-recursive) CTE's name is visible only AFTER its own body
    closes, so ``WITH hw AS (SELECT * FROM hw ...)`` still rewrites the
    inner ``hw`` to the registered table (the outer scope), while later
    references resolve to the CTE. ``WITH RECURSIVE`` names shadow
    inside their own body too. Qualified references (``FROM hw.tbl``)
    are left untouched — the bare registered name is only an implicit
    match when it IS the whole table reference.
    ``repl(name)`` is called lazily on first real reference (it binds
    the snapshot view); names never referenced bind nothing.

    A rewritten reference with NO alias of its own gets ``AS <name>``
    appended (deferred one token, to see whether an alias follows) —
    the original name is a table's implicit alias, and qualified
    column references like ``u.id`` must keep resolving."""
    low_names = {n.lower(): n for n in names}
    nonalias = (_TABLE_ARMS | _CLAUSE_RESETS
                | (_JOIN_MODS - {"as"}) | {"using"})
    out: list[str] = []
    pos = 0
    expect_table = False      # next bare word is a table reference
    in_from = False           # inside a FROM list (commas re-arm)
    in_with = False           # inside a WITH prelude at depth 0
    expect_cte = False        # next bare word names a CTE
    cte_names: set[str] = set()
    recursive_with = False    # WITH RECURSIVE: self-name shadows early
    pending_cte: str | None = None   # declared, body not yet opened
    cte_saw_as = False        # saw AS since pending_cte (skips (a,b))
    # paren stack: entering a subquery suspends the outer from-state;
    # third slot = CTE name whose body this paren opened (visible to
    # the outer scope only once it closes)
    stack: list[tuple[bool, bool, str | None]] = []
    pending: tuple[int, str, str] | None = None  # (out idx, view, name)
    prev = ""

    def resolve(nxt_word: str | None) -> None:
        nonlocal pending
        idx, view, orig = pending
        has_alias = nxt_word is not None and (
            nxt_word == "as" or nxt_word not in nonalias)
        out[idx] = view if has_alias else f"{view} AS {orig}"
        pending = None

    for m in _SQL_TOKEN_RE.finditer(sql):
        tok = m.group(0)
        out.append(sql[pos:m.start()])
        pos = m.end()
        ch = tok[0]
        if ch == "'" or ch == '"' or ch == "`" \
                or tok.startswith("--") or tok.startswith("/*"):
            if pending:
                resolve(None)
            out.append(tok)
            prev = tok
            continue
        if ch.isalpha() or ch == "_":
            lw = tok.lower()
            if pending:
                resolve(lw)
            if expect_cte:
                if lw == "recursive" and not cte_names \
                        and pending_cte is None:
                    recursive_with = True   # keyword, not a CTE name
                elif recursive_with:
                    cte_names.add(lw)       # self-name shadows early
                    expect_cte = False
                else:
                    pending_cte, cte_saw_as = lw, False
                    expect_cte = False
            elif expect_table and prev != ".":
                if lw in low_names and lw not in cte_names:
                    out.append("")            # placeholder; resolved
                    pending = (len(out) - 1, repl(low_names[lw]), tok)
                    expect_table = False      # on the NEXT token
                    prev = tok
                    continue
                expect_table = False
            if lw == "with" and not stack:
                in_with, expect_cte = True, True
            elif lw in _TABLE_ARMS:
                expect_table = True
                if lw == "from":
                    in_from = True
                if not stack:
                    in_with = False
            elif lw in _CLAUSE_RESETS:
                expect_table, in_from = False, False
                if not stack:
                    in_with = False
            elif lw in _JOIN_MODS:
                if lw == "as" and pending_cte is not None and not stack:
                    cte_saw_as = True
        elif ch == "(":
            if pending:
                resolve(None)
            opens_cte = None
            if pending_cte is not None and not stack:
                if cte_saw_as:
                    opens_cte, pending_cte = pending_cte, None
                # else: the CTE's (col, ...) list — body paren follows
            stack.append((expect_table, in_from, opens_cte))
            expect_table, in_from = False, False
        elif ch == ")":
            if pending:
                resolve(None)
            if stack:
                _, in_from, closed_cte = stack.pop()
                if closed_cte is not None:
                    cte_names.add(closed_cte)   # visible from here on
            else:
                in_from = False
            expect_table = False          # the item just closed
        elif ch == ",":
            if pending:
                resolve(None)
            if in_from:
                expect_table = True       # FROM a, b
            elif in_with and not stack:
                expect_cte = True         # WITH a AS (...), b AS (...)
        elif ch == "." and pending:
            # qualifier, not a bare table ref: FROM hw.tbl — restore
            idx, _view, orig = pending
            out[idx] = orig
            pending = None
        elif pending:
            resolve(None)
        out.append(tok)
        prev = tok
    if pending:
        resolve(None)
    out.append(sql[pos:])
    return "".join(out)


def _read_sql(spark: SparkSession, stmt: str,
              tables: dict[str, AcidTable]) -> DataFrame:
    """The generic READ path: VERSION/TIMESTAMP AS OF references bind
    to their snapshots, every other registered-table reference binds to
    its latest snapshot — all under uuid-suffixed temp views with the
    statement's references rewritten, so user views are never
    shadowed."""
    bound: list[str] = []
    try:
        def bind(m: re.Match) -> str:
            name, v = m.group("tbl"), int(m.group("v"))
            if name not in tables:
                raise ValueError(
                    f"VERSION AS OF on unregistered table {name!r}; "
                    f"registered: {sorted(tables)}")
            view = f"__tt_{name}_{v}_{uuid.uuid4().hex[:6]}"
            tables[name].read(v).createOrReplaceTempView(view)
            bound.append(view)
            return view
        def bind_ts(m: re.Match) -> str:
            name, ts = m.group("tbl"), m.group("ts")
            if name not in tables:
                raise ValueError(
                    f"TIMESTAMP AS OF on unregistered table {name!r}; "
                    f"registered: {sorted(tables)}")
            v = tables[name].version_at(ts)
            view = f"__tt_{name}_{v}_{uuid.uuid4().hex[:6]}"
            tables[name].read(v).createOrReplaceTempView(view)
            bound.append(view)
            return view
        def bind_changes(m: re.Match) -> str:
            name = m.group("tbl")
            if name not in tables:
                raise ValueError(
                    f"table_changes on unregistered table {name!r}; "
                    f"registered: {sorted(tables)}")
            t = tables[name]
            a = int(m.group("a"))
            b = int(m.group("b")) if m.group("b") else t.latest_version()
            view = f"__tc_{name}_{uuid.uuid4().hex[:6]}"
            t.read_changes(a, b).createOrReplaceTempView(view)
            bound.append(view)
            return view
        rewritten = _TABLE_CHANGES_RE.sub(bind_changes, stmt)
        rewritten = _VERSION_AS_OF_RE.sub(bind, rewritten)
        rewritten = _TIMESTAMP_AS_OF_RE.sub(bind_ts, rewritten)
        # uuid-suffixed binding + TABLE-POSITION-ONLY reference rewrite
        # (the same scheme VERSION AS OF uses) — claiming the bare name
        # would silently overwrite, then delete, any user temp view
        # that happens to share it; and a blind \b-regex sub would also
        # hit string literals ('see hw') and columns sharing the
        # table's name (SELECT hw FROM hw), changing query semantics
        views: dict[str, str] = {}

        def bind_plain(name: str) -> str:
            if name not in views:
                view = f"__acid_{name}_{uuid.uuid4().hex[:6]}"
                tables[name].read().createOrReplaceTempView(view)
                bound.append(view)
                views[name] = view
            return views[name]

        rewritten = _rewrite_table_refs(rewritten, tables, bind_plain)
        return spark.sql(rewritten)
    finally:
        for v in bound:
            try:
                spark.catalog.dropTempView(v)
            except Exception:                      # noqa: BLE001
                pass                               # best-effort cleanup
