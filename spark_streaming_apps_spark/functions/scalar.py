"""Scalar column functions (SURVEY.md §2.B).

All JVM-side built-ins — no Python UDFs — so every expression stays inside
whole-stage codegen and the parquet scan keeps projection/predicate pushdown.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Regexes lifted from the reference's error-offset extraction
# (AutopsyWrapper.scala:64-71 and :90-97).
RE_INODE = r"ext2fs_dinode_load: Inode \d+ from (\d+)"
RE_ATTR = r"tsk_fs_attr_read_type: offset: (\d+)\s+Len: \d+"


def md5_hex(col) -> Column:
    """MD5 hex digest — reference HashUtil.scala:24-29 (DigestUtils.md5Hex),
    used for chunk dual-hash verification at StreamingApp.scala:377-380."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def parse_seq_from_name(col) -> Column:
    """Sequence number = integer after the last '.' in a filename —
    reference StreamingDiskUtil.scala:31,46
    (`Integer.parseInt(filename.substring(filename.lastIndexOf(".") + 1))`).
    Returns NULL (not an ANSI cast error) when no trailing int exists.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_extract(c, r"\.([0-9]+)$", 1), F.lit("")).cast("int")


def chunk_path(topic, filename) -> Column:
    """Shared-FS chunk output path — StreamingApp.scala:358
    (`dforcsShareDir + "/chunks/" + topic + "/" + block.getFilename`)."""
    t = F.col(topic) if isinstance(topic, str) else topic
    f = F.col(filename) if isinstance(filename, str) else filename
    return F.concat(F.lit("/chunks/"), t, F.lit("/"), f)


def topic_strip_case(col) -> Column:
    """Case name = topic minus the `topic_case_` prefix —
    StreamingApp.scala:274-277."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^topic_case_", "")


def extract_error_offset(col) -> Column:
    """Failing byte offset from a module error message, first of two regexes
    that matches — AutopsyWrapper.scala:64-71,90-97. NULL when neither hits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.nullif(F.regexp_extract(c, RE_INODE, 1), F.lit("")).cast("long"),
        F.nullif(F.regexp_extract(c, RE_ATTR, 1), F.lit("")).cast("long"),
    )


def synth_error_message(id_col: str, text_col: str) -> Column:
    """Deterministic synthetic module-output message used by fixtures to
    exercise both error regexes plus the no-match path."""
    i = F.col(id_col)
    return (
        F.when(i % 3 == 0,
               F.concat(F.lit("ext2fs_dinode_load: Inode "), i.cast("string"),
                        F.lit(" from "), (i * 512).cast("string")))
         .when(i % 3 == 1,
               F.concat(F.lit("tsk_fs_attr_read_type: offset: "),
                        (i * 4096).cast("string"), F.lit(" Len: 512")))
         .otherwise(F.col(text_col))
    )


def synth_error_message_sql(id_col: str, text_col: str) -> str:
    """DuckDB-SQL twin of :func:`synth_error_message` (oracle parity)."""
    return (
        f"CASE WHEN {id_col} % 3 = 0 THEN 'ext2fs_dinode_load: Inode ' || CAST({id_col} AS VARCHAR) || ' from ' || CAST({id_col} * 512 AS VARCHAR) "
        f"WHEN {id_col} % 3 = 1 THEN 'tsk_fs_attr_read_type: offset: ' || CAST({id_col} * 4096 AS VARCHAR) || ' Len: 512' "
        f"ELSE {text_col} END"
    )
