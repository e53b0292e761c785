"""Worker per-file pipeline analogs (SURVEY.md §2.I).

Reference: FileWorkerApp + AutopsyWrapper run each claimed file through an
ordered ingest-module pipeline (PipelineStreamProcessor.scala:123-147):
MD5 hash-set lookup (FileWorkerApp.scala:127-131), Solr keyword indexing
(PipelineStreamProcessor.scala:52,76-94), error classification + offset
regex (AutopsyWrapper.scala:60-101), and TSK file reconstruction from image
chunks (PipelineStreamProcessor.scala:117).

Spark-first: each module is a column expression (JVM, codegen) applied to the
whole DataFrame at once — set-oriented, not file-at-a-time. The hash lookup is
a broadcast semi/anti join against the hash-set dim; "Solr indexing" becomes
token/posting aggregation; file rebuild is an ordered per-group reassembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.scalar import extract_error_offset, synth_error_message


def pipeline_module_loop(documents: DataFrame) -> DataFrame:
    """Ordered module pipeline over every file — the set-oriented analog of
    `for module in fip.getModules(): module.process(abstractFile)`
    (PipelineStreamProcessor.scala:140-143). Modules: hash, token-count,
    keyword flag, quality gate; each stage feeds the next."""
    toks = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
    return (
        documents
        .withColumn("content_md5", F.md5("text"))                      # module 1: hash
        .withColumn("n_tokens", F.size(toks))                          # module 2: tokenize
        .withColumn("kw_hit", F.col("text").contains("spark").cast("int"))  # module 3: keyword
        .withColumn("passed",                                          # module 4: gate
                    ((F.col("n_tokens") > 10) & (F.col("n_chars") > 50)).cast("int"))
        .select("doc_id", "content_md5", "n_tokens", "kw_hit", "passed")
    )


def hash_lookup(documents: DataFrame, known: DataFrame,
                mode: str = "semi") -> DataFrame:
    """Hash-database lookup: file MD5 vs known-good/known-bad hash sets
    (ClusterHashDbIngestModule, FileWorkerApp.scala:127-131;
    AutopsyWrapper.scala:56-59). `known` is a small dim → broadcast
    semi-join (known-bad hits) or anti-join (unknowns); at 100 TB the fact
    side streams through executors with zero shuffle."""
    hashed = documents.withColumn("content_md5", F.md5("text"))
    how = "left_semi" if mode == "semi" else "left_anti"
    return hashed.join(F.broadcast(known), "content_md5", how) \
                 .select("doc_id", "content_md5")


def known_bad_set(documents: DataFrame) -> DataFrame:
    """Fixture hash-set dim: every 10th doc's MD5 plays the known-bad DB."""
    return (documents.filter(F.col("doc_id") % 10 == 0)
            .select(F.md5("text").alias("content_md5")))


def keyword_search(documents: DataFrame, keyword: str = "spark") -> DataFrame:
    """Keyword-search module analog (KeywordSearchIngestModule,
    PipelineStreamProcessor.scala:52,76-94): docs containing `keyword` with
    exact occurrence counts, computed by length delta — all JVM built-ins."""
    klen = len(keyword)
    n = ((F.octet_length("text")
          - F.octet_length(F.replace(F.col("text"), F.lit(keyword)))) / klen
         ).cast("int")
    return (documents.withColumn("n_hits", n)
            .filter(F.col("n_hits") > 0)
            .select("doc_id", "n_hits"))


def error_classify(documents: DataFrame) -> DataFrame:
    """Module-output error scan (AutopsyWrapper.scala:60-101): flag messages
    containing module error markers, extract the failing byte offset via the
    two reference regexes, and record (file_id, error_offset)."""
    msgs = documents.select(
        F.col("doc_id").alias("file_id"),
        synth_error_message("doc_id", "text").alias("msg"),
    )
    return msgs.select(
        "file_id",
        (F.col("msg").contains("ext2fs_dinode_load")
         | F.col("msg").contains("tsk_fs_attr_read_type")).cast("int").alias("has_error"),
        extract_error_offset("msg").alias("error_offset"),
    )


def file_rebuild(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Reassemble a logical blob from its ordered chunks — the capability
    behind TSK's JNI rebuild (PipelineStreamProcessor.scala:117,
    AutopsyWrapper.scala:50-54): per key, concatenate chunk payloads in
    sequence order. array_sort on (seq, payload) structs keeps the whole
    reassembly inside codegen; at scale this is one shuffle on the group key
    with bounded per-group size (cap blob size upstream)."""
    return (
        events.groupBy(key)
        .agg(F.array_sort(F.collect_list(F.struct("event_id", "event_type"))).alias("chunks"))
        .select(
            key,
            F.md5(F.array_join(F.transform("chunks", lambda c: c.event_type), ""))
             .alias("rebuilt_md5"),
            F.size("chunks").alias("n_chunks"),
        )
    )
