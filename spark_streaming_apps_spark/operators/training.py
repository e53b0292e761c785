"""Training-data curation operators: the sampling / mixing / packing /
scrubbing / decontamination stages a large-scale LLM pretraining pipeline
runs between raw ingest and tokenized shards.

Extends the reference's ingest-and-filter pipeline surface (the worker
module chain, FileWorkerApp.scala:140-240) with the curation stages that
operate on the `documents` corpus. Everything is deterministic — sampling
uses the portable MD5-derived hash (functions/hashing.py), so every stage
has an exact DuckDB oracle and reruns are reproducible, which is what makes
a 100 TB curation job auditable (rerun any shard, get the same bytes).

Scale notes: every operator here is scan-shaped or single-shuffle:
  stratified_sample / train_test_split / data_mixing   scan + hash filter
  pii_redact                                           scan + regex
  sequence_packing      one window per bucket key (bounded partitions)
  contamination_check   broadcast semi-join against the benchmark set
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from .dedup import MH_P, _TOKENS_DUCK, _with_shingle_hashes

#: stratified sampling: keep this % of each source stratum
SAMPLE_PCT = 30
SAMPLE_SEED = 11
#: train/test split: % of docs in train
SPLIT_PCT = 90
SPLIT_SEED = 23
#: data mixing: web sources are downsampled, curated sources upsampled
MIX_WEB_PCT = 40     # keep 40% of 'web' docs
MIX_CURATED_EPOCHS = 2  # repeat 'curated' docs twice
MIX_SEED = 31
#: sequence packing: token budget per packed sequence, parallel bucket count
PACK_BUDGET = 512
PACK_BUCKETS = 32
#: contamination: shingle-overlap count that flags a training doc
CONTAM_BENCH_MOD = 97
CONTAM_MIN_OVERLAP = 5


def _pct_bucket(col, seed: int) -> F.Column:
    """Deterministic 0-99 bucket from the portable hash — the sampling
    primitive (pmod keeps it non-negative on both engines)."""
    return F.pmod(portable_hash64(col, seed=seed), F.lit(100))


def _pct_bucket_sql(expr: str, seed: int) -> str:
    h = portable_hash64_sql(expr, seed=seed)
    return f"(({h} % 100) + 100) % 100"


# ------------------------------------------------------------------ sampling

def stratified_sample(documents: DataFrame) -> DataFrame:
    """Per-stratum deterministic sampling: every `source` stratum keeps the
    same SAMPLE_PCT% of its docs, selected by hash — no shuffle, no RNG
    state, stable under reruns and retries (a task re-execution at 100 TB
    must not change the sample)."""
    return (documents
            .filter(_pct_bucket(F.col("doc_id").cast("string"), SAMPLE_SEED)
                    < SAMPLE_PCT)
            .select("doc_id", "source"))


def stratified_sample_oracle_sql() -> str:
    return f"""
SELECT doc_id, source FROM documents
WHERE {_pct_bucket_sql("CAST(doc_id AS VARCHAR)", SAMPLE_SEED)} < {SAMPLE_PCT}
"""


def train_test_split(documents: DataFrame) -> DataFrame:
    """Deterministic {SPLIT_PCT}/{100-SPLIT_PCT} split with a leakage
    audit: the per-split doc counts plus a disjointness proof (distinct
    doc count == row count per split — a doc can hash into one side
    only)."""
    tagged = documents.select(
        "doc_id", "n_chars",
        F.when(_pct_bucket(F.col("doc_id").cast("string"), SPLIT_SEED)
               < SPLIT_PCT, "train").otherwise("test").alias("split"))
    return (tagged.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("doc_id").alias("n_distinct"),
                 F.sum("n_chars").alias("n_chars_total")))


def train_test_split_oracle_sql() -> str:
    return f"""
SELECT CASE WHEN {_pct_bucket_sql("CAST(doc_id AS VARCHAR)", SPLIT_SEED)}
            < {SPLIT_PCT} THEN 'train' ELSE 'test' END AS split,
       COUNT(*) AS n_docs, COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
FROM documents GROUP BY 1
"""


def data_mixing(documents: DataFrame) -> DataFrame:
    """Mixture construction: 'web' sources (src0-src9) are hash-downsampled
    to MIX_WEB_PCT%, 'curated' sources are repeated MIX_CURATED_EPOCHS
    times (epoch column distinguishes the copies so downstream shuffles
    keep them apart). This is the standard domain-weighting step; at scale
    the repeat factor is a per-domain config, not a code change."""
    domain = F.when(
        F.regexp_extract("source", r"src(\d+)", 1).cast("int") < 10, "web"
    ).otherwise("curated")
    tagged = documents.select("doc_id", "source", domain.alias("domain"))
    web = (tagged.filter(F.col("domain") == "web")
           .filter(_pct_bucket(F.col("doc_id").cast("string"), MIX_SEED)
                   < MIX_WEB_PCT)
           .select("doc_id", "domain", F.lit(0).alias("epoch")))
    curated = (tagged.filter(F.col("domain") == "curated")
               .select("doc_id", "domain",
                       F.explode(F.sequence(
                           F.lit(0), F.lit(MIX_CURATED_EPOCHS - 1))).alias("epoch")))
    return web.unionByName(curated)


def data_mixing_oracle_sql() -> str:
    return f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) < 10
              THEN 'web' ELSE 'curated' END AS domain
  FROM documents)
SELECT doc_id, domain, 0 AS epoch FROM tagged
WHERE domain = 'web'
  AND {_pct_bucket_sql("CAST(doc_id AS VARCHAR)", MIX_SEED)} < {MIX_WEB_PCT}
UNION ALL
SELECT doc_id, domain, epoch
FROM tagged, (SELECT unnest(generate_series(0, {MIX_CURATED_EPOCHS - 1})) AS epoch) e
WHERE domain = 'curated'
"""


# ------------------------------------------------------------------- packing

def sequence_packing(documents: DataFrame) -> DataFrame:
    """Concat-and-cut sequence packing map: docs are laid out in doc_id
    order inside PACK_BUCKETS hash buckets (the parallel unit — windows
    never see more than one bucket), every PACK_BUDGET tokens starts a new
    packed sequence, and each doc reports the pack range it lands in
    (first_pack..last_pack; a doc longer than the budget spans several).
    The output is the shard map a tokenizer worker consumes."""
    toks = documents.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_BUCKETS)).alias("bucket"),
        F.size(F.filter(F.split(F.lower("text"), r"\W+"),
                        lambda t: t != "")).alias("n_tokens"))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (toks
            .withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(w),
                                                F.lit(0)))
            .select("doc_id", "bucket", "n_tokens",
                    F.floor(F.col("start_tok") / PACK_BUDGET).alias("first_pack"),
                    F.floor((F.col("start_tok") + F.greatest(F.col("n_tokens"), F.lit(1))
                             - 1) / PACK_BUDGET).alias("last_pack")))


def sequence_packing_oracle_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_BUCKETS} AS bucket,
         len({_TOKENS_DUCK}) AS n_tokens
  FROM documents),
laid AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS start_tok
  FROM toks)
SELECT doc_id, bucket, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor(start_tok / {PACK_BUDGET}) AS BIGINT) AS first_pack,
       CAST(floor((start_tok + greatest(n_tokens, 1) - 1) / {PACK_BUDGET})
            AS BIGINT) AS last_pack
FROM laid
"""


# ------------------------------------------------------------------ scrubbing

RE_EMAIL = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
RE_PHONE = r"\(\d{3}\) \d{3}-\d{4}"


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrub: plant deterministic synthetic PII (the fixture corpus has
    none — every 7th doc gets an email, every 11th a phone number), then
    redact by regex and report what was found. The md5 of the redacted
    text pins the exact output bytes; n_* prove detector recall."""
    withpii = documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.lit(" call (555) 123-4567")).otherwise(F.lit(""))
        ).alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace("text", RE_EMAIL, "<EMAIL>"), RE_PHONE, "<PHONE>")
    return withpii.select(
        "doc_id",
        F.regexp_count("text", F.lit(RE_EMAIL)).alias("n_emails"),
        F.regexp_count("text", F.lit(RE_PHONE)).alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"))


def pii_redact_oracle_sql() -> str:
    email = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
    phone = r"\(\d{3}\) \d{3}-\d{4}"
    return f"""
WITH withpii AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0 THEN ' call (555) 123-4567' ELSE '' END
           AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{phone}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                          '{phone}', '<PHONE>', 'g')) AS redacted_md5
FROM withpii
"""


# ------------------------------------------------------------ decontamination

def contamination_check(documents: DataFrame) -> DataFrame:
    """Benchmark decontamination: docs whose 3-gram shingle sets overlap a
    held-out benchmark set (every {CONTAM_BENCH_MOD}th doc plays the
    benchmark) in >= {CONTAM_MIN_OVERLAP} shingles are flagged. The
    benchmark shingle set is small by construction, so the overlap count
    is a broadcast semi-join against the corpus shingles — the training
    corpus never shuffles. Reuses the dedup family's rolling shingle
    hashes (same hashes both engines)."""
    # benchmark side AND corpus side both read the exploded shingle
    # relation — materialize it once instead of re-hashing every token 2x
    from .dedup import _memo, _materialize
    sh = _memo(documents, "contam_shingles", lambda: _materialize(
        _with_shingle_hashes(documents.select("doc_id", "text"))
        .select("doc_id", F.explode("hs").alias("sh_h"))))
    bench = (sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
             .select("sh_h").distinct())
    overlap = (sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
               .join(F.broadcast(bench), "sh_h")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_overlap")))
    return overlap.select(
        "doc_id", "n_overlap",
        (F.col("n_overlap") >= CONTAM_MIN_OVERLAP).cast("int").alias("contaminated"))


def contamination_check_oracle_sql() -> str:
    from .dedup import _shingle_hash_ctes
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),{_shingle_hash_ctes()},
shx AS (SELECT doc_id, unnest(hs) AS sh_h FROM sh),
bench AS (SELECT DISTINCT sh_h FROM shx WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
SELECT doc_id, COUNT(*) AS n_overlap,
       CAST(COUNT(*) >= {CONTAM_MIN_OVERLAP} AS INT) AS contaminated
FROM shx JOIN bench USING (sh_h)
WHERE doc_id % {CONTAM_BENCH_MOD} != 0
GROUP BY doc_id
"""


# ------------------------------------------------------------ quality funnel

#: funnel thresholds (stage predicates are cumulative)
FUNNEL_MIN_CHARS = 200
FUNNEL_MIN_TOKENS = 30
FUNNEL_MAX_TOP_BIGRAM = 0.20
FUNNEL_MIN_ALPHA = 0.6


def quality_funnel(documents: DataFrame) -> DataFrame:
    """Per-stage survival counts of the curation filter chain — the
    audit report every corpus-curation run ships (how many docs each
    filter removed). Stages are cumulative: length → token count →
    repetition (top-bigram fraction) → alpha ratio.

    ONE scan for the per-doc flags + the repetition_stats-style keyed
    bigram count (explode → (doc_id, bigram) groupBy with map-side
    combine — NEVER the nested count-each-distinct lambda, which is
    O(len²) per doc), then a 1-row aggregate of flag products and an
    unpivot."""
    tk = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
    bigrams = F.expr(
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), "
        "(a, b) -> a || ' ' || b)")
    base = documents.withColumn("tk", tk)
    rep = (base.select("doc_id", F.explode(bigrams).alias("bg"))
           .groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id")
           .agg((F.max("c") / F.sum("c").cast("double")).alias("top_frac")))
    flags = (base
             .withColumn("len_ok",
                         (F.octet_length("text") >= FUNNEL_MIN_CHARS).cast("long"))
             .withColumn("tok_ok", (F.size("tk") >= FUNNEL_MIN_TOKENS).cast("long"))
             .join(rep, "doc_id", "left")
             .withColumn(
                 "rep_ok",
                 F.when(F.col("top_frac").isNull(), F.lit(0))
                  .otherwise((F.col("top_frac") <= FUNNEL_MAX_TOP_BIGRAM)
                             .cast("long")))
             .withColumn(
                 "alpha_ok",
                 (F.octet_length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
                  / F.octet_length("text").cast("double")
                  >= FUNNEL_MIN_ALPHA).cast("long")))
    agg = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum("len_ok").alias("s1"),
        F.sum(F.col("len_ok") * F.col("tok_ok")).alias("s2"),
        F.sum(F.col("len_ok") * F.col("tok_ok") * F.col("rep_ok")).alias("s3"),
        F.sum(F.col("len_ok") * F.col("tok_ok") * F.col("rep_ok")
              * F.col("alpha_ok")).alias("s4"))
    return agg.selectExpr(
        "stack(5, 0, 'ingest', s0, 1, 'min_length', s1, 2, 'min_tokens', s2, "
        "3, 'repetition', s3, 4, 'alpha_ratio', s4) AS (stage, stage_name, n_docs)")


def quality_funnel_oracle_sql() -> str:
    return f"""
WITH tks AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS tk
  FROM documents),
bgs AS (
  SELECT *, CASE WHEN len(tk) >= 2 THEN
              [tk[i] || ' ' || tk[i + 1] FOR i IN generate_series(1, len(tk) - 1)]
            ELSE [] END AS bg
  FROM tks),
flags AS (
  SELECT CAST(strlen(text) >= {FUNNEL_MIN_CHARS} AS BIGINT) AS len_ok,
         CAST(len(tk) >= {FUNNEL_MIN_TOKENS} AS BIGINT) AS tok_ok,
         CASE WHEN len(bg) < 1 THEN 0 ELSE
           CAST(list_max(list_transform(list_distinct(bg),
                  d -> len(list_filter(bg, x -> x = d))))
                / CAST(len(bg) AS DOUBLE) <= {FUNNEL_MAX_TOP_BIGRAM} AS BIGINT)
         END AS rep_ok,
         CAST(strlen(regexp_replace(text, '[^A-Za-z]', '', 'g'))
              / CAST(strlen(text) AS DOUBLE) >= {FUNNEL_MIN_ALPHA} AS BIGINT)
           AS alpha_ok
  FROM bgs),
agg AS (
  SELECT COUNT(*) AS s0, SUM(len_ok) AS s1, SUM(len_ok * tok_ok) AS s2,
         SUM(len_ok * tok_ok * rep_ok) AS s3,
         SUM(len_ok * tok_ok * rep_ok * alpha_ok) AS s4
  FROM flags)
SELECT * FROM (
  SELECT 0 AS stage, 'ingest' AS stage_name, s0 AS n_docs FROM agg
  UNION ALL SELECT 1, 'min_length', s1 FROM agg
  UNION ALL SELECT 2, 'min_tokens', s2 FROM agg
  UNION ALL SELECT 3, 'repetition', s3 FROM agg
  UNION ALL SELECT 4, 'alpha_ratio', s4 FROM agg)
"""


CURATE_SEED = 1337
CURATE_PCT = 80


def corpus_curate(documents: DataFrame) -> DataFrame:
    """END-TO-END corpus curation in one declarative plan — the composed
    pipeline a training-data run actually executes, as a single key:

      1. near-dup removal  (minhash LSH on the REAL corpus, keep-min of
                            each verified pair)
      2. decontamination   (benchmark members out; docs overlapping the
                            benchmark shingle set in ≥ {CONTAM_MIN_OVERLAP}
                            shingles out)
      3. quality bars      (min length, min tokens, min alpha ratio —
                            the funnel's cheap single-scan flags)
      4. deterministic     ({CURATE_PCT}% hash-bucket keep — stable under
         sampling           task retries)

    Output is the per-doc AUDIT: (doc_id, stage, kept) where stage names
    the FIRST filter that dropped the doc ('kept' otherwise) — the
    lineage record a compliance review asks for. Every stage reads the
    shared sketch layer (one md5 pass, memoized blocks); stage order is
    fixed so the row is deterministic. SUM(kept) is the final corpus
    size."""
    from .dedup import (N_HASHES, _minhash_band_candidates, _minhash_sig,
                        _with_shingle_hashes)

    sig = _minhash_sig(documents, plant=False)
    cand = _minhash_band_candidates(documents, plant=False)
    s1, s2 = sig.alias("s1"), sig.alias("s2")
    agree = sum(
        F.when(F.col(f"s1.mh{i}") == F.col(f"s2.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES))
    dup2 = (cand
            .join(s1, F.col("doc1") == F.col("s1.doc_id"))
            .join(s2, F.col("doc2") == F.col("s2.doc_id"))
            .filter((agree / F.lit(float(N_HASHES))) >= 0.5)
            .select(F.col("doc2").alias("doc_id")).distinct()
            .withColumn("_dup", F.lit(1)))
    sh = (_with_shingle_hashes(documents.select("doc_id", "text"))
          .select("doc_id", F.explode("hs").alias("sh_h")))
    bench_sh = (sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
                .select("sh_h").distinct())
    contam = (sh.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
              .join(F.broadcast(bench_sh), "sh_h")
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ov"))
              .filter(F.col("n_ov") >= CONTAM_MIN_OVERLAP)
              .select("doc_id").withColumn("_contam", F.lit(1)))
    tk = F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")
    quality_ok = ((F.octet_length("text") >= FUNNEL_MIN_CHARS)
                  & (F.size(tk) >= FUNNEL_MIN_TOKENS)
                  & (F.octet_length(F.regexp_replace(F.col("text"),
                                                     r"[^A-Za-z]", ""))
                     / F.octet_length("text").cast("double")
                     >= FUNNEL_MIN_ALPHA))
    sampled_in = _pct_bucket(F.col("doc_id").cast("string"),
                             CURATE_SEED) < CURATE_PCT
    stage = (F.when(F.col("_dup") == 1, "dup")
             .when(F.col("doc_id") % CONTAM_BENCH_MOD == 0, "benchmark")
             .when(F.col("_contam") == 1, "contaminated")
             .when(~quality_ok, "quality")
             .when(~sampled_in, "sampled_out")
             .otherwise("kept"))
    # no forced broadcast: the duplicate set scales with corpus DIRTINESS
    # (a crawl snapshot can be >50% near-dups), so its size is not
    # bounded by design — AQE size-gates the strategy per run
    return (documents
            .join(dup2, "doc_id", "left")
            .join(contam, "doc_id", "left")
            .select("doc_id", stage.alias("stage"))
            .withColumn("kept", (F.col("stage") == "kept").cast("int")))


def corpus_curate_oracle_sql() -> str:
    from .dedup import (N_HASHES, _minhash_cand_ctes, _shingle_hash_ctes)
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES))
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents),{_shingle_hash_ctes()},{_minhash_cand_ctes()},
dup2 AS (SELECT DISTINCT doc2 AS doc_id FROM cand
         JOIN sig s1 ON cand.doc1 = s1.doc_id
         JOIN sig s2 ON cand.doc2 = s2.doc_id
         WHERE ({agree}) / {float(N_HASHES)} >= 0.5),
shx AS (SELECT doc_id, unnest(hs) AS sh_h FROM sh),
bench AS (SELECT DISTINCT sh_h FROM shx WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
contam AS (SELECT doc_id FROM shx JOIN bench USING (sh_h)
           WHERE doc_id % {CONTAM_BENCH_MOD} != 0
           GROUP BY doc_id HAVING COUNT(*) >= {CONTAM_MIN_OVERLAP}),
staged AS (SELECT d.doc_id,
  CASE WHEN d.doc_id IN (SELECT doc_id FROM dup2) THEN 'dup'
       WHEN d.doc_id % {CONTAM_BENCH_MOD} = 0 THEN 'benchmark'
       WHEN d.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
       WHEN NOT (strlen(d.text) >= {FUNNEL_MIN_CHARS}
                 AND len(list_filter(string_split_regex(lower(d.text), '\\W+'),
                                     t -> t <> '')) >= {FUNNEL_MIN_TOKENS}
                 AND strlen(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
                     / CAST(strlen(d.text) AS DOUBLE) >= {FUNNEL_MIN_ALPHA})
         THEN 'quality'
       WHEN NOT ({_pct_bucket_sql("CAST(doc_id AS VARCHAR)", CURATE_SEED)}
                 < {CURATE_PCT}) THEN 'sampled_out'
       ELSE 'kept' END AS stage
  FROM documents d)
SELECT doc_id, stage, CAST(stage = 'kept' AS INT) AS kept FROM staged
"""


SHUFFLE_SEED = 4242
TOKEN_BUDGET_PER_SOURCE = 800


def deterministic_shuffle(documents: DataFrame) -> DataFrame:
    """Deterministic training-order shuffle: global example order =
    portable hash of (doc_id, seed) — reproducible across reruns, task
    retries, and engines (no RNG state), which is what makes a training
    run's data order auditable.

    The global rank is computed WITHOUT a single-partition window (the
    scale smell an unpartitioned `row_number` window has): two-phase
    ranking — range-partition on the shuffle key, rank locally inside
    each range, then add each partition's broadcast row-count offset.
    Output ranks are exact regardless of where the sampled range
    boundaries land, so the result stays deterministic even though
    range sampling isn't."""
    h = F.abs(portable_hash64(F.col("doc_id").cast("string"),
                              seed=SHUFFLE_SEED))
    base = (documents.select("doc_id", h.alias("hk"))
            .repartitionByRange(PACK_BUCKETS, "hk", "doc_id")
            .withColumn("pid", F.spark_partition_id()))
    w = Window.partitionBy("pid").orderBy("hk", "doc_id")
    local = base.withColumn("lr", F.row_number().over(w))
    offs = (local.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
            .withColumn("off",
                        F.coalesce(
                            F.sum("n").over(
                                Window.orderBy("pid")
                                .rowsBetween(Window.unboundedPreceding, -1)),
                            F.lit(0)))
            .select("pid", "off"))
    return (local.join(F.broadcast(offs), "pid")
            .select("doc_id", (F.col("off") + F.col("lr"))
                    .cast("bigint").alias("shuffle_rank")))


def deterministic_shuffle_oracle_sql() -> str:
    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed=SHUFFLE_SEED)
    return f"""
SELECT doc_id,
       row_number() OVER (ORDER BY abs({h}), doc_id) AS shuffle_rank
FROM documents
"""


def token_budget_pack(documents: DataFrame) -> DataFrame:
    """Per-source token-budget corpus assembly: each `source` stratum
    admits docs in deterministic hash order until its
    {TOKEN_BUDGET_PER_SOURCE}-token budget is EXCEEDED (the admitting
    doc may overshoot — the standard greedy fill). One partitioned
    window (running token sum per source, hash order) + one filter; the
    budget check uses the PRE-admission cumulative sum, so doc k is
    kept iff the tokens before it fit the budget. No global sort; each
    stratum fills independently — the 100 TB shape, since real corpus
    specs budget per source/language."""
    from pyspark.sql import Window
    h = portable_hash64(F.col("doc_id").cast("string"), seed=SHUFFLE_SEED)
    w = (Window.partitionBy("source").orderBy(F.abs(h), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, -1))
    toks = F.size(F.filter(F.split(F.lower("text"), r"\W+"),
                           lambda t: t != ""))
    return (documents
            .select("doc_id", "source", toks.alias("n_tokens"))
            .withColumn("tokens_before",
                        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
            .filter(F.col("tokens_before") < TOKEN_BUDGET_PER_SOURCE)
            .select("doc_id", "source", "n_tokens", "tokens_before"))


def token_budget_oracle_sql() -> str:
    h = portable_hash64_sql("CAST(doc_id AS VARCHAR)", seed=SHUFFLE_SEED)
    return f"""
WITH toks AS (SELECT doc_id, source, len({_TOKENS_DUCK}) AS n_tokens
              FROM documents),
cum AS (SELECT doc_id, source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY abs({h}), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS tokens_before
        FROM toks)
SELECT doc_id, source, n_tokens, tokens_before
FROM cum WHERE tokens_before < {TOKEN_BUDGET_PER_SOURCE}
"""


def dataset_card_stats(documents: DataFrame) -> DataFrame:
    """Per-source DATASHEET report — the audit table a dataset card
    ships: doc count, token count, char stats, distinct-language count,
    exact-dup group count within the source. One scan plus two keyed
    aggregates; every number is exact (no sampling), so the card is
    reproducible evidence, not an estimate."""
    toks = F.size(F.filter(F.split(F.lower("text"), r"\W+"),
                           lambda t: t != ""))
    base = documents.select(
        "source", "lang", F.md5("text").alias("h"),
        toks.alias("n_tokens"), F.octet_length("text").alias("n_chars"))
    dups = (base.groupBy("source", "h")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("source")
            .agg(F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                 .alias("dup_groups")))
    stats = (base.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").alias("n_tokens"),
                  F.min("n_chars").alias("min_chars"),
                  F.max("n_chars").alias("max_chars"),
                  F.countDistinct("lang").alias("n_langs")))
    return stats.join(dups, "source")


DATASET_CARD_ORACLE = f"""
WITH base AS (SELECT source, lang, md5(text) AS h,
                     len({_TOKENS_DUCK}) AS n_tokens, strlen(text) AS n_chars
              FROM documents),
dups AS (SELECT source,
                CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS dup_groups
         FROM (SELECT source, h, count(*) AS n FROM base GROUP BY 1, 2)
         GROUP BY source)
SELECT s.source, s.n_docs, s.n_tokens, s.min_chars, s.max_chars,
       s.n_langs, d.dup_groups
FROM (SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
             COUNT(DISTINCT lang) AS n_langs
      FROM base GROUP BY source) s
JOIN dups d USING (source)
"""
