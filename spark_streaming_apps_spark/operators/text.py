"""Text-analysis operators (training-data pipeline surface).

Generalizes the reference's Solr keyword-indexing capability
(KeywordSearchIngestModule, PipelineStreamProcessor.scala:52,76-94) into the
text ops an LLM-data pipeline needs: token/term-frequency index, language ID
heuristic, quality scoring, token counting, and document fingerprinting.

Everything is JVM array/string expressions — no Python in the hot path; a
10k-doc partition and a 10M-doc partition run the identical codegen'd plan.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

FP_MOD = 1_000_000_007

#: (lang, [stopwords]) — ordered; first language whose stopword count wins
#: (ties broken by list order) is the prediction.
LANG_STOPWORDS = [
    ("en", ["the", "a", "of", "and"]),
    ("de", ["der", "die", "und", "das"]),
    ("fr", ["le", "la", "et", "les"]),
    ("es", ["el", "la", "los", "que"]),
]


def _tokens() -> object:
    return F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != "")


def text_tokens(documents: DataFrame) -> DataFrame:
    """Corpus term-frequency index — the batch analog of Solr posting lists
    (SURVEY.md §2.I keyword_search_module): explode lowercase \\W+ tokens,
    count per term. One shuffle on the term key; map-side partial
    aggregation makes the shuffle O(vocabulary), not O(tokens)."""
    return (documents
            .select(F.explode(_tokens()).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("tf")))


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish token counts per document. The BPE-ish count
    splits runs of letters / digits / single punctuation — a cheap proxy for
    subword tokenizer load estimation."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
         .alias("bpe_ish_tokens"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic: count per-language stopword
    hits in the token list, predict the argmax (list order breaks ties),
    'und' (undetermined) when nothing hits."""
    df = documents.withColumn("tk", _tokens())
    score_cols = []
    for lang, words in LANG_STOPWORDS:
        arr = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            F.expr(f"size(filter(tk, t -> array_contains(array({arr}), t)))")
            .alias(f"sc_{lang}"))
    df = df.select("doc_id", *score_cols)
    best = F.greatest(*[F.col(f"sc_{lang}") for lang, _ in LANG_STOPWORDS])
    pred = F.lit("und")
    for lang, _ in reversed(LANG_STOPWORDS):
        pred = F.when((F.col(f"sc_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"),
                     best.alias("best_score"))


def quality_score(documents: DataFrame) -> DataFrame:
    """Document quality heuristics: token count, mean token length,
    stopword ratio, alpha ratio; composite score rounded to 6 dp.
    Divisions are guarded (ANSI mode) by the n_tokens > 0 filter."""
    df = documents.withColumn("tk", _tokens()).filter(F.size("tk") > 0)
    n_tok = F.size("tk")
    n_stop = F.expr("size(filter(tk, t -> array_contains(array('the','a','of','and','is'), t)))")
    alpha = F.octet_length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    mean_len = F.round(
        F.expr("aggregate(tk, 0, (acc, t) -> acc + octet_length(t))")
        / n_tok.cast("double"), 6)
    stop_ratio = F.round(n_stop / n_tok.cast("double"), 6)
    alpha_ratio = F.round(alpha / F.octet_length("text").cast("double"), 6)
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        F.round(stop_ratio * 0.3 + alpha_ratio * 0.5
                + F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.2, 6).alias("quality"),
    )


FEATURE_DIM = 8

#: portable token-bucket hash, seed 5 (functions/hashing.py family)
_FH = ("pmod(cast(conv(substr(md5('5:' || t), 1, 15), 16, 10) as bigint), "
       f"{FEATURE_DIM})")


def feature_hashing(documents: DataFrame) -> DataFrame:
    """Hashed term-frequency feature extraction (the 'hashing trick'):
    every token is bucketed by the portable hash into a fixed
    {FEATURE_DIM}-dim count vector — the scale path for text features (no
    vocabulary build, no second pass, codegen'd array exprs). Emitted as
    one column per dimension so the oracle compares cell-exactly."""
    df = documents.withColumn("tk", _tokens())
    cols = [F.expr(f"size(filter(tk, t -> {_FH} = {j}))").alias(f"f{j}")
            for j in range(FEATURE_DIM)]
    return df.select("doc_id", *cols)


def feature_hashing_oracle_sql() -> str:
    fh = (f"CAST(('0x' || substr(md5('5:' || t), 1, 15)) AS BIGINT) "
          f"% {FEATURE_DIM}")
    cols = ", ".join(
        f"CAST(len(list_filter(tk, t -> ({fh}) = {j})) AS INT) AS f{j}"
        for j in range(FEATURE_DIM))
    return f"""
WITH tks AS (SELECT doc_id,
  list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS tk
  FROM documents)
SELECT doc_id, {cols} FROM tks
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "window", "query")
BM25_TOP_K = 20


def bm25_rank(documents: DataFrame, terms: tuple[str, ...] = BM25_TERMS,
              k: int = BM25_TOP_K) -> DataFrame:
    """BM25-ranked keyword search — the full-text-ranking upgrade of the
    reference's boolean Solr keyword hits (KeywordSearchIngestModule,
    PipelineStreamProcessor.scala:76-94).

    Plan shape for scale: per-document term frequencies are computed
    inline from the token array (`size(filter(...))` — codegen, no
    explode, no posting-list shuffle for a fixed query), the corpus
    statistics (N, avgdl, per-term document frequency) collapse to ONE
    aggregate row that joins back in as a broadcast, and the top-k is a
    TakeOrdered, not a global sort. Scores are double math rounded to
    6 dp (ln/divide are IEEE-identical across engines at that
    precision)."""
    docs = (documents.select("doc_id", _tokens().alias("tk"))
            .withColumn("dl", F.size("tk")).filter(F.col("dl") > 0))
    tf_cols = [
        F.expr(f"size(filter(tk, t -> t = '{t}'))").cast("double").alias(f"tf_{i}")
        for i, t in enumerate(terms)]
    # Materialized: consumed twice (corpus stats + the scoring join), and
    # projection collapse would re-run the regex tokenization once per tf
    # column on each pass. After this the hot path is 5 doubles per doc.
    from .dedup import _memo, _materialize
    scored_in = _memo(
        documents, "bm25_tf_" + "_".join(terms),
        lambda: _materialize(
            docs.select("doc_id", F.col("dl").cast("double").alias("dl"),
                        *tf_cols)))
    stats = scored_in.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("double")
          .alias(f"df_{i}") for i in range(len(terms))])
    parts = []
    for i in range(len(terms)):
        idf = F.log((F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                    / (F.col(f"df_{i}") + 0.5) + 1.0)
        tf = F.col(f"tf_{i}")
        parts.append(idf * (tf * (BM25_K1 + 1))
                     / (tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))))
    score = F.round(sum(parts[1:], parts[0]), 6)
    return (scored_in.join(F.broadcast(stats))
            .select("doc_id", score.alias("bm25"))
            .filter(F.col("bm25") > 0)
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(k))


def bm25_oracle_sql(terms: tuple[str, ...] = BM25_TERMS,
                    k: int = BM25_TOP_K,
                    where: str | None = None) -> str:
    tf_cols = ", ".join(
        f"CAST(len(list_filter(tk, t -> t = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * {BM25_K1 + 1}) / (tf_{i} + {BM25_K1}"
        f" * (1 - {BM25_B} + {BM25_B} * dl / avgdl))"
        for i in range(len(terms)))
    return f"""
WITH docs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS tk
  FROM documents{f' WHERE {where}' if where else ''}),
tfs AS (
  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, {tf_cols}
  FROM docs WHERE len(tk) > 0),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl, {df_cols}
  FROM tfs)
SELECT doc_id, round({score}, 6) AS bm25
FROM tfs, stats
WHERE round({score}, 6) > 0
ORDER BY bm25 DESC, doc_id LIMIT {k}
"""


VOCAB_TOP_K = 50


def vocab_topk(documents: DataFrame, k: int = VOCAB_TOP_K) -> DataFrame:
    """Vocabulary construction with a frequency cap — the first step of
    tokenizer training: explode tokens, count per term (map-side combine
    makes the shuffle O(vocabulary)), take the top-k by (count DESC,
    token) — a TakeOrdered per partition + driver merge of k rows, never
    a global sort."""
    return (documents
            .select(F.explode(_tokens()).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
            .orderBy(F.desc("tf"), "token").limit(k))


VOCAB_ORACLE = f"""
SELECT token, COUNT(*) AS tf
FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                                t -> t <> '')) AS token
      FROM documents)
GROUP BY token ORDER BY tf DESC, token LIMIT {VOCAB_TOP_K}
"""

# ------------------------------------------------- count-min heavy hitters

CMS_D = 4     # hash rows
CMS_W = 256   # counters per row; error bound ~ total_tokens / W per row
CMS_TOP_K = 20
_CMS_P = (1 << 31) - 1


def _cms_h(j: int, col: str) -> str:
    """Row-j bucket for a 60-bit md5-derived token hash — the same
    affine-mod family as the minhash sketches (bit-identical in DuckDB)."""
    return f"cast(({col} * {2 * j + 3} + {7 * j + 11}) % {_CMS_P} % {CMS_W} as int)"


def heavy_hitters_cms(documents: DataFrame,
                      k: int = CMS_TOP_K) -> DataFrame:
    """Count-min-sketch heavy hitters with an exactness audit — the
    mergeable frequency sketch a 100-TB token pipeline aggregates where
    exact per-term counts are too wide to keep: {CMS_D}x{CMS_W} additive
    counters (shards sketch independently, merge by adding — the same
    partial-aggregate contract as `histogram_quantiles` and
    `AcidTable.merge_add`), estimate(t) = min over rows of the t-bucket
    counter, with the one-sided guarantee est >= exact always and
    est - exact bounded by collisions/W per row.

    Output: the true top-{CMS_TOP_K} tokens with exact count, CMS
    estimate, and the overestimate — the sketch-quality audit one runs
    before trusting the sketch at scale (estimates and their error are
    DETERMINISTIC here because the hash family is fixed, so the DuckDB
    oracle checks every value, unlike approx_count_distinct-style
    engine-private sketches). One token-keyed shuffle for counts, a
    {CMS_D}x{CMS_W}-row counter table (always broadcastable), and the
    audit joins top-k against it."""
    tkh = (f"cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint) "
           f"% {_CMS_P}")
    counts = (documents
              .select(F.explode(_tokens()).alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
              .withColumn("th", F.expr(tkh)))
    buckets = ", ".join(f"{j}, {_cms_h(j, 'th')}" for j in range(CMS_D))
    counters = (counts
                .selectExpr("n", f"stack({CMS_D}, {buckets}) as (j, b)")
                .groupBy("j", "b").agg(F.sum("n").alias("c")))
    topk = counts.orderBy(F.desc("n"), "token").limit(k)
    est = (topk
           .selectExpr("token", "n",
                       f"stack({CMS_D}, {buckets}) as (j, b)")
           .join(F.broadcast(counters), ["j", "b"])
           .groupBy("token", "n").agg(F.min("c").alias("est_n")))
    return (est.select("token", F.col("n").alias("exact_n"), "est_n",
                       (F.col("est_n") - F.col("n")).alias("overestimate"))
            .orderBy(F.desc("exact_n"), "token"))


def heavy_hitters_cms_oracle_sql(k: int = CMS_TOP_K) -> str:
    tkh = (f"CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) "
           f"% {_CMS_P}")

    def h(j: int) -> str:
        return (f"CAST((th * {2 * j + 3} + {7 * j + 11}) % {_CMS_P} "
                f"% {CMS_W} AS INT)")

    bucket_rows = " UNION ALL ".join(
        f"SELECT token, n, {j} AS j, {h(j)} AS b FROM counts"
        for j in range(CMS_D))
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
                            t -> t <> '')) AS token
  FROM documents),
counts AS (
  SELECT token, COUNT(*) AS n, {tkh} AS th
  FROM toks GROUP BY token),
buckets AS ({bucket_rows}),
counters AS (SELECT j, b, SUM(n) AS c FROM buckets GROUP BY j, b),
topk AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {k}),
est AS (
  SELECT t.token, t.n, min(c.c) AS est_n
  FROM topk t
  JOIN buckets bk ON bk.token = t.token
  JOIN counters c ON c.j = bk.j AND c.b = bk.b
  GROUP BY t.token, t.n)
SELECT token, n AS exact_n, est_n, est_n - n AS overestimate
FROM est ORDER BY exact_n DESC, token
"""


TOP_BIGRAM_MAX = 0.06  # Gopher-style repetition cutoff (fixture p90 ≈ 0.067)


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality filters: per-document duplicate-
    bigram fraction and most-frequent-bigram fraction, plus the keep
    decision (top_bigram_frac ≤ {TOP_BIGRAM_MAX}). Bigrams are built from
    adjacent token pairs with zip_with (codegen), then counted via ONE
    keyed shuffle on (doc_id, bigram) with map-side combine — the
    distributed form; nothing is quadratic in document length."""
    bigrams = F.expr(
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), "
        "(a, b) -> a || ' ' || b)")
    per_bigram = (documents
                  .select("doc_id", _tokens().alias("tk"))
                  .filter(F.size("tk") >= 2)
                  .select("doc_id", F.explode(bigrams).alias("bg"))
                  .groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c")))
    return (per_bigram.groupBy("doc_id")
            .agg(F.sum("c").alias("n_bigrams"),
                 F.count(F.lit(1)).alias("n_distinct"),
                 F.max("c").alias("top_c"))
            .select("doc_id", "n_bigrams", "n_distinct",
                    F.round(1 - F.col("n_distinct") / F.col("n_bigrams").cast("double"), 6)
                     .alias("dup_bigram_frac"),
                    F.round(F.col("top_c") / F.col("n_bigrams").cast("double"), 6)
                     .alias("top_bigram_frac"))
            .withColumn("keep",
                        (F.col("top_bigram_frac") <= TOP_BIGRAM_MAX).cast("int")))


REPETITION_ORACLE = f"""
WITH tks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS tk
  FROM documents),
bgs AS (
  SELECT doc_id,
         unnest([tk[i] || ' ' || tk[i + 1] FOR i IN generate_series(1, len(tk) - 1)]) AS bg
  FROM tks WHERE len(tk) >= 2),
per_bg AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY doc_id, bg),
per_doc AS (
  SELECT doc_id, SUM(c) AS n_bigrams, COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM per_bg GROUP BY doc_id)
SELECT doc_id, n_bigrams, n_distinct,
       round(1 - n_distinct / CAST(n_bigrams AS DOUBLE), 6) AS dup_bigram_frac,
       round(top_c / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_frac,
       CAST(round(top_c / CAST(n_bigrams AS DOUBLE), 6) <= {TOP_BIGRAM_MAX} AS INT)
         AS keep
FROM per_doc
"""


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic rolling-hash fingerprint: fold char codes with
    h = (h*31 + code) mod {FP_MOD}, seeded by the first char code — a
    shuffle-free per-row fingerprint whose exact integer math any engine
    reproduces (vs md5: this one supports incremental/windowed variants)."""
    codes = "transform(split(text, ''), c -> cast(ascii(c) as bigint))"
    return documents.select(
        "doc_id",
        F.expr(
            f"aggregate(slice({codes}, 2, size(split(text, '')) - 1), "
            f"element_at({codes}, 1), (a, c) -> (a * 31 + c) % {FP_MOD})"
        ).alias("fingerprint"),
    )


# ------------------------------------------------------------ inverted index

IDX_POSTINGS_CAP = 10


def inverted_index(documents: DataFrame) -> DataFrame:
    """Inverted index build — the batch form of the reference's Solr
    posting ingestion (KeywordSearchIngestModule,
    PipelineStreamProcessor.scala:52,76-94): per term, document frequency,
    total term frequency, and a bounded posting sample (first
    {IDX_POSTINGS_CAP} doc_ids ascending, comma-joined).

    Scale: ONE explode pass → ONE shuffle to (term, doc_id) with the
    per-doc tf as a counter (map-side partial combine), then everything
    term-keyed: df/tf roll up from the posting relation, and the posting
    sample is capped BEFORE collection by a per-term row_number window,
    so a stop-word's posting state is {IDX_POSTINGS_CAP} longs, never the
    full posting list. At 100 TB the window's per-term sort is the cost —
    shard hot terms by a doc_id-range salt and keep the first cap per
    shard, then merge."""
    from pyspark.sql import Window
    from .dedup import _memo, _materialize
    post = _memo(documents, "inverted_postings", lambda: _materialize(
        documents.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf_d"))))  # stats AND sample read this one shuffle
    stats = post.groupBy("term").agg(F.sum("tf_d").alias("tf"),
                                     F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    sample = (post.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= IDX_POSTINGS_CAP)
              .groupBy("term")
              .agg(F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
                    .alias("postings")))
    return (stats.join(sample, "term")
            .select("term", "df", "tf", "postings"))


def inverted_index_oracle_sql() -> str:
    from .dedup import _TOKENS_DUCK
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS term FROM documents),
tf AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
post AS (SELECT DISTINCT term, doc_id FROM toks),
df AS (SELECT term, COUNT(*) AS df FROM post GROUP BY term),
sample AS (SELECT term,
                  array_to_string((list(doc_id ORDER BY doc_id))[1:{IDX_POSTINGS_CAP}], ',')
                    AS postings
           FROM post GROUP BY term)
SELECT term, df, tf, postings
FROM tf JOIN df USING (term) JOIN sample USING (term)
"""


# -------------------------------------------------- BPE merges / winnowing

BPE_TOP_K = 20

#: winnowing: k-gram hash window size (Schleimer et al. 2003 local algo)
WINNOW_W = 4


def bpe_merge_topk(documents: DataFrame, k: int = BPE_TOP_K) -> DataFrame:
    """The BPE merge decision input: the {BPE_TOP_K} most frequent
    ADJACENT token pairs across the corpus (count DESC, pair asc) — what
    a tokenizer trainer merges next. Pairs come from the zip_with bigram
    expression (codegen, O(len) per doc); the count is one counter-only
    shuffle on the pair key with map-side combine; top-k is TakeOrdered
    (per-partition heads + driver merge), never a global sort."""
    bigrams = F.expr(
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), "
        "(a, b) -> a || ' ' || b)")
    return (documents
            .select(_tokens().alias("tk"))
            .filter(F.size("tk") >= 2)
            .select(F.explode(bigrams).alias("pair"))
            .groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "pair").limit(k))


def bpe_merge_oracle_sql(k: int = BPE_TOP_K) -> str:
    from .dedup import _TOKENS_DUCK
    return f"""
WITH tks AS (SELECT {_TOKENS_DUCK} AS tk FROM documents),
bgs AS (SELECT unnest([tk[i] || ' ' || tk[i + 1]
                      FOR i IN generate_series(1, len(tk) - 1)]) AS pair
        FROM tks WHERE len(tk) >= 2)
SELECT pair, COUNT(*) AS n FROM bgs
GROUP BY pair ORDER BY n DESC, pair LIMIT {k}
"""


def winnow_fingerprint(documents: DataFrame) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS local algorithm): over each document's POSITIONAL rolling
    3-gram shingle hashes, slide a window of {WINNOW_W} and keep each
    window's minimum; the distinct selected minima are the fingerprints
    every copy-detection index stores (guaranteed: any shared run of
    window+k-1 tokens shares a fingerprint). Per doc this emits a compact
    audit row — fingerprint count, min, and XOR digest — so the compare
    is O(corpus), not O(tokens).

    All array exprs over the doc's own hashes: no shuffle at all — the
    operator is scan-shaped and embarrassingly parallel at any scale.

    The positional hash array is pinned (lineage-keeping persist) before the
    windowed-min pass, same as dedup._with_shingle_hashes: Catalyst's
    projection collapse would otherwise inline the md5 token-hash
    transform into every element access of the window lambda and turn
    one O(tokens) hash pass into O(tokens * window) re-hashes."""
    from .dedup import MH_COMBINE, MH_P, _TKH, _memo, _materialize
    sglh = (f"CASE WHEN size(tkh) >= 3 THEN "
            f"transform(sequence(1, size(tkh) - 2), i -> "
            f"((element_at(tkh, i) * {MH_COMBINE} + element_at(tkh, i + 1)) "
            f"* {MH_COMBINE} + element_at(tkh, i + 2)) % {MH_P}) "
            f"ELSE cast(array() as array<bigint>) END")
    fps = (f"array_distinct(CASE WHEN size(hs) >= {WINNOW_W} THEN "
           f"transform(sequence(1, size(hs) - {WINNOW_W - 1}), i -> "
           f"array_min(slice(hs, i, {WINNOW_W}))) ELSE hs END)")
    hashed = _memo(documents, "winnow_positional", lambda: _materialize(
        documents
        .select("doc_id", _tokens().alias("tk"))
        .withColumn("tkh", F.expr(_TKH))
        .select("doc_id", F.expr(sglh).alias("hs"))))
    return (hashed
            .withColumn("fps", F.expr(fps))
            .filter(F.size("fps") > 0)
            .select(
                "doc_id",
                F.size("fps").alias("n_fps"),
                F.expr("array_min(fps)").alias("fp_min"),
                F.expr("aggregate(fps, 0L, (a, x) -> a ^ x)").alias("fp_xor")))


def winnow_oracle_sql() -> str:
    from .dedup import MH_COMBINE, MH_P, _TKH_DUCK, _TOKENS_DUCK
    w = WINNOW_W
    return f"""
WITH tks AS (SELECT doc_id, {_TOKENS_DUCK} AS tk FROM documents),
tkhs AS (SELECT doc_id, {_TKH_DUCK} AS tkh FROM tks),
shs AS (SELECT doc_id,
               CASE WHEN len(tkh) >= 3 THEN
                 [((tkh[i] * {MH_COMBINE} + tkh[i + 1]) * {MH_COMBINE}
                   + tkh[i + 2]) % {MH_P}
                  FOR i IN generate_series(1, len(tkh) - 2)]
               ELSE CAST([] AS BIGINT[]) END AS hs
        FROM tkhs),
fpl AS (SELECT doc_id,
               list_distinct(CASE WHEN len(hs) >= {w} THEN
                 [list_min(hs[i:i + {w - 1}])
                  FOR i IN generate_series(1, len(hs) - {w - 1})]
               ELSE hs END) AS fps
        FROM shs)
SELECT doc_id, CAST(len(fps) AS INT) AS n_fps, list_min(fps) AS fp_min,
       list_aggregate(fps, 'bit_xor') AS fp_xor
FROM fpl WHERE len(fps) > 0
"""


# ----------------------------------------------- unigram LM surprisal filter

def unigram_surprisal(documents: DataFrame) -> DataFrame:
    """Unigram language-model surprisal per document — the perplexity-proxy
    quality signal of CCNet-style pipelines (score each doc by how unusual
    its vocabulary is against the corpus LM; outliers are boilerplate or
    noise). Deliberately model-free: the LM IS the corpus unigram MLE.

    mean_nll = avg over the doc's tokens of -ln(count(token)/total_tokens),
    rounded to 6 dp (ln/divide are IEEE-identical across engines at that
    precision — same contract as bm25_rank).

    Scale shape: the vocabulary table is one counter-only term-keyed
    aggregate (map-side combine → O(vocab) shuffle); scoring re-joins the
    token stream to it on the term key — the same shuffle geometry as the
    inverted index, no row ever carries text past tokenization. The 1-row
    total joins in as a broadcast."""
    toks = documents.select("doc_id", F.explode(_tokens()).alias("t"))
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    total = freq.agg(F.sum("n_t").cast("double").alias("n_total"))
    return (toks.join(freq, "t")
            .join(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-F.log(F.col("n_t").cast("double")
                                      / F.col("n_total"))), 6).alias("mean_nll")))


def unigram_surprisal_oracle_sql() -> str:
    from .dedup import _TOKENS_DUCK
    return f"""
WITH tks AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS t FROM documents),
freq AS (SELECT t, count(*) AS n_t FROM tks GROUP BY t),
tot AS (SELECT CAST(sum(n_t) AS DOUBLE) AS n_total FROM freq)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(-ln(CAST(n_t AS DOUBLE) / n_total)), 6) AS mean_nll
FROM tks JOIN freq USING (t), tot
GROUP BY doc_id
"""


def bigram_perplexity(documents: DataFrame) -> DataFrame:
    """Bigram LM perplexity per document with add-1 smoothing — the
    next-order CCNet-style quality signal after `unigram_surprisal`: a
    doc whose word PAIRS are improbable under the corpus bigram MLE is
    likelier noise even when its vocabulary is ordinary.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V); ppl = exp(mean -ln P).
    Per-bigram surprisals are 6-dp-quantized and summed as DECIMAL so
    the doc mean is order-independent and engine-exact (stricter than
    unigram_surprisal's avg — bigram logs spread wider, so ulp drift
    under float reordering is likelier to survive rounding).

    Scale shape: bigram + unigram tables are counter-only keyed
    aggregates (map-side combine, O(distinct) shuffle); scoring re-joins
    the doc's bigram stream on the pair key. V joins as a 1-row
    broadcast. No text crosses a shuffle after tokenization."""
    big = (documents.withColumn("tk", _tokens())
           .filter(F.size("tk") >= 2)
           .select("doc_id", F.explode(F.expr(
               "transform(slice(tk, 1, size(tk) - 1), "
               "(w, i) -> struct(w as w1, element_at(tk, i + 2) as w2))"))
               .alias("b"))
           .select("doc_id", "b.w1", "b.w2"))
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    vocab = (documents.select(F.explode(_tokens()).alias("t"))
             .agg(F.countDistinct("t").alias("v")))
    nll = F.expr("cast(round(-ln((n12 + 1.0) / (n1 + v)), 6) "
                 "as decimal(18,6))")
    return (big.join(c12, ["w1", "w2"]).join(c1, "w1")
            .join(F.broadcast(vocab))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.round(F.exp(F.sum(nll).cast("double")
                               / F.count(F.lit(1))), 6).alias("ppl")))


def bigram_perplexity_oracle_sql() -> str:
    from .dedup import _TOKENS_DUCK
    return f"""
WITH tks AS (SELECT doc_id, {_TOKENS_DUCK} AS tk FROM documents),
big AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        FROM tks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i)
        WHERE len(tk) >= 2),
c12 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS n1 FROM big GROUP BY w1),
vocab AS (SELECT count(DISTINCT t) AS v
          FROM (SELECT unnest(tk) AS t FROM tks))
SELECT doc_id, count(*) AS n_bigrams,
       round(exp(CAST(sum(CAST(round(-ln((n12 + 1.0) / (n1 + v)), 6)
                     AS DECIMAL(18,6))) AS DOUBLE) / count(*)), 6) AS ppl
FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vocab
GROUP BY doc_id
"""


def posexplode_tokens(documents: DataFrame) -> DataFrame:
    """Positional token explode — LATERAL VIEW posexplode: (doc_id, pos,
    token) keeps each token's offset, the base table for positional
    inverted indexes / span labeling. One generate pass scan-side, no
    shuffle at all; downstream consumers group on token or doc as
    needed."""
    return (documents
            .select("doc_id", F.posexplode(_tokens()).alias("pos", "token")))


POSEXPLODE_ORACLE = """
WITH tks AS (SELECT doc_id,
       list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '') AS tk
       FROM documents)
SELECT doc_id, s.pos, s.tok AS token FROM (
  SELECT doc_id,
         unnest([{'pos': i - 1, 'tok': tk[i]}
                 FOR i IN generate_series(1, len(tk))]) AS s
  FROM tks)
"""


# ----------------------------------------------------- sparse TF-IDF cosine

TFIDF_DF_MAX = 50   # drop tokens in > DF_MAX docs: stop-term prune AND the
                    # hard bound on posting-list length (join fan-out)
TFIDF_TOP_K = 5


def tfidf_cosine_topk(documents: DataFrame) -> DataFrame:
    """Sparse TF-IDF nearest neighbors — the inverted-index cosine join
    that complements the dense-embedding ANN family (there the vector is
    a fixed array; here it's an unbounded token space, so the only
    scalable plan is score accumulation over the shared-token join).

    Vocabulary = tokens with document frequency ≤ {TFIDF_DF_MAX}: the
    standard max-df stop-term prune, and the scale contract — every
    posting list is ≤ DF_MAX docs, so the token self-join emits at most
    C(DF_MAX,2) pairs per token, NEVER corpus².  Weights w = tf ·
    idf(round 9dp), dot products accumulate per pair in one keyed
    aggregation, norms join back, cosine rounds to 6dp, top-{TFIDF_TOP_K}
    per doc by partitioned window.  All JVM expressions; the one skew
    hazard (a token at exactly DF_MAX in every partition) is bounded by
    the same cap.
    """
    from pyspark.sql import Window
    n_docs = documents.select(F.count(F.lit(1)).alias("n"))
    toks = (documents
            .select("doc_id", F.explode(_tokens()).alias("token"))
            .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") <= TFIDF_DF_MAX))
    # materialized + memoized: norms, the a-side, and the b-side all read
    # the weight layer — without the barrier each reference replays the
    # tokenize + df pipeline (plan audit: 39 exchanges / 8 one-row
    # broadcasts -> one shared InMemoryRelation)
    from .dedup import _materialize, _memo
    w = _memo(documents, "tfidf_w", lambda: _materialize(
        toks.join(dfreq, "token")
        .join(F.broadcast(n_docs))
        .select("doc_id", "token", "df",
                (F.col("tf") * F.round(
                    F.log((F.col("n") + 1) / (F.col("df") + 1)) + 1, 9))
                .alias("w"))))
    norms = (w.groupBy("doc_id")
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    a = w.filter(F.col("df") >= 2).select("token", F.col("doc_id").alias("da"),
                                          F.col("w").alias("wa"))
    b = w.filter(F.col("df") >= 2).select("token", F.col("doc_id").alias("db"),
                                          F.col("w").alias("wb"))
    dots = (a.join(b, "token")
            .filter(F.col("da") < F.col("db"))
            .groupBy("da", "db").agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = norms.select(F.col("doc_id").alias("da"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("nrm").alias("nb"))
    half = (dots.join(na, "da").join(nb, "db")
            .select("da", "db",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                    .alias("cos")))
    pairs = half.unionByName(
        half.select(F.col("db").alias("da"), F.col("da").alias("db"), "cos"))
    rk = Window.partitionBy("da").orderBy(F.desc("cos"), "db")
    return (pairs.withColumn("rank", F.row_number().over(rk))
            .filter(F.col("rank") <= TFIDF_TOP_K)
            .select(F.col("da").alias("doc_id"), F.col("db").alias("nbr_id"),
                    "cos", "rank"))


def tfidf_cosine_oracle_sql() -> str:
    from .dedup import _TOKENS_DUCK
    return f"""
WITH toks AS (SELECT doc_id, token, count(*) AS tf
              FROM (SELECT doc_id, unnest({_TOKENS_DUCK}) AS token
                    FROM documents)
              GROUP BY doc_id, token),
nd AS (SELECT count(*) AS n FROM documents),
dfreq AS (SELECT token, count(*) AS df FROM toks GROUP BY token
          HAVING count(*) <= {TFIDF_DF_MAX}),
w AS (SELECT doc_id, token, df,
             tf * round(ln((n + 1) / (df + 1.0)) + 1, 9) AS w
      FROM toks JOIN dfreq USING (token) CROSS JOIN nd),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (SELECT a.doc_id AS da, b.doc_id AS db, sum(a.w * b.w) AS dot
         FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
         WHERE a.df >= 2 GROUP BY a.doc_id, b.doc_id),
half AS (SELECT da, db, round(dot / (na.nrm * nb.nrm), 6) AS cos
         FROM dots JOIN norms na ON na.doc_id = da
                   JOIN norms nb ON nb.doc_id = db),
pairs AS (SELECT da, db, cos FROM half
          UNION ALL SELECT db, da, cos FROM half),
ranked AS (SELECT da AS doc_id, db AS nbr_id, cos,
                  row_number() OVER (PARTITION BY da
                                     ORDER BY cos DESC, db) AS rank
           FROM pairs)
SELECT doc_id, nbr_id, cos, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


# ------------------------------------------------------- RAG doc chunking

CHUNK_W = 64       # tokens per chunk
CHUNK_STRIDE = 48  # overlap = W - stride = 16 tokens


def doc_chunking(documents: DataFrame) -> DataFrame:
    """Sliding-window document chunking — the indexing front end of every
    retrieval pipeline: {CHUNK_W}-token windows at stride {CHUNK_STRIDE}
    (16-token overlap so no boundary sentence is ever lost to retrieval).
    Per chunk: its id, exact token count, and the md5 of the joined
    token slice (the content key a vector index / dedup layer joins on).
    Chunk enumeration is `sequence` + explode over per-doc counts — one
    scan, no shuffle until a consumer groups; at 100 TB chunking is the
    map-side stage feeding the embedding UDF."""
    toks = documents.select(
        "doc_id", _tokens().alias("tk")).withColumn("n", F.size("tk"))
    n_chunks = F.when(
        F.col("n") <= CHUNK_W, F.lit(1)).otherwise(
        F.ceil((F.col("n") - CHUNK_W) / F.lit(float(CHUNK_STRIDE))) + 1)
    return (toks.filter(F.col("n") > 0)
            .withColumn("chunk_id",
                        F.explode(F.sequence(F.lit(0),
                                             n_chunks.cast("int") - 1)))
            .select(
                "doc_id", "chunk_id",
                F.expr(f"slice(tk, chunk_id * {CHUNK_STRIDE} + 1, "
                       f"{CHUNK_W})").alias("ck"))
            .select("doc_id", "chunk_id",
                    F.size("ck").alias("n_tokens"),
                    F.md5(F.array_join("ck", " ")).alias("chunk_md5")))


def doc_chunking_oracle_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\W+'),
                     t -> t <> '') AS tk
  FROM documents),
sized AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
chunks AS (
  SELECT doc_id, tk,
         unnest(generate_series(0,
           CASE WHEN n <= {CHUNK_W} THEN 0
                ELSE CAST(ceil((n - {CHUNK_W}) / {float(CHUNK_STRIDE)})
                          AS INT) END)) AS chunk_id
  FROM sized)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(len(tk[chunk_id * {CHUNK_STRIDE} + 1 :
                  chunk_id * {CHUNK_STRIDE} + {CHUNK_W}]) AS INT)
         AS n_tokens,
       md5(list_aggregate(tk[chunk_id * {CHUNK_STRIDE} + 1 :
                             chunk_id * {CHUNK_STRIDE} + {CHUNK_W}],
                          'string_agg', ' ')) AS chunk_md5
FROM chunks
"""


# ------------------------------------------- self-maintaining text index

#: incremental-text-index corpus split (same convention as the dedup
#: and ANN incremental keys): doc_id % 3 == 1 arrives later, in two
#: batches split by doc_id parity; doc_id % 15 == 0 (a slice of the
#: INITIAL corpus) is then deleted — the maintainer must retire its
#: postings/doc_len rows and subtract its counter partials.
TEXT_INC_ARRIVAL_MOD = 3
TEXT_INC_ARRIVAL_REM = 1
TEXT_INC_DELETE_PRED = "doc_id % 15 = 0"

#: token-bucket partition count for the postings table. The layout is
#: the point: a token's postings live in exactly ONE bucket
#: (crc32(token) % buckets), so every file holds one bucket's tokens
#: and the per-file token bloom sidecars can prune FREQUENT terms too
#: — without it every file contains every common token and the bloom
#: probe degenerates to a full scan for exactly the terms people
#: query. A 4-term query therefore opens <= 4 buckets' files at ANY
#: corpus size (Solr/ES term sharding, as a partition spec). Scale
#: knob: raise with corpus size to keep per-bucket bytes bounded.
TEXT_BUCKETS = 16


def _tbucket(col: str = "token"):
    """Deterministic token bucket — crc32 so an external client (or
    test) can compute the same bucket with zlib.crc32."""
    return F.pmod(F.crc32(F.encode(F.col(col), "UTF-8")),
                  F.lit(TEXT_BUCKETS)).cast("int")


def _toks_of(docs: DataFrame) -> DataFrame:
    """The tokenize root of the index partials — the one expensive
    pass over a batch's text. Callers that feed MULTIPLE Spark actions
    from it (the per-batch maintenance commit runs ~7: two appends,
    the pruned counter merge's find/rewrite passes, the prune
    collects) persist it so the regexp-split/explode pass runs once
    per batch, not once per action (guide §5: cache exactly what is
    reused and expensive to recompute; a micro-batch is bounded, so
    the cached footprint is O(batch))."""
    return (docs.select("doc_id", _tokens().alias("tk"))
            .withColumn("dl", F.size("tk"))
            .filter(F.col("dl") > 0))


@contextmanager
def _cached_toks(docs: DataFrame):
    """Persist the tokenize root for the duration of one maintenance
    commit; released in ``finally`` so a forever-running maintainer
    never accumulates block-manager entries."""
    toks = _toks_of(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        yield toks
    finally:
        toks.unpersist()


def _index_batch_tables(docs: DataFrame, toks: DataFrame | None = None):
    """(postings, doc_len, term_df partials, corpus partials) for one
    document batch — the O(batch) signing pass of the text index.
    Pass a (persisted) ``toks`` to share the tokenize root across the
    four derived tables' actions."""
    if toks is None:
        toks = _toks_of(docs)
    postings = (toks.select("doc_id", "dl",
                            F.explode("tk").alias("token"))
                .groupBy("token", "doc_id")
                .agg(F.count(F.lit(1)).alias("tf"))
                .withColumn("tbucket", _tbucket()))
    doc_len = toks.select("doc_id", F.col("dl").cast("long").alias("dl"))
    # term_df inherits the postings' token-bucket layout (tbucket is a
    # pure function of token, so it rides the merge key unchanged):
    # bucket-partitioned counter files let the pruned merge's find
    # pass prune partitions by metadata before any IO
    term_df = (postings.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"))
        .withColumn("tbucket", _tbucket()))
    corpus = toks.agg(
        F.lit(0).cast("long").alias("id"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("dl").cast("long")).alias("sum_dl"))
    return postings, doc_len, term_df, corpus


def text_index_maintain(cat, docs: DataFrame,
                        txn: tuple[str, int] | None = None) -> int:
    """Apply one document batch to the persisted text index in ONE
    linked catalog transaction: postings + doc lengths APPEND
    (row-immutable facts), per-term document frequencies and the
    corpus counters MERGE-ADD (additive partials) — O(batch) work, and
    catalog readers see the whole batch or none of it.

    With ``txn=(app_id, batch_id)`` every write in the transaction is
    FENCED (append_txn / merge_add_txn): a redelivered micro-batch
    re-commits nothing — appends AND the additive counters stay
    exactly-once from an at-least-once stream (round 13's merge_add
    double-count caveat, closed by the fenced merge_add). Without it,
    at-most-once callers only (batch jobs)."""
    # term_df rides the PRUNED additive merge: the find pass semi-joins
    # the batch's vocabulary against a key-column-only scan (partition-
    # pruned to the batch's token buckets first), rewrites only the
    # files holding a batch token, and carries the rest by manifest
    # reference — O(touched files) per batch while the vocabulary
    # grows (merge_add's full-outer shape rewrote the WHOLE counter
    # table every micro-batch: O(vocabulary), the r15 scale finding).
    # corpus_stats is one row — the plain merge_add IS O(batch) there.
    # The tokenize root is persisted across the transaction's actions
    # (two appends + the counter merges' find/rewrite/prune passes
    # each re-executed it — ~6 redundant tokenize passes per batch).
    with _cached_toks(docs) as toks:
        postings, doc_len, term_df, corpus = _index_batch_tables(
            docs, toks)
        e = cat.commit_multi(
            _fenced_writes({
                "postings": ("append", postings),
                "doc_len": ("append", doc_len),
                "term_df": ("merge_add_pruned", term_df,
                            ["token", "tbucket"]),
                "corpus_stats": ("merge_add", corpus, ["id"]),
            }, txn), op="text_index_maintain")
    # maintenance hygiene on the append-only surfaces: small-file
    # folds are opt-in (table property), the DV bound is maintainer
    # policy, autovacuum reclaims history when opted in (counters
    # rewrite per merge anyway)
    from ..acid import DV_FOLD_ROWS
    for name in ("postings", "doc_len"):
        t = cat.table(name)
        t.maybe_autocompact(dv_fold_rows=DV_FOLD_ROWS)
        t.maybe_autovacuum()
    return e


def _fenced_writes(writes: dict, txn: tuple[str, int] | None) -> dict:
    """Upgrade plain commit_multi write kinds to their FENCED twins
    when a (app_id, batch_id) transaction rides the batch."""
    if txn is None:
        return writes
    app_id, batch_id = txn
    up = {"append": "append_txn", "merge_add": "merge_add_txn",
          "merge_add_pruned": "merge_add_pruned_txn",
          "apply_cdf": "apply_cdf"}
    return {t: (up[spec[0]], *spec[1:], app_id, batch_id)
            for t, spec in writes.items()}


def text_index_apply(cat, changes: DataFrame,
                     txn: tuple[str, int] | None = None) -> int:
    """Apply a MIXED insert+delete document batch (doc_id, text,
    _change_type) to the persisted text index in ONE linked catalog
    transaction — the delete half the round-13 maintainer dropped:

    * ``postings`` / ``doc_len``: ``apply_cdf`` keyed on doc_id —
      insert docs' rows append, deleted docs' rows retire with only
      the files holding them rewritten;
    * ``term_df`` / ``corpus_stats``: SIGNED partials — the insert
      batch's counts minus the delete batch's counts — through one
      merge_add each, so the counters track the live corpus. A
      token whose df reaches 0 keeps a zero row (counter semantics;
      serve-side reads are unaffected because its postings are gone).

    Deleted docs' TEXT must ride the change rows (CDF delete rows
    carry the full row image), because subtracting a doc's partials
    requires tokenizing it once more — still O(batch).

    Replay contract: same as ``text_index_maintain`` — with
    ``txn=(app_id, batch_id)`` every write (the apply_cdf retires AND
    the signed counter partials) is fenced, so an at-least-once
    redelivery changes nothing; without it, at-most-once callers
    only."""
    ins = (changes.filter(F.col("_change_type") == "insert")
           .select("doc_id", "text"))
    dels = (changes.filter(F.col("_change_type") == "delete")
            .select("doc_id", "text"))
    # Both sides' tokenize roots are persisted across the whole linked
    # transaction: the four table writes plus the pruned merge's
    # find/rewrite/prune passes each re-executed the regexp-split/
    # explode pass otherwise (guide §5 — bounded micro-batch cache).
    with _cached_toks(ins) as toks_i, _cached_toks(dels) as toks_d:
        p_i, dl_i, df_i, c_i = _index_batch_tables(ins, toks_i)
        p_d, dl_d, df_d, c_d = _index_batch_tables(dels, toks_d)
        post_ch = (p_i.withColumn("_change_type", F.lit("insert"))
                   .unionByName(
                       p_d.withColumn("_change_type", F.lit("delete"))))
        dl_ch = (dl_i.withColumn("_change_type", F.lit("insert"))
                 .unionByName(
                     dl_d.withColumn("_change_type", F.lit("delete"))))
        df_signed = (df_i.select("token", "df").unionByName(
            df_d.select("token", (-F.col("df")).alias("df")))
            .groupBy("token").agg(F.sum("df").alias("df"))
            .withColumn("tbucket", _tbucket()))
        c_signed = (c_i.unionByName(
            c_d.select("id", (-F.col("n_docs")).alias("n_docs"),
                       (-F.col("sum_dl")).alias("sum_dl")))
            .groupBy("id").agg(
                F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long")
                .alias("n_docs"),
                # sum over an EMPTY side is NULL, not 0 — coalesce so an
                # insert-only or delete-only batch never poisons the
                # additive counter with NULL
                F.coalesce(F.sum("sum_dl"), F.lit(0)).cast("long")
                .alias("sum_dl")))
        e = cat.commit_multi(
            _fenced_writes({
                "postings": ("apply_cdf", post_ch, ["doc_id"]),
                "doc_len": ("apply_cdf", dl_ch, ["doc_id"]),
                "term_df": ("merge_add_pruned", df_signed,
                            ["token", "tbucket"]),
                "corpus_stats": ("merge_add", c_signed, ["id"]),
            }, txn), op="text_index_apply")
    # the retires land as deletion-vector entries (enable_dv tables):
    # fold the vector once it passes the maintainer's bound, so a
    # retire stream's per-scan anti-join tax and per-commit sidecar
    # rewrite stay bounded (r15 review finding)
    from ..acid import DV_FOLD_ROWS
    cat.table("postings").maybe_autocompact(dv_fold_rows=DV_FOLD_ROWS)
    cat.table("doc_len").maybe_autocompact(dv_fold_rows=DV_FOLD_ROWS)
    return e


def text_index_incremental(spark, sf_dir: str, scratch,
                           terms: tuple[str, ...] = BM25_TERMS,
                           k: int = BM25_TOP_K) -> DataFrame:
    """SELF-MAINTAINING full-text index — the text-family member of
    the round-13 incremental trio (dedup band index, IVF cells, and
    now the inverted index the reference delegated to Solr,
    PipelineStreamProcessor.scala:76-94; Solr's own commit model is
    exactly per-batch segment appends + merged stats).

    The index is four AcidTables under one catalog: ``postings``
    (token, doc_id, tf — appended per batch), ``doc_len`` (appended),
    ``term_df`` and ``corpus_stats`` (additive counters maintained by
    merge_add). A batch arrival costs O(batch): tokenize the batch
    only, append its rows, add its partials — one linked transaction
    (``text_index_maintain``); a MIXED batch (arrivals + a retention
    DELETE of ``{TEXT_INC_DELETE_PRED}``) routes through
    ``text_index_apply`` — deleted docs' rows retire, their counter
    partials subtract, still one transaction. BM25 then SERVES from
    the index:
    postings probed by the query terms through token BLOOM SIDECARS
    (``read_eq_any`` — one manifest resolution + sidecar probes, then
    a scan of only the surviving files; a 4-term query opens ~its 4
    posting lists, never the table), document lengths joined back,
    stats broadcast from the
    one-row counter table; a term absent from a doc contributes
    exactly 0, so the postings-driven score equals the dense
    recompute. Result = top-{BM25_TOP_K} BM25 over corpus+arrivals,
    which the oracle recomputes from scratch; `stats_fresh_equal` pins
    the maintained counters against a full recount."""
    import shutil
    from pathlib import Path as _P

    from ..acid_catalog import AcidCatalog
    from ..sources.tables import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text"))
    arrives = F.col("doc_id") % TEXT_INC_ARRIVAL_MOD == \
        TEXT_INC_ARRIVAL_REM
    initial = docs.filter(~arrives)
    b1 = docs.filter(arrives & (F.col("doc_id") % 2 == 0))
    b2 = docs.filter(arrives & (F.col("doc_id") % 2 == 1))

    root = _P(scratch) / f"text_index_{_P(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    cat = AcidCatalog(spark, root)
    # the four initial-table writes share one persisted tokenize pass
    _toks0 = _toks_of(initial).persist(StorageLevel.MEMORY_AND_DISK)
    postings, doc_len, term_df, corpus = _index_batch_tables(
        initial, _toks0)
    # token-bucket PARTITIONING + token bloom sidecars make the SERVE
    # side a point lookup: each file holds ONE bucket's tokens (so the
    # sidecars prune frequent terms too, see TEXT_BUCKETS) and a BM25
    # query opens only its terms' buckets' files (read_eq_any — the
    # dedup_batch band-probe shape), never the whole postings table;
    # every batch append indexes its new files in the same pass
    # enable_dv on the retire surfaces: a doc_id-keyed retention
    # delete scatters across every bucket's files (the worst COW
    # case) — deletion vectors make it O(matched rows); compaction
    # materializes them away on its own cadence
    cat.create_table("postings", postings,
                     partition_by=["tbucket"], bloom_by=["token"],
                     enable_dv=True)
    cat.create_table("doc_len", doc_len, enable_dv=True)
    # term_df shares the postings' bucket layout: partition-pruned
    # + bloom-pruned counter maintenance (merge_add_pruned) and a
    # point-lookup serve path (read_eq_any on the query terms)
    cat.create_table("term_df", term_df,
                     partition_by=["tbucket"], bloom_by=["token"])
    cat.create_table("corpus_stats", corpus)
    _toks0.unpersist()
    text_index_maintain(cat, b1)                 # O(batch) arrival
    # MIXED batch: the second arrival lands together with a retention
    # DELETE of an initial-corpus slice — one linked transaction
    mixed = (b2.withColumn("_change_type", F.lit("insert"))
             .unionByName(docs.filter(TEXT_INC_DELETE_PRED)
                          .withColumn("_change_type",
                                      F.lit("delete"))))
    # retire_sec split: this mixed retire+arrival transaction is the
    # retention-path cost folded into the key at round 14 — recorded
    # separately so the headline row stays comparable (telemetry.py)
    from .. import telemetry
    with telemetry.timed("text_index_incremental.retire_sec"):
        text_index_apply(cat, mixed)

    served = _bm25_serve(cat, terms, k)
    final = docs.filter(f"NOT ({TEXT_INC_DELETE_PRED})")
    # pin_sec split: the full recount is the proof obligation, not
    # serving cost (telemetry.py — bench comparability, r15 ADVICE)
    with telemetry.timed("text_index_incremental.pin_sec"):
        stats_fresh = bool(_counters_fresh_equal(cat, final))
    return served.withColumn("stats_fresh_equal", F.lit(stats_fresh))


def _bm25_serve(cat, terms: tuple[str, ...], k: int) -> DataFrame:
    """Serve top-k BM25 FROM THE MAINTAINED INDEX at one pinned
    catalog entry: the postings read is a bloom-pruned point lookup on
    the query's terms (bucket-partitioned files + token sidecars — a
    4-term query opens ~4 buckets' files, never the table, the
    round-13 serve-path scale gap), doc lengths joined back, the
    one-row counter stats broadcast."""
    pins = cat.snapshot()
    cs = cat.table("corpus_stats").read(pins["corpus_stats"])
    # term_df probe mirrors the postings probe: bucket partitioning +
    # token bloom sidecars make the df lookup open only the query
    # terms' buckets' files, never the counter table
    tdf = (cat.table("term_df")
           .read_eq_any("token", list(terms),
                        version=pins["term_df"]))
    stats = (cs.join(F.broadcast(
        tdf.groupBy().pivot("token", list(terms)).sum("df")))
        .select((F.col("n_docs").cast("double")).alias("n_docs"),
                (F.col("sum_dl").cast("double")
                 / F.col("n_docs")).alias("avgdl"),
                *[F.coalesce(F.col(t).cast("double"), F.lit(0.0))
                  .alias(f"df_{i}") for i, t in enumerate(terms)]))
    hits = (cat.table("postings")
            .read_eq_any("token", list(terms),
                         version=pins["postings"])
            .join(cat.table("doc_len").read(pins["doc_len"]), "doc_id"))
    parts = []
    for i, t in enumerate(terms):
        idf = F.log((F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                    / (F.col(f"df_{i}") + 0.5) + 1.0)
        tf = F.when(F.col("token") == t,
                    F.col("tf").cast("double")).otherwise(0.0)
        parts.append(idf * (tf * (BM25_K1 + 1))
                     / (tf + BM25_K1 * (1 - BM25_B + BM25_B
                                        * F.col("dl").cast("double")
                                        / F.col("avgdl"))))
    per_hit = sum(parts[1:], parts[0])
    return (hits.join(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.round(F.sum(per_hit), 6).alias("bm25"))
            .filter(F.col("bm25") > 0)
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(k))


def _counters_fresh_equal(cat, final_docs: DataFrame) -> bool:
    """Pin: the MAINTAINED counters equal a full recount over the
    final corpus. df=0 counter rows are semantically absent (their
    postings are gone) and excluded. Each equality runs as ONE signed
    groupBy job (``multiset_equal``) over a shared persisted tokenize
    pass — the old exceptAll pair re-tokenized the full final corpus
    four times."""
    from ..acid import multiset_equal
    with _cached_toks(final_docs) as toks:
        _, _, fresh_df, fresh_corpus = _index_batch_tables(
            final_docs, toks)
        now_df = cat.read("term_df").filter("df > 0")
        df_equal = multiset_equal(now_df, fresh_df)
        now_c = cat.read("corpus_stats").select("id", "n_docs", "sum_dl")
        c_equal = multiset_equal(now_c, fresh_corpus)
    return df_equal and c_equal


def text_index_incremental_oracle_sql(
        terms: tuple[str, ...] = BM25_TERMS,
        k: int = BM25_TOP_K) -> str:
    """DuckDB twin: BM25 recomputed from scratch over the FINAL corpus
    (everything except the deleted slice) — what the maintained index
    must serve."""
    inner = bm25_oracle_sql(
        terms, k, where=f"NOT ({TEXT_INC_DELETE_PRED})").strip()
    return f"""
SELECT doc_id, bm25, TRUE AS stats_fresh_equal FROM ({inner}
) b
"""


def text_index_incremental_stream(spark, sf_dir: str, scratch,
                                  terms: tuple[str, ...] = BM25_TERMS,
                                  k: int = BM25_TOP_K) -> DataFrame:
    """The text index as a STREAMING consumer — the full exactly-once
    self-maintenance loop the fenced merge_add unlocks (round 13 left
    the counters at-most-once): a `documents` AcidTable (CDF-enabled)
    takes arrivals and a retention DELETE; an `acidtable-cdf-parallel`
    maintenance stream routes each micro-batch through
    ``text_index_apply`` with ``txn=(app_id, batch_id)`` — postings/
    doc_len appends and retires FENCED per table (append_txn /
    apply_cdf), the SIGNED counter partials fenced through
    merge_add_txn — so an at-least-once redelivery re-commits nothing
    on any of the four tables. (Reference analog: Solr per-batch
    segment commits + merged stats, PipelineStreamProcessor.scala:
    76-94.)

    Pins: the changes land as exactly 3 read-limited micro-batches
    (two arrivals + one delete); BM25 serves from the maintained index
    (token-bucket + bloom point lookup); the maintained counters equal
    a full recount over the FINAL corpus."""
    import shutil
    from pathlib import Path as _P

    from ..acid import AcidTable
    from ..acid_catalog import AcidCatalog
    from ..sources.pysource import (AcidCdfParallelStreamDataSource,
                                    _drain_incremental)
    from ..sources.tables import load_table

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text"))
    arrives = F.col("doc_id") % TEXT_INC_ARRIVAL_MOD == \
        TEXT_INC_ARRIVAL_REM
    initial = docs.filter(~arrives)
    b1 = docs.filter(arrives & (F.col("doc_id") % 2 == 0))
    b2 = docs.filter(arrives & (F.col("doc_id") % 2 == 1))

    root = _P(scratch) / f"text_stream_{_P(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    src = AcidTable.create(spark, root / "documents", initial,
                           enable_cdf=True)
    cat = AcidCatalog(spark, root / "index")
    # the four initial-table writes share one persisted tokenize pass
    _toks0 = _toks_of(initial).persist(StorageLevel.MEMORY_AND_DISK)
    postings, doc_len, term_df, corpus = _index_batch_tables(
        initial, _toks0)
    # enable_dv on the retire surfaces: a doc_id-keyed retention
    # delete scatters across every bucket's files (the worst COW
    # case) — deletion vectors make it O(matched rows); compaction
    # materializes them away on its own cadence
    cat.create_table("postings", postings,
                     partition_by=["tbucket"], bloom_by=["token"],
                     enable_dv=True)
    cat.create_table("doc_len", doc_len, enable_dv=True)
    # term_df shares the postings' bucket layout: partition-pruned
    # + bloom-pruned counter maintenance (merge_add_pruned) and a
    # point-lookup serve path (read_eq_any on the query terms)
    cat.create_table("term_df", term_df,
                     partition_by=["tbucket"], bloom_by=["token"])
    cat.create_table("corpus_stats", corpus)
    _toks0.unpersist()

    def maintain(batch: DataFrame, batch_id: int) -> None:
        # persist the in-hand micro-batch first: every action below
        # (emptiness probes, the four table writes, the prune
        # collects) otherwise re-executes the Python-DataSource read
        # of the change files — one boundary crossing per batch, not
        # one per action (guide §4: the JVM↔Python boundary is the
        # cost you control; §5: a micro-batch is a bounded cache)
        ch = (batch.select("doc_id", "text", "_change_type")
              .persist(StorageLevel.MEMORY_AND_DISK))
        try:
            # ONE tiny agg replaces the two isEmpty probes (whole
            # batch, delete side) — each was its own Spark job against
            # the streaming floor (guide §1.2; r16 verdict item 9)
            counts = {r["_change_type"]: r["n"] for r in
                      ch.groupBy("_change_type")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}
            if not counts:
                return
            # ONE fenced linked transaction per micro-batch across all
            # four index tables — replays re-commit nothing anywhere.
            # Delete-carrying batches record their wall cost as the
            # key's retire_sec split (telemetry.py — bench
            # comparability)
            from contextlib import nullcontext

            from .. import telemetry
            has_del = bool(counts.get("delete"))
            ctx = (telemetry.timed(
                "text_index_incremental_stream.retire_sec")
                if has_del else nullcontext())
            with ctx:
                text_index_apply(cat, ch, txn=("text-maint", batch_id))
        finally:
            ch.unpersist()

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    stream = (spark.readStream.format("acidtable-cdf-parallel")
              .option("path", str(root / "documents"))
              .option("startingVersion", "0")     # exclusive: v1+
              .option("maxVersionsPerTrigger", "1").load()
              .writeStream.outputMode("append").foreachBatch(maintain))
    src.append(b1)                                           # v1
    src.append(b2)                                           # v2
    src.delete_where(TEXT_INC_DELETE_PRED)                   # v3
    n_batches, _ = _drain_incremental(stream)

    served = _bm25_serve(cat, terms, k)
    final = docs.filter(f"NOT ({TEXT_INC_DELETE_PRED})")
    from .. import telemetry
    with telemetry.timed("text_index_incremental_stream.pin_sec"):
        stats_fresh = bool(_counters_fresh_equal(cat, final))
    return (served
            .withColumn("stats_fresh_equal", F.lit(stats_fresh))
            .withColumn("n_batches", F.lit(int(n_batches))))


def text_index_incremental_stream_oracle_sql(
        terms: tuple[str, ...] = BM25_TERMS,
        k: int = BM25_TOP_K) -> str:
    inner = bm25_oracle_sql(
        terms, k, where=f"NOT ({TEXT_INC_DELETE_PRED})").strip()
    return f"""
SELECT doc_id, bm25, TRUE AS stats_fresh_equal, 3 AS n_batches
FROM ({inner}
) b
"""
