"""Text-analysis operators (training-data pipeline surface).

Generalizes the reference's Solr keyword-indexing capability
(KeywordSearchIngestModule, PipelineStreamProcessor.scala:52,76-94) into the
text ops an LLM-data pipeline needs: token/term-frequency index, language ID
heuristic, quality scoring, token counting, and document fingerprinting.

Everything is JVM array/string expressions — no Python in the hot path; a
10k-doc partition and a 10M-doc partition run the identical codegen'd plan.
"""

from __future__ import annotations

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
