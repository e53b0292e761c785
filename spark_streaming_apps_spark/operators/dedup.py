"""Deduplication operators for training-data pipelines.

Generalizes the reference's MD5 dedup-hash usage (StreamingApp.scala:361,
377-380 — producer hash vs recomputed hash, verification TODO at :322-324)
into the dedup family a 100 TB text pipeline needs:

  exact         content-hash groupBy (one shuffle on the hash)
  approx        HyperLogLog distinct estimate (no shuffle of raw values)
  minhash LSH   shingle → 16 minhash → 4 bands → bucket join → verify
  simhash       48-bit weighted token fingerprint → banded hamming join
  ngram-jaccard rare-shingle candidate join → exact Jaccard verify

Sketches use the engine-portable MD5-derived hash family
(functions/hashing.py) so every stage is reproducible bit-for-bit in the
DuckDB oracle — including the final near-dup pair decisions.

Scale design: signatures are computed SCALAR-WISE (array exprs over the
token list — zero shuffles, whole-stage codegen); only the band-bucket join
shuffles, and it shuffles 16 small integers per doc, not the text. Candidate
verification touches only bucket-collision pairs, never the O(n²) space.
A deterministic set of planted near-duplicates (every 50th doc, +1_000_000
id offset) gives the detectors real positives in the fixture corpus.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

SHINGLE_K = 3
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
PLANT_EVERY = 50
PLANT_OFFSET = 1_000_000
PLANT_SUFFIX = " planted near duplicate suffix"
SIM_BITS = 48
SIM_BAND_BITS = 12
SIM_HAMMING_MAX = 6
JACCARD_RARE_DF = 4
JACCARD_MIN = 0.4

#: MinHash hash family: ONE md5 base hash per shingle (reduced mod the
#: Mersenne prime 2^31-1), then N_HASHES affine rehashes (a_i*h + b_i) mod p
#: — integer-only, so the md5 work per signature drops 8x vs hashing per
#: function, and both engines compute it bit-identically ((p-1)^2 < 2^62:
#: no 64-bit overflow on either side). Constants from a fixed LCG so the
#: family is deterministic and committed.
MH_P = (1 << 31) - 1
MH_AB = [((1103515245 * (i + 1) + 12345) % MH_P or 1,
          (69069 * (i + 1) + 1) % MH_P) for i in range(N_HASHES)]

def _mh_affine(i: int, h: str) -> str:
    a, b = MH_AB[i]
    return f"({a} * {h} + {b}) % {MH_P}"


# ---------------------------------------------------------------- exact/approx

def dedup_exact(events: DataFrame) -> DataFrame:
    """Exact dedup with deterministic survivor: group by the content HASH
    (16 bytes shuffle per row, not the document text — the only shape that
    holds at 100 TB), keep min id — the set-oriented form of
    `dropDuplicates` (which keeps an arbitrary row and so cannot be
    oracle-checked)."""
    return (events.groupBy(F.md5("props").alias("content_hash"))
            .agg(F.min("event_id").alias("keeper_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def dedup_approx(events: DataFrame) -> DataFrame:
    """Approximate distinct content count — the scale path when even the
    hash shuffle is too much. HLL estimates differ engine-to-engine, so the
    checkable output is the exact count plus a within-5% flag that each
    engine computes over its OWN estimator."""
    exact = F.countDistinct("props")
    approx = F.approx_count_distinct("props")
    return events.agg(
        exact.alias("exact_distinct"),
        (F.abs(approx - exact) <= 0.05 * exact).cast("int").alias("approx_ok"),
    )


# ---------------------------------------------------------------- corpus prep

def planted_corpus(documents: DataFrame) -> DataFrame:
    """documents ∪ mutated copies of every PLANT_EVERY-th doc."""
    mutated = (documents.filter(F.col("doc_id") % PLANT_EVERY == 0)
               .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(PLANT_SUFFIX)).alias("text")))
    return documents.select("doc_id", "text").unionByName(mutated)


PLANTED_CORPUS_SQL = (
    f"SELECT doc_id, text FROM documents UNION ALL "
    f"SELECT doc_id + {PLANT_OFFSET} AS doc_id, text || '{PLANT_SUFFIX}' AS text "
    f"FROM documents WHERE doc_id % {PLANT_EVERY} = 0"
)


def _with_tokens(corpus: DataFrame) -> DataFrame:
    return corpus.withColumn(
        "tk", F.filter(F.split(F.lower("text"), r"\W+"), lambda t: t != ""))



#: Rolling shingle hashing, the detectors' shared base: hash each TOKEN once
#: (md5 → 60 bits → mod p), then fingerprint each k-gram with an arithmetic
#: combine of its k token hashes — md5 work is O(tokens) instead of
#: O(shingles·k chars), and no shingle strings are ever built (the string
#: build ran interpreted inside a nested higher-order function: ~9s of the
#: old 11s at sf0.1). Combine stays in 41 bits before the mod — identical
#: in DuckDB. Hash collisions (31-bit space) hit both engines identically;
#: their effect on Jaccard/minhash estimates at corpus scale is O(1e-4).
MH_COMBINE = 31

_TKH = ("transform(tk, t -> cast(conv(substr(md5(t),1,15),16,10) as bigint)"
        f" % {MH_P})")
_TKH_DUCK = ("list_transform(tk, t -> CAST(('0x' || substr(md5(t),1,15)) "
             f"AS BIGINT) % {MH_P})")


#: Session-scoped memo for the materialized sketch layer, keyed by
#: (applicationId, semantic hash of the input plan). The detectors
#: (minhash, ngram-jaccard, clusters, apply) all sit on the same
#: shingle-hash base; at 100 TB that layer is THE thing you materialize
#: once and share — recomputing the md5 pass per detector triples the
#: dominant scan cost. Bounded (drop-oldest) so long sessions with many
#: distinct corpora don't pin unbounded checkpoint blocks.
_SKETCH_CACHE: dict = {}
_SKETCH_CACHE_MAX = 32  # every materialized layer now registers here


def _materialize(df: DataFrame) -> DataFrame:
    """Fault-tolerant materialization barrier for the shared sketch
    layers. `persist(MEMORY_AND_DISK)` keeps the LINEAGE: on a real
    cluster an executor loss recomputes the lost partitions from the
    parquet scan, where the previous `localCheckpoint()` (executor-local
    blocks, lineage truncated) would have killed the query. The
    InMemoryRelation is also the optimizer barrier the layer needs —
    projection collapse can't inline the md5 pass into every downstream
    per-element lambda access (measured 10x-100x blowup without it)."""
    from pyspark import StorageLevel
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def _release(obj) -> None:
    """Unpersist a memoized value (DataFrame or tuple of DataFrames) —
    eviction and cache-clear must release the blocks, not just drop the
    Python reference and wait for the JVM ContextCleaner."""
    vals = obj if isinstance(obj, tuple) else (obj,)
    for v in vals:
        try:
            v.unpersist()
        except Exception:
            pass


def clear_sketch_cache() -> None:
    """Release every memoized sketch/index block and empty the registry —
    the bench harness calls this between passes so each pass pays the
    one-time build cost exactly once, with no stale blocks accumulating."""
    while _SKETCH_CACHE:
        _release(_SKETCH_CACHE.pop(next(iter(_SKETCH_CACHE))))
    _DUP_GATE_CACHE.clear()


def _memo(corpus: DataFrame, tag: str, build) -> DataFrame:
    try:
        key = (corpus.sparkSession.sparkContext.applicationId, tag,
               corpus._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return build()
    if key not in _SKETCH_CACHE:
        while len(_SKETCH_CACHE) >= _SKETCH_CACHE_MAX:
            _release(_SKETCH_CACHE.pop(next(iter(_SKETCH_CACHE))))
        _SKETCH_CACHE[key] = build()
    return _SKETCH_CACHE[key]


def _with_token_hashes(corpus: DataFrame) -> DataFrame:
    """doc_id + tkh (per-instance mod-p token hashes) — the ONE md5 pass
    over the corpus text that the whole dedup family shares. simhash reads
    this layer directly (affine rehashes of tkh); the shingle layer builds
    on it. Materialized (lineage-keeping persist) so Catalyst's projection
    collapse can't inline the md5 pass into every downstream per-element
    lambda access (measured 10x-100x blowup), memoized per
    (session, input plan)."""

    def build() -> DataFrame:
        return _materialize(_with_tokens(corpus)
                            .withColumn("tkh", F.expr(_TKH))
                            .select("doc_id", "tkh"))

    return _memo(corpus, "token_hashes", build)


def _with_shingle_hashes(corpus: DataFrame) -> DataFrame:
    """doc_id + hs (DISTINCT rolling 3-gram shingle hashes), built FROM
    the token-hash layer — md5 runs once for the family. Checkpointed
    SLIM (hs only): minhash/ngram-jaccard/clusters scan this repeatedly
    and shouldn't pay storage/IO for the per-token arrays only simhash
    needs (those live in _with_token_hashes' own block)."""
    assert SHINGLE_K == 3
    sglh = (f"CASE WHEN size(tkh) >= 3 THEN "
            f"transform(sequence(1, size(tkh) - 2), i -> "
            f"((element_at(tkh, i) * {MH_COMBINE} + element_at(tkh, i + 1)) "
            f"* {MH_COMBINE} + element_at(tkh, i + 2)) % {MH_P}) "
            f"ELSE cast(array() as array<bigint>) END")

    def build() -> DataFrame:
        return _materialize(_with_token_hashes(corpus)
                            .withColumn("hs", F.array_distinct(F.expr(sglh)))
                            .select("doc_id", "hs"))

    return _memo(corpus, "shingle_hashes", build)


def _shingle_hash_ctes() -> str:
    """DuckDB CTE chain producing (doc_id, hs) from `corpus` — the exact
    twin of _with_shingle_hashes."""
    return f"""
tks AS (SELECT doc_id, {_TOKENS_DUCK} AS tk FROM corpus),
tkhs AS (SELECT doc_id, {_TKH_DUCK} AS tkh FROM tks),
sh AS (SELECT doc_id,
              list_distinct(CASE WHEN len(tkh) >= 3 THEN
                [((tkh[i] * {MH_COMBINE} + tkh[i + 1]) * {MH_COMBINE}
                  + tkh[i + 2]) % {MH_P}
                 FOR i IN generate_series(1, len(tkh) - 2)]
                ELSE CAST([] AS BIGINT[]) END) AS hs
       FROM tkhs)"""


_TOKENS_DUCK = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"



# ------------------------------------------------------------------- minhash

def _minhash_sig(documents: DataFrame, plant: bool = True) -> DataFrame:
    """Per-doc 16-minhash signature table. Signatures feed the band join
    AND both verify sides: materialized once (lineage-keeping persist)
    instead of re-hashing every shingle 3x; memoized so
    clusters/apply/levenshtein reuse the same blocks. `plant=False`
    skips the near-dup fixtures (real-corpus consumers: corpus_curate)."""
    corpus = (planted_corpus(documents) if plant
              else documents.select("doc_id", "text"))
    sh = _with_shingle_hashes(corpus)
    return _memo(sh, "minhash_sig", lambda: _materialize(sh.select(
        "doc_id",
        *[F.expr(f"array_min(transform(hs, h -> {_mh_affine(i, 'h')}))")
          .alias(f"mh{i}") for i in range(N_HASHES)],
    )))


def _bands_of(sig: DataFrame) -> DataFrame:
    """Explode a signature table to its LSH band rows
    (doc_id, band_id, band_hash): md5 of each 4-minhash slice."""
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"mh{j * ROWS_PER_BAND + r}").cast("string")
                                 for r in range(ROWS_PER_BAND)])).alias(f"b{j}")
        for j in range(N_BANDS)
    ]
    stack_args = ", ".join(f"{j}, b{j}" for j in range(N_BANDS))
    return (sig.select("doc_id", *band_cols)
            .selectExpr("doc_id",
                        f"stack({N_BANDS}, {stack_args}) as (band_id, band_hash)"))


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (doc1 < doc2) bucket-collision pairs from a band-row
    table — the one self-join every LSH consumer shares."""
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"))
            .distinct())


def _minhash_band_candidates(documents: DataFrame,
                             plant: bool = True) -> DataFrame:
    """LSH candidate pairs (doc1 < doc2): band each signature (md5 of
    each 4-minhash slice), bucket-join on (band_id, hash). The shared
    blocking front end of the minhash AND levenshtein detectors — only
    bucket-collision pairs ever reach a verifier, never the O(n²)
    space."""
    sig = _minhash_sig(documents, plant)
    return _band_pairs(_bands_of(sig))


def minhash_pairs(documents: DataFrame) -> DataFrame:
    """MinHash+LSH near-dup pairs: (doc1, doc2, est_jaccard ≥ 0.5).

    Stages — each one shuffle or less:
      1. signatures: 16 array_min(transform(shingles, hᵢ)) per doc (no shuffle)
      2. bands: md5 of each 4-minhash slice, exploded to (band_id, hash)
      3. bucket join on (band_id, hash) with doc1 < doc2 → candidates
      4. verify: signature agreement fraction as the Jaccard estimate
    """
    sig = _minhash_sig(documents)
    cand = _minhash_band_candidates(documents)
    s1, s2 = sig.alias("s1"), sig.alias("s2")
    agree = sum(
        F.when(F.col(f"s1.mh{i}") == F.col(f"s2.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    return (cand
            .join(s1, F.col("doc1") == F.col("s1.doc_id"))
            .join(s2, F.col("doc2") == F.col("s2.doc_id"))
            .select("doc1", "doc2",
                    (agree / F.lit(float(N_HASHES))).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5))


def dedup_clusters(documents: DataFrame) -> DataFrame:
    """Duplicate CLUSTERS from the minhash pair graph: connected
    components by iterative min-label propagation — each node repeatedly
    adopts the smallest label among itself and its neighbors until a
    fixed point. Deterministic (component id = smallest doc_id in the
    component). The driver loop runs O(diameter) keyed join+agg rounds;
    near-dup components are shallow chains, so this converges in a
    handful of iterations even at corpus scale."""
    pairs = minhash_pairs(documents).select("doc1", "doc2")
    edges = _materialize(
        pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
        .unionByName(pairs.select(F.col("doc2").alias("src"),
                                  F.col("doc1").alias("dst"))))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("lab", F.col("node")))
    # Run to the fixed point — min-label propagation needs O(diameter)
    # rounds and a long near-dup chain can exceed any small constant; an
    # unconverged result would silently disagree with the exact
    # connected-components oracle. The cap is a pure runaway guard.
    for it in range(1000):
        neighbor_min = (edges.join(labels, edges.dst == labels.node)
                        .groupBy("src").agg(F.min("lab").alias("nlab")))
        # per-iteration persist (lineage kept, prior round released after
        # the convergence probe) — each round physically scans the
        # previous round's cached labels, and an executor loss recomputes
        # through the cached chain instead of failing the query
        new_labels = _materialize(
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select("node",
                    F.least("lab", F.coalesce("nlab", "lab")).alias("lab")))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.lab") != F.col("o.lab")).count())
        if it > 0:
            _release(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "dedup_clusters: min-label propagation did not converge")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("lab").alias("cluster_id"))


def dedup_clusters_oracle_sql() -> str:
    """Recursive-CTE twin: component id = min reachable node over the
    symmetric edge set."""
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({minhash_oracle_sql()}),
edges AS (SELECT doc1 AS src, doc2 AS dst FROM pairs
          UNION SELECT doc2, doc1 FROM pairs),
reach(node, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)
SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
"""


def _minhash_cand_ctes() -> str:
    """DuckDB twin of _minhash_sig + _minhash_band_candidates: the
    sig/bands/cand CTE chain (expects the corpus + shingle CTEs before
    it), shared by the minhash and levenshtein oracles."""
    mh = ", ".join(
        f"list_min(list_transform(hs, h -> {_mh_affine(i, 'h')})) AS mh{i}"
        for i in range(N_HASHES))
    band_sel = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band_id, md5(concat_ws(',', {cols})) AS band_hash FROM sig"
        .format(j=j, cols=", ".join(
            f"CAST(mh{j * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)))
        for j in range(N_BANDS))
    return f"""
sig AS (SELECT doc_id, {mh} FROM sh),
bands AS ({band_sel}),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2 FROM bands a
         JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id)"""


def minhash_oracle_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END" for i in range(N_HASHES))
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes()},{_minhash_cand_ctes()}
SELECT doc1, doc2, ({agree}) / {float(N_HASHES)} AS est_jaccard
FROM cand JOIN sig s1 ON cand.doc1 = s1.doc_id JOIN sig s2 ON cand.doc2 = s2.doc_id
WHERE ({agree}) / {float(N_HASHES)} >= 0.5
"""


def dedup_collapse_lsh(documents: DataFrame) -> DataFrame:
    """Exact-collapse → MinHash LSH: the composition that survives a
    duplicate-HEAVY corpus, which raw pairwise LSH structurally cannot.

    On a corpus where payloads repeat c times, the near-dup PAIR output
    is itself quadratic — every band bucket holds all c copies, so
    candidates (and the verify join, and the result) grow O(c²·distinct)
    no matter how good the blocking is (SCALING.md measures exactly
    this on the replicated worst-case corpus). Web-scale corpora are
    duplicate-heavy (30-60% exact dups), so production dedup runs
    EXACT-first:

      1. collapse identical payloads by content hash — one 16-byte-key
         shuffle, the `dedup_exact` shape; representative = min doc_id,
         multiplicity carried as n_copies;
      2. MinHash+LSH near-dup pairs over REPRESENTATIVES only — the
         quadratic copy blowup is gone before a single shingle is
         hashed, and bucket skew from repeats is structurally
         impossible (every signature appears once per distinct
         payload).

    Output: (doc1, doc2, est_jaccard, copies1, copies2) — representative
    pairs with each side's collapsed multiplicity, so pair weight is
    recoverable (a full expansion is the cartesian of the two copy
    sets, deliberately never materialized)."""
    corpus = planted_corpus(documents)
    groups = (corpus.groupBy(F.md5("text").alias("h"))
              .agg(F.min("doc_id").alias("doc_id"),
                   F.count(F.lit(1)).alias("n_copies")))
    reps = (corpus.join(groups.select("doc_id", "n_copies"), "doc_id")
            .select("doc_id", "text", "n_copies"))
    rep_corpus = reps.select("doc_id", "text")
    sig = _minhash_sig(rep_corpus, plant=False)
    cand = _minhash_band_candidates(rep_corpus, plant=False)
    s1, s2 = sig.alias("s1"), sig.alias("s2")
    agree = sum(
        F.when(F.col(f"s1.mh{i}") == F.col(f"s2.mh{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    copies = reps.select("doc_id", "n_copies")
    return (cand
            .join(s1, F.col("doc1") == F.col("s1.doc_id"))
            .join(s2, F.col("doc2") == F.col("s2.doc_id"))
            .select("doc1", "doc2",
                    (agree / F.lit(float(N_HASHES))).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.5)
            .join(copies.select(F.col("doc_id").alias("doc1"),
                                F.col("n_copies").alias("copies1")), "doc1")
            .join(copies.select(F.col("doc_id").alias("doc2"),
                                F.col("n_copies").alias("copies2")), "doc2")
            .select("doc1", "doc2", "est_jaccard", "copies1", "copies2"))


def dedup_collapse_lsh_oracle_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES))
    return f"""
WITH raw AS ({PLANTED_CORPUS_SQL}),
groups AS (SELECT md5(text) AS h, min(doc_id) AS doc_id,
                  count(*) AS n_copies
           FROM raw GROUP BY md5(text)),
corpus AS (SELECT r.doc_id, r.text, g.n_copies
           FROM raw r JOIN groups g USING (doc_id)),{_shingle_hash_ctes()},{_minhash_cand_ctes()}
SELECT doc1, doc2, ({agree}) / {float(N_HASHES)} AS est_jaccard,
       c1.n_copies AS copies1, c2.n_copies AS copies2
FROM cand
JOIN sig s1 ON cand.doc1 = s1.doc_id
JOIN sig s2 ON cand.doc2 = s2.doc_id
JOIN corpus c1 ON cand.doc1 = c1.doc_id
JOIN corpus c2 ON cand.doc2 = c2.doc_id
WHERE ({agree}) / {float(N_HASHES)} >= 0.5
"""


# ---------------------------------------------------------------- URL dedup

def _raw_url_spark() -> object:
    """Messy-but-deterministic URL per doc: mixed-case scheme/host,
    default port, optional trailing slash, tracking + real params in
    varying order, optional fragment — the canonicalization surface a
    web-corpus crawler actually faces."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTP://CrAwL"), (d % 3).cast("string"),
        F.lit(".ExAmPlE.CoM:80/docs/"), (d % 23).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0,
               F.concat(F.lit("?utm_source=feed&id="), (d % 5).cast("string")))
        .otherwise(F.concat(F.lit("?id="), (d % 5).cast("string"),
                            F.lit("&utm_campaign=x"))),
        F.when(d % 4 == 0, F.lit("#section-2")).otherwise(F.lit("")))


_RAW_URL_DUCK = """
'HTTP://CrAwL' || (doc_id % 3) || '.ExAmPlE.CoM:80/docs/' || (doc_id % 23)
|| CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
|| CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || (doc_id % 5)
        ELSE '?id=' || (doc_id % 5) || '&utm_campaign=x' END
|| CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END
"""


def url_dedup(documents: DataFrame) -> DataFrame:
    """URL canonicalization dedup — the FIRST dedup pass of every web
    corpus pipeline (cheaper than any content hash: it needs only the
    URL string): lowercase scheme+host, strip the default port, drop the
    fragment, strip the trailing slash, remove tracking (utm_*) params,
    and sort the surviving query params — then group by the canonical
    form. Distinct raw spellings of the same resource collapse; output
    is one row per canonical URL with the multiplicity and the
    deterministic keeper (min doc_id). Pure JVM string expressions, one
    canonical-key shuffle — at 100 TB this runs on the URL column alone
    before any document byte is read."""
    raw = documents.select("doc_id", _raw_url_spark().alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)),
        r":80$", "")
    path = F.regexp_replace(
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/$", "")
    query = F.array_join(
        F.array_sort(F.filter(
            F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&"),
            lambda p: ~p.startswith("utm_") & (p != ""))), "&")
    canon = F.concat(
        F.lit("http://"), host, path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")))
    return (raw.select("doc_id", canon.alias("canonical_url"))
            .groupBy("canonical_url")
            .agg(F.count(F.lit(1)).alias("n_raw"),
                 F.min("doc_id").alias("keeper_id")))


def url_dedup_oracle_sql() -> str:
    return f"""
WITH raw AS (SELECT doc_id, {_RAW_URL_DUCK} AS url FROM documents),
parts AS (
  SELECT doc_id,
         regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
                        ':80$', '') AS host,
         regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         list_aggregate(list_sort(list_filter(
             string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
             p -> NOT starts_with(p, 'utm_') AND p <> '')), 'string_agg', '&')
           AS query
  FROM raw),
canon AS (
  SELECT doc_id,
         'http://' || host || path ||
         CASE WHEN query IS NOT NULL AND query <> '' THEN '?' || query
              ELSE '' END AS canonical_url
  FROM parts)
SELECT canonical_url, COUNT(*) AS n_raw, min(doc_id) AS keeper_id
FROM canon GROUP BY canonical_url
"""


# -------------------------------------------------------------- containment

CONTAINMENT_MIN = 0.8


def _exact_collapsed(documents: DataFrame) -> DataFrame:
    """The planted corpus with an exact-payload key (tkey = md5(text))
    — the shared collapse-first layer: pairwise verifiers (containment,
    levenshtein) run over one representative per distinct payload and
    expand results back across copy groups, so their compute tracks
    DISTINCT payloads while raw band collisions grow with the square
    of the copy factor (measured: levenshtein 306 s -> 2.3 s at the
    sf1 all-duplicate rung). Materialized + memoized once per corpus
    per session."""
    corpus = planted_corpus(documents)
    return _memo(corpus, "exact_collapsed", lambda: _materialize(
        corpus.withColumn("tkey", F.md5("text"))))


#: duplicate-ratio gate cache: (appId, corpus plan hash) -> bool
_DUP_GATE_CACHE: dict = {}
DUP_GATE_RATIO = 0.9


def _dup_light(documents: DataFrame) -> bool:
    """True when the corpus is exact-duplicate-LIGHT (distinct/total >=
    {DUP_GATE_RATIO}) — the adaptive switch for the pairwise verifiers:
    a clean corpus skips the collapse/expansion machinery entirely (the
    raw band path is cheaper when the rep set IS the corpus), a
    duplicate-heavy one takes the collapse-first path that stays flat
    in the copy factor. One map-side approx-distinct pass (no shuffle
    of text, sketch merge only), memoized per corpus — the AQE spirit:
    a runtime statistic picks the physical strategy, the RESULT is
    path-independent (both paths are value-hash-equal; the expansion
    proof is in the collapse docstrings)."""
    corpus = planted_corpus(documents)
    try:
        key = (corpus.sparkSession.sparkContext.applicationId,
               corpus._jdf.queryExecution().analyzed().semanticHash())
    except Exception:                                # noqa: BLE001
        key = None
    if key is not None and key in _DUP_GATE_CACHE:
        return _DUP_GATE_CACHE[key]
    # measure over the MEMOIZED signature layer (16 ints/doc, already
    # materialized by any family detector in the pass — the gate agg
    # is a cached narrow scan, not a fresh text scan). Signature
    # identity is a faithful exact-dup proxy: identical text ->
    # identical signature; a collision-induced false dup-heavy trigger
    # only changes the physical path, never the result.
    sig = _minhash_sig(documents)
    fp = F.xxhash64(*[F.col(f"mh{i}") for i in range(N_HASHES)])
    r = sig.agg(F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct(fp, 0.02).alias("nd")
                ).collect()[0]
    light = r.nd >= DUP_GATE_RATIO * r.n
    if key is not None:
        _DUP_GATE_CACHE[key] = light
    return light


def _containment_scores(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc1, doc2, containment1, containment2) for band-candidate
    pairs from exploded shingle rows, threshold-filtered — the ONE
    scoring body both physical paths (raw and collapse) share, so the
    value math can never drift between them. No forced broadcast of
    cand — same AQE size-gate rationale as ngram_jaccard_pairs."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh1 = sh.select(F.col("doc_id").alias("doc1"), "sh_h")
    sh2 = sh.select(F.col("doc_id").alias("doc2"), "sh_h")
    inter = (sh1.join(cand, "doc1").join(sh2, ["doc2", "sh_h"])
             .groupBy("doc1", "doc2")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    s1 = (sizes.withColumnRenamed("doc_id", "doc1")
          .withColumnRenamed("n_sh", "n1"))
    s2 = (sizes.withColumnRenamed("doc_id", "doc2")
          .withColumnRenamed("n_sh", "n2"))
    c1 = F.round(F.col("n_inter") / F.col("n1").cast("double"), 6)
    c2 = F.round(F.col("n_inter") / F.col("n2").cast("double"), 6)
    return (inter.join(s1, "doc1").join(s2, "doc2")
            .select("doc1", "doc2", c1.alias("containment1"),
                    c2.alias("containment2"))
            .filter((F.col("containment1") >= CONTAINMENT_MIN)
                    | (F.col("containment2") >= CONTAINMENT_MIN)))


def minhash_containment(documents: DataFrame) -> DataFrame:
    """ASYMMETRIC containment C(A→B) = |A∩B| / |A| over distinct shingle
    sets for band-candidate pairs — the doc-in-doc signal symmetric
    Jaccard misses: a short doc fully swallowed by a long one has tiny
    Jaccard but containment ≈ 1 (quotes, mirrored excerpts, prompt
    templates inside completions). Same blocking as minhash/levenshtein
    (shared band candidates), exact intersection counts over the shared
    shingle-hash layer; keeps pairs where either direction reaches
    {CONTAINMENT_MIN}.

    Collapse-first (round 13, same lesson as levenshtein_near_dup's
    sf1 rung: band-collision pairs grow with the SQUARE of the copy
    factor): containment is a pure function of the two TEXTS, so the
    intersection counting runs over distinct-payload representatives
    only and the pair set expands back across copy groups (identical
    texts share their representative's signature, so expansion
    reproduces exactly the band-collision pair set; intra-group pairs
    have containment 1.0/1.0 by definition — included only when the
    payload has >= 1 shingle, matching the raw path, where
    shingle-less docs never reach the intersection join)."""
    if _dup_light(documents):
        # duplicate-light corpus: the rep set IS the corpus — skip the
        # collapse/expansion machinery (raw band path, family layers
        # shared as always); result is path-independent
        return _containment_scores(
            _minhash_band_candidates(documents),
            _with_shingle_hashes(planted_corpus(documents))
            .select("doc_id", F.explode("hs").alias("sh_h")))
    keyed = _exact_collapsed(documents)
    groups = keyed.groupBy("tkey").agg(F.min("doc_id").alias("doc_id"))
    rep_ids = groups.select("doc_id")
    # REUSE the family-shared full-corpus layers (one signature and
    # one shingle pass per session for minhash/containment/levenshtein
    # together), filtered to representatives — a doc's signature is a
    # function of its text, so the rep's rows ARE the group's
    sig = (_minhash_sig(documents)
           .join(rep_ids, "doc_id", "left_semi"))
    cand = _band_pairs(_bands_of(sig))
    sh = (_with_shingle_hashes(planted_corpus(documents))
          .join(rep_ids, "doc_id", "left_semi")
          .select("doc_id", F.explode("hs").alias("sh_h")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rep_keys = groups.select("doc_id", "tkey")
    rep_pairs = (_containment_scores(cand, sh)
                 .withColumnRenamed("containment1", "c1")
                 .withColumnRenamed("containment2", "c2")
                 .join(rep_keys.select(F.col("doc_id").alias("doc1"),
                                       F.col("tkey").alias("k1")), "doc1")
                 .join(rep_keys.select(F.col("doc_id").alias("doc2"),
                                       F.col("tkey").alias("k2")), "doc2"))
    m1 = keyed.select(F.col("tkey").alias("k1"),
                      F.col("doc_id").alias("m1"))
    m2 = keyed.select(F.col("tkey").alias("k2"),
                      F.col("doc_id").alias("m2"))
    # containment is DIRECTIONAL: when the expanded pair flips order,
    # the two values swap sides with it
    flip = F.col("m1") > F.col("m2")
    cross = (rep_pairs.join(m1, "k1").join(m2, "k2")
             .select(F.least("m1", "m2").alias("doc1"),
                     F.greatest("m1", "m2").alias("doc2"),
                     F.when(flip, F.col("c2")).otherwise(F.col("c1"))
                      .alias("containment1"),
                     F.when(flip, F.col("c1")).otherwise(F.col("c2"))
                      .alias("containment2")))
    # intra-group: identical payloads, containment 1.0 both ways —
    # only for groups whose payload has >= 1 shingle (size join)
    sized = keyed.join(sizes.join(rep_keys, "doc_id")
                       .select("tkey"), "tkey")
    ia, ib = sized.alias("ia"), sized.alias("ib")
    intra = (ia.join(ib, (F.col("ia.tkey") == F.col("ib.tkey"))
                     & (F.col("ia.doc_id") < F.col("ib.doc_id")))
             .select(F.col("ia.doc_id").alias("doc1"),
                     F.col("ib.doc_id").alias("doc2"),
                     F.lit(1.0).alias("containment1"),
                     F.lit(1.0).alias("containment2")))
    return cross.unionByName(intra)


def minhash_containment_oracle_sql() -> str:
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes()},{_minhash_cand_ctes()},
shx AS (SELECT doc_id, unnest(hs) AS sh_h FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shx GROUP BY doc_id),
inter AS (SELECT c.doc1, c.doc2, count(*) AS n_inter
          FROM cand c JOIN shx a ON a.doc_id = c.doc1
                      JOIN shx b ON b.doc_id = c.doc2 AND b.sh_h = a.sh_h
          GROUP BY 1, 2)
SELECT doc1, doc2,
       round(n_inter / CAST(s1.n_sh AS DOUBLE), 6) AS containment1,
       round(n_inter / CAST(s2.n_sh AS DOUBLE), 6) AS containment2
FROM inter JOIN sizes s1 ON inter.doc1 = s1.doc_id
           JOIN sizes s2 ON inter.doc2 = s2.doc_id
WHERE round(n_inter / CAST(s1.n_sh AS DOUBLE), 6) >= {CONTAINMENT_MIN}
   OR round(n_inter / CAST(s2.n_sh AS DOUBLE), 6) >= {CONTAINMENT_MIN}
"""


# -------------------------------------------------------------- levenshtein

LEV_REL_MAX = 0.2


def _lev_scores(cand: DataFrame, corpus: DataFrame) -> DataFrame:
    """(doc1, doc2, lev, rel_dist <= {LEV_REL_MAX}) for candidate
    pairs over (doc_id, text) rows — the ONE DP/scoring body both
    physical paths share. Two empty texts yield rel_dist = 0/0 = NULL
    (try_divide: DuckDB's non-ANSI division semantics; plain `/`
    under Spark's ANSI default would THROW) and the filter drops the
    pair — both engines agree."""
    t1 = corpus.select(F.col("doc_id").alias("doc1"),
                       F.col("text").alias("text1"))
    t2 = corpus.select(F.col("doc_id").alias("doc2"),
                       F.col("text").alias("text2"))
    rel = F.try_divide(
        F.col("lev").cast("double"),
        F.greatest(F.length("text1"), F.length("text2")))
    return (cand.join(t1, "doc1").join(t2, "doc2")
            .withColumn("lev", F.levenshtein("text1", "text2"))
            .select("doc1", "doc2", "lev",
                    F.round(rel, 6).alias("rel_dist"))
            .filter(F.col("rel_dist") <= LEV_REL_MAX))


def levenshtein_near_dup(documents: DataFrame) -> DataFrame:
    """Edit-distance near-dup pairs — the character-level verifier the
    token-level detectors can't replace (it catches small in-word edits
    that leave most shingles intact but also scores transpositions and
    substitutions exactly). Candidates come from the SHARED minhash band
    blocking (never all-pairs); only bucket-collision pairs pay the
    O(len²) DP, and both engines run the same classic Levenshtein, so
    the pair decisions are value-hash-checkable. Keep pairs with
    relative distance ≤ {LEV_REL_MAX} of the longer text.

    Composition (round 13 — the collapse-first lesson from
    dedup_collapse_lsh, found by the sf1 all-duplicate rung: raw
    band-collision pairs grow with the SQUARE of the copy factor and
    every one paid a DP — 306 s at sf1 vs 1.4 s at sf0.1):
    exact-collapse identical payloads to one representative, band +
    DP over DISTINCT texts only, then expand pairs back across the
    copy groups (copies share their representative's signature, so
    expansion reproduces exactly the band-collision pair set —
    intra-group pairs are distance 0 by definition). DP cost now
    tracks distinct payloads; the expansion is the OUTPUT itself."""
    if _dup_light(documents):
        # duplicate-light corpus: skip the collapse machinery (the rep
        # set IS the corpus); same adaptive gate as containment
        return _lev_scores(_minhash_band_candidates(documents),
                           planted_corpus(documents))
    keyed = _exact_collapsed(documents)
    groups = (keyed.groupBy("tkey")
              .agg(F.min("doc_id").alias("doc_id"),
                   F.any_value("text").alias("text")))
    # REUSE the family-shared full-corpus signature layer, filtered to
    # representatives (a doc's signature is a function of its text)
    sig = (_minhash_sig(documents)
           .join(groups.select("doc_id"), "doc_id", "left_semi"))
    # the rep DP runs through the SAME scorer as the raw path
    rep_keys = groups.select("doc_id", "tkey")
    rep_pairs = (_lev_scores(_band_pairs(_bands_of(sig)),
                             groups.select("doc_id", "text"))
                 .join(rep_keys.select(F.col("doc_id").alias("doc1"),
                                       F.col("tkey").alias("k1")),
                       "doc1")
                 .join(rep_keys.select(F.col("doc_id").alias("doc2"),
                                       F.col("tkey").alias("k2")),
                       "doc2")
                 .select("k1", "k2", "lev", "rel_dist"))
    m1 = keyed.select(F.col("tkey").alias("k1"),
                      F.col("doc_id").alias("m1"))
    m2 = keyed.select(F.col("tkey").alias("k2"),
                      F.col("doc_id").alias("m2"))
    cross = (rep_pairs.join(m1, "k1").join(m2, "k2")
             .select(F.least("m1", "m2").alias("doc1"),
                     F.greatest("m1", "m2").alias("doc2"),
                     "lev", "rel_dist"))
    # intra-group pairs gated on NON-EMPTY text: the raw path's
    # rel_dist for two empty texts is 0/0 = NULL and the filter drops
    # it — the collapse path must agree or the _dup_light gate's
    # path-independence breaks on duplicate empty payloads
    nonempty = keyed.filter(F.length("text") > 0)
    ia, ib = nonempty.alias("ia"), nonempty.alias("ib")
    intra = (ia.join(ib, (F.col("ia.tkey") == F.col("ib.tkey"))
                     & (F.col("ia.doc_id") < F.col("ib.doc_id")))
             .select(F.col("ia.doc_id").alias("doc1"),
                     F.col("ib.doc_id").alias("doc2"),
                     F.lit(0).alias("lev"),
                     F.lit(0.0).alias("rel_dist")))
    return cross.unionByName(intra)


def levenshtein_oracle_sql() -> str:
    rel = ("round(CAST(levenshtein(a.text, b.text) AS DOUBLE) "
           "/ greatest(len(a.text), len(b.text)), 6)")
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes()},{_minhash_cand_ctes()}
SELECT c.doc1, c.doc2, levenshtein(a.text, b.text) AS lev,
       {rel} AS rel_dist
FROM cand c JOIN corpus a ON a.doc_id = c.doc1
            JOIN corpus b ON b.doc_id = c.doc2
WHERE {rel} <= {LEV_REL_MAX}
"""


# ------------------------------------------------------------------- simhash

#: SimHash per-token 48-bit hash: TWO committed affine rehashes of the
#: shared mod-p token hash (tkh), 24 low bits each, packed into one
#: bigint — simhash pays zero md5 work beyond the family's single token
#: pass. Constants from the same fixed LCG as MH_AB but at indices 101+
#: so the two families never collide. (p-1)^2 < 2^62: no overflow in
#: either engine; all operands nonnegative, so % agrees across engines.
SIM_AB = [((1103515245 * (i + 101) + 12345) % MH_P or 1,
           (69069 * (i + 101) + 1) % MH_P) for i in range(2)]
_SIM_MASK = (1 << 24) - 1


def _sim48(h: str) -> str:
    """Spark SQL expr: 48-bit rehash of mod-p token hash `h`."""
    (a1, b1), (a2, b2) = SIM_AB
    return (f"(((({a1} * {h} + {b1}) % {MH_P}) & {_SIM_MASK}) | "
            f"shiftleft((({a2} * {h} + {b2}) % {MH_P}) & {_SIM_MASK}, 24))")


def _sim48_duck(h: str) -> str:
    """DuckDB twin of _sim48 — identical arithmetic, operator shift."""
    (a1, b1), (a2, b2) = SIM_AB
    return (f"(((({a1} * {h} + {b1}) % {MH_P}) & {_SIM_MASK}) | "
            f"(((({a2} * {h} + {b2}) % {MH_P}) & {_SIM_MASK}) << 24))")


def simhash_pairs(documents: DataFrame) -> DataFrame:
    """SimHash near-dup pairs: 48-bit token-weighted fingerprint, banded
    (4×12-bit) candidate join, hamming-distance verify (≤ {SIM_HAMMING_MAX}).

    The 48 bits per token come from TWO affine rehashes (24 low bits each)
    of the shared sketch layer's md5 token hashes — simhash pays zero md5
    work of its own; at 100 TB the text is scanned and hashed exactly once
    for the whole dedup family. The fingerprint is one codegen'd hash
    aggregate over the exploded (doc_id, hash) long relation (count + 48
    bit-sums packed into 12 bigint lanes) — the array-expression
    formulation ran the 48 per-bit passes in Spark's interpreted
    higher-order-function path and was ~20x slower. Bit b is set iff the
    b-bit popcount exceeds half the token count (== the classic ±1 sum
    being positive)."""
    sk = _with_token_hashes(planted_corpus(documents))
    corpus = sk.select("doc_id")
    s48 = _sim48("th")
    tok = (sk.select("doc_id", F.explode("tkh").alias("th"))
           .select("doc_id", F.expr(s48).alias("h")))
    # Per-bit popcounts packed 4-per-long in 16-bit lanes: 12 aggregate
    # buffers instead of 48 (48 separate sums generated pathological
    # whole-stage code — multi-second Janino compiles on every cold run
    # and 49 agg buffer slots per group at scale). Lane capacity 65535
    # tokens/doc; the per-bit counts are IDENTICAL, so the per-bit DuckDB
    # oracle needs no mirror of the packing.
    lanes_per_long = 4
    n_packed = SIM_BITS // lanes_per_long  # bits b, b+12, b+24, b+36 share
    packed = [
        sum(F.shiftleft(F.shiftright("h", j * n_packed + b).bitwiseAND(1),
                        16 * j)
            for j in range(lanes_per_long))
        for b in range(n_packed)
    ]
    sums = (tok.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 *[F.sum(p).alias(f"s{b}") for b, p in enumerate(packed)]))
    assembled = sum(
        F.when(2 * F.shiftright(f"s{b % n_packed}", 16 * (b // n_packed))
               .bitwiseAND(0xFFFF) - F.col("n") > 0,
               F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(SIM_BITS)
    )
    # explode drops zero-token docs; the oracle (and the old array path)
    # keeps them with fingerprint 0 — restore via left join.
    # both sides of the band join read this; memoized so repeat calls
    # (bench passes) reuse one set of blocks instead of leaking persists
    sig = _memo(sk, "simhash_sig", lambda: _materialize(
        corpus.select("doc_id")
        .join(sums.select("doc_id", assembled.alias("sh")), "doc_id", "left")
        .select("doc_id",
                F.coalesce("sh", F.lit(0).cast("long")).alias("simhash"))))
    n_bands = SIM_BITS // SIM_BAND_BITS
    mask = (1 << SIM_BAND_BITS) - 1
    stack_args = ", ".join(
        f"{j}, shiftright(simhash, {j * SIM_BAND_BITS}) & {mask}" for j in range(n_bands))
    bands = sig.selectExpr(
        "doc_id", "simhash", f"stack({n_bands}, {stack_args}) as (band_id, band_key)")
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                  & (F.col("a.band_key") == F.col("b.band_key"))
                  & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"),
                    F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= SIM_HAMMING_MAX))


def simhash_oracle_sql() -> str:
    bit_sums = ", ".join(
        f"list_sum(list_transform(hk, h -> 2 * ((h >> {b}) & 1) - 1)) AS s{b}"
        for b in range(SIM_BITS))
    assembled = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIM_BITS))
    n_bands = SIM_BITS // SIM_BAND_BITS
    mask = (1 << SIM_BAND_BITS) - 1
    band_sel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band_id, (simhash >> {j * SIM_BAND_BITS}) & {mask} AS band_key FROM sig"
        for j in range(n_bands))
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),
tks AS (SELECT doc_id, {_TOKENS_DUCK} AS tk FROM corpus),
tkhs AS (SELECT doc_id, {_TKH_DUCK} AS tkh FROM tks),
hks AS (SELECT doc_id, list_transform(tkh, h -> {_sim48_duck('h')}) AS hk FROM tkhs),
bits AS (SELECT doc_id, {bit_sums} FROM hks),
sig AS (SELECT doc_id, {assembled} AS simhash FROM bits),
bands AS ({band_sel})
SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIM_HAMMING_MAX}
"""


# -------------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(documents: DataFrame) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, rare-shingle blocking:
    candidates share a shingle with document frequency ≤ {JACCARD_RARE_DF}
    (rare shingles are the discriminative ones; common-vocab shingles would
    otherwise make the candidate join quadratic), then exact
    J = |A∩B| / |A∪B| over DISTINCT shingle sets for candidates only."""
    # Shingles are rolling 31-bit hashes, not strings: every downstream
    # shuffle (df count, candidate + intersection joins) moves one bigint
    # per shingle instead of the text, and the exploded rows come off the
    # materialized per-doc hash arrays (already distinct within a doc).
    # Set semantics survive: deterministic hash, the oracle applies the
    # identical one, and cross-doc collisions perturb a Jaccard count on
    # both sides equally.
    sh = (_with_shingle_hashes(planted_corpus(documents))
          .select("doc_id", F.explode("hs").alias("sh_h")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # Candidate pairs via bounded rare buckets, skew-safely:
    #   1. per-shingle df — counter-only aggregation state, so a stop-
    #      shingle appearing in every doc costs one long, not a doc list;
    #   2. keep shingles with 2 <= df <= JACCARD_RARE_DF (df=1 can't pair;
    #      df>4 isn't discriminative) — the collision set, tiny vs corpus;
    #   3. join back and collect each bucket (state provably <= df) and
    #      expand its ordered pairs scalar-wise.
    # vs the naive sh ⋈ rare ⋈ sh this trades the second 5M-row join for
    # a groupBy over only the collision-shingle rows.
    pairable = (sh.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
                .filter((F.col("df") <= JACCARD_RARE_DF) & (F.col("df") >= 2))
                .select("sh_h"))
    cand = (sh.join(pairable, "sh_h")
            .groupBy("sh_h").agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
            .select(F.explode(F.expr(
                "flatten(transform(docs, (d1, i) -> "
                "transform(slice(docs, i + 2, size(docs)), d2 -> struct(d1, d2))))"))
                .alias("p"))
            .select(F.col("p.d1").alias("doc1"), F.col("p.d2").alias("doc2"))
            .distinct())
    # Intersection sizes are computed FROM the candidate pairs (cand → sh
    # twice, all keyed equi-joins) — never from an unblocked sh ⋈ sh on
    # every shared shingle, which a single common shingle makes quadratic.
    # The candidate set is usually a vanishing fraction of the corpus
    # (that's the point of blocking) — but its size scales with corpus
    # DIRTINESS, so the strategy is left to AQE's runtime size gate: it
    # picks broadcast when cand is actually small, without the forced
    # hint that would OOM on a dup-heavy crawl. (An explicit
    # F.broadcast hint is NOT demoted by AQE — it wins regardless of
    # size, which is exactly the hazard.)
    sh1 = sh.select(F.col("doc_id").alias("doc1"), "sh_h")
    sh2 = sh.select(F.col("doc_id").alias("doc2"), "sh_h")
    inter = (sh1.join(cand, "doc1").join(sh2, ["doc2", "sh_h"])
             .groupBy("doc1", "doc2").agg(F.count(F.lit(1)).alias("n_inter")))
    s1 = sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1")
    s2 = sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2")
    return (inter.join(s1, "doc1").join(s2, "doc2")
            .select("doc1", "doc2",
                    (F.col("n_inter").cast("double")
                     / (F.col("n1") + F.col("n2") - F.col("n_inter"))).alias("jaccard"))
            .filter(F.col("jaccard") >= JACCARD_MIN))


def ngram_jaccard_oracle_sql() -> str:
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes().replace('sh AS (', 'sharr AS (', 1)},
sh AS (SELECT doc_id, unnest(hs) AS sh_h FROM sharr),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT sh_h FROM sh GROUP BY sh_h HAVING count(*) <= {JACCARD_RARE_DF}),
cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
         FROM sh a JOIN rare USING (sh_h) JOIN sh b USING (sh_h)
         WHERE a.doc_id < b.doc_id),
inter AS (SELECT c.doc1, c.doc2, count(*) AS n_inter
          FROM cand c JOIN sh a ON a.doc_id = c.doc1
                      JOIN sh b ON b.doc_id = c.doc2 AND b.sh_h = a.sh_h
          GROUP BY 1, 2)
SELECT doc1, doc2,
       CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) AS jaccard
FROM inter JOIN sizes s1 ON inter.doc1 = s1.doc_id
JOIN sizes s2 ON inter.doc2 = s2.doc_id
WHERE CAST(n_inter AS DOUBLE) / (s1.n_sh + s2.n_sh - n_inter) >= {JACCARD_MIN}
"""


# --------------------------------------------------------------- dedup apply

def dedup_apply(documents: DataFrame) -> DataFrame:
    """Materialize the DEDUPED corpus from the minhash cluster graph —
    detect → cluster → keep one per cluster, the step that actually
    shrinks a training corpus. Canonical survivor = the cluster label
    (smallest doc_id in the component, so the original outlives its
    planted mutations); docs outside any cluster keep themselves.
    Output: every (planted) corpus doc with its cluster id and kept flag
    — `SUM(kept)` is the post-dedup corpus size."""
    labels = dedup_clusters(documents)
    corpus = planted_corpus(documents).select("doc_id")
    return (corpus.join(labels, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
                    (F.col("cluster_id").isNull()
                     | (F.col("cluster_id") == F.col("doc_id")))
                    .cast("int").alias("kept")))


def dedup_apply_oracle_sql() -> str:
    return f"""
WITH clusters AS MATERIALIZED ({dedup_clusters_oracle_sql()}),
corpus AS ({PLANTED_CORPUS_SQL})
SELECT c.doc_id,
       COALESCE(k.cluster_id, c.doc_id) AS cluster_id,
       CAST(k.cluster_id IS NULL OR k.cluster_id = c.doc_id AS INT) AS kept
FROM corpus c LEFT JOIN clusters k ON c.doc_id = k.doc_id
"""


TEXT_KNN_K = 3


def text_knn_jaccard(documents: DataFrame, k: int = TEXT_KNN_K) -> DataFrame:
    """Per-document ranked nearest neighbors by exact n-gram Jaccard —
    the text-side companion of the embedding `knn_graph`: candidates
    from the same rare-shingle blocking as `ngram_jaccard_pairs`
    (discriminative shingles, df ≤ {JACCARD_RARE_DF}), exact J over
    distinct shingle sets, then each doc keeps its top {TEXT_KNN_K}
    neighbors (ties by neighbor id). Directed edges over the mirrored
    pair set; ranking is one partitioned window — no global sort."""
    from pyspark.sql import Window
    pairs = ngram_jaccard_pairs(documents).select("doc1", "doc2", "jaccard")
    edges = pairs.unionByName(
        pairs.select(F.col("doc2").alias("doc1"),
                     F.col("doc1").alias("doc2"), "jaccard"))
    w = Window.partitionBy("doc1").orderBy(F.desc("jaccard"), "doc2")
    return (edges.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("doc1").alias("doc_id"),
                    F.col("doc2").alias("nbr_id"), "jaccard",
                    F.col("rank").cast("int").alias("rank")))


def text_knn_oracle_sql(k: int = TEXT_KNN_K) -> str:
    return f"""
WITH pairs AS MATERIALIZED ({ngram_jaccard_oracle_sql()}),
edges AS (SELECT doc1, doc2, jaccard FROM pairs
          UNION ALL SELECT doc2, doc1, jaccard FROM pairs)
SELECT doc1 AS doc_id, doc2 AS nbr_id, jaccard,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc1
                                   ORDER BY jaccard DESC, doc2) AS rank
      FROM edges)
WHERE rank <= {k}
"""


# ---------------------------------------------------- exact substring spans

#: Exact-substring dedup (the "Deduplicating Training Data Makes Language
#: Models Better" signal, Lee et al. 2022): a doc is contaminated by copy
#: work if long token SPANS of it appear verbatim in OTHER docs, even when
#: whole-doc similarity is low. Suffix arrays don't distribute; the
#: scalable re-expression is hashed rolling windows — every W-token window
#: fingerprinted with a polynomial combine of the per-token hashes, window
#: hashes joined on equality. O(tokens) state, all keyed shuffles.
SPAN_W = 8
SPAN_B = 31  # polynomial base; acc < p (2^31) so acc*31 + h < 2^36: exact


def _span_hash_expr() -> str:
    """Rolling W-token window hashes from the shared mod-p token-hash
    layer (`tkh`). Polynomial combine keeps every intermediate under 2^36
    — bit-identical in DuckDB's list_reduce twin."""
    roll = (f"aggregate(slice(tkh, i, {SPAN_W}), cast(0 as bigint), "
            f"(acc, h) -> (acc * {SPAN_B} + h) % {MH_P})")
    return (f"CASE WHEN size(tkh) >= {SPAN_W} THEN "
            f"transform(sequence(1, size(tkh) - {SPAN_W - 1}), i -> {roll}) "
            f"ELSE array() END")


def substring_dup_spans(documents: DataFrame) -> DataFrame:
    """Per-doc duplicated-span coverage: for every doc (planted corpus —
    the suffix-mutated copies share their whole prefix, so they plant
    guaranteed long-span collisions), the fraction of its W-token windows
    that appear verbatim in at least one OTHER doc. The curation signal
    exact-substring dedup cuts on; repetition WITHIN a doc is
    repetition_filter's job and deliberately does not count here.

    Scale shape: window hashes explode to an O(tokens) table; the
    frequency side aggregates to O(distinct spans) before the join back,
    and every stage is a keyed shuffle on the span hash or the doc id —
    never a pairwise comparison. At 100 TB this is the standard
    suffix-array replacement (hash windows, join on equality).
    Reference tie-in: generalizes the MD5 dedup-hash verification idea
    (StreamingApp.scala:361,377-380) from whole-chunk to token-span
    granularity."""
    corpus = planted_corpus(documents)
    spans = (_with_token_hashes(corpus)
             .select("doc_id", F.explode(F.expr(_span_hash_expr())).alias("sp")))
    freq = (spans.groupBy("sp")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2))
    return (spans.join(freq, "sp", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.when(F.col("nd").isNotNull(), 1).otherwise(0))
                  .alias("n_dup_spans"))
            .withColumn("dup_ratio",
                        F.round(F.col("n_dup_spans")
                                / F.col("n_spans").cast("double"), 6)))


SUBSTRING_DUP_ORACLE = f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),
tks AS (SELECT doc_id, {_TOKENS_DUCK} AS tk FROM corpus),
tkhs AS (SELECT doc_id, {_TKH_DUCK} AS tkh FROM tks),
spans AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tkh) >= {SPAN_W} THEN
           [list_reduce(list_prepend(CAST(0 AS BIGINT),
                                     list_slice(tkh, i, i + {SPAN_W - 1})),
                        (acc, h) -> (acc * {SPAN_B} + h) % {MH_P})
            FOR i IN generate_series(1, len(tkh) - {SPAN_W - 1})]
           ELSE CAST([] AS BIGINT[]) END) AS sp
  FROM tkhs),
freq AS (SELECT sp, count(DISTINCT doc_id) AS nd
         FROM spans GROUP BY sp HAVING count(DISTINCT doc_id) >= 2)
SELECT s.doc_id, COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN f.nd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       round(SUM(CASE WHEN f.nd IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
FROM spans s LEFT JOIN freq f USING (sp)
GROUP BY s.doc_id
"""


# ------------------------------------------------------------ record linkage

LINKAGE_MIN_SCORE = 0.6
LINKAGE_SIZE_BAND = 5


def record_linkage(part: DataFrame) -> DataFrame:
    """Entity resolution over the part catalog — canonicalize-then-link,
    the blocking + multi-field scoring shape of a Fellegi–Sunter
    record-linkage pass (an LLM-corpus pipeline runs the same shape to
    merge near-identical source records before dedup;
    engine-beyond-reference).

    Stage 1 CANONICALIZES instances to entity records: groupBy the
    identity fields (p_name, p_type) -> record id = min part key,
    representative size = min size, instance count.  Linking identical
    instances is trivial exact dedup; ER proper operates on the DISTINCT
    record space, which grows with catalog VARIETY, not row count (the
    fixture holds it at 384 records from sf0.01 to sf0.1 — and a 100-TB
    catalog's distinct-entity space is similarly sublinear in rows, so
    the quadratic stage is over a structurally smaller relation).

    Stage 2 blocks on the head noun (last p_name token) — candidates must
    share it, so the pair space is per-block, never records².  Score =
    0.5·Jaccard(name tokens) + 0.3·[same p_type] + 0.2·[|size diff| ≤
    {LINKAGE_SIZE_BAND}]; link if ≥ {LINKAGE_MIN_SCORE}.

    100-TB shape: canonicalization is one keyed aggregation over the
    instance table (the only stage that sees all rows); the block join is
    a keyed equi-join over entity records; a hot block (every product
    called "widget") is the skew hazard, left to AQE's skew-join split.
    Scoring runs on candidates only, all JVM array/string expressions —
    zero Python.
    """
    ent = (part.groupBy("p_name", "p_type")
           .agg(F.min("p_partkey").alias("rec_id"),
                F.min("p_size").alias("rec_size"),
                F.count(F.lit(1)).alias("n_instances")))
    raw = F.split(F.lower(F.col("p_name")), " ")
    # block comes off the RAW ordered split — DuckDB's list_distinct does
    # not preserve order, so the oracle's block must too
    t = ent.select("rec_id", "p_type", "rec_size", "n_instances",
                   F.array_distinct(raw).alias("toks"),
                   F.element_at(raw, -1).alias("block"))
    a = t.select(*[F.col(c).alias(f"a_{c}") for c in t.columns])
    b = t.select(*[F.col(c).alias(f"b_{c}") for c in t.columns])
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size("a_toks") + F.size("b_toks") - inter
    score = F.round(
        0.5 * inter / union
        + 0.3 * (F.col("a_p_type") == F.col("b_p_type")).cast("int")
        + 0.2 * (F.abs(F.col("a_rec_size") - F.col("b_rec_size"))
                 <= LINKAGE_SIZE_BAND).cast("int"), 6)
    return (a.join(b, (F.col("a_block") == F.col("b_block"))
                   & (F.col("a_rec_id") < F.col("b_rec_id")))
            .select(F.col("a_rec_id").alias("key1"),
                    F.col("b_rec_id").alias("key2"),
                    score.alias("score"),
                    (F.col("a_n_instances") * F.col("b_n_instances"))
                    .alias("pair_coverage"))
            .filter(F.col("score") >= LINKAGE_MIN_SCORE))


def record_linkage_oracle_sql() -> str:
    return f"""
WITH ent AS (SELECT p_name, p_type, min(p_partkey) AS rec_id,
                    min(p_size) AS rec_size,
                    CAST(count(*) AS BIGINT) AS n_instances
             FROM part GROUP BY p_name, p_type),
raw AS (SELECT rec_id, p_type, rec_size, n_instances,
               string_split(lower(p_name), ' ') AS rt
        FROM ent),
tb AS (SELECT rec_id, p_type, rec_size, n_instances,
              list_distinct(rt) AS toks, rt[-1] AS block FROM raw),
scored AS (SELECT a.rec_id AS key1, b.rec_id AS key2,
       round(0.5 * len(list_intersect(a.toks, b.toks))
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
           + 0.3 * CAST(a.p_type = b.p_type AS INT)
           + 0.2 * CAST(abs(a.rec_size - b.rec_size) <= {LINKAGE_SIZE_BAND} AS INT),
             6) AS score,
       a.n_instances * b.n_instances AS pair_coverage
  FROM tb a JOIN tb b ON a.block = b.block AND a.rec_id < b.rec_id)
SELECT key1, key2, score, pair_coverage
FROM scored WHERE score >= {LINKAGE_MIN_SCORE}
"""


# ------------------------------------------------- incremental dedup

#: Batch membership split for the incremental-dedup scenario: docs with
#: doc_id % BATCH_MOD == BATCH_REM are "the new batch", the rest are
#: "the already-indexed corpus". PLANT_OFFSET % 7 == 1, so a planted
#: mutation lands in the batch while its original sits in the corpus
#: whenever orig % 7 == 2 — guaranteeing real corpus↔batch near-dup
#: pairs, not just batch-internal ones.
BATCH_MOD = 7
BATCH_REM = 3
#: retention-deleted corpus slice for the incremental keys (disjoint
#: from the arrival remainders): the index must RETIRE these docs.
DEL_REM = (BATCH_REM + 2) % BATCH_MOD

#: verify-side point-lookup gate: candidate corpus doc_ids up to this
#: many are probed through the sigs table's doc_id bloom sidecars
#: (read_eq_any); past it the verify falls back to a pinned full read.
_VERIFY_ID_CAP = 4096


def _sig_of(docs: DataFrame) -> DataFrame:
    """Minhash signatures of an arbitrary (doc_id, text) set — the
    O(|docs|) signing pass (tokenize → md5 token hashes → rolling
    shingles → 16 affine minima), shared shingle layer memoized."""
    sh = _with_shingle_hashes(docs.select("doc_id", "text"))
    return sh.select(
        "doc_id",
        *[F.expr(f"array_min(transform(hs, h -> {_mh_affine(i, 'h')}))")
          .alias(f"mh{i}") for i in range(N_HASHES)])


def build_dedup_index(spark, root, corpus: DataFrame):
    """One-time persisted dedup index over an existing corpus — two
    AcidTables under one AcidCatalog:
      * ``bands`` (band_id, band_hash, doc_id) — the LSH probe surface,
        scanned with only these 3 columns;
      * ``sigs``  (doc_id, mh0..mh15) — the verify surface.
    Paid once, amortized over every future batch."""
    import shutil

    from ..acid_catalog import AcidCatalog

    shutil.rmtree(root, ignore_errors=True)
    cat = AcidCatalog(spark, root)
    # doc_id bloom sidecars make the VERIFY side a point lookup too:
    # dedup_batch reads only the sigs files that may hold its candidate
    # docs (read_eq_any), so per-batch sigs IO is bounded by the
    # candidate set, not the index size. enable_dv: retires (apply_cdf
    # deletes) land as deletion-vector entries — O(matched rows) — a
    # doc_id-keyed retention delete scatters across every sig file, the
    # worst copy-on-write case; compaction materializes vectors away
    cat.create_table("sigs", _sig_of(corpus), bloom_by=["doc_id"],
                     enable_dv=True)
    # bloom sidecars on band_hash make SMALL-batch probes point
    # lookups (read_eq_any) instead of index scans — every commit
    # (including the per-batch appends) indexes its new files in one
    # distributed pass
    cat.create_table("bands", _bands_of(cat.read("sigs"))
                     .select("band_id", "band_hash", "doc_id"),
                     bloom_by=["band_hash"], enable_dv=True)
    return cat


def dedup_retire(cat, doc_ids: DataFrame,
                 txn: tuple[str, int] | None = None) -> None:
    """Retire DELETED docs from the persisted dedup index — the other
    half of the arrival path (a corpus retention DELETE must not leave
    stale index entries matching ghosts): both surfaces drop their
    rows in ONE linked catalog transaction, each an ``apply_cdf``
    keyed on doc_id so only the index files holding those docs are
    rewritten (everything else carried by manifest reference).
    ``txn=(app_id, batch_id)`` rides the per-table writer fence — a
    replayed retire batch commits nothing."""
    ch = (doc_ids.select("doc_id").distinct()
          .withColumn("_change_type", F.lit("delete")))
    if txn is not None:
        app_id, batch_id = txn
        writes = {
            "sigs": ("apply_cdf", ch, ["doc_id"], app_id, batch_id),
            "bands": ("apply_cdf", ch, ["doc_id"], app_id, batch_id)}
    else:
        writes = {"sigs": ("apply_cdf", ch, ["doc_id"]),
                  "bands": ("apply_cdf", ch, ["doc_id"])}
    cat.commit_multi(writes, op="dedup_index_retire")


def dedup_batch(spark, cat, batch: DataFrame,
                append: bool = True,
                txn: tuple[str, int] | None = None) -> DataFrame:
    """Dedup a NEW BATCH against the persisted index in O(batch)
    compute: (1) SIGN THE BATCH ONLY (the expensive tokenize/md5/
    shingle pass runs over O(batch) text, never the corpus); (2)
    candidate retrieval: broadcast the batch's band rows (bounded,
    {N_BANDS}/doc) against a column-pruned scan of the persisted
    ``bands`` table — the index side is never shuffled and its TEXT is
    never re-read; (3) verify est_jaccard >= 0.5 with stored
    signatures from ``sigs`` (corpus side) and the in-hand batch
    signatures; (4) ``append=True`` adds the batch's band+sig rows to
    the index in ONE linked catalog transaction (commit_multi), so the
    next batch probes corpus+this-batch atomically — O(batch)
    maintenance. Returns the (doc1, doc2, est_jaccard) batch-touching
    near-dup pairs, materialized."""
    sig_b = _materialize(_sig_of(batch))
    bands_b = _bands_of(sig_b)
    # ONE catalog snapshot for the whole probe+verify pass: bands and
    # sigs are read at the SAME pinned entry (a replayed batch whose
    # prior index append half-published would otherwise probe bands at
    # latest while verifying against older sigs — torn snapshots)
    pins = cat.snapshot()
    # probe-path choice by batch size: a SMALL batch's distinct band
    # hashes (<= {N_BANDS}/doc) fit a bounded driver list, so the
    # candidate retrieval becomes a bloom-pruned point lookup
    # (read_eq_any: one manifest resolution + one sidecar read per
    # candidate file for ALL needles — O(probes), not O(index scan));
    # big batches keep the broadcast-band-vs-index-scan shape
    n_batch = sig_b.count()
    if N_BANDS * n_batch <= 2048:
        hashes = [r.band_hash for r in
                  bands_b.select("band_hash").distinct().collect()]
        bands_idx = cat.table("bands").read_eq_any(
            "band_hash", hashes, version=pins["bands"])
    else:
        bands_idx = cat.table("bands").read(pins["bands"])
    probe = F.broadcast(bands_b.select(
        F.col("band_id").alias("p_band_id"),
        F.col("band_hash").alias("p_band_hash"),
        F.col("doc_id").alias("batch_doc")))
    # REPLAY idempotency: an at-least-once redelivery whose prior index
    # append already committed finds the batch's own rows in the index
    # — anti-join the index side against the batch's doc_ids (bounded,
    # broadcast) so corpus candidates never include batch members;
    # batch-batch pairs come only from cand_bb, and the union is
    # distinct'd so the two shapes can never double-emit a pair
    batch_ids = F.broadcast(sig_b.select("doc_id"))
    cand_cb = (bands_idx.join(
        probe, (F.col("band_id") == F.col("p_band_id"))
        & (F.col("band_hash") == F.col("p_band_hash")))
        .join(batch_ids, "doc_id", "left_anti")
        .select(F.col("doc_id").alias("corpus_doc"), "batch_doc")
        .distinct())
    cand_bb = _band_pairs(bands_b)
    cand = _materialize(
        cand_cb.select(F.least("corpus_doc", "batch_doc").alias("doc1"),
                       F.greatest("corpus_doc", "batch_doc").alias("doc2"))
        .unionByName(cand_bb)
        .distinct())
    # verify: corpus signatures come from the PERSISTED index (same
    # pinned entry as the band probe), batch signatures are in hand —
    # union covers both pair shapes; the batch anti-join above keeps
    # the union disjoint on a replay. The candidate CORPUS docs are a
    # bounded set, so when they fit a driver list the sigs read is a
    # bloom-pruned point lookup (doc_id sidecars) — per-batch sigs IO
    # bounded by the candidate files, not the index size
    need = (cand.select(F.col("doc1").alias("doc_id"))
            .unionByName(cand.select(F.col("doc2").alias("doc_id")))
            .distinct()
            .join(batch_ids, "doc_id", "left_anti"))
    ids = [r.doc_id for r in need.limit(_VERIFY_ID_CAP + 1).collect()]
    if len(ids) <= _VERIFY_ID_CAP:
        sig_corpus = cat.table("sigs").read_eq_any(
            "doc_id", ids, version=pins["sigs"])
    else:
        sig_corpus = (cat.table("sigs").read(pins["sigs"])
                      .join(batch_ids, "doc_id", "left_anti"))
    sig_all = sig_corpus.unionByName(sig_b)
    s1 = sig_all.select(F.col("doc_id").alias("doc1"),
                        *[F.col(f"mh{i}").alias(f"a{i}")
                          for i in range(N_HASHES)])
    s2 = sig_all.select(F.col("doc_id").alias("doc2"),
                        *[F.col(f"mh{i}").alias(f"b{i}")
                          for i in range(N_HASHES)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(N_HASHES))
    pairs = (cand.join(s1, "doc1").join(s2, "doc2")
             .select("doc1", "doc2",
                     (agree / F.lit(float(N_HASHES))).alias("est_jaccard"))
             .filter(F.col("est_jaccard") >= 0.5))
    pairs = _materialize(pairs)
    if append:
        # ---- index maintenance: ONE linked commit, O(batch) rows.
        # ``txn=(app_id, batch_id)`` rides the per-table writer fence
        # (append_txn): an at-least-once stream's replayed micro-batch
        # re-commits NOTHING — the index never double-counts a batch.
        bb = _bands_of(sig_b).select("band_id", "band_hash", "doc_id")
        if txn is not None:
            app_id, batch_id = txn
            writes = {"sigs": ("append_txn", sig_b, app_id, batch_id),
                      "bands": ("append_txn", bb, app_id, batch_id)}
        else:
            writes = {"sigs": ("append", sig_b),
                      "bands": ("append", bb)}
        cat.commit_multi(writes, op="dedup_index_append")
        # maintenance hygiene: small-file folds are opt-in (table
        # property), the deletion-vector bound is the MAINTAINER's
        # policy (retires land as DV entries on these enable_dv
        # tables; past DV_FOLD_ROWS the hook materializes the vector
        # so the per-scan anti-join tax stays bounded), and
        # autovacuum reclaims out-of-window history when opted in
        from ..acid import DV_FOLD_ROWS
        for name in ("sigs", "bands"):
            t = cat.table(name)
            t.maybe_autocompact(dv_fold_rows=DV_FOLD_ROWS)
            t.maybe_autovacuum()
    return pairs


def dedup_incremental(spark, sf_dir: str, scratch) -> DataFrame:
    """Dedup a NEW BATCH against a PERSISTED corpus index in O(batch)
    compute — the 100 TB arrival path. Every other dedup key re-signs
    the whole corpus per run; at scale new data arrives in batches and
    O(corpus)-per-batch is the real-world killer. Generalizes the
    reference's per-micro-batch hash verify (StreamingApp.scala:377-380
    — verify the NEW chunk against stored state, never re-hash the
    disk) to near-duplicate detection. See ``build_dedup_index`` /
    ``dedup_batch`` for the index layout and the arrival path, and
    ``dedup_retire`` for the retention path exercised here (a corpus
    slice is DELETED before the batch arrives — its index rows retire
    so the batch can never pair with a ghost).

    Pins (in-result booleans): the incremental pair set hash-equals
    the FULL recompute over the final corpus + batch restricted to
    batch-touching pairs, and the maintained index equals a
    from-scratch signature build over final corpus + batch."""
    from pathlib import Path as _P

    from ..sources.tables import load_table

    docs = planted_corpus(load_table(spark, sf_dir, "documents"))
    in_batch = F.col("doc_id") % BATCH_MOD == BATCH_REM
    deleted = F.col("doc_id") % BATCH_MOD == DEL_REM
    corpus, batch = docs.filter(~in_batch), docs.filter(in_batch)

    root = _P(scratch) / f"dedup_index_{_P(sf_dir).name}"
    cat = build_dedup_index(spark, root, corpus)
    # a retention DELETE lands before the arrival: the index retires
    # the slice's band+sig rows (one linked transaction), so the batch
    # can never pair with a ghost. retire_sec split: the retention
    # path folded into this key at round 14 is timed separately so the
    # headline row stays comparable across rounds (telemetry.py)
    from .. import telemetry
    with telemetry.timed("dedup_incremental.retire_sec"):
        dedup_retire(cat, corpus.filter(deleted).select("doc_id"))
    pairs = dedup_batch(spark, cat, batch)

    # ---- pins ----------------------------------------------------
    # (1) incremental result == FULL recompute over the FINAL corpus
    #     (pair computation is per-pair local, so the final-corpus
    #     pair set is the full pair set with no deleted endpoint)
    #     restricted to pairs touching the batch
    # (2) maintained index == from-scratch signature build over the
    #     final corpus + batch (the self-maintenance contract)
    # pin_sec split (r15 ADVICE): the full recompute IS the pin's
    # point, not serving cost — timed separately so the headline row
    # approaches the actual incremental cost (telemetry.py)
    # each equality is ONE signed-groupBy job (multiset_equal): the
    # old exceptAll pair computed every input subtree twice — the full
    # minhash recompute and the fresh signature build are the two most
    # expensive subtrees in the scenario (guide §1.2)
    from ..acid import multiset_equal
    with telemetry.timed("dedup_incremental.pin_sec"):
        full = (minhash_pairs(load_table(spark, sf_dir, "documents"))
                .filter((F.col("doc1") % BATCH_MOD == BATCH_REM)
                        | (F.col("doc2") % BATCH_MOD == BATCH_REM))
                .filter((F.col("doc1") % BATCH_MOD != DEL_REM)
                        & (F.col("doc2") % BATCH_MOD != DEL_REM)))
        matches_full = multiset_equal(pairs, full)
        fresh = _sig_of(docs.filter(~deleted))
        idx_now = cat.read("sigs")
        index_fresh_equal = multiset_equal(idx_now, fresh)
    return (pairs
            .withColumn("matches_full", F.lit(bool(matches_full)))
            .withColumn("index_fresh_equal",
                        F.lit(bool(index_fresh_equal))))


def dedup_incremental_oracle_sql() -> str:
    """DuckDB twin: the full minhash pipeline restricted to pairs that
    touch the batch (doc_id % BATCH_MOD == BATCH_REM) — exactly what
    the incremental path must produce."""
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES))
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes()},{_minhash_cand_ctes()}
SELECT doc1, doc2, ({agree}) / {float(N_HASHES)} AS est_jaccard,
       TRUE AS matches_full, TRUE AS index_fresh_equal
FROM cand JOIN sig s1 ON cand.doc1 = s1.doc_id JOIN sig s2 ON cand.doc2 = s2.doc_id
WHERE ({agree}) / {float(N_HASHES)} >= 0.5
  AND (doc1 % {BATCH_MOD} = {BATCH_REM} OR doc2 % {BATCH_MOD} = {BATCH_REM})
  AND doc1 % {BATCH_MOD} != {DEL_REM} AND doc2 % {BATCH_MOD} != {DEL_REM}
"""


def dedup_incremental_stream(spark, sf_dir: str, scratch) -> DataFrame:
    """The incremental-dedup index as a STREAMING consumer — the full
    self-maintenance loop: a `documents` AcidTable (CDF-enabled) takes
    arrival batches; an `acidtable-cdf-parallel` maintenance stream
    signs each micro-batch, detects its near-dups against the
    persisted index (`dedup_batch`), appends the batch's band+sig rows
    in the same per-batch turn (one linked catalog transaction), and
    APPENDs the detected pairs to a `pairs` results AcidTable (an
    append-only fenced log — each pair is detected by exactly one
    batch, so the append is value-equal to a MERGE at O(batch) commit
    cost) — so both the index and the findings follow the data with
    no rebuild.
    (Reference analog: the per-micro-batch hash verify + Solr index
    maintenance, StreamingApp.scala:377-380 / FileWorkerApp.scala:
    129-141.)

    The retention path rides the same feed: a source DELETE's change
    rows retire the slice's band+sig rows (``dedup_retire``, fenced)
    and drop its stale pairs in the same per-batch turn.

    Pins: the changes land as exactly 3 read-limited micro-batches
    (two arrivals + one delete); the accumulated pair table
    hash-equals the full recompute over the FINAL corpus restricted
    to arrival-touching pairs; the maintained index equals a
    from-scratch signature build over the final corpus."""
    import shutil
    import uuid as _uuid
    from pathlib import Path as _P

    from ..acid import AcidTable
    from ..acid_catalog import AcidCatalog
    from ..sources.pysource import (AcidCdfParallelStreamDataSource,
                                    _drain_incremental)
    from ..sources.tables import load_table

    docs = planted_corpus(load_table(spark, sf_dir, "documents"))
    in_b1 = F.col("doc_id") % BATCH_MOD == BATCH_REM
    in_b2 = F.col("doc_id") % BATCH_MOD == (BATCH_REM + 1) % BATCH_MOD
    corpus = docs.filter(~in_b1 & ~in_b2)

    root = _P(scratch) / f"dedup_stream_{_P(sf_dir).name}"
    shutil.rmtree(root, ignore_errors=True)
    src = AcidTable.create(spark, root / "documents", corpus,
                           enable_cdf=True)
    cat = build_dedup_index(spark, root / "index", corpus)
    pairs_t = AcidTable.create(
        spark, root / "pairs",
        spark.createDataFrame(
            [], "doc1 long, doc2 long, est_jaccard double"))
    # the append-only log trades the old per-batch full rewrite for
    # one small file + one version per batch — OPT INTO the hooks the
    # maintenance loop already calls (maybe_autocompact/-vacuum are
    # props-gated no-ops otherwise; r16 review finding), so the
    # steady-state footprint is bounded: files fold on the compact
    # cadence, out-of-window versions drop on the vacuum cadence
    pairs_t.set_autocompact(max_bytes=8 << 20, min_files=8)
    pairs_t.set_autovacuum(every=8, keep_last=4)

    def maintain(batch: DataFrame, batch_id: int) -> None:
        # persist the in-hand micro-batch first: the emptiness probes,
        # the signing pass, and the retire path's find/rewrite passes
        # each re-execute the Python-DataSource read of the change
        # files otherwise — one boundary crossing per batch, not one
        # per action (guide §4/§5; a micro-batch is a bounded cache)
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            _maintain_batch(batch, batch_id)
        finally:
            batch.unpersist()

    def _maintain_batch(batch: DataFrame, batch_id: int) -> None:
        # ONE tiny agg over the persisted batch replaces the two
        # isEmpty probes (delete side, insert side) — each probe was
        # its own Spark job against the streaming floor (guide §1.2;
        # r16 verdict item 9). Value-equal: same batch, same kinds.
        counts = {r["_change_type"]: r["n"] for r in
                  batch.groupBy("_change_type")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        dels = (batch.filter(F.col("_change_type") == "delete")
                .select("doc_id").distinct())
        if counts.get("delete"):
            # retention path: retire the deleted docs' band+sig rows
            # in one FENCED linked transaction, then drop their stale
            # pairs DISTRIBUTIVELY — delete_semi keeps the deleted-id
            # set a DataFrame end-to-end (semi-join find pass,
            # anti-join rewrite, own (app_id, batch_id) fence), so a
            # retention DELETE whose single CDF micro-batch carries
            # the whole slice never materializes on the driver (the
            # r14 scale-killer was an uncapped collect into a SQL
            # IN-string here). Timed as the key's retire_sec split
            # (telemetry.py — bench comparability).
            from .. import telemetry
            with telemetry.timed(
                    "dedup_incremental_stream.retire_sec"):
                dedup_retire(cat, dels, txn=("dedup-retire", batch_id))
                pairs_t.delete_semi(dels, on=[["doc1"], ["doc2"]],
                                    app_id="dedup-pairs-retire",
                                    batch_id=batch_id)
        ins = (batch.filter(F.col("_change_type") == "insert")
               .select("doc_id", "text"))
        if not counts.get("insert"):
            return
        # batch_id fences the index appends (append_txn): a replayed
        # micro-batch re-commits nothing. The pairs surface is an
        # APPEND-ONLY log with the same fence: every pair is detected
        # by exactly ONE batch (the one where its second endpoint
        # arrives — cand_cb anti-joins the index side against the
        # batch, so corpus-corpus pairs are never re-emitted, and a
        # retired endpoint never re-arrives), so a fenced append is
        # value-equal to the old full-outer MERGE while the commit
        # stays O(batch). The merge rewrote the ENTIRE accumulated
        # pairs table per micro-batch — O(results table) on a
        # forever-running loop, the r15 scale finding.
        found = dedup_batch(spark, cat, ins,
                            txn=("dedup-stream", batch_id))
        pairs_t.append_txn(found, "dedup-pairs", batch_id)
        pairs_t.maybe_autocompact()
        pairs_t.maybe_autovacuum()

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    stream = (spark.readStream.format("acidtable-cdf-parallel")
              .option("path", str(root / "documents"))
              .option("startingVersion", "0")     # exclusive: v1+
              .option("maxVersionsPerTrigger", "1").load()
              .writeStream.outputMode("append").foreachBatch(maintain))
    src.append(docs.filter(in_b1))                           # v1
    src.append(docs.filter(in_b2))                           # v2
    # retention DELETE: the maintenance stream must retire the slice's
    # index rows and its stale pairs
    src.delete_where(f"doc_id % {BATCH_MOD} = {DEL_REM}")    # v3
    n_batches, _ = _drain_incremental(stream)

    # pins (timed as the key's pin_sec split — full recomputes are
    # the proof obligation, not serving cost; telemetry.py) ----------
    from .. import telemetry
    got = pairs_t.read()
    with telemetry.timed("dedup_incremental_stream.pin_sec"):
        touches = (F.col("doc1") % BATCH_MOD).isin(
            BATCH_REM, (BATCH_REM + 1) % BATCH_MOD) | \
            (F.col("doc2") % BATCH_MOD).isin(
                BATCH_REM, (BATCH_REM + 1) % BATCH_MOD)
        alive = ((F.col("doc1") % BATCH_MOD != DEL_REM)
                 & (F.col("doc2") % BATCH_MOD != DEL_REM))
        # one signed-groupBy job per equality (multiset_equal): the
        # exceptAll pair computed each expensive subtree twice
        from ..acid import multiset_equal
        full = (minhash_pairs(load_table(spark, sf_dir, "documents"))
                .filter(touches & alive))
        matches_full = multiset_equal(got, full)
        fresh = _sig_of(docs.filter(
            F.col("doc_id") % BATCH_MOD != DEL_REM))
        idx_now = cat.read("sigs")
        index_fresh_equal = multiset_equal(idx_now, fresh)
    return (got
            .withColumn("matches_full", F.lit(bool(matches_full)))
            .withColumn("index_fresh_equal",
                        F.lit(bool(index_fresh_equal)))
            .withColumn("n_batches", F.lit(int(n_batches))))


def dedup_incremental_stream_oracle_sql() -> str:
    agree = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES))
    b1, b2 = BATCH_REM, (BATCH_REM + 1) % BATCH_MOD
    return f"""
WITH corpus AS ({PLANTED_CORPUS_SQL}),{_shingle_hash_ctes()},{_minhash_cand_ctes()}
SELECT doc1, doc2, ({agree}) / {float(N_HASHES)} AS est_jaccard,
       TRUE AS matches_full, TRUE AS index_fresh_equal, 3 AS n_batches
FROM cand JOIN sig s1 ON cand.doc1 = s1.doc_id JOIN sig s2 ON cand.doc2 = s2.doc_id
WHERE ({agree}) / {float(N_HASHES)} >= 0.5
  AND (doc1 % {BATCH_MOD} IN ({b1}, {b2})
       OR doc2 % {BATCH_MOD} IN ({b1}, {b2}))
  AND doc1 % {BATCH_MOD} != {DEL_REM} AND doc2 % {BATCH_MOD} != {DEL_REM}
"""
