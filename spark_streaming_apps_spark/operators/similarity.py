"""Similarity search over embedding columns (`array<float>`).

Extension surface grounded in the reference's binary-payload + hash-lookup
primitives (SURVEY.md §2.K): brute-force cosine top-k as the exactness
baseline, IVF (coarse-quantizer cells) as the scale path.

All vector math is double-precision JVM array expressions
(`aggregate`/`zip_with`) — sequential accumulation, so the DuckDB oracle
(explicit dot/norm formula) reproduces results bit-for-bit; similarities are
rounded to 6 dp before any threshold/ordering to absorb the last ulp.

Scale: brute force is O(n·q) dots — fine for one query, wrong for n×n.
The IVF variant prunes to `probes` cells (centroid assignment is the same
argmax-dot expression), cutting the scanned fraction to probes/n_cells;
at 100 TB the cell id becomes the partition key so a probe touches only
its partitions (partition pruning on write layout).
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

N_CELLS = 32  # ~sqrt(fixture corpus); at 100 TB cells scale with √n
N_PROBES = 2
TOP_K = 10
NEAR_DUP_COS = 0.99

# The SERVED IVFADC+R funnel config — pinned from `probes_for_recall`
# calibration at a 0.9 recall floor (measured 0.94 recall@10 on the
# fixture corpus at probes=8, shortlist=25*probes=200). The cheap
# 2-probe config stays available (and is reported as telemetry in the
# bench) but serving defaults to the config that clears the recall
# target; re-run the calibration when the corpus drifts.
SERVE_PROBES = 8
SERVE_SHORTLIST = 200

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
_DOT_DUCK = "list_dot_product({a}, {b})"


def _as_double(col: str) -> object:
    return F.expr(f"transform({col}, x -> cast(x as double))")


# ------------------------------------------- trained-artifact disk store
#
# Trained quantizers (Lloyd centroids + assignment, PQ codebooks) are
# write-once artifacts: at 100 TB they are trained on a sample ONCE and
# served to every query forever, so the engine must not retrain per
# session — the in-session memo (`dedup._memo`) alone made every bench
# pass and every fresh session pay the full Lloyd cost again. Artifacts
# persist as scratch parquet keyed by the corpus' analyzed-plan semantic
# hash (same corpus ⇒ same key across sessions; any input change ⇒ new
# key) plus a code-version salt (bump _ANN_STORE_V when training math
# changes so stale artifacts can never serve). Publication is the same
# atomic-rename discipline as AcidTable: build into a tmp dir, rename
# into place, losers of the race discard — readers only ever see a
# complete artifact.

_ANN_STORE_V = 1
_ANN_STORE = Path(os.environ.get(
    "SPARK_GRAFT_SCRATCH",
    str(Path(__file__).resolve().parents[2] / ".scratch"))) / "ann_store"


def _corpus_key(corpus: DataFrame) -> str | None:
    """Artifact key = plan semantic hash PLUS the input files' (path,
    size, mtime) fingerprint — the plan hash alone is path-based, so an
    in-place rewrite of the same files would silently serve a stale
    quantizer; the file fingerprint catches that (non-file plans fall
    back to the plan hash only, same as the in-session memo)."""
    import hashlib

    try:
        h = corpus._jdf.queryExecution().analyzed().semanticHash()
        sig = hashlib.md5(str(h).encode())
        try:
            for f in sorted(corpus.inputFiles()):
                p = f.removeprefix("file:")
                st = os.stat(p)
                sig.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        except Exception:
            pass  # non-file plan: plan hash only
        return f"v{_ANN_STORE_V}_{sig.hexdigest()[:16]}"
    except Exception:
        return None


def _publish_artifact(tmp: Path, path: Path) -> None:
    """Atomically promote a fully-written tmp artifact dir; a racing
    builder that loses the rename just discards its copy."""
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def _artifact_tmp(path: Path) -> Path:
    path.parent.mkdir(parents=True, exist_ok=True)
    return path.with_name(f"{path.name}.tmp-{uuid.uuid4().hex[:8]}")


def _cosine(a: str, b: str) -> object:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return F.expr(f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)")


def _cosine_duck(a: str, b: str) -> str:
    return (f"round({_DOT_DUCK.format(a=a, b=b)} / "
            f"(sqrt({_DOT_DUCK.format(a=a, b=a)}) * sqrt({_DOT_DUCK.format(a=b, b=b)})), 6)")


def _ivf_index(embeddings: DataFrame,
               n_cells: int = N_CELLS) -> DataFrame:
    """The materialized IVF index: every corpus vector (INCLUDING the
    planted near-identical copies: vec_id % 50 == 0 → id + 1_000_000,
    +0.01 on coord 0) scored against the {N_CELLS} seed centroids, top-2
    cells kept — (vec_id, label, e, cell, rn, nrm).

    Built ONCE per (session, input plan) and memoized (same registry as
    the dedup sketch layer, so the bench's per-pass cache clear accounts
    its build inside exactly one query per pass). Every IVF-family
    consumer — ivf_topk, knn_graph, semdedup, embedding_near_dup — is a
    cheap filter over this one table: `rn == 1` recovers single-probe
    assignment, `vec_id < 1_000_000` recovers the unplanted corpus
    (assignment is per-vector, so extra rows never change other rows'
    cells). This is the 100 TB shape: the index is written once,
    partitioned by cell, and served to many queries — not rebuilt per
    query."""
    from pyspark.sql import Window
    from .dedup import _memo, _materialize

    def build() -> DataFrame:
        emb = embeddings.select(
            "vec_id", "label", _as_double("embedding").alias("e"))
        planted = (emb.filter(F.col("vec_id") % 50 == 0)
                   .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                           "label",
                           F.expr("transform(e, (x, i) -> "
                                  "CASE WHEN i = 0 THEN x + 0.01 ELSE x END)")
                            .alias("e")))
        corpus = emb.unionByName(planted)
        cents = (emb.filter(F.col("vec_id") < n_cells)
                 .select(F.col("vec_id").alias("cell"), F.col("e").alias("c")))
        w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), "cell")
        return _materialize(
            corpus.crossJoin(F.broadcast(cents))
            .select("vec_id", "label", "e", "cell",
                    F.expr(_DOT.format(a="e", b="c")).alias("dot"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("vec_id", "label", "e", "cell", "rn", "dot",
                    F.expr(f"sqrt({_DOT.format(a='e', b='e')})").alias("nrm")))

    return _memo(embeddings, f"ivf_index_{n_cells}", build)


def cosine_topk(embeddings: DataFrame, query_vec_id: int = 0,
                k: int = TOP_K) -> DataFrame:
    """Brute-force cosine top-k against the embedding of `query_vec_id`.

    The 1-row query side is broadcast (explicitly) so the scan side never
    shuffles; ordering is (sim DESC, vec_id) for a deterministic k-set."""
    emb = embeddings.withColumn("e", _as_double("embedding"))
    qv = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (emb.filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qv))
            .select("vec_id", "label", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


def cosine_topk_oracle_sql(query_vec_id: int = 0, k: int = TOP_K) -> str:
    cos = _cosine_duck("e", "q")
    return f"""
WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id})
SELECT vec_id, label, {cos} AS sim
FROM emb, q WHERE vec_id != {query_vec_id}
ORDER BY sim DESC, vec_id LIMIT {k}
"""


def embedding_near_dup_pairs(embeddings: DataFrame) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ {NEAR_DUP_COS}) with IVF-cell
    blocking — the scale path: every vector is assigned to its top
    {N_PROBES} coarse cells (multi-probe, so near-ties don't split a true
    pair across a cell boundary), pairs form only WITHIN a shared cell via
    a keyed equi-join, and the exact cosine verifies candidates. No
    all-pairs cross join anywhere in the plan; at 100 TB the cell id is
    the partition key. Planted near-identical vectors (every 50th, +0.01
    on the first coordinate, id+1_000_000) give true positives."""
    assigned = (_ivf_assigned(embeddings, N_PROBES, plant=True)
                # 8-dim head + tail norm for the Cauchy-Schwarz candidate
                # bound below; norms come precomputed from the index
                .withColumn("hd", F.expr("slice(e, 1, 8)"))
                .withColumn("tnrm", F.expr(
                    f"sqrt({_DOT.format(a='slice(e, 9, size(e))', b='slice(e, 9, size(e))')})")))
    a, b = assigned.alias("a"), assigned.alias("b")
    # Exact prune before the full-dimension dot: a.e⋅b.e <= hd_a⋅hd_b +
    # |tail_a||tail_b| (Cauchy-Schwarz), so any pair whose bound is below
    # the threshold can't qualify — drop it after an 8-dim dot instead of
    # a 64-dim one (~90% of within-cell pairs at fixture scale). The 1e-4
    # slack covers the 6-dp rounding applied to the real similarity; the
    # surviving-pair set is EXACTLY the unpruned one, so the oracle needs
    # no mirror of this step.
    bound = F.expr(
        f"({_DOT.format(a='a.hd', b='b.hd')} + a.tnrm * b.tnrm) / (a.nrm * b.nrm)")
    pair_sim = F.expr(
        f"round(({_DOT.format(a='a.e', b='b.e')}) / (a.nrm * b.nrm), 6)")
    return (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .filter(bound >= NEAR_DUP_COS - 1e-4)
            .select(F.col("a.vec_id").alias("vec1"),
                    F.col("b.vec_id").alias("vec2"),
                    pair_sim.alias("sim"))
            .filter(F.col("sim") >= NEAR_DUP_COS)
            .distinct())


def embedding_near_dup_oracle_sql() -> str:
    cos = ("round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)")
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
planted AS (SELECT vec_id + 1000000 AS vec_id,
                   [CASE WHEN i = 1 THEN e[i] + 0.01 ELSE e[i] END
                    FOR i IN generate_series(1, len(e))] AS e
            FROM emb WHERE vec_id % 50 = 0),
corpus AS (SELECT * FROM emb UNION ALL SELECT * FROM planted),
cents AS (SELECT vec_id AS cell, e AS c FROM emb WHERE vec_id < {N_CELLS}),
scored AS (SELECT corpus.vec_id, corpus.e, cents.cell,
                  row_number() OVER (PARTITION BY corpus.vec_id
                                     ORDER BY list_dot_product(corpus.e, cents.c) DESC,
                                              cents.cell) AS rn
           FROM corpus, cents),
assigned AS (SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm
             FROM scored WHERE rn <= {N_PROBES})
SELECT DISTINCT a.vec_id AS vec1, b.vec_id AS vec2, {cos} AS sim
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE {cos} >= {NEAR_DUP_COS}
"""


SRP_BITS = 16
SRP_BAND_BITS = 8
SRP_DIM = 64  # fixture embedding dimensionality (TESTDATA.md)


def _srp_weights() -> list[list[int]]:
    """Deterministic ±1 hyperplane components: md5("srp:<bit>:<dim>")
    parity — both engines see the same literals, so no RNG crosses the
    engine boundary."""
    import hashlib
    return [[1 if int(hashlib.md5(f"srp:{j}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0
             else -1 for i in range(SRP_DIM)]
            for j in range(SRP_BITS)]


def srp_near_dup_pairs(embeddings: DataFrame) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH near-dup detection —
    the angular-LSH alternative to IVF-cell blocking in
    `embedding_near_dup_pairs`: each vector gets a {SRP_BITS}-bit signed-
    random-projection signature, the signature splits into
    {SRP_BITS // SRP_BAND_BITS} bands of {SRP_BAND_BITS} bits, candidate
    pairs share at least one full band (keyed equi-joins, one per band —
    never an all-pairs product), and the exact cosine (≥ {NEAR_DUP_COS},
    rounded 6 dp) verifies. Near-identical vectors differ in few
    signature bits, so banding catches them; at 100 TB each band join is
    a shuffle on an 8-bit key — salt wide buckets the same way the text
    MinHash bands do. Projections are rounded to 6 dp before the sign so
    an accumulation-order ulp can't flip a bit between engines."""
    W = _srp_weights()
    emb = embeddings.select("vec_id", _as_double("embedding").alias("e"))
    planted = (emb.filter(F.col("vec_id") % 50 == 0)
               .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                       F.expr("transform(e, (x, i) -> CASE WHEN i = 0 THEN x + 0.01 ELSE x END)")
                        .alias("e")))
    corpus = emb.unionByName(planted)
    band_cols = []
    for b in range(SRP_BITS // SRP_BAND_BITS):
        bits = []
        for j in range(b * SRP_BAND_BITS, (b + 1) * SRP_BAND_BITS):
            w = "array(" + ", ".join(f"{v}.0D" for v in W[j]) + ")"
            dot = _DOT.format(a="e", b=w)
            bits.append(f"(CASE WHEN round({dot}, 6) >= 0 THEN {1 << (j % SRP_BAND_BITS)} ELSE 0 END)")
        band_cols.append(F.expr(" + ".join(bits)).alias(f"band{b}"))
    # Materialized: both band self-joins read this (4 scans), and each
    # scan would otherwise re-run the 16 hyperplane dot products per row.
    # Memoized so repeat calls reuse one block set (eviction unpersists).
    from .dedup import _memo, _materialize
    signed = _memo(embeddings, "srp_signed", lambda: _materialize(
        corpus.select(
            "vec_id", "e",
            F.expr(f"sqrt({_DOT.format(a='e', b='e')})").alias("nrm"),
            *band_cols)))
    pair_sim = F.expr(
        f"round(({_DOT.format(a='a.e', b='b.e')}) / (a.nrm * b.nrm), 6)")
    cands = None
    for b in range(SRP_BITS // SRP_BAND_BITS):
        a_, b_ = signed.alias("a"), signed.alias("b")
        c = (a_.join(b_, (F.col(f"a.band{b}") == F.col(f"b.band{b}"))
                     & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("vec1"),
                     F.col("b.vec_id").alias("vec2"),
                     pair_sim.alias("sim")))
        cands = c if cands is None else cands.unionByName(c)
    return (cands.filter(F.col("sim") >= NEAR_DUP_COS).distinct())


def srp_near_dup_oracle_sql() -> str:
    W = _srp_weights()
    band_exprs = []
    for b in range(SRP_BITS // SRP_BAND_BITS):
        bits = []
        for j in range(b * SRP_BAND_BITS, (b + 1) * SRP_BAND_BITS):
            w = "CAST([" + ", ".join(str(v) for v in W[j]) + "] AS DOUBLE[])"
            bits.append(f"(CASE WHEN round(list_dot_product(e, {w}), 6) >= 0 "
                        f"THEN {1 << (j % SRP_BAND_BITS)} ELSE 0 END)")
        band_exprs.append(" + ".join(bits) + f" AS band{b}")
    cos = "round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)"
    unions = "\nUNION ALL\n".join(
        f"SELECT a.vec_id AS vec1, b.vec_id AS vec2, {cos} AS sim "
        f"FROM signed a JOIN signed b "
        f"ON a.band{b} = b.band{b} AND a.vec_id < b.vec_id"
        for b in range(SRP_BITS // SRP_BAND_BITS))
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
planted AS (SELECT vec_id + 1000000 AS vec_id,
                   [CASE WHEN i = 1 THEN e[i] + 0.01 ELSE e[i] END
                    FOR i IN generate_series(1, len(e))] AS e
            FROM emb WHERE vec_id % 50 = 0),
corpus AS (SELECT * FROM emb UNION ALL SELECT * FROM planted),
signed AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm,
                  {', '.join(band_exprs)}
           FROM corpus)
SELECT DISTINCT vec1, vec2, sim FROM ({unions})
WHERE sim >= {NEAR_DUP_COS}
"""


def ivf_topk(embeddings: DataFrame, query_vec_id: int = 0,
             k: int = TOP_K) -> DataFrame:
    """IVF-style ANN: coarse cells = the first {N_CELLS} vectors as
    centroids; every vector is assigned to its argmax-dot cell; the query
    probes its best {N_PROBES} cells and ranks only those members.

    Returns (vec_id, label, sim, cell) — sim rounded to 6 dp. Centroid
    assignment uses raw doubles with (dot DESC, cell) tie-break so both
    engines pick identical cells."""
    emb = embeddings.withColumn("e", _as_double("embedding"))
    cents = (emb.filter(F.col("vec_id") < N_CELLS)
             .select(F.col("vec_id").alias("cell"), F.col("e").alias("c")))
    # argmax-cell assignment = the rn==1 slice of the shared IVF index
    # (planted rows excluded: they are the near-dup fixtures, not corpus)
    assigned = (_ivf_index(embeddings)
                .filter((F.col("rn") == 1) & (F.col("vec_id") < 1_000_000))
                .select("vec_id", "label", "e", "cell"))
    probe_cells = (assigned.filter(F.col("vec_id") == query_vec_id)
                   .select("e").crossJoin(F.broadcast(cents))
                   .select("cell", F.expr(_DOT.format(a="e", b="c")).alias("dot"))
                   .orderBy(F.desc("dot"), "cell").limit(N_PROBES)
                   .select("cell"))
    qv = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (assigned.join(F.broadcast(probe_cells), "cell", "left_semi")
            .filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qv))
            .select("vec_id", "label", "cell", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


def ivf_topk_oracle_sql(query_vec_id: int = 0, k: int = TOP_K) -> str:
    cos = _cosine_duck("m.e", "q.q")
    return f"""
WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS c FROM emb WHERE vec_id < {N_CELLS}),
scored AS (SELECT emb.vec_id, emb.label, emb.e, cents.cell,
                  list_dot_product(emb.e, cents.c) AS dot,
                  row_number() OVER (PARTITION BY emb.vec_id
                                     ORDER BY list_dot_product(emb.e, cents.c) DESC, cents.cell) AS rn
           FROM emb, cents),
assigned AS (SELECT vec_id, label, e, cell FROM scored WHERE rn = 1),
probe AS (SELECT cents.cell FROM (SELECT e FROM emb WHERE vec_id = {query_vec_id}) qq, cents
          ORDER BY list_dot_product(qq.e, cents.c) DESC, cents.cell LIMIT {N_PROBES}),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id})
SELECT m.vec_id, m.label, m.cell, {cos} AS sim
FROM assigned m JOIN probe USING (cell), q
WHERE m.vec_id != {query_vec_id}
ORDER BY sim DESC, m.vec_id LIMIT {k}
"""


# ------------------------------------------------------- knn graph / semdedup

KNN_K = 5


def _ivf_assigned(embeddings: DataFrame, probes: int,
                  plant: bool = False,
                  n_cells: int = N_CELLS,
                  with_dot: bool = False) -> DataFrame:
    """(vec_id, e, cell, nrm[, dot]): every vector in its top-`probes`
    coarse cells (argmax centroid dot, ties by cell id), norm
    precomputed once; ``with_dot`` keeps the vector·centroid score (the
    1-D within-cell ordering knn_graph's band cap rides). With `plant`,
    the near-identical copies (vec_id % 50 == 0 → id + 1_000_000, +0.01
    on coord 0) join the corpus — the shared fixture of the near-dup
    family. A filter view over the memoized `_ivf_index`; shared base
    of knn_graph / semdedup / embedding_near_dup blocking."""
    assert probes <= 2, "shared _ivf_index materializes top-2 cells only"
    idx = _ivf_index(embeddings, n_cells).filter(F.col("rn") <= probes)
    if not plant:
        idx = idx.filter(F.col("vec_id") < 1_000_000)
    cols = ["vec_id", "e", "cell", "nrm"] + (["dot"] if with_dot else [])
    return idx.select(*cols)


def knn_graph(embeddings: DataFrame, k: int = KNN_K,
              n_cells: int = N_CELLS,
              band: int | None = None) -> DataFrame:
    """Approximate k-NN graph: directed edges (vec_id → nbr_id, exact
    cosine, rank ≤ {KNN_K}) where candidates share one of the vector's
    top-{N_PROBES} IVF cells — the corpus-wide companion of `ivf_topk`
    (one query) and the graph a semantic-dedup / curriculum pipeline
    consumes. Every join is keyed on the cell id; no all-pairs product.
    At 100 TB the cell is the partition key and each within-cell block is
    independent — the standard IVF trade: recall bounded by multi-probe,
    cost by ~n²/cells per cell.

    ``band`` caps per-node candidate work INSIDE each cell (the r14
    residual: even at √n cells, within-cell pairs grow ~n per node):
    cell members are 1-D ordered by their vector·centroid score (a
    geometric locality proxy — near-identical vectors score
    near-identically and land adjacent), and a node pairs only with
    the ``band`` predecessors/successors in that order, so dots per
    node are O(band · probes) instead of O(cell size). Deterministic
    (score desc, vec_id tiebreak) and oracle-mirrorable. The pair
    enumeration itself joins on (cell, block) with adjacent-block
    expansion — O(members · band) candidate rows, never the within-
    cell cross product.

    The cap is OCCUPANCY-ADAPTIVE (r16): cells with at most
    {KNN_BAND_ENGAGE}·band members pair all-pairs (the uncapped
    shape — at low occupancy the band covered most of the cell
    anyway, so capping there only cost recall, the r15 finding:
    recall@1 0.45 vs 0.55 at the 1x fixture), while cells past the
    threshold get the band. Work in an engaged cell is O(band) per
    node and in a small cell O(engage·band) per node, so the bound
    per node is O(engage · band · probes) at ANY occupancy — the cap
    is free where it isn't needed and binding exactly where the
    within-cell quadratic would bite. Cell size is a window count
    over the same partition the ordering already shuffles on (no
    extra exchange), deterministic, and oracle-mirrorable."""
    from pyspark.sql import Window
    assigned = _ivf_assigned(embeddings, N_PROBES, n_cells=n_cells,
                             with_dot=band is not None)
    # candidate id-pairs FIRST (ints only, a < b), deduped across shared
    # multi-probe cells, THEN one vector fetch per side — each unordered
    # pair's dot (the plan's dominant cost) runs exactly ONCE, after the
    # distinct, and the distinct itself shuffles two ints per pair
    # instead of doubles
    if band is None:
        a, b = assigned.alias("a"), assigned.alias("b")
        cand = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                       & (F.col("a.vec_id") < F.col("b.vec_id")))
                .select(F.col("a.vec_id").alias("vec_id"),
                        F.col("b.vec_id").alias("nbr_id"))
                .distinct())
    else:
        w_ord = Window.partitionBy("cell").orderBy(F.desc("dot"),
                                                   "vec_id")
        engage = KNN_BAND_ENGAGE * band
        # one exchange+sort computes ord/cnt/blk; the small and big
        # branches below both derive from it, so ReuseExchange serves
        # all of them from the SAME shuffle (an r17 attempt to replace
        # the count window with a keyed agg + join measured SLOWER —
        # 3.06->3.60 s min-of-3 — precisely because it fragmented this
        # shared exchange into per-branch joins; kept as-is, guide §2.4)
        ordd = (assigned
                .withColumn("dot", F.round("dot", 6))
                .withColumn("ord", F.row_number().over(w_ord))
                # same partition as the ordering window: the count
                # rides the shuffle already paid for row_number
                .withColumn("cnt", F.count(F.lit(1)).over(
                    Window.partitionBy("cell")))
                .withColumn("blk", ((F.col("ord") - 1)
                                    / F.lit(band)).cast("int"))
                .select("vec_id", "cell", "ord", "blk", "cnt"))
        # occupancy split: a cell is entirely small or entirely
        # engaged (cnt is per-cell), so the two branches partition
        # the cells and the union can't double-emit within a cell
        small = (ordd.filter(F.col("cnt") <= engage)
                 .select("vec_id", "cell"))   # cnt/ord/blk dead here
        sa, sb = small.alias("a"), small.alias("b")
        cand_small = (sa.join(sb, (F.col("a.cell") == F.col("b.cell"))
                              & (F.col("a.vec_id")
                                 < F.col("b.vec_id")))
                      .select(F.col("a.vec_id").alias("vec_id"),
                              F.col("b.vec_id").alias("nbr_id")))
        # adjacent-block expansion: |ord(a) - ord(b)| <= band pairs
        # live in a's block ± 1, so the join key is (cell, block) and
        # per-key fan-in is O(band) — the shuffle carries 3 ints/row
        big = ordd.filter(F.col("cnt") > engage).drop("cnt")
        a = (big.withColumn(
            "jblk", F.explode(F.array(F.col("blk") - 1, F.col("blk"),
                                      F.col("blk") + 1)))
            .alias("a"))
        b = big.alias("b")
        cand = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                       & (F.col("a.jblk") == F.col("b.blk"))
                       & (F.col("a.vec_id") < F.col("b.vec_id"))
                       & (F.abs(F.col("a.ord") - F.col("b.ord"))
                          <= band))
                .select(F.col("a.vec_id").alias("vec_id"),
                        F.col("b.vec_id").alias("nbr_id"))
                .unionByName(cand_small)
                .distinct())
        assigned = assigned.drop("dot")
    # vector fetch: plain keyed equi-joins on the id — at 100x the corpus
    # vector table can NEVER broadcast (it IS the dataset), so the scale
    # shape is a co-partitioned shuffle join per side; AQE still demotes
    # to broadcast on its own when the size estimate clears the
    # autoBroadcastJoinThreshold, which is the only safe gate. Forcing
    # F.broadcast here (as an earlier version did) is a driver/executor
    # OOM at scale.
    vecs = assigned.dropDuplicates(["vec_id"]).select("vec_id", "e", "nrm")
    va = vecs.select("vec_id", F.col("e").alias("ea"), F.col("nrm").alias("na"))
    vb = vecs.select(F.col("vec_id").alias("nbr_id"), F.col("e").alias("eb"),
                     F.col("nrm").alias("nb"))
    sim = F.expr(f"round(({_DOT.format(a='ea', b='eb')}) / (na * nb), 6)")
    # cache the half-pair sims BEFORE mirroring: the union's two branches
    # would otherwise each re-execute the candidate+fetch+dot subplan
    # (the plan audit showed the whole pipeline doubled — 15 exchanges);
    # with the InMemoryRelation both branches scan one computed result,
    # so each unordered pair's dot still runs exactly once.
    # (persist, not checkpoint: checkpointing this alias-heavy plan
    # trips attribute rewriting in the downstream union on Spark 4.1)
    # Memoized so bench/scaling re-invocations reuse one block set and
    # the harness cache clear releases it — a bare persist leaked here.
    from .dedup import _memo, _materialize
    half = _memo(embeddings, f"knn_half_{k}_{n_cells}_{band}",
                 lambda: _materialize(
        cand.join(va, "vec_id")
        .join(vb, "nbr_id")
        .select("vec_id", "nbr_id", sim.alias("sim"))))
    pairs = half.unionByName(
        half.select(F.col("nbr_id").alias("vec_id"),
                    F.col("vec_id").alias("nbr_id"), "sim"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nbr_id")
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_graph_oracle_sql(k: int = KNN_K) -> str:
    cos = "round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)"
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS c FROM emb WHERE vec_id < {N_CELLS}),
scored AS (SELECT emb.vec_id, emb.e, cents.cell,
                  row_number() OVER (PARTITION BY emb.vec_id
                                     ORDER BY list_dot_product(emb.e, cents.c) DESC,
                                              cents.cell) AS rn
           FROM emb, cents),
assigned AS (SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm
             FROM scored WHERE rn <= {N_PROBES}),
pairs AS (SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id, {cos} AS sim
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.vec_id != b.vec_id),
ranked AS (SELECT vec_id, nbr_id, sim,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, nbr_id) AS rank
           FROM pairs)
SELECT vec_id, nbr_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


#: default within-cell candidate band for knn_graph_banded: a node
#: pairs with ~2·band neighbors per probe cell (~4·band candidates at
#: N_PROBES=2) — c·k with c ≈ 50 at k=5, sized so sampled recall@1 at
#: the 1x fixture stays at the uncapped blocking's own level (0.55,
#: SCALING.md) while capping per-node dots independently of cell size
#: (the 100 TB knob).
KNN_BAND = 64

#: the band cap engages only past KNN_BAND_ENGAGE·band members per
#: cell (occupancy-adaptive, r16): below it the band covered most of
#: the cell anyway, so capping only cost recall (0.45 vs 0.55
#: recall@1 at the 1x fixture, whose largest cell holds ~143 < 256);
#: past it the within-cell quadratic is the thing the cap exists to
#: bound. Per-node work is O(engage·band·probes) either way.
KNN_BAND_ENGAGE = 4


def knn_graph_banded_oracle_sql(k: int = KNN_K,
                                band: int = KNN_BAND) -> str:
    """DuckDB mirror of the band-capped graph: same IVF assignment,
    then a within-cell 1-D order on round(vector·centroid, 6) (vec_id
    tiebreak — identical across engines) and pairs restricted to
    |ord(a) - ord(b)| <= band ONLY in cells past the
    occupancy-adaptive engage threshold (small cells pair all-pairs,
    the uncapped shape — KNN_BAND_ENGAGE)."""
    cos = "round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)"
    engage = KNN_BAND_ENGAGE * band
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cents AS (SELECT vec_id AS cell, e AS c FROM emb WHERE vec_id < {N_CELLS}),
scored AS (SELECT emb.vec_id, emb.e, cents.cell,
                  list_dot_product(emb.e, cents.c) AS dot,
                  row_number() OVER (PARTITION BY emb.vec_id
                                     ORDER BY list_dot_product(emb.e, cents.c) DESC,
                                              cents.cell) AS rn
           FROM emb, cents),
assigned AS (SELECT vec_id, e, cell, round(dot, 6) AS dot,
                    sqrt(list_dot_product(e, e)) AS nrm
             FROM scored WHERE rn <= {N_PROBES}),
ordd AS (SELECT vec_id, e, cell, nrm,
                row_number() OVER (PARTITION BY cell
                                   ORDER BY dot DESC, vec_id) AS ord,
                count(*) OVER (PARTITION BY cell) AS cnt
         FROM assigned),
pairs AS (SELECT DISTINCT a.vec_id, b.vec_id AS nbr_id, {cos} AS sim
          FROM ordd a JOIN ordd b
            ON a.cell = b.cell AND a.vec_id != b.vec_id
           AND (a.cnt <= {engage} OR abs(a.ord - b.ord) <= {band})),
ranked AS (SELECT vec_id, nbr_id, sim,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY sim DESC, nbr_id) AS rank
           FROM pairs)
SELECT vec_id, nbr_id, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def semdedup(embeddings: DataFrame,
             n_cells: int = N_CELLS) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023 shape): cluster by
    coarse centroid (argmax cell, single probe), and inside each cluster
    drop any vector whose cosine to a SMALLER-id cluster member reaches
    {NEAR_DUP_COS} — keep-first-by-id, the deterministic batch variant of
    the paper's keep-one-per-duplicate-group. Output is every (planted)
    corpus vector with its cell and a kept flag.

    The Cauchy-Schwarz head/tail bound prunes pairs that provably cannot
    reach the threshold BEFORE the full-dimension dot; pruning only
    discards pairs with sim < τ, and the output is a ≥-τ FLAG (not the
    max sim), so the pruned plan is exactly the unpruned one — the oracle
    needs no mirror of the prune."""
    assigned = (_ivf_assigned(embeddings, 1, plant=True,
                              n_cells=n_cells)
                .withColumn("hd", F.expr("slice(e, 1, 8)"))
                .withColumn("tnrm", F.expr(
                    f"sqrt({_DOT.format(a='slice(e, 9, size(e))', b='slice(e, 9, size(e))')})")))
    a, b = assigned.alias("a"), assigned.alias("b")
    bound = F.expr(
        f"({_DOT.format(a='a.hd', b='b.hd')} + a.tnrm * b.tnrm) / (a.nrm * b.nrm)")
    sim = F.expr(
        f"round(({_DOT.format(a='a.e', b='b.e')}) / (a.nrm * b.nrm), 6)")
    dropped = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                      & (F.col("b.vec_id") < F.col("a.vec_id")))
               .filter(bound >= NEAR_DUP_COS - 1e-4)
               .filter(sim >= NEAR_DUP_COS)
               .select(F.col("a.vec_id").alias("vec_id"))
               .distinct())
    return (assigned.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
            .select("vec_id", "cell",
                    F.when(F.col("_d").isNull(), 1).otherwise(0).alias("kept")))


def semdedup_oracle_sql() -> str:
    cos = "round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)"
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
planted AS (SELECT vec_id + 1000000 AS vec_id,
                   [CASE WHEN i = 1 THEN e[i] + 0.01 ELSE e[i] END
                    FOR i IN generate_series(1, len(e))] AS e
            FROM emb WHERE vec_id % 50 = 0),
corpus AS (SELECT * FROM emb UNION ALL SELECT * FROM planted),
cents AS (SELECT vec_id AS cell, e AS c FROM emb WHERE vec_id < {N_CELLS}),
scored AS (SELECT corpus.vec_id, corpus.e, cents.cell,
                  row_number() OVER (PARTITION BY corpus.vec_id
                                     ORDER BY list_dot_product(corpus.e, cents.c) DESC,
                                              cents.cell) AS rn
           FROM corpus, cents),
assigned AS (SELECT vec_id, e, cell, sqrt(list_dot_product(e, e)) AS nrm
             FROM scored WHERE rn = 1),
dropped AS (SELECT DISTINCT a.vec_id
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND b.vec_id < a.vec_id
            WHERE {cos} >= {NEAR_DUP_COS})
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
"""


# ------------------------------------------------------- k-means refinement

KM_ITERS = 2
#: per-element decimal quantum for centroid-mean sums: float inputs widen
#: exactly to double, then round identically to 6 dp on both engines, so
#: the per-(cell,dim) SUM is exact integer arithmetic — order-independent
#: and bit-identical Spark↔DuckDB. The mean re-enters double land via one
#: deterministic cast + division.
KM_DEC = "decimal(18,6)"


def _sq_dist(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"cast(0.0 as double), (acc, v) -> acc + v)")


def _sq_dist_fixed(a: str, b: str, n: int) -> str:
    """Unrolled squared distance for tiny fixed-length arrays (the PQ
    subvectors): plain left-associative arithmetic that whole-stage
    codegen compiles, instead of an interpreted higher-order fold —
    bit-identical to `_sq_dist` (0.0 + d0 == d0; same addition order),
    so every DuckDB twin is unchanged."""
    return " + ".join(f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
                      for i in range(n))


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmin squared-distance cell assignment, ties by cell id: ONE
    broadcast join of the k-row centroid table against the corpus, then
    min_by over the deterministic (dist, cell) key — no window, no sort.
    Extra columns (label, ...) ride along via any_value (exactly one row
    per vec_id survives the agg)."""
    extras = [c for c in emb.columns if c not in ("vec_id", "e")]
    return (emb.join(F.broadcast(cents))
            .withColumn("dist", F.expr(_sq_dist_fixed("e", "c", SRP_DIM)))
            .groupBy("vec_id")
            .agg(F.expr("min_by(cell, struct(dist, cell))").alias("cell"),
                 F.any_value("e").alias("e"),
                 *[F.any_value(c).alias(c) for c in extras]))


def _km_means(assigned: DataFrame) -> DataFrame:
    """Per-cell centroid means through {KM_DEC} partial sums — exact
    integer arithmetic after the 6-dp widening, so the per-(cell,dim) SUM
    is order-independent and bit-identical across engines; only (cell,
    dim) partials shuffle, never the corpus."""
    dims = (assigned.select("cell", F.posexplode("e").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("x").cast(KM_DEC)).alias("sx"),
                 F.count(F.lit(1)).alias("n")))
    return (dims
            .withColumn("m", F.col("sx").cast("double") / F.col("n"))
            .groupBy("cell")
            .agg(F.expr("transform(array_sort(collect_list(struct(dim, m))),"
                        " p -> p.m)").alias("c")))


def _lloyd_chain(embeddings: DataFrame, iters: int = KM_ITERS):
    """ONE memoized Lloyd run per (session, corpus, iters), shared by the
    training summary (kmeans_refine) and the trained-quantizer servers
    (ivf_topk_trained) — at scale the refined centroids are trained once
    and served to every query, so the engine must not re-run the chain
    per consumer. Returns (last_assignment(vec_id, cell), final
    centroids(cell, c)), both durably materialized (lineage-keeping
    persist — executor loss recomputes instead of failing).

    Across sessions/passes both pieces serve from the trained-artifact
    disk store: training runs once per corpus, every later consumer
    pays a parquet scan of the (tiny) centroid table and the (vec_id,
    cell) assignment — exactly the production split between index BUILD
    and index SERVE."""
    from .dedup import _memo, _materialize

    key = _corpus_key(embeddings)
    path = _ANN_STORE / f"lloyd_{iters}_{key}" if key else None

    def build():
        spark = embeddings.sparkSession
        if path is not None and (path / "_DONE").exists():
            return (_materialize(spark.read.parquet(str(path / "assign"))),
                    _materialize(spark.read.parquet(str(path / "cents"))))
        emb = _materialize(
            embeddings.select("vec_id", _as_double("embedding").alias("e")))
        cents = (emb.filter(F.col("vec_id") < N_CELLS)
                 .select(F.col("vec_id").cast("int").alias("cell"),
                         F.col("e").alias("c")))
        assigned = None
        for _ in range(iters):
            assigned = _km_assign(emb, cents)
            cents = _km_means(assigned)
        assigned_m = _materialize(assigned.select("vec_id", "cell"))
        cents_m = _materialize(cents)
        if path is not None:
            tmp = _artifact_tmp(path)
            assigned_m.write.parquet(str(tmp / "assign"))
            cents_m.write.parquet(str(tmp / "cents"))
            (tmp / "_DONE").touch()
            _publish_artifact(tmp, path)
        # emb rides in the memo tuple so eviction releases its blocks too
        return (assigned_m, cents_m, emb)

    return _memo(embeddings, f"lloyd_chain_{iters}", build)[:2]


def _trained_centroids(embeddings: DataFrame,
                       iters: int = KM_ITERS) -> DataFrame:
    """The TRAINED coarse quantizer: final Lloyd centroids (cell, c) —
    the small write-once artifact every ANN query assigns against."""
    return _lloyd_chain(embeddings, iters)[1]


def kmeans_refine(embeddings: DataFrame, iters: int = KM_ITERS) -> DataFrame:
    """Lloyd k-means refinement of the IVF coarse quantizer: start from the
    fixed seed centroids (vec_id < {N_CELLS}, the same seeds ivf_topk
    assigns against), run {KM_ITERS} assign→mean iterations, report each
    surviving cell's size and centroid digest (first coordinate + L2 norm,
    6 dp). This is the training step that turns the arbitrary seed cells
    into a real coarse quantizer for IVF/semdedup at scale.

    Scale shape per iteration: one broadcast join of the (k)-row centroid
    table against the corpus for assignment (argmin squared-distance via
    min_by over a deterministic (dist, cell) key — no window, no sort),
    then one posexplode + keyed agg whose state is k·dims decimal sums —
    the classic two-stage mean with map-side combine. The corpus is never
    shuffled; only (cell, dim) partial sums move."""
    assigned, cents = _lloyd_chain(embeddings, iters)
    return (assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
            .join(cents, "cell")
            .select("cell", "n_members",
                    F.expr("round(element_at(c, 1), 6)").alias("c0"),
                    F.expr(f"round(sqrt({_DOT.format(a='c', b='c')}), 6)")
                    .alias("c_norm")))


_KM_SQ = ("list_sum(list_transform(range(1, 1 + len(a.e)), "
          "i -> (a.e[i] - c.c[i]) * (a.e[i] - c.c[i])))")


def _km_ctes(iters: int = KM_ITERS,
             train_pred: str | None = None) -> list[str]:
    """DuckDB CTE chain of the Lloyd loop — the exact twin of
    _km_assign/_km_means, shared by the kmeans_refine and
    ivf_topk_trained oracles (one committed derivation, two checks).
    ``train_pred`` restricts the TRAINING corpus (seeds + every Lloyd
    assignment) to a subset of ``emb`` — the incremental-index oracle
    trains on the initial corpus only, then assigns everyone."""
    src = "emb"
    ctes = ["emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e "
            "FROM embeddings)"]
    if train_pred:
        ctes.append(f"temb AS (SELECT * FROM emb WHERE {train_pred})")
        src = "temb"
    prev = f"(SELECT vec_id AS cell, e AS c FROM {src} WHERE vec_id < {N_CELLS})"
    for it in range(iters):
        ctes.append(f"""
asg{it} AS (SELECT a.vec_id, a.label, a.e, c.cell
            FROM {src} a, {prev} c
            QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                       ORDER BY {_KM_SQ}, c.cell) = 1)""")
        ctes.append(f"""
dims{it} AS (SELECT cell, d.i - 1 AS dim,
                    SUM(CAST(e[d.i] AS DECIMAL(18,6))) AS sx, COUNT(*) AS n
             FROM asg{it}, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) d
             GROUP BY cell, d.i)""")
        ctes.append(f"""
cents{it} AS (SELECT cell, list(CAST(sx AS DOUBLE) / n ORDER BY dim) AS c
              FROM dims{it} GROUP BY cell)""")
        prev = f"cents{it}"
    return ctes


def kmeans_refine_oracle_sql(iters: int = KM_ITERS) -> str:
    last = iters - 1
    return f"""
WITH {','.join(_km_ctes(iters))}
SELECT a.cell, COUNT(*) AS n_members,
       any_value(round(c.c[1], 6)) AS c0,
       any_value(round(sqrt(list_dot_product(c.c, c.c)), 6)) AS c_norm
FROM asg{last} a JOIN cents{last} c ON a.cell = c.cell
GROUP BY a.cell
"""


def ivf_topk_trained(embeddings: DataFrame, query_vec_id: int = 0,
                     k: int = TOP_K, probes: int = N_PROBES) -> DataFrame:
    """IVF top-k against the TRAINED coarse quantizer — closes the loop
    between `kmeans_refine` (training) and `ivf_topk` (serving): corpus
    vectors assign to the Lloyd-refined centroids (argmin squared
    distance, ties by cell — the same rule training used), the query
    probes its {N_PROBES} nearest trained cells, and only those members
    rank by exact cosine. At 100 TB the trained centroid table is the
    small write-once artifact every query broadcasts; recall against
    brute force is the metric that justifies training the quantizer
    (tests/test_similarity.py pins it on the fixture)."""
    emb = embeddings.select("vec_id", "label",
                            _as_double("embedding").alias("e"))
    cents = _trained_centroids(embeddings)
    assigned = _km_assign(emb, cents)
    qe = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    probe = (cents.join(F.broadcast(qe))
             .select("cell", F.expr(_sq_dist_fixed("c", "q", SRP_DIM)).alias("dist"))
             .orderBy("dist", "cell").limit(probes)
             .select("cell"))
    return (assigned.join(F.broadcast(probe), "cell", "left_semi")
            .filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qe))
            .select("vec_id", "label", "cell", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


def ivf_topk_trained_oracle_sql(query_vec_id: int = 0, k: int = TOP_K,
                                iters: int = KM_ITERS) -> str:
    last = iters - 1
    qsq = ("list_sum(list_transform(range(1, 1 + len(c.c)), "
           "i -> (c.c[i] - q.q[i]) * (c.c[i] - q.q[i])))")
    cos = _cosine_duck("m.e", "q.q")
    return f"""
WITH {','.join(_km_ctes(iters))},
assigned AS (SELECT a.vec_id, a.label, a.e, c.cell
             FROM emb a, cents{last} c
             QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                        ORDER BY {_KM_SQ}, c.cell) = 1),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id}),
probe AS (SELECT c.cell FROM cents{last} c, q
          ORDER BY {qsq}, c.cell LIMIT {N_PROBES})
SELECT m.vec_id, m.label, m.cell, {cos} AS sim
FROM assigned m JOIN probe USING (cell), q
WHERE m.vec_id != {query_vec_id}
ORDER BY sim DESC, m.vec_id LIMIT {k}
"""


def ivf_partitioned_probe(spark, sf_dir: str, scratch,
                          query_vec_id: int = 0, k: int = TOP_K) -> DataFrame:
    """ANN serving from the PHYSICAL layout that scales: the IVF index is
    written once partitioned by cell id, and a probe reads ONLY its probe
    cells' partitions — partition pruning at the source makes query IO
    proportional to probes/n_cells of the index, not the corpus
    (tests/test_plans.py asserts the PartitionFilters reach the scan).
    Same result contract as `ivf_topk` (shared oracle); the difference is
    WHERE the cell filter executes: in the scan's directory pruning
    instead of a post-scan semi-join. The two probe-cell ids are fetched
    to the driver (a 2-int scalar fetch — that IS how partition pruning
    is driven) and inlined as literals."""
    import shutil

    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(scratch / f"ivf_layout_{sf_dir.rstrip('/').rsplit('sf', 1)[-1]}")
    marker = Path(out) / "_SUCCESS"
    if not marker.exists():
        shutil.rmtree(out, ignore_errors=True)
        (_ivf_index(emb)
         .filter((F.col("rn") == 1) & (F.col("vec_id") < 1_000_000))
         .select("vec_id", "label", "e", "cell")
         .write.partitionBy("cell").parquet(out))
    cents = (emb.withColumn("e", _as_double("embedding"))
             .filter(F.col("vec_id") < N_CELLS)
             .select(F.col("vec_id").alias("cell"), F.col("e").alias("c")))
    qv = (emb.withColumn("e", _as_double("embedding"))
          .filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    probe_cells = [r.cell for r in
                   (qv.crossJoin(F.broadcast(cents))
                    .select("cell",
                            F.expr(_DOT.format(a="q", b="c")).alias("dot"))
                    .orderBy(F.desc("dot"), "cell").limit(N_PROBES)
                    .collect())]
    back = spark.read.parquet(out).filter(F.col("cell").isin(probe_cells))
    return (back.filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qv))
            .select("vec_id", "label", F.col("cell").cast("bigint").alias("cell"),
                    _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


# -------------------------------------------------- product quantization

PQ_M = 16      # subspaces over the 64-dim fixture embedding
PQ_KS = 64     # codewords per subspace (codebook = PQ_M x PQ_KS sub-vectors)
PQ_SUB = SRP_DIM // PQ_M


def _pq_codebook(embeddings: DataFrame) -> DataFrame:
    """(m, j, cw): codeword j of subspace m = dims [m*{PQ_SUB}+1 ..] of
    corpus vector j — the deterministic SEED codebook (same committed-seed
    stance as the IVF coarse quantizer). {PQ_M}x{PQ_KS} rows total:
    always broadcastable, at any corpus scale. Serving goes through
    `_pq_trained_codebook`, which Lloyd-refines this seed."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("e"))
    subs = ", ".join(
        f"{m}, slice(e, {m * PQ_SUB + 1}, {PQ_SUB})" for m in range(PQ_M))
    return (emb.filter(F.col("vec_id") < PQ_KS)
            .selectExpr(f"cast(vec_id as int) as j",
                        f"stack({PQ_M}, {subs}) as (m, cw)"))


def _pq_trained_codebook(embeddings: DataFrame) -> DataFrame:
    """One Lloyd refinement of the seed codebook, per subspace — PQ's
    actual training step (Jégou et al. run k-means per subspace; one
    exact iteration already moves codewords from arbitrary seeds to
    cluster means, and recall@10 follows). All {PQ_M} subspaces train in
    ONE pipeline: assignment is the seed-codebook argmin per (vec_id,
    m), means are DECIMAL partial sums per (m, code, dim) — the same
    order-independent, engine-exact arithmetic as `kmeans_refine` — and
    codewords that attract no vectors keep their seed (the standard
    empty-cluster fallback). Memoized + materialized AND persisted to
    the trained-artifact disk store: trained once per corpus, broadcast
    to every encode/serve consumer — later sessions read the {PQ_M}x
    {PQ_KS}-row codebook straight from parquet instead of re-running
    the per-subspace Lloyd pass."""
    from .dedup import _memo, _materialize

    key = _corpus_key(embeddings)
    path = _ANN_STORE / f"pq_codebook_{PQ_M}x{PQ_KS}_{key}" if key else None

    def build() -> DataFrame:
        if path is not None and (path / "_SUCCESS").exists():
            return _materialize(
                embeddings.sparkSession.read.parquet(str(path)))
        seed = _pq_codebook(embeddings)
        assign = (_pq_subvectors(embeddings).alias("s")
                  .join(F.broadcast(seed).alias("c"),
                        F.col("s.m") == F.col("c.m"))
                  .withColumn("d", F.expr(_sq_dist_fixed("s.sub", "c.cw", PQ_SUB)))
                  .groupBy("s.vec_id", "s.m")
                  .agg(F.expr("min_by(j, struct(d, j))").alias("code"),
                       F.any_value("sub").alias("sub")))
        dims = (assign.select("m", "code", F.posexplode("sub").alias("dim", "x"))
                .groupBy("m", "code", "dim")
                .agg(F.sum(F.col("x").cast(KM_DEC)).alias("sx"),
                     F.count(F.lit(1)).alias("n")))
        means = (dims.withColumn("v", F.col("sx").cast("double") / F.col("n"))
                 .groupBy("m", "code")
                 .agg(F.expr("transform(array_sort(collect_list(struct(dim, v))),"
                             " p -> p.v)").alias("cw"))
                 .select("m", F.col("code").alias("j"), "cw"))
        untouched = seed.join(means.select("m", "j"), ["m", "j"], "left_anti")
        out = _materialize(
            means.unionByName(untouched.select("m", "j", "cw")))
        if path is not None:
            tmp = _artifact_tmp(path)
            out.write.parquet(str(tmp))
            _publish_artifact(tmp, path)
        return out

    return _memo(embeddings, "pq_codebook_trained", build)


def _pq_subvectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, m, sub): every vector split into its {PQ_M} sub-vectors —
    scan-shaped (one stack projection, no shuffle)."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("e"))
    subs = ", ".join(
        f"{m}, slice(e, {m * PQ_SUB + 1}, {PQ_SUB})" for m in range(PQ_M))
    return emb.selectExpr("vec_id", f"stack({PQ_M}, {subs}) as (m, sub)")


def pq_encode(embeddings: DataFrame) -> DataFrame:
    """Product-quantization encode (Jégou et al., TPAMI 2011 shape): each
    vector compresses to {PQ_M} 6-bit codes — argmin squared-distance
    codeword per subspace, ties by code id. 64 floats become 12 bytes
    of codes: the ~20x compression that makes billion-vector ANN fit in
    executor memory, at a measured recall@10 near 3x the 8x16
    seed-codebook configuration this replaced (the speed/recall pair
    rides in every BENCH artifact).

    Scale shape: the codebook ({PQ_M}x{PQ_KS} rows) broadcasts; encode is
    one keyed agg over n*{PQ_M} (vec_id, m) groups with counter-sized
    state — no corpus shuffle. Output digest: the code string plus exact
    integer stats (the full code list, engine-checkable as a canonical
    comma string) and the reconstruction MSE at 6 dp."""
    coded = (_pq_subvectors(embeddings).alias("s")
             .join(F.broadcast(_pq_trained_codebook(embeddings)).alias("c"),
                   F.col("s.m") == F.col("c.m"))
             .withColumn("d", F.expr(_sq_dist_fixed("s.sub", "c.cw", PQ_SUB)))
             .groupBy("s.vec_id", "s.m")
             .agg(F.expr("min_by(j, struct(d, j))").alias("code"),
                  F.min(F.round(F.col("d"), 6).cast(KM_DEC)).alias("_dmin")))
    return (coded.groupBy("vec_id")
            .agg(F.expr("concat_ws(',', transform(array_sort("
                 "collect_list(struct(m, code))), p -> cast(p.code as string)))")
                 .alias("codes"),
                 F.sum("code").alias("code_sum"),
                 F.round(F.sum("_dmin").cast("double"), 6).alias("recon_mse6")))


def pq_encode_oracle_sql() -> str:
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cb0 AS (SELECT CAST(vec_id AS INT) AS j, m.i - 1 AS m,
              e[(m.i - 1) * {PQ_SUB} + 1 : (m.i - 1) * {PQ_SUB} + {PQ_SUB}] AS cw
       FROM emb, LATERAL (SELECT unnest(generate_series(1, {PQ_M})) AS i) m
       WHERE vec_id < {PQ_KS}),
subs AS (SELECT vec_id, m.i - 1 AS m,
                e[(m.i - 1) * {PQ_SUB} + 1 : (m.i - 1) * {PQ_SUB} + {PQ_SUB}] AS sub
         FROM emb, LATERAL (SELECT unnest(generate_series(1, {PQ_M})) AS i) m),
pasg AS (SELECT s.vec_id, s.m, s.sub, c.j AS code
         FROM subs s JOIN cb0 c ON s.m = c.m
         QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY list_sum(list_transform(range(1, 1 + {PQ_SUB}),
                  i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i]))), c.j) = 1),
pdims AS (SELECT m, code, d.i AS dim,
                 SUM(CAST(sub[d.i] AS DECIMAL(18,6))) AS sx, COUNT(*) AS n
          FROM pasg, LATERAL (SELECT unnest(generate_series(1, {PQ_SUB})) AS i) d
          GROUP BY m, code, d.i),
pmeans AS (SELECT m, code AS j, list(CAST(sx AS DOUBLE) / n ORDER BY dim) AS cw
           FROM pdims GROUP BY m, code),
cb AS (SELECT m, j, cw FROM pmeans
       UNION ALL
       SELECT s0.m, s0.j, s0.cw FROM cb0 s0
       WHERE NOT EXISTS (SELECT 1 FROM pmeans p
                         WHERE p.m = s0.m AND p.j = s0.j)),
dists AS (SELECT s.vec_id, s.m, c.j,
                 list_sum(list_transform(range(1, 1 + {PQ_SUB}),
                   i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i]))) AS d
          FROM subs s JOIN cb c ON s.m = c.m),
coded AS (SELECT vec_id, m, j AS code,
                 CAST(round(d, 6) AS DECIMAL(18,6)) AS dmin
          FROM dists
          QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                     ORDER BY d, j) = 1)
SELECT vec_id,
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes,
       SUM(code) AS code_sum,
       round(CAST(SUM(dmin) AS DOUBLE), 6) AS recon_mse6
FROM coded GROUP BY vec_id
"""


def _pq_adc_dists(embeddings: DataFrame, query_vec_id: int,
                  corpus: DataFrame | None = None) -> DataFrame:
    """(vec_id, adc_dist) for every non-query corpus vector: the ADC scan
    shared by the direct top-k server and the rerank shortlist. Per-subspace
    distances are 6-dp-quantized and summed as DECIMAL so the total is
    order-independent and engine-exact. `corpus` optionally restricts the
    scanned rows (IVF-probed candidates) while the codebook and the query
    vector still come from the full `embeddings`."""
    codes = (_pq_subvectors(corpus if corpus is not None
                            else embeddings).alias("s")
             .join(F.broadcast(_pq_trained_codebook(embeddings)).alias("c"),
                   F.col("s.m") == F.col("c.m"))
             .withColumn("d", F.expr(_sq_dist_fixed("s.sub", "c.cw", PQ_SUB)))
             .groupBy("s.vec_id", "s.m")
             .agg(F.expr("min_by(j, struct(d, j))").alias("code")))
    qsubs = (_pq_subvectors(embeddings)
             .filter(F.col("vec_id") == query_vec_id)
             .select("m", F.col("sub").alias("qsub")))
    dtab = (qsubs.join(F.broadcast(_pq_trained_codebook(embeddings)), "m")
            .select("m", "j",
                    F.round(F.expr(_sq_dist_fixed("qsub", "cw", PQ_SUB)), 6)
                    .cast(KM_DEC).alias("dq")))
    return (codes.alias("k")
            .join(F.broadcast(dtab).alias("t"),
                  (F.col("k.m") == F.col("t.m"))
                  & (F.col("k.code") == F.col("t.j")))
            .groupBy("vec_id")
            .agg(F.round(F.sum("dq").cast("double"), 6).alias("adc_dist"))
            .filter(F.col("vec_id") != query_vec_id))


def pq_adc_topk(embeddings: DataFrame, query_vec_id: int = 0,
                k: int = TOP_K) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — the serving half of PQ:
    the query precomputes its distance table ({PQ_M}x{PQ_KS} entries, one
    tiny broadcast), and each corpus vector's approximate distance is a
    TABLE LOOKUP sum over its {PQ_M} codes — no float vector is touched
    at scan time, which is why PQ scans beat raw-vector scans ~10x at
    memory-bound scale. Output ranks by (adc ASC, vec_id) for a
    deterministic k-set."""
    return (_pq_adc_dists(embeddings, query_vec_id)
            .join(embeddings.select("vec_id", "label"), "vec_id")
            .select("vec_id", "label", "adc_dist")
            .orderBy("adc_dist", "vec_id")
            .limit(k))


RERANK_N = 50  # ADC shortlist size: 5x k; at 100 TB this is the knob
               # trading one extra broadcast probe for near-exact recall


def pq_rerank_topk(embeddings: DataFrame, query_vec_id: int = 0,
                   k: int = TOP_K, shortlist: int = RERANK_N) -> DataFrame:
    """ADC-shortlist + exact-rerank top-k — the production PQ serving
    pattern (IVFADC+R): the compressed-domain ADC scan prunes the corpus
    to `shortlist` candidates (here {RERANK_N} = 5x k), then ONLY those
    candidates' raw vectors are fetched and ranked by exact squared-L2.
    Recall jumps from the quantizer's ceiling toward exact while the
    full-precision math touches 50 rows instead of the corpus; at 100 TB
    the candidate fetch is a 50-key broadcast-hash probe into the
    vector store, not a scan. Deterministic: ADC dist is decimal-exact
    with (dist, vec_id) tie-break, exact dist rounded to 6 dp."""
    short = (_pq_adc_dists(embeddings, query_vec_id)
             .orderBy("adc_dist", "vec_id").limit(shortlist)
             .select("vec_id"))
    emb = embeddings.select("vec_id", "label",
                            _as_double("embedding").alias("e"))
    qv = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (emb.join(F.broadcast(short), "vec_id")
            .join(F.broadcast(qv))
            .select("vec_id", "label",
                    F.round(F.expr(_sq_dist_fixed("e", "q", SRP_DIM)), 6).alias("l2_dist"))
            .orderBy("l2_dist", "vec_id")
            .limit(k))


_PQ_EMB_CTE = ("emb AS (SELECT vec_id, label, "
               "CAST(embedding AS DOUBLE[]) AS e FROM embeddings)")


def _pq_adc_ctes(query_vec_id: int) -> str:
    """Shared DuckDB CTE chain ending in adc(vec_id, adc_dist)."""
    return f"\nWITH {_PQ_EMB_CTE},\n" + _pq_adc_cte_body(query_vec_id)


def _pq_adc_cte_body(query_vec_id: int) -> str:
    """The PQ CTE chain AFTER emb — composable with other WITH chains
    (the IVF oracle prepends the Lloyd CTEs, which define the same emb)."""
    return f"""cb0 AS (SELECT CAST(vec_id AS INT) AS j, m.i - 1 AS m,
              e[(m.i - 1) * {PQ_SUB} + 1 : (m.i - 1) * {PQ_SUB} + {PQ_SUB}] AS cw
       FROM emb, LATERAL (SELECT unnest(generate_series(1, {PQ_M})) AS i) m
       WHERE vec_id < {PQ_KS}),
subs AS (SELECT vec_id, m.i - 1 AS m,
                e[(m.i - 1) * {PQ_SUB} + 1 : (m.i - 1) * {PQ_SUB} + {PQ_SUB}] AS sub
         FROM emb, LATERAL (SELECT unnest(generate_series(1, {PQ_M})) AS i) m),
pasg AS (SELECT s.vec_id, s.m, s.sub, c.j AS code
         FROM subs s JOIN cb0 c ON s.m = c.m
         QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
                ORDER BY list_sum(list_transform(range(1, 1 + {PQ_SUB}),
                  i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i]))), c.j) = 1),
pdims AS (SELECT m, code, d.i AS dim,
                 SUM(CAST(sub[d.i] AS DECIMAL(18,6))) AS sx, COUNT(*) AS n
          FROM pasg, LATERAL (SELECT unnest(generate_series(1, {PQ_SUB})) AS i) d
          GROUP BY m, code, d.i),
pmeans AS (SELECT m, code AS j, list(CAST(sx AS DOUBLE) / n ORDER BY dim) AS cw
           FROM pdims GROUP BY m, code),
cb AS (SELECT m, j, cw FROM pmeans
       UNION ALL
       SELECT s0.m, s0.j, s0.cw FROM cb0 s0
       WHERE NOT EXISTS (SELECT 1 FROM pmeans p
                         WHERE p.m = s0.m AND p.j = s0.j)),
codes AS (SELECT s.vec_id, s.m, c.j AS code
          FROM subs s JOIN cb c ON s.m = c.m
          QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.m
                 ORDER BY list_sum(list_transform(range(1, 1 + {PQ_SUB}),
                   i -> (s.sub[i] - c.cw[i]) * (s.sub[i] - c.cw[i]))), c.j) = 1),
dtab AS (SELECT c.m, c.j,
                CAST(round(list_sum(list_transform(range(1, 1 + {PQ_SUB}),
                  i -> (q.sub[i] - c.cw[i]) * (q.sub[i] - c.cw[i]))), 6)
                AS DECIMAL(18,6)) AS dq
         FROM cb c JOIN subs q ON q.m = c.m AND q.vec_id = {query_vec_id}),
adc AS (SELECT codes.vec_id,
               round(CAST(SUM(dq) AS DOUBLE), 6) AS adc_dist
        FROM codes JOIN dtab ON codes.m = dtab.m AND codes.code = dtab.j
        GROUP BY codes.vec_id
        HAVING codes.vec_id != {query_vec_id})"""


def pq_adc_topk_oracle_sql(query_vec_id: int = 0, k: int = TOP_K) -> str:
    return _pq_adc_ctes(query_vec_id) + f"""
SELECT a.vec_id, e.label, a.adc_dist
FROM adc a JOIN emb e ON a.vec_id = e.vec_id
ORDER BY a.adc_dist, a.vec_id LIMIT {k}
"""


def pq_rerank_oracle_sql(query_vec_id: int = 0, k: int = TOP_K,
                         shortlist: int = RERANK_N) -> str:
    return _pq_adc_ctes(query_vec_id) + f""",
short AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT {shortlist}),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id})
SELECT e.vec_id, e.label,
       round(list_sum(list_transform(range(1, 1 + len(e.e)),
             i -> (e.e[i] - q.q[i]) * (e.e[i] - q.q[i]))), 6) AS l2_dist
FROM emb e JOIN short s ON e.vec_id = s.vec_id, q
ORDER BY l2_dist, e.vec_id LIMIT {k}
"""


def ivf_adc_rerank_topk(embeddings: DataFrame, query_vec_id: int = 0,
                        k: int = TOP_K, shortlist: int = SERVE_SHORTLIST,
                        probes: int = SERVE_PROBES) -> DataFrame:
    """The full production ANN stack in one plan — IVFADC+R: (1) the
    query probes its {N_PROBES} nearest TRAINED coarse cells (Lloyd-
    refined centroids, broadcast k-row table), (2) the compressed-domain
    ADC scan runs ONLY over the probed cells' members (probes/n_cells of
    the corpus — and on the partitioned layout of ivf_partitioned_probe,
    only those partitions' bytes), (3) the top-{RERANK_N} ADC candidates
    are fetched full-precision and reranked by exact squared-L2. Each
    stage cuts the next stage's input ~10-100x; that composition — cell
    prune x code scan x exact rerank — is why billion-vector serving
    costs milliseconds. All three stages keep the engine's determinism
    contract (decimal-exact dists, (dist, id) tie-breaks).

    ``probes`` is the recall/IO dial: the DEFAULT is the calibrated
    serving config (`SERVE_PROBES`/`SERVE_SHORTLIST`, picked by
    `probes_for_recall` against a 0.9 recall floor — a recall TARGET,
    not a magic constant); scanned IO grows ~linearly with probes while
    recall climbs toward the shortlist ceiling. The bench reports the
    served config's recall and, as telemetry, the legacy cheap 2-probe
    config side by side."""
    emb = embeddings.select("vec_id", "label",
                            _as_double("embedding").alias("e"))
    cents = _trained_centroids(embeddings)
    qe = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    probe = (cents.join(F.broadcast(qe))
             .select("cell", F.expr(_sq_dist_fixed("c", "q", SRP_DIM)).alias("dist"))
             .orderBy("dist", "cell").limit(probes)
             .select("cell"))
    cand = (_km_assign(emb, cents)
            .join(F.broadcast(probe), "cell", "left_semi")
            .filter(F.col("vec_id") != query_vec_id)
            .select("vec_id"))
    cand_emb = embeddings.join(cand, "vec_id", "left_semi")
    short = (_pq_adc_dists(embeddings, query_vec_id, corpus=cand_emb)
             .orderBy("adc_dist", "vec_id").limit(shortlist)
             .select("vec_id"))
    return (emb.join(F.broadcast(short), "vec_id")
            .join(F.broadcast(qe))
            .select("vec_id", "label",
                    F.round(F.expr(_sq_dist_fixed("e", "q", SRP_DIM)), 6).alias("l2_dist"))
            .orderBy("l2_dist", "vec_id")
            .limit(k))


def ivf_adc_rerank_oracle_sql(query_vec_id: int = 0, k: int = TOP_K,
                              shortlist: int = SERVE_SHORTLIST,
                              probes: int = SERVE_PROBES,
                              iters: int = KM_ITERS) -> str:
    last = iters - 1
    qsq = ("list_sum(list_transform(range(1, 1 + len(c.c)), "
           "i -> (c.c[i] - q.q[i]) * (c.c[i] - q.q[i])))")
    return f"""
WITH {','.join(_km_ctes(iters))},
{_pq_adc_cte_body(query_vec_id)},
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id}),
assigned AS (SELECT a.vec_id, c.cell
             FROM emb a, cents{last} c
             QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                        ORDER BY {_KM_SQ}, c.cell) = 1),
probe AS (SELECT c.cell FROM cents{last} c, q
          ORDER BY {qsq}, c.cell LIMIT {probes}),
cand AS (SELECT a.vec_id FROM assigned a JOIN probe USING (cell)
         WHERE a.vec_id != {query_vec_id}),
short AS (SELECT adc.vec_id FROM adc JOIN cand USING (vec_id)
          ORDER BY adc.adc_dist, adc.vec_id LIMIT {shortlist})
SELECT e.vec_id, e.label,
       round(list_sum(list_transform(range(1, 1 + len(e.e)),
             i -> (e.e[i] - q.q[i]) * (e.e[i] - q.q[i]))), 6) AS l2_dist
FROM emb e JOIN short s ON e.vec_id = s.vec_id, q
ORDER BY l2_dist, e.vec_id LIMIT {k}
"""


def probes_for_recall(embeddings: DataFrame, target: float = 0.9,
                      qids: tuple = (0, 3, 7, 11, 40),
                      candidates: tuple = (1, 2, 4, 8, 16),
                      k: int = TOP_K) -> tuple[int, int, float]:
    """Serving-config calibration: the SMALLEST probe count whose
    measured mean recall@{k} (full IVFADC+R funnel vs exact-L2 truth,
    its native metric) on the sample queries meets ``target``. The ADC
    shortlist scales with the probe count (25·probes, = the default 50
    at the default 2 probes): widening the cells scanned without
    widening the rerank shortlist just moves the ceiling from the probe
    stage to the shortlist stage (full-scan ADC @50 ceilings ~0.84).
    Returns (probes, shortlist, measured_recall); falls back to the
    largest candidate if none reach the target.

    This is how the funnel should be configured in production — pick a
    recall floor, let calibration find the cheapest config that clears
    it, re-run when the corpus drifts. Cost is calibration-time only
    (|qids| x |candidates| funnel runs over the trained artifacts, each
    a k-row driver fetch) and the chosen config is two plain ints the
    serving path inlines."""
    emb = embeddings.select("vec_id", _as_double("embedding").alias("e"))
    d = ("aggregate(zip_with(e, q, (x, y) -> (x - y) * (x - y)), "
         "cast(0.0 as double), (a, v) -> a + v)")
    truths = {}
    for qid in qids:
        q = emb.filter(F.col("vec_id") == qid).select(F.col("e").alias("q"))
        truths[qid] = {r.vec_id for r in
                       emb.filter(F.col("vec_id") != qid)
                       .join(F.broadcast(q))
                       .select("vec_id", F.expr(d).alias("d"))
                       .orderBy("d", "vec_id").limit(k).collect()}
    best = (candidates[-1], 25 * candidates[-1], 0.0)
    for probes in candidates:
        shortlist = 25 * probes
        rs = []
        for qid in qids:
            got = {r.vec_id for r in
                   ivf_adc_rerank_topk(embeddings, qid, probes=probes,
                                       shortlist=shortlist).collect()}
            rs.append(len(truths[qid] & got) / k)
        mean = round(sum(rs) / len(rs), 3)
        best = (probes, shortlist, mean)
        if mean >= target:
            return best
    return best


# -------------------------------------------------- int8 scalar quantization

Q_LEVELS = 255


def embedding_quantize(embeddings: DataFrame) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    4x storage/bandwidth reduction for ANN indexes: per-DIMENSION min/max
    over the corpus (a dims-row aggregate, broadcast back), then
    code = clamp(floor((x - min) * {Q_LEVELS} / (max - min))). Output is a
    per-vector digest — integer code sum/min/max (bit-exact on any engine)
    plus the round-trip reconstruction MSE at 6 dp — so the checkable
    surface is O(corpus), not O(values).

    floor (not round) quantization: no tie-at-.5 semantics to align
    across engines; both sides run the identical double expression.
    Scale: the range table is dims rows (broadcast); the encode is one
    scan-shaped pass, keyed agg per vector only."""
    dims = embeddings.select(
        "vec_id", F.posexplode(_as_double("embedding")).alias("dim", "x"))
    ranges = (dims.groupBy("dim")
              .agg(F.min("x").alias("mn"), F.max("x").alias("mx")))
    code = F.expr(
        f"CASE WHEN mx > mn THEN least(cast(floor((x - mn) * {Q_LEVELS}.0 "
        f"/ (mx - mn)) as int), {Q_LEVELS}) ELSE 0 END")
    deq = F.expr(
        f"mn + (code + 0.5) * (mx - mn) / {Q_LEVELS}.0")
    return (dims.join(F.broadcast(ranges), "dim")
            .withColumn("code", code)
            .withColumn("err2", F.pow(F.col("x") - deq, 2))
            .groupBy("vec_id")
            .agg(F.sum("code").alias("code_sum"),
                 F.min("code").alias("code_min"),
                 F.max("code").alias("code_max"),
                 F.round(F.sum("err2"), 6).alias("mse6")))


def embedding_quantize_oracle_sql() -> str:
    q = Q_LEVELS
    return f"""
WITH dims AS (SELECT vec_id, d.i - 1 AS dim, CAST(embedding[d.i] AS DOUBLE) AS x
              FROM embeddings,
                   LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) d),
ranges AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM dims GROUP BY dim),
coded AS (SELECT vec_id,
                 CASE WHEN mx > mn THEN least(CAST(floor((x - mn) * {q}.0
                   / (mx - mn)) AS INT), {q}) ELSE 0 END AS code,
                 x, mn, mx
          FROM dims JOIN ranges USING (dim))
SELECT vec_id, SUM(code) AS code_sum, MIN(code) AS code_min,
       MAX(code) AS code_max,
       round(SUM(pow(x - (mn + (code + 0.5) * (mx - mn) / {q}.0), 2)), 6) AS mse6
FROM coded GROUP BY vec_id
"""


MRL_DIM = 32


def matryoshka_topk(embeddings: DataFrame, query_vec_id: int = 0,
                    k: int = TOP_K) -> DataFrame:
    """Matryoshka-style truncated ANN: rank by cosine over the FIRST
    {MRL_DIM} dimensions only — the modern serving trick (MRL-trained
    embeddings keep most signal in the prefix) that cuts scan FLOPs and
    bandwidth 2x without an index. The fixture embeddings are synthetic
    random (no trained prefix concentration), so recall tracks the dim
    fraction — the honest reading the recall telemetry makes visible. Same contract as cosine_topk; the
    prefix slice happens at projection time so the scan never carries
    the tail dims (column pruning can't split an array, but the slice
    runs scan-side before any shuffle). Recall vs full-dim is pinned in
    tests — the number that justifies the truncation."""
    emb = embeddings.withColumn(
        "e", F.expr(f"transform(slice(embedding, 1, {MRL_DIM}), "
                    "x -> cast(x as double))"))
    qv = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (emb.filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qv))
            .select("vec_id", "label", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


def matryoshka_oracle_sql(query_vec_id: int = 0, k: int = TOP_K) -> str:
    cos = _cosine_duck("e", "q")
    return f"""
WITH emb AS (SELECT vec_id, label,
                    CAST(embedding[1:{MRL_DIM}] AS DOUBLE[]) AS e
             FROM embeddings),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id})
SELECT vec_id, label, {cos} AS sim
FROM emb, q WHERE vec_id != {query_vec_id}
ORDER BY sim DESC, vec_id LIMIT {k}
"""


MRL_RERANK_N = 100  # prefix shortlist: untrained prefixes rank weakly, so
                    # the funnel is wider than PQ's (10x k vs 5x k)


def matryoshka_rerank_topk(embeddings: DataFrame, query_vec_id: int = 0,
                           k: int = TOP_K,
                           shortlist: int = MRL_RERANK_N) -> DataFrame:
    """Matryoshka funnel retrieval — the two-stage MRL serving pattern:
    a cheap prefix-cosine scan over the first {MRL_DIM} dims shortlists
    {MRL_RERANK_N} candidates, then ONLY those rows' full vectors are
    reranked by exact full-dim cosine. The scan half reads half the
    vector bytes; the exact half touches {MRL_RERANK_N} rows, not the
    corpus — at 100 TB the rerank is a broadcast-hash probe, the funnel
    width the recall/IO knob. Deterministic at both stages: 6-dp sims,
    (sim DESC, vec_id) tie-break."""
    emb32 = embeddings.withColumn(
        "e", F.expr(f"transform(slice(embedding, 1, {MRL_DIM}), "
                    "x -> cast(x as double))"))
    q32 = (emb32.filter(F.col("vec_id") == query_vec_id)
           .select(F.col("e").alias("q")))
    short = (emb32.filter(F.col("vec_id") != query_vec_id)
             .join(F.broadcast(q32))
             .select("vec_id", _cosine("e", "q").alias("psim"))
             .orderBy(F.desc("psim"), "vec_id").limit(shortlist)
             .select("vec_id"))
    emb = embeddings.select("vec_id", "label",
                            _as_double("embedding").alias("e"))
    qv = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (emb.join(F.broadcast(short), "vec_id")
            .join(F.broadcast(qv))
            .select("vec_id", "label", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


MRL_TRAINED_DIM = 48
# ^ the TRAINED prefix dimension, calibrated like SERVE_PROBES: the
# smallest ladder step (32/40/48/56) whose measured recall@10 clears a
# 0.5 pre-rerank floor on the reference corpus (PCA-32 measures ~0.36,
# PCA-48 0.54 at sf0.1, 0.70 at sf0.01 — the fixture embeddings are
# near-isotropic, so a linear projection to half the dims cannot hit
# the floor; real MRL-trained embeddings would). Bench telemetry
# re-measures trained AND untrained recall every round.


def _mrl_fingerprint(paths) -> str:
    """Spark-free corpus fingerprint for the PCA artifact: (normalized
    path, size, mtime_ns) of the input parquet files — computable by
    the Spark builder (from inputFiles) AND by the DuckDB-oracle
    generator, so both resolve the SAME artifact without a plan hash."""
    import hashlib

    sig = hashlib.md5()
    for p in sorted(os.path.normpath(str(p).removeprefix("file:"))
                    for p in paths):
        st = os.stat(p)
        sig.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return f"v{_ANN_STORE_V}_{sig.hexdigest()[:16]}"


def _mrl_eigh(n: int, s_i, s_ij, m: int = MRL_TRAINED_DIM):
    """Shared trainer tail: EXACT integer moment sums (Σ x6, Σ x6·x6ᵀ
    over 6-dp-widened coordinates — order-independent, so the Spark
    partial-sum path and the numpy oracle twin produce bit-identical
    covariance) → float64 covariance → eigh → top-``m`` components,
    sign-normalized (largest-|entry| positive) for a stable artifact.
    Returns (mean list[d], components [d][m] list-of-lists)."""
    import numpy as np

    s_i = np.asarray(s_i, dtype=np.float64)
    s_ij = np.asarray(s_ij, dtype=np.float64)
    mu6 = s_i / n
    cov = (s_ij / n - np.outer(mu6, mu6)) / 1e12
    _w, v = np.linalg.eigh(cov)
    p = v[:, ::-1][:, :m].copy()
    for j in range(p.shape[1]):
        i = int(np.argmax(np.abs(p[:, j])))
        if p[i, j] < 0:
            p[:, j] = -p[:, j]
    return (mu6 / 1e6).tolist(), p.tolist()


def _mrl_write_artifact(path: Path, mu: list, comps: list) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = _artifact_tmp(path)
    tmp.mkdir(parents=True)
    d, m = len(comps), len(comps[0])
    pq.write_table(pa.table({
        "k": pa.array([k for k in range(d) for _ in range(m)],
                      pa.int32()),
        "j": pa.array([j for _ in range(d) for j in range(m)],
                      pa.int32()),
        "p": pa.array([comps[k][j] for k in range(d)
                       for j in range(m)], pa.float64()),
    }), tmp / "components.parquet")
    pq.write_table(pa.table({
        "k": pa.array(list(range(d)), pa.int32()),
        "mu": pa.array(mu, pa.float64()),
    }), tmp / "mean.parquet")
    (tmp / "_DONE").touch()
    _publish_artifact(tmp, path)


def mrl_train_numpy(embeddings_parquet: str,
                    m: int = MRL_TRAINED_DIM) -> Path:
    """Train (or reuse) the PCA-prefix artifact from a LOCAL embeddings
    parquet — the oracle generator's twin of the distributed trainer:
    identical integer moments ⇒ identical artifact, so whichever side
    trains first, both serve the same projection."""
    import numpy as np
    import pyarrow.parquet as pq

    path = _ANN_STORE / f"mrl{m}_{_mrl_fingerprint([embeddings_parquet])}"
    if (path / "_DONE").exists():
        return path
    x = np.array(pq.read_table(
        embeddings_parquet, columns=["embedding"])
        .column("embedding").to_pylist(), dtype=np.float64)
    x6 = np.rint(x * 1_000_000).astype(np.int64)
    mu, comps = _mrl_eigh(len(x6), x6.sum(0), x6.T @ x6, m)
    _mrl_write_artifact(path, mu, comps)
    return path


def _mrl_artifact(embeddings: DataFrame,
                  m: int = MRL_TRAINED_DIM) -> Path:
    """The trained-prefix artifact for a corpus DataFrame — served from
    the store when present, else trained DISTRIBUTED: one mapInPandas
    pass emits per-partition exact integer moment partials (d ints +
    d² ints, a few KB — never rows), the driver combines with Python
    ints (no overflow at any n) and eigendecomposes the d×d covariance
    (d=64: trivial). Training cost is ONE corpus scan at any scale."""
    import numpy as np

    key = _mrl_fingerprint(embeddings.inputFiles())
    path = _ANN_STORE / f"mrl{m}_{key}"
    if (path / "_DONE").exists():
        return path

    def partials(batches):
        import pandas as pd
        n = 0
        s = None
        ss = None
        for pdf in batches:
            x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if not len(x):
                continue
            x6 = np.rint(x * 1_000_000).astype(np.int64)
            n += len(x6)
            s = x6.sum(0) if s is None else s + x6.sum(0)
            g = x6.T @ x6
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame({
                "n": [n],
                "s": [s.tolist()],
                "ss": [ss.reshape(-1).tolist()]})

    parts = (embeddings.select("embedding")
             .mapInPandas(partials,
                          schema="n long, s array<long>, "
                                 "ss array<long>")
             .collect())
    d = len(parts[0].s)
    n_total = sum(r.n for r in parts)
    s_i = [sum(int(r.s[i]) for r in parts) for i in range(d)]
    ss_flat = [sum(int(r.ss[i]) for r in parts) for i in range(d * d)]
    s_ij = np.array(ss_flat, dtype=np.float64).reshape(d, d)
    mu, comps = _mrl_eigh(n_total, s_i, s_ij, m)
    _mrl_write_artifact(path, mu, comps)
    return path


def matryoshka_trained_topk(embeddings: DataFrame,
                            query_vec_id: int = 0,
                            k: int = TOP_K,
                            m: int = MRL_TRAINED_DIM) -> DataFrame:
    """Matryoshka ANN over a TRAINED prefix: rank by cosine in the
    top-{MRL_TRAINED_DIM} PCA subspace (variance-ordered — what an
    MRL-trained model bakes into its prefix, learned post-hoc here for
    untrained embeddings). The projection artifact is trained once per
    corpus (write-once store, same discipline as the Lloyd centroids)
    and applied scan-side: the component matrix rides ONE broadcast
    row, the per-vector matmul is a codegen'd higher-order expression —
    no shuffle, no UDF, O(corpus·d·m) FLOPs. Recall@10 vs full-dim
    cosine clears the 0.5 pre-rerank floor the untrained 32-prefix
    misses (0.54 vs 0.26 at sf0.1); bench telemetry tracks both."""
    spark = embeddings.sparkSession
    path = _mrl_artifact(embeddings, m)
    comp = spark.read.parquet(str(path / "components.parquet"))
    mu = spark.read.parquet(str(path / "mean.parquet"))
    d = mu.count()
    # one broadcast row: P[k][j] (k-major) + mu[k]
    pm = (comp.groupBy("k")
          .agg(F.expr("transform(array_sort(collect_list("
                      "struct(j, p))), s -> s.p)").alias("row"))
          .join(mu, "k")
          .groupBy()
          .agg(F.expr("transform(array_sort(collect_list("
                      "struct(k, row))), s -> s.row)").alias("P"),
               F.expr("transform(array_sort(collect_list("
                      "struct(k, mu))), s -> s.mu)").alias("m0")))
    emb = embeddings.withColumn(
        "x", F.expr("transform(embedding, v -> cast(v as double))"))
    proj = (emb.join(F.broadcast(pm))
            .withColumn("e", F.expr(
                f"transform(sequence(0, {m - 1}), j -> round("
                f"aggregate(sequence(0, {d - 1}), cast(0.0 as double), "
                f"(acc, kk) -> acc + (x[kk] - m0[kk]) * P[kk][j]), 6))"))
            .select("vec_id", "label", "e"))
    qv = (proj.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    return (proj.filter(F.col("vec_id") != query_vec_id)
            .join(F.broadcast(qv))
            .select("vec_id", "label", _cosine("e", "q").alias("sim"))
            .orderBy(F.desc("sim"), "vec_id")
            .limit(k))


def matryoshka_trained_oracle_sql(query_vec_id: int = 0,
                                  k: int = TOP_K,
                                  m: int = MRL_TRAINED_DIM) -> str:
    """LAZY oracle (evaluated at oracle_sql() call time): ensures the
    PCA artifact exists for the correctness corpus (training the numpy
    twin if the Spark side hasn't yet — identical by the exact-integer
    moment contract) and replays projection + cosine + top-k in DuckDB
    from the PERSISTED components, so the oracle checks the full
    serving math end-to-end."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF",
                            "/root/testdata/sf0.01")
    path = mrl_train_numpy(f"{sf_dir}/embeddings.parquet", m)
    cos = _cosine_duck("e", "q")
    return f"""
WITH comp AS (SELECT k, j, p
              FROM read_parquet('{path}/components.parquet')),
mu AS (SELECT k, mu FROM read_parquet('{path}/mean.parquet')),
dims AS (SELECT vec_id, d.i - 1 AS k,
                CAST(embedding[d.i] AS DOUBLE) AS x
         FROM embeddings,
              LATERAL (SELECT unnest(generate_series(1,
                       len(embedding))) AS i) d),
pj AS (SELECT vec_id, j, round(SUM((x - mu) * p), 6) AS ej
       FROM dims JOIN mu USING (k) JOIN comp USING (k)
       GROUP BY vec_id, j),
pe AS (SELECT vec_id, list(ej ORDER BY j) AS e
       FROM pj GROUP BY vec_id),
q AS (SELECT e AS q FROM pe WHERE vec_id = {query_vec_id})
SELECT pe.vec_id, emb.label, {cos} AS sim
FROM pe JOIN embeddings emb USING (vec_id), q
WHERE pe.vec_id != {query_vec_id}
ORDER BY sim DESC, pe.vec_id LIMIT {k}
"""


def matryoshka_rerank_oracle_sql(query_vec_id: int = 0, k: int = TOP_K,
                                 shortlist: int = MRL_RERANK_N) -> str:
    pcos = _cosine_duck("p", "qp")
    cos = _cosine_duck("e", "q")
    return f"""
WITH emb AS (SELECT vec_id, label,
                    CAST(embedding AS DOUBLE[]) AS e,
                    CAST(embedding[1:{MRL_DIM}] AS DOUBLE[]) AS p
             FROM embeddings),
qq AS (SELECT e AS q, p AS qp FROM emb WHERE vec_id = {query_vec_id}),
short AS (SELECT vec_id FROM emb, qq
          WHERE vec_id != {query_vec_id}
          ORDER BY {pcos} DESC, vec_id LIMIT {shortlist})
SELECT e.vec_id, e.label, {cos} AS sim
FROM emb e JOIN short s ON e.vec_id = s.vec_id, qq
ORDER BY sim DESC, e.vec_id LIMIT {k}
"""


# ---------------------------------------------- self-maintaining IVF

#: incremental-index corpus split: vec_id % 10 < 8 is the initial
#: corpus the quantizer trains on; % 10 == 8 and == 9 arrive later as
#: two append batches the maintenance stream must absorb; % 10 == 7 is
#: then DELETED from the source (retention DML) and the maintenance
#: stream must retire those index entries — the round-13 gap where
#: delete CDF rows were silently dropped and the index served stale
#: vectors forever.
IVF_INC_TRAIN_PRED = "vec_id % 10 < 8"
IVF_INC_DELETE_PRED = "vec_id % 10 = 7"


def ivf_incremental_index(spark, sf_dir: str, scratch,
                          query_vec_id: int = 0,
                          k: int = TOP_K) -> DataFrame:
    """SELF-MAINTAINING ANN index: `ivf_partitioned_probe` writes a
    one-shot cell-partitioned layout that appends silently stale; here
    the index is an AcidTable fed by the VECTOR TABLE'S OWN CDF STREAM
    — new vectors are assigned to the persisted trained centroids and
    appended to the index per micro-batch (O(batch)), and probes keep
    partition-directory pruning via the manifest. (Reference analog:
    the per-micro-batch Solr index maintenance the worker pipeline
    performs, FileWorkerApp.scala:129-141 — the index follows the
    data, never a rebuild.)

    Flow: train the Lloyd quantizer on the INITIAL corpus only
    (``{IVF_INC_TRAIN_PRED}``, frozen artifact) → seed the `vectors`
    AcidTable (CDF-enabled) and the cell-partitioned `ivf_index`
    AcidTable → start `acidtable-cdf-parallel` maintenance
    (foreachBatch: assign each batch's rows to the frozen centroids,
    ONE fenced ``apply_cdf`` commit per source commit — inserts
    appended, deleted vectors' (cell, vec_id) rows retired with the
    find pass pruned to their cells' partitions) → append the two
    arrival batches, DELETE the ``{IVF_INC_DELETE_PRED}`` slice →
    drain → serve the query by probing only its {N_PROBES} nearest
    cells' PARTITIONS (pruned_files_in opens matching partition files
    only).

    Pins (in-result): `index_fresh_equal` — the maintained index
    hash-equals a from-scratch assignment of the FINAL corpus
    (initial + arrivals − deletes) at the SAME centroids; `recall_ok`
    — recall@10 of the served result vs brute-force cosine over the
    final corpus stays >= 0.5 (re-pinned after maintenance);
    `n_batches` — the changes landed as exactly 3 read-limited
    micro-batches. Result rows are the served top-{TOP_K}, which the
    DuckDB oracle recomputes independently (train-on-subset Lloyd +
    assign-final-corpus + probe)."""
    import shutil as _sh

    from ..acid import AcidTable
    from ..sources.pysource import (AcidCdfParallelStreamDataSource,
                                    _drain_incremental)
    from ..sources.tables import load_table

    emb_raw = load_table(spark, sf_dir, "embeddings")
    emb = emb_raw.select("vec_id", "label",
                         _as_double("embedding").alias("e"))
    cents = _trained_centroids(emb_raw.filter(IVF_INC_TRAIN_PRED))
    initial = emb.filter(IVF_INC_TRAIN_PRED)

    vec_dir = Path(scratch) / f"ivf_inc_vec_{Path(sf_dir).name}"
    idx_dir = Path(scratch) / f"ivf_inc_idx_{Path(sf_dir).name}"
    _sh.rmtree(vec_dir, ignore_errors=True)
    _sh.rmtree(idx_dir, ignore_errors=True)
    src = AcidTable.create(spark, vec_dir, initial, enable_cdf=True)
    # enable_dv: retires land as deletion-vector entries (O(matched
    # rows)) instead of rewriting every touched cell file; the probe
    # path's partition pruning is unchanged (dv-dead rows anti-join
    # away at read)
    idx = AcidTable.create(
        spark, idx_dir,
        _km_assign(initial, cents).select("vec_id", "label", "e", "cell"),
        partition_by=["cell"], enable_dv=True)

    def maintain(batch: DataFrame, batch_id: int) -> None:
        # persist the in-hand micro-batch first: every action below
        # (the emptiness probes, apply_cdf's find/rewrite passes and
        # prune collects) otherwise re-executes the Python-DataSource
        # read of the change files AND the centroid-assignment
        # cross-join — one boundary crossing + one assignment per
        # batch, not one per action (guide §4/§5)
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            _maintain_batch(batch, batch_id)
        finally:
            batch.unpersist()

    def _maintain_batch(batch: DataFrame, batch_id: int) -> None:
        # ONE tiny agg over the persisted batch replaces the two
        # isEmpty probes (the union probe re-ran the centroid-
        # assignment cross-join; the delete probe was a second job) —
        # guide §1.2, r16 verdict item 9. Value-equal: the assignment
        # drops no rows, so the union is empty iff the batch carries
        # neither kind.
        counts = {r["_change_type"]: r["n"] for r in
                  batch.groupBy("_change_type")
                  .agg(F.count(F.lit(1)).alias("n")).collect()}
        if not (counts.get("delete") or counts.get("insert")):
            return
        # assign deletes and inserts SEPARATELY: _km_assign groups by
        # vec_id, so a same-vec_id delete+insert pair (a source UPDATE
        # in one micro-batch) would collapse to one arbitrary row.
        # Assigned apart, the delete keeps the PRE-image embedding's
        # cell (deterministic argmin — the cell it was inserted at)
        # and the insert the post-image's, so apply_cdf nets the pair
        # to the post-image even across a cell move.
        parts = []
        for kind in ("delete", "insert"):
            side = (batch.filter(F.col("_change_type") == kind)
                    .select("vec_id", "label", "e"))
            parts.append(_km_assign(side, cents)
                         .select("vec_id", "label", "e", "cell")
                         .withColumn("_change_type", F.lit(kind)))
        # persist the ASSIGNED rows too: apply_cdf feeds ~4 actions
        # from them (prune collect, find, rewrite, change files) and
        # each re-ran the centroid cross-join over the cached batch
        # otherwise — O(batch) footprint, released below (guide §5)
        rows = (parts[0].unionByName(parts[1])
                .persist(StorageLevel.MEMORY_AND_DISK))
        # one fenced commit per micro-batch (apply_cdf): inserts
        # append; deletes land as deletion-vector entries (the table
        # is enable_dv) — O(matched rows), no cell file rewritten; an
        # at-least-once replay commits NOTHING. Delete-carrying
        # batches record the key's retire_sec split (telemetry.py).
        from contextlib import nullcontext

        from .. import telemetry
        has_del = bool(counts.get("delete"))
        ctx = (telemetry.timed("ivf_incremental_index.retire_sec")
               if has_del else nullcontext())
        try:
            with ctx:
                idx.apply_cdf(rows, key=["cell", "vec_id"],
                              app_id="ivf-maint", batch_id=batch_id)
        finally:
            rows.unpersist()
        # opt-in small-file hygiene (no-op unless the table property
        # is set): per-batch appends otherwise accumulate one file
        # per cell per batch forever
        from ..acid import DV_FOLD_ROWS
        idx.maybe_autocompact(dv_fold_rows=DV_FOLD_ROWS)
        # opt-in retention hygiene: reclaim stranded version history
        # (COW replacements, materialized vectors) on a version
        # cadence — no-op without the table property
        idx.maybe_autovacuum()

    spark.dataSource.register(AcidCdfParallelStreamDataSource)
    stream = (spark.readStream.format("acidtable-cdf-parallel")
              .option("path", str(vec_dir))
              # offsets are exclusive-start: version 0 (the initial
              # snapshot, already in the index) is never delivered
              .option("startingVersion", "0")
              .option("maxVersionsPerTrigger", "1").load()
              .writeStream.outputMode("append").foreachBatch(maintain))
    # two arrival batches + one retention DELETE land as three source
    # commits BEFORE the drain — the maintenance stream must absorb
    # appends AND deletes
    src.append(emb.filter("vec_id % 10 = 8"))                  # v1
    src.append(emb.filter("vec_id % 10 = 9"))                  # v2
    src.delete_where(IVF_INC_DELETE_PRED)                      # v3
    n_batches, _ = _drain_incremental(stream)

    # ---- pins (timed as pin_sec: the from-scratch assignment is the
    # proof obligation, not serving cost — telemetry.py) --------------
    emb_final = emb.filter(f"NOT ({IVF_INC_DELETE_PRED})")
    from .. import telemetry
    with telemetry.timed("ivf_incremental_index.pin_sec"):
        # one signed-groupBy job (multiset_equal): the exceptAll pair
        # ran the from-scratch assignment cross-join twice
        from ..acid import multiset_equal
        fresh = _km_assign(emb_final, cents).select(
            "vec_id", "label", "e", "cell")
        now = idx.read().select("vec_id", "label", "e", "cell")
        index_fresh_equal = multiset_equal(now, fresh)

    # ---- serve: probe cells' PARTITIONS only ------------------------
    qe = (emb.filter(F.col("vec_id") == query_vec_id)
          .select(F.col("e").alias("q")))
    probe_cells = [int(r.cell) for r in
                   (cents.join(F.broadcast(qe))
                    .select("cell", F.expr(_sq_dist_fixed("c", "q", SRP_DIM))
                            .alias("dist"))
                    .orderBy("dist", "cell").limit(N_PROBES)
                    .collect())]
    served = (idx.read_eq_any("cell", probe_cells)
              .filter(F.col("vec_id") != query_vec_id)
              .join(F.broadcast(qe))
              .select("vec_id", "label", "cell",
                      _cosine("e", "q").alias("sim"))
              .orderBy(F.desc("sim"), "vec_id")
              .limit(k))
    got = {r.vec_id for r in served.collect()}
    truth = {r.vec_id for r in
             (emb_final.filter(F.col("vec_id") != query_vec_id)
              .join(F.broadcast(qe))
              .select("vec_id", _cosine("e", "q").alias("sim"))
              .orderBy(F.desc("sim"), "vec_id").limit(k).collect())}
    recall_ok = len(got & truth) / float(k) >= 0.5
    return (served
            .withColumn("index_fresh_equal", F.lit(bool(index_fresh_equal)))
            .withColumn("recall_ok", F.lit(bool(recall_ok)))
            .withColumn("n_batches", F.lit(int(n_batches))))


def ivf_incremental_index_oracle_sql(query_vec_id: int = 0,
                                     k: int = TOP_K,
                                     iters: int = KM_ITERS) -> str:
    last = iters - 1
    qsq = ("list_sum(list_transform(range(1, 1 + len(c.c)), "
           "i -> (c.c[i] - q.q[i]) * (c.c[i] - q.q[i])))")
    cos = _cosine_duck("m.e", "q.q")
    return f"""
WITH {','.join(_km_ctes(iters, train_pred=IVF_INC_TRAIN_PRED))},
assigned AS (SELECT a.vec_id, a.label, a.e, c.cell
             FROM emb a, cents{last} c
             WHERE NOT (a.{IVF_INC_DELETE_PRED})
             QUALIFY row_number() OVER (PARTITION BY a.vec_id
                                        ORDER BY {_KM_SQ}, c.cell) = 1),
q AS (SELECT e AS q FROM emb WHERE vec_id = {query_vec_id}),
probe AS (SELECT c.cell FROM cents{last} c, q
          ORDER BY {qsq}, c.cell LIMIT {N_PROBES})
SELECT m.vec_id, m.label, m.cell, {cos} AS sim,
       TRUE AS index_fresh_equal, TRUE AS recall_ok, 3 AS n_batches
FROM assigned m JOIN probe USING (cell), q
WHERE m.vec_id != {query_vec_id}
ORDER BY sim DESC, m.vec_id LIMIT {k}
"""
