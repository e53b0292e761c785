"""General analytical queries + skew-safe aggregation patterns.

The reference's query surface is narrow (one release query + the status
machine), but a user replacing it with this engine gets a general
DataFrame/SQL analytics engine — demonstrated here with TPC-H-shaped
reporting queries over the same fixtures, and with the two-phase SALTED
aggregation that keeps a skewed key from serializing a 1000-executor job.

Engine parity: every money sum is per-row-rounded to DECIMAL first (both
engines round double→decimal identically), then summed exactly and cast
back to DOUBLE; averages divide two exact aggregates and round to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import portable_hash64

SHIP_CUTOFF = "1998-12-01 00:00:00"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15 00:00:00"
N_SALT = 16


def _dec(col, scale: int = 2):
    return col.cast(f"decimal(18,{scale})")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report — grouped sums/averages over
    filtered lineitem. Scan-level predicate pushdown + map-side partial
    aggregation; the shuffle carries 6 accumulators per (flag, status)."""
    disc_price = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    charge = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * (1 + F.col("l_tax")), 6)
    out = (lineitem
           .filter(F.col("l_shipdate") <= SHIP_CUTOFF)
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.sum(_dec(F.col("l_quantity"))).alias("_sq"),
                F.sum(_dec(F.col("l_extendedprice"))).alias("_sbp"),
                F.sum(disc_price).alias("_sdp"),
                F.sum(charge).alias("_sc"),
                F.count(F.lit(1)).alias("count_order")))
    return out.select(
        "l_returnflag", "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sbp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        # divide as doubles: decimal-division scale rules differ between
        # engines, double division + round(6) does not
        F.round(F.col("_sq").cast("double") / F.col("count_order"), 6)
         .alias("avg_qty"),
        "count_order")


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
         AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by revenue for one market
    segment. The segment filter shrinks customer before the explicit
    broadcast; the top-k is a TakeOrdered, not a global sort."""
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (lineitem
            .filter(F.col("l_shipdate") > Q3_DATE)
            .join(orders.filter(F.col("o_orderdate") < Q3_DATE),
                  orders.o_orderkey == lineitem.l_orderkey)
            .join(F.broadcast(customer.filter(F.col("c_mktsegment") == Q3_SEGMENT)),
                  customer.c_custkey == orders.o_custkey)
            .groupBy("o_orderkey",
                     F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                      .alias("o_orderdate_us"),
                     "o_orderpriority")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderkey")
            .limit(10))


Q3_ORACLE = f"""
SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
WHERE l_shipdate > TIMESTAMP '{Q3_DATE}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND c_mktsegment = '{Q3_SEGMENT}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


#: Zipfian-skew fixture: level k holds ~2^-(k+1) of all rows (level 0 =
#: 50%, a far harsher hot key than the events fixture's 80/20 split over
#: many rows), amplified ZIPF_AMPLIFY x beyond the events row count so the
#: skew is voluminous enough to matter. Generated as pure integer
#: expressions (spark.range / generate_series + an LCG value) so Spark and
#: DuckDB derive bit-identical rows at any sf.
ZIPF_LEVELS = 12
ZIPF_AMPLIFY = 20
ZIPF_TOP_K = 5
_ZIPF_LCG = "(id * 1013904223 + 12345) % 1000003"


def _zipf_level_case(id_col: str = "id") -> str:
    """Trailing-zeros geometric level: odd ids -> 0 (50%), %4==2 -> 1
    (25%), ... identical CASE chain in both engines."""
    whens = " ".join(
        f"WHEN {id_col} % {1 << (k + 1)} = {1 << k} THEN {k}"
        for k in range(ZIPF_LEVELS))
    return f"CASE {whens} ELSE {ZIPF_LEVELS} END"


def zipf_fixture(spark, n_rows: int) -> DataFrame:
    """(id, level, v): the deterministic zipf-skewed relation."""
    return spark.range(n_rows).select(
        "id",
        F.expr(_zipf_level_case()).cast("int").alias("level"),
        F.expr(_ZIPF_LCG).alias("v"))


def zipf_topk_salted_at(spark, n_rows: int,
                        k: int = ZIPF_TOP_K) -> DataFrame:
    """Salted per-level top-k over an explicit fixture size — the scaling
    sweep calls this directly at 4.5M-45M rows where the naive plan's
    one-task hot sort visibly degrades (SCALING.md carries the A/B)."""
    from pyspark.sql import Window
    keyed = zipf_fixture(spark, n_rows).withColumn(
        "salt", F.expr(f"(id div 2) % {N_SALT}"))
    w_local = (Window.partitionBy("level", "salt")
               .orderBy(F.desc("v"), "id"))
    cand = (keyed.withColumn("lrn", F.row_number().over(w_local))
            .filter(F.col("lrn") <= k))
    w_final = Window.partitionBy("level").orderBy(F.desc("v"), "id")
    return (cand.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
            .select("level", F.col("rank").cast("int").alias("rank"),
                    "id", "v"))


def zipf_topk_naive_at(spark, n_rows: int,
                       k: int = ZIPF_TOP_K) -> DataFrame:
    from pyspark.sql import Window
    w = Window.partitionBy("level").orderBy(F.desc("v"), "id")
    return (zipf_fixture(spark, n_rows)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("level", F.col("rank").cast("int").alias("rank"),
                    "id", "v"))


def zipf_topk_salted(spark, events: DataFrame,
                     k: int = ZIPF_TOP_K) -> DataFrame:
    """Per-level top-k over the zipf fixture, SALTED — the skew proof the
    80/20 ops can't give. A windowed rank is the op skew genuinely
    breaks: partial aggregation can't help a window, so the naive
    `row_number() OVER (PARTITION BY level)` sorts 50% of ALL rows in ONE
    task (level 0). The salted plan never builds that partition: phase 1
    ranks within (level, salt) — the hot level fans out over {N_SALT}
    reducers — and keeps k candidates per salt; phase 2 re-ranks the ≤
    k*{N_SALT} survivors per level, a trivial window. Identical output to
    the naive window (tests/test_skew.py asserts equality AND the reducer
    load distribution); SCALING.md carries the measured naive-vs-salted
    growth."""
    from pyspark.sql import Window
    n = events.count() * ZIPF_AMPLIFY
    # salt on id>>1, NOT id % N_SALT: the level IS the trailing-zero
    # pattern of id, so low-bit salting correlates with the key it's
    # meant to break (odd ids would hit only odd salts — half the fanout)
    keyed = zipf_fixture(spark, n).withColumn(
        "salt", F.expr(f"(id div 2) % {N_SALT}"))
    w_local = (Window.partitionBy("level", "salt")
               .orderBy(F.desc("v"), "id"))
    cand = (keyed.withColumn("lrn", F.row_number().over(w_local))
            .filter(F.col("lrn") <= k))
    w_final = Window.partitionBy("level").orderBy(F.desc("v"), "id")
    return (cand.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
            .select("level", F.col("rank").cast("int").alias("rank"),
                    "id", "v"))


def zipf_topk_naive(spark, events: DataFrame,
                    k: int = ZIPF_TOP_K) -> DataFrame:
    """The UNSALTED window — deliberately the skewed plan, kept for the
    A/B the skew tests and SCALING.md measure. Not registered: the
    engine's blessed plan is the salted one."""
    return zipf_topk_naive_at(spark, events.count() * ZIPF_AMPLIFY, k)


ZIPF_TOPK_ORACLE = f"""
WITH gen AS (SELECT row_number() OVER () - 1 AS id
             FROM events, generate_series(1, {ZIPF_AMPLIFY})),
keyed AS (SELECT id, {_zipf_level_case('id')} AS level,
                 {_ZIPF_LCG} AS v FROM gen),
ranked AS (SELECT level, id, v,
                  row_number() OVER (PARTITION BY level
                                     ORDER BY v DESC, id) AS rank
           FROM keyed)
SELECT CAST(level AS INT) AS level, CAST(rank AS INT) AS rank, id, v
FROM ranked WHERE rank <= {ZIPF_TOP_K}
"""


def salted_skew_agg(events: DataFrame) -> DataFrame:
    """Two-phase salted aggregation for skewed keys. The fixture key is
    deliberately skewed (80% of rows share one hot key); a direct groupBy
    would put 80% of the data in one reducer. Phase 1 groups by (key,
    salt) — {N_SALT} partial aggregates for the hot key spread across
    reducers; phase 2 combines the partials per key. Result is identical
    to the direct aggregation (the oracle computes it directly)."""
    key = (F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
           .otherwise(F.concat(F.lit("cold_"), F.col("user_id").cast("string"))))
    salt = F.pmod(portable_hash64(F.col("event_id").cast("string")),
                  F.lit(N_SALT))
    partial = (events
               .select(key.alias("k"), salt.alias("s"),
                       _dec(F.col("value"), 4).alias("v"))
               .groupBy("k", "s")
               .agg(F.sum("v").alias("pv"), F.count(F.lit(1)).alias("pn")))
    return (partial.groupBy("k")
            .agg(F.sum("pv").cast("double").alias("total_value"),
                 F.sum("pn").alias("n_rows")))


SALTED_ORACLE = """
SELECT CASE WHEN event_id % 10 < 8 THEN 'hot'
            ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS k,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       COUNT(*) AS n_rows
FROM events GROUP BY 1
"""


def skew_join_salted(events: DataFrame) -> DataFrame:
    """Salted JOIN for a skewed fact key — the join-side twin of
    salted_skew_agg. The fact key is 80%-hot; a plain shuffle join would
    route 80% of the fact rows to one reducer. Production form: ONLY the
    hot key is salted — hot fact rows get a random-but-deterministic salt
    in [0, {N_SALT}), the dim's hot row is replicated {N_SALT}× (cold dim
    rows keep salt 0), and the join key becomes (k, salt). Dim stays
    dim-sized + {N_SALT}-1 rows, reducers stay balanced, and the result is
    value-identical to the unsalted join (the oracle computes it
    directly). At scale AQE's skew-join split is the automatic fallback;
    this is the explicit, planner-independent form."""
    key = (F.when(F.col("event_id") % 10 < 8, F.lit("hot"))
           .otherwise(F.concat(F.lit("cold_"), F.col("user_id").cast("string"))))
    fact = events.select(
        key.alias("k"), _dec(F.col("value"), 4).alias("v"),
        F.when(key == "hot",
               F.pmod(portable_hash64(F.col("event_id").cast("string")),
                      F.lit(N_SALT)))
         .otherwise(F.lit(0)).alias("salt"))
    dim = (events
           .select(key.alias("k")).distinct()
           .withColumn("weight", F.when(F.col("k") == "hot", F.lit(0.5))
                       .otherwise(F.lit(1.5)))
           .withColumn("salt", F.explode(
               F.when(F.col("k") == "hot",
                      F.sequence(F.lit(0), F.lit(N_SALT - 1)))
                .otherwise(F.array(F.lit(0))))))
    return (fact.join(dim, ["k", "salt"])
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum(F.col("v").cast("double") * F.col("weight")), 4)
                  .alias("weighted_value")))


SKEW_JOIN_ORACLE = """
WITH fact AS (
  SELECT CASE WHEN event_id % 10 < 8 THEN 'hot'
              ELSE 'cold_' || CAST(user_id AS VARCHAR) END AS k,
         CAST(value AS DECIMAL(18,4)) AS v
  FROM events),
dim AS (
  SELECT k, CASE WHEN k = 'hot' THEN 0.5 ELSE 1.5 END AS weight
  FROM (SELECT DISTINCT k FROM fact))
SELECT fact.k, COUNT(*) AS n_rows,
       round(SUM(CAST(v AS DOUBLE) * weight), 4) AS weighted_value
FROM fact JOIN dim ON fact.k = dim.k
GROUP BY fact.k
"""


def cube_counts(lineitem: DataFrame) -> DataFrame:
    """CUBE grouping sets — all four groupings of (returnflag, linestatus)
    in one aggregation pass (rollup_counts covers the hierarchical three).
    grouping_id disambiguates subtotal NULLs from data NULLs, exactly as
    SQL defines it."""
    return (lineitem.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("sum_qty"),
                 F.grouping_id("l_returnflag", "l_linestatus")
                  .cast("long").alias("gid")))


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k rows per group — the partitioned-window form (row_number ≤ k
    over a keyed window): one shuffle on the group key, no global sort, the
    shape that replaces ORDER BY…LIMIT when 'per entity' is needed."""
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey")
    return (orders
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.col("rk").cast("long").alias("rk")))


TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
"""


def pivot_counts(events: DataFrame) -> DataFrame:
    """groupBy().pivot() — per-user event-type histogram as columns. The
    pivot values are declared explicitly so the plan needs no extra
    distinct-scan pass (the at-scale form)."""
    types = ["click", "view", "purchase", "signup", "error"]
    return (events.groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types))


PIVOT_ORACLE = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY user_id
"""


def rollup_counts(lineitem: DataFrame) -> DataFrame:
    """ROLLUP grouping sets: per (returnflag, linestatus), per returnflag,
    and grand total in one aggregation pass — subtotal rows carry NULL
    group keys, exactly as SQL ROLLUP defines them."""
    return (lineitem.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("sum_qty")))


ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def asof_last_error(events: DataFrame) -> DataFrame:
    """As-of join, composed from built-ins (the reference has no as-of
    operator; SURVEY.md §2.D notes none exists): for every click event,
    the most recent error event of the same user at or before it. The
    union-then-window form — tag both streams, `last_value(error_ts)
    IGNORE NULLS` over a per-user time-ordered running frame — is one
    keyed shuffle, no range join explosion."""
    from pyspark.sql import Window
    tagged = (events
              .filter(F.col("event_type").isin("click", "error"))
              .select("event_id", "user_id", "event_type",
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                      F.when(F.col("event_type") == "error",
                             F.unix_micros(F.col("ts").cast("timestamp")))
                       .alias("err_ts")))
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (tagged
            .withColumn("last_error_ts_us",
                        F.last("err_ts", ignorenulls=True).over(w))
            .filter(F.col("event_type") == "click")
            .select("event_id", "user_id", "ts_us", "last_error_ts_us"))


ASOF_ORACLE = """
WITH tagged AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS err_ts
  FROM events WHERE event_type IN ('click', 'error'))
SELECT event_id, user_id, ts_us,
       last_value(err_ts IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING) AS last_error_ts_us
FROM tagged QUALIFY event_type = 'click'
"""


def percentile_summary(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per group (`percentile` — both
    engines implement the same linear interpolation over sorted values;
    at 100 TB swap in `percentile_approx` and tolerance-check instead)."""
    return (events.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
                 F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
                 F.count(F.lit(1)).alias("n")))


PERCENTILE_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


# ----------------------------------------------- bucketized interval join

IV_EVERY = 199                       # every 199th event opens an interval
IV_HOUR_US = 3_600_000_000
IV_BUCKET_US = 4 * IV_HOUR_US        # bucket width >= max interval / 2


def interval_join_bucketed(events: DataFrame) -> DataFrame:
    """Interval (range) join via time-bucket blocking — the scale path for
    `point BETWEEN start AND end` joins that Spark would otherwise plan as
    a broadcast-nested-loop theta join (O(events x intervals) comparisons).

    Interval table: every {IV_EVERY}-th event opens [ts, ts + 1..7 h).
    Each interval explodes to the 4 h buckets it covers (<= 3 rows); each
    probe event computes its single bucket scalar-wise. The join is then a
    pure EQUI-join on the bucket key + a residual band filter — shuffle
    geometry identical to any keyed join, so it scales with data, not with
    data x intervals. A probe row matches an interval in exactly one
    bucket (its own), so no post-join dedup is needed. Aggregates per
    interval: event count + decimal-exact value total."""
    e = events.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.col("value").cast("decimal(18,4)").alias("v"))
    iv = (e.filter(F.col("event_id") % IV_EVERY == 0)
          .select(F.col("event_id").alias("iv_id"),
                  F.col("t_us").alias("start_us"),
                  (F.col("t_us") + (F.col("event_id") % 7 + 1) * IV_HOUR_US)
                  .alias("end_us")))
    ivb = iv.withColumn("bucket", F.explode(F.expr(
        f"sequence(start_us DIV {IV_BUCKET_US}, end_us DIV {IV_BUCKET_US})")))
    eb = e.withColumn("bucket", F.expr(f"t_us DIV {IV_BUCKET_US}"))
    return (eb.join(ivb, "bucket")
            .filter((F.col("t_us") >= F.col("start_us"))
                    & (F.col("t_us") < F.col("end_us")))
            .groupBy("iv_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("v").cast("double").alias("total")))


INTERVAL_JOIN_ORACLE = f"""
WITH e AS (SELECT event_id, epoch_us(ts) AS t_us,
                  CAST(value AS DECIMAL(18,4)) AS v FROM events),
iv AS (SELECT event_id AS iv_id, t_us AS start_us,
              t_us + (event_id % 7 + 1) * {IV_HOUR_US} AS end_us
       FROM e WHERE event_id % {IV_EVERY} = 0)
SELECT iv_id, COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total
FROM iv JOIN e ON e.t_us >= iv.start_us AND e.t_us < iv.end_us
GROUP BY iv_id
"""


# ------------------------------------------------------- time-series gapfill

GF_EVERY = 50  # sparsify: only every 50th event observes, so gaps are real


def time_gapfill(events: DataFrame) -> DataFrame:
    """Hypertable-style gap filling + LOCF over a sparse per-type hourly
    series: generate EVERY hour bucket between each series' first and last
    observation (sequence + explode — scalar-wise, no driver loop), left
    join the observed aggregates, and carry the last observed total
    forward (last_value IGNORE NULLS over a keyed, growing frame).

    Scale: the dense bucket spine is data-derived (2 numbers per key
    broadcast nowhere — the sequence explodes from the per-key min/max
    row), the join is keyed on (event_type, bucket), and the LOCF window
    partitions by the series key — nothing global anywhere."""
    hour_us = 3_600_000_000
    obs = (events.filter(F.col("event_id") % GF_EVERY == 0)
           .select("event_type",
                   (F.unix_micros(F.col("ts").cast("timestamp"))
                    / F.lit(hour_us)).cast("long").alias("h"),
                   F.col("value").cast("decimal(18,4)").alias("v"))
           .groupBy("event_type", "h")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tv")))
    spine = (obs.groupBy("event_type")
             .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
             .select("event_type", F.explode(F.expr("sequence(h0, h1)")).alias("h")))
    from pyspark.sql import Window
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = (spine.join(obs, ["event_type", "h"], "left")
              .withColumn("n", F.coalesce("n", F.lit(0)))
              .withColumn("locf", F.last("tv", ignorenulls=True).over(w)))
    return filled.select(
        "event_type", (F.col("h") * hour_us).alias("bucket_us"), "n",
        F.col("locf").cast("double").alias("total_locf"))


GAPFILL_ORACLE = f"""
WITH obs AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                    COUNT(*) AS n,
                    SUM(CAST(value AS DECIMAL(18,4))) AS tv
             FROM events WHERE event_id % {GF_EVERY} = 0
             GROUP BY 1, 2),
spine AS (SELECT event_type, unnest(generate_series(min(h), max(h))) AS h
          FROM obs GROUP BY event_type)
SELECT s.event_type, s.h * 3600000000 AS bucket_us,
       COALESCE(o.n, 0) AS n,
       CAST(last_value(o.tv IGNORE NULLS) OVER (
            PARTITION BY s.event_type ORDER BY s.h
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS total_locf
FROM spine s LEFT JOIN obs o ON s.event_type = o.event_type AND s.h = o.h
"""


# ----------------------------------------------------------- funnel / cohort

FUNNEL_STAGES = ("view", "click", "purchase")


def event_funnel(events: DataFrame) -> DataFrame:
    """Ordered-funnel conversion: per user, stage k counts only if the
    user's FIRST stage-k event happens strictly after their first
    stage-(k-1) event. One keyed aggregate computes every first-touch
    timestamp (min with a conditional — no per-stage scans), then the
    ordering predicate is scalar; output is the per-stage converted-user
    count. The classic product-analytics query, one shuffle total."""
    firsts = (events.groupBy("user_id")
              .agg(*[F.min(F.when(F.col("event_type") == s,
                                  F.unix_micros(F.col("ts").cast("timestamp"))))
                     .alias(f"t{i}") for i, s in enumerate(FUNNEL_STAGES)]))
    reached = [F.col("t0").isNotNull()]
    for i in range(1, len(FUNNEL_STAGES)):
        reached.append(reached[-1] & F.col(f"t{i}").isNotNull()
                       & (F.col(f"t{i}") > F.col(f"t{i-1}")))
    counts = firsts.agg(*[
        F.sum(r.cast("long")).alias(f"n{i}") for i, r in enumerate(reached)])
    stages = ", ".join(
        f"{i}, '{s}', n{i}" for i, s in enumerate(FUNNEL_STAGES))
    return counts.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {stages}) AS (stage, stage_name, users)")


FUNNEL_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
         {', '.join(f"min(CASE WHEN event_type = '{s}' THEN epoch_us(ts) END) AS t{i}"
                    for i, s in enumerate(FUNNEL_STAGES))}
  FROM events GROUP BY user_id),
counts AS (SELECT
  SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS n0,
  SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
           THEN 1 ELSE 0 END) AS n1,
  SUM(CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL AND t1 > t0
                AND t2 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS n2
  FROM firsts)
SELECT stage, stage_name, users FROM counts,
LATERAL (VALUES (0, 'view', n0), (1, 'click', n1), (2, 'purchase', n2))
        AS t(stage, stage_name, users)
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: cohort = the user's first-seen DAY bucket
    (by 7-day weeks from the corpus epoch), cell = distinct users of
    cohort w active in week w+k. Two keyed aggregates and one keyed join
    — the user-activity relation never leaves its user_id partitioning
    until the final (cohort, offset) count, which is O(weeks²) rows."""
    day_us = 86_400_000_000
    acts = (events.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(7 * day_us))
        .cast("long").alias("week"))
        .distinct())
    cohorts = acts.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (acts.join(cohorts, "user_id")
            .groupBy("cohort_week",
                     (F.col("week") - F.col("cohort_week")).alias("week_offset"))
            .agg(F.countDistinct("user_id").alias("users")))


COHORT_ORACLE = """
WITH acts AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
              FROM events),
cohorts AS (SELECT user_id, min(week) AS cohort_week FROM acts GROUP BY user_id)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS users
FROM acts a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


def scd2_history(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 history build: collapse each
    user's event stream into versioned attribute rows — a new version
    opens whenever the tracked attribute (event_type) CHANGES from the
    previous event, valid_to = next version's valid_from (NULL while
    current). This is the warehouse-standard dimension-history shape the
    reference's status-stamp columns (added/removed/started/finished)
    approximate with fixed slots; SCD2 generalizes them to any number of
    transitions.

    Scale shape: two partitioned windows over (user_id) — change
    detection via lag, version close via lead — then a filter; no global
    sort, no self-join, the user's history never leaves its partition.
    Run-length: consecutive same-type events collapse into ONE version
    row (deterministic: ordered by (ts, event_id))."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = events.select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    starts = (base
              .withColumn("prev_type", F.lag("event_type").over(w))
              .filter(F.col("prev_type").isNull()
                      | (F.col("prev_type") != F.col("event_type"))))
    wv = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (starts
            .withColumn("valid_to_us", F.lead("ts_us").over(wv))
            .select("user_id", "event_type",
                    F.col("ts_us").alias("valid_from_us"),
                    "valid_to_us",
                    F.col("valid_to_us").isNull().cast("int")
                    .alias("is_current")))


SCD2_ORACLE = """
WITH base AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
              FROM events),
starts AS (SELECT * FROM (
             SELECT user_id, event_id, event_type, ts_us,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts_us, event_id) AS prev_type
             FROM base)
           WHERE prev_type IS NULL OR prev_type != event_type)
SELECT user_id, event_type, ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) AS valid_to_us,
       CAST(lead(ts_us) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) IS NULL AS INT)
         AS is_current
FROM starts
"""


def window_stats(events: DataFrame) -> DataFrame:
    """Ranking-window surface in one pass: per-user quartile (ntile),
    percent_rank and cume_dist over event value — the remaining ANSI
    window functions a SQL user expects from a full engine. One
    partitioned window, deterministic total order (value, event_id); no
    global sort anywhere."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return events.select(
        "event_id", "user_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"))


WINDOW_STATS_ORACLE = """
SELECT event_id, user_id,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
"""


def hll_per_group(events: DataFrame) -> DataFrame:
    """Per-group HyperLogLog distinct-user estimates with an exactness
    audit: sketch estimates differ engine-to-engine, so the checkable
    surface is the exact count plus a within-5% flag each engine
    computes over its OWN estimator (same contract as dedup_approx, per
    group). At 100 TB the sketch path is the one that matters: HLL state
    is O(kB) per group vs a distinct-shuffle of every user id."""
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id")
    return (events.groupBy("event_type")
            .agg(exact.alias("exact_users"),
                 (F.abs(approx - exact) <= 0.05 * exact).cast("int")
                 .alias("approx_ok")))


HLL_PER_GROUP_ORACLE = """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       CAST(abs(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
            <= 0.05 * COUNT(DISTINCT user_id) AS INT) AS approx_ok
FROM events GROUP BY event_type
"""


def grouping_sets_counts(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the general form behind cube/rollup
    (which this engine already ships): per-status, per-priority, and
    grand-total counts in ONE pass (Catalyst expands to a single
    aggregation over replicated grouping keys — not three scans).
    GROUPING() flags disambiguate the NULLs."""
    return orders.sparkSession.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio,
               COUNT(*) AS n
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """, o=orders)


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_prio,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def range_frame_window(events: DataFrame) -> DataFrame:
    """RANGE-frame running aggregate: per-user 1-hour trailing event
    count over EVENT TIME — the frame is defined by a time interval, not
    a row count, so bursts widen the window's row span (rows-frames
    can't express this). One partitioned window, no global sort; at
    100 TB the user_id partitioning is the shuffle key."""
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-3_600_000_000, 0))
    return (events.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
        .withColumn("n_last_hour", F.count(F.lit(1)).over(w)))


RANGE_FRAME_ORACLE = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS n_last_hour
FROM events
"""


def set_ops_except_intersect(orders: DataFrame) -> DataFrame:
    """EXCEPT / INTERSECT surface: customers with open orders but no
    finished ones (EXCEPT), and customers with both (INTERSECT), tagged
    and unioned — Catalyst plans both as keyed anti/semi joins, never a
    distinct-then-diff materialization."""
    return orders.sparkSession.sql("""
        SELECT 'open_only' AS tag, o_custkey FROM (
          SELECT o_custkey FROM {o} WHERE o_orderstatus = 'O'
          EXCEPT
          SELECT o_custkey FROM {o} WHERE o_orderstatus = 'F')
        UNION ALL
        SELECT 'open_and_finished', o_custkey FROM (
          SELECT o_custkey FROM {o} WHERE o_orderstatus = 'O'
          INTERSECT
          SELECT o_custkey FROM {o} WHERE o_orderstatus = 'F')
    """, o=orders)


SET_OPS_ORACLE = """
SELECT 'open_only' AS tag, o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'open_and_finished', o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def correlated_exists(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Correlated EXISTS/NOT EXISTS subqueries — Catalyst decorrelates
    both into one semi and one anti join on the correlation key (the
    plan a 100 TB run needs; a per-row subquery execution would be the
    row-at-a-time JDBC shape the reference had)."""
    return orders.sparkSession.sql("""
        SELECT o.o_orderkey, o.o_orderstatus,
               EXISTS(SELECT 1 FROM {l} li
                      WHERE li.l_orderkey = o.o_orderkey
                        AND li.l_quantity > 45) AS has_bulk_item
        FROM {o} o
        WHERE EXISTS(SELECT 1 FROM {l} li
                     WHERE li.l_orderkey = o.o_orderkey)
    """, o=orders, l=lineitem)


CORRELATED_EXISTS_ORACLE = """
SELECT o.o_orderkey, o.o_orderstatus,
       EXISTS(SELECT 1 FROM lineitem li
              WHERE li.l_orderkey = o.o_orderkey
                AND li.l_quantity > 45) AS has_bulk_item
FROM orders o
WHERE EXISTS(SELECT 1 FROM lineitem li
             WHERE li.l_orderkey = o.o_orderkey)
"""


SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize_ids(events: DataFrame) -> DataFrame:
    """Per-event SESSION ID assignment — the batch sessionization
    classic (the windowed `window_session` key aggregates per session;
    this one labels every event): a new session starts when the gap to
    the user's previous event exceeds {SESSION_GAP_US}us, and the
    session id is the running count of session starts — one lag + one
    cumulative sum over the same partitioned window, no self-join."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = events.select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    flagged = base.withColumn(
        "new_s",
        (F.coalesce(F.col("ts_us") - F.lag("ts_us").over(w),
                    F.lit(SESSION_GAP_US + 1))
         > SESSION_GAP_US).cast("long"))
    return (flagged
            .withColumn("session_seq",
                        F.sum("new_s").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)))
            .select("event_id", "user_id", "ts_us", "session_seq"))


SESSIONIZE_ORACLE = f"""
WITH base AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
flagged AS (SELECT *,
  CAST(COALESCE(ts_us - lag(ts_us) OVER w, {SESSION_GAP_US + 1})
       > {SESSION_GAP_US} AS BIGINT) AS new_s
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
SELECT event_id, user_id, ts_us,
       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_seq
FROM flagged
"""


HIST_BINS = 20


def value_histogram(events: DataFrame) -> DataFrame:
    """Equi-width histogram of event values — the deterministic
    reporting histogram (histogram_numeric is estimator-based and
    differs across engines; fixed-width binning over the exact min/max
    is reproducible anywhere). Two passes: a 1-row extent aggregate
    broadcast back, then one keyed count per bin; values at max land in
    the last bin."""
    ext = events.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("mn")) * HIST_BINS
                    / (F.col("mx") - F.col("mn"))).cast("int"),
            F.lit(HIST_BINS - 1)))
    return (events.join(F.broadcast(ext))
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("value"), 6).alias("lo"),
                 F.round(F.max("value"), 6).alias("hi")))


HISTOGRAM_ORACLE = f"""
WITH ext AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
SELECT CAST(CASE WHEN mx = mn THEN 0
            ELSE least(floor((value - mn) * {HIST_BINS} / (mx - mn)),
                       {HIST_BINS - 1}) END AS INT) AS bin,
       COUNT(*) AS n, round(MIN(value), 6) AS lo, round(MAX(value), 6) AS hi
FROM events, ext GROUP BY 1
"""


def data_profile(events: DataFrame) -> DataFrame:
    """Column-level data-quality profile — the pre-flight audit every
    ingest runs: per column (unpivoted), non-null count, null count,
    distinct count. One scan, one aggregate; the stack unpivot keeps it
    a single pass rather than a query per column."""
    agg = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[c for col in ("event_id", "user_id", "event_type", "value", "props")
          for c in (F.count(col).alias(f"nn_{col}"),
                    F.countDistinct(col).alias(f"nd_{col}"))])
    cols = ("event_id", "user_id", "event_type", "value", "props")
    stack = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return agg.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) as (column_name, n_nonnull, n_distinct)"
    ).select("column_name", "n_rows", "n_nonnull",
             (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
             "n_distinct")


DATA_PROFILE_ORACLE = """
WITH a AS (SELECT COUNT(*) AS n_rows,
  COUNT(event_id) AS nn_event_id, COUNT(DISTINCT event_id) AS nd_event_id,
  COUNT(user_id) AS nn_user_id, COUNT(DISTINCT user_id) AS nd_user_id,
  COUNT(event_type) AS nn_event_type, COUNT(DISTINCT event_type) AS nd_event_type,
  COUNT(value) AS nn_value, COUNT(DISTINCT value) AS nd_value,
  COUNT(props) AS nn_props, COUNT(DISTINCT props) AS nd_props
  FROM events)
SELECT u.column_name, a.n_rows, u.n_nonnull,
       a.n_rows - u.n_nonnull AS n_null, u.n_distinct
FROM a, LATERAL (VALUES
  ('event_id', nn_event_id, nd_event_id),
  ('user_id', nn_user_id, nd_user_id),
  ('event_type', nn_event_type, nd_event_type),
  ('value', nn_value, nd_value),
  ('props', nn_props, nd_props)) AS u(column_name, n_nonnull, n_distinct)
"""


def unpivot_melt(lineitem: DataFrame) -> DataFrame:
    """UNPIVOT/melt: widen-to-long over the four lineitem measures — the
    reshape feeding any per-measure reporting sink. Spark's native
    `unpivot` (Expand node) emits all measure rows in ONE scan pass, no
    join and no union re-scan; at 100 TB that's 1 read instead of 4."""
    return (lineitem.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure", "value")
        .select("l_orderkey", "l_linenumber", "measure",
                F.round("value", 6).alias("value")))


UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, u.measure, round(u.value, 6) AS value
FROM lineitem, LATERAL (VALUES
  ('l_quantity', l_quantity), ('l_extendedprice', l_extendedprice),
  ('l_discount', l_discount), ('l_tax', l_tax)) AS u(measure, value)
"""


def ntile_bands(orders: DataFrame) -> DataFrame:
    """Equi-depth quartile banding: NTILE(4) by order value within each
    priority class — the binning step behind tiered sampling / pricing
    reports. Partitioned window (priority is the shuffle key, bounded
    cardinality); full ORDER BY tiebreak makes the band assignment
    deterministic across engines."""
    from pyspark.sql import Window
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey"))
    return orders.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).alias("band"))


NTILE_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS band
FROM orders
"""


def listagg_ordered(lineitem: DataFrame) -> DataFrame:
    """Ordered LISTAGG: per order, its part keys concatenated in line
    order — the classic order-manifest projection (and the reference's
    chunk-reassembly concat in miniature: FileWorkerApp's ordered
    chunk->blob rebuild is this shape over byte arrays). collect_list is
    unordered by contract, so the sort key rides INSIDE the collected
    struct and array_sort restores line order after the shuffle — the
    only aggregation-order guarantee that survives distributed partial
    aggregation."""
    return (lineitem
            .groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_list(
                F.struct("l_linenumber", "l_partkey"))).alias("arr"))
            .select(
                "l_orderkey",
                F.expr("array_join(transform(arr, x -> "
                       "cast(x.l_partkey as string)), ',')").alias("parts"),
                F.size("arr").alias("n_lines")))


LISTAGG_ORACLE = """
SELECT l_orderkey,
       string_agg(CAST(l_partkey AS VARCHAR), ','
                  ORDER BY l_linenumber, l_partkey) AS parts,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def lateral_topk_per_group(nation: DataFrame, customer: DataFrame) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 lateral join, Spark 4):
    top-3 customers by balance PER NATION, expressed as the per-row
    subquery a SQL user writes — Catalyst decorrelates it into the same
    ranked-window plan topk_per_group builds by hand, so the declarative
    form costs nothing at scale (no per-group driver loop ever runs)."""
    return nation.sparkSession.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM {n} n,
        LATERAL (SELECT c_custkey, c_acctbal FROM {c}
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
    """, n=nation, c=customer)


LATERAL_TOPK_ORACLE = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_custkey, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
"""


#: Containment tree for the recursive walk: region <- nation <- supplier,
#: node ids offset into disjoint ranges so one edge list holds all levels.
_EDGES_SQL = """
SELECT CAST(n_nationkey + 1000 AS BIGINT) AS child,
       CAST(n_regionkey AS BIGINT) AS parent FROM {n}
UNION ALL
SELECT CAST(s_suppkey + 2000 AS BIGINT),
       CAST(s_nationkey + 1000 AS BIGINT) FROM {s}
"""


def recursive_cte_rollup(region: DataFrame, nation: DataFrame,
                         supplier: DataFrame) -> DataFrame:
    """WITH RECURSIVE (Spark 4): walk the region<-nation<-supplier
    containment tree from every root, counting nodes per (root, depth) —
    the hierarchy explosion (org charts, BOMs, thread trees) that before
    recursive CTEs needed a driver-side iteration loop per level. The
    SAME query handles any depth; each recursive step is one keyed join
    against the edge list, so a 100 TB edge table iterates as a sequence
    of shuffle joins, never a driver loop over rows."""
    edges = _EDGES_SQL.replace("{n}", "{nat}").replace("{s}", "{sup}")
    return region.sparkSession.sql(f"""
        WITH RECURSIVE walk(node, root, depth) AS (
          SELECT CAST(r_regionkey AS BIGINT), CAST(r_regionkey AS BIGINT), 0
          FROM {{r}}
          UNION ALL
          SELECT e.child, w.root, w.depth + 1
          FROM walk w JOIN ({edges}) e ON e.parent = w.node)
        SELECT root, depth, count(*) AS n
        FROM walk GROUP BY root, depth
    """, r=region, nat=nation, sup=supplier)


RECURSIVE_CTE_ORACLE = f"""
WITH RECURSIVE walk(node, root, depth) AS (
  SELECT CAST(r_regionkey AS BIGINT), CAST(r_regionkey AS BIGINT), 0
  FROM region
  UNION ALL
  SELECT e.child, w.root, w.depth + 1
  FROM walk w JOIN ({_EDGES_SQL.format(n='nation', s='supplier')}) e
    ON e.parent = w.node)
SELECT root, CAST(depth AS INT) AS depth, CAST(count(*) AS BIGINT) AS n
FROM walk GROUP BY root, depth
"""


# -------------------------------------------------------- time-decay (EWMA)

DECAY_WINDOW = 10  # rows of history per key; weight halves per step back


def time_decay_agg(events: DataFrame) -> DataFrame:
    """Per-user exponentially-decayed value at the stream head: over each
    user's last {DECAY_WINDOW} events (event-time order), sum
    value·0.5^(steps-back) — the recency-weighted engagement score a
    feature pipeline derives per entity (engine-beyond-reference; the
    reference's only per-key reduction is the HW max).

    Decimal-exact across engines: 0.5^d = 2^(W-1-d)/2^(W-1) with integer
    numerators, so the aggregate is an exact DECIMAL sum of
    value·2^(W-1-d) terms, divided by the power-of-two denominator only
    at the end (one double rounding, order-independent — the same
    discipline as the money sums above).

    100-TB shape: one shuffle on user_id for the row_number window; the
    per-user tail filter and weighted sum ride the same partitioning
    (Catalyst reuses the exchange), so the whole op is a single-pass
    windowed aggregation — no self-join, no skew beyond the key
    distribution itself (AQE handles a hot user).
    """
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = (events
            .withColumn("rn", F.row_number().over(w))
            .withColumn("mx", F.max("rn").over(Window.partitionBy("user_id"))))
    d = F.col("mx") - F.col("rn")  # steps back from the newest event
    num = _dec(F.col("value")) * F.expr(
        f"shiftleft(1L, {DECAY_WINDOW - 1} - (mx - rn))")
    return (rows.filter(d < DECAY_WINDOW)
            .groupBy("user_id")
            .agg(F.round(F.sum(num).cast("double")
                         / (1 << (DECAY_WINDOW - 1)), 6).alias("decayed"),
                 F.count(F.lit(1)).cast("long").alias("n_events")))


def time_decay_oracle_sql() -> str:
    half = 1 << (DECAY_WINDOW - 1)
    return f"""
WITH o AS (SELECT user_id, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS mx
           FROM events)
SELECT user_id,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))
                      * CAST(power(2, {DECAY_WINDOW - 1} - (mx - rn)) AS BIGINT))
                  AS DOUBLE) / {half}, 6) AS decayed,
       CAST(count(*) AS BIGINT) AS n_events
FROM o WHERE mx - rn < {DECAY_WINDOW}
GROUP BY user_id
"""


# -------------------------------------------------------------- skyline

PARETO_BUCKETS = 32


def pareto_front(part: DataFrame,
                 n_buckets: int = PARETO_BUCKETS) -> DataFrame:
    """2-D skyline (Pareto front) of the part catalog: parts not strictly
    dominated on (price, size) — both lower is better. The naive
    formulation is the O(n²) NOT-EXISTS dominance join (the oracle runs
    it at fixture scale); the engine's plan is the TWO-PHASE sort-based
    skyline — no stage anywhere orders all levels in one partition:

      1. collapse rows to PRICE LEVELS (groupBy price → min size) —
         the only stage that sees all rows, one keyed aggregation;
      2. range-bucket the levels on price (width_bucket against the
         broadcast 1-row [min, max] bounds — monotone, so every level
         in an earlier bucket is strictly cheaper) and take the running
         min(size) per BUCKET, ROWS frame ending 1 PRECEDING — the
         tie-correct strict-dominance frame, now in a PARTITIONED
         window (Exchange hashpartitioning(bkt), never SinglePartition);
      3. fold in the cross-bucket prefix: per-bucket min sizes form a
         ≤n_buckets-row summary, and "best size in any strictly earlier
         bucket" is a broadcast triangular self-join over it (≤B² pairs
         of B=32 rows — constant work, no unpartitioned window here
         either); prev_min = least(local running min, earlier-bucket
         min);
      4. join back on price: a row survives iff no strictly-cheaper
         level beats its size strictly.

    100-TB shape: stages 1 and 4 are keyed shuffles on price, stage 2 is
    a keyed shuffle on bucket, stage 3 is constant-size. Bucket count
    scales with cluster width; uniform-width buckets can skew on a
    pathological price distribution, but correctness never depends on
    balance and the bucket key can switch to quantile cuts without
    changing any other stage."""
    from pyspark.sql import Window
    levels = (part.groupBy("p_retailprice")
              .agg(F.min("p_size").alias("lmin")))
    bounds = levels.agg(F.min("p_retailprice").alias("mn"),
                        F.max("p_retailprice").alias("mx"))
    lv = (levels.join(F.broadcast(bounds))
          .withColumn(
              "bkt",
              F.when(F.col("mn") == F.col("mx"), F.lit(1))
              .otherwise(F.least(
                  F.width_bucket("p_retailprice", "mn", "mx",
                                 F.lit(n_buckets)),
                  F.lit(n_buckets))))
          .drop("mn", "mx"))
    w_local = (Window.partitionBy("bkt").orderBy("p_retailprice")
               .rowsBetween(Window.unboundedPreceding, -1))
    lv = lv.withColumn("local_prev", F.min("lmin").over(w_local))
    bmin = lv.groupBy("bkt").agg(F.min("lmin").alias("bmin"))
    earlier = (bmin.alias("a")
               .join(F.broadcast(bmin.alias("b")),
                     F.col("b.bkt") < F.col("a.bkt"))
               .groupBy(F.col("a.bkt").alias("bkt"))
               .agg(F.min("b.bmin").alias("earlier_min")))
    runmin = (lv.join(F.broadcast(earlier), "bkt", "left")
              .select("p_retailprice",
                      F.least("local_prev", "earlier_min")
                      .alias("prev_min")))
    return (part.join(runmin, "p_retailprice")
            .filter(F.col("prev_min").isNull()
                    | (F.col("prev_min") >= F.col("p_size")))
            .select("p_partkey", "p_retailprice", "p_size"))


PARETO_ORACLE = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice < p.p_retailprice AND q.p_size < p.p_size)
"""


# ------------------------------------------------- mergeable quantile sketch

HIST_Q_SCALE = 10  # 0.1-wide value buckets
HIST_QS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def histogram_quantiles(events: DataFrame) -> DataFrame:
    """Quantiles from a fixed-grid histogram sketch — the deterministic,
    MERGEABLE alternative to GK/t-digest approx_percentile (whose
    estimates differ run-to-run and engine-to-engine, so they can never
    be oracle-checked). Bucket counts are additive partials: shards
    histogram independently, merge by adding counts (`AcidTable.
    merge_add`-compatible), read any quantile off the cumulative sum —
    error bounded by the grid step, state bounded by the value range,
    never by row count. Thresholds use integer ceil division
    ((n·num + den − 1) div den), so both engines pick the identical
    bucket at every quantile. One shuffle on (event_type, bucket), one
    on event_type; the cumulative window runs over BUCKETS per type
    (bounded by the grid), not rows."""
    from pyspark.sql import Window
    b = F.floor(F.col("value") * HIST_Q_SCALE).alias("b")
    counts = (events.groupBy("event_type", b)
              .agg(F.count(F.lit(1)).alias("c")))
    w = (Window.partitionBy("event_type").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, 0))
    wt = Window.partitionBy("event_type")
    cum = (counts
           .withColumn("cum", F.sum("c").over(w))
           .withColumn("tot", F.sum("c").over(wt)))
    aggs = [
        (F.min(F.when(
            F.col("cum") >= F.expr(f"(tot * {num} + {den} - 1) div {den}"),
            F.col("b"))).cast("double") / HIST_Q_SCALE).alias(name)
        for num, den, name in HIST_QS]
    return cum.groupBy("event_type").agg(*aggs)


HISTOGRAM_Q_ORACLE = f"""
WITH counts AS (
  SELECT event_type, CAST(floor(value * {HIST_Q_SCALE}) AS BIGINT) AS b,
         count(*) AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS tot
  FROM counts)
SELECT event_type,
       {", ".join(
        f"CAST(min(CASE WHEN cum >= (tot * {num} + {den} - 1) // {den} "
        f"THEN b END) AS DOUBLE) / {HIST_Q_SCALE} AS {name}"
        for num, den, name in HIST_QS)}
FROM cum GROUP BY event_type
"""


# ------------------------------------------------------ data-quality suite

def dq_suite(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
             events: DataFrame, documents: DataFrame) -> DataFrame:
    """A dbt-style data-quality suite as ONE query: uniqueness, not-null,
    referential integrity (anti-joins), and accepted-range checks across
    five tables, each emitting (check, n_violations). Every check is a
    keyed aggregate or anti-join — no check ever materializes the
    violating rows unless asked, so the suite costs one scan per table
    at any scale, and a green run is a single small result to assert
    on. The reference has no data-quality surface at all (its TODO at
    StreamingApp.scala:322-324 is exactly a missing hash verification);
    a pipeline feeding training runs cannot skip this."""
    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check"),
                         F.col("n").cast("long").alias("n_violations"))

    checks = [
        one("orders_pk_unique",
            orders.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1).agg(F.count(F.lit(1)).alias("n"))),
        one("customer_pk_unique",
            customer.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1).agg(F.count(F.lit(1)).alias("n"))),
        one("lineitem_fk_orders",
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey,
                          "left_anti").agg(F.count(F.lit(1)).alias("n"))),
        one("orders_fk_customer",
            orders.join(customer, orders.o_custkey == customer.c_custkey,
                        "left_anti").agg(F.count(F.lit(1)).alias("n"))),
        one("lineitem_qty_range",
            lineitem.filter((F.col("l_quantity") < 1)
                            | (F.col("l_quantity") > 50))
            .agg(F.count(F.lit(1)).alias("n"))),
        one("events_id_unique",
            events.groupBy("event_id").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1).agg(F.count(F.lit(1)).alias("n"))),
        one("events_type_accepted",
            events.filter(~F.col("event_type").isin(
                "click", "view", "purchase", "error"))
            .agg(F.count(F.lit(1)).alias("n"))),
        one("documents_text_not_null",
            documents.filter(F.col("text").isNull()
                             | (F.col("text") == ""))
            .agg(F.count(F.lit(1)).alias("n"))),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


DQ_SUITE_ORACLE = """
SELECT 'orders_pk_unique' AS check, COUNT(*) AS n_violations FROM (
  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'customer_pk_unique', COUNT(*) FROM (
  SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
UNION ALL
SELECT 'lineitem_fk_orders', COUNT(*) FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'orders_fk_customer', COUNT(*) FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem_qty_range', COUNT(*) FROM lineitem
WHERE l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'events_id_unique', COUNT(*) FROM (
  SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1)
UNION ALL
SELECT 'events_type_accepted', COUNT(*) FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'error')
UNION ALL
SELECT 'documents_text_not_null', COUNT(*) FROM documents
WHERE text IS NULL OR text = ''
"""


# ------------------------------------------------------- anomaly detection

ANOMALY_Z = 3.0


def anomaly_zscore(events: DataFrame) -> DataFrame:
    """Per-group z-score anomaly census — the monitoring query a pipeline
    runs over every numeric stream: per event_type, mean/variance from
    DECIMAL-EXACT sums (sum(v), sum(v²) as DECIMAL — order-independent,
    so both engines derive the identical doubles), then count values
    with |v - mean| > {ANOMALY_Z}σ and report the worst offender.
    Two keyed aggregates over one shuffle; the sums are additive
    partials, so the same query runs incrementally under
    `AcidTable.merge_add` state."""
    v = F.col("value").cast("decimal(18,6)")
    stats = (events.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(v).alias("s1"),
                  F.sum(v * v).alias("s2")))
    stats = (stats
             .withColumn("mean", F.col("s1").cast("double") / F.col("n"))
             .withColumn("var",
                         F.col("s2").cast("double") / F.col("n")
                         - F.col("mean") * F.col("mean")))
    joined = (events.join(F.broadcast(
        stats.select("event_type", "n", "mean", "var")), "event_type")
        .withColumn("dev", F.col("value") - F.col("mean")))
    return (joined
            .withColumn("is_anom",
                        (F.col("dev") * F.col("dev")
                         > F.lit(ANOMALY_Z * ANOMALY_Z) * F.col("var"))
                        .cast("int"))
            .groupBy("event_type")
            .agg(F.any_value("n").alias("n"),
                 F.round(F.any_value("mean"), 6).alias("mean"),
                 F.sum("is_anom").alias("n_anomalies"),
                 F.round(F.max(F.when(F.col("is_anom") == 1,
                                      F.col("value"))), 6)
                 .alias("worst_value")))


ANOMALY_ORACLE = f"""
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s1,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
           AS s2
  FROM events GROUP BY event_type),
derived AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mean,
         CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n)
           * (CAST(s1 AS DOUBLE) / n) AS var
  FROM stats),
flagged AS (
  SELECT e.event_type, d.n, d.mean,
         CASE WHEN (e.value - d.mean) * (e.value - d.mean)
                   > {ANOMALY_Z * ANOMALY_Z} * d.var
              THEN 1 ELSE 0 END AS is_anom,
         e.value
  FROM events e JOIN derived d ON e.event_type = d.event_type)
SELECT event_type, any_value(n) AS n, round(any_value(mean), 6) AS mean,
       SUM(is_anom) AS n_anomalies,
       round(max(CASE WHEN is_anom = 1 THEN value END), 6) AS worst_value
FROM flagged GROUP BY event_type
"""


# ------------------------------------------------------- AQE skew join

SKEWD_WEIGHT = 10


def aqe_skew_join(spark, sf_dir: str) -> DataFrame:
    """AQE's built-in skew mitigation (OptimizeSkewedJoin) on the planted
    zipf join — the runtime complement to manual salting
    (`skew_join_salted`): the fact's hot key (level 0 = 50% of all rows)
    lands in one shuffle partition of a sort-merge join, and AQE splits
    that partition into multiple tasks reading the same (replicated)
    dim-side rows, so no single task sorts half the data. Thresholds are
    forced aggressive in a forked session (the fixture is small;
    production defaults are 5x/256MB) with broadcast disabled so the
    join actually shuffles — exactly the situation at 100 TB where the
    dim is too big to broadcast and the salting rewrite is the manual
    alternative. tests/test_plans.py asserts the final adaptive plan
    carries the skew=true SMJ; rows must equal the plain join (the
    oracle), because skew handling may never change results."""
    from ..sources.tables import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s2.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    # the downstream groupBy(level) could reuse the join's partitioning,
    # so AQE declines the split by default (it would cost an extra
    # exchange); force it — trading one small re-shuffle of the AGGREGATED
    # rows for not sorting half the fact in one task is exactly the right
    # trade at scale
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    n = load_table(s2, sf_dir, "events").count() * ZIPF_AMPLIFY
    fact = zipf_fixture(s2, n)
    dim = s2.range(ZIPF_LEVELS + 1).select(
        F.col("id").cast("int").alias("level"),
        ((F.col("id") + 1) * SKEWD_WEIGHT).alias("weight"))
    return (fact.join(dim, "level")
            .groupBy("level")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("v") * F.col("weight")).alias("wv")))


def aqe_skew_join_oracle_sql() -> str:
    return f"""
WITH gen AS (SELECT row_number() OVER () - 1 AS id
             FROM events, generate_series(1, {ZIPF_AMPLIFY})),
keyed AS (SELECT id, {_zipf_level_case('id')} AS level,
                 {_ZIPF_LCG} AS v FROM gen),
dim AS (SELECT unnest(generate_series(0, {ZIPF_LEVELS})) AS level),
wdim AS (SELECT level, (level + 1) * {SKEWD_WEIGHT} AS weight FROM dim)
SELECT CAST(k.level AS INT) AS level, COUNT(*) AS n,
       CAST(SUM(k.v * w.weight) AS BIGINT) AS wv
FROM keyed k JOIN wdim w ON k.level = w.level
GROUP BY k.level
"""
