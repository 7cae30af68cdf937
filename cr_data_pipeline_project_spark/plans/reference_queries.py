"""Reference-parity queries (SURVEY.md §2) on the driver fixture
tables, each with a DuckDB oracle twin.

Cross-engine hash-parity rules applied throughout (validated by
``tools/check_oracle.py`` probes):

- NEVER output a raw ``sum(double)`` / ``avg(double)`` — partial-sum
  order makes the last ulp nondeterministic. Cast to decimal before
  summing (exact, associative), cast the result back to double. Both
  engines round double→decimal half-up, verified.
- ``round()`` on positive doubles agrees (half-away-from-zero).
- Timestamp→string rendering is always pinned via
  ``date_format``/``strftime`` — never default casts.
- Every LIMIT/top-k query carries a unique tie-break key.
- Sums of integers are cast to BIGINT in DuckDB (its SUM(int) yields
  HUGEINT).

Reference citations (file:line) point at /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..functions import fastdec
from ..functions.calendar import season_calendar
from ..operators import mutations
from ..operators.rangejoin import interval_join, interval_join_bucketed

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.__query_name__ = name
        return fn

    return deco


def _dec_sum(col, scale: str = "decimal(28,6)"):
    """Exact, order-independent sum of a double column: fixed-point
    decimal semantics, returns decimal (caller casts to double).

    The default 6dp path runs the allocation-free long-scaled kernel
    (functions/fastdec.py — measured 2.3× faster than the
    cast-to-decimal sum, same decimal(38,6) type, bit-equal values on
    every fixture double and every product shape these call sites
    sum; tests/test_fastdec.py is the per-row gate). Non-default
    scales keep the decimal cast: coarser-than-granularity rounding
    (e.g. 2dp of a 4dp product) splits exact .5 ties between the
    string and binary rounding paths — see the fastdec module
    contract."""
    e = F.col(col) if isinstance(col, str) else col
    if scale == "decimal(28,6)":
        return fastdec.dec_sum(e, 6)
    return F.sum(e.cast(scale))


# --------------------------------------------------------------------
# A5/A10/P18 — grouped aggregate suite (TPC-H Q1 shape).
# Reference shape: usp_player_win_rate's SUM/COUNT/ROUND over a fact
# table (db_creation_script.sql:209-221) generalized to multi-measure.
# Scale: partial (map-side) + final hash agg, no sort until the tiny
# grouped result; ~6 groups → broadcastable output.
# --------------------------------------------------------------------
@q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           (SUM(l_quantity::DECIMAL(28,6)))::DOUBLE            AS sum_qty,
           (SUM(l_extendedprice::DECIMAL(28,6)))::DOUBLE       AS sum_base_price,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE AS sum_disc_price,
           (SUM((l_extendedprice*(1-l_discount)*(1+l_tax))::DECIMAL(28,6)))::DOUBLE AS sum_charge,
           (SUM(l_quantity::DECIMAL(28,6)))::DOUBLE / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").cast("double").alias("sum_qty"),
            _dec_sum("l_extendedprice").cast("double").alias("sum_base_price"),
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            _dec_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (_dec_sum("l_quantity").cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# FLAGSHIP — usp_card_usage_wins re-targeted (J4+J6+A6+P18+O2;
# db_creation_script.sql:224-241): usage share of a "season" total via
# scalar-subquery denominator + win rate, 3-way join, 2-key sort.
# Scale: part dim broadcast; single shuffle for the groupBy; the
# 1-row denominator cross-joins map-side.
# --------------------------------------------------------------------
@q(
    "q02_brand_usage_wins",
    """
    WITH season AS (
        SELECT l.l_partkey, l.l_returnflag
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    ),
    total AS (SELECT COUNT(*) AS total_cnt FROM season)
    SELECT p.p_brand AS brand,
           COUNT(*) AS usage_cnt,
           ROUND(100.0 * COUNT(*) / t.total_cnt, 2) AS usage_rate,
           ROUND(100.0 * (SUM(CASE WHEN s.l_returnflag = 'N' THEN 1 ELSE 0 END))::BIGINT / COUNT(*), 2) AS win_rate
    FROM season s JOIN part p ON s.l_partkey = p.p_partkey
    CROSS JOIN total t
    GROUP BY p.p_brand, t.total_cnt
    ORDER BY usage_rate DESC, win_rate DESC, brand
    """,
)
def q02_brand_usage_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    orders = table(spark, "orders", sf_dir)
    part = table(spark, "part", sf_dir)
    season = (
        li.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ).select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_partkey", "l_returnflag")
    )
    total = season.agg(F.count(F.lit(1)).alias("total_cnt"))
    return (
        season.join(F.broadcast(part), season.l_partkey == part.p_partkey)
        .crossJoin(F.broadcast(total))
        .groupBy(F.col("p_brand").alias("brand"), F.col("total_cnt"))
        .agg(
            F.count(F.lit(1)).alias("usage_cnt"),
            F.round(100.0 * F.count(F.lit(1)) / F.first("total_cnt"), 2).alias(
                "usage_rate"
            ),
            F.round(
                100.0
                * F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0))
                / F.count(F.lit(1)),
                2,
            ).alias("win_rate"),
        )
        .drop("total_cnt")
        .orderBy(F.desc("usage_rate"), F.desc("win_rate"), "brand")
    )


# --------------------------------------------------------------------
# A5/P17/P18 — usp_player_win_rate (db_creation_script.sql:209-221):
# per-entity win rate with the exact CASE/ROUND/cast placement.
# --------------------------------------------------------------------
@q(
    "q03_player_win_rate",
    """
    SELECT o_custkey AS player_id,
           COUNT(*) AS battles,
           CASE WHEN COUNT(*) = 0 THEN NULL
                ELSE ROUND((SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))::BIGINT * 100.0 / COUNT(*), 2)
           END AS win_rate
    FROM orders
    GROUP BY o_custkey
    """,
)
def q03_player_win_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    cnt = F.count(F.lit(1))
    wins = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return (
        orders.groupBy(F.col("o_custkey").alias("player_id"))
        .agg(
            cnt.alias("battles"),
            F.when(cnt == F.lit(0), F.lit(None).cast("double"))
            .otherwise(F.round(wins * 100.0 / cnt, 2))
            .alias("win_rate"),
        )
    )


# --------------------------------------------------------------------
# O1+J2+J5 — vw_recent_rankings (db_creation_script.sql:185-194):
# scalar-subquery latest season + join + TOP 100.
# Scale: the MAX() is a 1-row broadcast; top-k is a TakeOrdered, no
# full sort.
# --------------------------------------------------------------------
@q(
    "q04_recent_rankings_top100",
    """
    WITH latest AS (
        SELECT strftime(MAX(o_orderdate), '%Y-%m') AS max_month FROM orders
    )
    SELECT o.o_orderkey AS rank_key, c.c_name AS player_name,
           o.o_totalprice AS rating
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    CROSS JOIN latest
    WHERE strftime(o.o_orderdate, '%Y-%m') = latest.max_month
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q04_recent_rankings_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    customer = table(spark, "customer", sf_dir)
    latest = orders.agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM").alias("max_month")
    )
    return (
        orders.crossJoin(F.broadcast(latest))
        .where(F.date_format("o_orderdate", "yyyy-MM") == F.col("max_month"))
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            F.col("o_orderkey").alias("rank_key"),
            F.col("c_name").alias("player_name"),
            F.col("o_totalprice").alias("rating"),
        )
        .orderBy(F.desc("rating"), "rank_key")
        .limit(100)
    )


# J3/P1 — vw_player_clan (db_creation_script.sql:197-205).
@q(
    "q05_player_clan_view",
    """
    SELECT c.c_custkey AS player_id, c.c_name AS player_name,
           n.n_name AS clan_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q05_player_clan_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    n = table(spark, "nation", sf_dir)
    r = table(spark, "region", sf_dir)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("c_custkey").alias("player_id"),
            F.col("c_name").alias("player_name"),
            F.col("n_name").alias("clan_name"),
            F.col("r_name").alias("region_name"),
        )
    )


# A1/A2 — SELECT DISTINCT single column (db_ops.py:32-35).
@q("q06_distinct_single", "SELECT DISTINCT c_mktsegment FROM customer")
def q06_distinct_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, "customer", sf_dir).select("c_mktsegment").distinct()


# A3 — dedup by key subset, made deterministic (drop_duplicates at
# etl_pipeline_script.py:40 keeps pandas row order; the distributed
# analog pins an explicit order).
@q(
    "q07_dedup_by_key",
    """
    SELECT o_orderkey, o_custkey, o_orderdate FROM (
        SELECT o_orderkey, o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) t
    WHERE rn = 1
    """,
)
def q07_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select("o_orderkey", "o_custkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# A4 — composite-subset dedup count (etl_pipeline_script.py:134-135).
@q(
    "q08_dedup_composite_count",
    """
    SELECT COUNT(*) AS unique_battles FROM (
        SELECT DISTINCT o_custkey, o_orderstatus FROM orders) t
    """,
)
def q08_dedup_composite_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    return (
        orders.dropDuplicates(["o_custkey", "o_orderstatus"])
        .agg(F.count(F.lit(1)).alias("unique_battles"))
    )


# P6/J8 — the NOT-IN incremental gate as a left-anti join
# (etl_pipeline_script.py:43-44,128-130).
@q(
    "q09_anti_join_new_keys",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q09_anti_join_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    return c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


# P5/J9 — isin-keep gate as a left-semi join
# (etl_pipeline_script.py:48,133,143).
@q(
    "q10_semi_join_kept_keys",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q10_semi_join_kept_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    return c.join(
        o.where(F.col("o_orderstatus") == "P").select("o_custkey"),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


# A8/A9 — set union + dedup (etl_pipeline_script.py:66,74).
@q(
    "q11_union_dedup",
    """
    SELECT DISTINCT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier) t
    """,
)
def q11_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


# P10+P12 — match_key synthesis: str(timestamp)+'_'+id
# (api_extract.py:216). String form pinned to second precision.
@q(
    "q12_key_synthesis",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') || '_' || user_id AS match_key
    FROM events
    """,
)
def q12_key_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.concat(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit("_"),
            F.col("user_id").cast("string"),
        ).alias("match_key"),
    )


# P12 — strict timestamp parse with coercion-to-null
# (api_extract.py:213-214): corrupt inputs parse to NULL, not error.
@q(
    "q13_ts_parse_strict",
    """
    SELECT o_orderkey,
           try_strptime(
             CASE WHEN o_orderkey % 97 = 0 THEN 'not-a-time'
                  ELSE strftime(o_orderdate, '%Y%m%dT%H%M%S.%g') || 'Z' END,
             '%Y%m%dT%H%M%S.%gZ') AS battle_time
    FROM orders
    """,
)
def q13_ts_parse_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    wire = F.when(F.col("o_orderkey") % 97 == 0, F.lit("not-a-time")).otherwise(
        F.date_format("o_orderdate", "yyyyMMdd'T'HHmmss.SSS'Z'")
    )
    return orders.select(
        "o_orderkey",
        F.try_to_timestamp(wire, F.lit("yyyyMMdd'T'HHmmss.SSS'Z'")).alias(
            "battle_time"
        ),
    )


# P11 — URL-encode/decode ids ('#'↔'%23', api_extract.py:62,128).
# The decoded column closes the round-trip IN the gate: decode ∘
# encode must be the identity on tagged ids (also property-tested in
# tests/test_properties.py).
@q(
    "q14_url_encode",
    """
    SELECT c_custkey,
           replace(c_name, 'Customer', '#Customer') AS tagged,
           replace(replace(c_name, 'Customer', '#Customer'), '#', '%23') AS encoded,
           replace(replace(replace(c_name, 'Customer', '#Customer'),
                   '#', '%23'), '%23', '#') AS decoded
    FROM customer
    """,
)
def q14_url_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import url_decode_id, url_encode_id

    c = table(spark, "customer", sf_dir)
    tagged = F.replace(F.col("c_name"), F.lit("Customer"), F.lit("#Customer"))
    encoded = url_encode_id(tagged)
    return c.select(
        "c_custkey",
        tagged.alias("tagged"),
        encoded.alias("encoded"),
        url_decode_id(encoded).alias("decoded"),
    )


# J7 — the broadcast range join replacing battle_time_to_sid
# (helper_functions.py:76-85): attribute each order to the season
# interval containing its date, then aggregate per season.
@q(
    "q15_range_join_season",
    """
    WITH months AS (
        SELECT ms FROM range(TIMESTAMP '1994-11-01', TIMESTAMP '2001-12-01',
                             INTERVAL 1 MONTH) t(ms)
    ),
    mondays AS (
        SELECT ms + ((8 - isodow(ms)) % 7) * INTERVAL 1 DAY
                  + INTERVAL 9 HOUR + INTERVAL 5 MINUTE AS sn_start_date
        FROM months
    ),
    seasons AS (
        SELECT strftime(sn_start_date, '%Y-%m') AS season_id, sn_start_date,
               lead(sn_start_date) OVER (ORDER BY sn_start_date)
                 - INTERVAL 1 SECOND AS sn_end_date
        FROM mondays
    )
    SELECT s.season_id,
           COUNT(*) AS n_orders,
           (SUM(o.o_totalprice::DECIMAL(28,6)))::DOUBLE AS season_total
    FROM orders o
    JOIN seasons s ON o.o_orderdate BETWEEN s.sn_start_date AND s.sn_end_date
    GROUP BY s.season_id
    """,
)
def q15_range_join_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    seasons = season_calendar(spark, "1994-11-01", 84)
    # bucketed (equi-prejoin on month + residual range filter): a
    # BroadcastHashJoin instead of comparing every order against all
    # 84 intervals — see operators/rangejoin.py
    joined = interval_join_bucketed(orders, seasons, "o_orderdate", how="inner")
    return joined.groupBy("season_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum("o_totalprice").cast("double").alias("season_total"),
    )


# P13 — array element with bounds default (api_extract.py:218-219).
@q(
    "q16_element_at_default",
    """
    SELECT vec_id,
           COALESCE(embedding[1], 0)::DOUBLE AS tower1_hp,
           COALESCE(embedding[65], 0)::DOUBLE AS tower2_hp,
           len(embedding)::INT AS dim
    FROM embeddings
    """,
)
def q16_element_at_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import tower_hp

    emb = table(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id",
        tower_hp("embedding", 0).cast("double").alias("tower1_hp"),
        tower_hp("embedding", 64).cast("double").alias("tower2_hp"),
        F.size("embedding").cast("int").alias("dim"),
    )


# P1 (nested JSON access) — get_json_object over the props column.
@q(
    "q17_json_extract",
    """
    SELECT event_id, json_extract_string(props, '$.k')::INT AS k
    FROM events
    """,
)
def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# P15/P16 — conditional null mask + fill (api_extract.py:157,
# db_ops.py:129).
@q(
    "q18_null_mask_fill",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS masked,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS filled
    FROM customer
    """,
)
def q18_null_mask_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    masked = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(
        F.col("c_acctbal")
    )
    return c.select(
        "c_custkey", masked.alias("masked"), F.coalesce(masked, F.lit(0.0)).alias("filled")
    )


# P17/P18 — CASE + ROUND arithmetic (db_creation_script.sql:214-217).
@q(
    "q19_case_round",
    """
    SELECT l_linestatus,
           ROUND(100.0 * (SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END))::BIGINT
                 / COUNT(*), 2) AS pct_returned,
           ROUND((SUM(l_quantity::DECIMAL(28,6)))::DOUBLE / COUNT(*), 2) AS avg_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q19_case_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    cnt = F.count(F.lit(1))
    return li.groupBy("l_linestatus").agg(
        F.round(
            100.0 * F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)) / cnt,
            2,
        ).alias("pct_returned"),
        F.round(_dec_sum("l_quantity").cast("double") / cnt, 2).alias("avg_qty"),
    )


# §2.5 — ranking window: per-group top-k (the per-season
# generalization of vw_recent_rankings' TOP 100).
@q(
    "q20_window_rank",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn::INT AS rn FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t
    WHERE rn <= 3
    """,
)
def q20_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


# O2 — multi-key sort + limit (db_creation_script.sql:240).
@q(
    "q21_multikey_sort",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def q21_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(50)
    )


# J6 — scalar-subquery denominator (db_creation_script.sql:231-233).
@q(
    "q22_priority_share",
    """
    WITH total AS (SELECT COUNT(*) AS n FROM orders)
    SELECT o_orderpriority, COUNT(*) AS cnt,
           ROUND(100.0 * COUNT(*) / t.n, 2) AS share
    FROM orders CROSS JOIN total t
    GROUP BY o_orderpriority, t.n
    """,
)
def q22_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    total = orders.agg(F.count(F.lit(1)).alias("n"))
    return (
        orders.crossJoin(F.broadcast(total))
        .groupBy("o_orderpriority", "n")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(100.0 * F.count(F.lit(1)) / F.first("n"), 2).alias("share"),
        )
        .drop("n")
    )


# M6 — deterministic surrogate keys (IDENTITY replacement,
# db_creation_script.sql:87 + etl_pipeline_script.py:141-145).
@q(
    "q23_surrogate_keys",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '_' || o_custkey AS match_key,
           (row_number() OVER (
               ORDER BY strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || '_' || o_custkey,
                        o_orderkey))::INT AS match_view_id
    FROM orders
    """,
)
def q23_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scalar import synth_match_key

    orders = table(spark, "orders", sf_dir)
    keyed = orders.select(
        "o_orderkey",
        synth_match_key("o_orderdate", F.col("o_custkey").cast("string")).alias(
            "match_key"
        ),
    )
    return mutations.add_surrogate_keys(
        keyed, ["match_key", "o_orderkey"], "match_view_id"
    )


# M1-M3 — MERGE upsert as a pure relational expression
# (db_ops.py:62-93): source rows win, unmatched target rows survive.
@q(
    "q24_merge_upsert",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM (
        SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer WHERE c_custkey % 7 <> 0) t
    """,
)
def q24_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    source = c.where(F.col("c_custkey") % 7 == 0).withColumn(
        "c_mktsegment", F.lit("UPDATED")
    )
    return mutations.upsert(c, source, ["c_custkey"])


# M4 — insert-if-absent (etl_pipeline_script.py:43-50).
@q(
    "q25_insert_if_absent",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_orderkey % 5 = 0
      AND NOT EXISTS (SELECT 1 FROM orders e
                      WHERE e.o_orderkey % 10 = 0
                        AND e.o_orderkey = orders.o_orderkey)
    """,
)
def q25_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    incoming = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", "o_custkey"
    )
    existing = orders.where(F.col("o_orderkey") % 10 == 0).select("o_orderkey")
    return mutations.insert_if_absent(incoming, existing, ["o_orderkey"])


# M5 — cascade purge child-first (db_ops.py:53-59): surviving row
# counts per table after purging a set of keys.
@q(
    "q26_cascade_delete",
    """
    WITH purge AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0),
    surviving_orders AS (
        SELECT * FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM purge)
    )
    SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM purge)
    UNION ALL
    SELECT 'orders' AS tbl, COUNT(*) AS n FROM surviving_orders
    UNION ALL
    SELECT 'lineitem' AS tbl, COUNT(*) AS n FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM surviving_orders)
    """,
)
def q26_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir)
    purge = c.where(F.col("c_custkey") % 100 == 0).select(
        F.col("c_custkey").alias("player_id")
    )
    kept_c = c.join(purge, c.c_custkey == purge.player_id, "left_anti")
    kept_o = o.join(purge, o.o_custkey == purge.player_id, "left_anti")
    kept_li = li.join(
        kept_o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi"
    )
    return (
        kept_c.agg(F.count(F.lit(1)).alias("n")).select(F.lit("customer").alias("tbl"), "n")
        .unionByName(kept_o.agg(F.count(F.lit(1)).alias("n")).select(F.lit("orders").alias("tbl"), "n"))
        .unionByName(kept_li.agg(F.count(F.lit(1)).alias("n")).select(F.lit("lineitem").alias("tbl"), "n"))
    )


# helper_functions.py:7-73 — the season-calendar generator itself.
@q(
    "q27_season_calendar",
    """
    WITH months AS (
        SELECT ms FROM range(TIMESTAMP '2025-01-01', TIMESTAMP '2026-02-01',
                             INTERVAL 1 MONTH) t(ms)
    ),
    mondays AS (
        SELECT ms + ((8 - isodow(ms)) % 7) * INTERVAL 1 DAY
                  + INTERVAL 9 HOUR + INTERVAL 5 MINUTE AS sn_start_date
        FROM months
    )
    SELECT strftime(sn_start_date, '%Y-%m') AS season_id, sn_start_date,
           lead(sn_start_date) OVER (ORDER BY sn_start_date)
             - INTERVAL 1 SECOND AS sn_end_date
    FROM mondays
    QUALIFY sn_end_date IS NOT NULL
    """,
)
def q27_season_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return season_calendar(spark, "2025-01-01", 12)


# §2.8 — tumbling event-time window over the events table.
@q(
    "q28_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           (SUM(value::DECIMAL(28,6)))::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q28_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("value").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


# Sessionization (gaps-and-islands; batch twin of the streaming
# session_window operator) — 30-minute inactivity gap per user.
@q(
    "q29_sessionization",
    """
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               (SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        FROM seq
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q29_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    seq = ev.withColumn(
        "new_session",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    sess = seq.withColumn("session_id", F.sum("new_session").over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


# S5/P1 — nested array-of-struct flatten (the battlelog ingest shape)
# expressed in-gate: build, explode, field-access.
@q(
    "q45_nested_flatten",
    """
    SELECT o_orderkey, (x).kind AS kind, (x).val AS val FROM (
        SELECT o_orderkey,
               unnest([{'kind': 'base', 'val': o_totalprice},
                       {'kind': 'doubled', 'val': o_totalprice * 2}]) AS x
        FROM orders) t
    """,
)
def q45_nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, "orders", sf_dir)
    arr = F.array(
        F.struct(F.lit("base").alias("kind"), F.col("o_totalprice").alias("val")),
        F.struct(
            F.lit("doubled").alias("kind"),
            (F.col("o_totalprice") * 2).alias("val"),
        ),
    )
    return orders.select("o_orderkey", F.explode(arr).alias("x")).select(
        "o_orderkey", F.col("x.kind").alias("kind"), F.col("x.val").alias("val")
    )


# Rollup / grouping sets — the idiomatic Spark generalization of the
# reference's per-entity aggregates (subtotals + grand total in one
# pass; partial aggregation handles it server-side at scale).
@q(
    "q46_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INT AS g_flag,
           grouping(l_linestatus)::INT AS g_status,
           COUNT(*) AS n,
           (SUM(l_quantity::DECIMAL(28,6)))::DOUBLE AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q46_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        _dec_sum("l_quantity").cast("double").alias("sum_qty"),
    )


# E3 — the SQL-text/view surface: temp views + spark.sql, the engine's
# equivalent of querying vw_recent_rankings over ODBC
# (db_creation_script.sql:185-194).
@q(
    "q49_sql_view_api",
    """
    WITH latest AS (
        SELECT strftime(MAX(o_orderdate), '%Y-%m') AS max_month FROM orders
    )
    SELECT o.o_orderkey AS rank_key, c.c_name AS player_name,
           o.o_totalprice AS rating
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    CROSS JOIN latest
    WHERE strftime(o.o_orderdate, '%Y-%m') = latest.max_month
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q49_sql_view_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, "orders", sf_dir).createOrReplaceTempView("v_orders")
    table(spark, "customer", sf_dir).createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH latest AS (
            SELECT date_format(MAX(o_orderdate), 'yyyy-MM') AS max_month
            FROM v_orders
        )
        SELECT o.o_orderkey AS rank_key, c.c_name AS player_name,
               o.o_totalprice AS rating
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        CROSS JOIN latest
        WHERE date_format(o.o_orderdate, 'yyyy-MM') = latest.max_month
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
        """
    )


# Single-pass column profiler — per-column row/null/distinct/min/max
# (the ingestion-audit shape; one scan, not N).
@q(
    "q50_column_profile",
    """
    SELECT 'l_returnflag' AS column_name, COUNT(*) AS n_rows,
           (SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END))::BIGINT AS n_nulls,
           COUNT(DISTINCT l_returnflag) AS n_distinct,
           MIN(l_returnflag)::VARCHAR AS min_str, MAX(l_returnflag)::VARCHAR AS max_str
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', COUNT(*),
           (SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END))::BIGINT,
           COUNT(DISTINCT l_linenumber),
           MIN(l_linenumber)::VARCHAR, MAX(l_linenumber)::VARCHAR
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*),
           (SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END))::BIGINT,
           COUNT(DISTINCT l_shipdate),
           MIN(l_shipdate)::VARCHAR, MAX(l_shipdate)::VARCHAR
    FROM lineitem
    """,
)
def q50_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns

    li = table(spark, "lineitem", sf_dir)
    return profile_columns(li, ["l_returnflag", "l_linenumber", "l_shipdate"])


# Sketch twin of q50 — ONE full-width pass, approx_count_distinct
# (HLL++) instead of exact distinct: no Expand node, bounded memory.
# Rows-only: sketch estimates are engine-specific; a tolerance pytest
# (tests/test_profile.py) bounds the error against the exact profile.
@q("q73_column_profile_approx")
def q73_column_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_columns_approx

    li = table(spark, "lineitem", sf_dir)
    return profile_columns_approx(
        li, ["l_returnflag", "l_linenumber", "l_shipdate"]
    )


# Salted join — skew mitigation whose output must be EXACTLY the
# plain join (the oracle is the unsalted SQL).
@q(
    "q51_salted_join",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n,
           (SUM(o.o_orderkey::DECIMAL(28,0)))::DOUBLE AS key_sum
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q51_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    o = table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    c = table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    joined = salted_join(o, c, ["c_custkey"], salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_orderkey").cast("decimal(28,0)"))
        .cast("double")
        .alias("key_sum"),
    )


# Sliding event-time window (1h window, 30m slide) — each event lands
# in exactly 2 windows.
@q(
    "q30_sliding_window",
    """
    WITH slid AS (
        SELECT make_timestamp(((floor(epoch(ts) / 1800) - off) * 1800 * 1000000)::BIGINT)
                   AS window_start, value
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) offs
    )
    SELECT window_start, COUNT(*) AS n,
           (SUM(value::DECIMAL(28,6)))::DOUBLE AS sum_value
    FROM slid
    GROUP BY window_start
    """,
)
def q30_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("value").cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


# M6 scale path — dense surrogate ids WITHOUT a global window:
# range-partition + sort-within gives ids equal to the global
# row_number over the key (assign_dense_ids is pure JVM arithmetic on
# monotonically_increasing_id; the only shuffle is one count row per
# partition). The per-batch-delta twin is q23 (window-based).
@q(
    "q58_dense_ids_scale",
    """
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) AS dense_id
    FROM orders
    """,
)
def q58_dense_ids_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        table(spark, "orders", sf_dir)
        .select("o_orderkey")
        .repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    return mutations.assign_dense_ids(orders, "dense_id")


# Ref-date-relative calendar entry points (helper_functions.py:7-74)
# with the reference's pinned-ref-date test seam. Completed = end <
# ref (strict); ref mid-June 2025 puts 4 completed seasons in the
# n=3 build window (the reference's own n+1 quirk).
@q(
    "q59_last_completed_seasons",
    """
    WITH months AS (
        SELECT ms FROM range(TIMESTAMP '2025-02-01', TIMESTAMP '2025-07-01',
                             INTERVAL 1 MONTH) t(ms)
    ),
    mondays AS (
        SELECT ms + ((8 - isodow(ms)) % 7) * INTERVAL 1 DAY
                  + INTERVAL 9 HOUR + INTERVAL 5 MINUTE AS sn_start_date
        FROM months
    ),
    cal AS (
        SELECT strftime(sn_start_date, '%Y-%m') AS season_id, sn_start_date,
               lead(sn_start_date) OVER (ORDER BY sn_start_date)
                 - INTERVAL 1 SECOND AS sn_end_date
        FROM mondays
    )
    SELECT season_id, sn_start_date, sn_end_date
    FROM cal
    WHERE sn_end_date IS NOT NULL
      AND sn_end_date < TIMESTAMP '2025-06-15'
    """,
)
def q59_last_completed_seasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    from ..functions.calendar import last_n_completed_seasons

    return last_n_completed_seasons(spark, 3, _dt.datetime(2025, 6, 15))


@q(
    "q60_current_plus_seasons",
    """
    WITH months AS (
        SELECT ms FROM range(TIMESTAMP '2025-04-01', TIMESTAMP '2026-02-01',
                             INTERVAL 1 MONTH) t(ms)
    ),
    mondays AS (
        SELECT ms + ((8 - isodow(ms)) % 7) * INTERVAL 1 DAY
                  + INTERVAL 9 HOUR + INTERVAL 5 MINUTE AS sn_start_date
        FROM months
    ),
    cal AS (
        SELECT strftime(sn_start_date, '%Y-%m') AS season_id, sn_start_date,
               lead(sn_start_date) OVER (ORDER BY sn_start_date)
                 - INTERVAL 1 SECOND AS sn_end_date
        FROM mondays
        QUALIFY sn_end_date IS NOT NULL
    ),
    ranked AS (
        SELECT *, CASE WHEN sn_start_date > TIMESTAMP '2025-06-15'
                       THEN row_number() OVER (
                            PARTITION BY sn_start_date > TIMESTAMP '2025-06-15'
                            ORDER BY sn_start_date)
                       ELSE 0 END AS frank
        FROM cal
    )
    SELECT season_id, sn_start_date, sn_end_date
    FROM ranked
    WHERE (sn_start_date <= TIMESTAMP '2025-06-15'
           AND TIMESTAMP '2025-06-15' <= sn_end_date)
       OR frank BETWEEN 1 AND 3
    """,
)
def q60_current_plus_seasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    from ..functions.calendar import current_plus_n_seasons

    return current_plus_n_seasons(spark, 3, _dt.datetime(2025, 6, 15))


# --------------------------------------------------------------------
# Round-5 additions: the classic multi-way-join analytics shapes
# (TPC-H Q3/Q5) on the warehouse tables — the join-order/broadcast
# workout the reference's 2-3-table views never reach.


@q(
    "q113_shipping_priority",
    """
    SELECT l_orderkey,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q113_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way customer→orders→lineitem
    join with disjoint date predicates on both fact sides, revenue
    top-10. Decimal-cast sums for cross-engine exactness (file
    header); the LIMIT is fully tie-broken (revenue, date, orderkey)
    so the row set is deterministic. Scale: both date filters push
    to the scans; customer is the small side (broadcast at fixture,
    key-shuffle at warehouse scale — an equi join either way); the
    aggregation partial-combines on l_orderkey before the top-k."""
    cu = table(spark, "customer", sf_dir).where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, "orders", sf_dir).where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        cu.join(o, cu["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(
            F.desc("revenue"), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


@q(
    "q114_local_supplier_volume",
    """
    SELECT n_name,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q114_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-way join — two fact
    tables plus customer/supplier/nation/region dims — with the
    co-location residual (customer and supplier in the same nation),
    per-nation revenue. The canonical Catalyst join-ordering workout:
    region→nation prune first (broadcast), the c_nationkey =
    s_nationkey residual rides the supplier equi join, the date
    filter pushes to the orders scan. Decimal-cast sum for exact
    parity; unordered output (the driver sorts)."""
    cu = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir)
    su = table(spark, "supplier", sf_dir)
    na = table(spark, "nation", sf_dir)
    re = table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA")
    return (
        cu.join(o, cu["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            su,
            (li["l_suppkey"] == su["s_suppkey"])
            & (cu["c_nationkey"] == su["s_nationkey"]),
        )
        .join(na, su["s_nationkey"] == na["n_nationkey"])
        .join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
        .groupBy("n_name")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@q(
    "q123_returned_item_reporting",
    """
    SELECT c_custkey, c_name,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q123_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): which customers returned
    the most revenue in a quarter — 4-way customer→orders→lineitem
    join plus the nation dim, grouped per customer with identifying
    attributes, revenue top-20 (tie-broken on c_custkey for a
    deterministic row set; the fixture's customer table carries no
    address/phone/comment, so the identifying columns are
    name/acctbal/nation). Scale: the quarter filter pushes to the
    orders scan and the returnflag filter to the lineitem scan BEFORE
    either fact shuffles; nation broadcasts; the per-customer
    aggregate partial-combines on the grouping key; decimal-cast sum
    for cross-engine exactness (file header)."""
    cu = table(spark, "customer", sf_dir)
    o = table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, "lineitem", sf_dir).where(
        F.col("l_returnflag") == "R"
    )
    na = table(spark, "nation", sf_dir)
    return (
        cu.join(o, cu["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "q124_large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS o_totalprice,
           (SUM(l_quantity))::BIGINT AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q124_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds a threshold, with customer identification — the
    aggregate-then-semi-join shape (a HAVING subquery feeding an IN
    filter) the other TPC-H entries don't exercise. l_quantity is
    integral-valued double in the fixture, so SUM is IEEE-exact at
    any aggregation order (every partial is an integer < 2^53) — no
    decimal cast needed, and the BIGINT cast is lossless. Scale: the
    HAVING pre-aggregate partial-combines on l_orderkey; its
    survivor set (top ~0.3% of orders) broadcasts into a semi join
    against orders BEFORE the customer join, so the expensive 3-way
    join only ever sees qualifying orders; top-100 fully tie-broken
    on (o_totalprice, o_orderkey)."""
    li = table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 300)
        .select("l_orderkey")
    )
    o = table(spark, "orders", sf_dir).join(
        F.broadcast(big),
        F.col("o_orderkey") == big["l_orderkey"],
        "left_semi",
    )
    cu = table(spark, "customer", sf_dir)
    return (
        cu.join(o, cu["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


@q(
    "q129_late_shipment_priority",
    """
    SELECT o_orderpriority, COUNT(*)::BIGINT AS n_late_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q129_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders with at least one
    line item shipped more than 60 days after the order date, counted
    per priority class — the correlated-EXISTS shape (equi key plus
    an inequality RESIDUAL referencing both sides) the other TPC-H
    entries don't exercise; the fixture carries no
    commitdate/receiptdate, so lateness is shipdate vs orderdate.
    Scale: Spark plans the EXISTS as a left-semi hash join on
    l_orderkey with the date comparison as a post-probe residual —
    lineitem is never aggregated, each order short-circuits on its
    first late line, and the projection is (l_orderkey, l_shipdate)
    only; the final groupBy is over |priorities| ≈ 5 groups."""
    o = table(spark, "orders", sf_dir)
    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


@q(
    "q130_promo_revenue_share",
    """
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           (SUM(CASE WHEN p_type = 'PROMO'
                THEN (l_extendedprice*(1-l_discount))::DECIMAL(28,6)
                ELSE 0 END))::DOUBLE AS promo_revenue,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS total_revenue,
           ROUND(100.0 *
                 (SUM(CASE WHEN p_type = 'PROMO'
                      THEN (l_extendedprice*(1-l_discount))::DECIMAL(28,6)
                      ELSE 0 END))::DOUBLE /
                 (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE,
                 4) AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def q130_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect, extended to a monthly
    series: per ship month, the share of discounted revenue from
    promo-type parts — the conditional-aggregation-over-a-join shape
    (CASE inside SUM) none of the other TPC-H entries cover.
    Exactness: both revenue sums are decimal (order-independent);
    the share is a fixed chain of IEEE ops (×100, ÷, round) on the
    exact sums, identical textual order in both engines. Scale: part
    is the small side and broadcasts (only p_partkey/p_type project),
    so lineitem never shuffles for the join; the aggregate
    partial-combines on ~84 month groups."""
    li = table(spark, "lineitem", sf_dir)
    pa = table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    g = (
        li.join(F.broadcast(pa), li["l_partkey"] == pa["p_partkey"])
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return g.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 4
        ).alias("promo_share_pct"),
    ).orderBy("ship_month")


@q(
    "q116_windowed_heavy_hitters",
    """
    WITH w AS (
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
    SELECT window_start, event_type, n, rnk FROM (
        SELECT window_start, event_type, n,
               (ROW_NUMBER() OVER (PARTITION BY window_start
                   ORDER BY n DESC, event_type))::INT AS rnk
        FROM w) t
    WHERE rnk <= 3
    """,
)
def q116_windowed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window heavy hitters: the top-3 event types of every
    tumbling hour — the dashboard/alerting analytic a streaming
    pipeline materializes continuously (q28's windowed counts with a
    per-window rank on top; ties toward the lexicographically first
    type, fully deterministic). Scale: the count partial-combines
    map-side; the rank window partitions by window_start — thousands
    of independent partitions of |event_types| rows each, never a
    global window. Streaming twin: windowed_event_counts → rank in
    foreachBatch.

    Null contract (round-11 null adversary): NULL event_type is
    excluded in both engine and oracle — the label census ranks
    KNOWN labels, and a null label otherwise lands at a different
    end of the rank tiebreak on each engine (Spark sorts nulls
    first ascending, DuckDB last), shifting every rank below it. A
    monitor that must see unlabeled spikes would coalesce to a
    '(null)' label instead; excluding is this query's contract."""
    ev = table(spark, "events", sf_dir).where(
        F.col("event_type").isNotNull()
    )
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    rw = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(rw))
        .where(F.col("rnk") <= 3)
    )


@q(
    "q119_stickiness_dau_wau",
    """
    WITH activity AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
        FROM events WHERE user_id IS NOT NULL),
    days AS (SELECT DISTINCT d FROM activity),
    dau AS (SELECT d, COUNT(*) AS dau FROM activity GROUP BY d),
    wau AS (
        SELECT days.d, COUNT(DISTINCT a.user_id) AS wau
        FROM days JOIN activity a
          ON a.d > days.d - 7 AND a.d <= days.d
        GROUP BY days.d)
    SELECT CAST(dau.d AS VARCHAR) AS day, dau, wau,
           ROUND(dau * 1.0 / wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q119_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product stickiness: daily actives over trailing-7-day actives
    per day — the engagement ratio every events warehouse reports.
    Distinct-over-a-sliding-window cannot be a window function
    (COUNT(DISTINCT) OVER is unsupported in both engines), so the
    WAU side joins the (tiny, ≤#days) day spine against the distinct
    (day, user) activity with a range predicate — the q15 interval
    pattern: broadcast the spine, never the activity. Scale: activity
    is |users|·|active days| rows, deduped map-side; the range join
    fans each activity row to ≤7 spine days; both aggregates
    partial-combine. Day rendered ISO-string for dtype-stable
    parity (the q107 convention); the ratio is one IEEE division of
    two exact ints."""
    ev = table(spark, "events", sf_dir).where(F.col("user_id").isNotNull())
    activity = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = activity.select("d").distinct()
    dau = activity.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    a = activity.select(
        F.col("d").alias("ad"), F.col("user_id").alias("au")
    )
    wau = (
        a.join(
            F.broadcast(days),
            (F.col("ad") > F.date_sub(F.col("d"), 7))
            & (F.col("ad") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("au").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


@q(
    "q133_sessionization",
    """
    WITH ev AS (
        SELECT event_id, user_id, ts FROM events
        WHERE user_id IS NOT NULL),
    tagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > 1800000000 THEN 1
                    ELSE 0 END AS new_s,
               event_id
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               (SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
        FROM tagged)
    SELECT user_id, session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*)::BIGINT AS n_events,
           ((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000)::BIGINT
               AS duration_sec
    FROM s GROUP BY user_id, session_idx
    """,
)
def q133_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessionize.py): each
    user's event stream split into sessions at >30-minute silences —
    the batch twin of Structured Streaming's ``session_window`` and
    the canonical event-analytics primitive (funnels, stickiness and
    retention all consume sessions). Output: one row per session with
    start/end, event count, and exact integer duration. Scale: ONE
    shuffle on user_id serves the lag window, the running-sum window
    AND the session aggregate (same key, Catalyst reuses the sort);
    event payloads never move twice; partitions are per-user —
    millions of small independent groups, no global window."""
    from ..operators.sessionize import session_stats

    ev = table(spark, "events", sf_dir).where(F.col("user_id").isNotNull())
    return session_stats(
        ev.select("event_id", "user_id", "ts"),
        user_col="user_id",
        ts_col="ts",
        gap_minutes=30,
        order_tiebreak="event_id",
    )


@q(
    "q135_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           (year(l_shipdate))::INT AS l_year,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q135_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume shipping: bilateral trade revenue
    between two nations per ship year — the 6-way join with a
    DISJUNCTIVE cross-table predicate (either trade direction) that
    none of the other TPC-H entries exercise. Scale: the two nation
    roles are genuinely tiny and broadcast explicitly — their name
    filter then prunes customers/suppliers at the map side of THEIR
    joins (to 2/25 of rows) before either fact probe; customer /
    supplier / orders are SF-proportional (billions of rows at
    100 TB), so those joins stay key-shuffles that AQE converts to
    broadcasts only when a side measures small at runtime. One
    shuffle for the final 4-group-per-year aggregate. Revenue is a
    decimal sum (order-independent), count exact."""
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    su = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cu = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    na = table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    n1 = na.where(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.where(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    o_cust = (
        o.join(cu, o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .select("o_orderkey", "cust_nation")
    )
    supp = su.join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    joined = (
        li.join(o_cust, li["l_orderkey"] == F.col("o_orderkey"))
        .join(supp, li["l_suppkey"] == F.col("s_suppkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "q136_market_share",
    """
    WITH vol AS (
        SELECT (year(o_orderdate))::INT AS o_year,
               (l_extendedprice*(1-l_discount))::DECIMAL(28,6) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA')
    SELECT o_year,
           (SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                ELSE 0 END))::DOUBLE AS nation_volume,
           (SUM(volume))::DOUBLE AS total_volume,
           ROUND((SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                      ELSE 0 END))::DOUBLE
                 / (SUM(volume))::DOUBLE, 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q136_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: of all PROMO-part
    revenue sold to ASIA-region customers, the fraction supplied by
    NATION_5, per order year — the 8-way snowflake join (two nation
    roles + region) with a conditional share aggregate. Scale:
    nation/region are genuinely tiny and broadcast explicitly — the
    region filter prunes customers to 1/5 map-side; part / customer /
    supplier / orders are SF-proportional, so their joins stay
    key-shuffles (AQE broadcasts whichever side measures small at
    runtime — at fixture scale, all of them); part's PROMO filter
    (1/6 of parts) is pushed to its scan. Lineitem shuffles once for
    the ~|years|-group aggregate. Both volume sums are decimal-exact;
    the share is one IEEE division + round."""
    li = table(spark, "lineitem", sf_dir)
    pa = table(spark, "part", sf_dir).where(F.col("p_type") == "PROMO").select("p_partkey")
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    su = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cu = table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    na = table(spark, "nation", sf_dir).select("n_nationkey", "n_name", "n_regionkey")
    re = table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA").select("r_regionkey")
    cust_asia = (
        cu.join(
            F.broadcast(
                na.join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])
                .select(F.col("n_nationkey").alias("__cn"))
            ),
            cu["c_nationkey"] == F.col("__cn"),
        ).select("c_custkey")
    )
    vol = (
        li.join(pa, li["l_partkey"] == pa["p_partkey"])
        .join(
            o.join(cust_asia, o["o_custkey"] == F.col("c_custkey")).select(
                "o_orderkey", "o_orderdate"
            ),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(
            F.broadcast(na.select(F.col("n_nationkey").alias("__sn"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("__sn"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(28,6)")
            .alias("volume"),
            "supp_nation",
        )
    )
    is_n5 = F.col("supp_nation") == "NATION_5"
    g = vol.groupBy("o_year").agg(
        F.sum(F.when(is_n5, F.col("volume")).otherwise(F.lit(0).cast("decimal(28,6)")))
        .cast("double")
        .alias("nation_volume"),
        F.sum("volume").cast("double").alias("total_volume"),
    )
    return g.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    ).orderBy("o_year")


@q(
    "q137_daily_event_anomaly",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS c
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type, COUNT(*)::BIGINT AS n,
               (SUM(c))::BIGINT AS s, (SUM(c*c))::BIGINT AS q
        FROM daily GROUP BY 1)
    SELECT event_type, CAST(d AS VARCHAR) AS day, c AS n_events,
           ROUND((n*c - s)::DOUBLE / SQRT((n*q - s*s)::DOUBLE), 4) AS z
    FROM daily JOIN m USING (event_type)
    WHERE n >= 2 AND (n*c - s)*(n*c - s) > 4*(n*q - s*s)
    ORDER BY event_type, day
    """,
)
def q137_daily_event_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: days whose event count sits
    more than 2 standard deviations from that event type's daily
    mean — the data-quality tripwire every ingest pipeline runs
    (volume collapse = upstream outage; spike = bot or replay). The
    |z|>2 GATE is evaluated in exact BIGINT arithmetic —
    (n·c − s)² > 4(n·q − s²) clears both denominators — so the
    selected row set is bit-deterministic cross-engine (a float
    z-threshold would flap on ties); the reported z itself is one
    IEEE sqrt + division on exact integer moments. Scale: daily
    counts partial-combine map-side; the moment table is |types|
    rows and broadcasts back; no window functions at all. The gate
    itself is operators/groupstats.py:daily_count_anomaly — the SAME
    code the streaming snapshot serves, so batch and streaming
    cannot de-synchronize."""
    from ..operators.groupstats import daily_count_anomaly

    ev = table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return daily_count_anomaly(daily, z_threshold=2)


@q(
    "q142_customer_order_distribution",
    """
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
    SELECT c_count, COUNT(*)::BIGINT AS n_custs
    FROM per_cust GROUP BY c_count
    ORDER BY n_custs DESC, c_count DESC
    """,
)
def q142_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: how many
    customers placed 0, 1, 2, … non-urgent orders — the LEFT OUTER
    join with an ON-clause filter + double aggregation shape
    (customers with no qualifying orders MUST surface as c_count=0,
    which an inner join silently drops) that no other entry covers.
    The right-side-only ON predicate is applied as an orders
    pre-filter — semantically identical for LEFT OUTER, and it lets
    the filter push to the orders scan instead of evaluating
    post-probe. Scale: both aggregations partial-combine (the first
    on c_custkey — co-partitioned with the join's own shuffle key,
    so Catalyst reuses the exchange; the second on the ~|max orders
    per customer| distinct counts); no window functions."""
    cu = table(spark, "customer", sf_dir).select("c_custkey")
    o = (
        table(spark, "orders", sf_dir)
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cu.join(o, cu["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_custs"))
        .orderBy(F.desc("n_custs"), F.desc("c_count"))
    )


@q(
    "q144_event_cube",
    """
    SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
                ELSE event_type END AS event_type,
           CASE WHEN GROUPING(d) = 1 THEN 'ALL'
                ELSE CAST(d AS VARCHAR) END AS day,
           COUNT(*)::BIGINT AS n_events,
           (SUM(value::DECIMAL(28,6)))::DOUBLE AS value_total
    FROM (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events) t
    GROUP BY CUBE (event_type, d)
    ORDER BY event_type, day
    """,
)
def q144_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: event counts and value totals at every
    marginalization level — (type, day), per type, per day, and the
    grand total — in ONE pass (the OLAP dashboard's entire drill
    hierarchy materialized at once). Exercises the Expand operator
    (each input row fans to its 4 grouping sets BEFORE the aggregate,
    which then partial-combines normally — no extra scan per level).
    GROUPING() distinguishes a real NULL key from a marginal row, the
    portable-cube idiom both engines share; decimal value sums keep
    the hash exact."""
    ev = table(spark, "events", sf_dir).select(
        "event_type", F.to_date("ts").alias("d"), "value"
    )
    g = ev.cube("event_type", "d").agg(
        # grouping() must live inside the cube's own aggregate
        # (Spark resolves it against the grouping-set id there)
        F.grouping("event_type").alias("__gt"),
        F.grouping("d").alias("__gd"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .cast("double")
        .alias("value_total"),
    )
    return g.select(
        F.when(F.col("__gt") == 1, F.lit("ALL"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("__gd") == 1, F.lit("ALL"))
        .otherwise(F.col("d").cast("string"))
        .alias("day"),
        "n_events",
        "value_total",
    ).orderBy("event_type", "day")


@q(
    "q145_daily_matrix_unpivot",
    """
    WITH wide AS (
        SELECT CAST(ts AS DATE) AS d,
               (COUNT(*) FILTER (WHERE event_type = 'click'))::BIGINT
                   AS click,
               (COUNT(*) FILTER (WHERE event_type = 'view'))::BIGINT
                   AS view,
               (COUNT(*) FILTER (WHERE event_type = 'purchase'))::BIGINT
                   AS purchase
        FROM events GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS day, event_type, n
    FROM wide
    UNPIVOT (n FOR event_type IN (click, view, purchase))
    ORDER BY day, event_type
    """,
)
def q145_daily_matrix_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long re-shaping (UNPIVOT/melt): the per-day engagement
    matrix (one column per event type, q67's pivot shape) melted back
    to tidy (day, event_type, n) rows — the transformation every
    BI-export / feature-store boundary needs in BOTH directions, and
    the relational operator (Spark's ``unpivot``/``melt``, the
    Expand-based inverse of pivot) nothing else on the surface
    exercises. Scale: the wide matrix is |days| rows (already
    aggregated); unpivot is a narrow per-row fan-out of exactly
    |value columns|, no shuffle."""
    ev = table(spark, "events", sf_dir)
    wide = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(t)
                for t in ("click", "view", "purchase")
            ]
        )
    )
    return (
        wide.unpivot(
            ["d"], ["click", "view", "purchase"], "event_type", "n"
        )
        .select(F.col("d").cast("string").alias("day"), "event_type", "n")
        .orderBy("day", "event_type")
    )


@q(
    "q146_audience_except_all",
    """
    WITH diff AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase')
    SELECT user_id, COUNT(*)::BIGINT AS surplus_clicks
    FROM diff GROUP BY user_id
    ORDER BY surplus_clicks DESC, user_id
    """,
)
def q146_audience_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set difference (EXCEPT ALL): per user, click
    events surviving after cancelling one-for-one against purchase
    events — the multiset arithmetic behind exposure-vs-conversion
    surplus counts, where q68's DISTINCT set-ops would collapse
    every user to 0/1. Exercises ``exceptAll`` (Spark plans it as a
    count-difference generate, not an anti-join). The surviving bag
    is re-aggregated so the output is deterministic (bag order is
    not)."""
    ev = table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    return (
        clicks.exceptAll(purchases)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("surplus_clicks"))
        .orderBy(F.desc("surplus_clicks"), "user_id")
    )


@q(
    "q147_forward_fill",
    """
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM events
    """,
)
def q147_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (LOCF — last observation carried
    forward): 'error' events report no trustworthy reading, so each
    takes the user's most recent valid value; leading errors stay
    NULL — the gap-filling primitive of sensor/metrics pipelines and
    the IGNORE NULLS window mode (Spark ``last(col,
    ignorenulls=True)``) nothing else on the surface exercises.
    Exactness: values are carried verbatim (no arithmetic), so the
    hash matches bit-for-bit. Scale: one window partitioned by
    user_id — millions of small independent partitions, same shuffle
    class as q133 (sessionize shares the key)."""
    ev = table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    valid = F.when(F.col("event_type") != "error", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(valid, ignorenulls=True).over(w).alias("filled_value"),
    )


@q(
    "q148_top_supplier_revenue",
    """
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q148_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) whose
    discounted revenue over one quarter equals the maximum of the
    per-supplier revenue aggregate — the aggregate-then-scalar-MAX-
    over-the-same-aggregate shape (Q15's CREATE VIEW + WHERE
    total_revenue = (SELECT MAX ...)) the surface lacks; ties all
    surface, per spec. Exactness: revenue is a decimal sum cast to
    double once, so the equality against its own MAX compares
    identical bit patterns in both engines. Scale: the quarter
    filter pushes to the lineitem scan; the per-supplier aggregate
    partial-combines to |suppliers| rows; the MAX is then a global
    window over that BOUNDED dim-cardinality aggregate (one
    |suppliers|-row exchange — genuinely one lineitem pass, unlike
    the scalar-subquery formulation, which Spark plans as two
    lineitem scans), and supplier broadcasts."""
    li = table(spark, "lineitem", sf_dir)
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            _dec_sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("total_revenue")
        )
    )
    top = F.max("total_revenue").over(Window.partitionBy())
    su = table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        rev.withColumn("__top", top)
        .where(F.col("total_revenue") == F.col("__top"))
        .join(F.broadcast(su), F.col("supplier_no") == su["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "q149_small_quantity_revenue",
    """
    WITH target AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'),
    thr AS (
        SELECT l_partkey,
               0.2 * ((SUM(l_quantity::DECIMAL(28,6)))::DOUBLE
                      / COUNT(*)) AS qty_thr
        FROM lineitem JOIN target ON l_partkey = p_partkey
        GROUP BY l_partkey)
    SELECT (SUM(l_extendedprice::DECIMAL(28,6)))::DOUBLE / 7.0
               AS avg_yearly,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem JOIN thr USING (l_partkey)
    WHERE l_quantity < qty_thr
    """,
)
def q149_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: for one
    brand+type slice of parts, the yearly-averaged revenue of line
    items whose quantity is below 20% of that part's average ordered
    quantity — the correlated scalar-AVG-subquery shape (decorrelated
    to an aggregate + self-join on l_partkey, exactly how engines
    plan Q17). Exactness: the threshold is decimal-sum/count then
    one fixed float chain (x0.2), identical in both engines, and the
    output sum is decimal. Scale: the part slice broadcasts as a
    semi-join gate BEFORE the per-part aggregate, so only the target
    parts' line items aggregate; the self-join is per-part
    (co-partitioned on l_partkey) and the final result is one row."""
    pa = (
        table(spark, "part", sf_dir)
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
        .select("p_partkey")
    )
    li = table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    sliced = li.join(
        F.broadcast(pa), li["l_partkey"] == pa["p_partkey"], "left_semi"
    )
    thr = sliced.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                _dec_sum("l_quantity").cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_thr")
    )
    small = sliced.join(thr, "l_partkey").where(
        F.col("l_quantity") < F.col("qty_thr")
    )
    return small.agg(
        (_dec_sum("l_extendedprice").cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@q(
    "q150_disjunctive_parts_revenue",
    """
    SELECT (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q150_disjunctive_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate revenue: an OR of three
    conjunctive brand/size/quantity clauses spanning BOTH join sides
    — the shape that defeats naive predicate pushdown (no single
    conjunct can move below the join whole). Catalyst still extracts
    the common per-side implications (p_size >= 1; quantity within
    the union range) and pushes those, evaluating the full
    disjunction post-probe — the documented Q19 plan in every
    cost-based engine. Scale: part broadcasts (3-column projection),
    lineitem never shuffles, and the answer is one row of decimal
    sums."""
    li = table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    pa = table(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(pa), li["l_partkey"] == pa["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(clause).agg(
        _dec_sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@q(
    "q151_waiting_suppliers",
    """
    WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1),
    sole AS (
        SELECT l_orderkey FROM late
        GROUP BY l_orderkey HAVING COUNT(*) = 1)
    SELECT s_name, COUNT(*)::BIGINT AS numwait
    FROM late
    JOIN sole  USING (l_orderkey)
    JOIN multi USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q151_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: in
    multi-supplier orders, the supplier who was the ONLY late one
    (shipdate > orderdate + 60 days; the fixture carries no
    commit/receipt dates) — Q21's double-correlated EXISTS('another
    supplier') + NOT EXISTS('another LATE supplier') rewritten as
    aggregates: |late suppliers per order| = 1 and |suppliers per
    order| > 1 are the same predicates without the two correlated
    probes (the q129 entry keeps the raw EXISTS plan shape; this
    entry documents the rewrite an optimizer targets at scale).
    Round 8 fused the three legs into ONE lineitem pass: per
    (order, supplier) an any-late flag, then per order the supplier
    count, late-supplier count, and — because exactly one supplier
    is late on a qualifying order — the lone late supplier itself
    via max(CASE). Two partial-combining shuffles total (both
    orderkey-keyed, AQE-coalesced) instead of the old
    join+distinct / distinct-count / semi-join chain that re-scanned
    lineitem; measured 1.84 s → 1.55 s at sf0.1 (same-session A/B)
    and 33.6 s → 10.6 s at the 50× corpus (alpha 0.75 → 0.38).
    Supplier broadcasts; output ≤ |suppliers| rows, top-20 with the
    name tie-break."""
    li = table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    flagged = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("__late"),
    )
    per_os = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__ns"),
        F.sum(F.col("__late").cast("int")).alias("__nl"),
        F.max(F.when(F.col("__late"), F.col("l_suppkey"))).alias(
            "__late_supp"
        ),
    )
    su = table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        per_o.where((F.col("__ns") > 1) & (F.col("__nl") == 1))
        .join(F.broadcast(su), F.col("__late_supp") == su["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@q(
    "q152_idle_premium_customers",
    """
    WITH pos AS (SELECT * FROM customer WHERE c_acctbal > 0),
    thr AS (
        SELECT (SUM(c_acctbal::DECIMAL(28,6)))::DOUBLE / COUNT(*) AS bal_thr
        FROM pos)
    SELECT n_name, COUNT(*)::BIGINT AS n_custs,
           (SUM(c_acctbal::DECIMAL(28,6)))::DOUBLE AS total_bal
    FROM customer c
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN thr
    WHERE c_acctbal > bal_thr
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q152_idle_premium_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped idle premium customers: per nation, customers
    whose balance exceeds the positive-balance average but who placed
    no order in the final data year — Q22's global-scalar-AVG +
    NOT-EXISTS(anti-join) combination (the fixture has no phone
    country codes, so nations stand in, and every customer has SOME
    order, so idleness is date-scoped). Exactness: the threshold is
    one decimal-sum/count chain; balance totals are decimal sums.
    Scale: the 1-row threshold cross-joins as a broadcast below the
    filter; the anti-join's right side carries only recent orders'
    o_custkey (filter pushed to the scan); nation broadcasts; output
    is ≤ 25 rows."""
    cu = table(spark, "customer", sf_dir)
    thr = (
        cu.where(F.col("c_acctbal") > 0)
        .agg(
            (
                _dec_sum("c_acctbal").cast("double") / F.count(F.lit(1))
            ).alias("bal_thr")
        )
    )
    recent = (
        table(spark, "orders", sf_dir)
        .where(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    na = table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        cu.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("bal_thr"))
        .join(recent, cu["c_custkey"] == recent["o_custkey"], "left_anti")
        .join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            _dec_sum("c_acctbal").cast("double").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@q(
    "q155_ewma_lag_chain",
    """
    WITH lagged AS (
        SELECT event_id, user_id, value,
               LAG(value, 1) OVER w AS l1,
               LAG(value, 2) OVER w AS l2,
               LAG(value, 3) OVER w AS l3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           (value + 0.5*COALESCE(l1, 0) + 0.25*COALESCE(l2, 0)
                  + 0.125*COALESCE(l3, 0))
           / (1.0 + CASE WHEN l1 IS NULL THEN 0 ELSE 0.5   END
                  + CASE WHEN l2 IS NULL THEN 0 ELSE 0.25  END
                  + CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END)
               AS smoothed
    FROM lagged
    """,
)
def q155_ewma_lag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing via an explicit lag chain:
    per user, each reading smoothed against its three predecessors
    with α=1/2 geometric weights, normalized by the weight mass of
    the lags that exist (so the first readings of a user are
    smoothed over what IS there, not biased toward zero) — the
    metric-smoothing / trend-extraction primitive of monitoring and
    feature pipelines, expressed as a FIXED chain the engines agree
    on bit-for-bit. Exactness: the weights are exact binary
    fractions (2⁻¹, 2⁻², 2⁻³ — multiplication is an exponent shift,
    no rounding), the additions run in identical textual order, and
    the normalization is one IEEE division; unlike a windowed SUM,
    no combine-order freedom exists anywhere. Scale: one user_id
    hash exchange serves all three lags (same window spec), the same
    shuffle class as q133/q147; an unbounded-α EWMA (true recursive
    filter) needs applyInPandasWithState — this truncated form is
    the declarative 99%-of-the-mass answer (2⁻⁴ tail < 7%)."""
    ev = table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l1, l2, l3 = (F.lag("value", i).over(w) for i in (1, 2, 3))
    num = (
        F.col("value")
        + F.lit(0.5) * F.coalesce(l1, F.lit(0.0))
        + F.lit(0.25) * F.coalesce(l2, F.lit(0.0))
        + F.lit(0.125) * F.coalesce(l3, F.lit(0.0))
    )
    den = (
        F.lit(1.0)
        + F.when(l1.isNull(), F.lit(0.0)).otherwise(F.lit(0.5))
        + F.when(l2.isNull(), F.lit(0.0)).otherwise(F.lit(0.25))
        + F.when(l3.isNull(), F.lit(0.0)).otherwise(F.lit(0.125))
    )
    return ev.select(
        "event_id", "user_id", (num / den).alias("smoothed")
    )


@q(
    "q157_product_line_revenue",
    """
    SELECT n_name AS nation, (year(o_orderdate))::INT AS o_year,
           (SUM((l_extendedprice*(1-l_discount))::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    JOIN part     ON l_partkey  = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
)
def q157_product_line_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line measure: revenue from one product
    line (name-prefix LIKE over part) attributed to the supplying
    nation per order year — Q9's 6-way profit join reshaped to the
    fixture's columns (no partsupp table, so no supplycost term; the
    join topology and the LIKE-filtered part dimension are the
    shape). Scale: the LIKE prefix pushes to the part scan as a
    StringStartsWith filter (~1/8 of parts survive); part is
    SF-proportional so its join stays a key shuffle (AQE broadcasts
    when the filtered side measures small — at fixture scale it
    does); orders/supplier likewise; nation is genuinely tiny and
    broadcast explicitly. One final shuffle for the
    |nations|·|years|-group aggregate; revenue decimal-exact."""
    li = table(spark, "lineitem", sf_dir)
    pa = (
        table(spark, "part", sf_dir)
        .where(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    su = table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    na = table(spark, "nation", sf_dir).select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(pa, li["l_partkey"] == pa["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(su, li["l_suppkey"] == su["s_suppkey"])
        .join(F.broadcast(na), su["s_nationkey"] == na["n_nationkey"])
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


@q(
    "q158_priority_line_classes",
    """
    SELECT l_returnflag,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 0 ELSE 1 END)::BIGINT AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q158_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped priority split: lines shipped in one year,
    counted per return flag into high- vs low-priority classes — the
    split-one-scan-into-two-conditional-counts aggregate (Q12's
    CASE-pair over shipmode, reshaped to the fixture's returnflag /
    orderpriority columns, which lineitem lacks shipmode for).
    Scale: the year filter pushes to the lineitem scan; the
    orders join carries only (o_orderkey, o_orderpriority); both
    counts come from ONE pass (a second scan per class would double
    the cost); the aggregate partial-combines to |flags| rows.
    Integer-exact throughout."""
    li = table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "q159_supplier_part_breadth",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#2'
      AND p_type <> 'PROMO'
      AND p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q159_supplier_part_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier breadth: how many distinct suppliers
    ship each surviving (brand, type, size) part class, excluding a
    blacklisted supplier set — Q16's NOT-IN + COUNT DISTINCT
    grouping, with the fixture's observed (l_partkey, l_suppkey)
    pairs standing in for the absent partsupp table and negative
    account balance standing in for the comment-scan complaint
    filter (no s_comment column). Exclusion is an anti-join (the
    blacklist key is non-null by schema, so NOT IN ≡ ANTI); the
    blacklist is a filtered SF-proportional dim, so the anti-join
    stays a key shuffle that AQE demotes to broadcast when it
    measures small. The pair-distinct collapses lineitem once on
    (partkey, suppkey) BEFORE any join — the dedup-then-join order
    is the scale decision (joining first would carry every duplicate
    line through the part probe). Integer-exact."""
    pairs = (
        table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    pa = (
        table(spark, "part", sf_dir)
        .where(
            (F.col("p_brand") != "Brand#2")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, "supplier", sf_dir)
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(bad, pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(pa, F.col("l_partkey") == pa["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@q(
    "q160_excess_volume_suppliers",
    """
    WITH sp AS (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM((l_quantity)::DECIMAL(18,2)) > 50)
    SELECT s_suppkey, s_name, n_name AS nation
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM sp)
    ORDER BY s_suppkey
    """,
)
def q160_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped excess-volume suppliers: suppliers who moved
    more than a threshold quantity of any single product-line part
    within one year, reported with their nation — Q20's nested
    semi-join chain (name-LIKE part filter → per-(supplier, part)
    quantity aggregate → HAVING threshold → semi-join up to the
    supplier dim), reshaped to shipped quantity since the fixture
    has no partsupp availability. Exactness: the HAVING compares a
    DECIMAL quantity sum (a double sum's combine order could flip a
    boundary row cross-engine); output is id/name/nation only.
    Scale: both filters push to their scans; the aggregate
    partial-combines on (suppkey, partkey); the HAVING survivors
    project to a bare key set before the semi-join, so the supplier
    probe carries ids only; nation broadcasts."""
    li = table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    pa = (
        table(spark, "part", sf_dir)
        .where(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    keys = (
        li.join(pa, li["l_partkey"] == pa["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(_dec_sum("l_quantity", "decimal(18,2)").alias("__q"))
        .where(F.col("__q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    su = table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    na = table(spark, "nation", sf_dir).select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        su.join(keys, su["s_suppkey"] == keys["l_suppkey"], "left_semi")
        .join(F.broadcast(na), F.col("s_nationkey") == na["n_nationkey"])
        .select("s_suppkey", "s_name", "nation")
        .orderBy("s_suppkey")
    )


@q(
    "q161_linear_interpolation",
    """
    WITH base AS (
        SELECT event_id, user_id, ts, value,
               (event_type <> 'error') AS ok,
               LAST_VALUE(CASE WHEN event_type <> 'error'
                          AND value IS NOT NULL
                          THEN value END IGNORE NULLS) OVER wp AS vp,
               LAST_VALUE(CASE WHEN event_type <> 'error'
                          AND value IS NOT NULL
                          THEN epoch_us(ts) END IGNORE NULLS)
                   OVER wp AS tp,
               FIRST_VALUE(CASE WHEN event_type <> 'error'
                           AND value IS NOT NULL
                           THEN value END IGNORE NULLS) OVER wn AS vn,
               FIRST_VALUE(CASE WHEN event_type <> 'error'
                           AND value IS NOT NULL
                           THEN epoch_us(ts) END IGNORE NULLS)
                   OVER wn AS tn
        FROM events
        WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING),
               wn AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 FOLLOWING
                               AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           CASE WHEN ok THEN value
                WHEN vp IS NULL OR vn IS NULL THEN NULL
                WHEN tn = tp THEN vp
                ELSE vp + (vn - vp)
                     * ((epoch_us(ts) - tp)::DOUBLE
                        / (tn - tp)::DOUBLE)
           END AS value_interp
    FROM base
    """,
)
def q161_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time-series interpolation: each untrustworthy reading
    ('error' events, q147's gap definition) is replaced by the
    time-weighted blend of the user's nearest valid readings before
    and after — the gap-filling complement of q147's LOCF that
    metrics/sensor pipelines reach for when a step function distorts
    downstream rates. Leading/trailing gaps (no bracket on one side)
    stay NULL — extrapolation is a different, riskier contract.

    Exactness (the q155 fixed-chain discipline): the time fraction
    divides two exact BIGINT microsecond differences in ONE IEEE
    division, and the blend ``vp + (vn − vp) · frac`` runs in
    identical textual order in both engines — no combine-order
    freedom anywhere, so raw doubles hash-match. Equal-timestamp
    brackets (Δt = 0) take the previous value rather than dividing
    by zero. Scale: both IGNORE-NULLS windows (backward last,
    forward first) share the one (user_id → ts, event_id) exchange
    and sort — the q133/q147/q155 shuffle class; no joins, no
    self-union."""
    ev = table(spark, "events", sf_dir)
    order = [F.col("ts"), F.col("event_id")]
    wp = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    ok = F.col("event_type") != "error"
    # a bracket row must contribute value AND timestamp from the
    # SAME row: gating only on event_type would let a NULL-valued
    # non-error row donate its timestamp while the value comes from
    # an earlier row, skewing the blend's anchor
    bracket = ok & F.col("value").isNotNull()
    valid_val = F.when(bracket, F.col("value"))
    valid_us = F.when(bracket, F.unix_micros("ts"))
    vp = F.last(valid_val, ignorenulls=True).over(wp)
    tp = F.last(valid_us, ignorenulls=True).over(wp)
    vn = F.first(valid_val, ignorenulls=True).over(wn)
    tn = F.first(valid_us, ignorenulls=True).over(wn)
    frac = (F.unix_micros("ts") - tp).cast("double") / (tn - tp).cast(
        "double"
    )
    interp = (
        F.when(ok, F.col("value"))
        .when(vp.isNull() | vn.isNull(), F.lit(None).cast("double"))
        .when(tn == tp, vp)
        .otherwise(vp + (vn - vp) * frac)
    )
    return ev.select(
        "event_id", "user_id", interp.alias("value_interp")
    )


@q(
    "q164_user_journeys",
    """
    WITH firstk AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events) t
        WHERE rn <= 5),
    sigs AS (
        SELECT user_id,
               STRING_AGG(event_type, '>' ORDER BY ts, event_id)
                   AS journey
        FROM firstk GROUP BY user_id)
    SELECT journey, COUNT(*)::BIGINT AS n_users
    FROM sigs GROUP BY journey
    ORDER BY n_users DESC, journey
    LIMIT 20
    """,
)
def q164_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey signatures: each user's first five events
    (event-time order, event_id tie-break) concatenated into a path
    string, ranked by how many users share the path — the
    onboarding-funnel shape product analytics asks first, and the
    ORDERED ARRAY AGGREGATION family (collect_list is unordered by
    contract; determinism comes from sort_array over (ts, event_id,
    type) structs, the only portable way to an ordered agg in Spark)
    nothing else on the surface exercises. Exactness: the signature
    is string concatenation over a total order (ties broken by
    event_id) and the count is BIGINT — hash-exact vs DuckDB's
    ORDER BY STRING_AGG. Scale: ONE user_id exchange serves both the
    top-5 window and the per-user aggregate (same partitioning);
    signatures are ≤5 short tokens per user, so the final signature
    rollup partial-combines on strings bounded by |event_type|⁵
    regardless of corpus size; top-20 with a full tie-break."""
    ev = table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firstk = ev.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= 5
    )
    ordered = (
        firstk.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("ts", "event_id", "event_type")
                )
            ).alias("__steps")
        )
        .select(
            F.concat_ws(
                ">",
                F.transform(
                    F.col("__steps"), lambda s: s.getField("event_type")
                ),
            ).alias("journey")
        )
    )
    return (
        ordered.groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "journey")
        .limit(20)
    )


@q(
    "q165_robust_outlier_stats",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_type,
           ROUND(ANY_VALUE(d.med), 4) AS median_value,
           ROUND(ANY_VALUE(a.mad), 4) AS mad,
           (SUM(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END))::BIGINT
               AS n_outliers,
           COUNT(*)::BIGINT AS n
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def q165_robust_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped robust statistics: per event type, the median, the
    median absolute deviation (MAD — the robust scale estimator that
    a single corrupt reading cannot inflate, unlike q137's
    stddev-based z), and how many readings sit beyond 3·MAD — the
    outlier census a data-quality monitor publishes when the metric
    distribution has heavy tails. Exactness: both medians are the
    q71 linear-interpolation percentile (cross-engine-matched
    there); |x−median| and the 3·MAD comparison are single IEEE ops
    in identical order; counts BIGINT — hash-exact. Scale: every
    aggregate partial-combines and the per-type medians/MADs join
    back as |event_types|-row broadcasts, so the fact table never
    shuffles for a join; the deviation branch is consumed twice (MAD
    fit + census), so the plan reads the 2-column events projection
    four times — when the re-scan dominates (cold object store),
    persist the deviation frame or land it once. At 100 TB swap both
    percentile calls for approx_percentile (t-digest), the q71/q50
    escape hatch."""
    ev = table(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 4).alias("median_value"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@q(
    "q167_cusum_changepoint",
    """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*)::BIGINT AS c
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    tot AS (
        SELECT event_type, COUNT(*)::BIGINT AS n, SUM(c)::BIGINT AS s
        FROM daily GROUP BY 1),
    cus AS (
        SELECT d.event_type, d.d, t.n,
               (t.n * SUM(d.c) OVER (PARTITION BY d.event_type
                                     ORDER BY d.d
                                     ROWS UNBOUNDED PRECEDING)
                - (ROW_NUMBER() OVER (PARTITION BY d.event_type
                                      ORDER BY d.d)) * t.s)::BIGINT
                   AS ncusum
        FROM daily d JOIN tot t USING (event_type)),
    ranked AS (
        SELECT event_type, d, n, ncusum,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY abs(ncusum) DESC, d) AS rk
        FROM cus)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS change_day,
           ncusum AS n_scaled_cusum, n AS n_days
    FROM ranked WHERE rk = 1
    ORDER BY event_type
    """,
)
def q167_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (Page 1954, public): per event
    type, the day where the cumulative deviation of daily volume
    from its own mean peaks — the classic level-shift locator that
    complements q137's per-day |z| tripwire (a tripwire flags WHICH
    days are extreme; CUSUM locates WHERE the regime changed).
    Exactness: the mean is rational, so the running deviation is
    scaled by n (the q137 discipline) — n·Σ_{i≤k}c_i − k·S — and
    every quantity stays BIGINT: no division, no float anywhere;
    the argmax tie-breaks on earliest day. Scale: daily counts
    partial-combine to |types|·|days| rows before any window; the
    per-type totals are FULL-PARTITION windows over that bounded
    aggregate (a groupBy+join would plan a second events scan), so
    the cumulative sum, the totals, and the per-type argmax all
    share the one event_type exchange; raw events scan ONCE and
    never shuffle.

    Null contract (round-11 null adversary): NULL event_type is
    excluded in both engine and oracle — the engine's window
    formulation kept a null-type group that the oracle's
    JOIN USING (event_type) silently dropped; a change-point for an
    unlabeled stream is undefined anyway."""
    ev = table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wall = Window.partitionBy("event_type")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrow = Window.partitionBy("event_type").orderBy("d")
    n = F.count(F.lit(1)).over(wall)
    s = F.sum("c").over(wall)
    cus = daily.select(
        "event_type",
        "d",
        n.alias("n"),
        (
            n * F.sum("c").over(wcum) - F.row_number().over(wrow) * s
        )
        .cast("bigint")
        .alias("ncusum"),
    )
    wrank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("ncusum")).desc(), "d"
    )
    return (
        cus.withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("change_day"),
            F.col("ncusum").alias("n_scaled_cusum"),
            F.col("n").alias("n_days"),
        )
        .orderBy("event_type")
    )


def _daily_calendar(ev: DataFrame) -> DataFrame:
    """Zero-filled per-type daily event counts on a CALENDAR spine
    (each type's min..max date): (event_type, d, c) with c = 0 on
    days the type logged nothing. The shared base of every daily
    time-series statistic here (q169 ACF, q170 seasonality) — a
    series with silently missing days makes row-lag arithmetic and
    per-weekday denominators wrong in ways an observed-days-only
    oracle twin can't catch. Scale: the spine explodes from a
    |types|-row bounds aggregate, so it is dim-sized; the fact
    table collapses once and never re-shuffles.

    Null contract (round-11 null adversary): rows with a NULL
    event_type are EXCLUDED — a null key never survives the
    spine-to-counts equi-join, so the null group's series came back
    all-zero and q170's seasonal index divided by zero (ANSI crash);
    a time-series statistic over an unlabeled stream is undefined.
    The oracle twins carry the same IS NOT NULL."""
    obs = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spine = (
        obs.groupBy("event_type")
        .agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d"),
        )
    )
    return spine.join(obs, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
    )


@q(
    "q168_forecast_revenue_change",
    """
    SELECT (SUM((l_extendedprice * l_discount)::DECIMAL(28,6)))::DOUBLE
               AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q168_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecasting-revenue-change: the revenue that
    would have been gained by eliminating small discounts on
    low-quantity orders in one year — the canonical
    filter-everything-then-one-scalar shape, completing the
    implementable TPC-H surface (Q2/Q11 need the partsupp table the
    fixture lacks). Exactness: the product sums as DECIMAL and casts
    to double once; double-literal discount bounds compare
    identically in both engines. Scale: every predicate pushes to
    the parquet scan (shipdate range, discount band, quantity cap —
    all min/max-prunable), the aggregate partial-combines to one
    row, nothing shuffles but 1-row partials."""
    li = table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "q169_daily_autocorrelation",
    """
    WITH obs AS (
        SELECT event_type, ts::DATE AS d, COUNT(*)::BIGINT AS c
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                      INTERVAL 1 DAY))::DATE AS d
        FROM (SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
              FROM obs GROUP BY 1)),
    daily AS (
        SELECT s.event_type, s.d, COALESCE(c, 0)::BIGINT AS c
        FROM spine s LEFT JOIN obs USING (event_type, d)),
    lagged AS (
        SELECT event_type, lag, c AS x,
               LAG(c, lag) OVER (PARTITION BY event_type, lag
                                 ORDER BY d) AS y
        FROM daily
        CROSS JOIN (SELECT unnest(generate_series(1, 7))::INT AS lag) lags),
    m AS (
        SELECT event_type, lag,
               COUNT(*)::BIGINT AS n,
               SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
               SUM(x * x)::BIGINT AS sxx, SUM(y * y)::BIGINT AS syy,
               SUM(x * y)::BIGINT AS sxy
        FROM lagged WHERE y IS NOT NULL
        GROUP BY 1, 2)
    SELECT event_type, lag, n AS n_pairs,
           ROUND((n * sxy - sx * sy) /
                 (sqrt((n * sxx - sx * sx)::DOUBLE)
                  * sqrt((n * syy - sy * sy)::DOUBLE)), 6) AS acf
    FROM m WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    ORDER BY event_type, lag
    """,
)
def q169_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-volume series,
    lags 1-7 per event type — the periodicity probe run before
    picking a seasonal model (a weekly cycle shows as a lag-7 peak).
    The observed daily counts join onto a per-type CALENDAR spine
    (min..max date, zero-filled) before lagging, so LAG(c, k) is a
    true k-DAY shift — without the spine, one zero-event day would
    silently misalign every pair after it, and both engines would
    agree on the wrong answer (the q161 oracle-blind-spot class;
    flagged by review). Exactness: counts and all five moment sums
    are BIGINT, the Pearson finish is a fixed IEEE chain (two sqrt,
    one divide) on exact integers, rounded once — hash-exact.
    Scale: raw events collapse to |types|x|days| rows in one
    partial-combining aggregate BEFORE the spine join and 7x lag
    fan-out; the window partitions by (type, lag) over that tiny
    daily table; the fact table never shuffles."""
    ev = table(spark, "events", sf_dir)
    daily = _daily_calendar(ev)
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    fan = daily.crossJoin(F.broadcast(lags))
    w = Window.partitionBy("event_type", "lag").orderBy("d")
    # LAG with a column offset isn't supported — one lag expression
    # per k, selected by the fanned-out lag value
    y = F.when(F.lit(False), F.lit(None).cast("long"))
    for k in range(1, 8):
        y = y.when(F.col("lag") == k, F.lag("c", k).over(w))
    lagged = fan.select(
        "event_type", "lag", F.col("c").alias("x"), y.alias("y")
    ).where(F.col("y").isNotNull())
    m = lagged.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    dx = n * F.col("sxx") - sx * sx
    dy = n * F.col("syy") - sy * sy
    acf = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
    )
    return (
        m.where((dx > 0) & (dy > 0))
        .select(
            "event_type",
            "lag",
            n.alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


@q(
    "q170_dow_seasonality",
    """
    WITH obs AS (
        SELECT event_type, ts::DATE AS d, COUNT(*)::BIGINT AS c
        FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                      INTERVAL 1 DAY))::DATE AS d
        FROM (SELECT event_type, MIN(d) AS mn, MAX(d) AS mx
              FROM obs GROUP BY 1)),
    daily AS (
        SELECT s.event_type, s.d, COALESCE(c, 0)::BIGINT AS c
        FROM spine s LEFT JOIN obs USING (event_type, d)),
    dow AS (
        SELECT event_type, (isodow(d) - 1)::INT AS dow,
               COUNT(*)::BIGINT AS n_days, SUM(c)::BIGINT AS total
        FROM daily GROUP BY 1, 2)
    SELECT event_type, dow, n_days, total,
           ROUND((total * SUM(n_days) OVER (PARTITION BY event_type))::DOUBLE
                 / (n_days * SUM(total) OVER (PARTITION BY event_type))::DOUBLE,
                 6) AS seasonal_index
    FROM dow ORDER BY event_type, dow
    """,
)
def q170_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile: per (event type, weekday), the
    multiplicative seasonal index — mean daily volume on that
    weekday over the all-days mean (1.0 = flat; the classical-
    decomposition seasonal component for a weekly cycle, and the
    divisor a seasonally-adjusted monitor divides out before
    alerting). Weekday convention: 0=Monday (Spark ``weekday()`` ==
    DuckDB ``isodow()-1``). Daily counts come zero-filled from the
    calendar spine (``_daily_calendar``), so n_days counts CALENDAR
    weekdays — an observed-days-only denominator would inflate the
    index for weekdays the type mostly skips (review-flagged, the
    same blind-spot class as q169). Exactness: the index collapses
    to ONE IEEE division of two exact BIGINT products
    (total_dow * n_all) / (n_dow * total_all) — no mean-of-means
    double chain — rounded once. Scale: events collapse to the
    daily table in one pass; both window totals share the single
    |types|x7 exchange; the fact table never shuffles."""
    ev = table(spark, "events", sf_dir)
    daily = _daily_calendar(ev)
    dow = daily.groupBy(
        "event_type", F.expr("weekday(d)").cast("int").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("total"),
    )
    wall = Window.partitionBy("event_type")
    idx = (F.col("total") * F.sum("n_days").over(wall)).cast("double") / (
        F.col("n_days") * F.sum("total").over(wall)
    ).cast("double")
    return dow.select(
        "event_type",
        "dow",
        "n_days",
        "total",
        F.round(idx, 6).alias("seasonal_index"),
    ).orderBy("event_type", "dow")


@q(
    "q171_audience_intersect_all",
    """
    WITH paired AS (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT ALL
        SELECT user_id FROM events WHERE event_type = 'purchase')
    SELECT user_id, COUNT(*)::BIGINT AS paired_actions
    FROM paired GROUP BY user_id
    ORDER BY paired_actions DESC, user_id
    """,
)
def q171_audience_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set intersection (INTERSECT ALL): per user, the
    number of click events that pair one-for-one with purchase
    events — min(clicks, purchases) by multiset arithmetic, the
    matched-exposure count conversion analyses divide by. The bag
    complement of q146's EXCEPT ALL (together they tile the click
    bag: surplus + paired = clicks). Exercises ``intersectAll``
    (Spark plans a min-of-counts generate, not a join). The
    surviving bag re-aggregates so output order is deterministic."""
    ev = table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id")
    return (
        clicks.intersectAll(purchases)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("paired_actions"))
        .orderBy(F.desc("paired_actions"), "user_id")
    )


@q(
    "q175_kanon_census",
    """
    SELECT c_nationkey::INT AS nation, c_mktsegment AS segment,
           FLOOR(c_acctbal / 1000)::BIGINT AS bal_band,
           COUNT(*)::BIGINT AS class_size,
           (COUNT(*) < 5)::INT AS at_risk
    FROM customer
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q175_kanon_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over quasi-identifiers (Sweeney 2002):
    equivalence-class sizes for the (nation, market segment,
    account-balance band) projection of the customer table, flagging
    classes smaller than k=5 — the re-identification audit a
    training-data release runs before shipping records keyed by
    demographic-ish attributes (the row-level complement of q62's
    in-text PII redaction: PII can leak through joinable attribute
    combinations even with the text scrubbed). Exactness: the band
    is FLOOR on a double (deterministic), everything else integer.
    Scale: one partial-combining aggregate; class cardinality is
    bounded by |nations| x |segments| x |bands|, so the exchange is
    dim-sized regardless of fact row count."""
    cu = table(spark, "customer", sf_dir)
    return (
        cu.groupBy(
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "nation",
            "segment",
            "bal_band",
            "class_size",
            (F.col("class_size") < 5).cast("int").alias("at_risk"),
        )
        .orderBy("nation", "segment", "bal_band")
    )


@q(
    "q176_grouping_sets",
    """
    SELECT event_type, (isodow(ts::DATE) - 1)::INT AS dow,
           COUNT(*)::BIGINT AS n_events,
           (SUM(value::DECIMAL(28,6)))::DOUBLE AS total_value,
           GROUPING(event_type, (isodow(ts::DATE) - 1)::INT)::INT AS gid
    FROM events
    GROUP BY GROUPING SETS ((1, 2), (1), (2), ())
    ORDER BY gid, event_type, dow
    """,
)
def q176_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form CUBE/ROLLUP — q144,
    q46 — specialize): the (type x weekday), by-type, by-weekday and
    grand-total aggregates in ONE pass, with GROUPING_ID
    disambiguating real NULLs from subtotal rows — the multi-
    granularity report shape BI layers emit. Bitmask convention
    (verified identical in both engines): bit i set when grouping
    column i is aggregated away, so gid 0 = finest cell, 3 = grand
    total. Exactness: counts BIGINT, the value sum decimal-cast
    once. Scale: Spark plans one Expand (4x row multiply) + one
    partial-combining hash aggregate — no per-set re-scan; the
    exchange carries |types| x 7 x 4 aggregated rows."""
    ev = table(spark, "events", sf_dir)
    dow = F.expr("weekday(to_date(ts))").cast("int").alias("dow")
    return (
        ev.select("event_type", dow, "value")
        .groupingSets(
            [["event_type", "dow"], ["event_type"], ["dow"], []],
            "event_type",
            "dow",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value").cast("double").alias("total_value"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy("gid", "event_type", "dow")
    )


@q(
    "q177_ks_source_drift",
    """
    WITH pts AS (
        SELECT n_chars AS v,
               SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS ca,
               SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT AS cb
        FROM documents WHERE source IN ('src0', 'src1')
        GROUP BY n_chars),
    cum AS (
        SELECT SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
               SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2,
               SUM(ca) OVER ()::BIGINT AS n1,
               SUM(cb) OVER ()::BIGINT AS n2
        FROM pts)
    SELECT n1, n2,
           MAX(abs(f1 * n2 - f2 * n1))::BIGINT AS ks_num,
           ROUND(MAX(abs(f1 * n2 - f2 * n1))::DOUBLE / (n1 * n2)::DOUBLE, 6)
               AS ks_stat
    FROM cum
    GROUP BY n1, n2
    """,
)
def q177_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two
    sources' document-length distributions — the distribution-drift
    gate a curation pipeline runs when a new crawl snapshot lands
    (did src1's length profile shift vs src0's?), done EXACTLY
    rather than via binned histograms. sup|F1 - F2| evaluated at
    every distinct observed value via cumulative counts; the
    comparison is pure BIGINT cross-products (|f1*n2 - f2*n1|), so
    the supremum is integer-exact and the statistic is ONE IEEE
    division at the end. The finish is operators/drift.py:
    ks_from_merged — ONE kernel shared with the streaming drift
    monitor (streamed value-count partials vs a frozen reference),
    so batch and stream cannot de-synchronize. Scale: per-value
    counts partial-combine first — the corpus scans ONCE into the
    distinct-value pts table, and the sample sizes ride the SAME
    window pass as the cumulative counts (review-flagged: a
    separate aggregate subtree re-expanded pts and doubled the
    corpus scan); both windows are over pts — bounded by value
    cardinality, not corpus size; at 100 TB swap in the q72-style
    sketch-CDF twin if value cardinality itself explodes."""
    from ..operators.drift import ks_from_merged

    docs = table(spark, "documents", sf_dir)
    ab = docs.where(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"),
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("ca"),
        F.when(F.col("source") == "src1", 1).otherwise(0).alias("cb"),
    )
    pts = ab.groupBy("v").agg(
        F.sum("ca").alias("ca"), F.sum("cb").alias("cb")
    )
    return ks_from_merged(pts)


@q(
    "q182_psi_drift",
    """
    WITH ref AS (SELECT n_chars AS v, COUNT(*)::BIGINT AS c
                 FROM documents WHERE source = 'src0' GROUP BY 1),
    live AS (SELECT n_chars AS v, COUNT(*)::BIGINT AS c
             FROM documents WHERE source = 'src1' GROUP BY 1),
    refc AS (SELECT v, c,
                    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                    SUM(c) OVER () AS n1
             FROM ref),
    cuts AS (SELECT i, MIN(v) AS cut
             FROM refc CROSS JOIN
                  (SELECT unnest(generate_series(1, 9))::BIGINT AS i) s
             WHERE cum >= (i * n1 + 9) // 10
             GROUP BY i),
    rv AS (SELECT v, MAX(c) AS c,
                  (1 + SUM(CASE WHEN v > cut THEN 1 ELSE 0 END))::INT AS bin
           FROM ref CROSS JOIN cuts GROUP BY v),
    lv AS (SELECT v, MAX(c) AS c,
                  (1 + SUM(CASE WHEN v > cut THEN 1 ELSE 0 END))::INT AS bin
           FROM live CROSS JOIN cuts GROUP BY v),
    rbin AS (SELECT bin, SUM(c)::BIGINT AS n FROM rv GROUP BY bin),
    lbin AS (SELECT bin, SUM(c)::BIGINT AS n FROM lv GROUP BY bin),
    ab AS (SELECT b.bin, COALESCE(rbin.n, 0)::BIGINT AS ref_n,
                  COALESCE(lbin.n, 0)::BIGINT AS live_n
           FROM (SELECT unnest(generate_series(1, 10))::INT AS bin) b
           LEFT JOIN rbin USING (bin) LEFT JOIN lbin USING (bin)),
    tot AS (SELECT bin, ref_n, live_n,
                   SUM(ref_n) OVER () AS n1, SUM(live_n) OVER () AS n2
            FROM ab),
    t AS (SELECT bin, ref_n, live_n,
                 ((ref_n + 1)::DOUBLE / (n1 + 10)::DOUBLE
                  - (live_n + 1)::DOUBLE / (n2 + 10)::DOUBLE)
                 * (ROUND(ln(((ref_n + 1)::DOUBLE * (n2 + 10)::DOUBLE)
                            / ((live_n + 1)::DOUBLE * (n1 + 10)::DOUBLE))
                          * 100000)::BIGINT::DOUBLE / 100000.0) AS term
          FROM tot)
    SELECT bin, ref_n, live_n, ROUND(term, 6) AS term,
           ROUND(SUM(term) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING), 6)
               AS psi_cum
    FROM t ORDER BY bin
    """,
)
def q182_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two sources' length
    distributions (operators/drift.py:psi_from_counts) — the
    industry-standard binned drift score (<0.1 stable / 0.1-0.25
    watch / >0.25 shifted) that complements q177's exact KS: KS
    gives the supremum deviation, PSI localizes WHICH reference
    deciles gained or lost mass (the per-bin terms are the
    diagnosis). Bins are exact reference quantiles from integer
    rank arithmetic (cut_i = min v with cum >= ceil(i*n1/10) — no
    percentile interpolation to disagree across engines); add-1
    smoothing keeps empty bins finite; the per-bin ln ratio pins to
    integer 1e-5 units; the running PSI accumulates in bin order
    via a cumulative window so the float sum has ONE order.
    Output: one row per bin; the last psi_cum is the PSI. Scale:
    the corpus collapses ONCE into the merged (v, ca, cb) table
    (conditional counts — a value_counts call per side doubled the
    scan, review-flagged; the two-table psi_from_counts entry stays
    for the streaming ref-vs-partials case); all windows and joins
    downstream run over value-count / 10-row tables."""
    from ..operators.drift import psi_from_merged

    docs = table(spark, "documents", sf_dir)
    pts = (
        docs.where(F.col("source").isin("src0", "src1"))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("source") == "src0", 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("source") == "src1", 1).otherwise(0)
            ).alias("cb"),
        )
    )
    return psi_from_merged(pts, bins=10)


@q(
    "q185_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name AS nation
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
    best AS (
        SELECT l_partkey, MIN(unit_cost) AS best_cost
        FROM cost JOIN eu ON l_suppkey = s_suppkey
        GROUP BY l_partkey)
    SELECT s_acctbal, s_name, nation, p_partkey, p_type, unit_cost
    FROM cost
    JOIN eu ON cost.l_suppkey = eu.s_suppkey
    JOIN best ON cost.l_partkey = best.l_partkey
            AND cost.unit_cost = best.best_cost
    JOIN part ON cost.l_partkey = p_partkey
    WHERE p_size <= 25 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, nation, s_name, p_partkey
    LIMIT 100
    """,
)
def q185_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each qualifying
    part, the European supplier(s) offering it at the lowest unit
    cost, top-100 by account balance — Q2's signature correlated
    MIN subquery (WHERE cost = (SELECT MIN(cost) ... same part)),
    reshaped to observed lineitem pricing since the fixture has no
    partsupp: unit_cost := MIN(l_extendedprice) per (part,
    supplier). Completes the TPC-H join-shape family (Q1,Q3-Q22
    already landed); the correlated scalar decorrelates into a
    per-part window MIN over the ALREADY-AGGREGATED cost table —
    ONE lineitem scan where the classic aggregate-and-rejoin plan
    (the oracle SQL's shape) scans it twice. Exactness: MIN over
    doubles is combine-order free; ties on best cost return ALL
    witnesses in both engines (exactly Q2's semantics); the ORDER
    BY key set is total (acctbal, nation, name, partkey). Scale:
    the (part, supplier) cost table partial-combines map-side; the
    region-filtered supplier dim broadcasts; the window partitions
    on the same l_partkey the aggregate hashed on (no extra
    exchange); the p_size/p_type filter pushes to the part scan;
    LIMIT 100 is a top-k sort, not a global sort."""
    li = table(spark, "lineitem", sf_dir)
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("unit_cost")
    )
    na = table(spark, "nation", sf_dir)
    re = table(spark, "region", sf_dir).where(F.col("r_name") == "EUROPE")
    eu = (
        table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(
                na.join(re, na["n_regionkey"] == re["r_regionkey"])
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation")
        )
    )
    eu_cost = cost.join(
        F.broadcast(eu), cost["l_suppkey"] == eu["s_suppkey"]
    )
    # The correlated MIN decorrelates as a per-part window min over
    # the ALREADY-AGGREGATED (part, supplier, cost) table — one
    # lineitem scan total, where the aggregate-and-rejoin shape
    # (DuckDB's plan, and this oracle's SQL) scans it twice. The
    # window partitions on the same key the cost aggregate hashed
    # on, so no extra exchange; ties keep every witness row,
    # exactly Q2's semantics.
    wbest = Window.partitionBy("l_partkey")
    pa = (
        table(spark, "part", sf_dir)
        .where((F.col("p_size") <= 25) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    return (
        eu_cost.withColumn("__best", F.min("unit_cost").over(wbest))
        .where(F.col("unit_cost") == F.col("__best"))
        .join(F.broadcast(pa), F.col("l_partkey") == pa["p_partkey"])
        .select(
            "s_acctbal", "s_name", "nation", "p_partkey", "p_type", "unit_cost"
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@q(
    "q186_important_part_values",
    """
    WITH nval AS (
        SELECT l_partkey,
               SUM((l_extendedprice * (1 - l_discount))::DECIMAL(28,6))
                   AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey),
    tot AS (SELECT SUM(value) AS total FROM nval)
    SELECT l_partkey, ROUND(value, 2)::DOUBLE AS part_value
    FROM nval CROSS JOIN tot
    WHERE value > total * 0.001
    ORDER BY part_value DESC, l_partkey
    """,
)
def q186_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important stock identification: parts whose
    shipped value through one nation's suppliers exceeds a fixed
    fraction of that nation's total — Q11's HAVING-against-a-
    global-scalar shape (the one TPC-H pattern the q148-q160 family
    didn't cover), reshaped to lineitem revenue since the fixture
    has no partsupp (value := sum extendedprice*(1-discount)).
    Exactness: both the per-part values and the global total
    accumulate as DECIMAL(28,6) so combine order can't flip the
    0.001 boundary; the comparison is decimal*decimal; output
    rounds once for display. Scale: the nation's supplier keys
    broadcast into the lineitem scan (one nation = 1/N of
    suppliers); the per-part aggregate partial-combines on
    l_partkey; the global total is ONE extra reduce over the
    already-aggregated nval (part-cardinality rows, not lineitem
    rows) and broadcasts back as a 1-row cross join — the scalar
    never forces a second corpus scan."""
    li = table(spark, "lineitem", sf_dir)
    na = table(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_3")
    su = table(spark, "supplier", sf_dir).join(
        F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    # Materialize the per-part aggregate (part-cardinality rows)
    # before deriving both the global total and the filter from it:
    # without this, each consumer re-runs the lineitem scan — the
    # 100 TB table read twice for one query.
    nval = (
        li.join(F.broadcast(su), li["l_suppkey"] == su["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value"))
        .localCheckpoint()
    )
    tot = nval.agg(F.sum("value").alias("total"))
    return (
        nval.join(F.broadcast(tot), F.lit(True), "inner")
        .where(F.col("value") > F.col("total") * F.lit(0.001))
        .select(
            "l_partkey",
            F.round("value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )
