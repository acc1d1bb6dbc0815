"""Query registry: every graded operator as a (Spark plan, DuckDB oracle SQL) pair.

This is the correctness surface for SURVEY.md §2: the relational pass-through
surface (§2B — joins, aggregations, window functions, set ops, sorts/limits,
scalar functions), the ingestion-shaped queries (tumbling windows, cursor
folds re-expressed over the `events` table), and the LLM-data operators
(dedup, similarity search, text analysis).

Cross-engine determinism conventions (the whole point of this module):

- **Money/metric sums**: never sum raw doubles (accumulation order varies) —
  per-row ``round(x*100)`` / ``round(x*10000)`` to exact integers, sum as
  int64 (all sums << 2^53 even at sf100). Bit-identical in any engine, any
  partition order.
- **Ratios/averages**: division of two exact ints → IEEE-deterministic
  double, identical everywhere.
- **Hashes**: md5-derived (functions/hashing.py); never engine hash().
- **Top-k**: total deterministic order (value desc, unique key asc).
- **Column names**: identical on both sides (driver sorts by name + hashes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tamer_spark.functions.hashing import MERSENNE_P, minhash_coefficients
from tamer_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    TOKEN_PATTERN,
    doc_fingerprint_col,
    lang_id_col,
    text_stats_cols,
    token_count_col,
)
from tamer_spark.operators.asof import asof_join
from tamer_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_normalized,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from tamer_spark.operators.similarity import cosine_knn


@dataclass
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI/DuckDB SQL; None → rows-only check
    doc: str = ""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive: the driver runs these queries with ITS OWN session. The
    # DuckDB oracle reads parquet timestamps as naive/UTC, so Spark must
    # interpret them in UTC too or toPandas shifts wall times.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
        # default; read nanos as long and floor-divide to micros (exact —
        # integer division; the matching oracle CTE casts TIMESTAMP_NS →
        # TIMESTAMP, which also truncates).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# DuckDB views see events.ts as TIMESTAMP_NS; shadow the view with a
# micros-cast CTE so oracle SQL and Spark agree on the unit.
EVENTS_CTE = "events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events)"


def cents(col, scale: int = 100):
    """Exact integer money units: round(x*scale) as int64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


REGISTRY: dict[str, Query] = {}


def q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2B: hash agg, rollup/cube, distinct)
# ---------------------------------------------------------------------------

@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_cc,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*10000) AS BIGINT)) AS BIGINT) AS sum_charge_cc,
           COUNT(*) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary; map-side partial agg, one shuffle on 2 low-card keys.",
)
def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).alias("sum_qty_c"),
        F.sum(cents("l_extendedprice")).alias("sum_base_price_c"),
        F.sum(cents(disc, 10000)).alias("sum_disc_price_cc"),
        F.sum(cents(charge, 10000)).alias("sum_charge_cc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@q(
    "agg_rollup_orders",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_c
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def agg_rollup_orders(spark, sf):
    return (
        _t(spark, sf, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents("o_totalprice")).alias("sum_total_c"))
    )


@q(
    "agg_cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_lineitem(spark, sf):
    return (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(cents("l_quantity")).alias("sum_qty_c"))
    )


@q(
    "agg_distinct_customers",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct_customers(spark, sf):
    return (
        _t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (broadcast, multi-way, semi, anti, as-of, range)
# ---------------------------------------------------------------------------

@q(
    "q3_top_revenue",
    """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_cc
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cc DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: filter pushed to customer scan; customer side broadcasts; top-k via TakeOrdered.",
)
def q3_top_revenue(spark, sf):
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_cc"))
        .orderBy(F.col("revenue_cc").desc(), "l_orderkey")
        .limit(10)
    )


@q(
    "q5_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_cc
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style star join: all dims broadcast; single shuffle for the agg.",
)
def q5_region_revenue(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)).alias("revenue_cc"))
    )


@q(
    "join_semi_active_customers",
    """
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def join_semi_active_customers(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@q(
    "join_anti_inactive_customers",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti_inactive_customers(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "join_broadcast_enrich",
    """
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_total_c
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_broadcast_enrich(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum(cents("o_totalprice")).alias("sum_total_c"))
    )


@q(
    "join_range_price_band",
    """
    WITH bands AS (SELECT i AS band, i*10000.0 AS lo, (i+1)*10000.0 AS hi FROM range(0,10) t(i))
    SELECT band, COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c
    FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY band
    """,
    doc="Range join against a broadcast band table (BroadcastNestedLoop on 10 rows — fine).",
)
def join_range_price_band(spark, sf):
    li = _t(spark, sf, "lineitem")
    bands = spark.range(0, 10).select(
        F.col("id").alias("band"),
        (F.col("id") * 10000.0).alias("lo"),
        ((F.col("id") + 1) * 10000.0).alias("hi"),
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(cents("l_extendedprice")).alias("sum_price_c"))
    )


@q(
    "asof_join_events_orders",
    f"""
    WITH {EVENTS_CTE}, o AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1
    )
    SELECT e.event_id, o.o_orderkey AS matched_orderkey,
           CAST(round(o.o_totalprice*100) AS BIGINT) AS matched_total_c
    FROM events e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="Point-in-time join: latest order at-or-before each event, per user. Spark side uses the union-sort-window pattern (operators/asof.py); DuckDB has native ASOF JOIN.",
)
def asof_join_events_orders(spark, sf):
    e = _t(spark, sf, "events")
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o1 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    # asof_join needs the same key name on both sides; rename right key first
    joined = asof_join(
        e.select("event_id", F.col("user_id").alias("k"), "ts"),
        o1.select(F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey", "o_totalprice"),
        on="k",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        F.col("o_orderkey").alias("matched_orderkey"),
        cents("o_totalprice").alias("matched_total_c"),
    )


# ---------------------------------------------------------------------------
# Window functions, sorts/limits, set ops
# ---------------------------------------------------------------------------

@q(
    "window_topk_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, total_c, rank FROM (
      SELECT o_custkey, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_c,
             row_number() OVER (PARTITION BY o_custkey ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rank
      FROM orders) WHERE rank <= 3
    """,
)
def window_topk_orders_per_customer(spark, sf):
    o = _t(spark, sf, "orders").withColumn("total_c", cents("o_totalprice"))
    w = Window.partitionBy("o_custkey").orderBy(F.col("total_c").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "total_c", "rank")
    )


@q(
    "window_running_user_value",
    f"""
    WITH {EVENTS_CTE}
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_value_c
    FROM events
    """,
)
def window_running_user_value(spark, sf):
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.sum(cents("value")).over(w).alias("running_value_c")
    )


@q(
    "window_lag_lead_gap",
    f"""
    WITH {EVENTS_CTE}
    SELECT event_id, user_id,
           date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
    FROM events
    """,
)
def window_lag_lead_gap(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


@q(
    "sort_limit_top_parts",
    """
    SELECT p_partkey, p_name, CAST(round(p_retailprice*100) AS BIGINT) AS price_c
    FROM part ORDER BY price_c DESC, p_partkey LIMIT 20
    """,
)
def sort_limit_top_parts(spark, sf):
    p = _t(spark, sf, "part").withColumn("price_c", cents("p_retailprice"))
    return p.orderBy(F.col("price_c").desc(), "p_partkey").select("p_partkey", "p_name", "price_c").limit(20)


@q(
    "set_union_nations",
    "SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier",
)
def set_union_nations(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@q(
    "set_intersect_custkeys",
    "SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders",
)
def set_intersect_custkeys(spark, sf):
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.intersect(o)


@q(
    "set_except_custkeys",
    "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders",
)
def set_except_custkeys(spark, sf):
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


# ---------------------------------------------------------------------------
# Scalar functions (string/date/math/json)
# ---------------------------------------------------------------------------

@q(
    "scalar_string_math_part",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           abs(p_size - 25) AS size_dist,
           p_size % 7 AS size_mod,
           CAST(round(p_retailprice*90) AS BIGINT) AS discounted_c
    FROM part
    """,
)
def scalar_string_math_part(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
        cents(F.col("p_retailprice") * 0.9).alias("discounted_c"),
    )


@q(
    "scalar_date_orders",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
           CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS o_day,
           CAST(EXTRACT(hour FROM o_orderdate) AS INTEGER) AS o_hour,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS year_month
    FROM orders
    """,
)
def scalar_date_orders(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.hour("o_orderdate").alias("o_hour"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@q(
    "json_extract_events",
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("k").alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# Ingestion-shaped queries (reference semantics over the events table)
# ---------------------------------------------------------------------------

@q(
    "ingest_tumbling_events",
    f"""
    WITH {EVENTS_CTE}
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling event-time window aggregation — the batch analog of the reference's Window state (db/DbSetup.scala:99-118).",
)
def ingest_tumbling_events(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents("value")).alias("sum_value_c"))
    )


@q(
    "ingest_cursor_max_ts",
    f"""
    WITH {EVENTS_CTE}
    SELECT user_id, max(ts) AS max_ts, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    doc="Cursor fold: max-timestamp per key — the reference's window-advance rule (DbSetup.scala:109-117 uses max timestamp of the batch).",
)
def ingest_cursor_max_ts(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n_events"))


@q(
    "sessionize_events",
    f"""
    WITH {EVENTS_CTE}, gaps AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30 min): the batch analog of session_window in Structured Streaming.",
)
def sessionize_events(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wsum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(cents("value")).alias("sum_value_c"),
        )
    )


# ---------------------------------------------------------------------------
# LLM-data operators: dedup / text analysis / similarity (north star)
# ---------------------------------------------------------------------------

@q(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_q(spark, sf):
    return dedup_exact(_t(spark, sf, "documents"))


@q(
    "dedup_exact_normalized",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS dup_count
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_normalized_q(spark, sf):
    return dedup_exact_normalized(_t(spark, sf, "documents"))


def _stats_oracle() -> str:
    stop_terms = " + ".join(
        f"len(regexp_extract_all(' ' || text || ' ', '[^A-Za-z]{w}[^A-Za-z]'))" for w in STOPWORDS
    )
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_words,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]')) AS BIGINT) AS n_punct,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / greatest(length(text), 1) AS digit_ratio,
           CAST(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]')) AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
           CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE) / greatest(length(text), 1) AS space_ratio,
           CAST({stop_terms} AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END, 1) AS stopword_ratio,
           CAST(length(text) AS DOUBLE)
             / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END, 1) AS avg_word_len
    FROM documents
    """


@q("text_stats", _stats_oracle(), doc="Quality-score features; codegen'd map-only pass.")
def text_stats_q(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", *text_stats_cols(F.col("text")))


@q(
    "token_count",
    f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens FROM documents",
)
def token_count_q(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", token_count_col(F.col("text")).cast("long").alias("n_tokens"))


def _lang_oracle() -> str:
    score_exprs = {
        lang: " + ".join(
            f"len(regexp_extract_all(' ' || text || ' ', '[^A-Za-z]{w}[^A-Za-z]'))" for w in ws
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    }
    scores_sql = ", ".join(f"({e}) AS s_{lang}" for lang, e in score_exprs.items())
    greatest_sql = "greatest(" + ", ".join(f"s_{lang}" for lang in score_exprs) + ")"
    case_branches = " ".join(
        f"WHEN g > 0 AND s_{lang} = g THEN '{lang}'" for lang in sorted(score_exprs)
    )
    return f"""
    WITH scored AS (SELECT doc_id, {scores_sql} FROM documents),
         g AS (SELECT *, {greatest_sql} AS g FROM scored)
    SELECT doc_id, CASE {case_branches} ELSE 'und' END AS lang_pred FROM g
    """


@q("lang_id", _lang_oracle(), doc="Marker-word language ID heuristic; ties → lexicographically first language.")
def lang_id_q(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", lang_id_col(F.col("text")).alias("lang_pred"))


@q(
    "doc_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split_regex(trim(text), '\\s+'),
                              w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 1000000007)),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", doc_fingerprint_col(F.col("text")))


def _knn_oracle() -> str:
    return """
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS cv
               FROM embeddings),
         s AS (SELECT query_id, neighbor_id,
                      list_dot_product(qv, cv) / sqrt(list_dot_product(qv, qv) * list_dot_product(cv, cv)) AS cos_raw
               FROM q, c WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM s) WHERE rank <= 5
    """


@q(
    "similarity_knn",
    _knn_oracle(),
    doc="Exact cosine top-5 for query vectors (vec_id<10); quantized-int dot products → deterministic. Broadcast queries × streamed corpus.",
)
def similarity_knn_q(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return cosine_knn(emb, emb.filter(F.col("vec_id") < 10), k=5)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: query.spark for name, query in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: query.oracle for name, query in REGISTRY.items() if query.oracle is not None}


# ---------------------------------------------------------------------------
# Near-dup dedup + LSH similarity (SQL oracles generated from shared constants)
# ---------------------------------------------------------------------------

_P = MERSENNE_P
_K, _BANDS, _N, _MAX_BUCKET = 16, 4, 3, 1000
_COEFFS = minhash_coefficients(_K, seed=42)


def _shingle_ctes(n: int = _N) -> str:
    shingle_expr = " || ' ' || ".join(f"w[i+{j+1}]" for j in range(n))
    return f"""
    norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
    ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    sh AS (SELECT doc_id,
        CASE WHEN len(w) - {n - 1} <= 0 THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(range(len(w) - {n - 1}), i -> {shingle_expr}))
        END AS shingles FROM ws)
    """


def _minhash_sig_ctes() -> str:
    from tamer_spark.operators.dedup import SHINGLE_BASE as _B

    n = _N
    combine = " + ".join(f"h[i+{j + 1}] * {_B ** (n - 1 - j)}" for j in range(n))
    mins = ", ".join(
        f"list_min(list_transform(sh, x -> ({a}*x+{b}) % {_P}))" for a, b in _COEFFS
    )
    return f"""
    norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
    ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    hw AS (SELECT doc_id, list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {_P}) AS h FROM ws),
    shl AS (SELECT doc_id,
        list_distinct(CASE WHEN len(h) - {n - 1} <= 0
             THEN [list_reduce(list_prepend(CAST(0 AS BIGINT), h), (acc, x) -> (acc * {_B} + x) % {_P})]
             ELSE list_transform(range(len(h) - {n - 1}), i -> ({combine}) % {_P})
        END) AS sh FROM hw),
    sig AS (SELECT doc_id, [{mins}] AS mh FROM shl)
    """


@q(
    "minhash_signatures",
    f"""
    WITH {_minhash_sig_ctes()}
    SELECT doc_id, i AS hash_index, mh[i+1] AS minhash FROM sig, range({_K}) t(i)
    """,
    doc="Per-doc MinHash signature, exploded to (doc, hash_index, value). Map-only pass (row-local higher-order fns, zero shuffles).",
)
def minhash_signatures_q(spark, sf):
    sigs = minhash_signatures(_t(spark, sf, "documents"), k=_K, n=_N, seed=42)
    return sigs.select(
        "doc_id",
        F.posexplode("signature").alias("hash_index", "minhash"),
    ).select(F.col("doc_id"), F.col("hash_index").cast("long"), F.col("minhash"))


def _lsh_oracle() -> str:
    r = _K // _BANDS
    return f"""
    WITH {_minhash_sig_ctes()},
    banded AS (
      SELECT doc_id, b AS band_id,
             array_to_string(list_transform(mh[b*{r}+1:b*{r}+{r}], x -> CAST(x AS VARCHAR)), '-') AS band_sig
      FROM sig, range({_BANDS}) t(b)
    ),
    ok_buckets AS (
      SELECT band_id, band_sig FROM banded GROUP BY band_id, band_sig HAVING count(*) <= {_MAX_BUCKET}
    ),
    bb AS (SELECT banded.* FROM banded JOIN ok_buckets USING (band_id, band_sig))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS matching_bands
    FROM bb a JOIN bb b ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """


@q(
    "dedup_minhash_lsh",
    _lsh_oracle(),
    doc="Banded MinHash LSH candidate pairs; bucket join shuffles (band, sig) only — never the cross product; oversized buckets dropped (skew guard).",
)
def dedup_minhash_lsh_q(spark, sf):
    return minhash_lsh_pairs(
        _t(spark, sf, "documents"), k=_K, bands=_BANDS, n=_N, seed=42, max_bucket=_MAX_BUCKET
    )


def _jaccard_oracle(threshold_num: int, threshold_den: int) -> str:
    return f"""
    WITH {_shingle_ctes()},
    expl AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM expl a JOIN expl b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
    SELECT doc_a, doc_b, inter,
           sa.n_sh + sb.n_sh - inter AS union_sz,
           CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) AS jaccard
    FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * {threshold_den} >= {threshold_num} * (sa.n_sh + sb.n_sh - inter)
    """


@q(
    "dedup_ngram_jaccard",
    _jaccard_oracle(1, 20),
    doc="Exact 3-gram Jaccard >= 0.05 pairs via shingle equi-join (intended post-LSH verification stage; integer cross-multiplied threshold).",
)
def dedup_ngram_jaccard_q(spark, sf):
    return ngram_jaccard_pairs(_t(spark, sf, "documents"), n=_N, threshold=1 / 20)


def _simhash_oracle(bits: int = 32) -> str:
    terms = " + ".join(
        f"CASE WHEN list_sum(list_transform(h, x -> CASE WHEN (x & {1 << i}) > 0 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(bits)
    )
    return f"""
    WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
    ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    hw AS (SELECT doc_id, list_transform(w, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h FROM ws)
    SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM hw
    """


@q(
    "dedup_simhash",
    _simhash_oracle(),
    doc="32-bit SimHash signatures (bit-majority over word hashes); map-only; near-dups then group by signature / Hamming-ball probes.",
)
def dedup_simhash_q(spark, sf):
    from tamer_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_t(spark, sf, "documents"), bits=32)


def _lsh_knn_oracle(planes: int = 8, dim: int = 64, seed: int = 42, k: int = 5) -> str:
    import hashlib as _hl

    def bucket_expr(v: str) -> str:
        terms = []
        for p in range(planes):
            coeff = ", ".join(
                ("1.0" if _hl.sha256(f"lsh-{seed}-{p}-{i}".encode()).digest()[0] % 2 else "-1.0")
                for i in range(dim)
            )
            terms.append(
                f"CASE WHEN list_dot_product({v}, [{coeff}]) > 0 THEN {1 << p} ELSE 0 END"
            )
        return " + ".join(terms)

    return f"""
    WITH q AS (SELECT vec_id AS query_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id,
                      list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS cv
               FROM embeddings),
         qb AS (SELECT query_id, qv, ({bucket_expr('qv')}) AS bucket FROM q),
         cb AS (SELECT neighbor_id, cv, ({bucket_expr('cv')}) AS bucket FROM c),
         s AS (SELECT query_id, neighbor_id,
                      list_dot_product(qv, cv) / sqrt(list_dot_product(qv, qv) * list_dot_product(cv, cv)) AS cos_raw
               FROM qb JOIN cb USING (bucket) WHERE query_id <> neighbor_id)
    SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM s) WHERE rank <= {k}
    """


@q(
    "similarity_knn_lsh",
    _lsh_knn_oracle(),
    doc="ANN top-5 via random-hyperplane LSH buckets (single-probe); bucket equi-join replaces the cross product — the 100 TB scale path.",
)
def similarity_knn_lsh_q(spark, sf):
    from tamer_spark.operators.similarity import cosine_knn_lsh

    emb = _t(spark, sf, "embeddings")
    return cosine_knn_lsh(emb, emb.filter(F.col("vec_id") < 10), k=5, planes=8, dim=64)


@q(
    "multimodal_binary_stats",
    "SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha256_hex FROM documents",
    doc="Arrow-batched mapInPandas over binary payloads (byte length + sha256) — the multimodal decode plumbing with a hash in place of a codec.",
)
def multimodal_binary_stats_q(spark, sf):
    from tamer_spark.operators.multimodal import binary_stats

    d = _t(spark, sf, "documents").select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binary_stats(d, "payload", "doc_id")


# ---------------------------------------------------------------------------
# Additional relational coverage: pivot, percentiles, ntile, arg_min,
# grouping sets, ordered string agg, re-ingestion dedup
# ---------------------------------------------------------------------------

@q(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot: one shuffle, fixed output columns (explicit value list — never pivot on unbounded cardinality at scale).",
)
def pivot_status_by_priority(spark, sf):
    o = _t(spark, sf, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s}") for s in ("F", "O", "P")],
    )


@q(
    "percentile_order_value",
    """
    SELECT o_orderstatus,
           quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25) AS p25_c,
           quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5)  AS p50_c,
           quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75) AS p75_c
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact linear-interpolated percentiles over integer cents (Spark percentile == DuckDB quantile_cont, both R-7).",
)
def percentile_order_value(spark, sf):
    o = _t(spark, sf, "orders").withColumn("total_c", cents("o_totalprice"))
    return o.groupBy("o_orderstatus").agg(
        F.percentile("total_c", 0.25).alias("p25_c"),
        F.percentile("total_c", 0.5).alias("p50_c"),
        F.percentile("total_c", 0.75).alias("p75_c"),
    )


@q(
    "ntile_customer_value",
    """
    SELECT c_custkey, ntile(4) OVER (ORDER BY CAST(round(c_acctbal*100) AS BIGINT) DESC, c_custkey) AS value_quartile
    FROM customer
    """,
)
def ntile_customer_value(spark, sf):
    c = _t(spark, sf, "customer").withColumn("bal_c", cents("c_acctbal"))
    w = Window.orderBy(F.col("bal_c").desc(), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).cast("long").alias("value_quartile"))


@q(
    "argmin_first_event",
    f"""
    WITH {EVENTS_CTE}
    SELECT user_id, arg_min(event_type, event_id) AS first_event_type,
           CAST(min(event_id) AS BIGINT) AS first_event_id
    FROM events GROUP BY user_id
    """,
    doc="min_by/arg_min on a unique key — deterministic 'first row per key' without a window sort.",
)
def argmin_first_event(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.min("event_id").alias("first_event_id"),
    )


@q(
    "grouping_sets_events",
    f"""
    WITH {EVENTS_CTE}
    SELECT user_id, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY GROUPING SETS ((user_id), (event_type), ())
    """,
)
def grouping_sets_events(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupingSets(
        [["user_id"], ["event_type"], []], "user_id", "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(cents("value")).alias("sum_value_c"))


@q(
    "agg_ordered_string_concat",
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="Order-insensitive collect: sort inside the agg (array_sort ∘ collect_list) — deterministic without a global sort.",
)
def agg_ordered_string_concat(spark, sf):
    n = _t(spark, sf, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@q(
    "reingest_dedup",
    f"""
    WITH {EVENTS_CTE}, doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events)
    SELECT event_type, COUNT(*) AS n FROM (SELECT DISTINCT * FROM doubled) GROUP BY event_type
    """,
    doc="Re-ingestion dedup (reference periodic re-scan #23 re-ingests by design): dropDuplicates collapses the doubled input exactly.",
)
def reingest_dedup(spark, sf):
    e = _t(spark, sf, "events")
    return e.unionAll(e).dropDuplicates().groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Curation pipeline compositions
# ---------------------------------------------------------------------------

@q(
    "quality_filter_docs",
    f"""
    WITH stats AS ({_stats_oracle()})
    SELECT doc_id, n_words, avg_word_len, stopword_ratio
    FROM stats
    WHERE n_words >= 30 AND avg_word_len >= 3.0 AND punct_ratio < 0.1
    """,
    doc="Quality-gate filter composing text_stats — the standard pretraining curation shape (filter on cheap map-side features before expensive stages).",
)
def quality_filter_docs(spark, sf):
    d = _t(spark, sf, "documents")
    stats = d.select("doc_id", *text_stats_cols(F.col("text")))
    return stats.filter(
        (F.col("n_words") >= 30) & (F.col("avg_word_len") >= 3.0) & (F.col("punct_ratio") < 0.1)
    ).select("doc_id", "n_words", "avg_word_len", "stopword_ratio")


@q(
    "embedding_norms",
    """
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(list_dot_product(list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)),
                                 list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)))) AS l2_norm_q
    FROM embeddings
    """,
)
def embedding_norms(spark, sf):
    from tamer_spark.operators.similarity import quantize_embedding

    emb = _t(spark, sf, "embeddings")
    qv = quantize_embedding(F.col("embedding"))
    dot = F.aggregate(F.zip_with(qv, qv, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v)
    return emb.select(
        "vec_id", "label", F.size("embedding").cast("long").alias("dim"), F.sqrt(dot).alias("l2_norm_q")
    )


def _embedding_neardup_oracle(planes: int = 8, dim: int = 64, seed: int = 42) -> str:
    import hashlib as _hl

    def bucket_expr(v: str) -> str:
        terms = []
        for p in range(planes):
            coeff = ", ".join(
                ("1.0" if _hl.sha256(f"lsh-{seed}-{p}-{i}".encode()).digest()[0] % 2 else "-1.0")
                for i in range(dim)
            )
            terms.append(f"CASE WHEN list_dot_product({v}, [{coeff}]) > 0 THEN {1 << p} ELSE 0 END")
        return " + ".join(terms)

    return f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS v
               FROM embeddings),
         b AS (SELECT vec_id, v, ({bucket_expr('v')}) AS bucket FROM e)
    SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b,
           round(list_dot_product(a.v, bb.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(bb.v, bb.v)), 6) AS cosine
    FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
    WHERE list_dot_product(a.v, bb.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(bb.v, bb.v)) >= 0.3
    """


@q(
    "dedup_embedding_cosine",
    _embedding_neardup_oracle(),
    doc="Embedding-cosine near-dup pairs (threshold 0.3 — calibrated to the synthetic random embeddings; production would use ~0.9) within LSH buckets — semantic dedup at corpus scale without the O(n²) cross join.",
)
def dedup_embedding_cosine(spark, sf):
    from tamer_spark.operators.similarity import lsh_bucket_from_quantized, quantize_embedding, _dot

    emb = _t(spark, sf, "embeddings")
    b = emb.select(
        "vec_id", quantize_embedding(F.col("embedding")).alias("v")
    ).select("vec_id", "v", lsh_bucket_from_quantized(F.col("v"), 8, 64).alias("bucket"))
    a, bb = b.alias("a"), b.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / F.sqrt(
        _dot(F.col("a.v"), F.col("a.v")) * _dot(F.col("b.v"), F.col("b.v"))
    )
    return (
        a.join(bb, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.3)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cosine_raw", 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Text-pipeline curation ops: PII scrub, vocabulary, bigrams, TF-IDF
# ---------------------------------------------------------------------------

_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "\\+1-555-[0-9]{4}"


@q(
    "pii_scrub",
    f"""
    WITH derived AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                  THEN ' contact me at user' || doc_id || '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_PAT}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_PAT}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_PAT}', '<EMAIL>', 'g'), '{_PHONE_PAT}', '<PHONE>', 'g')) AS scrubbed_hash
    FROM derived
    """,
    doc="PII detection + redaction (emails/phones planted deterministically on 1-in-7 docs so the scrub is actually exercised); map-only codegen pass.",
)
def pii_scrub(spark, sf):
    d = _t(spark, sf, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact me at user"), F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_PAT, "<EMAIL>"), _PHONE_PAT, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(planted, F.lit(_EMAIL_PAT), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(planted, F.lit(_PHONE_PAT), 0)).cast("long").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_hash"),
    )


@q(
    "vocab_top_words",
    """
    WITH norm AS (SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
         w AS (SELECT unnest(string_split(t, ' ')) AS word FROM norm)
    SELECT word, COUNT(*) AS n FROM w WHERE length(word) > 0
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
    doc="Corpus vocabulary head: explode → count → top-k; partial agg makes the shuffle proportional to vocabulary, not corpus.",
)
def vocab_top_words(spark, sf):
    from tamer_spark.operators.dedup import normalize_text

    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@q(
    "bigram_top",
    """
    WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
         ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
         bg AS (SELECT unnest(list_transform(list_zip(w, w[2:]),
                    p -> CASE WHEN p[2] IS NULL THEN NULL
                         ELSE p[1] || ' ' || p[2] END)) AS bigram FROM ws)
    SELECT bigram, COUNT(*) AS n FROM bg WHERE bigram IS NOT NULL
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
    doc="Top bigrams via posexplode + window lead (linear; row-local n-gram arrays hit the Catalyst inlining trap documented in operators/dedup.py).",
)
def bigram_top(spark, sf):
    from tamer_spark.operators.dedup import normalize_text

    d = _t(spark, sf, "documents")
    wp = d.select(
        "doc_id", F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = wp.select(F.concat_ws(" ", F.col("word"), F.lead("word").over(w)).alias("bigram"), F.lead("word").over(w).alias("nxt"))
    return (
        bg.filter(F.col("nxt").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@q(
    "tfidf_top_terms",
    """
    WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
         w AS (SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM norm),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
         df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.word,
                  round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
           FROM tf JOIN df USING (word) CROSS JOIN n)
    SELECT doc_id, word, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rank FROM scored)
    WHERE rank <= 3
    """,
    doc="TF-IDF with top-3 terms per doc. df table is vocabulary-sized → broadcast joins back to tf; ranked on ROUNDED score so the ln() ulp gap between libm implementations cannot flip order.",
)
def tfidf_top_terms(spark, sf):
    from tamer_spark.operators.dedup import normalize_text

    d = _t(spark, sf, "documents")
    n_docs = d.count()
    w = d.select("doc_id", F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "word").select(
        "doc_id",
        "word",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
    )
    win = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "word", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


@q(
    "stopword_removal",
    f"""
    WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_filter(string_split(t, ' '),
               w -> NOT list_contains({STOPWORDS!r}, w)), ' ')) AS cleaned_hash,
           CAST(len(list_filter(string_split(t, ' '),
               w -> NOT list_contains({STOPWORDS!r}, w))) AS BIGINT) AS n_kept
    FROM norm
    """,
    doc="Stopword removal (filter + rejoin, row-local higher-order fns); output fingerprinted for the gate.",
)
def stopword_removal(spark, sf):
    from tamer_spark.operators.dedup import normalize_text

    d = _t(spark, sf, "documents")
    ws = F.split(normalize_text(F.col("text")), " ")
    kept = F.filter(ws, lambda w: ~w.isin(*STOPWORDS))
    return d.select(
        "doc_id",
        F.md5(F.array_join(kept, " ")).alias("cleaned_hash"),
        F.size(kept).cast("long").alias("n_kept"),
    )


@q(
    "approx_distinct_users",
    None,  # HLL sketches differ across engines — rows-only check by design
    doc="approx_count_distinct (HyperLogLog++) — sketch estimates are engine-specific, so no SQL oracle; surface coverage for approximate aggregates.",
)
def approx_distinct_users(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


@q(
    "chunk_documents",
    """
    WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents),
         ws AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
         ch AS (SELECT doc_id,
                       unnest(list_transform(range(CAST(ceil(len(w) / 50.0) AS BIGINT)),
                              i -> {'chunk_id': i, 'chunk': array_to_string(w[CAST(i*50+1 AS BIGINT):CAST(i*50+50 AS BIGINT)], ' ')})) AS c
                FROM ws)
    SELECT doc_id, CAST(c.chunk_id AS BIGINT) AS chunk_id, c.chunk AS chunk FROM ch
    """,
    doc="Context-window chunking (50-word budget) via JVM array slicing + posexplode; UDTF twin tested equivalent in tests/test_bucketing_chunking.py.",
)
def chunk_documents(spark, sf):
    from tamer_spark.functions.chunking import chunk_text_expr

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", F.posexplode(chunk_text_expr(F.col("text"), 50)).alias("chunk_id", "chunk")
    ).select("doc_id", F.col("chunk_id").cast("long").alias("chunk_id"), "chunk")


@q(
    "window_moving_sum",
    f"""
    WITH {EVENTS_CTE}
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_sum_c,
           CAST(first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS first_event,
           CAST(last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS last_event
    FROM events
    """,
    doc="Bounded window frames (3-row moving sum) + first/last_value over a total order.",
)
def window_moving_sum(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents("value")).over(w.rowsBetween(-2, 0)).alias("moving_sum_c"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("last_event"),
    )


@q(
    "join_salted_events_customers",
    f"""
    WITH {EVENTS_CTE}
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Skew-hardened join: large side salted by row fingerprint, small side replicated salt-ways — identical results to the plain join the oracle runs; physical distribution only.",
)
def join_salted_events_customers(spark, sf):
    from tamer_spark.operators.skew import salted_join

    e = _t(spark, sf, "events").withColumnRenamed("user_id", "c_custkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(e, c, "c_custkey", salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(cents("value")).alias("sum_value_c")
    )


# ---------------------------------------------------------------------------
# Correlated subqueries and null semantics
# ---------------------------------------------------------------------------

@q(
    "subquery_above_nation_avg",
    """
    WITH nation_avg AS (
      SELECT c_nationkey,
             CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_c,
             COUNT(*) AS n
      FROM customer GROUP BY c_nationkey)
    SELECT c.c_custkey, c.c_nationkey, CAST(round(c.c_acctbal*100) AS BIGINT) AS bal_c
    FROM customer c JOIN nation_avg a ON c.c_nationkey = a.c_nationkey
    WHERE CAST(round(c.c_acctbal*100) AS BIGINT) * a.n > a.sum_c
    """,
    doc="Correlated 'above my group's average' — decorrelated into a broadcast join against the per-group aggregate; exact-int cross-multiplication avoids avg division.",
)
def subquery_above_nation_avg(spark, sf):
    c = _t(spark, sf, "customer").withColumn("bal_c", cents("c_acctbal"))
    avg = c.groupBy("c_nationkey").agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.join(F.broadcast(avg), "c_nationkey")
        .filter(F.col("bal_c") * F.col("n") > F.col("sum_c"))
        .select("c_custkey", "c_nationkey", "bal_c")
    )


@q(
    "null_semantics",
    """
    WITH d AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS st
               FROM orders)
    SELECT st, COUNT(*) AS n_rows, COUNT(st) AS n_nonnull,
           CAST(COUNT(*) FILTER (WHERE st IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(*) FILTER (WHERE st IS NOT DISTINCT FROM 'O') AS BIGINT) AS n_nullsafe_o
    FROM d GROUP BY st
    """,
    doc="NULL semantics: grouping by NULL, count vs count(col), IS [NOT] DISTINCT FROM (null-safe equality <=>).",
)
def null_semantics(spark, sf):
    o = _t(spark, sf, "orders")
    d = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(F.col("o_orderstatus")).alias("st"),
    )
    return d.groupBy("st").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("st").alias("n_nonnull"),
        F.count(F.when(F.col("st").isNull(), 1)).cast("long").alias("n_null"),
        F.count(F.when(F.col("st").eqNullSafe("O"), 1)).cast("long").alias("n_nullsafe_o"),
    )


@q(
    "scalar_interval_orders",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS ship_by,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2026-01-01 00:00:00') AS BIGINT) AS days_until_2026,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0
    FROM orders
    """,
    doc="Interval arithmetic + day-of-week (normalized to Sunday=0: Spark dayofweek is 1-based-Sunday, DuckDB dayofweek is 0-based-Sunday).",
)
def scalar_interval_orders(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ship_by"),
        F.datediff(F.lit("2026-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_until_2026"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow_sun0"),
    )


# ---------------------------------------------------------------------------
# SQL-authored queries (spark.sql end to end — the parser feeds the same
# Catalyst planning as the DataFrame API)
# ---------------------------------------------------------------------------

_Q6_SQL = """
    SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_cc,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
"""

_Q10_SQL = """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_cc
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue_cc DESC, c_custkey
    LIMIT 20
"""


@q(
    "sql_q6_forecast_revenue",
    _Q6_SQL,
    doc="TPC-H Q6-style via spark.sql — both predicates reach the parquet scan; single global agg.",
)
def sql_q6_forecast_revenue(spark, sf):
    from tamer_spark.sql import register_tables

    register_tables(spark, sf)
    return spark.sql(_Q6_SQL)


@q(
    "sql_q10_returned_items",
    _Q10_SQL,
    doc="TPC-H Q10-style via spark.sql: returned-item revenue per customer, top 20 (deterministic tie-break).",
)
def sql_q10_returned_items(spark, sf):
    from tamer_spark.sql import register_tables

    register_tables(spark, sf)
    return spark.sql(_Q10_SQL)


# ---------------------------------------------------------------------------
# Dataset construction: deterministic sampling, splits, decontamination,
# repetition-based quality
# ---------------------------------------------------------------------------

@q(
    "sample_deterministic",
    """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 20
    """,
    doc="Reproducible 20% sample: membership decided by a stable content-independent hash — identical rows selected on any engine, any run, any partitioning (rand()-based sampling is none of those).",
)
def sample_deterministic(spark, sf):
    from tamer_spark.functions.hashing import stable_hash64

    d = _t(spark, sf, "documents")
    return d.filter(stable_hash64(F.col("doc_id").cast("string")) % 100 < 20).select(
        "doc_id", "lang"
    )


@q(
    "split_train_val_test",
    """
    WITH assigned AS (
      SELECT lang,
             CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT lang, ('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS h
            FROM documents))
    SELECT split, lang, COUNT(*) AS n FROM assigned GROUP BY split, lang
    """,
    doc="Stable 80/10/10 train/val/test assignment via salted hash ranges — membership never shifts when the corpus grows (unlike percent_rank-based splits).",
)
def split_train_val_test(spark, sf):
    from tamer_spark.functions.hashing import stable_hash64

    d = _t(spark, sf, "documents")
    h = stable_hash64(F.concat(F.lit("split-"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return d.select(split.alias("split"), "lang").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "decontaminate_against_benchmark",
    f"""
    WITH {_shingle_ctes()},
    bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0),
    corpus AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 50 <> 0),
    tainted AS (SELECT DISTINCT corpus.doc_id FROM corpus JOIN bench USING (s))
    SELECT doc_id FROM documents
    WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM tainted)
    """,
    doc="Benchmark decontamination: drop corpus docs sharing any 3-gram shingle with the (synthetic) benchmark set — shingle equi-join + anti join; at scale use hashed shingles and broadcast the benchmark side.",
)
def decontaminate_against_benchmark(spark, sf):
    from tamer_spark.operators.dedup import shingle_string_rows

    d = _t(spark, sf, "documents")
    shingled = shingle_string_rows(d, n=3).dropDuplicates(["doc_id", "s"])
    bench = shingled.filter(F.col("doc_id") % 50 == 0).select("s").distinct()
    corpus = shingled.filter(F.col("doc_id") % 50 != 0)
    tainted = corpus.join(F.broadcast(bench), "s").select("doc_id").distinct()
    return (
        d.filter(F.col("doc_id") % 50 != 0)
        .join(tainted, "doc_id", "left_anti")
        .select("doc_id")
    )


@q(
    "repetition_ratio",
    f"""
    WITH {_shingle_ctes()},
    expl AS (SELECT doc_id, unnest(
        CASE WHEN len(w) - 2 <= 0 THEN [array_to_string(w, ' ')]
             ELSE list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
        END) AS s
      FROM ws)
    SELECT doc_id, COUNT(*) AS n_shingles, COUNT(DISTINCT s) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS repetition
    FROM expl GROUP BY doc_id
    """,
    doc="Intra-document repetition (1 - distinct/total 3-grams) — the Gopher-style boilerplate signal; explode + countDistinct, exact-int ratio.",
)
def repetition_ratio(spark, sf):
    from tamer_spark.operators.dedup import shingle_string_rows

    d = _t(spark, sf, "documents")
    expl = shingle_string_rows(d, n=3)  # raw (non-distinct) shingle rows
    return expl.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.countDistinct("s").alias("n_distinct"),
        (F.lit(1.0) - F.countDistinct("s").cast("double") / F.count(F.lit(1))).alias("repetition"),
    )


@q(
    "data_quality_checks",
    """
    SELECT 'o_totalprice_out_of_range' AS check, CAST(COUNT(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) AS n_bad FROM orders
    UNION ALL
    SELECT 'o_custkey_null', CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_custkey_orphaned', CAST(COUNT(*) AS BIGINT) FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'o_orderkey_duplicated',
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
      FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)
    """,
    doc="Declarative data-quality gate: row checks in one aggregate pass + referential (anti-join) + uniqueness checks, unioned into a (check, n_bad) report.",
)
def data_quality_checks(spark, sf):
    from tamer_spark.operators.quality import (
        in_range,
        not_null,
        referential_check,
        run_checks,
        uniqueness_check,
    )

    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    row_checks = run_checks(o, [in_range("o_totalprice", lo=0), not_null("o_custkey")])
    ref = referential_check(o, c, "o_custkey", "c_custkey")
    uniq = uniqueness_check(o, ["o_orderkey"])
    return row_checks.unionByName(ref).unionByName(uniq)
