"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (reference file:line
cited in the implementing function's docstring inside coin_for_rich_spark/),
expressed Spark-first; ``oracle_sql()`` holds the DuckDB-ANSI equivalent run
by the driver at sf0.01.

Numeric-parity policy (see coin_for_rich_spark/functions/numbers.py): every
sum over floating-point measures goes through DECIMAL(18,2) in BOTH engines —
double summation is order-dependent under Spark's parallel partial
aggregation, decimal summation is exact — then is cast back to double.
Timestamps: the testdata's nanosecond timestamps are truncated to
microseconds identically on both sides (integer division, see
coin_for_rich_spark/sources/tables.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coin_for_rich_spark.operators import (
    common_keys_top30,
    count_distinct_pairs,
    dedup_pk,
    detect_gaps,
    geo_daily_return,
    latest_per_key,
    ohlcv_rollup,
    recompute_is_trading,
    retention_anti_join,
    top_k_with_other,
    weekly_return,
)
from coin_for_rich_spark.plans import read_ohlcvs
from coin_for_rich_spark.sources import candles_view, load_table


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

# Candle relation over `events` shared by the oracle SQL below: event_type is
# the symbol key, value is price and per-tick volume (FIXTURES.md §6 mapping).
def _candle_sql(bucket_expr: str) -> str:
    return f"""
        SELECT {bucket_expr} AS bucket,
               event_type AS symbol,
               arg_min(value, ts) AS open,
               max(value) AS high,
               min(value) AS low,
               arg_max(value, ts) AS close,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume,
               count(*) AS n_trades
        FROM events
        GROUP BY 1, 2
    """


def _epoch_bucket(width: int) -> str:
    # identical to functions.timeutils.time_bucket: floor(epoch_seconds/width)
    # via integer arithmetic, rebuilt as a naive timestamp.
    return (
        f"make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // {width}) * {width})"
        " * 1000000)"
    )


HOURLY = _candle_sql("date_trunc('hour', ts)")
DAILY = _candle_sql("date_trunc('day', ts)")

# sum of the discounted price routed through DECIMAL — one double multiply
# (deterministic), cast at scale 4 (the true product has ≤4 decimal digits, so
# the cast is exact and engine-independent; scale 2 would sit on rounding
# ties), then an exact decimal accumulation. See functions/numbers.py.
REVENUE_DEC = "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))"


# ---------------------------------------------------------------------------
# queries — SURVEY §2 operators (Spark side)
# ---------------------------------------------------------------------------


def q_candles_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup at 1h (create.sql:161-174)."""
    return ohlcv_rollup(candles_view(spark, sf_dir), "1h")


def q_candles_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup at 1 day (create.sql:105-118)."""
    return ohlcv_rollup(candles_view(spark, sf_dir), "1D")


def q_candles_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup at 5m — non-calendar epoch bucketing (create.sql:120-133)."""
    return ohlcv_rollup(candles_view(spark, sf_dir), "5m")


def q_candles_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 rollup at 7 days (create.sql:210-223)."""
    return ohlcv_rollup(candles_view(spark, sf_dir), "7D")


def q_chart_read_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The main read path (readers.py:126-368): route interval → filter key +
    time range → DESC limit 500 → ASC re-sort (P1/P2/P8, §2.6)."""
    cv = candles_view(spark, sf_dir)
    return read_ohlcvs(cv, "purchase", "1h",
                       start="2024-01-03 00:00:00", end="2024-01-29 00:00:00",
                       limit=500)


def q_chart_read_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled chart read (J4+A8, readers.py:210-244): spine join +
    avg-filled dummy candles with volume 0."""
    cv = candles_view(spark, sf_dir)
    return read_ohlcvs(cv, "click", "1h", limit=500, empty_ts=True)


def q_common_keys_30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — common_basequote_30 (create.sql:94-99): keys on >2 counterparties,
    first 30 in key order."""
    li = load_table(spark, sf_dir, "lineitem")
    return common_keys_top30(li, "l_partkey", "l_suppkey", min_across=2, top_n=30)


def q_top20_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6/W4 — top_20_quoted_vol (create.sql:280-316): top-20 by summed
    measure + 'Other' residual bucket."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "disc_price",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"),
    )
    return top_k_with_other(li, "l_partkey", "disc_price", k=20)


def q_weekly_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W6 — weekly_return view (create.sql:318-337)."""
    return weekly_return(candles_view(spark, sf_dir))


def q_geo_daily_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/W3 — geo_daily_return view (create.sql:225-278), now = max(ts)."""
    return geo_daily_return(candles_view(spark, sf_dir))


def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — LATERAL top-1-per-group (queries.py:19-31) as a per-key window."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id"], "ts", "event_id")


def q_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — LEAD-based gap detection (queries.py:54-61), 12h threshold."""
    ev = load_table(spark, sf_dir, "events")
    return detect_gaps(ev, ["user_id"], "ts", min_gap_seconds=43200)


def q_is_trading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 — is_trading recompute (daily.sql:1-40), now = max(ts)."""
    ev = load_table(spark, sf_dir, "events")
    return recompute_is_trading(ev, ["user_id"], "ts")


def q_retention_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/M2 — retention anti-join (delete_queries.sql:3-10): rows outside the
    top-30 key list, summarized per event_type."""
    ev = load_table(spark, sf_dir, "events")
    keep = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .limit(30)
    )
    removed = retention_anti_join(ev, keep, ["user_id"])
    return removed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("checksum"),
    )


def q_dedup_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/J6 — PK dedup (insert_queries.sql:8-15): one row per
    (user_id, event_type, minute), keep lowest event_id; summarized."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "minute", F.date_trunc("minute", "ts")
    )
    deduped = dedup_pk(ev, ["user_id", "event_type", "minute"], "event_id")
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("checksum"),
    )


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — count distinct tuple (select_queries.sql:215-218), per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return count_distinct_pairs(li, ["l_partkey", "l_suppkey"], ["l_returnflag"])


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate showcase over the fact table (A-family): decimal-exact sums
    and explicit sum/count averages."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — fact ⋈ dims with broadcast (select_queries.sql:83-96 analog):
    top-10 customers by decimal-exact revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")).alias("_rev")
        )
    )
    return (
        rev.orderBy(F.col("_rev").desc(), "c_custkey")
        .limit(10)
        .select("c_custkey", "c_name", "n_name", F.col("_rev").cast("double").alias("revenue"))
    )


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — left outer join decorating the fact with a dimension
    (aggregations.sql:32-35 analog), aggregated per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full chart read path —
    interval router → hourly rollup → key/time filters → limit clamp."""
    cv = candles_view(spark, "/root/testdata/sf0.001")
    return read_ohlcvs(cv, "purchase", "1h", limit=500)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "candles_1h": q_candles_1h,
        "candles_1d": q_candles_1d,
        "candles_5m": q_candles_5m,
        "candles_7d": q_candles_7d,
        "chart_read_1h": q_chart_read_1h,
        "chart_read_gapfill": q_chart_read_gapfill,
        "common_keys_30": q_common_keys_30,
        "top20_other": q_top20_other,
        "weekly_return": q_weekly_return,
        "geo_daily_return": q_geo_daily_return,
        "latest_per_key": q_latest_per_key,
        "gap_detect": q_gap_detect,
        "is_trading": q_is_trading,
        "retention_summary": q_retention_summary,
        "dedup_pk": q_dedup_pk,
        "count_distinct": q_count_distinct,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "brand_revenue": q_brand_revenue,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "candles_1h": HOURLY,
        "candles_1d": DAILY,
        "candles_5m": _candle_sql(_epoch_bucket(300)),
        "candles_7d": _candle_sql(_epoch_bucket(604800)),
        "chart_read_1h": f"""
            WITH c AS ({HOURLY})
            SELECT * FROM (
                SELECT * FROM c
                WHERE symbol = 'purchase'
                  AND bucket >= TIMESTAMP '2024-01-03 00:00:00'
                  AND bucket <= TIMESTAMP '2024-01-29 00:00:00'
                ORDER BY bucket DESC LIMIT 500
            ) ORDER BY bucket
        """,
        "chart_read_gapfill": f"""
            WITH c AS ({HOURLY}),
            f AS (
                SELECT * FROM c WHERE symbol = 'click'
                ORDER BY bucket DESC LIMIT 500
            ),
            stats AS (
                SELECT
                    CAST(sum(CAST(open AS DECIMAL(18,2))) AS DOUBLE) / count(open) AS a_open,
                    CAST(sum(CAST(high AS DECIMAL(18,2))) AS DOUBLE) / count(high) AS a_high,
                    CAST(sum(CAST(low AS DECIMAL(18,2))) AS DOUBLE) / count(low) AS a_low,
                    CAST(sum(CAST(close AS DECIMAL(18,2))) AS DOUBLE) / count(close) AS a_close,
                    min(bucket) AS lo, max(bucket) AS hi
                FROM f
            ),
            spine AS (
                SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
                FROM stats
            )
            SELECT spine.bucket AS bucket,
                   round(coalesce(f.open, stats.a_open), 4) AS open,
                   round(coalesce(f.high, stats.a_high), 4) AS high,
                   round(coalesce(f.low, stats.a_low), 4) AS low,
                   round(coalesce(f.close, stats.a_close), 4) AS close,
                   coalesce(f.volume, 0.0) AS volume,
                   (f.open IS NULL) AS filled,
                   'click' AS symbol
            FROM spine LEFT JOIN f ON spine.bucket = f.bucket, stats
        """,
        "common_keys_30": """
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_across
            FROM lineitem
            GROUP BY l_partkey
            HAVING count(DISTINCT l_suppkey) > 2
            ORDER BY l_partkey
            LIMIT 30
        """,
        "top20_other": f"""
            WITH per_key AS (
                SELECT l_partkey, {REVENUE_DEC} AS vol
                FROM lineitem GROUP BY l_partkey
            ),
            ranked AS (
                SELECT l_partkey, vol,
                       row_number() OVER (ORDER BY vol DESC, l_partkey) AS ranking
                FROM per_key
            )
            SELECT CASE WHEN ranking > 20 THEN 'Other'
                        ELSE 'P-' || CAST(l_partkey AS VARCHAR) END AS bucket_label,
                   CAST(round(sum(vol), 4) AS DOUBLE) AS total_vol
            FROM ranked
            GROUP BY 1
            ORDER BY total_vol DESC, bucket_label
        """,
        "weekly_return": f"""
            WITH weekly AS ({_candle_sql(_epoch_bucket(604800))}),
            latest AS (
                SELECT symbol, bucket AS week, open, close
                FROM weekly
                QUALIFY row_number() OVER (PARTITION BY symbol ORDER BY bucket DESC) = 1
            )
            SELECT symbol, week,
                   round((close - open) / open * 100, 4) AS weekly_return_pct
            FROM latest WHERE open <> 0
        """,
        "geo_daily_return": f"""
            WITH daily AS ({DAILY}),
            recent AS (
                SELECT * FROM daily
                WHERE bucket >= date_trunc('day', (SELECT max(ts) FROM events)) - INTERVAL 8 DAY
            ),
            factors AS (
                SELECT symbol, close,
                       lag(close) OVER (PARTITION BY symbol ORDER BY bucket) AS prev_close
                FROM recent
            )
            SELECT symbol,
                   round((pow(exp(sum(ln(close / prev_close))), 1.0 / count(*)) - 1) * 100, 4)
                       AS daily_return_pct,
                   count(*) AS n_days
            FROM factors
            WHERE prev_close IS NOT NULL AND prev_close <> 0
              AND ln(close / prev_close) IS NOT NULL
            GROUP BY symbol
            ORDER BY symbol
        """,
        "latest_per_key": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "gap_detect": """
            SELECT user_id, ts AS gap_start, next_time AS gap_end,
                   CAST(floor(epoch(next_time)) AS BIGINT)
                     - CAST(floor(epoch(ts)) AS BIGINT) AS gap_seconds
            FROM (
                SELECT user_id, ts,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_time
                FROM events
            )
            WHERE CAST(floor(epoch(next_time)) AS BIGINT)
                    - CAST(floor(epoch(ts)) AS BIGINT) > 43200
        """,
        "is_trading": """
            WITH latest AS (
                SELECT user_id, max(ts) AS latest_time FROM events GROUP BY user_id
            )
            SELECT user_id, latest_time,
                   (CAST(floor(epoch((SELECT max(ts) FROM events))) AS BIGINT)
                      - CAST(floor(epoch(latest_time)) AS BIGINT)) <= 86400 AS is_trading
            FROM latest
        """,
        "retention_summary": """
            WITH keep AS (
                SELECT user_id FROM events
                GROUP BY user_id
                ORDER BY count(*) DESC, user_id
                LIMIT 30
            )
            SELECT event_type, count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS checksum
            FROM events
            WHERE user_id NOT IN (SELECT user_id FROM keep)
            GROUP BY event_type
        """,
        "dedup_pk": """
            WITH deduped AS (
                SELECT * FROM events
                QUALIFY row_number() OVER (
                    PARTITION BY user_id, event_type, date_trunc('minute', ts)
                    ORDER BY event_id
                ) = 1
            )
            SELECT event_type, count(*) AS n_rows, CAST(sum(event_id) AS BIGINT) AS checksum
            FROM deduped
            GROUP BY event_type
        """,
        "count_distinct": """
            SELECT l_returnflag, count(DISTINCT (l_partkey, l_suppkey)) AS n_distinct
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_customers": f"""
            WITH rev AS (
                SELECT c_custkey, c_name, n_name, {REVENUE_DEC} AS _rev
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                GROUP BY c_custkey, c_name, n_name
            )
            SELECT c_custkey, c_name, n_name, CAST(_rev AS DOUBLE) AS revenue
            FROM rev
            ORDER BY _rev DESC, c_custkey
            LIMIT 10
        """,
        "brand_revenue": f"""
            SELECT p_brand, CAST({REVENUE_DEC} AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
            ORDER BY p_brand
        """,
    }
