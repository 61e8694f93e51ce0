"""Loaders for the driver's parquet testdata.

The driver's star schema stands in for the reference's data model
(FIXTURES.md §6): `events` plays the role of the `ohlcvs` tick/candle fact
stream (`scripts/database/init/create.sql:12-22` in the reference), small dims
play `symbol_exchange` (`create.sql:24-30`).

Scale posture: at 100 TB these reads become partitioned-directory scans
(`.../dt=2024-01-01/*.parquet`); everything downstream only assumes a
DataFrame with the right schema, so swapping the loader for a partitioned /
bucketed table is a one-line change. Filters and projections are declared on
the returned DataFrame, so Catalyst pushes them into the parquet scan
(PushedFilters / ReadSchema) — no eager materialization here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns written by the generator as nanosecond INT64 timestamps. Spark reads
# them as LongType (spark.sql.legacy.parquet.nanosAsLong=true); we convert to
# microsecond timestamps with *integer* division — `ts div 1000` — because a
# double division loses sub-microsecond precision at 1.7e18 ns and would drift
# from DuckDB's exact nanos→micros truncation.
_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-sufficient on a vanilla SparkSession: the testdata's `events.parquet`
    # stores INT64 TIMESTAMP(NANOS) columns, which Spark rejects at scan time
    # unless nanosAsLong is on. The conf is runtime-settable, so set it here
    # rather than relying on the session builder (session.py) having run.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict[str, DataFrame]:
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def candles_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` normalized to the candle-stream shape the reference's fetchers
    emit (`fetchers/helpers/ws.py:6-17`): a key (symbol), an event time, and a
    price/volume measure. `event_type` stands in for the
    (exchange, base_id, quote_id) key triple; `value` is both trade price and
    per-tick volume.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type").alias("symbol"),
        F.col("user_id"),
        F.col("value").alias("price"),
        F.col("value").alias("volume"),
    )
