"""Deterministic streaming sources for tests and local replay.

The reference's live source is three exchange WebSocket feeds normalized to
one candle schema (`fetchers/ws/bitfinex.py:110-229` et al., S3). In this
engine the source is any Structured Streaming reader producing that schema
(Kafka in production, file streams in tests); everything downstream is
source-agnostic.

``stage_stream_chunks`` turns a batch DataFrame into an N-file parquet
directory ordered by event time (range partitioning → part-file order ==
time order), so a file stream with ``maxFilesPerTrigger=1`` replays it as N
micro-batches in near-arrival order — the closest deterministic analog of
the reference's 10-second updater drain cycle (`fetchers/ws/updater.py:29`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stage_stream_chunks(
    df: DataFrame, path: str, n_chunks: int = 8, order_col: str = "ts"
) -> T.StructType:
    """Write ``df`` as ``n_chunks`` time-ordered parquet files under ``path``
    and return the schema (file streams require an explicit schema).

    The file source replays files in *modification-time* order, and a single
    parquet write stamps every part file with the same mtime — leaving the
    replay order arbitrary, which would advance the watermark past
    later-arriving older chunks and drop them as late. Re-stamp the part
    files with strictly increasing mtimes in range-partition (= event-time)
    order so replay follows event time.
    """
    (
        df.repartitionByRange(n_chunks, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = os.stat(path).st_mtime
    for i, name in enumerate(parts):
        full = os.path.join(path, name)
        os.utime(full, (base + 10.0 * (i + 1), base + 10.0 * (i + 1)))
    return df.schema


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def candle_stream(stream: DataFrame) -> DataFrame:
    """Normalize an events-shaped stream to the candle schema (same mapping
    as sources.tables.candles_view, streaming-safe: pure projection)."""
    return stream.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type").alias("symbol"),
        F.col("user_id"),
        F.col("value").alias("price"),
        F.col("value").alias("volume"),
    )
