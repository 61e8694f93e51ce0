"""Streaming exactly-once dedup (S6's streaming twin).

Reference parity: the WS updater's processing-set guarantee plus the
``INSERT ... ON CONFLICT DO NOTHING`` insert path
(`fetchers/ws/updater.py:127-138`, `schemas/insert_queries.sql:1-3`) —
an event observed twice (reconnect replay, overlapping REST/WS fetch) must
land exactly once.

Spark-first: ``dropDuplicatesWithinWatermark`` — the built-in keyed dedup
state store. Unlike a plain ``dropDuplicates`` on a stream (whose state
grows forever), the watermark bounds state to the lateness horizon: a
duplicate arriving within the watermark is dropped, state for older keys is
reclaimed. State shards on the dedup key exactly like any keyed aggregation
— 1000-executor sharding comes free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exactly_once_dedup(
    stream: DataFrame,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence per key wins; duplicates within the watermark
    horizon are dropped, state beyond it is reclaimed."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
