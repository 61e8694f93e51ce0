"""Streaming gap-based sessionization — the streaming twin of
``operators/windowed.sessionize``.

The batch operator segments a key's timeline with LAG + running-sum
windows; Structured Streaming cannot run unbounded ordered windows, so the
streaming twin uses the engine's native ``session_window`` aggregate:
state holds one open session per (key, window), sessions merge as late
events bridge gaps, and append mode emits a session once the watermark
passes its close (end + gap) — the same hold-back discipline as the
streaming OHLCV rollup (a still-open session is never emitted).

One deliberate boundary divergence, stated loud: the batch operator keeps
two events EXACTLY ``gap_seconds`` apart in ONE session (its rule is
``delta > gap`` starts a new one), while ``session_window``'s intervals
are half-open — an event landing exactly at ``prev + gap`` starts a NEW
session. Real event-time data (µs precision) hits the boundary with
probability ~0; the equivalence test pins the two twins equal on the
replayed corpus and asserts it contains no exact-gap deltas, so a corpus
where the divergence could bite fails the test rather than passing
silently.

Scale posture: state is one row per OPEN session per key (bounded by the
live keyspace, not history); the shuffle is on the grouping keys, and the
watermark both bounds state and defines emission — identical cost shape
to the windowed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessionize(
    stream: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    gap_seconds: int = 3600,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-session summary rows ``(*keys, session_start, session_end,
    n_events, duration_seconds)`` over a streaming relation — column-
    compatible with the batch ``sessionize`` minus its ``session_id``
    ordinal (an artifact of the batch numbering, not of the sessions)."""
    from ..operators.windowed import session_aggs

    sw = F.session_window(F.col(time_col), f"{int(gap_seconds)} seconds")
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys, sw)
        .agg(*session_aggs(time_col))
        .drop("session_window")
    )
