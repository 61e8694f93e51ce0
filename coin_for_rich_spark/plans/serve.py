"""Serve-layer serialization: the API's wire contract (M6).

Reference parity: ``parsers.parse_ohlcv``
(`web/routes/api/rest/utils/parsers.py:9-40`) — every candle leaves the
engine as ``{time: epoch ms|s, open/high/low/close/volume: round4}`` — and
``row_to_json`` payloads (`schemas/select_queries.sql:165-174`,
`fetchers/config/queries.py:52-53`).

Both are pure column expressions (``unix_millis``, ``round``,
``to_json(struct(*))``) so serialization happens distributed, inside
whole-stage codegen — the reference does this row-at-a-time in Python on the
web tier; here a 1000-executor write of serialized payloads is the same plan
shape as any other projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numbers import round4
from ..functions.timeutils import epoch_ms

#: columns rounded to 4 decimals at serve (`parsers.py:22-34`)
OHLCV_COLS = ("open", "high", "low", "close", "volume")


def serialize_candles(
    df: DataFrame,
    time_col: str = "bucket",
    results_mls: bool = True,
    value_cols: tuple[str, ...] = OHLCV_COLS,
) -> DataFrame:
    """Candle rows → wire shape: epoch time + 4-decimal values.

    ``results_mls`` selects milliseconds vs whole seconds, mirroring the
    API's ``results_mls`` flag (`parsers.py:9-40`).
    """
    t = epoch_ms(time_col)
    if not results_mls:
        t = (t / F.lit(1000)).cast("bigint")
    out = df.withColumn("time", t).drop(time_col)
    for c in value_cols:
        if c in out.columns:
            out = out.withColumn(c, round4(c))
    cols = ["time"] + [c for c in out.columns if c != "time"]
    return out.select(*cols)


def to_json_rows(df: DataFrame, out_col: str = "payload") -> DataFrame:
    """``row_to_json(subquery)`` parity: each row as one JSON object column
    (`select_queries.sql:165-174`). Spark's ``to_json(struct(*))`` keeps
    column order; key order therefore matches the projection, like Postgres.
    """
    return df.select(F.to_json(F.struct(*df.columns)).alias(out_col))
