"""Sliding-frame window aggregates (W5).

Reference parity: the 7-day moving average of close over the 1-minute
relation — ``AVG(close) OVER (PARTITION BY exchange, base_id, quote_id
ORDER BY time ROWS BETWEEN 10079 PRECEDING AND CURRENT ROW)``
(`schemas/aggregations.sql:26-39`).

Numeric posture: a windowed double AVG is summed in engine-specific order
(DuckDB uses a segment tree for sliding frames, Spark a running frame
accumulator), so bit-exact parity requires the same decimal routing as the
grouped sums — exact decimal sliding SUM, then one double division by the
frame COUNT.

Scale posture: partitioned window, ordered within key only — parallel across
keys, no global sort, state bounded by the frame width. The streaming analog
at 100 TB is a windowed aggregate over the rollup sink rather than raw ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numbers import money


def moving_average(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    n_preceding: int,
    out_col: str = "moving_avg",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key trailing moving average over the last ``n_preceding + 1`` rows.

    ``tiebreak_col`` pins the within-frame order when timestamps tie (frame
    membership would otherwise be nondeterministic at the edges).
    """
    order = [F.col(time_col)]
    if tiebreak_col and tiebreak_col in df.columns:
        order.append(F.col(tiebreak_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-n_preceding, Window.currentRow)
    )
    return df.withColumn(
        out_col,
        F.sum(money(value_col)).over(w).cast("double")
        / F.count(F.lit(1)).over(w),
    )
