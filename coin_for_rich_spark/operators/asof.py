"""As-of join: decorate each left row with the latest right row at or before
its timestamp, per key.

The canonical time-series join (TimescaleDB users write it as a LATERAL
``ORDER BY time DESC LIMIT 1`` — the same shape as the reference's
latest-row query, `fetchers/config/queries.py:19-31` — and DuckDB/kdb ship
it as a native ASOF JOIN). Spark has no built-in as-of join; the naive
range-join (``l.ts >= r.ts`` then window-rank) materializes the O(n·m)
inequality join before pruning it.

Spark-first expression — the union + ordered carry-forward plan:

1. union the two sides into one relation tagged by source, right rows
   carrying their payload columns, left rows carrying null payloads;
2. one window per key ordered by (time, source-tag):
   ``last(payload, ignorenulls=True)`` carries the most recent right payload
   forward onto every subsequent row;
3. keep the left rows — each now decorated with the latest right payload at
   or before its time (ties: right sorts before left, so an exactly-
   simultaneous right row IS visible, matching ASOF's ``l.ts >= r.ts``).

Cost: ONE shuffle on the key (the union is shuffle-free), then a linear
per-key ordered pass — the plan a range join can't beat. Skewed keys are the
window's partition skew; at scale, salt the key or range-partition time
within the hot key (same remedy as any per-key window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    payload: dict[str, str] | None = None,
) -> DataFrame:
    """Left as-of join.

    ``payload`` maps right-side column → output alias (the columns carried
    onto left rows); defaults to every right column that is neither a key
    nor the time, suffixed ``_asof``. Left rows with no right row at or
    before their time keep null payloads (LEFT ASOF semantics).
    """
    on = list(on)
    if payload is None:
        payload = {
            c: f"{c}_asof"
            for c in right.columns
            if c not in on and c != right_time
        }
    left_cols = left.columns
    # the union plan uses _t/_src plus one _c_<alias> carry column per
    # payload — collisions with input columns or between payload aliases and
    # left columns would silently produce duplicate/ambiguous output, so the
    # API boundary rejects them up front
    reserved = {"_t", "_src"} | {f"_c_{alias}" for alias in payload.values()}
    clashes = reserved & (set(left_cols) | set(right.columns))
    if clashes:
        raise ValueError(
            f"asof_join: input columns collide with reserved internal names: "
            f"{sorted(clashes)}"
        )
    alias_clashes = set(payload.values()) & set(left_cols)
    if alias_clashes:
        raise ValueError(
            f"asof_join: payload aliases collide with left columns: "
            f"{sorted(alias_clashes)} — rename via the payload mapping"
        )
    if len(set(payload.values())) != len(payload):
        raise ValueError("asof_join: duplicate payload aliases")

    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        *[F.col(c).alias(alias) for c, alias in payload.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on],
        F.lit(0).alias("_src"),
    )
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(alias)
          for c, alias in payload.items()],
        *[F.col(c) for c in left_cols if c not in on],
        F.lit(1).alias("_src"),
    )
    unioned = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(alias, ignorenulls=True).over(w).alias(f"_c_{alias}")
            for alias in payload.values()
        ],
    )
    return carried.filter(F.col("_src") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_c_{alias}").alias(alias) for alias in payload.values()],
    )
