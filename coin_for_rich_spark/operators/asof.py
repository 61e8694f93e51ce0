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
   ``last(payload_struct, ignorenulls=True)`` carries the most recent right
   ROW (one struct — per-column carries would skip genuinely-NULL payload
   fields and stitch values from different right rows) forward onto every
   subsequent row;
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
from pyspark.sql import types as T


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
    # the union plan uses _t/_src plus ONE struct carry column _p —
    # collisions with input columns or aliases would silently produce
    # duplicate/ambiguous output, so the API boundary rejects them up front
    # (including aliases named like the reserved internals: payload
    # {'price': '_t'} would otherwise die mid-plan on an ambiguous ref)
    reserved = {"_t", "_src", "_p"}
    clashes = reserved & (
        set(left_cols) | set(right.columns) | set(payload.values())
    )
    if clashes:
        raise ValueError(
            f"asof_join: input columns or payload aliases collide with "
            f"reserved internal names: {sorted(clashes)}"
        )
    alias_clashes = set(payload.values()) & set(left_cols)
    if alias_clashes:
        raise ValueError(
            f"asof_join: payload aliases collide with left columns: "
            f"{sorted(alias_clashes)} — rename via the payload mapping"
        )
    if len(set(payload.values())) != len(payload):
        raise ValueError("asof_join: duplicate payload aliases")
    if not payload:
        return left.select(*left_cols)

    payload_type = T.StructType(
        [
            T.StructField(alias, right.schema[c].dataType)
            for c, alias in payload.items()
        ]
    )
    # NULL right timestamps can match NOTHING under ASOF's l.ts >= r.ts —
    # left unfiltered they sort NULLS FIRST and their payload would be
    # carried onto every left row as a spurious match
    r = right.filter(F.col(right_time).isNotNull()).select(
        *on,
        F.col(right_time).alias("_t"),
        # ONE struct per right row, never per-column carries: a right row
        # whose payload FIELD is genuinely NULL must still win as the
        # as-of row (per-column last(ignorenulls) skipped the NULL and
        # stitched together fields from different right rows)
        F.struct(
            *[F.col(c).alias(alias) for c, alias in payload.items()]
        ).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on],
        F.lit(0).alias("_src"),
    )
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(None).cast(payload_type).alias("_p"),
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
        "*", F.last("_p", ignorenulls=True).over(w).alias("_cp")
    )
    return carried.filter(F.col("_src") == 1).select(
        *[F.col(c) for c in left_cols],
        *[
            F.col("_cp").getField(alias).alias(alias)
            for alias in payload.values()
        ],
    )
