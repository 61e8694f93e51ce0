"""Gap-filled time series with avg-fill dummy rows.

Reference parity: the chart reader's ``empty_ts`` mode
(`web/routes/api/rest/utils/readers.py:210-244` for 1m, `:329-362` for
buckets): a ``generate_series`` of expected timestamps LEFT JOINed to the
data (J4), missing rows COALESCEd to dummy candles whose open/high/low/close
are the AVERAGE over the *fetched window* and whose volume is 0 (A8) — a
reference idiosyncrasy reproduced exactly (SURVEY §4 item 3).

Spark-first expression: ``explode(sequence(min, max, interval))`` builds the
spine (Postgres ``generate_series`` equivalent, SURVEY §2.7); the window
average comes from an unpartitioned-window aggregate over the (already
small, post-rollup, limit-clamped ≤500-row) fetched set — mirroring the
reference, which also computes the avg over the limited fetched set
(`readers.py:221-227`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numbers import money
from ..functions.timeutils import INTERVAL_SECONDS, time_bucket


def lead_bounded_fill(
    df: DataFrame,
    keys: list[str],
    bucket_col: str = "bucket",
    interval: str = "1D",
    carry_cols: list[str] = ("close",),
    last_bucket: str = "keep",
) -> DataFrame:
    """W2 — per-gap LEAD-bounded forward fill (the reference's
    ``close_filled`` CTE, `create.sql:227-244`): each present bucket is
    extended with copies carrying its values forward to
    ``LEAD(bucket) - interval`` — so every gap is filled from its left edge
    and the series never extends past the last present bucket.

    ``last_bucket`` pins what happens to each key's FINAL bucket (whose
    LEAD is NULL):

    - ``"keep"`` — the bucket emits itself once (natural reading of a
      forward fill, and what ``gap_fill_series`` consumers want);
    - ``"drop"`` — the bucket emits NOTHING, reproducing PostgreSQL's
      actual evaluation of the reference CTE: a set-returning function in
      the select list whose argument is NULL
      (``generate_series(bucket, LEAD(bucket) - Δ, Δ)`` with LEAD = NULL)
      returns zero rows and ELIMINATES the whole row — so the reference's
      ``close_filled`` silently drops each key's latest daily close, and
      ``geo_daily_return`` never includes the most recent day's return.
      Verified against a live PostgreSQL 15 (tests/test_reference_sql_parity
      runs the CTE verbatim).

    Spark-first: one LEAD window per key (the rows are already post-rollup,
    ~|buckets| per key), then ``explode(sequence(bucket, next - Δ, Δ))`` —
    Postgres's per-row ``generate_series(bucket, LEAD(bucket) - Δ, Δ)``
    exactly. No join: the fill factor is data-dependent per gap, and the
    exploded output streams out of the window stage map-side.
    """
    if last_bucket not in ("keep", "drop"):
        raise ValueError(f"last_bucket must be 'keep' or 'drop', got {last_bucket!r}")
    width = INTERVAL_SECONDS[interval]
    if width is None:
        raise ValueError("lead-bounded fill needs a fixed-width interval")
    step = F.expr(f"INTERVAL {width} SECOND")
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    nxt = F.lead(bucket_col).over(w)
    stop = F.col("_next") - step
    if last_bucket == "keep":
        stop = F.coalesce(stop, F.col(bucket_col))
    # with last_bucket="drop", sequence(b, NULL, Δ) is NULL and explode of a
    # NULL array emits no rows — the same row elimination PostgreSQL applies
    seq = F.sequence(F.col(bucket_col), stop, step)
    return (
        df.withColumn("_next", nxt)
        .select(*keys, F.explode(seq).alias(bucket_col), *carry_cols)
    )


def gap_fill_series(
    candles: DataFrame,
    interval: str,
    bucket_col: str = "bucket",
    value_cols: list[str] = ("open", "high", "low", "close"),
    volume_col: str = "volume",
    start=None,
    end=None,
    series_limit: int | None = None,
) -> DataFrame:
    """Fill missing buckets of a single-key candle frame.

    ``candles`` must already be filtered to one key (the reference fills
    per-request, one symbol per call). Missing buckets get
    avg(value over fetched window) for each price column, 0 volume, and
    ``filled = true``. The avg is decimal-summed / count to stay
    deterministic under parallel aggregation.

    ``series_limit`` reproduces the reference's spine clamp
    (`readers.py:228-238`): its dummy series is ordered DESC and LIMITed
    before the join, so only the LATEST ``series_limit`` grid points
    survive — real rows older than the clamped spine are dropped from the
    output (they join nothing). ``None`` leaves the spine unclamped.
    ``start``, when given, anchors the spine explicitly; the reference
    reader never does this (its spine always starts at min(fetched time) —
    `readers.py:230`), so the parity caller passes ``start=None``.
    """
    width = INTERVAL_SECONDS[interval]
    if width is None:
        raise ValueError("gap fill over calendar months not supported; use fixed widths")
    if series_limit is not None and series_limit < 1:
        raise ValueError(f"series_limit must be >= 1, got {series_limit}")
    # explicit bounds SNAP to the bucket grid (an unaligned start would put
    # every spine timestamp off-grid, the join would match nothing, and all
    # real candles would come back as filled dummies); data-derived bounds
    # are bucket values already
    lo = (
        time_bucket(F.lit(start).cast("timestamp"), interval)
        if start is not None
        else F.min(bucket_col)
    )
    hi = (
        time_bucket(F.lit(end).cast("timestamp"), interval)
        if end is not None
        else F.max(bucket_col)
    )

    # ONE global agg carries the bounds AND the fill averages (the
    # reference's dseries computes avg(fetched) alongside its
    # generate_series, `readers.py:221-238`) — deriving the averages from
    # the joined frame instead would LOSE them whenever no fetched row
    # survives the clamped spine (a sparse key whose latest data is older
    # than the last `series_limit` grid points must still emit avg-filled
    # dummies, not NULLs — caught by the live-PG reader-shape leg). The
    # avg is decimal-summed / count to stay deterministic under parallel
    # aggregation. Agg, never select: with BOTH bounds literal, a select
    # would emit one row PER candle and duplicate the spine N times.
    bounds = candles.agg(
        lo.alias("_lo"),
        hi.alias("_hi"),
        *[
            (F.sum(money(c)).cast("double") / F.count(c)).alias(f"_avg_{c}")
            for c in value_cols
        ],
    )
    if series_limit is not None:
        # both bounds sit on the same grid (lo is a bucket; hi is a
        # time_bucket floor or a bucket), so stepping back N-1 widths from
        # hi stays on-grid and greatest() picks the later anchor — the
        # latest series_limit grid points, exactly the reference's
        # ORDER BY ts DESC LIMIT over its generate_series
        clamped = F.greatest(
            F.col("_lo"),
            F.col("_hi")
            - F.expr(f"INTERVAL {width * (series_limit - 1)} SECOND"),
        )
        # greatest() SKIPS nulls: an empty fetch (NULL _lo) must stay NULL
        # so the spine stays empty (the reference returns [] — its series
        # starts at min(fetched time), which does not exist), not become a
        # full dummy series anchored at the clamp
        bounds = bounds.select(
            F.when(F.col("_lo").isNull(), F.lit(None).cast("timestamp"))
            .otherwise(clamped)
            .alias("_lo"),
            "_hi",
            *[f"_avg_{c}" for c in value_cols],
        )
    spine = bounds.select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {width} SECOND"))
        ).alias(bucket_col),
        *[f"_avg_{c}" for c in value_cols],
    )
    joined = spine.join(candles, on=bucket_col, how="left")
    filled_flag = F.col(value_cols[0]).isNull()
    out_cols = [F.col(bucket_col)]
    for c in value_cols:
        out_cols.append(
            F.round(F.coalesce(F.col(c), F.col(f"_avg_{c}")), 4).alias(c)
        )
    out_cols.append(F.coalesce(F.col(volume_col), F.lit(0.0)).alias(volume_col))
    out_cols.append(filled_flag.alias("filled"))
    return joined.select(*out_cols)
