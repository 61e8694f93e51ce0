"""The user-facing chart read path: interval router + filtered, clamped,
optionally gap-filled candle reads.

Reference parity: ``readers.read_ohlcvs``
(`web/routes/api/rest/utils/readers.py:126-368`):
1. clamp ``limit = min(limit, 500)`` (`readers.py:168`);
2. normalize start/end to minute precision (`readers.py:169-176`);
3. route the interval string to one of the 9 relations — raw 1m or one of 8
   rollups (`readers.py:180-289`). The reference's constant list also admits
   '3h', '14D', '1M' but its router leaves them unbound (falls through with
   an error) — we implement them as on-the-fly buckets and document the
   divergence (SURVEY §2.2 P8);
4. filter on key triple + time range, fetch DESC with LIMIT, re-sort ASC for
   charting (`readers.py:194-195,242`);
5. optional gap-fill with avg-filled dummy rows (``empty_ts``,
   `readers.py:210-244`).

Scale posture: the router picks a *pre-aggregated* rollup table exactly like
the reference picks a continuous aggregate — the read never rescans raw
minutes for coarse intervals. Filters land on the rollup's partition/sort
keys, so with date-partitioned sinks this is partition-pruned scan → filter →
top-K (Spark's TakeOrderedAndProject), no full sort.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import INTERVAL_SECONDS
from ..operators.candles import ohlcv_rollup
from ..operators.gapfill import gap_fill_series

#: Interval strings accepted by the API (`web/config/constants.py:2-4`).
VALID_INTERVALS = list(INTERVAL_SECONDS.keys())

#: Resolutions materialized as rollup tables in the reference
#: (`create.sql:105-223`); everything else is bucketed on the fly.
MATERIALIZED = {"5m", "15m", "30m", "1h", "6h", "12h", "1D", "7D"}

MAX_LIMIT = 500  # `readers.py:168`


def route_interval(
    ticks: DataFrame,
    interval: str,
    rollups: dict[str, DataFrame] | None = None,
    **rollup_kwargs,
) -> DataFrame:
    """interval string → candle relation (P8).

    ``rollups`` maps interval → pre-materialized rollup DataFrames (the
    continuous-aggregate analog). Missing entries (and the reference's
    broken '3h'/'14D'/'1M') compute on the fly from ``ticks``. Unknown
    intervals raise — the reference returns [] for unknown and crashes on
    the three unbound ones; we validate up front.
    """
    if interval not in INTERVAL_SECONDS:
        raise ValueError(f"unknown interval {interval!r}; valid: {VALID_INTERVALS}")
    if rollups and interval in rollups:
        return rollups[interval]
    if interval == "1m":
        # raw relation, bucketed to the minute (the reference serves the
        # ohlcvs table directly; our tick stream needs the 1m bucketing).
        return ohlcv_rollup(ticks, "1m", **rollup_kwargs)
    return ohlcv_rollup(ticks, interval, **rollup_kwargs)


def _floor_minute(t) -> dt.datetime | None:
    """Normalize a request bound to minute precision (`readers.py:169-176`).

    Accepts epoch milliseconds (the reference's wire format), ISO strings,
    or datetimes.
    """
    if t is None:
        return None
    if isinstance(t, (int, float)):  # epoch milliseconds, the wire format
        t = dt.datetime.fromtimestamp(t / 1000.0, dt.timezone.utc).replace(tzinfo=None)
    elif isinstance(t, str):
        t = dt.datetime.fromisoformat(t)
    return t.replace(second=0, microsecond=0)


def _aligned_tick_bounds(interval, start, end):
    """The tick-level [lo, hi) window EXACTLY equivalent to the bucket
    bounds ``start ≤ bucket ≤ end`` for this interval's bucketing: since
    bucket(ts) is the largest bucket-aligned instant ≤ ts,

        bucket ≥ start ⟺ ts ≥ ceil_align(start)
        bucket ≤ end   ⟺ ts <  floor_align(end) + width

    Fixed widths align to TS_BUCKET_ORIGIN (Monday-aligned weeks included);
    '1M' aligns to calendar month starts. Naive datetimes, UTC semantics —
    the same frame the bucketing expressions use."""
    from ..functions.timeutils import TS_BUCKET_ORIGIN

    width = INTERVAL_SECONDS[interval]
    epoch = dt.datetime(1970, 1, 1)
    lo = hi = None
    if width is not None:
        # microsecond-exact arithmetic (r15 ADVICE): int(total_seconds())
        # truncated a sub-second start, widening the window by one leading
        # bucket vs the bucket-bound semantics. Integer microseconds keep
        # whole-second inputs bit-identical and make fractional inputs
        # exact (read_ohlcvs floors to the minute first, so this is a
        # direct-caller hardening, not a behavior change there).
        width_us = width * 1_000_000
        origin_us = TS_BUCKET_ORIGIN * 1_000_000
        if start is not None:
            e = (start - epoch) // dt.timedelta(microseconds=1)
            r = (e - origin_us) % width_us
            lo = epoch + dt.timedelta(
                microseconds=e if r == 0 else e - r + width_us
            )
        if end is not None:
            e = (end - epoch) // dt.timedelta(microseconds=1)
            f = e - ((e - origin_us) % width_us)
            hi = epoch + dt.timedelta(microseconds=f + width_us)
    else:  # calendar month
        if start is not None:
            if (start.day, start.hour, start.minute, start.second, start.microsecond) == (1, 0, 0, 0, 0):
                lo = start
            else:
                lo = (start.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
                      + dt.timedelta(days=32)).replace(day=1)
        if end is not None:
            hi = (end.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
                  + dt.timedelta(days=32)).replace(day=1)
    return lo, hi


def read_ohlcvs(
    ticks: DataFrame,
    symbol: str,
    interval: str = "1m",
    start=None,
    end=None,
    limit: int = 500,
    empty_ts: bool = False,
    key_col: str = "symbol",
    rollups: dict[str, DataFrame] | None = None,
    now=None,
    **rollup_kwargs,
) -> DataFrame:
    """Chart read: candles for one symbol at one interval, ASC by bucket,
    at most ``min(limit, 500)`` rows (the *latest* ones in range), optionally
    gap-filled.

    ``end`` defaults to one minute before ``now`` (`readers.py:171-175` —
    the reference always bounds the fetch at now-1min, floored to the
    minute); ``now`` defaults to the wall clock and exists so replays and
    oracles can pin it (the same determinism parameter as
    ``weekly_return``'s). The reference clamps only downward
    (``min(limit, 500)``, no lower bound): ``limit=0`` returns nothing and
    a negative limit is an error on both sides (PostgreSQL rejects
    ``LIMIT -1``; Spark rejects ``.limit(-1)``) — unlike the analytics
    readers (:func:`read_returns`), where -1 explicitly means "all".
    """
    limit = min(int(limit), MAX_LIMIT)  # `readers.py:168`
    start, end = _floor_minute(start), _floor_minute(end)
    if end is None:
        # `readers.py:171-175`: end = (now - 1 minute) floored to the minute
        if now is None:
            now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        end = _floor_minute(now) - dt.timedelta(minutes=1)

    # On the raw-rollup route, replace the post-agg bucket bounds with their
    # EXACT tick-level equivalents (guide §6): the bucket bounds sit on a
    # derived column (two to_unix_timestamp + mod chains per row, never
    # pushed to the scan), while ``bucket ≥ start ⟺ ts ≥ ceil_align(start)``
    # and ``bucket ≤ end ⟺ ts < floor_align(end) + width`` — because
    # bucket = align_floor(ts) is the largest aligned instant ≤ ts. The
    # replacement is bit-identical (every kept bucket aggregates its
    # complete tick set — the bounds are bucket-aligned so no bucket is
    # split), strictly cheaper per row (two plain timestamp compares), and
    # PushedFilters gains the ts range so a properly laid-out deployment
    # skips row groups outside the chart window instead of aggregating the
    # entire tick history.
    raw_route = not (rollups and interval in rollups)
    bucket_bounds_replaced = False
    if raw_route and (start is not None or end is not None):
        tick_time = rollup_kwargs.get("time_col", "ts")
        lo, hi = _aligned_tick_bounds(interval, start, end)
        if lo is not None:
            ticks = ticks.filter(F.col(tick_time) >= F.lit(lo))
        if hi is not None:
            ticks = ticks.filter(F.col(tick_time) < F.lit(hi))
        bucket_bounds_replaced = True
    rel = route_interval(ticks.filter(F.col(key_col) == symbol), interval,
                         rollups=rollups, keys=[key_col], **rollup_kwargs)
    if rollups and interval in rollups:
        rel = rel.filter(F.col(key_col) == symbol)
    # a materialized rollup carries its dt partition column: apply the
    # derived day bounds (Catalyst cannot infer them from `bucket` — dt is
    # a stored column) so the scan PRUNES instead of reading the rollup's
    # whole history, then drop dt from the serve schema
    has_dt = "dt" in rel.columns
    if start is not None and not bucket_bounds_replaced:
        rel = rel.filter(F.col("bucket") >= F.lit(start))
        if has_dt:
            from ..sources.store import utc_day

            rel = rel.filter(
                F.col("dt") >= utc_day(F.lit(start).cast("timestamp"))
            )
    if end is not None and not bucket_bounds_replaced:
        rel = rel.filter(F.col("bucket") <= F.lit(end))
        if has_dt:
            from ..sources.store import utc_day

            rel = rel.filter(
                F.col("dt") <= utc_day(F.lit(end).cast("timestamp"))
            )
    if has_dt:
        rel = rel.drop("dt")

    # DESC fetch with limit keeps the latest rows (`readers.py:194-195`),
    # then ASC re-sort for charting (`readers.py:242`).
    fetched = rel.orderBy(F.col("bucket").desc()).limit(limit)
    result = fetched.orderBy(F.col("bucket").asc())

    if empty_ts:
        # `readers.py:228-244`: the spine starts at min(FETCHED time) — not
        # at `start`, which only bounds the fetch — runs to `end` (trailing
        # gaps fill with dummies up to now-1min by default), and only its
        # latest `limit` grid points survive (the series is DESC-limited
        # before the join, so real rows older than the clamped spine drop
        # out). An empty fetch returns [] — there is no min to anchor at.
        single = result.drop(key_col)
        # limit=0: the fetch is empty, so the spine anchor (min fetched
        # time) is NULL and the series is empty either way — the reference's
        # `... DESC LIMIT 0` spine and this floor-of-1 both return [];
        # the floor just keeps gap_fill_series's >=1 validation for direct
        # callers intact
        filled = gap_fill_series(
            single, interval, end=end, series_limit=max(limit, 1)
        )
        return filled.withColumn(key_col, F.lit(symbol))
    return result


def read_returns(
    df: DataFrame,
    value_col: str,
    cutoff_upper_pct=None,
    cutoff_lower_pct=None,
    limit: int = 500,
) -> DataFrame:
    """The analytics-view reader (`readers.py:32-118`, ``read_geodr`` /
    ``read_wr``): optional extreme-value cutoffs, DESC by the return
    column, ``limit=-1`` returns ALL rows.

    Two reference idiosyncrasies reproduced deliberately (each pinned in
    tests/test_serve.py):

    - the cutoffs are tested for TRUTHINESS (``if cutoff_upper_pct and
      ...``), so a cutoff of ``0`` is silently ignored, exactly like
      ``None`` — a caller wanting "only negative returns" cannot express
      it, on either side;
    - unlike the chart reader there is NO 500 clamp: the default is 500
      but an explicit larger limit is honored, and ``-1`` means all rows
      (the chart reader would reject -1 — `readers.py:64-68` vs `:168`).
    """
    out = df
    if cutoff_upper_pct and cutoff_lower_pct:
        out = out.filter(
            (F.col(value_col) < F.lit(cutoff_upper_pct))
            & (F.col(value_col) > F.lit(cutoff_lower_pct))
        )
    elif cutoff_upper_pct:
        out = out.filter(F.col(value_col) < F.lit(cutoff_upper_pct))
    elif cutoff_lower_pct:
        out = out.filter(F.col(value_col) > F.lit(cutoff_lower_pct))
    out = out.orderBy(F.col(value_col).desc())
    if limit == -1:
        return out
    return out.limit(int(limit))
