"""Bucketed range join: point-in-interval matching as an EQUI-join.

The naive ``points JOIN intervals ON ts BETWEEN start AND end`` has no
equality predicate, so Spark plans a BroadcastNestedLoopJoin — O(n·m)
comparisons and a broadcast of a whole side, the classic Spark range-join
failure mode (engines with dedicated range-join optimizers — the
TimescaleDB side of the reference gets this from its time index — don't
have this cliff; on Spark you build the equality yourself).

The standard fix, implemented here: pick a bucket width ``W``, explode
every interval into the time buckets it covers (≤ len/W + 1 rows each),
map every point to its single bucket, equi-join on the bucket key (+ any
extra equality keys), and keep the residual ``BETWEEN`` predicate. The
plan becomes a plain shuffled hash/sort-merge join whose cost follows
bucket occupancy; matches can't duplicate because each (point, interval)
pair meets in exactly the point's one bucket.

Choosing ``W``: near the TYPICAL interval length. Too small explodes long
intervals into many rows (the expansion is interval-length/W per row —
bounded and linear, but real); too large puts many points and intervals
in each bucket and the residual filter does the work. Both failure modes
degrade gracefully toward the naive cost, never past it. A long-tail mix
(mostly short intervals, a few huge ones) is the one shape needing care:
split the intervals by length and run two bucketed joins at different
widths, unioned — same operator, two calls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _bucket_col(df: DataFrame, colname: str, w: int) -> Column:
    """Floor-division bucket id, EXACT for integral time columns: a long
    epoch-nanos column (~1.7e18) is beyond double's 2^53 integer range, so
    the double round-trip can floor a boundary value into the wrong bucket
    and silently drop the match. pmod + `div` stay in 64-bit integers;
    timestamps/doubles keep the double path (epoch seconds are far inside
    2^53)."""
    if isinstance(
        df.schema[colname].dataType, (T.LongType, T.IntegerType, T.ShortType)
    ):
        return F.expr(f"(`{colname}` - pmod(`{colname}`, {w})) div {w}")
    return F.floor(F.col(colname).cast("double") / w).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
    max_interval_buckets: int = 1_000_000,
) -> DataFrame:
    """Join each point to every interval containing it (``start <= ts <
    end``, the half-open convention every bucketing operator here uses),
    optionally also equating the ``on`` key columns.

    Returns points columns + interval columns (minus the join keys'
    duplicates). ``how='inner'`` keeps matched points; ``'left'`` keeps
    unmatched points with null interval columns.

    ``max_interval_buckets`` fails loud on runaway explosion: ONE interval
    with a far-future sentinel end (9999-12-31 as "no end") would otherwise
    materialize a multi-million-element sequence per row — an executor OOM
    or Spark's hard sequence-length error deep in the job instead of an
    explanation. Encode open-ended intervals with a bounded horizon, or
    raise the cap deliberately.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    on = list(on or [])
    overlap = set(points.columns) & set(intervals.columns) - set(on)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: rename one side or add "
            "them to `on`"
        )
    w = int(bucket_seconds)
    if w < 1:
        raise ValueError("bucket_seconds must be >= 1")

    p_bucket = _bucket_col(points, point_ts, w)
    i_start = _bucket_col(intervals, start_col, w)
    # an interval ending exactly on a bucket boundary explodes one bucket
    # it can't match (half-open end) — deliberately NOT corrected with an
    # epsilon: under double rounding an epsilon can floor the last bucket
    # one too low and silently DROP matches, while the extra bucket row is
    # always removed by the residual `ts < end` predicate
    i_end = _bucket_col(intervals, end_col, w)

    n_buckets = F.greatest(i_end, i_start) - i_start + F.lit(1)
    seq = F.when(
        n_buckets > F.lit(int(max_interval_buckets)),
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join: one interval spans more than "
                    f"{int(max_interval_buckets)} buckets of {w}s ("
                ),
                n_buckets.cast("string"),
                F.lit(
                    ") — a sentinel 'no end' date? widen bucket_seconds, "
                    "bound the horizon, or raise max_interval_buckets"
                ),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(i_start, F.greatest(i_end, i_start)))
    pts = points.withColumn("_rj_bucket", p_bucket)
    ivs = intervals.withColumn("_rj_bucket", F.explode(seq))
    cond = [pts["_rj_bucket"] == ivs["_rj_bucket"]] + [
        pts[c] == ivs[c] for c in on
    ]
    residual = (pts[point_ts] >= ivs[start_col]) & (pts[point_ts] < ivs[end_col])
    joined = pts.join(ivs, cond + [residual], how)
    keep = [pts[c] for c in points.columns] + [
        ivs[c] for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)
