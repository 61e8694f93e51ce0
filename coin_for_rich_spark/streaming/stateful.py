"""Custom stateful collector: per-key open-candle hold-back (S4).

Reference parity: the WS updater drains every sub-hash each cycle but always
EXCLUDES each key's newest timestamp — the still-forming candle — and
force-flushes anything held longer than ``DATA_HELD_MLS_THRESHOLD``
(`fetchers/ws/updater.py:140-241`, hold-back `:177-184`, stale flush
`:30,165-176`).

The watermarked window rollup (streaming.rollup) reproduces the *time-based*
version of this; the updater's actual rule is **data-driven** — a candle is
closed the moment a later candle for the *same key* appears, regardless of
any global watermark. That per-key logic is not expressible with built-in
window aggregates, so this is the one genuinely custom stateful operator:
``applyInPandasWithState`` with per-key state = the aggregates of the
still-open minutes.

Semantics per key and minute bucket:
- rows aggregate into (open@first-ts, high, low, close@last-ts, Σvolume, n);
- a bucket is EMITTED (append) once a strictly later bucket for the key
  arrives — the newest bucket is always held;
- with a processing-time timeout configured, held state older than the
  threshold is flushed on timeout (the stale-flush rule) — in bounded test
  replays the timeout never fires, matching the updater's behavior of never
  emitting the final open candle until more data arrives.

Volume is accumulated in integer cents (inputs are 2-decimal measures) so
the emitted sum is exact and engine-independent — same contract as the
decimal routing in the batch aggregates (functions.numbers).

Scale posture: state per key = the open buckets only (normally one), keyed
shuffle identical to any groupBy on the key — 1000-executor sharding comes
free; each micro-batch touches only keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bucket", T.TimestampType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("n_trades", T.LongType()),
    ]
)

# one parallel array entry per open bucket: minute index + running aggregates;
# emitted_max is the key's emit-once watermark (newest minute ever emitted)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("minutes", T.ArrayType(T.LongType())),
        T.StructField("open_ts", T.ArrayType(T.LongType())),
        T.StructField("open_v", T.ArrayType(T.DoubleType())),
        T.StructField("high", T.ArrayType(T.DoubleType())),
        T.StructField("low", T.ArrayType(T.DoubleType())),
        T.StructField("close_ts", T.ArrayType(T.LongType())),
        T.StructField("close_v", T.ArrayType(T.DoubleType())),
        T.StructField("vol_cents", T.ArrayType(T.LongType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("emitted_max", T.LongType()),
    ]
)

_MINUTE_US = 60_000_000

#: the reference's stale-flush threshold (`fetchers/ws/updater.py:30`):
#: candles held longer than this are force-emitted even with no later data
DATA_HELD_MS_THRESHOLD = 3_600_000


def _flush_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    stale_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    # rebuild the open-bucket dict (+ the emit-once watermark) from state
    open_buckets: dict[int, dict[str, Any]] = {}
    emitted_max: int | None = None
    if state.exists:
        (minutes, o_ts, o_v, hi, lo, c_ts, c_v, vc, n, emax) = state.get
        emitted_max = emax
        for i, m in enumerate(minutes):
            open_buckets[m] = dict(
                open_ts=o_ts[i], open_v=o_v[i], high=hi[i], low=lo[i],
                close_ts=c_ts[i], close_v=c_v[i], vol_cents=vc[i], n=n[i],
            )

    def _write_state(held: dict[int, dict[str, Any]], emax: int | None) -> None:
        state.update(
            (
                list(held),
                [b["open_ts"] for b in held.values()],
                [b["open_v"] for b in held.values()],
                [b["high"] for b in held.values()],
                [b["low"] for b in held.values()],
                [b["close_ts"] for b in held.values()],
                [b["close_v"] for b in held.values()],
                [b["vol_cents"] for b in held.values()],
                [b["n"] for b in held.values()],
                emax,
            )
        )

    if state.hasTimedOut:
        # stale flush: emit everything held; keep only the watermark
        # tombstone (no timeout re-armed) so a post-flush replay of the
        # same minutes cannot re-emit a partial duplicate
        emitted = sorted(open_buckets.items())
        if emitted:
            emitted_max = max(
                m for m, _ in emitted
            ) if emitted_max is None else max(emitted_max, emitted[-1][0])
            _write_state({}, emitted_max)
        elif emitted_max is not None:
            # tombstone-only state (every row of the last batch was
            # late-dropped): the watermark must survive the timeout, or a
            # replay of already-emitted minutes would re-emit duplicate
            # candles — keep the tombstone, don't re-arm the timeout
            _write_state({}, emitted_max)
        else:
            state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty and not open_buckets and emitted_max is None:
            return
        import numpy as np

        if not rows.empty:
            # event-time order within the batch (replay order across
            # batches is the source's responsibility); stable sort, so
            # equal-ts rows keep arrival order and the open/close tie
            # winner is deterministic for a given batch content
            rows = rows.sort_values("ts", kind="stable")
            # unit-safe epoch µs regardless of Arrow datetime resolution
            ts_us = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            price = rows["price"].to_numpy(dtype="float64")
            # per-row half-even cent rounding, then integer sums — identical
            # to the old per-row round(), exact and engine-independent
            cents = np.rint(
                rows["volume"].to_numpy(dtype="float64") * 100
            ).astype("int64")
            # vectorized per-minute aggregation over the ts-sorted arrays:
            # the minute column is non-decreasing, so each minute is one
            # contiguous run — ufunc.reduceat aggregates every run in C
            # (first/last on the sorted order reproduce the per-row
            # strict-</>= open/close tie rules), and the Python merge loop
            # runs over ~batch-minutes scalars
            minute = ts_us // _MINUTE_US
            starts = np.flatnonzero(np.r_[True, np.diff(minute) > 0])
            ends = np.r_[starts[1:], len(minute)] - 1
            merged = zip(
                minute[starts].tolist(),
                ts_us[starts].tolist(), price[starts].tolist(),
                np.maximum.reduceat(price, starts).tolist(),
                np.minimum.reduceat(price, starts).tolist(),
                ts_us[ends].tolist(), price[ends].tolist(),
                np.add.reduceat(cents, starts).tolist(),
                (ends - starts + 1).tolist(),
            )
            for m, ot, ov, hi, lo, ct, cv, vc, cnt in merged:
                if emitted_max is not None and m <= emitted_max:
                    # late-after-close: this minute was already emitted (by
                    # later data or a stale flush) — appending a second,
                    # partial candle row for the same (key, bucket) would
                    # corrupt an append sink, so the row is dropped, the
                    # same contract a watermarked rollup applies to
                    # late-past-watermark data
                    continue
                b = open_buckets.get(m)
                if b is None:
                    open_buckets[m] = dict(
                        open_ts=ot, open_v=ov, high=hi, low=lo,
                        close_ts=ct, close_v=cv, vol_cents=vc, n=cnt,
                    )
                else:
                    if ot < b["open_ts"]:
                        b["open_ts"], b["open_v"] = ot, ov
                    if ct >= b["close_ts"]:
                        b["close_ts"], b["close_v"] = ct, cv
                    b["high"] = max(b["high"], hi)
                    b["low"] = min(b["low"], lo)
                    b["vol_cents"] += vc
                    b["n"] += cnt
        if open_buckets:
            # the newest bucket stays open; everything older is closed by
            # the existence of later data for this key
            newest = max(open_buckets)
            emitted = sorted(
                (m, b) for m, b in open_buckets.items() if m != newest
            )
            held = {newest: open_buckets[newest]}
            if emitted:
                emitted_max = max(
                    emitted[-1][0],
                    emitted_max if emitted_max is not None else emitted[-1][0],
                )
        else:
            emitted = []
            held = {}
        _write_state(held, emitted_max)
        # arm the stale flush: without this the ProcessingTimeTimeout mode
        # never fires (state.hasTimedOut stays false forever) and held
        # candles would only ever close on later data
        if stale_ms is not None:
            state.setTimeoutDuration(stale_ms)

    if emitted:
        yield pd.DataFrame(
            {
                "symbol": [key[0]] * len(emitted),
                "bucket": [
                    pd.Timestamp(m * _MINUTE_US * 1000) for m, _ in emitted
                ],
                "open": [b["open_v"] for _, b in emitted],
                "high": [b["high"] for _, b in emitted],
                "low": [b["low"] for _, b in emitted],
                "close": [b["close_v"] for _, b in emitted],
                "volume": [b["vol_cents"] / 100.0 for _, b in emitted],
                "n_trades": [b["n"] for _, b in emitted],
            }
        )


def hold_back_collector(
    stream: DataFrame,
    key_col: str = "symbol",
    stale_timeout: bool = False,
    stale_ms: int = DATA_HELD_MS_THRESHOLD,
) -> DataFrame:
    """1-minute candles emitted per the updater's data-driven close rule.

    Input stream needs (key_col, ts, price, volume). With
    ``stale_timeout=True`` the production stale-flush applies: every state
    update arms a processing-time timeout of ``stale_ms`` (the reference's
    DATA_HELD_MLS_THRESHOLD, `updater.py:30,165-176`), so a candle held with
    no successor data is force-emitted once stale. Bounded deterministic
    replays leave it off so the final open candle is withheld exactly like
    the updater.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if stale_timeout
        else GroupStateTimeout.NoTimeout
    )
    effective_stale = stale_ms if stale_timeout else None

    def fn(key, pdfs, state):
        return _flush_fn(key, pdfs, state, stale_ms=effective_stale)

    return (
        stream.select(key_col, "ts", "price", "volume")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
        )
    )
