"""Flow-control contract pins (sources/ratelimit.py) — deterministic
twins of the reference's Redis-backed limiters: GCRA
(``fetchers/utils/ratelimit.py:14-95``), the sliding-window throttler
(``:97-160``), and the Binance request-weight budget
(``fetchers/rest/binance.py:57-158``). Every pin drives the state machine
with an injected clock; no sleeping, no Redis."""

from __future__ import annotations

import pytest

from coin_for_rich_spark.sources.ratelimit import (
    GCRARateLimiter,
    RequestWeightManager,
    SlidingWindowThrottler,
    binance_weight_manager,
    gcra_dispatch_schedule,
)


# ------------------------------------------------------------------ GCRA


def test_gcra_burst_then_steady_spacing():
    """rate_limit=4/period=2: burst capacity 4 at the window open, then
    exactly increment (0.5 s) between admissions."""
    rl = GCRARateLimiter(rate_limit=4, period=2.0)
    # burst: 4 back-to-back admits at t=0
    for _ in range(4):
        ok, retry = rl.check(0.0)
        assert ok and retry is None
    # 5th at t=0 is limited, retry_after = allowed_at - now = 0.5
    ok, retry = rl.check(0.0)
    assert not ok
    assert retry == pytest.approx(0.5)
    # waiting exactly retry_after admits; the next admission is another
    # increment later
    ok, _ = rl.check(0.0 + retry)
    assert ok
    ok, retry2 = rl.check(0.0 + retry)
    assert not ok and retry2 == pytest.approx(0.5)


def test_gcra_idle_credit_regrows():
    """After a full idle period the burst credit is back (TAT clamps
    forward to now — the reference's max(stored, t))."""
    rl = GCRARateLimiter(rate_limit=2, period=1.0)
    assert rl.check(0.0)[0] and rl.check(0.0)[0]
    assert not rl.check(0.0)[0]
    # idle > period: full burst again
    assert rl.check(10.0)[0] and rl.check(10.0)[0]
    assert not rl.check(10.0)[0]


def test_gcra_steady_rate_is_exact():
    """Admitting as soon as allowed sustains exactly rate_limit/period:
    the k-th admission (0-based, after burst) lands at (k+1)*inc - P."""
    rl = GCRARateLimiter(rate_limit=5, period=1.0)
    t, admitted_at = 0.0, []
    while len(admitted_at) < 25:
        ok, retry = rl.check(t)
        if ok:
            admitted_at.append(t)
        else:
            t += retry
    for a, b in zip(admitted_at[5:], admitted_at[6:]):
        assert b - a == pytest.approx(0.2)
    # 25 admissions at 5/s starting with a 5-burst: last at (25-5)*0.2
    assert admitted_at[-1] == pytest.approx(4.0)


def test_gcra_rejects_invalid_params():
    with pytest.raises(ValueError):
        GCRARateLimiter(rate_limit=0, period=1.0)
    with pytest.raises(ValueError):
        GCRARateLimiter(rate_limit=1, period=-1.0)


# ------------------------------------------------- sliding-window throttler


def test_throttler_rejects_invalid_params():
    """Mirror of GCRA's validation: rate_limit < 1 would fall through the
    capacity check onto an empty deque (IndexError) instead of a clear
    contract error."""
    with pytest.raises(ValueError):
        SlidingWindowThrottler(rate_limit=0, period=10.0)
    with pytest.raises(ValueError):
        SlidingWindowThrottler(rate_limit=3, period=0.0)
    with pytest.raises(ValueError):
        SlidingWindowThrottler(rate_limit=-1, period=-5.0)


def test_throttler_window_slides():
    th = SlidingWindowThrottler(rate_limit=3, period=10.0)
    for t in (0.0, 1.0, 2.0):
        assert th.check(t)[0]
    ok, retry = th.check(3.0)
    assert not ok
    assert retry == pytest.approx(7.0)
    # retrying at EXACTLY now + retry_after admits (the >= eviction that
    # keeps wait(retry_after) from livelocking at the boundary — the
    # reference's strict '>' is unobservable against a real clock)
    assert th.check(3.0 + retry)[0]
    assert th.in_window == 3


def test_throttler_retry_is_head_expiry():
    th = SlidingWindowThrottler(rate_limit=1, period=5.0)
    assert th.check(2.0)[0]
    ok, retry = th.check(4.0)
    assert not ok and retry == pytest.approx(3.0)  # head 2.0 + 5 - 4
    assert th.check(4.0 + retry)[0]  # the hint is admissible, exactly


# ------------------------------------------------------ weight manager


def test_weight_manager_budget_and_window_reset():
    wm = RequestWeightManager(weight_limit=10, period=60.0)
    assert wm.check(4, now=0.0)[0]
    assert wm.check(4, now=1.0)[0]
    assert wm.remaining == 2
    ok, retry = wm.check(4, now=2.0)  # 2 left, need 4
    assert not ok
    assert retry == pytest.approx(58.0)  # period - (now - window_start)
    # sleeping exactly retry_after lands on the window boundary and the
    # >= reset admits there (no boundary livelock); just before it the
    # budget is still exhausted
    assert not wm.check(4, now=59.9)[0]
    assert wm.check(4, now=2.0 + retry)[0]
    assert wm.remaining == 6


def test_weight_manager_small_requests_drain_exactly():
    wm = RequestWeightManager(weight_limit=5, period=1.0)
    admitted = sum(1 for _ in range(8) if wm.check(1, now=0.0)[0])
    assert admitted == 5


def test_binance_weight_manager_constants():
    """The reference instantiation: 1200 units / 60 s (binance.py:44)."""
    wm = binance_weight_manager()
    assert wm.weight_limit == 1200 and wm.period == 60.0
    # an OHLCV klines page costs weight 1 -> 1200 pages per window
    admitted = sum(1 for _ in range(1300) if wm.check(1, now=0.0)[0])
    assert admitted == 1200


# ------------------------------------------- Spark dispatch schedule


def test_gcra_dispatch_schedule_matches_serial_state_machine(spark):
    """The closed-form schedule column equals running the serial GCRA
    state machine over the same backlog, per limiter key."""
    from coin_for_rich_spark.sources.fetchplan import build_fetch_plan

    symbols = [("binance", "BTCUSDT"), ("binance", "ETHUSDT"),
               ("bitfinex", "tBTCUSD")]
    plan = build_fetch_plan(
        spark, symbols, start_ms=0, end_ms=20 * 60_000, page_minutes=5
    )
    rate, period = 3.0, 2.0
    sched = gcra_dispatch_schedule(plan, rate, period).toPandas()
    for exch, grp in sched.groupby("exchange"):
        grp = grp.sort_values(["symbol", "page_start_ms"]).reset_index(drop=True)
        rl = GCRARateLimiter(rate_limit=rate, period=period)
        t = 0.0
        for _, row in grp.iterrows():
            while True:
                ok, retry = rl.check(t)
                if ok:
                    break
                t += retry
            assert row.dispatch_offset_s == pytest.approx(t), (
                exch, row.symbol, row.page_start_ms
            )


def test_gcra_dispatch_schedule_burst_shape(spark):
    df = spark.createDataFrame(
        [("e", f"s{i:02d}", 0) for i in range(10)],
        "exchange string, symbol string, page_start_ms long",
    )
    out = gcra_dispatch_schedule(df, rate_limit=4, period=2.0).toPandas()
    offs = sorted(out.dispatch_offset_s)
    assert offs[:4] == [0.0] * 4  # burst credit
    assert offs[4:] == pytest.approx([0.5 * i for i in range(1, 7)])


def test_gcra_dispatch_schedule_invalid_params(spark):
    df = spark.createDataFrame([("e", "s", 0)],
                               "exchange string, symbol string, page_start_ms long")
    with pytest.raises(ValueError):
        gcra_dispatch_schedule(df, rate_limit=0, period=1.0)
