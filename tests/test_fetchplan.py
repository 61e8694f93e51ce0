"""Backfill fetch-plan semantics (sources.fetchplan, S1/S2)."""

from __future__ import annotations

from coin_for_rich_spark.sources import (
    build_fetch_plan,
    dead_letters,
    fetch_pages,
    synthetic_fetcher,
)

SYMS = [("bitfinex", "BTC-USD"), ("binance", "ETH-USDT")]
START = 1704067200000
END = START + 300 * 60000  # 300 minutes


def test_plan_pages_cover_span_exactly(spark):
    plan = build_fetch_plan(spark, SYMS, START, END, page_minutes=120)
    rows = sorted(
        (r.exchange, r.page_start_ms, r.page_end_ms) for r in plan.collect()
    )
    per_exchange = [r for r in rows if r[0] == "bitfinex"]
    # 300 minutes / 120-minute pages → 3 pages, last clamped
    assert [(s - START) // 60000 for _, s, _ in per_exchange] == [0, 120, 240]
    assert per_exchange[-1][2] == END
    assert len(rows) == 2 * 3


def test_fetch_normalizes_exchange_field_order(spark):
    """bitfinex's close/high swap must be invisible after normalization:
    same (symbol, minute) arithmetic ⇒ same candle regardless of exchange."""
    plan = build_fetch_plan(
        spark, [("bitfinex", "X-Y"), ("binance", "X-Y")], START, START + 5 * 60000, 5
    )
    out = fetch_pages(plan).collect()
    by_exchange = {}
    for r in out:
        by_exchange.setdefault(r.exchange, []).append(
            (r.time_ms, r.open, r.high, r.low, r.close, r.volume)
        )
    assert sorted(by_exchange["bitfinex"]) == sorted(by_exchange["binance"])
    # high/low actually bracket open/close (would fail if the swap leaked)
    for _, o, h, lo, c, _ in by_exchange["bitfinex"]:
        assert h >= max(o, c) and lo <= min(o, c)


def test_dead_letters_capture_failures_as_rows(spark):
    def flaky(exchange, symbol, s, e):
        if exchange == "binance":
            raise ValueError("HTTP 429")
        return synthetic_fetcher(exchange, symbol, s, e)

    plan = build_fetch_plan(spark, SYMS, START, END, page_minutes=150)
    errs = dead_letters(plan, flaky).collect()
    assert len(errs) == 2  # binance's two pages
    assert all(e.exception_class == "ValueError" for e in errs)
    assert all(e.exchange == "binance" for e in errs)
    assert all(e.time_frame == "1m" for e in errs)


def test_fetch_plan_validation_and_empty_span(spark):
    """Plan-build failures are driver-side ValueErrors with the cause named
    (not executor stack traces), and an empty span is an empty plan."""
    import pytest

    from coin_for_rich_spark.sources import build_fetch_plan

    syms = [("binance", "BTC-USD")]
    assert build_fetch_plan(spark, syms, 1000, 1000).count() == 0
    with pytest.raises(ValueError, match="inverted span"):
        build_fetch_plan(spark, syms, 2000, 1000)
    with pytest.raises(ValueError, match="page_minutes"):
        build_fetch_plan(spark, syms, 0, 1000, page_minutes=0)
    with pytest.raises(ValueError, match="kraken"):
        build_fetch_plan(spark, [("kraken", "BTC-USD")], 0, 1000)


def test_failing_page_dead_letters_instead_of_aborting(spark):
    """One bad page must not abort the backfill: its candles are absent,
    its dead-letter row present — both from ONE fetch pass over the
    combined relation."""
    from coin_for_rich_spark.sources import build_fetch_plan
    from coin_for_rich_spark.sources.fetchplan import (
        fetch_pages_combined,
        split_fetch_results,
        synthetic_fetcher,
    )

    def flaky(exchange, symbol, start_ms, end_ms):
        if start_ms == 60_000_000:  # exactly one page fails
            raise RuntimeError("HTTP 429 too many requests")
        return synthetic_fetcher(exchange, symbol, start_ms, end_ms)

    plan = build_fetch_plan(
        spark, [("binance", "BTC-USD")], 0, 3 * 60_000_000, page_minutes=1000
    )
    combined = fetch_pages_combined(plan, flaky).persist()
    candles, errors = split_fetch_results(combined)
    try:
        n_candles = candles.count()
        errs = errors.collect()
    finally:
        combined.unpersist()
    assert n_candles == 2000  # pages 1 and 3 of 3 × 1000 minutes
    assert len(errs) == 1
    e = errs[0]
    assert (e.exception_class, e.start_ms) == ("RuntimeError", 60_000_000)
    assert "429" in e.message
