"""Ingest-rounding parity: the reference rounds every OHLCV value at parse
time (`common/helpers/numbers.py:7-23` — ``round(Decimal(value), n)``,
half-even) with TYPE-carried semantics: a float rounds its binary expansion
(bitfinex JSON numbers), a string rounds the exact decimal it spells
(binance/bittrex price strings, the WS updater's ``;;``-split wire fields,
`fetchers/ws/updater.py:84-88`). These tests pin the engine's two twins —
``round_decimal_parity`` (scalar, both type regimes) and ``round_wire``
(column algebra, string regime) — against Python's Decimal and DuckDB's
native ``round_even``, three independent implementations."""

from __future__ import annotations

import random
from decimal import Decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from coin_for_rich_spark.functions.numbers import (
    round_decimal_parity,
    round_wire,
)

# deterministic edge set: exact ties at position 5 (half-even both ways),
# near-ties one ulp off, negatives (half-even on magnitude), zero-pads,
# scale longer/shorter than 4, and integer strings
EDGE_STRINGS = [
    "0.12345", "0.12335", "-0.12345", "-0.12335",
    "2.67555", "2.675", "37.3", "0", "12", "-7.00005",
    "0.00005", "0.00015", "0.000049999999", "0.000050000001",
    "123456789.123456789", "-123456789.987654321",
    "0.5", "0.49999", "99999.99995", "1.00005",
]


def _random_decimal_strings(n: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        scale = rng.randint(0, 10)
        digits = rng.randint(1, 12)
        mag = rng.randint(0, 10**digits - 1)
        sign = "-" if rng.random() < 0.3 else ""
        s = str(mag)
        if scale:
            s = s.rjust(scale + 1, "0")
            s = f"{s[:-scale]}.{s[-scale:]}"
        out.append(sign + s)
    return out


ALL_STRINGS = EDGE_STRINGS + _random_decimal_strings(300)


def test_round_wire_matches_python_and_duckdb_three_ways(spark):
    """(Spark cast→bround) ≡ (Python round(Decimal(s), 4)) ≡ (DuckDB
    round_even) on every edge and 300 seeded random decimal strings —
    three independent implementations of the updater's ingest rounding."""
    py = [round_decimal_parity(s, 4) for s in ALL_STRINGS]

    df = spark.createDataFrame([(s,) for s in ALL_STRINGS], "v string")
    got = [
        r.r
        for r in df.select(round_wire("v", 4).alias("r"))
        .toPandas()
        .itertuples()
    ]
    assert got == py, "Spark round_wire diverges from Python Decimal"

    # DuckDB's native round_even converts to DOUBLE first (probed: its
    # return type is DOUBLE, so '1.00005' rounds via the binary value
    # 1.0000500000000000167 → 1.0001) and its decimal→decimal cast
    # TRUNCATES — so the third leg builds exact decimal half-even from
    # primitive exact decimal arithmetic instead: split |x|·10⁴ into
    # floor + remainder (both exact decimals), bump on r>½ or the
    # half-even tie, re-sign.
    con = duckdb.connect()
    half_even_sql = """
        with t as (select cast(? as decimal(38,18)) x),
        s as (select x, abs(x) * 10000 y from t),
        p as (select x, cast(floor(y) as hugeint) q, y - floor(y) r from s)
        select cast(
            sign(x) * (q + case when r > 0.5 then 1
                               when r < 0.5 then 0
                               else q % 2 end) / 10000.0 as double)
        from p
    """
    duck = [con.execute(half_even_sql, [s]).fetchone()[0] for s in ALL_STRINGS]
    assert duck == py, "DuckDB exact-decimal leg diverges from Python Decimal"


def test_round_decimal_parity_type_carries_semantics():
    """The reference's float-vs-string split: Decimal(2.675) is 2.67499…
    so the FLOAT rounds down; the STRING "2.675" is an exact tie and
    rounds half-even UP to 2.68. Both are the reference's own arithmetic
    (`numbers.py:7-23`), so the engine must preserve the input type."""
    assert round_decimal_parity(2.675, 2) == 2.67
    assert round_decimal_parity("2.675", 2) == 2.68
    # exact binary tie: 0.03125 = 1/32 terminates at position 5 → the
    # float IS the tie and rounds half-even in both regimes
    assert round_decimal_parity(0.03125, 4) == 0.0312
    assert round_decimal_parity("0.03125", 4) == 0.0312
    assert round_decimal_parity(None, 4) is None


def test_parse_wire_candles_reference_ingest_rounding(spark):
    """End-to-end: a >4-decimal wire candle parses to the updater's
    4-decimal values when round_decimals=4, and stays lossless by
    default; an out-of-decimal-range value dead-letters instead of
    parsing when rounding is on."""
    from coin_for_rich_spark.streaming.source import parse_wire_candles

    wires = [
        ("A", "1704067200000;;0.12345;;2.67555;;0.12335;;1.00005;;5.5"),
        ("B", "1704067260000;;1e30;;1;;1;;1;;1"),  # beyond decimal(38,18)
    ]
    df = spark.createDataFrame(wires, "symbol string, wire string")

    parsed, dead = parse_wire_candles(df, round_decimals=4)
    rows = {r.symbol: r for r in parsed.collect()}
    assert set(rows) == {"A"}
    a = rows["A"]
    assert (a.open, a.high, a.low, a.close, a.volume) == (
        0.1234, 2.6756, 0.1234, 1.0, 5.5
    )
    assert [r.symbol for r in dead.collect()] == ["B"]

    # default stays the engine's lossless round-trip: 1e30 parses fine
    parsed_raw, dead_raw = parse_wire_candles(df)
    assert parsed_raw.count() == 2 and dead_raw.count() == 0
    raw_a = {r.symbol: r for r in parsed_raw.collect()}["A"]
    assert raw_a.open == 0.12345


def test_round_wire_deep_fraction_dead_letters(spark):
    """Strings needing >18 significant fractional digits must yield NULL,
    not a silently mis-rounded value: Spark's decimal cast half-up-rounds
    the tail first, which can MANUFACTURE an exact half-even tie at the
    target decimal ('5.000000000000001E-5' → cast 0.000050000000000000 →
    bround 0.0, where the reference's unbounded Decimal gives 0.0001).
    Exponent-aware: '10e-19' IS representable at scale 18 and must parse."""
    cases = [
        # (wire string, expected)
        ("5.000000000000001E-5", None),  # 20 effective frac digits
        ("0.0000500000000000000001", None),  # literal deep tail
        ("0.000050000000000000000000", 0.0),  # trailing zeros: exact tie
        ("10e-19", 0.0),  # = 1e-18, representable, rounds to 0
        ("1e-19", None),  # below scale 18: lossy, dead-letter
        ("1.5e3", 1500.0),  # positive exponent: integral, exact
        ("0.00005", 0.0),  # the plain tie: half-even DOWN at 4
        ("0.00015", 0.0002),  # tie: half-even UP
        ("nonsense", None),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "v string")
    got = [
        r.r for r in df.select(round_wire("v", 4).alias("r")).collect()
    ]
    want = [e for _, e in cases]
    assert got == want, f"{got} != {want}"
    # parity on everything that parses: same answers as round(Decimal(s), 4)
    for s, e in cases:
        if e is not None:
            assert round_decimal_parity(s, 4) == e


def test_dead_letter_status_out_of_smallint_never_aborts(spark):
    """A fetcher exception carrying a C-library/gRPC-style .code outside
    int16 (or nan) must still produce a dead-letter ROW — the error path
    is data, never a job abort (Arrow smallint conversion would raise)."""
    from coin_for_rich_spark.sources import build_fetch_plan, dead_letters

    class BigCode(RuntimeError):
        code = 4294967295

    class NanStatus(RuntimeError):
        status = float("nan")

    for exc_cls in (BigCode, NanStatus):

        def fetcher(exchange, symbol, s, e, _c=exc_cls):
            raise _c("boom")

        plan = build_fetch_plan(
            spark, [("binance", "Z")], 0, 60_000, page_minutes=1
        )
        rows = dead_letters(plan, fetcher).collect()
        assert len(rows) == 1
        assert rows[0].exception_class == exc_cls.__name__
        assert rows[0].resp_status_code is None


def test_fetch_parse_rounds_like_reference_rest(spark):
    """The REST parse rounds o/h/l/c/v to 2 decimals at ingest
    (`rest/binance.py:296-301` et al.) with type-carried semantics; the
    page timestamp is never rounded."""
    from coin_for_rich_spark.sources import build_fetch_plan
    from coin_for_rich_spark.sources.fetchplan import fetch_pages

    def fetcher(exchange, symbol, s, e):
        # binance field order: t, o, h, l, c, v — strings round exactly,
        # floats round their binary value
        return [(s, "2.675", 3.999, 2.675, "3.0001", 7.0)]

    plan = build_fetch_plan(
        spark, [("binance", "Z")], 0, 60_000, page_minutes=1
    )
    row = fetch_pages(plan, fetcher).collect()[0]
    assert row.time_ms == 0
    assert row.open == 2.68  # string: exact tie, half-even up
    assert row.low == 2.67  # float: binary 2.67499…, down
    assert row.high == 4.0 and row.close == 3.0 and row.volume == 7.0


def test_dead_letter_carries_section_and_status(spark):
    """ohlcvs_errors parity (`create.sql:32-42`): ohlcv_section and
    resp_status_code ride the dead-letter row when available."""
    from coin_for_rich_spark.sources import build_fetch_plan, dead_letters

    class Ratelimited(RuntimeError):
        resp_status_code = 429

    def fetcher(exchange, symbol, s, e):
        raise Ratelimited("too many requests")

    plan = build_fetch_plan(
        spark, [("binance", "Z")], 0, 60_000, page_minutes=1
    )
    errs = dead_letters(plan, fetcher, ohlcv_section="hist").collect()
    assert len(errs) == 1
    e = errs[0]
    assert e.exception_class == "Ratelimited"
    assert e.ohlcv_section == "hist"
    assert e.resp_status_code == 429
    assert e.time_frame == "1m"

    def plain_fail(exchange, symbol, s, e):
        raise ValueError("no status here")

    e2 = dead_letters(plan, plain_fail).collect()[0]
    assert e2.resp_status_code is None and e2.ohlcv_section is None
