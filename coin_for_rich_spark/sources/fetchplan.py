"""Historical-backfill fetch plan: the REST work queue, Spark-native (S1/S2).

Reference parity: the producer seeds a Redis set with
``symbol;;start_ms;;end_ms;;tf;;limit;;sort`` page params and a consumer pops
batches of 500, fetches concurrently, and re-queues the remainder
(`fetchers/rest/bitfinex.py:492-589`, pagination-by-advancing-start
`:429-433,485-490`); parsed rows differ per exchange (bitfinex swaps the
close/high positions `bitfinex.py:195-245`, binance is positional
`binance.py:273-302`, bittrex keys by name `bittrex.py:170-201`); failures
land in ``ohlcvs_errors`` (`create.sql:32-42`).

Spark-first re-expression: the queue choreography *is* the task scheduler.
``build_fetch_plan`` enumerates every (symbol, page) with ``sequence`` +
``explode`` — a distributed relation, not a driver loop — and
``fetch_pages`` maps each page through a fetcher with ``mapInPandas``
(Arrow-batched; one HTTP client per partition in production). Spark's retry +
checkpoint machinery replaces the tofetch/fetching crash-recovery sets
(`base.py:230-241`). Rows that fail to parse become dead-letter rows in the
``ohlcvs_errors`` shape instead of aborting the job.

The container has no network, so the default fetcher is a deterministic
synthetic one (pure arithmetic on (symbol, minute) — reproducible in any
engine); swap in a real HTTP fetcher with the same signature in production.

Scale posture: the plan is ~|symbols| × |pages| rows — repartitioned so page
fetches spread evenly; each output candle batch is bounded by
``limit`` rows per page, so executor memory is bounded regardless of the
backfill span.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numbers import round_decimal_parity

#: Per-exchange positional layout of a raw candle record (S1 parse parity:
#: bitfinex swaps close and high — `fetchers/rest/bitfinex.py:195-245`).
EXCHANGE_FIELD_ORDER: dict[str, tuple[str, ...]] = {
    "bitfinex": ("time_ms", "open", "close", "high", "low", "volume"),
    "binance": ("time_ms", "open", "high", "low", "close", "volume"),
    "bittrex": ("time_ms", "open", "high", "low", "close", "volume"),
}

CANDLE_SCHEMA = (
    "exchange string, symbol string, time_ms long, "
    "open double, high double, low double, close double, volume double"
)

# the reference's ohlcvs_errors shape (`create.sql:32-42`): ohlcv_section
# (bitfinex's hist/last split, NULL elsewhere) and resp_status_code (the
# HTTP status when the failure was an HTTP response, `base.py:make_error_
# tuple` callers) ride along as nullable columns
ERROR_SCHEMA = (
    "exception_class string, exchange string, symbol string, "
    "start_ms long, end_ms long, time_frame string, "
    "ohlcv_section string, resp_status_code smallint, message string"
)

# one relation carrying BOTH outcomes of a page fetch: candle rows with the
# error fields null, or one error row per failed page with the candle
# fields null — so candles and dead letters come from ONE fetch pass
COMBINED_SCHEMA = (
    CANDLE_SCHEMA
    + ", exception_class string, start_ms long, end_ms long, "
    "time_frame string, ohlcv_section string, resp_status_code smallint, "
    "message string"
)

MINUTE_MS = 60_000


def build_fetch_plan(
    spark: SparkSession,
    symbols: list[tuple[str, str]],
    start_ms: int,
    end_ms: int,
    page_minutes: int = 1000,
) -> DataFrame:
    """Enumerate fetch pages: one row per (exchange, symbol, page window).

    Pages advance by ``page_minutes`` (the reference's candles-per-request,
    9500 for bitfinex / 1000 for binance, `bitfinex.py:36`, `binance.py:42`);
    the last page is clamped to ``end_ms``. Built with sequence+explode so
    the plan itself is distributed.
    """
    if page_minutes < 1:
        raise ValueError(f"page_minutes must be >= 1, got {page_minutes}")
    if end_ms < start_ms:
        raise ValueError(
            f"inverted span: start_ms={start_ms} > end_ms={end_ms}"
        )
    unknown = {e for e, _ in symbols} - set(EXCHANGE_FIELD_ORDER)
    if unknown:
        raise ValueError(
            f"no field-order mapping for exchange(s) {sorted(unknown)} — "
            "failing at plan build beats a KeyError inside an executor "
            "after the cluster spun up"
        )
    page_ms = page_minutes * MINUTE_MS
    sym = spark.createDataFrame(symbols, "exchange string, symbol string")
    if end_ms == start_ms:
        # a legitimate nothing-to-backfill request: an EMPTY plan, not a
        # runtime 'Illegal sequence boundaries' error from an executor
        return (
            # explicit long casts: for small values F.lit infers
            # IntegerType, which would fork this schema from the normal
            # plan path's long page bounds and break a union of plans
            sym.withColumn("page_start_ms", F.lit(start_ms).cast("long"))
            .withColumn("page_end_ms", F.lit(end_ms).cast("long"))
            .limit(0)
        )
    return (
        sym.withColumn(
            "page_start_ms",
            F.explode(
                F.sequence(F.lit(start_ms), F.lit(end_ms - 1), F.lit(page_ms))
            ),
        )
        .withColumn(
            "page_end_ms",
            F.least(F.col("page_start_ms") + page_ms, F.lit(end_ms)),
        )
        .repartition("exchange", "symbol", "page_start_ms")
    )


def synthetic_fetcher(
    exchange: str, symbol: str, page_start_ms: int, page_end_ms: int
) -> list[tuple]:
    """Deterministic stand-in for one REST page fetch: one candle per minute,
    values from pure integer arithmetic (engine-reproducible). Returns raw
    positional records in the exchange's field order."""
    order = EXCHANGE_FIELD_ORDER[exchange]
    out = []
    for t in range(page_start_ms, page_end_ms, MINUTE_MS):
        minute = t // MINUTE_MS
        base = (minute * 37 + len(symbol) * 13) % 1000
        named = {
            "time_ms": t,
            "open": base / 10.0,
            "high": (base + 5) / 10.0,
            "low": (base - 5) / 10.0,
            "close": (base + 1) / 10.0,
            "volume": float(minute % 100),
        }
        out.append(tuple(named[f] for f in order))
    return out


def fetch_pages_combined(
    plan: DataFrame,
    fetcher: Callable[[str, str, int, int], list[tuple]] = synthetic_fetcher,
    time_frame: str = "1m",
    round_decimals: int | None = 2,
    ohlcv_section: str | None = None,
) -> DataFrame:
    """Execute the fetch plan ONCE, emitting both outcomes as data
    (``COMBINED_SCHEMA``): a page that fetches yields its candle rows
    (error fields null); a page that raises yields ONE dead-letter row in
    the ``ohlcvs_errors`` shape (candle fields null) — failures are data,
    never a job abort (the reference's error-table contract,
    `create.sql:32-42`). ``fetch_pages`` / ``dead_letters`` are projections
    of this relation; callers needing both persist it once and split.

    ``round_decimals`` is the reference's REST parse rounding —
    ``round_decimal(value)`` at its 2-decimal default on every o/h/l/c/v
    (`rest/binance.py:296-301`, `rest/bitfinex.py:224-232`,
    `rest/bittrex.py:190-196`; helper `common/helpers/numbers.py:7-23`) —
    applied with exact type-carried semantics: a fetcher returning floats
    (bitfinex's JSON numbers) rounds the binary value, one returning
    decimal STRINGS (binance/bittrex price strings) rounds the exact
    decimal, both half-even. ``None`` disables. ``ohlcv_section`` fills the
    error rows' section column (bitfinex's hist/last split); a failure
    whose exception carries a ``resp_status_code`` attribute (or
    urllib-style ``code``/``status``) lands it in the status column.

    Arrow-batched ``mapInPandas``, one yield per PAGE: output memory is
    bounded by a single page's candles regardless of how many plan rows
    share an input batch (accumulating a whole batch's pages buffered
    millions of rows before the old single yield).
    """

    candle_cols = [
        "exchange", "symbol", "time_ms", "open", "high", "low", "close",
        "volume", "exception_class", "start_ms", "end_ms", "time_frame",
        "ohlcv_section", "resp_status_code", "message",
    ]
    value_fields = ("open", "high", "low", "close", "volume")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                order = EXCHANGE_FIELD_ORDER[r.exchange]
                try:
                    recs = fetcher(
                        r.exchange, r.symbol,
                        int(r.page_start_ms), int(r.page_end_ms),
                    )
                    rows = []
                    for rec in recs:
                        named = dict(zip(order, rec))
                        if round_decimals is not None:
                            for f in value_fields:
                                named[f] = round_decimal_parity(
                                    named[f], round_decimals
                                )
                        rows.append(
                            (
                                r.exchange, r.symbol, int(named["time_ms"]),
                                named["open"], named["high"], named["low"],
                                named["close"], named["volume"],
                                None, None, None, None, None, None, None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — dead-letter it
                    # clamp the probe to the smallint column's range: .code/
                    # .status attrs also carry C-library/gRPC-style codes
                    # (e.g. 4294967295) that would abort the whole job at
                    # Arrow conversion — a dead-letter path must never raise.
                    # Non-HTTP-shaped codes still land in `message`.
                    status = None
                    for a in ("resp_status_code", "code", "status"):
                        v = getattr(exc, a, None)
                        if isinstance(v, bool) or not isinstance(
                            v, (int, float)
                        ):
                            continue
                        try:
                            iv = int(v)
                        except (ValueError, OverflowError):
                            continue  # nan/inf-shaped codes
                        if 0 <= iv <= 32767:
                            status = iv
                            break
                    rows = [
                        (
                            r.exchange, r.symbol, None,
                            None, None, None, None, None,
                            type(exc).__name__,
                            int(r.page_start_ms), int(r.page_end_ms),
                            time_frame, ohlcv_section, status,
                            str(exc)[:500],
                        )
                    ]
                if rows:
                    yield pd.DataFrame(rows, columns=candle_cols)

    return plan.mapInPandas(run, schema=COMBINED_SCHEMA)


def split_fetch_results(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(candles, dead_letters) projections of a ``fetch_pages_combined``
    relation — persist the input first when consuming both, so the fetch
    runs once."""
    candles = combined.filter(F.col("exception_class").isNull()).select(
        "exchange", "symbol", "time_ms", "open", "high", "low", "close",
        "volume",
    )
    errors = combined.filter(F.col("exception_class").isNotNull()).select(
        "exception_class", "exchange", "symbol", "start_ms", "end_ms",
        "time_frame", "ohlcv_section", "resp_status_code", "message",
    )
    return candles, errors


def fetch_pages(
    plan: DataFrame,
    fetcher: Callable[[str, str, int, int], list[tuple]] = synthetic_fetcher,
) -> DataFrame:
    """Execute the fetch plan: each page row → normalized candle rows.

    A failing page contributes NO rows instead of aborting the whole
    backfill (its dead-letter row is in the ``fetch_pages_combined``
    relation — use that + ``split_fetch_results`` to consume both sides of
    one fetch pass). Per-exchange positional layouts are normalized to the
    unified candle schema inside the same pass.
    """
    return split_fetch_results(fetch_pages_combined(plan, fetcher))[0]


def dead_letters(
    plan: DataFrame,
    fetcher: Callable[[str, str, int, int], list[tuple]],
    time_frame: str = "1m",
    ohlcv_section: str | None = None,
) -> DataFrame:
    """Pages whose fetch raises → ``ohlcvs_errors``-shaped rows
    (`create.sql:32-42`): the error log is data, not an exception path.
    A projection of ``fetch_pages_combined`` — when consuming candles AND
    errors, persist the combined relation and ``split_fetch_results`` it
    instead of paying the fetch twice."""
    return split_fetch_results(
        fetch_pages_combined(
            plan, fetcher, time_frame, ohlcv_section=ohlcv_section
        )
    )[1]
