"""Schema-adaptivity contract for the table loader (S10).

The driver's testdata generator has changed the physical encoding of
`events.ts` between rounds (nanosecond INT64 -> timestamp[us] with
isAdjustedToUTC=false), which silently broke the watermarked stream tier in
round 3. This test pins the loader's CONTRACT: every declared event-time
column comes back as TimestampType — the only type `withWatermark` accepts —
for every physical variant the generator could plausibly write, with
identical wall-clock values (session tz is UTC).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from coin_for_rich_spark.sources.tables import _to_event_time, load_table

# one exact-microsecond instant + one with sub-millisecond precision, so the
# nanos->micros integer truncation path is exercised too
_TS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]
_EXPECT = [
    dt.datetime(2023, 11, 14, 22, 13, 20),
    dt.datetime(2023, 11, 14, 22, 15, 23, 456789),
]


def _write_events(tmpdir, arrow_type) -> str:
    ts = pa.array(_TS_US, type=pa.timestamp("us")).cast(arrow_type)
    tbl = pa.table({"event_id": pa.array([1, 2], type=pa.int64()), "ts": ts})
    sf_dir = str(tmpdir)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),  # nanos, no UTC flag -> Spark LongType (nanosAsLong)
        pa.timestamp("us"),  # micros, no UTC flag -> Spark TIMESTAMP_NTZ
        pa.timestamp("us", tz="UTC"),  # micros, UTC-adjusted -> Spark TIMESTAMP
    ],
    ids=["nanos-long", "us-ntz", "us-ltz"],
)
def test_load_table_normalizes_every_physical_ts_variant(
    spark, tmp_path, arrow_type
):
    df = load_table(spark, _write_events(tmp_path, arrow_type), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    rows = df.orderBy("event_id").collect()
    assert [r["ts"] for r in rows] == _EXPECT


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["nanos-long", "us-ntz", "us-ltz"],
)
def test_load_table_is_session_timezone_independent(spark, tmp_path, arrow_type):
    # a vanilla session need not run in UTC; load_table must pin the tz
    # itself or the NTZ cast shifts instants by the local offset relative to
    # the epoch-based nanos path
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, _write_events(tmp_path, arrow_type), "events")
        rows = df.orderBy("event_id").collect()
        assert [r["ts"] for r in rows] == _EXPECT
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_load_table_warns_when_repointing_a_non_utc_session(spark, tmp_path):
    # the UTC pin is a documented contract; a caller whose session was
    # deliberately non-UTC must get a warning, not a silent semantic change
    import warnings as _warnings

    sf = _write_events(tmp_path, pa.timestamp("us", tz="UTC"))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            load_table(spark, sf, "events")
        assert any("timeZone" in str(w.message) for w in caught)
        # already-UTC sessions stay silent
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            load_table(spark, sf, "events")
        assert not any("timeZone" in str(w.message) for w in caught)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_load_table_unsupported_ts_type_fails_loud():
    with pytest.raises(TypeError, match="event-time"):
        _to_event_time(T.StringType(), "ts")


def test_loaded_events_accept_watermark(spark, sf_dir):
    # the exact r3 failure mode: withWatermark analyzed against the real
    # testdata must not raise EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    ev = load_table(spark, sf_dir, "events")
    ev.withWatermark("ts", "1 hour").limit(1).collect()
