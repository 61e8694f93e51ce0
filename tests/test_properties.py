"""Property-based tests (hypothesis) for the pure engine contracts.

These check invariants no example-based test pins down: bucket algebra over
arbitrary timestamps and widths, wire-format round-trips, and merge-sink
idempotence under arbitrary batch contents.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from coin_for_rich_spark.functions.timeutils import INTERVAL_SECONDS

# driver-side reimplementation of functions.timeutils.time_bucket's integer
# arithmetic (epoch floor); properties proven here transfer because the
# Spark expression uses the same exact integer ops (verified by the oracle
# gate on every candles_* query).
def _bucket_epoch(epoch: int, width: int) -> int:
    return epoch - ((epoch % width) + width) % width


epochs = st.integers(min_value=0, max_value=4102444800)  # 1970..2100
widths = st.sampled_from([w for w in INTERVAL_SECONDS.values() if w])


@given(epochs, widths)
def test_bucket_contains_its_timestamp(epoch, width):
    b = _bucket_epoch(epoch, width)
    assert b <= epoch < b + width


@given(epochs, widths)
def test_bucket_is_idempotent_and_aligned(epoch, width):
    b = _bucket_epoch(epoch, width)
    assert _bucket_epoch(b, width) == b
    assert b % width == 0


@given(epochs, widths, widths)
def test_coarser_bucket_nests_finer(epoch, w1, w2):
    """A bucket at width w contains the bucket at any divisor width —
    the property that lets coarse rollups cascade from fine ones."""
    if w2 % w1 != 0:
        return
    fine = _bucket_epoch(epoch, w1)
    coarse = _bucket_epoch(epoch, w2)
    assert coarse <= fine < coarse + w2
    assert _bucket_epoch(fine, w2) == coarse


@given(st.integers(min_value=0, max_value=2**53 // 1000))
def test_epoch_ms_roundtrip(ms):
    """ms → datetime → ms is lossless at millisecond precision
    (the wire contract: datetimehelpers.py:8-60)."""
    t = dt.datetime.fromtimestamp(ms / 1000.0, dt.timezone.utc)
    # recompute via integer path (what timestamp_millis/unix_millis do)
    back = (ms // 1000) * 1000 + (ms % 1000)
    assert back == ms
    assert int(t.timestamp() * 1000) in (ms - 1, ms, ms + 1)  # float repr only


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 100), st.floats(0, 1e6)),
        min_size=1,
        max_size=30,
    )
)
def test_merge_sink_pk_uniqueness_invariant(tmp_path_factory_shared, rows):
    """After any sequence of merges, the sink holds exactly one row per PK,
    and replaying the last batch changes nothing (exactly-once posture)."""
    spark, tmp = tmp_path_factory_shared
    from coin_for_rich_spark.streaming.sink import ParquetMergeSink
    import uuid

    sink = ParquetMergeSink(
        str(tmp / f"t_{uuid.uuid4().hex}"), pk=("k",), mode="upsert", tiebreak_col="seq"
    )
    df = spark.createDataFrame(rows, "k string, seq int, v double")
    sink.merge(df, 0)
    once = sorted(map(tuple, sink.read(spark).collect()))
    sink.merge(df, 0)  # replay
    twice = sorted(map(tuple, sink.read(spark).collect()))
    assert once == twice
    ks = [r[0] for r in once]
    assert len(ks) == len(set(ks))


import pytest


@pytest.fixture(scope="module")
def tmp_path_factory_shared(spark, tmp_path_factory):
    return spark, tmp_path_factory.mktemp("prop")
