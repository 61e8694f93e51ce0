"""MP4 container layer: mux/demux round trips, demuxer generality over
chunk maps and timing runs the muxer never writes, honest codec boundary,
and the Spark demux + tick-sampling path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from coin_for_rich_spark.llmdata.mp4 import (
    Mp4Video,
    _box,
    _full_box,
    mp4_demux,
    mp4_mux_gray,
)

_U32 = struct.Struct(">I")


def _formula_frames(i: int) -> list[np.ndarray]:
    w, h, n = i % 13 + 1, i % 11 + 1, i % 7 + 2
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    return [((5 * x + 11 * y + 29 * f + i) % 256).astype(np.uint8) for f in range(n)]


def test_mp4_round_trip_pixels_and_timing():
    rng = np.random.RandomState(7)
    for w, h, n in [(1, 1, 1), (13, 11, 8), (5, 9, 3)]:
        frames = [
            rng.randint(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n)
        ]
        data = mp4_mux_gray(frames, frame_duration_ms=250)
        vid = mp4_demux(data)
        assert (vid.width, vid.height) == (w, h)
        assert vid.timescale == 1000
        assert vid.sample_format == "gry8"
        assert vid.sample_ts == [250 * f for f in range(n)]
        assert vid.sample_dur == [250] * n
        for f in range(n):
            assert np.array_equal(vid.frame_gray(data, f), frames[f])


def test_mp4_mux_validates_input():
    with pytest.raises(ValueError):
        mp4_mux_gray([])
    a = np.zeros((2, 2), dtype=np.uint8)
    b = np.zeros((3, 2), dtype=np.uint8)
    with pytest.raises(ValueError):
        mp4_mux_gray([a, b])
    with pytest.raises(ValueError):
        mp4_mux_gray([np.zeros((2, 2), dtype=np.int32)])


def _mux_multi_chunk(frames: list[np.ndarray]) -> bytes:
    """Hand-mux the same track the muxer writes, but with each sample in its
    OWN chunk (n stco entries, one stsc run of samples_per_chunk=1), the
    chunks laid down in REVERSE order inside mdat, and the durations split
    into two stts runs — shapes mp4_mux_gray never produces, which is the
    point: the demuxer must resolve them from the tables alone."""
    h, w = frames[0].shape
    n = len(frames)
    dur_runs = [(1, 100), (n - 1, 250)] if n > 1 else [(1, 100)]
    duration = 100 + 250 * (n - 1)

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0) + b"isom")
    order = list(reversed(range(n)))
    payload = b"".join(frames[i].tobytes() for i in order)
    mdat = _box(b"mdat", payload)
    base = len(ftyp) + 8
    # chunk k holds sample k; sample i sits where order placed it
    offsets = [0] * n
    pos = base
    for i in order:
        offsets[i] = pos
        pos += frames[i].size

    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        _U32.pack(0) * 2 + _U32.pack(1000) + _U32.pack(duration)
        + _U32.pack(0x00010000) + struct.pack(">H", 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + _U32.pack(2),
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        7,
        _U32.pack(0) * 2 + _U32.pack(1) + _U32.pack(0) + _U32.pack(duration)
        + b"\x00" * 8 + b"\x00" * 6 + b"\x00\x00"
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + _U32.pack(w << 16) + _U32.pack(h << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        _U32.pack(0) * 2 + _U32.pack(1000) + _U32.pack(duration)
        + struct.pack(">H", 0x55C4) + struct.pack(">H", 0),
    )
    hdlr = _full_box(b"hdlr", 0, 0, _U32.pack(0) + b"vide" + b"\x00" * 12 + b"g\x00")
    vmhd = _full_box(b"vmhd", 0, 1, b"\x00" * 8)
    dinf = _box(b"dinf", _full_box(b"dref", 0, 0, _U32.pack(1) + _full_box(b"url ", 0, 1, b"")))
    entry = _box(
        b"gry8",
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">H", w) + struct.pack(">H", h)
        + _U32.pack(0x00480000) * 2 + _U32.pack(0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">H", 8) + struct.pack(">h", -1),
    )
    stsd = _full_box(b"stsd", 0, 0, _U32.pack(1) + entry)
    stts = _full_box(
        b"stts", 0, 0,
        _U32.pack(len(dur_runs))
        + b"".join(_U32.pack(c) + _U32.pack(d) for c, d in dur_runs),
    )
    stsc = _full_box(b"stsc", 0, 0, _U32.pack(1) + _U32.pack(1) + _U32.pack(1) + _U32.pack(1))
    stsz = _full_box(
        b"stsz", 0, 0,
        _U32.pack(0) + _U32.pack(n) + b"".join(_U32.pack(f.size) for f in frames),
    )
    stco = _full_box(
        b"stco", 0, 0, _U32.pack(n) + b"".join(_U32.pack(o) for o in offsets)
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_mp4_demux_general_chunk_map_and_stts_runs():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(4, 6), dtype=np.uint8) for _ in range(5)]
    data = _mux_multi_chunk(frames)
    vid = mp4_demux(data)
    assert vid.sample_dur == [100, 250, 250, 250, 250]
    assert vid.sample_ts == [0, 100, 350, 600, 850]
    for f in range(5):
        assert np.array_equal(vid.frame_gray(data, f), frames[f])


def test_mp4_non_gray_sample_format_raises():
    frames = [np.zeros((2, 2), dtype=np.uint8)]
    data = bytearray(mp4_mux_gray(frames))
    i = data.find(b"gry8")
    data[i : i + 4] = b"avc1"  # pretend it's H.264
    vid = mp4_demux(bytes(data))
    assert vid.sample_format == "avc1"
    with pytest.raises(NotImplementedError):
        vid.frame_gray(bytes(data), 0)


def test_mp4_truncated_raises():
    data = mp4_mux_gray([np.zeros((2, 2), dtype=np.uint8)])
    with pytest.raises(ValueError):
        mp4_demux(data[: len(data) // 2])


def test_spark_demux_and_tick_sampling(spark, sf_dir):
    from coin_for_rich_spark.llmdata import (
        attach_real_video,
        demux_video_frames,
        sample_real_frames,
    )
    from coin_for_rich_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    frames = demux_video_frames(attach_real_video(docs))
    rows = {(r["media_id"], r["sample_idx"]): r for r in frames.collect()}
    assert rows
    for (i, f), r in rows.items():
        assert i % 3 == 2
        expect = _formula_frames(i)[f].astype(np.int64)
        assert r["width"] == i % 13 + 1 and r["height"] == i % 11 + 1
        assert r["sample_ts_ms"] == 250 * f and r["sample_dur_ms"] == 250
        assert r["value_sum"] == int(expect.sum())
        assert r["value_min"] == int(expect.min())
        assert r["value_max"] == int(expect.max())
        assert r["n_values"] == expect.size

    sampled = sample_real_frames(frames, every_ms=400).collect()
    # every tick must land inside its sample's interval, and the full tick
    # grid 0, 400, 800, … below each video's duration must be covered
    seen = {}
    for r in sampled:
        assert r["frame_ts_ms"] // 250 == r["sample_idx"] or (
            250 * r["sample_idx"]
            <= r["frame_ts_ms"]
            < 250 * (r["sample_idx"] + 1)
        )
        seen.setdefault(r["media_id"], set()).add(r["frame_ts_ms"])
    for i in {m for m, _ in rows}:
        n = i % 7 + 2
        expect_ticks = set(range(0, 250 * n, 400))
        assert seen[i] == expect_ticks, (i, seen[i], expect_ticks)


def test_mp4_ms_conversion_is_integer_exact(spark):
    """A timescale that does not divide 1000 must not lose a millisecond to
    float truncation: ts=3 at timescale 6 is exactly 500 ms."""
    import numpy as np

    from coin_for_rich_spark.llmdata.multimodal import demux_video_frames
    from coin_for_rich_spark.llmdata.mp4 import mp4_mux_gray

    frames = [np.zeros((2, 2), dtype=np.uint8) for _ in range(4)]
    data = mp4_mux_gray(frames, frame_duration_ms=1, timescale=6)
    media = spark.createDataFrame(
        [(1, "video/mp4", bytearray(data))],
        "media_id long, mime string, payload binary",
    )
    got = {
        r["sample_idx"]: r["sample_ts_ms"]
        for r in demux_video_frames(media).collect()
    }
    # sample ts in timescale-6 units: 0,1,2,3 → ms: 0,166,333,500
    assert got == {0: 0, 1: 166, 2: 333, 3: 500}
