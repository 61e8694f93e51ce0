"""Minimal ISO base-media (MP4) container muxer/demuxer — pure stdlib+numpy.

Scope, honestly stated: this is CONTAINER-level support (ISO/IEC 14496-12
box structure and sample tables), not a video codec. Frames are stored as
uncompressed 8-bit grayscale samples under a private ``gry8`` sample entry;
compressed-codec decode (H.264/H.265/AV1) stays behind the documented
``NotImplementedError`` boundary in ``multimodal.decode_media`` because no
media library ships in this environment. What IS real here — and what the
tests and the declared ``frame_sample`` query exercise end-to-end — is the
part a 100 TB video-curation pipeline spends its time in besides codec work:
walking box trees, resolving per-sample byte ranges from stts/stsc/stsz/stco,
and slicing frames out of ``mdat`` without decoding anything it doesn't need.

The muxer writes ``ftyp | mdat | moov`` with a single video track:

    moov
      mvhd                      movie header (timescale, duration)
      trak
        tkhd                    track header (id 1, visual dimensions)
        mdia
          mdhd                  media timescale/duration
          hdlr('vide')
          minf
            vmhd, dinf/dref
            stbl
              stsd('gry8')      visual sample entry, width/height
              stts              sample durations (one run)
              stsc              chunk map (one chunk, all samples)
              stsz              per-sample byte sizes
              stco              chunk offset into mdat

The demuxer is deliberately more general than the muxer: it resolves sample
offsets through the full stsc run-length chunk map and multi-run stts, so it
reads any single-video-track file that uses 32-bit offsets, not just its own
output (round-trip plus table-shape tests pin this).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_U32 = struct.Struct(">I")
_U16 = struct.Struct(">H")


def _box(typ: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + typ + payload


def _full_box(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + payload)


_IDENTITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mp4_mux_gray(
    frames: list[np.ndarray],
    frame_duration_ms: int = 250,
    timescale: int = 1000,
) -> bytes:
    """Mux uncompressed 8-bit grayscale frames (equal dims) into an MP4.

    ``frame_duration_ms`` is in movie-timescale units when ``timescale`` is
    1000 (the default — 1 unit = 1 ms, the contract the sampling algebra in
    ``multimodal.sample_real_frames`` relies on).
    """
    if not frames:
        raise ValueError("mp4_mux_gray needs at least one frame")
    h, w = frames[0].shape
    for f in frames:
        if f.shape != (h, w) or f.dtype != np.uint8:
            raise ValueError("all frames must be uint8 with identical shape")
    n = len(frames)
    duration = n * frame_duration_ms

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0) + b"isom")
    samples = b"".join(f.tobytes() for f in frames)
    mdat = _box(b"mdat", samples)
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        _U32.pack(0) * 2  # creation/modification
        + _U32.pack(timescale)
        + _U32.pack(duration)
        + _U32.pack(0x00010000)  # rate 1.0
        + _U16.pack(0x0100)  # volume 1.0
        + b"\x00" * 10
        + _IDENTITY_MATRIX
        + b"\x00" * 24
        + _U32.pack(2),  # next track id
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        _U32.pack(0) * 2
        + _U32.pack(1)  # track id
        + _U32.pack(0)
        + _U32.pack(duration)
        + b"\x00" * 8
        + _U16.pack(0) * 2  # layer, alternate_group
        + _U16.pack(0)  # volume (video)
        + _U16.pack(0)
        + _IDENTITY_MATRIX
        + _U32.pack(w << 16)
        + _U32.pack(h << 16),
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        _U32.pack(0) * 2
        + _U32.pack(timescale)
        + _U32.pack(duration)
        + _U16.pack(0x55C4)  # language 'und'
        + _U16.pack(0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0, _U32.pack(0) + b"vide" + b"\x00" * 12 + b"gray\x00"
    )
    vmhd = _full_box(b"vmhd", 0, 1, _U16.pack(0) * 4)
    dref = _full_box(b"dref", 0, 0, _U32.pack(1) + _full_box(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    sample_entry = _box(
        b"gry8",
        b"\x00" * 6
        + _U16.pack(1)  # data_reference_index
        + b"\x00" * 16  # predefined/reserved
        + _U16.pack(w)
        + _U16.pack(h)
        + _U32.pack(0x00480000) * 2  # 72 dpi
        + _U32.pack(0)
        + _U16.pack(1)  # frame count per sample
        + b"\x00" * 32  # compressor name
        + _U16.pack(0x0008)  # depth: 8-bit grayscale
        + struct.pack(">h", -1),
    )
    stsd = _full_box(b"stsd", 0, 0, _U32.pack(1) + sample_entry)
    stts = _full_box(
        b"stts", 0, 0, _U32.pack(1) + _U32.pack(n) + _U32.pack(frame_duration_ms)
    )
    stsc = _full_box(
        b"stsc", 0, 0, _U32.pack(1) + _U32.pack(1) + _U32.pack(n) + _U32.pack(1)
    )
    stsz = _full_box(
        b"stsz",
        0,
        0,
        _U32.pack(0) + _U32.pack(n) + b"".join(_U32.pack(w * h) for _ in frames),
    )
    stco = _full_box(b"stco", 0, 0, _U32.pack(1) + _U32.pack(first_sample_off))

    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def mp4_mux_avc1(
    payloads: list[bytes],
    key_samples: list[int],
    width: int,
    height: int,
    profile: int = 0x64,
    compat: int = 0x00,
    level: int = 0x1F,
    frame_duration_ms: int = 500,
    timescale: int = 1000,
) -> bytes:
    """Mux opaque COMPRESSED sample payloads into an avc1 MP4 track: an
    avcC decoder-configuration child box in the stsd sample entry
    (ISO/IEC 14496-15 §5.3.3.1 — version/profile/compat/level + empty
    parameter sets) and an stss sync-sample table — the container shapes a
    real H.264 encoder writes, with zero codec bytes that mean anything.
    The keyframe-index tier (``multimodal.video_keyframe_index``) reads
    everything it emits from THIS structure alone, so the layout is a
    formula-oracle contract: 20-byte ftyp + 8-byte mdat header → first
    sample at byte 28, then cumulative payload sizes (the same
    first-sample offset as ``mp4_mux_gray``)."""
    if not payloads:
        raise ValueError("mp4_mux_avc1 needs at least one sample payload")
    n = len(payloads)
    if any(k < 0 or k >= n for k in key_samples):
        raise ValueError("key_samples must be 0-based sample indices")
    duration = n * frame_duration_ms

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0) + b"isom")
    mdat = _box(b"mdat", b"".join(payloads))
    first_sample_off = len(ftyp) + 8

    mvhd = _full_box(
        b"mvhd", 0, 0,
        _U32.pack(0) * 2 + _U32.pack(timescale) + _U32.pack(duration)
        + _U32.pack(0x00010000) + _U16.pack(0x0100) + b"\x00" * 10
        + _IDENTITY_MATRIX + b"\x00" * 24 + _U32.pack(2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 7,
        _U32.pack(0) * 2 + _U32.pack(1) + _U32.pack(0) + _U32.pack(duration)
        + b"\x00" * 8 + _U16.pack(0) * 3 + _U16.pack(0)
        + _IDENTITY_MATRIX
        + _U32.pack(width << 16) + _U32.pack(height << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        _U32.pack(0) * 2 + _U32.pack(timescale) + _U32.pack(duration)
        + _U16.pack(0x55C4) + _U16.pack(0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0, _U32.pack(0) + b"vide" + b"\x00" * 12 + b"h264\x00"
    )
    vmhd = _full_box(b"vmhd", 0, 1, _U16.pack(0) * 4)
    dinf = _box(
        b"dinf", _full_box(b"dref", 0, 0, _U32.pack(1) + _full_box(b"url ", 0, 1, b""))
    )
    # AVCDecoderConfigurationRecord: version, profile, compat, level,
    # lengthSizeMinusOne|0xFC, numSPS|0xE0, then empty parameter sets
    avcc = _box(
        b"avcC",
        bytes([1, profile, compat, level, 0xFF, 0xE1])
        + _U16.pack(0) + bytes([1]) + _U16.pack(0),
    )
    sample_entry = _box(
        b"avc1",
        b"\x00" * 6 + _U16.pack(1) + b"\x00" * 16
        + _U16.pack(width) + _U16.pack(height)
        + _U32.pack(0x00480000) * 2 + _U32.pack(0) + _U16.pack(1)
        + b"\x00" * 32 + _U16.pack(0x0018) + struct.pack(">h", -1)
        + avcc,
    )
    stsd = _full_box(b"stsd", 0, 0, _U32.pack(1) + sample_entry)
    stts = _full_box(
        b"stts", 0, 0, _U32.pack(1) + _U32.pack(n) + _U32.pack(frame_duration_ms)
    )
    stsc = _full_box(
        b"stsc", 0, 0, _U32.pack(1) + _U32.pack(1) + _U32.pack(n) + _U32.pack(1)
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        _U32.pack(0) + _U32.pack(n)
        + b"".join(_U32.pack(len(p)) for p in payloads),
    )
    stco = _full_box(b"stco", 0, 0, _U32.pack(1) + _U32.pack(first_sample_off))
    stss = _full_box(
        b"stss", 0, 0,
        _U32.pack(len(key_samples))
        + b"".join(_U32.pack(k + 1) for k in sorted(key_samples)),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


@dataclass
class Mp4Video:
    """Demuxed single-track video: per-sample timestamps and byte ranges.

    ``sync_samples`` is the stss keyframe table as 0-based sample indices;
    ``None`` means the file has no stss box, which per ISO/IEC 14496-12
    §8.6.2 declares EVERY sample a sync sample. ``codec`` carries the
    stsd-level decoder configuration for compressed entries (the avcC
    record for ``avc1``/``avc3``) — extracted WITHOUT any codec library,
    which is the part a curation pipeline needs before it ever decodes:
    what codec, what profile, and which byte ranges are independently
    decodable."""

    width: int
    height: int
    timescale: int
    sample_format: str
    sample_ts: list[int]  # start time of each sample, timescale units
    sample_dur: list[int]
    sample_offsets: list[int]  # absolute byte offsets into the file
    sample_sizes: list[int]
    sync_samples: list[int] | None = None  # 0-based; None = all sync
    codec: dict | None = None  # stsd decoder config (avcC profile/level/..)

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)

    def keyframe_indices(self) -> list[int]:
        """Concrete 0-based keyframe sample indices (absent stss → all)."""
        if self.sync_samples is None:
            return list(range(self.n_samples))
        return list(self.sync_samples)

    def keyframe_byte_ranges(self) -> list[tuple[int, int, int]]:
        """(sample_idx, absolute_offset, size) per keyframe — the slices a
        sample-without-decode pipeline ships to a decode service. Container
        math only; the sample payloads are never touched."""
        return [
            (i, self.sample_offsets[i], self.sample_sizes[i])
            for i in self.keyframe_indices()
        ]

    def nearest_keyframe(self, t: int) -> int:
        """The latest keyframe at or before time ``t`` (timescale units) —
        the seek preroll point: decoding must start here to show ``t``.
        Before the first keyframe, the first keyframe."""
        keys = self.keyframe_indices()
        if not keys:
            raise ValueError("no sync samples in track")
        best = keys[0]
        for i in keys:
            if self.sample_ts[i] <= t:
                best = i
            else:
                break
        return best

    def frame_gray(self, data: bytes, idx: int) -> np.ndarray:
        """Slice sample ``idx`` out of the file bytes and view it as the
        uncompressed grayscale frame the ``gry8`` entry declares."""
        if self.sample_format != "gry8":
            raise NotImplementedError(
                f"decode of {self.sample_format!r} samples requires a video "
                "codec library not in this environment"
            )
        off, sz = self.sample_offsets[idx], self.sample_sizes[idx]
        px = np.frombuffer(data[off : off + sz], dtype=np.uint8)
        return px.reshape(self.height, self.width)


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack_from(data, pos)[0]
        typ = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {typ!r} at {pos}")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    for part in path:
        for typ, body, box_end in _iter_boxes(data, start, end):
            if typ == part:
                start, end = body, box_end
                break
        else:
            raise ValueError(f"missing {part!r} box")
    return start, end


#: VisualSampleEntry fixed part: 8 (box header) + 78 (6 reserved, 2 dref
#: index, 16 predefined, 2+2 dims, 4+4 dpi, 4, 2 frame count, 32 compressor
#: name, 2 depth, 2 predefined) — child boxes (avcC/hvcC/...) follow it.
_VISUAL_ENTRY_FIXED = 86


def _parse_codec_config(
    data: bytes, entry_start: int, entry_end: int, fmt: str
) -> dict | None:
    """Decoder configuration from the stsd sample entry's child boxes —
    container math only, no codec library: for ``avc1``/``avc2``/``avc3``
    the AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.3.3.1) yields
    profile/level and the RFC 6381 codec string (``avc1.PPCCLL``); for
    ``hvc1``/``hev1`` the HEVCDecoderConfigurationRecord's leading fields.
    Unknown/uncompressed entries (``gry8``) have no config → None."""
    child_start = entry_start + _VISUAL_ENTRY_FIXED
    if child_start >= entry_end:
        return None
    children: dict[bytes, tuple[int, int]] = {}
    try:
        for typ, body, box_end in _iter_boxes(data, child_start, entry_end):
            children[typ] = (body, box_end)
    except ValueError:
        return None  # malformed/absent extension area: no config, not a crash
    if fmt in ("avc1", "avc2", "avc3") and b"avcC" in children:
        body, box_end = children[b"avcC"]
        if box_end - body < 4:
            return None
        profile, compat, level = data[body + 1], data[body + 2], data[body + 3]
        return {
            "codec": "h264",
            "rfc6381": f"{fmt}.{profile:02X}{compat:02X}{level:02X}",
            "profile_idc": profile,
            "profile_compat": compat,
            "level_idc": level,
            "config_bytes": box_end - body,
        }
    if fmt in ("hvc1", "hev1") and b"hvcC" in children:
        body, box_end = children[b"hvcC"]
        if box_end - body < 13:
            return None
        b1 = data[body + 1]
        return {
            "codec": "h265",
            "rfc6381": f"{fmt}.{b1 & 0x1F}.L{data[body + 12]}",
            "profile_idc": b1 & 0x1F,
            "tier": (b1 >> 5) & 1,
            "level_idc": data[body + 12],
            "config_bytes": box_end - body,
        }
    return None


def mp4_demux(data: bytes) -> Mp4Video:
    """Parse a single-video-track MP4 and resolve every sample's timestamp
    and byte range from the stbl tables. General over run-length stts and
    the stsc chunk map (not just the shapes :func:`mp4_mux_gray` writes).
    Compressed tracks (``avc1`` etc.) demux fully — format, dimensions,
    decoder config, keyframe table, per-sample byte ranges — with only
    ``frame_gray`` (the actual pixel view) behind the codec boundary."""
    moov_s, moov_e = _find(data, 0, len(data), b"moov")
    trak_s, trak_e = _find(data, moov_s, moov_e, b"trak")
    mdhd_s, _ = _find(data, trak_s, trak_e, b"mdia", b"mdhd")
    version = data[mdhd_s]
    timescale = _U32.unpack_from(
        data, mdhd_s + (4 + 16 if version == 1 else 4 + 8)
    )[0]
    stbl_s, stbl_e = _find(data, trak_s, trak_e, b"mdia", b"minf", b"stbl")

    tables: dict[bytes, tuple[int, int]] = {}
    for typ, body, box_end in _iter_boxes(data, stbl_s, stbl_e):
        tables[typ] = (body, box_end)
    for req in (b"stsd", b"stts", b"stsc", b"stsz", b"stco"):
        if req not in tables:
            raise ValueError(f"missing {req!r} table")

    # stsd → sample format + visual dimensions + decoder config
    p = tables[b"stsd"][0] + 4  # fullbox header
    n_entries = _U32.unpack_from(data, p)[0]
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry_start = p + 4
    entry_size = _U32.unpack_from(data, entry_start)[0]
    entry_fmt = data[p + 8 : p + 12].decode("latin1")
    width = _U16.unpack_from(data, p + 4 + 8 + 8 + 16)[0]
    height = _U16.unpack_from(data, p + 4 + 8 + 8 + 18)[0]
    codec = _parse_codec_config(
        data, entry_start, entry_start + entry_size, entry_fmt
    )

    # stts → per-sample durations and cumulative timestamps
    p = tables[b"stts"][0] + 4
    n_runs = _U32.unpack_from(data, p)[0]
    durations: list[int] = []
    for i in range(n_runs):
        cnt, dur = struct.unpack_from(">II", data, p + 4 + 8 * i)
        durations.extend([dur] * cnt)
    ts, acc = [], 0
    for d in durations:
        ts.append(acc)
        acc += d

    # stsz → per-sample sizes
    p = tables[b"stsz"][0] + 4
    fixed, n_samples = struct.unpack_from(">II", data, p)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, p + 8))
    if n_samples != len(durations):
        raise ValueError("stsz/stts sample-count mismatch")

    # stco → chunk offsets; stsc → samples-per-chunk runs
    p = tables[b"stco"][0] + 4
    n_chunks = _U32.unpack_from(data, p)[0]
    chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", data, p + 4))
    p = tables[b"stsc"][0] + 4
    n_sc = _U32.unpack_from(data, p)[0]
    sc_runs = [
        struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(n_sc)
    ]  # (first_chunk 1-based, samples_per_chunk, sample_desc_idx)

    offsets: list[int] = []
    sample_i = 0
    for run_i, (first_chunk, per_chunk, _desc) in enumerate(sc_runs):
        last_chunk = (
            sc_runs[run_i + 1][0] - 1 if run_i + 1 < len(sc_runs) else n_chunks
        )
        for chunk in range(first_chunk, last_chunk + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample_i >= n_samples:
                    break
                offsets.append(off)
                off += sizes[sample_i]
                sample_i += 1
    if sample_i != n_samples:
        raise ValueError("stsc chunk map does not cover every sample")

    # stss → keyframe table (1-based sample numbers; ABSENT box means every
    # sample is sync per ISO/IEC 14496-12 §8.6.2 — keep that as None so the
    # two cases stay distinguishable)
    sync: list[int] | None = None
    if b"stss" in tables:
        p = tables[b"stss"][0] + 4
        n_sync = _U32.unpack_from(data, p)[0]
        sync = [
            s - 1 for s in struct.unpack_from(f">{n_sync}I", data, p + 4)
        ]
        if any(s < 0 or s >= n_samples for s in sync):
            raise ValueError("stss sample number out of range")

    return Mp4Video(
        width=width,
        height=height,
        timescale=timescale,
        sample_format=entry_fmt,
        sample_ts=ts,
        sample_dur=durations,
        sample_offsets=offsets,
        sample_sizes=sizes,
        sync_samples=sync,
        codec=codec,
    )
