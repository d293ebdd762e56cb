"""Minimal ISO BMFF (mp4) container codec — pure stdlib ``struct``.

This is a CONTAINER parser, not a video codec: it walks the box tree
(ftyp / moov / trak / mdia / minf / stbl / mdat), resolves the sample
tables (stsd fourcc, stts durations, stsc sample-to-chunk, stsz sizes,
stco/co64 chunk offsets) to real per-sample byte ranges inside mdat,
and extracts deterministic per-sample byte features. Codec-level frame
decode (H.264 etc.) is explicitly out of scope — the reference engine
has no media path at all (about.txt scope), and pixel decode would
require external codec libraries absent in this environment.

The encoder emits a spec-conformant single-track file (version-0 full
boxes, multi-chunk layout) so the parser can be driven end-to-end with
deterministic content in tests and driver queries.
"""

from __future__ import annotations

import struct

import numpy as np


def _fullbox(ver: int = 0, flags: int = 0) -> bytes:
    return struct.pack(">I", (ver << 24) | flags)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def encode_mp4(
    sample_payloads: list[bytes],
    sample_delta: int = 1000,
    timescale: int = 30000,
    width: int = 64,
    height: int = 48,
    chunk_split: int | None = None,
    codec: bytes = b"rawv",
    handler: bytes = b"vide",
) -> bytes:
    """Build a minimal valid single-track mp4: ftyp + mdat holding the
    sample payloads back-to-back + moov with complete sample tables.
    ``chunk_split`` puts the first N samples in chunk 1 and the rest in
    chunk 2 (exercising a non-trivial stsc); default one chunk."""
    if not sample_payloads:
        raise ValueError("encode_mp4: at least one sample required")
    n = len(sample_payloads)
    sizes = [len(p) for p in sample_payloads]
    duration = n * sample_delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(sample_payloads)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_off = len(ftyp) + 8  # absolute offset of first sample

    if chunk_split and 0 < chunk_split < n:
        chunks = [sample_payloads[:chunk_split], sample_payloads[chunk_split:]]
    else:
        chunks = [sample_payloads]
    chunk_offsets, off = [], mdat_data_off
    for c in chunks:
        chunk_offsets.append(off)
        off += sum(len(p) for p in c)

    mvhd = _box(
        b"mvhd",
        _fullbox()
        + struct.pack(">II", 0, 0)  # ctime mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24  # predefined
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">I", 7)  # version 0, flags enabled|in-movie|in-preview
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt group, volume, rsvd
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _box(
        b"mdhd",
        _fullbox()
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _box(
        b"hdlr", _fullbox() + b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00"
    )
    vmhd = _box(b"vmhd", struct.pack(">I", 1) + struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _box(
        b"dref", _fullbox() + struct.pack(">I", 1) + _box(b"url ", struct.pack(">I", 1))
    )
    dinf = _box(b"dinf", dref)
    sample_entry = (
        struct.pack(">I", 86)
        + codec
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, predefined
    )
    stsd = _box(b"stsd", _fullbox() + struct.pack(">I", 1) + sample_entry)
    stts = _box(
        b"stts", _fullbox() + struct.pack(">I", 1) + struct.pack(">II", n, sample_delta)
    )
    stsc_entries = [(1, len(chunks[0]), 1)]
    if len(chunks) > 1:
        stsc_entries.append((2, len(chunks[1]), 1))
    stsc = _box(
        b"stsc",
        _fullbox()
        + struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _box(
        b"stsz",
        _fullbox()
        + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _box(
        b"stco",
        _fullbox()
        + struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    [start, end); handles 64-bit largesize and size-to-end-of-file."""
    pos = start
    while pos + 8 <= end:
        (size,), typ = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated mp4 largesize box header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4 box {typ!r} overruns its container")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for typ, s, e in _iter_boxes(data, start, end):
        if typ == fourcc:
            return s, e
    return None


def parse_mp4(content: bytes) -> dict:
    """Parse an ISO BMFF container down to resolved per-sample byte
    ranges. Returns {brand, timescale, duration, duration_ms,
    tracks: [{handler, codec, width, height, timescale, duration,
    n_samples, sizes, offsets, deltas, n_chunks}]}; offsets/sizes are
    int64 numpy arrays indexing directly into ``content``."""
    data = bytes(content)
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an mp4: missing ftyp")
    ft = _find(data, 0, len(data), b"ftyp")
    brand = data[ft[0] : ft[0] + 4].decode("latin1")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4 has no moov box")
    out: dict = {"brand": brand, "tracks": []}
    mvhd = _find(data, *moov, b"mvhd")
    if mvhd is not None:
        ver = data[mvhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", data, mvhd[0] + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, mvhd[0] + 4 + 8)
        out["timescale"], out["duration"] = ts, dur
        out["duration_ms"] = int(dur * 1000 // ts) if ts else 0
    for typ, s, e in _iter_boxes(data, *moov):
        if typ == b"trak":
            out["tracks"].append(_parse_trak(data, s, e))
    return out


def _parse_trak(data: bytes, s: int, e: int) -> dict:
    tr: dict = {
        "handler": "", "codec": "", "width": 0, "height": 0,
        "timescale": 0, "duration": 0,
    }
    tkhd = _find(data, s, e, b"tkhd")
    if tkhd is not None:
        ver = data[tkhd[0]]
        # width/height are the LAST 8 bytes (16.16 fixed) in both versions
        w_fix, h_fix = struct.unpack_from(">II", data, tkhd[1] - 8)
        tr["width"], tr["height"] = w_fix >> 16, h_fix >> 16
    mdia = _find(data, s, e, b"mdia")
    if mdia is None:
        return tr
    mdhd = _find(data, *mdia, b"mdhd")
    if mdhd is not None:
        ver = data[mdhd[0]]
        if ver == 1:
            ts, dur = struct.unpack_from(">IQ", data, mdhd[0] + 4 + 16)
        else:
            ts, dur = struct.unpack_from(">II", data, mdhd[0] + 4 + 8)
        tr["timescale"], tr["duration"] = ts, dur
    hdlr = _find(data, *mdia, b"hdlr")
    if hdlr is not None:
        tr["handler"] = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")
    minf = _find(data, *mdia, b"minf")
    stbl = _find(data, *minf, b"stbl") if minf else None
    if stbl is None:
        return tr
    stsd = _find(data, *stbl, b"stsd")
    if stsd is not None:
        # first sample entry: 4-byte size then fourcc
        tr["codec"] = data[stsd[0] + 12 : stsd[0] + 16].decode("latin1")
    # sample sizes. Corrupted counts must fail loudly BEFORE the
    # materializing numpy calls: a flipped byte in the stsz uniform
    # count or an stts entry count would otherwise drive
    # np.full/np.repeat into multi-gigabyte allocations (found by
    # fuzzing — the parse appeared to hang while thrashing memory).
    sizes = np.zeros(0, dtype=np.int64)
    stsz = _find(data, *stbl, b"stsz")
    if stsz is not None:
        uniform, count = struct.unpack_from(">II", data, stsz[0] + 4)
        if count > len(data):
            raise ValueError(
                f"mp4 stsz declares {count} samples in a {len(data)}-byte file"
            )
        if uniform:
            sizes = np.full(count, uniform, dtype=np.int64)
        else:
            sizes = np.frombuffer(
                data, ">u4", count=count, offset=stsz[0] + 12
            ).astype(np.int64)
    # time deltas
    deltas = np.zeros(0, dtype=np.int64)
    stts = _find(data, *stbl, b"stts")
    if stts is not None:
        (n_ent,) = struct.unpack_from(">I", data, stts[0] + 4)
        pairs = np.frombuffer(data, ">u4", count=2 * n_ent, offset=stts[0] + 8)
        counts = pairs[0::2].astype(np.int64)
        if counts.sum() > len(data):
            raise ValueError(
                f"mp4 stts declares {int(counts.sum())} samples in a"
                f" {len(data)}-byte file"
            )
        deltas = np.repeat(pairs[1::2].astype(np.int64), counts)
    # chunk offsets (stco 32-bit or co64)
    stco = _find(data, *stbl, b"stco")
    if stco is not None:
        (n_ch,) = struct.unpack_from(">I", data, stco[0] + 4)
        chunk_off = np.frombuffer(
            data, ">u4", count=n_ch, offset=stco[0] + 8
        ).astype(np.int64)
    else:
        co64 = _find(data, *stbl, b"co64")
        if co64 is None:
            raise ValueError("mp4 stbl has neither stco nor co64")
        (n_ch,) = struct.unpack_from(">I", data, co64[0] + 4)
        chunk_off = np.frombuffer(
            data, ">u8", count=n_ch, offset=co64[0] + 8
        ).astype(np.int64)
    # sample-to-chunk mapping
    stsc = _find(data, *stbl, b"stsc")
    spc_per_chunk = np.zeros(len(chunk_off), dtype=np.int64)
    if stsc is not None:
        (n_ent,) = struct.unpack_from(">I", data, stsc[0] + 4)
        ent = np.frombuffer(data, ">u4", count=3 * n_ent, offset=stsc[0] + 8)
        firsts = ent[0::3].astype(np.int64)  # 1-based chunk index
        spcs = ent[1::3].astype(np.int64)
        for i in range(n_ent):
            lo = firsts[i] - 1
            hi = firsts[i + 1] - 1 if i + 1 < n_ent else len(chunk_off)
            spc_per_chunk[lo:hi] = spcs[i]
    # resolve per-sample absolute offsets
    offsets = np.zeros(len(sizes), dtype=np.int64)
    si = 0
    for ci in range(len(chunk_off)):
        off = chunk_off[ci]
        for _ in range(int(spc_per_chunk[ci])):
            if si >= len(sizes):
                break
            offsets[si] = off
            off += sizes[si]
            si += 1
    if si < len(sizes):
        raise ValueError(
            f"mp4 sample tables inconsistent: stsc/stco map {si} samples, "
            f"stsz declares {len(sizes)}"
        )
    tr.update(
        n_samples=int(len(sizes)), sizes=sizes, offsets=offsets,
        deltas=deltas, n_chunks=int(len(chunk_off)),
    )
    return tr


def video_features(content: bytes) -> np.ndarray:
    """FEATURE_DIM deterministic container+byte features from a parsed
    mp4: sample-count / duration / geometry / rate from the box tree,
    size statistics from stsz, and REAL byte statistics read from the
    resolved sample ranges inside mdat (mean first byte, mean payload
    byte, oversize fraction, offsets-in-bounds validity flag)."""
    from .multimodal import FEATURE_DIM

    data = bytes(content)
    info = parse_mp4(data)
    with_samples = [t for t in info["tracks"] if t.get("n_samples")]
    if not with_samples:
        raise ValueError("mp4 has no track with samples")
    # prefer the video handler: a file muxed with its 'soun' trak first
    # would otherwise silently report audio-track statistics (width 0,
    # audio-timescale fps) as the video features
    vids = [t for t in with_samples if t["handler"] == "vide"] or with_samples
    t = vids[0]
    sizes, offsets = t["sizes"], t["offsets"]
    n = len(sizes)
    dur_s = t["duration"] / t["timescale"] if t["timescale"] else 0.0
    fps = n / dur_s if dur_s > 0 else 0.0
    in_bounds = bool(((offsets >= 0) & (offsets + sizes <= len(data))).all())
    if in_bounds and sizes.sum() > 0:
        firsts = np.array(
            [data[int(o)] for o, sz in zip(offsets, sizes) if sz > 0], dtype=np.float64
        )
        payload = np.concatenate(
            [
                np.frombuffer(data, np.uint8, int(sz), int(o))
                for o, sz in zip(offsets, sizes)
                if sz > 0
            ]
        ).astype(np.float64)
        mean_first = float(firsts.mean()) if len(firsts) else 0.0
        mean_byte = float(payload.mean()) if len(payload) else 0.0
    else:
        mean_first = mean_byte = 0.0
    feats = [
        float(n),
        float(info.get("duration_ms", 0)),
        float(t["width"]),
        float(t["height"]),
        float(fps),
        float(sizes.sum()),
        float(sizes.mean()) if n else 0.0,
        float(sizes.std()) if n else 0.0,
        float(sizes.min()) if n else 0.0,
        float(sizes.max()) if n else 0.0,
        float(t["n_chunks"]),
        float(t["timescale"]),
        mean_first,
        mean_byte,
        float((sizes > sizes.mean()).mean()) if n else 0.0,
        1.0 if in_bounds else 0.0,
    ]
    assert len(feats) == FEATURE_DIM
    return np.asarray(feats, dtype=np.float32)
