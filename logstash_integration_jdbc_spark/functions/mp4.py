"""ISO BMFF (MP4) container parsing — metadata without frame decode.

A video-curation pipeline filters clips by duration / codec / frame
count / bitrate BEFORE paying for any decode; all of that lives in the
MP4 container's ``moov`` box tree (ISO/IEC 14496-12, the public ISO
Base Media File Format spec). This module walks the box structure with
``struct`` only:

- ``parse_mp4``: ftyp brand, mvhd movie duration, and per-track
  handler / codec fourcc / sample count+sizes / duration from
  tkhd · mdhd · hdlr · stsd · stsz.
- ``build_mp4``: a deterministic minimal-but-spec-valid fixture
  builder (ftyp + mdat + full moov tree) for tests and oracles.

Frame DECODE of inter-frame codecs (H.264/H.265/AV1) is a declared
boundary: it needs ffmpeg/PyAV, and the sandbox ships neither — the
decode entry points raise ``NotImplementedError`` naming the library.
Fragmented MP4 (``moof``) is likewise declared: streaming-DASH sample
tables live outside ``moov`` and need segment-index handling.
"""

from __future__ import annotations

import struct


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the sibling boxes in
    [start, end); handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", b, pos)[0]
        typ = b[pos + 4: pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            size = struct.unpack_from(">Q", b, pos + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, fourcc: bytes):
    for typ, s, e in _walk_boxes(b, start, end):
        if typ == fourcc:
            return s, e
    return None


def _fullbox(b: bytes, start: int) -> tuple[int, int]:
    """(version, body offset past the version/flags word)."""
    return b[start], start + 4


def _parse_mvhd(b: bytes, s: int) -> float:
    v, p = _fullbox(b, s)
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", b, p + 16)
    else:
        timescale, duration = struct.unpack_from(">II", b, p + 8)
    return duration / timescale if timescale else 0.0


def _parse_trak(b: bytes, s: int, e: int) -> dict:
    out: dict = {"track_id": None, "handler": None, "codec": None,
                 "n_samples": 0, "total_sample_bytes": 0,
                 "duration_s": 0.0, "width": None, "height": None}
    tk = _find(b, s, e, b"tkhd")
    if tk:
        v, p = _fullbox(b, tk[0])
        out["track_id"] = struct.unpack_from(
            ">I", b, p + (16 if v == 1 else 8))[0]
        # tkhd width/height: 16.16 fixed point at the box tail
        out["width"] = struct.unpack_from(">I", b, tk[1] - 8)[0] >> 16
        out["height"] = struct.unpack_from(">I", b, tk[1] - 4)[0] >> 16
    mdia = _find(b, s, e, b"mdia")
    if not mdia:
        return out
    md = _find(b, *mdia, b"mdhd")
    if md:
        v, p = _fullbox(b, md[0])
        if v == 1:
            timescale, duration = struct.unpack_from(">IQ", b, p + 16)
        else:
            timescale, duration = struct.unpack_from(">II", b, p + 8)
        out["duration_s"] = duration / timescale if timescale else 0.0
    hd = _find(b, *mdia, b"hdlr")
    if hd:
        _v, p = _fullbox(b, hd[0])
        out["handler"] = b[p + 4: p + 8].decode("latin-1")
    minf = _find(b, *mdia, b"minf")
    stbl = _find(b, *minf, b"stbl") if minf else None
    if not stbl:
        return out
    sd = _find(b, *stbl, b"stsd")
    if sd:
        _v, p = _fullbox(b, sd[0])
        n_entries = struct.unpack_from(">I", b, p)[0]
        if n_entries:
            out["codec"] = b[p + 8: p + 12].decode("latin-1")
    sz = _find(b, *stbl, b"stsz")
    if sz:
        _v, p = _fullbox(b, sz[0])
        uniform, count = struct.unpack_from(">II", b, p)
        out["n_samples"] = count
        if uniform:
            out["total_sample_bytes"] = uniform * count
        else:
            sizes = struct.unpack_from(f">{count}I", b, p + 8)
            out["total_sample_bytes"] = sum(sizes)
    return out


def parse_mp4(b: bytes) -> dict:
    """Container metadata: {brand, duration_s, tracks: [per-track dicts]}.

    Raises NotImplementedError for fragmented MP4 and ValueError for a
    malformed box tree.
    """
    boxes = list(_walk_boxes(b, 0, len(b)))
    types = [t for t, _, _ in boxes]
    if b"moof" in types:
        raise NotImplementedError(
            "fragmented MP4 (moof): sample tables live in movie fragments; "
            "needs a DASH/CMAF segment walker")
    if not boxes or types[0] != b"ftyp":
        raise ValueError("not an ISO BMFF file (no leading ftyp box)")
    ftyp_s = boxes[0][1]
    brand = b[ftyp_s: ftyp_s + 4].decode("latin-1")
    moov = next(((s, e) for t, s, e in boxes if t == b"moov"), None)
    if moov is None:
        raise ValueError("MP4 missing moov box")
    mv = _find(b, *moov, b"mvhd")
    duration = _parse_mvhd(b, mv[0]) if mv else 0.0
    tracks = [_parse_trak(b, s, e)
              for t, s, e in _walk_boxes(b, *moov) if t == b"trak"]
    return {"brand": brand, "duration_s": duration, "tracks": tracks}


def decode_mp4_frames(b: bytes):
    """Declared boundary: inter-frame codec decode requires ffmpeg/PyAV
    (H.264/H.265/AV1 bitstream decoding is out of scope for a pure-
    stdlib kernel). The metadata path above needs no decode."""
    raise NotImplementedError(
        "MP4 frame decode needs ffmpeg or PyAV; install one and swap "
        "this kernel — the Spark plumbing (schema, mapInPandas batch "
        "contract) is unchanged. See operators/multimodal.py.")


# ---------------------------------------------------------------- fixture


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + body)


def build_mp4(media_id: int, seed: int, *, timescale: int = 1000,
              n_video_samples: int | None = None,
              with_audio: bool = True) -> bytes:
    """Deterministic minimal MP4: ftyp + mdat + moov(mvhd, trak…).

    Sample counts/sizes/durations derive from (media_id, seed) so
    oracles can recompute them without parsing.
    """
    from logstash_integration_jdbc_spark.functions.xxhash import xxh64

    h = xxh64(f"mp4-{media_id}-{seed}".encode())
    nv = n_video_samples if n_video_samples is not None else 8 + h % 24
    dur_units = nv * 40  # 25 fps at timescale 1000
    w, hgt = 16 * (2 + (h >> 8) % 6), 16 * (2 + (h >> 16) % 4)
    sizes = [64 + ((h >> (i % 48)) & 0xFF) for i in range(nv)]

    def trak(track_id: int, handler: bytes, codec: bytes,
             smp_sizes: list[int], width: int = 0, height: int = 0) -> bytes:
        tkhd = _full(b"tkhd", 0, struct.pack(
            ">IIIII", 0, 0, track_id, 0, dur_units) + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16))
        mdhd = _full(b"mdhd", 0, struct.pack(
            ">IIIIHH", 0, 0, timescale, dur_units, 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + handler
                     + b"\x00" * 12 + b"h\x00")
        stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                     + _box(codec, b"\x00" * 78))
        stts = _full(b"stts", 0, struct.pack(">III", 1, len(smp_sizes), 40))
        stsz = _full(b"stsz", 0, struct.pack(">II", 0, len(smp_sizes))
                     + b"".join(struct.pack(">I", s_) for s_ in smp_sizes))
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, len(smp_sizes), 1))
        stco = _full(b"stco", 0, struct.pack(">II", 1, 48))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    mvhd = _full(b"mvhd", 0, struct.pack(
        ">IIII", 0, 0, timescale, dur_units) + b"\x00" * 80)
    traks = trak(1, b"vide", b"avc1", sizes, w, hgt)
    if with_audio:
        na = nv // 2 + 1
        traks += trak(2, b"soun", b"mp4a", [32] * na)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat = _box(b"mdat", bytes((h >> (i % 56)) & 0xFF for i in range(64)))
    return ftyp + mdat + moov
