"""ISO BMFF (MP4) container parsing — metadata without frame decode.

A video-curation pipeline filters clips by duration / codec / frame
count / bitrate BEFORE paying for any decode; all of that lives in the
MP4 container's ``moov`` box tree (ISO/IEC 14496-12, the public ISO
Base Media File Format spec). This module walks the box structure with
``struct`` only:

- ``parse_mp4``: ftyp brand, mvhd movie duration, and per-track
  handler / codec fourcc / sample count+sizes / duration from
  tkhd · mdhd · hdlr · stsd · stsz; fragmented (DASH/CMAF) files
  aggregate the same totals out of every ``moof``'s traf→tfhd/trun
  sample tables with tfhd→trex default fallback (§8.8) and take the
  movie duration from ``mvex/mehd``.
- ``build_mp4`` / ``build_fragmented_mp4``: deterministic
  minimal-but-spec-valid fixture builders for tests and oracles.

Frame DECODE of inter-frame codecs (H.264/H.265/AV1) is a declared
boundary: it needs ffmpeg/PyAV, and the sandbox ships neither — the
decode entry points raise ``NotImplementedError`` naming the library.
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
        out["_timescale"] = timescale
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


def _parse_trex(b: bytes, s: int) -> dict:
    _v, p = _fullbox(b, s)
    tid, _sdi, ddur, dsize, _dflags = struct.unpack_from(">IIIII", b, p)
    return {"track_id": tid, "default_duration": ddur,
            "default_size": dsize}


def _parse_trun(b: bytes, s: int, defaults: dict) -> tuple[int, int, int]:
    """(sample_count, total_bytes, total_duration_units) of one trun,
    filling per-sample fields from tfhd/trex defaults when absent."""
    flags = struct.unpack_from(">I", b, s)[0] & 0xFFFFFF
    p = s + 4
    count = struct.unpack_from(">I", b, p)[0]
    p += 4
    if flags & 0x000001:  # data-offset-present
        p += 4
    if flags & 0x000004:  # first-sample-flags-present
        p += 4
    per = ((4 if flags & 0x000100 else 0) + (4 if flags & 0x000200 else 0)
           + (4 if flags & 0x000400 else 0) + (4 if flags & 0x000800 else 0))
    total_bytes = 0
    total_dur = 0
    for i in range(count):
        q = p + i * per
        if flags & 0x000100:
            total_dur += struct.unpack_from(">I", b, q)[0]
            q += 4
        else:
            total_dur += defaults.get("duration", 0)
        if flags & 0x000200:
            total_bytes += struct.unpack_from(">I", b, q)[0]
        else:
            total_bytes += defaults.get("size", 0)
    return count, total_bytes, total_dur


def _parse_moof(b: bytes, s: int, e: int, trex_by_id: dict) -> dict:
    """Per-track (n_samples, bytes, duration_units) aggregates of one
    movie fragment."""
    out: dict[int, list[int]] = {}
    for typ, ts, te in _walk_boxes(b, s, e):
        if typ != b"traf":
            continue
        tf = _find(b, ts, te, b"tfhd")
        if tf is None:
            raise ValueError("traf missing tfhd")
        tf_flags = struct.unpack_from(">I", b, tf[0])[0] & 0xFFFFFF
        p = tf[0] + 4
        tid = struct.unpack_from(">I", b, p)[0]
        p += 4
        if tf_flags & 0x000001:  # base-data-offset
            p += 8
        if tf_flags & 0x000002:  # sample-description-index
            p += 4
        trex = trex_by_id.get(tid, {})
        defaults = {"duration": trex.get("default_duration", 0),
                    "size": trex.get("default_size", 0)}
        if tf_flags & 0x000008:
            defaults["duration"] = struct.unpack_from(">I", b, p)[0]
            p += 4
        if tf_flags & 0x000010:
            defaults["size"] = struct.unpack_from(">I", b, p)[0]
            p += 4
        agg = out.setdefault(tid, [0, 0, 0])
        for t2, s2, e2 in _walk_boxes(b, ts, te):
            if t2 == b"trun":
                n, nb, nd = _parse_trun(b, s2, defaults)
                agg[0] += n
                agg[1] += nb
                agg[2] += nd
    return out


def parse_mp4(b: bytes) -> dict:
    """Container metadata: {brand, duration_s, tracks: [per-track
    dicts], fragmented, n_fragments}.

    Fragmented (DASH/CMAF) files aggregate sample count / bytes /
    duration out of every ``moof``'s traf→tfhd/trun tables, with
    tfhd-then-trex default fallback per ISO 14496-12 §8.8; movie
    duration comes from ``mvex/mehd`` when present, else the longest
    track's fragment total. Raises ValueError for a malformed box tree.
    """
    boxes = list(_walk_boxes(b, 0, len(b)))
    types = [t for t, _, _ in boxes]
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
    moofs = [(s, e) for t, s, e in boxes if t == b"moof"]
    if not moofs:
        return {"brand": brand, "duration_s": duration, "tracks": tracks,
                "fragmented": False, "n_fragments": 0}

    # fragment defaults + declared whole-movie duration live in mvex
    trex_by_id: dict[int, dict] = {}
    mehd_duration = None
    mvex = _find(b, *moov, b"mvex")
    timescale = None
    if mv:
        v, p = _fullbox(b, mv[0])
        timescale = struct.unpack_from(
            ">I", b, p + (8 if v == 1 else 4))[0]
    if mvex:
        for typ, s, e in _walk_boxes(b, *mvex):
            if typ == b"trex":
                t = _parse_trex(b, s)
                trex_by_id[t["track_id"]] = t
            elif typ == b"mehd":
                v, p = _fullbox(b, s)
                mehd_duration = struct.unpack_from(
                    ">Q" if v == 1 else ">I", b, p)[0]

    totals: dict[int, list[int]] = {}
    for s, e in moofs:
        for tid, (n, nb, nd) in _parse_moof(b, s, e, trex_by_id).items():
            agg = totals.setdefault(tid, [0, 0, 0])
            agg[0] += n
            agg[1] += nb
            agg[2] += nd
    # mdhd timescale is per-track; fragment durations are in it
    for tr in tracks:
        agg = totals.get(tr["track_id"])
        if agg is None:
            continue
        tr["n_samples"] += agg[0]
        tr["total_sample_bytes"] += agg[1]
        scale = tr.get("_timescale") or timescale
        if scale:
            tr["duration_s"] += agg[2] / scale
    if mehd_duration is not None and timescale:
        duration = mehd_duration / timescale
    elif not duration:
        duration = max((t["duration_s"] for t in tracks), default=0.0)
    return {"brand": brand, "duration_s": duration, "tracks": tracks,
            "fragmented": True, "n_fragments": len(moofs)}


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


def build_fragmented_mp4(media_id: int, seed: int, *, timescale: int = 1000,
                         n_fragments: int | None = None,
                         samples_per_fragment: int | None = None) -> bytes:
    """Deterministic fragmented (CMAF-shaped) MP4: ftyp + moov(mvhd
    duration 0, trak with EMPTY sample tables, mvex(mehd + trex
    defaults)) followed by per-fragment moof(mfhd, traf(tfhd, trun)) +
    mdat. Fragment 0's trun carries explicit sizes AND durations,
    fragment 1 sizes only (duration from tfhd), later fragments lean
    entirely on trex defaults — covering every default-fallback path
    the parser implements. Aggregates derive from (media_id, seed) so
    oracles recompute them without parsing.
    """
    from logstash_integration_jdbc_spark.functions.xxhash import xxh64

    h = xxh64(f"fmp4-{media_id}-{seed}".encode())
    nf = n_fragments if n_fragments is not None else 2 + h % 4
    spf = (samples_per_fragment if samples_per_fragment is not None
           else 4 + (h >> 8) % 5)
    trex_dur, trex_size = 40, 100
    tfhd_dur = 50

    def frag_samples(fi: int) -> list[tuple[int, int]]:
        """(size, duration) per sample of fragment fi (the generator
        formula oracles replay)."""
        out = []
        for i in range(spf):
            if fi == 0:
                out.append((64 + ((h >> ((fi * 7 + i) % 48)) & 0x7F),
                            30 + ((h >> (i % 32)) & 0x1F)))
            elif fi == 1:
                out.append((80 + ((h >> ((i * 5) % 40)) & 0x3F), tfhd_dur))
            else:
                out.append((trex_size, trex_dur))
        return out

    tkhd = _full(b"tkhd", 0, struct.pack(">IIIII", 0, 0, 1, 0, 0)
                 + b"\x00" * 52 + struct.pack(">II", 64 << 16, 48 << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, 0,
                                         0x55C4, 0))
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"h\x00")
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"avc1", b"\x00" * 78))
    stts = _full(b"stts", 0, struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, struct.pack(">II", 0, 0))
    stsc = _full(b"stsc", 0, struct.pack(">I", 0))
    stco = _full(b"stco", 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
    trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr
                                     + _box(b"minf", stbl)))
    total_dur = sum(d for fi in range(nf) for _s, d in frag_samples(fi))
    mehd = _full(b"mehd", 0, struct.pack(">I", total_dur))
    trex = _full(b"trex", 0, struct.pack(">IIIII", 1, 1, trex_dur,
                                         trex_size, 0))
    mvex = _box(b"mvex", mehd + trex)
    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, 0)
                 + b"\x00" * 80)
    moov = _box(b"moov", mvhd + trak + mvex)
    ftyp = _box(b"ftyp", b"cmfc" + struct.pack(">I", 512) + b"cmfciso6")

    out = bytearray(ftyp + moov)
    for fi in range(nf):
        samples = frag_samples(fi)
        mfhd = _full(b"mfhd", 0, struct.pack(">I", fi + 1))
        if fi == 0:
            tfhd = _full(b"tfhd", 0, struct.pack(">I", 1))
            trun_flags = 0x000300  # durations + sizes
            body = struct.pack(">I", len(samples)) + b"".join(
                struct.pack(">II", d, s) for s, d in samples)
        elif fi == 1:
            tfhd_body = struct.pack(">II", 1, tfhd_dur)
            tfhd = _box(b"tfhd", struct.pack(">I", 0x000008) + tfhd_body)
            trun_flags = 0x000200  # sizes only
            body = struct.pack(">I", len(samples)) + b"".join(
                struct.pack(">I", s) for s, _d in samples)
        else:
            tfhd = _full(b"tfhd", 0, struct.pack(">I", 1))
            trun_flags = 0x000001  # data-offset only, all defaults
            body = struct.pack(">I", len(samples)) + struct.pack(">i", 0)
        trun = _box(b"trun", struct.pack(">I", trun_flags) + body)
        moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        mdat = _box(b"mdat", bytes((h >> ((fi + i) % 56)) & 0xFF
                                   for i in range(32)))
        out += moof + mdat
    return bytes(out)
