"""Pure-stdlib GIF codec (decode + test-grade encoder).

Real format, real decoder, no Pillow: header + logical screen
descriptor, global/local color tables, extension-block skipping
(Graphic Control transparency index is honored by dropping alpha —
callers see RGB), image descriptors, variable-width LSB-first LZW
decompression with dictionary reset, and the 4-pass interlace row
ordering. ``parse_gif`` returns the FIRST frame as RGB;
``composite_gif_frames`` runs the full GIF89a animation model
(partial frames, local palettes, transparency, disposal methods
0-3), and >256-color composites re-encode through deterministic
median-cut quantization — the GIF surface needs no Pillow at all.

The encoder exists so tests can build REAL GIF bytes without any
library: single-frame, global palette, genuine LZW (dictionary growth,
width increases, 4096-entry reset), optional interlace. A hand-written
35-byte public-domain-shape 1×1 GIF vector anchors the decoder against
an external stream, so the encoder/decoder pair cannot share a
systematic bit-packing misunderstanding undetected.
"""

from __future__ import annotations

import struct


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, variable code width
    starting at min_code_size+1, CLEAR resets the dictionary, width
    grows when the next free slot reaches 2^width (cap 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []

    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated stream: treat as end-of-information
        byte0 = bitpos >> 3
        # up to 3 bytes cover any ≤12-bit code at any alignment
        window = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return code

    def reset():
        table = [[i] for i in range(clear)] + [[], []]
        return table, min_code_size + 1

    table, width = reset()
    prev: list[int] | None = None
    while len(out) < max_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code} in GIF stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:max_pixels]


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Encoder dual of ``_lzw_decode`` (same width-growth rule, offset
    by the decoder's one-entry lag)."""
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = fresh()
    codes.append((clear, width))
    w = b""
    for px in indices:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # decoder adds this entry AFTER consuming the code above,
            # so its width bump lands before the NEXT code — mirror it
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            codes.append((clear, width))
            table, next_code, width = fresh()
        w = bytes([px])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))

    acc = 0
    nacc = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << nacc
        nacc += cw
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    """Source-row order of an interlaced GIF → target row index list."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def parse_gif(payload: bytes):
    """Decode the first frame of a GIF87a/89a → (width, height,
    RGB ndarray (h, w, 3)). Transparent pixels resolve to their palette
    color (alpha drops, same contract as PNG/JPEG decode)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8,
                            count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8,
                                count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        arr = np.asarray(idx, dtype=np.int32).reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows
            out = np.zeros_like(arr)
            out[_deinterlace_rows(h)] = arr
            arr = out
        if int(arr.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF index out of color-table range")
        return w, h, pal[arr]
    raise ValueError("GIF contains no image descriptor")


def _read_gce(payload: bytes, pos: int) -> tuple[int, bool, int]:
    """(disposal, transparent_flag, transparent_index) out of a Graphic
    Control Extension whose block-size byte is at ``pos``."""
    packed = payload[pos + 1]
    return (packed >> 2) & 0x07, bool(packed & 1), payload[pos + 4]


def composite_gif_frames(payload: bytes, max_frames: int | None = None):
    """Fully composited frames of an animated GIF → list of
    (width, height, RGB ndarray (h, w, 3)) at CANVAS size.

    The complete GIF89a animation model, stdlib-only: partial frames
    painted at (left, top), per-frame local color tables, transparency
    (transparent pixels leave the canvas untouched), interlace, and all
    disposal methods — 0/1 leave the canvas, 2 restores the frame rect
    to background, 3 restores the canvas state prior to the frame.
    "Background" renders as the logical-screen background color when a
    global table supplies one (black otherwise) — the alpha-drop
    contract the rest of the image suite uses.
    """
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8,
                            count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (gct[bg] if gct is not None and bg < gct.shape[0]
              else np.zeros(3, dtype=np.uint8))

    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    painted = np.zeros((sh, sw), dtype=bool)
    frames: list[tuple[int, int, "np.ndarray"]] = []
    disposal, tflag, tindex = 0, False, 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                disposal, tflag, tindex = _read_gce(payload, pos)
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + w > sw or top + h > sh:
            raise ValueError("GIF frame rect exceeds the logical screen")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, dtype=np.uint8,
                                count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(data), w * h)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        arr = np.asarray(idx, dtype=np.int32).reshape(h, w)
        if ipacked & 0x40:
            out = np.zeros_like(arr)
            out[_deinterlace_rows(h)] = arr
            arr = out
        if int(arr.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF index out of color-table range")

        creg = canvas[top:top + h, left:left + w]
        preg = painted[top:top + h, left:left + w]
        saved = (creg.copy(), preg.copy()) if disposal == 3 else None
        mask = (arr != tindex) if tflag else np.ones((h, w), dtype=bool)
        creg[mask] = pal[arr[mask]]
        preg[mask] = True

        emit = canvas.copy()
        emit[~painted] = bg_rgb
        frames.append((sw, sh, emit))
        if max_frames is not None and len(frames) >= max_frames:
            return frames

        if disposal == 2:
            preg[:] = False
        elif disposal == 3 and saved is not None:
            creg[:], preg[:] = saved
        disposal, tflag, tindex = 0, False, 0  # GCE scopes one image
    return frames


def median_cut_palette(rgb, n_colors: int = 256):
    """Deterministic median-cut quantization → (palette (m, 3) uint8,
    index (h, w) int array), m ≤ n_colors.

    Classic Heckbert median cut over the image's UNIQUE colors
    (count-weighted): repeatedly split the box with the widest channel
    range at the weighted median of that channel; each box's palette
    entry is its count-weighted mean. All ordering comes from
    ``np.unique``'s lexicographic sort + explicit tie-breaks, so the
    same image always yields the same palette on any host."""
    import numpy as np

    flat = np.asarray(rgb, dtype=np.uint8).reshape(-1, 3)
    colors, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True)
    h_w = np.asarray(rgb).shape[:2]
    if colors.shape[0] <= n_colors:
        return colors.copy(), inverse.reshape(h_w)

    c32 = colors.astype(np.int64)
    boxes = [np.arange(colors.shape[0])]
    while len(boxes) < n_colors:
        best = None  # (range, pixel count, box index) — deterministic
        for bi, box in enumerate(boxes):
            if box.shape[0] < 2:
                continue
            rng = int((c32[box].max(axis=0) - c32[box].min(axis=0)).max())
            key = (rng, int(counts[box].sum()), -bi)
            if rng > 0 and (best is None or key > best[0]):
                best = (key, bi)
        if best is None:
            break
        bi = best[1]
        box = boxes[bi]
        spans = c32[box].max(axis=0) - c32[box].min(axis=0)
        ch = int(np.argmax(spans))  # first-widest channel on ties
        order = box[np.argsort(c32[box, ch], kind="stable")]
        cum = np.cumsum(counts[order])
        half = cum[-1] / 2.0
        cut = int(np.searchsorted(cum, half, side="left")) + 1
        cut = min(max(cut, 1), order.shape[0] - 1)
        boxes[bi] = order[:cut]
        boxes.append(order[cut:])

    pal = np.zeros((len(boxes), 3), dtype=np.uint8)
    color_to_entry = np.zeros(colors.shape[0], dtype=np.int64)
    for ei, box in enumerate(boxes):
        wsum = counts[box].astype(np.float64)
        mean = (c32[box] * wsum[:, None]).sum(axis=0) / wsum.sum()
        pal[ei] = np.clip(np.round(mean), 0, 255).astype(np.uint8)
        color_to_entry[box] = ei
    return pal, color_to_entry[inverse].reshape(h_w)


def gif_frames_as_standalone(payload: bytes) -> list[bytes]:
    """Every frame of an animated GIF as a standalone single-frame GIF.

    Fast path: the byte-level carve (``split_gif_frames``) when frames
    are full-canvas and opaque — no decode at all. Otherwise frames are
    composited (``composite_gif_frames``) and re-encoded: exact
    adaptive palette when the canvas has ≤256 distinct colors,
    deterministic median-cut quantization when mixed local palettes
    push it past 256."""
    import numpy as np

    try:
        return split_gif_frames(payload)
    except NotImplementedError:
        pass
    out: list[bytes] = []
    for _w, _h, rgb in composite_gif_frames(payload):
        colors, idx = median_cut_palette(rgb, 256)
        n = max(2, 1 << max(0, int(colors.shape[0] - 1).bit_length()))
        pal = np.zeros((n, 3), dtype=np.uint8)
        pal[:colors.shape[0]] = colors
        out.append(encode_gif(idx, pal))
    return out


def split_gif_frames(payload: bytes) -> list[bytes]:
    """Each frame of an animated GIF as a STANDALONE single-frame GIF
    (shared header + global color table re-prefixed), so every emitted
    frame decodes independently via ``parse_gif`` — the same contract
    as the M-JPEG frame carver.

    Byte-carve fast path, bounded to the shape where it is exact:
    full-canvas frames (left=top=0, frame dims = screen dims) without a
    transparency flag — each frame fully repaints, so the sampled frame
    IS the displayed frame without compositing. Partial or transparent
    frames raise ``NotImplementedError``; ``gif_frames_as_standalone``
    catches it and routes through ``composite_gif_frames``."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    prefix = payload[:pos]
    frames: list[bytes] = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4 and payload[pos + 1] & 1:
                raise NotImplementedError(
                    "transparent GIF frames need compositing — route "
                    "through gif_frames_as_standalone/"
                    "composite_gif_frames")
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        start = pos - 1
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        if (left, top) != (0, 0) or (w, h) != (sw, sh):
            raise NotImplementedError(
                "partial GIF frames need compositing — route through "
                "gif_frames_as_standalone/composite_gif_frames")
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        while payload[pos]:
            pos += 1 + payload[pos]
        pos += 1
        frames.append(prefix + payload[start:pos] + b"\x3B")
    return frames


def encode_gif_animation(frames, palette, screen=None, background=0) -> bytes:
    """Multi-frame GIF fixture factory.

    Back-compat form: ``frames`` = list of full-canvas (h, w) index
    arrays sharing the global ``palette`` (opaque, no GCE) — the
    subset the byte-carve handles.

    Compositing form: a frame may instead be a dict
    ``{"idx": (h, w) array, "left": int, "top": int,
       "disposal": 0-3, "transparent_index": int | None,
       "palette": local (n, 3) table | None}``
    — emitted with a Graphic Control Extension and (optionally) a
    local color table, exactly the shapes ``composite_gif_frames``
    exists to handle. ``screen=(w, h)`` sets the logical screen when
    the first frame is partial; ``background`` is the LSD background
    color index.
    """
    import numpy as np

    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    n = palette.shape[0]
    if n < 2 or n & (n - 1):
        raise ValueError("palette size must be a power of two >= 2")

    def spec(fr):
        if isinstance(fr, dict):
            return fr
        return {"idx": fr}

    first = spec(frames[0])
    fh, fw = np.asarray(first["idx"]).shape
    if screen is None:
        if first.get("left") or first.get("top"):
            raise ValueError("screen= required when the first frame is "
                             "offset")
        screen = (fw, fh)
    sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (n.bit_length() - 2),
                       background, 0)
    out += palette.tobytes()
    for fr in frames:
        s = spec(fr)
        idx = np.ascontiguousarray(s["idx"], dtype=np.uint8)
        h, w = idx.shape
        left, top = int(s.get("left", 0)), int(s.get("top", 0))
        if left + w > sw or top + h > sh:
            raise ValueError("frame rect exceeds the logical screen")
        lpal = s.get("palette")
        if lpal is not None:
            lpal = np.ascontiguousarray(lpal, dtype=np.uint8)
            ln = lpal.shape[0]
            if ln < 2 or ln & (ln - 1):
                raise ValueError("local palette size must be a power of "
                                 "two >= 2")
        plim = (lpal if lpal is not None else palette).shape[0]
        if int(idx.max(initial=0)) >= plim:
            raise ValueError("index out of palette range")
        tidx = s.get("transparent_index")
        disposal = int(s.get("disposal", 0))
        if tidx is not None or disposal:
            gce_packed = (disposal & 0x07) << 2 | (1 if tidx is not None else 0)
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, gce_packed, 0,
                               tidx or 0, 0)
        ipacked = 0x80 | (ln.bit_length() - 2) if lpal is not None else 0x00
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, ipacked)
        if lpal is not None:
            out += lpal.tobytes()
        mcs = max(2, plim.bit_length() - 1)
        out.append(mcs)
        data = _lzw_encode(mcs, idx.reshape(-1).tolist())
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def encode_gif(idx, palette, interlace: bool = False) -> bytes:
    """Single-frame GIF from an (h, w) index array + (n, 3) palette
    (n a power of two, 2..256). Real LZW; fixture factory for tests."""
    import numpy as np

    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = palette.shape[0]
    if n < 2 or n & (n - 1):
        raise ValueError("palette size must be a power of two >= 2")
    if int(idx.max(initial=0)) >= n:
        raise ValueError("index out of palette range")
    size_field = n.bit_length() - 2  # 2 << f == n
    min_code_size = max(2, n.bit_length() - 1)
    rows = idx[_deinterlace_rows(h)] if interlace else idx
    data = _lzw_encode(min_code_size, rows.reshape(-1).tolist())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0x00)
    out.append(min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
