"""GIF codec: LZW decode/encode, palette, interlace, external vector."""

import numpy as np
import pytest

from logstash_integration_jdbc_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    parse_gif,
)

# the canonical 35-byte 1×1 white GIF — an EXTERNAL stream (public
# minimal-GIF construction), so encoder and decoder cannot share a
# bit-packing misunderstanding undetected
TINY_WHITE = bytes.fromhex(
    "474946383961010001008000"      # header + LSD (GCT, 2 entries)
    "00ffffff000000"                # palette: white, black
    "2c000000000100010000"          # image descriptor 1×1
    "0202440100"                    # min code size 2; data block 44 01
    "3b"
)


def test_external_minimal_gif_vector():
    w, h, px = parse_gif(TINY_WHITE)
    assert (w, h) == (1, 1) and px.tolist() == [[[255, 255, 255]]]


def test_roundtrip_shapes_palettes_interlace():
    rng = np.random.RandomState(11)
    for (h, w, ncol), interlace in [
        ((13, 17, 4), False), ((16, 16, 16), False), ((9, 33, 256), False),
        ((13, 17, 4), True), ((40, 25, 8), True), ((1, 1, 2), False),
        ((64, 48, 256), True),
    ]:
        pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
        idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
        gw, gh, got = parse_gif(encode_gif(idx, pal, interlace=interlace))
        assert (gw, gh) == (w, h) and np.array_equal(got, pal[idx]), \
            ((h, w, ncol), interlace)


def test_lzw_dictionary_stress():
    # long runs (KwKwK case) and enough data to force width growth +
    # the 4096-entry dictionary reset
    seq = [0] * 5000 + [1] * 3000 + [0, 1] * 2000
    assert _lzw_decode(2, _lzw_encode(2, seq), len(seq)) == seq
    rng = np.random.RandomState(3)
    seq = rng.randint(0, 16, size=30000).tolist()
    assert _lzw_decode(4, _lzw_encode(4, seq), len(seq)) == seq


def test_gif_skips_extensions():
    # splice a Graphic Control Extension before the image descriptor
    gce = bytes.fromhex("21f90404000000" + "00")  # label f9, 4-byte block
    spliced = TINY_WHITE[:19] + gce + TINY_WHITE[19:]
    w, h, px = parse_gif(spliced)
    assert (w, h) == (1, 1) and px[0, 0].tolist() == [255, 255, 255]


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(np.zeros((2, 2), np.uint8), np.zeros((3, 3), np.uint8))
    with pytest.raises(ValueError, match="palette range"):
        encode_gif(np.full((2, 2), 3, np.uint8), np.zeros((2, 3), np.uint8))
    # truncated image data surfaces as an error, not a short frame
    full = encode_gif(np.zeros((8, 8), np.uint8),
                      np.array([[0, 0, 0], [1, 1, 1]], np.uint8))
    with pytest.raises(ValueError):
        parse_gif(full[:30] + b"\x00\x3b")


def test_gif_spec_fixture_roundtrip():
    from logstash_integration_jdbc_spark.operators.multimodal import (
        build_palette_pixels,
    )

    for mid in (0, 3, 11):
        pal, idx = build_palette_pixels(mid, 42, 12, 9)
        blob = encode_gif(idx, pal, interlace=bool(mid % 2))
        w, h, got = parse_gif(blob)
        assert (w, h) == (12, 9) and np.array_equal(got, pal[idx])
