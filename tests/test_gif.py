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


def test_animated_gif_split_and_decode():
    from logstash_integration_jdbc_spark.functions.gif import (
        encode_gif_animation,
        split_gif_frames,
    )

    rng = np.random.RandomState(17)
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    frames = [rng.randint(0, 16, size=(9, 7)).astype(np.uint8)
              for _ in range(5)]
    blob = encode_gif_animation(frames, pal)
    parts = split_gif_frames(blob)
    assert len(parts) == 5
    for f, part in zip(frames, parts):
        w, h, got = parse_gif(part)
        assert (w, h) == (7, 9) and np.array_equal(got, pal[f])
    # each standalone frame is byte-identical to encode_gif of it —
    # the property the driver oracle rests on
    for f, part in zip(frames, parts):
        assert part == encode_gif(f, pal)


def test_split_gif_frames_compositing_boundary():
    from logstash_integration_jdbc_spark.functions.gif import (
        encode_gif_animation,
        split_gif_frames,
    )

    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    blob = bytearray(encode_gif_animation(
        [np.zeros((4, 4), np.uint8)] * 2, pal))
    # shrink frame 2's descriptor dims → partial frame → Pillow boundary
    i = blob.find(b"\x2C", 14)
    j = blob.find(b"\x2C", i + 1)
    blob[j + 5 : j + 7] = (2).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="Pillow"):
        split_gif_frames(bytes(blob))
    # transparency flag in a GCE → Pillow boundary
    gce = bytes.fromhex("21f904" + "05000000" + "00")
    t = bytearray(encode_gif_animation([np.zeros((4, 4), np.uint8)], pal))
    k = t.find(b"\x2C", 14)
    with pytest.raises(NotImplementedError, match="Pillow"):
        split_gif_frames(bytes(t[:k]) + gce + bytes(t[k:]))


def test_sample_frames_animated_gif(spark):
    from logstash_integration_jdbc_spark.operators.multimodal import (
        gen_media,
        sample_frames,
    )

    media = gen_media(spark, n_rows=40, video_format="gif")
    out = sample_frames(media, every_n=2, max_frames=3).collect()
    assert out, "expected sampled GIF frames"
    for r in out[:5]:
        w, h, px = parse_gif(bytes(r.frame_bytes))
        assert w > 0 and h > 0 and px.shape == (h, w, 3)
