"""Real image decode (pure-numpy BMP24/PPM-P6 codecs) + the decode actor."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.multimodal import (DecodeImage, decode_bmp24,
                                                 decode_images, decode_ppm,
                                                 encode_bmp24, resize_nearest)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (4, 4), (5, 7), (16, 11)])
def test_bmp24_roundtrip_all_padding_widths(w, h):
    """Row padding differs by width % 4 — every case must round-trip."""
    rng = np.random.RandomState(w * 100 + h)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp24(encode_bmp24(img)), img)


def test_bmp24_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp24(b"nope")
    buf = bytearray(encode_bmp24(np.zeros((2, 2, 3), np.uint8)))
    buf[28:30] = (8).to_bytes(2, "little")  # claim 8-bit
    with pytest.raises(NotImplementedError):
        decode_bmp24(bytes(buf))


def test_ppm_p6_decode_with_comments():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = b"P6\n# a comment\n3 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(buf), img)


def test_resize_nearest_mapping_and_passthrough():
    img = np.arange(16 * 10 * 3, dtype=np.uint8).reshape(10, 16, 3)
    small = resize_nearest(img, 8)
    assert small.shape == (5, 8, 3)  # 10*8//16, 8
    # floor mapping src = dst * src // dst
    assert np.array_equal(small[2, 3], img[2 * 10 // 5, 3 * 16 // 8])
    tiny = np.ones((4, 6, 3), np.uint8)
    assert resize_nearest(tiny, 8) is tiny  # passthrough, no copy


def test_decode_image_actor_stats_match_numpy(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    imgs = [rng.randint(0, 256, size=(rng.randint(2, 12), rng.randint(2, 20),
                                      3), dtype=np.uint8) for _ in range(9)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(9, dtype=np.int64)),
        "payload": pa.array([encode_bmp24(im) for im in imgs], pa.binary()),
    })
    out = {r["doc_id"]: r for r in
           decode_images(ray.data.from_arrow(tbl), max_side=8,
                         concurrency=2).take_all()}
    for i, im in enumerate(imgs):
        r = out[i]
        assert (r["height"], r["width"]) == im.shape[:2]
        assert r["sum_r"] == int(im[:, :, 0].sum())
        assert r["sum_b"] == int(im[:, :, 2].sum())
        small = resize_nearest(im, 8)
        assert r["resized_graysum"] == int(
            (small.sum(axis=2, dtype=np.int64) // 3).sum())


def test_decode_image_mixed_formats_one_batch():
    d = DecodeImage()
    img = np.full((3, 3, 3), 9, np.uint8)
    ppm = b"P6\n3 3\n255\n" + img.tobytes()
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "payload": pa.array([encode_bmp24(img), ppm], pa.binary())})
    out = d(t)
    assert out["sum_r"].to_pylist() == [81, 81]
    with pytest.raises(NotImplementedError):
        d.decode(b"\x89PNG\r\n")  # compressed needs PIL


def test_wav_roundtrip_and_stdlib_parity():
    """encode_wav_pcm16 produces a container the stdlib wave module accepts;
    decode_wav_pcm16 round-trips samples exactly and rejects non-PCM."""
    import io
    import wave

    import numpy as np
    import pytest

    from osm_lump_ways_ray.stages.multimodal import (decode_wav_pcm16,
                                                     encode_wav_pcm16)

    s = np.array([0, 1, -1, 32767, -32768, 12345], np.int16)
    buf = encode_wav_pcm16(s, 8000)
    w = wave.open(io.BytesIO(buf))
    assert (w.getnchannels(), w.getsampwidth(), w.getframerate(),
            w.getnframes()) == (1, 2, 8000, 6)
    dec, rate = decode_wav_pcm16(buf)
    assert rate == 8000 and (dec == s.astype(np.int64)).all()
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxNOPE" + buf[12:])


def test_decode_audio_features():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.multimodal import (DecodeAudio,
                                                     encode_wav_pcm16)

    s = np.array([5, -3, 4, 0, -2], np.int16)   # crossings: 5/-3, -3/4 → 2
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_wav_pcm16(s, 16000)],
                                      pa.binary())})
    out = DecodeAudio()(t)
    assert out["n_samples"].to_pylist() == [5]
    assert out["sum_s"].to_pylist() == [4]
    assert out["abs_max"].to_pylist() == [5]
    assert out["zero_x"].to_pylist() == [2]


# ─────────────────────────────────────────── PNG codec (stdlib zlib, no PIL)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [None, 0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(ch, filter_type):
    from osm_lump_ways_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(ch * 10 + (filter_type or 7))
    shape = (9, 13) if ch == 1 else (9, 13, ch)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    dec = decode_png(encode_png(img, filter_type=filter_type))
    want = img[:, :, None] if ch == 1 else img
    assert np.array_equal(dec, want)


def test_png_adaptive_heuristic_mixes_filters():
    """Flat + gradient + noise rows must make the min-sum-of-abs heuristic
    pick more than one filter type — so a decode of an adaptive encode
    exercises several unfilter paths in one payload."""
    import zlib

    from osm_lump_ways_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.RandomState(3)
    x = np.arange(24)
    grad = ((x[None, :, None] * 3 + np.arange(8)[:, None, None] * 5
             + np.arange(3)[None, None, :] * 11) % 256).astype(np.uint8)
    img = np.vstack([np.zeros((4, 24, 3), np.uint8), grad,
                     rng.randint(0, 256, (6, 24, 3), np.uint8)])
    buf = encode_png(img)
    assert np.array_equal(decode_png(buf), img)
    # peel the IDAT to inspect the chosen per-row filter bytes
    idat = buf.split(b"IDAT")[1]
    raw = zlib.decompress(idat[:-(4 + 8)] if b"IEND" not in idat
                          else idat.split(b"IEND")[0][:-8])
    filters = set(np.frombuffer(raw, np.uint8).reshape(
        img.shape[0], 1 + 24 * 3)[:, 0].tolist())
    assert len(filters) >= 2, filters


def test_png_decode_handbuilt_spec_bytes():
    """Decode a PNG constructed byte-by-byte from the spec, independent of
    encode_png (no shared code but stdlib zlib): 2x2 RGB, row 0 filter Sub,
    row 1 filter Up."""
    import binascii
    import zlib

    from osm_lump_ways_ray.stages.multimodal import decode_png

    def chunk(tag, payload):
        return (len(payload).to_bytes(4, "big") + tag + payload
                + binascii.crc32(tag + payload).to_bytes(4, "big"))

    # pixels: row0 = (10,20,30),(15,25,35)  row1 = (12,22,32),(18,28,38)
    # Sub row0: first px raw, second px minus left = (5,5,5)
    # Up  row1: minus row0    = (2,2,2),(3,3,3)
    scan = bytes([1, 10, 20, 30, 5, 5, 5,
                  2, 2, 2, 2, 3, 3, 3])
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    want = np.array([[[10, 20, 30], [15, 25, 35]],
                     [[12, 22, 32], [18, 28, 38]]], np.uint8)
    assert np.array_equal(decode_png(buf), want)


def test_png_rgb_view_and_unsupported():
    from osm_lump_ways_ray.stages.multimodal import (decode_png,
                                                     decode_png_rgb,
                                                     encode_png)

    g = np.arange(30, dtype=np.uint8).reshape(6, 5)
    assert np.array_equal(decode_png_rgb(encode_png(g)),
                          np.repeat(g[:, :, None], 3, axis=2))
    rgba = np.arange(120, dtype=np.uint8).reshape(6, 5, 4)
    assert np.array_equal(decode_png_rgb(encode_png(rgba)), rgba[:, :, :3])
    with pytest.raises(ValueError):
        decode_png(b"NOTAPNG")
    # 16-bit depth rejected: patch the IHDR depth byte and re-CRC
    import binascii

    buf = bytearray(encode_png(g))
    ihdr_at = buf.index(b"IHDR")
    buf[ihdr_at + 12] = 16
    crc = binascii.crc32(bytes(buf[ihdr_at:ihdr_at + 17]))
    buf[ihdr_at + 17:ihdr_at + 21] = crc.to_bytes(4, "big")
    with pytest.raises(NotImplementedError):
        decode_png(bytes(buf))


def test_decode_image_routes_png_magic():
    from osm_lump_ways_ray.stages.multimodal import encode_png

    img = ((np.arange(36).reshape(3, 4, 3) * 5) % 256).astype(np.uint8)
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([encode_png(img), encode_bmp24(img)],
                                      pa.binary())})
    out = DecodeImage()(t)
    assert out["sum_r"].to_pylist()[0] == out["sum_r"].to_pylist()[1]
    assert out["n_pixels"].to_pylist() == [12, 12]


# ─────────────────────────────────────────────── baseline JPEG (stages/jpeg)

def test_jpeg_quality_tables_scaling():
    from osm_lump_ways_ray.stages.jpeg import (STD_LUM_Q, quality_tables)

    lum100, chrom100 = quality_tables(100)
    assert (lum100 == 1).all() and (chrom100 == 1).all()
    lum50, _ = quality_tables(50)  # scale 100 → the Annex K base table
    assert (lum50 == STD_LUM_Q).all()
    lum1, _ = quality_tables(1)
    assert lum1.max() <= 255 and lum1.min() >= 1


def test_jpeg_block_constant_gray_q100_bit_exact():
    """All-ones quant tables + per-block-constant pixels → zero AC terms and
    an exact-integer DC, so the full encode→decode path is lossless."""
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    for _ in range(4):
        h, w = (int(x) for x in rng.integers(9, 41, 2))
        bv = rng.integers(0, 256,
                          ((h + 7) // 8, (w + 7) // 8)).astype(np.uint8)
        img = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w]
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == (h, w, 1)
        assert (out[:, :, 0] == img).all()


@pytest.mark.parametrize("quality,tol", [(95, 8), (75, 32)])
def test_jpeg_gray_gradient_tolerance(quality, tol):
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg, encode_jpeg

    x = np.arange(53)
    y = np.arange(37)
    img = ((x[None, :] * 5 + y[:, None] * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= tol


def test_jpeg_rgb_roundtrip_tolerance_and_shape():
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg_rgb, encode_jpeg

    x = np.arange(29)
    y = np.arange(22)
    c = np.arange(3)
    img = ((x[None, :, None] * 7 + y[:, None, None] * 3
            + c[None, None, :] * 29) % 256).astype(np.uint8)
    out = decode_jpeg_rgb(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    # YCbCr roundtrip + chroma quantization: tolerance, not exactness
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 20


def test_jpeg_restart_interval_parity():
    """DRI/RSTn markers segment the entropy stream and reset DC predictors;
    the decoded pixels must be identical to the no-restart encoding."""
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg, encode_jpeg

    x = np.arange(40)
    y = np.arange(24)
    img = ((x[None, :] * 11 + y[:, None] * 7) % 256).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    restarted = decode_jpeg(encode_jpeg(img, quality=85,
                                        restart_interval=2))
    assert (plain == restarted).all()


def test_jpeg_rejects_progressive_and_extreme_sampling():
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 16), 90, np.uint8)
    buf = bytearray(encode_jpeg(img, quality=90))
    sof_at = buf.index(b"\xff\xc0")
    buf[sof_at + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))

    buf = bytearray(encode_jpeg(np.repeat(img[:, :, None], 3, 2),
                                quality=90))
    sof_at = buf.index(b"\xff\xc0")
    buf[sof_at + 11] = 0x33  # Y component h=v=3 → beyond the ≤2 support
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 — 2×2 box-averaged chroma, interleaved 4-Y-per-MCU scan,
    replicate upsample on decode: smooth images roundtrip near-exactly,
    constant-color images exactly at q100, and restarts stay bit-stable."""
    from osm_lump_ways_ray.stages.jpeg import decode_jpeg_rgb, encode_jpeg

    x = np.arange(80)
    y = np.arange(64)
    c = np.arange(3)
    smooth = np.clip(np.rint(100 + 30 * np.sin(y[:, None, None] / 6)
                             + 40 * np.cos(x[None, :, None] / 8)
                             + c[None, None, :] * 5), 0, 255).astype(np.uint8)
    buf420 = encode_jpeg(smooth, quality=95, subsample="420")
    buf444 = encode_jpeg(smooth, quality=95)
    assert len(buf420) < len(buf444)  # subsampling actually shrinks chroma
    out = decode_jpeg_rgb(buf420)
    assert out.shape == smooth.shape
    assert int(np.abs(out.astype(int) - smooth.astype(int)).max()) <= 4

    const = np.full((24, 24, 3), (120, 60, 200), np.uint8)
    o = decode_jpeg_rgb(encode_jpeg(const, quality=100, subsample="420"))
    assert (o == const).all()

    odd = smooth[:21, :27]  # non-multiple-of-16 dims exercise MCU padding
    a = decode_jpeg_rgb(encode_jpeg(odd, quality=85, subsample="420",
                                    restart_interval=2))
    b = decode_jpeg_rgb(encode_jpeg(odd, quality=85, subsample="420"))
    assert a.shape == odd.shape and (a == b).all()


def test_decode_image_routes_jpeg_magic():
    """DecodeImage routes FFD8 payloads through the real T.81 codec; a
    grayscale block-constant q100 JPEG must yield exact channel sums."""
    from osm_lump_ways_ray.stages.jpeg import encode_jpeg

    img = np.full((10, 12), 77, np.uint8)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_jpeg(img, quality=100)],
                                      pa.binary())})
    out = DecodeImage()(t)
    assert out["n_pixels"].to_pylist() == [120]
    assert out["sum_r"].to_pylist() == [77 * 120]
    assert out["sum_g"].to_pylist() == out["sum_r"].to_pylist()
