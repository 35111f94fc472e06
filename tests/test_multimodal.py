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
