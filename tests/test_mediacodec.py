"""mediacodec: REAL pure-numpy WAV/PNM decode — known bytes pin known
features, and the multimodal Spark kernels route decodable formats
through the real path while stubbing only PIL/ffmpeg-needing formats."""

import numpy as np
import pytest

from dqc_spark.mediacodec import (
    audio_features,
    decode_pnm,
    decode_wav,
    encode_pnm,
    encode_wav,
    feature_vector,
    image_features,
    resize_nearest,
    sniff_decodable,
)


def _sine(freq=440.0, rate=16000, seconds=1.0, amp=1.0):
    t = np.arange(int(rate * seconds)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_wav_roundtrip_and_features():
    x = _sine()
    data = encode_wav(x, rate=16000, bits=16)
    got, rate, ch = decode_wav(data)
    assert rate == 16000 and ch == 1 and got.shape == (16000, 1)
    assert np.abs(got[:, 0] - x).max() < 1e-3  # 16-bit quantization

    f = audio_features(data)
    assert f["duration_s"] == pytest.approx(1.0)
    assert f["rms"] == pytest.approx(1 / np.sqrt(2), abs=1e-3)
    assert f["peak"] == pytest.approx(1.0, abs=1e-3)
    # a 440 Hz sine crosses zero 2*440 times per second
    assert f["zcr"] == pytest.approx(880 / 16000, abs=1e-3)
    # spectral energy concentrates in ONE band
    assert max(f["bands"]) > 0.95 and sum(f["bands"]) == pytest.approx(1.0)


def test_wav_bit_depths_and_stereo():
    x = _sine(amp=0.5)
    for bits, tol in [(8, 1e-2), (16, 1e-3), (32, 1e-6)]:
        got, _, _ = decode_wav(encode_wav(x, bits=bits))
        assert np.abs(got[:, 0] - x).max() < tol, bits
    stereo = np.stack([x, -x], axis=1)
    got, rate, ch = decode_wav(encode_wav(stereo, rate=8000))
    assert ch == 2 and rate == 8000
    assert np.abs(got - stereo).max() < 1e-3
    # mono mix of (x, -x) cancels -> near-zero rms
    assert audio_features(encode_wav(stereo))["rms"] < 1e-3


def test_wav_chunk_walk_skips_foreign_chunks():
    # LIST chunk between WAVE and fmt, odd-sized chunk word-aligned
    import struct

    base = encode_wav(_sine(seconds=0.01))
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data = base[:12] + foreign + base[12:]
    f = audio_features(data)
    assert f["duration_s"] == pytest.approx(0.01)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_pnm_roundtrip_decode_and_features():
    img = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]],
         [[0, 0, 0], [128, 128, 128], [255, 255, 0], [0, 255, 255]]],
        dtype=np.uint8,
    )
    data = encode_pnm(img)
    assert data.startswith(b"P6\n4 2\n255\n")
    assert np.array_equal(decode_pnm(data), img)

    f = image_features(data)
    assert (f["width"], f["height"], f["channels"]) == (4, 2, 3)
    assert f["mean"][0] == pytest.approx(img[:, :, 0].mean() / 255)
    assert sum(f["hist"]) == pytest.approx(1.0)

    # uniform image -> zero edge energy; checkerboard -> large
    flat = encode_pnm(np.full((8, 8, 3), 100, np.uint8))
    assert image_features(flat)["edge_energy"] == 0.0
    checker = np.indices((8, 8)).sum(0) % 2 * 255
    assert image_features(encode_pnm(checker.astype(np.uint8)))[
        "edge_energy"
    ] > 0.9


def test_pnm_gray_ascii_comment_and_16bit():
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    d5 = encode_pnm(gray)
    assert d5.startswith(b"P5")
    assert np.array_equal(decode_pnm(d5)[:, :, 0], gray)

    # ascii P2 with a comment line decodes to the same pixels
    ascii_p2 = b"P2\n# comment\n3 2\n255\n0 40 80\n120 160 200\n"
    assert np.array_equal(decode_pnm(ascii_p2)[:, :, 0], gray)

    img16 = np.array([[1000, 65535], [0, 32768]], dtype=np.uint16)
    d16 = encode_pnm(img16)
    got = decode_pnm(d16)
    assert got.dtype == np.uint16 and np.array_equal(got[:, :, 0], img16)
    # luminance normalized by 65535, not 255
    assert image_features(d16)["luminance"] == pytest.approx(
        img16.mean() / 65535, abs=1e-4
    )


def test_resize_nearest_exact_indices():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = resize_nearest(img, 2, 2)
    assert np.array_equal(small, np.array([[0, 2], [8, 10]], np.uint8))
    big = resize_nearest(img, 8, 8)
    assert big.shape == (8, 8)
    assert np.array_equal(big[::2, ::2], img)  # every src pixel survives


def test_feature_vector_dispatch():
    wav = encode_wav(_sine(seconds=0.1))
    ppm = encode_pnm(np.zeros((4, 4, 3), np.uint8))
    assert sniff_decodable(wav) == "wav"
    assert sniff_decodable(ppm) == "pnm"
    assert sniff_decodable(b"\x89PNG\r\n\x1a\n123") is None
    v = feature_vector(wav, 12)
    assert v.shape == (12,) and v.dtype == np.float32
    assert v[0] == pytest.approx(0.1, abs=1e-3)  # duration slot
    assert feature_vector(b"\xff\xd8\xffjpeg", 8) is None


def test_spark_extract_features_real_vs_stub(spark):
    from dqc_spark.multimodal import extract_features, with_media_type

    wav = encode_wav(_sine(seconds=0.5))
    ppm = encode_pnm(np.full((3, 5, 3), 200, np.uint8))
    rows = [
        ("u_wav", bytearray(wav)),
        ("u_ppm", bytearray(ppm)),
        ("u_png", bytearray(b"\x89PNG\r\n\x1a\n" + b"\x01" * 64)),
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    typed = {r["url"]: r["media_type"] for r in with_media_type(df).collect()}
    assert typed["u_ppm"] == "image/x-portable-pixmap"

    got = {r["key"]: r for r in
           extract_features(df, out_dim=12).collect()}
    # real audio features: duration slot = 0.5
    assert got["u_wav"]["features"][0] == pytest.approx(0.5, abs=1e-3)
    # real image features: log1p(width)=log1p(5), luminance=200/255
    assert got["u_ppm"]["features"][0] == pytest.approx(np.log1p(5), abs=1e-4)
    assert got["u_ppm"]["features"][2] == pytest.approx(200 / 255, abs=1e-3)
    assert got["u_png"]["n_bytes"] == 72  # stub path still yields a row

    # decode_stub=False: decodable rows fine, PNG row raises
    ok = spark.createDataFrame(rows[:2], "url string, media binary")
    real = {r["key"]: r for r in
            extract_features(ok, out_dim=12, decode_stub=False).collect()}
    assert real["u_wav"]["features"][0] == pytest.approx(0.5, abs=1e-3)
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_features(df, out_dim=12, decode_stub=False).collect()


def test_spark_resize_media_real_pnm(spark):
    from dqc_spark.multimodal import resize_media

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    df = spark.createDataFrame(
        [("u1", bytearray(encode_pnm(img)))], "url string, media binary"
    )
    out = resize_media(df, 3, 2, decode_stub=False).collect()[0]
    resized = decode_pnm(bytes(out["media"]))
    assert resized.shape == (2, 3, 3)
    assert np.array_equal(resized, resize_nearest(img, 3, 2))
    assert out["media_meta"]["codec"] == "pnm"
