"""Image near-dup via perceptual dHash and audio near-dup via the
spectral fingerprint: cross-format/transform invariance, noise
robustness, distinct-content separation, and the distributed
pigeonhole join (shared with SimHash)."""

import numpy as np
import pytest

from dqc_spark.jpegcodec import encode_jpeg
from dqc_spark.mediacodec import (
    audio_fingerprint,
    box_resize_gray,
    encode_png,
    encode_pnm,
    encode_wav,
    image_dhash,
)
from dqc_spark.multimodal import (
    audio_fingerprints,
    audio_near_dups,
    image_dhash_signatures,
    image_near_dups,
)


def _rng(seed):
    return np.random.default_rng(seed)


def _photo(seed, h=40, w=48):
    """Smooth 'photo-like' raster: low-frequency gradients + mild
    texture, so lossy re-encoding perturbs rather than destroys it."""
    r = _rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.full((h, w), 128.0)
    for _ in range(4):  # several random plane waves: rich, smooth scene
        fx, fy = r.uniform(0.5, 5, 2)
        px, py = r.uniform(0, 2 * np.pi, 2)
        amp = r.uniform(20, 45)
        base += amp * np.sin(xx / w * np.pi * fx + px) \
            * np.cos(yy / h * np.pi * fy + py)
    img = base[:, :, None] + r.normal(0, 4, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_deterministic_and_signed():
    img = _photo(1)
    h1 = image_dhash(encode_pnm(img))
    assert h1 == image_dhash(encode_pnm(img))
    assert -(1 << 63) <= h1 < (1 << 63)


def test_dhash_cross_format_lossless_identical():
    img = _photo(2)
    assert image_dhash(encode_pnm(img)) == image_dhash(encode_png(img))


def test_dhash_survives_jpeg_reencode():
    for seed in range(5):
        img = _photo(seed)
        d_png = image_dhash(encode_png(img))
        d_jpg = image_dhash(encode_jpeg(img, quality=85))
        assert hamming(d_png, d_jpg) <= 6, seed


def test_dhash_survives_small_noise():
    img = _photo(3)
    noisy = np.clip(
        img.astype(int) + _rng(99).integers(-6, 7, img.shape), 0, 255
    ).astype(np.uint8)
    assert hamming(image_dhash(encode_pnm(img)),
                   image_dhash(encode_pnm(noisy))) <= 6


def test_dhash_separates_distinct_images():
    hashes = [image_dhash(encode_pnm(_photo(s, h=32 + s, w=40 + s)))
              for s in range(8)]
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert hamming(hashes[i], hashes[j]) > 6, (i, j)


def test_dhash_undecodable_is_none():
    assert image_dhash(b"not an image") is None
    assert image_dhash(b"") is None


def test_box_resize_gray_tiny_inputs():
    # degenerate rasters must not crash the box resampler
    one = np.full((1, 1), 7, dtype=np.uint8)
    out = box_resize_gray(one, 9, 8)
    assert out.shape == (8, 9) and np.all(out == 7)
    assert image_dhash(encode_pnm(one)) is not None


def test_dhash_resolution_invariance():
    # the SAME scene at 2x resolution hashes nearby (box resample)
    img = _photo(4, h=40, w=48)
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    assert hamming(image_dhash(encode_pnm(img)),
                   image_dhash(encode_pnm(big))) <= 4


# ---------------------------------------------------------------------------
# Spark
# ---------------------------------------------------------------------------


@pytest.fixture()
def media_df(spark):
    rows = []
    # 6 distinct photos, each planted as (pnm original, jpeg re-encode)
    for s in range(6):
        img = _photo(s, h=32 + s, w=40 + s)
        rows.append((f"img{s}_a", bytearray(encode_pnm(img))))
        rows.append((f"img{s}_b", bytearray(encode_jpeg(img, quality=85))))
    rows.append(("junk", bytearray(b"\x00\x01 not media")))
    return spark.createDataFrame(rows, "key string, media binary")


def test_image_dhash_signatures_spark(media_df):
    sig = {r.key: r.sim for r in
           image_dhash_signatures(media_df, "key").collect()}
    assert sig["junk"] is None
    # python parity on a couple of keys
    img = _photo(0, h=32, w=40)
    assert sig["img0_a"] == image_dhash(encode_pnm(img))


def test_image_near_dups_finds_planted_pairs(media_df):
    pairs = image_near_dups(media_df, "key", max_hamming=6).collect()
    got = {tuple(sorted((r.key_a, r.key_b))) for r in pairs}
    want = {(f"img{s}_a", f"img{s}_b") for s in range(6)}
    assert want <= got
    # no cross-image pair, junk never appears
    for a, b in got:
        assert a.split("_")[0] == b.split("_")[0]
        assert "junk" not in (a, b)


def test_image_near_dups_radius_zero_lossless(spark):
    img = _photo(9)
    rows = [("p", bytearray(encode_pnm(img))),
            ("q", bytearray(encode_png(img))),
            ("r", bytearray(encode_pnm(_photo(10))))]
    df = spark.createDataFrame(rows, "key string, media binary")
    pairs = image_near_dups(df, "key", max_hamming=0).collect()
    assert [(p.key_a, p.key_b, p.hamming) for p in pairs] == [("p", "q", 0)]


# ---------------------------------------------------------------------------
# audio spectral fingerprint
# ---------------------------------------------------------------------------


def _clip(sig):
    return np.clip(sig, -1, 1)


def _recording(seed, rate=16000, dur=0.5):
    """Music-like test signal: a broadband bed plus enveloped tones, so
    every band carries energy and band energies move across slices."""
    r = _rng(seed)
    n = int(rate * dur)
    t = np.arange(n) / rate
    sig = 0.04 * r.standard_normal(n)
    for _ in range(5):
        f = r.uniform(150, 3500)
        env = 0.5 + 0.5 * np.sin(
            2 * np.pi * r.uniform(0.5, 3) * t + r.uniform(0, 2 * np.pi))
        sig = sig + r.uniform(0.1, 0.25) * env * np.sin(
            2 * np.pi * f * t + r.uniform(0, 2 * np.pi))
    return _clip(sig)


def _resample_bl(sig, rate, new_rate):
    """Ideal band-limited resample (what a real resampler approximates:
    low-pass THEN pick samples — linear interp without the low-pass
    aliases genuinely new energy into the bands)."""
    n = len(sig)
    n_new = int(round(n * new_rate / rate))
    return np.fft.irfft(np.fft.rfft(sig)[: n_new // 2 + 1],
                        n=n_new) * (n_new / n)


def test_audio_fp_deterministic_and_signed():
    sig = _recording(1)
    h1 = audio_fingerprint(encode_wav(sig, 16000))
    assert h1 == audio_fingerprint(encode_wav(sig, 16000))
    assert -(1 << 63) <= h1 < (1 << 63)


def test_audio_fp_gain_and_stereo_invariant():
    sig = _recording(2)
    base = audio_fingerprint(encode_wav(sig, 16000))
    assert audio_fingerprint(encode_wav(_clip(sig * 0.4), 16000)) == base
    stereo = np.stack([sig, sig], axis=1)
    assert audio_fingerprint(encode_wav(stereo, 16000)) == base


def test_audio_fp_survives_resample_quantize_noise():
    for seed in range(6):
        sig = _recording(seed)
        base = audio_fingerprint(encode_wav(sig, 16000))
        rs = audio_fingerprint(
            encode_wav(_resample_bl(sig, 16000, 8000), 8000))
        assert hamming(base, rs) <= 8, ("resample", seed)
        q8 = audio_fingerprint(encode_wav(sig, 16000, bits=8))
        assert hamming(base, q8) <= 8, ("8bit", seed)
        noisy = _clip(sig + 0.005 * _rng(99).standard_normal(len(sig)))
        assert hamming(base, audio_fingerprint(
            encode_wav(noisy, 16000))) <= 8, ("noise", seed)


def test_audio_fp_separates_distinct_recordings():
    hs = [audio_fingerprint(encode_wav(_recording(s), 16000))
          for s in range(8)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert hamming(hs[i], hs[j]) > 8, (i, j)


def test_audio_fp_undecodable_is_none():
    assert audio_fingerprint(b"not audio") is None
    assert audio_fingerprint(b"") is None
    # header-only MP3 path must not pretend to fingerprint
    assert audio_fingerprint(b"\xff\xfb\x90\x00" + b"\x00" * 64) is None
    # too short to slice
    assert audio_fingerprint(encode_wav(np.zeros(4), 16000)) is None


def test_audio_fp_silence_is_stable():
    z = encode_wav(np.zeros(4000), 16000)
    assert audio_fingerprint(z) == audio_fingerprint(z)


# ---------------------------------------------------------------------------
# Spark: audio near-dup join
# ---------------------------------------------------------------------------


@pytest.fixture()
def audio_df(spark):
    rows = []
    # 5 distinct recordings, planted as (original 16k, resampled 8k copy)
    for s in range(5):
        sig = _recording(s)
        rows.append((f"aud{s}_a", bytearray(encode_wav(sig, 16000))))
        rows.append((f"aud{s}_b", bytearray(
            encode_wav(_resample_bl(sig, 16000, 8000), 8000))))
    rows.append(("junk", bytearray(b"\x00\x01 not media")))
    return spark.createDataFrame(rows, "key string, media binary")


def test_audio_fingerprints_spark(audio_df):
    sig = {r.key: r.sim for r in
           audio_fingerprints(audio_df, "key").collect()}
    assert sig["junk"] is None
    assert sig["aud0_a"] == audio_fingerprint(
        encode_wav(_recording(0), 16000))


def test_audio_near_dups_finds_planted_pairs(audio_df):
    pairs = audio_near_dups(audio_df, "key", max_hamming=8).collect()
    got = {tuple(sorted((r.key_a, r.key_b))) for r in pairs}
    want = {(f"aud{s}_a", f"aud{s}_b") for s in range(5)}
    assert want <= got
    for a, b in got:
        assert a.split("_")[0] == b.split("_")[0]
        assert "junk" not in (a, b)
