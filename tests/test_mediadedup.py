"""Image near-dup via perceptual dHash: cross-format invariance,
noise robustness, distinct-image separation, and the distributed
pigeonhole join (shared with SimHash)."""

import numpy as np
import pytest

from dqc_spark.jpegcodec import encode_jpeg
from dqc_spark.mediacodec import (
    box_resize_gray,
    encode_png,
    encode_pnm,
    image_dhash,
)
from dqc_spark.multimodal import image_dhash_signatures, image_near_dups


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
