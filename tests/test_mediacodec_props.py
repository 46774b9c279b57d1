"""Property tests: mediacodec round-trips over arbitrary shapes/values.

Pure-numpy codecs, no Spark session — fast enough for wide hypothesis
sweeps.  Invariants: encode->decode is identity (up to quantization for
lossy bit depths), decoders never mis-shape, resize preserves dtype and
hits exact source indices."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dqc_spark.mediacodec import (
    decode_pnm,
    decode_wav,
    encode_pnm,
    encode_wav,
    resize_nearest,
)

settings.register_profile("media", max_examples=60, deadline=None)
settings.load_profile("media")


@given(
    n=st.integers(1, 400),
    channels=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    bits=st.sampled_from([8, 16, 32]),
    data=st.data(),
)
def test_wav_roundtrip_any_shape(n, channels, rate, bits, data):
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, channels))
    got, got_rate, got_ch = decode_wav(encode_wav(x, rate=rate, bits=bits))
    assert (got_rate, got_ch) == (rate, channels)
    assert got.shape == (n, channels)
    # bound: rounding 0.5/2^(b-1) + scale mismatch |x|*(2^(b-1) - (2^(b-1)-1))
    # / 2^(b-1)^2 <= 1.5/2^(b-1); 8-bit also clips +1.0 -> 255 (1/128)
    tol = {8: 1 / 127, 16: 1.5 / 32768, 32: 1.5 / 2**31}[bits]
    assert np.abs(got - x).max() <= tol


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    channels=st.sampled_from([1, 3]),
    wide=st.booleans(),
    data=st.data(),
)
def test_pnm_roundtrip_any_shape(h, w, channels, wide, data):
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    if wide:
        img = rng.integers(0, 65536, size=(h, w, channels), dtype=np.uint16)
    else:
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    got = decode_pnm(encode_pnm(img))
    assert got.shape == (h, w, channels)
    assert got.dtype == img.dtype
    assert np.array_equal(got, img)


@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    oh=st.integers(1, 24),
    ow=st.integers(1, 24),
    data=st.data(),
)
def test_resize_nearest_values_come_from_source(h, w, oh, ow, data):
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel is an exact source pixel
    src = {img[i, j].tobytes() for i in range(h) for j in range(w)}
    assert all(
        out[i, j].tobytes() in src for i in range(oh) for j in range(ow)
    )
    # identity resize is exact
    assert np.array_equal(resize_nearest(img, w, h), img)


@given(blob=st.binary(max_size=200))
def test_decoders_never_crash_unstructured(blob):
    # arbitrary bytes either decode or raise ValueError — never segfault,
    # never return garbage shapes silently
    for dec in (decode_wav, decode_pnm):
        try:
            out = dec(blob)
        except ValueError:
            continue
        if dec is decode_pnm:
            assert out.ndim == 3
        else:
            assert out[0].ndim == 2
