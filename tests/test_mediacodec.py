"""mediacodec: REAL pure-numpy WAV/PNM decode — known bytes pin known
features, and the multimodal Spark kernels route decodable formats
through the real path while stubbing only PIL/ffmpeg-needing formats."""

import numpy as np
import pytest

from dqc_spark.mediacodec import (
    audio_features,
    decode_png,
    decode_pnm,
    decode_wav,
    encode_png,
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
    # PNG magic now routes to the real decoder; a corrupt body raises
    # ValueError there (multimodal catches it and falls back per
    # decode_stub — pinned in test_dedup_similarity plumbing tests)
    assert sniff_decodable(b"\x89PNG\r\n\x1a\n123") == "png"
    with pytest.raises(ValueError):
        feature_vector(b"\x89PNG\r\n\x1a\n123", 8)
    v = feature_vector(wav, 12)
    assert v.shape == (12,) and v.dtype == np.float32
    assert v[0] == pytest.approx(0.1, abs=1e-3)  # duration slot
    # JPEG magic now routes to the real baseline decoder too; a
    # corrupt body raises ValueError exactly like the PNG case
    assert sniff_decodable(b"\xff\xd8\xffjpeg") == "jpeg"
    with pytest.raises(ValueError):
        feature_vector(b"\xff\xd8\xffjpeg", 8)
    # truly unknown magic still returns None (stub territory)
    assert feature_vector(b"ID3\x03mp3 frames", 8) is None


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
    with pytest.raises(Exception, match="out of scope|no real decoder"):
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


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Test-side FORWARD filtering (spec §6 encoder direction) so the
    decoder's inverse is checked against an independent construction,
    not against itself."""
    h, w, ch = img.shape
    bpp = ch
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int64)
        line = np.empty_like(cur)
        for i in range(len(cur)):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 255
        out += bytes([ftype]) + line.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _png_wrap(w, h, ctype, raster, extra=b""):
    import struct
    import zlib

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR",
                    struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + extra
            + chunk(b"IDAT", zlib.compress(raster))
            + chunk(b"IEND", b""))


def _rand_img(h, w, ch, seed=3):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_png_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        img = _rand_img(5, 7, ch)
        assert np.array_equal(decode_png(encode_png(img)), img), ch
    # 2-D input becomes grayscale
    g = _rand_img(4, 4, 1)[:, :, 0]
    assert np.array_equal(decode_png(encode_png(g))[:, :, 0], g)


def test_png_all_filter_types_decode():
    # every filter type, checked against the independent FORWARD filter
    img = _rand_img(6, 5, 3, seed=9)
    for ftype in range(5):
        data = _png_wrap(5, 6, 2, _png_forward_filter(img, ftype))
        assert np.array_equal(decode_png(data), img), f"filter {ftype}"
    # mixed filters: cycle 0..4 over rows (the realistic encoder case),
    # built in one pass because filters 1-4 depend on the previous row
    h, w, ch = 10, 4, 3
    big = _rand_img(h, w, ch, seed=10)
    raster = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    bpp = ch
    for y in range(h):
        f = y % 5
        cur = big[y].reshape(-1).astype(np.int64)
        line = np.empty_like(cur)
        for i in range(len(cur)):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
            else:
                pred = [0, a, b, (a + b) >> 1][f]
            line[i] = (cur[i] - pred) & 255
        raster += bytes([f]) + line.astype(np.uint8).tobytes()
        prev = cur
    assert np.array_equal(
        decode_png(_png_wrap(w, h, 2, raster)), big)


def test_png_palette():
    import struct
    import zlib

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body)))

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raster = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
    data = _png_wrap(2, 2, 3, raster, extra=chunk(b"PLTE", palette))
    img = decode_png(data)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[0, 1]) == (0, 255, 0)
    assert tuple(img[1, 0]) == (0, 0, 255)
    # palette index past the table is a clean reject
    bad_raster = b"\x00" + bytes([7, 0]) + b"\x00" + bytes([0, 0])
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_png_wrap(2, 2, 3, bad_raster,
                             extra=chunk(b"PLTE", palette)))


def test_png_rejects():
    import struct
    import zlib as _z

    img = _rand_img(3, 3, 3)
    good = encode_png(img)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a" + good)
    # interlaced: flip the interlace byte inside IHDR
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
           + ihdr + struct.pack(">I", _z.crc32(b"IHDR" + ihdr)))
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(bad + good[8 + 25:])
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad16 = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr16))
             + b"IHDR" + ihdr16
             + struct.pack(">I", _z.crc32(b"IHDR" + ihdr16)))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad16 + good[8 + 25:])
    # corrupt deflate body (raw garbage IDAT, not zlib-wrapped)
    raw_idat = (struct.pack(">I", 7) + b"IDAT" + b"garbage"
                + struct.pack(">I", _z.crc32(b"IDATgarbage")))
    ihdr_ok = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    hdr = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
           + ihdr_ok + struct.pack(">I", _z.crc32(b"IHDR" + ihdr_ok)))
    with pytest.raises(ValueError, match="deflate"):
        decode_png(hdr + raw_idat)
    # raster size mismatch
    with pytest.raises(ValueError, match="raster size"):
        decode_png(_png_wrap(5, 5, 2, b"\x00" * 10))


def test_png_image_features_and_dispatch():
    img = np.full((4, 8, 3), 128, np.uint8)
    f = image_features(encode_png(img))
    assert (f["width"], f["height"], f["channels"]) == (8, 4, 3)
    assert f["luminance"] == pytest.approx(128 / 255, abs=1e-6)
    assert f["edge_energy"] == 0.0
    # alpha is stripped before features
    rgba = np.dstack([img, np.full((4, 8), 7, np.uint8)])
    f2 = image_features(encode_png(rgba))
    assert f2["channels"] == 3
    assert f2["luminance"] == pytest.approx(128 / 255, abs=1e-6)
    # dispatch: real vector from PNG bytes
    assert sniff_decodable(encode_png(img)) == "png"
    v = feature_vector(encode_png(img), 12)
    assert v.shape == (12,)
    assert v[0] == pytest.approx(np.log1p(8), abs=1e-4)


def test_spark_resize_media_real_png(spark):
    from dqc_spark.multimodal import resize_media

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    df = spark.createDataFrame(
        [("u1", bytearray(encode_png(img)))], "url string, media binary"
    )
    out = resize_media(df, 3, 2, decode_stub=False).collect()[0]
    resized = decode_png(bytes(out["media"]))
    assert resized.shape == (2, 3, 3)
    assert np.array_equal(resized, resize_nearest(img, 3, 2))
    assert out["media_meta"]["codec"] == "png"


# ---------------------------------------------------------------------------
# baseline JPEG (jpegcodec.py) — forward-construction pins: our encoder
# produces spec-conformant streams, the decoder must invert them within
# DCT rounding (q=100 tables are all ones, so quantization is identity)
# ---------------------------------------------------------------------------


def _grad_img(h=24, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // (h - 1),
            xx * 255 // (w - 1),
            (yy + xx) * 255 // (h + w - 2),
        ],
        axis=2,
    ).astype(np.uint8)


def test_jpeg_roundtrip_q100_within_dct_rounding():
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    img = _rand_img(17, 23, 3, seed=11)  # noise = worst case for DCT
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (17, 23, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    grad = _grad_img()
    out2 = decode_jpeg(encode_jpeg(grad, quality=100))
    assert np.abs(out2.astype(int) - grad.astype(int)).max() <= 2


def test_jpeg_grayscale_q100_lossless_on_smooth_ramp():
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    g = (np.arange(24)[:, None] * 255 // 23).astype(np.uint8)
    img = np.repeat(g, 40, axis=1)[:, :, None]
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (24, 40, 1)
    # no chroma round trip -> only DCT rounding, which a per-row
    # constant ramp survives exactly
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_subsampled_and_restart_markers():
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    grad = _grad_img()
    # 4:2:0: chroma averaged over 2x2 -> small error on smooth ramps
    out = decode_jpeg(encode_jpeg(grad, quality=100, subsample=True))
    assert out.shape == grad.shape
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 16
    # restart markers every 2 MCUs must not change the pixels
    a = decode_jpeg(encode_jpeg(grad, quality=100))
    b = decode_jpeg(encode_jpeg(grad, quality=100, restart_interval=2))
    assert np.array_equal(a, b)


def test_jpeg_lossy_quality_roundtrip_close():
    """Non-flat quant tables (quality < 100) exercise the zigzag/
    natural-order boundary: the decoder must dezigzag coefficients
    BEFORE applying the (natural-order) table, and the encoder must
    quantize natural-order DCT output by the natural-order table.  A
    domain mix-up scales coefficient f by Q[unzigzag(f)]/Q[zigzag(f)]
    (up to ~3x with the Annex-K tables) and turns a smooth gradient
    into garbage — invisible at quality=100 where the table is flat,
    which is exactly why this pin runs at 50/75/90."""
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    grad = _grad_img(64, 48)
    for q, tol in ((50, 12), (75, 8), (90, 6)):
        out = decode_jpeg(encode_jpeg(grad, quality=q))
        err = np.abs(out.astype(int) - grad.astype(int))
        assert err.max() <= tol, (q, err.max())
    sub = decode_jpeg(encode_jpeg(grad, quality=50, subsample=True))
    assert np.abs(sub.astype(int) - grad.astype(int)).mean() < 6.0


def test_jpeg_dequant_uses_zigzag_stored_table():
    """Direct pin of the decode-side domain: a stream coefficient at
    zigzag index j must be scaled by DQT byte j (the table is STORED
    in zigzag order), i.e. natural coefficient i gets Q_natural[i]."""
    from dqc_spark.jpegcodec import (_UNZIGZAG, _ZIGZAG, decode_jpeg,
                                     encode_jpeg, _quality_tables)

    # encode a ramp whose energy sits in low-frequency AC coefficients
    g = (np.arange(16)[:, None] * 255 // 15).astype(np.uint8)
    img = np.repeat(g, 16, axis=1)[:, :, None]
    blob = encode_jpeg(img, quality=50)
    out = decode_jpeg(blob)
    # quality-50 luma steps are ~Q[8]=14 wide on this vertical ramp;
    # the mixed-domain bug multiplies by Q[1]/Q[8] and shifts rows by
    # >40 grey levels.  8 is a generous spec-correct bound.
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    # and the DQT segment bytes really are the zigzag ordering of the
    # natural-order table used for quantization
    ql, _ = _quality_tables(50)
    dqt = blob[blob.find(b"\xff\xdb") + 5:blob.find(b"\xff\xdb") + 69]
    assert np.array_equal(np.frombuffer(dqt, np.uint8),
                          ql.ravel()[_ZIGZAG].astype(np.uint8))
    assert np.array_equal(_ZIGZAG[_UNZIGZAG], np.arange(64))


def test_jpeg_corrupt_streams_raise_valueerror_only():
    """Repo-wide decoder contract: EVERY corrupt-input shape raises
    ValueError (multimodal's kernels catch exactly that to fall back
    per-document instead of crashing the stage)."""
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    good = bytearray(encode_jpeg(_grad_img(), quality=90))
    cases = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x00",      # truncated SOF
        b"\xff\xd8\xff\xc0\x00\x08\x08\x00\x10\x00\x10\x01",  # short SOF
        b"\xff\xd8\xff\xda\x00\x04\x01\x01",      # SOS before SOF-ish
        bytes(good[:40]),                          # truncated mid-header
        bytes(good[:-20]),                         # truncated entropy
    ]
    # zero sampling factors in an otherwise valid stream
    sof = good.find(b"\xff\xc0")
    zs = bytearray(good)
    # SOF0 layout: ff c0 len(2) prec(1) h(2) w(2) nc(1) [id hv tq]...
    zs[sof + 11] = 0x00  # first component h/v factors -> 0/0
    cases.append(bytes(zs))
    for bad in cases:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # fuzz: byte-flipped valid streams must ALWAYS reject as ValueError
    # (r4 review found corrupt DC predictors escaping as OverflowError)
    import random

    rng = random.Random(3)
    for _ in range(400):
        b = bytearray(good)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass  # honest reject — the only allowed failure


def test_media_metadata_never_escapes_valueerror():
    """describe_media's degradation contract: media_metadata raises
    ValueError (only) on every corrupt input.  The 11-byte truncated
    SOF is the r4-review off-by-one; the fuzz sweep guards the rest."""
    import random

    from dqc_spark.jpegcodec import encode_jpeg
    from dqc_spark.mediacodec import encode_png, encode_wav, media_metadata

    with pytest.raises(ValueError):
        media_metadata(b"\xff\xd8\xff\xc0\x00\x0b" + b"\x01" * 5)
    rng = random.Random(11)
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    seeds = [
        encode_jpeg(_grad_img(8, 8), quality=80),
        encode_png(_grad_img(8, 8)),
        encode_wav(np.zeros(400), rate=8000),
        (hdr + b"\xaa" * 413) * 3,
    ]
    for seed_blob in seeds:
        for _ in range(200):
            b = bytearray(seed_blob)
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            n = rng.choice([len(b), rng.randrange(1, len(b))])
            try:
                media_metadata(bytes(b[:n]))
            except ValueError:
                pass  # the only allowed exception type


def test_jpeg_quality_drops_bytes_monotonically():
    from dqc_spark.jpegcodec import encode_jpeg

    img = _rand_img(32, 32, 3, seed=5)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (100, 75, 25)]
    assert sizes[0] > sizes[1] > sizes[2]


def test_jpeg_rejects_progressive_and_garbage():
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(_grad_img(), quality=90))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 not a real jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"GIF89a")


def test_jpeg_feature_dispatch_matches_png_pixels():
    from dqc_spark.jpegcodec import encode_jpeg

    img = _grad_img(16, 16)
    jb = encode_jpeg(img, quality=100)
    assert sniff_decodable(jb) == "jpeg"
    fj = image_features(jb)
    fp = image_features(encode_png(img))
    assert (fj["width"], fj["height"], fj["channels"]) == (16, 16, 3)
    # same pixels through a lossy-but-q100 container: features agree
    # to within the DCT-rounding pixel error
    assert fj["luminance"] == pytest.approx(fp["luminance"], abs=0.01)
    assert fj["edge_energy"] == pytest.approx(fp["edge_energy"], abs=0.01)
    v = feature_vector(jb, 12)
    assert v is not None and v.shape == (12,)


def test_spark_resize_media_real_jpeg(spark):
    from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg
    from dqc_spark.multimodal import resize_media

    img = _grad_img(8, 12)
    df = spark.createDataFrame(
        [("u1", bytearray(encode_jpeg(img, quality=100)))],
        "url string, media binary",
    )
    out = resize_media(df, 6, 4, decode_stub=False).collect()[0]
    assert out["media_meta"]["codec"] == "jpeg"
    resized = decode_jpeg(bytes(out["media"]))
    assert resized.shape == (4, 6, 3)
    # the pipeline re-encodes at the encoder's default quality, which
    # is genuinely lossy on a tiny block — pin exact determinism
    # (byte-for-byte) against the same decode->resize->encode chain
    want_bytes = encode_jpeg(
        resize_nearest(decode_jpeg(encode_jpeg(img, quality=100)), 6, 4))
    assert bytes(out["media"]) == want_bytes


def _mk_mp3_frame(bitrate_kbps=128, rate=44100, pad=0, mono=False):
    """Valid MPEG1 Layer III frame: correct 4-byte header + junk body
    of exactly the spec frame length (the metadata walk reads headers
    only, so synthetic bodies exercise it fully)."""
    BR = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    SR = (44100, 48000, 32000)
    b1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | 1  # MPEG1, layer III
    b2 = (BR.index(bitrate_kbps) << 4) | (SR.index(rate) << 2) | (pad << 1)
    b3 = (0b11 << 6) if mono else 0x00
    flen = 144 * bitrate_kbps * 1000 // rate + pad
    return bytes([0xFF, b1, b2, b3]) + b"\xaa" * (flen - 4)


def test_mp3_metadata_frame_walk():
    from dqc_spark.mediacodec import media_metadata, mp3_metadata

    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    cbr = id3v2 + b"".join(_mk_mp3_frame() for _ in range(10)) \
        + b"TAG" + b"\x00" * 125
    m = mp3_metadata(cbr)
    assert m["n_frames"] == 10 and m["bitrate_kbps"] == 128.0
    assert m["duration_s"] == pytest.approx(10 * 1152 / 44100, abs=1e-6)
    assert (m["sample_rate"], m["channels"], m["vbr"]) == (44100, 2, False)
    assert media_metadata(cbr)["format"] == "mp3"

    # VBR + padding alternation + mono, no tags
    vbr = b"".join(_mk_mp3_frame(128 if i % 2 else 192, pad=i % 2,
                                 mono=True) for i in range(8))
    m2 = mp3_metadata(vbr)
    assert m2["vbr"] and m2["channels"] == 1 and m2["bitrate_kbps"] == 160.0

    # resync past garbage incl. a false 0xFFEx word (no chained pair)
    noisy = b"\x00junk\xff\xfbzz" + b"".join(_mk_mp3_frame()
                                             for _ in range(3))
    assert mp3_metadata(noisy)["n_frames"] == 3

    for bad in (
        b"ID3\x04\x00\x00" + bytes([0, 0, 0, 4]) + b"\x00" * 4,  # tag only
        b"\xff\xfbzz definitely not frames",                     # false sync
        b"ID3",                                                  # truncated
    ):
        with pytest.raises(ValueError):
            mp3_metadata(bad)


def test_media_metadata_header_only_all_formats():
    """media_metadata must agree with the full decoders on dims/
    duration while touching only headers."""
    from dqc_spark.jpegcodec import encode_jpeg
    from dqc_spark.mediacodec import (encode_png, encode_pnm, encode_wav,
                                      media_metadata)

    img = _grad_img(10, 14)
    for blob, fmt in ((encode_pnm(img), "pnm"), (encode_png(img), "png"),
                      (encode_jpeg(img, quality=90), "jpeg")):
        m = media_metadata(blob)
        assert (m["format"], m["width"], m["height"]) == (fmt, 14, 10), m
    t = np.arange(4000) / 8000.0
    wav = encode_wav(np.sin(2 * np.pi * 100 * t), rate=8000)
    mw = media_metadata(wav)
    assert mw["format"] == "wav" and mw["sample_rate"] == 8000
    assert mw["duration_s"] == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        media_metadata(b"no magic here at all")


def test_spark_describe_media(spark):
    """The profile operator over a mixed-container corpus: every format
    yields typed header metadata; a corrupt blob degrades to
    parsed=false instead of failing the stage."""
    from dqc_spark.jpegcodec import encode_jpeg
    from dqc_spark.mediacodec import encode_wav
    from dqc_spark.multimodal import describe_media

    t = np.arange(2000) / 8000.0
    rows = [
        ("u1", bytearray(encode_jpeg(_grad_img(8, 12), quality=90))),
        ("u2", bytearray(encode_wav(np.sin(2 * np.pi * 50 * t), rate=8000))),
        ("u3", bytearray(b"".join(_mk_mp3_frame() for _ in range(4)))),
        ("u4", bytearray(b"\x89PNG\r\n\x1a\ncorrupt")),
        ("u5", None),
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    got = {r["key"]: r for r in describe_media(df).collect()}
    assert got["u1"]["media_type"] == "image/jpeg"
    assert got["u1"]["media_meta"]["width"] == "12"
    assert got["u2"]["media_meta"]["duration_s"] == "0.25"
    assert got["u3"]["media_type"] == "audio/mp3"
    assert got["u3"]["media_meta"]["bitrate_kbps"] == "128.0"
    assert got["u3"]["media_meta"]["n_frames"] == "4"
    assert got["u4"]["media_meta"] == {"parsed": "false"}
    assert got["u5"]["media_meta"] == {"parsed": "false"}
