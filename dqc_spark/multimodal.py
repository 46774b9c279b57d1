"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
mapInPandas partitioning, metadata extraction from binary headers.

Decode is REAL for the formats a pure numpy decoder can handle —
RIFF/WAVE PCM audio, netpbm PPM/PGM images, 8-bit non-interlaced PNG
(``mediacodec.py``) and baseline-sequential JPEG (``jpegcodec.py``):
``extract_features`` computes genuine duration/RMS/spectral-band
(audio) and luminance/edge/histogram (image) features, and
``resize_media`` does a genuine nearest-neighbor resample for
PNM/PNG/JPEG.

PERMANENT SCOPE BOUNDARY (not a TODO): MP3 is header-only — REAL
frame-header metadata (duration/bitrate/sample-rate/channels,
``mediacodec.mp3_metadata``, surfaced by ``describe_media``) but no
PCM synthesis; likewise WebM and progressive JPEG have no decoder
here.  Layer-III synthesis needs the ISO tabulated polyphase window +
Huffman tables and an encoder to test against — a from-spec build the
JPEG way is not reproducible bit-exactly without shipping those
tables, so the engine scopes MP3 to metadata permanently.  For those
formats ``decode_stub`` picks the behavior: ``True`` (default)
substitutes a deterministic fake feature vector derived from the
bytes (plumbing stays exercised); ``False`` raises ValueError like
any other undecodable blob.

Column convention (mirrors the pages table's ``html:binary``):
    media:binary, media_type:string, media_meta:map<string,string>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("media_meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

# magic-byte sniffing — pure byte ops, no decoder needed
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"P6", "image/x-portable-pixmap"),
    (b"P5", "image/x-portable-graymap"),
    (b"P3", "image/x-portable-pixmap"),
    (b"P2", "image/x-portable-graymap"),
]


def sniff_media_type(data: bytes | None) -> str:
    if not data:
        return "unknown"
    for magic, mtype in _MAGIC:
        if data.startswith(magic):
            return mtype
    # bare MPEG audio (no ID3v2 tag): 11-bit frame sync
    if len(data) > 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "audio/mp3"
    return "application/octet-stream"


def with_media_type(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Magic-byte type sniffing inside Arrow batches (bytes -> string)."""

    @F.pandas_udf(T.StringType())
    def sniff(s: pd.Series) -> pd.Series:
        return s.map(sniff_media_type)

    return df.withColumn("media_type", sniff(F.col(media_col)))


def _fake_decode(data: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake feature extractor: a seeded projection of the
    content digest.  Stands in for model-based embedding so the batch
    shape / schema / partitioning story is fully exercisable."""
    digest = hashlib.sha256(data or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal(out_dim).astype(np.float32)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    key_col: str = "url",
    out_dim: int = 32,
    decode_stub: bool = True,
) -> DataFrame:
    """binary -> feature vector via mapInPandas.  WAV and PNM blobs get
    REAL features (``mediacodec.feature_vector``: duration/RMS/spectral
    bands, luminance/edge/histogram); other formats fall back per
    ``decode_stub``.  Arrow batch sizes are bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so large blobs don't
    blow executor memory; the kernel is O(batch) and never sees the
    whole partition at once."""
    from dqc_spark.mediacodec import feature_vector

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def one(raw: bytes) -> list[float]:
        try:
            vec = feature_vector(raw, out_dim)
        except ValueError:  # right magic, corrupt body -> undecodable
            vec = None
        if vec is not None:
            return vec.tolist()
        if not decode_stub:
            raise ValueError(
                "no real decoder for this format — out of scope by "
                "design (MP3 is header-only via mp3_metadata; WebM and "
                "progressive JPEG are unsupported; WAV, PNM, PNG and "
                "baseline JPEG decode for real); pass decode_stub=True "
                "for the deterministic fake"
            )
        return _fake_decode(raw, out_dim).tolist()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                one(bytes(b) if b is not None else b"") for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[media_col]],
                    "features": feats,
                }
            )

    return df.select(key_col, media_col).mapInPandas(kernel, schema=out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    key_col: str = "url",
    decode_stub: bool = True,
) -> DataFrame:
    """binary -> resized binary (image resize step of a media pipeline).

    PNM inputs are REALLY resized: decode -> nearest-neighbor index
    gather -> re-encode (``mediacodec``), all numpy.  Formats that need
    PIL (JPEG/PNG) fall back per ``decode_stub``: the stub emits a
    deterministic pseudo-bitmap of EXACTLY w*h*3 bytes derived from the
    content digest, so downstream size/partition accounting (the thing
    Spark cares about) behaves like the real op.  Plumbing either way:
    bounded Arrow batches, binary-in/binary-out schema, per-row target
    metadata.
    """
    from dqc_spark.mediacodec import (
        PNG_SIG,
        decode_png,
        decode_pnm,
        encode_png,
        encode_pnm,
        resize_nearest,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    n_out = width * height * 3

    def one(raw: bytes) -> tuple[bytes, dict]:
        meta = {
            "width": str(width),
            "height": str(height),
            "src_bytes": str(len(raw)),
        }
        codec = None
        if raw[:2] in (b"P2", b"P3", b"P5", b"P6"):
            codec = ("pnm", decode_pnm, encode_pnm)
        elif raw[:8] == PNG_SIG:
            codec = ("png", decode_png, encode_png)
        elif raw[:3] == b"\xff\xd8\xff":
            from dqc_spark.jpegcodec import decode_jpeg, encode_jpeg

            codec = ("jpeg", decode_jpeg, encode_jpeg)
        if codec is not None:
            name, dec, enc = codec
            try:
                img = dec(raw)
            except ValueError:
                img = None
            if img is not None:
                out = enc(resize_nearest(img, width, height))
                meta["channels"] = str(img.shape[2])
                meta["codec"] = name
                return out, meta
        if not decode_stub:
            raise ValueError(
                "no real decoder for this format — out of scope by "
                "design (PNM/PNG/baseline JPEG resize for real; other "
                "raster formats are unsupported); pass "
                "decode_stub=True for the deterministic fake"
            )
        digest = hashlib.sha256(raw).digest()
        # deterministic pseudo-bitmap of the exact target size
        reps = n_out // len(digest) + 1
        meta["channels"] = "3"
        return (digest * reps)[:n_out], meta

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes, metas = [], []
            for b in pdf[media_col]:
                o, m = one(bytes(b) if b is not None else b"")
                out_bytes.append(o)
                metas.append(m)
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "media": out_bytes,
                    "media_meta": metas,
                }
            )

    return df.select(key_col, media_col).mapInPandas(kernel, schema=out_schema)


def describe_media(
    df: DataFrame,
    media_col: str = "media",
    key_col: str = "url",
) -> DataFrame:
    """(key, media_type, media_meta) — container metadata from HEADERS
    only (``mediacodec.media_metadata``): image dimensions, WAV
    duration from chunk sizes, MP3 duration/bitrate/channels from a
    frame-header walk.  No pixel or sample decode happens, so this is
    the operator a corpus-wide media profile runs at 100 TB — the cost
    per blob is a few hundred header bytes, not an inflate/IDCT.
    Unparseable blobs get media_meta {'parsed': 'false'} rather than
    poisoning the stage (profiling wants the histogram plus an error
    count, not a crash)."""
    from dqc_spark.mediacodec import media_metadata

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("media_type", T.StringType()),
            T.StructField(
                "media_meta", T.MapType(T.StringType(), T.StringType())),
        ]
    )

    def one(raw: bytes | None) -> dict:
        if not raw:
            return {"parsed": "false"}
        try:
            meta = media_metadata(bytes(raw))
        except ValueError:
            return {"parsed": "false"}
        return {k: str(v) for k, v in meta.items()}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "key": pdf[key_col].astype(str),
                    "media_type": [
                        sniff_media_type(bytes(b) if b is not None else None)
                        for b in pdf[media_col]
                    ],
                    "media_meta": [one(b) for b in pdf[media_col]],
                }
            )

    return df.select(key_col, media_col).mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, media_col: str = "media", every_n: int = 30
) -> DataFrame:
    """Video frame-sampling *plan*: emits (key, frame_index) rows for a
    downstream decoder — the explode is real Spark work (row fanout,
    partition sizing), the per-frame decode is the stubbed step."""
    n_frames = (F.length(F.col(media_col)) / 1024).cast("int") + 1  # fake: 1 frame/KiB
    return df.select(
        F.col("url").alias("key"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )


# ---------------------------------------------------------------------------
# image/audio near-dup: perceptual 64-bit hash -> shared pigeonhole join
# ---------------------------------------------------------------------------

_DHASH_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("sim", T.LongType()),
])


def _media_signatures(df: DataFrame, key_col: str, media_col: str,
                      hash_fn) -> DataFrame:
    """(key, sim): 64-bit perceptual hash per decodable blob via
    ``hash_fn(bytes) -> int | None``, NULL for anything undecodable.
    One Arrow kernel, no shuffle; the raster/samples never leave the
    executor — only the 8-byte hash does."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype(str),
                "sim": pd.Series(
                    [hash_fn(bytes(b)) if b is not None else None
                     for b in pdf[media_col]], dtype="object"),
            })

    return df.select(key_col, media_col).mapInPandas(
        kernel, schema=_DHASH_SCHEMA)


def _media_near_dups(df: DataFrame, key_col: str, media_col: str,
                     hash_fn, max_hamming: int,
                     max_bucket: int | None) -> DataFrame:
    """Shared tail of image/audio near-dup: hash, drop undecodable
    (a crawl's media column always carries formats no decoder
    handles — excluded, not errored), persist (the Python decode
    stage has three consumers: cap + both join sides, the CLAUDE.md
    multi-consumer rule), then the SAME pigeonhole chunk join SimHash
    text dedup uses (dedup.py — never a cross join)."""
    from dqc_spark.cache import track
    from dqc_spark.dedup import hamming_near_dups

    sig = track(
        _media_signatures(df, key_col, media_col, hash_fn)
        .filter(F.col("sim").isNotNull()))
    return hamming_near_dups(sig, max_hamming=max_hamming,
                             max_bucket=max_bucket)


def image_dhash_signatures(
    df: DataFrame, key_col: str, media_col: str = "media"
) -> DataFrame:
    """(key, sim): 64-bit perceptual difference hash per decodable
    image (mediacodec.image_dhash — PNG/PNM/baseline-JPEG), NULL for
    anything undecodable."""
    from dqc_spark.mediacodec import image_dhash

    return _media_signatures(df, key_col, media_col, image_dhash)


def image_near_dups(
    df: DataFrame, key_col: str, media_col: str = "media",
    max_hamming: int = 6, max_bucket: int | None = 500,
) -> DataFrame:
    """Near-duplicate image pairs (key_a, key_b, hamming): re-encoded,
    format-converted or mildly-noised copies of the same picture land
    within a small dHash hamming radius (8x8-bit pigeonhole chunks at
    the default radius 6)."""
    from dqc_spark.mediacodec import image_dhash

    return _media_near_dups(df, key_col, media_col, image_dhash,
                            max_hamming, max_bucket)


def audio_fingerprints(
    df: DataFrame, key_col: str, media_col: str = "media"
) -> DataFrame:
    """(key, sim): 64-bit spectral fingerprint per decodable audio
    blob (mediacodec.audio_fingerprint — WAV; MP3 is header-only in
    this environment so it hashes NULL), NULL for anything
    undecodable."""
    from dqc_spark.mediacodec import audio_fingerprint

    return _media_signatures(df, key_col, media_col, audio_fingerprint)


def audio_near_dups(
    df: DataFrame, key_col: str, media_col: str = "media",
    max_hamming: int = 8, max_bucket: int | None = 500,
) -> DataFrame:
    """Near-duplicate audio pairs (key_a, key_b, hamming): gain-scaled,
    resampled, re-quantized or stereo/mono copies of the same recording
    land within a small fingerprint hamming radius (measured worst-case
    6 bits under band-limited 2x resample, >=18 between distinct
    signals; the default radius 8 splits that margin and uses 16x4-bit
    pigeonhole chunks).  Same distributed shape as image_near_dups."""
    from dqc_spark.mediacodec import audio_fingerprint

    return _media_near_dups(df, key_col, media_col, audio_fingerprint,
                            max_hamming, max_bucket)
