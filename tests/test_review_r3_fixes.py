"""Regression pins for the round-3 review findings: corrupt-media error
contract, bloom probe strictness, NULL-vector LSH tolerance, PNM maxval
scaling, and line-dedup key injectivity."""

import numpy as np
import pytest


def test_corrupt_wav_and_pnm_raise_valueerror_only():
    import struct

    from dqc_spark.mediacodec import decode_pnm, decode_wav

    # RIFF/WAVE magic with a truncated fmt body: struct.error would
    # escape the multimodal kernels' except ValueError
    blob = b"RIFF" + struct.pack("<I", 20) + b"WAVEfmt " + struct.pack("<I", 16) + b"\x01\x00"
    with pytest.raises(ValueError):
        decode_wav(blob)
    # ascii sample out of range must not WRAP (300 % 256 == 44)
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n1 1\n255\n300\n")
    # huge ascii token: OverflowError -> ValueError
    with pytest.raises(ValueError):
        decode_pnm(b"P2\n1 1\n255\n99999999999999999999\n")
    # zero dimensions
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n0 2\n255\n")


def test_corrupt_media_rows_fall_back_to_stub(spark):
    from dqc_spark.multimodal import extract_features

    import struct

    bad_wav = b"RIFF" + struct.pack("<I", 20) + b"WAVEfmt " + struct.pack("<I", 16) + b"\x01\x00"
    df = spark.createDataFrame(
        [("u_bad", bytearray(bad_wav))], "url string, media binary"
    )
    # decode_stub=True: corrupt-but-magic blob degrades to the fake
    # vector instead of failing the job
    rows = extract_features(df, out_dim=8).collect()
    assert len(rows) == 1 and len(rows[0]["features"]) == 8


def test_pnm_non_fullscale_maxval_features():
    from dqc_spark.mediacodec import image_features

    # maxval 15 (pbmtools style): pure white must read luminance 1.0,
    # not 15/255
    white = b"P5\n2 2\n15\n" + bytes([15, 15, 15, 15])
    f = image_features(white)
    assert f["luminance"] == pytest.approx(1.0)
    assert f["hist"][-1] == pytest.approx(1.0)


def test_probe_matrix_whitespace_values_fall_back():
    from dqc_spark.snapshot import _probe_matrix, _probe_positions

    # 32-char value containing spaces: bytes.fromhex would skip them and
    # misalign every later value's 16-byte slice
    vals = ["a" * 30 + "  ", "b" * 32]
    mat = _probe_matrix(np.array(vals), 4096, 4)
    for row, v in zip(mat, vals):
        assert list(row) == _probe_positions(v, 4096, 4)


def test_hyperplane_signatures_null_and_ragged_vectors(spark):
    from dqc_spark.similarity import hyperplane_signatures

    rows = [
        (1, [1.0] * 8),
        (2, None),          # NULL embedding (e.g. left-join miss)
        (3, [1.0] * 3),     # ragged
        (4, [-1.0] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["key"]: r["sig"] for r in
           hyperplane_signatures(df, dim=8, n_planes=16).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 0 and got[3] == 0  # zero-vector convention
    assert got[1] != got[4]


def test_lsh_index_and_topk_share_plane_derivation(spark):
    # the query-side planes must be bit-identical with the kernel's:
    # a self-query's signature distance to itself must be 0
    from dqc_spark.similarity import LshIndex

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ix = LshIndex(df, dim=16, n_planes=16)
    q = dict(rows)[7]
    top = ix.topk(q, k=1, max_hamming=0).collect()
    ix.close()
    assert top and top[0]["vec_id"] == 7  # hamming 0 bucket contains self


def test_line_dedup_key_injective(spark):
    # ('a\x00b', T) vs ('a', 'b\x00'+T): the old concat_ws('\x00', k, t)
    # key collided deterministically and dropped one distinct document
    from dqc_spark.pipeline import curate

    # SINGLE-line gate-passing text: the corpus line-dedup stage must
    # not cross-remove shared lines ('b\x00'+T is a different line), so
    # only the __ldk keying distinguishes the two scenarios.  The text
    # comes from the pagesgen model (newlines squashed) so the
    # perplexity gate passes — arbitrary English does not.
    from dqc_spark.pagesgen import generate_pages_local
    from dqc_spark.pipeline_oracle import oracle_labels

    local = generate_pages_local(40)
    kept_text = " ".join(
        next(
            r["text"] for r, g in zip(local, oracle_labels(local)) if g["keep"]
        ).split("\n")
    )
    collide = [("a\x00b", kept_text), ("a", "b\x00" + kept_text)]
    control = [("k1", kept_text), ("k2", "b\x00" + kept_text)]

    def run(rows):
        df = spark.createDataFrame(rows, "key string, text string")
        return curate(
            df, key_col="key", text_col="text",
            near_dup_threshold=None, domain_quota=None,
            line_dedup_min_len=10,
        ).count()

    n_control = run(control)
    assert n_control >= 2  # gates keep both texts (guard vacuousness)
    assert run(collide) == n_control  # collision-shaped keys drop nothing


# ---------------------------------------------------------------------------
# round-3 session-2 review findings
# ---------------------------------------------------------------------------


def test_png_malformed_ihdr_raises_valueerror_not_struct_error():
    import struct
    import zlib as _z

    from dqc_spark.mediacodec import decode_png

    # IHDR whose length field promises 5 bytes: struct.error would
    # escape the ValueError contract and abort the whole Spark job
    body = b"\x00\x00\x00\x05"
    bad = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(body)) + b"IHDR"
           + body + struct.pack(">I", _z.crc32(b"IHDR" + body)))
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(bad)


def test_png_decompression_bomb_rejected_bounded():
    import struct
    import zlib as _z

    from dqc_spark.mediacodec import decode_png

    # header promises 2x2 RGB (19 raster bytes) but the IDAT inflates
    # to 10 MB — the bounded inflate must reject at ~expect bytes, not
    # materialize the bomb
    def chunk(typ, b):
        return (struct.pack(">I", len(b)) + typ + b
                + struct.pack(">I", _z.crc32(typ + b)))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = _z.compress(b"\x00" * (10 * 1024 * 1024))
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="raster size"):
        decode_png(data)


def test_pagerank_fast_path_long_node_ids(spark):
    from dqc_spark.linkgraph import pagerank, trustrank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (1, 3, 1.0)],
        "src_domain long, dst_domain long, weight double")
    fast = pagerank(edges, weight_col="weight", n_iter=6)
    assert dict(fast.dtypes)["node"] == "bigint"
    f = {r["node"]: r["rank"] for r in fast.collect()}
    slow = {r["node"]: r["rank"]
            for r in pagerank(edges, weight_col="weight", n_iter=6,
                              driver_threshold=0).collect()}
    assert set(f) == {1, 2, 3} and set(slow) == {1, 2, 3}
    for k in f:
        assert f[k] == pytest.approx(slow[k], abs=1e-9)
    # trustrank seeds keep the node dtype too (str() coercion matched
    # nothing on long-keyed graphs)
    t = {r["node"]: r["rank"]
         for r in trustrank(edges, seeds=[1], weight_col="weight",
                            n_iter=6).collect()}
    assert t[1] > t[2] > 0


def test_pagerank_null_endpoint_and_weight(spark):
    from dqc_spark.linkgraph import pagerank

    # NULL weight: edge contributes nothing but still registers nodes;
    # identical between fast and distributed paths
    edges_nw = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", None), ("b", "c", 1.0)],
        "src_domain string, dst_domain string, weight double")
    f = {r["node"]: r["rank"]
         for r in pagerank(edges_nw, weight_col="weight",
                           n_iter=4).collect()}
    s = {r["node"]: r["rank"]
         for r in pagerank(edges_nw, weight_col="weight", n_iter=4,
                           driver_threshold=0).collect()}
    assert set(f) == set(s) == {"a", "b", "c"}
    for k in f:
        assert f[k] == pytest.approx(s[k], abs=1e-9)
    # NULL endpoint: the fast path bails to the distributed loop
    # (join-dropout semantics) instead of crashing in sorted()
    edges_null = spark.createDataFrame(
        [("a", "b", 1.0), (None, "b", 1.0)],
        "src_domain string, dst_domain string, weight double")
    out = pagerank(edges_null, weight_col="weight", n_iter=2).collect()
    assert len(out) >= 2


def test_pack_first_fit_null_tokens_rejected(spark):
    from dqc_spark.sampling import pack_first_fit

    df = spark.createDataFrame(
        [("s", "k1", 10), ("s", "k2", None)],
        "source string, url string, n_tok long")
    with pytest.raises(Exception, match="NULL token count"):
        pack_first_fit(df, "source", "url", "n_tok", budget=100).count()


def test_curate_line_dedup_unit_validated_up_front(spark):
    from dqc_spark.pipeline import curate

    df = spark.createDataFrame([("k", "text")], "key string, text string")
    with pytest.raises(ValueError, match="line_dedup_unit"):
        curate(df, key_col="key", line_dedup_unit="word")
    # paragraph unit with the dedup stage DISABLED must not silently
    # no-op
    with pytest.raises(ValueError, match="no effect"):
        curate(df, key_col="key", line_dedup_unit="paragraph")
