"""Cross-document SUBSTRING-level exact dedup (ExactSubstr shape).

Line dedup (``linededup.py``) removes repeated *lines*; this removes
repeated *k-word windows* anywhere in the corpus — the "remove
duplicated substrings of length >= k tokens" operation from the
deduplicating-training-data literature (Lee et al., ACL'22), which
catches boilerplate that is not line-aligned (flowed templates, quoted
reposts, license blurbs mid-paragraph).

Semantics (deterministic, order-free):

  * every overlapping k-word shingle gets a 128-bit rolling hash;
  * per distinct shingle, the occurrence with the smallest (key, pos)
    is the WINNER (first occurrence, corpus-wide);
  * a word is REMOVED iff it is covered by some non-winner occurrence
    of a shingle that occurs more than once in the corpus;
  * surviving words are rejoined with single spaces, EXCEPT between
    adjacent CJK codepoints, which rejoin with no separator — the
    tokenizer isolates each CJK codepoint, so a plain space join
    would rewrite untouched CJK documents into per-character-spaced
    text (C4-style token stream — original whitespace is otherwise
    not preserved; ``wordhash.join_tokens`` is the one shared rule).

Scale shape (the part that matters at 10^12 docs):

  * the shuffle carries (h1, h2, key, pos) — two longs + key + int per
    shingle, never text;
  * winner election is ``F.min(struct(key, pos))`` — partial-
    aggregatable map-side, no window, no hot partition (a shingle
    repeated 10^9 times combines to one row per input partition);
  * duplicated-span starts flow back as a per-doc array (bounded by
    doc length); one Arrow kernel rebuilds the text.

Python touches each document exactly twice (shingle hashing, rebuild),
both as vectorized-ish Arrow batches; hashes are two independent
64-bit rotate-xor lanes over md5-derived token hashes — 128 bits total,
so birthday collisions stay negligible at corpus scale (the same
reasoning as curate()'s 128-bit line key).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.wordhash import join_tokens, md5_word, unicode_tokens

__all__ = ["shingle_occurrences", "dedup_substrings", "dedup_substrings_py"]

_MASK = (1 << 64) - 1
# shared tokenizer/word-hash (wordhash.py): the DuckDB oracle and two
# sibling kernels depend on these staying byte-identical.  Case is
# PRESERVED (unicode_tokens, not fold_tokens): ExactSubstr removes
# byte-equal repeated spans, and the rebuilt text must keep the
# surviving words verbatim — folding would rewrite them.  CJK
# codepoint isolation means a k-word window over CJK is k characters.
_tokens = unicode_tokens


def _token_hash(word: str, cache: dict) -> tuple[int, int]:
    h1, h2, _ = md5_word(word, cache)
    return h1, h2


def _rot(x: np.ndarray, r: int) -> np.ndarray:
    r %= 64
    if r == 0:
        return x
    return ((x << np.uint64(r)) | (x >> np.uint64(64 - r))) & np.uint64(_MASK)


def _shingle_lanes(tokens: list[str], k: int, cache: dict) -> np.ndarray:
    """(n_shingles, 2) uint64: lane L of shingle i is
    XOR_j rot(token_hash_L[i+j], j*(L+1)+1) — position-dependent (no
    bag-of-words collisions), two independent lanes = 128 bits."""
    n = len(tokens) - k + 1
    if n <= 0:
        return np.zeros((0, 2), dtype=np.uint64)
    th = np.array(
        [_token_hash(w, cache) for w in tokens], dtype=np.uint64
    )  # (n_tokens, 2)
    out = np.zeros((n, 2), dtype=np.uint64)
    for j in range(k):
        col = th[j : j + n]
        out[:, 0] ^= _rot(col[:, 0], j + 1)
        out[:, 1] ^= _rot(col[:, 1], 2 * j + 1)
    return out


def _batch_shingle_lanes(
    toks_list: list[list[str]], k: int, cache: dict
) -> tuple[np.ndarray, np.ndarray]:
    """All shingle lanes of a BATCH in one vectorized pass:
    ``(lanes, ns)`` where ``lanes`` is (total_shingles, 2) uint64 in
    document order and ``ns[d]`` is doc d's shingle count.

    Bit-identical to per-doc ``_shingle_lanes`` (same rot/xor formula;
    pinned by the dedup_substrings_py pytest differential) but the
    per-doc python/numpy loop collapses to k gather-xor passes over
    one flat batch-wide hash array — the r3-verdict perf item (same
    trick as the bloom build: per-row python is the trap one level
    down from per-row HOFs).  Token md5s stay dict-memoized across
    the batch (web text reuses tokens heavily)."""
    n_docs = len(toks_list)
    lens = np.fromiter((len(t) for t in toks_list), dtype=np.int64,
                       count=n_docs)
    ns = np.maximum(lens - k + 1, 0)
    # a doc shorter than k contributes no shingles AND no flat tokens
    # worth hashing — but keeping its tokens in the flat array keeps
    # the offset math trivial and costs only the (memoized) hashes
    total = int(ns.sum())
    if total == 0:
        return np.zeros((0, 2), dtype=np.uint64), ns
    n_toks = int(lens.sum())
    h1 = np.fromiter(
        (md5_word(w, cache)[0] for toks in toks_list for w in toks),
        dtype=np.uint64, count=n_toks)
    h2 = np.fromiter(
        (md5_word(w, cache)[1] for toks in toks_list for w in toks),
        dtype=np.uint64, count=n_toks)
    doc_off = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_off[1:])
    sh_off = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(ns[:-1], out=sh_off[1:])
    # flat index of each shingle's first token: concatenated aranges
    starts = np.arange(total, dtype=np.int64) + np.repeat(
        doc_off - sh_off, ns)
    out = np.zeros((total, 2), dtype=np.uint64)
    for j in range(k):
        out[:, 0] ^= _rot(h1[starts + j], j + 1)
        out[:, 1] ^= _rot(h2[starts + j], 2 * j + 1)
    return out, ns


def shingle_occurrences(
    df: DataFrame, key_col: str, text_col: str = "text", k: int = 10
) -> DataFrame:
    """(key, pos, h1, h2) — one row per overlapping k-word shingle.
    ``pos`` is the 0-based WORD index of the shingle start."""
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("pos", T.IntegerType()),
            T.StructField("h1", T.LongType()),
            T.StructField("h2", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            # NULL keys cannot flow through substring dedup: the
            # three-valued `key == w.key` in _duplicate_starts would
            # silently keep (or over-drop) the NULL-key doc's spans,
            # and the python twin TypeErrors on (None, pos) ordering.
            # Fail loudly at the first batch carrying one.
            if pdf[key_col].isna().any():
                raise ValueError(
                    f"substring-dedup key column {key_col!r} contains "
                    "NULLs: winner election and the non-winner filter "
                    "go three-valued — filter or coalesce the key "
                    "first")
            toks_list = [_tokens(t) for t in pdf[text_col]]
            lanes, ns = _batch_shingle_lanes(toks_list, k, cache)
            keys = np.repeat(pdf[key_col].to_numpy(), ns)
            sh_off = np.zeros(len(ns), dtype=np.int64)
            np.cumsum(ns[:-1], out=sh_off[1:])
            pos = np.arange(len(lanes), dtype=np.int64) - np.repeat(
                sh_off, ns)
            # two's-complement reinterpret into signed long (Spark
            # LongType): a zero-copy view, no per-element python
            signed = lanes.view(np.int64)
            yield pd.DataFrame(
                {"key": keys,
                 "pos": pd.array(pos.astype(np.int32), dtype="int32"),
                 "h1": pd.array(signed[:, 0], dtype="int64"),
                 "h2": pd.array(signed[:, 1], dtype="int64")}
            )

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)


def _duplicate_starts(occ: DataFrame) -> DataFrame:
    """(key, pos) of every NON-WINNER occurrence of a shingle that
    occurs >= 2 times corpus-wide.  Winner = min(struct(key, pos)) —
    partial-aggregatable, so a shingle with 10^9 occurrences reduces
    map-side; no window over a hot hash partition."""
    winners = occ.groupBy("h1", "h2").agg(
        F.min(F.struct("key", "pos")).alias("w"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        occ.join(winners.filter(F.col("n") >= 2), on=["h1", "h2"])
        .filter(
            ~((F.col("key") == F.col("w.key")) & (F.col("pos") == F.col("w.pos")))
        )
        .select("key", "pos")
    )


def dedup_substrings(
    df: DataFrame, key_col: str, text_col: str = "text", k: int = 10
) -> DataFrame:
    """(key, text_dedup, n_words, n_words_kept): corpus with duplicated
    >= k-word substrings removed (first corpus-wide occurrence kept).
    See module docstring for semantics and the scale argument."""
    from dqc_spark.cache import track

    # persisted: the shingle frame is a mapInPandas stage with TWO
    # consumers inside _duplicate_starts (winner aggregate + join probe)
    # — unpersisted, Spark re-runs the tokenize+hash kernel per consumer
    occ = track(shingle_occurrences(df, key_col, text_col, k))
    dup_starts = (
        _duplicate_starts(occ)
        .groupBy("key")
        .agg(F.collect_list("pos").alias("__starts"))
    )
    keyed = df.select(key_col, text_col).join(
        dup_starts.withColumnRenamed("key", key_col), on=key_col, how="left"
    )

    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("text_dedup", T.StringType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("n_words_kept", T.IntegerType()),
        ]
    )

    def rebuild(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, texts, nw, nk = [], [], [], []
            for key, text, starts in zip(
                pdf[key_col], pdf[text_col], pdf["__starts"]
            ):
                toks = _tokens(text)
                if starts is None or len(starts) == 0:
                    kept = toks
                else:
                    drop = np.zeros(len(toks), dtype=bool)
                    for s in starts:
                        drop[s : s + k] = True
                    kept = [t for t, d in zip(toks, drop) if not d]
                keys.append(key)
                texts.append(join_tokens(kept))
                nw.append(len(toks))
                nk.append(len(kept))
            yield pd.DataFrame(
                {"key": keys, "text_dedup": texts,
                 "n_words": pd.array(nw, dtype="int32"),
                 "n_words_kept": pd.array(nk, dtype="int32")}
            )

    return keyed.mapInPandas(rebuild, schema=out_schema)


# ---------------------------------------------------------------------------
# pure-python oracle (mirrors the distributed semantics exactly)
# ---------------------------------------------------------------------------


def dedup_substrings_py(
    docs: list[tuple], k: int = 10
) -> dict:
    """Reference implementation over [(key, text), ...] — same winner
    rule, same coverage rule — for pytest differential pins."""
    cache: dict = {}
    occs: dict = {}  # (h1, h2) -> [(key, pos), ...]
    toks_by_key = {}
    for key, text in docs:
        toks = _tokens(text)
        toks_by_key[key] = toks
        lanes = _shingle_lanes(toks, k, cache)
        for pos in range(len(lanes)):
            occs.setdefault((int(lanes[pos, 0]), int(lanes[pos, 1])), []).append(
                (key, pos)
            )
    out = {}
    drop_by_key = {key: np.zeros(len(t), dtype=bool) for key, t in toks_by_key.items()}
    for locs in occs.values():
        if len(locs) < 2:
            continue
        winner = min(locs)
        for key, pos in locs:
            if (key, pos) != winner:
                drop_by_key[key][pos : pos + k] = True
    for key, toks in toks_by_key.items():
        kept = [t for t, d in zip(toks, drop_by_key[key]) if not d]
        out[key] = (join_tokens(kept), len(toks), len(kept))
    return out
