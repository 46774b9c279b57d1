"""Distributed BPE tokenizer training + encoding: the industrial shape.

Real-world BPE trainers (Sennrich et al. 2016; GPT-2's bpe; HuggingFace
tokenizers) never iterate over the corpus per merge — they make ONE
pass to build a word-frequency table, then run the merge loop over that
table, whose size is the VOCABULARY, not the corpus.  That factoring is
exactly Spark-shaped:

  * the corpus pass is the same combiner kernel as LM training
    (``lmtrain._count_rows``): one Arrow ``mapInPandas`` emitting
    per-batch pre-aggregated (word, count) partials, then a
    partial-aggregating groupBy-sum.  Corpus text never shuffles; the
    shuffle carries one row per distinct word per batch.
  * the word table collected to the driver is BOUNDED: top
    ``max_words`` by frequency via ``orderBy().limit()`` — Spark plans
    TakeOrderedAndProject (per-partition heaps, no global sort).  At
    web scale the tail of hapax words contributes ~nothing to pair
    statistics; capping is what production trainers do too.
  * the merge loop is pure driver-side python over the capped dict —
    O(max_words x avg_word_len) per merge, milliseconds at any corpus
    size, because corpus size stopped mattering after the count.
  * encoding broadcasts the finished merge ranks and runs ONE Arrow
    kernel with a per-batch word memo (web text repeats words heavily,
    so the memo turns per-token merge search into a dict hit).

Determinism: merge selection tie-breaks on the lexicographically
smallest pair, and the capped vocabulary tie-breaks (count desc, word
asc) identically in Spark (``orderBy``) and python (``sorted``), so
``train_bpe`` == ``train_bpe_py`` EXACTLY — pinned by tests/test_bpe.py.
Both twins share ``_merge_loop`` and ``encode_word`` verbatim (the
repo-wide golden-kernel rule: never fork oracle-shared code paths).

Tokenization: pre-splitting uses the shared LM-family tokenizer
(``wordhash.fold_tokens``, via lmtrain — case fold, CJK codepoint
isolation, Unicode-whitespace split) — BPE merges then happen INSIDE
words, with the Sennrich ``</w>`` end-of-word sentinel so merged units
can't leak across word boundaries.  Note: CJK codepoint isolation
makes each CJK character its own pre-word, so the vocabulary holds
single CJK characters (+ ``</w>``) and never multi-character CJK
merges — the same per-character unit the LM/decontam family uses.

Reference parity: the reference (data_quality_checker,
internal/checker/checker.go) has no tokenizer surface; this is §2.5
training-data-pipeline scope (token budgeting / packing need a real
subword count, and at 1e12 docs training the tokenizer IS a distributed
counting job).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.lmtrain import _scorer_tokens, capped_word_freqs

__all__ = [
    "train_bpe_py",
    "train_bpe",
    "encode_word",
    "encode_py",
    "bpe_token_counts",
]

_EOW = "</w>"


def _pair_counts(seqs: dict[str, tuple], freqs: dict[str, int]) -> Counter:
    """Adjacent-symbol pair counts over the word table, weighted by
    word frequency."""
    pc: Counter = Counter()
    for word, seq in seqs.items():
        f = freqs[word]
        for a, b in zip(seq, seq[1:]):
            pc[(a, b)] += f
    return pc


def _merge_seq(seq: tuple, pair: tuple) -> tuple:
    """Replace every non-overlapping occurrence of ``pair`` in ``seq``,
    scanning left to right (the GPT-2 apply rule)."""
    a, b = pair
    out = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def _merge_loop(
    word_freqs: dict[str, int], n_merges: int, min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a word-frequency table.  Shared
    verbatim by ``train_bpe`` and ``train_bpe_py``.  Stops early when
    the best pair falls under ``min_pair_count`` (merging hapax pairs
    only memorizes noise).  Tie-break: lexicographically smallest pair
    — total and engine-independent, so training is deterministic.

    Pair counts are maintained INCREMENTALLY: each merge adjusts only
    the words it rewrote (subtract the old seq's weighted pairs, add
    the new seq's), instead of recounting the whole word table per
    round — O(affected words) per merge, not O(table), which is the
    difference between seconds and hours at a production merge count
    (e.g. 32k merges x 50k words).  Zero-count entries are deleted so
    the Counter's key set stays identical to a fresh recount (the
    max/argmin tie-break sees exactly the same candidates) — output is
    bit-identical to the recount form, pinned by the hand-computed and
    Spark==python parity tests."""
    seqs = {w: tuple(w) + (_EOW,) for w in word_freqs}
    pc = _pair_counts(seqs, word_freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        best_n = max(pc.values())
        if best_n < min_pair_count:
            break
        best = min(p for p, n in pc.items() if n == best_n)
        merges.append(best)
        a = best[0]
        for w, s in seqs.items():
            if a not in s:
                continue
            new = _merge_seq(s, best)
            if new == s:
                continue
            f = word_freqs[w]
            for p in zip(s, s[1:]):
                pc[p] -= f
                if pc[p] == 0:
                    del pc[p]
            for p in zip(new, new[1:]):
                pc[p] += f
            seqs[w] = new
    return merges


def _cap_words(items: Iterable[tuple[str, int]],
               max_words: int | None) -> dict[str, int]:
    # the ONE load-bearing cap tiebreak lives in lmtrain — see
    # cap_top_words' docstring
    from dqc_spark.lmtrain import cap_top_words

    return cap_top_words(items, max_words)


def train_bpe_py(
    texts: Iterable[str | None],
    n_merges: int = 200,
    max_words: int | None = None,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Pure-python reference trainer — the exact-parity oracle for
    ``train_bpe`` (same tokenizer, same cap tie-break, same loop)."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(_scorer_tokens(t))
    return _merge_loop(
        _cap_words(wf.items(), max_words), n_merges, min_pair_count)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int | None = 50_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Train BPE merges on a DataFrame: one distributed combiner pass
    for word counts, TakeOrdered cap, driver-side merge loop.  Output
    is the ordered merge list (rank = position), ready for
    ``bpe_token_counts`` / ``encode_py``."""
    wf = capped_word_freqs(df, text_col, max_words,
                           tokenizer=_scorer_tokens)
    return _merge_loop(dict(wf), n_merges, min_pair_count)


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict | None = None,
) -> tuple[str, ...]:
    """Apply merges to one word, lowest rank first (the GPT-2 encode
    rule: training order IS application order).  ``cache`` memoizes
    word → tokens across a batch — web text repeats words heavily."""
    if cache is not None and word in cache:
        return cache[word]
    seq = tuple(word) + (_EOW,)
    while len(seq) > 1:
        pairs = set(zip(seq, seq[1:]))
        best = min(
            (r for p, r in ((p, ranks.get(p)) for p in pairs)
             if r is not None),
            default=None,
        )
        if best is None:
            break
        a_b = None
        for p in pairs:
            if ranks.get(p) == best:
                a_b = p
                break
        seq = _merge_seq(seq, a_b)
    if cache is not None:
        cache[word] = seq
    return seq


def encode_py(
    text: str | None,
    merges: list[tuple[str, str]],
    cache: dict | None = None,
) -> list[str]:
    """Subword tokens for one document — shared verbatim by the Spark
    kernel and the pytest oracle."""
    ranks = merges if isinstance(merges, dict) else {
        p: i for i, p in enumerate(merges)}
    out: list[str] = []
    for w in _scorer_tokens(text):
        out.extend(encode_word(w, ranks, cache))
    return out


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    key_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the trained-BPE subword count per document: broadcast
    ranks + ONE Arrow kernel, per-batch word memo, no shuffle."""
    ranks = {p: i for i, p in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    fields = [df.schema[key_col], df.schema[text_col]]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.LongType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rk = bc.value
        cache: dict = {}
        for pdf in batches:
            counts = [
                len(encode_py(t, rk, cache)) for t in pdf[text_col]
            ]
            yield pd.DataFrame({
                key_col: pdf[key_col],
                text_col: pdf[text_col],
                out_col: pd.array(counts, dtype="int64"),
            })

    return df.select(key_col, text_col).mapInPandas(kernel, out_schema)
