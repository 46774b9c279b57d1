"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

Kudo 2018 ("Subword Regularization") trains a subword vocabulary as a
unigram language model over segmentation lattices: start from a large
seed of candidate pieces, run EM to fit piece probabilities (each
word's likelihood marginalizes over ALL its segmentations), prune the
vocabulary down in rounds, and encode with Viterbi (the single best
segmentation).  Together with ``bpe.py`` this completes the two
industrial tokenizer-training families.

The factoring is the same one ``bpe.py`` proved out — and it is
exactly Spark-shaped:

  * the ONLY corpus-scale work is the word-frequency count:
    ``lmtrain.capped_word_freqs`` (combiner kernel, pre-aggregated
    (word, count) partials, TakeOrdered cap).  Corpus text never
    shuffles and never reaches the driver.
  * everything after the count — seed enumeration, EM, pruning — runs
    over the CAPPED word table (≤ ``max_words`` rows), whose size is a
    vocabulary, not a corpus.  SentencePiece itself trains on a
    sampled/capped sentence set for the same reason.
  * encoding broadcasts the finished (piece -> logp) dict and runs ONE
    Arrow kernel with a per-batch word memo, identical shape to
    ``bpe.bpe_token_counts``.

Determinism (exact Spark==python parity, pinned in tests):

  * the capped word table tie-breaks (count desc, word asc) in both
    engines — the load-bearing invariant ``capped_word_freqs``
    documents;
  * seed capping tie-breaks (weight desc, piece asc);
  * pruning keeps top pieces by (expected count desc, piece asc) and
    NEVER drops single-codepoint pieces (full coverage by
    construction);
  * EM is plain python float arithmetic executed on the driver by both
    twins — bit-identical because it is literally the same code
    (``train_unigram`` wraps ``_fit`` around the distributed count;
    ``train_unigram_py`` wraps it around a local Counter);
  * Viterbi ties resolve to the LONGEST last piece (strict-``>``
    update scanning split points left to right), a total rule.

Honest simplification vs SentencePiece: pruning ranks pieces by their
EM expected count rather than by the exact likelihood-loss of removing
them (Kudo's loss needs a second lattice pass per candidate; the
count ranking is the standard cheap proxy and is deterministic).  The
docstring states it so nobody mistakes this for byte-exact
SentencePiece parity; segmentation QUALITY properties (coverage,
compression vs chars, parity across engines) are what the tests pin.

Tokenization: pre-splitting uses the shared LM-family tokenizer
(``wordhash.fold_tokens`` — case fold, CJK codepoint isolation,
Unicode-whitespace split), so unigram pieces never cross word
boundaries and CJK pre-words are single codepoints, consistent with
every other consumer of the family.

Reference parity: the reference (data_quality_checker) has no
tokenizer surface; §2.5 training-data scope.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.lmtrain import _scorer_tokens, capped_word_freqs

__all__ = [
    "train_unigram",
    "train_unigram_py",
    "encode_word_viterbi",
    "encode_unigram_py",
    "unigram_token_counts",
]

# logp assigned to a codepoint absent from the vocabulary entirely
# (can only happen at ENCODE time on unseen text): worse than any
# trained piece so it is used only when unavoidable, finite so
# segmentation always succeeds.
_UNK_LOGP = -100.0


# ---------------------------------------------------------------------------
# seed vocabulary
# ---------------------------------------------------------------------------


def _seed_vocab(
    word_freqs: dict[str, int], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Candidate pieces: every substring (len ≤ ``max_piece_len``) of
    every word, weighted by freq × len (SentencePiece's ESA seed uses
    the same weight), capped to ``seed_size`` — but ALL single
    codepoints survive the cap unconditionally (coverage).  Returns
    initial log-probabilities, normalized over the seed."""
    w: Counter = Counter()
    chars: set[str] = set()
    for word, f in word_freqs.items():
        n = len(word)
        for i in range(n):
            chars.add(word[i])
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                w[word[i:j]] += f * (j - i)
    multi = [(p, c) for p, c in w.items() if len(p) > 1]
    multi.sort(key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in multi[: max(0, seed_size - len(chars))]}
    keep |= chars
    total = sum(w[p] for p in keep)
    logt = math.log(total)
    return {p: math.log(w[p]) - logt for p in sorted(keep)}


# ---------------------------------------------------------------------------
# EM over segmentation lattices
# ---------------------------------------------------------------------------


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _forward(word: str, logp: dict[str, float], max_len: int) -> list[float]:
    """alpha[i] = log total probability of segmenting word[:i]."""
    n = len(word)
    alpha = [float("-inf")] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        terms = []
        for j in range(max(0, i - max_len), i):
            if alpha[j] == float("-inf"):
                continue
            lp = logp.get(word[j:i])
            if lp is not None:
                terms.append(alpha[j] + lp)
        if terms:
            alpha[i] = _logsumexp(terms)
    return alpha


def _expected_counts(
    word_freqs: dict[str, int], logp: dict[str, float], max_len: int
) -> tuple[Counter, float]:
    """E-step: marginal expected count of every piece across every
    word's segmentation lattice (forward-backward), plus the total
    corpus log-likelihood.  A word rendered unsegmentable by pruning
    cannot occur (single chars are never pruned) but is skipped
    defensively."""
    counts: Counter = Counter()
    loglik = 0.0
    for word, f in word_freqs.items():
        n = len(word)
        alpha = _forward(word, logp, max_len)
        if alpha[n] == float("-inf"):
            continue
        beta = [float("-inf")] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            terms = []
            for j in range(i + 1, min(i + max_len, n) + 1):
                if beta[j] == float("-inf"):
                    continue
                lp = logp.get(word[i:j])
                if lp is not None:
                    terms.append(lp + beta[j])
            if terms:
                beta[i] = _logsumexp(terms)
        z = alpha[n]
        loglik += f * z
        for i in range(n):
            if alpha[i] == float("-inf"):
                continue
            for j in range(i + 1, min(i + max_len, n) + 1):
                lp = logp.get(word[i:j])
                if lp is None or beta[j] == float("-inf"):
                    continue
                counts[word[i:j]] += f * math.exp(alpha[i] + lp + beta[j] - z)
    return counts, loglik


def _m_step(counts: Counter, vocab: Iterable[str]) -> dict[str, float]:
    """Normalize expected counts into log-probabilities.  Pieces with
    zero expected count keep a floor epsilon so they stay encodable
    until pruning removes them."""
    total = sum(counts.values())
    if total <= 0.0:  # degenerate: uniform over the vocab
        vs = list(vocab)
        return {p: -math.log(len(vs)) for p in vs}
    floor = total * 1e-12
    logt = math.log(total + floor * sum(1 for p in vocab if counts[p] <= 0))
    out = {}
    for p in vocab:
        c = counts[p]
        out[p] = math.log(c if c > 0 else floor) - logt
    return out


def _fit(
    word_freqs: dict[str, int],
    vocab_size: int,
    max_piece_len: int,
    seed_size: int,
    em_rounds: int,
    prune_frac: float,
) -> dict[str, float]:
    """Seed → (EM ×rounds → prune) until ≤ vocab_size → final EM.
    Shared verbatim by both trainer twins."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be positive")
    if not 0.0 < prune_frac < 1.0:
        raise ValueError("prune_frac must be in (0, 1)")
    if em_rounds < 1:
        # with zero EM rounds every expected count is 0 and pruning
        # would rank multi-char pieces ALPHABETICALLY — a deterministic
        # but meaningless vocabulary, silently
        raise ValueError("em_rounds must be >= 1")
    if not word_freqs:
        return {}
    # canonical iteration order: every float ACCUMULATION below (seed
    # weights, expected counts, log-likelihood, normalizers) sums in
    # word order — collect order from Spark and insertion order from a
    # python Counter would otherwise produce last-ULP-different models
    word_freqs = dict(sorted(word_freqs.items()))
    logp = _seed_vocab(word_freqs, max_piece_len, seed_size)
    while True:
        counts = Counter()
        for _ in range(em_rounds):
            counts, _ = _expected_counts(word_freqs, logp, max_piece_len)
            logp = _m_step(counts, logp.keys())
        if len(logp) <= vocab_size:
            return logp
        singles = [p for p in logp if len(p) == 1]
        multi = [(p, counts[p]) for p in logp if len(p) > 1]
        multi.sort(key=lambda kv: (-kv[1], kv[0]))
        # shrink by prune_frac per round, but never below the final
        # multi-piece budget (vocab_size minus the unprunable singles)
        n_keep = max(vocab_size - len(singles),
                     int(len(multi) * (1.0 - prune_frac)))
        n_keep = max(0, min(len(multi), n_keep))
        if n_keep == len(multi):  # nothing prunable: singles dominate
            return logp
        kept = set(singles) | {p for p, _ in multi[:n_keep]}
        logp = {p: lp for p, lp in logp.items() if p in kept}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_words: int | None = 50_000,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    em_rounds: int = 2,
    prune_frac: float = 0.2,
) -> dict[str, float]:
    """Train a unigram-LM tokenizer on a DataFrame: one distributed
    combiner pass for word counts, TakeOrdered cap, driver-side
    EM/prune loop.  Returns {piece: logp}, ready for
    ``unigram_token_counts`` / ``encode_unigram_py``."""
    wf = capped_word_freqs(df, text_col, max_words,
                           tokenizer=_scorer_tokens)
    return _fit(dict(wf), vocab_size, max_piece_len, seed_size,
                em_rounds, prune_frac)


def train_unigram_py(
    texts: Iterable[str | None],
    vocab_size: int = 1000,
    max_words: int | None = None,
    max_piece_len: int = 8,
    seed_size: int = 8000,
    em_rounds: int = 2,
    prune_frac: float = 0.2,
) -> dict[str, float]:
    """Pure-python reference trainer — the exact-parity oracle for
    ``train_unigram`` (same tokenizer, same cap tie-break, same
    ``_fit``)."""
    from dqc_spark.lmtrain import cap_top_words

    wf: Counter = Counter()
    for t in texts:
        wf.update(_scorer_tokens(t))
    return _fit(cap_top_words(wf.items(), max_words), vocab_size,
                max_piece_len, seed_size, em_rounds, prune_frac)


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_word_viterbi(
    word: str,
    logp: dict[str, float],
    max_len: int = 8,
    cache: dict | None = None,
) -> tuple[str, ...]:
    """Single best segmentation of one word under the trained model.
    Codepoints absent from the vocabulary get ``_UNK_LOGP`` so encoding
    never fails.  Tie-break: strict-``>`` update over split points
    scanned left to right resolves equal scores to the longest final
    piece — total and shared by both twins."""
    if cache is not None and word in cache:
        return cache[word]
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == float("-inf"):
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP  # single unknown codepoint
            s = best[j] + lp
            # strict >: the FIRST (smallest) j achieving the max wins,
            # i.e. equal scores resolve to the longest final piece
            if s > best[i]:
                best[i] = s
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    seq = tuple(reversed(out))
    if cache is not None:
        cache[word] = seq
    return seq


def encode_unigram_py(
    text: str | None,
    logp: dict[str, float],
    max_len: int = 8,
    cache: dict | None = None,
) -> list[str]:
    """Unigram pieces for one document — shared verbatim by the Spark
    kernel and the pytest oracle."""
    out: list[str] = []
    for w in _scorer_tokens(text):
        out.extend(encode_word_viterbi(w, logp, max_len, cache))
    return out


def unigram_token_counts(
    df: DataFrame,
    logp: dict[str, float],
    key_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_unigram_tokens",
    max_len: int = 8,
) -> DataFrame:
    """Append the trained-unigram piece count per document: broadcast
    model + ONE Arrow kernel, per-batch word memo, no shuffle — the
    same plan shape as ``bpe.bpe_token_counts``."""
    bc = df.sparkSession.sparkContext.broadcast(dict(logp))
    fields = [df.schema[key_col], df.schema[text_col]]
    out_schema = T.StructType(fields + [T.StructField(out_col, T.LongType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value
        cache: dict = {}
        for pdf in batches:
            counts = [
                len(encode_unigram_py(t, model, max_len, cache))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({
                key_col: pdf[key_col],
                text_col: pdf[text_col],
                out_col: pd.array(counts, dtype="int64"),
            })

    return df.select(key_col, text_col).mapInPandas(kernel, out_schema)
