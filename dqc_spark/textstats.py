"""Text-analysis operators over document tables.

All pure Catalyst Columns unless noted: language-ID heuristic (n-gram,
JVM-side approximation of langid.py's UDF model), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace +
BPE-ish regex), and rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqc_spark.gates import ALL_STOPWORDS, stopword_ratio, words_col


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------


def whitespace_token_count(text: Column) -> Column:
    return F.size(words_col(text))


# BPE-ish pre-tokenizer: word pieces, numbers, and single non-space
# symbols — the regex family GPT-2/tiktoken-style tokenizers use for
# pre-splitting (token COUNT approximation, not real BPE merges)
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0))


def token_stats(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        F.col(key_col),
        whitespace_token_count(t).alias("ws_tokens"),
        bpeish_token_count(t).alias("bpeish_tokens"),
        F.length(t).alias("chars"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Component ratios + a composite score in [0,1].  Mirrors the gate
    features but packaged as a scoring operator (C4-style)."""
    total = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^a-zA-Z]", ""))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    nw = F.size(words_col(text))
    sw = stopword_ratio(text)
    alpha_r = F.when(total > 0, alpha / total).otherwise(F.lit(0.0))
    punct_r = F.when(total > 0, punct / total).otherwise(F.lit(0.0))
    score = (
        F.least(nw / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(sw * 4, F.lit(1.0)) * 0.3
        + alpha_r * 0.3
    )
    return {
        "n_words": nw,
        "alpha_ratio": alpha_r,
        "punct_ratio": punct_r,
        "stopword_ratio": sw,
        "quality_score": score,
    }


def quality_scores(df: DataFrame, key_col: str, text_col: str = "text") -> DataFrame:
    cols = quality_score_cols(F.col(text_col))
    return df.select(F.col(key_col), *[c.alias(n) for n, c in cols.items()])


# ---------------------------------------------------------------------------
# heuristic language ID (JVM-side; the UDF model in langid.py is the
# accurate path — this is the shuffle-free approximation for triage)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "that"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "es": ["que", "los", "del", "las", "por"],
    "fr": ["les", "des", "est", "dans", "pour"],
}


def langid_heuristic(text: Column) -> Column:
    """Marker-word voting + CJK-character detection, entirely as Catalyst
    expressions (no UDF): argmax over per-language marker hit counts."""
    w = words_col(F.lower(text))
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    scores = [
        (lang, F.size(F.filter(w, lambda x: x.isin(markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    # build argmax as nested CASE WHEN; ties resolve in list order
    best_lang = F.lit("und")
    best_score = F.lit(-1)
    for lang, s in scores:
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    # zh tokens are single CJK chars -> cjk count == token count; use a
    # majority-of-words test rather than strict >
    return (
        F.when(cjk * 2 > F.size(w), F.lit("zh"))
        .when(best_score > 0, best_lang)
        .otherwise(F.lit("und"))
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(text: Column) -> Column:
    """Stable content fingerprint: md5 of whitespace-normalized
    lowercased text.  Cross-engine reproducible (md5 is md5 everywhere),
    unlike xxhash64 whose seed is Spark-specific."""
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.md5(F.trim(norm))


def rolling_fingerprints(
    df: DataFrame, key_col: str, text_col: str = "text", window: int = 8
) -> DataFrame:
    """Winnowing-style rolling hashes: xxhash64 over each word window —
    the per-doc min is a robust partial-overlap signature."""
    w = words_col(F.lower(F.col(text_col)))
    hashes = F.when(
        F.size(w) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - window),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i + 1, window))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", w))))
    return df.select(
        F.col(key_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
        F.array_min(hashes).alias("min_rolling_hash"),
    )


# ---------------------------------------------------------------------------
# corpus boilerplate statistics: most frequent word n-grams
# ---------------------------------------------------------------------------


def ngrams_col(text: Column, n: int) -> Column:
    """Lowercased word n-grams as an array column (empty when the doc has
    fewer than n words).  Built with an explicit per-position concat over
    a sequence — the gram count varies per row so the sequence transform
    is unavoidable, but each gram is a single JVM concat_ws."""
    w = words_col(F.lower(text))
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = 20
) -> DataFrame:
    """Corpus-wide most frequent word n-grams — the boilerplate detector
    (navigation strings, cookie banners, licence blurbs surface first).

    Scale shape: explode -> partial+final hash agg on the gram, then
    ``orderBy().limit(k)`` which plans as TakeOrderedAndProject
    (per-partition top-k, k-row merge on the driver) — no global sort,
    no single-partition window.  Ties at the cut are broken by the gram
    string so the result is deterministic.
    """
    grams = df.select(F.explode(ngrams_col(F.col(text_col), n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("ngram")
    ).limit(k)


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------

REP_NGRAM_TOP = (2, 3, 4)
REP_NGRAM_DUP = (5, 6, 7, 8, 9, 10)


# the Gopher bullet set: the paper names "•" and "-"; the CJK/typo-
# graphic variants cover the same list-page shape on real web text
_BULLET_CHARS = "•‣▪◦·-*"


def repetition_signals_py(text: str | None) -> dict:
    """One document's Gopher-style repetition signals (Rae et al. 2021,
    A1.1), exact definitions as implemented:

      * dup_line_frac       = (#lines - #distinct lines) / #lines
      * dup_line_char_frac  = sum over duplicated lines of
                              (count-1)*len / sum of count*len
      * dup_para_frac / dup_para_char_frac — same over '\\n\\n' splits
      * top_{n}gram_char_frac (n=2,3,4): chars of the most frequent
        word n-gram (count * gram char length, spaces included) over
        len(text); ties broken toward the larger fraction
      * dup_{n}gram_char_frac (n=5..10): word chars covered by the
        2nd+ occurrences of any duplicated n-gram (overlaps counted
        once) over total word chars

    Shared verbatim by the distributed kernel and the pytest oracle
    (the features_py never-fork rule).  Empty/None text -> all 0.0."""
    from collections import Counter

    out: dict = {}

    def dup_fracs(units: list[str]) -> tuple[float, float]:
        n = len(units)
        if not n:
            return 0.0, 0.0
        cnt = Counter(units)
        dups = n - len(cnt)
        total = sum(len(u) for u in units)
        dup_chars = sum((c - 1) * len(u) for u, c in cnt.items() if c > 1)
        return dups / n, (dup_chars / total) if total else 0.0

    t = text or ""
    out["dup_line_frac"], out["dup_line_char_frac"] = dup_fracs(
        t.split("\n"))
    out["dup_para_frac"], out["dup_para_char_frac"] = dup_fracs(
        t.split("\n\n"))

    words = t.split()
    wlens = [len(w) for w in words]
    total_word_chars = sum(wlens)
    for n in REP_NGRAM_TOP:
        frac = 0.0
        if len(words) >= n and len(t):
            cnt = Counter(
                tuple(words[i:i + n]) for i in range(len(words) - n + 1))
            frac = max(
                c * (sum(len(w) for w in g) + n - 1) for g, c in cnt.items()
            ) / len(t)
        out[f"top_{n}gram_char_frac"] = frac
    for n in REP_NGRAM_DUP:
        frac = 0.0
        if len(words) >= n and total_word_chars:
            cnt: Counter = Counter()
            covered = [False] * len(words)
            seen: set = set()
            for i in range(len(words) - n + 1):
                g = tuple(words[i:i + n])
                if g in seen:  # a 2nd+ occurrence: mark its words
                    for j in range(i, i + n):
                        covered[j] = True
                else:
                    seen.add(g)
            frac = sum(
                l for l, c in zip(wlens, covered) if c) / total_word_chars
        out[f"dup_{n}gram_char_frac"] = frac

    # Gopher A1 document-structure signals (same paper, §A1.1 list
    # rules): fraction of non-empty lines that are bullet points /
    # that trail off in an ellipsis, and the duplicate-word fraction
    # (1 - distinct/total — spelled as a DUPLICATE fraction so every
    # signal in this family shares exceed-drops threshold semantics).
    # Lines strip the EXPLICIT " \t" set on both ends — python
    # str.strip() is Unicode-wide while DuckDB trim(s, chars) is
    # literal, so the shared explicit set keeps the SQL oracle
    # byte-equivalent (the wordhash UWS lesson, one level up).
    stripped = [ln.strip(" \t") for ln in t.split("\n")]
    nonempty = [ln for ln in stripped if ln]
    nl = len(nonempty)
    out["bullet_line_frac"] = (
        sum(1 for ln in nonempty if ln[0] in _BULLET_CHARS) / nl
        if nl else 0.0)
    out["ellipsis_line_frac"] = (
        sum(1 for ln in nonempty
            if ln.endswith("...") or ln.endswith("…")) / nl
        if nl else 0.0)
    out["dup_word_frac"] = (
        1.0 - len(set(words)) / len(words) if words else 0.0)
    return out


def repetition_signals(
    df: DataFrame, key_col: str, text_col: str = "text"
) -> DataFrame:
    """(key, dup_line_frac, ..., dup_10gram_char_frac) per document.

    Scale shape: per-document CPU inside ONE mapInPandas Arrow kernel —
    zero shuffle, composes into the corpus scan, text never moves.  The
    pure-Catalyst alternative (split + explode + groupBy per unit)
    would shuffle every line/gram of the corpus; the oracle SQL uses
    exactly that spelling as the independent mechanism.  Line/para
    columns are SQL-differentiated; n-gram columns are pytest-pinned
    (rows-only at the driver gate)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    cols = (
        ["dup_line_frac", "dup_line_char_frac",
         "dup_para_frac", "dup_para_char_frac"]
        + [f"top_{n}gram_char_frac" for n in REP_NGRAM_TOP]
        + [f"dup_{n}gram_char_frac" for n in REP_NGRAM_DUP]
        + ["bullet_line_frac", "ellipsis_line_frac", "dup_word_frac"]
    )
    out_schema = T.StructType(
        [T.StructField(key_col, df.schema[key_col].dataType)]
        + [T.StructField(c, T.DoubleType()) for c in cols]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [repetition_signals_py(t) for t in pdf[text_col]]
            data = {key_col: pdf[key_col]}
            data.update({c: [s[c] for s in sigs] for c in cols})
            yield pd.DataFrame(data)

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# compression-ratio quality signal
# ---------------------------------------------------------------------------


def compression_ratios(
    df: DataFrame, key_col: str, text_col: str = "text", level: int = 6
) -> DataFrame:
    """(key, n_bytes, n_compressed, compression_ratio) — zlib ratio per
    document.  Highly repetitive/boilerplate text compresses far below
    natural prose (~0.35-0.45 for English), so a very low ratio is a
    strong junk signal and a very high one flags random/binary noise;
    both tails are standard web-pipeline drop rules (complementing the
    dup_line/dup_bigram gates, which only see exact repeats).

    zlib is per-document CPU with zero data movement — a mapInPandas
    kernel over Arrow batches (stdlib zlib releases the GIL during
    compress, so executor threads overlap).  Not SQL-expressible:
    pytest-pinned, rows-only at the driver gate.
    """
    import zlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    # key column keeps the CALLER's name (like every sibling operator)
    # so the result joins straight back onto the corpus frame
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [
                (t or "").encode("utf-8") for t in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "n_bytes": nb,
                    "n_compressed": nc,
                    "compression_ratio": [
                        (c / b) if b else 0.0 for c, b in zip(nc, nb)
                    ],
                }
            )

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)
