"""Per-document heuristic features — the shared Python kernel.

This single function is used by BOTH sides of the golden contract:
  * the distributed pipeline (inside the fused Arrow-batched UDF,
    scoring.py) and
  * the single-process oracle (pipeline_oracle.py),
so Spark-vs-oracle feature agreement is by construction.

It mirrors the pure-Column implementations in gates.py expression for
expression (same tokenization, same edge defaults).  The Column forms
remain available — they push work to the JVM and compose with Catalyst
— but Spark's higher-order-function lambdas execute interpreted (no
whole-stage codegen) and their unique lambda-variable IDs defeat
subexpression elimination, which measured 100x slower per core than
this kernel (37.7s vs 0.4s for 25k docs); the pipeline therefore
defaults to the fused-UDF path (pipeline.annotate(engine="pandas")).
"""

from __future__ import annotations

import re

from dqc_spark.gates import ALL_STOPWORDS

_WS = re.compile(r"\s+")
_STOPSET = set(ALL_STOPWORDS)

FEATURE_NAMES = [
    "n_words",
    "mean_word_len",
    "stopword_ratio",
    "alpha_ratio",
    "symbol_word_ratio",
    "dup_line_fraction",
    "dup_bigram_fraction",
]


def features_py(text: str) -> dict:
    """All gate features for one document, one tokenization pass."""
    words = [w for w in _WS.split(text) if w != ""]
    lw = [w for w in _WS.split(text.lower()) if w != ""]
    nw = len(words)
    raw_len = len(text)
    total = sum(1 for ch in text if not ch.isspace())
    alpha = sum(1 for ch in text if ch.isalpha())
    n_hash = text.count("#")
    n_ell = (raw_len - len(text.replace("...", ""))) / 3
    lines = [l for l in text.split("\n") if l != ""]
    bigrams = [f"{lw[i]} {lw[i + 1]}" for i in range(len(lw) - 1)]
    return {
        "n_words": nw,
        "mean_word_len": (sum(len(w) for w in words) / nw) if nw else None,
        "stopword_ratio": (sum(1 for w in lw if w in _STOPSET) / len(lw)) if lw else 0.0,
        "alpha_ratio": (alpha / total) if total else 0.0,
        "symbol_word_ratio": ((n_hash + n_ell) / nw) if nw else 0.0,
        "dup_line_fraction": (1.0 - len(set(lines)) / len(lines)) if lines else 0.0,
        "dup_bigram_fraction": (1.0 - len(set(bigrams)) / len(bigrams)) if bigrams else 0.0,
    }
