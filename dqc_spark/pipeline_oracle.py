"""Single-process pure-Python oracle of the full gate suite.

Regenerates the same rows as pagesgen (counter-based RNG, no Spark) and
computes golden ``keep`` + ``scrubbed_text`` per url with plain-Python
mirrors of every Catalyst gate expression.  The Spark pipeline must
match at F1 >= 0.99 (labels) and byte-identically (scrubbed text) —
BASELINE.md.  langid / perplexity / scrub share the exact same model
code (textmodels.py, scrub.py), so any divergence isolates to the
Column-expression vs Python mirrors, which the golden tests pin.
"""

from __future__ import annotations

import re

from dqc_spark import gates
from dqc_spark.perplexity import DEFAULT_MAX_PPL
from dqc_spark.scrub import scrub_text_py
from dqc_spark.textmodels import (
    build_langid_model,
    build_lm,
    langid_score,
    perplexity,
)

_WS = re.compile(r"\s+")
_STOPSET = set(gates.ALL_STOPWORDS)
_MODEL = None
_LM = None


def _models():
    global _MODEL, _LM
    if _MODEL is None:
        _MODEL = build_langid_model()
        _LM = build_lm()
    return _MODEL, _LM


def features_py(text: str) -> dict:
    """Python mirror of gates.feature_columns — same tokenization
    (regex split + drop empties), same arithmetic, same edge defaults."""
    words = [w for w in _WS.split(text) if w != ""]
    lw = [w for w in _WS.split(text.lower()) if w != ""]
    nw = len(words)
    raw_len = len(text)
    total = sum(1 for ch in text if not ch.isspace())
    alpha = sum(1 for ch in text if ch.isalpha())
    n_hash = text.count("#")
    n_ell = (raw_len - len(text.replace("...", ""))) / 3
    lines = [l for l in text.split("\n") if l != ""]
    bigrams = [f"{lw[i]} {lw[i+1]}" for i in range(len(lw) - 1)]
    return {
        "n_words": nw,
        "mean_word_len": (sum(len(w) for w in words) / nw) if nw else None,
        "stopword_ratio": (sum(1 for w in lw if w in _STOPSET) / len(lw)) if lw else 0.0,
        "alpha_ratio": (alpha / total) if total else 0.0,
        "symbol_word_ratio": ((n_hash + n_ell) / nw) if nw else 0.0,
        "dup_line_fraction": (1.0 - len(set(lines)) / len(lines)) if lines else 0.0,
        "dup_bigram_fraction": (1.0 - len(set(bigrams)) / len(bigrams)) if bigrams else 0.0,
    }


def gate_flags_py(
    text: str,
    claimed_lang: str | None,
    thresholds: dict | None = None,
    max_ppl: float = DEFAULT_MAX_PPL,
) -> dict:
    t = dict(gates.DEFAULT_THRESHOLDS)
    if thresholds:
        t.update(thresholds)
    f = features_py(text)
    model, lm = _models()
    lang_pred, lang_conf = langid_score(text, model)
    ppl = perplexity(text, lm)

    mwl = f["mean_word_len"]
    flags = {
        "gate_too_few_words": f["n_words"] < t["min_words"],
        "gate_too_many_words": f["n_words"] > t["max_words"],
        "gate_word_length": (
            False if mwl is None
            else (mwl < t["min_mean_word_length"] or mwl > t["max_mean_word_length"])
        ),
        "gate_stopword": f["stopword_ratio"] < t["min_stopword_ratio"],
        "gate_alpha": f["alpha_ratio"] < t["min_alpha_ratio"],
        "gate_symbol": f["symbol_word_ratio"] > t["max_symbol_word_ratio"],
        "gate_dup_lines": f["dup_line_fraction"] > t["max_dup_line_fraction"],
        "gate_repetition": f["dup_bigram_fraction"] > t["max_dup_bigram_fraction"],
        "gate_lang_mismatch": (
            claimed_lang is not None
            and lang_pred != claimed_lang
            and lang_conf >= 0.2
        ),
        "gate_high_ppl": ppl > max_ppl,
    }
    flags["_features"] = f
    flags["_lang_pred"] = lang_pred
    flags["_lang_conf"] = lang_conf
    flags["_ppl"] = ppl
    return flags


def oracle_labels(
    rows: list[dict], thresholds: dict | None = None,
    max_ppl: float = DEFAULT_MAX_PPL,
) -> list[dict]:
    """Golden (url, keep, scrubbed_text) per input row — scrubbed_text is
    None for dropped docs, mirroring the pipeline's keep-gated scrub."""
    out = []
    for row in rows:
        flags = gate_flags_py(row["text"], row.get("lang"), thresholds, max_ppl)
        keep = not any(v for k, v in flags.items() if k.startswith("gate_"))
        out.append(
            {
                "url": row["url"],
                "keep": keep,
                "scrubbed_text": scrub_text_py(row["text"]) if keep else None,
            }
        )
    return out
