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

from dqc_spark import gates
from dqc_spark.features import features_py  # noqa: F401  (re-export; shared kernel)
from dqc_spark.perplexity import DEFAULT_MAX_PPL
from dqc_spark.scrub import scrub_text_py
from dqc_spark.textmodels import (
    build_langid_model,
    build_lm,
    langid_score,
    perplexity,
)

_MODEL = None
_LM = None


def _models():
    global _MODEL, _LM
    if _MODEL is None:
        _MODEL = build_langid_model()
        _LM = build_lm()
    return _MODEL, _LM


def gate_flags_py(
    text: str,
    claimed_lang: str | None,
    thresholds: dict | None = None,
    max_ppl: float = DEFAULT_MAX_PPL,
    lm: dict | None = None,
    langid_model: dict | None = None,
) -> dict:
    t = dict(gates.DEFAULT_THRESHOLDS)
    if thresholds:
        t.update(thresholds)
    f = features_py(text)
    model, default_lm = _models()
    if lm is None:  # custom lm mirrors annotate(lm=...) exactly
        lm = default_lm
    if langid_model is not None:  # mirrors annotate(langid_model=...)
        model = langid_model
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
    max_ppl: float = DEFAULT_MAX_PPL, lm: dict | None = None,
    langid_model: dict | None = None,
) -> list[dict]:
    """Golden (url, keep, scrubbed_text) per input row — scrubbed_text is
    None for dropped docs, mirroring the pipeline's keep-gated scrub."""
    out = []
    for row in rows:
        flags = gate_flags_py(row["text"], row.get("lang"), thresholds,
                              max_ppl, lm=lm, langid_model=langid_model)
        keep = not any(v for k, v in flags.items() if k.startswith("gate_"))
        out.append(
            {
                "url": row["url"],
                "keep": keep,
                "scrubbed_text": scrub_text_py(row["text"]) if keep else None,
            }
        )
    return out
