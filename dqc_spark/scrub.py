"""PII / toxicity scrubbing — byte-stable compiled-regex replacement.

Runs as an Arrow-batched pandas UDF with ``pandas.Series.str.replace``
(vectorized over the batch, Python ``re`` engine underneath) so the
output is byte-identical to the single-process oracle that uses
``re.sub`` with the same compiled patterns — the BASELINE.md
"byte-identical scrubbed text per url" gate.

Java's ``regexp_replace`` is deliberately NOT used here: Java and RE2/
Python differ on corner cases (unicode word boundaries, empty-match
handling), and the invariant is byte parity, not throughput of this one
stage.  Patterns are kept in the RE2-compatible subset (no backrefs, no
lookaround) per the reference's RE2 semantics (README.md:33).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (name, pattern, replacement) — order matters and is part of the spec:
# earlier scrubs can create text later patterns must not re-match.
SCRUB_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # two branches because \b cannot assert before '(' (no lookbehind in
    # the RE2-compatible subset)
    ("phone", r"\b(?:\+?[0-9]{1,2}[ .-]?)?[0-9]{3}[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b|\([0-9]{3}\)[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("credit_card", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b", "<CC>"),
    # toxicity placeholder list — deterministic, in-repo (real deployments
    # broadcast a curated lexicon the same way)
    ("toxicity", r"\b(?:badword1|badword2|badword3)\b", "<TOX>"),
]

COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in SCRUB_RULES]

# one combined scan to skip clean documents (the common case) before the
# per-rule substitution passes; replacements insert tokens like <EMAIL>
# that no rule re-matches, so "no initial match -> unchanged" is exact
_ANY_PII = re.compile("|".join(f"(?:{pat})" for _, pat, _ in SCRUB_RULES))


def scrub_text_py(text: str | None) -> str | None:
    """Single-document scrub — the oracle path (tests/golden) and the
    per-batch kernel share this exact function."""
    if text is None:
        return None
    if _ANY_PII.search(text) is None:
        return text
    for _, rx, repl in COMPILED:
        text = rx.sub(repl, text)
    return text


def scrub_series(s: pd.Series) -> pd.Series:
    """Vectorized batch kernel: one combined contains() scan, then the
    rule passes only over the matching subset — same ``re`` engine and
    rule order as the oracle, byte-identical output."""
    mask = s.str.contains(_ANY_PII, regex=True, na=False)
    if not mask.any():
        return s
    out = s.copy()
    hit = s[mask]
    for _, rx, repl in COMPILED:
        hit = hit.str.replace(rx, repl, regex=True)
    out[mask] = hit
    return out


@F.pandas_udf(T.StringType())
def scrub_udf(s: pd.Series) -> pd.Series:
    return scrub_series(s)


def scrubbed_col(text: Column) -> Column:
    return scrub_udf(text)


def pii_hit_pred(text: Column) -> Column:
    """Per-document 'contains PII' gate as a JVM-side predicate (cheap
    pre-filter; the actual rewrite stays in Python for byte parity).
    Restricted to the email rule, whose pattern means the same thing in
    Java regex and RE2."""
    return text.rlike(SCRUB_RULES[0][1])
