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

def _luhn_valid(digits: str) -> bool:
    """Luhn mod-10 checksum over a digit string (ISO/IEC 7812)."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def _cc_repl(m: "re.Match") -> str:
    """Replace a 16-digit candidate only when its Luhn checksum holds —
    order numbers / tracking ids that merely LOOK like PANs survive."""
    return ("<CC>" if _luhn_valid(re.sub(r"[ -]", "", m.group(0)))
            else m.group(0))


def _iban_valid(s: str) -> bool:
    """ISO 13616 mod-97 check: move the first 4 chars to the end, map
    letters to 10..35, the number must be ≡ 1 (mod 97)."""
    s = s.replace(" ", "").upper()
    if not 15 <= len(s) <= 34:
        return False
    r = s[4:] + s[:4]
    return int("".join(str(int(c, 36)) for c in r)) % 97 == 1


def _iban_repl(m: "re.Match") -> str:
    return "<IBAN>" if _iban_valid(m.group(0)) else m.group(0)


# (name, pattern, replacement) — order matters and is part of the spec:
# earlier scrubs can create text later patterns must not re-match, and
# IBAN runs before the digit-group rules (its body is spaced digit
# groups a phone/CC pattern could half-eat).  Replacements may be
# callables (match -> str): the checksum rules validate before
# rewriting, so a random digit run that merely pattern-matches a PAN
# or IBAN is left untouched.  Both ``re.sub`` and pandas
# ``str.replace`` accept the same callable, so byte parity between the
# kernel and the single-process oracle is preserved by construction.
SCRUB_RULES: list[tuple[str, str, object]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # mod-97-validated IBAN: 2 letters, 2 check digits, 11-30 alnum in
    # optional 4-groups (covers both compact and paper formats)
    ("iban",
     r"\b[A-Z]{2}[0-9]{2}(?: ?[0-9A-Z]{4}){2,7}(?: ?[0-9A-Z]{1,3})?\b",
     _iban_repl),
    # two branches because \b cannot assert before '(' (no lookbehind in
    # the RE2-compatible subset)
    ("phone", r"\b(?:\+?[0-9]{1,2}[ .-]?)?[0-9]{3}[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b|\([0-9]{3}\)[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b", "<PHONE>"),
    # IPv6 before IPv4 (an IPv4-mapped tail must not leave a dangling
    # prefix).  Scope: the full 8-group form, ::-compressed forms with
    # >= 2 groups before the '::', each also with an embedded dotted-
    # quad tail (RFC 4291 §2.2.3 — '2001:db8::192.168.0.1'), and the
    # bare '::ffff:'-mapped form; colon-separated times and MAC
    # addresses don't qualify; other single-group-or-less prefixes
    # ('fe80::1') are out of scope (documented, not silently wrong).
    # v4-tail alternatives come FIRST: python re picks the first
    # matching alternative, and the hex-only form would otherwise
    # stop before the dots and leave trailing octets in the text.
    ("ipv6",
     r"\b(?:[0-9A-Fa-f]{1,4}:){6}(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
     r"|\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
     r"|\b(?:[0-9A-Fa-f]{1,4}:){2,6}:(?:[0-9A-Fa-f]{1,4}:){0,4}"
     r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
     r"|\b(?:[0-9A-Fa-f]{1,4}:){2,6}:[0-9A-Fa-f]{1,4}"
     r"(?::[0-9A-Fa-f]{1,4}){0,4}\b"
     r"|::[fF]{4}:(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
     "<IP>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # Luhn-validated 16-digit PAN (space/dash grouped or compact)
    ("credit_card", r"\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b",
     _cc_repl),
    # toxicity placeholder list — deterministic, in-repo (real deployments
    # broadcast a curated lexicon the same way)
    ("toxicity", r"\b(?:badword1|badword2|badword3)\b", "<TOX>"),
]

COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in SCRUB_RULES]

# one combined scan to skip clean documents (the common case) before the
# per-rule substitution passes; replacements insert tokens like <EMAIL>
# that no rule re-matches, so "no initial match -> unchanged" is exact
_ANY_PII = re.compile("|".join(f"(?:{pat})" for _, pat, _ in SCRUB_RULES))

# cheap FIRST-stage prescan: the _ANY_PII alternation is a large
# backtracking NFA (~0.4 ms/doc, and it grew 64% with the checksum/IPv6
# rules), while this tiny class scan is near-memchr speed.  It is a
# CONSERVATIVE SUPERSET of every rule by construction: every pattern in
# SCRUB_RULES necessarily matches a digit (ssn/phone/ipv4/cc/iban all
# contain mandatory [0-9] atoms), an '@' (email), the literal 'badword'
# (the toxicity list), or — for the one digit-OPTIONAL rule, IPv6,
# whose hex groups can be all letters ('dead:beef::cafe') — a hex
# letter immediately followed by ':' (a digit-free IPv6 match has every
# group in [A-Fa-f]{1,4}, and each non-final group is followed by ':').
# Pinned per rule by test_scrub_prescan_covers_every_rule, which MUST
# be extended when a rule is added.  Docs failing the prescan skip
# everything; measured 9.8 s -> ~1.3 s per 20k bench docs (most of
# which contain no digits).
_PRESCAN = re.compile(r"[0-9@]|badword|[A-Fa-f]:")


def scrub_text_py(text: str | None) -> str | None:
    """Single-document scrub — the oracle path (tests/golden) and the
    per-batch kernel share this exact function."""
    if text is None:
        return None
    if _PRESCAN.search(text) is None or _ANY_PII.search(text) is None:
        return text
    for _, rx, repl in COMPILED:
        text = rx.sub(repl, text)
    return text


def scrub_series(s: pd.Series) -> pd.Series:
    """Vectorized batch kernel: cheap prescan, combined contains() scan
    on the survivors, then the rule passes only over the matching
    subset — same ``re`` engine and rule order as the oracle,
    byte-identical output (both stages are conservative supersets of
    the rules, so skipped docs are exactly the unchanged docs)."""
    pre = s.str.contains(_PRESCAN, regex=True, na=False)
    if not pre.any():
        return s
    cand = s[pre]
    mask = cand.str.contains(_ANY_PII, regex=True, na=False)
    if not mask.any():
        return s
    out = s.copy()
    hit = cand[mask]
    for _, rx, repl in COMPILED:
        hit = hit.str.replace(rx, repl, regex=True)
    out[hit.index] = hit
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
