"""Encoding repair: fix UTF-8 text that was mis-decoded as cp1252 /
latin-1 somewhere upstream ("mojibake" — â€™ for ', Ã© for é, Â£ for £).

Crawled web text is full of this: a page is UTF-8 on the wire, but a
proxy/CMS/feed stage decoded it with the wrong charset and re-emitted
the damage as characters.  The repair (the core move of the public
`ftfy` library, reimplemented from the codec definitions — no third
party code) is the inverse trip: map each char back to the cp1252 byte
it came from (latin-1 passthrough for cp1252's five undefined bytes —
"sloppy windows-1252"), then strictly decode those bytes as UTF-8.

Acceptance is evidence-based, not heuristic: the repair is applied ONLY
when (a) every char in the string maps back to a single byte and (b) the
byte string is valid UTF-8 containing at least one multibyte sequence
(pure-ASCII round-trips are identity and left alone).  A random legit
cp1252 text is overwhelmingly unlikely to satisfy (b) — a lead-byte
char must be followed by exactly the right continuation chars — so
clean text passes through byte-identically.  Whole-string repair only:
a string mixing mojibake with genuine non-cp1252 chars (e.g. CJK) is
left unchanged, since it cannot have come from one mis-decode.
Double-encoded text (two wrong trips) is fixed by iterating to a fixed
point (capped passes).

Ordering contract: repair must run BEFORE ``normalize.normalize_text``
— the C1 control chars cp1252's holes map through (0x81, 0x8D, 0x8F,
0x90, 0x9D) are *evidence* the repair needs, and the normalize pass
strips them.

Spark shape: one vectorized pandas UDF; a compiled-regex prefilter
(`.str.contains`) skips the per-char Python loop for the pure-ASCII
bulk of a web corpus, so the hot path cost is one vectorized regex scan
per batch.  No shuffle, no driver state.

Reference parity: generalizes the reference's cleanliness checks
(checker.go's regex/type probes) to the byte-level hygiene a
100 TB crawl corpus needs before any text operator runs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# cp1252's five undefined bytes; latin-1 maps them to C1 controls.
_HOLES = (0x81, 0x8D, 0x8F, 0x90, 0x9D)

# byte -> char under "sloppy windows-1252" (cp1252 + latin-1 fallback),
# and the exact inverse char -> byte.  Both total on their domains.
_SLOPPY_FWD: dict[int, str] = {
    b: (chr(b) if b in _HOLES else bytes([b]).decode("cp1252"))
    for b in range(256)
}
_SLOPPY_REV: dict[int, int] = {ord(c): b for b, c in _SLOPPY_FWD.items()}

# Prefilter: a UTF-8 multibyte sequence's lead byte is >= 0xC2, which
# decodes under cp1252/latin-1 to a char in U+00C2..U+00FF.  A string
# with no char in that range cannot be repairable mojibake.
_LEAD = re.compile("[Â-ÿ]")


def make_mojibake(s: str, passes: int = 1) -> str:
    """Corrupt ``s`` the way the bug does (UTF-8 bytes shown as sloppy
    cp1252 chars) — the INDEPENDENT forward derivation used by tests
    and the driver oracle, never by the repair itself."""
    for _ in range(passes):
        s = "".join(_SLOPPY_FWD[b] for b in s.encode("utf-8"))
    return s


def _repair_once(s: str) -> str | None:
    bts = bytearray()
    rev = _SLOPPY_REV
    for ch in s:
        b = rev.get(ord(ch))
        if b is None:
            return None  # genuine non-cp1252 char: not a mis-decode
        bts.append(b)
    try:
        out = bytes(bts).decode("utf-8")
    except UnicodeDecodeError:
        return None
    return out if out != s else None  # pure ASCII round-trip == identity


def fix_mojibake_py(s: str | None, max_passes: int = 3) -> str | None:
    """Shared single-document kernel (distributed UDF + golden oracle —
    the features_py never-fork rule)."""
    if s is None:
        return None
    cur = s
    for _ in range(max_passes):
        if not _LEAD.search(cur):
            break
        nxt = _repair_once(cur)
        if nxt is None:
            break
        cur = nxt
    return cur


def fix_mojibake_series(s: pd.Series) -> pd.Series:
    """Vectorized batch kernel: regex prefilter, repair only the hits."""
    mask = s.str.contains(_LEAD, regex=True, na=False)
    if not mask.any():
        return s
    out = s.copy()
    out[mask] = s[mask].map(fix_mojibake_py)
    return out


@F.pandas_udf(T.StringType())
def fix_mojibake_udf(s: pd.Series) -> pd.Series:
    return fix_mojibake_series(s)


def fix_mojibake_col(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return fix_mojibake_udf(t)


def fix_encoding(df: DataFrame, text_col: str = "text",
                 out_col: str | None = None,
                 flag_col: str | None = None) -> DataFrame:
    """Repair ``text_col`` in place (or into ``out_col``); optional
    ``flag_col`` marks the rows that changed (pure Catalyst compare —
    the UDF runs once, Catalyst CSEs the single call)."""
    fixed = fix_mojibake_col(text_col)
    if not flag_col:
        return df.withColumn(out_col or text_col, fixed)
    # compare against the original column by pre-staging it
    return (
        df.withColumn("__fixed", fixed)
        .withColumn(flag_col,
                    ~F.col("__fixed").eqNullSafe(F.col(text_col)))
        .withColumn(out_col or text_col, F.col("__fixed"))
        .drop("__fixed")
    )
