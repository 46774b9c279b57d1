"""Text canonicalization: unicode NFC + control-char strip + whitespace
collapse.

Web text arrives in mixed normal forms (decomposed accents from some
crawlers, composed from others) — exact/near dedup, fingerprints, and
byte-parity contracts all silently break unless every document is
canonicalized FIRST.  This is the front gate of the curation pipeline.

Implementation: ``pandas.Series.str.normalize`` is a vectorized libc/ICU
call inside the Arrow batch (no per-row Python); the whitespace /
control-char passes are vectorized ``.str.replace`` with compiled
patterns.  Spark has no built-in NFC expression, so this is one of the
legitimate pandas-UDF cases (same reasoning as scrub.py's byte parity).

Oracle: DuckDB ``nfc_normalize`` + regexp_replace reproduce the exact
semantics, so the op is SQL-differential-testable cross-engine.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# C0/C1 control chars except \t \n \r (kept: they're whitespace-collapsed
# next); DEL included.  Python and DuckDB agree on these classes.
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
# NBSP folded in: web text is full of &nbsp;.  The trailing trim is
# ASCII-space ONLY (strip(" ")) — Python str.strip() would also eat
# exotic unicode spaces, which DuckDB's trim() does not, and the op must
# mean the same thing in both engines.
_WS = re.compile(r"[ \t\r\n\xa0]+")


def normalize_text_py(text: str | None) -> str | None:
    """Single-document oracle path: strip controls, THEN NFC, collapse
    whitespace runs to one space, trim.  Control-strip must precede NFC:
    a control char between a base char and its combining mark blocks
    composition, so NFC-first left decomposed (non-NFC, non-idempotent)
    output once the control was removed — caught by the round-2 review
    and pinned by test_normalize_idempotent_and_nfc."""
    if text is None:
        return None
    t = _CTRL.sub("", text)
    t = unicodedata.normalize("NFC", t)
    return _WS.sub(" ", t).strip(" ")


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized batch kernel — same passes, same ORDER as the oracle
    (controls stripped before NFC; see normalize_text_py)."""
    out = s.str.replace(_CTRL, "", regex=True)
    out = out.str.normalize("NFC")
    return out.str.replace(_WS, " ", regex=True).str.strip(" ")


@F.pandas_udf(T.StringType())
def normalize_udf(s: pd.Series) -> pd.Series:
    return normalize_series(s)


def normalized_col(text: Column) -> Column:
    return normalize_udf(text)
