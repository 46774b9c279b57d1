"""Shared ASCII tokenizer + md5 word-hash identity.

Three kernels (decontam grams, substring-dedup shingles, hashed-TF-IDF
buckets) and two DuckDB differential oracles depend on EXACTLY this
tokenization and word identity; a drifting per-module copy would
silently break an oracle, so they all import from here.

* ``WS_ASCII`` — python ``\\s`` is unicode-wide by default; ``re.ASCII``
  pins it to the same byte class the JVM/RE2 ``\\s+`` splits on (the
  engines differ only on the vertical tab, absent from the corpora).
* ``md5_word`` — (h1, h2, sign): the digest's two little-endian 8-byte
  words plus a sign bit, cached per word.  Engine-portable and
  process-stable (never python ``hash``); 128 bits of material so
  callers can take one lane (feature hashing) or both (shingle lanes).
"""

from __future__ import annotations

import hashlib
import re

__all__ = ["WS_ASCII", "ascii_tokens", "md5_word"]

WS_ASCII = re.compile(r"\s+", re.ASCII)


def ascii_tokens(text: str | None) -> list[str]:
    """Whitespace tokens of ``text`` (ASCII \\s, empties dropped)."""
    return [t for t in WS_ASCII.split(text or "") if t]


def md5_word(word: str, cache: dict) -> tuple[int, int, float]:
    """(h1, h2, sign) for one word, memoized in ``cache``."""
    v = cache.get(word)
    if v is None:
        d = hashlib.md5(word.encode("utf-8")).digest()
        v = (
            int.from_bytes(d[0:8], "little"),
            int.from_bytes(d[8:16], "little"),
            1.0 if d[8] & 1 else -1.0,
        )
        cache[word] = v
    return v
