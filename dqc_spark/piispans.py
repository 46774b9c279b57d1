"""Span-level PII/toxicity attributes: tag offsets once, re-redact many.

The doc-level attribute store (attributes.py) answers "does this page
contain PII"; production curation (Dolma's attribute files carry
character spans for exactly this reason) also needs WHERE — so a policy
change (redact emails but keep IPs; count PII density per domain; audit
what was removed) replays from a narrow span table instead of re-running
the regex pass over 100 TB of text.

Exactness contract: ``scrub_text_py`` applies SCRUB_RULES sequentially
(rule k+1 sees rule k's rewritten string), so naive simultaneous
matching on the original text diverges on overlap cases (an SSN region
the phone rule would also claim).  ``pii_spans_py`` therefore SIMULATES
the sequential process over a piece table that keeps original
coordinates: after each substitution the string is a sequence of
original slices and literal replacement tokens, and every later match
provably lies inside one original slice — replacement tokens contain
``<``/``>``, which no rule's character classes admit, and ``\\b`` cannot
fire inside a token's letter run, so a match can neither cross nor
enter one (asserted at runtime, not assumed).  Applying the recorded
spans right-to-left to the ORIGINAL text therefore reproduces
``scrub_text_py`` byte-for-byte — pinned by tests over the golden
corpus, the same parity bar the scrub kernel itself meets.

Scale shape: ``pii_spans`` is one Arrow kernel over the corpus scan (no
shuffle; text never leaves the scan — only (key, rule, start, end,
replacement) rows come out, ~tens of bytes per hit).  ``redact_spans``
groups the span table per key (partial-aggregatable collect_list) and
joins it to the corpus — one narrow shuffle of spans, broadcast when
the hit set is small; pages without spans pass through untouched via
the left join, costing zero Python (the kernel sees only joined rows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.scrub import _ANY_PII, _PRESCAN, COMPILED

__all__ = ["pii_spans_py", "apply_spans_py", "pii_spans", "redact_spans"]


def pii_spans_py(text: str | None) -> list[tuple[str, int, int, str]]:
    """(rule, start, end, replacement) spans in ORIGINAL-text
    coordinates, sorted by start, non-overlapping.  Applying them
    right-to-left reproduces ``scrub_text_py(text)`` byte-identically.
    Checksum-gated rules (credit_card, iban) record a span only when
    validation rewrote the match, same as the scrub path."""
    if text is None:
        return []
    if _PRESCAN.search(text) is None or _ANY_PII.search(text) is None:
        return []
    # piece table for the CURRENT string: ('orig', orig_start, orig_end)
    # slices of the original text interleaved with ('tok', token) —
    # concatenating the pieces always equals the current string
    pieces: list[tuple] = [("orig", 0, len(text))]
    cur = text
    spans: list[tuple[str, int, int, str]] = []
    for name, rx, repl in COMPILED:
        matches = []
        for m in rx.finditer(cur):
            if m.start() == m.end():
                continue
            rtxt = repl(m) if callable(repl) else repl
            if rtxt == m.group(0):
                continue  # checksum miss — scrub leaves it untouched
            matches.append((m.start(), m.end(), rtxt))
        if not matches:
            continue
        new_pieces: list[tuple] = []
        new_cur: list[str] = []
        ppos = 0  # current-string offset where pieces[pi] starts
        pi = 0
        for s, e, rtxt in matches:
            # emit pieces (split as needed) up to the match start
            while pi < len(pieces):
                p = pieces[pi]
                plen = (p[2] - p[1]) if p[0] == "orig" else len(p[1])
                if ppos + plen <= s:
                    new_pieces.append(p)
                    new_cur.append(
                        text[p[1]:p[2]] if p[0] == "orig" else p[1])
                    ppos += plen
                    pi += 1
                    continue
                break
            p = pieces[pi]
            if p[0] != "orig":
                raise AssertionError(
                    f"scrub rule {name!r} matched inside a replacement "
                    "token — the token-opacity invariant is broken")
            plen = p[2] - p[1]
            if ppos + plen < e:
                raise AssertionError(
                    f"scrub rule {name!r} matched across a replacement "
                    "token — the token-opacity invariant is broken")
            head = s - ppos  # offset of match inside this orig piece
            orig_s = p[1] + head
            orig_e = p[1] + (e - ppos)
            if head:
                new_pieces.append(("orig", p[1], orig_s))
                new_cur.append(text[p[1]:orig_s])
            spans.append((name, orig_s, orig_e, rtxt))
            new_pieces.append(("tok", rtxt))
            new_cur.append(rtxt)
            # shrink the piece to its tail and stay on it
            pieces[pi] = ("orig", orig_e, p[2])
            ppos = e
            if orig_e == p[2]:  # match consumed the piece's tail
                pi += 1
                # ppos already advanced past the match
        for j in range(pi, len(pieces)):
            p = pieces[j]
            new_pieces.append(p)
            new_cur.append(text[p[1]:p[2]] if p[0] == "orig" else p[1])
        pieces = new_pieces
        cur = "".join(new_cur)
    spans.sort(key=lambda t: t[1])
    return spans


def apply_spans_py(
    text: str | None,
    spans: list[tuple[str, int, int, str]],
    rules: set | None = None,
) -> str | None:
    """Replay stored spans onto the ORIGINAL text (right-to-left so
    earlier offsets stay valid).  ``rules`` restricts the replay to a
    subset — the policy-iteration entry point (e.g. redact emails but
    keep IPs) that needs no re-scan."""
    if text is None or not spans:
        return text
    out = text
    for name, s, e, rtxt in sorted(spans, key=lambda t: t[1], reverse=True):
        if rules is not None and name not in rules:
            continue
        if not (0 <= s < e <= len(text)):
            # a span past the text's end means the stored table was
            # built from DIFFERENT text for this key (stale table, or a
            # corpus rewritten between tag and replay) — python slicing
            # would silently clamp and emit shifted garbage
            raise ValueError(
                f"span ({name!r}, {s}, {e}) exceeds text of length "
                f"{len(text)}: the span table does not match this "
                "corpus — re-run pii_spans on the current text")
        out = out[:s] + rtxt + out[e:]
    return out


_SPAN_FIELDS = [
    T.StructField("rule", T.StringType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("replacement", T.StringType()),
]


def pii_spans(
    df: DataFrame, key_col: str = "url", text_col: str = "text",
) -> DataFrame:
    """The corpus's span table: (key, rule, start, end, replacement),
    one row per PII/toxicity hit, offsets into the original text.

    One Arrow kernel over the scan — text never shuffles; clean
    documents (the common case, prescan-rejected) emit nothing.
    """
    out_schema = T.StructType([df.schema[key_col]] + _SPAN_FIELDS)

    def kernel(batches):
        for pdf in batches:
            keys, rules, ss, es, reps = [], [], [], [], []
            for k, txt in zip(pdf[key_col], pdf[text_col]):
                for name, s, e, rtxt in pii_spans_py(txt):
                    keys.append(k)
                    rules.append(name)
                    ss.append(s)
                    es.append(e)
                    reps.append(rtxt)
            yield pd.DataFrame({
                key_col: pd.Series(keys, dtype=pdf[key_col].dtype),
                "rule": rules, "start": pd.Series(ss, dtype="int32"),
                "end": pd.Series(es, dtype="int32"),
                "replacement": reps,
            })

    return df.select(key_col, text_col).mapInPandas(kernel, out_schema)


def redact_spans(
    pages: DataFrame,
    spans: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
    rules: list | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Apply a STORED span table to the corpus — the re-redact pass.

    ``rules`` restricts the replay (policy iteration without a regex
    re-scan); with the full set the output column is byte-identical to
    ``scrubbed_col`` over the same text.  Pages with no spans keep
    their text untouched (left join; NULL span lists short-circuit in
    the kernel).  Keys must identify documents uniquely — run url
    dedup first, same contract as the attribute store.
    """
    rule_set = set(rules) if rules is not None else None
    out_col = out_col or ("scrubbed_" + text_col)
    sp = spans
    if rule_set is not None:
        # empty set = replay nothing (isin() with no args would raise)
        sp = sp.filter(
            F.col("rule").isin(*sorted(rule_set)) if rule_set
            else F.lit(False))
    per_key = sp.groupBy(key_col).agg(
        F.collect_list(
            F.struct("rule", "start", "end", "replacement")
        ).alias("__spans"))
    joined = pages.join(per_key, on=key_col, how="left")

    @F.pandas_udf(T.StringType())
    def apply_udf(text: pd.Series, spans_s: pd.Series) -> pd.Series:
        out = []
        for txt, sps in zip(text, spans_s):
            if sps is None or len(sps) == 0 or txt is None:
                out.append(txt)
                continue
            out.append(apply_spans_py(
                txt, [(d["rule"], d["start"], d["end"], d["replacement"])
                      for d in sps]))
        return pd.Series(out, dtype=object)

    return (joined
            .withColumn(out_col, apply_udf(F.col(text_col), F.col("__spans")))
            .drop("__spans"))
