"""Main-content extraction: shallow-text-features block classification.

``htmlextract.extract_text`` keeps EVERYTHING textual on the page —
navigation, cookie banners, footers, "related stories" boxes — which is
the right contract for byte-stable round trips but the wrong corpus for
training: on a typical news page, less than half the extracted bytes
are the article.  The public state of the art for dependency-free
main-content extraction is shallow per-block text features (Kohlschütter
et al., WSDM 2010 "Boilerplate Detection Using Shallow Text Features";
Pomikálek 2011, jusText): split the page into blocks at block-level tag
boundaries, score each block by word count and link density, then let
context rescue short blocks that sit inside the article flow.

Block features (context-free phase):

  * ``link_density`` — fraction of the block's characters inside
    ``<a>`` elements (entity-decoded, pre-strip, internal whitespace
    included); above ``max_link_density`` the block is BAD regardless
    of length — link soup is navigation whatever its word count.
  * ``n_words`` (shared ``wordhash.unicode_tokens`` family, so CJK
    blocks count per codepoint instead of as one giant token):
    ``>= long_words`` -> GOOD, ``>= short_words`` -> SHORT (undecided),
    else BAD.
  * heading blocks (``h1..h6`` open tag, link density in bounds) are
    HEADING (undecided) whatever their word count — headings are short
    by nature.

Context phase (the jusText move, simplified to be order-deterministic):
SHORT becomes GOOD iff the nearest context-free GOOD/BAD verdict on
EITHER side is GOOD (a teaser sentence inside the article flow stays; a
stray tagline between nav and footer goes).  HEADING becomes GOOD iff
the nearest following GOOD/BAD verdict is GOOD (a heading belongs to
the section it opens; a footer-adjacent heading is furniture).  The
main text is the GOOD blocks joined with newlines, in page order.

Scale shape: one Arrow kernel (``pandas_udf`` binary -> string), no
shuffle, composes into the page scan exactly like ``extract_text`` —
the 100 TB cost is the scan itself.  ``block_verdicts`` exposes the
per-block evidence as an exploded frame (the attribute-store pattern)
for audits without re-running classification logic anywhere else.

Reference scope note: the reference (josephmachado/data_quality_checker)
validates pre-extracted text; this extends the §2.5 raw-crawl surface.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from dqc_spark.htmlextract import _COMMENT, _SCRIPT_STYLE
from dqc_spark.wordhash import unicode_tokens

__all__ = [
    "classify_blocks_py",
    "main_content_py",
    "main_content_col",
    "extract_main_content",
    "block_verdicts",
]

_TAG = re.compile(r"<[^>]+>")
# the lookahead pins the name to a real delimiter: custom elements are
# REQUIRED to contain a hyphen (<a-card>, <p-foo>), and without it the
# leading run would parse as 'a'/'p' — an <a-card>-wrapped article
# would count as 100% linked and be deleted (review finding, r4)
_TAG_NAME = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)(?=[\s/>])")
# the block-boundary set htmlextract turns into newlines, minus the
# purely-void/inline-ish ``br`` (a <br> inside a paragraph is a soft
# wrap, not a content boundary — jusText splits on structural tags)
_BLOCK_TAGS = frozenset(
    "html body p div h1 h2 h3 h4 h5 h6 li ul ol table tr td th "
    "blockquote pre section article header footer".split()
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

BAD, GOOD, SHORT, HEADING = "bad", "good", "short", "heading"


def _parse_blocks(s: str) -> list[tuple[str, str, int, int]]:
    """(opening_tag, text, linked_chars, total_chars) per non-empty
    block.  ``opening_tag`` is the last block-boundary tag seen before
    the block's text ('' when the block follows a closing boundary).

    Anchor state is BOOLEAN, per the HTML5 recovery rule: opening an
    ``<a>`` while one is open implies ``</a>`` first (nested anchors
    cannot exist in a DOM), and a stray ``</a>`` is ignored.  Depth
    counting here would let one unclosed ``<a>`` — the most common
    crawl-HTML breakage — mark the whole rest of the page as linked
    and delete the article.  An anchor legitimately spanning block
    boundaries (HTML5 card links: ``<a><div>…</div></a>``) keeps its
    state across the flush, matching the DOM."""
    s = _COMMENT.sub("", s)
    s = _SCRIPT_STYLE.sub("", s)
    blocks: list[tuple[str, str, int, int]] = []
    pieces: list[str] = []
    linked = total = 0
    cur_tag = ""
    anchor = 0
    pos = 0

    def _flush():
        nonlocal pieces, linked, total
        text = "".join(pieces).strip()
        if text:
            blocks.append((cur_tag, text, linked, total))
        pieces, linked, total = [], 0, 0

    for m in _TAG.finditer(s):
        if m.start() > pos:
            piece = _html.unescape(s[pos : m.start()])
            pieces.append(piece)
            total += len(piece)
            if anchor > 0:
                linked += len(piece)
        pos = m.end()
        nm = _TAG_NAME.match(m.group(0))
        if nm is None:
            continue
        name = nm.group(1).lower()
        closing = m.group(0).startswith("</")
        if name == "a":
            if closing:
                anchor = 0
            elif not m.group(0).endswith("/>"):
                anchor = 1
        elif name in _BLOCK_TAGS:
            _flush()
            cur_tag = "" if closing else name
    if pos < len(s):
        piece = _html.unescape(s[pos:])
        pieces.append(piece)
        total += len(piece)
        if anchor > 0:
            linked += len(piece)
    _flush()
    return blocks


def classify_blocks_py(
    html_bytes: bytes | str | None,
    max_link_density: float = 0.25,
    long_words: int = 20,
    short_words: int = 4,
) -> list[dict]:
    """Per-block evidence + verdict for one document.  This function IS
    the classifier — the Spark kernel, the exploded audit frame and
    every test consume it (never-fork rule, same as features_py)."""
    if html_bytes is None:
        return []
    s = (html_bytes.decode("utf-8", errors="replace")
         if isinstance(html_bytes, bytes) else html_bytes)
    rows = []
    for i, (tag, text, linked, total) in enumerate(_parse_blocks(s)):
        ld = linked / total if total else 0.0
        n_words = len(unicode_tokens(text))
        if ld > max_link_density:
            label = BAD
        elif tag in _HEADING_TAGS:
            label = HEADING
        elif n_words >= long_words:
            label = GOOD
        elif n_words >= short_words:
            label = SHORT
        else:
            label = BAD
        rows.append({
            "block_no": i, "tag": tag, "text": text, "n_words": n_words,
            "link_density": ld, "label": label,
        })
    # context phase over the context-free GOOD/BAD skeleton
    n = len(rows)
    prev_gb: list[str | None] = [None] * n
    last = None
    for i in range(n):
        prev_gb[i] = last
        if rows[i]["label"] in (GOOD, BAD):
            last = rows[i]["label"]
    next_gb: list[str | None] = [None] * n
    last = None
    for i in range(n - 1, -1, -1):
        next_gb[i] = last
        if rows[i]["label"] in (GOOD, BAD):
            last = rows[i]["label"]
    for i, r in enumerate(rows):
        if r["label"] == GOOD:
            r["keep"] = True
        elif r["label"] == SHORT:
            r["keep"] = prev_gb[i] == GOOD or next_gb[i] == GOOD
        elif r["label"] == HEADING:
            r["keep"] = next_gb[i] == GOOD
        else:
            r["keep"] = False
    return rows


def main_content_py(
    html_bytes: bytes | str | None,
    max_link_density: float = 0.25,
    long_words: int = 20,
    short_words: int = 4,
) -> str | None:
    """One document's html -> its main content ('' if nothing
    qualifies; None stays None)."""
    if html_bytes is None:
        return None
    return "\n".join(
        r["text"]
        for r in classify_blocks_py(
            html_bytes, max_link_density, long_words, short_words)
        if r["keep"]
    )


def main_content_col(
    html: Column | str,
    max_link_density: float = 0.25,
    long_words: int = 20,
    short_words: int = 4,
) -> Column:
    """Main content as a Column (one Arrow kernel, no shuffle)."""
    h = F.col(html) if isinstance(html, str) else html

    @pandas_udf(T.StringType())
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(
                lambda b: main_content_py(
                    b, max_link_density, long_words, short_words),
                na_action="ignore",
            )

    return _udf(h).alias("main_text")


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    max_link_density: float = 0.25,
    long_words: int = 20,
    short_words: int = 4,
) -> DataFrame:
    """Add ``out_col`` with each page's main content."""
    return df.withColumn(
        out_col,
        main_content_col(html_col, max_link_density, long_words,
                         short_words),
    )


_VERDICT_SCHEMA = (
    "key string, block_no int, tag string, text string, n_words int, "
    "link_density double, label string, keep boolean"
)


def block_verdicts(
    df: DataFrame,
    key_col: str,
    html_col: str = "html",
    max_link_density: float = 0.25,
    long_words: int = 20,
    short_words: int = 4,
) -> DataFrame:
    """Exploded per-block evidence frame — audit WHAT the classifier
    kept/dropped and why, without a second classification code path."""
    src = df.select(
        F.col(key_col).cast("string").alias("key"), F.col(html_col)
    )

    def gen(it):
        for pdf in it:
            out = []
            for key, blob in zip(pdf["key"], pdf[html_col]):
                for r in classify_blocks_py(
                    blob, max_link_density, long_words, short_words
                ):
                    out.append({"key": key, **r})
            yield pd.DataFrame(
                out,
                columns=["key", "block_no", "tag", "text", "n_words",
                         "link_density", "label", "keep"],
            )

    return src.mapInPandas(gen, _VERDICT_SCHEMA).withColumnRenamed(
        "key", key_col
    )
