"""robots.txt compliance gate (RFC 9309, the Robots Exclusion Protocol).

A production crawl corpus must honor per-host robots rules at curation
time too — pages crawled before a host tightened its robots.txt, or
fetched by a permissive collector, have to be droppable by policy
without re-crawling.  The reference's enum/regex checks validate cell
values; this is the same declarative keep/drop idea applied to the
(host, path) pair against the host's published policy.

Semantics implemented from RFC 9309 + the published Google REP test
cases (no third-party code):

  * group selection: the group whose ``User-agent`` token is the
    LONGEST case-insensitive substring match of our UA wins; groups
    only fall back to the ``*`` group when no named group matches.
    Consecutive ``User-agent`` lines share one group.
  * rules: ``Allow`` / ``Disallow`` path patterns with ``*`` (any
    chars) and a trailing ``$`` (end anchor); empty patterns are
    no-ops; matching is case-sensitive and runs against the URL's
    path-plus-query.
  * precedence: the longest matching pattern wins; on a tie, Allow
    wins.  No matching rule (or no robots row for the host) = allowed.

Spark shape: robots.txt texts live in a (host, robots_txt) table — one
row per host, millions of hosts at crawl scale but each tiny.  Rules
are parsed ONCE per host by an Arrow kernel into flat
(patterns, allows) arrays; pages join to that narrow frame on host
(AQE broadcasts it when small, plain shuffle-on-host otherwise — the
same key politeness partitioning already uses), and one vectorized
kernel evaluates longest-match per page with compiled-matcher
memoization keyed by the host's rule signature (hosts repeat within a
partition, so compilation is ~once per host, not per page).  Document
text never moves: the join carries url + two small arrays.

Reference parity: generalizes checker.go's declarative
predicate-per-row checks to policy-per-host keep/drop over the corpus.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.urlops import domain_of

# ---------------------------------------------------------------------------
# shared python kernels (single source of truth for Spark + tests)
# ---------------------------------------------------------------------------


def parse_robots_py(text: str | None,
                    user_agent: str = "*") -> list[tuple[bool, str]]:
    """robots.txt text -> [(allow, pattern), ...] for ``user_agent``.

    Group selection per RFC 9309 §2.2.1: most-specific (longest) UA
    token that is a case-insensitive substring of ours; ``*`` only as
    fallback.  Empty patterns dropped (an empty Disallow allows all).
    """
    if not text:
        return []
    ua = user_agent.lower()
    # group collection: list of (ua_tokens, rules)
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_ua_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_ua_run:
                if cur_uas:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], []
                in_ua_run = True
            cur_uas.append(value.lower())
        elif field in ("allow", "disallow"):
            in_ua_run = False
            if cur_uas and value:
                cur_rules.append((field == "allow", value))
        else:
            # sitemap / crawl-delay / unknown fields end a UA run but
            # belong to no rule set we evaluate
            in_ua_run = False
    if cur_uas:
        groups.append((cur_uas, cur_rules))

    # groups sharing a UA token are combined (RFC 9309 §2.2.1)
    merged: dict[str, list[tuple[bool, str]]] = {}
    for uas, rules in groups:
        for tok in uas:
            merged.setdefault(tok, []).extend(rules)
    best_tok, best_len = None, -1
    for tok in merged:
        if tok and tok != "*" and tok in ua and len(tok) > best_len:
            best_tok, best_len = tok, len(tok)
    if best_tok is not None:
        return merged[best_tok]
    return merged.get("*", [])


def _pattern_to_re(p: str) -> re.Pattern:
    anchored = p.endswith("$")
    if anchored:
        p = p[:-1]
    body = ".*".join(re.escape(seg) for seg in p.split("*"))
    return re.compile("^" + body + ("$" if anchored else ""))


def robots_allowed_py(path: str,
                      rules: list[tuple[bool, str]],
                      _compiled: list[re.Pattern] | None = None) -> bool:
    """Longest-match verdict for one path; tie -> Allow (RFC 9309 §2.2.2)."""
    best_len, best_allow = -1, True
    for i, (allow, pat) in enumerate(rules):
        rx = _compiled[i] if _compiled is not None else _pattern_to_re(pat)
        if rx.match(path):
            n = len(pat)
            if n > best_len or (n == best_len and allow and not best_allow):
                best_len, best_allow = n, allow
    return best_allow


_PATH = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)")


def url_path_py(url: str | None) -> str | None:
    """Path-plus-query of a URL ('/' when absent); None-in/None-out.
    Mirrors urlops' authority grammar so host and path agree.  A URL
    with a query but no path (``http://x.com?q=1``) normalizes to
    ``/?q=1`` — RFC 9309/WHATWG treat the empty path as ``/``, and
    without the leading slash every Allow/Disallow pattern (all
    ``/``-anchored) would silently fail to match, letting a
    fully-disallowed host's page through the compliance gate."""
    if url is None:
        return None
    m = _PATH.match(url)
    if not m:
        return None
    p = m.group(1)
    if not p:
        return "/"
    return p if p.startswith("/") else "/" + p


# ---------------------------------------------------------------------------
# distributed form
# ---------------------------------------------------------------------------

_RULES_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("allows", T.ArrayType(T.BooleanType())),
    T.StructField("patterns", T.ArrayType(T.StringType())),
])


def robots_rules(robots: DataFrame, user_agent: str = "*",
                 host_col: str = "host",
                 text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> (host, allows, patterns): parse each
    host's policy ONCE for the given user agent.  Pure map — parsing
    never re-runs per page."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            allows, patterns = [], []
            for txt in pdf[text_col]:
                rules = parse_robots_py(txt, user_agent)
                allows.append([a for a, _ in rules])
                patterns.append([p for _, p in rules])
            yield pd.DataFrame({
                "host": pdf[host_col].str.lower(),
                "allows": allows,
                "patterns": patterns,
            })

    return robots.select(host_col, text_col).mapInPandas(
        kernel, schema=_RULES_SCHEMA)


@F.pandas_udf(T.BooleanType())
def _allowed_udf(path: pd.Series, allows: pd.Series,
                 patterns: pd.Series) -> pd.Series:
    # memoize compiled matchers per rule signature — hosts repeat
    cache: dict[tuple, list[re.Pattern]] = {}
    out = []
    for p, al, pats in zip(path, allows, patterns):
        if pats is None or len(pats) == 0 or p is None:
            out.append(True)
            continue
        key = tuple(pats)
        compiled = cache.get(key)
        rules = list(zip(al, pats))
        if compiled is None:
            compiled = [_pattern_to_re(pat) for pat in pats]
            cache[key] = compiled
        out.append(robots_allowed_py(p, rules, compiled))
    return pd.Series(out, dtype="boolean")


def url_path_col(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    # path-plus-query: everything after the authority, fragment cut.
    # regexp_extract returns '' BOTH for a no-match (unparseable URL)
    # and for a matched-but-empty path — the rlike guard separates
    # them so the Column twin agrees with url_path_py: unparseable ->
    # NULL, parseable-no-path -> '/', and a query-only tail gets its
    # leading '/' restored (see url_path_py)
    p = F.regexp_extract(u, _PATH.pattern, 1)
    return F.when(u.isNull() | ~u.rlike(_PATH.pattern), F.lit(None)) \
        .otherwise(F.when(p == "", F.lit("/"))
                   .otherwise(F.when(p.startswith("/"), p)
                              .otherwise(F.concat(F.lit("/"), p))))


def robots_gate(pages: DataFrame, robots: DataFrame,
                user_agent: str = "*", url_col: str = "url",
                host_col: str = "host", text_col: str = "robots_txt",
                flag_col: str | None = None) -> DataFrame:
    """Drop pages their host's robots.txt disallows for ``user_agent``
    (or flag them in ``flag_col`` instead when given).  Hosts with no
    robots row are allowed — absence of policy is not a ban."""
    # rule columns join under '__'-prefixed names like '__host' does —
    # bare 'allows'/'patterns' would collide with (raise AMBIGUOUS, or
    # worse, drop) same-named caller columns on pages
    rules = (robots_rules(robots, user_agent, host_col, text_col)
             .withColumnRenamed("host", "__host")
             .withColumnRenamed("allows", "__allows")
             .withColumnRenamed("patterns", "__patterns"))
    joined = (
        pages.withColumn("__host", domain_of(F.col(url_col)))
        .join(rules, "__host", "left")
    )
    verdict = _allowed_udf(url_path_col(url_col),
                           F.col("__allows"), F.col("__patterns"))
    out = joined.withColumn("__allowed", verdict)
    if flag_col:
        return (out.withColumn(flag_col, F.col("__allowed"))
                .drop("__host", "__allows", "__patterns", "__allowed"))
    return (out.filter(F.col("__allowed"))
            .drop("__host", "__allows", "__patterns", "__allowed"))
