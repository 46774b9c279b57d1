"""BM25 ranked retrieval over the corpus — the lexical search primitive.

A curation stack needs lexical search as much as vector search: dataset
debugging ("show me the docs that mention X"), targeted decontamination
sweeps, and hard-negative mining for embedding training are all BM25
queries over the same corpus the pipeline curates.  This implements
Okapi BM25 (Robertson & Zaragoza, FnTIR 2009) as a pure-Catalyst plan —
no Python in the per-document path at all.

Scale shape (the part that matters at 10^12 docs):

  * Tokenization is JVM codegen: ``regexp_replace`` + ``split`` +
    ``array_remove`` (built-ins, not HOF lambdas — see CLAUDE.md on
    interpreted HOFs), using the shared Unicode alnum family from
    ``wordhash`` (case fold, CJK codepoint isolation, not-(letter|digit)
    split) so non-Latin corpora and queries retrieve correctly.
  * The exploded token stream is filtered to the query's terms BEFORE
    any shuffle, so the only wide ops are a groupBy on
    (doc, term) rows *that matched a query term* — for a 5-term query
    that is a vanishing fraction of the corpus — and the final
    TakeOrderedAndProject top-k (per-partition heads, driver merge of
    k rows per partition; no global sort).
  * Corpus statistics (N, avgdl) are ONE tiny aggregate broadcast back
    as a literal join (the mixing.py scalar pattern); per-term document
    frequencies are a groupBy over at most |query| rows per partition
    (partial-aggregated) and re-enter via broadcast join.
  * Document length comes from the SAME codegen tokenizer without
    exploding: ``size(array_remove(split(...), ''))`` — one pass, no
    second scan of the token stream.

Scoring: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (the +1 form, so
idf stays positive even when df > N/2), and

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Docs containing no query term score 0 and are omitted (standard
retrieval semantics — the result is the posting intersection, never a
corpus scan of non-matches).

Cross-engine determinism (oracle_check): every per-(doc,term) partial
agrees to the last ULP across engines — the ln *inputs* are
bit-identical (int tf/df/dl, avgdl = int-sum / int count), but the ln
itself is not raw-bit portable (JVM Math.log vs DuckDB libm differ in
the last ULP; CLAUDE.md transcendental rule), and the final per-doc
SUM is additionally summation-order dependent.  The per-doc ROUND to
``round_to`` absorbs both before the (score desc, key) ordering — the
ann_topk pattern.

Input-consumption contract: the corpus frame is consumed TWICE (one
tiny corpus-scalar aggregate at plan-build time + the lazy posting
stream).  For a parquet source that is just a second columnar scan —
cheaper at 10^12 docs than caching a tokenized corpus — so nothing is
persisted by default.  If the input embeds a pandas-UDF stage (e.g.
BM25 over a ``curate()`` output), the caller must persist it first
(the CLAUDE.md multi-consumer rule) or pass ``cache_tokens=True``,
which persists the internal tokenized projection for the session.

Reference parity: no search surface in data_quality_checker; §2.5
training-data scope (corpus tooling under the 100 TB lens).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.wordhash import unicode_alnum_tokens

__all__ = ["bm25_score_py", "bm25_topk", "bm25_topk_batch"]


def bm25_score_py(
    docs: list[tuple],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict:
    """Single-process reference model: {key: score} for every doc with
    at least one query-term hit.  Shares the tokenizer family
    (``wordhash.unicode_alnum_tokens``) with the Spark plan; used by
    the pytest differential."""
    toks = {key: unicode_alnum_tokens(text) for key, text in docs}
    n = len(docs)
    avgdl = (sum(len(t) for t in toks.values()) / n) if n else 0.0
    terms = _expand_terms(query_terms)
    df_t = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    out: dict = {}
    for key, t in toks.items():
        score = 0.0
        dl = len(t)
        for q in terms:
            tf = t.count(q)
            if tf == 0 or df_t[q] == 0:
                continue
            idf = math.log(1.0 + (n - df_t[q] + 0.5) / (df_t[q] + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl / avgdl))
        if score > 0.0:
            out[key] = score
    return out


def _expand_terms(query_terms) -> set[str]:
    """Query terms through the SAME tokenizer family as the corpus: a
    CJK query word expands to its codepoint tokens, mixed-case and
    punctuated terms normalize to what the posting stream holds."""
    return {tok for t in query_terms for tok in unicode_alnum_tokens(t)}


def _bm25_term_partials(
    df: DataFrame,
    terms: list[str],
    key_col: str,
    text_col: str,
    k1: float,
    b: float,
    cache_tokens: bool = False,
) -> DataFrame | None:
    """The scoring core BOTH retrieval forms share: one frame of
    per-(doc, matched-term) BM25 partials (__key, __term, __s) — or
    None for an empty corpus.  Keeping this in ONE place is what makes
    the pytest-pinned batch==single score equality structural rather
    than two copies that must stay bit-identical by discipline.

    Plan shape: codegen tokenizer used twice (dl without exploding, the
    posting stream with an ``arrays_overlap`` prefilter so docs with no
    query term never explode), one tiny corpus-scalar agg re-entering
    as literals, per-term df broadcast back onto the posting frame."""
    from dqc_spark.wordhash import unicode_alnum_tokens_col

    terms = sorted(terms)
    # the shared BM25-family tokenizer, by reference — an inline copy
    # of the same expression would have to stay bit-identical to
    # bm25_score_py's python twin by discipline (the never-fork rule)
    toks = unicode_alnum_tokens_col(F.col(text_col))
    base = df.select(F.col(key_col).alias("__key"),
                     F.size(toks).alias("__dl"),
                     toks.alias("__toks"))
    if cache_tokens:
        # opt-in: the scalar agg below materializes the cache, so a
        # UDF-derived input's Python stage runs once, not twice.  Off
        # by default — for parquet sources the second scan is cheaper
        # at corpus scale than persisting a tokenized copy.
        base = base.persist()

    # corpus scalars: ONE tiny agg; re-entering as literals via collect
    # of a single row (metadata-sized, the mixing.py pattern)
    n_docs, sum_dl = base.agg(
        F.count(F.lit(1)), F.sum("__dl")).first()
    if not n_docs:
        return None
    avgdl = float(sum_dl) / float(n_docs)

    term_arr = F.array(*[F.lit(t) for t in terms])
    from dqc_spark.cache import track

    # persisted: tf feeds BOTH the dfreq aggregate and the join probe
    # side — unpersisted, the tokenize+explode+filter+groupBy pipeline
    # (a full corpus pass) would execute once per consumer.  The frame
    # is tiny (only matched (doc, term) rows for the query's terms).
    tf = track(
        base.filter(F.arrays_overlap("__toks", term_arr))
        .select("__key", "__dl", F.explode("__toks").alias("__term"))
        .filter(F.col("__term").isin(terms))
        .groupBy("__key", "__dl", "__term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(
        F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5)))
    return (
        tf.join(F.broadcast(dfreq), "__term")
        .select(
            "__key",
            "__term",
            (
                idf * F.col("__tf") * F.lit(k1 + 1.0)
                / (F.col("__tf")
                   + F.lit(k1) * (F.lit(1.0 - b)
                                  + F.lit(b) * F.col("__dl")
                                  / F.lit(avgdl)))
            ).alias("__s"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    key_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
    cache_tokens: bool = False,
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag of query terms.

    Returns (key, score) ordered (score desc, key asc); ``round_to``
    rounds the score first so summation-order noise cannot reorder
    near-ties — the default 6 makes the top-k boundary run-to-run
    deterministic (a raw float-sum score depends on Spark's partition
    order at near-ties); pass ``None`` for the raw sum.  The oracle
    differential runs with 4.
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = sorted(_expand_terms(query_terms))
    if not terms:
        raise ValueError("query terms tokenized to nothing")
    part = _bm25_term_partials(df, terms, key_col, text_col, k1, b,
                               cache_tokens=cache_tokens)
    if part is None:  # empty corpus
        return df.select(F.col(key_col),
                         F.lit(0.0).alias("score")).limit(0)
    score = F.sum("__s")
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        part.groupBy("__key")
        .agg(score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("__key"))
        .limit(int(k))
        .select(F.col("__key").alias(key_col), "score")
    )


def bm25_topk_batch(
    df: DataFrame,
    queries: dict,
    k: int = 10,
    key_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
    cache_tokens: bool = False,
) -> DataFrame:
    """Top-``k`` per query for a BATCH of queries — the shape retrieval
    actually runs at corpus scale (hard-negative mining, eval-set
    sweeps, dataset debugging dashboards fire thousands of queries, and
    one scan amortized across all of them beats one scan each).

    ``queries``: {query_id: [terms...]}.  ONE pass builds the posting
    stream for the UNION of all query terms (same arrays_overlap
    prefilter + explode-then-isin as ``bm25_topk``); per-(query, term)
    weights join in via a broadcast of the tiny query expansion; the
    per-query top-k is a row_number window partitioned BY QUERY — the
    partition holds one query's matches only (never the corpus), so no
    single-partition bottleneck exists for a bounded query batch.

    Statistics note: df(t) and avgdl are corpus-global, identical to
    the single-query form — scores for a query here equal
    ``bm25_topk`` with that query alone (pinned by pytest).

    Returns (query_id, key, score, rank) with rank 1..k per query.
    """
    if not queries:
        raise ValueError("bm25_topk_batch needs at least one query")
    # the expansion-table schema is string query ids: a non-string id
    # would silently coerce (1 -> '1'), so returned query_id values no
    # longer equal the caller's dict keys — reject instead
    bad = [q for q in queries if not isinstance(q, str)]
    if bad:
        raise ValueError(
            f"query ids must be strings (got {bad[:3]!r}): a coerced "
            "id would not round-trip back to your dict keys")
    norm_q = {qid: sorted(_expand_terms(terms))
              for qid, terms in queries.items()}
    if any(not terms for terms in norm_q.values()):
        raise ValueError("every query needs at least one term")
    all_terms = sorted(set().union(*norm_q.values()))

    core = _bm25_term_partials(df, all_terms, key_col, text_col, k1, b,
                               cache_tokens=cache_tokens)
    if core is None:  # empty corpus
        return df.select(
            F.lit("").alias("query_id"), F.col(key_col),
            F.lit(0.0).alias("score"), F.lit(0).alias("rank")).limit(0)
    # the query expansion table: one row per (query, term), broadcast;
    # df(t) and avgdl inside the shared partials are corpus-global, so
    # a query's scores here equal bm25_topk with that query alone
    spark = df.sparkSession
    qexp = spark.createDataFrame(
        [(qid, t) for qid, terms in sorted(norm_q.items())
         for t in terms],
        "query_id string, __term string")
    part = core.join(F.broadcast(qexp), "__term").select(
        "query_id", "__key", "__s")
    score = F.sum("__s")
    if round_to is not None:
        score = F.round(score, round_to)
    from pyspark.sql import Window

    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("__key")))
    return (
        part.groupBy("query_id", "__key")
        .agg(score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", F.col("__key").alias(key_col),
                "score", "rank")
    )
