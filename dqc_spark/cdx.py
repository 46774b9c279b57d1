"""CDXJ crawl-index ingestion + selective fetch planning.

Common Crawl publishes a CDXJ index next to every WARC dump: one line
per capture — ``<urlkey> <14-digit timestamp> <JSON>`` where the JSON
carries url, mime, status, digest, languages and the (filename,
offset, length) of the record inside its ``.warc.gz``.  At 100 TB the
index is the lever: filtering captures by status/mime/language on the
~0.1% -sized index and fetching ONLY the selected byte ranges is the
difference between scanning the whole crawl and reading a slice of it.

Spark shape: the index is plain text, so ``spark.read.text`` splits it
across tasks for free, and the whole parse is Catalyst expressions —
two substring_index splits + one ``from_json`` — no Python anywhere,
fully pushdown/prune-friendly, and SQL-oracle-comparable.  The fetch
plan groups selected captures by WARC filename (one fetch task per
file, offsets sorted so reads are sequential) — a plain
partial-aggregatable groupBy.

Reference parity: the reference validates flat files it is pointed at
(connector.go); this is the index-directed version of "which files do
I even open" that a crawl-scale corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the JSON payload fields CC's cdxj actually carries (subset we use)
CDXJ_JSON_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
    T.StructField("languages", T.StringType()),
])


def cdxj_line(urlkey: str, ts14: str, payload: dict) -> str:
    """Author one CDXJ line (fixtures/tests) — keys emitted in the
    stable order CC uses."""
    import json

    return f"{urlkey} {ts14} " + json.dumps(payload, sort_keys=True)


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ file(s) -> one row per capture.

    Pure Catalyst: urlkey/timestamp split off with substring_index,
    payload via from_json; malformed JSON yields NULL url and is
    dropped (a crawl index always has truncated tails).  numeric
    offset/length arrive as JSON strings in CC's format — cast here,
    once."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 3)
    parsed = lines.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.to_timestamp(F.element_at(parts, 2), "yyyyMMddHHmmss")
        .alias("capture_ts"),
        F.from_json(F.element_at(parts, 3), CDXJ_JSON_SCHEMA).alias("j"),
    )
    return parsed.filter(F.col("j.url").isNotNull()).select(
        "urlkey",
        "capture_ts",
        F.col("j.url").alias("url"),
        F.col("j.mime").alias("mime"),
        F.col("j.status").alias("status"),
        F.col("j.digest").alias("digest"),
        F.col("j.length").cast("long").alias("length"),
        F.col("j.offset").cast("long").alias("offset"),
        F.col("j.filename").alias("filename"),
        F.col("j.languages").alias("languages"),
    )


def select_captures(
    index: DataFrame,
    statuses: tuple = ("200",),
    mimes: tuple | None = ("text/html",),
    languages: tuple | None = None,
    dedup_digest: bool = True,
) -> DataFrame:
    """Index-level pruning BEFORE any payload is touched: keep the
    captures worth fetching.  ``languages`` matches CC's comma-joined
    language list per capture; ``dedup_digest`` keeps one capture per
    content digest (newest), since identical payloads appear under
    many URLs — the cheapest dedup in the whole pipeline because it
    runs on index rows, not documents."""
    out = index
    if statuses:
        out = out.filter(F.col("status").isin(list(statuses)))
    if mimes:
        out = out.filter(F.col("mime").isin(list(mimes)))
    if languages:
        lang_arr = F.split(F.coalesce(F.col("languages"), F.lit("")), ",")
        out = out.filter(
            F.arrays_overlap(lang_arr,
                             F.array(*[F.lit(x) for x in languages])))
    if dedup_digest:
        # partial-aggregatable winner election, never a window.  The
        # group key coalesces a MISSING digest to a per-capture
        # sentinel: grouping raw NULLs would elect ONE winner among all
        # digest-less captures and silently drop the rest (groupBy
        # groups NULL keys together, unlike join equality).  EVERY
        # sentinel component is null-guarded too — F.concat
        # null-propagates, so a capture missing digest AND filename
        # (or with an unparseable timestamp) would otherwise fold the
        # whole sentinel back to NULL and resurface the same silent
        # drop one level deeper.  digest itself rides in the winner
        # struct so the output column keeps the raw (possibly NULL)
        # value.
        def _sent(c: Column) -> Column:
            return F.coalesce(c.cast("string"), F.lit("\x00null"))

        gkey = F.coalesce(
            F.col("digest"),
            F.concat(F.lit("\x00nodigest:"), _sent(F.col("urlkey")),
                     F.lit("@"), _sent(F.col("capture_ts")), F.lit("@"),
                     _sent(F.col("filename")), F.lit(":"),
                     _sent(F.col("offset"))))
        winner = F.struct(
            F.col("capture_ts"), F.col("urlkey"), F.col("filename"),
            F.col("offset"), F.col("length"), F.col("url"),
            F.col("mime"), F.col("status"), F.col("languages"),
            F.col("digest"))
        out = (out.groupBy(gkey.alias("__gk"))
               .agg(F.max(winner).alias("w"))
               .select("w.digest", "w.capture_ts", "w.urlkey",
                       "w.filename", "w.offset", "w.length", "w.url",
                       "w.mime", "w.status", "w.languages"))
    return out


def fetch_plan(selected: DataFrame) -> DataFrame:
    """Selected captures -> one row per WARC file with its sorted
    (offset, length, url) ranges: one fetch task per file, reads
    sequential within it.  n_ranges/total_bytes let a scheduler pack
    tasks by actual byte cost instead of file count."""
    rng = F.struct(F.col("offset"), F.col("length"), F.col("url"))
    return (
        selected.groupBy("filename")
        .agg(F.sort_array(F.collect_list(rng)).alias("ranges"),
             F.count(F.lit(1)).alias("n_ranges"),
             F.sum("length").alias("total_bytes"))
    )
