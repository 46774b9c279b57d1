"""Deterministic global ordering / enumeration for training runs.

Training jobs need a reproducible document order (content-hash order is
the standard 'deterministic shuffle': uncorrelated with crawl order,
stable across reruns and cluster sizes) and a contiguous 0-based global
index per document (shard assignment, resumable offsets).

The naive Spark spelling — ``row_number() OVER (ORDER BY ...)`` with no
partition — collapses to a SINGLE partition and is the classic
100-TB-killer.  The next trap (measured here, not hypothetical): hanging
the window, the per-partition counts, and the offsets off one
``repartitionByRange(df)`` plans THREE separate scans + range exchanges
of the FULL table — column pruning specializes each branch's exchange,
so AQE's ReusedExchange never fires (verified: 3x `Scan parquet`, 0
`ReusedExchange` on the executed plan).

The plan used here instead:

  1. Project the order key + a UNIQUE tiebreak column — a narrow frame
     (hash + key, ~24 B/row; the parquet scan is column-pruned, document
     text is never read by the heavy stages).
  2. ``repartitionByRange`` + per-partition ``row_number`` on that
     narrow frame, persisted (its cached blocks feed both the counts
     job and the position projection — `cache.track`-registered so
     callers can release).
  3. Per-partition counts to the driver: num_partitions longs —
     metadata, not data.  Cumulative offsets come back as a broadcast
     join; position = offset[pid] + local_rank - 1.
  4. Hash-join (tiebreak, position) back to the caller's frame.  If the
     caller only selects keys + positions, Catalyst prunes the wide
     columns and the text never moves at all.

Net wide-data cost: ONE column-pruned scan for the keys and one hash
join against a narrow positions table — vs three full scans + three
range shuffles for the naive multi-branch plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dqc_spark.cache import track


def content_order_key(text_col: str = "text") -> "F.Column":
    """md5-of-content: the deterministic 'shuffle' order (engine-portable
    hex compares identically everywhere)."""
    return F.md5(F.col(text_col))


def global_enumerate(
    df: DataFrame,
    order_cols: list[str],
    tiebreak_col: str,
    value_col: str | None = None,
    num_partitions: int | None = None,
    position_col: str = "position",
    offset_col: str = "offset",
) -> DataFrame:
    """Add a 0-based ``position`` column (the row's rank in the total
    order) and — when ``value_col`` is given — an ``offset`` column:
    the EXCLUSIVE running total of ``value_col`` over everything
    earlier in that order (the prefix-sum a token-stream packer
    needs).  Both come out of the SAME narrow range shuffle: the
    driver metadata job collects one (count, sum) pair per partition
    instead of one count.  ``tiebreak_col`` must be unique per row —
    it both completes the total order (positions are deterministic
    regardless of range-boundary sampling) and keys the join that
    carries results back.  Scalable: see module docstring.
    """
    sort_cols = [F.col(c) for c in order_cols] + [F.col(tiebreak_col)]

    proj = [F.col(c) for c in order_cols] + [F.col(tiebreak_col)]
    if value_col is not None:
        proj.append(F.col(value_col).cast("long").alias("__val"))
    keyed = df.select(*proj)
    if num_partitions is None:
        ranged = keyed.repartitionByRange(*sort_cols)
    else:
        ranged = keyed.repartitionByRange(num_partitions, *sort_cols)
    ranged = track(ranged.withColumn("__pid", F.spark_partition_id()))

    # metadata job: one (count, sum) per partition; runs against the
    # cached narrow frame, so the range shuffle happens exactly once.
    # NULL-tiebreak detection rides the SAME aggregate for free: a NULL
    # tiebreak row would be counted into the offsets and ranked by the
    # window, but the non-null-safe join-back below would drop it —
    # silently losing the document AND leaving a gap in every later
    # position.  Fail loudly instead.
    aggs = [F.count(F.lit(1)).alias("n"),
            F.count_if(F.col(tiebreak_col).isNull()).alias("n_null_tb")]
    if value_col is not None:
        aggs.append(F.coalesce(F.sum("__val"), F.lit(0)).alias("v"))
    part_rows = {r["__pid"]: r
                 for r in ranged.groupBy("__pid").agg(*aggs).collect()}
    n_null_tb = sum(r["n_null_tb"] for r in part_rows.values())
    if n_null_tb:
        raise ValueError(
            f"tiebreak column {tiebreak_col!r} has {n_null_tb} NULL "
            "row(s): positions would silently drop them — filter or "
            "coalesce the key first")
    offsets, acc_n, acc_v = [], 0, 0
    for pid in sorted(part_rows):
        offsets.append((pid, acc_n, acc_v))
        acc_n += part_rows[pid]["n"]
        acc_v += part_rows[pid]["v"] if value_col is not None else 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets or [(0, 0, 0)], "__pid int, __off long, __voff long")
    )

    w = W.partitionBy("__pid").orderBy(*sort_cols)
    out_cols = [
        F.col(tiebreak_col),
        (F.col("__off") + F.col("__rank") - 1).alias(position_col),
    ]
    enum = ranged.withColumn("__rank", F.row_number().over(w))
    if value_col is not None:
        # exclusive prefix within the partition + partition base
        enum = enum.withColumn(
            "__cum", F.coalesce(
                F.sum("__val").over(
                    w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0)))
        out_cols.append((F.col("__voff") + F.col("__cum")).alias(offset_col))
    positions = enum.join(off_df, on="__pid", how="inner").select(*out_cols)
    return df.join(positions, on=tiebreak_col, how="inner")


def global_order_index(
    df: DataFrame,
    order_cols: list[str],
    tiebreak_col: str,
    num_partitions: int | None = None,
    position_col: str = "position",
) -> DataFrame:
    """Add a 0-based ``position`` column: the row's rank in the total
    order (``order_cols``, ``tiebreak_col``).  See global_enumerate."""
    return global_enumerate(
        df, order_cols, tiebreak_col, value_col=None,
        num_partitions=num_partitions, position_col=position_col)


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """The standard deterministic-shuffle enumeration: order by
    (md5(text), key) and attach the global 0-based position."""
    with_key = df.withColumn("__okey", content_order_key(text_col))
    out = global_order_index(
        with_key, ["__okey"], key_col, num_partitions=num_partitions
    )
    return out.drop("__okey")


def assign_shards(
    df: DataFrame,
    docs_per_shard: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "shard",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic training-shard assignment: the global content
    order chopped into fixed-size shards (``shard = position //
    docs_per_shard``).  Stable across re-runs and cluster sizes — the
    property a resumable training job needs to map "shard 1234" back
    to the same documents forever.  Cost is exactly training_order's
    one narrow range shuffle; the division adds nothing."""
    if docs_per_shard <= 0:
        raise ValueError("docs_per_shard must be positive")
    ordered = training_order(df, key_col, text_col,
                             num_partitions=num_partitions)
    return ordered.withColumn(
        shard_col, (F.col("position") / docs_per_shard).cast("long"))


def write_shards(
    df: DataFrame,
    path: str,
    docs_per_shard: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
    compression: str | None = None,
    manifest: bool = False,
) -> int:
    """Materialize shard-partitioned output (``shard=N/`` dirs, one
    file per shard via an in-partition repartition on the shard key) —
    the standard layout a data loader streams sequentially.  Returns
    the number of shards written.

    ``fmt``: ``"parquet"`` (default) or ``"json"`` — JSON means JSON
    Lines, the training-data interchange format every loader speaks
    (one doc per line; pass ``compression="gzip"`` for ``.json.gz``
    shards).  Both writers are the same distributed lineage; only the
    sink encoding differs.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    if manifest and "://" in path:
        # checked BEFORE the export lands: the manifest writer is
        # os-path-based (local only, like snaptable.py) and failing
        # after a multi-hour distributed write is the worst spot
        raise ValueError(
            "write_shards(manifest=True) supports local filesystem "
            f"paths only, got {path!r} — write the export without a "
            "manifest or point it at a local staging dir")
    sharded = assign_shards(df, docs_per_shard, key_col, text_col)
    w = (sharded.repartition("shard")
         .write.mode("overwrite").partitionBy("shard"))
    if fmt == "json":
        # Spark's JSON writer drops null-valued fields by default,
        # which would make the JSONL and parquet sinks content-UNequal
        # (a loader doing rec["text"] would KeyError on null-text
        # docs).  Emit explicit nulls so every line carries the full
        # schema.
        w = w.option("ignoreNullFields", "false")
    if compression is not None:
        w = w.option("compression", compression)
    getattr(w, fmt)(path)
    # shard count from arithmetic, not a second lineage execution:
    # positions are contiguous 0..n-1, so shards = ceil(n / size); the
    # row count of the WRITTEN table is footer metadata for parquet and
    # one narrow line count for JSONL — never a re-run of the
    # order/join lineage over the corpus
    if manifest:
        # the manifest's per-shard groupBy count IS the row count —
        # deriving n from it scans the written table once, not twice
        n = _write_shard_manifest(
            df.sparkSession, path, fmt, docs_per_shard)
    else:
        n = getattr(df.sparkSession.read, fmt)(path).count()
    return (n + docs_per_shard - 1) // docs_per_shard if n else 0


def _write_shard_manifest(
    spark, path: str, fmt: str, docs_per_shard: int
) -> int:
    """``_shards_manifest.json`` next to the shard dirs: per shard its
    row count and per-file (path, bytes, md5) — what a downstream
    training loader verifies after transferring the export (the
    dataset-card checksum block).

    Scale shape: file checksums come from a ``binaryFile`` scan hashed
    JVM-side on the executors (one shard file per task, content never
    reaches the driver); row counts are one partial-aggregated groupBy
    over the WRITTEN table (parquet footers / narrow line scan).  The
    driver collects one row per shard FILE — bounded by shard count,
    not corpus size.  Returns the total row count (the caller's shard
    arithmetic reuses it — no second scan of the written table).

    Local-filesystem only (like snaptable.py): rel-paths and the JSON
    write use os-level paths, and a URI output would silently produce
    garbage paths — rejected loudly instead."""
    import json
    import urllib.parse
    from pyspark.sql import functions as F

    # write_shards validated the path BEFORE the export landed; this
    # is the invariant restated, not a second user-facing check
    assert "://" not in path, "caller must pre-validate local path"
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "length", F.md5("content").alias("md5"))
        .collect()
    )
    counts = _shard_counts(spark, fmt, path)
    base = os.path.abspath(path)
    shards: dict[int, dict] = {}
    for r in files:
        p = urllib.parse.unquote(urllib.parse.urlparse(r["path"]).path)
        rel = os.path.relpath(p, base)
        name = os.path.basename(rel)
        if name.startswith((".", "_")):
            continue  # _SUCCESS / checksum markers
        parts = dict(
            seg.partition("=")[::2] for seg in rel.split(os.sep)[:-1]
            if "=" in seg)
        shard = int(parts["shard"])
        e = shards.setdefault(shard, {"shard": shard, "files": []})
        e["files"].append(
            {"path": rel, "bytes": int(r["length"]), "md5": r["md5"]})
    out = []
    for shard in sorted(shards):
        e = shards[shard]
        e["files"].sort(key=lambda f: f["path"])
        e["n_rows"] = int(counts.get(shard, 0))
        out.append(e)
    doc = {
        "format": fmt,
        "docs_per_shard": docs_per_shard,
        "n_shards": len(out),
        "n_rows": sum(e["n_rows"] for e in out),
        "shards": out,
    }
    with open(os.path.join(base, "_shards_manifest.json"), "w") as f:
        json.dump(doc, f, indent=1)
    return doc["n_rows"]


def _shard_counts(spark, fmt: str, path: str) -> dict:
    """shard -> row count over the WRITTEN table — shared by the
    manifest writer and verify_shards so producer and consumer can
    never drift onto different read semantics."""
    from pyspark.sql import functions as F

    return {
        r["shard"]: r["n"]
        for r in getattr(spark.read, fmt)(path)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def verify_shards(spark, path: str) -> dict:
    """Check a shard export against its ``_shards_manifest.json`` —
    the loader-side half of the transfer-verification contract.

    Re-hashes every data file distributed over an RDD of paths with
    plain Python file I/O — deliberately NOT a Hadoop/binaryFile scan:
    Hadoop's local filesystem verifies its own ``.crc`` sidecars on
    read and THROWS on a tampered file, which would crash the
    verification whose whole job is to report that tampering.  (One of
    the rare legitimate per-partition-imperative RDD uses; the export
    is local-filesystem by the manifest writer's contract.)  Compares
    (path, bytes, md5) sets plus per-shard row counts against the
    manifest.  Returns ``{"ok": bool, "n_files": int, "errors":
    [...]}`` where each error names the file/shard and what diverged
    (missing, extra, size, checksum, rows)."""
    import json

    base = os.path.abspath(path)
    man_path = os.path.join(base, "_shards_manifest.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(
            f"no _shards_manifest.json under {path} — was the export "
            "written with manifest=True?")
    with open(man_path) as f:
        man = json.load(f)
    want = {
        fe["path"]: (fe["bytes"], fe["md5"])
        for e in man["shards"] for fe in e["files"]
    }
    rels = []
    for dirpath, dirs, files in os.walk(base):
        # prune hidden/marker DIRECTORIES too (rsync partial dirs,
        # Spark _temporary): the manifest writer's Spark listing never
        # descended into them, so walking them here would flag their
        # contents as spurious not-in-manifest errors (review finding)
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for name in files:
            if name.startswith((".", "_")):
                continue
            rels.append(os.path.relpath(os.path.join(dirpath, name), base))

    def _hash_partition(it):
        import hashlib
        import os as _os

        for rel in it:
            h = hashlib.md5()
            with open(_os.path.join(base, rel), "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            yield rel, _os.path.getsize(_os.path.join(base, rel)), \
                h.hexdigest()

    got = {}
    if rels:
        sc = spark.sparkContext
        got = {
            rel: (size, md5)
            for rel, size, md5 in sc.parallelize(
                sorted(rels), max(1, min(len(rels), 32))
            ).mapPartitions(_hash_partition).collect()
        }
    errors = []
    for rel in sorted(set(want) - set(got)):
        errors.append(f"missing file: {rel}")
    for rel in sorted(set(got) - set(want)):
        errors.append(f"file not in manifest: {rel}")
    for rel in sorted(set(want) & set(got)):
        wb, wm = want[rel]
        gb, gm = got[rel]
        if wb != gb:
            errors.append(f"size mismatch: {rel} ({gb} != {wb})")
        elif wm != gm:
            errors.append(f"checksum mismatch: {rel}")
    if not errors:
        # rows only when the files themselves check out (a corrupt
        # file can make the reader fail; checksums already said why)
        counts = _shard_counts(spark, man["format"], path)
        for e in man["shards"]:
            n = int(counts.get(e["shard"], 0))
            if n != e["n_rows"]:
                errors.append(
                    f"row-count mismatch: shard={e['shard']} "
                    f"({n} != {e['n_rows']})")
    return {"ok": not errors, "n_files": len(want), "errors": errors}
