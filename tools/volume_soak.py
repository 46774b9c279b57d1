"""Data-volume soak for the heavy curation stages (VERDICT r3 item 8).

Runs the four most expensive curate stages — substring dedup, line
dedup, SemDeDup, BM25 top-k — on the SAME synthetic corpus at 1x and
4x volume (20k -> 80k pages; 100k -> 400k vectors) and reports
per-stage docs/sec at both volumes plus the throughput ratio
(docs_per_sec_4x / docs_per_sec_1x; ~1.0 = linear, >1 = fixed costs
amortizing, <0.8 = a sub-linear stage that needs a documented cause).

One record is appended to BENCH/history.jsonl with metric
"volume_soak": stage seconds live under "queries" (volume-suffixed
names, so bench.py's best-of guard never mixes volumes) and the
docs/sec + ratios under "soak".  bench.py's BASELINE.md writer renders
the latest such record as the per-stage volume table.

Configuration notes:
- SemDeDup's k scales with N (64 @ 100k -> 256 @ 400k) to hold the
  expected cluster size ~1.5k constant.  That is the production
  configuration (clusters sized for the blocked prune's working set);
  a FIXED k at 4x data would grow every cluster 4x and make the
  per-cluster greedy quadratic — a config smell, not an engine one.
  Centroid training is outside the timed thunk (bench.py precedent).
- pages.limit(n) collapses to one partition — repartition after it
  (CLAUDE.md rule) so both volumes run at the same parallelism.
- Best-of-K per stage (K=3 at 1x, 2 at 4x) on this shared host; min
  filters co-tenant noise, same methodology as bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _session/_ensure_pages/_timed)

BASE_DOCS = int(os.environ.get("SPARK_GRAFT_SOAK_DOCS", "20000"))
SCALE = 4
BASE_VECS_REPS = 50  # x ~2k sf0.1 embeddings ~= 100k vectors


def _pages(spark, n_docs: int):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(bench.PAGES_CACHE)
        .limit(n_docs)
        .repartition(bench.CPUS)
        .withColumn("source", F.concat(F.lit("s"), F.abs(F.xxhash64("url")) % 8))
        .persist()
    )


def _vectors(spark, reps: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(os.path.join(bench.SF_DIR, "embeddings.parquet"))
    v = (
        emb.select("vec_id", "embedding")
        .crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
        .select((F.col("vec_id") * 1024 + F.col("rep")).alias("vec_id"),
                "embedding")
        .repartition(bench.CPUS)
        .persist()
    )
    return v, v.count()


def _stage_times(spark, n_docs: int, vec_reps: int, trials: int) -> dict:
    from pyspark.sql import functions as F

    from dqc_spark.ivf import train_centroids
    from dqc_spark.linededup import dedup_lines
    from dqc_spark.retrieval import bm25_topk
    from dqc_spark.semdedup import semantic_dedup
    from dqc_spark.substrdedup import dedup_substrings

    pages = _pages(spark, n_docs)
    n_pages = pages.count()
    vecs, n_vecs = _vectors(spark, vec_reps)
    # k scales with N: expected cluster size stays ~1.5k (see module doc)
    k = max(8, round(n_vecs / 1562))
    centroids = train_centroids(
        vecs, k=k, max_iter=5, sample_pct=10, key_col="vec_id")

    thunks = {
        "substr_dedup": lambda: dedup_substrings(pages, "url", k=10)
        .agg(F.sum("n_words_kept")).first(),
        "line_dedup": lambda: dedup_lines(pages, "url", join_sep="\n")
        .agg(F.sum("n_lines_kept")).first(),
        "bm25_topk": lambda: bm25_topk(
            pages, ["people", "number", "sound"], k=10, key_col="url"
        ).count(),
        "semdedup": lambda: semantic_dedup(vecs, centroids, threshold=0.99)
        .agg(F.sum(F.col("keep").cast("int"))).first(),
    }
    out = {}
    for name, fn in thunks.items():
        fn()  # warm: spawn Arrow workers / JIT before the measured runs
        out[name] = min(bench._timed(fn) for _ in range(trials))
    n_items = {"substr_dedup": n_pages, "line_dedup": n_pages,
               "bm25_topk": n_pages, "semdedup": n_vecs}
    pages.unpersist()
    vecs.unpersist()
    spark.catalog.clearCache()
    return {"times": out, "items": n_items, "k_semdedup": k}


def main() -> None:
    spark = bench._session(bench.CPUS)
    bench._ensure_pages(spark)
    lo = _stage_times(spark, BASE_DOCS, BASE_VECS_REPS, trials=3)
    hi = _stage_times(spark, BASE_DOCS * SCALE, BASE_VECS_REPS * SCALE,
                      trials=2)
    spark.stop()

    queries: dict[str, float] = {}
    soak: dict[str, dict] = {}
    for name in lo["times"]:
        n1, n4 = lo["items"][name], hi["items"][name]
        t1, t4 = lo["times"][name], hi["times"][name]
        d1, d4 = n1 / t1, n4 / t4
        unit = "vecs" if name == "semdedup" else "docs"
        queries[f"soak_{name}_{n1 // 1000}k"] = round(t1, 3)
        queries[f"soak_{name}_{n4 // 1000}k"] = round(t4, 3)
        soak[name] = {
            "unit": unit,
            "n_1x": n1, "n_4x": n4,
            "sec_1x": round(t1, 3), "sec_4x": round(t4, 3),
            "per_sec_1x": round(d1, 1), "per_sec_4x": round(d4, 1),
            "throughput_ratio_4x_over_1x": round(d4 / d1, 3),
        }

    payload = {
        "metric": "volume_soak",
        "value": round(min(s["throughput_ratio_4x_over_1x"]
                           for s in soak.values()), 3),
        "unit": "ratio",
        "queries": queries,
        "soak": soak,
        "k_semdedup": {"1x": lo["k_semdedup"], "4x": hi["k_semdedup"]},
        "docs": BASE_DOCS,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        payload["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
    except Exception:
        payload["git"] = "unknown"
    print(json.dumps(payload))
    hist = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "history.jsonl")
    with open(hist, "a") as f:
        f.write(json.dumps(payload) + "\n")


if __name__ == "__main__":
    main()
