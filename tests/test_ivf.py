"""IVF ANN: exactness at full probe, recall on clustered data, and the
partition-pruning index shape."""

import numpy as np
import pytest


def _clustered_corpus(spark, n_clusters=8, per=40, dim=32, seed=2):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    centers = rng.standard_normal((n_clusters, dim)) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per):
            v = c + rng.standard_normal(dim) * 0.4
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, rows


def test_ivf_full_probe_equals_brute_force(spark):
    from dqc_spark.ivf import build_ivf_index, ivf_topk, train_centroids
    from dqc_spark.similarity import brute_force_topk

    df, rows = _clustered_corpus(spark)
    cent = train_centroids(df, k=8)
    idx = build_ivf_index(df, cent).persist()
    idx.count()
    q = rows[5][1]
    exact = [(r.vec_id, round(r.cosine, 6))
             for r in brute_force_topk(df, q, k=10).collect()]
    got = [(r.vec_id, round(r.cosine, 6))
           for r in ivf_topk(idx, cent, q, k=10, nprobe=len(cent)).collect()]
    assert got == exact  # nprobe == k_clusters -> brute force
    idx.unpersist()


def test_ivf_recall_with_few_probes(spark):
    from dqc_spark.ivf import build_ivf_index, ivf_topk, train_centroids
    from dqc_spark.similarity import brute_force_topk

    df, rows = _clustered_corpus(spark)
    cent = train_centroids(df, k=8)
    idx = build_ivf_index(df, cent).persist()
    idx.count()
    hits = total = 0
    for qi in (3, 100, 200, 301):
        q = rows[qi][1]
        exact = {r.vec_id for r in brute_force_topk(df, q, k=10).collect()}
        got = {r.vec_id
               for r in ivf_topk(idx, cent, q, k=10, nprobe=2).collect()}
        hits += len(exact & got)
        total += len(exact)
    assert hits / total >= 0.9, f"IVF recall {hits}/{total}"
    idx.unpersist()


def test_ivf_index_prunes_partitions_on_disk(spark, tmp_path):
    # written partitionBy("cluster"), a probe filter must reach the scan
    # as partition pruning: only the probed clusters' files are read
    from dqc_spark.ivf import build_ivf_index, train_centroids

    df, _ = _clustered_corpus(spark, n_clusters=4, per=30)
    cent = train_centroids(df, k=4)
    p = str(tmp_path / "ivf")
    build_ivf_index(df, cent).write.partitionBy("cluster").parquet(p)
    back = spark.read.parquet(p)
    from pyspark.sql import functions as F

    q = back.filter(F.col("cluster").isin([0, 1]))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert q.count() > 0
