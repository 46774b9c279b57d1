"""Bucketed co-located joins: pre-shuffled at write time, zero Exchange
at read time (the 100 TB url-bucketed pages-table strategy)."""

import os

from pyspark.sql import functions as F

from dqc_spark.bucketing import read_table, write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    meta = docs.select("doc_id", "lang", "source")
    stats = docs.select("doc_id", "n_chars")
    write_bucketed(meta, "t_meta_b", "doc_id", num_buckets=4, sort_col="doc_id")
    write_bucketed(stats, "t_stats_b", "doc_id", num_buckets=4, sort_col="doc_id")
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, "t_meta_b").join(
                read_table(spark, "t_stats_b"), "doc_id"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            # the whole point: both sides arrive pre-partitioned, so the
            # sort-merge join needs NO shuffle (and, sorted buckets, no sort)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
            # and it is still correct
            assert j.count() == docs.count()
            row = j.filter(F.col("doc_id") == 7).first()
            want = docs.filter(F.col("doc_id") == 7).first()
            assert row["n_chars"] == want["n_chars"]
            assert row["lang"] == want["lang"]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_meta_b")
        spark.sql("DROP TABLE IF EXISTS t_stats_b")


def test_bucketed_groupby_has_no_exchange(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    write_bucketed(
        docs.select("doc_id", "n_chars"), "t_agg_b", "doc_id", num_buckets=4
    )
    try:
        g = (
            read_table(spark, "t_agg_b")
            .groupBy("doc_id")
            .agg(F.sum("n_chars").alias("s"))
        )
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # agg key == bucket key -> no shuffle
        assert g.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_agg_b")
