"""Streaming parity: the micro-batch pipeline produces the same kept
set as the batch pipeline, and resumes from its checkpoint."""

from pyspark.sql import functions as F

from dqc_spark.audit import MemoryAuditSink
from dqc_spark.pagesgen import generate_pages
from dqc_spark.pipeline import annotate
from dqc_spark.streaming import stream_quality_pipeline


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages(spark, 150, n_partitions=3)
    pages.write.parquet(src)

    sink = MemoryAuditSink()
    q = stream_quality_pipeline(spark, src, out, ckpt, audit=sink)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    want = annotate(spark.read.parquet(src)).filter(F.col("keep"))
    assert got.count() == want.count()
    assert (
        got.select("url", "scrubbed_text").exceptAll(
            want.select("url", "scrubbed_text")
        ).count()
        == 0
    )
    assert sink.rows and all(r["check_type"] == "stream_batch_complete"
                             for r in sink.rows)
    total = sum(int(r["params"]["n_docs"]) for r in sink.rows)
    assert total == 150

    # resume: no new files -> a new availableNow run processes nothing new
    q2 = stream_quality_pipeline(spark, src, out, ckpt, audit=sink)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == want.count()
