"""Checkpoint-resumable pipeline runs with per-partition lineage.

The unit of checkpointing is the natural input partition (warc_ts day —
the same key the production Iceberg table is partitioned by), because
that is what a re-run can skip via partition pruning.  Completion is
recorded in the audit table itself (check_type = 'partition_complete',
one row per day with metrics), so resume state needs no extra store:

    pending = distinct input days  ANTI JOIN  completed audit days

A crashed run leaves at most one day partially written; output goes to
``<out>/day=<d>`` directories that are atomically replaced per day
(dynamic partition overwrite), so re-processing a day is idempotent.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqc_spark.audit import ParquetAuditSink
from dqc_spark.pipeline import annotate

PARTITION_DONE = "partition_complete"


def completed_days(audit: ParquetAuditSink, run_group: str) -> set[str]:
    from pyspark.errors import AnalysisException

    try:
        audit_df = audit.read()
    except AnalysisException as exc:
        # only a genuinely-missing table means "nothing completed yet";
        # any other read failure (corrupt footer, permissions) must NOT
        # silently disable resume and reprocess the whole input
        if "PATH_NOT_FOUND" in str(exc) or "does not exist" in str(exc):
            return set()
        raise
    rows = (
        audit_df.filter(
            (F.col("check_type") == PARTITION_DONE)
            & (F.col("input_snapshot") == run_group)
            & F.col("result")
        )
        .select(F.col("params")["day"].alias("day"))
        .collect()
    )
    return {r["day"] for r in rows if r["day"] is not None}


def run_resumable(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    audit: ParquetAuditSink,
    run_group: str,
    thresholds: dict | None = None,
) -> dict:
    """Process only the not-yet-completed day partitions.

    Returns {'processed': [...], 'skipped': [...]}.  All pending days run
    in ONE Spark job (a single isin filter + partitioned write), not a
    per-day loop — day count can be large.
    """
    days_df = pages.select(F.to_date("warc_ts").alias("day")).distinct()
    all_days = sorted(str(r["day"]) for r in days_df.collect())
    done = completed_days(audit, run_group)
    pending = [d for d in all_days if d not in done]
    if not pending:
        return {"processed": [], "skipped": all_days}

    subset = pages.filter(
        F.to_date("warc_ts").isin([_dt.date.fromisoformat(d) for d in pending])
    )
    ann = annotate(subset, thresholds=thresholds).withColumn(
        "day", F.to_date("warc_ts")
    )
    # dynamic overwrite (replace only the written days) — scoped with a
    # save/restore: leaking the session-wide conf would silently turn
    # run_pipeline's later full overwrites into partial ones
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        (
            ann.write.mode("overwrite")
            .partitionBy("day")
            .parquet(output_path)
        )
    finally:
        if prev_mode is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev_mode)

    # per-partition lineage metrics from the written output (cheap: the
    # day column prunes, and only 3 small aggregates per day)
    out = spark.read.parquet(output_path)
    metrics = (
        out.filter(F.col("day").isin(pending))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        )
        .collect()
    )
    for i, m in enumerate(sorted(metrics, key=lambda r: str(r["day"]))):
        audit.log(
            PARTITION_DONE,
            True,
            {
                "day": str(m["day"]),
                "n_docs": str(m["n_docs"]),
                "n_kept": str(m["n_kept"]),
            },
            error_count=None,
            partition_id=i,
            input_snapshot=run_group,
        )
    audit.flush()
    return {"processed": pending, "skipped": [d for d in all_days if d in done]}
