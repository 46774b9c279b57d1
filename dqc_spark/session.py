"""SparkSession factory tuned for the quality-filter workload.

Local-mode defaults mirror what we would set on a real cluster:
  * AQE on (runtime coalesce + skew-join splitting),
  * shuffle partitions sized to cores (not the 200 default),
  * Arrow enabled for every pandas-UDF boundary, with a bounded batch
    size because ``text`` payloads are large,
  * UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dqc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for tests; on a real cluster the submitter sets the master and these
    configs become spark-submit ``--conf`` entries instead.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large text columns: keep Arrow batches bounded so executor
        # memory stays flat regardless of document size distribution
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("DQC_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def iceberg_available() -> bool:
    """True iff an Iceberg Spark runtime jar is on this installation's
    classpath.  This sandbox ships none (and installs are not allowed),
    so the audit/corpus tables fall back to the Parquet append-only
    layout; on a real cluster the jar is present and ``iceberg_conf``
    below turns the same code paths into Iceberg commits."""
    import glob

    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__),
                               "jars", "*iceberg-spark-runtime*"))
    )


def iceberg_conf(warehouse: str, catalog: str = "dqc") -> dict[str, str]:
    """spark-submit/extra_conf entries that register a Hadoop-backed
    Iceberg catalog — the production target for the audit table and the
    curated-corpus writes (BASELINE north rule).  Pure config: safe to
    construct anywhere, only USE it when ``iceberg_available()``."""
    return {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        f"spark.sql.catalog.{catalog}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
