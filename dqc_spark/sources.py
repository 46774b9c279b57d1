"""Path-as-table loading, mirroring the reference's file-path data model.

The reference has no catalog: every check takes a ``dataPath string`` and
DuckDB reads it via ``SELECT * FROM '<path>'`` with format auto-detection
(reference: internal/checker/checker.go:37,60; README.md:8).  Readability
is probed with a ``LIMIT 0`` query before every check
(checker.go:24-43 ``validatePathExists``).

Here a "table" is either an already-built DataFrame, a filesystem path
(format inferred from extension: csv / parquet / json), or a catalog
table name — so the production pipeline can point the same checks at an
Iceberg table while tests point them at tiny CSVs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMATS = {
    ".csv": "csv",
    ".tsv": "tsv",
    ".parquet": "parquet",
    ".pq": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".orc": "orc",
}


class DataPathError(ValueError):
    """Path missing or unreadable (parity with validatePathExists,
    checker.go:24-43: os.Stat failure or LIMIT-0 probe failure)."""


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    return _EXT_FORMATS.get(ext, "parquet")


def load_table(
    spark: SparkSession,
    source: DataFrame | str,
    fmt: str | None = None,
) -> DataFrame:
    """Resolve a DataFrame / path / table name into a DataFrame.

    CSV reads use header + schema inference to match DuckDB's sniffer
    (checker.go:60 ``FROM '<path>'``); production paths should pass
    explicit-schema DataFrames instead.
    """
    if isinstance(source, DataFrame):
        return source
    looks_like_path = (
        "://" in source or "/" in source or
        os.path.splitext(source)[1].lower() in _EXT_FORMATS
    )
    if looks_like_path and "://" not in source and not os.path.exists(source):
        # validatePathExists parity (checker.go:24-43): a local path that
        # is not there fails fast with a clear error, instead of falling
        # through to a confusing catalog lookup
        raise DataPathError(f"data path does not exist: {source}")
    if os.path.exists(source) or "://" in source:
        fmt = fmt or infer_format(source)
        try:
            if fmt == "csv":
                df = spark.read.csv(source, header=True, inferSchema=True)
            elif fmt == "tsv":
                df = spark.read.csv(
                    source, header=True, inferSchema=True, sep="\t"
                )
            elif fmt == "json":
                df = spark.read.json(source)
            elif fmt == "parquet":
                df = spark.read.parquet(source)
            else:
                # orc and any other Spark-registered source ("and more",
                # reference README.md:8): hand the format name to Spark
                df = spark.read.format(fmt).load(source)
            # LIMIT-0 readability probe, parity with checker.go:37-41
            df.limit(0).collect()
            return df
        except DataPathError:
            raise
        except Exception as exc:  # unreadable / corrupt file
            raise DataPathError(f"cannot read data at {source}: {exc}") from exc
    # fall through: catalog table name
    try:
        return spark.table(source)
    except Exception as exc:
        raise DataPathError(f"data path does not exist: {source}") from exc
