"""Format auto-detection coverage for path-as-table loading
(reference: DuckDB `FROM '<path>'` sniffing, README.md:8)."""

import pytest

from dqc_spark.sources import DataPathError, infer_format, load_table


def test_tsv_reads_with_tab_delimiter(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("id\tname\n1\talpha\n2\tbeta\n")
    df = load_table(spark, str(p))
    assert df.columns == ["id", "name"]
    assert {r.name for r in df.collect()} == {"alpha", "beta"}


def test_orc_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "t.orc")
    src.write.orc(p)
    got = load_table(spark, p)
    assert sorted((r.id, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_infer_format_known_extensions():
    assert infer_format("x/a.tsv") == "tsv"
    assert infer_format("x/a.orc") == "orc"
    assert infer_format("x/a.jsonl") == "json"
    assert infer_format("x/a.unknownext") == "parquet"  # default


def test_missing_path_fails_fast(spark):
    with pytest.raises(DataPathError):
        load_table(spark, "/definitely/not/here.csv")


def test_iceberg_probe_and_conf():
    # no Iceberg runtime in this sandbox: the probe must say so, and the
    # production conf builder must emit the catalog entries unchanged
    from dqc_spark.session import iceberg_available, iceberg_conf

    assert iceberg_available() is False
    conf = iceberg_conf("/tmp/wh", catalog="prod")
    assert conf["spark.sql.catalog.prod.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
