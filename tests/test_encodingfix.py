"""Encoding repair: forward-corruption differential (make_mojibake is
the independent derivation — encode/decode in the OPPOSITE direction of
the repair), clean-text stability, and Spark==python parity."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dqc_spark.encodingfix import (
    fix_encoding,
    fix_mojibake_py,
    fix_mojibake_series,
    make_mojibake,
)

CLEAN = [
    "don’t “quote” me — it’s naïve",
    "café déjà vu £10 €5",
    "日本語のテキスト",
    "Ünïcödé mix",
    "plain ascii text",
    "résumé – ‘single’ quotes…",
    "русский текст",
]


@pytest.mark.parametrize("clean", CLEAN)
@pytest.mark.parametrize("passes", [1, 2])
def test_repair_inverts_corruption(clean, passes):
    assert fix_mojibake_py(make_mojibake(clean, passes)) == clean


@pytest.mark.parametrize("clean", CLEAN)
def test_clean_text_is_stable(clean):
    assert fix_mojibake_py(clean) == clean


def test_mixed_script_left_alone():
    # genuine CJK + mojibake in one string can't come from ONE
    # mis-decode -> whole-string rule leaves it unchanged
    mixed = "日本語 " + make_mojibake("café")
    assert fix_mojibake_py(mixed) == mixed


def test_none_and_empty():
    assert fix_mojibake_py(None) is None
    assert fix_mojibake_py("") == ""


def test_idempotent():
    for clean in CLEAN:
        once = fix_mojibake_py(make_mojibake(clean, 1))
        assert fix_mojibake_py(once) == once


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_property_repair_inverts_corruption(s):
    # restrict to fixed-point cleans: a random string that itself LOOKS
    # like mojibake (e.g. literal 'Ã©') legitimately repairs further
    if fix_mojibake_py(s) != s:
        return
    assert fix_mojibake_py(make_mojibake(s, 1)) == s
    assert fix_mojibake_py(make_mojibake(s, 2)) == s


def test_series_kernel_matches_scalar():
    vals = ([make_mojibake(c, 1) for c in CLEAN]
            + [make_mojibake(c, 2) for c in CLEAN]
            + CLEAN + [None, "", "ascii only"])
    s = pd.Series(vals, dtype="object")
    out = fix_mojibake_series(s)
    expect = [fix_mojibake_py(v) for v in vals]
    assert list(out) == expect


def test_repair_must_precede_normalize():
    # normalize strips the C1 controls that cp1252's holes map through
    # (the ordering contract in the module docstring)
    from dqc_spark.normalize import normalize_text_py

    clean = "don’t “quote” me"          # ” -> 0x9D hole -> C1 control
    corrupt = make_mojibake(clean, 1)
    assert "\x9d" in corrupt
    # right order: repair, then normalize
    assert normalize_text_py(fix_mojibake_py(corrupt)) == clean
    # wrong order: the evidence is destroyed, mojibake survives
    assert "â€" in fix_mojibake_py(normalize_text_py(corrupt))


# ---------------------------------------------------------------------------
# Spark
# ---------------------------------------------------------------------------


def test_fix_encoding_spark_parity(spark):
    rows = [(i, make_mojibake(CLEAN[i % len(CLEAN)], 1 + i % 2))
            for i in range(40)] + [(100, None), (101, "ascii")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in
           fix_encoding(df, "text", flag_col="was_fixed").collect()}
    for i in range(40):
        assert out[i].text == CLEAN[i % len(CLEAN)]
        # ascii-only cleans corrupt to themselves -> not flagged
        assert out[i].was_fixed == (
            make_mojibake(CLEAN[i % len(CLEAN)], 1 + i % 2)
            != CLEAN[i % len(CLEAN)])
    assert out[100].text is None and out[100].was_fixed is False
    assert out[101].text == "ascii" and out[101].was_fixed is False


def test_fix_encoding_out_col_keeps_original(spark):
    df = spark.createDataFrame(
        [(make_mojibake("café"),)], "text string")
    row = fix_encoding(df, "text", out_col="fixed").collect()[0]
    assert row.text == make_mojibake("café") and row.fixed == "café"


def test_curate_fix_encoding_stage(spark):
    # curate(fix_encoding=True) over mojibake pages == curate over
    # pre-repaired pages (the stage is exactly the shared kernel,
    # applied before every other text stage)
    from dqc_spark.pagesgen import make_page
    from dqc_spark.pipeline import curate

    # gate-passing synthetic pages, corrupted with a planted accent so
    # every document is genuinely repairable mojibake
    rows = [(f"http://e.test/{i}",
             make_mojibake("Don’t worry — café time. "
                           + make_page(i)["text"], 1))
            for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, text string")
    clean_pages = fix_encoding(pages, "text")
    got = curate(pages, near_dup_threshold=None, fix_encoding=True) \
        .select("url", "text").collect()
    want = {r.url: r.text for r in
            curate(clean_pages, near_dup_threshold=None)
            .select("url", "text").collect()}
    assert len(got) == len(want) > 0
    for r in got:
        assert r.text == want[r.url]
        assert "â€" not in r.text and "Ã" not in r.text


def test_cli_normalize_fix_encoding(capsys, spark, tmp_path):
    from dqc_spark import cli

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, make_mojibake("don’t “quote” me")), (2, "clean ascii")],
        "doc_id long, text string").write.parquet(src)
    out_p = str(tmp_path / "fixed.parquet")
    rc = cli.main(["--db-path", str(tmp_path / "q.db"), "normalize",
                   "--input", src, "--output", out_p, "--fix-encoding"])
    assert rc == 0
    got = {r.doc_id: r.text
           for r in spark.read.parquet(out_p).collect()}
    assert got[1] == "don’t “quote” me"
    assert got[2] == "clean ascii"
