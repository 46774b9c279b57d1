"""Corpus-level line dedup (CCNet/C4-style) — semantics + plan shape."""

import pytest
from pyspark.sql import functions as F


DOCS = [
    # doc 0: boilerplate + unique content
    (0, "COOKIE CONSENT BANNER TEXT\nalpha beta gamma delta words\nshort"),
    # doc 1: same boilerplate (must be dropped here), own content
    (1, "COOKIE CONSENT BANNER TEXT\nepsilon zeta eta theta words"),
    # doc 2: boilerplate again + a line duplicating doc 1's content line
    (2, "epsilon zeta eta theta words\nCOOKIE CONSENT BANNER TEXT\niota kappa"),
    # doc 3: only short lines (all exempt from dedup)
    (3, "a\nb\na"),
    # doc 4: NULL text
    (4, None),
]


def _py_dedup(min_dup_len=10):
    """Reference implementation: first (key, line_no) occurrence wins."""
    first = {}
    for key, text in sorted(DOCS):
        for i, line in enumerate((text or "").split("\n")):
            if len(line) >= min_dup_len and line not in first:
                first[line] = (key, i)
    out = {}
    for key, text in DOCS:
        lines = (text or "").split("\n")
        kept = [
            ln
            for i, ln in enumerate(lines)
            if len(ln) < min_dup_len or first[ln] == (key, i)
        ]
        out[key] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_dedup_lines_matches_reference(spark):
    from dqc_spark.linededup import dedup_lines

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_lines_kept"])
        for r in dedup_lines(df, "doc_id", min_dup_len=10).collect()
    }
    assert got == _py_dedup()
    # the boilerplate survives ONLY in doc 0
    assert "COOKIE" in got[0][0]
    assert "COOKIE" not in got[1][0] and "COOKIE" not in got[2][0]
    # doc 2's copy of doc 1's content line is dropped (doc 1 is first)
    assert "epsilon" in got[1][0] and "epsilon" not in got[2][0]
    # short lines never deduped, NULL doc survives as empty
    assert got[3] == ("a\nb\na", 3, 3)
    assert got[4] == ("", 1, 1)


def test_dedup_lines_plan_is_aggregate_not_window(spark):
    """Winner election must plan as a partial-aggregatable groupBy (hot
    boilerplate hashes combine map-side), NOT a row_number window whose
    hot partitions serialize on one task."""
    from dqc_spark.linededup import dedup_lines

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = dedup_lines(df, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_dedup_lines_idempotent(spark):
    from dqc_spark.linededup import dedup_lines

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    once = dedup_lines(df, "doc_id")
    again = dedup_lines(
        once.select(F.col("doc_id"), F.col("text_dedup").alias("text")), "doc_id"
    )
    got1 = {r["doc_id"]: r["text_dedup"] for r in once.collect()}
    got2 = {r["doc_id"]: r["text_dedup"] for r in again.collect()}
    assert got1 == got2


def test_curate_paragraph_unit(spark):
    """curate(line_dedup_unit='paragraph'): a boilerplate PARAGRAPH
    whose individual lines are under min_dup_len survives in exactly
    one document; line mode leaves it everywhere."""
    from dqc_spark.lmtrain import train_lm_py
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate
    from pyspark.sql import functions as F

    banner = "the of\nand to\nin it"          # lines < 10 chars each
    # every long line distinct per doc: line-mode dedup must not touch
    # the unique paragraphs (shared long lines would get excised from
    # the loser and push it under the 20-word gate)
    uniq = [
        f"she said it was the old house number {i} on the far hill\n"
        f"and we walked down to the river {i} times in the morning\n"
        f"for it was a long day of rest number {i}"
        for i in range(2)
    ]
    texts = [banner + "\n\n" + u for u in uniq]
    lm = train_lm_py(texts)
    r = generate_pages(spark, 4, n_partitions=1).first()
    pages = spark.createDataFrame(
        [(f"http://planted.example.com/{i}", r["warc_ts"], r["html"],
          t, "en") for i, t in enumerate(texts)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")

    line_mode = curate(pages, near_dup_threshold=None, lm=lm,
                       line_dedup_min_len=10).persist()
    with_banner_line = line_mode.filter(
        F.col("text").contains("the of\nand to")).count()
    para_mode = curate(pages, near_dup_threshold=None, lm=lm,
                       line_dedup_min_len=10,
                       line_dedup_unit="paragraph").persist()
    with_banner_para = para_mode.filter(
        F.col("text").contains("the of\nand to")).count()
    assert line_mode.count() == 2 and para_mode.count() == 2
    assert with_banner_line == 2       # short lines escape line mode
    assert with_banner_para == 1       # the paragraph hash catches it
    line_mode.unpersist(); para_mode.unpersist()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="line_dedup_unit"):
        curate(pages, near_dup_threshold=None,
               line_dedup_min_len=10, line_dedup_unit="word").count()
