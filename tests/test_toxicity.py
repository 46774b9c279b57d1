"""Word-list toxicity gate: list folding, ratio kernel, Spark parity,
curate stage, CLI flag."""

import pytest

from dqc_spark.toxicity import (
    load_wordlist,
    toxicity_gate,
    toxicity_score_py,
    with_toxicity,
)


def test_load_wordlist_folds_and_cleans(tmp_path):
    p = tmp_path / "words.txt"
    p.write_text("BadWord\n  # a comment\n\nOther  # trailing\nbadword\n")
    assert load_wordlist(str(p)) == frozenset({"badword", "other"})
    assert load_wordlist(["Mixed", "case"]) == frozenset({"mixed", "case"})


def test_load_wordlist_rejects_phrases():
    with pytest.raises(ValueError, match="2 tokens"):
        load_wordlist(["two words"])
    # CJK isolates per codepoint (the shared-tokenizer contract), so a
    # multi-codepoint CJK term can never match one token — loud error
    with pytest.raises(ValueError, match="2 tokens"):
        load_wordlist(["中文"])
    # pure punctuation folds to zero alnum tokens — can never match
    with pytest.raises(ValueError, match="0 tokens"):
        load_wordlist(["!!!"])


def test_score_kernel():
    words = frozenset({"bad", "worse"})
    assert toxicity_score_py("all good here", words) == 0.0
    assert toxicity_score_py("bad bad good worse", words) == 0.75
    assert toxicity_score_py("BAD, punctuation!", words) == 0.5  # folded
    assert toxicity_score_py("", words) == 0.0
    assert toxicity_score_py(None, words) == 0.0


def test_with_toxicity_spark_parity(spark):
    words = load_wordlist(["bad", "Evil"])
    rows = [(1, "a bad day"), (2, "nothing wrong"), (3, "EVIL evil ok"),
            (4, None), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.toxicity for r in with_toxicity(df, words).collect()}
    for did, text in rows:
        assert got[did] == toxicity_score_py(text, words), did


def test_toxicity_gate_threshold(spark):
    words = frozenset({"bad"})
    df = spark.createDataFrame(
        [(1, "bad bad bad good"), (2, "bad good good good"),
         (3, "clean text here")], "doc_id long, text string")
    keep_strict = {r.doc_id for r in
                   toxicity_gate(df, words, 0.0).collect()}
    assert keep_strict == {3}
    keep_loose = {r.doc_id for r in
                  toxicity_gate(df, words, 0.25).collect()}
    assert keep_loose == {2, 3}
    with pytest.raises(ValueError, match="max_ratio"):
        toxicity_gate(df, words, 1.5)


def test_curate_toxicity_stage(spark):
    from dqc_spark.pagesgen import make_page
    from dqc_spark.pipeline import curate

    rows = []
    for i in range(16):
        text = make_page(i)["text"]
        if i % 4 == 0:
            text = "verboten " + text
        rows.append((f"http://t.test/{i}", text))
    pages = spark.createDataFrame(rows, "url string, text string")
    metrics = {}
    out = curate(pages, near_dup_threshold=None,
                 toxic_words=frozenset({"verboten"}),
                 stage_metrics=metrics)
    urls = {r.url for r in out.select("url").collect()}
    assert urls and all(int(u.rsplit("/", 1)[1]) % 4 != 0 for u in urls)
    # the stage dropped exactly the planted docs that survived gating
    control = {r.url for r in
               curate(pages, near_dup_threshold=None)
               .select("url").collect()}
    planted_survivors = sum(
        1 for u in control if int(u.rsplit("/", 1)[1]) % 4 == 0)
    assert planted_survivors > 0  # the test must actually exercise it
    assert metrics["toxicity"] == metrics["quality_gates"] - planted_survivors
    assert urls == {u for u in control
                    if int(u.rsplit("/", 1)[1]) % 4 != 0}


def test_cli_curate_toxic_words(capsys, spark, tmp_path):
    from dqc_spark import cli
    from dqc_spark.pagesgen import make_page

    src = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [(f"http://t.test/{i}",
          ("verboten " if i % 2 else "") + make_page(i)["text"])
         for i in range(12)],
        "url string, text string").write.parquet(src)
    wl = tmp_path / "blocked.txt"
    wl.write_text("Verboten  # stand-in term\n")
    out_p = str(tmp_path / "out.parquet")
    rc = cli.main(["--db-path", str(tmp_path / "q.db"), "curate",
                   "--input", src, "--output", out_p,
                   "--toxic-words", str(wl),
                   "--near-dup-threshold", "-1"])
    assert rc == 0
    kept = [r.url for r in spark.read.parquet(out_p).collect()]
    assert kept and all(int(u.rsplit("/", 1)[1]) % 2 == 0 for u in kept)
