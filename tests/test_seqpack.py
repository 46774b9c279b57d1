"""GPT-style fixed-length sequence packing: python-model parity,
zero-waste window invariants, partition invariance, and the
empty-document / descending-sequence guard."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from dqc_spark.seqpack import pack_sequences, sequence_manifest

_WS = re.compile(r"\s+")


def _ntok(text):
    return len([w for w in _WS.split(text) if w != ""])


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "one"),
    (3, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (4, "  leading and trailing   spaces  "),
    (5, "short doc"),
    (6, "x " * 40),
    (7, "tab\tseparated\tand\nnewline separated tokens here"),
    (8, "pad pad pad pad pad pad pad"),
    (9, ""),
    (10, "final document with a handful of words inside"),
]


def _model_spans(docs, seq_len, eos=1):
    ordered = sorted(
        docs, key=lambda r: (hashlib.md5(r[1].encode()).hexdigest(), r[0]))
    out, start = {}, 0
    for key, text in ordered:
        n = _ntok(text) + eos
        if n > 0:
            out[key] = (n, start, start // seq_len,
                        (start + n - 1) // seq_len)
        else:
            out[key] = (n, start, None, None)
        start += n
    return out


def _model_manifest(docs, seq_len, eos=1):
    rows = []
    for key, (n, start, sf_, sl) in _model_spans(docs, seq_len, eos).items():
        if n <= 0:
            continue
        for s in range(sf_, sl + 1):
            a = max(start, s * seq_len)
            b = min(start + n, (s + 1) * seq_len)
            rows.append((s, key, a - s * seq_len, a - start, b - a))
    return sorted(rows)


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_spans_match_python_model(docs_df):
    got = {r.doc_id: (r.n_total, r.tok_start, r.seq_first, r.seq_last)
           for r in pack_sequences(docs_df, seq_len=16).collect()}
    assert got == _model_spans(DOCS, 16)


def test_manifest_matches_python_model(docs_df):
    got = sorted((r.seq_id, r.doc_id, r.offset_in_seq, r.doc_from, r.n_tok)
                 for r in sequence_manifest(docs_df, seq_len=16).collect())
    assert got == _model_manifest(DOCS, 16)


def test_every_window_full_except_last(docs_df):
    rows = sequence_manifest(docs_df, seq_len=16).collect()
    total = sum(_ntok(t) + 1 for _, t in DOCS)
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append(r)
    last = max(by_seq)
    assert sorted(by_seq) == list(range(last + 1))
    for s, parts in by_seq.items():
        fill = sum(p.n_tok for p in parts)
        assert fill == (16 if s < last else total - 16 * last), s
        # contiguous within the window, starting at 0
        parts.sort(key=lambda p: p.offset_in_seq)
        pos = 0
        for p in parts:
            assert p.offset_in_seq == pos
            assert p.n_tok > 0
            pos += p.n_tok


def test_documents_fully_covered(docs_df):
    spans = {r.doc_id: r.n_total
             for r in pack_sequences(docs_df, seq_len=16).collect()}
    by_doc = {}
    for r in sequence_manifest(docs_df, seq_len=16).collect():
        by_doc.setdefault(r.doc_id, []).append((r.doc_from, r.n_tok))
    for key, slices in by_doc.items():
        slices.sort()
        pos = 0
        for frm, n in slices:
            assert frm == pos
            pos += n
        assert pos == spans[key]


def test_partition_invariance(docs_df):
    a = sorted(map(tuple, sequence_manifest(
        docs_df.repartition(1), seq_len=8, num_partitions=1).collect()))
    b = sorted(map(tuple, sequence_manifest(
        docs_df.repartition(7), seq_len=8, num_partitions=5).collect()))
    assert a == b


def test_empty_doc_eos_zero_occupies_no_window(spark):
    df = spark.createDataFrame(
        [(1, "three words here"), (2, ""), (3, "two words")],
        "doc_id long, text string")
    spans = {r.doc_id: r for r in
             pack_sequences(df, seq_len=4, eos_tokens=0).collect()}
    assert spans[2].n_total == 0 and spans[2].n_seqs == 0
    assert spans[2].seq_first is None and spans[2].seq_last is None
    man = sequence_manifest(df, seq_len=4, eos_tokens=0).collect()
    assert all(r.doc_id != 2 for r in man)
    assert sum(r.n_tok for r in man) == 5


def test_custom_tokens_col(spark):
    df = spark.createDataFrame(
        [(1, "ignored", 10), (2, "ignored too", 7)],
        "doc_id long, text string, bpe_count long")
    spans = {r.doc_id: r for r in pack_sequences(
        df, seq_len=8, eos_tokens=1, tokens_col="bpe_count").collect()}
    assert {k: v.n_total for k, v in spans.items()} == {1: 11, 2: 8}
    assert sum(v.n_total for v in spans.values()) == 19
    assert max(v.seq_last for v in spans.values()) == 2  # 19 tokens / 8


def test_validation_errors(docs_df):
    with pytest.raises(ValueError):
        pack_sequences(docs_df, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs_df, seq_len=8, eos_tokens=-1)


def test_cli_pack_sequences(capsys, spark, docs_df, tmp_path):
    from dqc_spark import cli

    src = str(tmp_path / "docs")
    out = str(tmp_path / "manifest")
    docs_df.write.parquet(src)
    rc = cli.main(["pack-sequences", "--input", src, "--output", out,
                   "--seq-len", "16"])
    printed = capsys.readouterr().out
    assert rc == 0 and "sequences of 16 tokens" in printed
    got = sorted((r.seq_id, r.doc_id, r.offset_in_seq, r.doc_from, r.n_tok)
                 for r in spark.read.parquet(out).collect())
    assert got == _model_manifest(DOCS, 16)
    # pre-flight validation, no Spark work
    assert cli.main(["pack-sequences", "--input", src, "--output", out,
                     "--seq-len", "0"]) == 2
    capsys.readouterr()


def test_pack_epoch_expanded_stream(spark):
    """The advertised composition: epoch_expand -> pack on (doc, epoch).
    Repeated epochs of a document occupy distinct, non-overlapping spans
    of the packed token stream, and every window but the last is full."""
    from pyspark.sql import functions as F

    from dqc_spark.mixing import epoch_expand
    from dqc_spark.seqpack import pack_sequences

    rows = [(i, "hot" if i < 8 else "rare", f"doc {i} body words") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    mixed = epoch_expand(df, alpha=0.0, budget_docs=40, max_epochs=3)
    keyed = mixed.withColumn(
        "pack_key", F.concat_ws("#", F.col("doc_id"), F.col("epoch")))
    spans = pack_sequences(keyed, seq_len=8, key_col="pack_key").collect()
    assert len(spans) == mixed.count()  # every (doc, epoch) row packed once
    assert len({r["pack_key"] for r in spans}) == len(spans)
    # spans tile the stream exactly: sorted starts are the exclusive
    # prefix sums of n_total
    ordered = sorted(spans, key=lambda r: r["tok_start"])
    acc = 0
    for r in ordered:
        assert r["tok_start"] == acc
        acc += r["n_total"]


def test_null_text_counts_as_empty(spark):
    """NULL text == empty string: the doc still occupies its EOS slot
    and every later document's tok_start is unaffected."""
    from dqc_spark.seqpack import pack_sequences

    df = spark.createDataFrame(
        [("a", None), ("b", "one two"), ("c", "")],
        "doc_id string, text string")
    got = {r["doc_id"]: r for r in pack_sequences(df, 8).collect()}
    assert got["a"]["n_total"] == 1  # the EOS slot survives NULL text
    assert got["c"]["n_total"] == 1
    assert sum(r["n_total"] for r in got.values()) == 5
    # spans tile the stream with no NULL hole: each start is the
    # previous span's end
    ordered = sorted(got.values(), key=lambda r: r["tok_start"])
    acc = 0
    for r in ordered:
        assert r["tok_start"] == acc
        acc += r["n_total"]
    assert acc == 5
