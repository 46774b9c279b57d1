"""Span-level PII attributes: the byte-parity invariant is that
replaying recorded spans onto the ORIGINAL text reproduces the
sequential scrub output exactly — same bar as the scrub kernel's own
golden parity."""

import pandas as pd
import pytest

from dqc_spark.piispans import (
    apply_spans_py,
    pii_spans,
    pii_spans_py,
    redact_spans,
)
from dqc_spark.scrub import scrub_text_py

# one planted hit per rule, plus checksum misses and overlap traps
PLANTED = [
    "reach me at alice@example.com or bob@sub.example.org today",
    "ssn 123-45-6789 on file",
    "wire to DE89 3704 0044 0532 0130 00 before friday",   # valid IBAN
    "wire to DE89 3704 0044 0532 0130 01 before friday",   # mod-97 miss
    "call (555) 123-4567 or +1 555-123-4567",
    "hosts 2001:db8::192.168.0.1 and dead:beef::cafe:1234",
    "origin 192.168.0.1 contacted 10.0.0.255",
    "card 4111 1111 1111 1111 expires soon",               # Luhn-valid
    "card 4111 1111 1111 1112 expires soon",               # Luhn miss
    "he said badword2 twice: badword2",
    # overlap trap: the SSN rule consumes it first; the phone rule must
    # NOT claim the same digits (sequential semantics)
    "id 123-45-6789 phone 123-456-7890",
    # adjacency trap: a replacement token directly abutting digits must
    # not seed a later rule's match across the boundary
    "mail a@b.co 4111 1111 1111 1111",
    "no pii here at all",
    "",
    None,
]


def test_spans_replay_matches_scrub_bytes():
    for txt in PLANTED:
        spans = pii_spans_py(txt)
        assert apply_spans_py(txt, spans) == scrub_text_py(txt), txt


def test_spans_replay_matches_scrub_on_golden_corpus():
    from dqc_spark.pagesgen import make_page

    for i in range(400):
        txt = make_page(i)["text"]
        spans = pii_spans_py(txt)
        assert apply_spans_py(txt, spans) == scrub_text_py(txt), i


def test_spans_are_original_coordinates_and_disjoint():
    txt = "a@b.co then 123-45-6789 then 192.168.0.1"
    spans = pii_spans_py(txt)
    assert [s[0] for s in spans] == ["email", "ssn", "ipv4"]
    for name, s, e, rep in spans:
        assert 0 <= s < e <= len(txt)
    for (_, _, e1, _), (_, s2, _, _) in zip(spans, spans[1:]):
        assert e1 <= s2  # sorted + non-overlapping
    # offsets index the ORIGINAL string
    assert txt[spans[1][1]:spans[1][2]] == "123-45-6789"


def test_overlap_goes_to_the_earlier_rule_only():
    spans = pii_spans_py("id 123-45-6789 done")
    assert [s[0] for s in spans] == ["ssn"]


def test_checksum_misses_record_no_span():
    assert pii_spans_py("card 4111 1111 1111 1112") == []
    assert pii_spans_py("wire DE89 3704 0044 0532 0130 01") == []


def test_rule_subset_replay():
    txt = "a@b.co and 192.168.0.1 and badword1"
    spans = pii_spans_py(txt)
    out = apply_spans_py(txt, spans, rules={"email"})
    assert out == "<EMAIL> and 192.168.0.1 and badword1"
    assert apply_spans_py(txt, spans, rules=set()) == txt


def test_spark_spans_match_python(spark):
    rows = [(i, t) for i, t in enumerate(PLANTED)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in pii_spans(df, "doc_id", "text").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rule"], r["start"], r["end"], r["replacement"]))
    for i, t in rows:
        assert sorted(got.get(i, []), key=lambda s: s[1]) == pii_spans_py(t), i


def test_redact_spans_end_to_end_byte_parity(spark):
    from dqc_spark.scrub import scrubbed_col

    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(PLANTED) if t is not None]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = pii_spans(df, "doc_id", "text")
    red = {r["doc_id"]: r["scrubbed_text"]
           for r in redact_spans(df, spans, "doc_id", "text").collect()}
    ref = {r["doc_id"]: r["ref"]
           for r in df.withColumn("ref", scrubbed_col(F.col("text")))
           .collect()}
    assert red == ref


def test_redact_spans_policy_subset(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and 192.168.0.1")], "doc_id long, text string")
    spans = pii_spans(df, "doc_id", "text")
    out = redact_spans(df, spans, "doc_id", "text",
                       rules=["ipv4"]).first()["scrubbed_text"]
    assert out == "a@b.co and <IP>"


def test_apply_spans_py_is_pure_replay():
    # a hand-written span table applies verbatim — no re-matching
    txt = "keep this secret"
    out = apply_spans_py(txt, [("custom", 5, 9, "<X>")])
    assert out == "keep <X> secret"


# ---------------------------------------------------------------------------
# hypothesis fuzz: the byte-parity invariant must hold on ADVERSARIAL
# compositions — adjacent matches, cross-rule overlap candidates,
# fragments abutting replacement-token positions, unicode filler
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_FRAGMENTS = st.sampled_from([
    "a@b.co", "x.y%z@mail.example.org",
    "123-45-6789", "078-05-1120",
    "DE89 3704 0044 0532 0130 00", "GB82WEST12345698765432",
    "DE89 3704 0044 0532 0130 01",                  # mod-97 miss
    "(555) 123-4567", "+1 555-123-4567", "555.123.4567",
    "192.168.0.1", "10.0.0.255", "999.999.999.999",
    "2001:db8::192.168.0.1", "dead:beef::cafe:1234",
    "4111 1111 1111 1111", "4111-1111-1111-1111",
    "4111 1111 1111 1112",                          # Luhn miss
    "badword1", "badword3",
    " ", "", ".", "-", ":", "@", "4111", "123-45", "x",
    "日本語テキスト", "слово", "plain words here", "a1:",
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_FRAGMENTS, min_size=0, max_size=12))
def test_fuzz_span_replay_matches_scrub(parts):
    txt = "".join(parts)
    spans = pii_spans_py(txt)
    assert apply_spans_py(txt, spans) == scrub_text_py(txt)
    # spans must be disjoint, ordered, and index the original string
    prev_end = 0
    for name, s, e, rep in spans:
        assert prev_end <= s < e <= len(txt)
        prev_end = e


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_fuzz_span_replay_on_arbitrary_text(txt):
    assert apply_spans_py(txt, pii_spans_py(txt)) == scrub_text_py(txt)


def test_stale_span_table_fails_loudly():
    # spans built from different (longer) text must not silently emit
    # shifted garbage against the current corpus
    with pytest.raises(ValueError, match="does not match this corpus"):
        apply_spans_py("short", [("email", 10, 16, "<EMAIL>")])
