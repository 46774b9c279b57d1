"""Temperature-weighted source mixing: rate math vs a pure-Python model,
determinism, and the no-upsampling invariant."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dqc_spark.mixing import BUCKETS, source_mix_rates, temperature_sample


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # heavily skewed: src_hot 800 docs, src_mid 150, src_rare 50
    rows = []
    i = 0
    for src, n in [("src_hot", 800), ("src_mid", 150), ("src_rare", 50)]:
        for _ in range(n):
            rows.append((i, src, f"doc {i} body"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _py_rates(counts: dict, alpha: float) -> dict:
    total = sum(counts.values())
    w = {s: (n / total) ** alpha for s, n in counts.items()}
    ws = sum(w.values())
    tgt = {s: x / ws for s, x in w.items()}
    budget = min(counts[s] / tgt[s] for s in counts)
    return {s: min(1.0, tgt[s] * budget / counts[s]) for s in counts}


def test_source_mix_rates_match_python(spark, skewed_docs):
    counts = {"src_hot": 800, "src_mid": 150, "src_rare": 50}
    for alpha in (0.0, 0.5, 1.0):
        got = {
            r["source"]: r["keep_rate"]
            for r in source_mix_rates(skewed_docs, alpha=alpha).collect()
        }
        want = _py_rates(counts, alpha)
        for s in counts:
            assert got[s] == pytest.approx(want[s], rel=1e-12), (alpha, s)
    # alpha=1 is a no-op mix: every source kept whole
    got1 = {
        r["source"]: r["keep_rate"]
        for r in source_mix_rates(skewed_docs, alpha=1.0).collect()
    }
    assert all(v == pytest.approx(1.0) for v in got1.values())


def test_temperature_sample_realizes_flatter_mix(spark, skewed_docs):
    out = temperature_sample(skewed_docs, alpha=0.5)
    kept = {r["source"]: 0 for r in out.select("source").distinct().collect()}
    for r in out.groupBy("source").count().collect():
        kept[r["source"]] = r["count"]
    # rare source kept whole (it is the binding source), hot source cut
    assert kept["src_rare"] == 50
    assert kept["src_hot"] < 800
    # realized shares approach the sqrt-flattened targets (hash noise
    # is ~1/sqrt(n); allow generous slack)
    total = sum(kept.values())
    want = _py_rates({"src_hot": 800, "src_mid": 150, "src_rare": 50}, 0.5)
    exp_hot = 800 * want["src_hot"]
    assert abs(kept["src_hot"] - exp_hot) / exp_hot < 0.15


def test_temperature_sample_keeps_null_source_rows(spark):
    rows = [(i, "hot", "t") for i in range(90)] + [
        (100 + i, None, "t") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_sample(df, alpha=0.5)
    # NULL is its own (rare, binding) source: kept whole, never dropped
    n_null = out.filter(F.col("source").isNull()).count()
    assert n_null == 10
    rates = {
        r["source"]: r["keep_rate"]
        for r in source_mix_rates(df, alpha=0.5).collect()
    }
    assert rates[None] == pytest.approx(1.0)


def test_temperature_sample_deterministic_and_no_duplicates(spark, skewed_docs):
    a = sorted(r["doc_id"] for r in temperature_sample(skewed_docs).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(skewed_docs.repartition(7)).collect()
    )
    assert a == b  # layout-independent
    assert len(a) == len(set(a))  # subsample only, never duplicates


# ---------------------------------------------------------------------------
# epoch-expansion mixing (materialized upsampling)
# ---------------------------------------------------------------------------

from dqc_spark.mixing import epoch_expand, epoch_mix_plan  # noqa: E402


def _py_plan(counts: dict, alpha: float, budget=None, max_epochs=None) -> dict:
    """Pure-python twin of epoch_mix_plan (quota/epochs/threshold).
    ``counts`` maps source -> unit total (docs, or token sums when the
    Spark side passes weight_col)."""
    total = sum(counts.values())
    w = {s: (n / total) ** alpha for s, n in counts.items()}
    ws = sum(w.values())
    b = float(budget if budget is not None else total)
    out = {}
    # zero-unit sources carry zero weight even at alpha=0 (pow(0,0)=1)
    w = {s: (x if counts[s] > 0 else 0.0) for s, x in w.items()}
    ws = sum(w.values())
    for s, n in counts.items():
        # python round() is half-even; Spark F.round is HALF_UP — match
        # Spark with floor(x + 0.5) (quota floats are way off .5 here,
        # but the twin should encode the rule it claims to mirror)
        quota = math.floor(w[s] / ws * b + 0.5)
        epochs = quota // n if n > 0 else 0
        if max_epochs is not None and epochs >= max_epochs:
            quota = max_epochs * n
            epochs = max_epochs
        out[s] = {
            "quota": quota,
            "epochs": epochs,
            "partial_thr": ((quota - epochs * n) * BUCKETS) // n if n > 0 else 0,
        }
    return out


def _bucket(key) -> int:
    h = hashlib.md5(str(key).encode()).hexdigest()[:8]
    return int(h, 16) % BUCKETS


def test_epoch_mix_plan_matches_python(spark, skewed_docs):
    counts = {"src_hot": 800, "src_mid": 150, "src_rare": 50}
    for alpha in (0.0, 0.5, 1.0):
        got = {r["source"]: r for r in
               epoch_mix_plan(skewed_docs, alpha=alpha).collect()}
        want = _py_plan(counts, alpha)
        for s in counts:
            for k in ("quota", "epochs", "partial_thr"):
                assert got[s][k] == want[s][k], (alpha, s, k)
    # alpha=1 at the default budget is a no-op mix: one full epoch each
    for r in epoch_mix_plan(skewed_docs, alpha=1.0).collect():
        assert r["epochs"] == 1 and r["partial_thr"] == 0


def test_epoch_expand_realizes_plan_exactly(spark, skewed_docs):
    plan = {r["source"]: r for r in
            epoch_mix_plan(skewed_docs, alpha=0.5).collect()}
    out = epoch_expand(skewed_docs, alpha=0.5)
    rows = out.collect()
    counts = {"src_hot": 800, "src_mid": 150, "src_rare": 50}
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for s, n in counts.items():
        p = plan[s]
        mine = per_src[s]
        # full epochs: every doc once per epoch index 0..epochs-1
        for e in range(p["epochs"]):
            assert sum(1 for r in mine if r["epoch"] == e) == n, (s, e)
        # partial pass: exactly the hash-selected docs, epoch == epochs
        part = [r for r in mine if r["epoch"] == p["epochs"]]
        want_part = [i for i in range(counts[s])
                     if _bucket(_doc_id(s, i)) < p["partial_thr"]]
        assert len(part) == len(want_part), s
        assert len(mine) == p["epochs"] * n + len(want_part)
    # the flattened mix actually upsamples the rare source and cuts hot
    assert len(per_src["src_rare"]) > 50
    assert len(per_src["src_hot"]) < 800


def _doc_id(src: str, i: int) -> int:
    # mirror the skewed_docs fixture's id assignment
    base = {"src_hot": 0, "src_mid": 800, "src_rare": 950}[src]
    return base + i


def test_epoch_expand_deterministic_and_partition_invariant(spark, skewed_docs):
    a = sorted((r["doc_id"], r["epoch"]) for r in
               epoch_expand(skewed_docs, alpha=0.5).collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in
               epoch_expand(skewed_docs.repartition(13), alpha=0.5).collect())
    assert a == b
    # (doc, epoch) is a key: no duplicates
    assert len(a) == len(set(a))


def test_epoch_expand_max_epochs_cap_and_null_source(spark):
    rows = [(i, "big" if i < 90 else None, f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = epoch_expand(df, alpha=0.0, budget_docs=100_000, max_epochs=2)
    got = {r["source"]: r["count"] for r in
           out.groupBy("source").count().collect()}
    # capped: exactly max_epochs full passes, no partial
    assert got["big"] == 2 * 90
    assert got[None] == 2 * 10  # NULL source is a source and flows through
    assert out.agg(F.max("epoch")).first()[0] == 1


def test_epoch_expand_validation(spark, skewed_docs):
    with pytest.raises(ValueError, match="max_epochs"):
        epoch_mix_plan(skewed_docs, max_epochs=0)
    with pytest.raises(ValueError, match="budget_docs"):
        epoch_mix_plan(skewed_docs, budget_docs=0)


def test_epoch_mix_plan_token_budget(spark):
    # token-weighted units: 'big' has few docs but most tokens; the
    # plan must budget over the weight sums, not the doc counts
    rows = [(i, "big", f"t{i}", 1000) for i in range(10)]
    rows += [(100 + i, "small", f"s{i}", 10) for i in range(50)]
    rows += [(999, "empty", "e", None)]  # NULL weights sum to 0
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_tok long")
    got = {r["source"]: r for r in
           epoch_mix_plan(df, alpha=0.5, weight_col="n_tok").collect()}
    assert got["big"]["n_docs"] == 10 and got["big"]["n_units"] == 10_000
    assert got["small"]["n_units"] == 500
    want = _py_plan({"big": 10_000, "small": 500, "empty": 0}, 0.5,
                    budget=10_500)
    for s in ("big", "small", "empty"):
        for k in ("quota", "epochs", "partial_thr"):
            assert got[s][k] == want[s][k], (s, k)
    # zero-unit source plans zero epochs instead of erroring, and
    # emits nothing when expanded
    assert got["empty"]["epochs"] == 0 and got["empty"]["partial_thr"] == 0
    out = epoch_expand(df, alpha=0.5, weight_col="n_tok")
    assert out.filter("source = 'empty'").count() == 0
    # sqrt flattening upsamples the token-poor source
    assert out.filter("source = 'small'").count() > 50


def test_epoch_expand_survives_colliding_caller_columns(spark):
    # caller columns named 'epochs'/'partial_thr' must pass through
    # untouched (internals are __-prefixed)
    rows = [(i, "s", f"t{i}", 7, 8) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, "
              "epochs int, partial_thr int")
    out = epoch_expand(df, alpha=1.0)
    assert {"epochs", "partial_thr", "epoch"} <= set(out.columns)
    r = out.first()
    assert r["epochs"] == 7 and r["partial_thr"] == 8


def test_epoch_plan_zero_weight_source_does_not_deflate_quota(spark):
    # pow(0,0)=1: at alpha=0 a zero-token source must NOT claim a quota
    # share it can never emit — renormalized over emitting sources
    rows = [(i, "real", f"t{i}", 10) for i in range(10)]
    rows += [(99, "ghost", "g", None)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_tok long")
    got = {r["source"]: r for r in
           epoch_mix_plan(df, alpha=0.0, weight_col="n_tok").collect()}
    assert got["ghost"]["quota"] == 0
    assert got["real"]["quota"] == 100  # the whole budget, not half
    assert got["real"]["epochs"] == 1 and got["real"]["partial_thr"] == 0
