"""Deterministic in-repo language resources.

No external downloads (sandbox rule): the fastText-style langid model
and the KenLM-style n-gram LM are synthesized from small public-knowledge
word lists embedded here.  The same lists drive the synthetic pages
generator (pagesgen.py), so the models genuinely discriminate on the
data the pipeline is measured on, and everything is reproducible from
the repo alone.

These stand in for the *artifacts* of the production design (a real
fastText .bin / KenLM .arpa broadcast to executors); the Spark-side
plumbing — broadcast once, score inside Arrow-batched pandas UDFs — is
identical to what a real model would use.
"""

from __future__ import annotations

import math
from collections import Counter

LANGS = ["en", "de", "es", "fr", "zh"]

WORDS: dict[str, list[str]] = {
    "en": (
        "the of and to in is that it was for on are as with his they at be "
        "this have from or one had by word but not what all were when your "
        "can said there use each which she how their time will way about "
        "many then them would write like these her long make thing see him "
        "two has look more day could come did number sound most people over"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war haben nur "
        "oder aber vor zur bis mehr durch man sein wurde sei welt jahr"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al lo "
        "como más pero sus le ya o este sí porque esta entre cuando muy sin "
        "sobre también me hasta hay donde quien desde todo nos durante todos "
        "uno les ni contra otros ese eso ante ellos e esto mí antes algunos"
    ).split(),
    "fr": (
        "de la le et les des en un du une que est pour qui dans a par plus "
        "pas au sur ne se ce il sont la avec son ses mais comme ou si leur "
        "y ont été cette aux vous nous elle deux être sans tout peut ces "
        "dont aussi fait bien où sa très votre tous faire autre après"
    ).split(),
    "zh": list("的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就下得可你年生"),
}

def _corpus_seq(words: list[str], passes: int = 20) -> list[str]:
    """Deterministic long token sequence per language: stride
    permutations of the word list (no RNG), giving ~passes*len(words)
    mostly-distinct bigrams.  Both the bigram LM and the generator's
    'clean' documents draw from this sequence, so natural documents see
    known bigrams (low perplexity) while uniform word soup does not."""
    n = len(words)
    seq: list[str] = []
    stride = 1
    for _ in range(passes):
        while __import__("math").gcd(stride, n) != 1:
            stride += 1
        seq.extend(words[(j * stride) % n] for j in range(n))
        stride += 1
    return seq


CORPUS_SEQ: dict[str, list[str]] = {}


def corpus_seq(lang: str) -> list[str]:
    if lang not in CORPUS_SEQ:
        CORPUS_SEQ[lang] = _corpus_seq(WORDS[lang])
    return CORPUS_SEQ[lang]


STOPWORDS: dict[str, set[str]] = {
    "en": set("the of and to in is that it was for on are as with be this have from or by".split()),
    "de": set("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine".split()),
    "es": set("de la que el en y a los del se las por un para con no una su al lo".split()),
    "fr": set("de la le et les des en un du une que est pour qui dans par au sur ne se".split()),
    "zh": set("的一是不了在有这也就"),
}


# langid reads at most this many chars — plenty for a trigram profile,
# and it bounds per-doc cost regardless of document size
LANGID_SAMPLE_CHARS = 512


def _trigrams(text: str) -> Counter:
    t = " " + " ".join(text.lower().split()) + " "
    return Counter(t[i : i + 3] for i in range(len(t) - 2))


def build_langid_model() -> dict:
    """Char-trigram profiles (L2-normalized), merged into a single
    {trigram: [w_lang0, ..]} table so scoring is ONE dict lookup per
    trigram instead of one per language.  Structure mirrors a
    compressed fastText model."""
    per_lang = {}
    for lang, words in WORDS.items():
        corpus = " ".join(words * 3)
        counts = _trigrams(corpus)
        norm = math.sqrt(sum(v * v for v in counts.values())) or 1.0
        per_lang[lang] = {g: v / norm for g, v in counts.items()}
    merged: dict[str, list[float]] = {}
    for li, lang in enumerate(LANGS):
        for g, w in per_lang[lang].items():
            merged.setdefault(g, [0.0] * len(LANGS))[li] = w
    return {"langs": list(LANGS), "profiles": merged}


def langid_score(text: str, model: dict) -> tuple[str, float]:
    """Predict (lang, confidence) for one document: cosine similarity of
    the doc's trigram profile (over a bounded sample) against each
    language profile.  Called per document from inside an Arrow batch."""
    counts = _trigrams((text or "")[:LANGID_SAMPLE_CHARS])
    if not counts:
        return "und", 0.0
    langs = model["langs"]
    profiles = model["profiles"]
    sims = [0.0] * len(langs)
    sq = 0.0
    for g, v in counts.items():
        sq += v * v
        w = profiles.get(g)
        if w is not None:
            for i in range(len(langs)):
                if w[i]:
                    sims[i] += w[i] * v
    norm = math.sqrt(sq) or 1.0
    best_i = max(range(len(langs)), key=lambda i: sims[i])
    total = sum(sims)
    conf = (sims[best_i] / norm) / (total / norm) if total > 0 else 0.0
    if sims[best_i] <= 0.0:
        return "und", 0.0
    return langs[best_i], conf


def build_lm() -> dict:
    """KenLM-style bigram language model with add-k smoothing, one shared
    model over all in-repo corpora (quality filtering wants 'does this
    look like natural language at all', not per-lang ppl)."""
    unigrams: Counter = Counter()
    bigrams: Counter = Counter()
    for lang in WORDS:
        seq = corpus_seq(lang)
        unigrams.update(seq)
        bigrams.update(zip(seq, seq[1:]))
    vocab = len(unigrams) + 1
    return {
        "unigrams": dict(unigrams),
        "bigrams": {f"{a}\x00{b}": c for (a, b), c in bigrams.items()},
        "total": sum(unigrams.values()),
        "vocab": vocab,
        "k": 0.1,
    }


def perplexity(text: str, lm: dict) -> float:
    """Per-document bigram perplexity with add-k smoothing.  Higher =
    less natural-language-like.  Deterministic, shared with the golden
    oracle so Spark-vs-local is a pure distribution differential."""
    tokens = (text or "").lower().split()
    if not tokens:
        return 1e9
    uni, bi = lm["unigrams"], lm["bigrams"]
    k, vocab, total = lm["k"], lm["vocab"], lm["total"]
    logp = math.log((uni.get(tokens[0], 0) + k) / (total + k * vocab))
    for a, b in zip(tokens, tokens[1:]):
        num = bi.get(f"{a}\x00{b}", 0) + k
        den = uni.get(a, 0) + k * vocab
        logp += math.log(num / den)
    return math.exp(-logp / len(tokens))
