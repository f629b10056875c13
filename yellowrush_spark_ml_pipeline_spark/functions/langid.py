"""Character-trigram-profile language identification — a real model for
the ``language_id(scorer=...)`` pandas-UDF slot (operators/textstats.py).

The stopword-marker heuristic in ``textstats`` is the zero-Python fast
path; this module is the model path: per-language character-trigram
profiles (Cavnar–Trenkle n-gram text categorization, the same family
fastText/CLD3 refine) scored by cosine similarity. It is dependency-free
(numpy only), deterministic, and trains in milliseconds from the small
embedded seed corpus — swap ``train_profiles`` onto real labeled data to
scale accuracy without touching the Spark plumbing.

Execution shape: the scorer callable is shipped in the task closure and
runs inside an Arrow-batched pandas UDF — one Python boundary, amortized
per batch. Profiles here are a few KB; for MB-scale models load lazily
inside the callable with a module-level cache (documented at the slot).
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterable, Mapping

# Seed corpus: a handful of ordinary sentences per language (original
# text, common function words dominate the trigram mass — which is
# exactly what distinguishes languages at the character level).
SEED_CORPUS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "into the forest where the other animals are waiting for the "
        "rain to stop because they want to play in the open field "
        "this is the kind of sentence that people write every day "
        "the table has a key and a value for each row so the query "
        "can join the data and sort it fast with a hash of the part"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso y luego "
        "corre hacia el bosque donde los otros animales estan esperando "
        "que pare la lluvia porque quieren jugar en el campo abierto "
        "esta es la clase de frase que la gente escribe cada dia"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und "
        "läuft dann in den wald wo die anderen tiere darauf warten dass "
        "der regen aufhört weil sie auf dem offenen feld spielen wollen "
        "das ist die art von satz die die leute jeden tag schreiben"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et "
        "court ensuite dans la forêt où les autres animaux attendent "
        "que la pluie cesse parce qu'ils veulent jouer dans le champ "
        "c'est le genre de phrase que les gens écrivent chaque jour"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了那只懒狗然后跑进森林里其他动物正在等待"
        "雨停因为它们想在开阔的田野里玩耍这是人们每天都会写的那种句子"
        "我们有很多不同的词语和表达方式来描述这个世界"
    ),
}


def _trigrams(text: str) -> Counter:
    """Mixed 1/2/3-gram counts. Trigrams carry the Latin-script signal
    (function-word interiors); uni/bigrams carry the CJK signal, where a
    small profile corpus shares few exact 3-char runs but single hanzi
    are already highly language-specific."""
    t = " ".join(text.lower().split())
    grams: Counter = Counter()
    for n in (1, 2, 3):
        grams.update(t[i : i + n] for i in range(max(len(t) - n + 1, 1)))
    grams.pop(" ", None)
    return grams


def _normalize(counts: Counter) -> dict[str, float]:
    norm = math.sqrt(sum(c * c for c in counts.values())) or 1.0
    return {g: c / norm for g, c in counts.items()}


def train_profiles(
    corpus: Mapping[str, str] | Mapping[str, Iterable[str]] = SEED_CORPUS,
) -> dict[str, dict[str, float]]:
    """L2-normalized trigram weight vectors per language. Values may be
    one string or an iterable of documents per language."""
    out = {}
    for lang, texts in corpus.items():
        if isinstance(texts, str):
            texts = [texts]
        counts = Counter()
        for t in texts:
            counts.update(_trigrams(t))
        out[lang] = _normalize(counts)
    return out


def classify(text: str, profiles: Mapping[str, Mapping[str, float]]) -> str:
    """Cosine argmax over language profiles; ties break lexicographically
    (deterministic). Empty/degenerate text → 'und' (undetermined)."""
    vec = _normalize(_trigrams(text or ""))
    best_lang, best_score = "und", 0.0
    for lang in sorted(profiles):
        prof = profiles[lang]
        score = sum(w * prof.get(g, 0.0) for g, w in vec.items())
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def ngram_profile_scorer(
    profiles: Mapping[str, Mapping[str, float]] | None = None,
):
    """Factory for the ``language_id(scorer=...)`` slot: returns a
    pd.Series → pd.Series callable closed over the (small) profile dict."""
    profs = dict(profiles) if profiles is not None else train_profiles()

    def _score(texts):
        return texts.fillna("").map(lambda t: classify(t, profs))

    return _score
