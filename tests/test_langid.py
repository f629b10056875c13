"""Trigram-profile language ID (functions/langid.py): classification on
planted multilingual text, the scorer slot plumbing, and corpus accuracy
vs the labeled lang column."""

from __future__ import annotations

from yellowrush_spark_ml_pipeline_spark.functions import langid
from yellowrush_spark_ml_pipeline_spark.operators import textstats
from yellowrush_spark_ml_pipeline_spark.sources import load_table

PLANTED = {
    "en": "the children walked to the school because the morning was bright",
    "es": "los niños caminaron hacia la escuela porque la mañana era clara",
    "de": "die kinder gingen zur schule weil der morgen hell und schön war",
    "fr": "les enfants marchaient vers l'école parce que le matin était clair",
    "zh": "孩子们早上走路去学校因为天气很好他们一路说说笑笑",
}


def test_classify_planted_sentences():
    profiles = langid.train_profiles()
    for lang, text in PLANTED.items():
        assert langid.classify(text, profiles) == lang, (lang, text)


def test_classify_degenerate_inputs():
    profiles = langid.train_profiles()
    assert langid.classify("", profiles) == "und"
    assert langid.classify("12345 67890", profiles) in {"und", *profiles}


def test_scorer_slot_plumbing(spark):
    """The factory's callable flows through language_id's pandas-UDF slot:
    same output schema as the heuristic path, correct per-row labels."""
    rows = [(i, t) for i, t in enumerate(PLANTED.values())]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = textstats.language_id(df, scorer=langid.ngram_profile_scorer())
    assert out.columns == ["doc_id", "text", "lang_pred"]
    got = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert got == {i: lang for i, lang in enumerate(PLANTED)}


def test_model_on_corpus_deterministic_and_in_domain(spark, sf_oracle):
    """The documents table's text is synthetic word salad (its lang
    LABELS do not describe the text — planted sentences above are the
    accuracy gate). Here: the model path runs over the full corpus,
    emits only known labels, and is deterministic across runs."""
    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text")
    scored = textstats.language_id(docs, scorer=langid.ngram_profile_scorer())
    rows = scored.select("doc_id", "lang_pred").collect()
    labels = {r["lang_pred"] for r in rows}
    assert labels <= {"und", *langid.SEED_CORPUS}
    again = textstats.language_id(docs, scorer=langid.ngram_profile_scorer())
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, again.select("doc_id", "lang_pred").collect())
    )
