"""Multi-language question processing parity tests
(reference: query/ontology/multi_language.py — keyword tables, templates,
classification feeding analyze_question, ontology term extraction, and
the detect->translate orchestration with the translator as a seam)."""

import pytest

from trustgraph_spark.nllang import (
    ANSWER_TEMPLATES,
    QUESTION_TEMPLATES,
    analyze_question_multilang,
    classify_question_lang,
    format_answer,
    get_answer_template,
    get_language_specific_ontology_terms,
    get_question_patterns,
    process_multilingual_query,
    translate_answer,
)
from trustgraph_spark.nlquery import QuestionType
from trustgraph_spark.nlservice import detect_question_language


# ---------------------------------------------------------------------------
# detection matrix (multi_language.py:201-230 rule fallback)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "question,lang",
    [
        ("¿Cuántos sensores hay en el dispositivo?", "es"),
        ("¿Dónde está el sensor y cómo funciona?", "es"),
        ("Combien de capteurs sont connectés et où?", "fr"),
        ("Pourquoi et comment le capteur fonctionne?", "fr"),
        ("Wieviele Sensoren gibt es und wo sind sie, warum?", "de"),
        ("Quanti sensori ci sono e dove, perché?", "it"),
        ("Hoeveel sensoren zijn er en waar, waarom?", "nl"),
    ],
)
def test_detection_matrix(question, lang):
    got, conf = detect_question_language(question)
    assert got == lang
    assert conf > 0


def test_detection_default_on_no_hits():
    got, conf = detect_question_language("completely neutral text 123")
    assert got == "en" and conf == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# classification matrix (es/fr/de — the round-5 verdict ask #6)
# ---------------------------------------------------------------------------


CLASSIFY_MATRIX = [
    # Spanish
    ("¿Cuántos sensores hay?", "es", QuestionType.AGGREGATION),
    ("¿Es un sensor activo?", "es", QuestionType.BOOLEAN),
    ("¿Qué dispositivos existen?", "es", QuestionType.RETRIEVAL),
    ("Describe el dispositivo principal", "es", QuestionType.FACTUAL),
    ("número de dispositivos en la red", "es", QuestionType.AGGREGATION),
    # French
    ("Combien de capteurs sont connectés?", "fr", QuestionType.AGGREGATION),
    ("Est-ce que le capteur est actif?", "fr", QuestionType.BOOLEAN),
    ("Quel capteur mesure la température?", "fr", QuestionType.RETRIEVAL),
    ("Décris le dispositif principal", "fr", QuestionType.FACTUAL),
    # German
    ("Wie viele Sensoren gibt es?", "de", QuestionType.AGGREGATION),
    ("Ist der Sensor aktiv?", "de", QuestionType.BOOLEAN),
    ("Sind die Sensoren verbunden?", "de", QuestionType.BOOLEAN),
    ("Welche Sensoren sind verbunden?", "de", QuestionType.RETRIEVAL),
    ("Beschreibe das Hauptgerät", "de", QuestionType.FACTUAL),
]


@pytest.mark.parametrize("question,lang,expected", CLASSIFY_MATRIX)
def test_classification_matrix(question, lang, expected):
    assert classify_question_lang(question, lang) == expected


def test_boolean_is_start_anchored():
    # "Quel est ..." contains boolean 'est' but STARTS with retrieval
    # 'quel' — anchoring keeps it retrieval, like the English analyzer's
    # ^(is|are|...) anchor
    assert (classify_question_lang("Quel est le capteur?", "fr")
            == QuestionType.RETRIEVAL)
    assert (classify_question_lang("Est-ce que ça marche?", "fr")
            == QuestionType.BOOLEAN)


def test_unknown_language_falls_back_to_english_table():
    assert get_question_patterns("xx") == QUESTION_TEMPLATES["en"]
    assert (classify_question_lang("how many things", "xx")
            == QuestionType.AGGREGATION)


# ---------------------------------------------------------------------------
# analyze_question_multilang
# ---------------------------------------------------------------------------


def test_multilang_analysis_types_and_answer_shape():
    c = analyze_question_multilang("¿Cuántos sensores hay?", language="es")
    assert c.question_type == QuestionType.AGGREGATION
    assert c.expected_answer_type == "number"
    c = analyze_question_multilang("Ist der Sensor aktiv?", language="de")
    assert c.question_type == QuestionType.BOOLEAN
    assert c.expected_answer_type == "boolean"


def test_multilang_analysis_reuses_language_independent_parts():
    c = analyze_question_multilang(
        'Combien de capteurs pour "Zone Nord"?', language="fr")
    assert c.question_type == QuestionType.AGGREGATION
    assert "Zone Nord" in c.entities  # quoted-string extraction reused


def test_english_passthrough_is_the_plain_analyzer():
    from trustgraph_spark.nlquery import analyze_question

    q = "How many devices are connected?"
    assert analyze_question_multilang(q, language="en") == analyze_question(q)


def test_auto_detection_path():
    c = analyze_question_multilang("¿Cuántos sensores hay y dónde?")
    assert c.question_type == QuestionType.AGGREGATION


# ---------------------------------------------------------------------------
# answer templates (multi_language.py:582-656)
# ---------------------------------------------------------------------------


def test_answer_templates_all_languages():
    assert (format_answer("es", "count", count=3, entity="sensores")
            == "Hay 3 sensores.")
    assert (format_answer("fr", "boolean_true", statement="il est actif")
            == "Oui, il est actif.")
    assert (format_answer("de", "not_found")
            == "Keine Informationen gefunden.")
    assert (format_answer("en", "count", count=1, entity="device")
            == "There are 1 device.")


def test_missing_variable_degrades_to_error_template():
    assert format_answer("de", "count") == ANSWER_TEMPLATES["de"]["error"]


def test_unknown_language_and_type_fallbacks():
    assert get_answer_template("xx", "count") == ANSWER_TEMPLATES["en"]["count"]
    assert get_answer_template("es", "nope") == ANSWER_TEMPLATES["es"]["error"]


# ---------------------------------------------------------------------------
# ontology term extraction (multi_language.py:455-506)
# ---------------------------------------------------------------------------


def test_language_specific_ontology_terms():
    subset = {
        "classes": {
            "device": {"labels": [
                {"language": "es", "value": "dispositivo"},
                {"language": "en", "value": "device"},
                "plain-label",
            ]},
        },
        "object_properties": {
            "connects": {"labels": [{"language": "fr", "value": "connecte"}]},
        },
        "datatype_properties": {},
    }
    es = get_language_specific_ontology_terms(subset, "es")
    assert es["classes"]["device"]["language_labels"] == [
        "dispositivo", "plain-label"]
    # original keys preserved alongside the added language_labels
    assert "labels" in es["classes"]["device"]
    assert es["object_properties"]["connects"]["language_labels"] == []
    assert es["datatype_properties"] == {}


# ---------------------------------------------------------------------------
# orchestration with the translator seam (multi_language.py:390-453)
# ---------------------------------------------------------------------------


def _fake_translator(text, src, dest):
    return f"[{src}->{dest}] {text}"


def test_process_translates_when_confident():
    q = "¿Cuántos sensores hay y dónde están, cómo y por qué?"
    out = process_multilingual_query(q, translator=_fake_translator)
    assert out["detected_language"] == "es"
    assert out["translation_applied"] is True
    assert out["translated_question"] == f"[es->en] {q}"
    assert out["processing_language"] == "en"


def test_process_skips_translation_below_confidence():
    # one keyword hit -> confidence 1/3 < 0.7: process untranslated
    out = process_multilingual_query(
        "wo sensor?", translator=_fake_translator)
    assert out["detected_language"] == "de"
    assert out["translation_applied"] is False
    assert out["translated_question"] == "wo sensor?"


def test_process_primary_language_no_translation():
    out = process_multilingual_query(
        "How many sensors?", translator=_fake_translator)
    assert out["detected_language"] == "en"
    assert out["translation_applied"] is False


def test_translate_answer_seam_and_noop():
    assert translate_answer("Yes.", "en") == "Yes."
    assert translate_answer("Yes.", "es") == "Yes."  # no seam bound
    assert (translate_answer("Yes.", "es", translator=_fake_translator)
            == "[en->es] Yes.")


# ---------------------------------------------------------------------------
# i18n kernel (trustgraph-base/trustgraph/i18n)
# ---------------------------------------------------------------------------


class TestI18n:
    def setup_method(self):
        from trustgraph_spark.nllang import register_language_pack

        register_language_pack("en", {
            "greet": "Hello {name}", "only_en": "English only",
            "bad": 123, 42: "x",  # filtered at registration
        })
        register_language_pack("es", {"greet": "Hola {name}"})

    @pytest.mark.parametrize("raw,expected", [
        (None, "en"), ("", "en"), ("es", "es"), ("es-ES", "es"),
        ("en-US", "en"), ("pt_BR", "pt"), ("zh", "zh-cn"),
        ("zh-Hans", "zh-cn"), ("zh-TW", "zh-cn"),
        ("es-ES,es;q=0.9,en;q=0.8", "es"), ("klingon", "en"),
        ("HE-il", "he"),
    ])
    def test_normalize_language(self, raw, expected):
        from trustgraph_spark.nllang import normalize_language

        assert normalize_language(raw) == expected

    def test_translate_with_fallbacks(self):
        from trustgraph_spark.nllang import get_translator

        t = get_translator("es-ES")
        assert t.t("greet", name="Ana") == "Hola Ana"
        # missing in es -> English pack
        assert t.t("only_en") == "English only"
        # missing everywhere -> the key itself
        assert t.t("nope.key") == "nope.key"

    def test_format_failure_returns_template(self):
        from trustgraph_spark.nllang import get_translator

        assert get_translator("en").t("greet", wrong="x") == "Hello {name}"

    def test_pack_registration_filters_non_strings(self):
        from trustgraph_spark.nllang import get_language_pack

        pack = get_language_pack("en")
        assert "bad" not in pack and 42 not in pack
