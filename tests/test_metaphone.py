"""P19 (SURVEY.md §2): Double Metaphone phonetic codes and the
phone-keyed PhraseMatcher mode (reference
InterDoubleMetaphoneConceptRecognizer, intersection_recognizers.py:13)."""

from claimskg_generator_spark.functions.metaphone import (
    doublemetaphone,
    metaphone_key,
)
from claimskg_generator_spark.functions.textmatch import PhraseMatcher

# Published Double Metaphone vectors (Philips 2000 and the widely-copied
# test suites of the public implementations).
DM_VECTORS = {
    "smith": ("SM0", "XMT"),
    "schmidt": ("XMT", "SMT"),
    "school": ("SKL", "SKL"),
    "philip": ("FLP", "FLP"),
    "wright": ("RT", "RT"),
    "jose": ("HS", "HS"),
    "xavier": ("SF", "SFR"),
    "dumb": ("TM", "TM"),
    "caesar": ("SSR", "SSR"),
    "chianti": ("KNT", "KNT"),
    "michael": ("MKL", "MXL"),
    "ghost": ("KST", "KST"),
    "knight": ("NT", "NT"),
    "island": ("ALNT", "ALNT"),
    "sugar": ("XKR", "SKR"),
    "thomas": ("TMS", "TMS"),
    "wasserman": ("ASRMN", "FSRMN"),
    "vasserman": ("FSRMN", "FSRMN"),
    "filipowicz": ("FLPTS", "FLPFX"),
    "zhao": ("J", "J"),
    "rogier": ("RJ", "RJR"),
    "cabrillo": ("KPRL", "KPR"),
    "edge": ("AJ", "AJ"),
    "edgar": ("ATKR", "ATKR"),
    "accident": ("AKSTNT", "AKSTNT"),
    "laugh": ("LF", "LF"),
    "agnes": ("AKNS", "ANS"),
    "nation": ("NXN", "NXN"),
    "catherine": ("K0RN", "KTRN"),
    "katherine": ("K0RN", "KTRN"),
    "arnow": ("ARN", "ARNF"),
    "danger": ("TNJR", "TNKR"),
}


def test_doublemetaphone_vectors():
    for word, want in DM_VECTORS.items():
        assert doublemetaphone(word) == want, word


def test_doublemetaphone_case_and_edge_inputs():
    assert doublemetaphone("SMITH") == doublemetaphone("smith")
    assert doublemetaphone("") == ("", "")
    assert doublemetaphone("123") == ("", "")
    # Non-letters contribute nothing but do not crash.
    assert doublemetaphone("o'brien") == doublemetaphone("obrien")


def test_metaphone_key_is_primary():
    assert metaphone_key("smith") == "SM0"
    assert metaphone_key("smyth") == metaphone_key("smith")


def test_phone_keyed_matcher_catches_spelling_variants():
    # 'smyth'/'smith' and 'catherine'/'katherine' share phones but not
    # stems: the phone-keyed matcher (reference
    # InterDoubleMetaphone recognizer) matches where the stem one cannot.
    entries = [("c1", "smith college"), ("c2", "katherine")]
    phone = PhraseMatcher(entries, key_fn=metaphone_key)
    stem = PhraseMatcher(entries)
    assert [g[0] for g in phone.find_keyword_matches("smyth college")] == ["c1"]
    assert stem.find_keyword_matches("smyth college") == []
    assert [g[0] for g in phone.find_keyword_matches("catherine")] == ["c2"]


def test_phone_keyed_matcher_same_loop_semantics():
    # Identical spellings match under both keys — the matcher loop
    # (stopword skips, termination stops, full-span filter) is shared.
    entries = [("c1", "climate change"), ("c2", "climate")]
    phone = PhraseMatcher(entries, key_fn=metaphone_key)
    got = phone.find_keyword_matches("climate change")
    assert ("c1", "climate change", 0, 14) in got
    assert [g[0] for g in phone.find_keyword_matches("climate")] == ["c2"]
