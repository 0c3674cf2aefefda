"""J1 (SURVEY.md §2.3): rating normalization lookup including the
never-matching mixed-case keys quirk (reference ratings.py:118-129 +
probe lowercasing at generator/__init__.py:501-502)."""

from claimskg_generator_spark.constants.ratings import (
    normalize_rating,
    normalize_rating_fast,
    standardize_rating_label,
)


def test_standardize():
    assert standardize_rating_label(" Pants on Fire! ") == "pants on fire"
    assert standardize_rating_label("mixture:") == "mixture"
    assert standardize_rating_label("half-true") == "half true"


def test_basic_matches():
    # probe arrives lowercased (generator :501-502)
    assert normalize_rating("politifact", "pants on fire!") == "FALSE"
    assert normalize_rating("politifact", "true") == "TRUE"
    assert normalize_rating("snopes", "mixture:") == "MIXTURE"
    assert normalize_rating("truthorfiction", "truth & fiction") == "MIXTURE"


def test_never_matching_mixed_case_keys():
    # Keys stored with capitals can never match a lowercased probe -> OTHER.
    assert normalize_rating("checkyourfact", "mostly true") == "OTHER"
    assert normalize_rating("factscan", "misleading") == "OTHER"
    assert normalize_rating("factcheck_aap", "true") == "OTHER"
    assert normalize_rating("fullfact", "correct") == "OTHER"
    assert normalize_rating("factcheck_afp", "hoax") == "OTHER"
    # but all-lowercase keys of the same sites do match
    assert normalize_rating("checkyourfact", "misleading") == "MIXTURE"
    assert normalize_rating("factscan", "true") == "TRUE"


def test_dash_standardization_breaks_dash_keys():
    # 'pants-fire' and 'mostly-correct' keys contain '-', but the probe maps
    # '-' to ' ' so they can never match either.
    assert normalize_rating("politifact", "pants-fire") == "OTHER"
    assert normalize_rating("africacheck", "mostly-correct") == "OTHER"
    # 'half-true' matches via the separate 'half true' key
    assert normalize_rating("politifact", "half-true") == "MIXTURE"


def test_unknown_source_or_label():
    assert normalize_rating("unknownsite", "false") == "OTHER"
    assert normalize_rating("snopes", "完全错误") == "OTHER"


def test_fast_lookup_agrees():
    probes = [
        ("politifact", "pants on fire!"), ("snopes", "mixture:"),
        ("checkyourfact", "mostly true"), ("factscan", "misleading"),
        ("africacheck", "mostly-correct"), ("nope", "nope"),
        ("factuel_afp_fr", "plutôt vrai"), ("factuel_afp_fr", "faux"),
    ]
    for s, l in probes:
        assert normalize_rating_fast(s, l) == normalize_rating(s, l)
