"""Verbatim per-site rating normalization table.

This is *data*, reproduced exactly from the reference's normalization
dictionary (reference claimskg/generator/ratings.py:12-111).  Quirk that
must be preserved (SURVEY.md J1): the lookup probe is
``standardize(lower(label))`` (the generator lowercases the label *before*
calling normalize, reference claimskg/generator/__init__.py:501-502, and
``_standardize_name`` strips/lowers and drops ``!``/``:`` and maps ``-`` to
space, reference ratings.py:114-115) but the dictionary keys keep their
original case — so keys that are not already lowercase (e.g. checkyourfact
'Mostly True', factscan 'Misleading', factcheck_aap, factcheck_afp,
fullfact entries, the uppercase snopes labels) can never match and fall
through to OTHER.  We therefore store keys verbatim and perform the same
exact-match lookup.
"""

NORMALIZED_RATING_VALUES = {
    "FALSE": 1,
    "MIXTURE": 2,
    "TRUE": 3,
    "OTHER": -1,
}

# (source, original_label_key_verbatim, normalized_name)
RATING_NORMALIZATION_ROWS = [
    ("politifact", "incorrect", "FALSE"),
    ("politifact", "pants-fire", "FALSE"),
    ("politifact", "pants on fire", "FALSE"),
    ("politifact", "pants on fire!", "FALSE"),
    ("politifact", "false", "FALSE"),
    ("politifact", "mostly correct", "MIXTURE"),
    ("politifact", "mostly false", "MIXTURE"),
    ("politifact", "barely true", "MIXTURE"),
    ("politifact", "half true", "MIXTURE"),
    ("politifact", "half-true", "MIXTURE"),
    ("politifact", "mostly true", "MIXTURE"),
    ("politifact", "true", "TRUE"),
    ("politifact", "correct", "TRUE"),
    ("snopes", "false", "FALSE"),
    ("snopes", "legend", "FALSE"),
    ("snopes", "mixture", "MIXTURE"),
    ("snopes", "mixture:", "MIXTURE"),
    ("snopes", "true", "TRUE"),
    ("snopes", "mostly false", "MIXTURE"),
    ("snopes", "mostly true", "MIXTURE"),
    ("snopes", "partly true", "MIXTURE"),
    ("snopes", "MIXTURE OF TRUE AND FALSE INFORMATION", "MIXTURE"),
    ("snopes", "MIXTURE OF TRUE AND FALSE INFORMATION:", "MIXTURE"),
    ("snopes", "MIXTURE OF ACCURATE AND  INACCURATE INFORMATION", "MIXTURE"),
    ("africacheck", "incorrect", "FALSE"),
    ("africacheck", "mostly-correct", "MIXTURE"),
    ("africacheck", "correct", "TRUE"),
    ("factscan", "false", "FALSE"),
    ("factscan", "true", "TRUE"),
    ("factscan", "Misleading", "OTHER"),
    ("truthorfiction", "fiction", "FALSE"),
    ("truthorfiction", "truth", "TRUE"),
    ("truthorfiction", "truth & fiction", "MIXTURE"),
    ("truthorfiction", "mostly fiction", "MIXTURE"),
    ("truthorfiction", "truth & misleading", "MIXTURE"),
    ("truthorfiction", "mostly truth", "MIXTURE"),
    ("checkyourfact", "False", "FALSE"),
    ("checkyourfact", "True", "TRUE"),
    ("checkyourfact", "Mostly True", "MIXTURE"),
    ("checkyourfact", "true/false", "MIXTURE"),
    ("checkyourfact", "truth & misleading", "MIXTURE"),
    ("checkyourfact", "mostly truth", "MIXTURE"),
    ("checkyourfact", "misleading", "MIXTURE"),
    ("factcheck_aap", "True", "TRUE"),
    ("factcheck_aap", "False", "FALSE"),
    ("factcheck_aap", "Mostly True", "MIXTURE"),
    ("factcheck_aap", "Mostly False", "MIXTURE"),
    ("factcheck_aap", "Somewhat True", "MIXTURE"),
    ("factcheck_aap", "Somewhat False", "MIXTURE"),
    ("factuel_afp_fr", "Faux", "FALSE"),
    ("factuel_afp_fr", "Totalement faux", "FALSE"),
    ("factuel_afp_fr", "Démenti", "FALSE"),
    ("factuel_afp_fr", "C'est une oeuvre de fiction", "FALSE"),
    ("factuel_afp_fr", "Vrai", "TRUE"),
    ("factuel_afp_fr", "Totalement Vrai", "TRUE"),
    ("factuel_afp_fr", "Plutôt vrai", "MIXTURE"),
    ("factuel_afp_fr", "Trompeur", "MIXTURE"),
    ("factuel_afp_fr", "trompeur", "MIXTURE"),
    ("factuel_afp_fr", "Plutôt faux", "MIXTURE"),
    ("factuel_afp_fr", "Presque", "MIXTURE"),
    ("factuel_afp_fr", "Mélangé", "MIXTURE"),
    ("factuel_afp_fr", "Mélange", "MIXTURE"),
    ("factuel_afp_fr", "Inexact", "MIXTURE"),
    ("factuel_afp_fr", "Incertain", "MIXTURE"),
    ("factuel_afp_fr", "Imprécis", "MIXTURE"),
    ("factuel_afp_fr", "Exagéré", "MIXTURE"),
    ("factuel_afp_fr", "Douteux", "MIXTURE"),
    ("factcheck_afp", "False", "FALSE"),
    ("factcheck_afp", "Fake", "FALSE"),
    ("factcheck_afp", "Mixed", "MIXTURE"),
    ("factcheck_afp", "Hoax", "FALSE"),
    ("factcheck_afp", "Falso", "FALSE"),
    ("factcheck_afp", "APRIL FOOL", "FALSE"),
    ("fullfact", "Correct", "TRUE"),
    ("fullfact", "Incorrect", "FALSE"),
    ("fullfact", "Not quite", "MIXTURE"),
]


def standardize_rating_label(label: str) -> str:
    """Probe-side label standardization (reference ratings.py:114-115)."""
    return (
        label.strip().lower().replace("!", "").replace(":", "").replace("-", " ")
    )


def normalize_rating(source_lower: str, label_lower: str) -> str:
    """Exact-match lookup, miss -> OTHER (reference ratings.py:118-129).

    Both arguments arrive pre-lowercased, matching the call site at
    reference claimskg/generator/__init__.py:501-502.
    """
    probe = standardize_rating_label(label_lower)
    for src, key, name in RATING_NORMALIZATION_ROWS:
        if src == source_lower and key == probe:
            return name
    return "OTHER"


_LOOKUP = {(s, k): n for s, k, n in RATING_NORMALIZATION_ROWS}


def normalize_rating_fast(source_lower: str, label_lower: str) -> str:
    return _LOOKUP.get((source_lower, standardize_rating_label(label_lower)), "OTHER")
