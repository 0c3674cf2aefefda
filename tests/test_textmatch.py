"""J3/P18/P20 (SURVEY.md §2): Porter stemming, span tokenization, and the
greedy dictionary phrase matcher."""

from claimskg_generator_spark.functions.textmatch import (
    PhraseMatcher,
    double_stem,
    porter_stem,
    span_tokenize,
)

PORTER_VECTORS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "motoring": "motor",
    "sing": "sing",
    "hopping": "hop",
    "falling": "fall",
    "happy": "happi",
    "relational": "relat",
    "adjustable": "adjust",
    "taxation": "taxat",
    "elections": "elect",
    "economic": "econom",
    "policies": "polici",
}


def test_porter_known_answers():
    for word, stem in PORTER_VECTORS.items():
        assert porter_stem(word) == stem, word


def test_double_stem_idempotent_enough():
    for word in PORTER_VECTORS:
        assert double_stem(word) == porter_stem(porter_stem(word))


def test_span_tokenize():
    text = "climate change, now!"
    spans = span_tokenize(text)
    tokens = [text[b:e] for b, e in spans]
    assert tokens == ["climate", "change", ",", "now", "!"]


def _matcher():
    return PhraseMatcher(
        [
            ("c1", "climate change"),
            ("c2", "climate"),
            ("c3", "health care"),
            ("c4", "taxation"),
            ("c5", "economic policy"),
        ]
    )


def test_exact_phrase_match():
    m = _matcher()
    got = m.find_keyword_matches("climate change")
    assert ("c1", "climate change", 0, 14) in got
    # single-token concept c2 has token count 1 but the greedy span covers
    # both tokens (matched_length 2) -> filtered out for the full phrase;
    # it still matches the bare keyword:
    assert [g[0] for g in m.find_keyword_matches("climate")] == ["c2"]


def test_stem_convergence():
    m = _matcher()
    # 'taxes' double-stems to the same root as 'taxation'? They differ:
    # tax vs taxat -> no match expected.
    assert m.find_keyword_matches("taxes") == []
    assert [g[0] for g in m.find_keyword_matches("taxation")] == ["c4"]
    # inflected forms converge: 'economic policies' ~ 'economic policy'
    got = m.find_keyword_matches("economic policies")
    assert [g[0] for g in got] == ["c5"]


def test_full_span_filter():
    m = _matcher()
    # matcher-internal annotation exists for 'climate change' inside the
    # longer keyword, but find_keyword_matches requires the whole keyword
    # span (reference skosthesaurusmatcher.py:80-83).
    assert m.find_keyword_matches("global climate change effects") == []
    ann = m.recognize("global climate change effects")
    assert any(a[0] == "c1" for a in ann)


def test_stopword_skip_inside_phrase():
    m = PhraseMatcher([("c9", "balance payments")])
    # 'of' is a reference stopword: skipped mid-span, so
    # "balance of payments" still matches concept c9 end-to-end.
    ann = m.recognize("balance of payments")
    assert [a[0] for a in ann] == ["c9"]
    assert ann[0][1] == 0 and ann[0][2] == len("balance of payments")
    # 'the' is in the termination list (checked before the stopword list,
    # reference intersection_recognizers.py:257-263) -> hard stop, no match.
    assert m.recognize("balance of the payments") == []


def test_termination_term_stops_match():
    m = PhraseMatcher([("c9", "balance payments")])
    assert m.recognize("balance and payments") == []
