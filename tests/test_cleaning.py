"""P1-P14 cleaning chains (SURVEY.md §2.2), pinned against hand-computed
expectations from the reference's code paths."""

from claimskg_generator_spark.functions.cleaning import (
    clean_citation_links,
    clean_rating_value,
    format_confidence_score,
    html_escape_ascii,
    normalize_label,
    normalize_text_fragment,
    original_rating_slug,
    process_json,
    row_string_value,
    split_keywords,
)


def test_null_to_empty():
    assert row_string_value(None) == ""
    assert row_string_value("") == ""
    assert row_string_value("x") == "x"


def test_normalize_text_fragment():
    # '""' -> '"' first, then '"' -> "'" (reference :140-141)
    assert normalize_text_fragment('Says ""hi"" there') == "Says 'hi' there"
    assert normalize_text_fragment('a "b" c') == "a 'b' c"


def test_normalize_label():
    assert normalize_label('  The "Claim\'s" TEXT ') == "the claims text"


def test_rating_value_cleanup():
    # strip [ ] ' , then float (reference :489-496)
    assert clean_rating_value("['3']") == 3.0
    assert clean_rating_value("[2]") == 2.0
    assert clean_rating_value(" 4 ") == 4.0
    assert clean_rating_value("") is None
    assert clean_rating_value("[',']") is None


def test_original_rating_slug():
    # lower + space/newline -> _ + char strips (reference :121-127)
    assert (
        original_rating_slug("snopes", "Mostly False", "['3']")
        == "snopes_mostly_false_3"
    )
    assert original_rating_slug("factscan", "a/b<c>d", "1") == "factscan_abcd_1"


def test_split_keywords():
    assert split_keywords("a;b,c") == ["a", "b,c"]
    assert split_keywords("a,b") == ["a", "b"]


def test_html_escape_xmlcharrefreplace():
    assert html_escape_ascii("a&b <c>") == b"a&amp;b &lt;c&gt;"
    assert html_escape_ascii("Plutôt vrai") == b"Plut&#244;t vrai"


def test_process_json_repair_and_sentinel():
    assert process_json("") == []
    assert process_json(None) == []
    assert process_json("[[][]]") == []
    assert process_json("not json at all {") is None
    assert process_json('[{"a": 1}]') == [{"a": 1}]
    # '}][]' -> '}]' repair (reference :740)
    assert process_json('[{"a": 1}][]') == [{"a": 1}]


def test_confidence_format():
    assert format_confidence_score("0.424") == "0.42"
    assert format_confidence_score("1") == "1.0"
    assert format_confidence_score("0.305") == "0.3"


def test_citation_cleanup_chain():
    # trailing char dropped; '#...' dropped; invalid dropped; self-link
    # dropped; junk chars removed; query percent-escaped; trailing '?' kept
    links = (
        "http://news1.example.com/story/1,#frag,not a url,"
        "http://www.snopes.com,https://example.org/p/9?a=1&b=2|x,"
    )
    out = clean_citation_links(links, "snopes")
    cleaned = [c for c, _ in out]
    uris = [u for _, u in out]
    assert cleaned == [
        "http://news1.example.com/story/1",
        "https://example.org/p/9?a=1&b=2|x",
    ]
    assert uris == [
        "http://news1.example.com/story/1?",
        "https://example.org/p/9?a%3D1%26b%3D2%7Cx",
    ]


def test_citation_requires_path():
    # urlparse path must be non-empty: bare domain is dropped
    assert clean_citation_links("http://ab.example.com,x", "snopes") == []
    got = clean_citation_links("http://ab.example.com/,x", "snopes")
    assert [u for _, u in got] == ["http://ab.example.com/?"]
