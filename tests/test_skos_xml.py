"""S3: SKOS RDF/XML ingestion — a 10-concept fixture in both SKOS-XL and
plain-SKOS serializations must produce the same matcher behavior as the
equivalent dict entries."""

import os
import tempfile

from claimskg_generator_spark.sources.skos_xml import (
    entries_from_skos_xml,
    parse_skos_pairs,
)
from claimskg_generator_spark.sources.thesaurus import build_matchers

_CONCEPTS = [
    ("http://lod.gesis.org/thesoz/concept/1", "climate change"),
    ("http://lod.gesis.org/thesoz/concept/2", "health care"),
    ("http://lod.gesis.org/thesoz/concept/3", "economy"),
    ("http://lod.gesis.org/thesoz/concept/4", "taxes"),
    ("http://lod.gesis.org/thesoz/concept/5", "immigration"),
    ("http://lod.gesis.org/thesoz/concept/6", "education policy"),
    ("http://lod.gesis.org/thesoz/concept/7", "social security"),
    ("http://lod.gesis.org/thesoz/concept/8", "minimum wage"),
    ("http://lod.gesis.org/thesoz/concept/9", "energie"),   # fr label below
    ("http://lod.gesis.org/thesoz/concept/10", "voting rights"),
]


def _write(content: str) -> str:
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".xml", delete=False, encoding="utf-8"
    )
    f.write(content)
    f.close()
    return f.name


def _skosxl_xml() -> str:
    # SKOS-XL: labels as separate rdf:Description nodes referenced by
    # rdf:resource (the thesoz serialization shape), plus one inline Label
    # and one German label that must be filtered out.
    nodes = []
    for i, (uri, label) in enumerate(_CONCEPTS):
        lang = "fr" if label == "energie" else "en"
        if i == 0:  # inline label node
            nodes.append(f"""
  <rdf:Description rdf:about="{uri}">
    <rdf:type rdf:resource="http://www.w3.org/2004/02/skos/core#Concept"/>
    <skosxl:prefLabel>
      <skosxl:Label rdf:about="{uri}/label">
        <skosxl:literalForm xml:lang="{lang}">{label}</skosxl:literalForm>
        <skosxl:literalForm xml:lang="de">Klimawandel</skosxl:literalForm>
      </skosxl:Label>
    </skosxl:prefLabel>
  </rdf:Description>""")
        else:  # referenced label node
            nodes.append(f"""
  <rdf:Description rdf:about="{uri}">
    <rdf:type rdf:resource="http://www.w3.org/2004/02/skos/core#Concept"/>
    <skosxl:prefLabel rdf:resource="{uri}/label"/>
  </rdf:Description>
  <rdf:Description rdf:about="{uri}/label">
    <skosxl:literalForm xml:lang="{lang}">{label}</skosxl:literalForm>
  </rdf:Description>""")
    return ("""<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#"
         xmlns:skosxl="http://www.w3.org/2008/05/skos-xl#">"""
            + "".join(nodes) + "\n</rdf:RDF>\n")


def _plain_skos_xml() -> str:
    nodes = []
    for uri, label in _CONCEPTS:
        lang = "fr" if label == "energie" else "en"
        nodes.append(f"""
  <skos:Concept rdf:about="{uri}">
    <skos:prefLabel xml:lang="{lang}">{label}</skos:prefLabel>
    <skos:altLabel xml:lang="en">alt {label}</skos:altLabel>
    <skos:prefLabel xml:lang="de">verboten</skos:prefLabel>
  </skos:Concept>""")
    return ("""<?xml version="1.0" encoding="UTF-8"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:skos="http://www.w3.org/2004/02/skos/core#">"""
            + "".join(nodes) + "\n</rdf:RDF>\n")


def test_skosxl_pairs_and_quirk():
    path = _write(_skosxl_xml())
    try:
        pairs = parse_skos_pairs(path, skos_xl_labels=True)
    finally:
        os.unlink(path)
    # every (concept, en|fr prefLabel) appears TWICE (reference quirk:
    # the alt query is a copy of the pref query); no German labels
    want_once = sorted(_CONCEPTS)
    assert sorted(set(pairs)) == want_once
    assert sorted(pairs) == sorted(want_once + want_once)


def test_plain_skos_pairs():
    path = _write(_plain_skos_xml())
    try:
        pairs = parse_skos_pairs(path, skos_xl_labels=False)
    finally:
        os.unlink(path)
    want = sorted(_CONCEPTS) + sorted(
        (u, f"alt {label}") for u, label in _CONCEPTS
    )
    assert sorted(pairs) == sorted(want)


def test_xml_entries_build_same_matcher_as_dict_entries():
    path = _write(_skosxl_xml())
    try:
        xml_entries = entries_from_skos_xml(path, "thesoz")
    finally:
        os.unlink(path)
    dict_entries = [
        {"concept_uri": u, "label": l, "vocab": "thesoz"}
        for u, l in _CONCEPTS
    ]
    m_xml = build_matchers(xml_entries)["thesoz"]
    m_dict = build_matchers(dict_entries)["thesoz"]
    for kw in ["climate change", "health care", "minimum wage",
               "education policy", "not a concept"]:
        assert m_xml.find_keyword_matches(kw) == m_dict.find_keyword_matches(kw)
