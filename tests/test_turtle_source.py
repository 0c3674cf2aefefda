"""S4: Turtle source for the DBpedia categories SKOS graph.

Reference behavior: claimskg/generator/__init__.py:158 unions the whole
categories ``.ttl`` into the output graph; this pins our from-scratch
Turtle-subset parser on the statement shapes SKOS dumps actually use.
"""

import pytest

from claimskg_generator_spark.sources.turtle import (
    TurtleParseError,
    parse_turtle,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SKOS = "http://www.w3.org/2004/02/skos/core#"


def P(text):
    return list(parse_turtle(text))


def test_dbpedia_category_dump_shape():
    # the exact shape of dbpedia_categories_lang_en_skos.ttl statements
    ttl = """
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix dbc: <http://dbpedia.org/resource/Category:> .

dbc:Climate_change rdf:type skos:Concept ;
    skos:prefLabel "Climate change"@en ;
    skos:broader dbc:Global_warming , dbc:Environment .
"""
    got = P(ttl)
    c = "http://dbpedia.org/resource/Category:Climate_change"
    assert got == [
        (c, RDF_TYPE, f"{SKOS}Concept", "uri"),
        (c, f"{SKOS}prefLabel", "Climate change", "@en"),
        (c, f"{SKOS}broader",
         "http://dbpedia.org/resource/Category:Global_warming", "uri"),
        (c, f"{SKOS}broader",
         "http://dbpedia.org/resource/Category:Environment", "uri"),
    ]


def test_a_keyword_sparql_prefix_and_comments():
    ttl = """
# header comment
PREFIX ex: <http://ex.org/>
ex:s a ex:T .  # trailing comment
<http://ex.org/u> ex:p "plain" .
"""
    got = P(ttl)
    assert got == [
        ("http://ex.org/s", RDF_TYPE, "http://ex.org/T", "uri"),
        ("http://ex.org/u", "http://ex.org/p", "plain", ""),
    ]


def test_literal_datatypes_and_numbers():
    ttl = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:s ex:i 42 ; ex:d 3.14 ; ex:e 1e6 ; ex:b true ;
     ex:t "typed"^^xsd:integer ; ex:str "s"^^xsd:string .
"""
    got = {(p.rsplit("/", 1)[1], o, k) for _, p, o, k in P(ttl)}
    assert got == {
        ("i", "42", f"{XSD}integer"),
        ("d", "3.14", f"{XSD}decimal"),
        ("e", "1e6", f"{XSD}double"),
        ("b", "true", f"{XSD}boolean"),
        ("t", "typed", f"{XSD}integer"),
        ("str", "s", ""),  # xsd:string collapses to plain (RDF 1.1)
    }


def test_string_escapes_long_strings_and_unicode():
    ttl = r'''
@prefix ex: <http://ex.org/> .
ex:s ex:p "line\nbreak \"q\" é \U0001F600" .
ex:s ex:q """multi
line 'quoted' "inner" text""" .
'''
    got = P(ttl)
    assert got[0][2] == 'line\nbreak "q" é \U0001F600'
    assert got[1][2] == 'multi\nline \'quoted\' "inner" text'


def test_pname_local_trailing_dot_not_swallowed():
    # ':s :p :o.' — the '.' ends the statement, it is not part of the pname
    got = P("@prefix : <http://ex.org/> .\n:s :p :o.")
    assert got == [("http://ex.org/s", "http://ex.org/p",
                    "http://ex.org/o", "uri")]


def test_pname_local_escapes_and_percent():
    ttl = "@prefix ex: <http://ex.org/> .\nex:A\\,B ex:p ex:C%20D ."
    got = P(ttl)
    assert got[0][0] == "http://ex.org/A,B"
    assert got[0][2] == "http://ex.org/C%20D"


def test_base_resolution_and_bnodes():
    ttl = """
@base <http://ex.org/dir/> .
@prefix ex: <http://ex.org/> .
<s> ex:p <#frag> .
_:b1 ex:p _:b2 .
"""
    got = P(ttl)
    assert got[0][0] == "http://ex.org/dir/s"
    assert got[0][2] == "http://ex.org/dir/#frag"
    assert got[1] == ("_:b1", "http://ex.org/p", "_:b2", "uri")


def test_rejects_property_lists_collections_undefined_prefix():
    with pytest.raises(TurtleParseError, match="not supported"):
        P("@prefix ex: <http://e/> .\nex:s ex:p [ ex:q ex:o ] .")
    with pytest.raises(TurtleParseError, match="undefined prefix"):
        P("ex:s ex:p ex:o .")
    with pytest.raises(TurtleParseError, match="unexpected EOF"):
        P("@prefix ex: <http://e/> .\nex:s ex:p")


def test_trailing_semicolon_and_default_prefix():
    got = P("@prefix : <http://e/> .\n:s :p :o ; .")
    assert got == [("http://e/s", "http://e/p", "http://e/o", "uri")]


def test_pipeline_union_carries_category_triples(spark):
    """The CLI surface: parsed category triples ride the static/thesaurus
    union branch into the deduped graph."""
    from claimskg_generator_spark.plans.pipeline import (
        ClaimsKGPipeline,
        PipelineConfig,
    )
    from claimskg_generator_spark.sources.synth import synthesize_corpus

    ttl = """
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix dbc: <http://dbpedia.org/resource/Category:> .
dbc:Testing a skos:Concept ; skos:prefLabel "Testing"@en .
"""
    cats = list(parse_turtle(ttl))
    pipe = ClaimsKGPipeline(
        spark, PipelineConfig(category_triples=cats)
    )
    df = pipe.triples(synthesize_corpus(spark, 5))
    rows = {tuple(r) for r in df.collect()}
    assert ("http://dbpedia.org/resource/Category:Testing",
            RDF_TYPE, f"{SKOS}Concept", "uri") in rows
    assert ("http://dbpedia.org/resource/Category:Testing",
            f"{SKOS}prefLabel", "Testing", "@en") in rows
