"""Thesaurus dimension: entity dictionary + its SKOS triples.

The reference loads two SKOS thesauri (TheSoz, UNESCO) and (a) merges their
full RDF graphs into the output (reference claimskg/generator/__init__.py:
149-158) and (b) extracts (concept, label) pairs to build the phrase-match
dictionary (reference claimskg/generator/skosthesaurusmatcher.py:19-65).
The thesaurus XML blobs are absent from the reference repo
(.MISSING_LARGE_BLOBS), so a deterministic fixture stands in
(claimskg_generator_spark/sources/synth.py THESAURUS_ENTRIES); this module
derives both the broadcastable matchers and the SKOS triples from any
(concept_uri, label, vocab) entry list.
"""

from typing import Dict, List, Sequence, Tuple

from claimskg_generator_spark.constants.namespaces import NS
from claimskg_generator_spark.functions.rdfterms import OKIND_LANG_EN, OKIND_URI
from claimskg_generator_spark.functions.textmatch import PhraseMatcher


def build_matchers(
    entries: Sequence[Dict], recognizer: str = "stem"
) -> Dict[str, PhraseMatcher]:
    """One PhraseMatcher per vocabulary (thesoz / unesco), mirroring the two
    SkosThesaurusMatcher instances of the reference.

    ``recognizer`` selects the unigram key, matching the reference's two
    recognizer classes (intersection_recognizers.py): ``"stem"`` (default —
    the only one the reference generator constructs,
    skosthesaurusmatcher.py:68) or ``"metaphone"``
    (InterDoubleMetaphoneConceptRecognizer, SURVEY §2 P19)."""
    if recognizer == "stem":
        key_fn = None
    elif recognizer == "metaphone":
        from claimskg_generator_spark.functions.metaphone import metaphone_key

        key_fn = metaphone_key
    else:
        raise ValueError(f"unknown recognizer {recognizer!r} (stem|metaphone)")
    by_vocab: Dict[str, List[Tuple[str, str]]] = {}
    for e in entries:
        by_vocab.setdefault(e["vocab"], []).append((e["concept_uri"], e["label"]))
    return {
        vocab: PhraseMatcher(pairs, key_fn=key_fn)
        for vocab, pairs in by_vocab.items()
    }


def thesaurus_triples(entries: Sequence[Dict]) -> List[Tuple[str, str, str, str]]:
    """SKOS triples merged verbatim into the output graph (the fixture
    stand-in for the reference's whole-graph union, SURVEY.md U1/S3)."""
    triples = []
    for e in entries:
        triples.append((e["concept_uri"], NS.RDF_TYPE, NS.SKOS_CONCEPT, OKIND_URI))
        triples.append(
            (e["concept_uri"], NS.SKOS_PREF_LABEL, e["label"], OKIND_LANG_EN)
        )
    return triples
