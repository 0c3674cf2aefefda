"""Real SKOS thesaurus ingestion from RDF/XML (S3).

Reference: claimskg/generator/skosthesaurusmatcher.py:16-64 loads the
thesaurus with rdflib and extracts (concept, label) pairs via SPARQL:

- skos_xl_labels=True: concepts typed skos:Concept with
  skosxl:prefLabel -> skosxl:Label -> skosxl:literalForm, lang en|fr.
  QUIRK preserved: the reference's "altLabel" query in SKOS-XL mode is a
  verbatim copy of the prefLabel query (skosthesaurusmatcher.py:44-52), so
  every prefLabel pair is collected twice and altLabels are never read.
- skos_xl_labels=False: skos:prefLabel plus skos:altLabel literals, en|fr.

rdflib is not available in this environment, so this parses the RDF/XML
serialization directly with the stdlib ElementTree: a two-pass walk that
first indexes every node carrying rdf:about/rdf:ID (SKOS-XL label nodes may
be defined away from the concept that references them), then resolves each
concept's label properties either inline or through rdf:resource.
"""

import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
SKOSXL = "http://www.w3.org/2008/05/skos-xl#"
XML = "http://www.w3.org/XML/1998/namespace"

_ABOUT = f"{{{RDF}}}about"
_ID = f"{{{RDF}}}ID"
_RESOURCE = f"{{{RDF}}}resource"
_TYPE = f"{{{RDF}}}type"
_LANG = f"{{{XML}}}lang"


def _node_uri(el: ET.Element, base: str = "") -> Optional[str]:
    if _ABOUT in el.attrib:
        return el.attrib[_ABOUT]
    if _ID in el.attrib:
        return base + "#" + el.attrib[_ID]
    return None


def _is_concept(el: ET.Element) -> bool:
    if el.tag == f"{{{SKOS}}}Concept":
        return True
    for t in el.findall(f"{{{RDF}}}type"):
        if t.attrib.get(_RESOURCE) == f"{SKOS}Concept":
            return True
    return False


def _literals(el: ET.Element, tag: str, langs) -> List[str]:
    out = []
    for lit in el.findall(tag):
        if lit.attrib.get(_LANG) in langs and lit.text:
            out.append(lit.text)
    return out


def parse_skos_pairs(path: str, skos_xl_labels: bool = True,
                     langs: Tuple[str, ...] = ("en", "fr")) -> List[Tuple[str, str]]:
    """(concept_uri, label) pairs, reference extraction order: all
    prefLabels first, then the second pass (prefLabels again in SKOS-XL
    mode — the reference quirk — or altLabels in plain-SKOS mode)."""
    root = ET.parse(path).getroot()

    # pass 1: index every URI-addressable node (SKOS-XL Label nodes can be
    # top-level siblings referenced by rdf:resource)
    nodes: Dict[str, ET.Element] = {}
    stack = [root]
    while stack:
        el = stack.pop()
        uri = _node_uri(el)
        if uri is not None:
            nodes.setdefault(uri, el)
        stack.extend(el)

    def xl_label_forms(concept: ET.Element, prop: str) -> List[str]:
        forms = []
        for ref in concept.findall(f"{{{SKOSXL}}}{prop}"):
            targets = list(ref.findall(f"{{{SKOSXL}}}Label"))
            res = ref.attrib.get(_RESOURCE)
            if res and res in nodes:
                targets.append(nodes[res])
            for label_node in targets:
                forms.extend(
                    _literals(label_node, f"{{{SKOSXL}}}literalForm", langs)
                )
        return forms

    concepts = [
        (uri, el) for uri, el in nodes.items() if _is_concept(el)
    ]
    concepts.sort()  # deterministic order regardless of dict/file order

    pairs: List[Tuple[str, str]] = []
    if skos_xl_labels:
        pref = [(u, f) for u, el in concepts
                for f in xl_label_forms(el, "prefLabel")]
        pairs.extend(pref)
        pairs.extend(pref)  # reference quirk: second query == first
    else:
        for u, el in concepts:
            for f in _literals(el, f"{{{SKOS}}}prefLabel", langs):
                pairs.append((u, f))
        for u, el in concepts:
            for f in _literals(el, f"{{{SKOS}}}altLabel", langs):
                pairs.append((u, f))
    return pairs


def entries_from_skos_xml(path: str, vocab: str,
                          skos_xl_labels: bool = True) -> List[Dict]:
    """Thesaurus entries in the shape build_matchers/thesaurus_triples
    consume ({concept_uri, label, vocab}), from a real RDF/XML file."""
    return [
        {"concept_uri": uri, "label": label, "vocab": vocab}
        for uri, label in parse_skos_pairs(path, skos_xl_labels)
    ]
