"""RDF namespace / predicate vocabulary for the emitted triple model.

Parity contract: the URI constants below reproduce the namespaces the
reference binds and the predicates it emits (reference
claimskg/generator/__init__.py:168-261).  Only *values* (URIs) are shared —
they are the public schema.org / NIF / DCAT / SKOS vocabularies.
"""

DEFAULT_MODEL_URI = "http://data.gesis.org/claimskg/"


class NS:
    """URI builders for every namespace the pipeline emits into."""

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    OWL = "http://www.w3.org/2002/07/owl#"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    SCHEMA = "http://schema.org/"
    DBO = "http://dbpedia.org/ontology/"
    DBR = "http://dbpedia.org/resource/"
    # reference claimskg/generator/__init__.py:190 — the dbc prefix is the
    # dbr namespace with a "Category_" suffix baked in (quirk preserved).
    DBC = "http://dbpedia.org/resource/Category_"
    DCAT = "http://www.w3.org/ns/dcat#"
    DCT = "http://purl.org/dc/terms/"
    FOAF = "http://xmlns.com/foaf/0.1/"
    VCARD = "http://www.w3.org/2006/vcard/ns#"
    ADMS = "http://www.w3.org/ns/adms#"
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
    ITSRDF = "https://www.w3.org/2005/11/its/rdf#"

    RDF_TYPE = RDF + "type"
    RDFS_LABEL = RDFS + "label"
    OWL_SAME_AS = OWL + "sameAs"

    XSD_DATE = XSD + "date"
    XSD_FLOAT = XSD + "float"
    XSD_INTEGER = XSD + "integer"
    XSD_B64 = XSD + "base64Binary"

    SCHEMA_CLAIM_REVIEW = SCHEMA + "ClaimReview"
    SCHEMA_CREATIVE_WORK = SCHEMA + "CreativeWork"
    SCHEMA_ORGANIZATION = SCHEMA + "Organization"
    SCHEMA_THING = SCHEMA + "Thing"
    SCHEMA_RATING = SCHEMA + "Rating"
    SCHEMA_LANGUAGE = SCHEMA + "Language"

    SCHEMA_CLAIM_REVIEWED = SCHEMA + "claimReviewed"
    SCHEMA_URL = SCHEMA + "url"
    SCHEMA_NAME = SCHEMA + "name"
    SCHEMA_DATE_PUBLISHED = SCHEMA + "datePublished"
    SCHEMA_IN_LANGUAGE = SCHEMA + "inLanguage"
    SCHEMA_AUTHOR = SCHEMA + "author"
    SCHEMA_SAME_AS = SCHEMA + "sameAs"
    SCHEMA_CITATION = SCHEMA + "citation"
    SCHEMA_ITEM_REVIEWED = SCHEMA + "itemReviewed"
    SCHEMA_ALTERNATE_NAME = SCHEMA + "alternateName"
    SCHEMA_DESCRIPTION = SCHEMA + "description"
    SCHEMA_RATING_VALUE = SCHEMA + "ratingValue"
    SCHEMA_MENTIONS = SCHEMA + "mentions"
    SCHEMA_KEYWORDS = SCHEMA + "keywords"
    SCHEMA_HEADLINE = SCHEMA + "headline"
    SCHEMA_REVIEW_BODY = SCHEMA + "reviewBody"
    SCHEMA_TEXT = SCHEMA + "text"
    SCHEMA_REVIEW_RATING = SCHEMA + "reviewRating"

    NIF_RFC5147_STRING = NIF + "RFC5147String"
    NIF_CONTEXT = NIF + "Context"
    NIF_SOURCE_URL = NIF + "sourceUrl"
    NIF_BEGIN_INDEX = NIF + "beginIndex"
    NIF_END_INDEX = NIF + "endIndex"
    NIF_IS_STRING = NIF + "isString"

    ITS_TA_CONFIDENCE = ITSRDF + "taConfidence"
    ITS_TA_IDENT_REF = ITSRDF + "taIdentRef"

    DCT_ABOUT = DCT + "about"

    SKOS_CONCEPT = SKOS + "Concept"
    SKOS_PREF_LABEL = SKOS + "prefLabel"
    SKOS_NOTATION = SKOS + "notation"


LANG_EN = "en"
