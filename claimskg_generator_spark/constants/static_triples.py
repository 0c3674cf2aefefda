"""The fixed, input-independent triple family.

Reproduces the triples the reference emits once per run: the English
language node (reference claimskg/generator/__init__.py:241-244), the DCAT
dataset metadata + DOI identifier + contact vcard (reference
claimskg/generator/__init__.py:573-676).  The reference stamps
``dct:modified`` with ``datetime.now()``; we parameterize it
(``generated_at``) with a fixed default so output is deterministic and
diffable.
"""

from claimskg_generator_spark.constants.namespaces import DEFAULT_MODEL_URI, NS
from claimskg_generator_spark.functions.rdfterms import (
    OKIND_LANG_EN,
    OKIND_PLAIN,
    OKIND_URI,
)

DEFAULT_GENERATED_AT = "2026-01-01 00:00:00"


def static_triples(model_uri: str = DEFAULT_MODEL_URI,
                   generated_at: str = DEFAULT_GENERATED_AT):
    b = model_uri
    u, p, e = OKIND_URI, OKIND_PLAIN, OKIND_LANG_EN
    english = b + "language/English"
    claimskg = b + "claimskg"
    vcard = b + "atchechmedjiev_contact_vcard"
    doi_org = b + "doi_org_instance"
    identifier = b + "doi_identifier"
    sparql_dist = b + "sparql_claimskg_distribution"
    source_dist = b + "sourcecode_claimskg_distribution"
    cc_by = "https://creativecommons.org/licenses/by/4.0/"
    date = NS.XSD_DATE

    rows = [
        # Language node (constructor, :241-244)
        (english, NS.RDF_TYPE, NS.SCHEMA_LANGUAGE, u),
        (english, NS.SCHEMA_ALTERNATE_NAME, "en", p),
        (english, NS.SCHEMA_NAME, "English", p),
        # DCAT dataset (add_dcat_metadata, :584-632)
        (claimskg, NS.RDF_TYPE, NS.DCAT + "Dataset", u),
        (claimskg, NS.DCT + "title", "ClaimsKG", p),
        # typo ("ofFact-Checked") preserved from the reference (:592)
        (claimskg, NS.DCT + "description",
         "ClaimsKG: A Live Knowledge Graph ofFact-Checked Claims", p),
        (claimskg, NS.DCT + "issued", "2019-04-10", date),
        (claimskg, NS.DCT + "modified", generated_at, date),
        (doi_org, NS.RDF_TYPE, NS.FOAF + "Organization", u),
        (doi_org, NS.RDFS_LABEL, "International DOI Foundation", p),
        (doi_org, NS.FOAF + "homepage", "https://www.doi.org/", u),
        (identifier, NS.RDF_TYPE, NS.ADMS + "Identifier", u),
        (identifier, NS.SKOS_NOTATION, "https://doi.org/10.5281/zenodo.2628745", u),
        (identifier, NS.ADMS + "schemaAgency", "International DOI Foundation", p),
        (identifier, NS.DCT + "creator", doi_org, u),
        (claimskg, NS.DCT + "identifier", "10.5281/zenodo.2628745", p),
        (claimskg, NS.DCT + "language",
         "http://id.loc.gov/vocabulary/iso639-1/en", u),
        (claimskg, NS.DCT + "accrualPeriodicity",
         "http://purl.org/linked-data/sdmx/2009/code#freq-M", u),
        (claimskg, NS.DCAT + "keyword", "Claims", p),
        (claimskg, NS.DCAT + "keyword", "Facts", p),
        (claimskg, NS.DCAT + "keyword", "Fact-checking", p),
        (claimskg, NS.DCAT + "keyword", "Knowledge Graphs", p),
        (claimskg, NS.DCAT + "contactPoint", vcard, u),
        # Contact vcard (create_contact_vcard, :573-582)
        (vcard, NS.RDF_TYPE, NS.VCARD + "Individual", u),
        (vcard, NS.VCARD + "hasEmail", "mailto:andon.tchechmedjiev@mines-ales.fr", u),
        (vcard, NS.VCARD + "fn", "Andon Tchechmedjiev", p),
        # SPARQL distribution (:634-655)
        (sparql_dist, NS.RDF_TYPE, NS.DCAT + "Distribution", u),
        (sparql_dist, NS.DCT + "title", "SPARQL endpoint", p),
        (sparql_dist, NS.DCT + "description", "The ClaimsKG SPARQL endpoint", p),
        (sparql_dist, NS.DCT + "issued", "2019-04-10", date),
        (sparql_dist, NS.DCT + "modified", generated_at, date),
        (cc_by, NS.RDF_TYPE, NS.DCT + "LicenseDocument", u),
        (sparql_dist, NS.DCT + "license", cc_by, u),
        (sparql_dist, NS.DCAT + "accessURL",
         "https://data.gesis.org/claimskg/sparql", p),
        # Source-code distribution (:657-676; title is "SPARQL endpoint"
        # there too — reference quirk preserved)
        (source_dist, NS.RDF_TYPE, NS.DCAT + "Distribution", u),
        (source_dist, NS.DCT + "title", "SPARQL endpoint", p),
        (source_dist, NS.DCT + "description",
         "The ClaimsKG Github repository group", p),
        (source_dist, NS.DCT + "issued", "2019-04-10", date),
        (source_dist, NS.DCT + "modified", generated_at, date),
        (source_dist, NS.DCT + "license", cc_by, u),
        (source_dist, NS.DCAT + "accessURL", "https://github.com/claimskg", p),
    ]
    return rows
