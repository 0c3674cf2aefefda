"""Pure-Python oracle: row-at-a-time re-execution of the reference
generator's semantics, used to produce golden triple sets for the Spark
pipeline's P/R gate (SURVEY.md §5.2; BASELINE.json metric).

This mirrors the reference *call tree* (reference
claimskg/generator/__init__.py generate_model -> _create_schema_claim_review
-> _create_organization -> _create_creative_work -> _create_review_rating ->
_create_mention, plus align_duplicated) but shares its scalar helpers
(cleaning chains, uuid5, phrase matching, literal formatting) with the
Spark pipeline so both sides agree byte-for-byte.  It is intentionally
sequential and stateful — the point is to pin down the order-dependent
behaviors (the global keyword memo, reference :266,386,397) that the
distributed plan must reproduce.
"""

import datetime
from typing import Dict, List, Optional, Sequence, Set, Tuple

from claimskg_generator_spark.constants.namespaces import DEFAULT_MODEL_URI, NS
from claimskg_generator_spark.constants.ratings import normalize_rating_fast
from claimskg_generator_spark.constants.sources import SOURCE_URI_DICT
from claimskg_generator_spark.constants.static_triples import (
    DEFAULT_GENERATED_AT,
    static_triples,
)
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
from claimskg_generator_spark.functions.rdfterms import (
    OKIND_LANG_EN,
    OKIND_PLAIN,
    OKIND_URI,
    bytes_literal_lexical,
    float_lexical,
    int_lexical,
)
from claimskg_generator_spark.functions.uuid5 import uuid5_url
from claimskg_generator_spark.sources.thesaurus import (
    build_matchers,
    thesaurus_triples,
)

Triple = Tuple[str, str, str, str]


class LogicalClaim:
    """Per-claim accumulator for statistics and reconciliation (analog of
    the reference's ClaimLogicalView, reference :60-83)."""

    def __init__(self):
        self.review_entities: List[str] = []
        self.review_entity_categories: List[str] = []
        self.claim_entities: List[str] = []
        self.claim_entity_categories: List[str] = []
        self.keywords: Set[str] = set()
        self.keywords_thesoz: Set[str] = set()
        self.keywords_unesco: Set[str] = set()
        self.keywords_dbpedia: Set[str] = set()
        self.keywords_thesoz_dbpedia: Set[str] = set()
        self.keywords_unesco_dbpedia: Set[str] = set()
        self.links: List[str] = []
        self.text_fragments: List[str] = []
        self.claimreview_author = ""
        self.creative_work_author = ""
        self.creative_work_uri: Optional[str] = None
        self.claim_review_url: Optional[str] = None
        self.claim_date = None
        self.review_date = None
        self.has_body_text = False
        self.has_headline = False
        self.title = ""
        self.normalized_rating = ""


def _sv(row, key) -> str:
    return row_string_value(row.get(key))


def _stats_vector(claims):
    """One statistics vector over a claim list, mirroring
    compute_stats_for_review + output_stats (reference statistics.py:45-131,
    keyed by the reference's display names)."""
    n = len(claims)
    c = {
        "ClaimReview": n,
        "CreativeWork": n,
        "Claims reviews without author": sum(
            1 for x in claims if not x.creative_work_author
        ),
        "Entities per review": sum(len(x.review_entities) for x in claims),
        "Entities per claim": sum(len(x.claim_entities) for x in claims),
        "Total Number of Entities": sum(
            len(x.claim_entities) + len(x.review_entities) for x in claims
        ),
        "Keywords": sum(len(x.keywords) for x in claims),
        "Keywords reconciled with TheSoz": sum(len(x.keywords_thesoz) for x in claims),
        "Keywords reconciled with Unesco": sum(len(x.keywords_unesco) for x in claims),
        "Keywords reconciled with DBPedia": sum(len(x.keywords_dbpedia) for x in claims),
        "Keywords reconciled with both TheSoz and DBPedia": sum(
            len(x.keywords_thesoz_dbpedia) for x in claims
        ),
        "Keywords reconciled with both UNESCO and DBPedia": sum(
            len(x.keywords_unesco_dbpedia) for x in claims
        ),
        "Keywords per review": sum(len(x.keywords) for x in claims),
        "Citations per CreativeWork": sum(len(x.links) for x in claims),
        "Claims with text": sum(1 for x in claims if x.has_body_text),
        "Claims with author": sum(1 for x in claims if len(x.creative_work_author) > 0),
        "Claims with date published": sum(1 for x in claims if x.claim_date),
        "Claims with at least one citations": sum(1 for x in claims if x.links),
        "Claims with at least one entity mention": sum(
            1 for x in claims if x.claim_entities
        ),
        "Reviews with a headline": sum(1 for x in claims if x.has_headline),
        "Reviews with at least one keyword": sum(1 for x in claims if x.keywords),
        "Reviews with at least one entity mention": sum(
            1 for x in claims if x.review_entities
        ),
        "Claims rated as TRUE under our normalized scale": sum(
            1 for x in claims if "TRUE" in x.normalized_rating
        ),
        "Claims rated as FALSE under our normalized scale": sum(
            1 for x in claims
            if "TRUE" not in x.normalized_rating and "FALSE" in x.normalized_rating
        ),
        "Claims rated as MIXTURE under our normalized scale": sum(
            1 for x in claims
            if "TRUE" not in x.normalized_rating and "FALSE" not in x.normalized_rating
            and "MIXTURE" in x.normalized_rating
        ),
        "Claims rated as OTHER under our normalized scale": sum(
            1 for x in claims
            if x.normalized_rating == "OTHER"
        ),
    }
    # output_stats ratio transform (statistics.py:100-129)
    for k in ("Entities per review", "Keywords per review"):
        c[k] = c[k] / float(n) if n else 0.0
    for k in ("Entities per claim", "Citations per CreativeWork"):
        c[k] = c[k] / float(n) if n else 0.0
    for k in (
        "Claims with text", "Claims with author", "Claims with date published",
        "Claims with at least one citations",
        "Claims with at least one entity mention",
        "Reviews with a headline", "Reviews with at least one keyword",
        "Reviews with at least one entity mention",
    ):
        c[k] = (c[k] / float(n) * 100.0) if n else 0.0
    return c


class ReferenceOracle:
    def __init__(self, thesaurus_entries: Sequence[Dict], model_uri: str = DEFAULT_MODEL_URI,
                 threshold: float = 0.3, include_body: bool = False,
                 generated_at: str = DEFAULT_GENERATED_AT):
        self.base = model_uri
        self.threshold = threshold
        self.include_body = include_body
        self.triples: Set[Triple] = set()
        self.claims: List[LogicalClaim] = []
        self.creative_works: List[str] = []
        self._keyword_memo: Set[str] = set()
        matchers = build_matchers(thesaurus_entries)
        self.thesoz = matchers.get("thesoz")
        self.unesco = matchers.get("unesco")
        for t in static_triples(model_uri, generated_at):
            self.triples.add(t)
        for t in thesaurus_triples(thesaurus_entries):
            self.triples.add(t)

    # -- term helpers -----------------------------------------------------
    def _add(self, s, p, o, okind):
        self.triples.add((s, p, o, okind))

    def _mint(self, kind: str, key: str) -> str:
        return f"{self.base}{kind}/{uuid5_url(key)}"

    # -- per-row families --------------------------------------------------
    def _claim_review(self, row, claim: LogicalClaim) -> str:
        key = "".join(
            [_sv(row, "claimReview_author_name"), _sv(row, "claimReview_author_url"),
             _sv(row, "claimReview_datePublished"), _sv(row, "claimReview_url")]
        )
        cr = self._mint("claim_review", key)
        self._add(cr, NS.RDF_TYPE, NS.SCHEMA_CLAIM_REVIEW, OKIND_URI)

        headline = _sv(row, "extra_title")
        if len(headline) > 0:
            self._add(cr, NS.SCHEMA_HEADLINE, headline, OKIND_LANG_EN)
            claim.text_fragments.append(headline)
            claim.has_headline = True

        body = _sv(row, "extra_body")
        if len(body) > 0:
            claim.has_body_text = True
            claim.text_fragments.append(normalize_text_fragment(body))
            if self.include_body:
                self._add(cr, NS.SCHEMA_REVIEW_BODY, body, OKIND_LANG_EN)

        url = row.get("claimReview_url")
        claim.claim_review_url = url
        if url is not None:
            self._add(cr, NS.SCHEMA_URL, url, OKIND_URI)

        review_date = row.get("claimReview_datePublished")
        if review_date:
            self._add(cr, NS.SCHEMA_DATE_PUBLISHED, review_date, NS.XSD_DATE)
            claim.review_date = datetime.datetime.strptime(review_date, "%Y-%m-%d").date()
        self._add(cr, NS.SCHEMA_IN_LANGUAGE, self.base + "language/English", OKIND_URI)
        return cr

    def _organization(self, row, claim: LogicalClaim) -> str:
        name = _sv(row, "claimReview_author_name")
        org = self.base + "organization/" + name.lower().replace(" ", "_")
        self._add(org, NS.RDF_TYPE, NS.SCHEMA_ORGANIZATION, OKIND_URI)
        claim.claimreview_author = row.get("claimReview_author_name")
        self._add(org, NS.SCHEMA_NAME, row.get("claimReview_author_name"), OKIND_LANG_EN)
        if len(name) > 0:
            self._add(org, NS.SCHEMA_URL, SOURCE_URI_DICT[name], OKIND_URI)
        return org

    def _mention(self, entry, claim: LogicalClaim, in_review: bool):
        """Mention family (reference :520-565); returns (mention_uri,
        dbr_entity_uri) or (None, None) below threshold."""
        rho = float(entry["score"])
        if rho <= self.threshold:
            return None, None
        text = entry["text"]
        begin, end = entry["begin"], entry["end"]
        entity = entry["entity"].replace(" ", "_")
        categories = entry["categories"]
        if len(categories) > 0:
            categories = categories[0].split(",")
        key = (
            str(begin) + str(end) + str(text) + str(entity)
            + str(round(rho, 2)) + ",".join(claim.text_fragments)
        )
        m = self._mint("mention", key)
        dbr = NS.DBR + entity
        self._add(m, NS.RDF_TYPE, NS.NIF_CONTEXT, OKIND_URI)
        self._add(m, NS.RDF_TYPE, NS.NIF_RFC5147_STRING, OKIND_URI)
        self._add(m, NS.NIF_IS_STRING, text, OKIND_LANG_EN)
        self._add(m, NS.NIF_BEGIN_INDEX, int_lexical(begin), NS.XSD_INTEGER)
        self._add(m, NS.NIF_END_INDEX, int_lexical(end), NS.XSD_INTEGER)
        self._add(m, NS.ITS_TA_CONFIDENCE,
                  float_lexical(float(format_confidence_score(rho))), NS.XSD_FLOAT)
        self._add(m, NS.ITS_TA_IDENT_REF, dbr, OKIND_URI)
        if in_review:
            claim.review_entities.append(entity)
            claim.review_entity_categories.extend(categories)
        else:
            claim.claim_entities.append(entity)
            claim.claim_entity_categories.extend(categories)
        for category in categories:
            self._add(m, NS.DCT_ABOUT, NS.DBC + category.replace(" ", "_"), OKIND_URI)
        return m, dbr

    def _creative_work(self, row, claim: LogicalClaim) -> str:
        key = "".join(
            [_sv(row, "creativeWork_author_name"), _sv(row, "creativeWork_author_sameAs"),
             _sv(row, "creativeWork_datePublished"), _sv(row, "claimReview_claimReviewed")]
        )
        cw = self._mint("creative_work", key)
        self._add(cw, NS.RDF_TYPE, NS.SCHEMA_CREATIVE_WORK, OKIND_URI)

        cw_date = _sv(row, "creativeWork_datePublished")
        if len(cw_date) > 0:
            self._add(cw, NS.SCHEMA_DATE_PUBLISHED, cw_date, NS.XSD_DATE)
            claim.claim_date = datetime.datetime.strptime(cw_date, "%Y-%m-%d").date()

        # Keyword block with the global first-writer-wins memo (:373-410).
        keywords = row.get("extra_tags")
        if isinstance(keywords, str) and len(keywords) > 0:
            keyword_mentions = process_json(row.get("extra_entities_keywords")) or []
            for keyword in split_keywords(keywords):
                keyword = keyword.strip()
                kw_uri = self._mint("keyword", keyword)
                if kw_uri not in self._keyword_memo:
                    self._add(kw_uri, NS.RDF_TYPE, NS.SCHEMA_THING, OKIND_URI)
                    self._add(kw_uri, NS.SCHEMA_NAME, keyword, OKIND_LANG_EN)
                    thesoz_matches = (
                        self.thesoz.find_keyword_matches(keyword) if self.thesoz else []
                    )
                    unesco_matches = (
                        self.unesco.find_keyword_matches(keyword) if self.unesco else []
                    )
                    for concept, _mt, _s, _e in thesoz_matches:
                        self._add(kw_uri, NS.DCT_ABOUT, concept, OKIND_URI)
                        claim.keywords_thesoz.add(keyword)
                    for concept, _mt, _s, _e in unesco_matches:
                        self._add(kw_uri, NS.DCT_ABOUT, concept, OKIND_URI)
                        claim.keywords_unesco.add(keyword)
                    for mention in keyword_mentions:
                        if keyword.lower().strip() in mention["text"].lower().strip():
                            self._keyword_memo.add(kw_uri)
                            m, dbr = self._mention(mention, claim, False)
                            if m:
                                claim.keywords_dbpedia.add(keyword)
                                self._add(kw_uri, NS.SCHEMA_MENTIONS, m, OKIND_URI)
                                for concept, _mt, s, e in thesoz_matches:
                                    if mention["begin"] == s and mention["end"] == e:
                                        claim.keywords_thesoz_dbpedia.add(keyword)
                                        self._add(dbr, NS.OWL_SAME_AS, concept, OKIND_URI)
                                for concept, _mt, s, e in unesco_matches:
                                    if mention["begin"] == s and mention["end"] == e:
                                        claim.keywords_unesco_dbpedia.add(keyword)
                                        self._add(dbr, NS.OWL_SAME_AS, concept, OKIND_URI)
                claim.keywords.add(keyword.strip())
                self._add(cw, NS.SCHEMA_KEYWORDS, kw_uri, OKIND_URI)

        # Citations (:412-437).
        for cleaned, citation_uri in clean_citation_links(
            row.get("extra_refered_links"), _sv(row, "claimReview_author_name")
        ):
            claim.links.append(cleaned)
            self._add(cw, NS.SCHEMA_CITATION, citation_uri, OKIND_URI)

        author = _sv(row, "creativeWork_author_name")
        claim.creative_work_author = author

        claim_text = normalize_text_fragment(_sv(row, "claimReview_claimReviewed"))
        claim.title = claim_text
        self._add(cw, NS.SCHEMA_TEXT, claim_text, OKIND_LANG_EN)

        if len(author) > 0:
            cwa_key = "".join(
                [_sv(row, "creativeWork_author_name"), _sv(row, "creativeWork_author_sameAs")]
            )
            cwa = self._mint("creative_work_author", cwa_key)
            self._add(cwa, NS.RDF_TYPE, NS.SCHEMA_THING, OKIND_URI)
            for mention in process_json(row.get("extra_entities_author")) or []:
                entity = mention["entity"].replace(" ", "_")
                self._add(cwa, NS.SCHEMA_MENTIONS, NS.DBR + entity, OKIND_URI)
            self._add(cwa, NS.SCHEMA_NAME, author, OKIND_LANG_EN)
            self._add(cw, NS.SCHEMA_AUTHOR, cwa, OKIND_URI)

        self.creative_works.append(cw)
        return cw

    def _review_rating(self, row, claim: LogicalClaim, org: str):
        slug = original_rating_slug(
            _sv(row, "claimReview_author_name"), _sv(row, "rating_alternateName"),
            _sv(row, "rating_ratingValue")
        )
        original = self.base + "rating/original/" + slug

        alt = row.get("rating_alternateName")
        if alt:
            self._add(original, NS.SCHEMA_ALTERNATE_NAME,
                      bytes_literal_lexical(html_escape_ascii(alt)), NS.XSD_B64)
        self._add(original, NS.RDF_TYPE, NS.SCHEMA_RATING, OKIND_URI)

        value = clean_rating_value(row.get("rating_ratingValue") or "")
        if value is not None:
            self._add(original, NS.SCHEMA_RATING_VALUE, float_lexical(value), NS.XSD_FLOAT)
        self._add(original, NS.SCHEMA_AUTHOR, org, OKIND_URI)

        norm_name = normalize_rating_fast(
            _sv(row, "claimReview_author_name").lower(),
            _sv(row, "rating_alternateName").lower(),
        )
        claim.normalized_rating = norm_name
        normalized = self.base + "rating/normalized/claimskg_" + norm_name
        self._add(normalized, NS.RDF_TYPE, NS.SCHEMA_RATING, OKIND_URI)
        self._add(normalized, NS.SCHEMA_ALTERNATE_NAME, norm_name, OKIND_LANG_EN)
        from claimskg_generator_spark.constants.ratings import NORMALIZED_RATING_VALUES

        self._add(normalized, NS.SCHEMA_RATING_VALUE,
                  int_lexical(NORMALIZED_RATING_VALUES[norm_name]), NS.XSD_INTEGER)
        self._add(normalized, NS.SCHEMA_AUTHOR, self.base + "organization/claimskg", OKIND_URI)
        return original, normalized

    # -- pipeline ----------------------------------------------------------
    def generate(self, rows: Sequence[Dict]) -> None:
        """Equivalent of generate_model (reference :678-733)."""
        for row in rows:
            claim = LogicalClaim()
            cr = self._claim_review(row, claim)
            org = self._organization(row, claim)
            self._add(cr, NS.SCHEMA_AUTHOR, org, OKIND_URI)
            cw = self._creative_work(row, claim)
            self._add(cr, NS.SCHEMA_ITEM_REVIEWED, cw, OKIND_URI)
            claim.creative_work_uri = cw
            original, normalized = self._review_rating(row, claim, org)
            self._add(cr, NS.SCHEMA_REVIEW_RATING, original, OKIND_URI)
            self._add(cr, NS.SCHEMA_REVIEW_RATING, normalized, OKIND_URI)

            for entry in process_json(row.get("extra_entities_claimReview_claimReviewed")) or []:
                m, _ = self._mention(entry, claim, True)
                if m:
                    self._add(cw, NS.SCHEMA_MENTIONS, m, OKIND_URI)
            for entry in process_json(row.get("extra_entities_body")) or []:
                m, _ = self._mention(entry, claim, False)
                if m:
                    self._add(cr, NS.SCHEMA_MENTIONS, m, OKIND_URI)

            self.claims.append(claim)

    def reconcile(self, theta: float, use_embeddings: bool = False,
                  samples=None, seed=None):
        """Full-pairs reconciliation (reference FactReconciler
        generate_mappings / _evaluate_mapping / _pruning_criterion,
        reconciler/__init__.py:85-199): returns [(cw_a, cw_b, score)] and
        adds the owl:sameAs edges (generator :770-774).  With
        ``use_embeddings``, the text term is the mean-BoW cosine of merged
        fragments (A) vs first fragment (B) — reference :229-232.  With
        ``samples``, pairs come from the reference's seeded numpy stream
        (_process_pairwise_sample, :22-50), walked LITERALLY — including
        the ``num < iterlen - 1`` guard that never consumes the final
        combination — as the J9 parity ground truth."""
        import datetime as _dt

        from claimskg_generator_spark.operators.reconcile import (
            claim_pair_score,
            soft_overlap,
        )
        from claimskg_generator_spark.sources.embeddings import (
            cosine,
            fragment_vectors,
        )

        vec_cache = {}

        def text_sim(a: LogicalClaim, b: LogicalClaim):
            if not use_embeddings:
                return None
            for c in (a, b):
                if id(c) not in vec_cache:
                    vec_cache[id(c)] = fragment_vectors(c.text_fragments)
            return cosine(vec_cache[id(a)][0], vec_cache[id(b)][1])

        def prune(a: LogicalClaim, b: LogicalClaim) -> bool:
            ents_a = a.claim_entities + a.review_entities
            ents_b = b.claim_entities + b.review_entities
            if (a.claim_date is not None and b.claim_date is not None
                    and a.claim_date != b.claim_date):
                return True
            if (a.review_date is not None and b.review_date is not None
                    and a.review_date - b.review_date > _dt.timedelta(days=1)):
                return True
            if a.creative_work_author != b.creative_work_author:
                return True
            if (ents_a and ents_b
                    and soft_overlap(ents_a, ents_b) <= 0.00001):
                return True
            if (len(ents_a) == 0) != (len(ents_b) == 0):
                return True
            return False

        processed = set()
        mappings = []
        n = len(self.claims)
        if samples is not None:
            # literal re-execution of the reference's sampler walk
            import itertools as _it

            import numpy as _np

            iterlen = int(n * (n - 1) / 2)
            if seed is not None:
                _np.random.seed(seed)
            inds = _np.random.random(iterlen) <= (samples * 1.0 / iterlen)
            pair_iter = []
            num = 0
            gotten = 0
            it = iter(_it.combinations(range(n), 2))
            while gotten < samples and num < iterlen - 1:
                pair = next(it)
                if inds[num]:
                    pair_iter.append(pair)
                    gotten += 1
                num += 1
        else:
            pair_iter = ((i, j) for i in range(n) for j in range(i + 1, n))
        for i, j in pair_iter:
            a, b = self.claims[i], self.claims[j]
            key = a.creative_work_uri + b.creative_work_uri
            if key in processed or a is b or prune(a, b):
                continue
            processed.add(key)
            score = claim_pair_score(
                list(a.keywords), list(b.keywords), a.links, b.links,
                a.claim_entities + a.review_entities,
                b.claim_entities + b.review_entities,
                a.review_entity_categories + a.claim_entity_categories,
                b.review_entity_categories + b.claim_entity_categories,
                text_sim=text_sim(a, b),
            )
            if score > theta:
                mappings.append((a.creative_work_uri, b.creative_work_uri, score))
                self._add(a.creative_work_uri, NS.OWL_SAME_AS,
                          b.creative_work_uri, OKIND_URI)
        return mappings

    def final_stats(self):
        """Global + per-source statistics after the reference's ratio
        transform (reference statistics.py:35-131).  Returns
        {source_or_'__global__': {stat_name: value}}."""
        out = {"__global__": _stats_vector(self.claims)}
        sources = {c.claimreview_author for c in self.claims}
        for s in sources:
            out[s] = _stats_vector([c for c in self.claims
                                    if c.claimreview_author == s])
        return out

    def align_duplicated(self) -> None:
        """owl:sameAs between creative works with equal normalized titles
        (reference :779-793)."""
        for i in range(len(self.claims)):
            for j in range(i + 1, len(self.claims)):
                if normalize_label(self.claims[i].title) == normalize_label(self.claims[j].title):
                    self._add(self.creative_works[i], NS.OWL_SAME_AS,
                              self.creative_works[j], OKIND_URI)
