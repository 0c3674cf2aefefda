"""Embeddings text-similarity path (S6/P15/A6): pure-layer properties +
Spark reconciliation with embeddings matches the oracle exactly."""

import pytest

from claimskg_generator_spark.operators.reconcile import reconcile_pairs
from claimskg_generator_spark.operators.views import logical_views
from claimskg_generator_spark.oracle import ReferenceOracle
from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline
from claimskg_generator_spark.sources.embeddings import (
    cosine,
    fragment_vectors,
    hash_word_vector,
    merge_and_normalise_strings,
    sentence_tokens,
    sentence_vector,
)
from claimskg_generator_spark.sources.synth import (
    THESAURUS_ENTRIES,
    gen_records,
    gen_rows,
)

N = 180
THETA = 0.25


def test_merge_and_normalise():
    # stopwords scrubbed, bracketed segments and non-word chars -> spaces
    out = merge_and_normalise_strings(["The Quick (aside) fox!", "a [note] dog"])
    assert "(" not in out and "[" not in out and "!" not in out
    assert "quick" in out and "fox" in out and "dog" in out
    assert " the " not in f" {out} "


def test_hash_vectors_deterministic_and_spread():
    a = hash_word_vector("climate")
    assert a == hash_word_vector("climate")
    assert a != hash_word_vector("economy")
    assert all(-1.0 <= x <= 1.0 for x in a)
    assert len(a) == 32


def test_sentence_vector_mean():
    v1 = sentence_vector("climate")
    v2 = sentence_vector("economy")
    v12 = sentence_vector("climate economy")
    for i in range(len(v1)):
        assert v12[i] == pytest.approx((v1[i] + v2[i]) / 2)
    assert sentence_tokens("the a of") == []
    assert sentence_vector("") == [0.0] * 32


def test_cosine_bounds():
    v = sentence_vector("climate change is real")
    assert cosine(v, v) == pytest.approx(1.0)
    assert cosine(v, [0.0] * len(v)) == 0.0


def test_fragment_vectors_sides():
    full, first = fragment_vectors(["headline here", "body text here"])
    only, first2 = fragment_vectors(["headline here"])
    assert first == first2  # B side only sees fragment[0]
    assert full != only


def test_reconcile_with_embeddings_matches_oracle(spark):
    o = ReferenceOracle(THESAURUS_ENTRIES)
    o.generate(gen_records(N))
    want = {(a, b, round(s, 9)) for a, b, s in o.reconcile(THETA, use_embeddings=True)}
    assert want, "no mappings with embeddings on this corpus"

    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(spark.createDataFrame(gen_rows(N)))
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    got_rows = reconcile_pairs(views, THETA, use_embeddings=True).collect()
    got = {(r["cw_a"], r["cw_b"], round(r["score"], 9)) for r in got_rows}
    assert got == want, (
        f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
    )
