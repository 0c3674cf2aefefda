"""countmin_heavy_hitters vs a naive Python count-min replay."""

import hashlib

import pytest
from pyspark.sql import functions as F

P = (1 << 31) - 1


def _md5_mod_p(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    hi, lo = int(h[:8], 16), int(h[8:16], 16)
    return (hi % P * 2 + lo % P) % P


def _naive_cms(texts, min_count, depth, width, ngram):
    from collections import Counter

    tc = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        if len(toks) >= ngram:
            for i in range(len(toks) - ngram + 1):
                tc[" ".join(toks[i:i + ngram])] += 1
    grid = Counter()
    for term, n in tc.items():
        for j in range(depth):
            grid[(j, _md5_mod_p(f"{j}|{term}") % width)] += n
    out = {}
    for term, n in tc.items():
        est = min(grid[(j, _md5_mod_p(f"{j}|{term}") % width)]
                  for j in range(depth))
        if est >= min_count:
            out[term] = (n, est)
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_countmin_matches_naive_and_never_underestimates(spark):
    from claimskg_generator_spark.operators.sketches import (
        countmin_heavy_hitters,
    )

    # tiny width forces collisions so the one-sided error is exercised
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(words[(i + j) % 5] for j in range(6))
             for i in range(30)]
    got = {
        r.term: (r.exact_count, r.cms_count)
        for r in countmin_heavy_hitters(
            _docs(spark, texts), min_count=2, depth=3, width=7,
            ngram=2, persist=False,
        ).collect()
    }
    want = _naive_cms(texts, 2, 3, 7, 2)
    assert got == want
    assert got  # non-trivial
    assert all(est >= n for n, est in got.values())


def test_countmin_unigrams_and_short_docs(spark):
    from claimskg_generator_spark.operators.sketches import (
        countmin_heavy_hitters,
    )

    texts = ["a a b", "a", "c"]
    got = {
        r.term: (r.exact_count, r.cms_count)
        for r in countmin_heavy_hitters(
            _docs(spark, texts), min_count=1, depth=2, width=64,
            ngram=1, persist=False,
        ).collect()
    }
    assert got["a"][0] == 3 and got["b"][0] == 1 and got["c"][0] == 1
    # ngram=3 over 1-token docs yields nothing from them
    got3 = countmin_heavy_hitters(
        _docs(spark, texts), min_count=1, depth=2, width=64,
        ngram=3, persist=False,
    ).collect()
    assert {r.term for r in got3} == {"a a b"}


def test_countmin_validates(spark):
    from claimskg_generator_spark.operators.sketches import (
        countmin_heavy_hitters,
    )

    docs = _docs(spark, ["x"])
    for kw in ({"min_count": 0}, {"min_count": 1, "depth": 0},
               {"min_count": 1, "width": 0},
               {"min_count": 1, "ngram": 0}):
        with pytest.raises(ValueError):
            countmin_heavy_hitters(docs, **kw)
