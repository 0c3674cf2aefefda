"""Triple-level P/R scoring (operators/evaluation.triple_pr): the
north rule's acceptance metric as one distributed fold.  The q145
driver row pins the md5-URN corpus instantiation against DuckDB; these
tests cover the metric algebra itself — known overlaps, set semantics
under duplicate inputs, custom key tuples, and the empty-side NULL
contract SQL division implies."""

import math

import pytest

from claimskg_generator_spark.operators.evaluation import triple_pr


def _trips(spark, rows):
    return spark.createDataFrame(
        [(s, "p", o, "") for s, o in rows],
        "subj string, pred string, obj string, okind string")


def test_known_overlap(spark):
    gold = _trips(spark, [("a", "1"), ("b", "2"), ("c", "3"), ("d", "4")])
    cand = _trips(spark, [("a", "1"), ("b", "2"), ("x", "9")])
    r = triple_pr(cand, gold).collect()[0]
    assert (r["tp"], r["n_candidate"], r["n_gold"]) == (2, 3, 4)
    assert r["precision"] == pytest.approx(2 / 3)
    assert r["recall"] == pytest.approx(0.5)
    p, rc = 2 / 3, 0.5
    assert r["f1"] == pytest.approx(2 * p * rc / (p + rc))


def test_set_semantics_dedups_both_sides(spark):
    gold = _trips(spark, [("a", "1"), ("a", "1"), ("b", "2")])
    cand = _trips(spark, [("a", "1"), ("a", "1"), ("a", "1")])
    r = triple_pr(cand, gold).collect()[0]
    assert (r["tp"], r["n_candidate"], r["n_gold"]) == (1, 1, 2)
    assert r["precision"] == 1.0 and r["recall"] == 0.5


def test_custom_keys_ignore_okind(spark):
    gold = spark.createDataFrame(
        [("a", "p", "1", "uri")],
        "subj string, pred string, obj string, okind string")
    cand = spark.createDataFrame(
        [("a", "p", "1", "")],
        "subj string, pred string, obj string, okind string")
    full = triple_pr(cand, gold).collect()[0]
    loose = triple_pr(cand, gold, keys=("subj", "pred", "obj")).collect()[0]
    assert full["tp"] == 0 and loose["tp"] == 1


def test_empty_candidate_null_precision_zero_recall(spark):
    gold = _trips(spark, [("a", "1")])
    cand = _trips(spark, []).limit(0)
    r = triple_pr(cand, gold).collect()[0]
    assert r["n_candidate"] == 0 and r["n_gold"] == 1 and r["tp"] == 0
    assert r["precision"] is None
    assert r["recall"] == 0.0
    assert r["f1"] is None


def test_identical_graphs_perfect_score(spark):
    g = _trips(spark, [("a", "1"), ("b", "2")])
    r = triple_pr(g, g).collect()[0]
    assert r["precision"] == 1.0 and r["recall"] == 1.0
    assert math.isclose(r["f1"], 1.0)


def test_ngram_overlap_matches_python_twin(spark):
    from collections import Counter

    from claimskg_generator_spark.operators.evaluation import (
        ngram_overlap,
    )

    rows = [("the cat sat on the mat", "the cat is on the mat"),
            ("a b", "a b c d"),
            ("z", "q")]
    df = spark.createDataFrame(rows, "candidate string, reference string")
    r = ngram_overlap(df, max_n=2).collect()[0]

    def grams(toks, n):
        return Counter(" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1))

    exp = {"cand_len": 0, "ref_len": 0, "clipped_1": 0, "total_1": 0,
           "clipped_2": 0, "total_2": 0}
    for c, g in rows:
        ct, rt = c.split(), g.split()
        exp["cand_len"] += len(ct)
        exp["ref_len"] += len(rt)
        for n in (1, 2):
            cg, rg = grams(ct, n), grams(rt, n)
            exp[f"clipped_{n}"] += sum(
                min(v, rg[k]) for k, v in cg.items())
            exp[f"total_{n}"] += sum(cg.values())
    for k, v in exp.items():
        assert r[k] == v, k
    assert r["p1"] == exp["clipped_1"] / exp["total_1"]
    assert r["p2"] == exp["clipped_2"] / exp["total_2"]


def test_ngram_overlap_short_and_empty_edges(spark):
    from claimskg_generator_spark.operators.evaluation import (
        ngram_overlap,
    )

    # single-token candidate: zero bigrams, never bogus descending
    # sequence grams; empty candidate: zero everything, NULL p1
    df = spark.createDataFrame(
        [("x", "x y"), ("", "y z")],
        "candidate string, reference string")
    r = ngram_overlap(df, max_n=2).collect()[0]
    assert (r["cand_len"], r["total_1"], r["total_2"]) == (1, 1, 0)
    assert (r["clipped_1"], r["clipped_2"]) == (1, 0)
    assert r["p2"] is None
    import pytest as _pt
    with _pt.raises(ValueError, match="max_n"):
        ngram_overlap(df, max_n=0)
