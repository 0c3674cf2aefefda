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
