"""TransE-style training-pair generation (operators/kg_embed.py):
python-twin parity of the md5 draws, the filtered protocol, and the
determinism contract.  The full value path is pinned by driver q154."""

import hashlib

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.kg_embed import (
    entity_index,
    kg_train_pairs,
)

EDGES = [
    ("a", "dep", "b"), ("b", "dep", "c"), ("a", "link", "c"),
    ("c", "dep", "d"), ("d", "link", "a"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        EDGES, "subj string, pred string, obj string")


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_vocab(entities, n_buckets=1024):
    ordered = sorted(entities, key=lambda t: (_h60(t) % n_buckets, t))
    return {i + 1: t for i, t in enumerate(ordered)}


def _py_pairs(rows, k=2, seed="transe", filtered=False):
    ents = {s for s, _, _ in rows} | {o for _, _, o in rows}
    voc = _py_vocab(ents)
    e = len(voc)
    out = []
    truth = set(rows)
    for (s, p, o) in rows:
        for slot in range(k):
            ident = f"{s}:{p}:{o}:{slot}"
            side = _h60(f"{seed}:side:{ident}") % 2
            neg = voc[_h60(f"{seed}:ent:{ident}") % e + 1]
            ns, no = (neg, o) if side == 0 else (s, neg)
            if filtered and (ns, p, no) in truth:
                continue
            out.append((s, p, o, slot,
                        "head" if side == 0 else "tail", ns, no))
    return sorted(out)


def test_entity_index_is_dense_and_engine_stable(edges):
    idx = entity_index(edges).collect()
    assert sorted(r["idx"] for r in idx) == [1, 2, 3, 4]
    got = {r["idx"]: r["token"] for r in idx}
    assert got == _py_vocab({"a", "b", "c", "d"})


def test_pairs_match_python_twin(edges):
    got = sorted(map(tuple, kg_train_pairs(edges, k=2).collect()))
    assert got == _py_pairs(EDGES, k=2)


def test_filtered_drops_true_triples(edges):
    got = sorted(map(tuple,
                     kg_train_pairs(edges, k=3, filtered=True).collect()))
    exp = _py_pairs(EDGES, k=3, filtered=True)
    assert got == exp
    # the filter only ever removes rows, and the removed rows are
    # exactly the true corrupted triples
    unf = _py_pairs(EDGES, k=3)
    truth = set(EDGES)
    assert exp == [r for r in unf if (r[5], r[1], r[6]) not in truth]
    assert len(exp) < len(unf) or all(
        (r[5], r[1], r[6]) not in truth for r in unf)


def test_unfiltered_cardinality_and_sides(edges):
    rows = kg_train_pairs(edges, k=4).collect()
    assert len(rows) == 4 * len(EDGES)
    for r in rows:
        if r["side"] == "head":
            assert r["neg_obj"] == r["obj"]
        else:
            assert r["neg_subj"] == r["subj"]
        assert {r["neg_subj"], r["neg_obj"]} <= {"a", "b", "c", "d"}


def test_determinism_across_runs(edges):
    a = sorted(map(tuple, kg_train_pairs(edges, k=2).collect()))
    b = sorted(map(tuple,
                   kg_train_pairs(edges.repartition(7), k=2).collect()))
    assert a == b


def test_seed_changes_the_corpus(edges):
    a = sorted(map(tuple, kg_train_pairs(edges, k=2, seed="x").collect()))
    b = sorted(map(tuple, kg_train_pairs(edges, k=2, seed="y").collect()))
    assert a != b


def test_k_validation(edges):
    with pytest.raises(ValueError, match="k must be >= 1"):
        kg_train_pairs(edges, k=0)
