"""Salted two-phase per-key top-k + inverted-index builder
(operators/topk.py)."""

import random

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.topk import (
    build_inverted_index,
    topk_per_key,
)


def _naive_topk(rows, k):
    """rows: (key, value, rid) -> {key: [(value, rid) top-k by
    (value desc, rid asc)]}"""
    out = {}
    for key in {r[0] for r in rows}:
        grp = sorted(((v, i) for kk, v, i in rows if kk == key),
                     key=lambda t: (-t[0], t[1]))
        out[key] = grp[:k]
    return out


def test_topk_per_key_exact_with_hot_key(spark):
    rng = random.Random(41)
    # key 'hot' has 500 rows, the others a handful each — the two-phase
    # result must still be the EXACT global top-k per key
    rows = [("hot", rng.randrange(100), i) for i in range(500)]
    rows += [(f"k{j}", rng.randrange(100), 1000 + 10 * j + i)
             for j in range(20) for i in range(rng.randint(1, 6))]
    df = spark.createDataFrame(rows, "key string, value long, rid long")
    want = _naive_topk(rows, 5)
    for n_salts in (1, 7, 64):
        got = {}
        res = topk_per_key(
            df, ["key"], [(F.col("value"), False), (F.col("rid"), True)],
            k=5, salt_col=F.crc32(F.col("rid").cast("string")),
            n_salts=n_salts,
        ).collect()
        for r in res:
            got.setdefault(r["key"], []).append(
                (r["rnk"], r["value"], r["rid"]))
        assert {k: [(v, i) for _, v, i in sorted(vs)]
                for k, vs in got.items()} == want, n_salts


def test_topk_per_key_validation(spark):
    df = spark.createDataFrame([("a", 1, 1)], "key string, value long, "
                               "rid long")
    with pytest.raises(ValueError):
        topk_per_key(df, ["key"], [(F.col("value"), False)], k=0,
                     salt_col=F.col("rid"))
    with pytest.raises(ValueError):
        topk_per_key(df, ["key"], [(F.col("value"), False)], k=1,
                     salt_col=F.col("rid"), n_salts=0)


def test_inverted_index_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana banana cherry"),
            (3, "apple cherry cherry cherry"),
        ],
        ["doc_id", "text"],
    )
    got = {(r["term"], r["rnk"]): (r["df"], r["doc_id"], r["tf"])
           for r in build_inverted_index(docs, max_postings=2).collect()}
    assert got[("apple", 1)] == (2, 1, 2)      # df=2, doc 1 has tf 2
    assert got[("apple", 2)] == (2, 3, 1)
    assert got[("banana", 1)] == (2, 2, 2)
    assert got[("banana", 2)] == (2, 1, 1)
    assert got[("cherry", 1)] == (2, 3, 3)
    assert got[("cherry", 2)] == (2, 2, 1)
    # cap: a term in 3 docs keeps only 2 postings but df stays 3
    docs2 = spark.createDataFrame(
        [(i, "zz " * (i + 1)) for i in range(3)], ["doc_id", "text"]
    )
    rows = build_inverted_index(docs2, max_postings=2).collect()
    assert all(r["df"] == 3 for r in rows) and len(rows) == 2
    assert [(r["doc_id"], r["tf"]) for r in
            sorted(rows, key=lambda r: r["rnk"])] == [(2, 3), (1, 2)]
