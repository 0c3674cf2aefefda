"""Skip-gram training-pair generation (operators/skipgram.py): pair
windows, the two-phase vocabulary index, deterministic negative picks
(uniform and frequency-weighted), and the guards.  The q147 driver row
pins the md5/index value semantics against DuckDB; these tests cover
the algebra and the weighted mode SQL does not exercise."""

import hashlib

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.skipgram import (
    negative_samples,
    ranked_vocab,
    skipgram_pairs,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _sents(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pairs_match_python_twin(spark):
    rows = [(1, "a b c d"), (2, "x"), (3, "p q")]
    got = sorted(map(tuple, skipgram_pairs(
        _sents(spark, rows), window=2).collect()))
    exp = []
    for doc_id, text in rows:
        toks = text.split()
        n = len(toks)
        for i in range(1, n + 1):
            for j in range(max(1, i - 2), min(n, i + 2) + 1):
                if j != i:
                    exp.append((doc_id, i, j, toks[i - 1], toks[j - 1]))
    assert got == sorted(exp)
    # single-token sentences emit no pairs
    assert not [r for r in got if r[0] == 2]


def test_ranked_vocab_dense_permutation(spark):
    toks = spark.createDataFrame(
        [(t,) for t in "the quick brown fox jumps the the fox".split()],
        "token string")
    voc = ranked_vocab(toks, n_buckets=4).collect()
    idxs = sorted(r["idx"] for r in voc)
    assert idxs == list(range(1, 6))  # dense 1..V over 5 distinct
    # the realized total order is (md5-bucket, token)
    order = sorted(voc, key=lambda r: r["idx"])
    keyed = sorted(((_h60(r["token"]) % 4, r["token"]) for r in voc))
    assert [t for _, t in keyed] == [r["token"] for r in order]
    # occurrence mode: every row indexed, keys carry the order
    occ = toks.select("token", F.concat_ws(
        ":", F.lit("o"), F.monotonically_increasing_id().cast("string")
    ).alias("okey"))
    ranked = ranked_vocab(occ, key_col="okey", n_buckets=4)
    assert sorted(r["idx"] for r in ranked.collect()) == list(range(1, 9))


def test_negatives_deterministic_and_uniform_pick(spark):
    sents = _sents(spark, [(7, "a b c")])
    pairs = skipgram_pairs(sents, window=1)
    toks = sents.select(F.explode(F.split(
        F.trim(F.lower("text")), r"\s+")).alias("token"))
    out = negative_samples(pairs, toks, k=3, seed="t").collect()
    # vocabulary = {a, b, c} indexed by (md5-bucket % 1024, token)
    voc = sorted(((_h60(t) % 1024, t) for t in "abc"))
    order = [t for _, t in voc]
    for r in out:
        pick = _h60(f"t:{r['doc_id']}:{r['i']}:{r['j']}:{r['slot']}") % 3
        assert r["negative"] == order[pick]
    # 4 pairs x 3 slots
    assert len(out) == 12
    again = negative_samples(pairs, toks, k=3, seed="t").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_weighted_mode_is_unigram_exact(spark):
    """Occurrence indexing makes the uniform index pick an exact
    unigram-frequency pick: replaying the occurrence order in Python
    must give the identical negatives."""
    sents = _sents(spark, [(1, "a a a b")])
    pairs = skipgram_pairs(sents, window=1)
    occ = sents.select(
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+"))
        .alias("pos", "token")
    ).select("token", F.concat_ws(
        ":", F.lit("1"), F.col("pos").cast("string")).alias("okey"))
    out = negative_samples(pairs, occ, k=4, seed="w", weighted=True,
                           n_buckets=8).collect()
    okeys = [("1", f"1:{p}", t) for p, t in
             enumerate(["a", "a", "a", "b"])]
    order = [t for _, _, t in sorted(
        okeys, key=lambda r: (_h60(r[1]) % 8, r[1]))]
    for r in out:
        pick = _h60(f"w:{r['doc_id']}:{r['i']}:{r['j']}:{r['slot']}") % 4
        assert r["negative"] == order[pick]
    # 3 of 4 occurrence slots are 'a': the weighting is live
    freq = {"a": 0, "b": 0}
    for t in order:
        freq[t] += 1
    assert freq == {"a": 3, "b": 1}


def test_guards(spark):
    sents = _sents(spark, [(1, "a b")])
    toks = sents.select(F.explode(F.split("text", " ")).alias("token"))
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(sents, window=0)
    with pytest.raises(ValueError, match="k must be"):
        negative_samples(skipgram_pairs(sents), toks, k=0)


def test_cooccurrence_exact_integer_damping(spark):
    from claimskg_generator_spark.operators.skipgram import (
        cooccurrence_counts,
    )

    sents = _sents(spark, [(1, "a b a b a")])
    pairs = skipgram_pairs(sents, window=2)
    out = {(r["center"], r["context"]):
           (r["n"], r["weight_num"], r["weight_den"])
           for r in cooccurrence_counts(pairs, window=2).collect()}
    # positions: a@1 b@2 a@3 b@4 a@5; lcm(1..2)=2, each pair adds 2/d
    # (a,b): the d=1 pairs (1,2),(3,2),(3,4),(5,4); no d=2 pair links
    # a to b -> n=4, weight_num = 4 * 2 = 8
    assert out[("a", "b")] == (4, 8, 2)
    # (a,a): d=2 pairs (1,3),(3,1),(3,5),(5,3) -> n=4, 4*1=4
    assert out[("a", "a")] == (4, 4, 2)
    # unweighted mode: bare counts only
    plain = cooccurrence_counts(pairs)
    assert plain.columns == ["center", "context", "n"]
    got_n = {(r["center"], r["context"]): r["n"] for r in plain.collect()}
    assert got_n[("a", "b")] == 4
    with pytest.raises(ValueError, match="window"):
        cooccurrence_counts(pairs, window=0)
    # pairs beyond the weighting window are filtered, never truncated
    # to a zero weight: window=1 over window=2 pairs keeps only d=1
    narrow = {(r["center"], r["context"]): (r["n"], r["weight_num"])
              for r in cooccurrence_counts(pairs, window=1).collect()}
    assert narrow[("a", "b")] == (4, 4)  # the 4 d=1 pairs, weight 1/d=1
    assert ("a", "a") not in narrow      # all (a,a) pairs were d=2


def test_pair_symmetry_and_count_formula(spark):
    """Invariants over a seeded random corpus: (i,j) emitted iff (j,i)
    emitted (the skip-gram window is symmetric), and the total pair
    count matches the closed form sum_i |window(i)|."""
    import random

    rng = random.Random(7)
    rows = [(d, " ".join(
        rng.choice("abcde") for _ in range(rng.randint(1, 12))))
        for d in range(25)]
    w = 3
    pairs = skipgram_pairs(_sents(spark, rows), window=w).collect()
    seen = {(r["doc_id"], r["i"], r["j"]) for r in pairs}
    assert seen == {(d, j, i) for d, i, j in seen}
    expected = 0
    for _, text in rows:
        n = len(text.split())
        expected += sum(
            min(n, i + w) - max(1, i - w) for i in range(1, n + 1))
    assert len(pairs) == expected


def test_triple_pr_bounds_and_symmetry(spark):
    """tp <= min(sides); swapping candidate and gold swaps
    precision/recall; f1 is the harmonic mean of the two."""
    import random

    from claimskg_generator_spark.operators.evaluation import triple_pr

    rng = random.Random(11)
    mk = lambda: [(f"s{rng.randint(0, 30)}", "p",  # noqa: E731
                   f"o{rng.randint(0, 5)}", "") for _ in range(40)]
    a = spark.createDataFrame(
        mk(), "subj string, pred string, obj string, okind string")
    b = spark.createDataFrame(
        mk(), "subj string, pred string, obj string, okind string")
    r1 = triple_pr(a, b).collect()[0]
    r2 = triple_pr(b, a).collect()[0]
    assert r1["tp"] == r2["tp"] <= min(r1["n_candidate"], r1["n_gold"])
    assert r1["precision"] == r2["recall"]
    assert r1["recall"] == r2["precision"]
    if r1["tp"]:
        p, rc = r1["precision"], r1["recall"]
        assert abs(r1["f1"] - 2 * p * rc / (p + rc)) < 1e-12
