"""Bigram-LM perplexity gate (operators/lm.py) and embedding concept
recognition (operators/recognizers.py): hand-computed / independent
pure-Python twins, edge cases, and plan-shape discipline."""

import math
import re

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.lm import (
    bigram_lm_perplexity,
    doc_bigrams,
    train_bigram_lm,
)
from claimskg_generator_spark.operators.recognizers import (
    concept_centroids,
    concept_recognize,
)


def _ref_ppl(texts, alpha=0.1):
    """Independent row-at-a-time twin of the distributed LM scorer."""
    toks = {
        i: ["<s>"] + re.split(r"\s+", t.strip().lower())
        for i, t in enumerate(texts)
    }
    bigrams = {
        i: list(zip(tk, tk[1:])) for i, tk in toks.items()
    }
    c12, c1 = {}, {}
    for bgs in bigrams.values():
        for b in bgs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    vocab = {w2 for (_, w2) in c12}
    v = len(vocab)
    out = {}
    for i, bgs in bigrams.items():
        nll = -sum(
            math.log((c12[b] + alpha) / (c1[b[0]] + alpha * v))
            for b in bgs
        ) / len(bgs)
        out[i] = (len(bgs), round(nll, 4), round(math.exp(nll), 4))
    return out


def test_bigram_lm_matches_python_twin(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "the dog and the cat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_tokens, r.avg_nll, r.ppl)
        for r in bigram_lm_perplexity(docs).collect()
    }
    assert got == _ref_ppl(texts)


def test_bigram_lm_keep_gate_uses_rounded_ppl(spark):
    texts = ["x y x y x y", "q w e r t y u i o p"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    ref = _ref_ppl(texts)
    # the repetitive doc has lower perplexity under the corpus LM
    assert ref[0][2] < ref[1][2]
    cut = (ref[0][2] + ref[1][2]) / 2
    got = {
        r.doc_id: r.keep
        for r in bigram_lm_perplexity(docs, max_ppl=cut).collect()
    }
    assert got == {0: True, 1: False}
    # gate exactly AT the rounded ppl is inclusive
    got_at = {
        r.doc_id: r.keep
        for r in bigram_lm_perplexity(docs, max_ppl=ref[0][2]).collect()
    }
    assert got_at[0] is True


def test_bigram_lm_pretrained_model_path(spark):
    train = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran")], ["doc_id", "text"]
    )
    target = spark.createDataFrame([(7, "the cat sat")], ["doc_id", "text"])
    lm = train_bigram_lm(doc_bigrams(train))
    [row] = bigram_lm_perplexity(target, lm=lm).collect()
    # by hand: V = {the, cat, sat, ran} -> 4 distinct successors;
    # p(the|<s>)=(2+.1)/(2+.4), p(cat|the)=(2+.1)/(2+.4),
    # p(sat|cat)=(1+.1)/(2+.4)
    a = 0.1
    nll = -(
        math.log((2 + a) / (2 + 4 * a)) * 2 + math.log((1 + a) / (2 + 4 * a))
    ) / 3
    assert row.n_tokens == 3
    assert row.avg_nll == round(nll, 4)
    assert row.ppl == round(math.exp(nll), 4)


def test_bigram_lm_rejects_bad_alpha(spark):
    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bigram_lm_perplexity(docs, alpha=0.0)


def _vec_df(spark):
    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.9, 0.1]),
        (2, 1, [0.0, 1.0]),
        (3, 1, [0.1, 0.9]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "label", "embedding"])


def test_concept_centroids_elementwise_mean(spark):
    cents = {
        r.concept: r.cv for r in concept_centroids(_vec_df(spark)).collect()
    }
    assert cents[0] == pytest.approx([0.95, 0.05])
    assert cents[1] == pytest.approx([0.05, 0.95])


def test_concept_recognize_assigns_nearest_centroid(spark):
    got = {
        r.vec_id: (r.true_label, r.concept, r.cosine)
        for r in concept_recognize(_vec_df(spark), threshold=0.0).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for vid, (true_label, concept, cos) in got.items():
        assert concept == true_label
        assert cos > 0.9
    # hand-check one cosine: (1,0) . (0.95,0.05) / (1 * |c|)
    c = math.hypot(0.95, 0.05)
    assert got[0][2] == round(0.95 / c, 4)


def test_concept_recognize_tie_breaks_to_smaller_concept(spark):
    # one (1,1) vector per concept keeps the centroids mirror-symmetric,
    # so both (1,1) rows tie on rounded cosine -> concept 0 wins for both
    df = _vec_df(spark).union(
        spark.createDataFrame(
            [(9, 0, [1.0, 1.0]), (10, 1, [1.0, 1.0])],
            ["vec_id", "label", "embedding"],
        )
    )
    got = {
        r.vec_id: r.concept
        for r in concept_recognize(df, threshold=0.0).collect()
    }
    assert got[9] == 0 and got[10] == 0


def test_concept_recognize_threshold_filters(spark):
    df = _vec_df(spark).union(
        spark.createDataFrame([(9, 0, [-1.0, 0.0])],
                              ["vec_id", "label", "embedding"])
    )
    ids = {r.vec_id for r in concept_recognize(df, threshold=0.0).collect()}
    assert 9 not in ids  # best cosine is negative
    ids_all = {
        r.vec_id for r in concept_recognize(df, threshold=-1.0).collect()
    }
    assert 9 in ids_all


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


SF = "/root/testdata/sf0.001"


def test_lm_plan_no_python_udf_and_broadcast_vocab(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bigram_lm_perplexity(docs))
    assert "EvalPython" not in plan  # all-JVM arithmetic
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_recognize_plan_is_broadcast_map_side(spark):
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(concept_recognize(vecs, threshold=0.2))
    assert "EvalPython" not in plan
    # the centroid array rides a broadcast; the big side never shuffles
    # (the only exchanges feed the |C| x dim centroid aggregate)
    assert "BroadcastNestedLoopJoin" in plan
    big_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "SortMergeJoin" not in plan


def test_kn_bigram_table_counts_and_normalization(spark):
    """Continuation counts against a hand-computed corpus, and the KN
    identity sum_w2 pkn(w2|w1) == 1 for every context."""
    from collections import Counter

    from claimskg_generator_spark.operators.lm import kn_bigram_table

    texts = ["the cat sat", "the dog sat", "a cat ran the cat sat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")
    rows = kn_bigram_table(docs, discount=0.75).collect()

    # python twin of the counts
    bigrams = Counter()
    for t in texts:
        tk = ["<s>"] + t.split()
        bigrams.update(zip(tk, tk[1:]))
    fw = Counter(w1 for w1, _ in bigrams)
    bwc = Counter(w2 for _, w2 in bigrams)
    c1 = Counter()
    for (w1, _), c in bigrams.items():
        c1[w1] += c
    for r in rows:
        key = (r["w1"], r["w2"])
        assert r["c12"] == bigrams[key]
        assert r["c1"] == c1[r["w1"]]
        assert r["n1p_fw"] == fw[r["w1"]]
        assert r["n1p_bw"] == bwc[r["w2"]]
        assert r["n1p_all"] == len(bigrams)

    # KN normalization: discounted mass + the full backoff mass sums
    # to 1 per context (seen rows carry lam * their p_cont share; the
    # remaining lam mass belongs to unseen continuations)
    for w1 in fw:
        seen = [r for r in rows if r["w1"] == w1]
        lam = 0.75 * fw[w1] / c1[w1]
        p_cont_seen = sum(bwc[r["w2"]] for r in seen) / len(bigrams)
        total = sum(max(r["c12"] - 0.75, 0) / c1[w1] for r in seen) \
            + lam * 1.0
        # sum over seen rows of pkn = discounted mass + lam*p_cont_seen
        s = sum(r["pkn"] for r in seen)
        import math
        assert math.isclose(
            s, sum(max(r["c12"] - 0.75, 0) / c1[w1] for r in seen)
            + lam * p_cont_seen, rel_tol=1e-12)
        assert math.isclose(total, 1.0, rel_tol=1e-12)

    import pytest as _pt
    with _pt.raises(ValueError, match="discount"):
        kn_bigram_table(docs, discount=1.5)


# ------------------------------------------------ PMI collocations


def _pmi_py(texts, min_count=2, delta=1):
    from collections import Counter

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = t.strip().lower().split()
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    n = sum(uni.values())
    out = {}
    for (w1, w2), c12 in bi.items():
        if c12 >= min_count:
            out[(w1, w2)] = (c12, uni[w1], uni[w2], n,
                             str((c12 - delta) * n),
                             str(uni[w1] * uni[w2]))
    return out


def test_pmi_collocations_match_python_twin(spark):
    from claimskg_generator_spark.operators.lm import pmi_collocations

    texts = ["new york is big", "new york wins", "big wins",
             "york is new", "new york new york"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"],
                                r["n_tokens"], r["score_num"],
                                r["score_den"])
           for r in pmi_collocations(docs, min_count=2).collect()}
    assert got == _pmi_py(texts, min_count=2)
    assert ("new", "york") in got          # the collocation survives


def test_pmi_sentinel_never_collocates(spark):
    from claimskg_generator_spark.operators.lm import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta")], "doc_id long, text string")
    rows = pmi_collocations(docs, min_count=1).collect()
    assert all(r["w1"] != "<s>" for r in rows)
    # doc-initial tokens still count as unigrams
    got = {(r["w1"], r["w2"]): r["c1"] for r in rows}
    assert got[("alpha", "beta")] == 2


def test_pmi_min_count_filters_before_join(spark):
    from claimskg_generator_spark.operators.lm import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], "doc_id long, text string")
    pairs = {(r["w1"], r["w2"])
             for r in pmi_collocations(docs, min_count=2).collect()}
    assert pairs == {("a", "b")}           # (b,a) and (c,d) are count 1


def test_pmi_guards(spark):
    from claimskg_generator_spark.operators.lm import pmi_collocations

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, min_count=0)
    with pytest.raises(ValueError, match="delta"):
        pmi_collocations(docs, delta=-1)
