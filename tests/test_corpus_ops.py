"""Unit tests for the round-4 corpus-pipeline additions: repetition
metrics, as-of join, bucketed range join, stratified hash-gate sampling,
PII scrub."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from claimskg_generator_spark.functions.pii import redact, with_pii_scrub
from claimskg_generator_spark.operators.asof import (
    asof_join,
    range_join_by_bucket,
)
from claimskg_generator_spark.operators.sampling import (
    hash_gate,
    stratified_sample,
)
from claimskg_generator_spark.operators.textstats import (
    with_repetition_metrics,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------

def test_repetition_metrics_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # 4 tokens, 1 distinct; bigram 'a a' x3
            (2, "w x y z"),          # all unique; 3 bigrams each once
            (3, "only"),             # 1 token, no bigrams
            (4, ""),                 # empty
            (5, "go go stop go go"),  # 'go go' 2 of 4 bigrams
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in with_repetition_metrics(docs).collect()
    }
    assert out[1]["n_tokens"] == 4
    assert out[1]["dup_token_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[4]["n_tokens"] == 0
    assert out[4]["dup_token_frac"] == 0.0
    assert out[5]["top_bigram_frac"] == 0.5


def test_repetition_metrics_case_insensitive(spark):
    docs = spark.createDataFrame([(1, "The THE the")], ["doc_id", "text"])
    row = with_repetition_metrics(docs).collect()[0]
    assert row["dup_token_frac"] == pytest.approx(2 / 3, abs=1e-4)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def test_asof_join_basic_ties_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T10:00:00")),
            (101, 1, _ts("2024-01-01T09:00:00")),  # before any right row
            (102, 2, _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (7, 1, _ts("2024-01-01T09:30:00")),
            (8, 1, _ts("2024-01-01T10:00:00")),  # equal ts -> <= matches
            (9, 1, _ts("2024-01-01T10:00:00")),  # tie: greatest rid wins
            (5, 1, _ts("2024-01-01T11:00:00")),  # in the future -> never
        ],
        ["rid", "k", "ts"],
    )
    out = {
        r["lid"]: r
        for r in asof_join(
            left, right, on=["k"], right_cols=["rid"]
        ).collect()
    }
    assert out[100]["rid_right"] == 9  # ties on ts broken to max rid
    assert out[100]["ts_right"] == _ts("2024-01-01T10:00:00")
    assert out[101]["rid_right"] is None
    assert out[102]["rid_right"] is None
    assert len(out) == 3


def test_asof_join_strictly_prior_match(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T12:00:00"))], ["lid", "k", "ts"]
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts("2024-01-01T11:00:00")),
            (11, 1, _ts("2024-01-01T11:59:59")),
        ],
        ["rid", "k", "ts"],
    )
    row = asof_join(left, right, on=["k"], right_cols=["rid"]).collect()[0]
    assert row["rid_right"] == 11


# ---------------------------------------------------------------------------
# bucketed range join
# ---------------------------------------------------------------------------

def test_range_join_boundaries(spark):
    t0 = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t0)], ["lid", "lts"])
    right = spark.createDataFrame(
        [
            (1, t0 - dt.timedelta(seconds=60)),       # exactly -60 s: in
            (2, t0 + dt.timedelta(seconds=60)),       # exactly +60 s: in
            (3, t0 - dt.timedelta(seconds=60, microseconds=1)),  # out
            (4, t0 + dt.timedelta(seconds=61)),       # out
            (5, t0),                                   # same instant: in
        ],
        ["rid", "rts"],
    )
    out = range_join_by_bucket(
        left, right, "lts", "rts", tolerance_us=60_000_000
    )
    assert sorted(r["rid"] for r in out.collect()) == [1, 2, 5]


def test_range_join_no_duplicate_pairs_across_bins(spark):
    # Right rows near bin boundaries must appear exactly once per left row.
    t0 = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=7 * i)) for i in range(40)],
        ["lid", "lts"],
    )
    right = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=5 * i)) for i in range(60)],
        ["rid", "rts"],
    )
    out = range_join_by_bucket(
        left, right, "lts", "rts", tolerance_us=30_000_000
    )
    pairs = [(r["lid"], r["rid"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # cross-check against the naive quadratic answer
    lrows = {r["lid"]: r["lts"] for r in left.collect()}
    rrows = {r["rid"]: r["rts"] for r in right.collect()}
    expect = {
        (li, ri)
        for li, lt in lrows.items()
        for ri, rt in rrows.items()
        if abs((lt - rt).total_seconds()) <= 30
    }
    assert set(pairs) == expect


def test_range_join_left_keeps_unmatched(spark):
    t0 = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [(1, t0), (2, t0 + dt.timedelta(hours=5))], ["lid", "lts"]
    )
    right = spark.createDataFrame([(9, t0)], ["rid", "rts"])
    out = range_join_by_bucket(
        left, right, "lts", "rts", tolerance_us=60_000_000, how="left"
    ).collect()
    by_lid = {r["lid"]: r for r in out}
    assert by_lid[1]["rid"] == 9
    assert by_lid[2]["rid"] is None


def test_range_join_left_matches_naive_quadratic(spark):
    """VERDICT r4 #5: left mode is now a single native left-outer bucket
    join (right side replicated into neighbor bins) — no second left-anti
    scan.  Cross-check the full left-mode answer against the naive
    quadratic join, unmatched rows included exactly once."""
    t0 = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=11 * i)) for i in range(35)],
        ["lid", "lts"],
    )
    right = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=23 * i)) for i in range(20)],
        ["rid", "rts"],
    )
    out = range_join_by_bucket(
        left, right, "lts", "rts", tolerance_us=15_000_000, how="left"
    )
    got = sorted((r["lid"], r["rid"]) for r in out.collect())
    lrows = {r["lid"]: r["lts"] for r in left.collect()}
    rrows = {r["rid"]: r["rts"] for r in right.collect()}
    expect = []
    for li, lt in lrows.items():
        ms = [ri for ri, rt in rrows.items()
              if abs((lt - rt).total_seconds()) <= 15]
        expect.extend((li, ri) for ri in ms) if ms else expect.append(
            (li, None))
    assert got == sorted(expect, key=lambda p: (p[0], p[1] is None, p[1]))
    # single pass: the plan contains no anti join and scans left once
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" not in plan


# ---------------------------------------------------------------------------
# stratified hash-gate sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_matches_stdlib_md5(spark):
    rows = [(i, ["en", "fr", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    rates = {"en": 0.5, "fr": 0.25}
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", rates, "doc_id", 0.1).collect()
    }

    def gate(i, rate):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return h < format(int(rate * 65536), "04x")

    expect = {
        i for i, lang in rows if gate(i, rates.get(lang, 0.1))
    }
    assert kept == expect


def test_stratified_sample_deterministic_and_rate_extremes(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(100)], ["doc_id", "lang"]
    )
    all_kept = stratified_sample(df, "lang", {"en": 1.0}, "doc_id").count()
    none_kept = stratified_sample(df, "lang", {"en": 0.0}, "doc_id").count()
    assert (all_kept, none_kept) == (100, 0)
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.3}, "doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.3}, "doc_id").collect()
    )
    assert a == b


def test_hash_gate_rejects_bad_rate(spark):
    with pytest.raises(ValueError):
        hash_gate(F.col("x"), 1.5)


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail alice.smith+x@corp.example.com now"),
            (2, "server at 192.168.10.254 rebooted"),
            (3, "call 555-867-5309 or 415.555.0100"),
            (4, "clean text, nothing here"),
            (5, "bob@10.0.0.1.example.org and 10.0.0.1"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in with_pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1
    assert out[1]["redacted"] == "mail <EMAIL> now"
    assert out[2]["n_ipv4"] == 1
    assert out[2]["redacted"] == "server at <IP> rebooted"
    assert out[3]["n_phones"] == 2
    assert out[3]["redacted"] == "call <PHONE> or <PHONE>"
    assert out[4]["redacted"] == "clean text, nothing here"
    # email redaction runs first, so the in-domain IP is consumed by it;
    # the standalone IP is still caught
    assert out[5]["n_emails"] == 1
    assert out[5]["redacted"] == "<EMAIL> and <IP>"


def test_pii_redact_column_composes(spark):
    df = spark.createDataFrame([Row(t="x@y.org")])
    assert df.select(redact(F.col("t")).alias("r")).collect()[0]["r"] == (
        "<EMAIL>"
    )


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------------

def test_pack_offsets_match_naive_prefix_sum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 200)) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    from claimskg_generator_spark.operators.packing import with_pack_offsets

    out = {
        r["doc_id"]: (r["start_offset"], r["chunk_id"])
        for r in with_pack_offsets(
            df, "n_tokens", "doc_id", seq_len=256, bucket_span=32
        ).collect()
    }
    acc = 0
    for i, n in rows:
        assert out[i] == (acc, acc // 256)
        acc += n


def test_pack_offsets_sparse_ids_and_bucket_gaps(spark):
    # ids with holes: empty buckets must not corrupt the prefix chain
    rows = [(i * 97, 10) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    from claimskg_generator_spark.operators.packing import with_pack_offsets

    out = {
        r["doc_id"]: r["start_offset"]
        for r in with_pack_offsets(
            df, "n_tokens", "doc_id", seq_len=64, bucket_span=100
        ).collect()
    }
    for rank, (i, _) in enumerate(sorted(rows)):
        assert out[i] == rank * 10


def test_pack_offsets_rejects_bad_params(spark):
    from claimskg_generator_spark.operators.packing import with_pack_offsets

    df = spark.createDataFrame([(1, 1)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        with_pack_offsets(df, "n_tokens", "doc_id", seq_len=0)


# ---------------------------------------------------------------------------
# keep_all gate chaining
# ---------------------------------------------------------------------------

def test_keep_all_chaining_preserves_columns_and_values(spark):
    from claimskg_generator_spark.operators.textstats import (
        with_quality_score,
        with_repetition_metrics,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "en"), (2, "go go go go", "zh")],
        ["doc_id", "text", "lang"],
    )
    chained = with_repetition_metrics(
        with_quality_score(docs, keep_all=True), keep_all=True
    )
    assert set(chained.columns) >= {
        "doc_id", "text", "lang", "stop_ratio", "quality",
        "dup_token_frac", "top_bigram_frac",
    }
    narrow_q = {
        r["doc_id"]: r["quality"]
        for r in with_quality_score(docs).collect()
    }
    narrow_r = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in with_repetition_metrics(docs).collect()
    }
    for r in chained.collect():
        assert r["quality"] == narrow_q[r["doc_id"]]
        assert r["top_bigram_frac"] == narrow_r[r["doc_id"]]


# ---------------------------------------------------------------------------
# term relevance (tf-idf / BM25)
# ---------------------------------------------------------------------------

def test_tfidf_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    from claimskg_generator_spark.operators.relevance import top_terms

    out = {
        (r["doc_id"], r["term"]): r
        for r in top_terms(docs, k=5, method="tfidf").collect()
    }
    # N=3; df: apple 1, banana 2, cherry 2, durian 1
    idf1 = math.log(4 / 2)   # df=1
    idf2 = math.log(4 / 3)   # df=2
    assert out[(1, "apple")]["score"] == pytest.approx(
        round(2 * idf1, 4), abs=1e-9
    )
    assert out[(1, "banana")]["score"] == pytest.approx(
        round(1 * idf2, 4), abs=1e-9
    )
    assert out[(1, "apple")]["rank"] == 1
    assert out[(3, "cherry")]["tf"] == 2


def test_bm25_length_normalization_and_determinism(spark):
    from claimskg_generator_spark.operators.relevance import top_terms

    # same tf for 'x' in docs 1 and 2, but doc 2 is much longer -> lower
    # score; doc 3 keeps df < N so the smoothed idf stays positive
    docs = spark.createDataFrame(
        [
            (1, "x y"),
            (2, "x " + " ".join(f"w{i}" for i in range(20))),
            (3, "y z"),
        ],
        ["doc_id", "text"],
    )
    out = top_terms(docs, k=50, method="bm25")
    rows = {(r["doc_id"], r["term"]): r["score"] for r in out.collect()}
    assert rows[(1, "x")] > rows[(2, "x")]
    again = {
        (r["doc_id"], r["term"]): r["score"]
        for r in top_terms(docs, k=50, method="bm25").collect()
    }
    assert rows == again


def test_top_terms_rejects_bad_args(spark):
    from claimskg_generator_spark.operators.relevance import top_terms

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        top_terms(docs, method="pagerank")
    with pytest.raises(ValueError):
        top_terms(docs, k=0)


# ---------------------------------------------------------------------------
# exact-substring span dedup
# ---------------------------------------------------------------------------

def test_duplicated_spans_hand_computed(spark):
    from claimskg_generator_spark.operators.dedup import duplicated_spans

    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha"),          # spans: 2 (4-grams)
            (2, f"beta {shared}"),           # shares the '{shared}' 4-gram
            (3, "five six seven"),           # too short for width=4
            (4, "x y z q r"),                # 2 unique spans
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_spans(docs, width=4).collect()
    }
    # docs 1 and 2 both contain the 'one two three four' window
    assert out[1]["n_spans"] == 2 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_spans"] == 2 and out[2]["n_dup_spans"] == 1
    assert out[1]["dup_span_frac"] == 0.5
    assert out[3]["n_spans"] == 0 and out[3]["dup_span_frac"] == 0.0
    assert out[4]["n_dup_spans"] == 0


def test_duplicated_spans_counts_within_doc_repeats(spark):
    from claimskg_generator_spark.operators.dedup import duplicated_spans

    # the same window twice INSIDE one doc is a duplicate too
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], ["doc_id", "text"]
    )
    row = duplicated_spans(docs, width=2).collect()[0]
    # windows: ab ba ab ba ab -> every span duplicated
    assert row["n_spans"] == 5
    assert row["n_dup_spans"] == 5
    assert row["dup_span_frac"] == 1.0


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_overlap_and_short_docs(spark):
    import hashlib

    from claimskg_generator_spark.operators.packing import chunk_documents

    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "tiny doc")], ["doc_id", "text"]
    )
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    one = [r for r in out if r["doc_id"] == 1]
    # stride 2 over 10 tokens -> starts 0,2,4,6,8
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in one] == [
        (0, 4), (2, 4), (4, 4), (6, 4), (8, 2)
    ]
    assert one[1]["chunk_md5"] == hashlib.md5(
        " ".join(words[2:6]).encode()
    ).hexdigest()
    two = [r for r in out if r["doc_id"] == 2]
    assert len(two) == 1 and two[0]["n_chunk_tokens"] == 2


def test_chunk_documents_rejects_bad_params(spark):
    from claimskg_generator_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# randomized cross-checks vs naive references
# ---------------------------------------------------------------------------

def test_asof_join_random_matches_naive(spark):
    import random

    rng = random.Random(11)
    t0 = _ts("2024-01-01T00:00:00")
    lrows = [
        (i, rng.randint(1, 5),
         t0 + dt.timedelta(seconds=rng.randint(0, 500)))
        for i in range(120)
    ]
    rrows = [
        (1000 + i, rng.randint(1, 5),
         t0 + dt.timedelta(seconds=rng.randint(0, 500)))
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts"])
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join(left, right, on=["k"],
                           right_cols=["rid"]).collect()
    }

    def naive(lk, lt):
        cands = [(rt, rid) for rid, rk, rt in rrows
                 if rk == lk and rt <= lt]
        return max(cands)[1] if cands else None

    for lid, lk, lt in lrows:
        assert got[lid] == naive(lk, lt), lid
    assert len(got) == len(lrows)


def test_duplicated_spans_random_matches_naive(spark):
    import collections
    import random

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(12)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        for i in range(60)
    }
    from claimskg_generator_spark.operators.dedup import duplicated_spans

    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    W = 3
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicated_spans(docs, width=W).collect()
    }
    counts = collections.Counter()
    spans = {}
    for i, txt in texts.items():
        toks = txt.split()
        spans[i] = [tuple(toks[j:j + W])
                    for j in range(len(toks) - W + 1)]
        counts.update(spans[i])
    for i in texts:
        n_dup = sum(1 for s in spans[i] if counts[s] >= 2)
        assert got[i] == (len(spans[i]), n_dup), i


def test_distribution_stats_exact_vs_approx_schema(spark):
    from claimskg_generator_spark.operators.textstats import (
        distribution_stats,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", float(i)) for i in range(1, 41)],
        ["doc_id", "lang", "n_chars"],
    )
    exact = distribution_stats(docs).collect()
    approx = distribution_stats(docs, exact=False)
    assert approx.columns == distribution_stats(docs).columns
    by = {r["lang"]: r for r in exact}
    # en = odd 1..39 (20 values): median = 20.0 interpolated
    assert by["en"]["p50"] == 20.0
    assert by["en"]["n"] == 20
    assert by["fr"]["max_val"] == 40.0
    assert approx.count() == 2


def test_assign_splits_partition_properties(spark):
    import hashlib

    from claimskg_generator_spark.operators.sampling import assign_splits

    df = spark.createDataFrame(
        [(i,) for i in range(500)], ["doc_id"]
    )
    out = {r["doc_id"]: r["split"]
           for r in assign_splits(df, "doc_id").collect()}
    # total partition: every row assigned exactly one split
    assert len(out) == 500
    assert set(out.values()) <= {"train", "val", "test"}

    def expect(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        if h < format(int(0.8 * 65536), "04x"):
            return "train"
        if h < format(int(0.9 * 65536), "04x"):
            return "val"
        return "test"

    assert all(out[i] == expect(i) for i in range(500))
    # roughly the right proportions at n=500
    from collections import Counter

    c = Counter(out.values())
    assert 330 <= c["train"] <= 460 and c["val"] >= 20 and c["test"] >= 20


def test_assign_splits_rejects_bad_fractions(spark):
    from claimskg_generator_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"train": 0.5, "val": 0.2})


def test_assign_splits_zero_fraction_tail_gets_nothing(spark):
    """ADVICE r4: an intermediate cumulative fraction of exactly 1.0 used
    to render as the 5-char threshold '10000', which string-compares
    below any a-f hash and misrouted ~37.5% of rows into the
    zero-fraction tail split.  cum >= 1 must short-circuit to True."""
    from claimskg_generator_spark.operators.sampling import assign_splits

    df = spark.createDataFrame([(i,) for i in range(400)], ["doc_id"])
    out = [r["split"] for r in assign_splits(
        df, "doc_id", {"train": 0.5, "val": 0.5, "test": 0.0}).collect()]
    assert out.count("test") == 0
    assert out.count("train") + out.count("val") == 400
    assert out.count("train") > 100 and out.count("val") > 100
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"train": 1.5, "val": -0.5})


def test_stratified_sample_null_strata_use_default_rate(spark):
    """ADVICE r4: NULL strata must route to the default gate (bare
    ~isin(...) is NULL for NULL input, which silently dropped the rows
    regardless of default_rate)."""
    from claimskg_generator_spark.operators.sampling import (
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None), (4, "fr")],
        ["doc_id", "lang"],
    )
    kept = stratified_sample(df, "lang", {"en": 1.0}, "doc_id",
                             default_rate=1.0).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3, 4]
    none_default = stratified_sample(df, "lang", {"en": 1.0}, "doc_id",
                                     default_rate=0.0).collect()
    assert sorted(r["doc_id"] for r in none_default) == [1]


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T10:00:00")),
            (101, 1, _ts("2024-01-01T12:30:00")),  # after all right rows
            (102, 2, _ts("2024-01-01T10:00:00")),  # key with no right rows
        ],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (7, 1, _ts("2024-01-01T09:30:00")),  # before: never matches
            (8, 1, _ts("2024-01-01T10:00:00")),  # equal ts -> >= matches
            (9, 1, _ts("2024-01-01T10:00:00")),  # tie: SMALLEST rid wins
            (5, 1, _ts("2024-01-01T11:00:00")),
        ],
        ["rid", "k", "ts"],
    )
    out = {
        r["lid"]: r
        for r in asof_join(left, right, on=["k"], right_cols=["rid"],
                           direction="forward").collect()
    }
    assert out[100]["rid_right"] == 8
    assert out[101]["rid_right"] is None
    assert out[102]["rid_right"] is None


def test_asof_join_forward_random_matches_naive(spark):
    import random

    rng = random.Random(31)
    t0 = _ts("2024-01-01T00:00:00")
    lrows = [(i, rng.randint(1, 4),
              t0 + dt.timedelta(seconds=rng.randint(0, 400)))
             for i in range(100)]
    rrows = [(1000 + i, rng.randint(1, 4),
              t0 + dt.timedelta(seconds=rng.randint(0, 400)))
             for i in range(120)]
    left = spark.createDataFrame(lrows, ["lid", "k", "ts"])
    right = spark.createDataFrame(rrows, ["rid", "k", "ts"])
    got = {r["lid"]: r["rid_right"]
           for r in asof_join(left, right, on=["k"], right_cols=["rid"],
                              direction="forward").collect()}

    def naive(lk, lt):
        cands = [(rt, rid) for rid, rk, rt in rrows
                 if rk == lk and rt >= lt]
        return min(cands)[1] if cands else None

    for lid, lk, lt in lrows:
        assert got[lid] == naive(lk, lt), lid


# ---------------------------------------------------------------------------
# eval contamination (q58) and token-budget mixing (q59)
# ---------------------------------------------------------------------------

def test_eval_contamination_hand_computed(spark):
    from claimskg_generator_spark.operators.contamination import (
        eval_contamination,
    )

    docs = spark.createDataFrame(
        [
            # eval doc fully contained in train doc 10
            (1, "the quick brown fox jumps"),
            # eval doc sharing no window with train
            (2, "completely novel benchmark prompt here"),
            # eval doc shorter than the window -> 0 spans, clean
            (3, "too short"),
            # train docs
            (10, "prefix the quick brown fox jumps suffix"),
            (11, "unrelated training text about other things"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in eval_contamination(
            docs, F.col("doc_id") < 10, width=3
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_spans"] == 3 and out[1]["n_dirty_spans"] == 3
    assert out[1]["contaminated"] == 1 and out[1]["dirty_frac"] == 1.0
    assert out[2]["n_spans"] == 3 and out[2]["n_dirty_spans"] == 0
    assert out[2]["contaminated"] == 0
    assert out[3]["n_spans"] == 0 and out[3]["contaminated"] == 0
    assert out[3]["dirty_frac"] == 0.0


def test_eval_contamination_counts_repeated_windows_per_position(spark):
    from claimskg_generator_spark.operators.contamination import (
        eval_contamination,
    )

    # eval doc repeats the dirty window twice -> both positions count
    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (10, "x a b y"),
        ],
        ["doc_id", "text"],
    )
    row = eval_contamination(docs, F.col("doc_id") == 1, width=2).collect()
    (r,) = row
    # windows: 'a b', 'b a', 'a b'; train has 'a b' (and 'x a', 'b y')
    assert r["n_spans"] == 3
    assert r["n_dirty_spans"] == 2
    assert r["dirty_frac"] == pytest.approx(2 / 3, abs=1e-4)


def test_eval_contamination_random_matches_naive(spark):
    import random

    from claimskg_generator_spark.operators.contamination import (
        eval_contamination,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
        for i in range(60)
    ]
    width = 4
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dirty_spans"], r["contaminated"])
        for r in eval_contamination(
            docs, F.col("doc_id") % 5 == 0, width=width
        ).collect()
    }

    def windows(text):
        toks = text.strip().lower().split()
        return [
            tuple(toks[i:i + width])
            for i in range(len(toks) - width + 1)
        ] if len(toks) >= width else []

    train_keys = set()
    for i, text in rows:
        if i % 5 != 0:
            train_keys.update(windows(text))
    expect = {}
    for i, text in rows:
        if i % 5 == 0:
            w = windows(text)
            dirty = sum(1 for x in w if x in train_keys)
            expect[i] = (len(w), dirty, int(dirty > 0))
    assert got == expect


def test_budget_cap_matches_single_window_naive(spark):
    import random

    from claimskg_generator_spark.operators.sampling import budget_cap

    rng = random.Random(7)
    rows = [
        (i, f"g{i % 3}", rng.randint(1, 50)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "grp", "sz"])
    budget = 300
    got = {
        (r["grp"], r["id"]): r["cum_size"]
        for r in budget_cap(df, "grp", "sz", "id", budget,
                            n_buckets=8).collect()
    }
    # naive: per group, order by (md5(id), id), cumulative sum <= budget
    expect = {}
    bygrp = {}
    for i, g, s in rows:
        bygrp.setdefault(g, []).append((hashlib.md5(str(i).encode())
                                        .hexdigest(), i, s))
    for g, items in bygrp.items():
        cum = 0
        for h, i, s in sorted(items):
            cum += s
            if cum <= budget:
                expect[(g, i)] = cum
    assert got == expect


def test_budget_cap_bucket_count_invariance(spark):
    from claimskg_generator_spark.operators.sampling import budget_cap

    rows = [(i, "only", 10) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "grp", "sz"])
    a = sorted(
        (r["id"], r["cum_size"])
        for r in budget_cap(df, "grp", "sz", "id", 400, n_buckets=1)
        .collect()
    )
    b = sorted(
        (r["id"], r["cum_size"])
        for r in budget_cap(df, "grp", "sz", "id", 400, n_buckets=64)
        .collect()
    )
    assert a == b and len(a) == 40


def test_budget_cap_edges(spark):
    from claimskg_generator_spark.operators.sampling import budget_cap

    df = spark.createDataFrame([(1, "g", 5)], ["id", "grp", "sz"])
    # zero budget keeps nothing; row bigger than budget is dropped
    assert budget_cap(df, "grp", "sz", "id", 0).count() == 0
    assert budget_cap(df, "grp", "sz", "id", 4).count() == 0
    assert budget_cap(df, "grp", "sz", "id", 5).count() == 1
    with pytest.raises(ValueError):
        budget_cap(df, "grp", "sz", "id", -1)
    with pytest.raises(ValueError):
        budget_cap(df, "grp", "sz", "id", 10, n_buckets=0)


def test_temperature_mix_rates_and_determinism(spark):
    from claimskg_generator_spark.operators.sampling import temperature_mix

    # skewed domains: 160 'big', 40 'mid', 10 'small'
    rows = ([(i, "big") for i in range(160)]
            + [(200 + i, "mid") for i in range(40)]
            + [(300 + i, "small") for i in range(10)])
    df = spark.createDataFrame(rows, ["id", "dom"])
    kept = temperature_mix(df, "dom", "id", alpha=0.5, target_frac=0.5)
    out = kept.groupBy("dom").agg(
        F.max("mix_rate").alias("rate"), F.count("*").alias("n")
    ).collect()
    got = {r["dom"]: (r["rate"], r["n"]) for r in out}
    import math

    n = {"big": 160, "mid": 40, "small": 10}
    total = sum(n.values())
    sumw = sum(math.sqrt(v) for v in n.values())
    for dom, nd in n.items():
        want = round(min(1.0, 0.5 * total * math.sqrt(nd) / sumw / nd), 6)
        assert got[dom][0] == pytest.approx(want, abs=1e-9), dom
    # alpha < 1 up-samples small domains: keep RATE ordering must invert
    # the size ordering
    assert got["small"][0] > got["mid"][0] > got["big"][0]
    # deterministic: second run keeps the identical id set
    a = sorted(r["id"] for r in kept.collect())
    b = sorted(r["id"] for r in temperature_mix(
        df, "dom", "id", alpha=0.5, target_frac=0.5).collect())
    assert a == b
    # hand-check the gate on one domain: exactly the ids whose md5 prefix
    # clears the threshold survive
    rate = got["big"][0]
    thr = format(int(rate * 65536), "04x")
    want_ids = [i for i in range(160)
                if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr]
    assert sorted(r["id"] for r in kept.filter("dom = 'big'").collect()) \
        == sorted(want_ids)


def test_temperature_mix_alpha_one_is_uniform_rate(spark):
    from claimskg_generator_spark.operators.sampling import temperature_mix

    rows = [(i, "a" if i % 4 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "dom"])
    kept = temperature_mix(df, "dom", "id", alpha=1.0, target_frac=0.3)
    rates = {r["dom"]: r["rate"] for r in kept.groupBy("dom")
             .agg(F.max("mix_rate").alias("rate")).collect()}
    # alpha = 1 -> every domain keeps the same target_frac rate
    assert all(v == pytest.approx(0.3, abs=1e-9) for v in rates.values())
    with pytest.raises(ValueError):
        temperature_mix(df, "dom", "id", alpha=0.0)
    with pytest.raises(ValueError):
        temperature_mix(df, "dom", "id", alpha=0.5, target_frac=1.5)


def test_budget_cap_and_temperature_mix_null_group_is_a_group(spark):
    """NULL domains are real groups with their own budget/rate — never a
    silent drop through the dim join (the stratified_sample NULL-strata
    fix, applied to the data-dependent-dim operators)."""
    from claimskg_generator_spark.operators.sampling import (
        budget_cap,
        temperature_mix,
    )

    rows = [(1, None, 5), (2, None, 5), (3, "g", 5)]
    df = spark.createDataFrame(rows, "id long, grp string, sz int")
    kept = budget_cap(df, "grp", "sz", "id", budget=100)
    assert kept.count() == 3  # all fit; NULL rows included
    got_null = {r["id"] for r in kept.filter("grp IS NULL").collect()}
    assert got_null == {1, 2}
    mixed = temperature_mix(df, "grp", "id", alpha=1.0, target_frac=1.0)
    assert mixed.count() == 3  # rate 1.0 keeps everything incl. NULL grp


# ---------------------------------------------------------------------------
# DSIR importance resampling (selection.py)


def _dsir_naive(rows, target_ids, alpha=1.0, hex_len=3, fraction=0.25):
    """Pure-Python DSIR twin: hashed unigram+bigram bucket models with
    add-alpha smoothing, per-doc rounded log weights, type-7 percentile
    threshold."""
    import math
    import re

    def buckets(text):
        tk = re.split(r"\s+", text.strip().lower())
        feats = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        return [hashlib.md5(f.encode()).hexdigest()[:hex_len]
                for f in feats]

    ct, cr, per_doc = {}, {}, {}
    for doc_id, text in rows:
        bs = buckets(text)
        per_doc[doc_id] = bs
        tgt = doc_id in target_ids
        for b in bs:
            (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
    tt, tr, nb = sum(ct.values()), sum(cr.values()), 16 ** hex_len
    scored = {}
    for doc_id, bs in per_doc.items():
        if doc_id in target_ids:
            continue
        lw = sum(
            math.log((ct.get(b, 0) + alpha) / (tt + alpha * nb))
            - math.log((cr.get(b, 0) + alpha) / (tr + alpha * nb))
            for b in bs
        )
        scored[doc_id] = (len(bs), round(lw, 4))
    vals = sorted(w for _, w in scored.values())
    # type-7 interpolated percentile at 1 - fraction
    h = (len(vals) - 1) * (1.0 - fraction)
    lo, frac = int(h), h - int(h)
    thr = (vals[lo] if frac == 0.0
           else vals[lo] + frac * (vals[lo + 1] - vals[lo]))
    return {d: (n, w, int(w >= thr)) for d, (n, w) in scored.items()}


def _dsir_corpus(seed=11, n=40, n_target=6):
    import random

    rng = random.Random(seed)
    clean = "the quick brown fox jumps over the lazy dog".split()
    noise = ["zzz", "qqq", "spam", "click", "buy", "now", "$$$", "win"]
    rows = []
    for i in range(n):
        if i < n_target or rng.random() < 0.3:
            words = [rng.choice(clean) for _ in range(rng.randint(5, 12))]
        else:
            words = [rng.choice(noise + clean[:3])
                     for _ in range(rng.randint(3, 10))]
        rows.append((i, " ".join(words)))
    return rows, set(range(n_target))


def test_dsir_select_matches_naive(spark):
    from claimskg_generator_spark.operators.selection import dsir_select

    rows, target_ids = _dsir_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["log_importance"], r["keep"])
        for r in dsir_select(
            docs, F.col("doc_id").isin(*target_ids), fraction=0.25
        ).collect()
    }
    want = _dsir_naive(rows, target_ids)
    assert got == want
    # the keep gate selects a real strict subset, and the kept docs
    # score above every dropped one (the threshold is a pure cutoff)
    kept = {d for d, (_, _, k) in got.items() if k == 1}
    assert kept and len(kept) < len(got)
    assert min(got[d][1] for d in kept) >= max(
        got[d][1] for d in got if d not in kept
    )


def test_dsir_select_fraction_one_keeps_all_and_validates(spark):
    from claimskg_generator_spark.operators.selection import dsir_select

    rows, target_ids = _dsir_corpus(seed=3, n=12, n_target=3)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_select(docs, F.col("doc_id").isin(*target_ids),
                      fraction=1.0).collect()
    assert len(out) == 9 and all(r["keep"] == 1 for r in out)
    with pytest.raises(ValueError):
        dsir_select(docs, F.col("doc_id") < 3, fraction=0.0)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (A-ES priority sampling)


def _wsample_naive(rows, k, by=None):
    """Pure-Python A-ES twin: priority = round(ln(u)/w, 8), u from
    md5(id); top-k by (priority desc, id asc), optionally per group."""
    import math

    scored = []
    for row in rows:
        i, w = row[0], row[1]
        g = row[2] if by else None
        if w is None or w <= 0:
            continue
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             + 0.5) / 2.0 ** 32
        scored.append((g, round(math.log(u) / w, 8), i))
    out = {}
    for g in {s[0] for s in scored}:
        grp = sorted((s for s in scored if s[0] == g),
                     key=lambda s: (-s[1], s[2]))
        out[g] = [(i, p) for _, p, i in grp[:k]]
    return out


def test_weighted_sample_matches_naive(spark):
    from claimskg_generator_spark.operators.sampling import weighted_sample

    import random

    rng = random.Random(23)
    rows = [(i, float(rng.randint(1, 40))) for i in range(200)]
    rows += [(500, 0.0), (501, -2.0), (502, None)]  # never drawn
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r["doc_id"], r["priority"])
           for r in weighted_sample(df, "w", 25, id_col="doc_id").collect()]
    # operator returns rows in any order downstream of limit; compare sets
    # plus the implied rank order by re-sorting
    want = _wsample_naive(rows, 25)[None]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want


def test_weighted_sample_per_group_and_validation(spark):
    from claimskg_generator_spark.operators.sampling import weighted_sample

    import random

    rng = random.Random(29)
    rows = [(i, float(rng.randint(1, 9)), f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, w double, grp string")
    got = {}
    for r in weighted_sample(df, "w", 5, id_col="doc_id",
                             by="grp").collect():
        got.setdefault(r["grp"], []).append((r["doc_id"], r["priority"]))
    want = _wsample_naive(rows, 5, by="grp")
    assert {g: sorted(v, key=lambda t: (-t[1], t[0]))
            for g, v in got.items()} == want
    with pytest.raises(ValueError):
        weighted_sample(df, "w", 0)


def test_weighted_sample_is_weight_biased(spark):
    """Heavier rows are drawn far more often: with half the corpus at
    weight 100 and half at weight 1, a k=30 draw from 200 rows is
    dominated by heavy rows."""
    from claimskg_generator_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in
           weighted_sample(df, "w", 30, id_col="doc_id").collect()]
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy >= 25


# ---------------------------------------------------------------------------
# SCD2 point-in-time dimension join


def test_scd2_join_hand_computed_with_gap_and_expiry(spark):
    from claimskg_generator_spark.operators.asof import scd2_join

    dim = spark.createDataFrame(
        [
            # user 1: v1 [10, 20), gap [20, 30), v2 [30, open)
            (1, "bronze", _ts("2024-01-01T00:00:10"),
             _ts("2024-01-01T00:00:20")),
            (1, "gold", _ts("2024-01-01T00:00:30"), None),
        ],
        "user_id long, tier string, valid_from timestamp, "
        "valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, _ts("2024-01-01T00:00:05")),  # before any version
            (101, 1, _ts("2024-01-01T00:00:10")),  # valid_from inclusive
            (102, 1, _ts("2024-01-01T00:00:20")),  # valid_to exclusive: gap
            (103, 1, _ts("2024-01-01T00:00:25")),  # inside the gap
            (104, 1, _ts("2024-01-01T00:00:45")),  # open current version
            (105, 2, _ts("2024-01-01T00:00:45")),  # key with no versions
        ],
        "fid long, user_id long, ts timestamp",
    )
    got = {r["fid"]: r["tier_dim"]
           for r in scd2_join(facts, dim, on=["user_id"]).collect()}
    assert got == {100: None, 101: "bronze", 102: None, 103: None,
                   104: "gold", 105: None}
    inner = scd2_join(facts, dim, on=["user_id"], how="inner").collect()
    assert sorted(r["fid"] for r in inner) == [101, 104]
    with pytest.raises(ValueError):
        scd2_join(facts, dim, on=["user_id"], how="full")


def test_scd2_join_random_matches_naive(spark):
    import random

    from claimskg_generator_spark.operators.asof import scd2_join

    rng = random.Random(31)
    dim_rows = []
    for u in range(8):
        starts = sorted(rng.sample(range(0, 1000), rng.randint(1, 6)))
        for j, s in enumerate(starts):
            # random half-open validity; sometimes a gap before the next
            end = (starts[j + 1] - rng.choice([0, 0, 50])
                   if j + 1 < len(starts) else
                   (None if rng.random() < 0.5 else s + 100))
            if end is not None and end <= s:
                end = starts[j + 1]
            dim_rows.append((u, float(j), s, end))
    fact_rows = [(i, rng.randrange(9), rng.randrange(1100))
                 for i in range(300)]
    dim = spark.createDataFrame(
        dim_rows, "user_id long, tier double, valid_from long, "
        "valid_to long")
    facts = spark.createDataFrame(fact_rows, "fid long, user_id long, "
                                  "ts long")
    got = {r["fid"]: r["tier_dim"] for r in
           scd2_join(facts, dim, on=["user_id"]).collect()}
    want = {}
    for fid, u, t in fact_rows:
        m = [tier for (du, tier, vf, vt) in dim_rows
             if du == u and vf <= t and (vt is None or vt > t)]
        assert len(m) <= 1
        want[fid] = m[0] if m else None
    assert got == want


# ---------------------------------------------------------------------------
# interval-overlap join


def test_interval_overlap_matches_naive_and_counts_once(spark):
    """Random per-key intervals spanning 0-5 buckets each: the bucketized
    join must equal the naive quadratic overlap join, each pair exactly
    once (the max-start responsibility bin)."""
    import random

    from claimskg_generator_spark.operators.asof import (
        interval_overlap_join,
    )

    rng = random.Random(47)
    B = 100  # bucket width
    lrows, rrows = [], []
    for i in range(120):
        k = rng.randrange(4)
        s = rng.randrange(0, 1000)
        lrows.append((i, k, s, s + rng.randrange(0, 5 * B)))
    for i in range(120):
        k = rng.randrange(4)
        s = rng.randrange(0, 1000)
        rrows.append((1000 + i, k, s, s + rng.randrange(0, 5 * B)))
    # boundary cases: zero-length interval exactly on a bucket edge,
    # touching-endpoint overlap, invalid (start > end) rows dropped
    lrows += [(500, 9, 200, 200), (501, 9, 300, 100)]
    rrows += [(1500, 9, 100, 200), (1501, 9, 201, 250)]
    left = spark.createDataFrame(
        lrows, "lid long, k long, l_start long, l_end long")
    right = spark.createDataFrame(
        rrows, "rid long, k long, r_start long, r_end long")
    got = [(r["lid"], r["rid"]) for r in
           interval_overlap_join(left, right, on=["k"],
                                 bucket_us=B).collect()]
    assert len(got) == len(set(got))  # exactly once per pair
    want = {(li, ri)
            for (li, lk, ls, le) in lrows if ls <= le
            for (ri, rk, rs, re) in rrows if rs <= re
            and lk == rk and max(ls, rs) <= min(le, re)}
    assert set(got) == want
    assert (500, 1500) in want  # touching endpoints overlap (closed)
    assert all(p[0] != 501 for p in want)  # invalid row dropped


def test_interval_overlap_rejects_colliding_columns(spark):
    from claimskg_generator_spark.operators.asof import (
        interval_overlap_join,
    )

    df = spark.createDataFrame([(1, 0, 1)], "x long, l_start long, "
                               "l_end long")
    df2 = spark.createDataFrame([(1, 0, 1)], "x long, r_start long, "
                                "r_end long")
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(
            df.withColumnRenamed("x", "dup"),
            df2.withColumnRenamed("x", "dup"), on=[])
    with pytest.raises(ValueError):
        interval_overlap_join(df, df2, on=["x"], bucket_us=0)


def test_source_prior_gate_hand_computed(spark):
    from claimskg_generator_spark.operators.selection import (
        source_prior_gate,
    )

    # src "good": long stopword-rich docs; src "junk": short stop-free
    # docs; src "thin": good quality but below the evidence floor.
    good = "the a of and to in is it " * 8          # 64 tokens, all stops
    junk = "xxxx yyyy"
    rows = [
        (1, good, "en", "good", len(good)),
        (2, good, "en", "good", len(good)),
        (3, good, "en", "good", len(good)),
        (4, junk, "en", "junk", len(junk)),
        (5, junk, "en", "junk", len(junk)),
        (6, junk, "en", "junk", len(junk)),
        (7, good, "en", "thin", len(good)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = source_prior_gate(docs, min_source_quality=0.5,
                            min_source_docs=2)
    got = {(r.doc_id, r.source, r.quality, r.source_docs,
            r.source_quality) for r in out.collect()}
    # good: quality = (64/64 + min(4*1,1))/2 = 1.0 → prior 1.0, kept.
    # junk: quality = (2/64 + 0)/2 = 0.0156 → prior below 0.5, dropped.
    # thin: prior 1.0 but only 1 doc < min_source_docs → dropped.
    assert got == {(1, "good", 1.0, 3, 1.0), (2, "good", 1.0, 3, 1.0),
                   (3, "good", 1.0, 3, 1.0)}


def test_source_prior_gate_validates(spark):
    from claimskg_generator_spark.operators.selection import (
        source_prior_gate,
    )

    docs = spark.createDataFrame(
        [(1, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    with pytest.raises(ValueError):
        source_prior_gate(docs, min_source_quality=1.5)
    with pytest.raises(ValueError):
        source_prior_gate(docs, min_source_docs=0)
