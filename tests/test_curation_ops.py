"""Unit tests for the round-5 late curation wave: shard assignment,
exact grouped quantiles / median-MAD gating, URL host canonicalization
+ per-host caps, boilerplate-line stripping, constraint profiling, and
record fusion."""

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.boilerplate import (
    strip_boilerplate_lines,
)
from claimskg_generator_spark.operators.expectations import (
    profile_constraints,
)
from claimskg_generator_spark.operators.fusion import fuse_records
from claimskg_generator_spark.operators.quantiles import (
    grouped_median,
    grouped_quantiles,
    robust_outlier_gate,
)
from claimskg_generator_spark.operators.sampling import assign_shards
from claimskg_generator_spark.operators.urls import (
    canonical_host,
    cap_per_host,
)


# ---------------------------------------------------------------------------
# assign_shards
# ---------------------------------------------------------------------------

def test_assign_shards_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["id"])
    a = assign_shards(df, "id", n_shards=4, seed="s").collect()
    b = assign_shards(df.repartition(7), "id", n_shards=4,
                      seed="s").collect()
    key = lambda rows: {r["id"]: (r["shard"], r["shard_pos"])  # noqa: E731
                        for r in rows}
    assert key(a) == key(b)          # layout-independent
    assert len(a) == 200             # every row survives
    shards = {r["shard"] for r in a}
    assert shards <= set(range(4)) and len(shards) == 4


def test_assign_shards_pos_is_permutation_per_shard(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], ["id"])
    out = assign_shards(df, "id", n_shards=3, seed="x").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_assign_shards_seed_reshuffles(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], ["id"])
    a = {r["id"]: r["shard"]
         for r in assign_shards(df, "id", 8, seed="a").collect()}
    b = {r["id"]: r["shard"]
         for r in assign_shards(df, "id", 8, seed="b").collect()}
    moved = sum(1 for i in a if a[i] != b[i])
    assert moved > 100  # ~7/8 expected to move


def test_assign_shards_unordered_skips_rank(spark):
    df = spark.createDataFrame([(1,), (2,)], ["id"])
    out = assign_shards(df, "id", 2, ordered=False)
    assert "shard" in out.columns and "shard_pos" not in out.columns
    with pytest.raises(ValueError):
        assign_shards(df, "id", 0)


# ---------------------------------------------------------------------------
# grouped_quantiles / grouped_median / robust_outlier_gate
# ---------------------------------------------------------------------------

def test_grouped_quantiles_hand_computed(spark):
    # group g: values 1..10 once each -> q0.5 = ceil(5)=5th value = 5,
    # q0.91 -> ceil(9.1)=10th = 10; group h: [2,2,2,9] -> q0.5 = 2
    rows = [("g", float(v)) for v in range(1, 11)]
    rows += [("h", 2.0), ("h", 2.0), ("h", 2.0), ("h", 9.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {(r["grp"], r["q"]): r["value"]
           for r in grouped_quantiles(df, "grp", "v",
                                      [0.5, 0.91, 1.0]).collect()}
    assert out[("g", 0.5)] == 5.0
    assert out[("g", 0.91)] == 10.0
    assert out[("g", 1.0)] == 10.0
    assert out[("h", 0.5)] == 2.0
    assert out[("h", 1.0)] == 9.0
    # one row per (group, q) — no duplicate answers
    assert len(out) == 6


def test_grouped_quantiles_null_and_validation(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", None), ("g", 3.0)], ["grp", "v"])
    out = grouped_quantiles(df, "grp", "v", [1.0]).collect()
    assert out[0]["value"] == 3.0  # NULL excluded from order stats
    with pytest.raises(ValueError):
        grouped_quantiles(df, "grp", "v", [0.0])
    with pytest.raises(ValueError):
        grouped_quantiles(df, "grp", "v", [])


def test_grouped_median_even_odd(spark):
    df = spark.createDataFrame(
        [("odd", 1.0), ("odd", 7.0), ("odd", 3.0),
         ("even", 1.0), ("even", 2.0), ("even", 10.0), ("even", 20.0)],
        ["grp", "v"])
    out = {r["grp"]: r["median"]
           for r in grouped_median(df, "grp", "v").collect()}
    assert out["odd"] == 3.0
    assert out["even"] == 6.0  # mean of 2 and 10


def test_grouped_median_duplicate_values(spark):
    # value-count frame must weight duplicates: [1,1,1,9] -> median 1
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 9.0)], ["grp", "v"])
    assert grouped_median(df, "grp", "v").collect()[0]["median"] == 1.0


def test_robust_outlier_gate_hand_computed(spark):
    # values [1,2,3,4,100]: med=3, deviations [2,1,0,1,97] -> mad=1
    # k=3 -> outlier iff |v-3| > 3: only 100
    rows = [("g", float(v)) for v in (1, 2, 3, 4, 100)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {r["v"]: r for r in
           robust_outlier_gate(df, "grp", "v", k=3.0).collect()}
    assert all(r["med"] == 3.0 and r["mad"] == 1.0 for r in out.values())
    assert out[100.0]["is_outlier"] is True
    assert all(not out[v]["is_outlier"] for v in (1.0, 2.0, 3.0, 4.0))


def test_robust_outlier_gate_null_never_outlier(spark):
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", None)], ["grp", "v"])
    out = {r["v"]: r["is_outlier"]
           for r in robust_outlier_gate(df, "grp", "v", k=0.5).collect()}
    assert out[None] is False


# ---------------------------------------------------------------------------
# canonical_host / cap_per_host
# ---------------------------------------------------------------------------

def test_canonical_host_shapes(spark):
    cases = [
        ("HTTPS://WWW.Site.COM:443/x", "site.com"),       # default port
        ("http://site.com:8080/x", "site.com:8080"),      # explicit kept
        ("https://m.site.com./x", "m.site.com"),          # trailing dot
        ("http://user:pw@site.com/x", "site.com"),        # userinfo
        ("ftp://www.Files.org:21/a", "files.org"),        # ftp default
        ("https://site.com", "site.com"),                 # no path
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in
           df.select(canonical_host(F.col("url"))).collect()]
    assert got == [e for _, e in cases]


def test_cap_per_host_caps_and_ranks(spark):
    rows = [(i, "big.com" if i < 8 else None, 100 - i) for i in range(12)]
    df = spark.createDataFrame(rows, ["id", "host", "score"])
    out = cap_per_host(df, "host", cap=3,
                       order_by=[F.desc("score"), F.col("id")]).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["big.com"]) == 3
    assert [r["id"] for r in sorted(by_host["big.com"],
                                    key=lambda r: r["host_rank"])] == [0, 1, 2]
    assert len(by_host[None]) == 3  # NULL hosts are capped too
    with pytest.raises(ValueError):
        cap_per_host(df, "host", cap=0, order_by=[F.col("id")])


# ---------------------------------------------------------------------------
# strip_boilerplate_lines
# ---------------------------------------------------------------------------

def test_strip_boilerplate_hand_computed(spark):
    # 'FOOTER' in 4/4 docs of src a -> dropped; 'rare' in 1/4 -> kept;
    # src b has its own counts (FOOTER only 1/2 there -> kept at 0.5+)
    rows = [
        (1, "a", "rare\nFOOTER"),
        (2, "a", "body2\nFOOTER"),
        (3, "a", "body3\nFOOTER"),
        (4, "a", "FOOTER"),
        (5, "b", "FOOTER\nother"),
        (6, "b", "other"),
    ]
    df = spark.createDataFrame(rows, ["id", "src", "text"])
    out = {r["id"]: r for r in
           strip_boilerplate_lines(df, "id", "text", "src",
                                   max_doc_frac=0.6).collect()}
    assert out[1]["clean_text"] == "rare"
    assert out[2]["clean_text"] == "body2"
    assert out[4]["clean_text"] == ""       # fully boilerplate survives
    assert out[4]["n_kept"] == 0 and out[4]["n_dropped"] == 1
    # src b has its own counts: 'other' is in 2/2 docs -> dropped there;
    # FOOTER is only 1/2=0.5 <= 0.6 in b -> kept
    assert out[5]["clean_text"] == "FOOTER"
    assert out[6]["clean_text"] == ""
    assert len(out) == 6                    # every doc survives


def test_strip_boilerplate_in_doc_repeats_count_once(spark):
    # 'x' appears twice inside doc 1 but only in 1/3 docs -> df=1/3,
    # NOT 2/3: must be kept even at a 0.5 threshold
    rows = [(1, "s", "x\nx"), (2, "s", "y"), (3, "s", "z")]
    df = spark.createDataFrame(rows, ["id", "src", "text"])
    out = {r["id"]: r["clean_text"] for r in
           strip_boilerplate_lines(df, "id", "text", "src",
                                   max_doc_frac=0.5).collect()}
    assert out[1] == "x\nx"


def test_strip_boilerplate_empty_lines_kept(spark):
    rows = [(1, "s", "a\n\nb"), (2, "s", "c\n\nd"), (3, "s", "e\n\nf")]
    df = spark.createDataFrame(rows, ["id", "src", "text"])
    out = {r["id"]: r["clean_text"] for r in
           strip_boilerplate_lines(df, "id", "text", "src",
                                   max_doc_frac=0.5).collect()}
    # the empty line is in 3/3 docs but is structural -> never dropped
    assert out[1] == "a\n\nb"
    with pytest.raises(ValueError):
        strip_boilerplate_lines(df, "id", "text", "src", max_doc_frac=0)


# ---------------------------------------------------------------------------
# profile_constraints
# ---------------------------------------------------------------------------

def test_profile_constraints_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (3, "d", None)],
        ["k", "s", "v"])
    out = {(r["column"], r["metric"]): r for r in profile_constraints(df, [
        ("s", "not_null", 0.7),          # 3/4 = 0.75 -> ok
        ("k", "unique", 1.0),            # 3 distinct / 4 rows -> fail
        ("v", "min", 5.0),               # min 10 >= 5 -> ok
        ("v", "max", 25.0),              # max 30 <= 25 -> fail
        ("v", "mean", 0.0),              # mean 20 -> ok
        ("s", "matches:^[ab]$", 0.6),    # 2/3 non-null match -> ok
    ]).collect()}
    assert out[("s", "not_null")]["value"] == 0.75
    assert out[("s", "not_null")]["ok"] is True
    assert out[("k", "unique")]["value"] == 0.75
    assert out[("k", "unique")]["ok"] is False
    assert out[("v", "min")]["ok"] is True
    assert out[("v", "max")]["value"] == 30.0
    assert out[("v", "max")]["ok"] is False       # max uses <=
    assert out[("v", "mean")]["value"] == 20.0
    assert out[("s", "matches:^[ab]$")]["value"] == pytest.approx(2 / 3)
    assert out[("s", "matches:^[ab]$")]["ok"] is True


def test_profile_constraints_validation(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        profile_constraints(df, [])
    with pytest.raises(ValueError):
        profile_constraints(df, [("nope", "min", 0.0)])
    with pytest.raises(ValueError):
        profile_constraints(df, [("k", "median", 0.0)])


# ---------------------------------------------------------------------------
# fuse_records
# ---------------------------------------------------------------------------

def test_fuse_records_all_rules(spark):
    rows = [
        # key, name,   score, ts, tag
        ("a", "long name", 3.0, 1, "x"),
        ("a", "nm",        9.0, 3, "y"),
        ("a", None,        1.0, 2, "x"),
        ("b", "only",      5.0, 7, None),
    ]
    df = spark.createDataFrame(rows, ["k", "name", "score", "ts", "tag"])
    out = {r["k"]: r for r in fuse_records(
        df, "k",
        {"name": "longest", "score": "max", "ts": "min", "tag": "mode"},
    ).collect()}
    assert out["a"]["name"] == "long name"
    assert out["a"]["score"] == 9.0
    assert out["a"]["ts"] == 1
    assert out["a"]["tag"] == "x"          # freq 2 beats 1
    assert out["a"]["n_records"] == 3
    assert out["b"]["tag"] is None         # all-NULL field fuses to NULL


def test_fuse_records_latest_and_ties(spark):
    rows = [
        ("a", "old", 1), ("a", "new", 5), ("a", "tie_hi", 5),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "ts"])
    out = fuse_records(df, "k", {"v": "latest"}, order_col="ts").collect()
    # ts tie at 5 -> largest value wins ('tie_hi' > 'new')
    assert out[0]["v"] == "tie_hi"
    # mode tie -> smallest value
    df2 = spark.createDataFrame(
        [("a", "p"), ("a", "q")], ["k", "v"])
    assert fuse_records(df2, "k", {"v": "mode"}).collect()[0]["v"] == "p"


def test_fuse_records_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError):
        fuse_records(df, "k", {})
    with pytest.raises(ValueError):
        fuse_records(df, "k", {"missing": "max"})
    with pytest.raises(ValueError):
        fuse_records(df, "k", {"v": "latest"})   # no order_col
    with pytest.raises(ValueError):
        fuse_records(df, "k", {"v": "median"})
