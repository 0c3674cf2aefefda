"""operators/kg_stats — VoID statistics and characteristic sets."""

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.kg_stats import (
    RDF_TYPE,
    VOID,
    characteristic_sets,
    void_rdf,
    void_stats,
)


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("a", RDF_TYPE, "C1"),
        ("a", "p", "x"),
        ("a", "p", "y"),
        ("b", RDF_TYPE, "C1"),
        ("b", "q", "x"),
        ("c", "p", "x"),
        ("x", RDF_TYPE, "C2"),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_void_dataset_counts(g):
    got = {(r["metric"]): r["value"]
           for r in void_stats(g).where("scope = 'dataset'").collect()}
    assert got == {
        "triples": 7,
        "distinct_subjects": 4,   # a b c x
        "distinct_objects": 4,    # C1 C2 x y
        "properties": 3,          # rdf:type p q
        "classes": 2,             # C1 C2
        "entities": 3,            # typed subjects a b x
    }


def test_void_property_and_class_partitions(g):
    st = void_stats(g)
    p = {(r["metric"]): r["value"]
         for r in st.where("scope = 'property' AND key = 'p'").collect()}
    assert p == {"triples": 3, "distinct_subjects": 2,
                 "distinct_objects": 2}
    c = {(r["key"]): r["value"]
         for r in st.where("scope = 'class'").collect()}
    assert c == {"C1": 2, "C2": 1}


def test_void_approx_same_shape_close_values(g):
    exact = {(r["scope"], r["key"], r["metric"]): r["value"]
             for r in void_stats(g).collect()}
    approx = {(r["scope"], r["key"], r["metric"]): r["value"]
              for r in void_stats(g, approx=True).collect()}
    assert set(exact) == set(approx)
    # HLL on single-digit cardinalities is exact; the contract here is
    # "same rows, plausible values", not bit-parity
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, v // 10), (k, v, approx[k])


def test_void_rdf_round_trips_the_stats(g):
    """The RDF face is a projection of void_stats: parsing the counts
    back out of the triples must reproduce the stats frame exactly."""
    trips = void_rdf(g, "urn:ds").collect()
    by_subj = {}
    for t in trips:
        by_subj.setdefault(t["subj"], []).append(t)

    # dataset node: typed + 6 metric literals
    ds = {t["pred"]: t["obj"] for t in by_subj["urn:ds"]
          if not t["pred"].endswith("Partition")}
    assert ds[RDF_TYPE] == VOID + "Dataset"
    assert ds[VOID + "triples"] == "7"
    assert ds[VOID + "entities"] == "3"

    # partition links resolve to nodes carrying key + metrics
    stats = {(r["scope"], r["key"], r["metric"]): r["value"]
             for r in void_stats(g).collect()}
    prop_nodes = [t["obj"] for t in by_subj["urn:ds"]
                  if t["pred"] == VOID + "propertyPartition"]
    assert len(prop_nodes) == 3
    for node in prop_nodes:
        facts = {t["pred"]: t["obj"] for t in by_subj[node]}
        key = facts[VOID + "property"]
        assert int(facts[VOID + "triples"]) == \
            stats[("property", key, "triples")]
        assert int(facts[VOID + "distinctSubjects"]) == \
            stats[("property", key, "distinct_subjects")]
    class_nodes = [t["obj"] for t in by_subj["urn:ds"]
                   if t["pred"] == VOID + "classPartition"]
    assert len(class_nodes) == 2
    for node in class_nodes:
        facts = {t["pred"]: t["obj"] for t in by_subj[node]}
        assert int(facts[VOID + "entities"]) == \
            stats[("class", facts[VOID + "class"], "entities")]


def test_charsets_partition_subjects_exactly(g):
    got = _rows(characteristic_sets(g))
    assert got == [
        (RDF_TYPE, 1, 1),                 # x: typed only
        (f"{RDF_TYPE},p", 1, 3),          # a: type + two p rows
        (f"{RDF_TYPE},q", 1, 2),          # b
        ("p", 1, 1),                      # c
    ]
    # entities sum == distinct subjects, triples sum == all triples
    assert sum(e for _, e, _ in got) == 4
    assert sum(t for _, _, t in got) == 7


def test_charsets_overflow_cap(g, spark):
    hub = spark.createDataFrame(
        [("h", f"p{i}", "o") for i in range(5)] + [("s", "p0", "o")],
        "subj string, pred string, obj string")
    got = _rows(characteristic_sets(hub, max_set_preds=3))
    assert ("*", 1, 5) in got          # the hub folds into overflow
    assert ("p0", 1, 1) in got
    with pytest.raises(ValueError):
        characteristic_sets(hub, max_set_preds=0)


def test_charsets_superset_bound_property(g):
    """The estimator invariant the summary exists for: subjects
    matching a star of predicates {P} == sum of entities over
    characteristic sets that are supersets of {P}."""
    cs = {r["predset"]: r["entities"]
          for r in characteristic_sets(g).collect()}
    want = {"p"}
    matching = sum(n for ps, n in cs.items()
                   if want <= set(ps.split(",")))
    subjects_with_p = g.where("pred = 'p'").select("subj").distinct()
    assert matching == subjects_with_p.count()


# --------------------------------------------------------------------------
# mergeable VoID sketch
# --------------------------------------------------------------------------

def test_void_sketch_monoid_identity(g, spark):
    """merge(sketch(a), sketch(b)) == sketch(a ∪ b) EXACTLY — the
    property that makes the sidecar maintainable under ingest."""
    from claimskg_generator_spark.operators.kg_stats import (
        void_sketch,
        void_sketch_merge,
    )

    h1 = g.filter("crc32(concat(subj, pred, obj)) % 2 = 0")
    h2 = g.filter("crc32(concat(subj, pred, obj)) % 2 = 1")
    direct = sorted(map(tuple, void_sketch(g).collect()))
    merged = sorted(map(tuple, void_sketch_merge(
        void_sketch(h1), void_sketch(h2)).collect()))
    assert direct == merged
    # three-way split and permuted merge order agree too
    parts = [g.filter(f"crc32(concat(subj, pred, obj)) % 3 = {i}")
             for i in range(3)]
    s = [void_sketch(x) for x in parts]
    assert sorted(map(tuple, void_sketch_merge(
        s[2], s[0], s[1]).collect())) == direct


def test_void_estimate_matches_exact_on_small_graph(g):
    """At toy cardinality HLL's linear-counting branch is exact, so
    the estimate must EQUAL void_stats — same shape, same values."""
    from claimskg_generator_spark.operators.kg_stats import (
        void_estimate,
        void_sketch,
        void_stats,
    )

    est = sorted(map(tuple, void_estimate(void_sketch(g)).collect()))
    exact = sorted(map(tuple, void_stats(g).collect()))
    assert est == exact


def test_void_sketch_one_exchange_and_bounded_state(g):
    from claimskg_generator_spark.operators.kg_stats import void_sketch

    sk = void_sketch(g, p=4)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan
    # count rows at reg_idx = -1, register rows within [0, 2^p)
    rows = sk.collect()
    assert all(r["reg_idx"] == -1 or 0 <= r["reg_idx"] < 16
               for r in rows)
    counts = [r for r in rows if r["reg_idx"] == -1]
    assert all(r["max_rho"] is None and r["cnt"] is not None
               for r in counts)
    assert {(r["scope"], r["key"]) for r in counts} == \
        {("dataset", "")} | {("property", p) for p in
                             {t["pred"] for t in g.collect()}}


# ---------------------------------------------------------------------------
# incremental characteristic-set maintenance
# ---------------------------------------------------------------------------

def _csets(df):
    return sorted(map(tuple, df.collect()))


def test_charset_state_apply_matches_direct(spark):
    from claimskg_generator_spark.operators.kg_stats import (
        charset_apply,
        charset_state,
        charsets_from_state,
    )

    A = spark.createDataFrame(
        [("s1", "p1", "x"), ("s1", "p2", "y"), ("s2", "p1", "z"),
         ("s3", "p1", "a"), ("s3", "p3", "b"), ("s3", "p3", "c")],
        "subj string, pred string, obj string")
    adds = spark.createDataFrame(
        [("s2", "p2", "w"), ("s4", "p1", "v")],
        "subj string, pred string, obj string")
    dels = spark.createDataFrame(
        [("s3", "p3", "b"), ("s3", "p3", "c"), ("s1", "p1", "x")],
        "subj string, pred string, obj string")
    B = A.unionAll(adds).exceptAll(dels)
    inc = charsets_from_state(charset_apply(charset_state(A),
                                            adds=adds, dels=dels))
    assert _csets(inc) == _csets(characteristic_sets(B))
    # the overflow cap applies identically on the state path
    inc1 = charsets_from_state(
        charset_apply(charset_state(A), adds=adds, dels=dels),
        max_set_preds=1)
    assert _csets(inc1) == _csets(characteristic_sets(B,
                                                      max_set_preds=1))


def test_charset_delete_all_pairs_removes_subject(spark):
    from claimskg_generator_spark.operators.kg_stats import (
        charset_apply,
        charset_state,
        charsets_from_state,
    )

    A = spark.createDataFrame(
        [("s1", "p1", "x"), ("s2", "p1", "y")],
        "subj string, pred string, obj string")
    dels = A.where(F.col("subj") == "s1")
    out = charsets_from_state(charset_apply(charset_state(A),
                                            dels=dels))
    assert _csets(out) == [("p1", 1, 1)]


def test_charset_negative_survivor_not_clamped(spark):
    from claimskg_generator_spark.operators.kg_stats import (
        charset_apply,
        charset_state,
        charsets_from_state,
    )

    A = spark.createDataFrame(
        [("s1", "p1", "x")], "subj string, pred string, obj string")
    phantom = spark.createDataFrame(
        [("s9", "p9", "nope")], "subj string, pred string, obj string")
    state = charset_apply(charset_state(A), dels=phantom)
    # the erroneous delete survives as a NEGATIVE register (visible to
    # an auditor), and the derived summary excludes it
    neg = [tuple(r) for r in state.where(F.col("n") < 0).collect()]
    assert neg == [("s9", "p9", -1)]
    assert _csets(charsets_from_state(state)) == [("p1", 1, 1)]


def test_charset_apply_noop_and_merge_empty_guard(spark):
    from claimskg_generator_spark.operators.kg_stats import (
        charset_apply,
        charset_state,
        charset_state_merge,
    )

    A = spark.createDataFrame(
        [("s1", "p1", "x")], "subj string, pred string, obj string")
    st = charset_state(A)
    assert charset_apply(st) is st
    with pytest.raises(ValueError):
        charset_state_merge()


def test_charset_state_shuffles_pairs_not_triples(spark):
    from claimskg_generator_spark.operators.kg_stats import charset_state

    # a subject with many duplicate (subj, pred) triples folds to ONE
    # state row per pair — the refresh regroups pairs, not triples
    A = spark.createDataFrame(
        [("hub", "p1", f"o{i}") for i in range(50)]
        + [("hub", "p2", "x")],
        "subj string, pred string, obj string")
    rows = sorted(map(tuple, charset_state(A).collect()))
    assert rows == [("hub", "p1", 50), ("hub", "p2", 1)]
