"""BGP query compiler (operators/bgp.py): binding semantics, join
ordering guards, literal pushdown, and the q101 value path is pinned by
the driver oracle."""

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.bgp import bgp_query

SCHEMA = "subj string, pred string, obj string, okind string"


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("f1", "imports", "m1", "uri"),
        ("f1", "imports", "m2", "uri"),
        ("f2", "imports", "m1", "uri"),
        ("m1", "label", "numpy", ""),
        ("m2", "label", "requests", ""),
        ("f1", "lang", "python", ""),
        ("f2", "lang", "go", ""),
        ("x", "selfref", "x", "uri"),
        ("y", "selfref", "z", "uri"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_two_pattern_join(g):
    out = bgp_query(g, [("?f", "imports", "?m"), ("?m", "label", "?l")])
    got = {(r["f"], r["l"]) for r in out.collect()}
    assert got == {("f1", "numpy"), ("f1", "requests"), ("f2", "numpy")}
    assert out.columns == ["f", "l", "m"]  # sorted default projection


def test_literal_in_subject_and_select(g):
    out = bgp_query(g, [("f1", "imports", "?m"), ("?m", "label", "?l")],
                    select=["?l"])
    assert {r["l"] for r in out.collect()} == {"numpy", "requests"}
    assert out.columns == ["l"]


def test_same_var_twice_in_one_pattern(g):
    out = bgp_query(g, [("?x", "selfref", "?x")])
    assert [r["x"] for r in out.collect()] == ["x"]


def test_disconnected_conjunction_rejected(g):
    with pytest.raises(ValueError, match="cartesian"):
        bgp_query(g, [("?a", "imports", "?b"), ("?c", "label", "?d")])


def test_no_variable_pattern_rejected(g):
    with pytest.raises(ValueError, match="no variables"):
        bgp_query(g, [("f1", "imports", "m1")])


def test_unbound_select_rejected(g):
    with pytest.raises(ValueError, match="not bound"):
        bgp_query(g, [("?f", "imports", "?m")], select=["?nope"])


def test_distinct_projection(g):
    out = bgp_query(g, [("?f", "imports", "?m")], select=["?f"],
                    distinct=True)
    assert sorted(r["f"] for r in out.collect()) == ["f1", "f2"]


def test_literal_pushdown_reaches_parquet_scan(spark, g, tmp_path):
    """A pred-literal pattern filters its OWN scan: PushedFilters on the
    parquet relation carries the pred equality, and the plan has no
    cartesian product."""
    path = str(tmp_path / "g")
    g.write.parquet(path)
    t = spark.read.parquet(path)
    out = bgp_query(t, [("?f", "imports", "?m"), ("?m", "label", "?l")])
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    assert "EqualTo(pred,imports)" in plan
    assert "EqualTo(pred,label)" in plan
    assert "CartesianProduct" not in plan


def test_predicate_profile_counts(spark, g):
    from claimskg_generator_spark.operators.bgp import predicate_profile

    got = {r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
           for r in predicate_profile(g).collect()}
    assert got["imports"] == (3, 2, 2)
    assert got["label"] == (2, 2, 2)
    assert got["lang"] == (2, 2, 2)
    assert got["selfref"] == (2, 2, 2)


def test_estimate_ranks_slivers_first():
    from claimskg_generator_spark.operators.bgp import _estimate

    stats = {"rare": (10, 10, 5), "huge": (1_000_000, 900_000, 50)}
    # pred-literal slivers rank by predicate size
    assert _estimate(("?s", "rare", "?o"), stats) \
        < _estimate(("?s", "huge", "?o"), stats)
    # a bound object divides by the predicate's object cardinality:
    # huge-with-bound-object (20k) still beats nothing, but loses to
    # the rare sliver
    assert _estimate(("?s", "huge", "x"), stats) == 1_000_000 / 50
    assert _estimate(("?s", "rare", "?o"), stats) \
        < _estimate(("?s", "huge", "x"), stats)
    # unknown predicate matches nothing
    assert _estimate(("?s", "nope", "?o"), stats) == 0.0
    # unbound predicate sums the table
    assert _estimate(("?s", "?p", "?o"), stats) == 1_000_010


def test_stats_ordering_preserves_results(spark, g):
    from claimskg_generator_spark.operators.bgp import predicate_profile

    stats = {r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
             for r in predicate_profile(g).collect()}
    pats = [("?f", "imports", "?m"), ("?m", "label", "?l"),
            ("?f", "lang", "?lg")]
    a = bgp_query(g, pats)
    b = bgp_query(g, pats, stats=stats)
    assert a.columns == b.columns
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in
                                               b.collect()}


def test_optional_binds_null_on_miss(spark, g):
    out = bgp_query(
        g, [("?f", "imports", "?m")],
        optional=[[("?m", "label", "?l")]])
    # m2 has a label; add a module with none
    g2 = g.union(spark.createDataFrame(
        [("f3", "imports", "m3", "uri")], SCHEMA))
    out = bgp_query(
        g2, [("?f", "imports", "?m")],
        optional=[[("?m", "label", "?l")]])
    got = {(r["f"], r["m"]): r["l"] for r in out.collect()}
    assert got[("f3", "m3")] is None
    assert got[("f1", "m1")] == "numpy"
    assert len(got) == 4


def test_not_exists_filters_matches(spark, g):
    # modules imported by f1 are excluded
    out = bgp_query(
        g, [("?x", "imports", "?m"), ("?m", "label", "?l")],
        not_exists=[[("f1", "imports", "?m")]])
    assert out.count() == 0  # f1 imports both m1 and m2
    out2 = bgp_query(
        g, [("?x", "imports", "?m"), ("?m", "label", "?l")],
        not_exists=[[("f2", "imports", "?m")]])
    # f2 imports only m1 -> m2 bindings survive
    assert {r["m"] for r in out2.collect()} == {"m2"}


def test_exists_keeps_matches_and_binds_nothing(spark, g):
    # only modules f2 also imports survive; the group's ?l2 never
    # reaches the output (EXISTS binds nothing new)
    out = bgp_query(
        g, [("?x", "imports", "?m"), ("?m", "label", "?l")],
        exists=[[("f2", "imports", "?m"), ("?m", "label", "?l2")]])
    assert sorted(out.columns) == ["l", "m", "x"]
    assert {r["m"] for r in out.collect()} == {"m1"}
    # semi-join semantics: multiplicity of the left side is preserved
    assert out.count() == g.filter(
        (g.pred == "imports") & (g.obj == "m1")).count()


def test_optional_and_not_exists_share_var_guards(g):
    with pytest.raises(ValueError, match="optional group"):
        bgp_query(g, [("?f", "imports", "?m")],
                  optional=[[("?a", "label", "?b")]])
    with pytest.raises(ValueError, match="not_exists group"):
        bgp_query(g, [("?f", "imports", "?m")],
                  not_exists=[[("?a", "label", "?b")]])
    with pytest.raises(ValueError, match="exists group"):
        bgp_query(g, [("?f", "imports", "?m")],
                  exists=[[("?a", "label", "?b")]])


# ---------------------------------------------------------------------------
# quad patterns (named graphs) + charset star ordering
# ---------------------------------------------------------------------------

QUAD_SCHEMA = "subj string, pred string, obj string, graph string"


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        ("f1", "repo", "r1", "urn:g:a"),
        ("f2", "repo", "r2", "urn:g:b"),
        ("f1", "lang", "py", "urn:g:langs"),
        ("f2", "lang", "go", "urn:g:langs"),
        ("f1", "type", "File", None),
        ("f2", "type", "File", None),
        ("f3", "type", "File", None),
    ]
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def test_quad_literal_graph_filters_sliver(quads):
    out = bgp_query(quads, [("?f", "repo", "?r", "urn:g:a")])
    assert [tuple(r) for r in out.collect()] == [("f1", "r1")]


def test_quad_var_graph_binds_named_graphs_only(quads):
    out = bgp_query(quads, [("?s", "?p", "?o", "?g")])
    got = {tuple(r) for r in out.collect()}
    # the three default-graph (NULL) rows are NOT matched by GRAPH ?g
    assert len(got) == 4
    assert all(r[3] is not None for r in got)


def test_triple_pattern_scopes_to_default_graph(quads):
    # a plain (s, p, o) pattern on a quads frame sees ONLY NULL-graph
    # rows: the repo edges live in named graphs and are invisible
    assert bgp_query(quads, [("?f", "repo", "?r")]).count() == 0
    assert bgp_query(quads, [("?f", "type", "?t")]).count() == 3


def test_quad_none_graph_term_means_default(quads):
    out = bgp_query(quads, [("?f", "type", "?t", None)])
    assert out.count() == 3


def test_quad_on_plain_triple_table_rejected(quads):
    with pytest.raises(ValueError, match="graph"):
        bgp_query(quads.select("subj", "pred", "obj"),
                  [("?f", "repo", "?r", "urn:g:a")])


def test_graph_var_joins_within_one_graph(quads):
    # two patterns sharing ?g must match within the SAME named graph
    out = bgp_query(quads, [("?f", "repo", "?r", "?g"),
                            ("?f2", "repo", "?r2", "?g")])
    got = {tuple(r) for r in out.collect()}
    # urn:g:a and urn:g:b each hold one repo edge -> only the
    # same-row pairings survive the shared-?g join
    assert got == {("f1", "f1", "urn:g:a", "r1", "r1"),
                   ("f2", "f2", "urn:g:b", "r2", "r2")}


def test_charsets_order_rarest_star_first():
    from claimskg_generator_spark.operators.bgp import _order_patterns

    pats = [("?m", "label", "?lbl"),        # big star (100 entities)
            ("?f", "repo", "?r"),           # rare star (5 entities)
            ("?f", "lang", "?l")]
    charsets = {"lang,repo": (5, 11), "label": (100, 100), "*": 2}
    ordered = _order_patterns(pats, None, charsets)
    # the ?f star (5 + 2 overflow = 7) seeds the chain and its sibling
    # clusters right behind; the ?m star (102) goes last
    assert ordered == [("?f", "repo", "?r"), ("?f", "lang", "?l"),
                       ("?m", "label", "?lbl")]
    # without charsets the historic fewest-variables tie-break stands:
    # original order among equal-var patterns
    assert _order_patterns(pats, None, None) == pats


def test_charsets_ordering_preserves_results(g):
    pats = [("?f", "imports", "?m"), ("?m", "label", "?l"),
            ("?f", "lang", "python")]
    plain = {tuple(r) for r in bgp_query(g, pats).collect()}
    charsets = {"imports,lang": (2, 5), "label": (2, 2)}
    with_cs = {tuple(r) for r in
               bgp_query(g, pats, charsets=charsets).collect()}
    assert plain == with_cs and plain


def test_charsets_accepts_row_like_and_frozenset_keys():
    from claimskg_generator_spark.operators.bgp import (
        _parse_charsets,
        _star_estimate,
    )

    sets, overflow = _parse_charsets(
        {frozenset({"a", "b"}): 4, "c": (7, 9), "*": 3})
    assert overflow == 3.0
    assert _star_estimate(frozenset({"a"}), sets, overflow) == 7.0
    assert _star_estimate(frozenset({"c"}), sets, overflow) == 10.0
