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
