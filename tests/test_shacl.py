"""SHACL-lite validation (operators/shacl.py): each constraint
component against hand-built graphs, the zero-count minCount corner,
entailed-graph composition, and plan shape (q117's value path is
pinned by the driver oracle)."""

import pytest

from claimskg_generator_spark.operators.shacl import (
    RDF_TYPE,
    NodeShape,
    PropertyShape,
    conforms,
    shacl_validate,
)

SCHEMA3 = "subj string, pred string, obj string"


@pytest.fixture(scope="module")
def g(spark):
    rows = [
        ("f1", RDF_TYPE, "File"),
        ("f2", RDF_TYPE, "File"),
        ("f3", RDF_TYPE, "File"),
        ("f1", "repo", "r1"),
        ("f2", "repo", "r1"),
        ("f2", "repo", "r2"),          # maxCount 1 violation
        # f3 has NO repo              -> minCount 1 violation (count 0)
        ("f1", "lang", "python"),
        ("f2", "lang", "go"),
        ("f3", "lang", "cobol"),       # sh:in violation
        ("f1", "imports", "m1"),
        ("f2", "imports", "x9"),       # sh:class violation (untyped)
        ("m1", RDF_TYPE, "Module"),
        ("m1", "label", "Numpy"),      # sh:pattern violation (uppercase)
        ("r1", "repo", "zzz"),         # non-focus subj: must be ignored
    ]
    return spark.createDataFrame(rows, SCHEMA3)


FILE_SHAPE = NodeShape("FileShape", "File", (
    PropertyShape("repo", min_count=1, max_count=1),
    PropertyShape("lang", in_values=("python", "go", "java", "js")),
    PropertyShape("imports", class_="Module"),
))
MOD_SHAPE = NodeShape("ModShape", "Module", (
    PropertyShape("label", pattern="^[a-z]+$"),
))


def test_all_constraint_components(g):
    rep = shacl_validate(g, [FILE_SHAPE, MOD_SHAPE])
    got = {tuple(r) for r in rep.collect()}
    assert got == {
        ("f2", "FileShape", "repo", "maxCount", "2"),
        ("f3", "FileShape", "repo", "minCount", "0"),
        ("f3", "FileShape", "lang", "in", "cobol"),
        ("f2", "FileShape", "imports", "class", "x9"),
        ("m1", "ModShape", "label", "pattern", "Numpy"),
    }
    assert rep.columns == ["focus", "shape", "path", "constraint",
                           "detail"]


def test_conforming_graph_empty_report(spark):
    rows = [("a", RDF_TYPE, "File"), ("a", "repo", "r")]
    g2 = spark.createDataFrame(rows, SCHEMA3)
    assert shacl_validate(g2, [NodeShape("S", "File", (
        PropertyShape("repo", min_count=1, max_count=1),))]).count() == 0


def test_conforms_face(g, spark):
    row = conforms(g, [FILE_SHAPE, MOD_SHAPE]).collect()[0]
    assert (row["conforms"], row["n_violations"]) == (False, 5)
    ok = spark.createDataFrame([("a", RDF_TYPE, "File"),
                                ("a", "repo", "r")], SCHEMA3)
    row = conforms(ok, [NodeShape("S", "File", (
        PropertyShape("repo", min_count=1),))]).collect()[0]
    assert (row["conforms"], row["n_violations"]) == (True, 0)


def test_min_count_two(spark):
    rows = [("a", RDF_TYPE, "T"), ("a", "p", "1"),
            ("b", RDF_TYPE, "T"), ("b", "p", "1"), ("b", "p", "2")]
    g2 = spark.createDataFrame(rows, SCHEMA3)
    rep = shacl_validate(g2, [NodeShape("S", "T", (
        PropertyShape("p", min_count=2),))])
    assert {tuple(r) for r in rep.collect()} == {
        ("a", "S", "p", "minCount", "1")}


def test_empty_shapes_and_noop_property(spark, g):
    assert shacl_validate(g, []).count() == 0
    assert shacl_validate(g, [NodeShape("S", "File", (
        PropertyShape("repo"),))]).count() == 0


def test_shape_validation_errors():
    with pytest.raises(ValueError, match="min_count"):
        PropertyShape("p", min_count=-1)
    with pytest.raises(ValueError, match="max_count"):
        PropertyShape("p", min_count=2, max_count=1)


def test_class_constraint_on_entailed_graph(spark):
    """sh:class naming a SUPERCLASS conforms exactly when RDFS
    entailment is materialized first — the standard deployment."""
    from claimskg_generator_spark.operators.rdfs import (
        SUBCLASS,
        rdfs_entail,
    )

    rows = [("f", RDF_TYPE, "File"), ("f", "imports", "m"),
            ("m", RDF_TYPE, "Module")]
    g2 = spark.createDataFrame(rows, SCHEMA3)
    shape = [NodeShape("S", "File", (
        PropertyShape("imports", class_="Thing"),))]
    assert shacl_validate(g2, shape).count() == 1      # raw graph: fails
    entailed = rdfs_entail(g2, [("Module", SUBCLASS, "Thing")])
    assert shacl_validate(entailed, shape).count() == 0


def test_plan_pushes_pred_filters(g):
    plan = shacl_validate(g, [FILE_SHAPE])._jdf.queryExecution() \
        .optimizedPlan().toString()
    # every sliver is a pred-filtered scan, never a full-graph self-join
    assert plan.count("pred#") >= 3


def test_python_twin_matches_spark_validate(spark, g):
    """python_validate (the golden generator's evaluator) and the
    Spark operator must agree constraint-for-constraint."""
    from claimskg_generator_spark.operators.shacl import python_validate

    rows = [tuple(r) for r in g.collect()]
    py = python_validate(rows, [FILE_SHAPE, MOD_SHAPE])
    sp = sorted(map(tuple, shacl_validate(
        g, [FILE_SHAPE, MOD_SHAPE]).collect()))
    assert py == sp and len(py) == 5
