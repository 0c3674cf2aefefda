"""SHACL-lite shape validation over a ``(subj, pred, obj)`` triple
table — the publish-time quality gate of a KG-construction pipeline.

A graph published under a vocabulary carries structural promises: every
SoftwareSourceCode node has exactly one codeRepository, every Module
exactly one label, language values come from a closed set.  SHACL is
how RDF stacks declare those promises; this module implements the core
constraint components over the engine's triple frame so validation is
one Spark job, not a post-hoc store-side pass:

* ``sh:targetClass``    — focus nodes = subjects typed with the class
* ``sh:minCount`` / ``sh:maxCount`` — per-focus cardinality of a path
* ``sh:pattern``        — every value matches a regex
* ``sh:in``             — every value drawn from a closed literal set
* ``sh:class``          — every value is itself typed with a class

The output is a VIOLATIONS REPORT (empty == conforms), one row per
(focus node, shape, path, constraint) with the offending value or the
observed count — the shape of a ``sh:ValidationReport`` flattened to a
frame the rest of the engine (stats sinks, expectations suite) can
consume.

Scale shape: shapes are schema-sized, data is not.  Each property
shape touches ONE predicate sliver (the ``pred = path`` filter pushes
to the scan / pred-clustered file pruning), cardinality checks are one
combinable groupBy(subj) count over that sliver joined back to the
focus set, and value checks are row-local filters; ``sh:class`` is a
left-anti join against the type sliver.  Nothing ever self-joins the
full graph, and the per-shape frames union into one report.  minCount
violations for focus nodes with ZERO path rows are found with a
left-anti join from the focus set (a groupBy alone would never see
them).

Run it after :func:`~claimskg_generator_spark.operators.rdfs.
rdfs_entail` to validate the ENTAILED graph — e.g. an ``sh:class``
constraint naming a superclass holds exactly when entailment has been
materialized, the standard SHACL-over-RDFS deployment.
"""

from dataclasses import dataclass, field
from functools import reduce
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_REPORT_COLS = ("focus", "shape", "path", "constraint", "detail")


@dataclass(frozen=True)
class PropertyShape:
    """One ``sh:property`` block: constraints on the values of ``path``
    at each focus node.  ``min_count=0`` + all-None means no-op."""
    path: str
    min_count: int = 0
    max_count: Optional[int] = None
    pattern: Optional[str] = None
    in_values: Optional[Tuple[str, ...]] = None
    class_: Optional[str] = None

    def __post_init__(self):
        if self.min_count < 0:
            raise ValueError("min_count must be >= 0")
        if self.max_count is not None and self.max_count < self.min_count:
            raise ValueError("max_count must be >= min_count")


@dataclass(frozen=True)
class NodeShape:
    """A named shape targeting every instance of ``target_class``."""
    name: str
    target_class: str
    properties: Tuple[PropertyShape, ...] = field(default_factory=tuple)


def _empty_report(spark) -> DataFrame:
    return spark.createDataFrame(
        [], ", ".join(f"{c} string" for c in _REPORT_COLS))


def shacl_validate(triples: DataFrame,
                   shapes: Sequence[NodeShape]) -> DataFrame:
    """Validate ``triples`` against ``shapes``; returns the violations
    report ``(focus, shape, path, constraint, detail)`` — empty means
    the graph conforms.  ``detail`` is the offending value for value
    constraints and the observed count (as a string) for cardinality
    constraints."""
    if not shapes:
        return _empty_report(triples.sparkSession)
    data = triples.select("subj", "pred", "obj")
    parts = []
    for shape in shapes:
        focus = (
            data.filter((F.col("pred") == RDF_TYPE)
                        & (F.col("obj") == shape.target_class))
            .select(F.col("subj").alias("focus"))
            .distinct()
        )
        for ps in shape.properties:
            sliver = (
                data.filter(F.col("pred") == ps.path)
                .select(F.col("subj").alias("focus"),
                        F.col("obj").alias("value"))
                .join(focus, "focus", "left_semi")
            )
            tag = [F.lit(shape.name).alias("shape"),
                   F.lit(ps.path).alias("path")]
            if ps.min_count > 0 or ps.max_count is not None:
                counts = sliver.groupBy("focus").agg(
                    F.count("*").alias("__n"))
                if ps.min_count > 0:
                    parts.append(
                        counts.filter(F.col("__n") < ps.min_count)
                        .select("focus", *tag,
                                F.lit("minCount").alias("constraint"),
                                F.col("__n").cast("string").alias("detail")))
                    # zero-valued focus nodes never reach the groupBy
                    parts.append(
                        focus.join(sliver.select("focus").distinct(),
                                   "focus", "left_anti")
                        .select("focus", *tag,
                                F.lit("minCount").alias("constraint"),
                                F.lit("0").alias("detail")))
                if ps.max_count is not None:
                    parts.append(
                        counts.filter(F.col("__n") > ps.max_count)
                        .select("focus", *tag,
                                F.lit("maxCount").alias("constraint"),
                                F.col("__n").cast("string").alias("detail")))
            if ps.pattern is not None:
                parts.append(
                    sliver.filter(~F.col("value").rlike(ps.pattern))
                    .select("focus", *tag,
                            F.lit("pattern").alias("constraint"),
                            F.col("value").alias("detail")))
            if ps.in_values is not None:
                parts.append(
                    sliver.filter(~F.col("value").isin(*ps.in_values))
                    .select("focus", *tag,
                            F.lit("in").alias("constraint"),
                            F.col("value").alias("detail")))
            if ps.class_ is not None:
                typed = (
                    data.filter((F.col("pred") == RDF_TYPE)
                                & (F.col("obj") == ps.class_))
                    .select(F.col("subj").alias("value"))
                    .distinct()
                )
                parts.append(
                    sliver.join(typed, "value", "left_anti")
                    .select("focus", *tag,
                            F.lit("class").alias("constraint"),
                            F.col("value").alias("detail")))
    if not parts:
        return _empty_report(triples.sparkSession)
    return reduce(DataFrame.unionAll, parts).distinct()


def claims_shapes() -> "list[NodeShape]":
    """The ClaimsKG publication contract (the reference's schema.org
    ClaimReview model, reference claimskg/generator/__init__.py) as
    SHACL-lite shapes: every ClaimReview reviews exactly one typed
    CreativeWork, carries its original + normalized Rating pair, and
    has one publication date (the reference keeps rows with unparsable
    dates but emits no datePublished — those surface as minCount
    violations, not dropped rows); every claim body has exactly one
    text; citation fan-out is capped; every Rating that is MEANT to
    carry a value has exactly one (the reference's never-match
    normalization quirk leaves some normalized ratings valueless —
    again a REPORTED fact).  Shared by the registry's q119 and the
    pure-Python golden generator (scripts/gen_pipeline_goldens.py),
    which evaluates these same shapes over the reference-semantics
    oracle triples."""
    s = "http://schema.org/"
    return [
        NodeShape("ClaimReviewShape", s + "ClaimReview", (
            PropertyShape(s + "itemReviewed", min_count=1, max_count=1,
                          class_=s + "CreativeWork"),
            PropertyShape(s + "reviewRating", min_count=1, max_count=2,
                          class_=s + "Rating"),
            PropertyShape(s + "datePublished", min_count=1, max_count=1),
        )),
        NodeShape("CreativeWorkShape", s + "CreativeWork", (
            PropertyShape(s + "text", min_count=1, max_count=1),
            PropertyShape(s + "citation", max_count=4),
        )),
        NodeShape("RatingShape", s + "Rating", (
            PropertyShape(s + "ratingValue", min_count=1, max_count=1),
            PropertyShape(s + "author", min_count=1, max_count=1),
        )),
    ]


def python_validate(triples, shapes: Sequence[NodeShape]):
    """Pure-Python twin of :func:`shacl_validate` over an iterable of
    ``(subj, pred, obj)`` tuples — used by the golden generator so the
    driver oracle cross-checks the Spark plan against an independent
    evaluator (the house q20/q21/q23 pattern).  Returns the violation
    set as sorted 5-tuples."""
    trip = [(t[0], t[1], t[2]) for t in triples]
    by_type = {}
    for s, p, o in trip:
        if p == RDF_TYPE:
            by_type.setdefault(o, set()).add(s)
    out = set()
    for shape in shapes:
        focus = by_type.get(shape.target_class, set())
        for ps in shape.properties:
            vals = {}
            for s, p, o in trip:
                if p == ps.path and s in focus:
                    vals.setdefault(s, []).append(o)
            tag = (shape.name, ps.path)
            if ps.min_count > 0:
                for f in focus:
                    n = len(vals.get(f, ()))
                    if n < ps.min_count:
                        out.add((f, *tag, "minCount", str(n)))
            if ps.max_count is not None:
                for f, vv in vals.items():
                    if len(vv) > ps.max_count:
                        out.add((f, *tag, "maxCount", str(len(vv))))
            if ps.pattern is not None:
                import re as _re

                rx = _re.compile(ps.pattern)
                for f, vv in vals.items():
                    for v in vv:
                        if not rx.search(v):
                            out.add((f, *tag, "pattern", v))
            if ps.in_values is not None:
                for f, vv in vals.items():
                    for v in vv:
                        if v not in ps.in_values:
                            out.add((f, *tag, "in", v))
            if ps.class_ is not None:
                typed = by_type.get(ps.class_, set())
                for f, vv in vals.items():
                    for v in vv:
                        if v not in typed:
                            out.add((f, *tag, "class", v))
    return sorted(out)


def conforms(triples: DataFrame, shapes: Sequence[NodeShape]) -> DataFrame:
    """The one-row ``sh:conforms`` face: ``(conforms boolean,
    n_violations bigint)`` — lazy, like sparql_ask."""
    report = shacl_validate(triples, shapes)
    return report.agg(
        (F.count(F.lit(1)) == 0).alias("conforms"),
        F.count(F.lit(1)).alias("n_violations"),
    )
