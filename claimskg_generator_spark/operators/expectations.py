"""Declarative data-quality constraint checks (deequ/dbt-test style).

Ingesting 100 TB a day means schema drift, upstream nulls, and key
collisions arrive daily too; the standard defense is a constraint
suite evaluated as ONE aggregation pass whose output is a small
long-format report — (column, metric, value, threshold, ok) — that a
scheduler can gate on.

Supported metrics (all exact):
    not_null      — fraction of non-NULL values        (ok: value >= threshold)
    unique        — distinct count / row count         (ok: value >= threshold)
    min / max     — numeric bound                      (ok: min >= / max <= threshold)
    mean          — numeric mean, rounded 6            (ok: value >= threshold)
    matches:<re>  — fraction of non-NULL values matching the regex
                                                        (ok: value >= threshold)

Scale shape: every metric compiles to an expression inside a single
``agg`` — one combinable pass over the data, no shuffle beyond the
final one-row reduce — then the one-row wide frame unpivots to the
long report with a plan-time ``stack``.  ``unique`` uses exact
count(distinct); Spark expands multiple exact distincts into an
``expand`` (one duplicated pass per distinct column), which is the
honest price of exactness — swap in approx_count_distinct for
monitoring-grade checks at extreme width.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Constraint(NamedTuple):
    column: str
    metric: str          # not_null | unique | min | max | mean | matches:<re>
    threshold: float


def _metric_expr(df: DataFrame, c: Constraint) -> Column:
    col = F.col(c.column)
    n = F.count(F.lit(1))
    if c.metric == "not_null":
        return F.count(col) / n
    if c.metric == "unique":
        return F.countDistinct(col) / n
    if c.metric == "min":
        return F.min(col).cast("double")
    if c.metric == "max":
        return F.max(col).cast("double")
    if c.metric == "mean":
        return F.round(F.avg(col), 6)
    if c.metric.startswith("matches:"):
        pat = c.metric[len("matches:"):]
        return (
            F.sum(F.when(col.rlike(pat), 1).otherwise(0))
            / F.count(col)
        )
    raise ValueError(f"unknown metric {c.metric!r}")


def _ok(c: Constraint, value: Column) -> Column:
    if c.metric == "max":
        return value <= F.lit(float(c.threshold))
    return value >= F.lit(float(c.threshold))


def profile_constraints(
    df: DataFrame, constraints: Sequence[Constraint | tuple]
) -> DataFrame:
    """Evaluate ``constraints`` in one aggregation pass.

    Output, one row per constraint in input order: ``column``,
    ``metric``, ``value`` (double), ``threshold`` (double), ``ok``
    (boolean).  Fails fast on unknown metrics or columns (at plan
    time, not after the scan).
    """
    cs = [Constraint(*c) for c in constraints]
    if not cs:
        raise ValueError("constraints must be non-empty")
    missing = {c.column for c in cs} - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    wide = df.agg(*[
        _metric_expr(df, c).cast("double").alias(f"_m{i}")
        for i, c in enumerate(cs)
    ])
    report = [
        F.struct(
            F.lit(c.column).alias("column"),
            F.lit(c.metric).alias("metric"),
            F.col(f"_m{i}").alias("value"),
            F.lit(float(c.threshold)).alias("threshold"),
        )
        for i, c in enumerate(cs)
    ]
    long = wide.select(
        F.explode(F.array(*report)).alias("r")
    ).select("r.column", "r.metric", "r.value", "r.threshold")
    oks = F.coalesce(
        *[
            F.when(
                (F.col("column") == c.column)
                & (F.col("metric") == c.metric)
                & (F.col("threshold") == F.lit(float(c.threshold))),
                _ok(c, F.col("value")),
            )
            for c in cs
        ]
    )
    return long.withColumn("ok", oks)
