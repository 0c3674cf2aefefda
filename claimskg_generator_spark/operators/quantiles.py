"""Exact grouped quantiles and robust (median/MAD) outlier gating.

``approx_percentile`` is the right default at 100 TB (see
textstats.distribution_stats), but two pipeline jobs need EXACT order
statistics: contractual SLO reporting ("the real p99, not a sketch")
and robust outlier gating, where the median/MAD pair is the standard
skew-proof alternative to mean/stddev (a single 10^9-token document
moves a mean; it cannot move a median).

Scale shape: the naive exact plan — sort every group — is a non-
starter.  Instead both operators run over the VALUE-COUNT frame:

    groupBy(group, value).count()           # map-side combinable;
                                            # output = distinct values
    window cum-sum per group over values    # shuffle by group only
    rank arithmetic picks the answer rows   # pure row expressions

so the shuffled data is one row per DISTINCT (group, value) — for the
typical quality-score / length / latency columns that is orders of
magnitude smaller than the input, and the per-group sorted window is
over distinct values, not rows.  One shuffle end-to-end; every q is
answered in the same pass (a row knows which ranks it covers:
cum − count < k ≤ cum).

Discrete-quantile semantics match DuckDB ``quantile_disc``: the
smallest value whose 1-based cumulative count reaches ceil(q·n)
(verified empirically; pinned by the q85 oracle).  Median/MAD use the
interpolated (type-7-at-0.5) definition DuckDB ``median``/``mad``
apply to DOUBLE columns: mean of the two middle order statistics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cum_value_counts(df: DataFrame, group_col: str,
                      value_col: str) -> DataFrame:
    """One row per distinct (group, value): its count, the group's
    1-based cumulative count at that value, and the group total ``_n``.
    NULL values are excluded (order statistics are over non-NULLs,
    matching SQL aggregate semantics)."""
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    return vc.select(
        group_col, value_col, "_cnt",
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(wg).alias("_n"),
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
) -> DataFrame:
    """Exact discrete quantiles per group, every q in one pass.

    Output: one row per (group, q) — ``group_col``, ``q`` (double),
    ``value`` — where ``value`` is the smallest ``value_col`` whose
    cumulative count reaches ceil(q·n) (DuckDB ``quantile_disc``).
    A (group, value) row answers q exactly when the rank k = ceil(q·n)
    lands inside its cumulative span (cum − count, cum], so the q list
    is resolved with a per-row array filter — no per-q scan.
    """
    qlist = [float(q) for q in qs]
    if not qlist or any(not (0.0 < q <= 1.0) for q in qlist):
        raise ValueError(f"qs must be within (0, 1], got {qs}")
    cum = _cum_value_counts(df, group_col, value_col)
    qarr = F.array(*[F.lit(q) for q in qlist])
    covered = F.filter(
        qarr,
        lambda q: (F.ceil(q * F.col("_n")) > F.col("_cum") - F.col("_cnt"))
        & (F.ceil(q * F.col("_n")) <= F.col("_cum")),
    )
    return (
        cum.select(group_col, F.col(value_col).alias("value"),
                   F.explode(covered).alias("q"))
        .select(group_col, "q", "value")
    )


def grouped_median(df: DataFrame, group_col: str,
                   value_col: str) -> DataFrame:
    """Exact interpolated median per group (DuckDB ``median`` on
    DOUBLE): mean of the order statistics at ranks floor((n+1)/2) and
    ceil((n+1)/2).  Output: ``group_col``, ``median`` (double).

    Same value-count plan as grouped_quantiles; the two middle ranks
    are picked with conditional aggregates (exactly one row per group
    covers each rank), so there is no explode and no second shuffle.
    """
    cum = _cum_value_counts(df, group_col, value_col)
    lo = F.floor((F.col("_n") + 1) / 2)
    hi = F.ceil((F.col("_n") + 1) / 2)
    covers = lambda k: (k > F.col("_cum") - F.col("_cnt")) & (  # noqa: E731
        k <= F.col("_cum"))
    v = F.col(value_col).cast("double")
    return cum.groupBy(group_col).agg(
        ((F.max(F.when(covers(lo), v)) + F.max(F.when(covers(hi), v))) / 2)
        .alias("median")
    )


def robust_outlier_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Median/MAD outlier flags per group: a row is an outlier when
    |value − median| > k · MAD (MAD = median of absolute deviations,
    unscaled — multiply k by 1.4826 for the Gaussian-consistent form).

    Appends ``med``, ``mad`` (rounded to ``round_to`` decimals for
    display so the 1-ulp ambiguity of interpolated-median arithmetic
    cannot leak into cross-engine comparisons) and boolean
    ``is_outlier`` (NULL values are never outliers).  Deviations and
    the gate itself run on the RAW medians — exactly what SQL
    ``mad()`` computes — rounding touches only the reported columns.
    Two grouped-median passes plus two small joins on ``group_col`` —
    the median frames are one row per group, broadcastable whenever
    the group count is.  Pick a non-round ``k`` (e.g. 2.013) if exact
    |value − med| = k·MAD ties are conceivable in the data.
    """
    med = grouped_median(df, group_col, value_col).select(
        group_col, F.col("median").alias("_med_raw"))
    dev = df.join(med, group_col).select(
        group_col,
        F.abs(F.col(value_col).cast("double")
              - F.col("_med_raw")).alias("_dev"),
    )
    mad = grouped_median(dev, group_col, "_dev").select(
        group_col, F.col("median").alias("_mad_raw"))
    return (
        df.join(med, group_col).join(mad, group_col)
        .withColumn(
            "is_outlier",
            F.when(F.col(value_col).isNull(), F.lit(False)).otherwise(
                F.abs(F.col(value_col).cast("double") - F.col("_med_raw"))
                > F.lit(float(k)) * F.col("_mad_raw")
            ),
        )
        .withColumn("med", F.round("_med_raw", round_to))
        .withColumn("mad", F.round("_mad_raw", round_to))
        .drop("_med_raw", "_mad_raw")
    )
