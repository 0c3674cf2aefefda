"""Distribution-drift detection: Population Stability Index between a
reference snapshot and a current snapshot of a numeric column.

The standing data-quality question on a continuously-ingested corpus —
"did today's crawl change shape?" — is answered by binning the metric
(document length, quality score, token count) over FIXED, plan-time
bin edges and comparing the two binned distributions:

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref)

(< 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted, by the usual credit-
scoring convention).  Proportions are add-alpha smoothed over the full
bin space so empty bins stay finite and the number replays exactly in
any engine.

Scale shape (100 TB per snapshot): bin assignment is a pure row
expression (count of edges ≤ value — no sort, no percentile); each
side is ONE map-side-combinable groupBy(bin) whose output is at most
len(edges)+1 rows; the join of the two binned frames is
constant-sized.  Nothing about the input size survives the first
aggregate — this is the cheapest whole-corpus health check there is.

Fixed edges are a feature, not a shortcut: quantile-derived edges move
with the data and make yesterday's PSI incomparable to today's.
Derive edges ONCE (distribution_stats, operators/textstats.py) and
pin them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(value: Column, edges: Sequence[float]) -> Column:
    """Bin id = number of edges <= value (0 .. len(edges)); NULL values
    go to bin -1 so they are visible, not silently dropped."""
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.when(value.isNull(), F.lit(-1)).otherwise(
        F.size(F.filter(arr, lambda e: e <= value.cast("double")))
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bin_edges: Sequence[float],
    alpha: float = 0.5,
) -> DataFrame:
    """Per-bin PSI decomposition between ``ref`` and ``cur`` over
    ``value_col`` with fixed ``bin_edges`` (strictly increasing).

    Output, one row per bin id in {-1 (NULLs), 0 .. len(edges)}:
    ``bin``, ``n_ref``, ``n_cur``, ``psi_contrib`` (rounded 6).  Total
    PSI is the sum of ``psi_contrib`` — left to the caller so the
    per-bin blame stays visible.
    """
    edges = [float(e) for e in bin_edges]
    if not edges or any(b <= a for a, b in zip(edges, edges[1:])):
        raise ValueError(
            f"bin_edges must be non-empty strictly increasing: {edges}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    n_bins = len(edges) + 2  # value bins + the NULL bin

    def _binned(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(_bin_of(F.col(value_col), edges).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    bins = F.broadcast(
        ref.sparkSession.range(-1, len(edges) + 1)
        .select(F.col("id").cast("int").alias("bin"))
    )
    counts = (
        bins.join(_binned(ref, "n_ref"), "bin", "left")
        .join(_binned(cur, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    totals = counts.agg(F.sum("n_ref").alias("tr"),
                        F.sum("n_cur").alias("tc"))
    p_ref = (F.col("n_ref") + alpha) / (F.col("tr") + alpha * n_bins)
    p_cur = (F.col("n_cur") + alpha) / (F.col("tc") + alpha * n_bins)
    return (
        counts.join(F.broadcast(totals))
        .select(
            "bin", "n_ref", "n_cur",
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6)
            .alias("psi_contrib"),
        )
    )
