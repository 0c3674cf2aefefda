"""Field-level record fusion (survivorship) for resolved duplicates.

After duplicate detection groups records under a canonical key
(operators/components.dedup_groups for the corpus, the reconciler for
claims — reference analog: the per-claim merge the reference applies
when the same claim URI carries conflicting fields), each surviving
entity needs ONE value per field, chosen by a per-field survivorship
rule rather than whichever row happened to arrive last:

    longest  — longest string (tie: lexicographically largest)
    latest   — value on the row with the greatest order column
               (tie: largest value — a total order, no arrival races)
    max/min  — numeric extreme
    mode     — most frequent value (tie: smallest value)

Scale shape: longest / latest / max / min all compile to ONE
map-side-combinable groupBy(key) — ``max(struct(rank, value))``
reduces pairwise in any order, so partial aggregation does the heavy
lifting and the shuffle carries one struct per (partition, key).
``mode`` genuinely needs the per-(key, value) counts, so requesting
any mode field adds exactly one more combinable groupBy plus an
equi-join back on the key; the count frame is key×distinct-value,
which partial aggregation has already collapsed.  No windows, no
explode, deterministic under any row order.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_expr(col: str, rule: str, order_col: str | None) -> Column:
    c = F.col(col)
    if rule == "longest":
        return F.max(
            F.when(c.isNotNull(), F.struct(F.length(c).alias("k"),
                                           c.alias("v")))
        )["v"].alias(col)
    if rule == "latest":
        if order_col is None:
            raise ValueError("latest rule requires order_col")
        o = F.col(order_col)
        return F.max(
            F.when(c.isNotNull() & o.isNotNull(),
                   F.struct(o.alias("k"), c.alias("v")))
        )["v"].alias(col)
    if rule == "max":
        return F.max(c).alias(col)
    if rule == "min":
        return F.min(c).alias(col)
    raise ValueError(f"unknown fusion rule {rule!r} for {col!r}")


def fuse_records(
    df: DataFrame,
    key_col: str,
    rules: Mapping[str, str],
    order_col: str | None = None,
) -> DataFrame:
    """Fuse duplicate records into one row per ``key_col``.

    ``rules`` maps column → rule (longest | latest | max | min |
    mode); ``order_col`` supplies the recency order for ``latest``.
    Output: ``key_col``, one fused column per rule (same names), and
    ``n_records`` (group size).  NULLs never win a rule; a field
    that is NULL on every record fuses to NULL.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    missing = set(rules) - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    simple = {c: r for c, r in rules.items() if r != "mode"}
    modes = [c for c, r in rules.items() if r == "mode"]
    fused = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_records"),
        *[_fold_expr(c, r, order_col) for c, r in simple.items()],
    )
    for c in modes:
        # most frequent value, tie -> smallest: max over (count, -value)
        # needs an order-reversal that works for any type, so fold
        # max(struct(count)) per value first, then min value among the
        # argmax counts via one more combinable groupBy
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(key_col, c)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        best_n = counts.groupBy(key_col).agg(F.max("_n").alias("_n"))
        winner = (
            counts.join(best_n, [key_col, "_n"])
            .groupBy(key_col)
            .agg(F.min(c).alias(c))
        )
        fused = fused.join(winner, key_col, "left")
    order = [key_col, *rules.keys(), "n_records"]
    return fused.select(*order)
