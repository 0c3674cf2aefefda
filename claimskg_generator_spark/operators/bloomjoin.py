"""Bloom-prefiltered semi-join: build a Bloom filter on the small
side's join keys, broadcast it as ONE row of bitmask words, knock out
provably-unmatchable big-side rows BEFORE the shuffle, then run the
exact semi-join on the survivors.

Why this exists at 100 TB: a semi-join against a selective dimension
(the "keep only documents whose domain is allowlisted", "keep only
lineitems of high-value orders" shape) shuffles the ENTIRE fact side
even though most rows will not match.  Spark's own runtime bloom
filter join (spark.sql.optimizer.runtime.bloomFilter.enabled) does
this inside Catalyst when statistics cooperate; this operator is the
explicit, always-on form — the filter is a deterministic xxhash64
k-position Bloom, so the prefilter is a pure row-local expression and
the only data movement for the 100 TB side is the surviving fraction.

EXACTNESS: a Bloom filter never yields false negatives, so the
prefilter drops only rows that cannot match; the final equi-semi-join
on the survivors removes the false positives.  The composed operator
is therefore EXACTLY a semi-join (the oracle is plain ANSI `IN`), and
``verify=False`` exposes the raw one-sided prefilter for callers that
tolerate the ε of false positives (e.g. pre-aggregation pruning).

Representation: the m-bit filter is stored as m/64 longs in a
word-index → word map (only non-zero words are kept), built with one
map-side-combinable groupBy over the keys' bit positions and collected
into a single broadcast row.  At the default m = 2^20 the worst-case
row is 16 K map entries (~256 KB) — broadcast-trivial; size m at
~10 bits per distinct key for a ~1% false-positive rate at depth 7,
or accept more false positives (the verify join eats them).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, depth: int, width_bits: int):
    """depth Bloom bit positions for one key: xxhash64 seeded by the
    probe index (pmod keeps them non-negative)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(width_bits))
        for j in range(depth)
    ]


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: Optional[str] = None,
    width_bits: int = 1 << 20,
    depth: int = 3,
    verify: bool = True,
) -> DataFrame:
    """``left`` rows whose ``on`` key appears in ``right``'s
    ``right_on`` (default: same name) — an exact semi-join whose
    shuffle only ever carries the Bloom-surviving fraction of ``left``.

    ``verify=False`` skips the exact residual join and returns the
    prefiltered frame (superset semantics: no false negatives, ~ε
    false positives).
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width_bits < 64:
        raise ValueError(f"width_bits must be >= 64, got {width_bits}")
    right_on = right_on or on

    keys = right.select(F.col(right_on).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    words = (
        keys.select(
            F.explode(
                F.array(*_positions(F.col("__k"), depth, width_bits))
            ).alias("p")
        )
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # the Python shiftleft wrapper only takes an int count —
            # call the SQL function directly for a column count
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.pmod(F.col("p"), F.lit(64)).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
    )
    bloom = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("mask")))
        ).alias("__bloom")
    )

    key = F.col(on)
    tests = [
        F.call_function(
            "shiftright",
            F.coalesce(
                F.element_at(F.col("__bloom"),
                             (p / 64).cast("long")),
                F.lit(0).cast("long"),
            ),
            F.pmod(p, F.lit(64)).cast("int"),
        ).bitwiseAND(F.lit(1).cast("long")) == 1
        for p in _positions(key, depth, width_bits)
    ]
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    prefiltered = (
        left.join(F.broadcast(bloom))
        .filter(key.isNotNull() & hit)
        .drop("__bloom")
    )
    if not verify:
        return prefiltered
    return prefiltered.join(
        F.broadcast(keys.distinct().withColumnRenamed("__k", on)),
        on,
        "left_semi",
    )
