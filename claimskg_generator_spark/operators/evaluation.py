"""Triple-level precision / recall — the KG-construction acceptance
metric, computed as ONE distributed job.

The north rule's own gate is stated in these terms ("Triple P/R >= 0.95
vs reference N-Triples"): given a CANDIDATE graph (the pipeline under
test) and a GOLD graph (the reference emission, a previous blessed
snapshot, a hand-curated sample), score the candidate by exact
triple-set overlap.  The reference validates equivalence row-at-a-time
in pytest against its fixture files (generator tests around the
N-Triples output; see also this repo's byte-level golden
tests/test_golden_ntriples.py); this operator is the same check lifted
to a cluster so two 10^11-triple graphs can be scored without either
side ever fitting one machine.

Shape: both sides are reduced to their distinct key tuples and scored
with ONE tagged union + groupBy — never a join:

* tag candidate rows ``(in_c=1, in_g=0)`` and gold rows ``(0, 1)``,
* union, groupBy the triple key, ``max`` each flag (this is also the
  set-dedup, so callers need not pre-``distinct`` either side),
* one global fold: ``tp = sum(in_c * in_g)``, ``n_candidate``,
  ``n_gold`` — map-side combinable, a single row out.

That is exactly one wide exchange over the combined key space plus a
one-row reduce; set-intersection via semi-join would cost the same
shuffle TWICE (once per distinct(), once for the join) and anti-join
variants three times.  Skewed keys cannot exist: the groupBy key is the
whole triple, unique after dedup by construction.

Precision/recall/F1 are emitted as raw IEEE divisions of the two
counts (no rounding): the same two integers divide to the bit-identical
double on any engine, so the driver's repr()-level value hash holds
without a rounding-mode contract (Spark HALF_UP vs DuckDB bankers').

Empty-side semantics: an empty candidate yields NULL precision/F1 (0/0)
and recall 0; an empty gold the mirror — NULL, never a misleading 0.0,
matching SQL division semantics in both engines.
"""

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_pr(candidate: DataFrame, gold: DataFrame,
              keys: Sequence[str] = ("subj", "pred", "obj", "okind"),
              ) -> DataFrame:
    """Score ``candidate`` against ``gold`` by exact key-tuple overlap.

    Returns ONE row: ``tp, n_candidate, n_gold, precision, recall,
    f1`` under set semantics (both sides deduped by the fold itself).
    ``keys`` defaults to the engine's triple shape but any identity
    tuple works (e.g. ``("subj","pred","obj")`` to ignore okind, or
    entity-link pairs from link_modules).
    """
    kcols = [F.col(k) for k in keys]
    c = candidate.select(*kcols).withColumns(
        {"in_c": F.lit(1), "in_g": F.lit(0)})
    g = gold.select(*kcols).withColumns(
        {"in_c": F.lit(0), "in_g": F.lit(1)})
    per_key = (
        c.unionByName(g)
        .groupBy(*[F.col(k) for k in keys])
        .agg(F.max("in_c").alias("in_c"), F.max("in_g").alias("in_g"))
    )
    counts = per_key.agg(
        F.sum(F.col("in_c") * F.col("in_g")).alias("tp"),
        F.sum("in_c").alias("n_candidate"),
        F.sum("in_g").alias("n_gold"),
    )
    # try_divide: NULL on an empty side (0/0) instead of the ANSI-mode
    # arithmetic error; for non-zero denominators it is the identical
    # IEEE division.
    p = F.try_divide(F.col("tp"), F.col("n_candidate"))
    r = F.try_divide(F.col("tp"), F.col("n_gold"))
    return counts.select(
        "tp", "n_candidate", "n_gold",
        p.alias("precision"), r.alias("recall"),
        F.try_divide(F.lit(2) * p * r, p + r).alias("f1"),
    )
