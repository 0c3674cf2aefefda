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

from pyspark.sql import Column, DataFrame
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


def _tokens(col: Column, lowercase: bool) -> Column:
    t = F.trim(col)
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def _ngrams(toks: Column, n: int) -> Column:
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    # sequence(1, 0) DESCENDS in Spark — short inputs must yield []
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def _clipped(cg: Column, rg: Column) -> Column:
    """sum over distinct candidate grams of min(count in cand, count
    in ref) — the BLEU modified-precision numerator, exact integers."""
    return F.aggregate(
        F.array_distinct(cg), F.lit(0).cast("long"),
        lambda acc, g: acc + F.least(
            F.size(F.filter(cg, lambda y: y == g)),
            F.size(F.filter(rg, lambda y: y == g))))


def ngram_overlap(pairs: DataFrame, cand_col: str = "candidate",
                  ref_col: str = "reference", max_n: int = 2,
                  lowercase: bool = True) -> DataFrame:
    """Corpus-level BLEU statistics (Papineni et al., ACL 2002) for
    aligned (candidate, reference) text pairs — the generated-text
    quality gate of an LLM data pipeline, scored as ONE row.

    Per pair and per n <= ``max_n``, the clipped n-gram matches
    (sum over distinct candidate grams of min(candidate count,
    reference count) — BLEU's modified precision numerator) and the
    candidate gram totals are computed IN the row with exact integer
    arithmetic; one combinable global fold sums them with the
    candidate/reference token lengths, and the modified precisions
    ``p<n> = clipped_<n> / total_<n>`` are raw IEEE divisions of those
    integers — engine-replayable like :func:`triple_pr`'s ratios.

    The geometric mean and ``exp(1 - ref_len/cand_len)`` brevity
    penalty of headline BLEU are NOT emitted: cross-engine ``exp``/
    ``pow`` carry no bit-level contract, and every input to them
    (clipped/total counts, both corpus lengths) IS in the output row —
    callers compose the scalar in one line with their own float
    policy.  Scale shape: narrow per-row transforms (O(grams²) per
    row in the clip — document-bounded) and a single one-row
    aggregate; nothing shuffles but the final fold."""
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1, got {max_n}")
    ct = _tokens(F.col(cand_col), lowercase)
    rt = _tokens(F.col(ref_col), lowercase)
    per_row = [F.size(ct).alias("clen"), F.size(rt).alias("rlen")]
    for n in range(1, max_n + 1):
        cg = _ngrams(ct, n)
        rg = _ngrams(rt, n)
        per_row.append(_clipped(cg, rg).alias(f"clip{n}"))
        per_row.append(F.size(cg).cast("long").alias(f"tot{n}"))
    rows = pairs.select(*per_row)
    aggs = [F.sum("clen").alias("cand_len"),
            F.sum("rlen").alias("ref_len")]
    for n in range(1, max_n + 1):
        aggs.append(F.sum(f"clip{n}").alias(f"clipped_{n}"))
        aggs.append(F.sum(f"tot{n}").alias(f"total_{n}"))
    out = rows.agg(*aggs)
    precs = [F.try_divide(F.col(f"clipped_{n}"), F.col(f"total_{n}"))
             .alias(f"p{n}") for n in range(1, max_n + 1)]
    return out.select("*", *precs)
