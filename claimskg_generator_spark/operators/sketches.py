"""Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005).

The heavy-hitter question — "which terms appear at least T times in the
corpus?" — is trivially a groupBy at benchmark scale, but the exact
per-term count table itself becomes a liability at 100 TB: its
cardinality is the vocabulary (billions of n-grams), and any consumer
that wants approximate frequencies (quality gates, stop-term lists,
skew detection for salting decisions) should not have to materialize
or broadcast it.  The count-min sketch is the standard fix: a
depth × width integer grid, CONSTANT size regardless of corpus or
vocabulary size, mergeable across partitions (sums commute), whose
point estimate min_j grid[j][h_j(x)] never underestimates and
overestimates with probability ≤ (1/e)^depth by more than
ε = e/width of the total mass.

Spark shape (100 TB):

* token counts are ONE map-side-combinable groupBy — the same shuffle
  any frequency pass pays;
* the sketch is a regroup of that slim frame into at most
  depth × width rows (constant!), so it broadcasts for the probe join
  no matter how large the corpus is;
* probing re-derives each candidate's depth bucket ids WITHIN the row
  (posexplode over a plan-time hash array — no self-join) and takes
  min over the joined grid cells.

Determinism & oracle parity: bucket ids come from the md5-mod-p hash
family (operators/dedup.md5_hash_mod_p) salted with the row index, so
a DuckDB twin replays the grid byte-for-byte; counts and estimates are
explicit BIGINTs on both sides.

Estimates are ONE-SIDED: cms_count >= exact_count always, so the
T-threshold scan over estimates has perfect recall and the (disclosed)
false positives are exactly the rows where cms_count > exact_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.dedup import md5_hash_mod_p


def _bucket_cols(term_col, depth: int, width: int):
    """depth bucket ids for one term: md5-mod-p over 'j|term', mod width.
    md5_hash_mod_p is non-negative, so % is safe without pmod."""
    return F.array(*[
        (md5_hash_mod_p(F.concat(F.lit(f"{j}|"), term_col)) % width)
        .cast("long")
        for j in range(depth)
    ])


def countmin_heavy_hitters(
    documents: DataFrame,
    min_count: int,
    depth: int = 4,
    width: int = 32768,
    ngram: int = 2,
    persist: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Terms whose count-min ESTIMATE reaches ``min_count``, with the
    exact count alongside so the sketch's one-sided error is visible.

    ``ngram`` terms are generated WITHIN the document row (transform
    over adjacent token windows — no join).  ``persist`` (default True)
    materializes the slim (term, exact_count) frame once: the sketch
    build and the candidate probe both consume it, and without the
    persist the 100 TB text side is tokenized and exploded twice.

    Output, one row per candidate: ``term``, ``exact_count``,
    ``cms_count`` (>= exact_count always; > means a grid collision).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if depth < 1 or width < 1:
        raise ValueError(
            f"depth/width must be >= 1, got {depth}/{width}")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")

    # token split materialized behind its own alias so the interpreted
    # HOF lambda doesn't re-split the text once per n-gram index (the
    # with_shingle_set CollapseProject note, operators/dedup.py)
    toked = documents.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks")
    )
    t = F.col("__toks")
    if ngram == 1:
        terms = t
    else:
        terms = F.when(
            F.size(t) >= ngram,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - ngram),
                lambda i: F.array_join(F.slice(t, i + 1, ngram), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    tc = (
        toked.select(F.explode(terms).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
    )
    if persist:
        from pyspark import StorageLevel

        tc = tc.persist(StorageLevel.MEMORY_AND_DISK)

    hashed = tc.select(
        "term", "exact_count",
        F.posexplode(_bucket_cols(F.col("term"), depth, width))
        .alias("j", "bucket"),
    )
    sketch = hashed.groupBy("j", "bucket").agg(
        F.sum("exact_count").cast("long").alias("c")
    )
    return (
        hashed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("term", "exact_count")
        .agg(F.min("c").alias("cms_count"))
        .filter(F.col("cms_count") >= min_count)
        .select("term", "exact_count", "cms_count")
    )
