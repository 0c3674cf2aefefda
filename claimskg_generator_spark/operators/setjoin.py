"""Exact set-similarity self-join with prefix filtering (PPJoin-lite).

The near-dup family in operators/dedup.py is PROBABILISTIC (MinHash /
SimHash banding trades recall for scale) or shingle-based (n-gram
Jaccard over text windows).  This operator is the EXACT token-set
join from the set-similarity-join literature (Chaudhuri et al.
SSJoin, ICDE 2006; Xiao et al. PPJoin, WWW 2008): every pair of
documents whose token-set Jaccard meets the threshold, no false
negatives, using prefix filtering to avoid the quadratic candidate
space.

Prefix filter: order each set by GLOBAL token rarity (document
frequency ascending — rare tokens are the most selective), keep each
set's first  p = |s| − ceil(t·|s|) + 1  tokens.  Any pair with
J(a, b) ≥ t must share at least one PREFIX token of both sides (if
the two prefixes were disjoint, even a best-case alignment of the
remaining tokens caps the overlap below the threshold), so generating
candidates only from prefix-token collisions is lossless.  A length
filter (t·|a| ≤ |b|) prunes further before verification.

Scale posture (100 TB corpus): the candidate generator is an
equi-self-join on PREFIX tokens only — rare tokens by construction,
so the per-token fan-out is naturally the smallest the corpus allows
(the inverse of the hot-shingle problem); the df attach is one
(token) join + one per-doc regroup; verification re-attaches the
sorted token arrays to CANDIDATES only and intersects within the row
(the reconcile "arrays re-attach post-prune" pattern).  A pathological
hot prefix token is AQE skew-join territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_similarity_join(
    documents: DataFrame,
    threshold: float = 0.8,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All unordered document pairs whose distinct-token-set Jaccard is
    ≥ ``threshold`` — exact (prefix filtering is lossless), one row per
    pair: (id_a, id_b, jaccard rounded 6), id_a < id_b.

    Tokenization matches the rest of the corpus operators
    (split(trim(lower(text)), '\\s+')).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sets = documents.select(
        F.col(doc_col).alias("id"),
        F.array_distinct(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("toks"),
    ).withColumn("n", F.size("toks"))
    tok = sets.select("id", "n", F.explode("toks").alias("t"))
    df_counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # rarity-ordered set + prefix, rebuilt per doc in ONE regroup; the
    # global (df, token) order is what makes the prefix guarantee hold
    # across documents
    ordered = (
        tok.join(df_counts, "t")
        .groupBy("id", "n")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("t")))
                ),
                lambda s: s["t"],
            ).alias("toks")
        )
        .withColumn(
            "plen",
            F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1,
        )
        .withColumn("prefix", F.slice("toks", 1, F.col("plen")))
    )
    pa = ordered.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"),
        F.explode("prefix").alias("t"),
    )
    pb = ordered.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"),
        F.explode("prefix").alias("t"),
    )
    cand = (
        pa.join(pb, "t")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces t*|a| <= |b| and t*|b| <= |a|
            & (F.lit(threshold) * F.col("na") <= F.col("nb"))
            & (F.lit(threshold) * F.col("nb") <= F.col("na"))
        )
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    sa = sets.select(F.col("id").alias("id_a"),
                     F.col("toks").alias("ta"), F.col("n").alias("na"))
    sb = sets.select(F.col("id").alias("id_b"),
                     F.col("toks").alias("tb"), F.col("n").alias("nb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    jacc = inter / (F.col("na") + F.col("nb") - inter)
    return (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("j", jacc)
        .filter(F.col("j") >= threshold)
        .select("id_a", "id_b", F.round("j", 6).alias("jaccard"))
    )
