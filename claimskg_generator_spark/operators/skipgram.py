"""Skip-gram training-pair generation with deterministic negative
sampling — the step that turns a token corpus (documents, or the
q128/q146 walk sentences) into (center, context, negatives) examples
for word2vec/node2vec-style embedding training.

Three composable stages, all engine-replayable:

* :func:`skipgram_pairs` — (center, context) pairs within a ±window,
  generated INSIDE the sentence row (nested array transform + one
  explode): zero shuffle, position columns kept so every pair is
  independently addressable.
* :func:`ranked_vocab` — a dense 1..V index over the vocabulary
  WITHOUT a global sort: tokens hash into ``n_buckets`` md5 buckets,
  rank within their bucket (parallel window), and add the bucket's
  cumulative offset (an ``n_buckets``-row prefix sum broadcast back) —
  the packing.py two-phase prefix-sum pattern applied to vocabulary
  indexing.  The resulting total order is (bucket, token), which any
  engine replays as ``row_number() OVER (ORDER BY bucket, token)``.
  With ``key_col`` set it ranks every ROW (e.g. token occurrences)
  instead of the deduped vocabulary.
* :func:`negative_samples` — k negatives per pair, picked by
  ``md5(seed:pair-identity:slot) mod V`` against the indexed
  vocabulary: an equi-join on the index, never a random() call, so
  retries/engines agree bit-for-bit.  ``weighted=True`` indexes token
  OCCURRENCES instead of distinct tokens, making the uniform pick over
  occurrence indices an EXACT unigram-frequency-weighted pick over
  tokens — integer arithmetic standing in for word2vec's unigram
  distribution (its ^0.75 damping needs float cumulative weights and a
  cross-engine summation contract; documented, not silently
  approximated).  Picks may collide with the pair's true context —
  the word2vec convention (collisions are rare and harmless).

Scale shape: pair generation is a narrow per-row transform; vocabulary
indexing shuffles once on the token (bounded by vocabulary size, or
corpus size when ``weighted``); negative sampling is one equi-join of
the exploded (pair, slot) frame against the index — at 10^12 tokens
the vocab dim stays joinable (broadcast when small, hash-partitioned
otherwise) and nothing ever sorts globally.
"""

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_60bit(col) -> F.Column:
    """The engine's 60-bit positive md5 slice (q128's discipline —
    nonnegative, so % agrees with every engine's mod)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def skipgram_pairs(sentences: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", window: int = 2,
                   lowercase: bool = True) -> DataFrame:
    """(center, context) pairs within ``±window`` token positions,
    built in-row: ``(id, i, j, center, context)`` with 1-based
    positions, one output row per ordered pair (both directions, the
    skip-gram convention)."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    text = F.trim(F.col(text_col))
    if lowercase:
        text = F.lower(text)
    toks = F.split(text, r"\s+")
    n = F.size(toks)
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.filter(
            F.transform(
                F.sequence(
                    F.greatest(F.lit(1), i - window),
                    F.least(n, i + window)),
                lambda j: F.struct(
                    i.alias("i"), j.alias("j"),
                    F.get(toks, i - 1).alias("center"),
                    F.get(toks, j - 1).alias("context"))),
            lambda s: s["j"] != i),
    ))
    return (
        sentences.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.i", "p.j", "p.center", "p.context")
    )


def ranked_vocab(df: DataFrame, token_col: str = "token",
                 key_col: Optional[str] = None,
                 n_buckets: int = 1024) -> DataFrame:
    """Dense 1..V index over ``df``'s tokens without a global sort.

    ``key_col=None``: dedup tokens and index the vocabulary (key =
    token).  ``key_col`` set: index every row by that key (occurrence
    indexing for frequency-weighted sampling); keys must be unique.
    Returns ``(token, idx)`` ordered by ``(md5-bucket(key), key)``.
    """
    from pyspark.sql import Window

    if key_col is None:
        base = df.select(F.col(token_col).alias("token")).distinct()
        key = F.col("token")
    else:
        base = df.select(F.col(token_col).alias("token"),
                         F.col(key_col).alias("__key"))
        key = F.col("__key")
    bucketed = base.withColumn("__b", _md5_60bit(key) % n_buckets)
    rk = F.row_number().over(Window.partitionBy("__b").orderBy(key))
    counts = bucketed.groupBy("__b").agg(F.count("*").alias("__n"))
    offsets = counts.select(
        "__b",
        (F.sum("__n").over(
            Window.orderBy("__b").rowsBetween(
                Window.unboundedPreceding, -1))).alias("__off"),
    ).fillna({"__off": 0})
    return (
        bucketed.withColumn("__rk", rk)
        .join(F.broadcast(offsets), "__b")
        .select("token", (F.col("__off") + F.col("__rk")).alias("idx"))
    )


def cooccurrence_counts(pairs: DataFrame, window: Optional[int] = None,
                        ) -> DataFrame:
    """GloVe-style co-occurrence matrix from a pair frame: one
    combinable ``groupBy(center, context)`` over the skip-gram pairs —
    the X matrix an embedding trainer factorizes.

    With ``window`` set, GloVe's distance damping (each co-occurrence
    counts 1/d) is carried EXACTLY as integers: every pair contributes
    ``lcm(1..window) / d`` to ``weight_num``, so the damped weight is
    ``weight_num / lcm(1..window)`` with no float accumulation — the
    integer-weights-for-rational-bias discipline of
    :func:`~claimskg_generator_spark.operators.components.
    biased_random_walks`, applied to counting.  Pairs farther apart
    than ``window`` are FILTERED OUT (pass the window the pairs were
    built with to keep every pair): lcm/d is only exact inside the
    window, and silently truncating an out-of-window weight would
    corrupt the matrix.  Without ``window`` only the raw ``n`` is
    emitted over all pairs.

    Scale shape: ONE map-side-combinable aggregate whose key space is
    the distinct pair vocabulary (vastly smaller than the pair stream
    at corpus scale) — partial sums fold before the single exchange.
    """
    g = pairs.groupBy("center", "context")
    if window is None:
        return g.agg(F.count("*").alias("n"))
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    import math

    lcm = 1
    for d in range(2, window + 1):
        lcm = math.lcm(lcm, d)
    d = F.abs(F.col("i") - F.col("j"))
    w = F.lit(lcm) / d
    return (
        pairs.where(d <= window)
        .withColumn("__w", w.cast("long"))
        .groupBy("center", "context")
        .agg(F.count("*").alias("n"),
             F.sum("__w").alias("weight_num"))
        .withColumn("weight_den", F.lit(lcm))
    )


def negative_samples(pairs: DataFrame, corpus_tokens: DataFrame,
                     k: int = 2, seed: str = "neg",
                     id_cols: Sequence[str] = ("doc_id", "i", "j"),
                     weighted: bool = False,
                     n_buckets: int = 1024) -> DataFrame:
    """Attach ``k`` deterministic negatives per pair: one output row
    per (pair, slot) with the sampled ``negative`` token.

    ``corpus_tokens`` carries the sampling frame: a ``token`` column,
    plus (when ``weighted``) an ``okey`` column uniquely keying each
    occurrence.  Uniform mode indexes the distinct vocabulary;
    weighted mode indexes occurrences, so the uniform index pick IS
    the exact unigram-frequency pick."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vocab = ranked_vocab(
        corpus_tokens, token_col="token",
        key_col="okey" if weighted else None, n_buckets=n_buckets)
    v_total = vocab.agg(F.max("idx").alias("__V"))
    slots = pairs.crossJoin(F.broadcast(v_total)).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    )
    h = _md5_60bit(F.concat_ws(
        ":", F.lit(seed),
        *[F.col(c).cast("string") for c in id_cols],
        F.col("slot").cast("string")))
    picked = slots.withColumn("__pick", h % F.col("__V") + 1)
    vneg = vocab.withColumnRenamed("token", "negative")
    return (
        picked.join(vneg, picked["__pick"] == vneg["idx"])
        .drop("idx", "__pick", "__V")
    )
