"""Salted two-phase per-key top-k and the inverted-index builder on it.

``row_number().over(Window.partitionBy(key))`` is the textbook per-key
top-k, and it is also the textbook skew trap: ONE task sorts every row
of a hot key, so a stopword term with 10^9 postings (or a viral user,
or a template document's shingle) stalls the stage no matter how many
executors exist.  The scale-correct shape is the same trick as salted
canonicalization (operators/canonicalize.py): split each key into S
deterministic salt shards, take a per-shard top-k (each shard's window
sorts ~1/S of the key's rows), then take the final top-k over the at
most k·S survivors per key.  Phase 2's worst key holds k·S rows — a
constant — so no task ever depends on the key's cardinality.  The
result is EXACT (the true top-k of a key is a subset of its per-shard
top-ks) and deterministic given a total order.

``build_inverted_index`` uses it for the classic corpus artifact: the
term → top-documents posting table (df + capped postings) a retrieval
or corpus-analysis stage materializes.  The cap is a disclosed knob,
not a silent truncation: ``df`` still counts every document.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    key: Sequence[str],
    order: Sequence[Tuple[Column, bool]],
    k: int,
    salt_col: Column,
    n_salts: int = 16,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-``k`` rows per ``key`` under ``order`` ((column,
    ascending) pairs — include a unique tie-break column to make ranks
    deterministic), computed in two salted window phases so a hot key
    never sorts in a single task.

    ``salt_col`` must be a deterministic function of the ROW (e.g. a
    hash of the row's id) — a random salt would break retry stability.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    key = list(key)
    ordering = [
        c.asc() if asc else c.desc() for c, asc in order
    ]
    salted = df.withColumn(
        "__tk_salt", F.pmod(salt_col.cast("long"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*key, "__tk_salt").orderBy(*ordering)
    survivors = (
        salted.withColumn("__tk_r1", F.row_number().over(w1))
        .filter(F.col("__tk_r1") <= k)
        .drop("__tk_salt", "__tk_r1")
    )
    w2 = Window.partitionBy(*key).orderBy(*ordering)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )


def build_inverted_index(
    documents: DataFrame,
    max_postings: int = 20,
    n_salts: int = 16,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term → capped posting list: for every corpus term, its document
    frequency and the ``max_postings`` highest-tf documents (ties to the
    smaller doc id).

    Tokenization matches the rest of the corpus operators
    (split(trim(lower(text)), '\\s+'), operators/relevance.py).  One
    explode pass → map-side-combinable (term, doc) tf counts; ``df``
    is a slim regroup of that frame joined back (both sides already
    partitioned by term); the posting cap runs through the salted
    two-phase ``topk_per_key`` so stopword-grade hot terms never sort
    in one task.

    Output, one row per kept posting: ``term``, ``df`` (UNCAPPED
    document frequency), ``doc_id``, ``tf``, ``rnk`` (1-based posting
    rank).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tf = (
        documents.select(F.col(doc_col), F.explode(toks).alias("term"))
        .groupBy("term", doc_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = topk_per_key(
        tf,
        key=["term"],
        order=[(F.col("tf"), False), (F.col(doc_col), True)],
        k=max_postings,
        salt_col=F.crc32(F.col(doc_col).cast("string")),
        n_salts=n_salts,
    )
    return top.join(df_counts, "term").select(
        "term", "df", doc_col, "tf", "rnk"
    )
