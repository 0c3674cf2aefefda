"""KG-embedding training-pair generation — TransE-style corrupted
negatives over a triple graph (Bordes et al. 2013, "Translating
Embeddings for Modeling Multi-relational Data").

The last mile between a materialized KG (operators/code_kg.py, the
claims pipeline) and an embedding trainer: every positive triple
``(h, r, t)`` is paired with ``k`` corrupted negatives, each replacing
the head OR the tail with a uniformly-drawn entity — the contrastive
corpus TransE/DistMult/RotatE-family trainers consume.  The walk-based
twin is operators/skipgram.py (sequence corpora); this module is the
relational form, and it reuses skip-gram's machinery: the dense
entity index is :func:`~claimskg_generator_spark.operators.skipgram.
ranked_vocab`'s two-phase bucket/prefix-sum order (no global sort) and
every "random" draw is a pure md5 function of the (triple, slot)
identity — retry-stable, partition-layout-proof, and bit-replayable by
the DuckDB value oracle (driver q154).

The reference repo has no analog (its reconciler scores string
similarity, not embeddings over the emitted graph); this operator is
part of the LLM-training-data family the engine adds beyond reference
parity.

Scale shape: one distinct over subj ∪ obj for the entity set (the one
corpus-wide shuffle), slot fan-out in-row (``explode(sequence(...))``),
the entity lookup as a plain equi-join on the dense index, and the
``filtered`` protocol's known-true-triple removal as ONE left-anti
join on ``(subj, pred, obj)`` — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.skipgram import (
    _md5_60bit,
    ranked_vocab,
)

__all__ = ["entity_index", "kg_train_pairs"]


def entity_index(edges: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """Dense ``1..E`` index over an edge frame's entity set
    (``subj`` ∪ ``obj``), in ranked_vocab's engine-stable
    ``(md5-bucket, entity)`` total order: ``(token, idx)`` rows.

    Pass the SAME frame you corrupt over — literal-object rows should
    be filtered out by the caller first (``okind == 'uri'`` on a
    4-column triple table), so literals never enter the entity set.
    """
    ents = edges.select(F.col("subj").alias("token")).unionAll(
        edges.select(F.col("obj").alias("token")))
    return ranked_vocab(ents, token_col="token", n_buckets=n_buckets)


def kg_train_pairs(edges: DataFrame, k: int = 2, seed: str = "transe",
                   filtered: bool = False,
                   n_buckets: int = 1024) -> DataFrame:
    """``k`` corrupted negatives per positive triple: one output row
    per ``(triple, slot)`` with columns ``(subj, pred, obj, slot,
    side, neg_subj, neg_obj)`` — ``side`` names the corrupted end
    (``'head'`` replaces ``subj``, ``'tail'`` replaces ``obj``), and
    ``(neg_subj, pred, neg_obj)`` is the corrupted triple.

    Determinism contract: the corrupted side is
    ``md5(seed:side:h:r:t:slot) mod 2`` and the replacement entity is
    ``md5(seed:ent:h:r:t:slot) mod E`` over the dense entity index —
    both pure functions of the triple identity, so the corpus is
    identical under retries, AQE re-plans, and cross-engine replay.
    The uniform draw MAY pick the entity it replaces; the resulting
    self-collision is a true triple, which is exactly what the
    ``filtered`` protocol (Bordes et al. §4, "filt.") removes: with
    ``filtered=True`` every corrupted triple present in ``edges`` is
    DROPPED (the drop variant — no iterative resampling, so output
    size per positive is ``<= k``, not exactly ``k``; resampling
    until clean is a driver-side loop this engine deliberately avoids).

    ``edges`` is a ``(subj, pred, obj)`` frame of entity-entity
    triples; filter literal objects out first (see
    :func:`entity_index`).  Duplicate input triples produce duplicate
    (identical) output rows — dedup upstream if the graph is a bag.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ents = entity_index(edges, n_buckets=n_buckets)
    # EMPTY-GRAPH CAVEAT (ADVICE r5): an empty edge frame yields an
    # empty corpus, silently — max(idx) is NULL but both the plan-time
    # optimizer (PropagateEmptyRelation) and AQE's runtime empty-relation
    # propagation collapse the downstream joins before any expression
    # could raise (verified: a raise_error wrapped around this max never
    # fires for either a literal-empty or a runtime-empty input).  A
    # loud guard would need a driver-side count() on the hot path;
    # callers that cannot tolerate empty-in/empty-out should assert
    # non-emptiness themselves before calling.
    e_total = ents.agg(F.max("idx").alias("__E"))
    pos = edges.select("subj", "pred", "obj")
    slots = pos.crossJoin(F.broadcast(e_total)).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"),
    )
    ident = F.concat_ws(
        ":", F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("slot").cast("string"))
    side_bit = _md5_60bit(
        F.concat_ws(":", F.lit(seed), F.lit("side"), ident)) % 2
    pick = _md5_60bit(
        F.concat_ws(":", F.lit(seed), F.lit("ent"), ident)
    ) % F.col("__E") + 1
    picked = slots.withColumn("__side", side_bit).withColumn(
        "__pick", pick)
    vneg = ents.select(F.col("idx").alias("__idx"),
                       F.col("token").alias("__neg"))
    out = (
        picked.join(vneg, picked["__pick"] == F.col("__idx"))
        .select(
            "subj", "pred", "obj", "slot",
            F.when(F.col("__side") == 0, F.lit("head"))
             .otherwise(F.lit("tail")).alias("side"),
            F.when(F.col("__side") == 0, F.col("__neg"))
             .otherwise(F.col("subj")).alias("neg_subj"),
            F.when(F.col("__side") == 0, F.col("obj"))
             .otherwise(F.col("__neg")).alias("neg_obj"),
        )
    )
    if filtered:
        truth = pos.select(F.col("subj").alias("neg_subj"),
                           F.col("pred").alias("pred"),
                           F.col("obj").alias("neg_obj")).distinct()
        out = out.join(truth, ["neg_subj", "pred", "neg_obj"],
                       "left_anti").select(
            "subj", "pred", "obj", "slot", "side",
            "neg_subj", "neg_obj")   # join keys move first — restore
    return out
