"""Train/eval contamination detection (benchmark decontamination).

Before training, every serious LLM data pipeline checks whether the
training corpus contains verbatim chunks of its evaluation benchmarks
(the n-gram overlap decontamination of Brown et al. 2020 appendix C /
Dodge et al. 2021): an eval document is *contaminated* when any of its
``width``-token windows also occurs anywhere in the training split.

Scale shape (100 TB train, benchmark-sized eval):

- The eval side is tiny by construction (benchmarks are thousands of
  documents, the train side is the 100 TB one), so the eval span-key set
  is collected into a broadcast and the train side is scanned ONCE with
  a broadcast left-semi join — the train corpus never shuffles.
- The matched key set (``hits``) is at most the eval key set, so joining
  it back to the eval spans is another broadcast join.
- Net: one full train scan, zero train-side shuffles, all joins
  broadcast.  The span windows reuse the md5-of-joined-tokens encoding
  of ``operators/dedup.duplicated_spans`` so a DuckDB oracle replays
  them byte-for-byte.

Reference scope note: the reference generator (claimskg/generator) has
no decontamination stage — this operator is part of the
training-data-pipeline family layered on top of the reference's
semantics, like the rest of operators/{dedup,sampling,packing}.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _span_keys(width: int) -> Column:
    """Array of md5 keys of every ``width``-token window over the
    pre-materialized ``__ct_toks`` token array (lowercased,
    whitespace-tokenized) — the duplicated_spans encoding.  The token
    array is a real column, not re-split inside the lambda:
    CodegenFallback lambdas get no CSE (see operators/dedup._shingles).
    """
    return F.when(
        F.size("__ct_toks") >= width,
        F.expr(
            f"transform(sequence(1, size(__ct_toks) - {width - 1}),"
            f" i -> md5(array_join(slice(__ct_toks, i, {width}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_contamination(
    documents: DataFrame,
    is_eval: Column,
    width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-eval-document contamination profile against the train split.

    ``is_eval`` partitions ``documents`` into the (small) eval side and
    the (huge) train side — typically a deterministic hash gate so the
    split is reproducible (see operators/sampling.hash_gate).

    Output, one row per EVAL document: ``n_spans`` (windows in the eval
    doc), ``n_dirty_spans`` (windows also present in ANY train doc),
    ``dirty_frac``, and ``contaminated`` (0/1).  Eval docs shorter than
    ``width`` tokens have zero spans and are reported clean.
    """
    if width < 1:
        raise ValueError("width must be >= 1")
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    base = documents.select(
        F.col(id_col),
        is_eval.alias("__ct_eval"),
        toks.alias("__ct_toks"),
    ).withColumn("__ct_keys", _span_keys(width))

    spans = base.select(
        id_col, "__ct_eval", F.explode("__ct_keys").alias("k")
    )
    eval_spans = spans.filter(F.col("__ct_eval")).drop("__ct_eval")
    train_spans = spans.filter(~F.col("__ct_eval")).select("k")

    # benchmark-sized by construction -> broadcast; the 100 TB train scan
    # stays shuffle-free (broadcast left-semi), and hits <= eval keys
    eval_keys = eval_spans.select("k").distinct()
    hits = (
        train_spans.join(F.broadcast(eval_keys), "k", "left_semi")
        .distinct()
        .withColumn("__ct_hit", F.lit(1))
    )

    counts = (
        eval_spans.join(F.broadcast(hits), "k", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce("__ct_hit", F.lit(0))).alias("n_dirty_spans"),
        )
    )
    totals = base.filter(F.col("__ct_eval")).select(
        id_col, F.size("__ct_keys").alias("n_spans")
    )
    return (
        totals.join(counts.drop("n_spans"), id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_dirty_spans", F.lit(0))
            .cast("bigint")
            .alias("n_dirty_spans"),
            F.round(
                F.when(
                    F.col("n_spans") > 0,
                    F.coalesce("n_dirty_spans", F.lit(0))
                    / F.col("n_spans"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("dirty_frac"),
            (F.coalesce("n_dirty_spans", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )
