"""Embedding-based concept recognition — the distributed analog of the
reference's vector concept recognizer
(claimskg/reconciler/recognizer/deep_recognizers.py:13-221,
IntersEmbeddingConceptRecognizer: index a vector per concept label,
match mentions by embedding similarity).  The reference never
constructs it (skosthesaurusmatcher.py builds only the stem-
intersection recognizer), but the capability is part of its surface,
so the engine ships the same shape Spark-first:

* concept vectors are the element-wise mean of the member vectors per
  concept (the reference uses a transformer label embedding; the
  engine takes pre-computed vectors as input — embedding PRODUCTION is
  a model-serving concern, recognition is the data-plane operator);
* every vector is matched to its best concept by cosine, and kept when
  the rounded similarity clears the threshold — exactly the
  recognizer's accept rule.

Scale shape: the centroid pass is one posexplode aggregate whose
map-side combine bounds the exchange at |concepts| x dim rows per
partition; the centroids ride a ONE-ROW broadcast array and the
assignment is a pure within-row transform + array_max (no N x C row
explosion, no Window, no UDF) — the same assignment stage the IVF
index uses (operators/similarity.py).  Ties break to the smaller
concept id on the ROUNDED cosine so the result is total-order
deterministic and a DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.similarity import _dot, _norm


def concept_centroids(vectors: DataFrame, label_col: str = "label",
                      vec_col: str = "embedding") -> DataFrame:
    """Element-wise mean vector per concept: (concept, cv) with cv
    ordered by position.  One combinable aggregate, |C| x dim rows."""
    means = (
        vectors.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(F.avg("val").alias("m"))
    )
    return (
        means.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(label_col).alias("concept"),
            F.transform("pm", lambda x: x["m"]).alias("cv"),
        )
    )


def concept_recognize(vectors: DataFrame, threshold: float = 0.0,
                      id_col: str = "vec_id", label_col: str = "label",
                      vec_col: str = "embedding") -> DataFrame:
    """Assign every vector its nearest concept centroid by cosine.

    Output: (id_col, true_label, concept, cosine) for rows whose
    rounded best cosine >= threshold.  ``true_label`` is the input
    label (so the result doubles as a recognizer-quality confusion
    frame); ``concept`` is the recognized concept.
    """
    cents = concept_centroids(vectors, label_col=label_col, vec_col=vec_col)
    # one-row broadcast array of all centroids, canonical concept order.
    # Norms are precomputed INTO the broadcast struct and the row vector's
    # norm is a named column: higher-order-function lambdas get no common-
    # subexpression elimination, so a norm inside the per-centroid lambda
    # would be re-folded |C| times per row (the repo's documented
    # no-CSE-in-lambda trap).
    cent_arr = cents.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("concept"), F.col("cv"),
                         _norm(F.col("cv")).alias("nrm"))
            )
        ).alias("cents")
    )
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(
                _dot(F.col(vec_col), c["cv"])
                / (F.col("_nv") * c["nrm"]),
                4,
            ).alias("c"),
            (-c["concept"]).alias("neg_id"),
        ),
    )
    return (
        vectors.withColumn("_nv", _norm(F.col(vec_col)))
        .join(F.broadcast(cent_arr))
        .select(
            F.col(id_col),
            F.col(label_col).alias("true_label"),
            F.array_max(scored).alias("best"),
        )
        .select(
            id_col,
            "true_label",
            (-F.col("best.neg_id")).alias("concept"),
            F.col("best.c").alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
