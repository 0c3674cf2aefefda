"""Term-relevance scoring over a document corpus: tf-idf and Okapi BM25,
with per-document top-k term extraction.

Classic search/corpus-analytics shape, expressed in the distributed
plan Catalyst wants:

* explode tokens -> ONE groupBy (doc_id, term) producing term frequency
  AND document length in the same pass (map-side combinable);
* document frequency is a second aggregate OF THAT frame (already
  partitioned by (doc_id, term) — the term-only regroup is the one
  unavoidable re-shuffle of a slim (term, df) frame);
* corpus-level scalars (N, avgdl) ride a one-row broadcast cross join,
  never a driver collect;
* top-k per doc is a row_number window on doc_id with a deterministic
  (score desc, term asc) tie-break.

Every arithmetic step is a plain column expression (codegen), and the
formulas avoid engine-specific functions so a DuckDB oracle re-derives
scores to the rounded digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_freqs(documents: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def top_terms(
    documents: DataFrame,
    k: int = 3,
    method: str = "tfidf",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` terms per document by ``method`` ('tfidf' or 'bm25').

    tf-idf: score = tf * ln((N + 1) / (df + 1)) (smoothed idf, never
    negative for df <= N).  BM25: the Okapi formula with the same
    smoothed idf and document-length normalization against the corpus
    mean.  Scores are rounded to 4 digits; ties break on term order so
    the result is deterministic.

    Output: (doc_id, term, tf, score, rank), rank in [1, k].
    """
    if method not in ("tfidf", "bm25"):
        raise ValueError(f"unknown method {method!r}")
    if k <= 0:
        raise ValueError("k must be positive")
    tf = _term_freqs(documents)
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus scalars as a one-row broadcast (no driver action)
    n_docs = documents.select(
        F.count("*").alias("n_docs"),
        (F.sum(F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")))
         / F.count("*")).alias("avgdl"),
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    scored = (
        tf.join(df_tbl, "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(n_docs))
    )
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
    if method == "tfidf":
        score = F.col("tf") * idf
    else:
        tf_d = F.col("tf").cast("double")
        norm = tf_d + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        score = idf * (tf_d * (k1 + 1)) / norm
    # Rank on the ROUNDED score: raw ln() doubles can differ between
    # engines in the last ulp, so ranking on them would make the oracle's
    # row_number flip on near-ties; the 4-digit score + term-order
    # tie-break is deterministic on both sides.
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("score", F.round(score, 4))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score", "rank")
    )
