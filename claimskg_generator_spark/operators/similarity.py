"""Similarity search over embedding columns (training-data pipeline ops):
brute-force cosine top-k baseline + an LSH-bucketed (random hyperplane)
scale path.

Scale posture: brute-force is O(Q*N) — correct baseline, fine when the
query set is small and broadcast.  The LSH variant buckets vectors by
sign-pattern of r random hyperplanes so candidate generation is a bucket
equi-join (expected N/2^r per bucket), the standard sub-linear ANN path.
"""

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast each float32 to double BEFORE multiplying — same arithmetic as a
    # DOUBLE[] oracle, and left-to-right summation matches too
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(embeddings: DataFrame, query_ids: List[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    full table; JVM-side zip_with/aggregate arithmetic (no UDF)."""
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    joined = embeddings.alias("e").join(
        F.broadcast(q), F.col(id_col) != F.col("query_id")
    )
    cos = _dot(F.col(vec_col), F.col("qv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select(
            "query_id", F.col(id_col).alias("neighbor_id"),
            F.round(cos, 4).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(embeddings: DataFrame, query_ids: List[int], k: int = 5,
             stride: int = 32, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into inverted lists, probe
    only the lists nearest each query, exact top-k within them — the
    classic sub-linear alternative to the hyperplane-LSH path.

    The coarse centroids are a DETERMINISTIC sample of the dataset itself
    (every stride-th vector id) rather than k-means output: sampled-point
    quantizers are a standard IVF variant, and determinism is what lets an
    external SQL engine reproduce the exact result (no iterative training
    state).  At 100 TB you'd swap the sample for trained centroids; the
    plan shape — broadcast centroids, one argmax assignment pass, per-query
    probe-list candidate join — is identical.

    Every distance is JVM-side (zip_with/aggregate); ties break to the
    smaller centroid/neighbor id so results are total-order deterministic.
    """
    cents = embeddings.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
    )
    cos_cent = _dot(F.col(vec_col), F.col("cv")) / (
        _norm(F.col(vec_col)) * _norm(F.col("cv"))
    )
    # assignment: nearest centroid per vector (broadcast nested loop over
    # the small centroid set, one shuffle-free argmax window)
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("c_cos").desc(), F.col("cent_id").asc()
    )
    assigned = (
        embeddings.join(F.broadcast(cents))
        .withColumn("c_cos", cos_cent)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col).alias("m_id"), F.col(vec_col).alias("mv"),
                F.col("cent_id").alias("m_cent"))
    )
    # probe lists: the n_probe nearest centroids per query
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q_cos_cent = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("qc_cos").desc(), F.col("cent_id").asc()
    )
    probes = (
        q.join(F.broadcast(cents))
        .withColumn("qc_cos", q_cos_cent)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", F.col("cent_id").alias("p_cent"))
    )
    # candidates = members of probed lists; exact cosine top-k among them
    cand = assigned.join(
        F.broadcast(probes), F.col("m_cent") == F.col("p_cent")
    ).filter(F.col("m_id") != F.col("query_id"))
    cos = _dot(F.col("mv"), F.col("qv")) / (_norm(F.col("mv")) * _norm(F.col("qv")))
    w_k = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            "query_id", F.col("m_id").alias("neighbor_id"),
            F.round(cos, 4).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
    )


def hyperplane_lsh_buckets(embeddings: DataFrame, n_planes: int = 8,
                           seed: int = 11, dim: Optional[int] = None,
                           vec_col: str = "embedding") -> DataFrame:
    """Sign-pattern bucket id per vector: bit i = (v . r_i) >= 0, random
    hyperplanes fixed by seed (deterministic, JVM-side).

    Pass ``dim`` explicitly in production plans — the fallback runs a
    driver-side ``.first()`` action while building the plan, a hidden job
    you don't want at scale."""
    import random

    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = first["d"]
    rng = random.Random(seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(x) for x in plane]),
                lambda v, p: (v * p).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i))
            .otherwise(F.lit(0).cast("long"))
        )
    return embeddings.withColumn("bucket", bucket)


def lsh_cosine_pairs(embeddings: DataFrame, n_planes: int = 8,
                     threshold: float = 0.9, seed: int = 11,
                     dim: Optional[int] = None,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs: bucket equi-join candidates, then
    exact cosine verification — the scale path for embedding dedup."""
    b = hyperplane_lsh_buckets(embeddings, n_planes, seed, dim=dim, vec_col=vec_col)
    a = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket")
    c = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket")
    pairs = a.join(c, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("v_a"), F.col("v_b")) / (_norm(F.col("v_a")) * _norm(F.col("v_b")))
    return (
        pairs.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
