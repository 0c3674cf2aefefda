"""Deduplication operators for web-scale corpora (training-data pipeline
ops): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (100 TB posture):

- exact: one hash-groupBy; the md5 key keeps the shuffle rows tiny.
- ngram-jaccard: shingle-explode -> self-join on shingle -> per-pair
  aggregation.  The classic skew trap is hot shingles; we cap posting-list
  length (drop shingles appearing in > max_df docs — standard practice)
  which bounds the join fan-out.
- minhash-LSH: signatures via one vectorized numpy pandas UDF; band ->
  bucket groupBy; only bucket-colliding pairs are candidates (no all-pairs).
- simhash: 64-bit signature from token xxhash64s, bucketed by 16-bit
  chunks (pigeonhole: hamming<=3 over 4 chunks guarantees one equal chunk).
- embedding-cosine: see operators/similarity.py.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (whitespace-normalized, lowercased) docs:
    survivor = min doc_id per fingerprint (deterministic)."""
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        documents.select("doc_id", F.md5(norm).alias("fingerprint"))
        .withColumn("survivor_id", F.min("doc_id").over(Window.partitionBy("fingerprint")))
        .withColumn("rank_in_group", F.row_number().over(w))
        .withColumn("is_duplicate", (F.col("doc_id") != F.col("survivor_id")).cast("int"))
    )


def _shingles(col, n=3):
    """Word n-gram shingles (distinct) of lowercased text."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.5,
                        max_df: int = 1000) -> DataFrame:
    """Candidate near-dup pairs with n-gram Jaccard >= threshold.

    shingle-explode -> hot-shingle cap (max_df) -> self-join on shingle ->
    count common shingles per (a,b) -> jaccard = common/(|A|+|B|-common).
    """
    sh = (
        documents.select(
            "doc_id", F.explode(_shingles(F.col("text"), n)).alias("shingle")
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    capped = (
        sh.withColumn(
            "df", F.count("*").over(Window.partitionBy("shingle"))
        ).filter(F.col("df") <= max_df)
        .drop("df")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "id_a")
                    .withColumnRenamed("n_sh", "sh_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b")
              .withColumnRenamed("n_sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.col("sh_a") + F.col("sh_b") - F.col("common")).cast("double"), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "jaccard")
    )


_SIG_TYPE = T.ArrayType(T.LongType())


def _make_minhash_udf(num_hashes: int, seed: int = 7):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    # Universal hashing h_i(x) = (a_i*x + b_i) mod p with p = 2^31-1
    # (Mersenne).  Inputs are first reduced mod p, so a*x < 2^62 fits
    # uint64 exactly — the whole signature is one vectorized numpy
    # broadcast per document, no Python-int arithmetic.
    p = np.uint64((1 << 31) - 1)
    a = rng.randint(1, int(p), size=num_hashes).astype(np.uint64)
    b = rng.randint(0, int(p), size=num_hashes).astype(np.uint64)

    @F.pandas_udf(_SIG_TYPE)
    def minhash_sig(shingle_hashes: pd.Series) -> pd.Series:
        out = []
        for hs in shingle_hashes:
            if hs is None or len(hs) == 0:
                out.append([0] * num_hashes)
                continue
            x = np.asarray(hs, dtype=np.int64).astype(np.uint64) % p
            # (H, S) broadcast: rows = hash fns, cols = shingles
            sig = ((a[:, None] * x[None, :] + b[:, None]) % p).min(axis=1)
            out.append([int(v) for v in sig])
        return pd.Series(out)

    return minhash_sig


def minhash_lsh_pairs(documents: DataFrame, n: int = 3, num_hashes: int = 32,
                      bands: int = 8, verify_threshold: float = 0.5,
                      max_df: int = 1000) -> DataFrame:
    """MinHash+LSH near-dup candidates, verified with true n-gram Jaccard.

    shingle -> xxhash64 -> minhash signature (vectorized pandas UDF) ->
    band slices -> bucket groupBy join -> verify on candidates only.
    """
    rows_per_band = num_hashes // bands
    sh = documents.select(
        "doc_id",
        F.transform(_shingles(F.col("text"), n), lambda s: F.xxhash64(s)).alias("hs"),
    )
    sig = sh.withColumn("sig", _make_minhash_udf(num_hashes)(F.col("hs"))).select(
        "doc_id", "sig"
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", i * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates()
    )
    verified = ngram_jaccard_pairs(documents, n, verify_threshold, max_df)
    return candidates.join(verified, ["id_a", "id_b"]).select(
        "id_a", "id_b", "jaccard"
    )


def _bit_mask(i: int) -> int:
    """Two's-complement long literal for bit i (bit 63 is the sign bit)."""
    return (1 << i) if i < 63 else -(1 << 63)


def simhash_signatures(documents: DataFrame) -> DataFrame:
    """64-bit SimHash over token xxhash64s: explode tokens -> one 64-way
    majority-vote aggregate per doc (map-side partial agg keeps the shuffle
    small), plus 4x16-bit bucket keys for pigeonhole candidate generation
    (hamming<=3 over 4 chunks -> at least one equal chunk)."""
    toks = F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))
    ex = documents.select("doc_id", F.explode(toks).alias("tok")).withColumn(
        "h", F.xxhash64("tok")
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(_bit_mask(i))) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = ex.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.lit(_bit_mask(i)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    df = agg.select("doc_id", sim.alias("simhash"))
    for c in range(4):
        df = df.withColumn(
            f"chunk{c}",
            F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)),
        )
    return df


def simhash_near_dups(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidate pairs via equal 16-bit chunk, verified by true hamming
    distance (bit_count of xor)."""
    sigs = simhash_signatures(documents)
    pairs = None
    for c in range(4):
        a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("s_a"),
                        F.col(f"chunk{c}").alias("k"))
        b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("s_b"),
                        F.col(f"chunk{c}").alias("k"))
        p = a.join(b, ["k"]).filter(F.col("id_a") < F.col("id_b")).drop("k")
        pairs = p if pairs is None else pairs.unionByName(p)
    return (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
