"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: synthesize the claim-review corpus (sized
                     off sf0.001/documents), run the full KG-construction
                     pipeline, return the normalized-rating distribution
                     over the emitted triples.
``queries()``      — one callable per implemented operator (SURVEY.md §2 +
                     the training-data-pipeline ops); each takes
                     (spark, sf_dir) and returns a DataFrame.
``oracle_sql()``   — DuckDB-equivalent ANSI SQL for every SQL-expressible
                     query (same column names/order, aggregates aliased
                     identically).  UDF-bound / pipeline-level ops are
                     rows-only by design and have no entry here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

LANGID_PROBES_SQL = "['the','a','of','and','to','in','is','it']"


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _claims_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic claim corpus sized off the documents table."""
    from claimskg_generator_spark.sources.synth import synthesize_corpus

    n_docs = spark.read.parquet(_t(sf_dir, "documents")).count()
    return synthesize_corpus(spark, max(200, n_docs), seed=42)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: KG pipeline -> normalized
    rating distribution by rating class over emitted triples."""
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    sf_dir = "/root/testdata/sf0.001"
    corpus = _claims_corpus(spark, sf_dir)
    triples = ClaimsKGPipeline(spark).run(corpus)
    return (
        triples.filter(
            (F.col("pred") == "http://schema.org/reviewRating")
            & F.col("obj").contains("/rating/normalized/")
        )
        .groupBy(F.regexp_extract("obj", r"claimskg_(\w+)$", 1).alias("rating"))
        .agg(F.count("*").alias("n_claims"))
        .orderBy("rating")
    )


# ---------------------------------------------------------------------------
# SQL-checked queries
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    l = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        l.filter(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q02_revenue_by_nation(spark, sf_dir):
    c = spark.read.parquet(_t(sf_dir, "customer"))
    o = spark.read.parquet(_t(sf_dir, "orders"))
    n = spark.read.parquet(_t(sf_dir, "nation"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q03_rating_normalize(spark, sf_dir):
    """J1 analog: broadcast exact-match dimension lookup, miss -> OTHER."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    dim = spark.createDataFrame(
        [("1-URGENT", "CRITICAL"), ("2-HIGH", "HIGH"),
         ("3-MEDIUM", "MEDIUM"), ("5-LOW", "LOW")],
        "prio string, cls string",
    )
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.prio, "left")
        .groupBy(F.coalesce("cls", F.lit("OTHER")).alias("norm_class"))
        .agg(F.count("*").alias("n"))
    )


def q04_stats_rollup(spark, sf_dir):
    """A1 analog: per-source + global statistics in one rollup pass."""
    d = spark.read.parquet(_t(sf_dir, "documents"))
    return (
        d.rollup("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .select(F.coalesce("source", F.lit("ALL")).alias("source_grp"),
                "n_docs", "total_chars", "avg_chars")
    )


def q05_triple_dedup(spark, sf_dir):
    """A3 analog: triple emission + set-semantics distinct (the union
    deliberately duplicates the status family)."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    status = o.select(
        F.concat(F.lit("order/"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("hasStatus").alias("pred"),
        F.col("o_orderstatus").alias("obj"),
    )
    prio = o.select(
        F.concat(F.lit("order/"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("hasPriority").alias("pred"),
        F.col("o_orderpriority").alias("obj"),
    )
    triples = status.unionAll(prio).unionAll(status).dropDuplicates()
    return triples.groupBy("pred").agg(F.count("*").alias("n_triples"))


def q06_dup_title_align(spark, sf_dir):
    """J6 analog: equi-self-join on a normalized text prefix key with
    id_a < id_b pair orientation."""
    d = spark.read.parquet(_t(sf_dir, "documents"))
    key = F.md5(F.substring(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 1, 20))
    s = d.select(key.alias("k"), F.col("doc_id"))
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )


def q07_blocked_pairs(spark, sf_dir):
    """J7 analog: blocked self-join (same customer) with a +/-1-day date
    window pushed into the join condition."""
    o = spark.read.parquet(_t(sf_dir, "orders")).select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 1),
    )
    return pairs.groupBy(F.col("a.o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_pairs")
    )


def q08_exact_dedup(spark, sf_dir):
    from claimskg_generator_spark.operators.dedup import exact_duplicates

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return exact_duplicates(d).select("doc_id", "survivor_id", "is_duplicate")


def q09_token_stats(spark, sf_dir):
    from claimskg_generator_spark.operators.textstats import with_token_stats

    return with_token_stats(spark.read.parquet(_t(sf_dir, "documents")))


def q10_langid(spark, sf_dir):
    from claimskg_generator_spark.operators.textstats import with_langid

    return with_langid(spark.read.parquet(_t(sf_dir, "documents")))


def q11_cosine_topk(spark, sf_dir):
    from claimskg_generator_spark.operators.similarity import cosine_topk

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return cosine_topk(e, [0, 1, 2, 3, 4], k=5)


def q12_ngram_jaccard(spark, sf_dir):
    from claimskg_generator_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return ngram_jaccard_pairs(d, n=3, threshold=0.1, max_df=100000)


def q13_sessionize(spark, sf_dir):
    e = spark.read.parquet(_t(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("ns", new_session)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def q14_props_extract(spark, sf_dir):
    e = spark.read.parquet(_t(sf_dir, "events"))
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).try_cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.count("*").alias("n"))
    )


def q15_frame_sample(spark, sf_dir):
    from claimskg_generator_spark.operators.multimodal import (
        frame_sample_plan,
        synthesize_media,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    frames = frame_sample_plan(synthesize_media(d), every_ms=1000)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("media_id").alias("n_media"),
    )


def q16_quality_score(spark, sf_dir):
    from claimskg_generator_spark.operators.textstats import with_quality_score

    return with_quality_score(spark.read.parquet(_t(sf_dir, "documents")))


# ---------------------------------------------------------------------------
# rows-only queries (not ANSI-SQL-expressible: pandas-UDF minting, LSH
# signatures, the full KG pipeline)
# ---------------------------------------------------------------------------

def q17_minhash_lsh(spark, sf_dir):
    from claimskg_generator_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return minhash_lsh_pairs(d, n=3, num_hashes=32, bands=8,
                             verify_threshold=0.1, max_df=100000)


def q18_simhash(spark, sf_dir):
    from claimskg_generator_spark.operators.dedup import simhash_near_dups

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return simhash_near_dups(d, max_hamming=3)


LSH_PLANES = 4
LSH_THRESHOLD = 0.25
LSH_SEED = 11
EMB_DIM = 64


def q19_lsh_cosine(spark, sf_dir):
    from claimskg_generator_spark.operators.similarity import lsh_cosine_pairs

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return lsh_cosine_pairs(e, n_planes=LSH_PLANES, threshold=LSH_THRESHOLD,
                            seed=LSH_SEED, dim=EMB_DIM)


def _q19_oracle_sql() -> str:
    """DuckDB twin of lsh_cosine_pairs: the hyperplanes are a pure function
    of (seed, dim) via random.Random(seed).gauss, so the oracle embeds the
    SAME plane coefficients as SQL literals and reproduces bucket + verify
    relationally."""
    import random

    rng = random.Random(LSH_SEED)
    cases = []
    for _ in range(LSH_PLANES):
        plane = [rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)]
        lit = "[" + ",".join(repr(x) for x in plane) + "]"
        cases.append(
            "(CASE WHEN list_dot_product(embedding::DOUBLE[], "
            f"{lit}) >= 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(cases)
    return f"""
        WITH bk AS (SELECT vec_id, embedding, {bucket} AS bucket
                    FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 4) AS cosine
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 4) >= {LSH_THRESHOLD}
    """


def q20_uuid5_mint(spark, sf_dir):
    from claimskg_generator_spark.functions.uuid5 import uuid5_url_col

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return d.select("doc_id", uuid5_url_col(F.col("text")).alias("doc_uuid"))


def q21_claims_triples(spark, sf_dir):
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = _claims_corpus(spark, sf_dir)
    triples = ClaimsKGPipeline(spark).run(corpus)
    return triples.groupBy("pred", "okind").agg(F.count("*").alias("n"))


def q23_claims_reconcile(spark, sf_dir):
    """J7/J8: blocked similarity self-join over the synthesized corpus."""
    from claimskg_generator_spark.operators.reconcile import reconcile_pairs
    from claimskg_generator_spark.operators.views import logical_views
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = _claims_corpus(spark, sf_dir)
    pipe = ClaimsKGPipeline(spark)
    views = logical_views(pipe.claims(corpus), pipe.config.model_uri, 0.3)
    return reconcile_pairs(views, theta=0.25).select(
        "cw_a", "cw_b", F.round("score", 6).alias("score")
    )


def q24_claims_stats(spark, sf_dir):
    """A1: per-source + global statistics rollup over the synthesized
    corpus."""
    from claimskg_generator_spark.operators.stats import statistics_table
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = _claims_corpus(spark, sf_dir)
    pipe = ClaimsKGPipeline(spark)
    return statistics_table(
        pipe.claims(corpus), pipe.config.model_uri, pipe.matchers, 0.3
    )


def q22_multimodal_features(spark, sf_dir):
    from claimskg_generator_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return extract_features(synthesize_media(d), fake=True).select(
        "media_id", "kind", "payload_sha256", "n_bytes"
    )


def q25_salted_canonicalize(spark, sf_dir):
    """A5: salted two-phase canonicalization aggregate (result identical to
    a plain GROUP BY — the salt only reshapes the shuffle)."""
    from claimskg_generator_spark.operators.canonicalize import (
        salted_surface_counts,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    tokens = d.select(
        "doc_id", "source",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("surface"),
    )
    return salted_surface_counts(tokens, "surface", "source",
                                 F.col("doc_id"), salt=16)


def q26_claims_canonicalize(spark, sf_dir):
    """A5 over the claim corpus mention surface forms (rows-only)."""
    from claimskg_generator_spark.operators.canonicalize import (
        canonicalize_claim_mentions,
    )
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = _claims_corpus(spark, sf_dir)
    pipe = ClaimsKGPipeline(spark)
    return canonicalize_claim_mentions(pipe.claims(corpus), 0.3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_revenue_by_nation": q02_revenue_by_nation,
        "q03_rating_normalize": q03_rating_normalize,
        "q04_stats_rollup": q04_stats_rollup,
        "q05_triple_dedup": q05_triple_dedup,
        "q06_dup_title_align": q06_dup_title_align,
        "q07_blocked_pairs": q07_blocked_pairs,
        "q08_exact_dedup": q08_exact_dedup,
        "q09_token_stats": q09_token_stats,
        "q10_langid": q10_langid,
        "q11_cosine_topk": q11_cosine_topk,
        "q12_ngram_jaccard": q12_ngram_jaccard,
        "q13_sessionize": q13_sessionize,
        "q14_props_extract": q14_props_extract,
        "q15_frame_sample": q15_frame_sample,
        "q16_quality_score": q16_quality_score,
        "q17_minhash_lsh": q17_minhash_lsh,
        "q18_simhash": q18_simhash,
        "q19_lsh_cosine": q19_lsh_cosine,
        "q20_uuid5_mint": q20_uuid5_mint,
        "q21_claims_triples": q21_claims_triples,
        "q22_multimodal_features": q22_multimodal_features,
        "q23_claims_reconcile": q23_claims_reconcile,
        "q24_claims_stats": q24_claims_stats,
        "q25_salted_canonicalize": q25_salted_canonicalize,
        "q26_claims_canonicalize": q26_claims_canonicalize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q19_lsh_cosine": _q19_oracle_sql(),
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q03_rating_normalize": """
            WITH dim(prio, cls) AS (VALUES
                ('1-URGENT', 'CRITICAL'), ('2-HIGH', 'HIGH'),
                ('3-MEDIUM', 'MEDIUM'), ('5-LOW', 'LOW'))
            SELECT coalesce(cls, 'OTHER') AS norm_class, count(*) AS n
            FROM orders LEFT JOIN dim ON o_orderpriority = prio
            GROUP BY 1
        """,
        "q04_stats_rollup": """
            SELECT coalesce(source, 'ALL') AS source_grp,
                   count(*) AS n_docs,
                   sum(n_chars)::BIGINT AS total_chars,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents
            GROUP BY ROLLUP(source)
        """,
        "q05_triple_dedup": """
            WITH triples AS (
                SELECT DISTINCT * FROM (
                    SELECT 'order/' || o_orderkey AS subj, 'hasStatus' AS pred,
                           o_orderstatus AS obj FROM orders
                    UNION ALL
                    SELECT 'order/' || o_orderkey, 'hasPriority', o_orderpriority
                    FROM orders
                    UNION ALL
                    SELECT 'order/' || o_orderkey, 'hasStatus', o_orderstatus
                    FROM orders))
            SELECT pred, count(*) AS n_triples FROM triples GROUP BY pred
        """,
        "q06_dup_title_align": """
            WITH s AS (
                SELECT md5(substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 20)) AS k,
                       doc_id
                FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM s a JOIN s b ON a.k = b.k AND a.doc_id < b.doc_id
        """,
        "q07_blocked_pairs": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_orderdate::DATE AS d FROM orders)
            SELECT a.o_custkey AS custkey, count(*) AS n_pairs
            FROM o a JOIN o b
              ON a.o_custkey = b.o_custkey
             AND a.o_orderkey < b.o_orderkey
             AND abs(date_diff('day', b.d, a.d)) <= 1
            GROUP BY 1
        """,
        "q08_exact_dedup": """
            WITH f AS (
                SELECT doc_id,
                       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
                FROM documents)
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY fp) AS survivor_id,
                   CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
                        THEN 1 ELSE 0 END AS is_duplicate
            FROM f
        """,
        "q09_token_stats": """
            WITH t AS (
                SELECT doc_id, text,
                       len(string_split_regex(trim(text), '\\s+')) AS n_tokens
                FROM documents)
            SELECT doc_id,
                   n_tokens,
                   length(text) AS n_chars_calc,
                   round(length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                         / n_tokens, 4) AS mean_token_len,
                   round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
                         / greatest(length(text), 1), 4) AS punct_ratio
            FROM t
        """,
        "q10_langid": f"""
            WITH t AS (
                SELECT doc_id, lang,
                       len(list_distinct(list_intersect(
                           string_split_regex(trim(lower(text)), '\\s+'),
                           {LANGID_PROBES_SQL}))) AS probe_hits
                FROM documents)
            SELECT doc_id, lang, probe_hits,
                   CASE WHEN probe_hits >= 2 THEN 'en' ELSE 'unknown' END AS lang_pred
            FROM t
        """,
        "q11_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
            c AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS cosine
                FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            SELECT query_id, neighbor_id, cosine, rank FROM (
                SELECT *, (ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id))::INTEGER AS rank
                FROM c)
            WHERE rank <= 5
        """,
        "q12_ngram_jaccard": """
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS toks
                FROM documents),
            sh AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           [array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)])) AS shingle
                FROM t),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                FROM sh a JOIN sh b
                  ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT id_a, id_b, common, jaccard FROM (
                SELECT id_a, id_b, common,
                       round(common::DOUBLE / (sa.n_sh + sb.n_sh - common), 4) AS jaccard
                FROM pairs
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b)
            WHERE jaccard >= 0.1
        """,
        "q13_sessionize": """
            WITH g AS (
                SELECT user_id,
                       epoch(ts) - epoch(lag(ts) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                FROM events)
            SELECT user_id,
                   sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "q14_props_extract": """
            SELECT event_type,
                   round(avg(regexp_extract(props, '"k":\\s*(\\d+)', 1)::INT), 4) AS avg_k,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "q15_frame_sample": """
            WITH media AS (
                SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
                FROM documents WHERE doc_id % 3 = 2)
            SELECT sum(duration_ms // 1000 + 1)::BIGINT AS n_frames,
                   count(DISTINCT media_id) AS n_media
            FROM media
        """,
        "q25_salted_canonicalize": """
            WITH tok AS (
                SELECT doc_id, source,
                       unnest(string_split_regex(lower(trim(text)), '\\s+')) AS surface
                FROM documents),
            per AS (
                SELECT surface, source, count(*) AS n_links
                FROM tok GROUP BY surface, source),
            ranked AS (
                SELECT surface, source, n_links,
                       sum(n_links) OVER (PARTITION BY surface)::BIGINT AS n_mentions,
                       count(*) OVER (PARTITION BY surface) AS n_entities,
                       ROW_NUMBER() OVER (PARTITION BY surface
                           ORDER BY n_links DESC, source DESC) AS rn
                FROM per)
            SELECT surface, n_mentions, n_entities,
                   source AS canonical_entity
            FROM ranked WHERE rn = 1
        """,
        "q16_quality_score": f"""
            WITH t AS (
                SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS toks
                FROM documents),
            s AS (
                SELECT doc_id,
                       len(toks) AS n_tokens,
                       len(list_filter(toks,
                           x -> list_contains({LANGID_PROBES_SQL}, lower(x))))::DOUBLE
                       / greatest(len(toks), 1) AS stop_ratio
                FROM t)
            SELECT doc_id, n_tokens,
                   round(stop_ratio, 4) AS stop_ratio,
                   round((least(n_tokens / 64.0, 1.0)
                          + least(stop_ratio * 4, 1.0)) / 2, 4) AS quality
            FROM s
        """,
    }
