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

import json as _json
import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

LANGID_PROBES_SQL = "['the','a','of','and','to','in','is','it']"

_REPO_DIR = _os.path.dirname(_os.path.abspath(__file__))
# Checked-in corpus parquet: byte-identical to synthesize_corpus()'s rows
# (each row is a pure function of (seed, i); purity pinned by
# tests/test_synth_oracle.py), so DuckDB oracles can compute over the exact
# input the distributed mapInPandas source generates.
_CORPUS_PARQUET = _os.path.join(_REPO_DIR, "golden", "corpus_n500_seed42.parquet")
_GOLDEN_JSON = _os.path.join(_REPO_DIR, "golden", "driver_goldens.json")


def _goldens() -> dict:
    with open(_GOLDEN_JSON) as f:
        return _json.load(f)


def _sq(s: str) -> str:
    """SQL single-quote escape."""
    return s.replace("'", "''")


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
    """md5-hash variant: same LSH machinery as the production xxhash64 path
    but reproducible by the DuckDB oracle (dedup.py cross-engine section)."""
    from claimskg_generator_spark.operators.dedup import (
        minhash_lsh_pairs_checkable,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return minhash_lsh_pairs_checkable(d, n=3, num_hashes=32, bands=8,
                                       verify_threshold=0.1, seed=7)


def q18_simhash(spark, sf_dir):
    """md5-token-hash variant (cross-engine checkable); recall guaranteed
    for hamming<=3 by 4-chunk pigeonhole."""
    from claimskg_generator_spark.operators.dedup import (
        md5_token_hash64,
        simhash_near_dups,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return simhash_near_dups(d, max_hamming=3, token_hash=md5_token_hash64)


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
    """P16: pure-JVM uuid5 minting over the corpus content, cross-checked
    against a Python-stdlib-uuid5 golden (DuckDB has no sha1, so this is a
    golden rather than a relational oracle)."""
    from claimskg_generator_spark.functions.uuid5 import uuid5_url_col

    corpus = _claims_corpus(spark, sf_dir)
    return corpus.select(
        F.col("path").alias("ord"),
        uuid5_url_col(F.col("content")).alias("doc_uuid"),
    )


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


def q27_ivf_topk(spark, sf_dir):
    """IVF ANN (sampled coarse centroids, probe-limited exact search) —
    the second scale path for similarity search next to q19's LSH."""
    from claimskg_generator_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return ivf_topk(e, [0, 1, 2, 3, 4], k=5, stride=32, n_probe=4)


def q26_claims_canonicalize(spark, sf_dir):
    """A5 over the claim corpus mention surface forms (rows-only)."""
    from claimskg_generator_spark.operators.canonicalize import (
        canonicalize_claim_mentions,
    )
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = _claims_corpus(spark, sf_dir)
    pipe = ClaimsKGPipeline(spark)
    return canonicalize_claim_mentions(pipe.claims(corpus), 0.3)


# ---------------------------------------------------------------------------
# DuckDB oracles for the claims-pipeline queries.
#
# Two kinds:
#  * RELATIONAL (q24, q26): full re-derivation in SQL over the checked-in
#    corpus parquet — JSON mention parsing, keyword memo, citation cleaning
#    and rating normalization re-expressed with DuckDB primitives plus the
#    same broadcast dictionaries (ratings table, source homepages, keyword
#    concept spans) the engine uses as INPUT data.
#  * GOLDEN (q20, q21, q23): the expected output embedded as VALUES,
#    generated by the pure-Python reference-semantics side (oracle.py /
#    stdlib uuid5) via scripts/gen_pipeline_goldens.py — NOT by the Spark
#    engine (Spark-vs-oracle parity is separately pinned by
#    tests/test_pipeline_golden.py and tests/test_uuid5.py).
# ---------------------------------------------------------------------------

# Python-strip character set (the corpus is ASCII; DuckDB trim() alone only
# strips spaces)
_WS = "(' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))"

_MENTION_STRUCT = (
    '[{"begin":"BIGINT","end":"BIGINT","text":"VARCHAR",'
    '"entity":"VARCHAR","score":"VARCHAR","categories":["VARCHAR"]}]'
)
_EMPTY_MENTIONS = f"json_transform('[]'::JSON, '{_MENTION_STRUCT}')"


def _mp(field: str) -> str:
    """Repair + parse one mention-annotation JSON field (twin of
    functions/cleaning.process_json + sources/claims.repaired_mentions)."""
    raw = f"json_extract_string(j, '$.{field}')"
    repaired = (
        "regexp_replace(regexp_replace(regexp_replace(" + raw +
        ", '\",\"{2}', ',\"', 'g'), '\"\n\t\"', '', 'g'), "
        "'\\}\\]\\[\\]', '}]', 'g')"
    )
    return f"json_transform(TRY_CAST({repaired} AS JSON), '{_MENTION_STRUCT}')"


def _above(col: str) -> str:
    """Above-threshold mention filter (strict >, like the engine)."""
    return (f"list_filter(coalesce({col}, {_EMPTY_MENTIONS}), "
            "m -> TRY_CAST(m.score AS DOUBLE) > 0.3::DOUBLE)")


def _corpus_fields_cte() -> str:
    return f"""
        c AS (SELECT path AS ord, content::JSON AS j
              FROM read_parquet('{_CORPUS_PARQUET}')),
        f AS (SELECT ord,
              json_extract_string(j, '$.claimReview_author_name') AS source,
              coalesce(json_extract_string(j, '$.creativeWork_author_name'), '') AS author,
              coalesce(json_extract_string(j, '$.extra_title'), '') AS title,
              coalesce(json_extract_string(j, '$.extra_body'), '') AS body,
              coalesce(json_extract_string(j, '$.extra_tags'), '') AS tags,
              coalesce(json_extract_string(j, '$.extra_refered_links'), '') AS links,
              coalesce(json_extract_string(j, '$.creativeWork_datePublished'), '') AS cdate,
              coalesce(json_extract_string(j, '$.rating_alternateName'), '') AS ralt,
              {_mp('extra_entities_claimReview_claimReviewed')} AS m_review,
              {_mp('extra_entities_body')} AS m_body,
              {_mp('extra_entities_keywords')} AS m_kw
              FROM c)"""


def _ratings_dim_values() -> str:
    from claimskg_generator_spark.constants.ratings import RATING_NORMALIZATION_ROWS

    rows = ", ".join(
        f"('{_sq(src)}', '{_sq(label)}', '{_sq(name)}')"
        for src, label, name in RATING_NORMALIZATION_ROWS
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(r_source, r_label, r_name))"


def _homepage_dim_values() -> str:
    from claimskg_generator_spark.constants.sources import SOURCE_URI_DICT

    rows = ", ".join(
        f"('{_sq(k)}', '{_sq(v)}')" for k, v in SOURCE_URI_DICT.items()
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(h_source, homepage))"


def _kw_dim_values() -> str:
    def arr(spans):
        return ("CAST([" + ",".join(f"'{_sq(s)}'" for s in spans)
                + "] AS VARCHAR[])")

    rows = ", ".join(
        f"('{_sq(kw)}', {arr(th)}, {arr(un)})"
        for kw, th, un in _goldens()["kw_dim"]
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t(d_kw, th_spans, un_spans))"


def _url_regex_sql() -> str:
    from claimskg_generator_spark.functions.cleaning import IS_VALID_URL_REGEX

    return _sq(IS_VALID_URL_REGEX.pattern)


_JUNK_1 = "%20TARGET=prayer>adultery</A>%20was%20made%20public.%20</p>%0A"


_SHINGLES3_SQL = """
    (SELECT doc_id,
        CASE WHEN len(toks) >= 3 THEN
            list_distinct([array_to_string(toks[i:i+2], ' ')
                           for i in range(1, len(toks) - 1)])
        ELSE [array_to_string(toks, ' ')] END AS sset
     FROM (SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\\s+') AS toks
           FROM documents))"""

_MD5_MOD_P = ("((('0x' || substr(md5({x}), 1, 8))::BIGINT % 2147483647) * 2"
              " + ('0x' || substr(md5({x}), 9, 8))::BIGINT % 2147483647)"
              " % 2147483647")


def _q17_oracle_sql() -> str:
    """SQL twin of minhash_lsh_pairs_checkable: md5-mod-p shingle hashes,
    the same seeded universal-hash coefficients, banding, bucket self-join,
    candidates-only exact-Jaccard verify."""
    from claimskg_generator_spark.operators.dedup import minhash_coefficients

    num_hashes, bands, rpb, thr = 32, 8, 4, 0.1
    coeffs = minhash_coefficients(num_hashes, seed=7)
    mins = [
        f"list_min(list_transform(xs, x -> (x * {a} + {b}) % 2147483647))"
        for a, b in coeffs
    ]
    band_cols = ",\n            ".join(
        "array_to_string([" + ", ".join(mins[j * rpb:(j + 1) * rpb])
        + f"], ',') AS band{j}"
        for j in range(bands)
    )
    banded_union = "\n            UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, band{j} AS key FROM sig"
        for j in range(bands)
    )
    return f"""
        WITH sh AS {_SHINGLES3_SQL},
        xs AS (SELECT doc_id,
                      list_transform(sset, s -> {_MD5_MOD_P.format(x='s')})
                      AS xs
               FROM sh),
        sig AS (SELECT doc_id,
            {band_cols}
            FROM xs),
        banded AS ({banded_union}),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM banded a JOIN banded b
                   ON a.band = b.band AND a.key = b.key
                  AND a.doc_id < b.doc_id),
        ver AS (SELECT c.id_a, c.id_b,
                       len(list_intersect(sa.sset, sb.sset)) AS common,
                       len(sa.sset) AS la, len(sb.sset) AS lb
                FROM cand c
                JOIN sh sa ON sa.doc_id = c.id_a
                JOIN sh sb ON sb.doc_id = c.id_b)
        SELECT id_a, id_b,
               round(common::DOUBLE / (la + lb - common), 4) AS jaccard
        FROM ver
        WHERE round(common::DOUBLE / (la + lb - common), 4) >= {thr}
    """


def _q18_oracle_sql() -> str:
    """SQL twin of simhash_near_dups(md5_token_hash64, max_hamming=3): the
    64-bit signature carried as two 32-bit halves (no signed-overflow
    packing needed), 4x16-bit pigeonhole chunks, exact hamming verify."""
    lo_votes = ",\n            ".join(
        f"sum(CASE WHEN (lo >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )
    hi_votes = ",\n            ".join(
        f"sum(CASE WHEN (hi >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i + 32}"
        for i in range(32)
    )
    sh_lo = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
    )
    sh_hi = " + ".join(
        f"(CASE WHEN v{i + 32} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_distinct(
                       string_split_regex(lower(trim(text)), '\\s+'))) AS t
            FROM documents),
        h AS (SELECT doc_id,
                     ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                     ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo
              FROM tok),
        v AS (SELECT doc_id,
            {lo_votes},
            {hi_votes}
            FROM h GROUP BY doc_id),
        s AS (SELECT doc_id, {sh_lo} AS sh_lo, {sh_hi} AS sh_hi FROM v),
        c AS (SELECT doc_id, sh_lo, sh_hi,
                     sh_lo & 65535 AS c0, sh_lo >> 16 AS c1,
                     sh_hi & 65535 AS c2, sh_hi >> 16 AS c3
              FROM s)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               (bit_count(xor(a.sh_lo, b.sh_lo))
                + bit_count(xor(a.sh_hi, b.sh_hi)))::INT AS hamming
        FROM c a JOIN c b
          ON a.doc_id < b.doc_id
         AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
        WHERE bit_count(xor(a.sh_lo, b.sh_lo))
              + bit_count(xor(a.sh_hi, b.sh_hi)) <= 3
    """


def _q24_oracle_sql() -> str:
    ws = _WS
    x2 = f"trim(x, {ws})"
    cleaned = (
        f"replace(replace(replace(replace(replace(replace(replace({x2}, "
        f"'\\', ''), '{_sq(_JUNK_1)}', ''), '\"', ''), '<img%20src=?', ''), "
        "'>', ''), '</', ''), '<', '')"
    )
    after = f"substr({cleaned}, strpos({cleaned}, '://') + 3)"
    netloc = f"regexp_extract({after}, '^[^/?#]*')"
    path = f"regexp_extract(substr({after}, length({netloc}) + 1), '^[^?#]*')"
    kw_strip = f"trim(lower(m.text), {ws})"
    contains_kw = f"contains({kw_strip}, lower(keyword))"
    span = "m.begin::VARCHAR || ':' || m.\"end\"::VARCHAR"
    processed = "(w.win_ord IS NULL OR k.ord <= w.win_ord)"
    kw_split = ("CASE WHEN contains(tags, ';') THEN string_split(tags, ';') "
                "ELSE string_split(tags, ',') END")
    return f"""
        WITH {_corpus_fields_cte()},
        hp AS {_homepage_dim_values()},
        rdim AS {_ratings_dim_values()},
        kdim AS {_kw_dim_values()},
        cit AS (
            SELECT f.ord, count(*) AS cit_cnt
            FROM f JOIN hp ON hp.h_source = f.source,
                 unnest(string_split(substr(f.links, 1, length(f.links) - 1),
                                     ',')) AS u(x)
            WHERE length(f.links) > 0
              AND length({x2}) > 0
              AND substr({x2}, 1, 1) <> '#'
              AND regexp_matches({x2}, '{_url_regex_sql()}', 'i')
              AND {x2} <> hp.homepage
              AND length({path}) > 0
              AND contains({netloc}, '.')
              AND NOT contains({cleaned}, '<img')
            GROUP BY f.ord),
        kwx AS (
            SELECT ord, trim(x, {ws}) AS keyword, m_kw
            FROM f, unnest({kw_split}) AS u(x)
            WHERE length(tags) > 0),
        kwm AS (
            SELECT ord, keyword,
                len(list_filter(coalesce(m_kw, {_EMPTY_MENTIONS}),
                                m -> {contains_kw})) > 0 AS has_match,
                list_filter(coalesce(m_kw, {_EMPTY_MENTIONS}),
                            m -> {contains_kw}
                            AND TRY_CAST(m.score AS DOUBLE) > 0.3::DOUBLE) AS m_thr
            FROM kwx),
        win AS (SELECT keyword, min(ord) FILTER (WHERE has_match) AS win_ord
                FROM kwm GROUP BY keyword),
        kwc AS (
            SELECT k.ord,
                count(DISTINCT k.keyword) FILTER (WHERE {processed}
                    AND len(d.th_spans) > 0) AS n_kw_thesoz,
                count(DISTINCT k.keyword) FILTER (WHERE {processed}
                    AND len(d.un_spans) > 0) AS n_kw_unesco,
                count(DISTINCT k.keyword) FILTER (WHERE k.ord = w.win_ord
                    AND len(k.m_thr) > 0) AS n_kw_dbpedia,
                count(DISTINCT k.keyword) FILTER (WHERE k.ord = w.win_ord
                    AND len(list_filter(k.m_thr,
                        m -> list_contains(d.th_spans, {span}))) > 0)
                    AS n_kw_thesoz_dbp,
                count(DISTINCT k.keyword) FILTER (WHERE k.ord = w.win_ord
                    AND len(list_filter(k.m_thr,
                        m -> list_contains(d.un_spans, {span}))) > 0)
                    AS n_kw_unesco_dbp
            FROM kwm k LEFT JOIN win w ON k.keyword = w.keyword
                       LEFT JOIN kdim d ON k.keyword = d.d_kw
            GROUP BY k.ord),
        kwin AS (SELECT DISTINCT k.ord, k.keyword, len(k.m_thr) AS me
                 FROM kwm k JOIN win w
                   ON k.keyword = w.keyword AND k.ord = w.win_ord),
        kwe AS (SELECT ord, sum(me) AS kw_ent_cnt FROM kwin GROUP BY ord),
        v AS (
            SELECT f.ord, f.source, f.author,
                len({_above('m_review')}) AS rev_cnt,
                len({_above('m_body')}) AS body_cnt,
                coalesce(e.kw_ent_cnt, 0) AS kw_ent,
                CASE WHEN length(f.tags) > 0 THEN
                    len(list_distinct(list_transform({kw_split},
                                                     x -> trim(x, {ws}))))
                ELSE 0 END AS kw_cnt,
                coalesce(c2.cit_cnt, 0) AS cit_cnt,
                length(f.body) > 0 AS has_body,
                length(f.title) > 0 AS has_headline,
                (length(f.cdate) > 0
                 AND TRY_CAST(f.cdate AS DATE) IS NOT NULL) AS has_date,
                coalesce(r.r_name, 'OTHER') AS norm_name,
                coalesce(k.n_kw_thesoz, 0) AS n_kw_thesoz,
                coalesce(k.n_kw_unesco, 0) AS n_kw_unesco,
                coalesce(k.n_kw_dbpedia, 0) AS n_kw_dbpedia,
                coalesce(k.n_kw_thesoz_dbp, 0) AS n_kw_thesoz_dbp,
                coalesce(k.n_kw_unesco_dbp, 0) AS n_kw_unesco_dbp
            FROM f
            LEFT JOIN kwe e USING (ord)
            LEFT JOIN cit c2 USING (ord)
            LEFT JOIN kwc k ON k.ord = f.ord
            LEFT JOIN rdim r ON r.r_source = lower(f.source)
                 AND r.r_label = replace(translate(trim(lower(f.ralt), {ws}),
                                                   '!:', ''), '-', ' '))
        SELECT coalesce(source, '__global__') AS source_grp,
            count(*) AS claim_reviews,
            sum(CASE WHEN length(author) = 0 THEN 1 ELSE 0 END)::BIGINT
                AS claims_without_author,
            sum(rev_cnt)::DOUBLE / count(*) AS entities_per_review,
            sum(kw_ent + body_cnt)::DOUBLE / count(*) AS entities_per_claim,
            sum(kw_ent + body_cnt + rev_cnt)::BIGINT AS total_entities,
            sum(kw_cnt)::BIGINT AS keywords,
            sum(n_kw_thesoz)::BIGINT AS kw_thesoz,
            sum(n_kw_unesco)::BIGINT AS kw_unesco,
            sum(n_kw_dbpedia)::BIGINT AS kw_dbpedia,
            sum(n_kw_thesoz_dbp)::BIGINT AS kw_thesoz_dbpedia,
            sum(n_kw_unesco_dbp)::BIGINT AS kw_unesco_dbpedia,
            sum(kw_cnt)::DOUBLE / count(*) AS keywords_per_review,
            sum(cit_cnt)::DOUBLE / count(*) AS citations_per_creative_work,
            sum(CASE WHEN has_body THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_with_text,
            sum(CASE WHEN length(author) > 0 THEN 1 ELSE 0 END)::DOUBLE
                / count(*) * 100.0 AS pct_with_author,
            sum(CASE WHEN has_date THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_with_date,
            sum(CASE WHEN cit_cnt > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_with_citations,
            sum(CASE WHEN kw_ent + body_cnt > 0 THEN 1 ELSE 0 END)::DOUBLE
                / count(*) * 100.0 AS pct_with_entities,
            sum(CASE WHEN has_headline THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_with_headline,
            sum(CASE WHEN kw_cnt > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_with_keywords,
            sum(CASE WHEN rev_cnt > 0 THEN 1 ELSE 0 END)::DOUBLE / count(*)
                * 100.0 AS pct_reviews_with_entities,
            sum(CASE WHEN norm_name = 'TRUE' THEN 1 ELSE 0 END)::BIGINT
                AS true_claims,
            sum(CASE WHEN norm_name = 'FALSE' THEN 1 ELSE 0 END)::BIGINT
                AS false_claims,
            sum(CASE WHEN norm_name = 'MIXTURE' THEN 1 ELSE 0 END)::BIGINT
                AS mixture_claims,
            sum(CASE WHEN norm_name = 'OTHER' THEN 1 ELSE 0 END)::BIGINT
                AS other_claims
        FROM v GROUP BY ROLLUP(source)
    """


def _q26_oracle_sql() -> str:
    return f"""
        WITH {_corpus_fields_cte()},
        m AS (
            SELECT lower(mm.text) AS surface,
                   replace(mm.entity, ' ', '_') AS entity_u
            FROM (
                SELECT unnest({_above('m_review')}) AS mm FROM f
                UNION ALL
                SELECT unnest({_above('m_body')}) AS mm FROM f)),
        pe AS (SELECT surface, entity_u, count(*) AS n_links
               FROM m GROUP BY 1, 2),
        r AS (SELECT surface, entity_u, n_links,
                     sum(n_links) OVER (PARTITION BY surface)::BIGINT
                         AS n_mentions,
                     count(*) OVER (PARTITION BY surface) AS n_entities,
                     row_number() OVER (PARTITION BY surface
                         ORDER BY n_links DESC, entity_u DESC) AS rn
              FROM pe)
        SELECT surface, n_mentions, n_entities, entity_u AS canonical_entity
        FROM r WHERE rn = 1
    """


def _q21_oracle_sql() -> str:
    rows = ", ".join(
        f"('{_sq(p)}', '{_sq(k)}', {n})" for p, k, n in _goldens()["q21"]
    )
    return f"""
        -- golden derived from the row-at-a-time reference-semantics oracle
        -- (claimskg_generator_spark/oracle.py) over the same deterministic
        -- corpus; regenerate with scripts/gen_pipeline_goldens.py
        SELECT pred, okind, n::BIGINT AS n
        FROM (VALUES {rows}) AS t(pred, okind, n)
    """


def _q23_oracle_sql() -> str:
    rows = ", ".join(
        f"('{_sq(a)}', '{_sq(b)}', {s!r})" for a, b, s in _goldens()["q23"]
    )
    return f"""
        -- golden from oracle.py reconcile() (reference reconciler
        -- semantics), scores quantized HALF_UP to 6 like Spark ROUND;
        -- regenerate with scripts/gen_pipeline_goldens.py
        SELECT cw_a, cw_b, score::DOUBLE AS score
        FROM (VALUES {rows}) AS t(cw_a, cw_b, score)
    """


def _q20_oracle_sql() -> str:
    rows = ", ".join(
        f"('{_sq(o)}', '{u}')" for o, u in _goldens()["q20"]
    )
    return f"""
        -- golden from Python stdlib uuid.uuid5 (the independent twin of the
        -- JVM column expression); regenerate with
        -- scripts/gen_pipeline_goldens.py
        SELECT ord, doc_uuid
        FROM (VALUES {rows}) AS t(ord, doc_uuid)
    """


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
        "q27_ivf_topk": q27_ivf_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q17_minhash_lsh": _q17_oracle_sql(),
        "q18_simhash": _q18_oracle_sql(),
        "q19_lsh_cosine": _q19_oracle_sql(),
        "q20_uuid5_mint": _q20_oracle_sql(),
        "q27_ivf_topk": """
            WITH cents AS (
                SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id % 32 = 0),
            assigned AS (
                SELECT vec_id AS m_id, mv, cent_id AS m_cent FROM (
                    SELECT e.vec_id, e.embedding::DOUBLE[] AS mv, c.cent_id,
                           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                               list_cosine_similarity(e.embedding::DOUBLE[],
                                                      c.cv) DESC,
                               c.cent_id ASC) AS rn
                    FROM embeddings e, cents c)
                WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
            probes AS (
                SELECT query_id, qv, cent_id AS p_cent FROM (
                    SELECT q.query_id, q.qv, c.cent_id,
                           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                               list_cosine_similarity(q.qv, c.cv) DESC,
                               c.cent_id ASC) AS rn
                    FROM q, cents c)
                WHERE rn <= 4)
            SELECT query_id, neighbor_id, cosine, rank FROM (
                SELECT p.query_id, a.m_id AS neighbor_id,
                       round(list_cosine_similarity(a.mv, p.qv), 4) AS cosine,
                       (ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
                           round(list_cosine_similarity(a.mv, p.qv), 4) DESC,
                           a.m_id ASC))::INTEGER AS rank
                FROM assigned a JOIN probes p ON a.m_cent = p.p_cent
                WHERE a.m_id <> p.query_id)
            WHERE rank <= 5
        """,
        "q22_multimodal_features": """
            SELECT doc_id::BIGINT AS media_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   sha256(text) AS payload_sha256,
                   octet_length(encode(text))::BIGINT AS n_bytes
            FROM documents
        """,
        "q21_claims_triples": _q21_oracle_sql(),
        "q23_claims_reconcile": _q23_oracle_sql(),
        "q24_claims_stats": _q24_oracle_sql(),
        "q26_claims_canonicalize": _q26_oracle_sql(),
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
