"""Corpus-dedup CLI: survivor sets must equal the composed operators."""

import os
import tempfile

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _run(spark, docs, argv_extra, base):
    from claimskg_generator_spark.dedup_cli import main

    out = os.path.join(base, "out")
    rc = main(["--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", out] + argv_extra)
    assert rc == 0
    return {r["doc_id"] for r in
            spark.read.parquet(out).select("doc_id").collect()}


def test_dedup_cli_minhash_matches_operators(spark, docs):
    from claimskg_generator_spark.operators.components import dedup_corpus
    from claimskg_generator_spark.operators.dedup import minhash_lsh_pairs

    base = tempfile.mkdtemp(prefix="claimskg_dedupcli_")
    pairs_out = os.path.join(base, "pairs")
    groups_out = os.path.join(base, "groups")
    got = _run(spark, docs,
               ["--method", "minhash", "--pairs-output", pairs_out,
                "--groups-output", groups_out], base)
    pairs = minhash_lsh_pairs(docs).select("id_a", "id_b")
    want = {r["doc_id"] for r in
            dedup_corpus(docs, pairs).select("doc_id").collect()}
    assert got == want
    # side outputs exist and are consistent
    groups = spark.read.parquet(groups_out)
    losers = {r["id"] for r in
              groups.filter("id != canonical_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert got == all_ids - losers
    assert spark.read.parquet(pairs_out).count() == pairs.count()


def test_dedup_cli_exact_matches_operator(spark, docs):
    from claimskg_generator_spark.operators.dedup import exact_duplicates

    base = tempfile.mkdtemp(prefix="claimskg_dedupcli_")
    got = _run(spark, docs, ["--method", "exact"], base)
    want = {r["survivor_id"] for r in
            exact_duplicates(docs).select("survivor_id").distinct().collect()}
    # exact dedup: survivors are exactly the distinct per-fingerprint mins
    assert got == want


def test_dedup_cli_embedding_requires_dim():
    from claimskg_generator_spark.dedup_cli import main

    with pytest.raises(SystemExit):
        main(["--input", "/tmp/x", "--output", "/tmp/y",
              "--method", "embedding"])


def test_dedup_cli_embedding_with_id_col(spark):
    """--method embedding over the embeddings table with --id-col vec_id:
    the rename happens once at ingress and every downstream operator sees
    doc_id; survivors carry the caller's id column name back."""
    from claimskg_generator_spark.dedup_cli import main
    from claimskg_generator_spark.operators.components import dedup_corpus
    from claimskg_generator_spark.operators.similarity import lsh_cosine_pairs

    base = tempfile.mkdtemp(prefix="claimskg_dedupcli_emb_")
    out = os.path.join(base, "out")
    rc = main(["--input", "/root/testdata/sf0.001/embeddings.parquet",
               "--output", out, "--method", "embedding", "--dim", "64",
               "--id-col", "vec_id", "--threshold", "0.25"])
    assert rc == 0
    got = {r["vec_id"] for r in
           spark.read.parquet(out).select("vec_id").collect()}
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = lsh_cosine_pairs(emb, threshold=0.25, dim=64,
                             id_col="vec_id").select("id_a", "id_b")
    want = {r["vec_id"] for r in dedup_corpus(
        emb.withColumnRenamed("vec_id", "doc_id"), pairs
    ).withColumnRenamed("doc_id", "vec_id").select("vec_id").collect()}
    assert got == want and got


def test_dedup_cli_corpus_prep_gates_sample_and_redact(spark, docs):
    """--quality-min/--max-top-bigram-frac pre-gates, --sample post-mix,
    --pii-redact: the CLI must equal the composed operators."""
    import os
    import tempfile

    from claimskg_generator_spark.functions.pii import redact
    from claimskg_generator_spark.operators.components import dedup_corpus
    from claimskg_generator_spark.operators.dedup import exact_duplicates
    from claimskg_generator_spark.operators.sampling import stratified_sample
    from claimskg_generator_spark.operators.textstats import (
        with_quality_score,
        with_repetition_metrics,
    )
    from pyspark.sql import functions as F

    base = tempfile.mkdtemp(prefix="claimskg_prepcli_")
    out = os.path.join(base, "out")
    from claimskg_generator_spark.dedup_cli import main

    rc = main(["--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", out, "--method", "exact",
               "--quality-min", "0.35", "--max-top-bigram-frac", "0.9",
               "--sample", "en=0.5,fr=0.25", "--sample-default", "0.2",
               "--pii-redact"])
    assert rc == 0
    got = spark.read.parquet(out)

    gated = (
        with_repetition_metrics(
            with_quality_score(docs, keep_all=True), keep_all=True
        )
        .filter((F.col("quality") >= 0.35)
                & (F.col("top_bigram_frac") <= 0.9))
        .select(*docs.columns)
    )
    d = exact_duplicates(gated)
    pairs = (d.filter(F.col("doc_id") != F.col("survivor_id"))
             .select(F.col("survivor_id").alias("id_a"),
                     F.col("doc_id").alias("id_b")))
    want = stratified_sample(
        dedup_corpus(gated, pairs), "lang",
        {"en": 0.5, "fr": 0.25}, "doc_id", default_rate=0.2,
    ).withColumn("text", redact(F.col("text")))
    got_rows = {(r["doc_id"], r["text"]) for r in
                got.select("doc_id", "text").collect()}
    want_rows = {(r["doc_id"], r["text"]) for r in
                 want.select("doc_id", "text").collect()}
    assert got_rows == want_rows
    assert 0 < len(got_rows) < docs.count()


def test_dedup_cli_rejects_bad_sample_spec():
    from claimskg_generator_spark.dedup_cli import main

    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y", "--sample", "en:0.5"])


def test_dedup_cli_dsir_and_weighted_sample_match_operators(spark, docs):
    from pyspark.sql import functions as F

    from claimskg_generator_spark.operators.components import dedup_corpus
    from claimskg_generator_spark.operators.dedup import exact_duplicates
    from claimskg_generator_spark.operators.sampling import weighted_sample
    from claimskg_generator_spark.operators.selection import dsir_select

    base = tempfile.mkdtemp(prefix="claimskg_dedupcli_")
    got = _run(spark, docs,
               ["--method", "exact", "--dsir-target", "source=src0",
                "--dsir-fraction", "0.5", "--weighted-sample", "10"],
               base)

    d = exact_duplicates(docs)
    pairs = (d.filter(F.col("doc_id") != F.col("survivor_id"))
             .select(F.col("survivor_id").alias("id_a"),
                     F.col("doc_id").alias("id_b")))
    survivors = dedup_corpus(docs, pairs)
    sel = (dsir_select(survivors, F.col("source") == "src0", fraction=0.5)
           .filter("keep = 1").select("doc_id"))
    kept = survivors.join(sel, "doc_id", "left_semi")
    want = {r["doc_id"] for r in
            weighted_sample(kept, "n_chars", 10, id_col="doc_id")
            .select("doc_id").collect()}
    assert got == want and len(got) == 10


def test_dedup_cli_rejects_bad_dsir_target():
    from claimskg_generator_spark.dedup_cli import main

    with pytest.raises(SystemExit):
        main(["--input", "x", "--output", "y",
              "--dsir-target", "nopredicate"])
