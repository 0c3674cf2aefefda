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
