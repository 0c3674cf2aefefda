"""P16 (SURVEY.md §2.2): uuid5 minting — JVM-side column expression must
reproduce uuid.uuid5(NAMESPACE_URL, ...) exactly (reference
claimskg/generator/__init__.py:91-137)."""

import uuid

from pyspark.sql import functions as F

from claimskg_generator_spark.functions.uuid5 import uuid5_url, uuid5_url_col

VECTORS = [
    "",
    "hello",
    "snopeshttps://snopes.example.org2019-01-01Some claim.",
    "émojis ünïcode ✓ — dash",
    "a" * 1000,
    "climate change",
    "123456789",
    "\t\nwhitespace  mix ",
]


def test_pure_uuid5_matches_stdlib():
    for name in VECTORS:
        assert uuid5_url(name) == str(uuid.uuid5(uuid.NAMESPACE_URL, name))


def test_column_expression_matches_stdlib(spark):
    df = spark.createDataFrame([(v,) for v in VECTORS], ["name"])
    got = {r["name"]: r["u"] for r in df.withColumn("u", uuid5_url_col(F.col("name"))).collect()}
    for name in VECTORS:
        assert got[name] == str(uuid.uuid5(uuid.NAMESPACE_URL, name))


def test_version_and_variant_bits(spark):
    df = spark.range(500).withColumn(
        "u", uuid5_url_col(F.concat(F.lit("probe:"), F.col("id").cast("string")))
    )
    for row in df.collect():
        u = row["u"]
        assert u[14] == "5"
        assert u[19] in "89ab"
