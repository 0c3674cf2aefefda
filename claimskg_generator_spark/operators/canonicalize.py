"""A5: entity canonicalization over mention surface forms with an explicit
salted two-phase aggregation (north_star / SURVEY.md §4.1).

Head entities ("Donald Trump", "Barack Obama") dominate real fact-check
corpora, so a naive groupBy(surface) sends every hot key to one reducer.
The salted plan:

    phase 1: groupBy(pmod(hash(ord), S), surface)  -> partial aggregates
    phase 2: groupBy(surface)                      -> final merge

spreads each hot key over S reducers in phase 1; phase 2 merges S tiny
partials per key.  (Spark's hash aggregate already does map-side partials —
the explicit salt additionally splits the *reduce side*, which is what the
north rule demands for head-key skew.)

The result is identical to a plain groupBy, so the operator is
oracle-checkable with ordinary GROUP BY SQL.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_surface_counts(mentions: DataFrame, surface_col: str,
                          entity_col: str, salt_col, salt: int = 16) -> DataFrame:
    """Canonical per-surface aggregate: total mentions, distinct entities,
    the most frequent entity (canonical link), via salted two-phase agg.

    ``salt_col`` is any column with per-row spread (e.g. the order key);
    the salt is derived from it so the same row always lands in the same
    salt bucket (deterministic resume)."""
    salted = mentions.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col), F.lit(salt))
    )
    phase1 = salted.groupBy("_salt", surface_col, entity_col).agg(
        F.count("*").alias("_partial_n")
    )
    # phase 2a: merge salt buckets per (surface, entity)
    per_entity = phase1.groupBy(surface_col, entity_col).agg(
        F.sum("_partial_n").alias("n_links")
    )
    # phase 2b: final per-surface canonicalization
    return (
        per_entity.groupBy(surface_col)
        .agg(
            F.sum("n_links").alias("n_mentions"),
            F.count("*").alias("n_entities"),
            F.max(F.struct(F.col("n_links"), F.col(entity_col))).alias("_top"),
        )
        .select(
            surface_col,
            "n_mentions",
            "n_entities",
            F.col("_top")[entity_col].alias("canonical_entity"),
        )
    )


def canonicalize_claim_mentions(claims: DataFrame, threshold: float,
                                salt: int = 16) -> DataFrame:
    """Canonical entity per mention surface form over the claim corpus
    (all three mention sources see operators/mentions.py)."""
    from claimskg_generator_spark.operators.mentions import (
        review_and_body_raw_mentions,
    )

    raw = review_and_body_raw_mentions(claims, threshold)
    return salted_surface_counts(
        raw.select(F.lower("text").alias("surface"), "entity_u",
                   F.col("attach_uri")),
        "surface", "entity_u", F.col("attach_uri"), salt,
    )
