"""Incremental (Structured Streaming) variant of the KG-construction
pipeline.

The reference is pure batch; its only incremental facility is the Redis
memo cache (SURVEY.md §2.6).  The scale story, however, wants a live-ingest
path: new claim-review files land in a directory (or arrive on any
streaming source) and triples append to the graph table continuously.

Design:

- ``readStream`` file source over the input-table directory (same
  (repo, path, commit, lang, content) schema).
- Per micro-batch, ``foreachBatch`` runs the *stateless* triple families —
  parse, clean, mint, rating join, mentions, citations — and appends to a
  Parquet triple log.  URI minting is deterministic (uuid5), so re-emitted
  triples are harmless duplicates.
- Set semantics (A3) and the order-dependent operators (keyword
  first-writer-wins, duplicate alignment, reconciliation) need a global
  view, so they run in a periodic COMPACTION batch job over the
  accumulated log: ``compact_triple_log`` dedupes and re-derives the
  keyword family over the full corpus seen so far — the streaming analog
  of checkpoint-resumable batch.
"""

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline, PipelineConfig
from claimskg_generator_spark.sources.claims import derive_claims, parse_records
from claimskg_generator_spark.sources.synth import INPUT_SCHEMA


def stream_triples(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str,
                   config: Optional[PipelineConfig] = None,
                   trigger_available_now: bool = True):
    """Start the streaming ingest; returns the StreamingQuery.

    With ``trigger_available_now`` the query drains everything currently in
    the directory and stops — the testable/batch-catch-up mode; without it,
    it runs continuously per micro-batch.
    """
    cfg = config or PipelineConfig(materialize_parsed=False)
    pipe = ClaimsKGPipeline(spark, cfg)

    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # stateless families only; global-view families come from compaction
        from claimskg_generator_spark.operators.mentions import (
            review_and_body_mention_triples,
        )
        from claimskg_generator_spark.operators.ratings_join import (
            with_normalized_rating,
        )
        from claimskg_generator_spark.operators.triples import (
            author_mention_triples,
            citation_triples,
            core_claim_triples,
        )
        from claimskg_generator_spark.functions.udfs import clean_citations

        claims = derive_claims(parse_records(batch_df, cfg.order_col), cfg.model_uri)
        claims = with_normalized_rating(claims, batch_df.sparkSession, cfg.model_uri)
        claims = claims.withColumn(
            "citations", clean_citations(F.col("links"), F.col("source"))
        )
        out = (
            core_claim_triples(claims, cfg.model_uri, cfg.include_body)
            .unionByName(review_and_body_mention_triples(claims, cfg.model_uri,
                                                         cfg.threshold))
            .unionByName(author_mention_triples(claims))
            .unionByName(citation_triples(claims))
            .dropDuplicates(["subj", "pred", "obj", "okind"])
        )
        out.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_triple_log(spark: SparkSession, input_dir: str, log_dir: str,
                       compacted_dir: str,
                       config: Optional[PipelineConfig] = None) -> DataFrame:
    """Periodic compaction: full-corpus run of the order-dependent families
    (keywords, static, thesaurus, optional align/reconcile) + global dedup
    against the streamed stateless log."""
    cfg = config or PipelineConfig(materialize_parsed=False)
    pipe = ClaimsKGPipeline(spark, cfg)
    full = pipe.triples(spark.read.parquet(input_dir))
    log = spark.read.parquet(log_dir)
    compacted = full.unionByName(log).dropDuplicates(
        ["subj", "pred", "obj", "okind"]
    )
    compacted.write.mode("overwrite").parquet(compacted_dir)
    return spark.read.parquet(compacted_dir)
