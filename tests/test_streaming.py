"""Streaming ingest: the stateless triple log drained via availableNow must
be a subset of the batch result, and compaction must converge to the exact
batch triple set (= oracle set)."""

import tempfile

import pytest

from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline
from claimskg_generator_spark.sources.synth import gen_rows
from claimskg_generator_spark.streaming.ingest import (
    compact_triple_log,
    stream_triples,
)

N = 120


@pytest.fixture(scope="module")
def dirs(spark):
    base = tempfile.mkdtemp(prefix="claimskg_stream_")
    inp = f"{base}/input"
    spark.createDataFrame(gen_rows(N)).repartition(4).write.parquet(inp)
    return {
        "input": inp,
        "log": f"{base}/log",
        "ckpt": f"{base}/ckpt",
        "compacted": f"{base}/compacted",
    }


def test_stream_then_compact_converges(spark, dirs):
    q = stream_triples(spark, dirs["input"], dirs["log"], dirs["ckpt"])
    q.awaitTermination(300)

    log = spark.read.parquet(dirs["log"])
    batch = ClaimsKGPipeline(spark).triples(spark.read.parquet(dirs["input"]))
    batch_set = {tuple(r) for r in batch.collect()}
    log_set = {tuple(r) for r in log.collect()}
    # stateless families only -> strict subset (no keyword/static families)
    assert log_set and log_set < batch_set

    compacted = compact_triple_log(
        spark, dirs["input"], dirs["log"], dirs["compacted"]
    )
    assert {tuple(r) for r in compacted.collect()} == batch_set


def test_stream_is_incremental(spark, dirs):
    # a second availableNow run with no new files adds nothing
    before = spark.read.parquet(dirs["log"]).count()
    q = stream_triples(spark, dirs["input"], dirs["log"], dirs["ckpt"])
    q.awaitTermination(120)
    after = spark.read.parquet(dirs["log"]).count()
    assert after == before
