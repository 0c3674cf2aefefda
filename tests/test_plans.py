"""Physical-plan discipline checks: filters reach the parquet scan, columns
are pruned per consumer, dictionary joins broadcast, and the pipeline's
shuffle count stays at its designed minimum."""

import re
import tempfile

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    jvm = df.sparkSession.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.q01_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan


def test_column_pruning_on_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.q01_pricing_summary(spark, SF))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_shipdate"}


def test_rating_join_is_broadcast(spark):
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline, PipelineConfig
    from claimskg_generator_spark.sources.synth import gen_rows

    pipe = ClaimsKGPipeline(spark, PipelineConfig(materialize_parsed=False))
    claims = pipe.claims(spark.createDataFrame(gen_rows(30)))
    plan = _plan(claims)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_family_prunes_parsed_columns(spark):
    """A family that doesn't read mention arrays must not scan them from
    the parsed parquet."""
    from claimskg_generator_spark.operators.triples import citation_triples
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline, PipelineConfig
    from claimskg_generator_spark.sources.claims import parse_records
    from claimskg_generator_spark.sources.synth import gen_rows

    path = tempfile.mkdtemp(prefix="parsed_") + "/p"
    parse_records(spark.createDataFrame(gen_rows(50))).write.parquet(path)
    parsed = spark.read.parquet(path)
    pipe = ClaimsKGPipeline(spark, PipelineConfig(materialize_parsed=False))
    pipe.parsed = lambda _i: parsed
    fam = citation_triples(pipe.claims(None))
    plan = _plan(fam)
    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    read = ",".join(reads)
    assert "extra_entities_body" not in read
    assert "m_body" not in read
    assert "extra_refered_links" in read


def test_cosine_topk_broadcasts_queries(spark):
    import __spark_entry__ as e

    assert "BroadcastNestedLoopJoin" in _plan(e.q11_cosine_topk(spark, SF))


def test_pipeline_shuffle_budget(spark):
    """The core pipeline (no align/reconcile) plans exactly its designed
    shuffles: the keyword-winner aggregate + distinct-keyword dedup and the
    final triple distinct; family emission itself is shuffle-free."""
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline, PipelineConfig
    from claimskg_generator_spark.sources.synth import gen_rows

    pipe = ClaimsKGPipeline(spark, PipelineConfig(materialize_parsed=False))
    triples = pipe.triples(spark.createDataFrame(gen_rows(30)))
    n_exchanges = _plan(triples).count("Exchange hashpartitioning")
    # designed shuffles: final triple distinct, keyword winner aggregate,
    # distinct-keyword dedup (+ their AQE reuse nodes).  The budget fails
    # loudly if the plan ever regresses into per-family shuffles (~12+).
    assert n_exchanges <= 8, n_exchanges