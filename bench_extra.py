#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT part of the frozen driver contract (bench.py is the official timer);
this file exists so optimization rounds can time sub-stages of the hot
queries and A/B candidate changes without touching bench.py.

Usage:
    python bench_extra.py q23-stages    # stage decomposition of q23
    python bench_extra.py q30-stages    # stage decomposition of q30
    python bench_extra.py only q23_claims_reconcile [...]  # noop-timed queries
"""

import os
import sys
import time

from bench import build_session


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"# {label}: {dt:.2f}s")
    spark.sparkContext.setJobDescription(None)
    return out, dt


def q23_stages(spark, sf_dir):
    import __spark_entry__ as entry

    from claimskg_generator_spark.operators.reconcile import _reconcile_scored
    from claimskg_generator_spark.operators.views import logical_views
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline

    corpus = entry._claims_corpus(spark, sf_dir)
    _timed(spark, "q23/corpus-count", corpus.count)
    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(corpus)
    _timed(spark, "q23/claims-noop", lambda: _noop(claims))
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    _timed(spark, "q23/views-noop", lambda: _noop(views))
    full = _reconcile_scored(views, theta=0.25)
    _timed(spark, "q23/full-count", full.count)
    # second run on the same session: warm-cache picture
    views2 = logical_views(pipe.claims(corpus), pipe.config.model_uri, 0.3)
    full2 = _reconcile_scored(views2, theta=0.25)
    _timed(spark, "q23/full-count-2", full2.count)


def q30_stages(spark, sf_dir):
    from claimskg_generator_spark.operators.similarity import ivf_topk

    from pyspark.sql import functions as F

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    _timed(spark, "q30/emb-count", e.count)
    q27 = ivf_topk(e, [0, 1, 2, 3, 4], k=5, n_centroids=32, n_probe=4)
    _timed(spark, "q30/q27-count", q27.count)
    q30 = ivf_topk(e, [0, 1, 2, 3, 4], k=5, n_centroids=32, n_probe=4,
                   n_iters=1, quantize_means=9)
    _timed(spark, "q30/q30-count", q30.count)
    _timed(spark, "q30/q30-count-2", q30.count)


def only(spark, sf_dir, names):
    import __spark_entry__ as entry

    qmap = entry.queries()
    for name in names:
        # build INSIDE the timed window, exactly like bench.py (several
        # query builders run eager work at plan-construction time)
        _timed(spark, f"only/{name}",
               lambda n=name: qmap[n](spark, sf_dir).count())


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    mode = sys.argv[1] if len(sys.argv) > 1 else "q23-stages"
    if mode == "q23-stages":
        q23_stages(spark, sf_dir)
    elif mode == "q30-stages":
        q30_stages(spark, sf_dir)
    elif mode == "only":
        only(spark, sf_dir, sys.argv[2:])
    spark.stop()


if __name__ == "__main__":
    main()
