"""Reconciliation-at-scale evidence (docs/PLANS.md):

1. the blocking self-join carries only SLIM columns (ord, cw_uri, block
   key, prune dates, entity count) through the candidate explosion — shown
   by the optimized plan's join-input schemas;
2. AQE skew-join splits the hot-author partitions — shown by ``skew=true``
   on the executed SortMergeJoin when thresholds are at demo scale.

Usage: python scripts/reconcile_skew_demo.py [cpus] [n_rows] [head_pct]

``head_pct`` (default 25): percentage of the corpus rewritten to a single
hot creative-work author ("Viral image" — the real ClaimsKG head key, see
reference corpus), the classic blocked-self-join skew case.
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # 40k rows: the hot author already dominates one reducer (the point of
    # the demo) while the pair explosion stays laptop-sized
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 40000

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("reconcile_skew_demo")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # demo-scale skew thresholds (production defaults are 256 MB/5x —
        # sized for real partitions; here the whole input is ~100 MB)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "256k")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from claimskg_generator_spark.operators.reconcile import _reconcile_scored
    from claimskg_generator_spark.operators.views import logical_views
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline
    from claimskg_generator_spark.sources.synth import synthesize_corpus

    head_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    corpus_path = f"/tmp/claimskg_bench_corpus_{n_rows}"
    if not os.path.exists(corpus_path + "/_SUCCESS"):
        synthesize_corpus(spark, n_rows, 42).write.mode("overwrite").parquet(
            corpus_path
        )
    corpus = spark.read.parquet(corpus_path)
    if head_pct:
        # head-author injection: rewrite head_pct% of the records' creative-
        # work author to one hot key, like "Viral image" dominating real
        # fact-check corpora — the worst case for the author-blocked
        # self-join
        hot = F.xxhash64("path") % 100 < head_pct
        corpus = corpus.withColumn(
            "content",
            F.when(
                hot,
                F.regexp_replace(
                    "content",
                    r'"creativeWork_author_name":\s*"[^"]*"',
                    '"creativeWork_author_name": "Viral image"',
                ),
            ).otherwise(F.col("content")),
        )
    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(corpus)
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    scored = _reconcile_scored(views, theta=0.25, sample_fraction=0.005,
                               seed=7)

    # IMPORTANT: inspect the plan of the EXECUTED action.  scored.count()
    # compiles a separate query; scored's own queryExecution stays
    # isFinalPlan=false and shows no AQE rewrites (this script originally
    # made that mistake and reported zero skew markers).
    agg = scored.agg(F.count("*").alias("n"))
    t0 = time.time()
    n = agg.collect()[0]["n"]
    wall = time.time() - t0

    full_plan = agg._jdf.queryExecution().executedPlan().toString()
    executed = full_plan.split("== Initial Plan ==")[0]  # final plan only
    skew_markers = [
        l.strip()[:160] for l in executed.splitlines()
        if "skew" in l.lower()
    ]
    # slim-join evidence: the block-key join's output schema upstream of the
    # array re-attach joins
    slim = bool(re.search(r"SortMergeJoin.*creative_work_author", executed))

    print({
        "n_rows": n_rows, "cpus": cpus, "pairs_gt_theta": n,
        "wall_s": round(wall, 1),
        "skew_marker_lines": len(skew_markers),
        "blocking_join_present": slim,
        "join_nodes": [l.strip()[:120] for l in executed.splitlines()
                       if "Join" in l and "Exec" not in l][:6],
    })
    for line in skew_markers[:8]:
        print("SKEW:", line)
    spark.stop()


if __name__ == "__main__":
    main()
