#!/usr/bin/env python
"""Stage-parallelism evidence: run the flagship pipeline with event logging
and report, per stage, the number of tasks and the achieved average task
parallelism (sum of task run time / stage wall), plus the driver-only gap
time.  A plan whose dominant stages run at ~= available slots with small
gaps scales with executors on a real cluster — the property the sandbox's
shared CPU cannot show via raw wall-clock.

Usage: python scripts/stage_parallelism.py [cpus] [n_rows]
"""

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(cpus: int, n_rows: int) -> str:
    evdir = tempfile.mkdtemp(prefix="spark_events_")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage_parallelism")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from claimskg_generator_spark.plans.pipeline import (
        ClaimsKGPipeline,
        PipelineConfig,
    )
    from claimskg_generator_spark.sources.synth import synthesize_corpus

    corpus_path = f"/tmp/claimskg_bench_corpus_{n_rows}"
    if not os.path.exists(corpus_path + "/_SUCCESS"):
        synthesize_corpus(spark, n_rows, 42).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    ckpt = tempfile.mkdtemp(prefix="sp_ck_")
    pipe = ClaimsKGPipeline(spark, PipelineConfig(checkpoint_dir=ckpt))
    t0 = time.time()
    n = pipe.triples(corpus).count()
    wall = time.time() - t0
    spark.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    print(f"# {n} triples in {wall:.1f}s at local[{cpus}]", file=sys.stderr)
    return evdir


def analyze(evdir: str, cpus: int) -> dict:
    stages = {}
    task_time = defaultdict(float)
    files = glob.glob(f"{evdir}/*/events*") + glob.glob(f"{evdir}/app*") + glob.glob(
        f"{evdir}/local*"
    )
    for path in files:
        if path.endswith(".zstd"):
            txt = subprocess.run(["zstd", "-d", "-c", path], capture_output=True,
                                 text=True).stdout.splitlines()
        else:
            try:
                txt = open(path).read().splitlines()
            except (UnicodeDecodeError, IsADirectoryError):
                continue
        for line in txt:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            t = e.get("Event")
            if t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                if "Completion Time" in si and "Submission Time" in si:
                    stages[si["Stage ID"]] = [
                        si["Number of Tasks"],
                        (si["Completion Time"] - si["Submission Time"]) / 1000,
                        si["Submission Time"], si["Completion Time"],
                    ]
            elif t == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                task_time[e["Stage ID"]] += m.get("Executor Run Time", 0) / 1000
    span = (max(s[3] for s in stages.values()) - min(s[2] for s in stages.values())) / 1000
    iv = sorted((s[2], s[3]) for s in stages.values())
    merged = []
    for b, e in iv:
        if merged and b <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([b, e])
    covered = sum(e - b for b, e in merged) / 1000
    total_task_s = sum(task_time.values())
    top = sorted(stages, key=lambda s: -stages[s][1])[:6]
    return {
        "metric": "stage_parallelism",
        "cpus": cpus,
        "stage_span_s": round(span, 1),
        "driver_only_gap_s": round(span - covered, 1),
        "total_task_seconds": round(total_task_s, 1),
        "avg_parallelism_overall": round(total_task_s / span, 2),
        "top_stages": [
            {
                "stage": sid,
                "tasks": stages[sid][0],
                "wall_s": round(stages[sid][1], 1),
                "avg_parallelism": round(
                    task_time[sid] / max(stages[sid][1], 0.001), 2
                ),
            }
            for sid in top
        ],
    }


if __name__ == "__main__":
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 320000
    evdir = run(cpus, n_rows)
    print(json.dumps(analyze(evdir, cpus)))
    shutil.rmtree(evdir, ignore_errors=True)
