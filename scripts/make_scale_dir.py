"""Deterministic scale-up of the driver testdata for super-linearity
audits (VERDICT r4 #3: "scale evidence above sf0.1").

Builds sf0.1 x FACTOR copies of the tables the heavy bench family reads
(documents, events, embeddings) by replicating each row FACTOR times
with disjoint id spaces.  Replica r > 0 of a document gets every token
suffixed with ``x{r}``: replicas are therefore NOT near-duplicates of
each other (zero cross-replica shingle overlap), so the dedup workload
is exactly FACTOR independent copies of the sf0.1 workload — the honest
linear-scaling reference.  (Replicating identical texts would instead
plant FACTOR-sized duplicate groups and grow pair output quadratically
in FACTOR — a different workload, not a scale-up.)

Events keep their props payload, so item nodes are shared across
replicas and q33's components grow in membership while the edge count
scales linearly — the realistic "graphs get denser" behavior.

Pure function of the source tables: safe to delete and rebuild anywhere.
Usage: python scripts/make_scale_dir.py [factor] [dst_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_STRIDE = 100_000_000
SRC_DEFAULT = "/root/testdata/sf0.1"


def build_scale_dir(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    if factor < 1:
        raise ValueError("factor must be >= 1")
    os.makedirs(dst_dir, exist_ok=True)

    def replicas(df, id_cols, perturb=None):
        out = None
        for r in range(factor):
            d = df
            for c in id_cols:
                d = d.withColumn(c, F.col(c) + F.lit(r * ID_STRIDE))
            if perturb is not None and r > 0:
                d = perturb(d, r)
            out = d if out is None else out.unionByName(d)
        return out

    def perturb_text(d, r):
        # suffix every token -> replicas share no shingles/windows
        toks = F.split(F.col("text"), r"\s+")
        newtext = F.array_join(
            F.expr(f"transform(__sc_toks, t -> concat(t, 'x{r}'))"), " "
        )
        return (
            d.withColumn("__sc_toks", toks)
            .withColumn("text", newtext)
            .withColumn("n_chars", F.length("text"))
            .drop("__sc_toks")
        )

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    replicas(docs, ["doc_id"], perturb_text).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{dst_dir}/documents.parquet")

    ev = spark.read.parquet(f"{src_dir}/events.parquet")
    replicas(ev, ["event_id", "user_id"]).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{dst_dir}/events.parquet")

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    replicas(emb, ["vec_id"]).repartition(16).write.mode(
        "overwrite"
    ).parquet(f"{dst_dir}/embeddings.parquet")


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".scale", f"sf{round(0.1 * factor, 2)}"
    )
    from bench import build_session

    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    build_scale_dir(spark, SRC_DEFAULT, dst, factor)
    print(dst)
    spark.stop()


if __name__ == "__main__":
    main()
