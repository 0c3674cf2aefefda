"""Sequence packing for LLM training-data preparation: assign each
document a byte/token offset in a deterministic global concatenation
order and derive the fixed-length training-sequence (chunk) each document
starts in.

The global running sum is the crux at scale.  A bare
``Window.orderBy(id)`` (no partitionBy) collapses ALL rows into one
partition — the classic non-distributed cumsum trap.  This implementation
is the standard two-phase distributed prefix sum instead:

1. rows are grouped into ORDERED buckets (``id // bucket_span`` — a pure
   row expression, no data inspection, no driver action);
2. per-bucket totals (a tiny aggregate: one row per bucket) get their own
   running sum on the single-partition bucket table — legitimate there
   because the bucket table is small BY CONSTRUCTION, then broadcast back;
3. the within-bucket cumsum runs under ``Window.partitionBy(bucket)`` —
   parallel across buckets.

Net cost: one small aggregate + one broadcast join + one partitioned
window.  No stage ever holds more than a bucket in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_pack_offsets(
    df: DataFrame,
    size_col: str,
    id_col: str,
    seq_len: int,
    bucket_span: int = 4096,
) -> DataFrame:
    """Adds ``start_offset`` (sum of ``size_col`` over all rows with a
    smaller ``id_col``) and ``chunk_id`` (= start_offset // seq_len): the
    fixed-length training sequence this row begins in, under contiguous
    id-ordered packing.

    ``bucket_span`` controls prefix-sum granularity: ids are grouped into
    buckets of that many consecutive ids; the bucket-total table has
    ~max_id/bucket_span rows and must stay broadcast-small (tune the span
    up for sparse/huge id spaces).
    """
    if seq_len <= 0 or bucket_span <= 0:
        raise ValueError("seq_len and bucket_span must be positive")
    bucket = (F.col(id_col) / F.lit(bucket_span)).cast("bigint")
    d = df.withColumn("__pk_bucket", bucket)
    totals = d.groupBy("__pk_bucket").agg(
        F.sum(F.col(size_col).cast("bigint")).alias("__pk_total")
    )
    # The bucket table is tiny by construction — a single-partition window
    # over it is the one place a global orderBy is legitimate.
    wb = Window.orderBy("__pk_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefixes = totals.select(
        "__pk_bucket",
        (F.sum("__pk_total").over(wb) - F.col("__pk_total")).alias(
            "__pk_prefix"
        ),
    )
    win = Window.partitionBy("__pk_bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local_cum = F.sum(F.col(size_col).cast("bigint")).over(win) - F.col(
        size_col
    ).cast("bigint")
    return (
        d.join(F.broadcast(prefixes), "__pk_bucket")
        .withColumn("start_offset", F.col("__pk_prefix") + local_cum)
        .withColumn(
            "chunk_id",
            (F.col("start_offset") / F.lit(seq_len)).cast("bigint"),
        )
        .drop("__pk_bucket", "__pk_prefix")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks — the
    standard pre-embedding segmentation (RAG / long-context prep).
    Chunks start every ``chunk_tokens - overlap`` tokens; the last chunk
    may be shorter, and a document shorter than one chunk yields exactly
    one chunk.  Pure narrow map + posexplode: no shuffle, embarrassingly
    parallel at any corpus size.

    Output: (id, chunk_idx, chunk_start, n_chunk_tokens, chunk_md5) with
    chunk_md5 the md5 of the space-joined chunk tokens (cross-engine
    replayable for the oracle).
    """
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    d = df.select(F.col(id_col), toks.alias("toks"))
    chunks = F.expr(
        f"transform(sequence(0, greatest(size(toks) - 1, 0), {stride}),"
        f" s -> struct(s as chunk_start,"
        f"  slice(toks, s + 1, {chunk_tokens}) as ctoks))"
    )
    ex = d.select(
        id_col, F.posexplode(chunks).alias("chunk_idx", "c")
    )
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.chunk_start").cast("int").alias("chunk_start"),
        F.size("c.ctoks").alias("n_chunk_tokens"),
        F.md5(F.array_join("c.ctoks", " ")).alias("chunk_md5"),
    )
