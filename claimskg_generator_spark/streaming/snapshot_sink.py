"""Exactly-once streaming sink into the snapshot table format.

Structured Streaming's file/parquet sinks give at-least-once file output
with their own _spark_metadata log; this sink instead lands every
micro-batch as an ATOMIC snapshot-table commit (sources/snapshot_table),
so stream output is immediately time-travelable, stats-pruned, and
maintainable (compact/expire/vacuum/merge) like any batch-written table.

Exactly-once comes from epoch idempotence, the same contract Spark's
foreachBatch documents: ``batch_id`` is stable across replays, and the
epoch id rides INSIDE the table's atomic manifest commit (the
``extra`` annotation of SnapshotTable.append) — there is no window
between data landing and the epoch being recorded.  A crash between
the table commit and the streaming checkpoint advance therefore costs
a no-op replay, never a duplicate append.  The replay check walks the
manifest PARENT CHAIN (``stream_batch_ids`` per commit), so
interleaved maintenance commits (compaction, deletes) do not mask
prior stream epochs.

Scale posture: one manifest read per micro-batch (O(chain) on first call,
then cached high-water mark); the append itself is the table's normal
optimistic commit — no extra shuffle, no coordination beyond the atomic
manifest claim.
"""

from typing import Optional, Set

from pyspark.sql import DataFrame, SparkSession

from claimskg_generator_spark.sources.snapshot_table import (
    SnapshotTable,
    SnapshotTableError,
)


def committed_stream_batch_ids(table: SnapshotTable) -> Set[int]:
    """All stream batch ids recorded anywhere in the current snapshot's
    parent chain (maintenance commits in between inherit implicitly —
    the chain is the table's lineage)."""
    ids: Set[int] = set()
    try:
        sid = table.current_snapshot_id()
        while sid is not None:
            m = table.manifest(sid)
            ids.update(m.get("stream_batch_ids", []))
            sid = m.get("parent_id")
    except SnapshotTableError:
        pass
    return ids


class SnapshotTableStreamWriter:
    """``foreachBatch`` target: append each micro-batch as one snapshot
    commit, idempotent on ``batch_id`` across restarts and replays."""

    def __init__(self, spark: SparkSession, table_dir: str,
                 stat_cols=()):
        self.table = SnapshotTable(spark, table_dir, stat_cols=stat_cols)
        self._seen: Optional[Set[int]] = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._seen is None:
            self._seen = committed_stream_batch_ids(self.table)
        if batch_id in self._seen:
            return  # replayed epoch: the commit already landed
        # the epoch id is part of the SAME atomic manifest commit as the
        # data — a crash can only lose or land BOTH together
        self.table.append(batch_df,
                          extra={"stream_batch_ids": [batch_id]})
        self._seen.add(batch_id)


def write_stream_to_snapshot_table(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    stat_cols=(),
    trigger_available_now: bool = True,
):
    """Wire a streaming DataFrame into a snapshot table; returns the
    started StreamingQuery.  ``trigger_available_now`` drains what exists
    and stops (the testable catch-up mode)."""
    writer = SnapshotTableStreamWriter(
        stream_df.sparkSession, table_dir, stat_cols=stat_cols)
    w = stream_df.writeStream.foreachBatch(writer).option(
        "checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
