"""Streaming histogram-sketch maintenance — the incremental twin of
operators/sketches.histogram_* (q91), closing the same batch↔stream
pair the rollup has in cdc_stream.

CDC's latest-wins fold is replay-idempotent on its own; ADDITIVE
register counts are not — re-folding a replayed micro-batch would
double-count.  Exactly-once therefore rides the snapshot_sink epoch
contract instead: each micro-batch lands its PARTIAL registers
(by..., bin, cnt) as ONE atomic snapshot-table append whose manifest
carries the batch id, and a replayed epoch is skipped before any
write.  The register monoid (q91's merge(h(a), h(b)) == h(a ∪ b))
does the rest:

* ``registers()`` merges the landed partials ON READ with one
  sketch-sized groupBy — correct after any interleaving or ordering
  of batches, because the merge is the monoid fold and addition
  commutes;
* ``quantiles()`` estimates from that view with the exact batch
  interpolation, so a drained stream answers bit-for-bit like
  ``histogram_quantiles(histogram_registers(all rows))``;
* ``compact_registers()`` folds every partial into one base commit —
  safe at ANY moment for the same monoid reason; the epoch ids stay
  visible to the replay check because ``committed_stream_batch_ids``
  walks the manifest PARENT chain (so do not ``expire_snapshots``
  below the stream's checkpoint horizon).

State size: O(batches × groups × n_bins) rows before compaction,
O(groups × n_bins) after — constant in corpus size either way; this
is the property that makes a quantile monitor on a 100 TB/day stream
a dimension-sized table instead of a second copy of the data.
"""

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.sketches import (
    histogram_quantiles,
    histogram_registers,
)
from claimskg_generator_spark.sources.snapshot_table import SnapshotTable
from claimskg_generator_spark.streaming.snapshot_sink import (
    committed_stream_batch_ids,
)


class HistogramSketchMaintainer:
    """``foreachBatch`` target: land each micro-batch's partial
    histogram registers as one epoch-stamped atomic commit."""

    def __init__(self, spark: SparkSession, table_dir: str,
                 value_col: str, lo: float, hi: float,
                 n_bins: int = 256, by: Optional[Sequence[str]] = None):
        self.value_col = value_col
        self.lo, self.hi, self.n_bins = float(lo), float(hi), int(n_bins)
        self.by = list(by or [])
        self.table = SnapshotTable(
            spark, table_dir, stat_cols=tuple(self.by) or ("bin",))
        self._seen = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._seen is None:
            self._seen = committed_stream_batch_ids(self.table)
        if batch_id in self._seen:
            return  # replayed epoch: its partial already landed
        partial = histogram_registers(
            batch_df, self.value_col, self.lo, self.hi, self.n_bins,
            by=self.by)
        # the epoch id and the partial land in the SAME atomic manifest
        # commit — a crash loses or lands both together (snapshot_sink
        # contract); an empty batch still lands so the epoch is recorded
        self.table.append(partial,
                          extra={"stream_batch_ids": [batch_id]})
        self._seen.add(batch_id)

    def registers(self, snapshot_id: Optional[int] = None) -> DataFrame:
        """The merged register view at a state version (latest by
        default): one monoid fold over sketch-sized partials."""
        st = self.table.read(snapshot_id)
        return st.groupBy(*self.by, "bin").agg(
            F.sum("cnt").alias("cnt"))

    def quantiles(self, qs, round_to: int = 6) -> DataFrame:
        """Quantile estimates from the current merged registers —
        identical arithmetic to the batch path."""
        return histogram_quantiles(
            self.registers(), self.lo, self.hi, self.n_bins, qs,
            by=self.by, round_to=round_to)

    def compact_registers(self) -> int:
        """Fold all landed partials into one base commit (monoid-safe
        at any time); returns the new snapshot id.  Epoch ids remain
        reachable through the overwrite commit's parent chain."""
        return self.table.overwrite(self.registers())


def stream_histogram_sketch(
    spark: SparkSession,
    values_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
    by: Optional[Sequence[str]] = None,
    value_schema=None,
    maintainer: Optional[HistogramSketchMaintainer] = None,
):
    """Continuously sketch a parquet value-file stream into the
    register table at ``table_dir``.  availableNow trigger: drains
    what is present and stops (the testable catch-up mode).  Returns
    (StreamingQuery, HistogramSketchMaintainer).
    """
    m = maintainer or HistogramSketchMaintainer(
        spark, table_dir, value_col, lo, hi, n_bins, by=by)
    schema = value_schema or spark.read.parquet(values_dir).schema
    stream = spark.readStream.schema(schema).parquet(values_dir)
    q = (
        stream.writeStream.foreachBatch(m)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q, m
