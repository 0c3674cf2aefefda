"""CDC apply-changes: fold a change stream (upserts + deletes) into a
keyed snapshot — the batch MERGE INTO that keeps a lakehouse dimension
current, and the batch twin of the streaming SCD machinery
(operators/asof.scd2_join consumes what this operator maintains).

Semantics (Delta/Iceberg MERGE, "latest wins"):

* several change rows may share a key — only the one with the highest
  ``ts_col`` (ties broken by a caller-supplied tiebreak column)
  applies;
* the winning row upserts (replaces the target row, or inserts a new
  one) unless its ``op_col`` equals ``delete_op`` — then the key is
  removed;
* target rows never touched by a change pass through unchanged.

Scale shape (100 TB target, asymmetric change stream):

* latest-per-key is ONE map-side-combinable ``max_by(struct(values),
  struct(ts, tiebreak))`` aggregate — no window, so a hot key (the
  row everyone updates) never sorts its whole history in one task and
  the combiner reduces it per-partition first;
* default apply: a single full-outer equi-join on the key (AQE picks
  the physical strategy for two co-partitioned sides);
* ``broadcast_changes=True``: Spark cannot broadcast a full-outer
  join (it falls back to sort-merge and shuffles the whole target),
  so the operator splits the plan instead — a broadcast LEFT join
  carries updates/deletes/passthrough with ZERO shuffle of the
  target, and inserts come from a broadcast left-semi probe of the
  target's key column (column-pruned second scan) anti-joined on the
  driver-sized folded set.  Two cheap scans beat one 100 TB shuffle;
* the result is a full new snapshot, ready to be written back as the
  next table version (sources/snapshot_table.py gives it time travel).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "ts",
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_col: Optional[str] = None,
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply ``changes`` to ``target`` and return the new snapshot.

    ``changes`` must carry the key, ``ts_col``, ``op_col``, and every
    ``target`` value column; extra change-side columns are ignored.
    ``tiebreak_col`` (default: the key itself, which only breaks ties
    ACROSS keys — pass a sequence column when one key can change twice
    at the same timestamp) makes the winner deterministic.
    """
    value_cols: List[str] = [c for c in target.columns if c != key]
    missing = [c for c in [key, ts_col, op_col, *value_cols]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    tb = tiebreak_col or key
    folded = (
        changes.groupBy(key)
        .agg(
            F.max_by(
                # __chg marks presence so a NULL op still upserts
                F.struct(F.lit(True).alias("__chg"),
                         F.col(op_col).alias("__op"),
                         *[F.col(c).alias(f"__v_{c}")
                           for c in value_cols]),
                F.struct(F.col(ts_col), F.col(tb)),
            ).alias("__c")
        )
        .select(key, "__c.*")
    )
    present = F.coalesce(F.col("__chg"), F.lit(False))
    keep = ~present | F.col("__op").isNull() | (
        F.col("__op") != delete_op)
    merged_cols = [
        F.when(present, F.col(f"__v_{c}")).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    if not broadcast_changes:
        joined = target.join(folded, key, "full_outer")
        return joined.filter(keep).select(F.col(key), *merged_cols)
    # Broadcast path: full-outer can't broadcast-hash (Spark falls back
    # to sort-merge), so split: LEFT join carries update/delete/
    # passthrough without shuffling the target; inserts are the folded
    # keys absent from the target, found with a broadcast left-semi
    # probe over the target's key column only.
    b = F.broadcast(folded)
    kept = (
        target.join(b, key, "left")
        .filter(keep)
        .select(F.col(key), *merged_cols)
    )
    # matched_keys <= |changes| rows, so it broadcasts too: the whole
    # plan has no sort-merge join and no exchange on the target side.
    matched_keys = F.broadcast(
        target.join(b, key, "left_semi").select(key))
    inserts = (
        folded.join(matched_keys, key, "left_anti")
        .filter(F.col("__op").isNull() | (F.col("__op") != delete_op))
        .select(F.col(key),
                *[F.col(f"__v_{c}").alias(c) for c in value_cols])
    )
    return kept.unionByName(inserts)
