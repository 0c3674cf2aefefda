"""Snapshot table format: atomic commits, appends, time travel, skipping.

North-star surface (BASELINE.json: "partitioned Iceberg triple tables");
the reference serializes one rdflib graph file per run
(claimskg/export.py:64-70), so table semantics are new ground — pinned
here end-to-end on real Spark writes.
"""

import json
import os

import pytest

from claimskg_generator_spark.sources.snapshot_table import (
    CommitConflict,
    SnapshotTable,
    SnapshotTableError,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "md5(cast(id AS string)) AS fp")


def test_create_append_read_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["doc_id"])
    s1 = t.append(_docs(spark, 0, 50))
    s2 = t.append(_docs(spark, 50, 80))
    assert (s1, s2) == (1, 2)
    assert t.current_snapshot_id() == 2
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == set(range(80))
    # time travel: snapshot 1 still reads the original 50 rows
    assert t.read(snapshot_id=1).count() == 50


def test_overwrite_keeps_old_snapshot_readable(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_docs(spark, 0, 10))
    t.overwrite(_docs(spark, 100, 105))
    assert t.read().count() == 5
    assert t.read(snapshot_id=1).count() == 10
    ops = [s["operation"] for s in t.snapshots()]
    assert ops == ["append", "overwrite"]


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_docs(spark, 0, 10))
    bad = spark.range(5).selectExpr("id AS doc_id", "id * 2 AS other")
    with pytest.raises(SnapshotTableError, match="schema mismatch"):
        t.append(bad)
    # overwrite may change schema (new table history branch)
    t.overwrite(bad)
    assert set(t.read().columns) == {"doc_id", "other"}


def test_stats_skipping_prunes_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["doc_id"])
    # three commits with disjoint doc_id ranges -> disjoint file stats
    t.append(_docs(spark, 0, 100).coalesce(1))
    t.append(_docs(spark, 100, 200).coalesce(1))
    t.append(_docs(spark, 200, 300).coalesce(1))
    st = t.scan_stats(where=("doc_id", ">=", 250))
    assert st["total_files"] == 3
    assert st["kept_files"] == 1
    assert st["kept_rows"] == 100
    # the pruned read is a HINT: kept files still carry the full range,
    # the residual filter is the caller's job
    got = {r["doc_id"] for r in
           t.read(where=("doc_id", ">=", 250))
           .filter("doc_id >= 250").collect()}
    assert got == set(range(250, 300))
    # equality prune on a string stat column
    t2 = SnapshotTable(spark, str(tmp_path / "t2"), stat_cols=["fp"])
    t2.append(_docs(spark, 0, 50).coalesce(1))
    fp = _docs(spark, 0, 1).collect()[0]["fp"]
    assert t2.scan_stats(where=("fp", "=", fp))["kept_files"] == 1
    assert t2.scan_stats(where=("fp", "=", "~~~~"))["kept_files"] == 0


def test_empty_prune_preserves_schema(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["doc_id"])
    t.append(_docs(spark, 0, 10).coalesce(1))
    df = t.read(where=("doc_id", ">", 10_000))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "fp"]


def test_commit_race_retries_against_new_current(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["doc_id"])
    t.append(_docs(spark, 0, 10))
    # simulate a racing writer owning snapshot 2: pre-create its manifest
    # (content = a valid overwrite manifest) and advance _current
    race = {
        "snapshot_id": 2, "parent_id": 1, "operation": "overwrite",
        "schema": [["doc_id", "bigint"], ["fp", "string"]],
        "stat_cols": ["doc_id"], "files": [],
    }
    mpath = os.path.join(str(tmp_path / "t"), "_manifests", "snap-0000000002.json")
    with open(mpath, "w") as f:
        json.dump(race, f)
    with open(os.path.join(str(tmp_path / "t"), "_current"), "w") as f:
        f.write("2")
    # our append must land as snapshot 3 on top of the racer's snapshot 2
    sid = t.append(_docs(spark, 10, 20))
    assert sid == 3
    assert t.read().count() == 10  # racer's table was empty + our 10
    assert t.manifest()["parent_id"] == 2


def test_failed_writer_leaves_table_readable(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_docs(spark, 0, 10))
    # a crashed writer: data files written, no manifest commit
    orphan = os.path.join(str(tmp_path / "t"), "data", "9999999999-dead")
    _docs(spark, 0, 5).write.parquet(orphan)
    assert t.read().count() == 10  # readers never list data/
    assert t.current_snapshot_id() == 1


def test_exhausted_retries_raise_commit_conflict(spark, tmp_path, monkeypatch):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_docs(spark, 0, 5))

    real_open = os.open

    def always_exists(path, flags, *a, **k):
        if "_manifests" in str(path) and (flags & os.O_EXCL):
            raise FileExistsError(path)
        return real_open(path, flags, *a, **k)

    monkeypatch.setattr(os, "open", always_exists)
    with pytest.raises(CommitConflict):
        t._commit([], "append", [("doc_id", "bigint"), ("fp", "string")])


def test_triples_pipeline_into_snapshot_table(spark, tmp_path):
    """End-to-end: the KG pipeline's deduped triples land in a snapshot
    table; a second corpus load APPENDS instead of rewriting the graph."""
    from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline
    from claimskg_generator_spark.sources.synth import synthesize_corpus

    pipe = ClaimsKGPipeline(spark)
    t = SnapshotTable(spark, str(tmp_path / "g"), stat_cols=["pred", "subj"])
    t1 = pipe.triples(synthesize_corpus(spark, 5, seed=42))
    t.append(t1.repartition(2))
    n1 = t.read().count()
    assert n1 == t1.count()
    t2 = pipe.triples(synthesize_corpus(spark, 5, seed=99))
    t.append(t2.repartition(2))
    assert t.read().count() == n1 + t2.count()
    assert t.read(snapshot_id=1).count() == n1
    # predicate skipping works over the pred stat column
    st = t.scan_stats(where=("pred", "=", "http://nonexistent/pred"))
    assert st["kept_files"] < st["total_files"] or st["kept_files"] == 0
