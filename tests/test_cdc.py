"""cdc_apply — batch MERGE INTO semantics (latest-wins fold + full-outer
apply).  Reference analog: the generator's regenerate-the-whole-graph
model has no incremental path (claimskg/generator/__init__.py builds
every run from scratch); cdc_apply is the operation a lakehouse user
needs to keep the triple/dimension snapshot current without a full
rebuild, and the batch twin of streaming/scd (operators/asof.scd2_join
consumes the table this maintains)."""

import pytest

from pyspark.sql import Row, functions as F

from claimskg_generator_spark.operators.cdc import cdc_apply


def _target(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a", n=10),
         Row(k=2, v="b", n=20),
         Row(k=3, v="c", n=30)]
    )


def _rows(df):
    return {r["k"]: (r["v"], r["n"]) for r in df.collect()}


def test_upsert_delete_insert_passthrough(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=5, op="U", v="a2", n=11),   # update existing
         Row(k=2, ts=5, op="D", v=None, n=None),  # delete existing
         Row(k=9, ts=5, op="U", v="z", n=90)]     # insert new key
    )
    out = cdc_apply(_target(spark), changes, key="k")
    assert _rows(out) == {1: ("a2", 11), 3: ("c", 30), 9: ("z", 90)}
    assert out.columns == ["k", "v", "n"]


def test_latest_wins_and_delete_then_reinsert(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=1, op="U", v="old", n=0),
         Row(k=1, ts=3, op="U", v="new", n=1),
         Row(k=1, ts=2, op="U", v="mid", n=2),
         # k=2: delete at ts=1 then re-insert at ts=2 -> upsert wins
         Row(k=2, ts=1, op="D", v=None, n=None),
         Row(k=2, ts=2, op="U", v="back", n=99),
         # k=3: update then delete -> gone
         Row(k=3, ts=1, op="U", v="x", n=7),
         Row(k=3, ts=2, op="D", v=None, n=None)]
    )
    out = cdc_apply(_target(spark), changes, key="k")
    assert _rows(out) == {1: ("new", 1), 2: ("back", 99)}


def test_delete_absent_key_is_noop(spark):
    changes = spark.createDataFrame(
        [Row(k=42, ts=1, op="D", v=None, n=None)],
        schema="k bigint, ts int, op string, v string, n bigint")
    out = cdc_apply(_target(spark), changes, key="k")
    assert _rows(out) == _rows(_target(spark))


def test_null_op_upserts(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=1, op=None, v="nu", n=-1)],
        schema="k int, ts int, op string, v string, n int")
    out = cdc_apply(_target(spark), changes, key="k")
    assert _rows(out)[1] == ("nu", -1)


def test_tiebreak_column(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=1, seq=1, op="U", v="lo", n=1),
         Row(k=1, ts=1, seq=2, op="U", v="hi", n=2)]
    )
    out = cdc_apply(_target(spark), changes, key="k",
                    tiebreak_col="seq")
    assert _rows(out)[1] == ("hi", 2)


def test_missing_columns_raise(spark):
    changes = spark.createDataFrame([Row(k=1, ts=1, op="U", v="a")])
    with pytest.raises(ValueError, match="missing columns"):
        cdc_apply(_target(spark), changes, key="k")


def test_broadcast_changes_plan_and_parity(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=1, op="U", v="a2", n=11),
         Row(k=2, ts=1, op="D", v="x", n=0),
         Row(k=9, ts=1, op="U", v="z", n=90),
         Row(k=8, ts=1, op="D", v="x", n=0)]
    )
    out = cdc_apply(_target(spark), changes, key="k",
                    broadcast_changes=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # The target is never sort-merge-joined (i.e. never shuffled for
    # the apply); only the tiny folded/anti side may exchange.
    assert "SortMergeJoin" not in plan
    expect = cdc_apply(_target(spark), changes, key="k",
                       broadcast_changes=False)
    assert _rows(out) == _rows(expect)
    assert _rows(out) == {1: ("a2", 11), 3: ("c", 30), 9: ("z", 90)}


def test_extra_change_columns_ignored(spark):
    changes = spark.createDataFrame(
        [Row(k=1, ts=1, op="U", v="a2", n=11, junk="zz")])
    out = cdc_apply(_target(spark), changes, key="k")
    assert out.columns == ["k", "v", "n"]
    assert _rows(out)[1] == ("a2", 11)
