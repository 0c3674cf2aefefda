"""time_bucket_rollup / rollup_merge — the continuous-aggregate monoid
identity merge(rollup(a), rollup(b)) == rollup(a ∪ b), late-data
maintenance, and the loud rejection of non-decomposable measures."""

import datetime
import random

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.rollup import (
    rollup_merge,
    time_bucket_rollup,
)

def _measures():
    # built lazily: F.lit/F.col need an active session in classic mode
    return [
        ("n", "count", F.lit(1)),
        ("s", "sum", F.col("v").cast("decimal(18,6)")),
        ("lo", "min", F.col("v")),
        ("hi", "max", F.col("v")),
    ]


def _events(spark, n=400, seed=7):
    rng = random.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i,
         t0 + datetime.timedelta(seconds=rng.randrange(0, 7 * 86400)),
         rng.choice(["view", "click", "error"]),
         round(rng.uniform(-5, 50), 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, k string, v double")


def _key(rows):
    return {(r["bucket"], r["k"]): (r["n"], r["s"], r["lo"], r["hi"])
            for r in rows}


@pytest.mark.parametrize("bucket", [3600, "hour"])
def test_merge_of_increments_equals_whole(spark, bucket):
    ev = _events(spark)
    whole = time_bucket_rollup(ev, "ts", bucket, ["k"], _measures())
    parts = [
        time_bucket_rollup(ev.filter(F.col("event_id") % 3 == i),
                           "ts", bucket, ["k"], _measures())
        for i in range(3)
    ]
    merged = rollup_merge(rollup_merge(parts[0], parts[1], ["k"],
                                       _measures()),
                          parts[2], ["k"], _measures())
    assert _key(merged.collect()) == _key(whole.collect())


def test_hour_unit_equals_3600_width_for_epoch_buckets(spark):
    ev = _events(spark, n=100)
    by_width = time_bucket_rollup(ev, "ts", 3600, ["k"], _measures())
    by_unit = time_bucket_rollup(ev, "ts", "hour", ["k"], _measures())
    w = {(r["bucket"], r["k"]): r["n"] for r in by_width.collect()}
    u = {(int(r["bucket"].replace(
            tzinfo=datetime.timezone.utc).timestamp()), r["k"]): r["n"]
         for r in by_unit.collect()}
    assert w == u


def test_late_data_increment(spark):
    ev = _events(spark, n=300)
    on_time = ev.filter(F.col("event_id") < 250)
    late = ev.filter(F.col("event_id") >= 250)  # old ts, new arrival
    r = time_bucket_rollup(on_time, "ts", 86400, ["k"], _measures())
    inc = time_bucket_rollup(late, "ts", 86400, ["k"], _measures())
    maintained = rollup_merge(r, inc, ["k"], _measures())
    fresh = time_bucket_rollup(ev, "ts", 86400, ["k"], _measures())
    assert _key(maintained.collect()) == _key(fresh.collect())


def test_non_decomposable_measure_rejected(spark):
    ev = _events(spark, n=10)
    with pytest.raises(ValueError, match="not re-aggregatable"):
        time_bucket_rollup(ev, "ts", 3600, ["k"],
                           [("med", "median", F.col("v"))])
    with pytest.raises(ValueError, match="bucket width"):
        time_bucket_rollup(ev, "ts", 0, ["k"], _measures())


def test_rollup_is_single_exchange(spark):
    ev = _events(spark, n=50)
    plan = (time_bucket_rollup(ev, "ts", 3600, ["k"], _measures())
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # one combinable groupBy


def test_distinct_per_bucket_via_hll_registers_merges(spark):
    """The routing the rejection message prescribes: distinct-count
    rollup measures ride hll_registers keyed by the bucket — register
    frames from disjoint event slices merge (register-wise max) to
    exactly the whole-corpus registers, so bucketed distinct counts
    maintain incrementally like any monoid measure."""
    from claimskg_generator_spark.operators.rollup import (
        time_bucket_rollup,
    )
    from claimskg_generator_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_register_cols,
        hll_registers,
    )

    ev = _events(spark, n=500)
    bucketed = ev.select(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                 / F.lit(86400 * 1_000_000)) * 86400)
        .cast("long").alias("bucket"),
        "event_id", "k",
    ).withColumn("member", F.concat_ws("|", "k", "event_id"))

    whole = hll_estimate(
        hll_registers(bucketed, "member", by=["bucket"], p=8), p=8)
    parts = [hll_registers(bucketed.filter(F.col("event_id") % 2 == i),
                           "member", by=["bucket"], p=8)
             for i in range(2)]
    merged = hll_estimate(hll_merge(*parts), p=8)
    w = {r["bucket"]: r["est_distinct"] for r in whole.collect()}
    m = {r["bucket"]: r["est_distinct"] for r in merged.collect()}
    assert w == m and len(w) > 3
    # and the plain monoid measures agree with the same bucketing
    counts = {r["bucket"]: r["n"] for r in time_bucket_rollup(
        ev, "ts", 86400, [], _measures()).collect()}
    assert set(counts) == set(w)


def test_gap_fill_spine_locf_and_leading_gap(spark):
    from claimskg_generator_spark.operators.rollup import gap_fill

    rolled = spark.createDataFrame(
        [("a", 100, 2, 5.0), ("a", 130, 1, 7.0), ("b", 200, 3, 1.0)],
        "k string, bucket long, n long, v double")
    out = {(r["k"], r["bucket"]): (r["n"], r["v"], r["filled"])
           for r in gap_fill(rolled, 10, ["k"], locf_cols=["v"],
                             zero_cols=["n"]).collect()}
    # a spans 100..130 -> 4 buckets; b a single bucket
    assert set(out) == {("a", 100), ("a", 110), ("a", 120), ("a", 130),
                        ("b", 200)}
    assert out[("a", 110)] == (0, 5.0, True)   # zero count, LOCF value
    assert out[("a", 120)] == (0, 5.0, True)
    assert out[("a", 130)] == (1, 7.0, False)  # observation untouched
    assert out[("b", 200)] == (3, 1.0, False)

    # a column in neither fill list stays NULL on gaps; a leading gap
    # has nothing to carry (spine starts at the per-key MIN, so force
    # one with explicit NULL observations)
    rolled2 = spark.createDataFrame(
        [("a", 0, None), ("a", 20, 3.0)],
        "k string, bucket long, v double")
    got = {r["bucket"]: (r["v"], r["filled"])
           for r in gap_fill(rolled2, 10, ["k"],
                             locf_cols=["v"]).collect()}
    assert got[0] == (None, False)    # nothing to carry yet
    assert got[10] == (None, True)
    assert got[20] == (3.0, False)

    import pytest as _pt
    with _pt.raises(ValueError, match="step"):
        gap_fill(rolled, 0, ["k"])


def test_gap_fill_preserves_off_grid_observations(spark):
    """An observation off the min-anchored step grid (caller step
    disagrees with the input bucketing) stays in the output as its own
    spine row — the gapfill never loses data."""
    from claimskg_generator_spark.operators.rollup import gap_fill

    rolled = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 3600, 2.0), ("a", 90000, 3.0)],
        "k string, bucket long, v double")
    out = {r["bucket"]: (r["v"], r["filled"])
           for r in gap_fill(rolled, 86400, ["k"],
                             locf_cols=["v"]).collect()}
    # grid: 0, 86400 (min-anchored); observed off-grid: 3600, 90000
    assert set(out) == {0, 3600, 86400, 90000}
    assert out[3600] == (2.0, False)
    assert out[90000] == (3.0, False)
    assert out[86400] == (2.0, True)  # LOCF from the 3600 observation
