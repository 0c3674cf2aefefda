"""bloom_semi_join: exactness, superset prefilter, nulls, validation."""

import random

import pytest
from pyspark.sql import functions as F


def _frames(spark, seed=5, n_left=300, n_keys=40):
    rng = random.Random(seed)
    left = spark.createDataFrame(
        [(rng.randrange(1000), i) for i in range(n_left)]
        + [(None, -1)],
        "k long, payload long")
    right = spark.createDataFrame(
        [(rng.randrange(1000),) for _ in range(n_keys)] + [(None,)],
        "k long")
    return left, right


def test_bloom_semi_join_is_exact_semi_join(spark):
    from claimskg_generator_spark.operators.bloomjoin import (
        bloom_semi_join,
    )

    left, right = _frames(spark)
    want = sorted(
        (r.k, r.payload)
        for r in left.join(right.distinct(), "k", "left_semi").collect()
    )
    for wb, d in ((1 << 20, 3), (64, 1), (128, 4)):
        got = sorted(
            (r.k, r.payload)
            for r in bloom_semi_join(
                left, right, "k", width_bits=wb, depth=d
            ).collect()
        )
        assert got == want, (wb, d)


def test_bloom_prefilter_superset_no_false_negatives(spark):
    from claimskg_generator_spark.operators.bloomjoin import (
        bloom_semi_join,
    )

    left, right = _frames(spark, seed=9)
    exact = {
        (r.k, r.payload)
        for r in left.join(right.distinct(), "k", "left_semi").collect()
    }
    pre = {
        (r.k, r.payload)
        for r in bloom_semi_join(
            left, right, "k", width_bits=64, depth=2, verify=False
        ).collect()
    }
    assert exact <= pre
    # null keys never match (and never crash the probe)
    assert all(k is not None for k, _ in pre)


def test_bloom_semi_join_renamed_key_and_validation(spark):
    from claimskg_generator_spark.operators.bloomjoin import (
        bloom_semi_join,
    )

    left = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "id long, v string")
    right = spark.createDataFrame([(2,)], "rid long")
    got = bloom_semi_join(left, right, on="id", right_on="rid").collect()
    assert [(r.id, r.v) for r in got] == [(2, "b")]
    with pytest.raises(ValueError):
        bloom_semi_join(left, right, "id", right_on="rid", depth=0)
    with pytest.raises(ValueError):
        bloom_semi_join(left, right, "id", right_on="rid", width_bits=32)
