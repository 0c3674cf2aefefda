"""psi_drift vs a naive Python replay, plus edge semantics."""

import math
import random

import pytest


def _naive_psi(ref, cur, edges, alpha=0.5):
    def bin_of(v):
        if v is None:
            return -1
        return sum(1 for e in edges if e <= v)

    n_bins = len(edges) + 2
    out = {}
    nr = {b: 0 for b in range(-1, len(edges) + 1)}
    nc = dict(nr)
    for v in ref:
        nr[bin_of(v)] += 1
    for v in cur:
        nc[bin_of(v)] += 1
    tr, tc = sum(nr.values()), sum(nc.values())
    for b in nr:
        pr = (nr[b] + alpha) / (tr + alpha * n_bins)
        pc = (nc[b] + alpha) / (tc + alpha * n_bins)
        out[b] = (nr[b], nc[b],
                  round((pc - pr) * math.log(pc / pr), 6))
    return out


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x double")


def test_psi_drift_matches_naive_with_nulls_and_empty_bins(spark):
    from claimskg_generator_spark.operators.drift import psi_drift

    rng = random.Random(31)
    ref = [rng.uniform(0, 10) for _ in range(200)] + [None] * 5
    # shifted distribution + an out-of-range tail
    cur = [rng.uniform(3, 15) for _ in range(150)]
    edges = [2.0, 4.0, 6.0, 8.0]
    got = {
        r.bin: (r.n_ref, r.n_cur, r.psi_contrib)
        for r in psi_drift(_df(spark, ref), _df(spark, cur),
                           "x", edges).collect()
    }
    assert got == _naive_psi(ref, cur, edges)
    assert set(got) == set(range(-1, 5))  # every bin present
    total = sum(c for _, _, c in got.values())
    assert total > 0.1  # the shift is visible


def test_psi_drift_identical_snapshots_near_zero(spark):
    from claimskg_generator_spark.operators.drift import psi_drift

    vals = [float(i % 7) for i in range(100)]
    rows = psi_drift(_df(spark, vals), _df(spark, vals),
                     "x", [2.0, 5.0]).collect()
    assert all(abs(r.psi_contrib) < 1e-12 for r in rows)


def test_psi_drift_validates(spark):
    from claimskg_generator_spark.operators.drift import psi_drift

    df = _df(spark, [1.0])
    with pytest.raises(ValueError):
        psi_drift(df, df, "x", [])
    with pytest.raises(ValueError):
        psi_drift(df, df, "x", [1.0, 1.0])
    with pytest.raises(ValueError):
        psi_drift(df, df, "x", [1.0, 2.0], alpha=0.0)
