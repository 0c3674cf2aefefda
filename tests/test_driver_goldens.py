"""Freshness guards for the checked-in driver-oracle goldens: if synth.py,
oracle.py, or the matchers change, these fail until
scripts/gen_pipeline_goldens.py is re-run."""

import json
import os

import pandas as pd
import pytest

from claimskg_generator_spark.oracle import ReferenceOracle
from claimskg_generator_spark.sources.synth import (
    THESAURUS_ENTRIES,
    gen_records,
    gen_rows,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.path.join(REPO, "golden", "corpus_n500_seed42.parquet")
GOLDENS = os.path.join(REPO, "golden", "driver_goldens.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS) as f:
        return json.load(f)


def test_corpus_parquet_matches_generator(goldens):
    """The checked-in corpus parquet must be byte-identical to the rows the
    distributed mapInPandas source generates (both call make_row)."""
    got = pd.read_parquet(CORPUS).to_dict("records")
    want = gen_rows(goldens["n"], goldens["seed"])
    assert got == want


def test_q21_golden_fresh(goldens):
    oracle = ReferenceOracle(THESAURUS_ENTRIES)
    oracle.generate(gen_records(goldens["n"], goldens["seed"]))
    fam = {}
    for _s, p, _o, okind in oracle.triples:
        fam[(p, okind)] = fam.get((p, okind), 0) + 1
    want = sorted([p, k, n] for (p, k), n in fam.items())
    assert [list(r) for r in goldens["q21"]] == want


def test_kw_dim_fresh(goldens):
    from claimskg_generator_spark.sources.thesaurus import build_matchers

    matchers = build_matchers(THESAURUS_ENTRIES)
    for kw, th, un in goldens["kw_dim"]:
        for vocab, spans in (("thesoz", th), ("unesco", un)):
            want = [f"{s}:{e}" for _c, _mt, s, e
                    in matchers[vocab].find_keyword_matches(kw)]
            assert spans == want, (kw, vocab)
