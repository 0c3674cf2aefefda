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


SF001_DOCS = "/root/testdata/sf0.01/documents.parquet"
SF001_EMBS = "/root/testdata/sf0.01/embeddings.parquet"


def _scale_key(docs_path):
    import duckdb

    return duckdb.sql(
        f"SELECT md5(text) FROM '{docs_path}' WHERE doc_id = 0"
    ).fetchone()[0]


@pytest.mark.skipif(not os.path.exists(SF001_DOCS),
                    reason="driver testdata not present")
@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_q28_q29_goldens_fresh(goldens, sf):
    """The checked-in q28/q29 pair sets (scale-keyed by the doc-0 text
    fingerprint) must equal what the pure-Python xxhash64 twins produce
    over each scale's documents today."""
    import duckdb

    from claimskg_generator_spark.oracle_corpus import (
        minhash_lsh_pairs_py,
        simhash_near_dups_py,
    )

    docs_path = f"/root/testdata/sf{sf}/documents.parquet"
    key = _scale_key(docs_path)
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{docs_path}' ORDER BY doc_id"
    ).fetchall()
    assert [list(r) for r in minhash_lsh_pairs_py(
        docs, n=3, num_hashes=32, bands=8, verify_threshold=0.1)] == \
        [list(r) for r in goldens["q28"][key]]
    assert [list(r) for r in simhash_near_dups_py(docs, max_hamming=3)] == \
        [list(r) for r in goldens["q29"][key]]


@pytest.mark.skipif(not os.path.exists(SF001_EMBS),
                    reason="driver testdata not present")
@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_q30_golden_fresh(goldens, sf):
    import duckdb

    from claimskg_generator_spark.oracle_corpus import ivf_topk_py

    key = _scale_key(f"/root/testdata/sf{sf}/documents.parquet")
    embs = [(r[0], [float(x) for x in r[1]]) for r in duckdb.sql(
        f"SELECT vec_id, embedding FROM '/root/testdata/sf{sf}/"
        "embeddings.parquet' ORDER BY vec_id"
    ).fetchall()]
    assert [list(r) for r in ivf_topk_py(
        embs, [0, 1, 2, 3, 4], k=5, n_centroids=32, n_probe=4, n_iters=1,
        quantize_means=9)] == [list(r) for r in goldens["q30"][key]]


def test_q119_golden_fresh(goldens):
    from claimskg_generator_spark.operators.shacl import (
        claims_shapes,
        python_validate,
    )

    oracle = ReferenceOracle(THESAURUS_ENTRIES)
    oracle.generate(gen_records(goldens["n"], goldens["seed"]))
    want = [list(r) for r in python_validate(oracle.triples,
                                             claims_shapes())]
    assert [list(r) for r in goldens["q119"]] == want
