"""Generate the driver-oracle goldens for the pipeline queries.

Everything here is derived from the *pure-Python* reference-semantics side
of the repo (oracle.py, functions/uuid5.uuid5_url, the phrase matchers) —
NOT from the Spark engine — so the driver oracles cross-check the Spark
plans against an independent implementation:

- golden/corpus_n500_seed42.parquet: the deterministic synthesized corpus
  at the driver's correctness scale (sf0.01 -> 500 docs -> n=500), written
  driver-side with pyarrow so DuckDB oracles can read the exact rows the
  mapInPandas source generates (purity pinned by test_synth_oracle).
- golden/driver_goldens.json:
  * q21: (pred, okind, n) triple-family counts from ReferenceOracle
  * q23: (cw_a, cw_b, score) reconciliation pairs from oracle.reconcile,
    score quantized HALF_UP to 6 decimals (same as Spark's ROUND)
  * q20: (doc_id, uuid5) over sf0.01 documents via Python stdlib uuid5
  * kw_dim: keyword -> per-vocab concept-match spans from the phrase
    matcher (the broadcast dictionary, embedded into the q24 oracle SQL)

Rerun after any change to sources/synth.py, oracle.py or the matchers:
    python scripts/gen_pipeline_goldens.py
"""

import json
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from claimskg_generator_spark.functions.uuid5 import uuid5_url
from claimskg_generator_spark.oracle import ReferenceOracle
from claimskg_generator_spark.sources.synth import (
    THESAURUS_ENTRIES,
    gen_records,
    gen_rows,
)
from claimskg_generator_spark.sources.thesaurus import build_matchers

N = 500
SEED = 42
THETA = 0.25
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "golden")
SF001_DOCS = "/root/testdata/sf0.01/documents.parquet"
SF001_EMBS = "/root/testdata/sf0.01/embeddings.parquet"


def round6_half_up(x: float) -> float:
    # Spark's ROUND on double: BigDecimal over the shortest repr, HALF_UP.
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)

    # 1. corpus parquet (single file for a stable oracle path)
    rows = gen_rows(N, SEED)
    pd.DataFrame(rows).to_parquet(
        os.path.join(GOLDEN_DIR, f"corpus_n{N}_seed{SEED}.parquet"), index=False
    )

    # 2. reference-semantics oracle over the same records
    oracle = ReferenceOracle(THESAURUS_ENTRIES)
    oracle.generate(gen_records(N, SEED))

    fam = {}
    for _s, p, _o, okind in oracle.triples:
        fam[(p, okind)] = fam.get((p, okind), 0) + 1
    q21 = sorted([p, k, n] for (p, k), n in fam.items())

    q23 = sorted(
        [a, b, round6_half_up(s)] for a, b, s in oracle.reconcile(THETA)
    )

    # 3. q20: uuid5 over the corpus content (Python stdlib twin) — keyed on
    # the corpus, not an sf-dependent table, so the golden holds at any sf
    # whose corpus size is N
    q20 = [[r["path"], uuid5_url(r["content"])] for r in rows]

    # 4. keyword -> concept-span dictionary (broadcast dim for the q24 SQL)
    matchers = build_matchers(THESAURUS_ENTRIES)
    keywords = set()
    for r in gen_records(N, SEED):
        tags = r["extra_tags"]
        if tags:
            parts = tags.split(";") if ";" in tags else tags.split(",")
            keywords.update(p.strip() for p in parts)
    # one row per distinct keyword: full-span concept matches per vocab,
    # encoded as "begin:end" span keys (+ concept URIs for the about-family)
    kw_dim = []
    for kw in sorted(keywords):
        row = [kw]
        for vocab in ("thesoz", "unesco"):
            matches = matchers[vocab].find_keyword_matches(kw)
            row.append([f"{s}:{e}" for _c, _mt, s, e in matches])
        kw_dim.append(row)

    # 5. q31: distinct-keyword Double Metaphone concept matches — the
    # driver-side twin of the metaphone-recognizer matching UDF (same
    # keyword universe as kw_dim; concept/begin/end per vocab in
    # thesoz-then-unesco order, mirroring the query's concat+explode)
    mmatchers = build_matchers(THESAURUS_ENTRIES, recognizer="metaphone")
    q31 = []
    for kw in sorted(keywords):
        for vocab in ("thesoz", "unesco"):
            for c, _mt, s, e in mmatchers[vocab].find_keyword_matches(kw):
                q31.append([kw, c, s, e])

    # 6-8. production xxhash64 dedup paths + Lloyd-trained IVF over the
    # driver's sf0.01 tables, re-derived by the row-at-a-time Python twins
    # in oracle_corpus.py (functions/xxh64.py is the independent stand-in
    # for Spark's xxhash64 — bit-parity pinned by test_xxh64_matches_spark)
    from claimskg_generator_spark.oracle_corpus import (
        ivf_topk_py,
        minhash_lsh_pairs_py,
        simhash_near_dups_py,
    )

    # Scale-keyed: the driver's gate runs at sf0.01 but the local
    # entry-contract replica defaults to sf0.001 — pin BOTH, keyed by
    # md5(text) of doc_id 0 (row counts collide: both scales hold 500
    # docs with different texts, so the content fingerprint is the
    # discriminator the oracle SQL can recompute from its views).
    q28, q29, q30 = {}, {}, {}
    for sf in ("0.001", "0.01"):
        key = duckdb.sql(
            f"SELECT md5(text) FROM '/root/testdata/sf{sf}/"
            "documents.parquet' WHERE doc_id = 0"
        ).fetchone()[0]
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/sf{sf}/"
            "documents.parquet' ORDER BY doc_id"
        ).fetchall()
        q28[key] = [list(r) for r in minhash_lsh_pairs_py(
            docs, n=3, num_hashes=32, bands=8, verify_threshold=0.1)]
        q29[key] = [
            list(r) for r in simhash_near_dups_py(docs, max_hamming=3)]
        embs = [(r[0], [float(x) for x in r[1]]) for r in duckdb.sql(
            f"SELECT vec_id, embedding FROM '/root/testdata/sf{sf}/"
            "embeddings.parquet' ORDER BY vec_id"
        ).fetchall()]
        q30[key] = [list(r) for r in ivf_topk_py(
            embs, [0, 1, 2, 3, 4], k=5, n_centroids=32, n_probe=4,
            n_iters=1, quantize_means=9)]

    # 9. q119: the ClaimsKG publication shapes evaluated by the pure-
    # Python SHACL twin over the reference-semantics oracle triples —
    # independent of the Spark shacl_validate plan it gates
    from claimskg_generator_spark.operators.shacl import (
        claims_shapes,
        python_validate,
    )

    q119 = [list(r) for r in python_validate(oracle.triples,
                                             claims_shapes())]

    out = {"n": N, "seed": SEED, "theta": THETA,
           "q21": q21, "q23": q23, "q20": q20, "kw_dim": kw_dim,
           "q31": q31, "q28": q28, "q29": q29, "q30": q30,
           "q119": q119}
    with open(os.path.join(GOLDEN_DIR, "driver_goldens.json"), "w") as f:
        json.dump(out, f, indent=0)
    print(f"q21 families={len(q21)} q23 pairs={len(q23)} q20 rows={len(q20)} "
          f"kw_dim rows={len(kw_dim)} "
          f"q28 pairs={ {k: len(v) for k, v in q28.items()} } "
          f"q29 pairs={ {k: len(v) for k, v in q29.items()} } "
          f"q30 rows={ {k: len(v) for k, v in q30.items()} } "
          f"q119 violations={len(q119)}")


if __name__ == "__main__":
    main()
