"""Code-corpus KG construction (operators/code_kg.py): triple
extraction, uuid5-minting parity, entity linking, canonicalization,
and snapshot-table materialization with lineage.

The md5-URN value semantics are pinned by the driver oracles
(q98/q99/q100); these tests cover what SQL cannot reach — the uuid5
scheme against Python stdlib, the materialized table's contents and
lineage invariants, and the guard rails.
"""

import hashlib
import uuid

import pytest
from pyspark.sql import functions as F

from claimskg_generator_spark.operators.code_kg import (
    P_IMPORTS,
    P_SHA256,
    RDF_TYPE,
    T_MODULE,
    T_SOURCE_FILE,
    canonicalize_modules,
    code_kg_lineage,
    code_triples,
    link_modules,
    materialize_code_kg,
    mint_uri,
)
from claimskg_generator_spark.sources.codesynth import code_files


@pytest.fixture(scope="module")
def files(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta Gamma delta{i} epsilon zeta eta theta") for i in
         range(60)],
        "doc_id bigint, text string",
    )
    return code_files(docs).cache()


def test_mint_uri_uuid5_matches_stdlib(spark):
    df = spark.createDataFrame([("r1",), ("r2",)], "k string")
    got = {
        r["k"]: r["u"]
        for r in df.select(
            "k", mint_uri("repo", F.col("k"), scheme="uuid5").alias("u")
        ).collect()
    }
    for k, u in got.items():
        want = "urn:uuid:" + str(uuid.uuid5(uuid.NAMESPACE_URL, f"repo:{k}"))
        assert u == want


def test_mint_uri_rejects_unknown_scheme():
    with pytest.raises(ValueError, match="scheme"):
        mint_uri("repo", F.lit("x"), scheme="sha9000")


def test_code_triples_sha256_invariant(files):
    """Every file contributes exactly one sha256 triple whose object is
    the Python-recomputed content digest (the north rule's per-row
    invariant as a graph fact)."""
    rows = files.select("repo", "path", "content").collect()
    sha = code_triples(files).filter(F.col("pred") == P_SHA256)
    got = {r["subj"]: r["obj"] for r in sha.collect()}
    assert len(got) == len(rows)
    for r in rows:
        key = f"file:{r['repo']}/{r['path']}"
        subj = "urn:code:file:" + hashlib.md5(key.encode()).hexdigest()
        want = hashlib.sha256(r["content"].encode()).hexdigest()
        assert got[subj] == want


def test_code_triples_import_edges_link_typed_modules(files):
    t = code_triples(files).cache()
    imports = t.filter(F.col("pred") == P_IMPORTS)
    assert imports.count() > 0
    # every import edge's object is a typed Module node
    module_nodes = t.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == T_MODULE)
    ).select(F.col("subj").alias("obj"))
    dangling = imports.join(module_nodes, "obj", "left_anti")
    assert dangling.count() == 0
    # and every subject of an import edge is a typed SourceFile
    file_nodes = t.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == T_SOURCE_FILE)
    ).select(F.col("subj"))
    dangling = imports.select("subj").join(file_nodes, "subj", "left_anti")
    assert dangling.count() == 0
    t.unpersist()


def test_code_triples_set_semantics(files):
    t = code_triples(files)
    assert t.count() == t.distinct().count()


def test_canonicalize_collapses_case_variants(spark):
    """Files importing NumPy / numpy / NUMPY collapse under one lowercase
    surface with the most frequent raw spelling canonical."""
    rows = [
        ("r1", f"a/f{i}.py", "c", "python", f"import {m}")
        for i, m in enumerate(
            ["NumPy", "NumPy", "numpy", "NUMPY", "NumPy", "requests"])
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    out = {r["surface"]: r for r in canonicalize_modules(df).collect()}
    assert out["numpy"]["n_mentions"] == 5
    assert out["numpy"]["n_entities"] == 3
    assert out["numpy"]["canonical_entity"] == "NumPy"
    assert out["requests"]["canonical_entity"] == "requests"


def test_link_modules_confidence_gate(files):
    links = link_modules(files, min_repos=2, threshold=0.25)
    rows = links.collect()
    assert rows
    for r in rows:
        assert r["n_repos"] >= 2
        assert r["confidence"] >= 0.25
        assert r["entity_uri"].startswith("urn:code:module:")
    # per lang, the head module links at confidence 1.0
    heads = {(r["lang"], r["confidence"]) for r in rows}
    for lang in {r["lang"] for r in rows}:
        assert (lang, 1.0) in heads


def test_link_modules_guards(files):
    with pytest.raises(ValueError, match="min_repos"):
        link_modules(files, min_repos=0)
    with pytest.raises(ValueError, match="threshold"):
        link_modules(files, threshold=1.5)


def test_lineage_invariants(files):
    lin = code_kg_lineage(files).collect()
    assert sum(r["n_rows"] for r in lin) == files.count()
    # pre-dedup emission count: 8 fixed + 3 per distinct import
    n_imports = (
        files.select(
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        "content",
                        F.lit(r"(?m)^import ([A-Za-z_][A-Za-z0-9_]*)$"), 1)
                )
            )
        ).count()
    )
    py_files = files.filter(F.col("lang") == "python")
    # cross-check on the python subset alone (single known pattern)
    lin_py = code_kg_lineage(py_files).collect()
    n_py_imports = (
        py_files.select(
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        "content",
                        F.lit(r"(?m)^import ([A-Za-z_][A-Za-z0-9_]*)$"), 1)
                )
            )
        ).count()
    )
    assert (sum(r["n_triples_emitted"] for r in lin_py)
            == 8 * py_files.count() + 3 * n_py_imports)
    assert n_imports >= n_py_imports
    for r in lin:
        assert len(r["content_sha256"]) == 64


def test_prov_lineage_triples_fingerprint_and_shape(spark, files):
    """The PROV-O face of the lineage sidecar: 8 facts per repo, the
    content fingerprint recomputed in pure Python (sha256 over the
    SORTED per-file content sha256 hexes), counts consistent with
    code_kg_lineage's row-local emission formula."""
    from claimskg_generator_spark.operators.code_kg import (
        P_N_FILES,
        P_N_TRIPLES,
        P_USED,
        P_WAS_DERIVED_FROM,
        T_PROV_ACTIVITY,
        T_PROV_ENTITY,
        prov_lineage_triples,
    )

    trips = prov_lineage_triples(files).collect()
    repos = {r["repo"] for r in files.select("repo").distinct().collect()}
    assert len(trips) == 8 * len(repos)

    by_subj = {}
    for t in trips:
        by_subj.setdefault(t["subj"], {}).setdefault(t["pred"], t["obj"])

    # pick one repo; recompute its facts from the raw frame
    repo = sorted(repos)[0]
    part = ("urn:code:provpart:"
            + hashlib.md5(f"provpart:{repo}".encode()).hexdigest())
    act = ("urn:code:provact:"
           + hashlib.md5(f"provact:{repo}".encode()).hexdigest())
    repo_uri = ("urn:code:repo:"
                + hashlib.md5(f"repo:{repo}".encode()).hexdigest())
    rows = files.filter(F.col("repo") == repo).collect()
    hashes = sorted(
        hashlib.sha256(r["content"].encode()).hexdigest() for r in rows)
    fp = hashlib.sha256("".join(hashes).encode()).hexdigest()

    facts = by_subj[part]
    assert facts[RDF_TYPE] == T_PROV_ENTITY
    assert facts[P_WAS_DERIVED_FROM] == repo_uri
    assert facts[P_SHA256] == fp
    assert facts[P_N_FILES] == str(len(rows))
    assert int(facts[P_N_TRIPLES]) >= 8 * len(rows)
    afacts = by_subj[act]
    assert afacts[RDF_TYPE] == T_PROV_ACTIVITY
    assert afacts[P_USED] == repo_uri


def test_materialize_snapshot_roundtrip(spark, files, tmp_path):
    table_dir = str(tmp_path / "code_kg")
    sid = materialize_code_kg(spark, files, table_dir, n_partitions=4)
    from claimskg_generator_spark.sources.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, table_dir, stat_cols=["pred"])
    assert t.current_snapshot_id() == sid
    back = t.read()
    want = code_triples(files)
    assert back.count() == want.count()
    assert back.exceptAll(want).count() == 0
    # predicate clustering: a single-predicate read prunes files via
    # manifest stats
    stats = t.scan_stats(where=("pred", "=", P_SHA256))
    assert stats["kept_files"] < stats["total_files"]
    # lineage + stage timings ride inside the committed manifest
    m = t.manifest()
    assert "lineage_path" in m and "stage_wall_s" in m
    lin = spark.read.parquet(m["lineage_path"])
    assert (sum(r["n_rows"] for r in lin.collect()) == files.count())


def test_triple_diff_exact_delta(spark):
    from claimskg_generator_spark.operators.code_kg import triple_diff

    sch = "subj string, pred string, obj string, okind string"
    old = spark.createDataFrame(
        [("a", "p", "1", ""), ("b", "p", "2", ""), ("c", "p", "3", ""),
         ("c", "p", "3", "")],  # storage duplicate: set semantics
        sch)
    new = spark.createDataFrame(
        [("a", "p", "1", ""), ("b", "p", "9", ""), ("d", "p", "4", "")],
        sch)
    got = {(r["subj"], r["obj"], r["change"])
           for r in triple_diff(old, new).collect()}
    assert got == {("b", "9", "added"), ("d", "4", "added"),
                   ("b", "2", "removed"), ("c", "3", "removed")}


def test_diff_snapshots_time_travel(spark, files, tmp_path):
    from claimskg_generator_spark.operators.code_kg import (
        diff_snapshots,
        triple_diff,
    )
    from claimskg_generator_spark.sources.snapshot_table import SnapshotTable

    f1 = files
    f2 = files.filter(F.col("doc_id") % 3 != 1)
    t1, t2 = code_triples(f1), code_triples(f2)
    tbl = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["pred"])
    tbl.overwrite(t1)
    sid2 = tbl.overwrite(t2)
    got = diff_snapshots(tbl, 1, sid2)
    want = triple_diff(t1, t2)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert got.filter(F.col("change") == "added").count() == 0


def test_apply_diff_roundtrip_and_idempotence(spark, files, tmp_path):
    from claimskg_generator_spark.operators.code_kg import (
        apply_diff,
        triple_diff,
    )
    from claimskg_generator_spark.sources.snapshot_table import SnapshotTable

    f2 = files.filter(F.col("doc_id") % 4 != 2)
    t1, t2 = code_triples(files), code_triples(f2)
    tbl = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["pred"])
    tbl.overwrite(t1)
    diff = triple_diff(t1, t2).cache()
    sid = apply_diff(tbl, diff)
    back = tbl.read(sid)
    assert back.count() == t2.count()
    assert back.exceptAll(t2).count() == 0
    # idempotent: re-applying the same delta changes nothing
    sid2 = apply_diff(tbl, diff)
    assert tbl.read(sid2).count() == t2.count()
    assert tbl.read(sid2).exceptAll(t2).count() == 0
    diff.unpersist()
