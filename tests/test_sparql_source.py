"""SPARQL paged fetch (S7) vs a deterministic fake endpoint.

The reference fetches LIMIT/OFFSET pages serially with a redis query-text
memo (claimskg/util/sparql/sparql_offset_fetcher.py); the engine fetches
pages partition-parallel with a filesystem memo.  The fake endpoint
implements exactly the two query shapes the fetcher emits.
"""

import json
import os
import re
import tempfile

import pytest

from claimskg_generator_spark.sources.sparql import (
    SparqlTransportMissing,
    count_query,
    page_query,
    sparql_paged_fetch,
)

ROWS = [{"entity": f"http://ex/e{i}", "label": f"Entity {i}"}
        for i in range(137)]


def _make_fake_transport():
    """LIMIT/OFFSET endpoint over ROWS for the fetcher's two query
    shapes.  Built as a closure so cloudpickle ships it BY VALUE to the
    executor python workers (a test-module-level function pickles by
    reference to a module executors cannot import)."""
    import json as _json
    import re as _re

    rows = list(ROWS)

    def fake_transport(query: str) -> str:
        if "count(distinct *)" in query:
            return _json.dumps({"results": {"bindings": [
                {"count": {"type": "literal", "value": str(len(rows))}}]}})
        m = _re.search(r"LIMIT (\d+) OFFSET (\d+)", query)
        assert m, f"unexpected query: {query}"
        limit, off = int(m.group(1)), int(m.group(2))
        page = [
            {"entity": {"type": "uri", "value": r["entity"]},
             "label": {"type": "literal", "value": r["label"]}}
            for r in rows[off:off + limit]
        ]
        return _json.dumps({"results": {"bindings": page}})

    return fake_transport


fake_transport = _make_fake_transport()


def _make_broken_transport():
    def broken(query: str) -> str:
        raise AssertionError("transport must not be called on a warm cache")
    return broken


_broken_transport = _make_broken_transport()


def test_fetch_all_pages(spark):
    df = sparql_paged_fetch(spark, "?entity rdfs:label ?label",
                            "?entity ?label", page_size=25,
                            transport=fake_transport)
    got = {(r["entity"], r["label"]) for r in df.collect()}
    assert got == {(r["entity"], r["label"]) for r in ROWS}
    # pages fetched in parallel partitions, not one serial loop
    assert df.rdd.getNumPartitions() > 1


def test_missing_binding_yields_null(spark):
    df = sparql_paged_fetch(spark, "?entity rdfs:label ?label",
                            "?entity ?label ?absent", page_size=100,
                            transport=fake_transport)
    rows = df.collect()
    assert len(rows) == len(ROWS)
    assert all(r["absent"] is None for r in rows)


def test_cache_replaces_transport_on_second_run(spark):
    cache = tempfile.mkdtemp(prefix="sparqlcache_")
    df = sparql_paged_fetch(spark, "?e ?p ?o", "?entity ?label",
                            page_size=40, transport=fake_transport,
                            cache_dir=cache)
    n1 = df.count()
    # count probe + ceil(137/40)=4 pages
    assert len(os.listdir(cache)) == 5
    again = sparql_paged_fetch(spark, "?e ?p ?o", "?entity ?label",
                               page_size=40, transport=_broken_transport,
                               cache_dir=cache)
    assert again.count() == n1 == len(ROWS)


def test_query_text_matches_reference_format():
    """Cache keys are the query text (reference keys redis the same way):
    pin the byte format so a warm reference redis dump could be replayed."""
    cq = count_query("?s ?p ?o", prefixes="PREFIX ex: <http://ex/>")
    assert "SELECT count(distinct *) as ?count WHERE {" in cq
    assert cq.startswith("PREFIX ex: <http://ex/>")
    pq = page_query("?s ?p ?o", "?s ?o", 50, 100)
    assert "LIMIT 50 OFFSET 100" in pq
    assert "SELECT ?s ?o WHERE {" in pq


def test_no_transport_raises_clearly(spark):
    with pytest.raises(SparqlTransportMissing, match="transport"):
        sparql_paged_fetch(spark, "?s ?p ?o", "?s", page_size=10)


def test_empty_result_preserves_schema(spark):
    def empty(query):
        if "count(distinct *)" in query:
            return json.dumps({"results": {"bindings": [
                {"count": {"value": "0"}}]}})
        raise AssertionError("no pages expected for an empty endpoint")

    df = sparql_paged_fetch(spark, "?s ?p ?o", "?a ?b", page_size=10,
                            transport=empty)
    assert df.count() == 0
    assert df.columns == ["a", "b"]
