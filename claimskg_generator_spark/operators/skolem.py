"""Blank-node skolemization — W3C RDF 1.1 Concepts §3.5.

Blank-node labels are DOCUMENT-scoped: ``_:b1`` in two different
Turtle documents denotes two different nodes, so unioning parsed
graphs (sources/turtle.py keeps labels verbatim) silently merges
unrelated nodes, and sinks that cannot express blank nodes (RDF/XML
``rdf:about``, the snapshot table's join-keyed rewrites, SPARQL
endpoints comparing IRIs) need stable identifiers.  The W3C answer is
skolemization: replace every blank node with a fresh, globally unique
IRI minted under an authority the publisher controls.

:func:`skolemize` does this as pure row expressions — zero shuffle,
zero UDF: ``_:label`` becomes ``<authority><md5(scope ':' label)>``
where ``scope`` is the per-document column (so equal labels from
different source documents mint DIFFERENT IRIs, the RDF-correct
scoping) or empty for a single-document graph.  Deterministic —
re-running the pipeline mints the same IRIs, so downstream diffs and
snapshot commits stay stable; the md5 scheme matches the engine's
mint_uri (operators/code_kg.py:114) and is replayable by any engine
with md5 (the full-oracle property).

The reference has no analog: its rdflib graphs keep BNode objects
in-memory and its published ClaimsKG mints URIs for everything
(reference claimskg/generator/__init__.py — no BNode is ever added),
which is exactly why this engine's claims/code KGs never need the
operator; it exists for INGESTED third-party RDF (the S4 Turtle
source path).
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skolemize(triples: DataFrame, authority: str = "urn:skolem:",
              doc_col: str = None) -> DataFrame:
    """Rewrite every blank-node label in ``subj`` / URI-kind ``obj``
    to a deterministic skolem IRI.

    ``triples`` must carry ``(subj, pred, obj, okind)`` — the okind
    column is what distinguishes a blank OBJECT from a plain literal
    that happens to start with ``_:`` (predicates cannot be blank; the
    Turtle source enforces that at parse time).  Extra columns
    (including ``doc_col``) pass through untouched.

    ``doc_col`` names the source-document column for label scoping;
    NULL scopes skolemize like the empty scope.  ``authority`` should
    be a namespace the publisher controls (the W3C convention is
    ``http://…/.well-known/genid/``; the default urn is self-sound).
    """
    scope = (F.coalesce(F.col(doc_col).cast("string"), F.lit(""))
             if doc_col else F.lit(""))

    def sk(col: Column) -> Column:
        return F.concat(F.lit(authority),
                        F.md5(F.concat(scope, F.lit(":"), col)))

    is_blank_subj = F.col("subj").startswith("_:")
    is_blank_obj = (F.col("okind") == "uri") & F.col("obj").startswith("_:")
    return triples.withColumns({
        "subj": F.when(is_blank_subj, sk(F.col("subj")))
                 .otherwise(F.col("subj")),
        "obj": F.when(is_blank_obj, sk(F.col("obj")))
                .otherwise(F.col("obj")),
    })
