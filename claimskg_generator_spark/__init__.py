"""claimskg_generator_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference ``claimskg/claimskg_generator`` pipeline.

The reference (at /root/reference, studied for *semantics* only) is a
single-threaded row-at-a-time Python dataflow: CSV of fact-check claim
reviews -> cleaned fields -> deterministic URI minting (uuid5) -> schema.org
ClaimReview-model RDF triples in an in-memory rdflib.Graph -> serialization.

This package re-expresses those semantics as declarative Spark DataFrame
plans:

- ``sources``    input table scan/synthesis ((repo, path, commit, lang,
                 content) records), entity dictionary, claim-record parsing
- ``functions``  column expressions + Arrow-vectorized pandas UDFs (uuid5,
                 cleaning chains, text matching) shared with the pure-Python
                 oracle used for golden testing
- ``operators``  triple-family emission, mention/keyword/citation operators,
                 rating normalization join, dedup/similarity/text-analysis
                 operators for large-scale corpus work
- ``plans``      the end-to-end checkpoint-resumable pipeline + lineage
- ``streaming``  incremental (Structured Streaming) ingest variant

Everything here derives from public knowledge: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
