"""Byte-level golden test: the pipeline's N-Triples sink over the standard
200-row corpus must reproduce the checked-in fixture exactly (fixture
generated once by the oracle; serialization covered end-to-end)."""

import tempfile

from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline, PipelineConfig
from claimskg_generator_spark.sources.synth import gen_rows

GOLDEN = "golden/claims_200.nt"


def test_ntriples_byte_parity(spark):
    with open(GOLDEN) as f:
        want = sorted(l for l in f.read().splitlines() if l)

    pipe = ClaimsKGPipeline(spark, PipelineConfig(align_duplicated=True))
    out = tempfile.mkdtemp(prefix="golden_nt_") + "/nt"
    pipe.write_ntriples(pipe.run(spark.createDataFrame(gen_rows(200))), out)
    got = sorted(r["value"] for r in spark.read.text(out).collect())

    assert len(got) == len(want), (len(got), len(want))
    diff = [(g, w) for g, w in zip(got, want) if g != w]
    assert not diff, diff[:5]
