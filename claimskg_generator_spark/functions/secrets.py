"""Credential / secret detection and redaction for code corpora.

The code-corpus counterpart of functions/pii.py: pure JVM column
expressions (regexp_extract_all / regexp_replace — no Python in the
plan), patterns restricted to the lookahead-free subset shared by Java
regex (Spark) and RE2 (DuckDB) so the driver oracle re-derives every
count and the redacted text byte-for-byte.

Redaction order is fixed (AWS key id -> GitHub PAT -> PEM header): the
patterns are disjoint over their alphabets here, but a fixed order keeps
the two engines byte-identical if a future pattern overlaps.

Pattern sources (all public): AWS access key ids are ``AKIA`` + 16
uppercase base-32-ish chars; GitHub fine/classic PATs are ``ghp_`` + 36
base-62 chars; PEM private-key blocks open with the RFC 7468
``-----BEGIN ... PRIVATE KEY-----`` encapsulation boundary.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AWS_KEY_PAT = r"AKIA[0-9A-Z]{16}"
GH_TOKEN_PAT = r"ghp_[A-Za-z0-9]{36}"
PEM_PAT = r"-----BEGIN [A-Z ]{0,24}PRIVATE KEY-----"

_ORDERED = (
    (AWS_KEY_PAT, "<AWSKEY>"),
    (GH_TOKEN_PAT, "<GHTOKEN>"),
    (PEM_PAT, "<PEMKEY>"),
)


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def redact_secrets(col: Column) -> Column:
    """Replace every AWS key id, GitHub PAT and PEM private-key header
    with a typed placeholder."""
    for pat, token in _ORDERED:
        col = F.regexp_replace(col, pat, token)
    return col


def with_secret_scan(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-row secret counts + the redacted content.  Adds columns
    (n_awskeys, n_ghtokens, n_pemkeys, redacted) — a pure narrow map, no
    shuffle, fully inside whole-stage codegen at any scale."""
    c = F.col(content_col)
    return (
        df.withColumn("n_awskeys", _count(c, AWS_KEY_PAT))
        .withColumn("n_ghtokens", _count(c, GH_TOKEN_PAT))
        .withColumn("n_pemkeys", _count(c, PEM_PAT))
        .withColumn("redacted", redact_secrets(c))
    )
