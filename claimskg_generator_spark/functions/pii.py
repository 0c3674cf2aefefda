"""PII detection / redaction for training-corpus preparation.

Pure JVM column expressions (regexp_extract_all / regexp_replace — no
Python in the plan), with patterns restricted to the lookahead-free subset
shared by Java regex (Spark) and RE2 (DuckDB) so the driver's DuckDB
oracle can re-derive every count and the redacted text byte-for-byte.

Redaction order is fixed (email -> ipv4 -> phone): an IPv4 literal inside
an email's domain would otherwise be double-redacted differently by the
two engines.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java/RE2 patterns: no lookarounds, no backrefs.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_PAT = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_ORDERED = (
    (EMAIL_PAT, "<EMAIL>"),
    (IPV4_PAT, "<IP>"),
    (PHONE_PAT, "<PHONE>"),
)


def _count(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def redact(col: Column) -> Column:
    """Replace every email, IPv4 and phone match with a typed placeholder."""
    for pat, token in _ORDERED:
        col = F.regexp_replace(col, pat, token)
    return col


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII counts + the redacted text.  Adds columns
    (n_emails, n_ipv4, n_phones, redacted) — a pure narrow map, no shuffle,
    fully inside whole-stage codegen at any scale."""
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", _count(c, EMAIL_PAT))
        .withColumn("n_ipv4", _count(c, IPV4_PAT))
        .withColumn("n_phones", _count(c, PHONE_PAT))
        .withColumn("redacted", redact(c))
    )
