"""URL/host canonicalization and per-host document caps.

Web-crawl corpora are keyed by URL, and the first two curation moves
every pipeline makes (RefinedWeb §3.1, C4, DCLM) are (1) canonicalize
the host so `HTTPS://WWW.Site.COM:443/x` and `https://site.com/x`
land in the same bucket, and (2) cap how many documents any single
host may contribute, so a boilerplate-heavy mega-site cannot dominate
the training mix.

Scale shape: canonicalization is a pure row expression (regexp + case
folding — stays inside whole-stage codegen, no UDF); the cap is one
window rank partitioned by host.  Hosts are exactly the skewed key a
crawl has (a few hosts with 10^8 pages), but the cap window TOP-K
truncates early under Spark's WindowGroupLimit / rank-pushdown, and a
two-phase salted variant (operators/topk.salted_topk) is the drop-in
when a single host's rows exceed one executor — the rank semantics
here are identical, this module just keeps the common path cheap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)(?::([0-9]+))?"
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}


def canonical_host(url: Column) -> Column:
    """Canonical host of a URL: lowercase, userinfo dropped, leading
    ``www.`` stripped, trailing dot stripped, scheme-default port
    removed (an explicit non-default port stays part of the key).
    NULL/unparseable URLs yield NULL so they stay visible.
    """
    u = F.lower(url)
    scheme = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(u, _HOST_RE, 1)
    port = F.regexp_extract(u, _HOST_RE, 2)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r"\.$", "")
    default = F.coalesce(
        *[F.when(scheme == s, F.lit(p)) for s, p in _DEFAULT_PORTS.items()],
        F.lit(""),
    )
    keep_port = (port != "") & (port != default)
    return F.when(host == "", F.lit(None).cast("string")).otherwise(
        F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    )


def cap_per_host(
    df: DataFrame,
    host_col: str,
    cap: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep at most ``cap`` rows per host, ranked by ``order_by``
    (pass a deterministic total order — tie-break on a unique id).
    Appends ``host_rank`` (1-based).  NULL hosts form their own group
    and are capped too, so junk URLs cannot flood the output.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    w = Window.partitionBy(host_col).orderBy(*order_by)
    return (
        df.withColumn("host_rank", F.row_number().over(w))
        .filter(F.col("host_rank") <= cap)
    )
