"""Deterministic URI minting: RFC 4122 UUIDv5 over NAMESPACE_URL.

The reference mints every node id with ``uuid.uuid5(uuid.NAMESPACE_URL,
key)`` (reference claimskg/generator/__init__.py:91-137).  UUIDv5 is just
SHA-1 over ``namespace_bytes + name_utf8`` with version/variant bit surgery,
so we can compute it **entirely JVM-side** with built-in column functions —
no Python in the hot path, whole-stage-codegen friendly
(``uuid5_url_col``).  A pure-Python twin (``uuid5_url``) backs the oracle
and known-answer tests.
"""

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid.NAMESPACE_URL = 6ba7b811-9dad-11d1-80b4-00c04fd430c8
_NAMESPACE_URL_HEX = "6ba7b8119dad11d180b400c04fd430c8"


def uuid5_url(name: str) -> str:
    return str(uuid.uuid5(uuid.NAMESPACE_URL, name))


def uuid5_url_col(name: Column) -> Column:
    """UUIDv5(NAMESPACE_URL, name) as a pure column expression.

    sha1 gives 40 lowercase hex chars; the UUID is the first 32 with the
    version nibble (hex char 13) forced to '5' and the variant nibble (hex
    char 17) forced to 10xx: ``(nibble & 0x3) | 0x8``.
    """
    h = F.sha1(
        F.concat(
            F.lit(bytearray.fromhex(_NAMESPACE_URL_HEX)),
            F.encode(name, "utf-8"),
        )
    )
    variant_nibble = F.lower(
        F.hex(F.pmod(F.conv(F.substring(h, 17, 1), 16, 10).cast("int"), F.lit(4)) + F.lit(8))
    )
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-5"),
        F.substring(h, 14, 3),
        F.lit("-"),
        variant_nibble,
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )
