"""The 56-bit md5-prefix hash — the ONE definition of the repo's
engine-portable hash contract.

Every ``hash_mode='md5_56'`` operator (MinHash permutations, SimHash
bit votes, the streaming band index, probe-data salts) derives a signed
long from the first 14 hex chars of an md5: 56 bits, so the unsigned
value always fits a signed long under Spark 4's ANSI casts, and DuckDB
regenerates it bit-for-bit as::

    ('0x' || substr(md5(<expr>), 1, 14))::BIGINT

This module is the single Spark-side home of that expression; the
oracles embed the SQL twin above. Changing either side (hex width,
salt separator) breaks hash parity for every md5_56 oracle at once —
which is exactly why there is one copy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long56(col: Column) -> Column:
    """Signed-long 56-bit md5 prefix of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")
