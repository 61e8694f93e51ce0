"""The engine-portable md5-prefix hash family — ONE definition for every
tier whose DuckDB twin must re-derive hash values exactly (DSIR feature
buckets, Bloom bit positions, and — since r15 — the winnowing tier's
interned fingerprints).

``int(md5(x)[:15], 16)`` is computable identically in Spark
(``conv(substr(md5(x),1,15),16,10)``) and DuckDB
(``('0x' || substr(md5(x),1,15))::BIGINT``): 15 hex chars = 60 bits,
always non-negative, no signed-overflow edge in either engine. A tweak
here (prefix width, salt scheme) is a cross-engine contract change — the
twins' SQL must move with it."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_long(col: Column | str) -> Column:
    """The 60-bit integer value of the md5 prefix (NULL for NULL input)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_bucket(col: Column | str, n_buckets: int) -> Column:
    """``md5_prefix_long(col) % n_buckets`` — non-negative by construction."""
    return md5_prefix_long(col) % n_buckets


def md5_bucket_sql(expr_sql: str, n_buckets: int) -> str:
    """The same bucket hash as Spark-SQL text — for call sites that must
    build a full ``F.expr`` (e.g. lambdas needing SQL-only operand forms
    like expression-valued shiftleft). MUST stay in lockstep with
    :func:`md5_bucket`."""
    return (
        f"cast(conv(substring(md5({expr_sql}), 1, 15), 16, 10) as bigint)"
        f" % {n_buckets}"
    )
