"""Distributed Bloom filter — the MEMBERSHIP sketch next to the HLL
distinct-count sketch (`operators/sketches.py`), built for the
cross-corpus contamination question at 100 TB: "is this training shard's
content anywhere in the eval/benchmark corpus?" asked per document
without joining the corpora.

The exact tier (`dedup.cross_corpus_contamination`) shuffles a shingle
join between both corpora; at web scale the eval side is tiny and fixed,
so the right shape is: sketch the eval corpus ONCE into an m-bit Bloom
bitmap (kilobytes, broadcastable), then probe every training document
scan-side — no join, no false negatives (a contaminated doc can never
slip through; false positives go to the exact verifier). This is the
standard Bloom-prefilter → exact-verify cascade.

Representation: the bitmap is a SPARSE RELATION ``(word_idx, bits)`` of
64-bit words — mergeable with ``bit_or`` (union of two filters = one
groupBy), broadcastable when dense, and never a giant driver-side array.

Engine-exactness: the k bit positions are md5-prefix hashes
(``int(md5(item ∥ ':' ∥ i)[:15], 16) % n_bits``) — the same
engine-portable hash family as the winnowing and DSIR tiers — so a
DuckDB twin re-derives the bitmap word-for-word and the membership
column bit-for-bit, INCLUDING the deterministic false positives. The
sign-bit word (bit 63) wraps identically: Java's shiftleft wraps to the
long sign bit, the twin computes the shift in HUGEINT and subtracts 2⁶⁴.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_bucket, md5_bucket_sql

__all__ = ["bloom_build", "bloom_probe", "bloom_positions"]


def bloom_positions(item: Column | str, n_bits: int, k: int) -> Column:
    """Array of the item's ``k`` bit positions in [0, n_bits) — the shared
    md5-prefix family (llmdata/hashing.py) over ``item:i`` salts,
    identical in Spark and DuckDB."""
    c = F.col(item) if isinstance(item, str) else item
    return F.array(
        *[md5_bucket(F.concat(c, F.lit(f":{i}")), n_bits) for i in range(k)]
    )


def _validate(n_bits: int, k: int) -> None:
    if n_bits < 64 or n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a positive multiple of 64, got {n_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def bloom_build(
    items: DataFrame,
    item_col: str,
    n_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Build the sparse bitmap relation ``(word_idx, bits)`` over the
    distinct items (NULL items contribute nothing). One explode (k rows
    per item) and one ``bit_or`` aggregate — map-side combined, mergeable:
    the union of two corpora's filters is ``union().groupBy(word_idx).
    agg(bit_or)``. At most ``n_bits/64`` rows whatever the corpus size."""
    _validate(n_bits, k)
    pos = (
        items.filter(F.col(item_col).isNotNull())
        .select(F.explode(bloom_positions(item_col, n_bits, k)).alias("pos"))
    )
    return (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("word"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("bits"))
    )


def bloom_probe(
    queries: DataFrame,
    bloom: DataFrame,
    item_col: str,
    n_bits: int = 1 << 16,
    k: int = 5,
    out_col: str = "member",
) -> DataFrame:
    """Annotate ``queries`` with a ``member`` boolean: True iff all k of
    the item's bits are set (no false negatives by construction; false
    positives at the standard (1−e^{−kn/m})^k rate go to the exact
    verifier). NULL items probe False.

    The sparse bitmap relation COLLECTS into a dense ``n_bits/64``-long
    array literal (a bounded ≤1024-longs-at-64Kbit collect — index
    metadata, same budget class as the k-means centroids) and the probe
    is then pure per-row column algebra over it: ``forall`` of the k
    positions against ``get(bitmap, pos>>6)``. Zero joins, zero shuffles,
    zero re-aggregation — an earlier explode+regroup draft k-plicated the
    full query row through a shuffle AND collapsed duplicate query rows
    (groupBy over all columns), which is wrong for the duplicate-heavy
    corpora this probe exists to scan; the literal-bitmap probe preserves
    input cardinality exactly."""
    _validate(n_bits, k)
    words = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    dense = [words.get(i, 0) for i in range(n_bits // 64)]
    # SQL text rather than python combinators: the probe's bit test needs
    # an expression-valued shift count, which SQL shiftleft accepts but
    # the pyspark wrapper restricts to literals
    arr_sql = "array(" + ", ".join(f"{w}L" for w in dense) + ")"
    pos_sql = ", ".join(
        md5_bucket_sql(f"concat(`{item_col}`, ':{i}')", n_bits)
        for i in range(k)
    )
    hit_sql = (
        f"coalesce(forall(array({pos_sql}), p -> "
        f"(get({arr_sql}, cast(p div 64 as int)) & "
        f"shiftleft(1L, cast(p % 64 as int))) != 0), false)"
    )
    return queries.withColumn(out_col, F.expr(hit_sql))
