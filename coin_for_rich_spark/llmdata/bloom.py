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
from .similarity import _MAX_SQL_LITERALS

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
    array (bounded — the collect is index metadata, same budget class as
    the k-means centroids) and the probe is then pure per-row algebra over
    it. Zero joins, zero shuffles, zero re-aggregation — an earlier
    explode+regroup draft k-plicated the full query row through a shuffle
    AND collapsed duplicate query rows (groupBy over all columns), which
    is wrong for the duplicate-heavy corpora this probe exists to scan;
    the dense-bitmap probe preserves input cardinality exactly.

    Two physical paths, same rule as every literal-SQL consumer in the
    package (`similarity._MAX_SQL_LITERALS`): up to the budget the bitmap
    inlines as a SQL ``array(...)`` literal and the bit test is a codegen'd
    ``forall``; past it (realistic eval corpora want n_bits ~10⁷–10⁸, a
    10⁵–10⁶-element literal that would blow Catalyst analysis/codegen) the
    dense bitmap ships as a numpy broadcast probed in an Arrow
    ``pandas_udf`` over the SAME JVM-computed k positions — bit-identical
    output (pinned in tests/test_bloom.py).

    CONTRACT: ``n_bits`` and ``k`` must match the ``bloom_build`` call
    that produced ``bloom`` — the hash positions are a pure function of
    (item, i, n_bits), so a mismatched geometry silently probes the wrong
    bits. A bitmap wider than ``n_bits`` (word_idx out of range) is
    detected from the collected rows and raises; a mismatched ``k`` is
    undetectable from the bitmap alone and stays on the caller."""
    _validate(n_bits, k)
    n_words = n_bits // 64
    words = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    if words and (max(words) >= n_words or min(words) < 0):
        raise ValueError(
            f"bloom bitmap has word_idx {max(words)} outside n_bits={n_bits} "
            f"({n_words} words) — probe geometry must match bloom_build"
        )
    dense = [words.get(i, 0) for i in range(n_words)]
    pos_sql = ", ".join(
        md5_bucket_sql(f"concat(`{item_col}`, ':{i}')", n_bits)
        for i in range(k)
    )
    if n_words > _MAX_SQL_LITERALS:
        positions = F.when(
            F.col(item_col).isNotNull(), F.expr(f"array({pos_sql})")
        )
        return queries.withColumn(
            out_col, _probe_udf(dense)(positions)
        )
    # SQL text rather than python combinators: the probe's bit test needs
    # an expression-valued shift count, which SQL shiftleft accepts but
    # the pyspark wrapper restricts to literals
    arr_sql = "array(" + ", ".join(f"{w}L" for w in dense) + ")"
    hit_sql = (
        f"coalesce(forall(array({pos_sql}), p -> "
        f"(get({arr_sql}, cast(p div 64 as int)) & "
        f"shiftleft(1L, cast(p % 64 as int))) != 0), false)"
    )
    return queries.withColumn(out_col, F.expr(hit_sql))


def _probe_udf(dense: list[int]):
    """Arrow fallback past the literal budget: the dense bitmap as a
    numpy uint64 broadcast, bit-tested against the JVM-computed position
    arrays. Same arithmetic word-for-word as the literal path — the k
    positions are computed by the identical md5 SQL either way, so the
    only difference is WHERE the bit test runs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    W = np.asarray([w & 0xFFFFFFFFFFFFFFFF for w in dense], dtype=np.uint64)

    # no type hints: `from __future__ import annotations` stringifies them
    # and the hint-based eval-type inference can't resolve 'pd.Series';
    # the bare pandas_udf defaults to SCALAR (same note as semdedup's
    # _affinity_udf)
    @pandas_udf("boolean")
    def hit(poss):
        out = []
        for pos in poss:
            if pos is None:
                out.append(False)  # NULL item probes False, as literal path
                continue
            p = np.asarray(pos, dtype=np.int64)
            out.append(
                bool(
                    (
                        (W[p >> 6] >> (p & 63).astype(np.uint64))
                        & np.uint64(1)
                    ).all()
                )
            )
        return pd.Series(out, dtype="boolean")

    return hit
