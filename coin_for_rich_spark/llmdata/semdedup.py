"""SemDeDup — semantic deduplication in embedding space (Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023): k-means-style clustering of the corpus embeddings,
then WITHIN-CLUSTER cosine pruning, keeping the examples least similar to
their cluster centroid.

This is the dedup ladder's missing rung between the lexical tiers
(shingle Jaccard / MinHash / SimHash — verbatim-ish duplicates) and the
exact pairwise embedding tier (`similarity.embedding_neardup_pairs` —
quadratic flops): clustering scopes the pairwise work to cells, which is
the paper's entire scaling argument (n²/k instead of n²).

Deterministic variant implemented (and the one most reimplementations
use): within a cell, vectors rank by ascending centroid-cosine (ties by
id) — rank 1 is the farthest-from-centroid example SemDeDup prefers to
keep — and a vector is a DUPLICATE iff some higher-ranked (more
keep-worthy) same-cell vector sits within cosine ``tau`` of it. No greedy
chain, no randomness: the whole pass is a pure function of (corpus, k,
tau) and has a full-value DuckDB twin.

Engine-exactness design (same convention as the ``embed_neardup`` gate
row): everything runs on the INT8 storage tier — `quantize_embeddings`
codes cast to double — so every dot product is an exact small integer in
float64 and no summation order anywhere can drift a comparison; the
centroids are `ivf_centroids`' hash-ranked corpus vectors (XXH64-ranked,
re-derivable in closed form by the oracle). Assignment cosine clamps the
row norm (zero vectors score 0, not NaN) exactly like
`_nearest_centroid_expr`; the pair threshold uses unclamped norms exactly
like the near-dup verify fold.

Scale posture: assignment + centroid-cosine is per-row column algebra
against k literal centroids (Arrow-UDF fallback past the literal budget,
same rule as IVF); the rank window shuffles by cell; candidate pairs come
from the CELL-SCOPED blocked-GEMM kernel — ``embedding_neardup_pairs(...,
block_col="cell")`` groups the block-pair grid on (cell, bi, bj), so
cross-cell pairs are never computed and dominance flops are Σ(cell²)
instead of n². That is the paper's entire scaling claim: at 100 TB, k
grows with the corpus (the paper uses ~100k clusters) and per-cell cost
stays bounded; the grid auto-sizes from the LARGEST cell, not the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _INTERMEDIATE_CACHES
from .similarity import (
    _MAX_SQL_LITERALS,
    _dot_sql,
    embedding_neardup_pairs,
    ivf_centroids,
    quantize_embeddings,
)

__all__ = ["semdedup"]


def _affinity_expr(vec_sql: str, centroids: list[list[float]]) -> Column:
    """struct(negcos, cid) of the winning centroid — `_nearest_centroid_
    expr`'s reduction, kept as the full struct so the caller gets the
    assignment cosine too (cell = cid, cos_centroid = −negcos). Ties:
    min struct = max cosine, then lowest cid."""
    row_norm = (
        f"greatest(sqrt(aggregate(zip_with({vec_sql}, {vec_sql}, "
        f"(x, y) -> double(x) * y), 0D, (acc, v) -> acc + v)), 1e-150D)"
    )
    entries = []
    for cid, c in enumerate(centroids):
        cnorm = math.sqrt(sum(x * x for x in c)) or 1e-150
        cos = f"({_dot_sql(vec_sql, c)} / ({row_norm} * {cnorm!r}D))"
        entries.append(f"struct(-{cos} AS negcos, {cid} AS cid)")
    return F.expr(f"array_min(array({', '.join(entries)}))")


def _affinity_udf(centroids: list[list[float]]):
    """Arrow fallback past the literal budget (k·dims > _MAX_SQL_LITERALS
    — any real 768-dim corpus): same arithmetic, vectorized in numpy.
    Int-valued inputs keep every dot exact, so this path is bit-identical
    to the codegen'd expression (pinned in tests)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))
    cnorm = np.where(cnorm == 0.0, 1e-150, cnorm)

    # no type hints: Series -> DataFrame (struct return) confuses the
    # hint-based eval-type inference; the bare SCALAR pandas_udf accepts
    # a DataFrame return for a struct type
    @pandas_udf("struct<negcos: double, cid: int>")
    def aff(vs):
        M = np.stack([np.asarray(x, dtype=np.float64) for x in vs])
        rn = np.sqrt((M * M).sum(axis=1))
        rn = np.maximum(rn, 1e-150)
        cos = (M @ C.T) / (rn[:, None] * cnorm[None, :])
        neg = -cos
        # lexicographic min over (negcos, cid): argmin picks the FIRST
        # minimum — lowest cid on ties, same rule as array_min on structs
        cid = neg.argmin(axis=1)
        return pd.DataFrame(
            {"negcos": neg[np.arange(len(cid)), cid], "cid": cid.astype("int32")}
        )

    return aff


def semdedup(
    embeddings: DataFrame,
    n_clusters: int = 8,
    tau: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id, cell, cos_centroid, rank, keep) for every corpus vector.

    ``keep`` is False iff a same-cell vector with a smaller rank (lower
    centroid-cosine, i.e. more keep-worthy under the paper's rule) lies
    within cosine ``tau``. ``cos_centroid`` is rounded to 6 decimals for
    output (comparisons use the raw value).

    ``centroids`` overrides the hash-sampled default — the same drop-in
    upgrade seam as IVF's (pass ``kmeans_refine`` output for real
    clustering quality; assignment is cosine-based, so any per-vector
    scaling of a centroid is equivalent). The default hash sample keeps
    the whole pass closed-form re-derivable by the DuckDB twin."""
    if n_clusters < 1:
        raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
    # persist: the code relation has THREE consumers (the eager centroid
    # collect, the rank branch, and the GEMM pair kernel's candidate +
    # verify sides) — without it the quantize pipeline re-scans the
    # corpus per consumer (same registry/release discipline as the
    # winnowing tier's shared fingerprint relation)
    codes = (
        quantize_embeddings(embeddings, id_col, vec_col)
        .select(
            F.col(id_col),
            F.transform("qvec", lambda q: q.cast("double")).alias("v"),
        )
        .persist()
    )
    _INTERMEDIATE_CACHES.append(codes)
    cents = (
        [list(map(float, c)) for c in centroids]
        if centroids is not None
        else ivf_centroids(codes, n_clusters, id_col, "v")
    )
    if not cents:  # empty corpus
        return codes.select(
            F.col(id_col),
            F.lit(0).alias("cell"),
            F.lit(0.0).alias("cos_centroid"),
            F.lit(0).alias("rank"),
            F.lit(True).alias("keep"),
        ).limit(0)
    dims = len(cents[0])
    if n_clusters * dims > _MAX_SQL_LITERALS:
        aff = _affinity_udf(cents)(F.col("v"))
    else:
        aff = _affinity_expr("v", cents)
    # assign ONCE, persist: the (id, v, cell) relation feeds both the rank
    # window and the cell-scoped pair kernel — without the persist, the
    # affinity expression (k·dims flops per row) re-evaluates per consumer
    assigned = codes.select(F.col(id_col), F.col("v"), aff.alias("_a")).select(
        F.col(id_col),
        F.col("v"),
        F.col("_a.cid").alias("cell"),
        (-F.col("_a.negcos")).alias("cos_centroid"),
    ).persist()
    _INTERMEDIATE_CACHES.append(assigned)
    ranked = assigned.select(id_col, "cell", "cos_centroid").withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("cell").orderBy(
                F.col("cos_centroid").asc(), F.col(id_col).asc()
            )
        ),
    )
    # CELL-SCOPED pair kernel (the paper's scaling argument made real):
    # block_col="cell" groups the blocked-GEMM grid on (cell, bi, bj), so
    # cross-cell pairs are never computed and dominance flops are Σ(cell²),
    # not n² — pinned in tests/test_semdedup.py (plan key includes `cell`,
    # and a planted cross-cell near-pair never reaches the candidates)
    pairs = embedding_neardup_pairs(
        assigned.select(id_col, "v", "cell"),
        threshold=tau,
        id_col=id_col,
        vec_col="v",
        method="exact",
        block_col="cell",
        # the codes are integer-valued (int8 quantize), so the kernel's
        # cosine is the verify fold's value bit-for-bit and the verify
        # join stage drops out (similarity.int_exact contract)
        int_exact=True,
    )
    meta = ranked.select(F.col(id_col), "rank")
    p = pairs.join(
        meta.select(F.col(id_col).alias("id_a"), F.col("rank").alias("_rank_a")),
        "id_a",
    ).join(
        meta.select(F.col(id_col).alias("id_b"), F.col("rank").alias("_rank_b")),
        "id_b",
    )
    dominated = p.select(
        F.when(F.col("_rank_a") < F.col("_rank_b"), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias(id_col)
    ).distinct()
    return ranked.join(
        dominated.withColumn("_dom", F.lit(True)), id_col, "left"
    ).select(
        F.col(id_col),
        "cell",
        F.round("cos_centroid", 6).alias("cos_centroid"),
        "rank",
        F.col("_dom").isNull().alias("keep"),
    )
