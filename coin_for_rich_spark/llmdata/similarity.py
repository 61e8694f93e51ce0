"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``cosine_knn``  — brute-force cosine top-k: exact baseline. The dot
  product is a fold over ``zip_with`` products — built-in higher-order
  functions, JVM-side, sequential (hence deterministic) per row. One scan,
  one TakeOrdered — no shuffle of the corpus.
- ``lsh_ann_knn`` — random-hyperplane LSH: sign-bit bucket per vector from
  ``n_planes`` deterministic pseudo-random hyperplanes, candidates = same
  bucket (optionally multi-probe within Hamming 1), exact re-rank of
  candidates. At 100 TB the bucket join replaces the full scan per query:
  cost scales with bucket occupancy, not corpus size. For real ANN quality
  use IVF with learned centroids; the plumbing (bucket → join → re-rank) is
  identical.

Vectors are cast to double before any arithmetic (float accumulation drifts).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    The query vector is a literal (broadcast in the plan); cosine is rounded
    to 6 decimals for stable cross-engine ordering, ties broken by id.
    """
    q = [float(x) for x in query_vec]
    qnorm = math.sqrt(sum(x * x for x in q))
    qcol = F.array(*[F.lit(x) for x in q])
    v = _as_double(F.col(vec_col))
    cos = _dot(v, qcol) / (F.sqrt(_dot(v, v)) * F.lit(qnorm))
    out = embeddings.select(
        F.col(id_col),
        F.round(cos, 6).alias("cosine"),
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _plane_weight(plane: int, dim: int) -> Column:
    # Deterministic pseudo-random weight in [-1, 1): xxhash64 of (plane, dim)
    # scaled from the signed-64 range. Stable across sessions and engines.
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return h.cast("double") / F.lit(float(2**63))


def bucket_of(vec_col: Column, dims: int, n_planes: int = 12) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign of <v, plane_p>."""
    v = _as_double(vec_col)
    bits = []
    for p in range(n_planes):
        proj = None
        w = F.array(*[_plane_weight(p, d) for d in range(dims)])
        proj = F.aggregate(
            F.zip_with(v, w, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(0))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket (plus Hamming-1
    neighbor buckets when ``multiprobe``), then exact cosine re-rank.

    Returns the same schema as ``cosine_knn`` plus the candidate count is
    observable via ``.count()`` upstream of the limit.
    """
    dims = len(query_vec)
    bucketed = embeddings.withColumn("_bucket", bucket_of(F.col(vec_col), dims, n_planes))

    # compute the query's bucket with the same expressions on a 1-row frame
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame([(1,)], ["one"]).withColumn(
        "_qb",
        bucket_of(F.array(*[F.lit(float(x)) for x in query_vec]), dims, n_planes),
    )
    qbucket = qdf.first()["_qb"]
    probes = [qbucket] + (
        [qbucket ^ (1 << p) for p in range(n_planes)] if multiprobe else []
    )
    cands = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_knn(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col)
