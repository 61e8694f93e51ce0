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
import random

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


def plane_weights(dims: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): a fixed-seed
    Mersenne Twister, generated once on the driver. These enter the plan as
    literal double arrays — computing them with per-row hash expressions
    would bloat codegen to n_planes × dims hash calls per input row."""
    rng = random.Random(42)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dims)] for _ in range(n_planes)]


def bucket_of(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign of <v, plane_p>."""
    v = _as_double(vec_col)
    bits = []
    for p, w in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in w]), lambda x, y: x * y),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(0))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _bucket_of_py(vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side twin of ``bucket_of`` for the (single) query vector — the
    same fold order as Spark's sequential ``aggregate``, so signs agree."""
    bucket = 0
    for p, w in enumerate(planes):
        acc = 0.0
        for x, y in zip(vec, w):
            acc += float(x) * y
        if acc >= 0:
            bucket |= 1 << p
    return bucket


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    n_planes: int = 4,
    dims: int | None = None,
) -> DataFrame:
    """All-pairs cosine near-duplicate detection (id_a < id_b, cos ≥ t) —
    the embedding tier of the dedup ladder (llmdata.dedup).

    - ``method='exact'`` — full pairwise join with per-vector norms computed
      once. Quadratic: the calibration/verification baseline, fine to ~10⁴
      vectors.
    - ``method='lsh'`` — candidates restricted to same-LSH-bucket pairs,
      then the same exact cosine verify: every returned pair is a true
      near-dup (precision 1), recall < 1 governed by n_planes. The linear-
      cost scale path: at 10⁹ vectors the bucket self-join shuffles each
      vector once, and missed-pair probability is tuned via fewer planes /
      multiple plane sets, never by scanning all pairs.
    """
    v = _as_double(F.col(vec_col))
    base = embeddings.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.sqrt(_dot(v, v)).alias("norm"),
    )
    if method == "lsh":
        sample = embeddings.select(vec_col).first()
        d = dims or len(sample[0])
        planes = plane_weights(d, n_planes)
        base = base.withColumn("_bucket", bucket_of(F.col("v"), planes))
        cond = (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a.id") < F.col("b.id"))
        a, b = base.alias("a"), base.alias("b")
        cand = a.join(b, cond).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
    else:
        cand = _gemm_candidates(embeddings, threshold, id_col, vec_col)
    # exact verify: the same sequential fold both engines run — candidate
    # generation (GEMM or LSH) only proposes pairs, never decides them
    av = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                     F.col("norm").alias("na"))
    bv = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                     F.col("norm").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _gemm_candidates(
    embeddings: DataFrame, threshold: float, id_col: str, vec_col: str
) -> DataFrame:
    """Exact-recall candidate pairs via one BLAS matrix product.

    The normalized corpus matrix is broadcast to executors; each Arrow batch
    of rows computes ``block @ corpusᵀ`` and emits (id_a < id_b) pairs whose
    GEMM cosine clears ``threshold − ε`` (ε covers summation-order float
    drift, so no true pair is lost; the caller's sequential-fold verify then
    decides exactly). ~n·d flops per row on vectorized BLAS instead of an
    interpreted per-pair fold — two orders of magnitude faster.

    Scale: the broadcast tier works while the corpus matrix fits an executor
    (~10⁶×768 ≈ 3 GB); past that, block-pair the corpus (grid join of row
    blocks, GEMM per block pair) — same emit logic, no all-pairs rows ever
    materialize either way.
    """
    import numpy as np
    import pandas as pd

    rows = embeddings.select(id_col, vec_col).toPandas()
    ids = rows[id_col].to_numpy()
    M = np.stack([np.asarray(x, dtype=np.float64) for x in rows[vec_col]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((ids, Mn))
    eps = 1e-9

    def gen(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy()
            Q = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            G = Qn @ b_mat.T
            qi, bi = np.nonzero(G >= threshold - eps)
            a = q_ids[qi]
            b = b_ids[bi]
            keep = a < b
            yield pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})

    return embeddings.mapInPandas(gen, schema="id_a long, id_b long")


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
    planes = plane_weights(len(query_vec), n_planes)
    bucketed = embeddings.withColumn("_bucket", bucket_of(F.col(vec_col), planes))

    # the query's bucket is pure driver-side arithmetic — no Spark job
    qbucket = _bucket_of_py([float(x) for x in query_vec], planes)
    probes = [qbucket] + (
        [qbucket ^ (1 << p) for p in range(n_planes)] if multiprobe else []
    )
    cands = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_knn(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col)
