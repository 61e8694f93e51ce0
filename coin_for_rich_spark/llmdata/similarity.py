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

import json
import math
import os
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
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
    # clamp BOTH norms away from zero (same rule as every other norm site
    # here): an all-zero query or row scores cosine 0.0 — without the
    # clamp Spark's Divide yields NULL, NULLs sort last, and the "top k"
    # silently degenerates to the k lowest ids labeled cosine NULL
    qnorm = math.sqrt(sum(x * x for x in q)) or 1e-150
    qcol = F.array(*[F.lit(x) for x in q])
    v = _as_double(F.col(vec_col))
    row_norm = F.greatest(F.sqrt(_dot(v, v)), F.lit(1e-150))
    cos = _dot(v, qcol) / (row_norm * F.lit(qnorm))
    out = embeddings.select(
        F.col(id_col),
        F.round(cos, 6).alias("cosine"),
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return out.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def plane_weights(dims: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): a fixed-seed
    Mersenne Twister, generated once on the driver. These enter the plan as
    literal double arrays — computing them with per-row hash expressions
    would bloat codegen to n_planes × dims hash calls per input row. The
    ``seed`` selects the hash table in multi-table (OR-amplified) LSH."""
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dims)] for _ in range(n_planes)]


def _dot_sql(vec_sql: str, w: list[float]) -> str:
    """<vec, literal weights> as ONE SQL expression string — constant
    weights embedded as double literals instead of per-weight ``F.lit``
    Columns, because literal-by-literal construction is thousands of py4j
    round trips of pure *driver* latency (8 tables × 8 planes × 768 dims);
    the formatted string is two orders of magnitude cheaper to build and
    compiles to the identical sequential fold."""
    if not all(math.isfinite(x) for x in w):
        # repr(nan/inf)+'D' is unparseable SQL; weights come from corpus
        # data via the centroid path, so fail with the real cause instead
        # of a ParseException at plan-build time
        raise ValueError(
            "non-finite weight in literal dot product — the corpus (or a "
            "centroid derived from it) contains NaN/Inf vector components"
        )
    arr = ", ".join(f"{x!r}D" for x in w)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}),"
        " (x, y) -> double(x) * y), 0D, (acc, v) -> acc + v)"
    )


def bucket_of(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign of <v, plane_p>
    (SQL-literal planes via ``_dot_sql``, so the signs agree bit-for-bit
    with ``_bucket_of_py``).

    ``vec_col`` must be a plain column name: the planes are embedded as SQL
    literals, so the vector reference has to be re-parseable SQL text —
    arbitrary Column expressions (aliases, qualified refs, computed columns)
    don't round-trip through a string, and the private ``Column._jc`` handle
    this used to lean on does not exist under Spark Connect.
    """
    if not isinstance(vec_col, str):
        raise TypeError(
            "bucket_of requires a column NAME (str); got a Column expression"
        )
    vec_sql = vec_col
    terms = [
        f"(CASE WHEN {_dot_sql(vec_sql, w)} >= 0D THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(planes)
    ]
    return F.expr(" + ".join(terms))


# Budget of embedded double literals per plan before the literal-SQL paths
# switch to an Arrow-batched numpy (BLAS) implementation. Two reasons, both
# measured, not assumed:
# - correctness of the fast-path claim: past Janino's method-size /
#   constant-pool limits Spark silently falls back to interpreted evaluation
#   of the same enormous expression tree;
# - the perf crossover arrives far earlier than the codegen limit: the
#   literal fold is a per-row sequential loop plus a per-invocation
#   parse/analyze of a thousands-of-literals expression, while the Arrow
#   path is one batched matmul. Measured on 64-dim vectors at sf0.1:
#   LSH 8×8 (4096 literals) 1.36 s codegen'd vs 0.35 s BLAS; IVF 16 cells
#   (1024 literals) 0.92 s vs 0.40 s. The literal path remains the right
#   plan for narrow configs where Arrow transfer overhead dominates.
_MAX_SQL_LITERALS = 1000


def _lsh_candidate_udf(tables: list[tuple[list[list[float]], list[int]]]):
    """Arrow-batched candidate test for the over-budget LSH config: per hash
    table, sign-bit buckets from one BLAS matmul, membership via isin. Sign
    agreement with the sequential fold holds except on exact zero-crossing
    dot products (measure-zero; the guard path trades that last ulp for not
    losing codegen entirely)."""
    from pyspark.sql.functions import pandas_udf

    mats = [np.asarray(planes, dtype=np.float64) for planes, _ in tables]
    probe_lists = [list(probes) for _, probes in tables]

    @pandas_udf("boolean")
    def is_candidate(vecs: pd.Series) -> pd.Series:
        # NULL embeddings are never candidates — the literal-SQL twin
        # evaluates their bucket to NULL and the filter drops them; the
        # Arrow path must not diverge into an np.stack crash
        mask = vecs.notna().to_numpy()
        out = np.zeros(len(vecs), dtype=bool)
        if mask.any():
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vecs[mask]]
            )
            hit = np.zeros(len(M), dtype=bool)
            for W, probes in zip(mats, probe_lists):
                signs = (M @ W.T) >= 0.0
                buckets = signs @ (1 << np.arange(W.shape[0], dtype=np.int64))
                hit |= np.isin(buckets, probes)
            out[mask] = hit
        return pd.Series(out)

    return is_candidate


def _bucket_udf(planes: list[list[float]]):
    """Arrow-batched twin of :func:`bucket_of` (the bucket COLUMN, not the
    candidate test) for over-budget plane configs — same sign rule as the
    BLAS candidate UDF; NULL vectors map to NULL buckets exactly like the
    literal-SQL fold, so a bucket equi-join drops them either way."""
    from pyspark.sql.functions import pandas_udf

    W = np.asarray(planes, dtype=np.float64)
    bits = 1 << np.arange(W.shape[0], dtype=np.int64)

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mask = vecs.notna().to_numpy()
        out = np.zeros(len(vecs), dtype=np.int64)
        if mask.any():
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vecs[mask]]
            )
            out[mask] = ((M @ W.T) >= 0.0) @ bits
        res = pd.array(out, dtype="Int64")
        res[~mask] = None
        return pd.Series(res)

    return bucket


def _nearest_centroid_udf(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid assignment for the over-budget IVF
    config — same tie rule as ``_nearest_centroid_expr`` (lowest cid wins)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn = np.where(cn == 0, 1e-150, cn)
    Cn = C / cn[:, None]

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        # NULL embeddings get a NULL cell — the literal-SQL twin's
        # behavior; crashing the whole job on one bad row is not an option
        # on either side of the literal budget
        mask = vecs.notna().to_numpy()
        out = np.zeros(len(vecs), dtype=np.int32)
        if mask.any():
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vecs[mask]]
            )
            nrm = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-150)
            out[mask] = np.argmax((M / nrm) @ Cn.T, axis=1).astype("int32")
        res = pd.array(out, dtype="Int32")
        res[~mask] = None
        return pd.Series(res)

    return cell_of


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
    block_col: str | None = None,
    int_exact: bool = False,
) -> DataFrame:
    """All-pairs cosine near-duplicate detection (id_a < id_b, cos ≥ t) —
    the embedding tier of the dedup ladder (llmdata.dedup).

    ``block_col`` names a column of ``embeddings`` that scopes the pair
    space: only same-key pairs are ever CONSIDERED (not merely filtered
    after the fact). For the exact method the blocked-GEMM grid groups on
    (key, bi, bj) so flops scale with Σ(key²) instead of n² — this is what
    makes SemDeDup's cluster step pay for itself at 10⁹ vectors; for LSH
    the key joins alongside the bucket.

    - ``method='exact'`` — exact recall via the blocked-GEMM grid
      (``_gemm_candidates``): distributed block-pair matrix products, no
      driver collect, no all-pairs rows. Quadratic *flops* (inside BLAS) but
      linear shuffle; the exact tier for corpora where recall must be 1.
    - ``method='lsh'`` — candidates restricted to same-LSH-bucket pairs,
      then the same exact cosine verify: every returned pair is a true
      near-dup (precision 1), recall < 1 governed by n_planes. The linear-
      cost scale path: at 10⁹ vectors the bucket self-join shuffles each
      vector once, and missed-pair probability is tuned via fewer planes /
      multiple plane sets, never by scanning all pairs.

    ``int_exact=True`` (exact method only) is the caller's assertion that
    every vector component is INTEGER-valued (the int8 storage codes) —
    dot products and norms are then exact in float64 in any summation
    order, so the GEMM kernel's cosine IS the verify fold's value
    bit-for-bit and the verify join stage is skipped entirely (see
    ``_gemm_candidates(exact_cosine=...)``). Results are identical; the
    plan drops two corpus-side joins and the per-pair fold.
    """
    if int_exact and method == "exact":
        cand = _gemm_candidates(
            embeddings,
            threshold,
            id_col,
            vec_col,
            block_col=block_col,
            exact_cosine=True,
        )
        return cand.filter(F.col("cosine") >= threshold).select(
            "id_a", "id_b", F.round("cosine", 6).alias("cosine")
        )
    v = _as_double(F.col(vec_col))
    base = embeddings.select(
        *([F.col(block_col).alias("_bk")] if block_col is not None else []),
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.sqrt(_dot(v, v)).alias("norm"),
    )
    if method == "lsh":
        if dims is None:  # probe only when the caller didn't say
            sample = embeddings.select(vec_col).first()
            if sample is None:  # empty corpus: no pairs, not a crash
                return embeddings.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine double"
                )
            dims = len(sample[0])
        planes = plane_weights(dims, n_planes)
        # same literal-budget rule as every other literal-SQL consumer:
        # at realistic dims (768 × even 4 planes = 3072 literals) the
        # codegen'd fold is exactly the regime the budget comment warns
        # about — the Arrow twin computes the identical bucket column
        if n_planes * dims > _MAX_SQL_LITERALS:
            bucket_col = _bucket_udf(planes)(F.col("v"))
        else:
            bucket_col = bucket_of("v", planes)
        base = base.withColumn("_bucket", bucket_col)
        cond = (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a.id") < F.col("b.id"))
        if block_col is not None:
            cond = cond & (F.col("a._bk") == F.col("b._bk"))
        a, b = base.alias("a"), base.alias("b")
        cand = a.join(b, cond).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
    else:
        cand = _gemm_candidates(
            embeddings, threshold, id_col, vec_col, block_col=block_col
        )
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


def _normed_rows(pdf):
    """(ids, row-normalized float64 matrix) for a grid group's side — the
    ONE normalization both blocked-GEMM kernels share (zero-norm rows clamp
    to 1.0 so they score cosine 0 instead of NaN)."""
    M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm = np.where(nrm == 0, 1.0, nrm)
    return pdf["id"].to_numpy(), M / nrm


def knn_join(
    embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    block_budget_bytes: int = 1 << 30,
) -> DataFrame:
    """Exact cosine k-nearest-neighbor JOIN: every vector's top-``k``
    neighbors (self excluded) — the all-rows generalization of
    ``cosine_knn``'s single-query top-k, and the candidate generator for
    canonical-copy selection, cluster seeding, and retrieval evaluation.

    Returns (``id_col``, rank 1..k, ``nbr``, cosine), rank ordered by
    cosine desc with the neighbor id as the deterministic tie-break.

    Scale shape — the same blocked-GEMM grid as ``embedding_neardup_pairs``
    (``_gemm_grid``): each unordered block pair is one ``applyInPandas``
    group whose kernel emits PER-ROW partial top-k for both directions
    (A-rows over B-columns exactly; B-rows from per-strip column top-k,
    merged at group end), so the shuffle out of the kernel is ≤ n·B·k rows
    — linear in n for fixed grid/k, never the n² score matrix. The global
    top-k per id is then ONE hash aggregation (sort_array ∘ collect_list
    over ≤ B·k rows per id — bounded, skew-immune); no corpus-wide window.
    The n² flops run inside BLAS, A-side strip-tiled to the same
    ``block_budget_bytes`` bound as the near-dup kernel.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    exploded = _gemm_grid(embeddings, id_col, vec_col, n_blocks, block_budget_bytes)
    _norm_rows = _normed_rows

    def _row_topk(ids_a, ids_b, G):
        """Per-row top-k of a score strip → (id, nbr, cos) arrays, with the
        operator's tie contract applied EXACTLY: cosine desc, neighbor id
        asc. argpartition alone is not enough — among columns tied at the
        k-th value it keeps an arbitrary one, which could drop the
        smaller-id neighbor the contract prefers — so gather every column
        tied with the k-th value, then rank with a deterministic lexsort.
        (Degenerate all-equal rows gather the whole row — bounded by the
        strip footprint, which the budget already caps.)"""
        kk = min(k, G.shape[1])
        if kk == 0 or G.shape[0] == 0:
            e = np.array([], dtype="int64")
            return e, e, np.array([], dtype="float64")
        # ascending partition picks the kk-th LARGEST directly (index
        # n-kk) — negating G first would materialize a full strip copy on
        # top of partition's own, blowing the strip budget by another 1×
        kth = np.partition(G, G.shape[1] - kk, axis=1)[:, G.shape[1] - kk]
        rows, cols = np.nonzero(G >= kth[:, None])
        vals = G[rows, cols]
        order = np.lexsort((ids_b[cols], -vals, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        starts = np.r_[0, np.nonzero(np.diff(rows))[0] + 1]
        lens = np.diff(np.r_[starts, len(rows)])
        rank = np.arange(len(rows)) - np.repeat(starts, lens)
        keep = rank < kk
        return ids_a[rows[keep]], ids_b[cols[keep]], vals[keep]

    def kernel(key, pdf):
        diagonal = key[0] == key[1]
        a = pdf[pdf["side"] == "a"]
        if len(a) == 0:
            return pd.DataFrame(
                {"id": [], "nbr": [], "cos": []}
            ).astype({"id": "int64", "nbr": "int64", "cos": "float64"})
        a_ids, An = _norm_rows(a)
        if diagonal:
            b_ids, Bn = a_ids, An
        else:
            b = pdf[pdf["side"] == "b"]
            if len(b) == 0:
                return pd.DataFrame(
                    {"id": [], "nbr": [], "cos": []}
                ).astype({"id": "int64", "nbr": "int64", "cos": "float64"})
            b_ids, Bn = _norm_rows(b)
        # this kernel's peak per strip is G + np.partition's copy + the
        # kth-tie boolean mask (~2.1 strips) — a wider divisor than the
        # candidate kernel's G+mask, or the budget is only nominal
        chunk = max(1, int(block_budget_bytes // (max(1, Bn.shape[0]) * 8 * 3)))
        out_id, out_nbr, out_cos = [], [], []
        # b-direction partials: per-strip top-k per COLUMN, merged below
        bp_id, bp_nbr, bp_cos = [], [], []
        for s in range(0, An.shape[0], chunk):
            G = An[s : s + chunk] @ Bn.T
            # float rounding can push a true cosine a few ulps outside
            # [-1, 1]; clip BEFORE the sentinel mask, or an antipodal
            # neighbor at -1-2ulp would be filtered out as a self-pair
            np.clip(G, -1.0, 1.0, out=G)
            if diagonal:
                # mask self-pairs: block rows s.. align with columns s..
                m = min(G.shape[0], G.shape[1] - s)
                if m > 0:
                    G[np.arange(m), s + np.arange(m)] = -2.0
            i, j, c = _row_topk(a_ids[s : s + chunk], b_ids, G)
            out_id.append(i)
            out_nbr.append(j)
            out_cos.append(c)
            if not diagonal:
                j2, i2, c2 = _row_topk(b_ids, a_ids[s : s + chunk], G.T)
                bp_id.append(j2)
                bp_nbr.append(i2)
                bp_cos.append(c2)
        if diagonal:
            # the diagonal kernel already covered every row↔row direction
            ids = np.concatenate(out_id)
            nbrs = np.concatenate(out_nbr)
            cosv = np.concatenate(out_cos)
        else:
            # merge the b-direction per-strip partials to true per-row top-k
            pid = np.concatenate(bp_id)
            pnbr = np.concatenate(bp_nbr)
            pcos = np.concatenate(bp_cos)
            order = np.lexsort((pnbr, -pcos, pid))  # id, cos desc, nbr asc
            pid, pnbr, pcos = pid[order], pnbr[order], pcos[order]
            # rank within each id run; keep the first k
            starts = np.r_[0, np.nonzero(np.diff(pid))[0] + 1]
            rank = np.arange(len(pid)) - np.repeat(starts, np.diff(np.r_[starts, len(pid)]))
            keep = rank < k
            ids = np.concatenate(out_id + [pid[keep]])
            nbrs = np.concatenate(out_nbr + [pnbr[keep]])
            cosv = np.concatenate(out_cos + [pcos[keep]])
        return pd.DataFrame({"id": ids, "nbr": nbrs, "cos": cosv})

    partials = exploded.groupBy("bi", "bj").applyInPandas(
        kernel, schema="id long, nbr long, cos double"
    )
    # drop the self-pair sentinel (-2, below any real cosine): when k is
    # at least the block width the per-row top-k necessarily includes it
    partials = partials.filter(F.col("cos") >= -1.0)
    # global top-k per id: bounded-input aggregation (≤ B·k rows per id)
    ordered = F.struct(
        (-F.col("cos")).alias("negcos"),
        F.col("nbr").alias("nbr"),
        F.col("cos").alias("cos"),
    )
    return (
        partials.groupBy("id")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(ordered)), 1, k
            ).alias("top")
        )
        .select(F.col("id").alias(id_col), F.posexplode("top").alias("pos", "t"))
        .select(
            id_col,
            (F.col("pos") + 1).alias("rank"),
            F.col("t.nbr").alias("nbr"),
            F.round(F.col("t.cos"), 6).alias("cosine"),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    n_neg: int = 3,
    sim_lo: float = 0.2,
    sim_hi: float = 0.9,
    knn_k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    block_budget_bytes: int = 1 << 30,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``n_neg`` HARDEST negatives — neighbors whose cosine lies in
    ``[sim_lo, sim_hi)``: similar enough to be informative, strictly
    below the near-dup/positive band at ``sim_hi`` (training on a
    disguised positive as a negative is the classic contrastive-data
    bug; the random easy negative below ``sim_lo`` teaches nothing).
    Returns ``(id_col, nbr, cosine, neg_rank)``, neg_rank 1-based by
    (cosine DESC, nbr ASC).

    Contract (documented, not hidden): candidates come from the
    anchor's ``knn_k`` exact nearest neighbors (:func:`knn_join`'s
    blocked-GEMM grid — ≤ n·B·k shuffle rows, never the n² score
    matrix), so the result is exact as long as the anchor has fewer
    than ``knn_k − n_neg`` neighbors at or above ``sim_hi``; size
    ``knn_k`` to the expected duplicate multiplicity. Band comparison
    and ranking run on the ROUND-6 cosine knn_join emits (cross-engine
    boundary stability); the per-anchor window sees ≤ ``knn_k`` rows —
    bounded, skew-free.
    """
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1, got {n_neg}")
    if knn_k < n_neg:
        raise ValueError(
            f"knn_k ({knn_k}) must be >= n_neg ({n_neg})"
        )
    if not sim_lo < sim_hi:
        raise ValueError(
            f"need sim_lo < sim_hi, got [{sim_lo}, {sim_hi})"
        )
    nn = knn_join(
        embeddings,
        k=knn_k,
        id_col=id_col,
        vec_col=vec_col,
        n_blocks=n_blocks,
        block_budget_bytes=block_budget_bytes,
    )
    band = nn.filter(
        (F.col("cosine") >= sim_lo) & (F.col("cosine") < sim_hi)
    ).select(id_col, "nbr", "cosine")
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col("nbr").asc()
    )
    return band.withColumn(
        "neg_rank", F.row_number().over(w).cast("long")
    ).filter(F.col("neg_rank") <= n_neg)


def _gemm_grid_size(
    n: int, d: int, parallelism: int, block_budget_bytes: int
) -> int:
    """Pure sizing rule for the blocked-GEMM grid (see _gemm_candidates):
    B = max(memory bound, min(parallelism floor, overhead cap)).

    - memory bound: smallest B with ``2·(n/B)·d·8 ≤ budget`` — hard.
    - parallelism floor: smallest B with ``B(B+1)/2 ≥ parallelism`` (≤64).
    - overhead cap ``n // 2048``: blocks under ~2k rows make per-group
      Arrow/worker overhead dominate the BLAS call; never binds at scale.
    """
    b_mem = max(1, math.ceil(2 * n * d * 8 / block_budget_bytes))
    b_par = 1
    while b_par * (b_par + 1) // 2 < parallelism and b_par < 64:
        b_par += 1
    return max(b_mem, min(b_par, max(1, n // 2048)))


def _gemm_grid(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    n_blocks: int | None,
    block_budget_bytes: int,
    block_col: str | None = None,
) -> DataFrame:
    """The shared blocked-GEMM grid relation: every vector replicated to
    each block pair it participates in, tagged (bi, bj, side). Auto-sizes
    the grid from (count, dims, parallelism) when ``n_blocks`` is None —
    see :func:`_gemm_candidates` for the full sizing rationale.

    With ``block_col``, the grid is CELL-SCOPED: the key column is carried
    through as ``_bk`` so the kernel groups on (cell, bi, bj) and no
    cross-cell block pair ever forms. Sizing then uses the LARGEST cell's
    row count, not the corpus count — a grid sized for n rows would force
    n·B replication when each group only ever holds one cell's slice."""
    if n_blocks is None:
        # (count, dims) only: the count prunes every column (an upstream
        # computed vector — e.g. the int8 quantize transform — must NOT be
        # evaluated corpus-wide just to size the grid), and dims comes from
        # a single row
        par = embeddings.sparkSession.sparkContext.defaultParallelism
        if block_col is not None:
            stats = (
                embeddings.groupBy(block_col)
                .count()
                .agg(F.max("count").alias("mx"), F.count(F.lit(1)).alias("k"))
                .first()
            )
            n = int(stats["mx"] or 0)
            # each cell contributes its own B(B+1)/2 groups, so the
            # parallelism floor is shared across cells
            par = max(1, math.ceil(par / max(1, int(stats["k"] or 1))))
        else:
            n = embeddings.count()
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        n_blocks = _gemm_grid_size(
            n,
            (first["d"] if first is not None else 0) or 0,
            par,
            block_budget_bytes,
        )
    grid = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(q)).alias("bi"),
                F.greatest(F.col("_blk"), F.lit(q)).alias("bj"),
            )
            for q in range(n_blocks)
        ]
    )
    key_cols = [F.col(block_col).alias("_bk")] if block_col is not None else []
    return (
        embeddings.select(
            *key_cols,
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
        )
        .select(
            *(["_bk"] if block_col is not None else []),
            "id",
            "v",
            "_blk",
            F.explode(grid).alias("_cell"),
        )
        .select(
            *(["_bk"] if block_col is not None else []),
            "id",
            "v",
            F.col("_cell.bi").alias("bi"),
            F.col("_cell.bj").alias("bj"),
            F.when(F.col("_blk") == F.col("_cell.bi"), F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("side"),
        )
    )


def _gemm_candidates(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_blocks: int | None = None,
    block_budget_bytes: int = 1 << 30,
    block_col: str | None = None,
    exact_cosine: bool = False,
) -> DataFrame:
    """Exact-recall candidate pairs via blocked BLAS matrix products — fully
    distributed, nothing collected to the driver.

    Grid decomposition: the corpus is hash-partitioned into ``n_blocks`` row
    blocks; every unordered block pair (i ≤ j) is one ``applyInPandas`` group
    holding the two blocks' vectors, which computes ``block_i @ block_jᵀ``
    with BLAS and emits (id_a < id_b) pairs whose GEMM cosine clears
    ``threshold − ε`` (ε covers summation-order float drift, so no true pair
    is lost; the caller's sequential-fold verify then decides exactly).

    Scale shape: each vector is replicated ``n_blocks`` times (shuffle is
    n·B rows — linear, tunable), each group holds ≤ 2n/B vectors, and no
    all-pairs rows ever materialize: the n² work happens inside BLAS, which
    is ~100× an interpreted per-pair fold. Zero-norm vectors are guarded
    (norm→1 ⇒ cosine 0 ⇒ never a candidate) instead of silently yielding
    NaN rows.

    ``n_blocks=None`` (default) SIZES THE GRID FROM THE DATA instead of
    trusting a constant that only works at one scale: a column-pruned count
    plus a one-row dims probe pick the smallest B whose per-group input
    working set ``2·(n/B)·d·8`` fits ``block_budget_bytes`` (the hard
    memory bound — a fixed B=4 is a ~300 GB block pair on a 10⁸×768
    corpus), then raise B toward ``B(B+1)/2 ≥ defaultParallelism`` so a
    large cluster stays occupied — but never past ``n // 2048``: blocks
    below ~2k rows make per-group Arrow/worker overhead dominate the BLAS
    call, and on a corpus that small the grid isn't the parallelism that
    matters anyway. At real scale the overhead cap never binds (10⁸ rows
    → cap ≈ 48k ≫ any sane B). The GEMM OUTPUT — (n/B)² doubles, far
    larger than the inputs — is tiled inside the kernel (A-side strips),
    so the budget genuinely bounds the group footprint. Auto-sizing yields
    the same exact result set at every scale because B and the strip size
    only partition the computation, never the semantics.

    ``block_col`` CELL-SCOPES the grid (SemDeDup's contract): the kernel
    groups on (cell, bi, bj), so pairs can only form between same-cell
    vectors and total flops scale with Σ(cell²) instead of n². Sizing
    switches to the largest cell (see :func:`_gemm_grid`).

    ``exact_cosine=True`` (r15 optimization round) is the INTEGER-VECTOR
    decide-in-kernel mode: the caller asserts every vector component is
    integer-valued (e.g. the int8 storage codes), which makes every dot
    product and squared norm an exact integer in float64 REGARDLESS of
    summation order — so the kernel's cosine ``dot / (sqrt(na²)·sqrt(nb²))``
    is bit-identical to the sequential verify fold (IEEE sqrt / multiply /
    divide are correctly rounded, single-rounded operations on identical
    operands). The kernel then emits (id_a, id_b, cosine) with the EXACT
    ``>= threshold`` filter (no ε) and the caller's verify join stage —
    two corpus-side joins plus a per-pair interpreted fold — drops out of
    the plan entirely. Never set it for float-valued vectors, where GEMM
    and the fold genuinely differ in the last ulps.
    """
    eps = 1e-9
    exploded = _gemm_grid(
        embeddings, id_col, vec_col, n_blocks, block_budget_bytes, block_col
    )

    _norm_rows = _normed_rows

    def kernel_cos(key, pdf):
        diagonal = key[-2] == key[-1]
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
        a = pdf[pdf["side"] == "a"]
        if len(a) == 0:
            return empty
        a_ids = a["id"].to_numpy()
        A = np.stack([np.asarray(x, dtype=np.float64) for x in a["v"]])
        na = np.sqrt((A * A).sum(axis=1))
        if diagonal:
            b_ids, B, nb = a_ids, A, na
        else:
            b = pdf[pdf["side"] == "b"]
            if len(b) == 0:
                return empty
            b_ids = b["id"].to_numpy()
            B = np.stack([np.asarray(x, dtype=np.float64) for x in b["v"]])
            nb = np.sqrt((B * B).sum(axis=1))
        chunk = max(1, int(block_budget_bytes // (max(1, B.shape[0]) * 8 * 3)))
        outs_x, outs_y, outs_c = [], [], []
        for s in range(0, A.shape[0], chunk):
            # raw integer dots (exact in float64), then the verify fold's
            # own formula dot / (na*nb) on identical operands
            C = (A[s : s + chunk] @ B.T) / np.outer(na[s : s + chunk], nb)
            ai, bi = np.nonzero(C >= threshold)
            x, y, c = a_ids[s : s + chunk][ai], b_ids[bi], C[ai, bi]
            if diagonal:
                keep = x < y
                x, y, c = x[keep], y[keep], c[keep]
            outs_x.append(np.minimum(x, y))
            outs_y.append(np.maximum(x, y))
            outs_c.append(c)
        if not outs_x:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outs_x),
                "id_b": np.concatenate(outs_y),
                "cosine": np.concatenate(outs_c),
            }
        )

    def kernel(key, pdf):
        # grid coordinates are always the LAST two key fields — a leading
        # block_col key shifts them right by one
        diagonal = key[-2] == key[-1]
        a = pdf[pdf["side"] == "a"]
        if len(a) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")
        a_ids, An = _norm_rows(a)
        if diagonal:
            b_ids, Bn = a_ids, An
        else:
            b = pdf[pdf["side"] == "b"]
            if len(b) == 0:
                return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")
            b_ids, Bn = _norm_rows(b)
        # the GEMM output G is rows_a × rows_b doubles — (n/B)² per group,
        # which dwarfs the input blocks for any realistic B. TILE the A side
        # so only a chunk×rows_b strip of G is ever live. The strip height is
        # DERIVED from the budget, not fixed: a strip costs chunk·rows_b·8
        # bytes for G plus a chunk·rows_b boolean mask for nonzero, so the
        # 8·2 divisor keeps strip+mask inside block_budget_bytes at every
        # dims (a fixed 4096-row strip alone was ~2.7× the budget at d=768,
        # where rows_b is large precisely because vectors are narrow). BLAS
        # throughput is unaffected (each strip is still one big matmul).
        chunk = max(1, int(block_budget_bytes // (max(1, Bn.shape[0]) * 8 * 2)))
        outs_x, outs_y = [], []
        for s in range(0, An.shape[0], chunk):
            G = An[s : s + chunk] @ Bn.T
            ai, bi = np.nonzero(G >= threshold - eps)
            x, y = a_ids[s : s + chunk][ai], b_ids[bi]
            if diagonal:
                keep = x < y
                x, y = x[keep], y[keep]
            outs_x.append(np.minimum(x, y))
            outs_y.append(np.maximum(x, y))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(outs_x) if outs_x else np.array([], dtype="int64"),
                "id_b": np.concatenate(outs_y) if outs_y else np.array([], dtype="int64"),
            }
        )

    keys = (["_bk"] if block_col is not None else []) + ["bi", "bj"]
    if exact_cosine:
        return exploded.groupBy(*keys).applyInPandas(
            kernel_cos, schema="id_a long, id_b long, cosine double"
        )
    return exploded.groupBy(*keys).applyInPandas(
        kernel, schema="id_a long, id_b long"
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse-quantizer centroids: the ``n_centroids`` corpus
    vectors ranked first by xxhash64(id) — an unbiased, reproducible sample
    (the same idea as hash sampling). A k-means refinement is a strict
    drop-in upgrade: everything downstream only sees a list of vectors.
    The collect is ``n_centroids`` rows — index metadata, not data."""
    rows = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` — 4× smaller than float32 (16× vs the
    float64 compute form), the standard storage/bandwidth tier for
    billion-vector corpora (IVF-int8 and friends). Reconstruction error is
    bounded by scale/2 per component (pinned in tests).

    Pure column algebra (transform / array_max / round) — no UDF, no
    shuffle; quantization happens inside the scan stage and the int8 table
    is what ships to disk. Zero vectors quantize to zeros via a clamped
    scale.
    """
    v = _as_double(F.col(vec_col))
    scale = F.greatest(
        F.array_max(F.transform(v, F.abs)) / F.lit(127.0), F.lit(1e-30)
    )
    return embeddings.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")).alias(
            "qvec"
        ),
    )


def dequantize_embeddings(
    quantized: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: x̂_i = q_i · scale (float array).
    Downstream similarity operators take the reconstructed column unchanged
    — the quantized tier is a drop-in corpus for cosine_knn / LSH / IVF at
    ~1/4 the bytes, trading ≤ scale/2 per-component error."""
    return quantized.select(
        F.col(id_col),
        F.transform(
            "qvec", lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def kmeans_refine(
    embeddings: DataFrame,
    centroids: list[list[float]],
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means over the corpus, initialized from ``centroids`` — the
    drop-in quality upgrade for ``ivf_centroids`` (everything downstream
    only sees a list of vectors).

    Spark-first iteration: each round assigns every vector to its nearest
    centroid (the same cell expression the IVF probe uses — codegen'd, or
    the Arrow fallback past the literal budget) and re-averages per cell
    with one hash aggregation — ONE shuffle of |cells| × dims partial sums
    per round, nothing but the k centroid rows ever collected. Empty cells
    keep their previous centroid (k never degenerates mid-iteration).
    Deterministic: fixed init (hash-sampled), fixed data, and the per-cell
    mean is an exact integer-count divide of a decimal-free float sum whose
    partial-order drift is irrelevant to an argmax assignment.
    """
    cents = [list(map(float, c)) for c in centroids]
    if not cents:
        return []  # empty seed set (empty corpus): nothing to refine
    k = len(cents)
    dims = len(cents[0])
    v = _as_double(F.col(vec_col))
    for _ in range(n_iter):
        if k * dims > _MAX_SQL_LITERALS:
            cell = _nearest_centroid_udf(cents)(F.col(vec_col))
        else:
            cell = _nearest_centroid_expr(vec_col, cents)
        sums = (
            embeddings.select(cell.alias("_cell"), v.alias("_v"))
            .groupBy("_cell")
            .agg(
                F.array(
                    *[F.sum(F.col("_v")[d]) for d in range(dims)]
                ).alias("_sum"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()
        )
        new_cents = list(cents)
        for r in sums:
            new_cents[r["_cell"]] = [s / r["_n"] for s in r["_sum"]]
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def _nearest_centroid_expr(vec_sql: str, centroids: list[list[float]]) -> Column:
    """argmax over centroids of cosine(vec, centroid) as one expression:
    an array of (−cosine, cid) structs reduced with array_min — ties and
    NaN-free by construction (centroid norms are constants; the row norm is
    clamped away from zero)."""
    row_norm = f"greatest(sqrt(aggregate(zip_with({vec_sql}, {vec_sql}, (x, y) -> double(x) * y), 0D, (acc, v) -> acc + v)), 1e-150D)"
    entries = []
    for cid, c in enumerate(centroids):
        cnorm = math.sqrt(sum(x * x for x in c)) or 1e-150
        cos = f"({_dot_sql(vec_sql, c)} / ({row_norm} * {cnorm!r}D))"
        entries.append(f"struct(-{cos} AS negcos, {cid} AS cid)")
    return F.expr(f"array_min(array({', '.join(entries)})).cid")


def _centroid_ranks_py(q: list[float], centroids: list[list[float]]) -> list[int]:
    qn = math.sqrt(sum(x * x for x in q)) or 1e-150
    scored = []
    for cid, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c)) or 1e-150
        dot = 0.0
        for x, y in zip(q, c):
            dot += float(x) * y
        scored.append((-dot / (qn * cn), cid))
    return [cid for _, cid in sorted(scored)]


def ivf_ann_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the clustered-data scale path
    next to ``lsh_ann_knn``: every vector is assigned to its nearest coarse
    centroid; a query scans only the ``n_probe`` nearest cells, then exact
    cosine re-ranks the candidates.

    Cost shape: assignment is one codegen'd expression over the scan (at
    ingest time it would be materialized as a stored ``cell`` column +
    partition key, making the probe a partition-pruned read); the query
    touches ~n_probe/n_centroids of the corpus. Recall follows the data's
    cluster structure — high when neighbors share cells (real corpora), and
    on isotropic noise it degrades toward a partial scan, same contract as
    the LSH tier. ``n_probe = n_centroids`` is exact by construction.
    """
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    q = [float(x) for x in query_vec]
    if not centroids:
        # empty corpus ⇒ no cells ⇒ no neighbors — an empty top-k, not an
        # IndexError (same contract as embedding_neardup_pairs)
        return cosine_knn(
            embeddings.limit(0), q, k=k, id_col=id_col, vec_col=vec_col
        )
    probes = _centroid_ranks_py(q, centroids)[:n_probe]
    if len(centroids) * len(centroids[0]) > _MAX_SQL_LITERALS:
        cell = _nearest_centroid_udf(centroids)(F.col(vec_col))
    else:
        cell = _nearest_centroid_expr(vec_col, centroids)
    cands = embeddings.withColumn("_cell", cell).filter(
        F.col("_cell").isin(probes)
    )
    return cosine_knn(cands, q, k=k, id_col=id_col, vec_col=vec_col)


def _subvector(vec_col: str, j: int, sub_dim: int) -> Column:
    """Contiguous subspace slice j of a vector column (1-based slice)."""
    return F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the vector space splits into ``m``
    contiguous subspaces and each gets its own ``k``-centroid codebook,
    trained with the same distributed Lloyd machinery as IVF
    (``ivf_centroids`` seeds + ``kmeans_refine``) on the sliced column.
    Returns ``m`` codebooks of ``k`` centroids of ``dims/m`` floats.

    PQ is the canonical billion-vector compression: a d-dim float vector
    becomes ``m`` small codes (here one byte each at k ≤ 256), an
    (m·log₂k)/32d compression of the scored representation, while distances
    remain computable against the codes alone (``pq_ann_knn``). Training
    cost is m independent k-means runs over one column slice each.
    """
    if dims is None:
        first = embeddings.select(vec_col).first()
        if first is None:
            raise ValueError(
                "pq_train on an empty corpus — codebooks need data (pass "
                "dims= and a non-empty relation, or skip PQ for this source)"
            )
        dims = len(first[0])
    if dims % m != 0:
        raise ValueError(f"dims={dims} not divisible by m={m} subspaces")
    sub_dim = dims // m
    books = []
    for j in range(m):
        sub = embeddings.select(
            F.col(id_col), _subvector(vec_col, j, sub_dim).alias(vec_col)
        )
        seeds = ivf_centroids(sub, k, id_col=id_col, vec_col=vec_col)
        books.append(kmeans_refine(sub, seeds, n_iter=n_iter,
                                   id_col=id_col, vec_col=vec_col))
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices (array<int>, one nearest
    centroid per subspace) — the stored representation of a PQ index. Pure
    scan-stage work: per subspace the same nearest-centroid assignment the
    IVF tier uses (codegen'd literals, Arrow past the budget)."""
    return embeddings.select(
        F.col(id_col), _pq_codes_col(codebooks, vec_col).alias("pq_codes")
    )


def _pq_codes_col(
    codebooks: list[list[list[float]]], vec_col: str
) -> Column:
    """The PQ code array as ONE column expression — scan-stage, so a writer
    can attach it next to other derived columns (the cell id) without a
    corpus-wide join back on id."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    code_cols = []
    for j, book in enumerate(codebooks):
        sub_sql = f"slice({vec_col}, {j * sub_dim + 1}, {sub_dim})"
        if len(book) * sub_dim > _MAX_SQL_LITERALS // m:
            code = _nearest_centroid_udf(book)(
                _subvector(vec_col, j, sub_dim)
            )
        else:
            code = _nearest_centroid_expr(sub_sql, book)
        code_cols.append(code)
    return F.array(*code_cols)


def pq_ann_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance (ADC) + exact re-rank.

    The query stays unquantized: per subspace a k-entry lookup table of
    ⟨q_j, centroid⟩ and ‖centroid‖² is computed driver-side (m·k doubles —
    index metadata), and each corpus row's approximate cosine is m array
    lookups over its stored codes:

        cos(q, x̂) = Σ_j LUT_dot[j][code_j]
                     / (‖q‖ · sqrt(Σ_j LUT_n2[j][code_j]))

    exact for the reconstruction x̂ because subspaces are disjoint. The
    ``rerank`` best ADC candidates are then re-scored with true cosine
    against the original vectors (a semi-join on id — at scale, a fetch of
    ``rerank`` full vectors next to a scan that touched only code bytes).
    """
    q = [float(x) for x in query_vec]
    if codebooks is None:
        codebooks = pq_train(embeddings, id_col=id_col, vec_col=vec_col)
    if codes is None:
        codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    qnorm = math.sqrt(sum(x * x for x in q)) or 1e-150
    lut_dot, lut_n2 = [], []
    for j, book in enumerate(codebooks):
        qj = q[j * sub_dim : (j + 1) * sub_dim]
        dots, n2s = [], []
        for c in book:
            dots.append(sum(a * b for a, b in zip(qj, c)))
            n2s.append(sum(x * x for x in c))
        lut_dot.append(dots)
        lut_n2.append(n2s)
    dot_expr = None
    n2_expr = None
    for j in range(m):
        d = F.element_at(
            F.array(*[F.lit(x) for x in lut_dot[j]]), F.col("pq_codes")[j] + 1
        )
        n2 = F.element_at(
            F.array(*[F.lit(x) for x in lut_n2[j]]), F.col("pq_codes")[j] + 1
        )
        dot_expr = d if dot_expr is None else dot_expr + d
        n2_expr = n2 if n2_expr is None else n2_expr + n2
    adc = dot_expr / (
        F.lit(qnorm) * F.greatest(F.sqrt(n2_expr), F.lit(1e-150))
    )
    cand_ids = (
        codes.select(F.col(id_col), adc.alias("_adc"))
        .orderBy(F.col("_adc").desc(), F.col(id_col))
        .limit(rerank)
        .select(id_col)
    )
    cands = embeddings.join(F.broadcast(cand_ids), id_col, "left_semi")
    return cosine_knn(cands, q, k=k, id_col=id_col, vec_col=vec_col)


def materialize_ann_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_codebooks: list[list[list[float]]] | None = None,
) -> list[list[float]]:
    """Write the IVF index as a CELL-PARTITIONED parquet table — the ingest-
    time materialization the query-time ``ivf_ann_knn`` docstring promises:
    centroids are trained once (hash seeds + Lloyd), every vector is stored
    under its cell's partition directory, and a probe of ``n_probe`` cells
    becomes a *partition-pruned scan* (cells never probed are never read —
    the IO shape that makes IVF pay at 100 TB). Returns the trained
    centroids; pair with ``ann_index_knn`` for queries.

    With ``pq_codebooks`` the row also stores its PQ codes — the full
    IVF-PQ layout: a probe then reads only the probed partitions AND can
    score them from the code bytes (ADC), touching full vectors only for
    the re-rank.
    """
    seeds = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    cents = kmeans_refine(
        embeddings, seeds, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    if not cents:
        raise ValueError(
            "materialize_ann_index on an empty corpus — an IVF layout "
            "needs at least one centroid; build it when data exists (the "
            "dedup index supports cold starts because its legs are plain "
            "relations; cell partitioning is not)"
        )
    _write_cells(embeddings, path, cents, id_col, vec_col, pq_codebooks,
                 mode="overwrite")
    # geometry sidecar (underscore-prefixed: invisible to the parquet
    # reader) — appends and path-only queries re-read it, so cell
    # assignment can never fork from the stored layout. Written through
    # the Hadoop FS API: the sidecar must live on the SAME filesystem as
    # the cells (hdfs://, s3a://, file:), not the driver's local disk.
    _fs_write_text(
        embeddings.sparkSession,
        path.rstrip("/") + "/" + _ANN_META_FILE,
        json.dumps(
            {"centroids": cents, "pq_codebooks": pq_codebooks, "version": 1}
        ),
    )
    return cents


_ANN_META_FILE = "_ann_meta.json"


def _fs_write_text(spark, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API, so the
    sidecar lands wherever the parquet data does (hdfs://, s3a://, file:)
    — a local ``open()`` would crash AFTER the expensive data write on any
    non-local index path, exactly the 100 TB deployment shape."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark, path: str) -> str:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        # commons-io RETURNS the bytes (py4j copies arrays by value, so
        # readFully into a Python bytearray would fill a JVM-side copy and
        # leave ours zeroed)
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def _write_cells(
    embeddings: DataFrame,
    path: str,
    cents: list[list[float]],
    id_col: str,
    vec_col: str,
    pq_codebooks: list[list[list[float]]] | None,
    mode: str,
) -> None:
    if len(cents) * len(cents[0]) > _MAX_SQL_LITERALS:
        cell = _nearest_centroid_udf(cents)(F.col(vec_col))
    else:
        cell = _nearest_centroid_expr(vec_col, cents)
    indexed = embeddings.withColumn("_cell", cell)
    if pq_codebooks is not None:
        # codes are scan-stage column algebra: attach them in the SAME
        # select as the cell id — joining pq_encode's output back on id
        # would re-scan the corpus and add two corpus-wide exchanges per
        # index build
        indexed = indexed.withColumn(
            "pq_codes", _pq_codes_col(pq_codebooks, vec_col)
        )
    (
        indexed.repartition(F.col("_cell"))
        .write.mode(mode)
        .partitionBy("_cell")
        .parquet(path)
    )


def load_ann_index_meta(path: str, spark=None) -> dict:
    """Read the geometry sidecar from the index's own filesystem (any
    Hadoop scheme). ``spark`` defaults to the active session — required
    for non-local paths; a purely local path falls back to plain open()
    when no session is alive."""
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
    if spark is not None:
        meta = json.loads(
            _fs_read_text(spark, path.rstrip("/") + "/" + _ANN_META_FILE)
        )
    else:
        with open(os.path.join(path, _ANN_META_FILE)) as f:
            meta = json.load(f)
    if not meta.get("centroids"):
        raise ValueError(f"ANN index meta at {path} has no centroids")
    return meta


def append_to_ann_index(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a materialized IVF(-PQ) index WITHOUT
    retraining: cells (and PQ codes, if the index stores them) are
    assigned under the index's own persisted centroids/codebooks, so the
    layout stays self-consistent and probes see the new vectors
    immediately. Centroid drift under heavy appends is the standard IVF
    trade — periodic re-materialization is the rebuild, exactly like the
    dedup index's compaction story."""
    meta = load_ann_index_meta(path, spark=embeddings.sparkSession)
    _write_cells(
        embeddings, path, meta["centroids"], id_col, vec_col,
        meta.get("pq_codebooks"), mode="append",
    )


def ann_index_knn(
    spark,
    path: str,
    centroids: list[list[float]] | None,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pq_codebooks: list[list[list[float]]] | None = None,
    rerank: int = 100,
) -> DataFrame:
    """Top-k against a materialized IVF index: rank cells driver-side
    (centroid metadata), read ONLY the probed cells' partitions (the
    ``_cell`` filter is a partition predicate — pruning, not scanning), and
    exact-rerank. Guarded in tests: the probe's plan must show the partition
    filter, and n_probe = n_centroids reproduces brute force exactly.

    With ``pq_codebooks`` (index written with codes) the probed partitions
    are scored via ADC over the stored codes and only the ``rerank`` best
    fetch their full vectors — the IVF-PQ query path.

    ``centroids=None`` reads the geometry from the index's sidecar
    (written by ``materialize_ann_index``) — the path-only query form.
    """
    if centroids is None:
        meta = load_ann_index_meta(path, spark=spark)
        centroids = meta["centroids"]
        if pq_codebooks is None:
            pq_codebooks = meta.get("pq_codebooks")
    q = [float(x) for x in query_vec]
    probes = _centroid_ranks_py(q, centroids)[:n_probe]
    cands = spark.read.parquet(path).filter(F.col("_cell").isin(probes))
    if pq_codebooks is not None:
        return pq_ann_knn(
            cands, q, k=k, codebooks=pq_codebooks,
            codes=cands.select(id_col, "pq_codes"), rerank=rerank,
            id_col=id_col, vec_col=vec_col,
        )
    return cosine_knn(cands, q, k=k, id_col=id_col, vec_col=vec_col)


def lsh_ann_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    multiprobe: bool = True,
    ensure_k: bool = True,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: a vector is a
    candidate if it lands in the query's bucket (or a Hamming-1 probe, when
    ``multiprobe``) in ANY of ``n_tables`` independent hash tables — the
    standard OR-amplification that turns a per-table catch probability p
    into 1-(1-p)^L — then exact cosine re-rank of candidates only.

    Degenerate-pool contract (``ensure_k``, default on): the operator
    GUARANTEES ``min(k, N)`` results. The backfill decision is a BOUNDED
    PROBE, not a materialization: one ``limit(k).count()`` on the candidate
    set (early-terminating — the scan stops as soon as k candidates are
    seen) decides whether the pruned plan already has ``k`` rows; if the
    pool is short — a tiny corpus, or a zero/degenerate query whose
    buckets are near-empty — the result is the exact full-scan top-k
    instead (the standard ANN backfill posture). NOTE: with ``ensure_k``
    on, calling this function runs that one probe job eagerly; the
    RETURNED relation stays a lazy plan either way (nothing is collected
    or localized — the r10 version collected the top-k to the driver,
    which re-entered the driver inside otherwise-lazy pipelines). At
    corpus scale the multiprobe OR across ``n_tables`` tables leaves the
    fallback probability negligible, so the exact branch is a correctness
    backstop, not a cost.

    Recall/cost knob: more planes → smaller buckets (fewer candidates, lower
    per-table recall); more tables → recall back up at linear candidate
    cost. On a clustered real corpus the same config probes a tiny corpus
    fraction; on isotropic random vectors (the worst case — neighbors are
    barely closer than strangers) it degrades gracefully toward a partial
    scan rather than losing the true neighbors silently. The whole candidate
    test is one codegen'd filter — no shuffle, no join; at 10⁹ vectors the
    scan prunes to the candidate fraction and the TakeOrdered k is the only
    thing ever collected.
    """
    q = [float(x) for x in query_vec]
    tables = []
    for t in range(n_tables):
        planes = plane_weights(len(q), n_planes, seed=42 + t)
        # the query's bucket is pure driver-side arithmetic — no Spark job
        qbucket = _bucket_of_py(q, planes)
        probes = [qbucket] + (
            [qbucket ^ (1 << p) for p in range(n_planes)] if multiprobe else []
        )
        tables.append((planes, probes))
    if len(q) * n_planes * n_tables > _MAX_SQL_LITERALS:
        cands = embeddings.filter(_lsh_candidate_udf(tables)(F.col(vec_col)))
    else:
        cond = None
        for planes, probes in tables:
            c = bucket_of(vec_col, planes).isin(probes)
            cond = c if cond is None else (cond | c)
        cands = embeddings.filter(cond)
    if not ensure_k:
        return cosine_knn(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col)
    # bounded probe: k candidates existing <=> the pruned ordered-limit-k
    # plan has exactly k rows (top-k of >= k inputs). limit-k count
    # early-terminates, so the probe touches the candidate scan only until
    # k hits are found; the returned plan itself is never executed here.
    # The candidate relation is PERSISTED across the probe and the returned
    # plan (registered for unpersist_intermediates cleanup) so the filter
    # scan runs once, not twice — at corpus scale candidates are the small
    # LSH-pruned fraction, so the footprint is bounded by design, and
    # MEMORY_AND_DISK recomputes harmlessly if the caller unpersists before
    # consuming.
    from .dedup import _INTERMEDIATE_CACHES

    cands = cands.persist()
    _INTERMEDIATE_CACHES.append(cands)
    pruned = cosine_knn(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col)
    if cands.limit(k).count() >= k:
        return pruned
    return cosine_knn(embeddings, query_vec, k=k, id_col=id_col, vec_col=vec_col)
