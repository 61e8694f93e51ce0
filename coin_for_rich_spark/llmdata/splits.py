"""Leakage-safe dataset splitting and epoch-shard materialization.

The last step of a curation pipeline is deciding which documents train
and which evaluate — and the classic failure is NEAR-DUPLICATE LEAKAGE:
doc A trains while its 99%-identical twin B sits in the test split, so
held-out loss silently measures memorization. The fix is to make the
DEDUP CLUSTER, not the document, the unit of assignment: every member
of a near-dup cluster (from any tier of the dedup ladder —
MinHash/SimHash/n-gram/embedding pairs resolved by ``dedup_clusters``)
lands in the same split by construction.

Determinism contract (the repo-wide sampling discipline of
``hash_sample``/``stratified_hash_sample``/``epoch_shuffle``): every
assignment is a pure expression of (id, seed) — engine-independent,
stable under re-runs, re-partitioning, physical layout, and incremental
appends (a new document joins a split without moving any existing one).
Independence from the samplers' draws comes from the PREIMAGE: the split
hashes the seeded ``md5(unit <US> seed)`` while ``hash_sample``/
``stratified_hash_sample`` hash the unseeded ``md5(id)`` — different
inputs, so the draws are uncorrelated by construction. Reading distinct
hex digit ranges (holdout digit 1, stratified digits 5-8, split digits
9-12) is defense-in-depth on top, not the independence mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "leakage_safe_split",
    "cross_split_pairs",
    "write_epoch_shards",
]


def _split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper bound in [0, 65536]) per split, cumulative.

    Exact integer thresholds: the draw compares a 16-bit hash value
    against round(65536 * cumulative_fraction), so two engines (or two
    cluster runs) can never disagree on a boundary by a float ulp.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = 0.0
    for name, f in fractions.items():
        if not 0.0 < f <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in (0, 1], got {f}")
        total += f
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, cum = [], 0.0
    for name, f in fractions.items():
        cum += f
        out.append((name, round(cum * 65536)))
    out[-1] = (out[-1][0], 65536)  # close the range despite float residue
    # bounds must be strictly increasing: a fraction too small to represent
    # in 16 bits (or ties after rounding) would silently give that split a
    # ZERO-WIDTH range — it passes the (0,1] validation yet never assigns
    prev = 0
    for name, bound in out:
        if bound <= prev:
            raise ValueError(
                f"fraction for {name!r} is too small to represent in 16 bits"
                f" (threshold {bound} does not exceed previous {prev})"
            )
        prev = bound
    return out


def leakage_safe_split(
    docs: DataFrame,
    fractions: dict[str, float],
    clusters: DataFrame | None = None,
    seed: int = 0,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    split_col: str = "split",
) -> DataFrame:
    """Assign every document a split label, atomically per dedup cluster.

    ``clusters`` is the ``dedup_clusters`` output relation (``id_col``,
    ``cluster_col``) — documents absent from it are singletons and act as
    their own cluster. The draw hashes the CLUSTER key, so all members of
    a cluster share one draw and can never straddle a split boundary; the
    trade (inherent, not a bug) is that realized fractions are exact over
    CLUSTERS, and a mega-cluster moves its whole weight into one split —
    which is exactly the property that prevents leakage.

    ``fractions`` is an ordered {label: fraction} summing to 1 (e.g.
    ``{"train": 0.98, "val": 0.01, "test": 0.01}``); assignment compares
    16 bits of md5(cluster, seed) (hex digits 9-12 — disjoint from the
    ``hash_sample``/``stratified_hash_sample`` ranges) against exact
    integer cumulative thresholds.

    Plan shape: one broadcast-or-shuffle equi-join against the cluster
    relation (skipped entirely when ``clusters`` is None) plus scan-stage
    column algebra — no window, no global sort, nothing layout-dependent.
    """
    thresholds = _split_thresholds(fractions)
    if clusters is None:
        unit = F.col(id_col)
        joined = docs
    else:
        # dropDuplicates guards the join's row multiplicity: a clusters
        # relation carrying duplicate membership rows for an id (a retried
        # union, a pair-tier artifact) would otherwise DUPLICATE document
        # rows in the output — corruption, not just a label glitch.
        # Connected-components output is one row per id; dedup on (id,
        # cluster) keeps that case a no-op while making the contract
        # structural. Conflicting memberships (same id, two clusters)
        # remain the caller's bug — that relation is not a partition.
        memb = clusters.select(
            F.col(id_col).alias("__lss_id"),
            F.col(cluster_col).alias("__lss_cluster"),
        ).dropDuplicates(["__lss_id", "__lss_cluster"])
        joined = docs.join(memb, docs[id_col] == memb["__lss_id"], "left")
        unit = F.coalesce(F.col("__lss_cluster"), F.col(id_col))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", unit.cast("string"), F.lit(str(seed)))),
            9,
            4,
        ),
        16,
        10,
    ).cast("long")
    expr = F.lit(thresholds[-1][0])
    for name, bound in reversed(thresholds[:-1]):
        expr = F.when(h < bound, F.lit(name)).otherwise(expr)
    out = joined.withColumn(split_col, expr)
    if clusters is not None:
        out = out.drop("__lss_id", "__lss_cluster")
    return out


def cross_split_pairs(
    assigned: DataFrame,
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Audit relation: near-dup pairs whose endpoints landed in DIFFERENT
    splits — the leakage a cluster-atomic split must make empty.

    Run it over the SAME pair relation the clusters were built from (then
    the result is empty by construction — a regression guard), or over a
    newer/looser pair tier to measure residual leakage a stale cluster
    index would admit. Two equi-joins on the id; no all-pairs work.
    """
    # two column-disjoint projections of the same relation: every attribute
    # name is unique per leg, so the chained joins carry no ambiguous
    # reference even though both legs share one lineage
    s_a = assigned.select(
        F.col(id_col).alias("__csp_id_a"), F.col(split_col).alias("split_a")
    )
    s_b = assigned.select(
        F.col(id_col).alias("__csp_id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(s_a, F.col(a_col) == F.col("__csp_id_a"), "inner")
        .join(s_b, F.col(b_col) == F.col("__csp_id_b"), "inner")
        .filter(F.col("split_a") != F.col("split_b"))
        .drop("__csp_id_a", "__csp_id_b")
    )


def write_epoch_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Materialize one training epoch as ``shard=N`` parquet directories.

    The layout half of ``epoch_shuffle``: rows land in
    ``{path}/shard=N/`` with the intra-shard epoch order physically
    baked into the file (parquet preserves row order; ``epoch_shuffle``
    already leaves each shard's rows sorted by its pure (id, seed)
    ``ord`` key in exactly one partition, so each directory holds one
    file whose row order IS the epoch order). A sequential reader
    streams directories in shard index order; a new seed writes a fresh
    permutation. Determinism: byte-identical row content and order for
    the same (input values, seed, n_shards) regardless of input layout.
    """
    from coin_for_rich_spark.llmdata.pipeline import epoch_shuffle

    shuffled = epoch_shuffle(docs, n_shards=n_shards, seed=seed, id_col=id_col)
    shuffled.write.mode("overwrite").partitionBy("shard").parquet(path)
