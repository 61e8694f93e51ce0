"""Incremental dedup: a persisted fingerprint index so NEW batches dedup
against the EXISTING corpus without re-mining it.

At 100 TB you never re-run full-corpus dedup when a daily batch arrives —
the full MinHash pass over the historical corpus costs more than the batch
is worth. The standing structure is a fingerprint index:

- ``exact/``   — (content_hash, doc): md5 of normalized text, one row per
  indexed document. The exact leg of a batch probe is an equi-join on the
  hash — the new batch (small side) shuffles/broadcasts, the index side
  streams.
- ``bands/``   — (bhash, doc), directory-partitioned by ``band``: the
  MinHash LSH band buckets. A batch probe computes the new docs' buckets
  and equi-joins on (band, bhash) — only colliding buckets produce rows,
  the same no-all-pairs posture as :func:`~.dedup.minhash_pairs`.
- ``sigs/``    — (doc, signature array<bigint>): the full MinHash
  signatures, ~8·num_perm bytes per document. Candidate pairs are verified
  with the signature-overlap Jaccard ESTIMATE (matching positions /
  num_perm) rather than exact shingle intersection: storing shingle sets
  would re-store the corpus, signatures are constant-size per doc. The
  estimator's std error is ~sqrt(J(1-J)/num_perm) (≈0.09 at J=0.5,
  num_perm=32) — tune num_perm to the precision the dedup policy needs.
- ``meta.json`` — the shingle/permutation/band geometry. Probes and
  appends MUST use the build-time geometry or band hashes would never
  collide; every entry point re-reads it (and refuses a mismatched
  explicit override) so the contract is structural, not conventional.

Scale notes: all three relations are written repartitioned on their join
key, so a probe's shuffle moves only the NEW batch; ``bands/`` is
directory-partitioned by band, so probing a band subset (cheaper, lower
recall) prunes partitions at the scan. Appending is strictly additive
parquet (no rewrite of history), which makes the index maintainable by the
same micro-batch loop that ingests the corpus. On a cluster with a
persistent metastore, the exact/bands relations are natural candidates for
:func:`~..sources.bucketing.write_bucketed` on their join keys, which
removes even the batch-side shuffle.

Within-batch duplicates are deliberately out of scope — this operator
compares BATCH vs INDEX; run the in-batch ladder (``exact_dedup`` /
``minhash_pairs``) first, then probe, then :func:`append_to_index` the
survivors. (Reference parity: this is the content-identity analog of the
reference's ON CONFLICT DO NOTHING ingest against a standing PK index,
`schemas/insert_queries.sql:8-15`, lifted from key identity to near-dup
content identity.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_parallelism
from .dedup import content_hash, minhash_signatures

_META_FILE = "meta.json"
_DEFAULT_GEOMETRY = {"n": 3, "num_perm": 32, "bands": 8}


def _norm_hash(text_col: str) -> F.Column:
    """The exact-leg content identity — delegates to the ONE shared
    :func:`~.dedup.content_hash` definition, so the index can never
    silently fork from exact/line dedup and decontamination."""
    return content_hash(text_col)


def _band_buckets(sig: DataFrame, num_perm: int, bands: int) -> DataFrame:
    """(doc, band, bhash) rows from a signature relation — identical band
    hashing to :func:`~.dedup.minhash_pairs`, so an index built here and a
    batch probed there collide on the same buckets."""
    rows_per_band = num_perm // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col("signature")[b * rows_per_band + r]
                        for r in range(rows_per_band)
                    ]
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("doc", F.explode(band_cols).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )


def _sig_jaccard(a: F.Column, b: F.Column, num_perm: int) -> F.Column:
    """MinHash Jaccard estimate: fraction of matching signature positions."""
    matches = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.lit(float(num_perm))


def load_index_meta(path: str) -> dict:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    for key in ("n", "num_perm", "bands"):
        if not isinstance(meta.get(key), int) or meta[key] < 1:
            raise ValueError(f"dedup index meta: bad {key!r} in {path}")
    if meta["num_perm"] % meta["bands"] != 0:
        raise ValueError(
            "dedup index meta: num_perm must be divisible by bands "
            f"(got {meta['num_perm']}/{meta['bands']}) in {path}"
        )
    return meta


def _index_rows(
    docs: DataFrame, text_col: str, id_col: str, meta: dict,
    persist_sigs: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three index relations for a document set, under ``meta``'s
    geometry: (exact, bands, sigs).

    ``persist_sigs`` caches the signature relation (r15 optimization
    round): bands derive FROM sigs, so every consumer pattern that touches
    both legs — the probe's band join + signature join, the build's two
    leg writes — otherwise runs the shingle + num_perm-permutation MinHash
    pipeline twice over the same documents. The relation is |docs| rows ×
    (num_perm longs), tiny next to the corpus. Caller owns the lifetime
    (unpersist after materializing, or register in the shared cache
    registry)."""
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    exact = narrow.select(
        _norm_hash(text_col).alias("content_hash"), F.col(id_col).alias("doc")
    )
    sigs = minhash_signatures(
        narrow, text_col, id_col, n=meta["n"], num_perm=meta["num_perm"]
    )
    if persist_sigs:
        sigs = sigs.persist()
    bands = _band_buckets(sigs, meta["num_perm"], meta["bands"])
    return exact, bands, sigs


def _write_legs(
    exact: DataFrame, bands: DataFrame, sigs: DataFrame, path: str, mode: str
) -> None:
    # repartition on the probe key so each leg's layout matches its join;
    # band stays a directory partition for band-subset pruning
    exact.repartition("content_hash").write.mode(mode).parquet(
        os.path.join(path, "exact")
    )
    bands.repartition("bhash").write.partitionBy("band").mode(mode).parquet(
        os.path.join(path, "bands")
    )
    sigs.repartition("doc").write.mode(mode).parquet(os.path.join(path, "sigs"))


def build_dedup_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
) -> None:
    """Build the standing fingerprint index for ``docs`` at ``path``.

    One pass over the corpus: the signature aggregation is the only
    shuffle (|docs| rows); exact hashes and band buckets are scan-stage
    column algebra on top of it.
    """
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    meta = {
        "n": n,
        "num_perm": num_perm,
        "bands": bands,
        # the id type is part of the geometry: probe/compact reads use
        # explicit schemas (cold-start indexes have no part files to infer
        # from), so a string-id index must not be read back as bigint
        "doc_type": docs.schema[id_col].dataType.simpleString(),
        "version": 1,
    }
    os.makedirs(path, exist_ok=True)
    exact, band_rows, sigs = _index_rows(
        docs, text_col, id_col, meta, persist_sigs=True
    )
    try:
        _write_legs(exact, band_rows, sigs, path, mode="overwrite")
    finally:
        sigs.unpersist()
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f)


def append_to_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append ``docs`` to an existing index — strictly additive parquet
    under the index's OWN build-time geometry (re-read from meta.json, so
    an append can never silently fork the band hashing)."""
    meta = load_index_meta(path)
    got = docs.schema[id_col].dataType.simpleString()
    want = meta.get("doc_type", "bigint")
    if got != want:
        raise ValueError(
            f"dedup index at {path} stores {want} doc ids; appending "
            f"{got} ids would fork the leg schemas"
        )
    exact, band_rows, sigs = _index_rows(
        docs, text_col, id_col, meta, persist_sigs=True
    )
    try:
        _write_legs(exact, band_rows, sigs, path, mode="append")
    finally:
        sigs.unpersist()


def compact_dedup_index(
    spark: SparkSession, path: str, target_partitions: int = 8
) -> None:
    """Fold each index leg's accumulated append file-sets into
    ``target_partitions`` files — the small-file maintenance pass a
    per-micro-batch append pattern needs (a year of 10 s ingest batches is
    ~3M file-sets per leg; probe cost grows with file listing, not data).

    Rows are preserved exactly and stay repartitioned on their probe key
    (band directories keep their partition layout). Same staged-swap
    protocol as the corpus/sink compaction: each leg is fully rewritten
    beside the live directory, then swapped in with two renames. Run with
    ingest stopped (an append landing between renames would write into the
    outgoing directory). meta.json is untouched — geometry survives."""
    import uuid

    from ..streaming.sink import swap_directory

    meta = load_index_meta(path)  # validates the index exists/geometry
    dt = meta.get("doc_type", "bigint")
    legs = [
        ("exact", f"content_hash string, doc {dt}", "content_hash", None),
        ("bands", f"doc {dt}, bhash long, band int", "bhash", "band"),
        ("sigs", f"doc {dt}, signature array<bigint>", "doc", None),
    ]
    for name, schema, key, part_col in legs:
        live = os.path.join(path, name)
        df = spark.read.schema(schema).parquet(live)
        token = uuid.uuid4().hex
        staged = f"{live}__compact_{token}"
        writer = df.repartition(target_partitions, key).write.mode("overwrite")
        if part_col:
            writer = writer.partitionBy(part_col)
        writer.parquet(staged)
        swap_directory(live, staged, token)


def incremental_dedup(
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_bands: int | None = None,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Classify a new batch against the standing index.

    Returns one row per new document: ``(doc_id, status, match_doc,
    est_jaccard)`` with status ``'exact_dup'`` (normalized content hash
    already indexed; match_doc = smallest matching indexed doc),
    ``'near_dup'`` (best signature-estimate Jaccard ≥ ``threshold``;
    match_doc = that neighbor, ties → smallest doc), or ``'fresh'``.

    Plan shape: exact leg = one equi-join on content_hash; near leg =
    band-bucket equi-join (candidates only — no all-pairs), then one
    signature join + per-new-doc max aggregation. The historical corpus is
    touched only through its index files; ``probe_bands`` probes just the
    first k bands (partition-pruned scan — recall trades against cost
    exactly as in multi-probe LSH).

    ``exclude_docs`` (a single-column relation of doc ids) removes those
    ids from the INDEX side before matching — the retry-idempotency hook:
    a replayed ingest batch excludes its own ids so fingerprints appended
    by a previous partial attempt cannot make the batch classify as a
    duplicate of itself (requires globally unique doc ids, the same
    assumption the index's ``doc`` column already makes).
    """
    spark: SparkSession = new_docs.sparkSession
    meta = load_index_meta(path)
    # explicit schemas: a cold-start index built on an empty corpus has no
    # schema-bearing part files, and inference would fail where an empty
    # relation is the correct answer; the doc type comes from the meta
    # (a string-id index read back as bigint would fail the convert)
    dt = meta.get("doc_type", "bigint")
    idx_exact = spark.read.schema(f"content_hash string, doc {dt}").parquet(
        os.path.join(path, "exact")
    )
    idx_bands = spark.read.schema(f"doc {dt}, bhash long, band int").parquet(
        os.path.join(path, "bands")
    )
    idx_sigs = spark.read.schema(f"doc {dt}, signature array<bigint>").parquet(
        os.path.join(path, "sigs")
    )
    if probe_bands is not None:
        if not 1 <= probe_bands <= meta["bands"]:
            raise ValueError(f"probe_bands must be in [1, {meta['bands']}]")
        idx_bands = idx_bands.filter(F.col("band") < probe_bands)
    if exclude_docs is not None:
        excl = exclude_docs.select(
            F.col(exclude_docs.columns[0]).alias("doc")
        )
        idx_exact = idx_exact.join(excl, "doc", "left_anti")
        idx_bands = idx_bands.join(excl, "doc", "left_anti")
        idx_sigs = idx_sigs.join(excl, "doc", "left_anti")

    # NOT persist_sigs here (measured, r15 optimization round): the band
    # and signature legs do recompute the batch's MinHash pipeline, but
    # they execute inside one job tree where the recompute overlaps across
    # cores; forcing materialization serializes the probe into two waves
    # and measured consistently slower (sf0.1 wash, sf1 2.57 -> 2.81 s).
    # The sequential build/append writes keep the persist — there the two
    # leg writes are separate jobs with nothing to overlap.
    new_exact, new_bands, new_sigs = _index_rows(new_docs, text_col, id_col, meta)
    if probe_bands is not None:
        new_bands = new_bands.filter(F.col("band") < probe_bands)

    exact_hits = (
        new_exact.join(idx_exact, "content_hash")
        .groupBy(new_exact["doc"].alias(id_col))
        .agg(F.min(idx_exact["doc"]).alias("exact_match"))
    )

    cand = (
        new_bands.alias("nb")
        .join(
            idx_bands.alias("ib"),
            (F.col("nb.band") == F.col("ib.band"))
            & (F.col("nb.bhash") == F.col("ib.bhash")),
        )
        .select(
            F.col("nb.doc").alias("new_doc"), F.col("ib.doc").alias("idx_doc")
        )
        .distinct()
    )
    scored = (
        cand.join(
            new_sigs.select(
                F.col("doc").alias("new_doc"), F.col("signature").alias("sig_n")
            ),
            "new_doc",
        )
        .join(
            idx_sigs.select(
                F.col("doc").alias("idx_doc"), F.col("signature").alias("sig_i")
            ),
            "idx_doc",
        )
        .withColumn(
            "est_jaccard", _sig_jaccard(F.col("sig_n"), F.col("sig_i"), meta["num_perm"])
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_doc", "idx_doc", "est_jaccard")
    )
    # best neighbor = highest estimate, ties broken to the SMALLEST doc —
    # two aggregations instead of a max_by struct key because the struct
    # trick needs a numeric negation and doc ids may be strings/UUIDs
    best_est = scored.groupBy("new_doc").agg(
        F.max("est_jaccard").alias("est_jaccard")
    )
    near_best = (
        scored.join(best_est, ["new_doc", "est_jaccard"])
        .groupBy(F.col("new_doc").alias(id_col))
        .agg(
            F.min("idx_doc").alias("near_match"),
            F.max("est_jaccard").alias("est_jaccard"),
        )
    )

    base = new_docs.select(F.col(id_col))
    return (
        base.join(exact_hits, id_col, "left")
        .join(near_best, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("fresh"))
            .alias("status"),
            F.coalesce(F.col("exact_match"), F.col("near_match")).alias(
                "match_doc"
            ),
            F.when(F.col("exact_match").isNotNull(), F.lit(1.0))
            .otherwise(F.col("est_jaccard"))
            .alias("est_jaccard"),
        )
    )
