"""Streaming corpus ingest: continuous document arrival → dedup against
the standing fingerprint index → only fresh content lands in the corpus.

This is the training-data twin of the candle ingest loop (same
foreachBatch + idempotent-sink architecture as ``streaming/sink.py``; the
reference's ON CONFLICT DO NOTHING ingest, `schemas/insert_queries.sql:8`,
lifted to content identity): each micro-batch is

1. **in-batch exact dedup** — keep the smallest id per normalized content
   hash (within-batch NEAR-dups are out of scope by the same contract as
   :func:`~..llmdata.dedup_index.incremental_dedup`; the periodic
   compaction pass — the batch ladder — owns those),
2. **classified against the index** (:func:`incremental_dedup`) with the
   batch's own ids EXCLUDED from the index side: exact and near duplicates
   of anything already ingested are dropped, while fingerprints a previous
   partial attempt of THIS batch appended are invisible — without the
   exclusion, a retry would classify the batch as a duplicate of itself
   and overwrite its corpus directory with nothing,
3. **fresh docs land in the corpus** under ``ingest_batch=<id>`` with
   ``overwrite`` — a retried batch overwrites its own directory, so the
   corpus itself is exactly-once,
4. **fingerprints append to the index** (:func:`append_to_index`) so the
   NEXT batch probes see this batch's content. The append is only
   at-least-once under retries — which is SAFE here: every probe
   aggregation is duplicate-insensitive (exact leg takes min over matches,
   band candidates are ``distinct``, the verify step takes max per new
   doc), so replayed fingerprint rows change nothing. That asymmetry
   (exactly-once corpus, at-least-once index) is deliberate — it removes
   the need for transactional coupling between the two stores.

Ordering note: within one batch every doc probes the index as it stood
BEFORE the batch (step 4 runs after step 2), which is exactly the
batch-vs-index contract; cross-batch ordering is serialized by the
streaming engine (foreachBatch batches never overlap).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..llmdata.dedup_index import _norm_hash, append_to_index, incremental_dedup


def ingest_batch_into_corpus(
    batch: DataFrame,
    batch_id: int,
    index_path: str,
    corpus_path: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_filter=None,
) -> None:
    """Process ONE micro-batch (the foreachBatch body, callable directly in
    batch jobs too — backfills reuse the identical code path).

    ``keep_filter`` is an optional curation hook ``DataFrame -> DataFrame``
    applied BEFORE dedup (e.g. ``partial(quality_filter, lm=..., ...)`` or
    a length cut): rejected docs never reach the corpus OR the index, so a
    later higher-quality duplicate still gets its chance. The hook must be
    deterministic — a retry replays it."""
    if keep_filter is not None:
        batch = keep_filter(batch)
    batch = batch.persist()
    try:
        if batch.isEmpty():
            return
        # 1. in-batch exact dedup: smallest id per normalized hash — the
        # SAME content-identity function as the index's exact leg, so the
        # two steps can never disagree on what a duplicate is
        keep = (
            batch.select(F.col(id_col), _norm_hash(text_col).alias("_h"))
            .groupBy("_h")
            .agg(F.min(id_col).alias(id_col))
            .drop("_h")
        )
        deduped = batch.join(keep, id_col, "left_semi").persist()
        # 2. classify vs the standing index — excluding the batch's OWN ids
        # so a retried batch never matches fingerprints a previous partial
        # attempt appended for it (the retry-idempotency contract)
        fresh_ids = (
            incremental_dedup(
                deduped, index_path, threshold=threshold,
                text_col=text_col, id_col=id_col,
                exclude_docs=deduped.select(id_col),
            )
            .filter(F.col("status") == "fresh")
            .select(id_col)
        )
        fresh = deduped.join(fresh_ids, id_col, "left_semi").persist()
        try:
            if not fresh.isEmpty():
                # 3. exactly-once corpus write: the batch owns its directory
                out_dir = os.path.join(corpus_path, f"ingest_batch={batch_id}")
                fresh.write.mode("overwrite").parquet(out_dir)
                # 4. at-least-once fingerprint append — computed from a
                # RE-READ of the directory just written, NOT from `fresh`:
                # the append writes to the very store the probe lineage
                # READS, and a write invalidates (refreshByPath) every
                # cached plan touching that path, so a later append job
                # would recompute `fresh` THROUGH the index read against
                # the mutated directory (on a cold-start index that flips
                # the bands leg from unpartitioned-empty to band=N
                # partitions mid-batch, killing the captured read plan with
                # a partition-schema assertion; on a warm index it silently
                # re-probes against the batch's own fingerprints). The
                # batch's own corpus directory is the natural checkpoint:
                # lineage roots at the written files, nothing beyond the
                # scoped persist stays cached, and cleanup is deterministic
                # (a localCheckpoint would leak RDD blocks until driver GC).
                landed = batch.sparkSession.read.parquet(out_dir)
                append_to_index(landed, index_path, text_col, id_col)
        finally:
            fresh.unpersist()
            deduped.unpersist()
    finally:
        batch.unpersist()


def streaming_corpus_ingest(
    docs_stream: DataFrame,
    index_path: str,
    corpus_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_filter=None,
) -> StreamingQuery:
    """Run the ingest loop over a streaming document source. The index at
    ``index_path`` must already exist (:func:`build_dedup_index` on the
    historical corpus — or on an empty frame for a cold start).
    ``keep_filter`` is the per-batch curation hook (see
    :func:`ingest_batch_into_corpus`)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        ingest_batch_into_corpus(
            batch, batch_id, index_path, corpus_path, threshold, text_col,
            id_col, keep_filter,
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_ingested_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The ingested corpus as one relation; ``ingest_batch`` surfaces as a
    partition column (batch-range reads partition-prune)."""
    return spark.read.option("basePath", corpus_path).parquet(
        os.path.join(corpus_path, "ingest_batch=*")
    )


def list_ingest_batches(corpus_path: str) -> list[int]:
    """Batch ids present on disk, ascending."""
    if not os.path.isdir(corpus_path):
        return []
    out = []
    for name in os.listdir(corpus_path):
        if name.startswith("ingest_batch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def compact_ingested_corpus(
    spark: SparkSession,
    corpus_path: str,
    up_to_batch: int | None = None,
    target_partitions: int = 1,
) -> None:
    """Fold the per-batch corpus directories at or below ``up_to_batch``
    into ONE directory (``ingest_batch=<up_to_batch>``) of
    ``target_partitions`` files — the small-file maintenance pass a
    per-micro-batch layout needs at scale (a year of 10 s batches is ~3M
    directories; read-amp and listing cost grow with every one).

    Rows are preserved exactly; per-row batch provenance below the
    compaction watermark coarsens to the watermark id (the same trade a
    table format's OPTIMIZE makes). Batches ABOVE the watermark are moved,
    not rewritten. Swap protocol as in ``ParquetMergeSink.compact``: the
    compacted layout is fully staged in a sibling directory (newer batch
    dirs are renamed in — no data copy), then swapped in with two renames,
    so the corpus is never an empty/partial directory. Concurrency
    contract: run with the ingest stream stopped — a batch landing between
    the renames would write into the outgoing directory.
    """
    import uuid

    from .sink import swap_directory

    batches = list_ingest_batches(corpus_path)
    if up_to_batch is None:
        up_to_batch = max(batches, default=-1)
    fold = [b for b in batches if b <= up_to_batch]
    if len(fold) <= 1:
        return  # nothing to fold
    folded = (
        read_ingested_corpus(spark, corpus_path)
        .filter(F.col("ingest_batch") <= up_to_batch)
        .drop("ingest_batch")
        .repartition(target_partitions)
    )
    token = uuid.uuid4().hex
    staged = f"{corpus_path}__compact_{token}"
    folded.write.mode("overwrite").parquet(
        os.path.join(staged, f"ingest_batch={up_to_batch}")
    )
    for b in batches:
        if b > up_to_batch:
            os.rename(
                os.path.join(corpus_path, f"ingest_batch={b}"),
                os.path.join(staged, f"ingest_batch={b}"),
            )
    swap_directory(corpus_path, staged, token)
