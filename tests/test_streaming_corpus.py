"""Streaming corpus ingest: micro-batches dedup against the standing
fingerprint index; only fresh content lands; retries are idempotent."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import build_dedup_index, incremental_dedup
from coin_for_rich_spark.streaming import (
    ingest_batch_into_corpus,
    read_ingested_corpus,
    streaming_corpus_ingest,
)
from coin_for_rich_spark.streaming.source import read_file_stream


def _doc_text(seed: int, n_tokens: int = 60) -> str:
    return " ".join(f"w{seed}x{(i * 7) % 97}" for i in range(n_tokens))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stage_doc_chunks(spark, path: str, chunks: list[list[tuple[int, str]]]):
    """One parquet file per micro-batch, mtime-ordered so the file source
    replays them in sequence (same trick as source.stage_stream_chunks)."""
    os.makedirs(path, exist_ok=True)
    schema = None
    for i, rows in enumerate(chunks):
        df = _docs(spark, rows).coalesce(1)
        sub = os.path.join(path, f"chunk_{i}")
        df.write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub) if f.startswith("part-") and f.endswith(".parquet")
        )
        final = os.path.join(path, f"{i:03d}.parquet")
        os.replace(os.path.join(sub, part), final)
        base = os.stat(path).st_mtime
        os.utime(final, (base + 10.0 * (i + 1),) * 2)
        schema = df.schema
    return schema


def test_streaming_ingest_end_to_end(spark, tmp_path):
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    historical = _docs(spark, [(i, _doc_text(i)) for i in range(10)])
    build_dedup_index(historical, index_path)

    chunks = [
        # batch 0: one exact dup of history, one fresh
        [(100, _doc_text(3)), (101, _doc_text(1001))],
        # batch 1: near-dup of history, dup of batch 0's fresh doc,
        # in-batch exact pair, and one fresh
        [
            (200, _doc_text(5) + " tail tail"),
            (201, _doc_text(1001)),
            (202, _doc_text(2002)),
            (203, _doc_text(2002)),
            (204, _doc_text(3003)),
        ],
    ]
    stream_dir = str(tmp_path / "stream")
    schema = _stage_doc_chunks(spark, stream_dir, chunks)
    q = streaming_corpus_ingest(
        read_file_stream(spark, stream_dir, schema),
        index_path,
        corpus_path,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.doc_id: r.ingest_batch
        for r in read_ingested_corpus(spark, corpus_path).collect()
    }
    # fresh only: 101 (batch 0), 202 (in-batch keeper) + 204 (batch 1);
    # 100 exact-dup of history, 200 near-dup, 201 dup of ingested 101,
    # 203 in-batch dup of 202
    assert got == {101: 0, 202: 1, 204: 1}
    # and the index now knows everything ingested: replaying batch 1's
    # fresh docs classifies them as exact dups
    replay = incremental_dedup(
        _docs(spark, [(300, _doc_text(2002)), (301, _doc_text(3003))]), index_path
    )
    assert {r.status for r in replay.collect()} == {"exact_dup"}


def test_cold_start_ingest_survives_index_layout_flip(spark, tmp_path):
    """Regression: the fingerprint append writes to the very store the
    probe lineage reads, and a write invalidates every cached plan touching
    that path — a later append job then recomputed `fresh` THROUGH the
    index scan against the mutated directory. On a COLD-START (empty)
    index, batch 0's own bands append flips that leg from
    unpartitioned-empty to band=N partition directories mid-batch, and the
    recompute died with a partition-schema assertion (reproduced at
    ~125 docs/batch; small batches can stay fully plan-cached and mask it).
    Fixed by computing the appends from a re-read of the batch's own
    just-written corpus directory — lineage roots at those files, so the
    appends can never re-descend into the index read."""
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, []), index_path)  # cold start: empty
    n = 150
    b0 = _docs(spark, [(i, _doc_text(i)) for i in range(n)])
    b1 = _docs(
        spark,
        # half replays of batch 0 (must be suppressed), half fresh
        [(1000 + i, _doc_text(i)) for i in range(0, n, 2)]
        + [(2000 + i, _doc_text(5000 + i)) for i in range(n // 2)],
    )
    ingest_batch_into_corpus(b0, 0, index_path, corpus_path)
    ingest_batch_into_corpus(b1, 1, index_path, corpus_path)
    got = {
        r.doc_id: r.ingest_batch
        for r in read_ingested_corpus(spark, corpus_path).collect()
    }
    assert sum(1 for b in got.values() if b == 0) == n
    assert sorted(d for d, b in got.items() if b == 1) == [
        2000 + i for i in range(n // 2)
    ]


def test_batch_retry_is_idempotent(spark, tmp_path):
    """Re-running a batch (the foreachBatch retry case) must leave the
    corpus unchanged and the index semantically unchanged (duplicate
    fingerprint rows are probe-invisible)."""
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, [(0, _doc_text(0))]), index_path)

    batch = _docs(spark, [(10, _doc_text(42)), (11, _doc_text(0))])
    ingest_batch_into_corpus(batch, 7, index_path, corpus_path)
    first = sorted(read_ingested_corpus(spark, corpus_path).collect())
    probe = _docs(spark, [(90, _doc_text(42)), (91, _doc_text(777))])
    cls_first = sorted(incremental_dedup(probe, index_path).collect())

    ingest_batch_into_corpus(batch, 7, index_path, corpus_path)  # retry
    assert sorted(read_ingested_corpus(spark, corpus_path).collect()) == first
    assert sorted(incremental_dedup(probe, index_path).collect()) == cls_first


def test_empty_batch_is_noop(spark, tmp_path):
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, [(0, _doc_text(0))]), index_path)
    empty = _docs(spark, []).filter(F.lit(False))
    ingest_batch_into_corpus(empty, 0, index_path, corpus_path)
    assert not os.path.exists(os.path.join(corpus_path, "ingest_batch=0"))


def test_corpus_partition_pruning(spark, tmp_path):
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, [(0, _doc_text(0))]), index_path)
    for b in range(3):
        ingest_batch_into_corpus(
            _docs(spark, [(10 + b, _doc_text(100 + b))]),
            b,
            index_path,
            corpus_path,
        )
    corpus = read_ingested_corpus(spark, corpus_path)
    assert corpus.count() == 3
    one = corpus.filter(F.col("ingest_batch") == 1)
    assert [r.doc_id for r in one.collect()] == [11]
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "ingest_batch=1" in plan or "PartitionFilters: [isnotnull(ingest_batch" in plan


def test_compaction_preserves_rows_and_cuts_directories(spark, tmp_path):
    from coin_for_rich_spark.streaming import (
        compact_ingested_corpus,
        list_ingest_batches,
    )

    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, [(0, _doc_text(0))]), index_path)
    for b in range(5):
        ingest_batch_into_corpus(
            _docs(spark, [(10 + b, _doc_text(100 + b))]),
            b,
            index_path,
            corpus_path,
        )
    before = sorted(
        (r.doc_id, r.text) for r in read_ingested_corpus(spark, corpus_path).collect()
    )
    compact_ingested_corpus(spark, corpus_path, up_to_batch=3)
    # batches 0-3 folded into ingest_batch=3; batch 4 untouched
    assert list_ingest_batches(corpus_path) == [3, 4]
    after_df = read_ingested_corpus(spark, corpus_path)
    after = sorted((r.doc_id, r.text) for r in after_df.collect())
    assert after == before
    assert {r.ingest_batch for r in after_df.collect()} == {3, 4}
    # the folded directory is a single file
    folded_dir = os.path.join(corpus_path, "ingest_batch=3")
    parts = [f for f in os.listdir(folded_dir) if f.endswith(".parquet")]
    assert len(parts) == 1
    # idempotent on re-run (single folded dir at the watermark → no-op)
    compact_ingested_corpus(spark, corpus_path, up_to_batch=3)
    assert sorted(
        (r.doc_id, r.text) for r in read_ingested_corpus(spark, corpus_path).collect()
    ) == before
    # ingest continues after compaction and the stream of batches composes
    ingest_batch_into_corpus(
        _docs(spark, [(50, _doc_text(500))]), 5, index_path, corpus_path
    )
    assert list_ingest_batches(corpus_path) == [3, 4, 5]


def test_ingest_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Stop the stream after the first batch, start a new query on the
    same checkpoint: already-committed batches must not reprocess, new
    files drain, and the corpus holds each fresh doc exactly once."""
    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    build_dedup_index(_docs(spark, [(0, _doc_text(0))]), index_path)

    stream_dir = str(tmp_path / "stream")
    schema = _stage_doc_chunks(
        spark, stream_dir, [[(10, _doc_text(10)), (11, _doc_text(0))]]
    )
    q1 = streaming_corpus_ingest(
        read_file_stream(spark, stream_dir, schema), index_path, corpus_path, ckpt
    )
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    first = sorted(
        (r.doc_id, r.ingest_batch)
        for r in read_ingested_corpus(spark, corpus_path).collect()
    )
    assert [d for d, _ in first] == [10]

    # second chunk arrives while the stream is down; restart on the SAME
    # checkpoint — batch 0 must not be re-ingested
    import pyspark.sql.functions as SF  # noqa: F401

    _stage_doc_chunks(
        spark,
        stream_dir + "2",
        [[(20, _doc_text(20)), (21, _doc_text(10))]],  # 21 dups ingested 10
    )
    import shutil

    for f in sorted(__import__("os").listdir(stream_dir + "2")):
        if f.endswith(".parquet"):
            shutil.copy(
                __import__("os").path.join(stream_dir + "2", f),
                __import__("os").path.join(stream_dir, "z" + f),
            )
    q2 = streaming_corpus_ingest(
        read_file_stream(spark, stream_dir, schema), index_path, corpus_path, ckpt
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    final = sorted(
        (r.doc_id, r.ingest_batch)
        for r in read_ingested_corpus(spark, corpus_path).collect()
    )
    # 10 exactly once (batch 0 not reprocessed), 20 fresh in batch 1,
    # 21 deduped against the ingested 10
    assert final == [(10, 0), (20, 1)]


def test_ingest_keep_filter_gates_before_dedup(spark, tmp_path):
    """The curation hook runs before dedup: rejected docs reach neither
    the corpus nor the index, so a later acceptable duplicate still
    ingests fresh."""
    from pyspark.sql import functions as SF

    index_path = str(tmp_path / "idx")
    corpus_path = str(tmp_path / "corpus")
    build_dedup_index(_docs(spark, []), index_path)

    def min_length(df):
        return df.filter(SF.size(SF.split(SF.col("text"), " ")) >= 10)

    short = " ".join(f"w{i}" for i in range(3))
    long = " ".join(f"w{i}" for i in range(20))
    ingest_batch_into_corpus(
        _docs(spark, [(1, short), (2, long)]), 0, index_path, corpus_path,
        keep_filter=min_length,
    )
    got = {r.doc_id for r in read_ingested_corpus(spark, corpus_path).collect()}
    assert got == {2}
    # the rejected short doc left NO fingerprint: a longer doc whose text
    # begins identically (near-dup of nothing indexed) ingests fresh later
    ingest_batch_into_corpus(
        _docs(spark, [(3, long + " extra tail words here")]),
        1, index_path, corpus_path, keep_filter=min_length, threshold=0.99,
    )
    got2 = {r.doc_id for r in read_ingested_corpus(spark, corpus_path).collect()}
    assert got2 == {2, 3}
