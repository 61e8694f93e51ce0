"""Streaming sketch maintenance: fold per-micro-batch Bloom / Count-Min
partials into a STANDING sketch store — the streaming posture of the
sketch family (``llmdata/bloom.py``, ``llmdata/cms.py``), mirroring the
ingest-time infrastructure pattern of the dedup index and the corpus
loop (``llmdata/dedup_index.py``, ``streaming/corpus.py``).

The store is APPEND-ONLY with merge-on-read — the design both sketches'
algebra makes free:

- each micro-batch writes its OWN partial sketch under
  ``batch=<batch_id>`` with ``overwrite``, so a replayed batch overwrites
  its own partition and the store is exactly-once per batch id (the
  corpus loop's contract, without needing the Bloom bit_or's replay
  insensitivity — CMS counters would double under at-least-once);
- the standing sketch is ONE groupBy fold over the partials (``bit_or``
  for Bloom words, ``sum`` for CMS counters) — bounded by
  batches × cells rows whatever the corpus size, and the fold is the
  sketches' documented merge operator, so folded ≡ one-shot bit-for-bit
  (pinned in tests/test_cms.py);
- ``compact_sketch_store`` rewrites the fold as a single partition when
  the batch count grows — the only maintenance the store ever needs.

At 100 TB: executors sketch each batch's shards in parallel (the build
is one explode + map-side-combined aggregate), the written partial is
cells-sized (KB), and no batch ever rescans history — the exact shape a
standing contamination filter / frequency monitor over a firehose needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .bloom import bloom_build
from .cms import cms_build

__all__ = [
    "append_sketch_batch",
    "read_sketch_store",
    "streaming_sketch_fold",
    "compact_sketch_store",
]

_KINDS = ("bloom", "cms")


def _build(batch: DataFrame, kind: str, item_col: str, **geom) -> DataFrame:
    if kind == "bloom":
        return bloom_build(
            batch, item_col, n_bits=geom.get("n_bits", 1 << 16), k=geom.get("k", 5)
        )
    if kind == "cms":
        return cms_build(
            batch,
            item_col,
            width=geom.get("width", 2048),
            depth=geom.get("depth", 4),
            weight_col=geom.get("weight_col"),
        )
    raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")


def append_sketch_batch(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    kind: str,
    item_col: str,
    **geom,
) -> None:
    """The foreachBatch body (callable directly in batch jobs — backfills
    reuse the identical code path): build THIS batch's partial sketch and
    write it under ``batch=<batch_id>`` with overwrite. A replay of the
    same batch id rewrites the same partition with the same deterministic
    content — exactly-once without coordination."""
    partial = _build(batch, kind, item_col, **geom)
    partial.write.mode("overwrite").parquet(
        os.path.join(store_path, f"batch={int(batch_id)}")
    )


def read_sketch_store(
    spark: SparkSession, store_path: str, kind: str
) -> DataFrame:
    """The standing sketch: one merge fold over every batch partial —
    ``bit_or`` of Bloom words / ``sum`` of CMS counters, the sketches'
    documented merge operators, so the result is bit-identical to a
    one-shot sketch of all batches' items. Bounded by batches × cells
    rows; feed directly to ``bloom_probe`` / ``cms_estimate``."""
    if kind not in _KINDS:
        raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
    # basePath keeps the batch partition column OUT of the sketch schema
    df = spark.read.option("basePath", store_path).parquet(
        os.path.join(store_path, "batch=*")
    )
    if kind == "bloom":
        return df.groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
    return df.groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))


def streaming_sketch_fold(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    kind: str,
    item_col: str,
    **geom,
) -> StreamingQuery:
    """Wire a streaming relation into the store: every micro-batch appends
    its partial via :func:`append_sketch_batch` (exactly-once per batch id
    under replays). Same foreachBatch architecture as the corpus ingest
    loop; geometry kwargs must stay constant for a store's lifetime — the
    probes' contract (bloom.py / cms.py docstrings) extends to the fold."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        append_sketch_batch(batch, batch_id, store_path, kind, item_col, **geom)

    return (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_sketch_store(
    spark: SparkSession, store_path: str, kind: str
) -> None:
    """Rewrite the fold as a single ``batch=0`` partition (read the
    standing sketch, write it to a sibling dir, atomic-ish swap via
    rename). Call when the batch count makes the merge-on-read fold's
    input noticeably larger than one sketch — the store's only
    maintenance operation."""
    import shutil
    import tempfile

    folded = read_sketch_store(spark, store_path, kind)
    tmp = tempfile.mkdtemp(prefix="cfr_sketch_compact_")
    folded.write.mode("overwrite").parquet(os.path.join(tmp, "batch=0"))
    old = store_path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(store_path, old)
    os.replace(tmp, store_path)
    shutil.rmtree(old, ignore_errors=True)
