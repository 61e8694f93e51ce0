"""Streaming sketch maintenance pins (llmdata/sketch_stream.py): the
folded standing sketch is BIT-IDENTICAL to a one-shot sketch of all
batches' items (the merge operator through the store), batch replays are
exactly-once, the end-to-end streaming fold probes correctly, and
compaction preserves the fold."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata.bloom import bloom_build, bloom_probe
from coin_for_rich_spark.llmdata.cms import cms_build, cms_estimate
from coin_for_rich_spark.llmdata.sketch_stream import (
    append_sketch_batch,
    compact_sketch_store,
    read_sketch_store,
    streaming_sketch_fold,
)


def _items(spark, tag: str, n: int, mod: int):
    return spark.createDataFrame(
        [(f"{tag}-{i % mod}",) for i in range(n)], "item string"
    )


def _sorted(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("kind", ["bloom", "cms"])
def test_folded_store_equals_one_shot(spark, tmp_path, kind):
    """N batch partials + the merge fold == one sketch of the union —
    the property that lets a firehose maintain a standing sketch without
    ever rescanning history."""
    store = str(tmp_path / f"store_{kind}")
    batches = [
        _items(spark, "a", 40, 5),
        _items(spark, "b", 30, 7),
        _items(spark, "a", 20, 3),  # overlaps batch 0 — counters must add
    ]
    for i, b in enumerate(batches):
        append_sketch_batch(b, i, store, kind, "item", n_bits=1 << 10, k=3,
                            width=128, depth=3)
    folded = read_sketch_store(spark, store, kind)
    union = batches[0].union(batches[1]).union(batches[2])
    one_shot = (
        bloom_build(union, "item", n_bits=1 << 10, k=3)
        if kind == "bloom"
        else cms_build(union, "item", width=128, depth=3)
    )
    assert _sorted(folded).equals(_sorted(one_shot))


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    """Re-appending the SAME batch id (a foreachBatch retry) leaves the
    standing CMS unchanged — the overwrite-own-partition contract. CMS is
    the hard case: at-least-once appends would double counters (Bloom's
    bit_or is replay-insensitive anyway)."""
    store = str(tmp_path / "store")
    b0, b1 = _items(spark, "x", 50, 5), _items(spark, "y", 30, 3)
    append_sketch_batch(b0, 0, store, "cms", "item", width=64, depth=3)
    append_sketch_batch(b1, 1, store, "cms", "item", width=64, depth=3)
    before = _sorted(read_sketch_store(spark, store, "cms"))
    append_sketch_batch(b1, 1, store, "cms", "item", width=64, depth=3)  # replay
    after = _sorted(read_sketch_store(spark, store, "cms"))
    assert before.equals(after)
    # and the folded counts are exact where the matrix is collision-free
    est = cms_estimate(
        spark.createDataFrame([("x-0",), ("y-1",)], "item string"),
        read_sketch_store(spark, store, "cms"),
        "item", width=64, depth=3,
    ).toPandas().set_index("item").est
    assert int(est["x-0"]) >= 10 and int(est["y-1"]) >= 10


def test_streaming_fold_end_to_end(spark, tmp_path):
    """A real file-stream replay through foreachBatch: the standing Bloom
    built by the stream answers membership for every streamed item and
    stays false for fresh ones (zero false negatives through the store)."""
    from coin_for_rich_spark.streaming.source import read_file_stream

    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    chunks = [
        [(f"doc-{i}",) for i in range(20)],
        [(f"doc-{i}",) for i in range(20, 45)],
    ]
    schema = None
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(rows, "item string").coalesce(1)
        sub = os.path.join(stage, f"chunk_{i}")
        df.write.mode("overwrite").parquet(sub)
        part = next(
            f for f in os.listdir(sub)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        final = os.path.join(stage, f"{i:03d}.parquet")
        os.replace(os.path.join(sub, part), final)
        base = os.stat(stage).st_mtime
        os.utime(final, (base + 10.0 * (i + 1),) * 2)
        schema = df.schema
    store = str(tmp_path / "store")
    q = streaming_sketch_fold(
        read_file_stream(spark, stage, schema, max_files_per_trigger=1),
        store, str(tmp_path / "ckpt"), "bloom", "item", n_bits=1 << 12, k=4,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    standing = read_sketch_store(spark, store, "bloom")
    probe = spark.createDataFrame(
        [(f"doc-{i}",) for i in range(45)] + [("never-seen-1",), ("never-seen-2",)],
        "item string",
    )
    got = bloom_probe(probe, standing, "item", n_bits=1 << 12, k=4).toPandas()
    assert got[got.item.str.startswith("doc-")].member.all()
    # 2 fresh probes at 45 items / 4096 bits: FPR ~ 1e-5, a hit means breakage
    assert not got[got.item.str.startswith("never-")].member.any()


def test_compaction_preserves_the_fold(spark, tmp_path):
    store = str(tmp_path / "store")
    for i in range(4):
        append_sketch_batch(
            _items(spark, f"t{i}", 25, 4), i, store, "cms", "item",
            width=128, depth=3,
        )
    before = _sorted(read_sketch_store(spark, store, "cms"))
    compact_sketch_store(spark, store, "cms")
    batch_dirs = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert batch_dirs == ["batch=0"]
    after = _sorted(read_sketch_store(spark, store, "cms"))
    assert before.equals(after)


def test_bad_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        read_sketch_store(spark, str(tmp_path), "hll")
    with pytest.raises(ValueError):
        append_sketch_batch(
            _items(spark, "x", 5, 2), 0, str(tmp_path / "s"), "nope", "item"
        )
