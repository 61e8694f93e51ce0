"""Incremental dedup against the persisted fingerprint index: batch-vs-
index classification, append equivalence with a full rebuild, geometry
pinning, band-subset probing."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import (
    append_to_index,
    build_dedup_index,
    incremental_dedup,
    load_index_meta,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sentence(seed: int, n_tokens: int = 60) -> str:
    # deterministic pseudo-text with enough 3-gram shingles to fingerprint;
    # the seed is baked into every token so distinct seeds share nothing
    words = [f"tok{seed}x{(i * 7) % 97}" for i in range(n_tokens)]
    return " ".join(words)


@pytest.fixture()
def corpus(spark):
    return _docs(spark, [(i, _sentence(i)) for i in range(20)])


def test_incremental_classification(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path)

    batch = _docs(
        spark,
        [
            # exact copy of doc 3 (case/trim-normalized)
            (100, _sentence(3).upper() + "  "),
            # near copy of doc 5: append two tokens (58/62 shingles shared)
            (101, _sentence(5) + " extra tail"),
            # fresh content
            (102, _sentence(9999)),
            (103, _sentence(8888)),
        ],
    )
    out = {
        r.doc_id: r
        for r in incremental_dedup(batch, path, threshold=0.5).collect()
    }
    assert out[100].status == "exact_dup" and out[100].match_doc == 3
    assert out[100].est_jaccard == 1.0
    assert out[101].status == "near_dup" and out[101].match_doc == 5
    assert 0.5 <= out[101].est_jaccard <= 1.0
    assert out[102].status == "fresh" and out[102].match_doc is None
    assert out[103].status == "fresh" and out[103].est_jaccard is None


def test_append_equals_rebuild(spark, corpus, tmp_path):
    """Classifying C against (build(A); append(B)) must equal classifying
    C against build(A ∪ B) — appending can't fork the band hashing."""
    a = corpus
    b = _docs(spark, [(i, _sentence(i)) for i in range(50, 60)])
    c = _docs(
        spark,
        [
            (200, _sentence(55)),  # exact dup of appended doc
            (201, _sentence(2) + " x y"),  # near dup of original doc
            (202, _sentence(7777)),  # fresh
        ],
    )
    p1 = str(tmp_path / "incr")
    build_dedup_index(a, p1)
    append_to_index(b, p1)
    p2 = str(tmp_path / "full")
    build_dedup_index(a.unionByName(b), p2)

    r1 = sorted(incremental_dedup(c, p1).collect())
    r2 = sorted(incremental_dedup(c, p2).collect())
    assert r1 == r2
    statuses = {r.doc_id: r.status for r in r1}
    assert statuses == {200: "exact_dup", 201: "near_dup", 202: "fresh"}


def test_meta_geometry_is_pinned(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path, num_perm=16, bands=4)
    meta = load_index_meta(path)
    assert (meta["num_perm"], meta["bands"]) == (16, 4)
    # probe works under the stored geometry without restating it
    batch = _docs(spark, [(300, _sentence(3))])
    (row,) = incremental_dedup(batch, path).collect()
    assert row.status == "exact_dup"
    # a corrupted geometry fails loud at probe time, not silently no-match
    meta["num_perm"] = 15  # not divisible by bands → signature mismatch
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    with pytest.raises(Exception):
        incremental_dedup(batch, path).collect()


def test_probe_band_subset_prunes_and_bounds_recall(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path)
    batch = _docs(spark, [(400, _sentence(4) + " z"), (401, _sentence(6666))])
    full = {r.doc_id: r.status for r in incremental_dedup(batch, path).collect()}
    sub = {
        r.doc_id: r.status
        for r in incremental_dedup(batch, path, probe_bands=2).collect()
    }
    # subset probing can only LOSE near-dup hits, never invent them
    for did, st in sub.items():
        assert st == full[did] or (st == "fresh" and full[did] == "near_dup")
    with pytest.raises(ValueError, match="probe_bands"):
        incremental_dedup(batch, path, probe_bands=99).collect()
    # the band filter reaches the scan as a partition filter (bands/ is
    # directory-partitioned by band)
    probed = incremental_dedup(batch, path, probe_bands=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_deterministic_and_no_cartesian(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path)
    batch = _docs(
        spark, [(500 + i, _sentence(i) + " q") for i in range(10)]
    )
    out = incremental_dedup(batch, path)
    assert sorted(out.collect()) == sorted(out.collect())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_within_batch_dups_are_out_of_scope(spark, corpus, tmp_path):
    """Two identical fresh docs in one batch both classify 'fresh' — the
    documented contract (in-batch dedup is the existing ladder's job)."""
    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path)
    batch = _docs(spark, [(600, _sentence(4242)), (601, _sentence(4242))])
    out = {r.doc_id: r.status for r in incremental_dedup(batch, path).collect()}
    assert out == {600: "fresh", 601: "fresh"}


def test_cold_start_empty_index(spark, tmp_path):
    """An index built on an empty corpus (the streaming cold start) probes
    as all-fresh, and appends bring it to life."""
    from coin_for_rich_spark.llmdata import append_to_index

    path = str(tmp_path / "idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_dedup_index(empty, path)
    batch = _docs(spark, [(1, _sentence(1))])
    (row,) = incremental_dedup(batch, path).collect()
    assert (row.status, row.match_doc) == ("fresh", None)
    append_to_index(batch, path)
    (row2,) = incremental_dedup(_docs(spark, [(2, _sentence(1))]), path).collect()
    assert (row2.status, row2.match_doc) == ("exact_dup", 1)


def test_compact_dedup_index_preserves_probes_and_cuts_files(spark, corpus, tmp_path):
    from coin_for_rich_spark.llmdata import compact_dedup_index

    path = str(tmp_path / "idx")
    build_dedup_index(corpus, path)
    for b in range(4):  # appends accumulate file-sets per leg
        append_to_index(
            _docs(spark, [(1000 + b, _sentence(700 + b))]), path
        )
    probe = _docs(
        spark,
        [(5000, _sentence(3)), (5001, _sentence(702)), (5002, _sentence(9009))],
    )
    before = sorted(incremental_dedup(probe, path).collect())

    def leg_files(leg):
        n = 0
        for root, _dirs, files in os.walk(os.path.join(path, leg)):
            n += sum(f.endswith(".parquet") for f in files)
        return n

    files_before = {leg: leg_files(leg) for leg in ("exact", "bands", "sigs")}
    compact_dedup_index(spark, path, target_partitions=2)
    files_after = {leg: leg_files(leg) for leg in ("exact", "bands", "sigs")}
    assert all(files_after[leg] < files_before[leg] for leg in files_after)
    # identical classifications, geometry intact, appends still compose
    assert sorted(incremental_dedup(probe, path).collect()) == before
    assert load_index_meta(path)["bands"] == 8
    append_to_index(_docs(spark, [(2000, _sentence(800))]), path)
    (row,) = incremental_dedup(_docs(spark, [(5003, _sentence(800))]), path).collect()
    assert row.status == "exact_dup"


def test_string_id_index_round_trips(spark, tmp_path):
    """Indexes keyed by non-bigint ids (URLs, UUIDs) must build, probe,
    append, and compact — the probe readers take the id type from meta."""
    from coin_for_rich_spark.llmdata import compact_dedup_index

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(f"url-{i}", _sentence(i)) for i in range(10)],
        "doc_id string, text string",
    )
    build_dedup_index(docs, path)
    assert load_index_meta(path)["doc_type"] == "string"
    batch = spark.createDataFrame(
        [("new-1", _sentence(3)), ("new-2", _sentence(999))],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in incremental_dedup(batch, path).collect()}
    assert out["new-1"].status == "exact_dup" and out["new-1"].match_doc == "url-3"
    assert out["new-2"].status == "fresh"
    append_to_index(batch.filter("doc_id = 'new-2'"), path)
    compact_dedup_index(spark, path, target_partitions=1)
    (row,) = incremental_dedup(
        spark.createDataFrame([("p", _sentence(999))], "doc_id string, text string"),
        path,
    ).collect()
    assert (row.status, row.match_doc) == ("exact_dup", "new-2")
    # mismatched id type on append fails loud instead of forking the legs
    with pytest.raises(ValueError, match="doc ids"):
        append_to_index(_docs(spark, [(1, _sentence(1))]), path)
