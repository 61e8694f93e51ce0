"""Pins for the degenerate-input contracts adjudicated in round 10.

The r9 edge gate (.scale/edge: empty docs, whitespace-only docs, a zero
vector in the embedding pool) shipped with 4 engine-vs-oracle divergences.
Each was adjudicated — three oracle-side phantom-token/NULL bugs, one
engine contract gap (LSH ANN could return < k rows on a degenerate
candidate pool) — and the resulting contracts are pinned here so a future
refactor of EITHER side re-fails loudly. Empty partitions and degenerate
rows are not edge cases at 100 TB; they are every run.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import cosine_knn, lsh_ann_knn
from coin_for_rich_spark.llmdata.pipeline import pack_sequences
from coin_for_rich_spark.llmdata.similarity import knn_join
from coin_for_rich_spark.llmdata.textstats import doc_profile

MD5_EMPTY = hashlib.md5(b"").hexdigest()


def _unit(i: int, dims: int = 8) -> list[float]:
    v = [0.0] * dims
    v[i % dims] = 1.0
    return v


def test_lsh_ann_knn_guarantees_min_k_n_results(spark):
    """ensure_k (default): the ANN result has min(k, N) rows even when the
    candidate pool is degenerate — a zero-vector query over a tiny corpus,
    the exact shape that returned 3 rows for k=10 in the r9 edge gate."""
    rows = [(i, _unit(i)) for i in range(1, 7)] + [(0, [0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = lsh_ann_knn(emb, [0.0] * 8, k=10).collect()
    assert len(got) == 7  # min(k=10, N=7): the exact-scan backfill fired
    # zero query: cosine exactly 0.0 with everything, ids ascending (the
    # clamp contract — never NULL, never excluded)
    assert [(r.vec_id, r.cosine) for r in got] == [(i, 0.0) for i in range(7)]
    # and the backfill result IS the exact full-scan top-k
    exact = cosine_knn(emb, [0.0] * 8, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]


def test_lsh_ann_knn_localization_preserves_values(spark):
    """When the pruned pool DOES cover k, ensure_k only localizes the k
    rows — values, order, and schema identical to the lazy plan."""
    rows = [(i, [float(i), 1.0, 0.5 * i]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 1.0, 1.0]
    eager = lsh_ann_knn(emb, q, k=5, ensure_k=True)
    lazy = lsh_ann_knn(emb, q, k=5, ensure_k=False)
    assert eager.schema == lazy.schema
    assert [tuple(r) for r in eager.collect()] == [
        tuple(r) for r in lazy.collect()
    ]
    assert eager.count() == 5


def test_knn_join_zero_vector_scores_exact_zero_both_directions(spark):
    """The zero-norm clamp contract (similarity._normed_rows): a zero
    vector scores cosine EXACTLY 0.0 against everything — as a query row
    (its neighbors are the lowest ids, all at 0.0) and as a neighbor of
    other rows. The r9 edge oracle emitted -1.0 rows here; the oracle now
    encodes this rule and this test pins the engine side of it."""
    rows = [(0, [0.0, 0.0, 0.0])] + [
        (i, _unit(i, 3)) for i in range(1, 5)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join(emb, k=2, n_blocks=2)
    got = sorted(
        ((r.vec_id, r.rank, r.nbr, r.cosine) for r in out.collect())
    )
    # zero vector's top-2: ids 1, 2 at exactly 0.0 (ties -> nbr asc)
    assert [(n, c) for v, k_, n, c in got if v == 0] == [(1, 0.0), (2, 0.0)]
    # every other row sees SOME neighbor at 0.0 and none at NULL/-1
    for v, k_, n, c in got:
        assert c is not None and c >= 0.0


def test_pack_sequences_empty_and_whitespace_docs_are_zero_tokens(spark):
    """token_count drops empty strings after split: an empty doc AND a
    whitespace-only doc ('\\t\\n  \\n ') are 0 tokens, so they shift no
    downstream cum_before/seq_offset. The r9 edge oracle counted 1 and 2
    phantom tokens for these shapes; both sides now agree on 0."""
    df = spark.createDataFrame(
        [(0, ""), (1, "\t\n  \n "), (2, "a b c"), (3, "   "), (4, "d e")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pack_sequences(df, budget=4).collect()}
    assert [got[i].n_tokens for i in range(5)] == [0, 0, 3, 0, 2]
    # the phantom-free prefix: doc 2 starts at 0, doc 4 right after it
    assert got[2].cum_before == 0 and got[2].seq_offset == 0
    assert got[4].cum_before == 3 and got[4].seq_id == 0 and got[4].seq_offset == 3


def test_doc_profile_empty_doc_ratios_and_fingerprint(spark):
    """Empty doc through the fused profile scan: every ratio is 0.0 (never
    NaN/NULL), n_distinct_tokens 0 (not SQL split's phantom ['']), and the
    bag fingerprint is md5('') — the value DuckDB's array_to_string(NULL)
    used to miss."""
    df = spark.createDataFrame(
        [(0, ""), (1, "real words here")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in doc_profile(df).collect()}
    e = rows[0]
    assert e.n_tokens == 0 and e.n_distinct_tokens == 0
    assert e.punct_ratio == 0.0 and e.stopword_ratio == 0.0
    assert e.top_token_frac == 0.0 and e.dup_ngram_frac == 0.0
    assert e.bag_fingerprint == MD5_EMPTY
    assert rows[1].n_tokens == 3
