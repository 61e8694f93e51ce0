"""Cardinality-edge dataset — the degenerate shapes month-one production
data actually has, run through the full oracle gate.

The gate family's fifth axis. sf1 = volume, skew = distribution, perm =
physical layout, mem4g = memory; this dataset is CARDINALITY EDGES: the
empty fetch, the singleton key, the empty document, the zero vector,
the childless join row. It exists because exactly this class caught a
real bug the other four axes never could (the chart_read_gapfill
oracle's `greatest(NULL, ...)` spine fabricating 500 rows on an empty
fetch — DuckDB's greatest() ignores NULLs): on the declared testdata
every fetch is non-empty, every key has many rows, every document has
text. A plan (or an oracle) that is only correct when every
intermediate is populated is wrong in production, where some partition
is always empty.

Edge shapes (all deterministic, schema/types untouched, every table
non-empty so scan-schema inference stays out of scope):

- ``events``: ~1% of rows, with the ``'click'`` type REMOVED ENTIRELY —
  the chart read, gap-fill, and as-of join fetch over an EMPTY relation
  (their row contract: 0 rows, not a fabricated spine / not an error) —
  plus one SINGLETON user (exactly one event) exercising 1-row windows,
  sessions, and candles.
- ``documents``: 12 docs — seven carry edge bodies, five keep real prose — including the empty string, whitespace-only,
  a single character, pure punctuation, a unicode (accents + CJK +
  astral emoji) doc, and two EXACT duplicates — tokenizers, n-gram
  shingles (doc shorter than the shingle width), BPE training on a
  near-empty corpus, quality scoring, and dedup tiers all hit their
  floor cases.
- ``embeddings``: 9 vectors including the ALL-ZERO vector (undefined
  cosine — the documented contract: excluded, never NaN) and an exact
  duplicate pair; k (=10) now EXCEEDS the candidate count everywhere,
  and IVF trains with fewer points than its requested centroids.
- ``orders``/``lineitem``: ~0.5%, constructed so some orders have NO
  lineitems, some customers have NO orders, and some parts/suppliers
  are referenced by NOTHING — every outer-join decorate and group-by
  sees empty groups.
- dims (``region nation customer supplier part``): byte-identical
  copies; their keys now mostly dangle, which IS the edge.

Gate: ``python scripts/edge_data.py && python scripts/scale_gate.py
--dir .scale/edge``.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_EDGE_SRC", "/root/testdata/sf0.01")
EDGE = os.path.join(REPO, ".scale", "edge")

_COPY = ["region", "nation", "customer", "supplier", "part"]
_PARTS = {"orders": 2, "lineitem": 2, "events": 2, "documents": 1,
          "embeddings": 1}

#: doc_id -> replacement text for the edge documents (ids chosen from the
#: kept subset below). Two ids share one body — the exact-duplicate pair.
_EDGE_TEXTS = {
    0: "",
    43: " \t\n  \n",
    86: "a",
    129: "?!.,;:--()[]",
    172: "héllo wörld naïve café — 漢字テスト المختبر 🚀🧪",
    215: "the quick brown fox jumps over the lazy dog again and again",
    258: "the quick brown fox jumps over the lazy dog again and again",
}


def _raw(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))


def edge_tables(spark: SparkSession) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}

    # events: 1% sample, 'click' removed entirely (empty-fetch paths),
    # plus user 999999 existing as EXACTLY one row (singleton-key paths)
    ev = _raw(spark, "events")
    kept = ev.filter(
        (F.col("event_id") % 97 == 0) & (F.col("event_type") != "click")
    )
    singleton = (
        ev.filter((F.col("event_type") == "view"))
        .orderBy("event_id")
        .limit(1)
        .select(
            (F.col("event_id") + 10_000_000).alias("event_id"),
            "ts",
            F.lit(999999).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    out["events"] = kept.unionByName(singleton)

    # documents: 12 docs; seven carry the edge bodies above, the rest keep
    # their original prose so trained models (BPE/char-LM) stay non-trivial
    doc = _raw(spark, "documents").filter(F.col("doc_id") % 43 == 0)
    edge_map = F.create_map(
        *[x for k, v in _EDGE_TEXTS.items() for x in (F.lit(k), F.lit(v))]
    )
    new_text = F.coalesce(edge_map[F.col("doc_id")], F.col("text"))
    out["documents"] = doc.select(
        "doc_id",
        new_text.alias("text"),
        "lang",
        "source",
        F.length(new_text).cast("long").alias("n_chars"),
    )

    # embeddings: 9 vectors; vec 0 becomes the all-zero vector, vec 434
    # becomes an exact duplicate of vec 62
    emb = _raw(spark, "embeddings").filter(F.col("vec_id") % 62 == 0)
    dim = len(
        _raw(spark, "embeddings").select("embedding").first()["embedding"]
    )
    zero = F.array([F.lit(0.0).cast("float")] * dim)
    dup_src = emb.filter(F.col("vec_id") == 62).select(
        F.col("embedding").alias("__dup_emb")
    )
    # fail fast if the duplicate-source row is missing (an override source
    # without vec 62 would make the broadcast side EMPTY and the whole
    # embeddings table silently empty — violating this module's own
    # "every table non-empty" contract)
    if dup_src.count() != 1:
        raise ValueError(
            "edge embeddings need exactly one vec_id==62 row as the "
            "duplicate source; the configured source dataset lacks it"
        )
    emb2 = emb.crossJoin(F.broadcast(dup_src))
    out["embeddings"] = emb2.select(
        "vec_id",
        F.when(F.col("vec_id") == 0, zero)
        .when(F.col("vec_id") == 434, F.col("__dup_emb"))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )

    # orders: 0.5%; lineitem: only lines of EVEN kept orders — odd kept
    # orders are childless, most customers/parts/suppliers dangle
    orders = _raw(spark, "orders").filter(F.col("o_orderkey") % 211 == 0)
    li = _raw(spark, "lineitem").filter(
        (F.col("l_orderkey") % 211 == 0) & (F.col("l_orderkey") % 2 == 0)
    )
    out["orders"] = orders
    out["lineitem"] = li
    return out


def ensure_edge(spark: SparkSession) -> str:
    from scripts.dataset_gen import ensure_dataset

    return ensure_dataset(
        spark,
        out_dir=EDGE,
        src_dir=SRC,
        version="edge-v1",
        copy_tables=_COPY,
        build_fn=edge_tables,
        parts=_PARTS,
    )


def main() -> int:
    from coin_for_rich_spark.session import get_spark

    spark = get_spark("coin_for_rich_spark-edge-data")
    ensure_edge(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
