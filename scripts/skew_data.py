"""Adversarially SKEWED dataset generator — same size as sf0.1, hostile
distribution.

The scale gate (sf1) proves the surface survives 10x volume; this dataset
proves it survives the distribution a 100 TB corpus actually throws at
you: hot keys, a mega near-duplicate cluster, a dense embedding ball.
Every declared plan then runs against its DuckDB oracle on this data
(`scripts/scale_gate.py --dir .scale/skew`) — correctness must be
DISTRIBUTION-INVARIANT, and the skew-sensitive plans (salted top-N, AQE
skew joins, LSH banding, star-contraction) get exercised on the shapes
they exist for.

What is skewed (all transforms deterministic, schema/encodings passed
through untouched):

- ``events``: 50% of rows land on ONE user (`user_id := 1` where
  ``event_id % 2 = 0``) and ~60% of rows on ONE symbol (`event_type :=
  'purchase'`` where ``event_id % 10 < 6``) — the hot-exchange/hot-pair
  shape of real market data. Timestamps are untouched and globally
  unique at sf0.1 (verified), so no (key, ts) arg-max tie is created
  anywhere — remaps change GROUP SIZES, never winner identity.
- ``orders``/``lineitem``: every even order belongs to customer 1; every
  line of an even order ships part 1 from supplier 1 — join-side skew
  into the fact×dim joins (AQE skew-split territory).
- ``documents``: 5% of docs (``doc_id % 20 = 7``) become near-copies of
  one synthetic base paragraph, differing only in a per-doc tail token —
  one mega cluster for MinHash/SimHash/n-gram/connected-components
  (the "boilerplate page replicated across a crawl" shape).
- ``embeddings``: 10% of vectors (``vec_id % 10 = 3``) collapse into a
  tight ball around the all-ones direction (per-(vec,dim) hash jitter,
  pairwise cosine ≈ 0.999+) — the duplicate-image/template shape that
  stresses IVF centroid balance and LSH bucket occupancy.

Unchanged tables (region, nation, customer, supplier, part) keep their
files byte-identical via filesystem copy.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SKEW = os.path.join(REPO, ".scale", "skew")

_COPY = ["region", "nation", "customer", "supplier", "part"]
_PARTS = {"orders": 8, "lineitem": 16, "events": 8, "documents": 4,
          "embeddings": 2}

#: the mega-cluster base paragraph (synthetic boilerplate, ~60 tokens)
_BASE = (
    "terms of service page boilerplate navigation home products pricing "
    "contact about careers privacy policy cookie settings subscribe to "
    "our newsletter follow us on social media all rights reserved "
    "copyright notice the content on this site is provided as is without "
    "warranty of any kind either express or implied including fitness "
    "for a particular purpose"
)


def _raw(spark: SparkSession, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))


def skew_tables(spark: SparkSession) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    ev = _raw(spark, "events")
    out["events"] = ev.select(
        "event_id",
        "ts",
        F.when(F.col("event_id") % 2 == 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.when(F.col("event_id") % 10 < 6, F.lit("purchase"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "value",
        "props",
    )
    orders = _raw(spark, "orders")
    out["orders"] = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    li = _raw(spark, "lineitem")
    hot = F.col("l_orderkey") % 2 == 0
    out["lineitem"] = li.select(
        "l_orderkey",
        F.when(hot, F.lit(1)).otherwise(F.col("l_partkey")).alias("l_partkey"),
        F.when(hot, F.lit(1)).otherwise(F.col("l_suppkey")).alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    docs = _raw(spark, "documents")
    clustered = F.col("doc_id") % 20 == 7
    out["documents"] = docs.select(
        "doc_id",
        F.when(
            clustered,
            F.concat(F.lit(_BASE + " tail_"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        F.when(clustered, F.lit("boilerplate.example")).otherwise(
            F.col("source")
        ).alias("source"),
        "n_chars",
    ).withColumn("n_chars", F.length("text").cast("long"))
    emb = _raw(spark, "embeddings")

    def ball(x, j):
        jitter = (
            F.pmod(F.xxhash64(F.col("vec_id"), j), F.lit(1000)).cast("float")
            / F.lit(50000.0)
        ).cast("float")
        return (F.lit(1.0).cast("float") + jitter).cast("float")

    out["embeddings"] = emb.select(
        "vec_id",
        F.when(
            F.col("vec_id") % 10 == 3, F.transform("embedding", ball)
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    return out


def ensure_skew(spark: SparkSession, log=print) -> str:
    from scripts.dataset_gen import ensure_dataset

    return ensure_dataset(
        spark,
        out_dir=SKEW,
        src_dir=SF01,
        version="skew-v1",
        copy_tables=_COPY,
        build_fn=skew_tables,
        parts=_PARTS,
        log=log,
    )


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    from coin_for_rich_spark.session import get_spark
    spark = get_spark("coin_for_rich_spark-skew-gen")
    ensure_skew(spark)
    spark.stop()
