"""sf1 dataset generator — ALL ten driver tables at 10x sf0.1.

Round 9's scale smoke replicated only ``events`` and ``documents`` (the six
most expensive plans touch nothing else). Round 10 runs the FULL 50-query
oracle gate at sf1, which needs every table, replicated with consistent
foreign keys so the relational plans keep joining what they joined at
sf0.1. Shared by ``scripts/scale_smoke.py`` (perf ratios) and
``scripts/scale_gate.py`` (bit-exact Spark-vs-DuckDB at 10x).

Replication design — 10x along the axis that grows at 100 TB, without
collapsing structure into a degenerate everything-matches blob:

- **Fixed universes stay fixed** (that's how real data scales): ``region``
  / ``nation`` dims, ``p_brand``/``p_type``, ``c_mktsegment``,
  ``event_type`` (the candle key — 5 symbols at every sf, so rollup width
  is constant and per-key volume grows), document ``lang``/``source``,
  embedding ``label``.
- **Key spaces grow 10x with FK consistency**: replica i offsets every
  surrogate key by ``i * (max_key + 1)`` on BOTH sides of each join
  (custkey in customer+orders, orderkey in orders+lineitem, partkey /
  suppkey in part / supplier + lineitem, user_id/event_id in events,
  doc_id in documents, vec_id in embeddings). Entity names are suffixed
  ``_r{i}`` so name-grouped results keep one group per entity instead of
  merging ten keys under one label.
- **documents**: every whitespace token is suffixed ``_r{i}`` — replicas
  share no shingles/words, so near-dup pairs, BPE word distributions, and
  cluster layouts replicate exactly 10x (ten identical copies would
  instead measure one giant everything-matches component — a pathology,
  not scale). ``n_chars`` is recomputed from the suffixed text.
- **embeddings**: replica i applies a deterministic per-dimension SIGN
  FLIP (``xxhash64(i, dim) % 2 → ±1``) — an exact orthogonal reflection,
  so every intra-replica inner product (hence cosine, near-dup pair,
  kNN list) is preserved BIT-FOR-BIT while cross-replica similarities
  scramble toward zero. The similarity workload thus scales exactly 10x
  in both corpus and answer structure. Negation is exact in IEEE floats:
  no precision drift enters the oracle comparison.
- **Timestamps are untouched and physical encodings pass through**: the
  generator reads raw parquet (no loader normalization) and writes the
  same column types the driver wrote (µs-NTZ since r3), so
  ``sources.tables.load_table`` and the DuckDB oracle see sf1 exactly as
  they see the driver's own files. The event-time window stays fixed
  while key density grows — the reference's ingest scales by symbol
  universe, not by stretching time.

Idempotent: generation is skipped when the ident marker (source file
sizes + mtimes + design version) matches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# output override composes the replicator: pointing SPARK_GRAFT_SF_DIR at
# a generated sf1 with SPARK_GRAFT_SF1_OUT=.scale/sf10 produces the next
# decade (sf10) — the key-offset/suffix/sign-flip design is span-generic,
# so a second application preserves every structural property
SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_OUT", os.path.join(REPO, ".scale", "sf1")
)
REPLICAS = 10

#: tables copied verbatim (fixed dimension universes)
_FIXED = ["region", "nation"]
#: write-side partition counts, sized so sf1 part files land in the same
#: few-MB range as the driver's sf0.1 files (maxPartitionBytes=8MB posture)
_PARTS = {
    "customer": 8,
    "supplier": 2,
    "part": 8,
    "orders": 32,
    "lineitem": 64,
    "events": 32,
    "documents": 16,
    "embeddings": 4,
}


def _raw(spark: SparkSession, name: str) -> DataFrame:
    """Raw physical read — replication must pass encodings through, not
    normalize them (load_table's contract is applied by CONSUMERS)."""
    return spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))


def _offset(col: str, i: int, span: int) -> F.Column:
    return (F.col(col) + F.lit(i * span)).alias(col)


def _suffix(col: str, i: int) -> F.Column:
    return F.concat(F.col(col), F.lit(f"_r{i}")).alias(col) if i else F.col(col)


def _sign_flip(i: int):
    """Per-replica deterministic ±1 reflection of each embedding dim
    (exact in IEEE floats — see module docstring)."""

    def flip(x, j):
        sign = (
            F.lit(1) - F.lit(2) * F.pmod(F.xxhash64(F.lit(i), j), F.lit(2))
        ).cast("float")
        return (x * sign).cast("float")

    return flip


def _union(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _key_spans(df: DataFrame, *cols: str) -> list[int]:
    """max+1 per key column — ONE scan per table, however many keys."""
    row = df.agg(*[F.max(c) for c in cols]).first()
    return [int(v) + 1 for v in row]


def replicate_all(spark: SparkSession) -> dict[str, DataFrame]:
    cust = _raw(spark, "customer")
    supp = _raw(spark, "supplier")
    part = _raw(spark, "part")
    orders = _raw(spark, "orders")
    li = _raw(spark, "lineitem")
    ev = _raw(spark, "events")
    docs = _raw(spark, "documents")
    emb = _raw(spark, "embeddings")

    span = {}
    (span["cust"],) = _key_spans(cust, "c_custkey")
    (span["supp"],) = _key_spans(supp, "s_suppkey")
    (span["part"],) = _key_spans(part, "p_partkey")
    (span["order"],) = _key_spans(orders, "o_orderkey")
    span["event"], span["user"] = _key_spans(ev, "event_id", "user_id")
    (span["doc"],) = _key_spans(docs, "doc_id")
    (span["vec"],) = _key_spans(emb, "vec_id")

    out: dict[str, DataFrame] = {}
    out["customer"] = _union(
        [
            cust.select(
                _offset("c_custkey", i, span["cust"]),
                _suffix("c_name", i),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
            for i in range(REPLICAS)
        ]
    )
    out["supplier"] = _union(
        [
            supp.select(
                _offset("s_suppkey", i, span["supp"]),
                _suffix("s_name", i),
                "s_nationkey",
                "s_acctbal",
            )
            for i in range(REPLICAS)
        ]
    )
    out["part"] = _union(
        [
            part.select(
                _offset("p_partkey", i, span["part"]),
                _suffix("p_name", i),
                "p_brand",
                "p_type",
                "p_size",
                "p_retailprice",
            )
            for i in range(REPLICAS)
        ]
    )
    out["orders"] = _union(
        [
            orders.select(
                _offset("o_orderkey", i, span["order"]),
                _offset("o_custkey", i, span["cust"]),
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
            for i in range(REPLICAS)
        ]
    )
    out["lineitem"] = _union(
        [
            li.select(
                _offset("l_orderkey", i, span["order"]),
                _offset("l_partkey", i, span["part"]),
                _offset("l_suppkey", i, span["supp"]),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
            for i in range(REPLICAS)
        ]
    )
    out["events"] = _union(
        [
            ev.select(
                _offset("event_id", i, span["event"]),
                "ts",
                _offset("user_id", i, span["user"]),
                "event_type",
                "value",
                "props",
            )
            for i in range(REPLICAS)
        ]
    )
    out["documents"] = _union(
        [docs]
        + [
            docs.select(
                _offset("doc_id", i, span["doc"]),
                F.regexp_replace("text", r"(\S+)", f"$1_r{i}").alias("text"),
                "lang",
                "source",
                "n_chars",
            ).withColumn("n_chars", F.length("text").cast("long"))
            for i in range(1, REPLICAS)
        ]
    )
    out["embeddings"] = _union(
        [emb]
        + [
            emb.select(
                _offset("vec_id", i, span["vec"]),
                F.transform("embedding", _sign_flip(i)).alias("embedding"),
                "label",
            )
            for i in range(1, REPLICAS)
        ]
    )
    return out


def ensure_sf1(spark: SparkSession, log=print) -> str:
    """Generate (or reuse) the full sf1 dataset; returns its directory."""
    from scripts.dataset_gen import ensure_dataset

    return ensure_dataset(
        spark,
        out_dir=SF1,
        src_dir=SF01,
        version=f"sf1-x{REPLICAS}",
        copy_tables=_FIXED,
        build_fn=replicate_all,
        parts=_PARTS,
        log=log,
    )
