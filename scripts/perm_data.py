"""Layout-permuted twin of a dataset — identical VALUES, hostile PHYSICAL
layout. The physical-invariance axis of the gate family.

The sf1 gate proves the declared surface survives 10x volume; the skew
gate proves it survives a hostile distribution. This dataset proves the
results do not depend on HOW the bytes happen to be laid out on disk —
the axis a 1000-executor cluster actually varies run-to-run: which rows
share a partition, the order rows arrive in within a partition, how many
input splits a table arrives as, and the column order of the file
schema. A plan whose answer changes under any of these (``first()``
without an ordering, positional column access, a partition-local sample
that was accidentally load-bearing, per-partition state that leaks into
values) is wrong at scale even if every value-level gate is green,
because NONE of these layouts is stable across cluster runs.

Per table (every table — dims included — all transforms deterministic):

- **row scatter**: rows are hash-partitioned by ``xxhash64(to_json(row),
  seed)`` into a partition count chosen to be unrelated to the source
  layout (primes: 13 for facts, 7/5/3 for mid/small tables), so rows
  that were adjacent in the driver's single-file tables land in
  different splits;
- **row order scramble**: within each partition, rows are sorted by the
  DESCENDING value hash — an order correlated with nothing the queries
  group or window by;
- **column reversal**: the file schema's column order is reversed, so
  any positional (rather than by-name) column access on either the
  engine or oracle side reads the wrong field.

Values, types, and row multiplicity are untouched — after canonical
(sort columns by name, sort rows by value) comparison the twin is
indistinguishable from the source, which is precisely the property the
gate then asserts query-by-query: ``python scripts/scale_gate.py --dir
.scale/perm`` runs all 50 declared queries against their DuckDB oracles
on the permuted twin; every hash must come out identical to the
canonical run's.

Source defaults to the driver's correctness sf (sf0.01,
``SPARK_GRAFT_PERM_SRC`` to override — e.g. point it at sf0.1 for a
bench-scale pass).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_PERM_SRC", "/root/testdata/sf0.01")
# output override pairs with the source override: a composed axis (e.g.
# perm-of-skew) must not clobber the committed canonical perm dataset
PERM = os.environ.get(
    "SPARK_GRAFT_PERM_OUT", os.path.join(REPO, ".scale", "perm")
)

# Partition counts deliberately prime and unrelated to the source layout
# (driver tables are single files; sf1/skew write 2-16 parts).
_PARTS = {
    "region": 3,
    "nation": 3,
    "customer": 5,
    "supplier": 3,
    "part": 5,
    "orders": 13,
    "lineitem": 13,
    "events": 13,
    "documents": 7,
    "embeddings": 7,
}

_SEED = 0x9E3779B9  # fixed scramble seed — regeneration is idempotent


def _permute(df: DataFrame, n_parts: int) -> DataFrame:
    """Hash-scatter rows, scramble intra-partition order, reverse columns.

    The scatter key is a hash of the WHOLE row value (via to_json, which
    handles timestamps and array columns uniformly), so the layout is a
    pure function of the data — regeneration is deterministic — while
    being correlated with no key any query uses.
    """
    cols = df.columns
    h = F.xxhash64(F.to_json(F.struct(*cols)), F.lit(_SEED))
    scattered = (
        df.withColumn("__perm_h", h)
        .repartition(n_parts, "__perm_h")
        .sortWithinPartitions(F.col("__perm_h").desc())
    )
    return scattered.select(*reversed(cols))


def build(spark: SparkSession) -> dict[str, DataFrame]:
    from coin_for_rich_spark.sources import TABLES

    out = {}
    for name in TABLES:
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        out[name] = _permute(src, _PARTS[name])
    return out


def ensure_perm(spark: SparkSession) -> str:
    from scripts.dataset_gen import ensure_dataset

    return ensure_dataset(
        spark,
        out_dir=PERM,
        src_dir=SRC,
        version="perm-v1",
        copy_tables=[],  # every table is permuted — dims included
        build_fn=build,
        parts={name: None for name in _PARTS},  # layout is the product
    )


def main() -> int:
    from coin_for_rich_spark.session import get_spark

    spark = get_spark("coin_for_rich_spark-perm-data")
    ensure_perm(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
