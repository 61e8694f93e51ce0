"""Distributed Count-Min Sketch — the FREQUENCY sketch that completes the
sketch family next to the HLL distinct-count sketch (`operators/
sketches.py`) and the Bloom membership sketch (`llmdata/bloom.py`).

The 100 TB question this tier answers is the one neither neighbor can:
"how OFTEN does this item occur corpus-wide?" asked without a corpus
groupBy — boilerplate/template detection (is this line/shingle a
million-fold repeat?), hot-key diagnosis before a join, and per-batch
frequency probes against a STANDING sketch that was built once and never
rescanned. Cormode & Muthukrishnan 2005: a depth×width counter matrix;
each occurrence increments one counter per row (depth independent
hashes); an item's estimate is the MIN over its depth counters —
``est ≥ true`` always (collisions only ever ADD), with overshoot bounded
by e·N/width at probability 1−(1/2)^depth.

Representation (the Bloom convention): the sketch is a SPARSE RELATION
``(row_idx, col_idx, cnt)`` — at most depth×width rows whatever the
corpus size, mergeable with ``sum`` (union of two corpora's sketches =
one groupBy — the property that lets 1000 executors sketch shards
independently and a stream fold new batches in), and broadcastable when
dense. Building it is one explode (depth rows per occurrence) and one
map-side-combined count — no corpus-keyed shuffle, counters only.

Engine-exactness: positions come from the shared md5-prefix family
(llmdata/hashing.py) over ``item ∥ ':' ∥ row_idx`` salts, and every
counter is an exact integer — the DuckDB twin re-derives the matrix
cell-for-cell and every estimate (including collision overshoot)
bit-for-bit. No floats anywhere in the tier.

Probe paths (the bloom_probe discipline, same budget constant): within
``_MAX_SQL_LITERALS`` total cells the dense matrix inlines as one SQL
array literal (row-major) and the estimate is a codegen'd fold — zero
joins, zero shuffles, input cardinality preserved; past the budget the
dense numpy matrix broadcasts into an Arrow ``pandas_udf`` over the SAME
JVM-computed positions — bit-identical (pinned in tests/test_cms.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_bucket, md5_bucket_sql
from .similarity import _MAX_SQL_LITERALS

__all__ = ["cms_build", "cms_estimate", "cms_positions"]


def cms_positions(item: Column | str, width: int, depth: int) -> Column:
    """Array of the item's ``depth`` column positions in [0, width) — one
    md5-bucket per row salt, identical in Spark and DuckDB."""
    c = F.col(item) if isinstance(item, str) else item
    return F.array(
        *[md5_bucket(F.concat(c, F.lit(f":{r}")), width) for r in range(depth)]
    )


def _validate(width: int, depth: int) -> None:
    if width < 1 or depth < 1:
        raise ValueError(f"need width/depth >= 1, got {width}/{depth}")


def cms_build(
    items: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sparse counter relation ``(row_idx, col_idx, cnt)`` over
    every occurrence (NULL items contribute nothing; pass ``weight_col``
    to add per-row integer weights instead of 1 — e.g. pre-aggregated
    (item, count) input). One explode and one counter-keyed count —
    map-side combined, mergeable: the union of two sketches is
    ``union().groupBy(row_idx, col_idx).agg(sum(cnt))``. At most
    depth×width rows whatever the corpus size."""
    _validate(width, depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        items.filter(F.col(item_col).isNotNull())
        .select(
            w.alias("_w"),
            F.posexplode(cms_positions(item_col, width, depth)).alias(
                "row_idx", "col_idx"
            ),
        )
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame,
    cms: DataFrame,
    item_col: str,
    width: int = 2048,
    depth: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Annotate ``queries`` with the CMS frequency estimate: min over the
    item's ``depth`` counters (missing cell = 0). NULL items estimate
    NULL. ``est ≥ true count`` for every item that was sketched — the
    no-underestimate contract the cascade (sketch-filter → exact-verify
    on survivors only) depends on, pinned in tests/test_cms.py.

    The sparse relation collects into a dense row-major ``depth×width``
    long array (bounded — counter metadata, same budget class as the
    Bloom bitmap) and the probe is per-row algebra over it; past
    ``_MAX_SQL_LITERALS`` cells the matrix broadcasts as numpy into an
    Arrow ``pandas_udf`` over the same JVM-computed positions.

    CONTRACT: ``width``/``depth`` must match the ``cms_build`` geometry —
    out-of-range cells are detected from the collected rows and raise;
    a mismatched depth is undetectable from the counters alone."""
    _validate(width, depth)
    cells = {
        (int(r["row_idx"]), int(r["col_idx"])): int(r["cnt"])
        for r in cms.collect()
    }
    if cells:
        mr = max(r for r, _ in cells)
        mc = max(c for _, c in cells)
        if mr >= depth or mc >= width or min(min(k) for k in cells) < 0:
            raise ValueError(
                f"cms has cell ({mr},{mc}) outside depth={depth}/width={width}"
                " — probe geometry must match cms_build"
            )
    dense = [cells.get((r, c), 0) for r in range(depth) for c in range(width)]
    pos_sql = ", ".join(
        md5_bucket_sql(f"concat(`{item_col}`, ':{r}')", width)
        for r in range(depth)
    )
    if depth * width > _MAX_SQL_LITERALS:
        positions = F.when(
            F.col(item_col).isNotNull(), F.expr(f"array({pos_sql})")
        )
        return queries.withColumn(out_col, _estimate_udf(dense, width)(positions))
    arr_sql = "array(" + ", ".join(f"{v}L" for v in dense) + ")"
    # row-major lookup: row r's counter for this item sits at r*width + pos_r
    cell_sql = ", ".join(
        f"get({arr_sql}, cast({r} * {width} + "
        + md5_bucket_sql(f"concat(`{item_col}`, ':{r}')", width)
        + " as int))"
        for r in range(depth)
    )
    return queries.withColumn(
        out_col, F.expr(f"array_min(array({cell_sql}))")
    )


def _estimate_udf(dense: list[int], width: int):
    """Arrow fallback past the literal budget: the dense counter matrix as
    a numpy broadcast, min-probed against the JVM-computed position
    arrays — integer arithmetic only, bit-identical to the literal path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    M = np.asarray(dense, dtype=np.int64)

    # no type hints: `from __future__ import annotations` stringifies them
    # (the bloom_probe/_affinity_udf note); bare pandas_udf = SCALAR
    @pandas_udf("long")
    def est(poss):
        out = []
        for pos in poss:
            if pos is None:
                out.append(None)
            else:
                p = np.asarray(pos, dtype=np.int64)
                rows = np.arange(len(p), dtype=np.int64)
                out.append(int(M[rows * width + p].min()))
        return pd.Series(out, dtype="Int64")

    return est
