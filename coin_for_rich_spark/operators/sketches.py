"""Mergeable distinct-count sketches — the rollup pattern COUNT(DISTINCT)
cannot use.

The candle cascade (`operators/candles.cascade_rollup`) works because OHLCV
aggregates are mergeable: a 1h candle folds out of twelve 5m candles. A
distinct count is NOT mergeable — distinct-per-day does not sum to
distinct-per-week — so on a 100 TB fact table every ad-hoc range query
re-shuffles raw rows, the single most expensive recurring aggregation shape.

HLL sketches (Apache DataSketches, built into Spark as
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) restore
mergeability at a bounded error: materialize one tiny sketch blob per
(key, time-bucket) ONCE, then answer any later range at any key subset by
unioning |buckets| kilobyte-sized blobs — no fact-table rescan, no raw-row
shuffle. Exactly the pattern the reference's continuous aggregates apply to
OHLCV, extended to the one aggregate they cannot cover.

Parity anchor: the exact tier lives in
`operators/maintenance.count_distinct_pairs` (SURVEY A7,
`select_queries.sql:215-218`); this module is its declared 100 TB fast
path, with the accuracy contract pinned in tests rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: log2 of the sketch's K parameter: 4096 registers ≈ 1.6%/√(K/…) relative
#: standard error (~2.2% at three sigma for lgK=12), ~2 KB per sketch blob.
DEFAULT_LGK = 12

#: Version of the tuple-item encoding baked into every materialized sketch
#: row. Sketch blobs outlive code: partials written under one encoding and
#: merged alongside partials from another would double-count tuples
#: SILENTLY (the hashes differ, the estimate just inflates) — so the
#: rollup stamps the version and the merge refuses mixed inputs.
ENCODING_VERSION = 1


def sketch_rollup(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    time_col: str = "ts",
    bucket: str = "1 day",
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Materialize one HLL sketch of the distinct ``value_cols`` tuples per
    (keys, time bucket): ``(*keys, bucket_start, sketch)``.

    One shuffle on (keys, bucket) with map-side partial sketches — the same
    cost profile as the candle rollup. The tuple is sketched via a
    length-prefixed encoding (see :func:`_tuple_key`) that is INJECTIVE:
    distinct tuples always sketch as distinct items, exactly mirroring the
    exact tier's tuple semantics — including nulls vs literal tokens and
    values containing the join delimiter.
    """
    tup = _tuple_key(value_cols)
    return (
        df.groupBy(
            *keys,
            F.window(F.col(time_col), bucket)["start"].alias("bucket_start"),
        )
        .agg(F.hll_sketch_agg(tup, F.lit(lgk)).alias("sketch"))
        .withColumn("enc_ver", F.lit(ENCODING_VERSION))
    )


def sketch_merge(
    partials: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union per-bucket sketch blobs down to ``keys`` and estimate:
    ``(*keys, n_distinct_est)``. Input is the (filtered) output of
    :func:`sketch_rollup` — kilobytes per row, so this runs in milliseconds
    at any corpus size the rollup could be materialized for.

    Refuses partials whose ``enc_ver`` differs from this build's
    :data:`ENCODING_VERSION` — including NULL (schema-merged pre-versioning
    rows) — because tuple items hash differently across encodings, so
    mixing them would inflate estimates silently. The check rides INSIDE
    the merge job (a ``raise_error`` projection over the sketch column):
    no extra scan on the milliseconds-fast query path."""
    sk = F.col(sketch_col)
    if "enc_ver" in partials.columns:
        sk = F.when(
            F.col("enc_ver").eqNullSafe(F.lit(ENCODING_VERSION)), sk
        ).otherwise(
            F.raise_error(
                F.lit(
                    "sketch partials carry a different (or missing) tuple-"
                    f"encoding version than this build ({ENCODING_VERSION});"
                    " re-materialize them — merging across encodings "
                    "inflates estimates silently"
                )
            ).cast("binary")
        )
    merged = partials.groupBy(*keys).agg(F.hll_union_agg(sk).alias("_u"))
    return merged.select(
        *keys, F.hll_sketch_estimate(F.col("_u")).alias("n_distinct_est")
    )


def _tuple_key(value_cols: list[str]) -> Column:
    """Injective (uniquely decodable) tuple encoding: each non-null part is
    length-prefixed (``len:value``), NULL is the bare token ``n`` (which no
    length-prefixed value can collide with). Plain ``concat_ws`` would NOT
    be injective — ('a\\x1fb',) and ('a','b') would sketch as one item, and
    a value equal to the null sentinel would alias NULL."""
    parts: list[Column] = []
    for c in value_cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(F.col(c).isNull(), F.lit("n")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.concat_ws("\x1f", *parts)
