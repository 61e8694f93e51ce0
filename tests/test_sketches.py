"""Mergeable HLL sketch rollup: merged partials must agree with a direct
sketch over the same range, estimates must hit the exact tier within the
sketch's error bound, and the tuple encoding must be null-safe."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from coin_for_rich_spark.operators.sketches import sketch_merge, sketch_rollup
from coin_for_rich_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_merged_partials_match_direct_sketch(spark, events):
    """Mergeability is the whole point: unioning per-day partial sketches
    must estimate exactly what one sketch over the raw range estimates —
    HLL unions are lossless for same-lgK sketches."""
    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    merged = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketch_merge(partials, ["event_type"]).collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct and len(merged) > 1


def test_estimate_within_error_bound_of_exact(events):
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    est = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketch_merge(partials, ["event_type"]).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(3, 0.05 * n), (k, est[k], n)


def test_range_query_over_partial_buckets(events):
    """The operating pattern: filter the materialized partials to a time
    range, merge only those blobs, and land within the bound of the exact
    count over the same range."""
    lo, hi = events.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    mid = lo + (hi - lo) / 2
    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    ranged = sketch_merge(
        partials.filter(F.col("bucket_start") >= F.date_trunc("day", F.lit(mid))),
        ["event_type"],
    )
    exact = {
        r["event_type"]: r["n"]
        for r in events.filter(
            F.col("ts") >= F.date_trunc("day", F.lit(mid))
        )
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in ranged.collect():
        n = exact[r["event_type"]]
        assert abs(r["n_distinct_est"] - n) <= max(3, 0.05 * n)


def test_tuple_encoding_is_injective(spark):
    df = spark.createDataFrame(
        [
            ("k", "a", None),  # null position matters
            ("k", None, "a"),
            ("k", "a", "b"),
            ("k", "a", "b"),  # true duplicate
            ("k", "a\x1fb", None),  # delimiter inside a value ≠ two values
            ("k", "n", None),  # literal 'n' ≠ NULL
            ("k", None, None),
        ],
        "g string, x string, y string",
    )
    partials = sketch_rollup(
        df.withColumn("ts", F.lit("2026-01-01").cast("timestamp")),
        ["g"],
        ["x", "y"],
    )
    est = sketch_merge(partials, ["g"]).collect()[0]["n_distinct_est"]
    # six distinct tuples — every would-be collision must stay distinct
    assert est == 6


def test_sketch_partials_survive_parquet_materialization(spark, events, tmp_path):
    """The operating model is materialize-once-query-many: sketch blobs
    written to parquet and read back must merge to the same estimates as
    the in-memory partials."""
    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    live = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketch_merge(partials, ["event_type"]).collect()
    }
    path = str(tmp_path / "sketches")
    partials.write.mode("overwrite").parquet(path)
    stored = {
        r["event_type"]: r["n_distinct_est"]
        for r in sketch_merge(
            spark.read.parquet(path), ["event_type"]
        ).collect()
    }
    assert stored == live


def test_sketch_merge_refuses_mixed_encoding_versions(spark, events):
    import pyspark.sql.functions as F

    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    assert partials.select("enc_ver").distinct().collect()[0][0] == 1
    stale = partials.withColumn("enc_ver", F.lit(0))
    # the guard rides inside the merge job (no extra scan) — it surfaces
    # at action time as a raise_error from the executors
    with pytest.raises(Exception, match="encoding version"):
        sketch_merge(stale, ["event_type"]).collect()


def test_sketch_merge_refuses_null_encoding_version(spark, events):
    """Schema-merged pre-versioning partials read back with enc_ver=NULL —
    the guard must catch NULL, not just mismatched integers (a plain !=
    filter would silently pass NULL rows)."""
    partials = sketch_rollup(
        events, ["event_type"], ["user_id"], time_col="ts", bucket="1 day"
    )
    nulled = partials.withColumn(
        "enc_ver", F.lit(None).cast("int")
    )
    with pytest.raises(Exception, match="encoding version"):
        sketch_merge(nulled, ["event_type"]).collect()
