"""Bucketed layout: co-bucketed joins and bucket-key aggregations must be
exchange-free, and results must be identical to the unbucketed plans."""

from __future__ import annotations

import pytest

from coin_for_rich_spark.sources import load_table
from coin_for_rich_spark.sources.bucketing import (
    exchanges_in_plan,
    is_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    bli = write_bucketed(
        li,
        "bkt_lineitem",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
        path=str(base / "lineitem"),
    )
    bord = write_bucketed(
        orders,
        "bkt_orders",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
        path=str(base / "orders"),
    )
    yield bli, bord
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_tables_carry_metadata(spark, bucketed):
    assert is_bucketed(spark, "bkt_lineitem")
    assert is_bucketed(spark, "bkt_orders")


def test_cobucketed_join_is_exchange_free(spark, sf_dir, bucketed):
    from coin_for_rich_spark.functions.partitioning import scoped_conf

    bli, bord = bucketed
    # at test scale the dim side fits the broadcast threshold, which
    # sidesteps distribution entirely; the 100 TB plan this layout exists
    # for is the big×big sort-merge join, so pin that plan shape here
    with scoped_conf(spark, **{"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        joined = bli.join(
            bord, bli["l_orderkey"] == bord["o_orderkey"]
        ).select("l_orderkey", "o_custkey", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed on the join key with matching bucket counts: the
        # sort-merge join consumes the scans' bucket distribution — zero
        # shuffles, and the scans really run bucketed
        assert "SortMergeJoin" in plan
        assert exchanges_in_plan(joined) == 0
        assert plan.count("Bucketed: true") == 2
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        plain = li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).select("l_orderkey", "o_custkey", "l_quantity")
        assert exchanges_in_plan(plain) == 2  # the cost bucketing removed
        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, plain.collect()))
    assert a == b and len(a) > 0


def test_bucket_key_aggregation_is_exchange_free(spark, sf_dir, bucketed):
    import pyspark.sql.functions as F

    bli, _ = bucketed
    agg = bli.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty")
    )
    assert exchanges_in_plan(agg) == 0
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty")
    )
    assert exchanges_in_plan(plain) > 0
    got = {(r["l_orderkey"], str(r["qty"])) for r in agg.collect()}
    want = {(r["l_orderkey"], str(r["qty"])) for r in plain.collect()}
    assert got == want and got


def test_bucketed_writer_emits_one_file_per_bucket(spark, bucketed, tmp_path):
    import os

    bli, _ = bucketed
    loc = [
        r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED bkt_lineitem").collect()
        if r["col_name"] == "Location"
    ][0]
    files = [
        f
        for f in os.listdir(loc.removeprefix("file:"))
        if f.endswith(".parquet")
    ]
    # the pre-write repartition keeps the layout at exactly one file per
    # non-empty bucket — no small-file explosion
    assert 0 < len(files) <= 8


def test_point_lookup_prunes_to_one_bucket(spark, sf_dir, bucketed):
    """An equality predicate on the bucket key must read 1/N of the files:
    the scan reports SelectedBucketsCount 1 out of 8. (autoBucketedScan is
    pinned off for the check — with it on, the planner may deliberately
    trade the bucketed scan for small-partition coalescing on filter-only
    queries; at 100 TB the bucketed read IS the win, which is what this
    pins.)"""
    import pyspark.sql.functions as F

    from coin_for_rich_spark.functions.partitioning import scoped_conf

    bli, _ = bucketed
    key = bli.select("l_orderkey").first()[0]
    with scoped_conf(
        spark,
        **{"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"},
    ):
        q = bli.filter(F.col("l_orderkey") == key)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert q.count() > 0


def test_zorder_key_matches_python_interleave(spark):
    from coin_for_rich_spark.sources.bucketing import zorder_key

    def py_morton(a, b):
        out = 0
        for i in range(31):
            out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return out

    import random

    rng = random.Random(7)
    rows = [(rng.randrange(2**31), rng.randrange(2**31)) for _ in range(200)]
    rows += [(0, 0), (2**31 - 1, 2**31 - 1), (1, 0), (0, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder_key("a", "b").alias("z")).collect()
    for r in got:
        expect = py_morton(r["a"], r["b"])
        assert r["z"] == expect and r["z"] >= 0, (r["a"], r["b"])


def test_zorder_tile_is_contiguous_key_range(spark):
    """The defining property: every 2^k-aligned square tile maps to one
    contiguous key range (the key's high bits ARE the tile id)."""
    from coin_for_rich_spark.sources.bucketing import zorder_key

    grid = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(grid, "x long, y long")
    rows = df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    # keys within each 8×8 tile form exactly the aligned range
    # [tile_base, tile_base + 63] — the high bits ARE the tile id
    by_tile = {}
    for r in rows:
        by_tile.setdefault((r["x"] // 8, r["y"] // 8), []).append(r["z"])
    for ks in by_tile.values():
        ks.sort()
        assert ks == list(range(ks[0], ks[0] + 64))
        assert ks[0] % 64 == 0


def test_zordered_write_clusters_both_dimensions(spark, tmp_path):
    """Per-file bounding boxes: a Z-ordered layout keeps BOTH dimensions
    bounded per file, where a row-major sort leaves the trailing dimension
    spanning its full range — the reason either predicate can skip files."""
    import os

    import pyspark.sql.functions as F

    from coin_for_rich_spark.sources.bucketing import write_zordered

    grid = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x long, y long, v long")

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, "x", "y", max_records_per_file=256)
    rpath = str(tmp_path / "rowmajor")
    (
        df.repartition(1)
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", "256")
        .parquet(rpath)
    )

    def file_boxes(path):
        boxes = []
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                pdf = spark.read.parquet(os.path.join(path, f)).agg(
                    F.min("x"), F.max("x"), F.min("y"), F.max("y")
                ).collect()[0]
                boxes.append(
                    (pdf[1] - pdf[0], pdf[3] - pdf[2])  # (x_range, y_range)
                )
        return boxes

    zboxes = file_boxes(zpath)
    rboxes = file_boxes(rpath)
    assert len(zboxes) >= 8 and len(rboxes) >= 8
    # z-order: both dims bounded well below the full 0..63 extent
    assert max(max(bx, by) for bx, by in zboxes) <= 32
    # row-major: the trailing dim spans (nearly) everything in most files
    assert max(by for _, by in rboxes) == 63


def test_zorder_rejects_out_of_range_and_column_collision(spark, tmp_path):
    import pyspark.sql.functions as F

    from coin_for_rich_spark.sources.bucketing import write_zordered, zorder_key

    bad = spark.createDataFrame([(-1, 4)], "a long, b long")
    with pytest.raises(Exception, match="zorder_key input"):
        bad.select(zorder_key("a", "b")).collect()
    wide = spark.createDataFrame([(2**31, 0)], "a long, b long")
    with pytest.raises(Exception, match="zorder_key input"):
        wide.select(zorder_key("a", "b")).collect()
    clash = spark.createDataFrame([(1, 2, 3)], "x long, y long, _zkey long")
    with pytest.raises(ValueError, match="_zkey"):
        write_zordered(clash, str(tmp_path / "z"), "x", "y")


def test_zorder_rejects_null_input(spark):
    from coin_for_rich_spark.sources.bucketing import zorder_key

    df = spark.createDataFrame([(None, 4)], "a long, b long")
    with pytest.raises(Exception, match="zorder_key input"):
        df.select(zorder_key("a", "b")).collect()


def test_zorder_key_n_reference_and_2d_delegation(spark):
    """N-dim key equals a Python reference interleave; n=2 is bit-identical
    to the magic-number 2-D path; cube-containment locality holds in 3-D."""
    import pytest

    from pyspark.sql import functions as F

    from coin_for_rich_spark.sources.bucketing import zorder_key, zorder_key_n

    def ref_key(vals, bits):
        n = len(vals)
        out = 0
        for d, v in enumerate(vals):
            for i in range(bits):
                out |= ((v >> i) & 1) << (i * n + d)
        return out

    rows = [(i, (i * 7) % 97, (i * 13) % 53, (i * 29) % 31) for i in range(300)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got3 = df.select("a", "b", "c", zorder_key_n(["a", "b", "c"]).alias("z")).collect()
    for r in got3:
        assert r.z == ref_key((r.a, r.b, r.c), 21), (r.a, r.b, r.c)
    got4 = df.select("a", "b", "c", "d", zorder_key_n(["a", "b", "c", "d"]).alias("z")).collect()
    for r in got4:
        assert r.z == ref_key((r.a, r.b, r.c, r.d), 15)

    # n=2 delegates: identical to the magic-number spread
    two = df.select(
        (zorder_key("a", "b") == zorder_key_n(["a", "b"])).alias("eq")
    ).collect()
    assert all(r.eq for r in two)

    # locality: every point in the [0, 2^k)^3 cube keys below every point
    # with any coordinate >= 2^k
    k = 3
    inside = [r.z for r in got3 if max(r.a, r.b, r.c) < (1 << k)]
    outside = [r.z for r in got3 if max(r.a, r.b, r.c) >= (1 << k)]
    assert inside and outside and max(inside) < min(outside)

    # out-of-range fails loud
    bad = spark.createDataFrame([(1 << 22, 0, 0)], "a long, b long, c long")
    with pytest.raises(Exception, match="zorder_key_n"):
        bad.select(zorder_key_n(["a", "b", "c"])).collect()
    with pytest.raises(ValueError, match="2..8"):
        zorder_key_n(["a"])
