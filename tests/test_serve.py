"""Serve-layer wire contract (plans.serve, M6)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from coin_for_rich_spark.plans import serialize_candles, to_json_rows


def test_serialize_candles_ms_and_seconds(spark):
    df = spark.createDataFrame(
        [("2024-01-01 01:00:00", "btc", 1.23456, 2.0, 0.5, 1.999999, 10.00004)],
        "bucket string, symbol string, open double, high double, low double, close double, volume double",
    ).withColumn("bucket", F.to_timestamp("bucket"))

    ms = serialize_candles(df, results_mls=True).first()
    assert ms.time == 1704070800000
    assert ms.open == 1.2346 and ms.close == 2.0 and ms.volume == 10.0

    secs = serialize_candles(df, results_mls=False).first()
    assert secs.time == 1704070800


def test_to_json_rows_shape(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "id int, name string, v double")
    payload = to_json_rows(df).first().payload
    assert json.loads(payload) == {"id": 1, "name": "a", "v": 2.5}
