"""coin_for_rich_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference crypto OHLCV platform
(coinForRich/coin-for-rich), re-expressed Spark-first.

The reference is a TimescaleDB + Redis + FastAPI stack: 1-minute OHLCV candles
land in a hypertable (`scripts/database/init/create.sql:12-22`), are rolled up
into 8 continuous aggregates (`create.sql:105-223`) and 4 analytics
materialized views (`create.sql:94-342`), and are served through an interval
router (`web/routes/api/rest/utils/readers.py:126-368`). Here every one of
those computations is a Catalyst logical plan over partitioned Parquet
(batch) or a Structured Streaming query (ingest path); there is no bespoke
execution engine — Catalyst + Tungsten pick the physical strategy.

Layout:
    session      — SparkSession factory tuned for local[N] test / cluster prod
    sources      — loaders for the driver's parquet testdata (ns-timestamp safe)
    functions    — scalar helpers (time buckets, decimal rounding, epoch ms)
    operators    — batch operators: candle rollups, analytics views, maintenance
    plans        — the user-facing read API (interval router, chart reader)
    streaming    — Structured Streaming rollups / latest-value / dedup / upsert
    llmdata      — large-scale training-data ops: dedup, similarity, text stats
"""

__version__ = "0.1.0"
