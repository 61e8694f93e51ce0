"""Merge sinks: idempotent insert and late-correction upsert (S5/S6/S7).

Reference parity: the bulk loader COPYs candle batches and falls back to
``INSERT ... ON CONFLICT (pk) DO NOTHING`` (idempotent ingest, S6,
`fetchers/helpers/dbhelpers.py:34-132`, `schemas/insert_queries.sql:1-3`) or
``DO UPDATE SET (o,h,l,c,v) = excluded...`` (the 1-minute re-fetch that
overwrites WS candles with corrected REST data, S7,
`fetchers/config/queries.py:12-15`).

Spark-first expression: ``writeStream.foreachBatch(sink.merge)``. On a real
deployment the merge body is a single statement — Delta/Iceberg
``MERGE INTO`` or a JDBC ``INSERT ... ON CONFLICT`` into TimescaleDB (the
north-star sink, BASELINE.json) — both scale-out merges shuffled on the PK.
This container has neither Delta nor a Postgres, so ``ParquetMergeSink``
implements identical semantics as an anti-join + union rewrite over a
parquet directory with an atomic swap; the merge *logic* (PK match, ignore
vs. update, within-batch dedup) is the part under test and is shared by any
backend.

Exactly-once posture: foreachBatch may replay a batch on failure; both merge
modes are idempotent on the PK (replaying a batch is a no-op for 'ignore'
and a same-value overwrite for 'upsert'), which together with checkpointing
gives the reference's processing-set guarantee
(`fetchers/ws/updater.py:127-138`) natively.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetMergeSink:
    """PK-merge sink over a parquet directory.

    mode='ignore' — first writer wins (ON CONFLICT DO NOTHING, S6).
    mode='upsert' — newest batch wins (ON CONFLICT DO UPDATE, S7).
    ``tiebreak_col`` orders rows *within* one batch so the kept row per PK is
    deterministic (highest tiebreak wins for upsert, lowest for ignore —
    matching "earliest insert" ctid semantics, `insert_queries.sql:8-15`).
    """

    def __init__(
        self,
        path: str,
        pk: tuple[str, ...],
        mode: str = "ignore",
        tiebreak_col: str | None = None,
    ) -> None:
        if mode not in ("ignore", "upsert"):
            raise ValueError(f"mode must be 'ignore' or 'upsert', got {mode!r}")
        self.path = path
        self.pk = list(pk)
        self.mode = mode
        self.tiebreak_col = tiebreak_col

    # -- batch-side helpers ------------------------------------------------

    def _dedup_batch(self, batch: DataFrame) -> DataFrame:
        if self.tiebreak_col is None:
            return batch.dropDuplicates(self.pk)
        order = (
            F.col(self.tiebreak_col).desc()
            if self.mode == "upsert"
            else F.col(self.tiebreak_col).asc()
        )
        w = Window.partitionBy(*self.pk).orderBy(order)
        return (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(os.path.join(self.path, "_SUCCESS")):
            return None
        return spark.read.parquet(self.path)

    # -- the foreachBatch body ----------------------------------------------

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = self._dedup_batch(batch)
        current = self.read(spark)
        if current is None:
            merged = batch
        elif self.mode == "ignore":
            # keep every current row; admit only new PKs
            merged = current.unionByName(
                batch.join(current.select(*self.pk), on=self.pk, how="left_anti")
            )
        else:  # upsert
            # batch rows replace current rows on PK match
            merged = batch.unionByName(
                current.join(batch.select(*self.pk), on=self.pk, how="left_anti")
            )
        tmp = f"{self.path}__stage_{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old)


def run_ingest(
    stream: DataFrame,
    sink: ParquetMergeSink,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> None:
    """The micro-batch collector (S4): drive a stream into a merge sink.

    Production trigger is ``{"processingTime": "10 seconds"}`` — the
    updater's drain cadence (`fetchers/ws/updater.py:29`); tests use
    availableNow for a deterministic bounded run.
    """
    q = (
        stream.writeStream.foreachBatch(sink.merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    q.awaitTermination()
