"""JDBC upsert sink: the TimescaleDB/PostgreSQL north-star backend (S5/S7).

Reference parity: candle batches land in Postgres via CSV COPY with an
``INSERT ... ON CONFLICT DO NOTHING | DO UPDATE`` fallback
(`fetchers/helpers/dbhelpers.py:34-132`, templates
`fetchers/config/queries.py:4,12-15`). The driver-defined target approach is
"Structured Streaming + PostgreSQL/TimescaleDB sink" (BASELINE.json), so
this sink is the production twin of ``ParquetMergeSink``: identical
``merge(batch, batch_id)`` interface, pluggable into ``run_ingest``.

Mechanics per micro-batch (the standard scale-out JDBC upsert shape):
1. executors write the batch to a staging table with Spark's parallel JDBC
   writer (``batchsize`` rows per round-trip, one connection per partition);
2. the driver issues ONE set-based ``INSERT ... SELECT ... ON CONFLICT``
   from staging into the target — the merge runs inside the database, which
   is the only place it can be transactional for an external store;
3. staging is truncated for the next batch.

This container ships no Postgres driver jar and no database, so the class
raises a clear error on use unless a JDBC URL + driver are actually
available; its SQL-building logic is pure and unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_sql(
    target: str,
    staging: str,
    columns: list[str],
    pk: list[str],
    mode: str = "ignore",
) -> str:
    """The set-based merge statement (`queries.py:4,12-15` templates).

    mode='ignore' → ON CONFLICT DO NOTHING (idempotent ingest, S6);
    mode='upsert' → ON CONFLICT DO UPDATE SET every non-PK column (late
    correction, S7).
    """
    if mode not in ("ignore", "upsert"):
        raise ValueError(f"mode must be 'ignore' or 'upsert', got {mode!r}")
    cols = ", ".join(columns)
    conflict = ", ".join(pk)
    base = (
        f"INSERT INTO {target} ({cols}) "
        f"SELECT {cols} FROM {staging} "
        f"ON CONFLICT ({conflict}) "
    )
    if mode == "ignore":
        return base + "DO NOTHING"
    updates = ", ".join(
        f"{c} = excluded.{c}" for c in columns if c not in set(pk)
    )
    return base + f"DO UPDATE SET {updates}"


class JdbcMergeSink:
    """PK-merge sink into a JDBC-reachable PostgreSQL/TimescaleDB table.

    Same contract as ``ParquetMergeSink``: pass ``sink.merge`` to
    ``writeStream.foreachBatch`` (see streaming.sink.run_ingest). Requires
    the PostgreSQL JDBC driver on the Spark classpath.
    """

    def __init__(
        self,
        url: str,
        table: str,
        pk: tuple[str, ...],
        mode: str = "ignore",
        properties: dict[str, str] | None = None,
        staging_table: str | None = None,
        batchsize: int = 10_000,
    ) -> None:
        upsert_sql(table, "staging", ["_probe"], list(pk), mode)  # validate mode
        self.url = url
        self.table = table
        self.pk = list(pk)
        self.mode = mode
        self.properties = {"driver": "org.postgresql.Driver", **(properties or {})}
        self.staging = staging_table or f"{table}__staging"
        self.batchsize = batchsize

    def _execute(self, spark, sql: str) -> None:
        jvm = spark._jvm  # noqa: SLF001 — JDBC DDL/DML needs a raw connection
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            st = conn.createStatement()
            st.execute(sql)
            st.close()
        finally:
            conn.close()

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # 1. parallel staging write (executors, batched round-trips)
        (
            batch.write.mode("overwrite")
            .option("batchsize", str(self.batchsize))
            .option("truncate", "true")
            .jdbc(self.url, self.staging, properties=self.properties)
        )
        # 2. one transactional set-based merge inside the database
        self._execute(
            spark, upsert_sql(self.table, self.staging, batch.columns, self.pk, self.mode)
        )
