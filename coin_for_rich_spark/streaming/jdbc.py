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

Three concrete sinks share the merge statement:

- ``JdbcMergeSink`` — executors stage the batch over parallel JDBC
  connections, the driver issues the set-based merge. Needs the PostgreSQL
  driver jar on the Spark classpath, which this container does not ship,
  so it stays unit-tested at the SQL layer.
- ``PsqlCopyMergeSink`` — the reference's own mechanics (CSV COPY + ON
  CONFLICT, `dbhelpers.py:34-132`) through the ``psql`` client in one
  transaction per micro-batch. The container ships psql and the server
  binaries, so THIS twin is integration-tested against a real PostgreSQL
  end-to-end (tests/test_postgres_sink.py), closing the north-star-sink
  execution gap at the semantics level. Single-writer by construction.
- ``PgWireMergeSink`` — the scale-out shape WITHOUT a driver jar: every
  executor COPYs its own partition in parallel into an UNLOGGED staging
  table over the raw v3 wire protocol (``streaming/pgwire.py``, pure
  stdlib), then the driver runs one merge+cleanup transaction. Also
  integration-tested against the live server, including parity with the
  single-writer twin.
"""

from __future__ import annotations

import datetime
import math
import subprocess

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Spark type -> PostgreSQL column type, for creating a target table from a
# stream's schema. Deliberately scalar-only: composite Spark types must be
# serialized upstream (pg_text_value fails loud on them anyway).
_PG_TYPES: dict[type, str] = {
    T.LongType: "bigint",
    T.IntegerType: "integer",
    T.ShortType: "smallint",
    T.DoubleType: "double precision",
    T.FloatType: "real",
    T.StringType: "text",
    T.BooleanType: "boolean",
    T.TimestampType: "timestamp",
    T.DateType: "date",
    T.BinaryType: "bytea",
}


def pg_ddl(table: str, schema: T.StructType, pk: list[str]) -> str:
    """CREATE TABLE statement for ``schema`` with a composite PRIMARY KEY —
    the unique index ``ON CONFLICT (pk)`` requires. TimescaleDB would add
    ``SELECT create_hypertable(...)`` after this; the merge semantics are
    identical either way (`scripts/database/init/create.sql:12-22`)."""
    cols = []
    for f in schema.fields:
        pg_type = _PG_TYPES.get(type(f.dataType))
        if pg_type is None:
            raise TypeError(
                f"column {f.name!r}: no PostgreSQL mapping for Spark type "
                f"{f.dataType.simpleString()}; serialize it to a scalar first"
            )
        cols.append(f"{f.name} {pg_type}")
    return (
        f"CREATE TABLE {table} ({', '.join(cols)}, "
        f"PRIMARY KEY ({', '.join(pk)}))"
    )


def hypertable_ddl(table: str, time_col: str, pk: list[str]) -> str:
    """TimescaleDB conversion for a freshly created table, guarded on the
    extension being INSTALLED in the target database — the reference's
    ``SELECT create_hypertable('ohlcvs', 'time')``
    (`scripts/database/init/create.sql` / `schemas/create_tables.sql:85`)
    as a no-op everywhere the extension is not active (plain PostgreSQL,
    or a TimescaleDB-capable server where it was never CREATEd), so the
    same DDL deploys against both. TimescaleDB requires the partitioning column in every
    unique index, so ``time_col`` must be part of the sink's PK — enforced
    here rather than discovered as a server error at deploy time. The merge
    semantics (ON CONFLICT upsert) are identical either way; chunking is a
    storage-layout concern the sink never sees.

    The guard probes ``pg_extension`` (the extension INSTALLED in this
    database — the reference's init scripts run on an image where it
    already is) rather than issuing ``CREATE EXTENSION`` itself: a DO block
    is a function/transaction context, exactly where TimescaleDB's loader
    refuses to install, so auto-creating here would fail on the one server
    the guard exists for. Installing the extension is a deployment step,
    not table DDL."""
    if time_col not in pk:
        raise ValueError(
            f"hypertable time column {time_col!r} must be part of the "
            f"primary key {pk} (TimescaleDB requires the partitioning "
            "column in every unique index)"
        )
    return (
        "DO $$ BEGIN\n"
        "  IF EXISTS (SELECT 1 FROM pg_extension "
        "WHERE extname = 'timescaledb') THEN\n"
        f"    PERFORM create_hypertable('{table}', '{time_col}', "
        "if_not_exists => TRUE);\n"
        "  END IF;\n"
        "END $$;"
    )


# Every escape COPY TO text emits (\b \f \v included — the server escapes
# more control chars than pg_text_value ever produces on the write side).
_PG_TEXT_UNESCAPES = {
    "t": "\t", "n": "\n", "r": "\r",
    "b": "\b", "f": "\f", "v": "\v",
}


def pg_text_parse(tok: str, dtype: T.DataType):
    """Inverse of :func:`pg_text_value` for one COPY-text token: ``\\N`` →
    None, backslash escapes undone, then the lexical form parsed per the
    Spark type. Round-trip fidelity is exact by construction: floats ship
    shortest-exact both ways (``extra_float_digits=3`` on read), timestamps
    are µs-precision ISO text in both directions."""
    if tok == "\\N":
        return None
    if isinstance(dtype, (T.StringType,)):
        # left-to-right scan, NOT chained str.replace: encoded "\\t" is a
        # literal backslash + t, and a naive replace("\\t", TAB) first
        # would corrupt it into a tab
        unescape = _PG_TEXT_UNESCAPES
        out: list[str] = []
        i = 0
        while i < len(tok):
            c = tok[i]
            if c == "\\" and i + 1 < len(tok):
                nxt = tok[i + 1]
                out.append(unescape.get(nxt, nxt))
                i += 2
            else:
                out.append(c)
                i += 1
        return "".join(out)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return int(tok)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return float(tok)
    if isinstance(dtype, T.BooleanType):
        return tok == "t"
    if isinstance(dtype, T.TimestampType):
        return datetime.datetime.fromisoformat(tok)
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat(tok)
    if isinstance(dtype, T.BinaryType):
        return bytes.fromhex(tok.replace("\\\\x", "", 1))
    raise TypeError(f"no COPY-text parser for Spark type {dtype.simpleString()}")


def upsert_sql(
    target: str,
    staging: str,
    columns: list[str],
    pk: list[str],
    mode: str = "ignore",
    dedup_order: list[str] | None = None,
) -> str:
    """The set-based merge statement (`queries.py:4,12-15` templates).

    mode='ignore' → ON CONFLICT DO NOTHING (idempotent ingest, S6);
    mode='upsert' → ON CONFLICT DO UPDATE SET every non-PK column (late
    correction, S7).

    ``dedup_order`` (a list of ``"col ASC|DESC"`` terms, possibly empty)
    switches the staging SELECT to PostgreSQL ``DISTINCT ON (pk)`` ordered
    by ``pk, *dedup_order`` — required when one staged batch can hold the
    same PK twice: ``DO UPDATE`` raises "cannot affect row a second time"
    on such input, and ``DO NOTHING`` would keep an arbitrary copy. With it
    the kept row per PK is deterministic. ``None`` keeps the plain SELECT
    (the caller guarantees PK-unique staging).
    """
    if mode not in ("ignore", "upsert"):
        raise ValueError(f"mode must be 'ignore' or 'upsert', got {mode!r}")
    cols = ", ".join(columns)
    conflict = ", ".join(pk)
    select = f"SELECT {cols} FROM {staging}"
    if dedup_order is not None:
        order = ", ".join([conflict, *dedup_order]) if dedup_order else conflict
        select = (
            f"SELECT DISTINCT ON ({conflict}) {cols} FROM {staging} "
            f"ORDER BY {order}"
        )
    base = f"INSERT INTO {target} ({cols}) {select} ON CONFLICT ({conflict}) "
    if mode == "ignore":
        return base + "DO NOTHING"
    updates = ", ".join(
        f"{c} = excluded.{c}" for c in columns if c not in set(pk)
    )
    return base + f"DO UPDATE SET {updates}"


def pg_dedup_order(
    mode: str, pk: list[str], tiebreak_col: str | None, columns: list[str]
) -> list[str]:
    """The shared ``within_batch_order`` winner rule rendered as PostgreSQL
    ORDER BY terms — ONE rendering for every Postgres-backed sink (the
    sink-module docstring's warning about hand-kept copies applies to this
    rendering too).

    NULLS placement is explicit because the engines' defaults diverge:
    Spark's ``asc()`` is nulls-FIRST and ``desc()`` nulls-LAST, while
    PostgreSQL defaults to the opposite (NULLS LAST on ASC, NULLS FIRST on
    DESC) — without the explicit terms, a NULL tiebreak value would make
    the database legs keep a different winner than the parquet twin and
    break the backend-invariance the oracle row relies on."""
    from .sink import within_batch_order

    return [
        f"{c} {'ASC NULLS FIRST' if ascending else 'DESC NULLS LAST'}"
        for c, ascending in within_batch_order(mode, pk, tiebreak_col, columns)
    ]


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


def _utc_wall_clock(v):
    """Naive/aware datetime → naive UTC wall clock (identity on all other
    values). Applied on whichever host encodes the row — driver or executor
    — so the stored ``timestamp`` is UTC regardless of that host's local
    timezone."""
    if isinstance(v, datetime.datetime):
        aware = v if v.tzinfo is not None else v.astimezone()
        return aware.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


_PG_TEXT_ESCAPES = str.maketrans(
    {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
)


def pg_text_value(v) -> str:
    """One value in PostgreSQL COPY *text* format: ``\\N`` for NULL,
    backslash escapes for delimiter/newline/backslash in strings.

    Text format (not CSV) is deliberate — it is collision-free by
    construction where the CSV form has three lurking bugs: a string value
    equal to the NULL token reads back as NULL, a quoted value containing a
    ``\\.`` line ends psql's inline COPY early, and pandas' ``to_csv``
    coerces nullable int columns to float ('5.0' fails integer COPY).
    Escaping makes all of those representable: a literal backslash-dot
    ships as ``\\\\.``, a literal ``\\N`` as ``\\\\N``."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        return repr(v)  # shortest exact round-trip
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()
    if isinstance(v, (list, tuple, set, frozenset, dict)):
        # array/map/struct columns (Row is a tuple subclass) have no COPY
        # text encoding here — str(v) would ship Python repr, which either
        # fails opaquely inside the transaction or silently stores garbage
        # in a text column. Fail loud at the sink boundary instead.
        raise TypeError(
            "array/map/struct values are not supported by the psql COPY "
            f"sink (got {type(v).__name__}); serialize the column to a "
            "scalar (e.g. to_json) before the sink"
        )
    return str(v).translate(_PG_TEXT_ESCAPES)


class PsqlCopyMergeSink:
    """PK-merge sink into a real PostgreSQL/TimescaleDB via the ``psql``
    client — the reference's exact ingest mechanics (COPY into the
    table with an ``ON CONFLICT`` fallback, `fetchers/helpers/dbhelpers.py:
    34-132`) with the same ``merge(batch, batch_id)`` contract as
    ``ParquetMergeSink`` / ``JdbcMergeSink`` (pluggable into
    ``run_ingest``).

    Per micro-batch, ONE psql invocation runs ONE transaction::

        BEGIN;
        CREATE TEMP TABLE <stg> (LIKE <target> INCLUDING DEFAULTS)
            ON COMMIT DROP;
        COPY <stg> (cols) FROM STDIN;   -- text format, see pg_text_value
        ...batch rows...
        \\.
        INSERT INTO <target> SELECT DISTINCT ON (pk) ...
            ON CONFLICT (pk) DO NOTHING | DO UPDATE SET ...;
        COMMIT;

    A failed batch leaves nothing behind (temp staging drops with its
    transaction); a replayed batch is a no-op ('ignore') or a same-value
    overwrite ('upsert') — the parquet twin's exactly-once posture, now
    transactional because the merge runs inside the database. Within-batch
    duplicate PKs resolve deterministically via ``DISTINCT ON`` over the
    shared ``within_batch_order`` rule (streaming.sink) — byte-for-byte
    the ordering ``ParquetMergeSink`` resolves with, pinned by the
    twin-parity capstone test.

    The batch ships through the driver (collected Rows → COPY text on
    stdin): a single-writer COPY is the reference writer's own shape and
    the right one for an external single-endpoint database;
    ``JdbcMergeSink`` remains the distributed-staging alternative when a
    driver jar is available. Micro-batches are bounded by the trigger
    interval, so the driver hop is O(batch), never O(table).
    """

    def __init__(
        self,
        conninfo: list[str],
        table: str,
        pk: tuple[str, ...],
        mode: str = "ignore",
        tiebreak_col: str | None = None,
        psql: str = "psql",
    ) -> None:
        upsert_sql(table, "_probe_stg", ["_probe"], list(pk), mode)  # validate
        self.conninfo = list(conninfo)
        self.table = table
        self.pk = list(pk)
        self.mode = mode
        self.tiebreak_col = tiebreak_col
        self.psql = psql
        self.staging = f"_cfr_stage_{table.rsplit('.', 1)[-1]}"

    def _dedup_order(self, columns: list[str]) -> list[str]:
        return pg_dedup_order(self.mode, self.pk, self.tiebreak_col, columns)

    @staticmethod
    def _exact_rows(batch: DataFrame):
        """Exact-typed row iterator for COPY encoding — collected Rows, NOT
        toPandas (pandas coerces nullable int columns to float64; '5.0'
        fails integer COPY) and NOT toArrow().to_pylist() (measured ~2×
        slower warm: materializing 10⁵ session-tz-aware datetime objects
        costs more than Row pickling saves).

        Timestamps are normalized to the naive UTC wall clock before
        encoding (Rows carry naive system-local datetimes), so the
        PostgreSQL ``timestamp`` column stores UTC regardless of the driver
        host's timezone — the same session contract the rest of the engine
        pins; ``read`` reverses it."""
        return (
            tuple(_utc_wall_clock(v) for v in row) for row in batch.collect()
        )

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        columns = batch.columns
        data = "".join(
            "\t".join(pg_text_value(v) for v in row) + "\n"
            for row in self._exact_rows(batch)
        )
        if not data:
            return  # foreachBatch delivers empty batches; nothing to merge
        merge_stmt = upsert_sql(
            self.table,
            self.staging,
            columns,
            self.pk,
            self.mode,
            dedup_order=self._dedup_order(columns),
        )
        script = (
            "BEGIN;\n"
            f"CREATE TEMP TABLE {self.staging} "
            f"(LIKE {self.table} INCLUDING DEFAULTS) ON COMMIT DROP;\n"
            f"COPY {self.staging} ({', '.join(columns)}) FROM STDIN;\n"
            f"{data}\\.\n"
            f"{merge_stmt};\n"
            "COMMIT;\n"
        )
        proc = subprocess.run(
            [self.psql, "-X", "-q", "-v", "ON_ERROR_STOP=1", *self.conninfo],
            input=script.encode(),
            capture_output=True,
            cwd="/",
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"psql merge of batch {batch_id} into {self.table} failed "
                f"(rc={proc.returncode}): "
                + proc.stderr.decode(errors="replace").strip()
            )

    def _run_psql(self, script: str) -> bytes:
        proc = subprocess.run(
            [self.psql, "-X", "-q", "-v", "ON_ERROR_STOP=1", *self.conninfo],
            input=script.encode(),
            capture_output=True,
            cwd="/",
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"psql against {self.table} failed (rc={proc.returncode}): "
                + proc.stderr.decode(errors="replace").strip()
            )
        return proc.stdout

    def create_table(
        self, schema, drop: bool = False, hypertable_time_col: str | None = None
    ) -> None:
        """Create the target table from a Spark schema with the sink's PK
        (composite PRIMARY KEY backs ON CONFLICT); ``drop=True`` first
        drops any previous incarnation — the reset a re-run query wants.
        ``hypertable_time_col`` additionally runs the guarded TimescaleDB
        conversion (:func:`hypertable_ddl`) — a no-op unless the extension
        is INSTALLED in the database, the reference's hypertable where it
        is."""
        ddl = pg_ddl(self.table, schema, self.pk)
        pre = f"DROP TABLE IF EXISTS {self.table};\n" if drop else ""
        post = (
            "\n" + hypertable_ddl(self.table, hypertable_time_col, self.pk)
            if hypertable_time_col
            else ""
        )
        self._run_psql(f"{pre}{ddl};{post}\n")

    def read(self, spark: SparkSession, schema) -> DataFrame:
        """Resolved table state read back FROM PostgreSQL as a DataFrame —
        the twin of ``ParquetMergeSink.read``, so a correctness gate can
        certify what the database actually holds, not what was sent to it.

        Transport is ``COPY ... TO STDOUT`` (text format): the exact
        inverse of the write path, with ``\\N`` NULLs and backslash
        escapes, so values round-trip losslessly where psql's tabular
        output would be ambiguous. ``extra_float_digits = 3`` pins
        shortest-exact float output; timestamps are µs ISO text both ways.
        Driver-side O(result) by design: one external single-endpoint
        database is read by one client, same as the write side.
        """
        cols = ", ".join(f.name for f in schema.fields)
        out = self._run_psql(
            "SET extra_float_digits = 3;\n"
            f"COPY (SELECT {cols} FROM {self.table}) TO STDOUT;\n"
        )
        utc = datetime.timezone.utc

        def parse(tok: str, dtype):
            v = pg_text_parse(tok, dtype)
            # the table stores the UTC wall clock (see _exact_rows); attach
            # UTC so createDataFrame's interpretation is system-tz
            # independent, mirroring the write-side normalization
            if isinstance(v, datetime.datetime) and isinstance(
                dtype, T.TimestampType
            ):
                return v.replace(tzinfo=utc)
            return v

        rows = [
            tuple(
                parse(tok, f.dataType)
                for tok, f in zip(line.split("\t"), schema.fields)
            )
            for line in out.decode().split("\n")
            if line
        ]
        return spark.createDataFrame(rows, schema)


class PgWireMergeSink:
    """Distributed-staging PK-merge into PostgreSQL over the raw wire
    protocol (``streaming/pgwire.py``) — the scale-out twin of
    ``PsqlCopyMergeSink`` with the same ``merge(batch, batch_id)`` contract
    and the same within-batch winner rule.

    Per micro-batch:

    1. driver: recreate an UNLOGGED staging table ``(LIKE target)`` —
       UNLOGGED skips WAL (the data is transient by design and a crash
       truncates it, which is exactly the semantics staging wants);
    2. executors: ``foreachPartition`` — each non-empty partition opens one
       wire connection and COPYs its rows (text format, identical
       ``pg_text_value`` encoding and UTC wall-clock normalization as the
       psql twin). N partitions stage in parallel; the driver never sees a
       row;
    3. driver: ONE transaction — ``INSERT ... SELECT DISTINCT ON (pk) ...
       ON CONFLICT`` + ``DROP`` of staging. The merge is atomic; a failure
       anywhere leaves the target untouched and the next attempt recreates
       staging from scratch.

    Task-retry safety: a retried partition re-COPYs the same rows, so
    staging may hold EXACT duplicates; ``DISTINCT ON`` collapses them (ties
    between identical rows are indistinguishable), so the merged result is
    retry-invariant. Batch replay is idempotent exactly as in the twins.

    Concurrency contract: ONE writer per target table at a time — the
    staging name is derived from the target, so two queries merging into
    the same table concurrently would trample each other's staging
    (foreachBatch serializes batches within a query, which is the intended
    deployment; the psql twin's TEMP staging is session-scoped and immune).
    Crash leftovers are handled by the ``DROP TABLE IF EXISTS`` that opens
    every merge.
    """

    def __init__(
        self,
        conninfo: list[str],
        table: str,
        pk: tuple[str, ...],
        mode: str = "ignore",
        tiebreak_col: str | None = None,
        copy_chunk_bytes: int = 1 << 20,
        socket_timeout: float = 600.0,
        stage_parallelism: int = 16,
    ) -> None:
        from .pgwire import conninfo_params

        upsert_sql(table, "_probe_stg", ["_probe"], list(pk), mode)  # validate
        self.params = conninfo_params(conninfo)
        # the merge transaction is ONE simple-query round trip with no
        # protocol traffic while the server works — its recv timeout must
        # budget the largest batch's set-based merge, not a chat latency
        # (a timeout mid-merge reports failure for work the server may
        # still commit). Tunable per deployment.
        self.params.setdefault("timeout", socket_timeout)
        self.table = table
        self.pk = list(pk)
        self.mode = mode
        self.tiebreak_col = tiebreak_col
        self.copy_chunk_bytes = int(copy_chunk_bytes)
        # cap on concurrent staging connections when a NARROW batch is
        # widened before the COPY stage (see _merge_persisted) — also the
        # widening target, clamped to the cluster's default parallelism
        self.stage_parallelism = int(stage_parallelism)
        # FULL qualified name, sanitized — keying on the bare table name
        # would let a.t and b.t trample each other's staging
        self.staging = "_cfr_wstage_" + table.replace(".", "__")
        # fault-injection seam (None in production): a picklable callable
        # invoked on the EXECUTOR after a partition's COPY commits — the
        # fault-gate axis uses it to fail a task AFTER its rows are staged,
        # proving the docstring's retry-safety claim (the retried task
        # re-COPYs, staging holds exact duplicates, DISTINCT ON collapses
        # them) with a real retried COPY instead of an argument
        self._post_copy_fault = None

    def _dedup_order(self, columns: list[str]) -> list[str]:
        return pg_dedup_order(self.mode, self.pk, self.tiebreak_col, columns)

    def _stage_source(self, batch: DataFrame) -> DataFrame:
        """The COPY stage's parallelism is the batch's partition count, and
        a micro-batch that arrives as one small file scans as ONE
        partition — serializing the whole per-row text encode onto a single
        core (the exact opposite of this sink's distributed-staging design;
        measured r16: ~1.3 s/batch serial at sf0.1, −45% on the declared
        row once widened). Widen narrow batches to min(stage_parallelism,
        defaultParallelism) before staging; batches that already arrive
        wide (the production stream shape) pass through untouched.
        Result-invariant: the merge's DISTINCT ON order is a TOTAL order
        (tiebreak + every non-PK column, within_batch_order), so staging
        row placement cannot change the kept row; retried round-robin
        tasks re-produce the same assignment (Spark sorts before
        round-robin repartition), and exact duplicates from a retry still
        collapse."""
        sc = batch.sparkSession.sparkContext
        target = min(self.stage_parallelism, sc.defaultParallelism)
        if target > 1 and batch.rdd.getNumPartitions() < target:
            return batch.repartition(target)
        return batch

    def merge(self, batch: DataFrame, batch_id: int) -> None:
        from .pgwire import PgWireClient

        # two actions follow (isEmpty probe + the staging foreachPartition);
        # inside foreachBatch the batch is a plan, so without persist the
        # upstream micro-batch computation would execute twice per batch
        batch.persist()
        try:
            self._merge_persisted(batch, batch_id)
        finally:
            batch.unpersist()

    def _merge_persisted(self, batch: DataFrame, batch_id: int) -> None:
        from .pgwire import PgWireClient

        if batch.isEmpty():
            return  # idle-trigger batches: skip DDL + connections entirely
        columns = batch.columns
        params = dict(self.params)
        staging = self.staging
        chunk_bytes = self.copy_chunk_bytes
        copy_sql = f"COPY {staging} ({', '.join(columns)}) FROM STDIN"
        post_copy_fault = self._post_copy_fault

        with PgWireClient(**params) as c:
            c.query(
                f"DROP TABLE IF EXISTS {staging}; "
                f"CREATE UNLOGGED TABLE {staging} "
                f"(LIKE {self.table} INCLUDING DEFAULTS)"
            )

        def copy_partition(rows) -> None:
            it = iter(rows)
            try:
                first = next(it)
            except StopIteration:
                return  # empty partition: no connection at all

            def chunks():
                from itertools import chain

                buf: list[str] = []
                size = 0
                for row in chain([first], it):
                    line = (
                        "\t".join(
                            pg_text_value(_utc_wall_clock(v)) for v in row
                        )
                        + "\n"
                    )
                    buf.append(line)
                    size += len(line)
                    if size >= chunk_bytes:
                        yield "".join(buf).encode()
                        buf, size = [], 0
                if buf:
                    yield "".join(buf).encode()

            with PgWireClient(**params) as conn:
                conn.copy_in(copy_sql, chunks())
            if post_copy_fault is not None:
                post_copy_fault()  # test seam — see __init__

        self._stage_source(batch).foreachPartition(copy_partition)

        merge_stmt = upsert_sql(
            self.table,
            staging,
            columns,
            self.pk,
            self.mode,
            dedup_order=self._dedup_order(columns),
        )
        with PgWireClient(**params) as c:
            c.query(
                f"BEGIN; {merge_stmt}; DROP TABLE {staging}; COMMIT;"
            )
