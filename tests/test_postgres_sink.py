"""End-to-end integration of the psql COPY + ON CONFLICT merge sink against
a REAL PostgreSQL server — the north-star sink semantics
(`fetchers/helpers/dbhelpers.py:34-132`, `fetchers/config/queries.py:4,12-15`)
executed inside the actual target engine, not just asserted as SQL strings.

The module boots a throwaway cluster (initdb + pg_ctl under the `postgres`
user, unix socket only, trust auth) and tears it down afterwards; it skips
cleanly when the environment has no runnable server. The capstone test
drives the SAME staged micro-batch stream through ``ParquetMergeSink`` and
``PsqlCopyMergeSink`` and requires the resolved states to be value-identical
— the two backends are twins by construction, so this pins that the psql
COPY/DISTINCT ON/ON CONFLICT path implements exactly the merge semantics the
oracle-checked `stream_upsert_ingest` query verifies for the parquet twin.
"""

from __future__ import annotations

import datetime as dt
import subprocess
import tempfile

import pytest

from coin_for_rich_spark.streaming.pgserver import pg_runnable, start_cluster

pytestmark = pytest.mark.skipif(
    not pg_runnable(), reason="no runnable PostgreSQL server in this environment"
)


@pytest.fixture(scope="module")
def pg():
    """Scratch single-node cluster on a unix socket (via the engine's own
    pgserver lifecycle — the same code path the declared query boots);
    yields psql conninfo args. Not under pytest's tmp_path: those live
    below a 0700 root-owned dir the postgres user cannot traverse."""
    conninfo, stop = start_cluster(tempfile.mkdtemp(prefix="cfr_pg_"))
    try:
        yield conninfo
    finally:
        stop()


def _sql(conninfo: list[str], sql: str) -> str:
    p = subprocess.run(
        ["psql", "-X", "-q", "-v", "ON_ERROR_STOP=1", *conninfo, "-c", sql],
        capture_output=True,
        cwd="/",
    )
    assert p.returncode == 0, p.stderr.decode()
    return p.stdout.decode()


def _fetch(conninfo: list[str], query: str) -> list[list[str]]:
    p = subprocess.run(
        ["psql", "-X", "-A", "-t", "-F", "\t", *conninfo, "-c", query],
        capture_output=True,
        cwd="/",
    )
    assert p.returncode == 0, p.stderr.decode()
    return [
        line.split("\t")
        for line in p.stdout.decode().splitlines()
        if line.strip()
    ]


def test_psql_merge_ignore_first_writer_wins_and_replay_is_noop(spark, pg):
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_ign;"
             "CREATE TABLE t_ign (k text PRIMARY KEY, seq int, v double precision)")
    sink = PsqlCopyMergeSink(pg, "t_ign", pk=("k",), mode="ignore",
                             tiebreak_col="seq")
    b1 = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 11.0), ("b", 3, 20.0)],
        "k string, seq int, v double",
    )
    b2 = spark.createDataFrame(
        [("a", 4, 99.0), ("c", 5, 30.0)], "k string, seq int, v double"
    )
    sink.merge(b1, 0)
    sink.merge(b2, 1)
    sink.merge(b2, 1)  # replay — must be a no-op
    got = [
        (r[0], int(r[1]), float(r[2]))
        for r in _fetch(pg, "SELECT k, seq, v FROM t_ign ORDER BY k")
    ]
    # the ParquetMergeSink twin's exact expectation (within-batch dedup keeps
    # the LOWEST tiebreak for 'ignore'; PK 'a' keeps its batch-0 row)
    assert got == [("a", 1, 10.0), ("b", 3, 20.0), ("c", 5, 30.0)]


def test_psql_merge_upsert_newest_wins(spark, pg):
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_ups;"
             "CREATE TABLE t_ups (k text PRIMARY KEY, seq int, v double precision)")
    sink = PsqlCopyMergeSink(pg, "t_ups", pk=("k",), mode="upsert",
                             tiebreak_col="seq")
    b1 = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 20.0)], "k string, seq int, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 3, 10.5), ("a", 4, 10.9), ("c", 5, 30.0)],
        "k string, seq int, v double",
    )
    sink.merge(b1, 0)
    sink.merge(b2, 1)
    got = [
        (r[0], int(r[1]), float(r[2]))
        for r in _fetch(pg, "SELECT k, seq, v FROM t_ups ORDER BY k")
    ]
    # 'a' corrected by batch 2 (HIGHEST tiebreak within the batch wins)
    assert got == [("a", 4, 10.9), ("b", 2, 20.0), ("c", 5, 30.0)]


def test_psql_merge_null_round_trip(spark, pg):
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_null;"
             "CREATE TABLE t_null (k text PRIMARY KEY, v double precision)")
    sink = PsqlCopyMergeSink(pg, "t_null", pk=("k",), mode="ignore")
    sink.merge(
        spark.createDataFrame([("a", None), ("b", 1.5)], "k string, v double"), 0
    )
    got = {r[0]: r[1] for r in _fetch(pg, "SELECT k, coalesce(v::text, 'NULL') FROM t_null")}
    assert got == {"a": "NULL", "b": "1.5"}


def test_psql_merge_text_format_survives_adversarial_values(spark, pg):
    """The COPY hop must be collision-free: a literal '\\N' string, a line
    consisting of '\\.', embedded tabs/newlines/backslashes, and a NULL in a
    BIGINT column (which coerces every other value in that column to float
    under pandas) all have to round-trip exactly — each of these corrupted
    or aborted the naive CSV encoding."""
    import hashlib

    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_esc;"
             "CREATE TABLE t_esc (k text PRIMARY KEY, s text, n bigint)")
    rows = [
        ("nullmark", "\\N", None),          # literal backslash-N string
        ("dotline", "a\n\\.\nb", 1),        # inline-COPY terminator line
        ("tabs", "x\ty\\z\rw", 2),          # delimiter + backslash + CR
        ("snull", None, 9_007_199_254_740_993),  # NULL text, 2^53+1 bigint
    ]
    sink = PsqlCopyMergeSink(pg, "t_esc", pk=("k",), mode="ignore")
    sink.merge(spark.createDataFrame(rows, "k string, s string, n long"), 0)
    got = {
        r[0]: (r[1], r[2])
        for r in _fetch(
            pg,
            "SELECT k, coalesce(md5(s), 'NULL'), coalesce(n::text, 'NULL')"
            " FROM t_esc",
        )
    }
    expect = {
        k: (
            hashlib.md5(s.encode()).hexdigest() if s is not None else "NULL",
            str(n) if n is not None else "NULL",
        )
        for k, s, n in rows
    }
    assert got == expect


def test_psql_merge_empty_batch_is_a_cheap_noop(spark, pg):
    """foreachBatch delivers empty micro-batches (idle trigger fires); the
    sink must no-op without touching the database."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_empty;"
             "CREATE TABLE t_empty (k text PRIMARY KEY, v double precision)")
    sink = PsqlCopyMergeSink(pg, "t_empty", pk=("k",), mode="upsert",
                             psql="/nonexistent/psql")  # proves no subprocess
    sink.merge(spark.createDataFrame([], "k string, v double"), 0)
    assert _fetch(pg, "SELECT count(*) FROM t_empty") == [["0"]]


def test_psql_merge_failed_batch_leaves_nothing_behind(spark, pg):
    """Atomicity claim from the docstring: COPY + merge run in ONE
    transaction, so a batch that fails mid-merge (here: a NOT NULL
    violation) must leave the target untouched and raise with the database
    error attached — no partial rows, no leftover staging."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_atomic;"
             "CREATE TABLE t_atomic (k text PRIMARY KEY,"
             " v double precision NOT NULL)")
    sink = PsqlCopyMergeSink(pg, "t_atomic", pk=("k",), mode="ignore")
    sink.merge(spark.createDataFrame([("a", 1.0)], "k string, v double"), 0)
    bad = spark.createDataFrame([("b", 2.0), ("c", None)], "k string, v double")
    with pytest.raises(RuntimeError, match="t_atomic"):
        sink.merge(bad, 1)
    got = _fetch(pg, "SELECT k, v FROM t_atomic ORDER BY k")
    assert got == [["a", "1"]]
    # the temp staging table died with its transaction
    assert _fetch(pg, "SELECT count(*) FROM pg_tables"
                      " WHERE tablename LIKE '_cfr_stage%'") == [["0"]]


def test_psql_sink_matches_parquet_twin_on_a_real_stream(spark, sf_dir, tmp_path, pg):
    """Capstone: the same staged micro-batch replay (the q_stream_upsert_ingest
    shape — upsert on (user_id, event_type), ts tiebreak) driven through both
    sink backends; the Postgres table must equal the parquet twin's resolved
    read row-for-row."""
    from coin_for_rich_spark.sources import load_table
    from coin_for_rich_spark.streaming import (
        ParquetMergeSink,
        PsqlCopyMergeSink,
        run_ingest,
    )
    from coin_for_rich_spark.streaming.source import (
        read_file_stream,
        stage_stream_chunks,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "user_id", "value"
    )
    staged = str(tmp_path / "staged")
    schema = stage_stream_chunks(ev, staged, n_chunks=4)

    pq_sink = ParquetMergeSink(
        str(tmp_path / "tbl"), pk=("user_id", "event_type"), mode="upsert",
        tiebreak_col="ts",
    )
    _sql(pg, "DROP TABLE IF EXISTS events_ing;"
             "CREATE TABLE events_ing (event_id bigint, ts timestamp,"
             " event_type text, user_id bigint, value double precision,"
             " PRIMARY KEY (user_id, event_type))")
    ps_sink = PsqlCopyMergeSink(
        pg, "events_ing", pk=("user_id", "event_type"), mode="upsert",
        tiebreak_col="ts",
    )
    run_ingest(read_file_stream(spark, staged, schema), pq_sink,
               str(tmp_path / "ckpt_pq"))
    run_ingest(read_file_stream(spark, staged, schema), ps_sink,
               str(tmp_path / "ckpt_ps"))

    def key(t):
        return (t[3], t[2])

    expect = sorted(
        (
            (r["event_id"], r["ts"], r["event_type"], r["user_id"], r["value"])
            for r in pq_sink.read(spark).collect()
        ),
        key=key,
    )
    got = sorted(
        (
            (
                int(r[0]),
                dt.datetime.strptime(
                    r[1] + ("" if "." in r[1] else ".0"), "%Y-%m-%d %H:%M:%S.%f"
                ),
                r[2],
                int(r[3]),
                float(r[4]),
            )
            for r in _fetch(
                pg,
                "SELECT event_id, ts, event_type, user_id, value FROM events_ing",
            )
        ),
        key=key,
    )
    assert len(got) == len(expect) > 0
    assert got == expect


def test_pg_ddl_maps_schema_and_rejects_composites():
    from pyspark.sql import types as T

    from coin_for_rich_spark.streaming.jdbc import pg_ddl

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("n", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    ddl = pg_ddl("t", schema, ["k", "ts"])
    assert ddl == (
        "CREATE TABLE t (k text, ts timestamp, n bigint, "
        "v double precision, PRIMARY KEY (k, ts))"
    )
    bad = T.StructType([T.StructField("a", T.ArrayType(T.LongType()))])
    with pytest.raises(TypeError, match="scalar"):
        pg_ddl("t", bad, ["a"])


def test_hypertable_ddl_guarded_and_pk_validated():
    """The TimescaleDB conversion (the reference's create_hypertable on
    ohlcvs) must be extension-guarded — identical DDL deploys against plain
    PostgreSQL as a no-op — and must reject a time column outside the PK
    at DDL-build time (TimescaleDB requires the partitioning column in
    every unique index; better a ValueError here than a server error at
    deploy)."""
    from coin_for_rich_spark.streaming.jdbc import hypertable_ddl

    ddl = hypertable_ddl("ohlcvs", "ts", ["symbol", "ts"])
    # guard on pg_extension (INSTALLED), never CREATE EXTENSION: a DO block
    # is a transaction context, where TimescaleDB's loader refuses install
    assert "pg_extension" in ddl and "extname = 'timescaledb'" in ddl
    assert "CREATE EXTENSION" not in ddl
    assert "create_hypertable('ohlcvs', 'ts', if_not_exists => TRUE)" in ddl
    with pytest.raises(ValueError, match="primary key"):
        hypertable_ddl("events", "ts", ["user_id", "event_type"])


def test_create_table_with_hypertable_on_plain_postgres(spark, pg):
    """On a server WITHOUT timescaledb the guarded conversion is a no-op:
    the table comes up as a plain PK table and the merge path is unchanged
    — the exact degradation contract the DDL promises."""
    from pyspark.sql import types as T

    from coin_for_rich_spark.streaming.jdbc import PsqlCopyMergeSink

    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    sink = PsqlCopyMergeSink(pg, "hyper_t", ("k", "ts"), mode="upsert")
    sink.create_table(schema, drop=True, hypertable_time_col="ts")
    import datetime

    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1, 0, 0), 1.5)], schema
    )
    sink.merge(df, 0)
    rows = _fetch(pg, "SELECT k, v FROM hyper_t")
    assert rows == [["a", "1.5"]]


def test_pg_text_parse_inverts_pg_text_value():
    """Escape→unescape must be the identity on adversarial strings — in
    particular a literal backslash-t must NOT come back as a tab (the
    chained-str.replace bug this parser exists to avoid)."""
    from pyspark.sql import types as T

    from coin_for_rich_spark.streaming.jdbc import pg_text_parse, pg_text_value

    for s in ["a\\tb", "x\ty", "nl\nnl", "\\N", "\\.", "plain", "\r", "\\\\"]:
        assert pg_text_parse(pg_text_value(s), T.StringType()) == s, repr(s)
    assert pg_text_parse("\\N", T.StringType()) is None
    assert pg_text_parse(pg_text_value(2**53 + 1), T.LongType()) == 2**53 + 1
    assert pg_text_parse(pg_text_value(0.1), T.DoubleType()) == 0.1
    t = dt.datetime(2024, 1, 2, 3, 4, 5, 678901)
    assert pg_text_parse(pg_text_value(t), T.TimestampType()) == t


def test_psql_read_back_matches_merged_state(spark, pg):
    """sink.read must return EXACTLY the resolved rows the database holds —
    NULLs, adversarial strings, large ints, and µs timestamps included —
    as typed Spark rows (this is the transport the declared
    stream_upsert_ingest row certifies)."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_rb;"
             "CREATE TABLE t_rb (k text PRIMARY KEY, s text, n bigint,"
             " v double precision, ts timestamp)")
    rows = [
        ("a", "x\ty\\z\n\\.", 2**53 + 1, 0.1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        ("b", None, None, None, None),
        ("c", "\\N", -7, 6.55, dt.datetime(2024, 6, 30, 23, 59, 59, 999999)),
    ]
    schema = "k string, s string, n long, v double, ts timestamp"
    sink = PsqlCopyMergeSink(pg, "t_rb", pk=("k",), mode="ignore")
    batch = spark.createDataFrame(rows, schema)
    sink.merge(batch, 0)
    got = sorted(tuple(r) for r in sink.read(spark, batch.schema).collect())
    assert got == sorted(rows)


def test_declared_query_psql_leg_matches_parquet_twin(spark, sf_dir, monkeypatch):
    """Gate-level capstone for the r6 wiring: q_stream_upsert_ingest with
    SPARK_GRAFT_PSQL=1 (resolved state read back FROM a live Postgres) must
    equal the parquet twin (=0) row-for-row — the two legs of the declared
    query are interchangeable, so the correctness row is backend-invariant."""
    import __spark_entry__ as entry_mod

    monkeypatch.setenv("SPARK_GRAFT_PSQL", "1")
    via_pg = sorted(
        tuple(r) for r in entry_mod.q_stream_upsert_ingest(spark, sf_dir).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_PSQL", "0")
    via_parquet = sorted(
        tuple(r) for r in entry_mod.q_stream_upsert_ingest(spark, sf_dir).collect()
    )
    assert len(via_pg) == len(via_parquet) > 0
    assert via_pg == via_parquet


# ---------------------------------------------------------------------------
# Wire-protocol client + distributed-staging sink (streaming/pgwire.py,
# jdbc.PgWireMergeSink) — the scale-out twin, against the same live server.
# ---------------------------------------------------------------------------


def test_pgwire_client_query_copy_and_errors(pg):
    from coin_for_rich_spark.streaming.pgwire import (
        PgError,
        PgWireClient,
        conninfo_params,
    )

    with PgWireClient(**conninfo_params(pg)) as c:
        rows, tags = c.query("SELECT 1, NULL")
        assert rows == [["1", None]] and tags == ["SELECT 1"]
        c.query("DROP TABLE IF EXISTS wt; CREATE TABLE wt (k text, v int)")
        assert c.copy_in(
            "COPY wt (k, v) FROM STDIN", [b"a\t1\n", b"b\t2\nc\t3\n"]
        ) == "COPY 3"
        with pytest.raises(PgError, match="does not exist"):
            c.query("SELECT no_such_col FROM wt")
        # connection stays usable after an error cycle
        assert c.query("SELECT count(*) FROM wt")[0] == [["3"]]
        with pytest.raises(PgError, match="invalid input"):
            c.copy_in("COPY wt (k, v) FROM STDIN", [b"z\tnope\n"])
        assert c.query("SELECT count(*) FROM wt")[0] == [["3"]]


def test_ephemeral_cluster_pins_c_collation(pg):
    """The throwaway cluster must initdb with --locale=C: an inherited
    en_US-style locale would sort strings case-insensitively in
    DISTINCT ON ... ORDER BY, silently forking tied-row winners from the
    byte-wise ParquetMergeSink — the exact cross-backend parity the
    NULLS-pinned order terms guarantee."""
    rows = _fetch(pg, "SHOW lc_collate")
    assert rows[0][0] in ("C", "POSIX"), rows
    # byte-order proof: uppercase sorts before lowercase under C collation
    got = _fetch(pg, "SELECT x FROM (VALUES ('a'), ('B')) t(x) ORDER BY x")
    assert [r[0] for r in got] == ["B", "a"]


def test_conninfo_parsing_strict_and_complete():
    """Silently-dropped conninfo arguments are a data-placement hazard (the
    wire sink would merge into postgres/postgres while the psql twin writes
    where the caller said) — unknown tokens must ERROR, and the shapes psql
    itself accepts (long flags, positional dbname) must parse."""
    from coin_for_rich_spark.streaming.pgwire import conninfo_params

    assert conninfo_params(["-h", "/tmp/s", "-U", "u", "-d", "db"]) == {
        "host": "/tmp/s", "user": "u", "database": "db"
    }
    assert conninfo_params(["--user=ingest", "--host=h", "mydb"]) == {
        "user": "ingest", "host": "h", "database": "mydb"
    }
    with pytest.raises(ValueError, match="unrecognized"):
        conninfo_params(["--wat=1"])
    with pytest.raises(ValueError, match="missing its value"):
        conninfo_params(["-h"])


def test_pgwire_copy_through_query_fails_fast(pg):
    """COPY FROM STDIN through query() would deadlock waiting for CopyData
    until the socket timeout; the client must reject it immediately and
    keep the connection usable is NOT promised (fail loud, fail fast)."""
    from coin_for_rich_spark.streaming.pgwire import (
        PgError,
        PgWireClient,
        conninfo_params,
    )

    with PgWireClient(**conninfo_params(pg)) as c:
        c.query("CREATE TABLE IF NOT EXISTS qcopy_t (a int)")
        with pytest.raises(PgError, match="copy_in"):
            c.query("COPY qcopy_t FROM STDIN")


def test_pgwire_distributed_sink_stages_partitions_in_parallel(spark, pg):
    """A multi-partition batch lands complete and correctly merged: every
    executor partition COPYs over its own wire connection, and the merge
    resolves within-batch duplicates by the shared winner rule."""
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_w;"
             "CREATE TABLE t_w (k text PRIMARY KEY, seq int, v double precision)")
    sink = PgWireMergeSink(pg, "t_w", pk=("k",), mode="upsert",
                           tiebreak_col="seq")
    rows = [(f"k{i % 40}", i, float(i)) for i in range(400)]
    batch = spark.createDataFrame(
        rows, "k string, seq int, v double"
    ).repartition(8)
    sink.merge(batch, 0)
    got = {r[0]: (int(r[1]), float(r[2])) for r in _fetch(pg, "SELECT * FROM t_w")}
    # upsert: highest seq per key wins (within_batch_order newest-first)
    want = {}
    for k, seq, v in rows:
        if k not in want or seq > want[k][0]:
            want[k] = (seq, v)
    assert got == want and len(got) == 40
    # staging cleaned up inside the merge transaction
    assert _fetch(pg, "SELECT count(*) FROM pg_tables WHERE tablename LIKE '_cfr_wstage%'")[0][0] == "0"


def test_pgwire_sink_matches_psql_twin(spark, pg):
    """Parity capstone: the distributed-staging sink and the single-writer
    psql sink must resolve the SAME batches to value-identical states."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    for t in ("t_tw_a", "t_tw_b"):
        _sql(pg, f"DROP TABLE IF EXISTS {t};"
                 f"CREATE TABLE {t} (k text PRIMARY KEY, seq int,"
                 " v double precision, ts timestamp)")
    a = PsqlCopyMergeSink(pg, "t_tw_a", pk=("k",), mode="upsert", tiebreak_col="seq")
    b = PgWireMergeSink(pg, "t_tw_b", pk=("k",), mode="upsert", tiebreak_col="seq")
    batches = [
        [("a", 1, 1.5, dt.datetime(2024, 1, 1)), ("b", 2, None, None),
         ("a", 3, 9.25, dt.datetime(2024, 3, 1))],
        [("c", 4, 0.1, dt.datetime(2024, 2, 2, 3, 4, 5, 678901)),
         ("b", 5, -2.0, dt.datetime(2024, 5, 5))],
    ]
    schema = "k string, seq int, v double, ts timestamp"
    for i, data in enumerate(batches):
        df = spark.createDataFrame(data, schema).repartition(4)
        a.merge(df, i)
        b.merge(df, i)
    qa = _fetch(pg, "SELECT * FROM t_tw_a ORDER BY k")
    qb = _fetch(pg, "SELECT * FROM t_tw_b ORDER BY k")
    assert qa == qb and len(qa) == 3


def test_pgwire_sink_failed_merge_leaves_target_untouched(spark, pg):
    from coin_for_rich_spark.streaming.pgwire import PgError
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_wf;"
             "CREATE TABLE t_wf (k text PRIMARY KEY, n int)")
    sink = PgWireMergeSink(pg, "t_wf", pk=("k",), mode="ignore")
    ok = spark.createDataFrame([("a", 1)], "k string, n int")
    sink.merge(ok, 0)
    # a batch whose value cannot COPY into the target's column type fails
    # inside the executors' COPY — the Spark action raises and the target
    # keeps its previous state
    bad = spark.createDataFrame([("b", 2**40)], "k string, n long")
    with pytest.raises(Exception):
        sink.merge(bad, 1)
    assert _fetch(pg, "SELECT k, n FROM t_wf") == [["a", "1"]]


def test_pgwire_client_over_tcp(spark):
    """The production transport: the same client + distributed sink over
    localhost TCP instead of the unix socket."""
    import socket as pysocket
    import tempfile

    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink
    from coin_for_rich_spark.streaming.pgwire import PgWireClient, conninfo_params

    with pysocket.socket() as s:  # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    conninfo, stop = start_cluster(
        tempfile.mkdtemp(prefix="cfr_pg_tcp_"), tcp_port=port
    )
    try:
        params = conninfo_params(conninfo)
        assert params["host"] == "localhost" and int(params["port"]) == port
        with PgWireClient(**params) as c:
            assert c.query("SELECT 42")[0] == [["42"]]
            c.query("CREATE TABLE t_tcp (k text PRIMARY KEY, v int)")
        sink = PgWireMergeSink(conninfo, "t_tcp", pk=("k",), mode="ignore")
        sink.merge(
            spark.createDataFrame(
                [("a", 1), ("b", 2)], "k string, v int"
            ).repartition(2),
            0,
        )
        assert _fetch(conninfo, "SELECT k, v FROM t_tcp ORDER BY k") == [
            ["a", "1"],
            ["b", "2"],
        ]
    finally:
        stop()


def test_pgwire_sink_adversarial_values_round_trip(spark, pg):
    """The wire COPY path must survive the same adversarial payloads the
    psql twin is pinned on: embedded tabs/newlines/backslashes, the literal
    NULL token, end-of-copy marker lookalikes, NaN/inf floats, and µs
    timestamps — staged from executors, read back typed."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_wa;"
             "CREATE TABLE t_wa (k text PRIMARY KEY, s text,"
             " v double precision, ts timestamp)")
    rows = [
        ("tabs", "a\tb\tc", 1.5, dt.datetime(2024, 1, 1)),
        ("nl", "x\ny\rz", float("nan"), None),
        ("bs", "back\\slash \\N \\.", float("inf"), dt.datetime(2024, 2, 2)),
        ("nul", None, -0.0, dt.datetime(2024, 3, 3, 4, 5, 6, 789012)),
    ]
    schema = "k string, s string, v double, ts timestamp"
    sink = PgWireMergeSink(pg, "t_wa", pk=("k",), mode="ignore")
    sink.merge(spark.createDataFrame(rows, schema).repartition(3), 0)
    reader = PsqlCopyMergeSink(pg, "t_wa", pk=("k",), mode="ignore")
    batch = spark.createDataFrame(rows, schema)
    got = {r["k"]: tuple(r) for r in reader.read(spark, batch.schema).collect()}
    import math

    for k, s, v, ts in rows:
        gk, gs, gv, gts = got[k]
        assert gs == s
        if v is not None and math.isnan(v):
            assert math.isnan(gv)
        else:
            assert gv == v
        assert gts == ts


def test_pg_readback_unescapes_server_control_chars(spark, pg):
    """COPY TO escapes \\b \\f \\v (beyond the \\t \\n \\r the write side
    produces); the readback parser must undo all of them — a stored
    vertical tab must not come back as the letter 'v'."""
    from coin_for_rich_spark.streaming import PsqlCopyMergeSink

    _sql(pg, "DROP TABLE IF EXISTS t_ctl;"
             "CREATE TABLE t_ctl (k text PRIMARY KEY, s text)")
    rows = [("vt", "a\x0bb"), ("bsp", "x\x08y"), ("ff", "p\x0cq")]
    schema = "k string, s string"
    sink = PsqlCopyMergeSink(pg, "t_ctl", pk=("k",), mode="ignore")
    batch = spark.createDataFrame(rows, schema)
    sink.merge(batch, 0)
    got = {r["k"]: r["s"] for r in sink.read(spark, batch.schema).collect()}
    assert got == dict(rows)


def test_null_tiebreak_parity_with_parquet_twin(spark, pg, tmp_path):
    """A NULL tiebreak value must resolve to the SAME winner in the
    database legs as in the parquet twin: Spark desc() is nulls-LAST,
    PostgreSQL's bare DESC is nulls-FIRST, so the rendered ORDER BY pins
    NULLS LAST explicitly."""
    from coin_for_rich_spark.streaming import ParquetMergeSink, PsqlCopyMergeSink
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    rows = [("k1", None, 1.0), ("k1", dt.datetime(2024, 1, 1), 2.0)]
    schema = "k string, ts timestamp, v double"
    batch = spark.createDataFrame(rows, schema)

    pq = ParquetMergeSink(
        str(tmp_path / "tbl"), pk=("k",), mode="upsert", tiebreak_col="ts"
    )
    pq.merge(batch, 0)
    pq_v = pq.read(spark).collect()[0]["v"]

    for name, cls in (("t_nt_a", PsqlCopyMergeSink), ("t_nt_b", PgWireMergeSink)):
        _sql(pg, f"DROP TABLE IF EXISTS {name};"
                 f"CREATE TABLE {name} (k text PRIMARY KEY, ts timestamp,"
                 " v double precision)")
        sink = cls(pg, name, pk=("k",), mode="upsert", tiebreak_col="ts")
        sink.merge(batch, 0)
        got = _fetch(pg, f"SELECT v FROM {name}")[0][0]
        assert float(got) == pq_v, (name, got, pq_v)


def test_stage_source_widens_narrow_batches_only(spark):
    """The COPY stage's parallelism is the batch's partition count; a
    single-file micro-batch scans as ONE partition and would serialize the
    whole per-row text encode onto one core. _stage_source must widen a
    narrow batch to min(stage_parallelism, defaultParallelism) and leave an
    already-wide batch untouched (the production stream shape — no extra
    exchange)."""
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    sink = PgWireMergeSink(
        ["-h", "/nonexistent", "-p", "5432"], "t_sp", pk=("k",),
        mode="upsert", tiebreak_col="seq", stage_parallelism=4,
    )
    dp = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame(
        [(f"k{i}", i, float(i)) for i in range(100)],
        "k string, seq int, v double",
    ).coalesce(1)
    widened = sink._stage_source(narrow)
    assert widened.rdd.getNumPartitions() == min(4, dp)
    wide = narrow.repartition(8)
    assert sink._stage_source(wide) is wide


def test_pgwire_sink_single_partition_batch_merges_identically(spark, pg):
    """End-to-end through the widened staging path: a 1-partition batch
    (the local micro-batch shape) must merge to the same state as the
    8-partition batch of the same rows."""
    from coin_for_rich_spark.streaming.jdbc import PgWireMergeSink

    rows = [(f"k{i % 40}", i, float(i)) for i in range(400)]
    schema = "k string, seq int, v double"
    states = {}
    for t, nparts in (("t_np1", 1), ("t_np8", 8)):
        _sql(pg, f"DROP TABLE IF EXISTS {t};"
                 f"CREATE TABLE {t} (k text PRIMARY KEY, seq int,"
                 " v double precision)")
        sink = PgWireMergeSink(pg, t, pk=("k",), mode="upsert",
                               tiebreak_col="seq")
        batch = spark.createDataFrame(rows, schema)
        batch = batch.coalesce(1) if nparts == 1 else batch.repartition(8)
        sink.merge(batch, 0)
        states[t] = sorted(_fetch(pg, f"SELECT * FROM {t}"))
    assert states["t_np1"] == states["t_np8"] and len(states["t_np1"]) == 40
