"""Shared psql execution harness for the reference-parity test suites.

One copy of the plumbing both live-PostgreSQL legs
(test_reference_sql_parity, test_reference_updater_protocol) use to run
SQL on the ephemeral cluster — in particular the NOSUPERUSER hardening
for reference-derived text: any statement containing SQL extracted from
the untrusted reference tree (DDL, view bodies, query templates)
executes under the dedicated ``refexec`` role (ADVICE r8: superuser
execution of untrusted reference text could reach file primitives
callable from SELECT — lo_export, pg_read_file). NOSUPERUSER, no
pg_write_server_files / pg_execute_server_program membership; objects it
creates (the reference tables and views) are owned by it, so view bodies
also execute under its privileges at query time. Keeping the role DDL
and the SET ROLE wrapper in one module means a future hardening change
cannot apply to one suite and silently miss the other.
"""

from __future__ import annotations

import subprocess

REF_ROLE_SQL = """
CREATE ROLE refexec NOSUPERUSER NOCREATEDB NOCREATEROLE NOREPLICATION;
GRANT ALL ON SCHEMA public TO refexec;
GRANT refexec TO CURRENT_USER;
"""


def _psql(conninfo, sql: str, fetch: bool = False) -> str:
    flags = ["-A", "-t", "-F", "\t"] if fetch else ["-q"]
    p = subprocess.run(
        ["psql", "-X", "-v", "ON_ERROR_STOP=1", *conninfo, *flags],
        input=sql.encode(),
        capture_output=True,
        cwd="/",
    )
    if p.returncode != 0:
        # a real exception, not a bare assert: under `python -O` asserts
        # vanish and a failed reference-SQL execution would return empty
        # output as success
        raise RuntimeError(
            f"psql failed (rc={p.returncode}):\n{p.stderr.decode()}"
            f"\nSQL:\n{sql[:2000]}"
        )
    return p.stdout.decode()


def _psql_ref(conninfo, sql: str, fetch: bool = False) -> str:
    """Execute ``sql`` (reference-derived text) under the refexec role."""
    return _psql(conninfo, "SET ROLE refexec;\n" + sql, fetch=fetch)


def _fetch(conninfo, sql: str) -> list[list[str]]:
    out = _psql(conninfo, sql, fetch=True)
    return [line.split("\t") for line in out.splitlines() if line]


def _fetch_ref(conninfo, sql: str) -> list[list[str]]:
    """Fetch reference-derived SQL under refexec (the SET command tag psql
    prints even in tuples-only mode is stripped)."""
    out = _psql_ref(conninfo, sql, fetch=True)
    return [
        line.split("\t") for line in out.splitlines() if line and line != "SET"
    ]
