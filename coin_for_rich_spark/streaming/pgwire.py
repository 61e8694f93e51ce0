"""Minimal PostgreSQL v3 wire-protocol client — pure stdlib, no driver.

Exists for ONE reason: distributed staging. The ``psql``-subprocess sink
(`jdbc.PsqlCopyMergeSink`) is a single writer by construction — the batch
funnels through the driver. At ingest rates where that hop matters, the
right shape is the one every production Spark→PostgreSQL pipeline uses:
every executor COPYs its own partition into an UNLOGGED staging table in
parallel, then the driver runs ONE set-based merge transaction. No JDBC
driver jar ships in this environment and executors can't usefully shell out
to psql per partition, so the sink speaks the wire protocol directly: the
startup handshake, the simple-query cycle, and COPY-IN streaming are ~200
lines of framing (public protocol, documented in the PostgreSQL manual,
"Frontend/Backend Protocol").

Scope, honestly: trust authentication only (password/SASL raise — the
ephemeral in-repo server and typical CI sidecars run trust; a production
deployment with md5/SCRAM wants a real driver), text-format COPY, simple
query protocol. Errors surface as ``PgError`` with the server's message.
"""

from __future__ import annotations

import socket
import struct
from collections.abc import Iterable


class PgError(RuntimeError):
    """Server-reported error (severity + message + detail when present)."""


def conninfo_params(conninfo: list[str]) -> dict[str, str]:
    """Parse the ``["-h", host, "-U", user, "-d", db, "-p", port]`` psql
    argument convention the engine's sinks share into wire-client kwargs."""
    out: dict[str, str] = {}
    flags = {"-h": "host", "-U": "user", "-d": "database", "-p": "port"}
    i = 0
    while i < len(conninfo):
        key = flags.get(conninfo[i])
        if key is not None and i + 1 < len(conninfo):
            out[key] = conninfo[i + 1]
            i += 2
        else:
            i += 1
    return out


class PgWireClient:
    """One connection. ``host`` starting with '/' is a unix-socket
    directory (PostgreSQL convention: ``<dir>/.s.PGSQL.<port>``)."""

    def __init__(
        self,
        host: str,
        user: str = "postgres",
        database: str = "postgres",
        port: int | str = 5432,
        timeout: float = 60.0,
    ) -> None:
        if host.startswith("/"):
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.settimeout(timeout)
            self._sock.connect(f"{host}/.s.PGSQL.{int(port)}")
        else:
            self._sock = socket.create_connection((host, int(port)), timeout)
        self._buf = b""
        self._startup(user, database)

    # -- framing ----------------------------------------------------------
    def _send(self, typ: bytes, payload: bytes) -> None:
        self._sock.sendall(typ + struct.pack(">I", 4 + len(payload)) + payload)

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._read_exact(5)
        typ = head[:1]
        (length,) = struct.unpack(">I", head[1:5])
        return typ, self._read_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> str:
        fields: dict[bytes, str] = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[part[:1]] = part[1:].decode(errors="replace")
        parts = [fields.get(b"S", "ERROR"), fields.get(b"M", "unknown")]
        if b"D" in fields:
            parts.append(fields[b"D"])
        return ": ".join(parts)

    # -- protocol ---------------------------------------------------------
    def _startup(self, user: str, database: str) -> None:
        params = f"user\x00{user}\x00database\x00{database}\x00\x00".encode()
        payload = struct.pack(">I", 196608) + params  # protocol 3.0
        self._sock.sendall(struct.pack(">I", 4 + len(payload)) + payload)
        while True:
            typ, body = self._read_message()
            if typ == b"R":
                (code,) = struct.unpack(">I", body[:4])
                if code != 0:
                    raise NotImplementedError(
                        f"PostgreSQL auth method {code} is outside the "
                        "supported subset (trust only) — use a real driver "
                        "for password/SCRAM servers"
                    )
            elif typ in (b"S", b"K", b"N"):
                continue
            elif typ == b"Z":
                return
            elif typ == b"E":
                raise PgError(self._error_fields(body))
            else:
                raise PgError(f"unexpected startup message {typ!r}")

    def query(self, sql: str) -> tuple[list[list[str | None]], list[str]]:
        """Simple-query cycle: returns (rows, command tags). Rows are text
        (the simple protocol's wire format); enough for DDL, merges, and
        small control reads — bulk data belongs to COPY."""
        self._send(b"Q", sql.encode() + b"\x00")
        rows: list[list[str | None]] = []
        tags: list[str] = []
        err: str | None = None
        while True:
            typ, body = self._read_message()
            if typ == b"D":
                (n,) = struct.unpack(">H", body[:2])
                vals: list[str | None] = []
                off = 2
                for _ in range(n):
                    (ln,) = struct.unpack(">i", body[off : off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(body[off : off + ln].decode())
                        off += ln
                rows.append(vals)
            elif typ == b"C":
                tags.append(body.rstrip(b"\x00").decode())
            elif typ == b"E":
                err = self._error_fields(body)
            elif typ == b"Z":
                if err is not None:
                    raise PgError(err)
                return rows, tags
            # 'T' row description, 'N' notices, 'I' empty query: skipped

    def copy_in(self, copy_sql: str, data: Iterable[bytes]) -> str:
        """``COPY ... FROM STDIN`` with streamed text-format chunks; returns
        the COPY command tag (e.g. ``COPY 42``). The whole cycle is one
        implicit transaction unless wrapped by the caller."""
        self._send(b"Q", copy_sql.encode() + b"\x00")
        err: str | None = None
        started = False
        while True:
            typ, body = self._read_message()
            if typ == b"G":
                started = True
                break
            if typ == b"E":
                err = self._error_fields(body)
            elif typ == b"Z":
                raise PgError(err or "COPY did not reach CopyInResponse")
        assert started
        try:
            for chunk in data:
                if chunk:
                    self._send(b"d", chunk)
            self._send(b"c", b"")  # CopyDone
        except PgError:
            raise
        except Exception as exc:  # encoding failure mid-stream: tell server
            self._send(b"f", str(exc).encode()[:200] + b"\x00")  # CopyFail
            # fall through to drain the error response
        tag = ""
        while True:
            typ, body = self._read_message()
            if typ == b"C":
                tag = body.rstrip(b"\x00").decode()
            elif typ == b"E":
                err = self._error_fields(body)
            elif typ == b"Z":
                if err is not None:
                    raise PgError(err)
                return tag

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except Exception:  # noqa: BLE001 — best-effort goodbye
            pass
        self._sock.close()

    def __enter__(self) -> "PgWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
