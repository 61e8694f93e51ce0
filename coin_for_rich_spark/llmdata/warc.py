"""WARC (Web ARChive, ISO 28500) ingest — the format a web-scale corpus
actually arrives in (Common Crawl ships WARC/WET; every crawl pipeline's
first operator is "walk WARC records, pull the HTTP payloads out").

Pure stdlib, same honesty split as the other containers (llmdata/mp4.py,
llmdata/codecs.py): the CONTAINER layer is fully real — record framing,
header grammar, per-record gzip members (the Common Crawl wire shape:
each record its own gzip member, concatenated, so a byte-range fetch of
one record decompresses standalone), the embedded HTTP/1.1 response
parse — while nothing pretends to be a browser: payload handling stops
at bytes + declared Content-Type, and HTML→text is the already-pinned
tag-strip tier in :mod:`~.web`, not a DOM walk.

Reference anchor: the reference ingests exchange REST/WS payloads rather
than crawl archives (`fetchers/rest/*.py`), but its ingest DISCIPLINE —
wire container → typed records → dead-letter the structurally broken,
never drop silently (`fetchers/rest/utils.py` parse/dead-letter split) —
is what this module transplants to the crawl-archive boundary.

Layout contract (the formula oracle depends on these exact bytes — the
same "oracle predicts offsets, engine must parse its way to the same
integers" posture as mp4_mux_gray's 28-byte preamble):

    WARC/1.0\r\n
    WARC-Type: <type>\r\n
    WARC-Record-ID: <urn:uuid:<36 chars>>\r\n
    WARC-Date: <20 chars, ISO-8601 Z>\r\n
    WARC-Target-URI: <uri>\r\n            (response records)
    Content-Type: <ctype>\r\n
    Content-Length: <n>\r\n
    \r\n
    <n block bytes>\r\n\r\n

and for ``msgtype=response`` blocks:

    HTTP/1.1 <status> <reason>\r\n
    Content-Type: <media type>\r\n
    Content-Length: <b>\r\n
    \r\n
    <b body bytes>

The demuxer is deliberately more general than the muxer (the mp4 rule):
headers in any order and case, unknown headers skipped, plain AND
per-member-gzip streams auto-detected, non-response record types carried
through with NULL http fields, and a structurally broken record (bad
frame, missing Content-Length, truncated block) becomes a typed
dead-letter row instead of an exception — one malformed record in a
100 TB crawl must cost one row, not one task.

Scale posture: one WARC file is one row in, ~10³ rows out, all inside a
map-only ``mapInPandas`` — bytes never shuffle, offsets come from local
arithmetic, and a 1000-executor scan of a WARC bucket parallelizes by
file exactly like production (Common Crawl segments are ~1 GB gzipped
files; `spark.sql.files.maxPartitionBytes` never splits mid-member
because binary payload rows are atomic).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

WARC_DATE = "2024-01-01T00:00:00Z"  # fixed fixture date (20 chars)


# ---------------------------------------------------------------- mux side


def http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    media_type: str = "text/html; charset=utf-8",
) -> bytes:
    """Serialize a minimal deterministic HTTP/1.1 response block."""
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {media_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("ascii") + body


def warc_record(
    warc_type: str,
    record_uuid: str,
    block: bytes,
    target_uri: str | None = None,
    content_type: str = "application/http; msgtype=response",
    warc_date: str = WARC_DATE,
) -> bytes:
    """Serialize one WARC/1.0 record with the fixed header order above."""
    lines = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: <urn:uuid:{record_uuid}>",
        f"WARC-Date: {warc_date}",
    ]
    if target_uri is not None:
        lines.append(f"WARC-Target-URI: {target_uri}")
    lines.append(f"Content-Type: {content_type}")
    lines.append(f"Content-Length: {len(block)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return head + block + b"\r\n\r\n"


def warc_mux(records: list[bytes], gzip_members: bool = False) -> bytes:
    """Concatenate serialized records into one WARC file.

    ``gzip_members=True`` compresses EACH record as its own gzip member
    (mtime pinned to 0 so the bytes are deterministic) — the Common Crawl
    shape that lets a reader fetch one record by byte range.
    """
    if not gzip_members:
        return b"".join(records)
    out = []
    for rec in records:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        # wbits=31 → gzip container; header mtime field is already 0 for
        # compressobj-produced streams (no filename, no timestamp)
        out.append(co.compress(rec) + co.flush())
    return b"".join(out)


def doc_record_uuid(doc_id: int) -> str:
    """Deterministic fixture UUID — doc_id printf'd into the node field."""
    return f"00000000-0000-4000-8000-{doc_id % 10**12:012d}"


# -------------------------------------------------------------- demux side


@dataclass
class WarcRecord:
    offset: int  # byte offset of the record (or its gzip member) in file
    length: int  # bytes of the record frame (or its gzip member)
    warc_type: str | None
    record_id: str | None
    warc_date: str | None
    target_uri: str | None
    content_type: str | None
    content_length: int | None
    http_status: int | None
    http_content_type: str | None
    body: bytes | None
    error: str | None = None  # dead-letter reason; None == clean parse


def _split_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, plain_bytes) per gzip member, or
    the whole stream as one plain member when not gzip."""
    if not data.startswith(_GZIP_MAGIC):
        yield 0, len(data), data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(31)
        plain = d.decompress(data[pos:])
        plain += d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, consumed, plain
        if consumed <= 0:  # defensive: a zero-length member would loop
            break
        pos += consumed


def _parse_headers(raw: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in raw.split(_CRLF):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
            "latin-1"
        )
    return headers


def _parse_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Parse an HTTP/1.1 response block → (status, content-type, body).

    Tolerant of arbitrary headers; falls back to (None, None, block) when
    the block is not an HTTP response at all (resource records)."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head, body = block[:sep], block[sep + 4 :]
    status_line, _, rest = head.partition(_CRLF)
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    headers = _parse_headers(rest)
    return status, headers.get("content-type"), body


def _parse_record_frame(plain: bytes, start: int) -> tuple[WarcRecord, int]:
    """Parse ONE record from ``plain[start:]`` → (record, next_start).

    The returned record carries offset/length RELATIVE to the plain
    stream; callers substitute member offsets for gzip inputs. On a
    structural error the rest of the stream cannot be re-synced (frames
    are length-delimited), so the dead-letter row swallows the remainder.
    """

    def dead(reason: str) -> tuple[WarcRecord, int]:
        return (
            WarcRecord(
                offset=start,
                length=len(plain) - start,
                warc_type=None,
                record_id=None,
                warc_date=None,
                target_uri=None,
                content_type=None,
                content_length=None,
                http_status=None,
                http_content_type=None,
                body=None,
                error=reason,
            ),
            len(plain),
        )

    if not plain.startswith(b"WARC/", start):
        return dead("bad_version_line")
    sep = plain.find(_CRLF + _CRLF, start)
    if sep < 0:
        return dead("unterminated_header")
    headers = _parse_headers(plain[start:sep])
    if "content-length" not in headers:
        return dead("missing_content_length")
    try:
        n = int(headers["content-length"])
    except ValueError:
        return dead("bad_content_length")
    block_start = sep + 4
    block_end = block_start + n
    if block_end + 4 > len(plain):
        return dead("truncated_block")
    if plain[block_end : block_end + 4] != _CRLF * 2:
        return dead("missing_record_separator")
    block = plain[block_start:block_end]
    ctype = headers.get("content-type")
    if ctype is not None and ctype.startswith("application/http"):
        status, http_ctype, body = _parse_http(block)
    else:
        status, http_ctype, body = None, None, block
    rid = headers.get("warc-record-id")
    if rid and rid.startswith("<") and rid.endswith(">"):
        rid = rid[1:-1]
    return (
        WarcRecord(
            offset=start,
            length=block_end + 4 - start,
            warc_type=headers.get("warc-type"),
            record_id=rid,
            warc_date=headers.get("warc-date"),
            target_uri=headers.get("warc-target-uri"),
            content_type=ctype,
            content_length=n,
            http_status=status,
            http_content_type=http_ctype,
            body=body,
        ),
        block_end + 4,
    )


def warc_demux(data: bytes) -> list[WarcRecord]:
    """Parse a plain OR per-member-gzip WARC stream into records.

    For gzip input, offset/length describe the record's gzip MEMBER in the
    compressed file (the byte range a remote reader would fetch); for
    plain input they describe the record frame itself.
    """
    out: list[WarcRecord] = []
    gz = data.startswith(_GZIP_MAGIC)
    for m_off, m_len, plain in _split_members(data):
        pos = 0
        while pos < len(plain):
            rec, pos = _parse_record_frame(plain, pos)
            if gz:
                rec.offset, rec.length = m_off, m_len
            out.append(rec)
    return out


# ------------------------------------------------------------ spark layer


def warc_files_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("file_id", T.LongType(), False),
            T.StructField("n_records", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )


WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType(), False),
        T.StructField("record_offset", T.LongType(), True),
        T.StructField("record_length", T.LongType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def attach_warc_files(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    docs_per_file: int = 8,
    gzip_members: bool = False,
) -> DataFrame:
    """Fixture generator (the attach_real_media pattern): wrap every
    document as an HTTP response record and mux ``docs_per_file``
    consecutive documents per WARC file.

    The html wrapper and header layout are the FORMULA CONTRACT the gate
    oracle re-derives byte counts from — change them together or not at
    all. The groupBy here is fixture plumbing (real ingest starts from
    existing WARC bytes); the one shuffle it costs builds the test corpus,
    not the operator.
    """
    src = docs.select(
        (F.col(id_col) / docs_per_file).cast("long").alias("file_id"),
        F.col(id_col).alias("_doc_id"),
        F.concat(
            F.lit("http://crawl.example/doc/"), F.col(id_col).cast("string")
        ).alias("_uri"),
        F.concat(
            F.lit("<html><body><p>"), F.col(text_col), F.lit("</p></body></html>")
        ).alias("_html"),
    )

    schema = warc_files_schema()

    def mux(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_doc_id")
        recs = [
            warc_record(
                "response",
                doc_record_uuid(int(did)),
                http_response(str(html).encode("utf-8")),
                target_uri=str(uri),
            )
            for did, uri, html in zip(pdf["_doc_id"], pdf["_uri"], pdf["_html"])
        ]
        return pd.DataFrame(
            {
                "file_id": [int(key[0])],
                "n_records": [len(recs)],
                "payload": [warc_mux(recs, gzip_members=gzip_members)],
            }
        )

    return src.groupBy("file_id").applyInPandas(mux, schema=schema)


def warc_records(files: DataFrame) -> DataFrame:
    """Demux WARC files → one row per record (typed dead letters included).

    Map-only ``mapInPandas`` over (file_id, payload): bytes stay inside
    the executor batch, offsets come from local arithmetic — the 100 TB
    plan is scan → flat-map, zero exchanges.
    """
    src = files.select("file_id", "payload")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, payload in zip(pdf["file_id"], pdf["payload"]):
                for r in warc_demux(bytes(payload)):
                    rows.append(
                        (
                            int(fid),
                            r.offset,
                            r.length,
                            r.warc_type,
                            r.record_id,
                            r.warc_date,
                            r.target_uri,
                            r.content_type,
                            r.content_length,
                            r.http_status,
                            r.http_content_type,
                            r.body,
                            r.error,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORDS_SCHEMA.fields]
            )

    return src.mapInPandas(work, schema=WARC_RECORDS_SCHEMA)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Crawl records → the documents shape every text operator consumes:
    clean-parsed 200 text/html responses through the pinned tag-strip tier
    (:func:`~.web.html_text`) and URL canonicalization — scan-stage column
    algebra on top of the demux flat-map, still zero exchanges."""
    from .web import canonical_url, html_text

    good = records.where(
        (F.col("parse_error").isNull())
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").startswith("text/html")
    )
    html = F.decode(F.col("body"), "UTF-8")
    return good.select(
        F.col("record_id"),
        F.col("target_uri").alias("url"),
        canonical_url(F.col("target_uri")).alias("canonical_url"),
        html_text(html).alias("text"),
        F.col("file_id"),
        F.col("record_offset"),
        F.col("record_length"),
    )


def wet_record(
    doc_id: int, target_uri: str, text: str, warc_date: str = WARC_DATE
) -> bytes:
    """One WET-style ``conversion`` record (Common Crawl's pre-extracted
    plain-text sibling of the WARC response: same framing, text/plain
    block, no HTTP envelope)."""
    return warc_record(
        "conversion",
        doc_record_uuid(doc_id),
        text.encode("utf-8"),
        target_uri=target_uri,
        content_type="text/plain",
    )


def wet_to_documents(records: DataFrame) -> DataFrame:
    """WET conversion records → the documents shape: the text IS the
    block (no HTTP parse, no tag strip) — the fast path when the crawl
    provider already ran extraction. Same scan-stage column algebra as
    :func:`warc_to_documents`, zero exchanges."""
    from .web import canonical_url

    good = records.where(
        (F.col("parse_error").isNull())
        & (F.col("warc_type") == "conversion")
        & F.col("content_type").startswith("text/plain")
    )
    return good.select(
        F.col("record_id"),
        F.col("target_uri").alias("url"),
        canonical_url(F.col("target_uri")).alias("canonical_url"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
        F.col("file_id"),
        F.col("record_offset"),
        F.col("record_length"),
    )
