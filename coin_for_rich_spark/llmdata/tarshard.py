"""Tar shard export — the training-side boundary: packed corpora ship to
trainers as size-balanced tar shards of grouped sample files (the
WebDataset layout: ``<key>.json`` + ``<key>.txt`` members per sample,
thousands of samples per shard, shards streamed sequentially by data
loaders). This module writes REAL ustar bytes and indexes them back, the
same mux→demux honesty contract as the mp4/WARC containers.

Reference anchor: the reference's export surface is COPY-to-Postgres
(`dbmodels/crypto_data.py` bulk load); a training pipeline's equivalent
"hand the data to the next system" boundary is shard files, so this tier
is part of the SURVEY §6 expansion mandate (training-data pipeline ops),
not a port of a reference operator.

Layout contract (the formula oracle depends on it):

- ustar header: 512 bytes — name (``%012d.json`` / ``%012d.txt`` from the
  doc id), mode 0644, uid/gid 0, mtime 0 (deterministic bytes — a shard
  rewritten by a retried task must be byte-identical), checksum, type '0',
  magic ``ustar\\x00 00``.
- each member: header block + ceil(size/512) data blocks (zero-padded).
- members ordered by (doc_id, ".json" before ".txt"); docs ordered by id
  within a shard; ``shard_id = doc_id // docs_per_shard``.
- archive end: two zero blocks, then zero-pad to the 10240-byte record
  size (GNU/POSIX default — what ``tarfile`` writes and readers expect).

Every offset is therefore closed-form integer algebra over byte lengths:
``blocks(b) = 1 + (b + 511) // 512``, offsets are 512·(cumulative
blocks), shard bytes are ``roundup(512·Σblocks + 1024, 10240)`` — a SQL
window sum, which is exactly what the DuckDB twin computes while the
engine must arrive at the same integers by WALKING THE REAL TAR BYTES.

Scale posture: the plan is pure column algebra (one window over the
shard's members — no corpus-global state); the writer is one
``applyInPandas`` per shard (the shuffle that CO-LOCATES a shard is the
operator's semantic — a shard is by definition one file's worth of rows
in one place); the indexer is map-only over shard bytes. Shard payloads
are bounded by ``docs_per_shard`` — the knob that keeps one shard's
bytes inside one executor's memory at any corpus size (WebDataset
practice: ~1 GB shards).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BLOCK = 512
_RECORD = 10240  # tar "record" (padding unit)


# ----------------------------------------------------------- pure tar layer


def tar_header(name: str, size: int, mtime: int = 0) -> bytes:
    """One deterministic 512-byte ustar header (mode 0644, uid/gid 0)."""
    if len(name.encode("utf-8")) > 100:
        raise ValueError(f"member name over ustar's 100 bytes: {name!r}")
    h = bytearray(_BLOCK)
    h[0 : len(name)] = name.encode("utf-8")
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode("ascii")
    h[136:148] = f"{mtime:011o}\x00".encode("ascii")
    h[148:156] = b" " * 8  # checksum computed over spaces
    h[156] = ord("0")  # regular file
    h[257:265] = b"ustar\x0000"
    chksum = sum(h)
    h[148:156] = f"{chksum:06o}\x00 ".encode("ascii")
    return bytes(h)


def tar_archive(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize (name, payload) members into one deterministic tar."""
    out = bytearray()
    for name, payload in members:
        out += tar_header(name, len(payload))
        out += payload
        pad = -len(payload) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    out += b"\x00" * (-len(out) % _RECORD)
    return bytes(out)


def tar_index(data: bytes) -> list[tuple[str, int, int, int]]:
    """Walk real tar bytes → [(name, hdr_offset, data_offset, size)].

    Reads any ustar/GNU archive with plain regular-file members (the demux
    is checksum-verifying — a corrupt header raises rather than silently
    mis-slicing every subsequent member)."""
    out = []
    pos = 0
    while pos + _BLOCK <= len(data):
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:  # end-of-archive marker
            break
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        actual = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
        if stored != actual:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8")
        size = int(hdr[124:136].split(b"\x00")[0].strip(), 8)
        out.append((name, pos, pos + _BLOCK, size))
        pos += _BLOCK + size + (-size % _BLOCK)
    return out


# -------------------------------------------------------------- spark layer


def _member_json(doc_id: int, lang: str) -> str:
    return f'{{"doc_id":{doc_id},"lang":"{lang}"}}'


def _blocks(nbytes):  # Column → Column (integer block count: 1 hdr + data)
    # floor PER MEMBER — ceil fractions must not accumulate across the
    # json/txt pair before truncation. /512 is exact in doubles (power of
    # two), so floor() is the true integer quotient.
    return (1 + F.floor((nbytes + (_BLOCK - 1)) / _BLOCK)).cast("long")


def tar_shard_plan(
    docs: DataFrame,
    docs_per_shard: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Closed-form shard manifest: one row per tar MEMBER (json + txt per
    document) with absolute header/data offsets and the shard's total
    bytes — computed from byte-length algebra alone, never building a
    tar. This is the relation a 100 TB export job would hand to audit /
    resume logic; ``tar_shard_write`` must realize exactly these bytes.

    One window over (shard, doc order) — no corpus-global state."""
    json_str = F.concat(
        F.lit('{"doc_id":'),
        F.col(id_col).cast("string"),
        F.lit(',"lang":"'),
        F.col(lang_col),
        F.lit('"}'),
    )
    base = docs.select(
        (F.col(id_col) / docs_per_shard).cast("long").alias("shard_id"),
        F.col(id_col).alias("doc_id"),
        F.octet_length(json_str).cast("long").alias("_bj"),
        F.octet_length(F.col(text_col)).cast("long").alias("_bt"),
    )
    entry = (_blocks(F.col("_bj")) + _blocks(F.col("_bt"))).cast("long")
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = base.select(
        "shard_id",
        "doc_id",
        "_bj",
        "_bt",
        (F.lit(_BLOCK) * F.coalesce(F.sum(entry).over(w), F.lit(0)))
        .cast("long")
        .alias("_doc_off"),
        (F.lit(_BLOCK) * F.sum(entry).over(Window.partitionBy("shard_id")))
        .cast("long")
        .alias("_payload_bytes"),
    )
    # roundup(v, 10240) = v + ((-v) mod 10240) — integer algebra: 10240 is
    # not a power of two, so a double division here could land on x.99…
    # and truncate a block short
    v = F.col("_payload_bytes") + 2 * _BLOCK
    total = (v + F.pmod(-v, F.lit(_RECORD))).cast("long")
    name = F.format_string("%012d", F.col("doc_id"))
    jhdr = F.col("_doc_off")
    thdr = (
        F.col("_doc_off") + _BLOCK * _blocks(F.col("_bj")).cast("long")
    ).cast("long")
    member = F.explode(
        F.array(
            F.struct(
                F.concat(name, F.lit(".json")).alias("member_name"),
                F.col("_bj").alias("payload_bytes"),
                jhdr.alias("hdr_offset"),
            ),
            F.struct(
                F.concat(name, F.lit(".txt")).alias("member_name"),
                F.col("_bt").alias("payload_bytes"),
                thdr.alias("hdr_offset"),
            ),
        )
    )
    return laid.select(
        "shard_id", "doc_id", member.alias("m"), total.alias("shard_total_bytes")
    ).select(
        "shard_id",
        "doc_id",
        F.col("m.member_name").alias("member_name"),
        F.col("m.payload_bytes").alias("payload_bytes"),
        F.col("m.hdr_offset").alias("hdr_offset"),
        (F.col("m.hdr_offset") + _BLOCK).alias("data_offset"),
        "shard_total_bytes",
    )


TAR_SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("n_members", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

TAR_MEMBERS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("hdr_offset", T.LongType(), False),
        T.StructField("data_offset", T.LongType(), False),
        T.StructField("member_md5", T.StringType(), False),
        T.StructField("shard_total_bytes", T.LongType(), False),
    ]
)


def tar_shard_write(
    docs: DataFrame,
    docs_per_shard: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Build the REAL shard bytes: one ``applyInPandas`` per shard (the
    co-locating shuffle IS the operator), deterministic output (mtime 0,
    fixed ordering) so a retried task rewrites identical bytes — the
    idempotence every exactly-once sink in this repo leans on."""
    src = docs.select(
        (F.col(id_col) / docs_per_shard).cast("long").alias("shard_id"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
    )

    def build(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes]] = []
        for did, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            base = f"{int(did):012d}"
            members.append(
                (base + ".json", _member_json(int(did), str(lang)).encode())
            )
            members.append((base + ".txt", str(text).encode("utf-8")))
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_members": [len(members)],
                "payload": [tar_archive(members)],
            }
        )

    return src.groupBy("shard_id").applyInPandas(build, schema=TAR_SHARDS_SCHEMA)


def tar_shard_members(shards: DataFrame) -> DataFrame:
    """Index REAL shard bytes back to per-member rows (map-only
    ``mapInPandas`` — the audit leg that certifies the writer against the
    closed-form plan)."""
    import hashlib

    src = shards.select("shard_id", "payload")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                data = bytes(payload)
                for name, hoff, doff, size in tar_index(data):
                    rows.append(
                        (
                            int(sid),
                            name,
                            size,
                            hoff,
                            doff,
                            hashlib.md5(data[doff : doff + size]).hexdigest(),
                            len(data),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TAR_MEMBERS_SCHEMA.fields]
            )

    return src.mapInPandas(work, schema=TAR_MEMBERS_SCHEMA)


def write_tar_shards(
    docs: DataFrame,
    out_dir: str,
    docs_per_shard: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Materialize the shards as REAL ``shard-%08d.tar`` files under
    ``out_dir`` and return the per-member manifest (read back from the
    bytes just written — the audit leg runs on what actually landed).

    Idempotence contract (the exactly-once discipline of the repo's
    sinks): shard bytes are deterministic (see :func:`tar_shard_write`),
    the file name is a pure function of the shard id, and the write is
    write-to-temp + atomic rename — a retried or re-run task replaces a
    shard with byte-identical content instead of appending or corrupting
    a half-written file. Readers never observe a partial shard.

    Scale posture: each shard is written by the executor that built it
    (one os-level write per applyInPandas group — no driver collect); at
    cluster scale ``out_dir`` is an object-store prefix and the
    temp+rename becomes the store's atomic-put, with the manifest
    relation (this function's return value) as the export's commit
    record.
    """
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    shards = tar_shard_write(
        docs, docs_per_shard, id_col=id_col, text_col=text_col, lang_col=lang_col
    )

    def land(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, n, payload in zip(
                pdf["shard_id"], pdf["n_members"], pdf["payload"]
            ):
                final = os.path.join(out_dir, f"shard-{int(sid):08d}.tar")
                tmp = final + f".tmp-{uuid.uuid4().hex}"
                with open(tmp, "wb") as fh:
                    fh.write(bytes(payload))
                os.replace(tmp, final)
                rows.append((int(sid), int(n), final, len(bytes(payload))))
            yield pd.DataFrame(
                rows, columns=["shard_id", "n_members", "path", "total_bytes"]
            )

    landed = shards.mapInPandas(
        land,
        schema=(
            "shard_id long, n_members int, path string, total_bytes long"
        ),
    )
    # force the writes, then index what LANDED (not what was planned)
    landed.collect()
    spark = docs.sparkSession
    paths = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("shard-") and f.endswith(".tar")
    )
    files = spark.read.format("binaryFile").load(paths)
    on_disk = files.select(
        F.regexp_extract(F.col("path"), r"shard-(\d+)\.tar", 1)
        .cast("long")
        .alias("shard_id"),
        F.col("content").alias("payload"),
    )
    return tar_shard_members(on_disk)
