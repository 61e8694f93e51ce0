"""Foreign-writer twins of a dataset — identical VALUES, parquet written
by OTHER writers. The reader-robustness axis of the gate family.

Every prior axis reads parquet this repo's own Spark session wrote, so
one deployment reality stays untested: at 100 TB the lake is written by
whatever produced the data — DuckDB exports, pandas/pyarrow ETL jobs,
legacy Hive pipelines — with physical choices Spark's writer never makes.
``load_table``'s contract (sources/tables.py: every declared time column
normalized to TimestampType for ANY physical encoding) is the seam this
axis probes, query-by-query, against the same DuckDB oracles reading the
same foreign files.

Two twins, from the driver's correctness sf (sf0.01):

- ``.scale/foreign_duckdb`` — every table re-written by DuckDB's parquet
  writer (``COPY ... TO``): ZSTD compression, a row-group size chosen to
  force several row groups per table, DuckDB's own statistics/encoding
  choices, TIMESTAMP as int64-µs with isAdjustedToUTC unset.
- ``.scale/foreign_arrow`` — every table re-written by pyarrow with the
  most hostile widely-deployed legacy options: INT96 timestamps (the
  pre-2.0 Impala/Hive convention — a FOURTH physical time encoding beyond
  the three the loader already pins), format version 1.0, gzip, data page
  v1, dictionary encoding on, and small row groups.

Values and row multiplicity are untouched — the gate then asserts, for
all 50 declared queries, that engine and oracle agree on the foreign
bytes exactly as they do on the canonical ones:

    python scripts/foreign_data.py
    python scripts/scale_gate.py --dir .scale/foreign_duckdb
    python scripts/scale_gate.py --dir .scale/foreign_arrow
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_FOREIGN_SRC", "/root/testdata/sf0.01")
OUT_DUCK = os.path.join(REPO, ".scale", "foreign_duckdb")
OUT_ARROW = os.path.join(REPO, ".scale", "foreign_arrow")
_VERSION = "foreign-v1"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _ident() -> str:
    h = hashlib.md5(_VERSION.encode())
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def _fresh(out_dir: str, ident: str) -> bool:
    marker = os.path.join(out_dir, "_ident.txt")
    if os.path.isfile(marker):
        with open(marker) as fh:
            return fh.read() == ident
    return False


def _mark(out_dir: str, ident: str) -> None:
    with open(os.path.join(out_dir, "_ident.txt"), "w") as fh:
        fh.write(ident)


def build_duckdb(ident: str) -> None:
    import duckdb

    if _fresh(OUT_DUCK, ident):
        print(f"up to date: {OUT_DUCK}", file=sys.stderr)
        return
    os.makedirs(OUT_DUCK, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(OUT_DUCK, f"{t}.parquet")
        # row-group size ~1/5 of the table forces several row groups even
        # on the small tables; ZSTD is a codec Spark's writer here never
        # emits (it writes snappy)
        n = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        rg = max(1, n // 5)
        con.execute(
            f"COPY (SELECT * FROM '{src}') TO '{dst}' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE {rg})"
        )
        print(f"duckdb-wrote {t} ({n} rows, rg={rg})", file=sys.stderr)
    _mark(OUT_DUCK, ident)


def build_arrow(ident: str) -> None:
    import pyarrow.parquet as pq

    if _fresh(OUT_ARROW, ident):
        print(f"up to date: {OUT_ARROW}", file=sys.stderr)
        return
    os.makedirs(OUT_ARROW, exist_ok=True)
    for t in TABLES:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(OUT_ARROW, f"{t}.parquet")
        tbl = pq.read_table(src)
        pq.write_table(
            tbl,
            dst,
            version="1.0",
            use_deprecated_int96_timestamps=True,
            compression="gzip",
            use_dictionary=True,
            data_page_version="1.0",
            row_group_size=max(1, tbl.num_rows // 5),
        )
        print(f"arrow-wrote {t} ({tbl.num_rows} rows)", file=sys.stderr)
    _mark(OUT_ARROW, ident)


def main() -> int:
    ident = _ident()
    build_duckdb(ident)
    build_arrow(ident)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
