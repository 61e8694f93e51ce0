"""Reference-protocol parity for the updater hold-back collector.

VERDICT r8 ask #2: the stateful collector (streaming/stateful.py) was the
one major component whose oracle was still the builder's own closed form.
This module replays the SAME arrival log through

1. the reference updater's drain rule on live PostgreSQL — the per-cycle
   scan of `fetchers/ws/updater.py:160-185` transcribed into SQL over a
   ``sub_hash`` table (the Redis hash: one row per (key, candle ts),
   arrivals REPLACE via upsert = ``hset``), the bulk insert executed via
   the reference's VERBATIM ``PSQL_INSERT_IGNOREDUP_QUERY`` template
   (`fetchers/config/queries.py:4`, extracted at runtime) against the
   reference's VERBATIM ``ohlcvs`` DDL + PK (`create.sql:12-22,53-55`),
   and the drained rows ``hdel``-ed exactly like the updater; and

2. the engine's collector in reference-protocol mode
   (``_flush_fn(late_policy='emit')``), one invocation per key per cycle
   (data invocation for keys with arrivals, timeout invocation for idle
   keys — the updater visits EVERY subscribed key each cycle), emissions
   folded first-wins per (key, bucket) — the downstream idempotent sink's
   ``ON CONFLICT DO NOTHING``;

then diffs the full inserted-table state CYCLE BY CYCLE plus the held
(hash/state) content at the end. Scenarios cover the drain rule's whole
truth table: steady one-per-cycle arrivals, a multi-candle burst, a LATE
never-seen candle older than an already-inserted one (the case the
default drop mode intentionally refuses — pinned in its own test), a
replay of an already-inserted candle (PK DO NOTHING on both sides), the
held-over-threshold stale flush timed to the cycle clock, and an
arriving-already-ancient candle (flushes the same cycle it arrives).

The drain-rule SQL is a transcription (the reference's protocol lives in
Python over Redis — there is no reference SQL to execute for it), but
the insert semantics, conflict handling, NUMERIC arithmetic, and PK are
PostgreSQL's own executor running the reference's own statement text.
"""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd
import pytest

from tests.pgtools import REF_ROLE_SQL, _fetch, _psql, _psql_ref

REF_ROOT = "/root/reference"
CREATE_SQL = os.path.join(REF_ROOT, "scripts/database/init/create.sql")
QUERIES_PY = os.path.join(REF_ROOT, "fetchers/config/queries.py")

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(CREATE_SQL) and os.path.isfile(QUERIES_PY)),
    reason="reference tree not present",
)

#: simulated updater clock: cycles 10 s apart (UPDATE_FREQUENCY_SECS,
#: `updater.py:29`); threshold scaled down from the reference's 1 h so the
#: stale rule fires inside a 6-cycle replay — the RULE (strict >, candle
#: EVENT ts vs the updater clock) is what parity pins, not the constant
CYCLE_MS = 10_000
THRESH_MS = 25_000

#: epoch minute of m(0) — year 2023, so to_timestamp arithmetic is modern
M0 = 28_000_000


def _min_ms(i: int) -> int:
    return (M0 + i) * 60_000


#: arrival log: cycle -> [(key, minute_index, price, volume)]; the engine
#: feeds one TICK at the minute start per arrival (so the aggregated
#: candle equals the reference's candle value exactly: o=h=l=c=price) and
#: the PG side upserts the equivalent candle row into the sub hash.
#: Scenario keys double as exchange names; base/quote fixed.
ARRIVALS: dict[int, list[tuple[str, int, float, float]]] = {
    0: [
        ("steady", 0, 1.5, 0.25),
        ("late", 5, 3.5, 1.25),
        ("replay", 0, 7.25, 2.5),
        ("stale", 0, 9.75, 4.25),
    ],
    1: [
        ("steady", 1, 1.75, 0.5),
        ("burst", 0, 2.25, 0.75),
        ("burst", 1, 2.5, 1.0),
        ("burst", 2, 2.75, 1.5),
        ("late", 6, 3.75, 1.75),
        ("replay", 1, 7.5, 2.75),
    ],
    2: [
        ("steady", 2, 2.0, 0.75),
        # never-seen minute m3, OLDER than late's already-inserted m5
        ("late", 3, 4.0, 2.0),
        # exact replay of replay/m0 (already inserted at cycle 1)
        ("replay", 0, 7.25, 2.5),
        # arrives already ancient: 100 minutes old -> stale the same cycle
        ("freshstale", -100, 5.5, 3.0),
    ],
    3: [],
    4: [],
    5: [],
}
N_CYCLES = 6
KEYS = sorted({k for rows in ARRIVALS.values() for k, *_ in rows})


def _now_ms(cycle: int) -> int:
    # the updater clock: 5 s past m(0)'s start at cycle 0, +10 s per cycle.
    # stale/m0 (event ts = m(0)) crosses the strict > 25 s threshold at
    # cycle 3 (35 s), NOT at cycle 2 (exactly 25 s — strict inequality)
    return _min_ms(0) + 5_000 + cycle * CYCLE_MS


# --- reference-text extraction (executed, never stored) -------------------


def _table_ddl(text: str, name: str) -> str:
    m = re.search(
        rf"CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\s+{name}\s*\(.*?\);", text, re.I | re.S
    )
    assert m, f"table {name} not found in create.sql"
    return m.group(0)


def _pk_ddl(text: str, name: str) -> str:
    m = re.search(
        rf"ALTER\s+TABLE\s+{name}\s+ADD\s+PRIMARY\s+KEY[^;]*;", text, re.I | re.S
    )
    assert m, f"primary key for {name} not found in create.sql"
    return m.group(0)


def _ignoredup_template(text: str) -> str:
    m = re.search(r'PSQL_INSERT_IGNOREDUP_QUERY\s*=\s*"(.*?)"', text)
    assert m, "PSQL_INSERT_IGNOREDUP_QUERY not found in queries.py"
    return m.group(1)


# --- PG harness (shared: tests/pgtools.py) ------------------------------


SUB_HASH_DDL = """
CREATE TABLE sub_hash (
    exchange VARCHAR(100) NOT NULL,
    base_id VARCHAR(20) NOT NULL,
    quote_id VARCHAR(20) NOT NULL,
    ts_ms BIGINT NOT NULL,
    open NUMERIC NOT NULL,
    high NUMERIC NOT NULL,
    low NUMERIC NOT NULL,
    close NUMERIC NOT NULL,
    volume NUMERIC NOT NULL,
    PRIMARY KEY (exchange, base_id, quote_id, ts_ms)
);
"""

# the updater's per-cycle scan, transcribed (updater.py:160-185): a key
# with >1 held candles drains all but its newest; a key with exactly one
# drains it iff the candle's EVENT ts is strictly more than the threshold
# behind the updater clock. ORDER matches sorted(data.keys()).
DRAIN_SQL = """
WITH stats AS (
    SELECT exchange, base_id, quote_id, count(*) AS n, max(ts_ms) AS mx
    FROM sub_hash GROUP BY exchange, base_id, quote_id
)
SELECT h.exchange, h.base_id, h.quote_id, h.ts_ms,
       h.open, h.high, h.low, h.close, h.volume
FROM sub_hash h JOIN stats s USING (exchange, base_id, quote_id)
WHERE (s.n > 1 AND h.ts_ms < s.mx)
   OR (s.n = 1 AND {now_ms} - h.ts_ms > {thresh})
ORDER BY h.exchange, h.base_id, h.quote_id, h.ts_ms
"""


def _pg_apply_arrivals(conninfo, rows) -> None:
    if not rows:
        return
    vals = ", ".join(
        f"('{k}', 'b', 'q', {_min_ms(i)}, {p!r}, {p!r}, {p!r}, {p!r}, {v!r})"
        for k, i, p, v in rows
    )
    # hset: REPLACE the value at (key, ts)
    _psql(
        conninfo,
        f"INSERT INTO sub_hash VALUES {vals} "
        "ON CONFLICT (exchange, base_id, quote_id, ts_ms) DO UPDATE SET "
        "open = EXCLUDED.open, high = EXCLUDED.high, low = EXCLUDED.low, "
        "close = EXCLUDED.close, volume = EXCLUDED.volume;",
    )


def _pg_drain_cycle(conninfo, insert_template: str, now_ms: int) -> None:
    drained = _fetch(
        conninfo, DRAIN_SQL.format(now_ms=now_ms, thresh=THRESH_MS)
    )
    if drained:
        # the reference's own bulk-insert statement text, VALUES rendered
        # in make_rows_insert's column order (updater.py:69-90 = DDL order)
        vals = ", ".join(
            f"(to_timestamp({int(r[3])} / 1000.0), '{r[0]}', '{r[1]}', "
            f"'{r[2]}', {r[4]}, {r[5]}, {r[6]}, {r[7]}, {r[8]})"
            for r in drained
        )
        _psql_ref(
            conninfo,
            insert_template.replace("{table}", "ohlcvs").replace("%s", vals),
        )
        keys = ", ".join(
            f"('{r[0]}', '{r[1]}', '{r[2]}', {int(r[3])})" for r in drained
        )
        # hdel / key delete
        _psql(
            conninfo,
            f"DELETE FROM sub_hash WHERE "
            f"(exchange, base_id, quote_id, ts_ms) IN ({keys});",
        )


def _pg_table(conninfo) -> dict:
    return {
        (r[0], int(r[1])): tuple(float(v) for v in r[2:])
        for r in _fetch(
            conninfo,
            "SELECT exchange, (extract(epoch FROM time) * 1000)::bigint, "
            "open, high, low, close, volume FROM ohlcvs",
        )
    }


def _pg_held(conninfo) -> dict:
    return {
        (r[0], int(r[1])): tuple(float(v) for v in r[2:])
        for r in _fetch(
            conninfo,
            "SELECT exchange, ts_ms, open, high, low, close, volume "
            "FROM sub_hash",
        )
    }


# --- engine side ----------------------------------------------------------


class _FakeState:
    """Minimal GroupState stand-in (same shape as test_streaming's)."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def setTimeoutDuration(self, ms):
        pass


def _tick_frame(rows) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "ts": pd.to_datetime([_min_ms(i) * 1_000_000 for _, i, _, _ in rows], unit="ns"),
            "price": [p for _, _, p, _ in rows],
            "volume": [v for _, _, _, v in rows],
        }
    )


def _engine_cycle(states, table, cycle: int) -> None:
    from coin_for_rich_spark.streaming.stateful import _flush_fn

    now = _now_ms(cycle)
    by_key: dict[str, list] = {}
    for row in ARRIVALS.get(cycle, []):
        by_key.setdefault(row[0], []).append(row)
    for key in KEYS:
        st = states[key]
        rows = by_key.get(key)
        if rows:
            st.hasTimedOut = False
            chunks = iter([_tick_frame(rows)])
        elif st.exists:
            # idle-key cycle visit (the updater scans every subscribed key)
            st.hasTimedOut = True
            chunks = iter([])
        else:
            continue
        for frame in _flush_fn(
            (key,),
            chunks,
            st,
            stale_ms=THRESH_MS,
            late_policy="emit",
            now_ms_fn=lambda: now,
        ):
            for r in frame.itertuples(index=False):
                k = (key, int(r.bucket.value // 1_000_000))
                # downstream idempotent sink: ON CONFLICT DO NOTHING
                table.setdefault(
                    k, (r.open, r.high, r.low, r.close, r.volume)
                )


def _engine_held(states) -> dict:
    held = {}
    for key, st in states.items():
        if not st.exists:
            continue
        minutes, o_ts, o_v, hi, lo, c_ts, c_v, vc, n, _e = st.get
        for j, m in enumerate(minutes):
            held[(key, m * 60_000)] = (
                o_v[j], hi[j], lo[j], c_v[j], vc[j] / 100.0
            )
    return held


# --- the parity test ------------------------------------------------------


@pytest.fixture(scope="module")
def pg():
    from coin_for_rich_spark.streaming.pgserver import pg_runnable, start_cluster

    if not pg_runnable():
        pytest.skip("no runnable PostgreSQL server in this environment")
    conninfo, stop = start_cluster(tempfile.mkdtemp(prefix="cfr_updpar_"))
    try:
        create_sql = open(CREATE_SQL).read()
        _psql(conninfo, REF_ROLE_SQL)
        _psql_ref(conninfo, _table_ddl(create_sql, "ohlcvs"))
        _psql_ref(conninfo, _pk_ddl(create_sql, "ohlcvs"))
        _psql(conninfo, SUB_HASH_DDL)
        yield conninfo
    finally:
        stop()


def test_updater_protocol_cycle_by_cycle(pg):
    """Replay the arrival log through both sides; the inserted table must
    match after EVERY cycle (not just at the end — emission TIMING is the
    protocol), and the held hash/state must match at the end."""
    insert_template = _ignoredup_template(open(QUERIES_PY).read())
    assert "ON CONFLICT DO NOTHING" in insert_template

    states = {k: _FakeState() for k in KEYS}
    engine_table: dict = {}

    for cycle in range(N_CYCLES):
        _pg_apply_arrivals(pg, ARRIVALS.get(cycle, []))
        _pg_drain_cycle(pg, insert_template, _now_ms(cycle))
        _engine_cycle(states, engine_table, cycle)

        pg_table = _pg_table(pg)
        assert set(pg_table) == set(engine_table), (
            f"cycle {cycle}: inserted key sets diverge\n"
            f"  only reference: {sorted(set(pg_table) - set(engine_table))}\n"
            f"  only engine: {sorted(set(engine_table) - set(pg_table))}"
        )
        for k, pv in pg_table.items():
            assert pv == pytest.approx(engine_table[k], abs=1e-9), (
                f"cycle {cycle}: {k}: reference {pv} vs engine {engine_table[k]}"
            )

    # protocol checkpoints (guard the fixture itself against dilution):
    # the late never-seen m3 WAS inserted, after m5/m6 closed above it
    assert ("late", _min_ms(3)) in engine_table
    # the stale candle force-flushed at cycle 3 (strict > threshold)
    assert ("stale", _min_ms(0)) in engine_table
    # the ancient candle flushed the cycle it arrived
    assert ("freshstale", _min_ms(-100)) in engine_table
    # replay kept the FIRST inserted values
    assert engine_table[("replay", _min_ms(0))][0] == pytest.approx(7.25)

    # final held content: Redis hash == collector state, value-identical
    eng_held = _engine_held(states)
    pg_held = {(k[0], k[1]): v for k, v in _pg_held(pg).items()}
    assert set(pg_held) == set(eng_held), (pg_held.keys(), eng_held.keys())
    for k, pv in pg_held.items():
        assert pv == pytest.approx(eng_held[k], abs=1e-9), (k, pv, eng_held[k])
    # steady/burst/late still hold their newest candle; stale keys drained
    assert {k for k, _ in eng_held} == {"steady", "burst", "late", "replay"}


def test_drop_mode_refuses_late_never_seen_minute():
    """The documented divergence that makes 'emit' mode exist: the default
    drop mode suppresses a never-seen minute BELOW the key's emit-once
    watermark (append-sink safety), where the reference protocol inserts
    it (its dedup is the DB PK). Pin both behaviors so the contract is a
    choice, not an accident."""
    from coin_for_rich_spark.streaming.stateful import _flush_fn

    for policy, expect_m3 in (("drop", False), ("emit", True)):
        st = _FakeState()
        emitted = []

        def run(rows):
            st.hasTimedOut = False
            for frame in _flush_fn(
                ("k",), iter([_tick_frame(rows)]), st,
                stale_ms=THRESH_MS, late_policy=policy,
                now_ms_fn=lambda: _now_ms(0),
            ):
                emitted.extend(
                    int(b.value // 1_000_000) for b in frame["bucket"]
                )

        run([("k", 5, 1.0, 1.0)])
        run([("k", 6, 2.0, 1.0)])  # closes m5 -> watermark m5
        run([("k", 3, 3.0, 1.0)])  # never-seen m3, below the watermark
        assert (_min_ms(3) in emitted) == expect_m3, (policy, emitted)
