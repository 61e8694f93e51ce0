"""Result-cache TTL contract pins (plans/cache.py) — the dogpile/Redis
region twin (reference ``web/db/session.py:24-38`` configuration,
``web/routes/api/rest/utils/caching.py`` ORMCache): 2-hour hard TTL,
read-through get_or_create, stampede protection under the distributed
lock, invalidate, and the NO_VALUE→KeyError escalation."""

from __future__ import annotations

import pytest

from coin_for_rich_spark.plans.cache import (
    DEFAULT_HARD_TTL_S,
    NO_VALUE,
    ResultCacheRegion,
    WouldBlock,
    orm_cache_get,
)


def _creator_counter():
    calls = []

    def creator():
        calls.append(1)
        return f"v{len(calls)}"

    return creator, calls


def test_reference_hard_ttl_is_two_hours():
    assert DEFAULT_HARD_TTL_S == 7200  # session.py:31 redis_expiration_time


def test_read_through_hit_until_hard_ttl():
    r = ResultCacheRegion()
    creator, calls = _creator_counter()
    v, outcome = r.get_or_create("k", creator, now=0.0)
    assert (v, outcome, len(calls)) == ("v1", "created", 1)
    # hits for the whole 2 h window — creator never re-runs
    for t in (1.0, 3600.0, 7200.0):
        v, outcome = r.get_or_create("k", creator, now=t)
        assert (v, outcome) == ("v1", "hit")
    assert len(calls) == 1
    # strictly past the hard TTL Redis has evicted: full re-create
    v, outcome = r.get_or_create("k", creator, now=7200.01)
    assert (v, outcome, len(calls)) == ("v2", "created", 2)


def test_soft_expiration_refreshes():
    """A route passing FromCache(expiration_time=60) regenerates after
    60 s even though Redis still holds the value."""
    r = ResultCacheRegion()
    creator, calls = _creator_counter()
    r.get_or_create("k", creator, now=0.0, expiration_time=60.0)
    v, outcome = r.get_or_create("k", creator, now=30.0, expiration_time=60.0)
    assert (v, outcome) == ("v1", "hit")
    v, outcome = r.get_or_create("k", creator, now=61.0, expiration_time=60.0)
    assert (v, outcome, len(calls)) == ("v2", "refreshed", 2)


def test_dogpile_protection_serves_stale_under_lock():
    """distributed_lock=True: while a peer regenerates a soft-expired
    key, concurrent readers get the STALE value, not a stampede."""
    r = ResultCacheRegion()
    creator, calls = _creator_counter()
    r.get_or_create("k", creator, now=0.0, expiration_time=10.0)
    with r.holding_creation_lock("k"):
        v, outcome = r.get_or_create(
            "k", creator, now=20.0, expiration_time=10.0
        )
    assert (v, outcome, len(calls)) == ("v1", "stale", 1)
    # lock released, nobody refreshed: next caller regenerates
    v, outcome = r.get_or_create("k", creator, now=21.0, expiration_time=10.0)
    assert (v, outcome, len(calls)) == ("v2", "refreshed", 2)


def test_miss_under_held_lock_would_block():
    """A true miss with the creation lock held has no stale value to
    serve — dogpile blocks; the twin surfaces it loudly."""
    r = ResultCacheRegion()
    creator, _ = _creator_counter()
    with r.holding_creation_lock("k"):
        with pytest.raises(WouldBlock):
            r.get_or_create("k", creator, now=0.0)


def test_invalidate_deletes():
    r = ResultCacheRegion()
    creator, calls = _creator_counter()
    r.get_or_create("k", creator, now=0.0)
    r.delete("k")  # ORMCache.invalidate -> region.delete
    v, outcome = r.get_or_create("k", creator, now=1.0)
    assert (v, outcome, len(calls)) == ("v2", "created", 2)


def test_ignore_expiration_get_and_keyerror_escalation():
    r = ResultCacheRegion()
    creator, _ = _creator_counter()
    r.get_or_create("k", creator, now=0.0)
    # ignore_expiration returns a soft-expired value...
    assert orm_cache_get(r, "k", now=1000.0, expiration_time=60.0) == "v1"
    # ...but not a hard-evicted one; absence escalates to KeyError
    # (caching.py:55-57)
    with pytest.raises(KeyError):
        orm_cache_get(r, "k", now=7200.02)
    assert r.get("missing", now=0.0) is NO_VALUE


def test_keys_are_independent():
    r = ResultCacheRegion()
    c1, _ = _creator_counter()
    c2, _ = _creator_counter()
    r.get_or_create(("q", 1), c1, now=0.0)
    with r.holding_creation_lock(("q", 1)):
        # a held lock on one key never affects another
        v, outcome = r.get_or_create(("q", 2), c2, now=0.0)
    assert outcome == "created"
