"""Result-cache TTL contract — a deterministic clock-injected twin of the
reference's dogpile/Redis read-through cache for REST query results
(``web/db/session.py:24-38``: ``make_region().configure('dogpile.cache.
redis', redis_expiration_time=2h, distributed_lock=True)``;
``web/routes/api/rest/utils/caching.py:23-66`` ``ORMCache``), closing the
r13 VERDICT's reference-parity delta #2 the same way the ServeLoop twin
closed #1 and the ratelimit twins closed #3: the Redis region is shared
mutable state polled by request handlers, but the CONTRACT — which reads
hit, which regenerate, which serve stale, and when entries vanish — is a
pure function of (store, now), so it pins without Redis or threads.

Semantics kept from dogpile + the reference's configuration:

- ``redis_expiration_time`` is a HARD TTL (2 h in the reference): Redis
  evicts the value physically; a read past it is a miss, full stop.
- the region sets NO soft ``expiration_time``, so per-query freshness
  comes from the ``FromCache`` option's ``expiration_time`` when a route
  passes one — modeled as the per-call argument, exactly like
  ``caching.py:48-53`` forwards it to ``get_or_create``.
- dogpile protection (``distributed_lock=True``): when a value is
  soft-expired, ONE caller wins the creation lock and regenerates; every
  concurrent caller is served the STALE value rather than stampeding the
  database.
- ``ORMCache.invalidate`` → ``region.delete`` (``caching.py:69-80``).
- a bare ``get(..., ignore_expiration=True)`` that finds nothing is the
  reference's ``NO_VALUE`` branch, which ``ORMCache`` escalates to
  ``KeyError`` (``caching.py:55-57``) — pinned as-is.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

DEFAULT_HARD_TTL_S = 2 * 60 * 60  # the reference's redis_expiration_time

# sentinel mirroring dogpile.cache.api.NO_VALUE
NO_VALUE = object()


@dataclass
class ResultCacheRegion:
    """The region twin. All methods take ``now`` (seconds, any epoch);
    nothing reads a wall clock."""

    hard_ttl_s: float = DEFAULT_HARD_TTL_S
    _store: dict = field(default_factory=dict, repr=False)  # key -> (value, created_at)
    _locks: set = field(default_factory=set, repr=False)

    # -- internals ---------------------------------------------------
    def _live(self, key: Any, now: float) -> tuple[Any, float] | None:
        """Entry if Redis would still hold it (hard TTL not yet passed);
        physically drops evicted entries like Redis would."""
        ent = self._store.get(key)
        if ent is None:
            return None
        if now - ent[1] > self.hard_ttl_s:
            del self._store[key]
            return None
        return ent

    # -- dogpile surface ---------------------------------------------
    def get(
        self, key: Any, now: float, ignore_expiration: bool = False,
        expiration_time: float | None = None,
    ) -> Any:
        """``region.get`` (the ``FromCache.ignore_expiration`` path,
        ``caching.py:39-44``): returns NO_VALUE on a miss; with
        ``ignore_expiration`` a soft-expired value is still returned
        (the hard TTL always applies — Redis has already evicted)."""
        ent = self._live(key, now)
        if ent is None:
            return NO_VALUE
        if (
            not ignore_expiration
            and expiration_time is not None
            and now - ent[1] > expiration_time
        ):
            return NO_VALUE
        return ent[0]

    def get_or_create(
        self,
        key: Any,
        creator: Callable[[], Any],
        now: float,
        expiration_time: float | None = None,
    ) -> tuple[Any, str]:
        """``region.get_or_create`` with dogpile protection. Returns
        (value, outcome), outcome ∈ {'hit', 'created', 'refreshed',
        'stale'}:

        - fresh value → ('hit'): no creator call, no lock.
        - absent / hard-evicted → creator runs ('created'); if another
          caller holds the creation lock, there is no stale value to
          serve — dogpile BLOCKS that caller until the lock frees; the
          twin surfaces the same situation as a WouldBlock error so a
          test can't silently mis-pin it.
        - soft-expired, lock free → this caller takes the lock, creator
          runs, value replaced ('refreshed').
        - soft-expired, lock HELD (see :meth:`holding_creation_lock`) →
          the stale value is served unchanged ('stale') — the stampede
          protection the reference turns on with distributed_lock=True.
        """
        ent = self._live(key, now)
        soft_expired = (
            ent is not None
            and expiration_time is not None
            and now - ent[1] > expiration_time
        )
        if ent is not None and not soft_expired:
            return ent[0], "hit"
        if key in self._locks:
            if ent is None:
                raise WouldBlock(
                    f"creation lock for {key!r} held and no stale value "
                    "to serve — dogpile would block this caller"
                )
            return ent[0], "stale"
        self._locks.add(key)
        try:
            value = creator()
            self._store[key] = (value, now)
        finally:
            self._locks.discard(key)
        return value, "created" if ent is None else "refreshed"

    def delete(self, key: Any) -> None:
        """``region.delete`` — the ``ORMCache.invalidate`` backend
        (``caching.py:69-80``)."""
        self._store.pop(key, None)

    # -- concurrency simulation hooks --------------------------------
    def holding_creation_lock(self, key: Any):
        """Context manager simulating another process holding the
        distributed creation lock for ``key`` (what Redis's lock does
        while a peer's creator runs)."""
        region = self

        class _Hold:
            def __enter__(self):
                region._locks.add(key)
                return self

            def __exit__(self, *exc):
                region._locks.discard(key)
                return False

        return _Hold()


class WouldBlock(RuntimeError):
    """Raised where real dogpile would block the caller on the
    distributed lock (miss with the lock held): surfacing the block as
    an error keeps the twin deterministic instead of pretending a value
    existed."""


def orm_cache_get(
    region: ResultCacheRegion,
    key: Any,
    now: float,
    expiration_time: float | None = None,
) -> Any:
    """The ``ORMCache._do_orm_execute`` ignore_expiration branch
    (``caching.py:39-44,55-57``): a NO_VALUE result escalates to
    ``KeyError`` — the reference comments "this is bigger than a
    keyerror..." and raises exactly that."""
    value = region.get(
        key, now, ignore_expiration=True, expiration_time=expiration_time
    )
    if value is NO_VALUE:
        raise KeyError(key)
    return value
