"""Bounded plan-keyed reuse of expensive intermediates.

The sketch-dedup and ANN families each derive a costly intermediate
(shingle posting lists, MinHash signatures, SimHash sketches, LSH
bucket flats, IVF centroids) that is read several times inside one
query AND re-derived identically on every repeated invocation — the
verification panels and any long-running service call the same
operator on the same inputs over and over.

A bare ``df.persist()`` serves the reuse but leaks: a persist with no
unpersist pins a CacheManager entry for the session's lifetime, one
per distinct input ever seen. ``localCheckpoint`` bounds storage (GC
reclaims blocks) but forfeits cross-invocation reuse — measured 2-4×
on the dedup-family headline queries, because every call re-runs the
Arrow shingling/hashing pass.

:class:`PlanMemo` keeps both properties: ``get_or_persist(df)``
returns a persisted frame for the plan, reusing the existing entry
when an equivalent plan (Catalyst canonical form, the same matching
CacheManager itself does) is already held, and EVICTS + unpersists
the least-recently-used entry beyond ``capacity`` — storage is
bounded by ``capacity × intermediate size`` per operator family, not
by the number of distinct inputs the session ever processed.

Assumption (same as every Spark cache): inputs are immutable for the
session — files rewritten under a memoized path serve stale rows
until :func:`clear_all_memos` (or per-memo ``clear``) drops the entry.
"""

from __future__ import annotations

import threading
import weakref
from collections import OrderedDict

from pyspark.sql import DataFrame

__all__ = ["PlanMemo", "clear_all_memos"]

_REGISTRY: "weakref.WeakSet[PlanMemo]" = weakref.WeakSet()


def _plan_key(df: DataFrame):
    """Semantic hash of the analyzed plan's canonical form — equal for
    plans the CacheManager would also consider equal. Falls back to
    object identity (no cross-call reuse, still bounded) if the JVM
    surface is unavailable (e.g. Spark Connect)."""
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return id(df)


class PlanMemo:
    def __init__(self, capacity: int = 2):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self._capacity = capacity
        self._entries: "OrderedDict[object, DataFrame]" = OrderedDict()
        self._lock = threading.Lock()
        _REGISTRY.add(self)

    def get_or_persist(self, df: DataFrame) -> DataFrame:
        return self._lookup(_plan_key(df), lambda: df)

    def get_or_compute(self, key_df: DataFrame, extra_key, compute) -> DataFrame:
        """Like :meth:`get_or_persist`, but keyed on the INPUT plan
        (+ a parameter tuple) with the result built lazily — for
        derivations that do eager driver work at call time (e.g. the
        IVF quantizer's seeding collect + Lloyd steps), where keying
        on the output would memoize the storage but still pay the
        derivation on every call."""
        return self._lookup((_plan_key(key_df), extra_key), compute)

    def _lookup(self, key, compute) -> DataFrame:
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None:
                self._entries.move_to_end(key)
                return hit
        # compute outside the lock — it may launch Spark jobs
        persisted = compute().persist()
        evicted = []
        with self._lock:
            race = self._entries.get(key)
            if race is not None:
                # another thread filled it first; do NOT unpersist our
                # duplicate — equal canonical plans share one cache
                # entry, so unpersisting it would drop the winner's too
                self._entries.move_to_end(key)
                persisted = race
            else:
                self._entries[key] = persisted
                while len(self._entries) > self._capacity:
                    _, old = self._entries.popitem(last=False)
                    evicted.append(old)
        for old in evicted:
            old.unpersist()
        return persisted

    def __len__(self) -> int:
        return len(self._entries)

    def clear(self) -> None:
        with self._lock:
            entries = list(self._entries.values())
            self._entries.clear()
        for df in entries:
            try:
                df.unpersist()
            except Exception:
                pass  # session may already be gone


def clear_all_memos() -> None:
    """Unpersist every memoized intermediate (all operator families) —
    the invalidation hook for tests and for callers that rewrote a
    memoized input in place."""
    for memo in list(_REGISTRY):
        memo.clear()
