"""Session-cache eviction contract (VERDICT r13 item 7).

Every per-(session, dataset) model/artifact cache in the engine —
centroid tables, fine trees, BPE merges, unigram pieces, PQ codebooks,
lang-ID label tables, PCA bases — registers itself here at module
import. One umbrella :func:`clear_session_caches` then evicts them
all under a single contract:

- any cached value that exposes ``unpersist`` (a DataFrame — eager
  checkpoints hold executor storage blocks that dict eviction alone
  would leak until driver GC, the ADVICE-r12 lang-ID bug class) is
  unpersisted first, defensively (the session may already be gone);
- the dict is cleared.

Modules keep their local ``clear_*`` helpers for targeted eviction;
those helpers and this umbrella share the same dict objects, so
there is exactly one source of truth. New caches get the contract by
calling :func:`register_cache` instead of remembering the unpersist
rule — which is the point.
"""

from __future__ import annotations

import threading
from typing import Callable, MutableMapping, TypeVar

_REGISTRY: list[MutableMapping] = []

# ONE re-entrant lock for every artifact cache's build path (ADVICE
# r15): session artifacts are lazily checkpointed and multi-consumer,
# and two driver threads (parallel foreachBatch maintainers, the
# quotamon fold pool, two streams sharing one session) racing a cache
# MISS would each run the build — the loser's checkpointed frame then
# overwrites the winner's cache entry and the winner's checkpoint
# blocks leak until session end. Double-checked locking closes the
# race; re-entrant because builds nest (the band index builds the
# signature index, consumers build the assigned table) and the
# artifact dependency graph is a DAG built under this single lock.
_BUILD_LOCK = threading.RLock()

V = TypeVar("V")


def get_or_build(
    cache: MutableMapping, key, build: Callable[[], V]
) -> V:
    """Session-artifact cache getter with the build-once guarantee:
    the fast path is lock-free (dict reads are atomic under the GIL);
    a miss re-checks under the build lock, so exactly one thread
    builds and every concurrent caller returns the SAME artifact
    object."""
    hit = cache.get(key)
    if hit is not None:
        return hit
    with _BUILD_LOCK:
        hit = cache.get(key)
        if hit is not None:
            return hit
        val = build()
        cache[key] = val
        return val


def register_cache(cache: MutableMapping) -> MutableMapping:
    """Register a session cache dict and return it (decorator-style
    use at module level: ``_CACHE = register_cache({})``)."""
    _REGISTRY.append(cache)
    return cache


def unpersist_frame(df) -> None:
    """Actually release a DataFrame's storage, including
    ``localCheckpoint`` blocks.

    ``DataFrame.unpersist()`` only uncaches through the cacheManager;
    a checkpointed frame's data lives in an RDD-level persist under a
    ``LogicalRDD`` leaf that the cacheManager never sees — measured
    in r14: after df.unpersist() the block stays in
    sc.getPersistentRDDs() until driver GC, which means the r12/r13
    per-batch unpersist calls were silent no-ops. The real release is
    ``analyzed-plan LogicalRDD .rdd().unpersist()``. After this call
    the frame is DEAD (checkpoints truncate lineage, so the blocks
    cannot be recomputed) — only evict frames no consumer will
    re-execute."""
    try:
        df.unpersist()
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — session may be gone
        pass


def _release_value(v) -> None:
    """Unpersist a cached value, recursing into tuple/list composites
    (r15: several artifact caches hold (frame, metadata) tuples — the
    sparse-retrieval index triple, the decontamination (bench grams,
    bit words) pair — whose checkpointed frames the flat walk
    silently skipped on eviction)."""
    if callable(getattr(v, "unpersist", None)):
        unpersist_frame(v)
    elif isinstance(v, (tuple, list)):
        for x in v:
            _release_value(x)


def _evict(cache: MutableMapping) -> None:
    for v in cache.values():
        _release_value(v)
    cache.clear()


def clear_session_caches() -> None:
    """Evict every registered cache, unpersisting DataFrame values.
    Call after rewriting a dataset path in-session, or between
    logical jobs in a long-lived driver."""
    for cache in _REGISTRY:
        _evict(cache)


def registered_cache_count() -> int:
    return len(_REGISTRY)
