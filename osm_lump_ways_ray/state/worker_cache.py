"""Per-worker-process state cache for STATELESS ``map_batches`` stages.

Ray Data reuses worker processes across tasks, so a module-level dict gives
actor-pool state semantics (build once per worker, reuse per batch) WITHOUT
the actor-pool spin-up — which measures ~2-3 s flat per stage at 32 CPUs
(see stages/graph.py contract_ways, where the pattern was first measured,
and the r3 A/B: knn_bruteforce 3.2 s actor-pool vs 0.5 s stateless).

Reserve real actor pools (``map_batches(Cls, concurrency=...)``) for stages
whose setup is genuinely expensive (model load, big index build); for a
broadcast lookup rebuilt from a plasma ref in microseconds, this cache is
strictly better: same once-per-worker ``ray.get``, zero pool latency, and the
streaming executor keeps sizing the task pool itself.

Eviction: LRU-ish bounded dict (a worker that serves many different stages
over a long session must not pin every broadcast object alive — plasma refs
held here block GC of the underlying object)."""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

_MAX_ENTRIES = 8
_CACHE: "OrderedDict[Any, Any]" = OrderedDict()


def _key_of(ref: Any) -> Any:
    if hasattr(ref, "hex"):  # ray.ObjectRef
        return ref.hex()
    if isinstance(ref, (str, tuple, int, frozenset)):  # explicit param key
        return ref
    return id(ref)


def cached_state(ref: Any, build: Callable[[Any], Any]) -> Any:
    """Return ``build(ref)``, memoized per worker process on ``ref``."""
    key = _key_of(ref)
    obj = _CACHE.get(key)
    if obj is None:
        obj = build(ref)
        _CACHE[key] = obj
        while len(_CACHE) > _MAX_ENTRIES:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(key)
    return obj
