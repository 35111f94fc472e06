"""Session-scoped shared-derivation cache for the query battery.

The reference's ``osm-lump-ways-down`` binary is ONE program: it reads the
graph once, computes SCC/flow/loop state once, and feeds every output (ends
CSV, loops GeoJSON, OpenMetrics, grouped paths…) from those shared in-memory
intermediates (src/bin/osm-lump-ways-down/main.rs:146-1269).  Our battery
exposes each output as an independent ``queries()`` entry, so without sharing
every entry would recompute the same flow/SCC/CC derivation from parquet.
This cache restores the reference's single-program sharing: a derivation is
built once per (derivation, input, params) key and the MATERIALIZED result —
plan-severed Ray Dataset blocks living in the object store, or a small driver
object — is reused by every later query in the same Ray session.

Correctness is unaffected: a cache hit returns the same blocks the build
function would produce (the battery stays value-exact vs the DuckDB oracles
with the cache enabled or disabled — ``GRAFT_NO_DERIVATION_CACHE=1`` disables
it for A/B runs and is exercised by tests).

Invalidation: entries are keyed by the Ray job id — a fresh ``ray.init``
session gets a fresh cache (old object refs would be dead).  Entries never
expire within a session; every cached table here is a small derived
intermediate (labels, flow edges, loop features), not raw input data.
"""

from __future__ import annotations

import os
from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}
_SESSION_TOKEN: str | None = None


def _session_token() -> str:
    import ray

    if not ray.is_initialized():
        return "<no-ray>"
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:  # pragma: no cover - legacy API fallback
        return "<unknown>"


def _maybe_reset() -> None:
    global _SESSION_TOKEN
    tok = _session_token()
    if tok != _SESSION_TOKEN:
        _CACHE.clear()
        _SESSION_TOKEN = tok


def enabled() -> bool:
    return os.environ.get("GRAFT_NO_DERIVATION_CACHE") != "1"


def cached_ds(key: tuple, build: Callable[[], Any]):
    """Build-once materialized Dataset: the result of ``build()`` is snapshot
    (executed; plan severed; blocks pinned in the object store) and reused for
    every later call with the same key in this Ray session."""
    if not enabled():
        return build()
    _maybe_reset()
    k = ("ds",) + key
    if k not in _CACHE:
        from ..stages.relational import snapshot

        _CACHE[k] = snapshot(build())
    return _CACHE[k]


def cached_obj(key: tuple, build: Callable[[], Any]):
    """Build-once plain driver object (e.g. a small positions dict)."""
    if not enabled():
        return build()
    _maybe_reset()
    k = ("obj",) + key
    if k not in _CACHE:
        _CACHE[k] = build()
    return _CACHE[k]


def clear() -> None:
    _CACHE.clear()
