"""Driver contract for the Ray-Data-native lump engine.

The driver initialises Ray BEFORE importing this module; nothing here (or in
the library) calls ``ray.init()``/``ray.shutdown()``.

- ``entry()``        — flagship lump pipeline (pages → extract/verify → geocode
  → link → contract → grouped connected components → lengths → tile join) over
  a deterministic pages table derived from /root/testdata/sf0.001 scale.
- ``queries()``      — one callable per implemented operator family from
  SURVEY.md §2 plus the training-data extensions (dedup, similarity, text,
  spatial, multimodal stub); each takes ``sf_dir``.
- ``oracle_sql()``   — DuckDB twins for every SQL-expressible query (same
  column names; integer-exact cross-engine values by construction).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship lump pipeline at t1 smoke scale; returns the components table."""
    from osm_lump_ways_ray.pipelines.lump import lump
    from osm_lump_ways_ray.sources.pages import synth_pages_dataset

    # t1 scale: ~6k pages (mirrors the sf0.001 lineitem row count; the pages
    # table itself is synthesized deterministically per BASELINE.json input_hint)
    pages = synth_pages_dataset(6000, seed=42)
    result = lump(pages, num_partitions=8, verify_extract=True)
    return result["components"]


def queries() -> dict[str, Callable[[str], Any]]:
    from osm_lump_ways_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osm_lump_ways_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
