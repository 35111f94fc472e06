"""TagGrouper (reference op M4) — ``-g k1,k2,…`` grouping key extraction.

Semantics (``src/taggrouper.rs:20-30`` + application at
``src/bin/osm-lump-ways/main.rs:330-339``): one grouper is a comma-separated key
list; its value for a record is the FIRST set tag value (coalesce). N groupers
produce an N-slot group key; records where any slot is None are dropped unless
``incl_unset_group`` (the reference's ``--incl-unset-group``).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np

from .tagfilter import TagView


class TagGrouper:
    def __init__(self, keys_csv: str):
        self.keys = keys_csv.split(",")

    def __repr__(self):
        return f"TagGrouper({','.join(self.keys)})"

    def get_value(self, tags: Mapping[str, str]) -> Optional[str]:
        for k in self.keys:
            v = tags.get(k)
            if v is not None:
                return v
        return None

    def values(self, view: TagView) -> np.ndarray:
        """Vectorized coalesce over a batch → object ndarray (None = unset)."""
        out = np.array(view.get(self.keys[0]), dtype=object, copy=True)
        for k in self.keys[1:]:
            nxt = view.get(k)
            missing = np.array([v is None for v in out], dtype=bool)
            if missing.any():
                out[missing] = nxt[missing]
        return out


def group_key_values(view: TagView, groupers: Sequence[TagGrouper],
                     incl_unset_group: bool = False):
    """Per-row composite group key for a batch.

    Returns ``(key_strs: object ndarray, keep: bool ndarray)`` where key_strs is a
    stable string encoding of the N-slot key (slots joined with ``\\x1f``, unset
    slots encoded as ``\\x00`` when incl_unset_group). keep is False for rows with
    any unset slot when not incl_unset_group.
    """
    n = len(view)
    slots = [g.values(view) for g in groupers]
    keep = np.ones(n, dtype=bool)
    if not incl_unset_group:
        for s in slots:
            keep &= np.array([v is not None for v in s], dtype=bool)
    parts = []
    for s in slots:
        parts.append(np.array(["\x00" if v is None else v for v in s], dtype=object))
    if not parts:
        return np.array([""] * n, dtype=object), keep
    key = parts[0]
    for p in parts[1:]:
        key = np.array([a + "\x1f" + b for a, b in zip(key, p)], dtype=object)
    return key, keep
