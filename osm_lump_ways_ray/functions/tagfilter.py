"""Tag-filter DSL — parser + evaluator (reference ops M1/M2/M3).

Re-creates the semantics of the reference's tag-filter language
(``src/tagfilter.rs:9-365``): 15 filter variants (HasK, HasReK, HasK(lrb),
NotHasK(lrb), NotHasK, NotHasReK, KV, KinV, KnotInV, HasKnotInV, KneV, KreV, And,
Or, OSMObj) parsed from strings like ``waterway=canal∧lock=yes``,
``name~^Sava$``, ``∃name``, ``¬w123``; plus the ordered decision-list
"tag filter function" (``waterway=canal∧lock=yes→T;waterway=canal→F;waterway→T;F``)
with ``@file`` indirection, ``include FILE;`` expansion and ``#`` comments
(``src/tagfilter.rs:203-350``).

Evaluation comes in two forms:

- row-level ``TagFilter.matches(tags: Mapping[str,str], obj_type='w', obj_id=0)``
  — exact reference semantics, used in tests and small driver-side paths;
- vectorized ``TagFilter.mask(view) -> np.ndarray[bool]`` over a :class:`TagView`
  of a whole Arrow/pandas batch — the hot path inside ``map_batches``. Regexes
  are compiled once at parse time (reference T2 — compile-once per worker:
  the parsed AST object is pickled into the map task / actor, so compilation
  happens at parse, not per batch).

Parse precedence and quirks deliberately mirror the reference parser
(``src/tagfilter.rs:111-201``), including: ``∨`` splits before ``∧``; an
``=``-containing string parses before the ``∃…`` prefixes; a value containing
commas turns ``=`` into KinV and ``≠`` into KnotInV; ``w<int>``/``¬w<int>`` only
parse as object filters when the suffix is an integer (else fall through);
no parenthesis grouping exists; the bare fallback is HasK.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Mapping, Optional, Sequence

import numpy as np


# --------------------------------------------------------------------------- views
class TagView:
    """Batch-level accessor the vectorized evaluators run against.

    ``get(key)`` returns an object ndarray of tag values (None when unset);
    ``all_keys_match(regex)`` returns a bool ndarray "any tag key matches".
    """

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def get(self, key: str) -> np.ndarray:  # pragma: no cover - interface
        raise NotImplementedError

    def any_key_matches(self, creg) -> np.ndarray:  # pragma: no cover - interface
        raise NotImplementedError

    def obj_ids(self) -> np.ndarray:
        return np.zeros(len(self), dtype=np.int64)

    def obj_type(self) -> str:
        return "w"


class DictTagView(TagView):
    """View over a sequence of per-row tag dicts (ways table ``tags`` column)."""

    def __init__(self, dicts: Sequence[Mapping[str, str]], ids=None, obj_type: str = "w"):
        self._dicts = dicts
        self._ids = ids
        self._type = obj_type
        self._cache: dict[str, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self._dicts)

    def get(self, key: str) -> np.ndarray:
        arr = self._cache.get(key)
        if arr is None:
            arr = np.array([d.get(key) if d is not None else None for d in self._dicts], dtype=object)
            self._cache[key] = arr
        return arr

    def any_key_matches(self, creg) -> np.ndarray:
        out = np.empty(len(self._dicts), dtype=bool)
        for i, d in enumerate(self._dicts):
            out[i] = any(creg.search(k) for k in d) if d is not None else False
        return out

    def obj_ids(self) -> np.ndarray:
        if self._ids is None:
            return super().obj_ids()
        return np.asarray(self._ids, dtype=np.int64)

    def obj_type(self) -> str:
        return self._type


class ColumnTagView(TagView):
    """View over a flat table where each tag key is a column (e.g. ``documents``:
    keys ``lang``/``source`` map to columns). Missing column == unset tag."""

    def __init__(self, columns: Mapping[str, np.ndarray], n: int, ids=None, obj_type: str = "w"):
        self._cols = {k: np.asarray(v, dtype=object) for k, v in columns.items()}
        self._n = n
        self._ids = ids
        self._type = obj_type

    def __len__(self) -> int:
        return self._n

    def get(self, key: str) -> np.ndarray:
        col = self._cols.get(key)
        if col is None:
            return np.full(self._n, None, dtype=object)
        return col

    def any_key_matches(self, creg) -> np.ndarray:
        hit_keys = [k for k in self._cols if creg.search(k)]
        out = np.zeros(self._n, dtype=bool)
        for k in hit_keys:
            out |= np.array([v is not None for v in self._cols[k]], dtype=bool)
        return out

    def obj_ids(self) -> np.ndarray:
        if self._ids is None:
            return super().obj_ids()
        return np.asarray(self._ids, dtype=np.int64)

    def obj_type(self) -> str:
        return self._type


def _notnull(arr: np.ndarray) -> np.ndarray:
    return np.array([v is not None for v in arr], dtype=bool)


def _eq(arr: np.ndarray, val: str) -> np.ndarray:
    return np.array([v == val for v in arr], dtype=bool)


def _regex_mask(arr: np.ndarray, creg) -> np.ndarray:
    return np.array([v is not None and bool(creg.search(v)) for v in arr], dtype=bool)


# --------------------------------------------------------------------------- AST
class TagFilter:
    """Base AST node. Subclasses implement row ``matches`` and batch ``mask``."""

    def matches(self, tags: Mapping[str, str], obj_type: str = "w", obj_id: int = 0) -> bool:
        raise NotImplementedError

    def mask(self, view: TagView) -> np.ndarray:
        raise NotImplementedError


@dataclass
class HasK(TagFilter):
    key: str

    def matches(self, tags, obj_type="w", obj_id=0):
        return self.key in tags

    def mask(self, view):
        return _notnull(view.get(self.key))


@dataclass
class NotHasK(TagFilter):
    key: str

    def matches(self, tags, obj_type="w", obj_id=0):
        return self.key not in tags

    def mask(self, view):
        return ~_notnull(view.get(self.key))


@dataclass
class HasReK(TagFilter):
    pattern: str
    _creg: object = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        self._creg = _re.compile(self.pattern)

    def matches(self, tags, obj_type="w", obj_id=0):
        return any(self._creg.search(k) for k in tags)

    def mask(self, view):
        return view.any_key_matches(self._creg)


@dataclass
class NotHasReK(TagFilter):
    pattern: str
    _creg: object = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        self._creg = _re.compile(self.pattern)

    def matches(self, tags, obj_type="w", obj_id=0):
        return not any(self._creg.search(k) for k in tags)

    def mask(self, view):
        return ~view.any_key_matches(self._creg)


@dataclass
class HasKLeftRightBoth(TagFilter):
    """``∃(lrb)k`` — k set, or k:both set, or (k:left AND k:right) set
    (src/tagfilter.rs:79-84)."""

    key: str

    def matches(self, tags, obj_type="w", obj_id=0):
        k = self.key
        return k in tags or f"{k}:both" in tags or (f"{k}:left" in tags and f"{k}:right" in tags)

    def mask(self, view):
        k = self.key
        return _notnull(view.get(k)) | _notnull(view.get(f"{k}:both")) | (
            _notnull(view.get(f"{k}:left")) & _notnull(view.get(f"{k}:right"))
        )


@dataclass
class NotHasKLeftRightBoth(TagFilter):
    key: str

    def matches(self, tags, obj_type="w", obj_id=0):
        return not HasKLeftRightBoth(self.key).matches(tags, obj_type, obj_id)

    def mask(self, view):
        return ~HasKLeftRightBoth(self.key).mask(view)


@dataclass
class KV(TagFilter):
    key: str
    value: str

    def matches(self, tags, obj_type="w", obj_id=0):
        return tags.get(self.key) == self.value

    def mask(self, view):
        return _eq(view.get(self.key), self.value)


@dataclass
class KneV(TagFilter):
    """``k≠v`` — true when k is unset OR set to a different value
    (src/tagfilter.rs:91)."""

    key: str
    value: str

    def matches(self, tags, obj_type="w", obj_id=0):
        v = tags.get(self.key)
        return v is None or v != self.value

    def mask(self, view):
        return ~_eq(view.get(self.key), self.value)


@dataclass
class KinV(TagFilter):
    key: str
    values: tuple

    def matches(self, tags, obj_type="w", obj_id=0):
        v = tags.get(self.key)
        return v is not None and v in self.values

    def mask(self, view):
        arr = view.get(self.key)
        vals = set(self.values)
        return np.array([v is not None and v in vals for v in arr], dtype=bool)


@dataclass
class KnotInV(TagFilter):
    """``k∉v1,v2`` — true when k unset OR value not in the list."""

    key: str
    values: tuple

    def matches(self, tags, obj_type="w", obj_id=0):
        v = tags.get(self.key)
        return v is None or v not in self.values

    def mask(self, view):
        arr = view.get(self.key)
        vals = set(self.values)
        return np.array([v is None or v not in vals for v in arr], dtype=bool)


@dataclass
class HasKnotInV(TagFilter):
    """``∃k∉v1,v2`` — k IS set and its value not in the list."""

    key: str
    values: tuple

    def matches(self, tags, obj_type="w", obj_id=0):
        v = tags.get(self.key)
        return v is not None and v not in self.values

    def mask(self, view):
        arr = view.get(self.key)
        vals = set(self.values)
        return np.array([v is not None and v not in vals for v in arr], dtype=bool)


@dataclass
class KreV(TagFilter):
    key: str
    pattern: str
    _creg: object = field(default=None, repr=False, compare=False)

    def __post_init__(self):
        self._creg = _re.compile(self.pattern)

    def matches(self, tags, obj_type="w", obj_id=0):
        v = tags.get(self.key)
        return v is not None and bool(self._creg.search(v))

    def mask(self, view):
        return _regex_mask(view.get(self.key), self._creg)


@dataclass
class And(TagFilter):
    parts: tuple

    def matches(self, tags, obj_type="w", obj_id=0):
        return all(p.matches(tags, obj_type, obj_id) for p in self.parts)

    def mask(self, view):
        out = self.parts[0].mask(view)
        for p in self.parts[1:]:
            out = out & p.mask(view)
        return out


@dataclass
class Or(TagFilter):
    parts: tuple

    def matches(self, tags, obj_type="w", obj_id=0):
        return any(p.matches(tags, obj_type, obj_id) for p in self.parts)

    def mask(self, view):
        out = self.parts[0].mask(view)
        for p in self.parts[1:]:
            out = out | p.mask(view)
        return out


@dataclass
class OSMObj(TagFilter):
    """``w123`` include-only / ``¬w123`` exclude-only an object by type+id
    (src/tagfilter.rs:102-108)."""

    include: bool
    osm_type: str
    osm_id: int

    def matches(self, tags, obj_type="w", obj_id=0):
        if obj_type == self.osm_type and obj_id == self.osm_id:
            return self.include
        return not self.include

    def mask(self, view):
        hit = (view.obj_type() == self.osm_type) & (view.obj_ids() == self.osm_id)
        return hit if self.include else ~hit


# --------------------------------------------------------------------------- parser
class TagFilterParseError(ValueError):
    pass


_OBJ_PREFIXES = ("w", "!w", "¬w", "r", "!r", "¬r")


def parse_tag_filter(s: str) -> TagFilter:
    """Parse one filter expression; same branch order as src/tagfilter.rs:111-201."""
    s = s.strip()
    if "∨" in s:
        return Or(tuple(parse_tag_filter(p) for p in s.split("∨")))
    if "∧" in s:
        return And(tuple(parse_tag_filter(p) for p in s.split("∧")))
    for prefix in _OBJ_PREFIXES:
        if s.startswith(prefix):
            rest = s[len(prefix):]
            try:
                oid = int(rest)
            except ValueError:
                continue
            include = not prefix.startswith(("!", "¬"))
            return OSMObj(include, prefix[-1], oid)
    if "=" in s:
        k, v = s.split("=", 1)
        if "," in v:
            return KinV(k, tuple(v.split(",")))
        return KV(k, v)
    if "∈" in s:
        k, v = s.split("∈", 1)
        return KinV(k, tuple(v.split(",")))
    if "≠" in s:
        k, v = s.split("≠", 1)
        if "," in v:
            return KnotInV(k, tuple(v.split(",")))
        return KneV(k, v)
    if s.startswith("∃(lrb)"):
        return HasKLeftRightBoth(s[len("∃(lrb)"):])
    if s.startswith("∄(lrb)"):
        return NotHasKLeftRightBoth(s[len("∄(lrb)"):])
    if s.startswith("∃") and "∉" in s:
        k, v = s[1:].split("∉", 1)
        return HasKnotInV(k, tuple(v.split(",")))
    if "∉" in s:
        k, v = s.split("∉", 1)
        return KnotInV(k, tuple(v.split(",")))
    if s.startswith("~"):
        return _compile_re(HasReK, s[1:])
    if s.startswith("∃~"):
        return _compile_re(HasReK, s[2:])
    if s.startswith("∄~"):
        return _compile_re(NotHasReK, s[2:])
    if s.startswith("∃"):
        return HasK(s[1:])
    if s.startswith("∄"):
        return NotHasK(s[1:])
    if "~" in s:
        k, p = s.split("~", 1)
        return _compile_re(lambda pat: KreV(k, pat), p)
    if not s:
        raise TagFilterParseError("An empty string is not a valid tag filter")
    return HasK(s)


def _compile_re(ctor, pattern: str):
    try:
        return ctor(pattern)
    except _re.error as e:
        raise TagFilterParseError(f"Invalid regex {pattern!r}: {e}") from e


# ------------------------------------------------------------------ decision list
@dataclass
class TagFilterFuncElement:
    """``T`` / ``F`` / ``filter→T`` / ``filter→F`` (src/tagfilter.rs:203-229)."""

    result_val: bool
    filt: Optional[TagFilter] = None

    def result(self, tags, obj_type="w", obj_id=0) -> Optional[bool]:
        if self.filt is None:
            return self.result_val
        return self.result_val if self.filt.matches(tags, obj_type, obj_id) else None


_INCLUDE_RE = _re.compile(r"(?m)^include ([^;]+);")
_COMMENT_RE = _re.compile(r"#[^\n]*\n")


class TagFilterFunc:
    """Ordered first-match-wins decision list (src/tagfilter.rs:265-350)."""

    def __init__(self, elements: list[TagFilterFuncElement]):
        self.elements = elements

    @classmethod
    def parse(cls, s: str) -> "TagFilterFunc":
        filename = None
        if s.startswith("@"):
            filename = Path(s[1:])
            s = filename.read_text()
        s = s.strip()
        while True:  # recursive `include FILE;` expansion, relative to @file's dir
            def repl(m):
                if filename is None:
                    raise TagFilterParseError("include requires @filename syntax")
                return (filename.parent / m.group(1)).read_text()

            new_s = _INCLUDE_RE.sub(repl, s)
            if new_s == s:
                break
            s = new_s
        s = _COMMENT_RE.sub("", s)
        elements = []
        for part in s.split(";"):
            part = part.strip()
            if not part:
                continue
            if part == "T":
                elements.append(TagFilterFuncElement(True))
            elif part == "F":
                elements.append(TagFilterFuncElement(False))
            elif part.endswith("→T"):
                elements.append(TagFilterFuncElement(True, parse_tag_filter(part[:-len("→T")])))
            elif part.endswith("→F"):
                elements.append(TagFilterFuncElement(False, parse_tag_filter(part[:-len("→F")])))
            else:
                raise TagFilterParseError(f"Unknown Tag Filter Func: {part}")
        return cls(elements)

    def result(self, tags, obj_type="w", obj_id=0) -> Optional[bool]:
        for el in self.elements:
            r = el.result(tags, obj_type, obj_id)
            if r is not None:
                return r
        return None

    def mask(self, view: TagView) -> np.ndarray:
        """Vectorized first-match-wins over a batch (cascading undecided mask)."""
        n = len(view)
        out = np.zeros(n, dtype=bool)
        undecided = np.ones(n, dtype=bool)
        for el in self.elements:
            if not undecided.any():
                break
            if el.filt is None:
                hit = undecided
            else:
                hit = undecided & el.filt.mask(view)
            if el.result_val:
                out |= hit
            undecided = undecided & ~hit
        if undecided.any():
            raise ValueError(
                "Tag Filter func did not complete. Perhaps missing last element of T or F?"
            )
        return out


def obj_pass_filters(tags, tag_filters: Sequence[TagFilter],
                     tag_filter_func: Optional[TagFilterFunc] = None,
                     obj_type: str = "w", obj_id: int = 0) -> bool:
    """Row-level combined gate (src/tagfilter.rs:352-365): AND of tag_filters if
    any, else the decision list, else True."""
    if tag_filters:
        return all(tf.matches(tags, obj_type, obj_id) for tf in tag_filters)
    if tag_filter_func is not None:
        r = tag_filter_func.result(tags, obj_type, obj_id)
        if r is None:
            raise ValueError("Tag Filter func did not complete")
        return r
    return True


def filters_mask(view: TagView, tag_filters: Sequence[TagFilter],
                 tag_filter_func: Optional[TagFilterFunc] = None) -> np.ndarray:
    """Vectorized combined gate over a batch."""
    if tag_filters:
        out = tag_filters[0].mask(view)
        for tf in tag_filters[1:]:
            out = out & tf.mask(view)
        return out
    if tag_filter_func is not None:
        return tag_filter_func.mask(view)
    return np.ones(len(view), dtype=bool)
