"""Temporal join / window operators Ray Data lacks natively (graft extension
surface): as-of join, interval (range) join with aggregation, gap-based
sessionization, hopping windows, rolling ROWS windows, streaming debounce,
distributed grouped quantiles, and group-statistic row enrichment
(quantile buckets, mean centering).

All are expressed as compositions of ``map_batches`` + hash-bucketed
``groupby().map_groups`` — the same key-cogroup pattern as
``relational.cogroup_join`` — with fully vectorized numpy bodies (composite
dense-key ``searchsorted`` range search, no per-row Python).

Partitioning assumption (documented per the custom-operator contract): both
sides are hash-partitioned on the equality key, so one bucket holds every row
of a key.  A single hot key lands in one task; at planet scale, salt hot keys
by a coarse time bucket on the *left* side and replicate the right rows that
straddle bucket boundaries (the boundary band is at most ``window`` wide).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .relational import concat_blocks

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _part_of(arr: np.ndarray, num_partitions: int) -> np.ndarray:
    if arr.dtype.kind in "iub":
        key = arr.astype(np.uint64)
    else:  # string/object keys: deterministic siphash (bucket_agg pattern)
        import pandas as pd

        key = pd.util.hash_array(arr)
    return ((key * _MIX) >> np.uint64(17)).astype(np.int64) % num_partitions


def _cogroup(left, right, key: str, body, out_schema: pa.Schema,
             num_partitions: int = 16):
    """Tag both sides, union with null-padded schemas, hash-bucket on ``key``,
    and run ``body(left_tbl, right_tbl) -> pa.Table`` once per bucket.

    Schema handling mirrors relational.cogroup_join: sides are split in Arrow
    BEFORE any pandas conversion so null padding never forces int64→float64."""
    import pyarrow.compute as pc

    def _schema_of(ds):
        sch = ds.schema(fetch_if_missing=False)
        if sch is None:
            ds = ds.materialize()
            sch = ds.schema()
        return ds, sch

    left, lschema = _schema_of(left)
    right, rschema = _schema_of(right)
    types = dict(zip(lschema.names, lschema.types))
    for n, t in zip(rschema.names, rschema.types):
        if n != key:
            assert n not in types, f"non-key column collision: {n}"
        types[n] = t
    l_cols = list(lschema.names)
    r_cols = [c for c in rschema.names if c != key]
    all_cols = l_cols + r_cols

    def tag(side: int, present: list):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            part = _part_of(batch[key].to_numpy(zero_copy_only=False),
                            num_partitions)
            cols = {"_part": pa.array(part, pa.int64()),
                    "_side": pa.array(np.full(n, side, dtype=np.int8), pa.int8())}
            for c in all_cols:
                cols[c] = batch[c] if c in present else pa.nulls(n, type=types[c])
            return pa.table(cols)

        return fn

    tagged = concat_blocks(
        left.map_batches(tag(0, l_cols), batch_format="pyarrow"),
        right.map_batches(tag(1, list(rschema.names)), batch_format="pyarrow"))

    def merge(t: pa.Table) -> pa.Table:
        side = t["_side"]
        l = t.filter(pc.equal(side, pa.scalar(0, pa.int8()))).select(l_cols)
        r = t.filter(pc.equal(side, pa.scalar(1, pa.int8()))) \
             .select([key] + r_cols)
        out = body(l.combine_chunks(), r.combine_chunks())
        return out.cast(out_schema)

    return tagged.groupby("_part").map_groups(merge, batch_format="pyarrow")


class _RankEncoder:
    """Bucket-local composite (key, ts) → sortable int64, rank-encoded on BOTH
    axes so the product never exceeds ~(2·rows)² — overflow-safe at any key /
    timestamp magnitude (a raw ``key_idx * ts_span`` composite overflows int64
    once a bucket spans ~50 years of microseconds × 10^6 keys).

    Right rows get EVEN ts slots (2·rank); left probe timestamps get ODD slots
    placed strictly between right ranks, so threshold semantics are exact:
    ``at_or_before`` sits after every right row with ts ≤ t, ``first_at_or_
    after`` sits before every right row with ts ≥ t."""

    def __init__(self, right_keys: np.ndarray, right_ts: np.ndarray):
        self.uk = np.unique(right_keys)
        self.ut = np.unique(right_ts)
        self.span = np.int64(2 * len(self.ut) + 2)
        kr = np.searchsorted(self.uk, right_keys)
        tr = np.searchsorted(self.ut, right_ts)
        self.right_comp = kr.astype(np.int64) * self.span + 2 * tr

    def _key_idx(self, keys: np.ndarray):
        idx = np.searchsorted(self.uk, keys)
        idx[idx >= len(self.uk)] = 0
        hit = (self.uk[idx] == keys) if len(self.uk) else np.zeros(len(keys), bool)
        return idx.astype(np.int64), hit

    def probe_at_or_before(self, keys: np.ndarray, ts: np.ndarray):
        """Composite that sorts AFTER all right rows of the key with rts ≤ ts."""
        idx, hit = self._key_idx(keys)
        slot = 2 * np.searchsorted(self.ut, ts, side="right") - 1
        return idx * self.span + slot, hit

    def probe_first_at_or_after(self, keys: np.ndarray, ts: np.ndarray):
        """Composite that sorts BEFORE all right rows of the key with rts ≥ ts."""
        idx, hit = self._key_idx(keys)
        slot = 2 * np.searchsorted(self.ut, ts, side="left") - 1
        return idx * self.span + slot, hit


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              tiebreak: str, right_cols: list, *, num_partitions: int = 16):
    """Backward as-of join: for each left row, the right row of the same key
    with the greatest ``right_ts`` ≤ ``left_ts``; ties on ``right_ts`` resolved
    to the greatest ``tiebreak``.  Inner semantics (unmatched left rows drop).

    Distributed shape: key-cogroup (one shuffle), then per bucket ONE composite
    ``searchsorted`` over all keys at once — the right side is lexsorted by
    (key, ts, tiebreak) and ``searchsorted(..., 'right') - 1`` lands on the
    last (= max-tiebreak) row at or before each left timestamp.
    """
    def body(l: pa.Table, r: pa.Table) -> pa.Table:
        # the int64-storage comparison below is only meaningful when both
        # timestamp columns carry the SAME Arrow type/unit (date32 days vs
        # timestamp[us] would silently mismatch), and the key must be integer
        # (strings pass _part_of's siphash but not the astype here)
        assert l.schema.field(left_ts).type == r.schema.field(right_ts).type, \
            (f"asof_join: {left_ts} ({l.schema.field(left_ts).type}) and "
             f"{right_ts} ({r.schema.field(right_ts).type}) must share one "
             "Arrow temporal type/unit")
        assert pa.types.is_integer(l.schema.field(key).type), \
            f"asof_join: key column {key} must be integer-typed"
        lcols = {c: l[c].to_numpy(zero_copy_only=False) for c in l.column_names}
        lk = lcols[key].astype(np.int64)
        lt = l[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rk = r[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rt = r[right_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rtie = r[tiebreak].to_numpy(zero_copy_only=False)
        if len(r) == 0 or len(l) == 0:
            empty = {c: lcols[c][:0] for c in l.column_names}
            for c in right_cols:
                empty[c] = r[c].to_numpy(zero_copy_only=False)[:0]
            return pa.table(empty)
        order = np.lexsort((rtie, rt, rk))
        rk, rt = rk[order], rt[order]
        rvals = {c: r[c].to_numpy(zero_copy_only=False)[order]
                 for c in right_cols}
        enc = _RankEncoder(rk, rt)
        lcomp, hit = enc.probe_at_or_before(lk, lt)
        pos = np.searchsorted(enc.right_comp, lcomp, side="right") - 1
        ok = hit & (pos >= 0)
        safe = np.where(ok, pos, 0)
        ok &= rk[safe] == lk  # the found row must belong to the same key
        sel = safe[ok]
        out = {c: lcols[c][ok] for c in l.column_names}
        for c in right_cols:
            out[c] = rvals[c][sel]
        return pa.table(out)

    l_schema = left.schema(fetch_if_missing=False)
    if l_schema is None:
        left = left.materialize()
        l_schema = left.schema()
    r_schema = right.schema(fetch_if_missing=False)
    if r_schema is None:
        right = right.materialize()
        r_schema = right.schema()
    rtypes = dict(zip(r_schema.names, r_schema.types))
    out_schema = pa.schema(
        [(n, t) for n, t in zip(l_schema.names, l_schema.types)]
        + [(c, rtypes[c]) for c in right_cols])
    return _cogroup(left, right, key, body, out_schema, num_partitions)


def range_join_agg(left, right, key: str, left_ts: str, right_ts: str,
                   val_milli_col: str, *, lo_offset_us: int, hi_offset_us: int,
                   num_partitions: int = 16):
    """Interval join + aggregate: for each left row, count and sum (pre-
    quantized integer ``val_milli_col``) the right rows of the same key with
    ``left_ts + lo_offset ≤ right_ts < left_ts + hi_offset``.  Left-outer
    semantics: every left row emits, zero-match rows get (0, 0).

    Per bucket: right side lexsorted by (key, ts) once, integer cumsum, then
    TWO composite ``searchsorted`` calls give [lo, hi) slice bounds for every
    left row simultaneously — counts are ``hi-lo``, sums are cumsum diffs.
    """
    assert lo_offset_us < hi_offset_us, "empty window: lo_offset ≥ hi_offset"

    def body(l: pa.Table, r: pa.Table) -> pa.Table:
        # same type discipline as asof_join: matching temporal types, int key
        assert l.schema.field(left_ts).type == r.schema.field(right_ts).type, \
            (f"range_join_agg: {left_ts} ({l.schema.field(left_ts).type}) and "
             f"{right_ts} ({r.schema.field(right_ts).type}) must share one "
             "Arrow temporal type/unit")
        assert pa.types.is_integer(l.schema.field(key).type), \
            f"range_join_agg: key column {key} must be integer-typed"
        lcols = {c: l[c].to_numpy(zero_copy_only=False) for c in l.column_names}
        n = len(l)
        if n == 0:
            return pa.table({**{c: lcols[c] for c in l.column_names},
                             "n_matched": np.zeros(0, np.int64),
                             "sum_matched_milli": np.zeros(0, np.int64)})
        lk = lcols[key].astype(np.int64)
        lt = l[left_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(r) == 0:
            z = np.zeros(n, np.int64)
            return pa.table({**lcols, "n_matched": z, "sum_matched_milli": z})
        rk = r[key].to_numpy(zero_copy_only=False).astype(np.int64)
        rt = r[right_ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rv = r[val_milli_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((rt, rk))
        rk, rt, rv = rk[order], rt[order], rv[order]
        cs = np.concatenate(([0], np.cumsum(rv)))
        enc = _RankEncoder(rk, rt)
        lo_comp, hit = enc.probe_first_at_or_after(lk, lt + lo_offset_us)
        hi_comp, _ = enc.probe_first_at_or_after(lk, lt + hi_offset_us)
        lo = np.searchsorted(enc.right_comp, lo_comp, side="left")
        hi = np.searchsorted(enc.right_comp, hi_comp, side="left")
        lo, hi = np.where(hit, lo, 0), np.where(hit, hi, 0)
        cnt = (hi - lo).astype(np.int64)
        ssum = cs[hi] - cs[lo]
        return pa.table({**lcols, "n_matched": cnt, "sum_matched_milli": ssum})

    l_schema = left.schema(fetch_if_missing=False)
    if l_schema is None:
        left = left.materialize()
        l_schema = left.schema()
    out_schema = pa.schema(
        [(n, t) for n, t in zip(l_schema.names, l_schema.types)]
        + [("n_matched", pa.int64()), ("sum_matched_milli", pa.int64())])
    return _cogroup(left, right, key, body, out_schema, num_partitions)


def sessionize(events, key: str, ts: str, order_tiebreak: str, gap_s: int,
               *, num_partitions: int = 16):
    """Gap-based session windows: per key, sorted by (ts, tiebreak), a new
    session starts whenever the gap to the previous event exceeds ``gap_s``.
    Returns one row per session: (key, session_n, n_events, dur_s) with
    ``session_n`` numbered 1.. per key in time order.

    One shuffle (hash-bucket on key), one lexsort + diff + cumsum per bucket.
    """
    gap_us = gap_s * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return pa.table({
            "_part": pa.array(_part_of(k, num_partitions), pa.int64()),
            key: batch[key],
            "_ts": batch[ts].cast(pa.int64()),
            "_tb": batch[order_tiebreak],
        })

    def sessions(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0:  # empty bucket / schema-inference probe
            return pa.table({key: pa.array([], pa.int64()),
                             "session_n": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "dur_s": pa.array([], pa.int64())})
        tv = t["_ts"].to_numpy(zero_copy_only=False)
        tb = t["_tb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tv, k))
        k, tv = k[order], tv[order]
        new_key = np.empty(len(k), bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        brk = new_key.copy()
        brk[1:] |= (tv[1:] - tv[:-1]) > gap_us
        n_sessions = int(np.count_nonzero(brk))
        # per-session reductions via the sorted layout
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, len(k)))
        s_start = tv[starts]
        s_end = tv[np.append(starts[1:], len(k)) - 1]
        s_key = k[starts]
        # renumber sessions 1.. within each key (keys are contiguous)
        nk = np.empty(n_sessions, bool)
        nk[0] = True
        nk[1:] = s_key[1:] != s_key[:-1]
        key_first = np.maximum.accumulate(np.where(nk, np.arange(n_sessions), 0))
        session_n = np.arange(n_sessions) - key_first + 1
        return pa.table({
            key: pa.array(s_key, pa.int64()),
            "session_n": pa.array(session_n, pa.int64()),
            "n_events": pa.array(counts.astype(np.int64), pa.int64()),
            "dur_s": pa.array((s_end - s_start) // 1_000_000, pa.int64()),
        })

    bucketed = events.map_batches(bucket, batch_format="pyarrow")
    return bucketed.groupby("_part").map_groups(sessions, batch_format="pyarrow")


def hopping_window(events, group: str, ts: str, val_milli_col: str,
                   *, window_s: int = 3600, hop_s: int = 1800):
    """Hopping (sliding) window aggregate: each event lands in
    ``window_s / hop_s`` overlapping windows; emits (group, window_start_s,
    n, sum_milli).  Expansion happens map-side (flat replication inside
    ``map_batches``), the aggregate is a plain grouped Sum/Count — the
    pre-aggregation combiner shape (replicas combine inside each block before
    the shuffle)."""
    from .relational import bucket_agg

    assert window_s % hop_s == 0
    k = window_s // hop_s

    def expand(batch: pa.Table) -> pa.Table:
        sec = batch[ts].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        base = sec // hop_s * hop_s
        g = batch[group]
        v = batch[val_milli_col].to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for i in range(k):
            outs.append(pa.table({
                group: g,
                "window_start_s": pa.array(base - i * hop_s, pa.int64()),
                "_v": pa.array(v, pa.int64()),
            }))
        return pa.concat_tables(outs)

    ex = events.map_batches(expand, batch_format="pyarrow")
    return bucket_agg(ex, [group, "window_start_s"],
                      {"n": (None, "count"), "sum_milli": ("_v", "sum")},
                      combine=True)


def grouped_quantiles(events, group: str, val_milli_col: str,
                      q_permille: tuple = (500, 900, 990)):
    """Distributed exact quantiles over a quantized integer domain: grouped
    value-histogram (one combiner-backed groupby over (group, v)), then a tiny
    per-group cumulative scan picks, for each q, the smallest v whose
    cumulative count reaches ``ceil(q/1000 * total)``.

    The histogram is the scale lever: the shuffle moves one row per DISTINCT
    (group, value) — bounded by the quantized domain, not the row count.
    It runs on the hash-bucket aggregator (Ray's sort-based aggregate pays
    per-output-group overhead: measured 7 s for 49k groups vs <1 s bucketed)."""
    from .relational import bucket_agg

    hist = bucket_agg(events, [group, val_milli_col],
                      {"n": (None, "count")}, combine=True)

    def pick(df):
        df = df.sort_values(val_milli_col)
        cum = df["n"].to_numpy().cumsum()
        total = int(cum[-1])
        v = df[val_milli_col].to_numpy()
        rows = []
        for qp in q_permille:
            need = -(-qp * total // 1000)  # ceil without floats
            rows.append((df[group].iloc[0], qp,
                         int(v[np.searchsorted(cum, need, side="left")])))
        import pandas as pd

        return pd.DataFrame(rows, columns=[group, "q_permille", "v_milli"])

    return hist.groupby(group).map_groups(pick, batch_format="pandas")


def quantile_bucket_assign(events, group: str, val_milli_col: str,
                           q_permille: tuple = (250, 500, 750)):
    """Groupwise quantile-bucket assignment (ntile-by-VALUE, not by row
    order — deterministic under ties): computes the group's quantile
    thresholds via ``grouped_quantiles`` (histogram-bounded shuffle), then
    assigns each row bucket = #thresholds < value... precisely:
    bucket k is the smallest k with value ≤ threshold_k (k = len(q)+1 when
    above all). Thresholds are broadcast back through the cogroup join's
    small-side fast path — no per-row shuffle of the raw table."""
    import pyarrow.compute as pc

    from .relational import cogroup_join

    th = grouped_quantiles(events, group, val_milli_col,
                           q_permille=q_permille)

    def widen(df):
        # Arrow out (pandas blocks wedge the Arrow-assuming join internals)
        df = df.sort_values("q_permille")
        return pa.table({group: pa.array([df[group].iloc[0]]),
                         **{f"_t{i}": pa.array([int(v)], pa.int64())
                            for i, v in enumerate(df["v_milli"])}})

    th_wide = th.groupby(group).map_groups(widen, batch_format="pandas")
    joined = cogroup_join(events, th_wide, on=group)
    n_q = len(q_permille)

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[val_milli_col].to_numpy(zero_copy_only=False)
        bucket = np.ones(len(v), np.int64)
        for i in range(n_q):
            t = batch[f"_t{i}"].to_numpy(zero_copy_only=False)
            bucket += (v > t).astype(np.int64)
        keep = [c for c in batch.column_names if not c.startswith("_t")]
        return batch.select(keep).append_column(
            "bucket", pa.array(bucket, pa.int64()))

    return joined.map_batches(assign, batch_format="pyarrow")


def groupwise_center(events, group: str, val_milli_col: str):
    """Group-wise mean centering (integer floor mean — exact cross-engine):
    centered = value_milli - (sum // n). Mean table via the combiner
    aggregate, broadcast back map-side."""
    from .relational import bucket_agg, cogroup_join

    sums = bucket_agg(events, group, {"_s": (val_milli_col, "sum"),
                                      "_n": (None, "count")}, combine=True)
    joined = cogroup_join(events, sums, on=group)

    def center(batch: pa.Table) -> pa.Table:
        v = batch[val_milli_col].to_numpy(zero_copy_only=False)
        s = batch["_s"].to_numpy(zero_copy_only=False)
        n = batch["_n"].to_numpy(zero_copy_only=False)
        keep = [c for c in batch.column_names if c not in ("_s", "_n")]
        return batch.select(keep).append_column(
            "centered_milli",
            pa.array(v - s // n, pa.int64()))

    return joined.map_batches(center, batch_format="pyarrow")


def rolling_sum(events, key: str, ts: str, order_tiebreak: str,
                val_milli_col: str, *, window_rows: int = 3,
                num_partitions: int = 16):
    """Per-key ROWS-window rolling sum (the ordered-window analog of the
    tumbling/hopping/session aggregates): for each row in (ts, tiebreak)
    order within its key, the sum of the last ``window_rows`` values
    including itself. One key-hash shuffle; per bucket one lexsort + cumsum,
    window lower bounds clamped to each key's first row — fully vectorized.

    Output: (key, tiebreak, rolling_milli)."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return pa.table({
            "_part": pa.array(_part_of(k, num_partitions), pa.int64()),
            key: batch[key],
            "_ts": batch[ts].cast(pa.int64()),
            "_tb": batch[order_tiebreak],
            "_v": batch[val_milli_col],
        })

    def roll(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0:  # empty bucket / schema-inference probe
            return pa.table({key: pa.array([], pa.int64()),
                             order_tiebreak: pa.array([], pa.int64()),
                             "rolling_milli": pa.array([], pa.int64())})
        tv = t["_ts"].to_numpy(zero_copy_only=False)
        tb = t["_tb"].to_numpy(zero_copy_only=False)
        v = t["_v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, tv, k))
        k, tb, v = k[order], tb[order], v[order]
        n = len(k)
        cs = np.concatenate(([0], np.cumsum(v)))
        new_key = np.empty(n, bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        key_start = np.maximum.accumulate(np.where(new_key, np.arange(n), 0))
        lo = np.maximum(np.arange(n) - (window_rows - 1), key_start)
        out = cs[np.arange(1, n + 1)] - cs[lo]
        return pa.table({
            key: pa.array(k, pa.int64()),
            order_tiebreak: pa.array(tb, pa.int64()),
            "rolling_milli": pa.array(out, pa.int64()),
        })

    return events.map_batches(bucket, batch_format="pyarrow") \
                 .groupby("_part").map_groups(roll, batch_format="pyarrow")


def debounce(events, keys: list, ts: str, order_tiebreak: str, window_s: int,
             *, num_partitions: int = 16):
    """Streaming debounce / within-window dedup: keep an event only if the
    previous event with the SAME key tuple is more than ``window_s`` older
    (or absent). The keep-mask is the sessionize break rule, so the kernel is
    the same one lexsort + diff per key-hash bucket."""
    gap_us = window_s * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        import pandas as pd

        k = batch[keys[0]].to_numpy(zero_copy_only=False)
        h = (k.astype(np.uint64) if k.dtype.kind in "iub"
             else pd.util.hash_array(k))
        for c in keys[1:]:
            a = batch[c].to_numpy(zero_copy_only=False)
            ah = (a.astype(np.uint64) if a.dtype.kind in "iub"
                  else pd.util.hash_array(a))
            h = h * np.uint64(1099511628211) ^ ah
        cols = {c: batch[c] for c in batch.column_names}
        cols["_kh"] = pa.array(h.astype(np.int64), pa.int64())
        cols["_part"] = pa.array(
            ((h * _MIX) >> np.uint64(17)).astype(np.int64) % num_partitions,
            pa.int64())
        return pa.table(cols)

    def keep_firsts(t: pa.Table) -> pa.Table:
        # EXACT key identity via per-column dense ranks composed into one
        # int64 (the _kh hash only routes partitioning; a 64-bit hash
        # collision must not merge two distinct key tuples)
        kh = np.zeros(len(t), np.int64)
        for c in keys:
            col = t[c].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(col, return_inverse=True)
            kh = kh * np.int64(len(uniq) + 1) + inv.astype(np.int64)
        tv = t[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = t[order_tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tv, kh))
        khs, tvs = kh[order], tv[order]
        keep = np.empty(len(khs), bool)
        if len(khs):
            keep[0] = True
            keep[1:] = (khs[1:] != khs[:-1]) | ((tvs[1:] - tvs[:-1]) > gap_us)
        idx = pa.array(order[keep], pa.int64())
        out_cols = [c for c in t.column_names if c not in ("_kh", "_part")]
        return pa.table({c: t[c].take(idx) for c in out_cols})

    return events.map_batches(bucket, batch_format="pyarrow") \
                 .groupby("_part").map_groups(keep_firsts,
                                              batch_format="pyarrow")


def funnel_depths(events, steps, *, key_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  max_gap_us: int = None, num_partitions: int = 8):
    """N-step funnel analysis (view → click → purchase …): for each key, the
    deepest step reached where step k's FIRST occurrence must be strictly
    after step k-1's — and, when ``max_gap_us`` is set, within that window of
    it (the standard windowed conversion funnel). Returns (depth, n_users)
    — the classic product-analytics rollup.

    Distributed shape: one combiner-backed grouped MIN per step (the step-k
    candidate set is events of that type joined against the step-k-1
    timestamps — a key-bucketed join, never a sort of the whole stream), then
    one left-join cascade to assign depths. Shuffles are bounded by distinct
    keys × steps, not event rows."""
    import pyarrow.compute as pc

    from .relational import bucket_agg, cogroup_join

    def typed(step_type):
        def f(b: pa.Table) -> pa.Table:
            keep = pc.equal(b[type_col], step_type)
            t = b.filter(keep)
            return pa.table({"k": t[key_col].cast(pa.int64()),
                             "t": t[ts_col].cast(pa.int64())})
        return f

    prev = None  # Dataset (k, t_prev) of keys that reached the prior step
    reached = []  # per step: Dataset (k, tN)
    for i, step_type in enumerate(steps):
        cand = events.map_batches(typed(step_type), batch_format="pyarrow")
        if prev is not None:
            j = cogroup_join(cand, prev.rename_columns(["k", "t_prev"]),
                             ("k",), how="inner",
                             num_partitions=num_partitions)
            def after_prev(b: pa.Table) -> pa.Table:
                keep = pc.greater(b["t"], b["t_prev"])
                if max_gap_us is not None:
                    keep = pc.and_(keep, pc.less_equal(
                        b["t"], pc.add(b["t_prev"],
                                       pa.scalar(max_gap_us, pa.int64()))))
                return pa.table({"k": b["k"].filter(keep),
                                 "t": b["t"].filter(keep)})

            cand = j.map_batches(after_prev, batch_format="pyarrow")
        first = bucket_agg(cand, ["k"], {"t": ("t", "min")},
                           num_partitions=num_partitions, combine=True)
        reached.append(first)
        prev = first

    users = bucket_agg(
        events.map_batches(
            lambda b: pa.table({"k": b[key_col].cast(pa.int64())}),
            batch_format="pyarrow"),
        ["k"], {"n": (None, "count")},
        num_partitions=num_partitions, combine=True).select_columns(["k"])
    depth = users.map_batches(
        lambda b: pa.table({"k": b["k"],
                            "depth": pa.array(np.zeros(len(b), np.int64))}),
        batch_format="pyarrow")
    for i, first in enumerate(reached):
        marked = first.map_batches(
            lambda b, d=i + 1: pa.table({
                "k": b["k"],
                f"r{d}": pa.array(np.full(len(b), d, np.int64))}),
            batch_format="pyarrow")
        depth = cogroup_join(depth, marked, ("k",), how="left_outer",
                             num_partitions=num_partitions)
        depth = depth.map_batches(
            lambda b, d=i + 1: pa.table({
                "k": b["k"],
                "depth": pc.max_element_wise(
                    b["depth"], pc.fill_null(b[f"r{d}"],
                                             pa.scalar(0, pa.int64()))),
            }), batch_format="pyarrow")
    return bucket_agg(depth, ["depth"], {"n_users": (None, "count")},
                      num_partitions=4, combine=True)


def windowed_distinct(events, ts: str, key: str, *, window_s: int = 3600,
                      num_partitions: int = 16):
    """Tumbling-window COUNT(DISTINCT key) — exact, via the two-level
    distinct-aggregation shape: per-block ``np.unique`` over (window, key)
    pairs (the combiner — duplicate pairs die before the shuffle), one
    hash-bucket shuffle keyed on the PAIR (so a hot window still spreads
    across buckets by key), then a per-window count with its own map-side
    combine. The all-to-all moves O(distinct pairs), not O(rows) — the exact
    analogue of the sketchless path; ``hll_distinct`` is the one-pass
    approximate alternative when even the pair set is too big."""
    from .relational import bucket_agg

    def pairs(batch: pa.Table) -> pa.Table:
        sec = batch[ts].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        w = sec // window_s * window_s
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([w, k], axis=1), axis=0)
        return pa.table({"window_start_s": pa.array(uniq[:, 0], pa.int64()),
                         key: pa.array(uniq[:, 1], pa.int64())})

    dd = bucket_agg(events.map_batches(pairs, batch_format="pyarrow"),
                    ["window_start_s", key], {"n": (None, "count")},
                    num_partitions=num_partitions, combine=True)
    return bucket_agg(dd, ["window_start_s"],
                      {"n_distinct": (None, "count")},
                      num_partitions=4, combine=True)


def next_event(events, key: str, ts: str, order_tiebreak: str,
               attr: str, *, num_partitions: int = 16):
    """LEAD(1) within each key: for every event, its successor's ``attr``
    and the gap in microseconds, ordered by (ts, tiebreak). Events with no
    successor are dropped (inner-LEAD semantics — the SQL twin filters
    ``next IS NOT NULL``).

    One hash-bucket shuffle on the key, one lexsort + shift per bucket —
    the sessionize shape; the whole window-function family (LAG/LEAD/
    running totals) reduces to this sorted-bucket body."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return pa.table({
            "_part": pa.array(_part_of(k, num_partitions), pa.int64()),
            key: batch[key],
            "_ts": batch[ts].cast(pa.int64()),
            "_tb": batch[order_tiebreak],
            "_attr": batch[attr],
        })

    def lead(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table({order_tiebreak: pa.array([], pa.int64()),
                          "next_" + attr: pa.array([], t["_attr"].type),
                          "gap_us": pa.array([], pa.int64())})
        if len(k) == 0:  # empty bucket / schema-inference probe
            return empty
        tv = t["_ts"].to_numpy(zero_copy_only=False)
        tb = t["_tb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, tv, k))
        k, tv, tb = k[order], tv[order], tb[order]
        att = t["_attr"].take(pa.array(order, pa.int64()))
        has_next = np.zeros(len(k), bool)
        has_next[:-1] = k[:-1] == k[1:]
        src = np.flatnonzero(has_next)
        return pa.table({
            order_tiebreak: pa.array(tb[src], pa.int64()),
            "next_" + attr: att.take(pa.array(src + 1, pa.int64())),
            "gap_us": pa.array(tv[src + 1] - tv[src], pa.int64()),
        })

    return events.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_part").map_groups(lead, batch_format="pyarrow")


def grouped_mad(events, group: str, val_milli_col: str):
    """Per-group median and median-absolute-deviation — the robust-statistics
    pair corpus filtering uses where mean/σ break on heavy tails. Exact, on
    the quantized integer domain, with the same ceil-rank convention as
    ``grouped_quantiles`` (smallest v with cum·1000 ≥ 500·total):

    two histogram-bounded passes (shuffles move one row per DISTINCT
    (group, value), not per row) — median first, medians broadcast back via
    the cogroup small-side fast path, then the same machinery over
    |v − median|. Returns (group, median_milli, mad_milli)."""
    from .relational import cogroup_join

    med = grouped_quantiles(events, group, val_milli_col, q_permille=(500,))
    med_tbl = med.map_batches(
        lambda b: pa.table({group: b[group], "_med": b["v_milli"]}),
        batch_format="pyarrow")
    joined = cogroup_join(events.select_columns([group, val_milli_col]),
                          med_tbl, (group,), how="inner")

    def absdev(b: pa.Table) -> pa.Table:
        v = b[val_milli_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = b["_med"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({group: b[group],
                         "_adev": pa.array(np.abs(v - m), pa.int64())})

    mad = grouped_quantiles(joined.map_batches(absdev,
                                               batch_format="pyarrow"),
                            group, "_adev", q_permille=(500,))
    mad_tbl = mad.map_batches(
        lambda b: pa.table({group: b[group], "mad_milli": b["v_milli"]}),
        batch_format="pyarrow")
    return cogroup_join(
        med_tbl.map_batches(
            lambda b: pa.table({group: b[group],
                                "median_milli": b["_med"]}),
            batch_format="pyarrow"),
        mad_tbl, (group,), how="inner")
