"""Temporal-operator unit tests: as-of join (tie-breaking, misses, giant
timestamp/key magnitudes that would overflow a span-encoded composite),
range-join aggregation boundaries, sessionization gap semantics, hopping
windows, and grouped quantiles — each cross-checked against a brute-force or
pandas reference on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages import temporal as T


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def _ts(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype(np.int64), pa.int64()).cast(pa.timestamp("us"))


def _brute_asof(l, r, key, lts, rts, tie):
    out = []
    for _, lrow in l.iterrows():
        cand = r[(r[key] == lrow[key]) & (r[rts] <= lrow[lts])]
        if len(cand):
            best = cand.sort_values([rts, tie]).iloc[-1]
            out.append((lrow["lid"], best["rid"]))
    return sorted(out)


def test_asof_join_random_vs_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    n_l, n_r = 400, 300
    l = pd.DataFrame({
        "lid": np.arange(n_l, dtype=np.int64),
        "k": rng.randint(0, 12, n_l).astype(np.int64),
        # coarse grid forces exact-equal timestamps (tie exercise)
        "lt": rng.randint(0, 40, n_l).astype(np.int64) * 1_000_000,
    })
    r = pd.DataFrame({
        "rid": np.arange(n_r, dtype=np.int64),
        # key 11 never on the right → left rows with k=11 must drop
        "k": rng.randint(0, 11, n_r).astype(np.int64),
        "rt": rng.randint(0, 40, n_r).astype(np.int64) * 1_000_000,
    })
    lds = _ds(pa.table({"lid": l["lid"], "k": l["k"], "lt": _ts(l["lt"].values)}))
    rds = _ds(pa.table({"rid": r["rid"], "k": r["k"], "rt": _ts(r["rt"].values)}))
    got = T.asof_join(lds, rds, key="k", left_ts="lt", right_ts="rt",
                      tiebreak="rid", right_cols=["rid"]).to_pandas()
    assert sorted(zip(got.lid, got.rid)) == _brute_asof(l, r, "k", "lt", "rt",
                                                        "rid")


def test_asof_join_huge_magnitudes(ray_session):
    """Keys ~2^62 and microsecond timestamps spanning 50 years: the rank
    encoder must not overflow (a span-encoded composite would)."""
    base = np.int64(1 << 62)
    k = np.array([base, base, base + 7], dtype=np.int64)
    rt = np.array([0, 50 * 365 * 86_400_000_000, 1], dtype=np.int64)
    r = pa.table({"k": pa.array(k), "rt": _ts(rt),
                  "rid": pa.array(np.arange(3, dtype=np.int64))})
    lt = np.array([50 * 365 * 86_400_000_000 + 5, 10, 0], dtype=np.int64)
    lk = np.array([base, base + 7, base + 7], dtype=np.int64)
    l = pa.table({"lid": pa.array(np.arange(3, dtype=np.int64)),
                  "k": pa.array(lk), "lt": _ts(lt)})
    got = T.asof_join(_ds(l), _ds(r), key="k", left_ts="lt", right_ts="rt",
                      tiebreak="rid", right_cols=["rid"]).to_pandas()
    got = sorted(zip(got.lid, got.rid))
    # lid0 → latest base row (rid 1); lid1 → rid 2 (rt=1 ≤ 10); lid2 drops
    # (k=base+7 has no row with rt ≤ 0? rt=1 > 0 → no match)
    assert got == [(0, 1), (1, 2)]


def test_range_join_boundaries(ray_session):
    """Window [lt-10s, lt): the -10 s edge is inclusive, lt itself exclusive."""
    lk = np.array([1, 1, 2], dtype=np.int64)
    lt = np.array([20_000_000, 5_000_000, 20_000_000], dtype=np.int64)
    l = pa.table({"lid": pa.array(np.arange(3, dtype=np.int64)),
                  "k": pa.array(lk), "lt": _ts(lt)})
    rk = np.array([1, 1, 1, 1], dtype=np.int64)
    rt = np.array([10_000_000, 19_999_999, 20_000_000, 4_000_000],
                  dtype=np.int64)
    rv = np.array([1, 10, 100, 1000], dtype=np.int64)
    r = pa.table({"k": pa.array(rk), "rt": _ts(rt),
                  "vm": pa.array(rv, pa.int64())})
    got = T.range_join_agg(_ds(l), _ds(r), key="k", left_ts="lt",
                           right_ts="rt", val_milli_col="vm",
                           lo_offset_us=-10_000_000, hi_offset_us=0) \
        .to_pandas().sort_values("lid")
    # lid0: rt in [10s, 20s) → 10s(1) + 19.999999s(10) = 11, n=2
    # lid1: rt in [-5s, 5s) → 4s(1000), n=1
    # lid2: key 2 absent on right → 0/0 (left-outer)
    assert list(got.n_matched) == [2, 1, 0]
    assert list(got.sum_matched_milli) == [11, 1000, 0]


def test_range_join_random_vs_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    n_l, n_r = 300, 500
    lk = rng.randint(0, 9, n_l).astype(np.int64)
    lt = rng.randint(0, 1000, n_l).astype(np.int64) * 500_000
    rk = rng.randint(0, 8, n_r).astype(np.int64)
    rt = rng.randint(0, 1000, n_r).astype(np.int64) * 500_000
    rv = rng.randint(-50, 50, n_r).astype(np.int64)
    l = pa.table({"lid": pa.array(np.arange(n_l, dtype=np.int64)),
                  "k": pa.array(lk), "lt": _ts(lt)})
    r = pa.table({"k": pa.array(rk), "rt": _ts(rt),
                  "vm": pa.array(rv, pa.int64())})
    lo, hi = -30_000_000, 15_000_000
    got = T.range_join_agg(_ds(l), _ds(r), key="k", left_ts="lt",
                           right_ts="rt", val_milli_col="vm",
                           lo_offset_us=lo, hi_offset_us=hi) \
        .to_pandas().sort_values("lid").reset_index(drop=True)
    assert len(got) == n_l
    for i in range(n_l):
        m = (rk == lk[i]) & (rt >= lt[i] + lo) & (rt < lt[i] + hi)
        assert got.n_matched[i] == m.sum()
        assert got.sum_matched_milli[i] == rv[m].sum()


def test_sessionize_gap_semantics(ray_session):
    """Strict-gap rule: diff == gap stays in session, diff > gap breaks."""
    u = np.array([5, 5, 5, 5, 9], dtype=np.int64)
    ts = np.array([0, 10_000_000, 20_000_000, 30_000_001, 0], dtype=np.int64)
    ev = pa.table({"user_id": pa.array(u), "ts": _ts(ts),
                   "event_id": pa.array(np.arange(5, dtype=np.int64))})
    got = T.sessionize(_ds(ev), key="user_id", ts="ts",
                       order_tiebreak="event_id", gap_s=10) \
        .to_pandas().sort_values(["user_id", "session_n"]).reset_index(drop=True)
    # user 5: 0,10,20 in one session (gaps == 10 s), 30.000001 breaks
    assert list(got.user_id) == [5, 5, 9]
    assert list(got.session_n) == [1, 2, 1]
    assert list(got.n_events) == [3, 1, 1]
    assert list(got.dur_s) == [20, 0, 0]


def test_sessionize_random_vs_pandas(ray_session):
    rng = np.random.RandomState(23)
    n = 2000
    u = rng.randint(0, 40, n).astype(np.int64)
    ts = rng.randint(0, 10_000, n).astype(np.int64) * 1_000_000
    ev = pa.table({"user_id": pa.array(u), "ts": _ts(ts),
                   "event_id": pa.array(np.arange(n, dtype=np.int64))})
    gap_s = 300
    got = T.sessionize(_ds(ev), key="user_id", ts="ts",
                       order_tiebreak="event_id", gap_s=gap_s).to_pandas()
    df = pd.DataFrame({"u": u, "t": ts}).sort_values(["u", "t"])
    brk = (df.u.diff() != 0) | (df.t.diff() > gap_s * 1_000_000)
    df["s"] = brk.cumsum()
    ref = df.groupby(["u", "s"]).agg(n=("t", "size"), lo=("t", "min"),
                                     hi=("t", "max")).reset_index()
    ref["dur"] = (ref.hi - ref.lo) // 1_000_000
    assert len(got) == len(ref)
    a = got.sort_values(["user_id", "session_n"]).reset_index(drop=True)
    b = ref.sort_values(["u", "s"]).reset_index(drop=True)
    assert (a.n_events.values == b.n.values).all()
    assert (a.dur_s.values == b.dur.values).all()


def test_hopping_window_counts(ray_session):
    ts = np.array([0, 1_800_000_000, 3_599_000_000], dtype=np.int64)
    ev = pa.table({"g": pa.array(["a", "a", "a"]), "ts": _ts(ts),
                   "vm": pa.array([1, 10, 100], pa.int64())})
    got = T.hopping_window(_ds(ev), group="g", ts="ts", val_milli_col="vm",
                           window_s=3600, hop_s=1800) \
        .to_pandas().sort_values("window_start_s").reset_index(drop=True)
    # each event lands in windows [floor_1800(t) - 1800, floor_1800(t)]:
    # @0s → {-1800, 0}; @1800s → {0, 1800}; @3599s → {0, 1800}
    assert list(got.window_start_s) == [-1800, 0, 1800]
    assert list(got.n) == [1, 3, 2]
    assert list(got.sum_milli) == [1, 111, 110]


def test_grouped_quantiles_exact(ray_session):
    rng = np.random.RandomState(5)
    v = rng.randint(0, 500, 4000).astype(np.int64)
    g = np.where(rng.rand(4000) < 0.5, "x", "y")
    ev = pa.table({"g": pa.array(g.tolist()), "vm": pa.array(v, pa.int64())})
    got = T.grouped_quantiles(_ds(ev), group="g", val_milli_col="vm",
                              q_permille=(500, 900, 990)).to_pandas()
    for grp in ("x", "y"):
        vals = np.sort(v[g == grp])
        tot = len(vals)
        for qp in (500, 900, 990):
            need = -(-qp * tot // 1000)
            want = vals[need - 1]
            have = got[(got.g == grp) & (got.q_permille == qp)].v_milli.iloc[0]
            assert have == want, (grp, qp)


def test_rolling_sum_vs_pandas(ray_session):
    rng = np.random.RandomState(31)
    n = 1500
    u = rng.randint(0, 25, n).astype(np.int64)
    ts = rng.randint(0, 500, n).astype(np.int64) * 1_000_000
    v = rng.randint(-20, 20, n).astype(np.int64)
    ev = pa.table({"user_id": pa.array(u), "ts": _ts(ts),
                   "event_id": pa.array(np.arange(n, dtype=np.int64)),
                   "value_milli": pa.array(v, pa.int64())})
    got = T.rolling_sum(_ds(ev), key="user_id", ts="ts",
                        order_tiebreak="event_id",
                        val_milli_col="value_milli", window_rows=3) \
        .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True)
    df = pd.DataFrame({"u": u, "t": ts, "e": np.arange(n), "v": v}) \
        .sort_values(["u", "t", "e"])
    ref = df.groupby("u")["v"].rolling(3, min_periods=1).sum() \
        .reset_index(drop=True).to_numpy()
    df = df.reset_index(drop=True)
    df["r"] = ref
    df = df.sort_values(["u", "e"]).reset_index(drop=True)
    assert (got.rolling_milli.to_numpy() == df.r.to_numpy().astype(np.int64)).all()


def test_quantile_bucket_and_center(ray_session):
    rng = np.random.RandomState(41)
    n = 2000
    g = np.where(rng.rand(n) < 0.5, "a", "b")
    v = rng.randint(0, 1000, n).astype(np.int64)
    ev = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                   "event_type": pa.array(g.tolist()),
                   "value_milli": pa.array(v, pa.int64())})
    got = T.quantile_bucket_assign(_ds(ev), group="event_type",
                                   val_milli_col="value_milli") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == n
    for grp in ("a", "b"):
        vals = np.sort(v[g == grp])
        tot = len(vals)
        th = [vals[-(-qp * tot // 1000) - 1] for qp in (250, 500, 750)]
        mine = got[got.event_type == grp]
        want = 1 + (mine.value_milli.to_numpy()[:, None]
                    > np.array(th)).sum(axis=1)
        assert (mine.bucket.to_numpy() == want).all()
        assert set(mine.bucket) <= {1, 2, 3, 4}
    cen = T.groupwise_center(_ds(ev), group="event_type",
                             val_milli_col="value_milli") \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    for grp in ("a", "b"):
        mean_floor = int(v[g == grp].sum()) // int((g == grp).sum())
        mine = cen[cen.event_type == grp]
        assert (mine.centered_milli.to_numpy()
                == mine.value_milli.to_numpy() - mean_floor).all()


def test_debounce_window_semantics(ray_session):
    """Boundary: gap == window keeps suppressing (strict >); distinct keys
    never suppress each other even when interleaved."""
    u = np.array([1, 1, 1, 1, 2], dtype=np.int64)
    et = np.array(["a", "a", "a", "b", "a"], dtype=object)
    ts = np.array([0, 10_000_000, 10_000_001, 5_000_000, 1_000_000],
                  dtype=np.int64)
    ev = pa.table({"event_id": pa.array(np.arange(5, dtype=np.int64)),
                   "user_id": pa.array(u), "event_type": pa.array(et.tolist()),
                   "ts": _ts(ts)})
    got = T.debounce(_ds(ev), keys=["user_id", "event_type"], ts="ts",
                     order_tiebreak="event_id", window_s=10).to_pandas()
    # key (1,a): rows at 0, 10s (gap==10 → dropped), 10.000001s vs previous
    # ROW (10s) → gap 1µs → dropped. (1,b)@5s and (2,a)@1s are distinct keys.
    assert sorted(got.event_id) == [0, 3, 4]


def test_funnel_depths_windowed():
    """Windowed funnel: step k counts only strictly after step k-1 AND within
    the gap; users stall at the deepest reachable step."""
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.temporal import funnel_depths

    us = int(1e6)
    rows = [
        # user 1: view@0 → click@10s → purchase@20s  (depth 3)
        (1, 0, "view"), (1, 10 * us, "click"), (1, 20 * us, "purchase"),
        # user 2: click BEFORE view → stalls at view (depth 1)
        (2, 0, "click"), (2, 10 * us, "view"),
        # user 3: click too late (gap 60s) → depth 1
        (3, 0, "view"), (3, 120 * us, "click"),
        # user 4: never views (depth 0)
        (4, 0, "purchase"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = {r["depth"]: r["n_users"]
           for r in funnel_depths(ray.data.from_arrow(t),
                                  ["view", "click", "purchase"],
                                  max_gap_us=60 * us,
                                  num_partitions=2).take_all()}
    assert out == {3: 1, 1: 2, 0: 1}


def test_windowed_distinct_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.temporal import windowed_distinct

    ts = pa.array(np.array([10, 20, 3610, 3620, 3630, 7300], np.int64)
                  * 1_000_000).cast(pa.timestamp("us"))
    uid = pa.array([1, 1, 1, 2, 2, 3], pa.int64())
    ds = ray.data.from_arrow(pa.table({"ts": ts, "u": uid}))
    got = {r["window_start_s"]: r["n_distinct"]
           for r in windowed_distinct(ds, "ts", "u", window_s=3600,
                                      num_partitions=4).take_all()}
    assert got == {0: 1, 3600: 2, 7200: 1}


def test_next_event_lead_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.temporal import next_event

    # user 1: a@0 -> b@5 -> c@5 (tie broken by event_id); user 2: solo
    ts = pa.array(np.array([0, 5, 5, 9], np.int64) * 1_000_000) \
        .cast(pa.timestamp("us"))
    tbl = pa.table({"eid": pa.array([10, 12, 11, 13], pa.int64()),
                    "u": pa.array([1, 1, 1, 2], pa.int64()),
                    "ts": ts,
                    "etype": pa.array(["a", "c", "b", "z"])})
    ds = ray.data.from_arrow(tbl)
    got = {r["eid"]: (r["next_etype"], r["gap_us"])
           for r in next_event(ds, "u", "ts", "eid", "etype",
                               num_partitions=4).take_all()}
    # order within user 1: (0,10,a) -> (5,11,b) -> (5,12,c); 13 has no next
    assert got == {10: ("b", 5_000_000), 11: ("c", 0)}


def test_grouped_mad_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.temporal import grouped_mad

    # group a: values 1..7 -> median 4, |dev| = {3,2,1,0,1,2,3} -> MAD 2
    # group b: even count {1,2,3,10} -> ceil-rank median = 2, devs {1,0,1,8} -> MAD 1
    t = pa.table({"g": pa.array(["a"] * 7 + ["b"] * 4),
                  "v": pa.array(list(range(1, 8)) + [1, 2, 3, 10], pa.int64())})
    got = {r["g"]: (r["median_milli"], r["mad_milli"])
           for r in grouped_mad(ray.data.from_arrow(t), "g", "v").take_all()}
    assert got == {"a": (4, 2), "b": (2, 1)}
