"""cogroup_join / snapshot / distinct helpers — including the 64-bit-id
precision regression (null-padded int64 → float64 corruption above 2^53)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.relational import (
    cogroup_join,
    concat_blocks,
    distinct,
    snapshot,
)


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


BIG = 9_100_000_000_000_000_003  # > 2^53: float64 round-trip would corrupt it


def test_cogroup_inner_preserves_64bit_ids(mk):
    left = mk(pa.table({"k": pa.array([BIG, BIG + 2], pa.int64()),
                        "lval": pa.array([BIG + 7, BIG + 9], pa.int64())}))
    right = mk(pa.table({"k": pa.array([BIG], pa.int64()),
                         "rval": pa.array([BIG + 11], pa.int64())}))
    out = cogroup_join(left, right, ("k",), how="inner", num_partitions=4).take_all()
    assert out == [{"k": BIG, "lval": BIG + 7, "rval": BIG + 11}]


def test_cogroup_left_anti(mk):
    left = mk(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    right = mk(pa.table({"k": pa.array([2], pa.int64())}))
    out = sorted(r["k"] for r in cogroup_join(left, right, ("k",),
                                              how="left_anti", num_partitions=4).take_all())
    assert out == [1, 3]


def test_cogroup_left_outer_nulls(mk):
    left = mk(pa.table({"k": pa.array([1, 2], pa.int64())}))
    right = mk(pa.table({"k": pa.array([1], pa.int64()),
                         "v": pa.array([BIG + 5], pa.int64())}))
    rows = {r["k"]: r["v"] for r in cogroup_join(left, right, ("k",),
                                                 how="left_outer", num_partitions=4).take_all()}
    assert rows == {1: BIG + 5, 2: None}


def test_cogroup_left_outer_64bit_mixed_partition(mk):
    # Regression (ADVICE r1, high): with matched AND unmatched left rows in the
    # SAME partition group, pandas left-merge NaN-padding upcast right int64 →
    # float64, losing low bits of ids > 2^53. num_partitions=1 forces cohab.
    v = (1 << 62) + 12345
    left = mk(pa.table({"k": pa.array([1, 2], pa.int64())}))
    right = mk(pa.table({"k": pa.array([1], pa.int64()),
                         "v": pa.array([v], pa.int64())}))
    rows = {r["k"]: r["v"] for r in cogroup_join(left, right, ("k",),
                                                 how="left_outer", num_partitions=1).take_all()}
    assert rows == {1: v, 2: None}


def test_cogroup_multikey(mk):
    left = mk(pa.table({"a": pa.array([1, 1], pa.int64()),
                        "b": pa.array([10, 11], pa.int64()),
                        "x": pa.array([100, 101], pa.int64())}))
    right = mk(pa.table({"a": pa.array([1], pa.int64()),
                         "b": pa.array([11], pa.int64()),
                         "y": pa.array([7], pa.int64())}))
    out = cogroup_join(left, right, ("a", "b"), how="inner", num_partitions=4).take_all()
    assert out == [{"a": 1, "b": 11, "x": 101, "y": 7}]


def test_distinct_and_snapshot_and_concat(mk):
    ds = mk(pa.table({"x": pa.array([1, 1, 2, 3, 3], pa.int64())}))
    vals = sorted(r["x"] for r in distinct(ds, "x").take_all())
    assert vals == [1, 2, 3]
    snap = snapshot(ds)
    assert snap.count() == 5
    both = concat_blocks(ds, ds)
    assert both.count() == 10


def test_with_desc_rank_cross_block_ties(mk):
    """Distributed rank must equal count-of-strictly-greater even when a tie
    run spans multiple sorted blocks."""
    from osm_lump_ways_ray.stages.relational import with_desc_rank
    import ray.data

    vals = np.array([5, 5, 5, 5, 3, 3, 9, 1, 5, 3, 7, 7], dtype=np.int64)
    ids = np.arange(len(vals), dtype=np.int64)
    # many small blocks to force ties across block boundaries
    parts = [pa.table({"id": pa.array(ids[i:i + 2]),
                       "v": pa.array(vals[i:i + 2])}) for i in range(0, len(vals), 2)]
    ds = ray.data.from_arrow_refs([__import__("ray").put(t) for t in parts])
    out = {r["id"]: r["rk"] for r in with_desc_rank(ds, "v", out_col="rk").take_all()}
    expect = {int(i): int((vals > v).sum()) for i, v in zip(ids, vals)}
    assert out == expect


def test_snapshot_handles_pandas_blocks(ray_session):
    """A map_groups(batch_format='pandas') stage yields NATIVE pandas blocks;
    snapshot/_nonempty_refs must convert them to Arrow, including when a
    NON-EMPTY pandas block must be kept (the latent NameError path)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.relational import snapshot

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64())}))
    pandas_ds = ds.groupby("k").map_groups(
        lambda df: pd.DataFrame({"k": [int(df["k"].iloc[0])],
                                 "s": [int(df["v"].sum())]}),
        batch_format="pandas")
    out = snapshot(pandas_ds)
    got = {r["k"]: r["s"] for r in out.take_all()}
    assert got == {1: 30, 2: 30}


def test_rollup_agg_levels(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.relational import rollup_agg

    t = pa.table({"a": ["x", "x", "y", "y", "y"],
                  "b": ["p", "q", "p", "p", "q"],
                  "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    out = rollup_agg(ray.data.from_arrow(t), ["a", "b"],
                     {"n": (None, "count"), "s": ("v", "sum")},
                     num_partitions=4).to_pandas()
    got = {(r.a, r.b): (r.n, r.s) for r in out.itertuples()}
    assert got == {
        ("x", "p"): (1, 1), ("x", "q"): (1, 2),
        ("y", "p"): (2, 7), ("y", "q"): (1, 5),
        ("x", "ALL"): (2, 3), ("y", "ALL"): (3, 12),
        ("ALL", "ALL"): (5, 15),
    }


def test_grouped_mode_tiebreak(ray_session):
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.relational import grouped_mode

    t = pa.table({"g": ["a"] * 4 + ["b"] * 3,
                  "v": pa.array([7, 7, 3, 3, 9, 1, 1], pa.int64())})
    out = grouped_mode(ray.data.from_arrow(t), "g", "v",
                       num_partitions=4).to_pandas()
    got = {r.g: (r.v, r.n) for r in out.itertuples()}
    # group a: 7 and 3 tie at 2 → smaller value 3 wins; group b: 1 (x2) beats 9
    assert got == {"a": (3, 2), "b": (1, 2)}


def test_hll_distinct_tracks_exact_count(mk):
    from osm_lump_ways_ray.stages.relational import hll_distinct

    # 5000 distinct 48-bit hashes (md5 of the integers, like the query path)
    import hashlib

    vals = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
                     for i in range(5000)], dtype=np.int64)
    # duplicates must not move the estimate (register max is idempotent)
    ds = mk(pa.table({"x48": pa.array(np.r_[vals, vals[:2000]], pa.int64())}))
    row = hll_distinct(ds, x48_col="x48", p=9).take_all()[0]
    assert row["m"] == 512
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.15  # ~1.04/sqrt(512)≈4.6%
    only = hll_distinct(mk(pa.table({"x48": pa.array(vals, pa.int64())})),
                        x48_col="x48", p=9).take_all()[0]
    assert only == row  # dup-invariance, register-exact


def test_skew_join_matches_plain_join_both_routings(mk):
    from osm_lump_ways_ray.stages.relational import skew_join

    rng = np.random.default_rng(7)
    # heavy key 5 (60 rows), the rest near-uniform
    keys = np.r_[np.full(60, 5), rng.integers(0, 20, 140)].astype(np.int64)
    left = mk(pa.table({"k": pa.array(keys, pa.int64()),
                        "lv": pa.array(np.arange(200), pa.int64())}))
    right = mk(pa.table({"ck": pa.array(np.arange(20), pa.int64()),
                         "seg": pa.array([f"s{i % 3}" for i in range(20)])}))

    def canon(ds):
        return sorted((r["k"], r["lv"], r["seg"]) for r in ds.take_all())

    # hot_factor huge -> pure shuffle path; tiny -> everything broadcasts;
    # middle -> genuinely mixed. All three must agree exactly.
    base = canon(skew_join(left, right, on="k", right_on="ck",
                           hot_factor=1e9))
    mixed = canon(skew_join(left, right, on="k", right_on="ck",
                            hot_factor=2.0))
    allhot = canon(skew_join(left, right, on="k", right_on="ck",
                             hot_factor=0.01))
    assert base == mixed == allhot
    assert len(base) == 200  # every left row has a dimension match


def test_grouped_ols_integer_slope(mk):
    from osm_lump_ways_ray.stages.relational import grouped_ols

    # group a: y = 3x + 1 exactly -> slope_num/slope_den == 3
    x = np.arange(10, dtype=np.int64)
    tbl = pa.table({"g": pa.array(["a"] * 10 + ["b"] * 3),
                    "x": pa.array(np.r_[x, [1, 1, 1]], pa.int64()),
                    "y": pa.array(np.r_[3 * x + 1, [5, 7, 9]], pa.int64())})
    rows = {r["g"]: r for r in grouped_ols(mk(tbl), "g", "x", "y",
                                           num_partitions=2).take_all()}
    a = rows["a"]
    assert a["slope_num"] == 3 * a["slope_den"] != 0
    assert (a["n"], a["sum_x"], a["sum_y"]) == (10, 45, 145)
    b = rows["b"]   # all x equal -> degenerate den = 0
    assert b["slope_den"] == 0 and b["n"] == 3


def test_bloom_semi_join_exact_even_with_tiny_bitmap(mk):
    from osm_lump_ways_ray.stages.relational import bloom_semi_join

    big = mk(pa.table({"k": pa.array(np.arange(500) % 50, pa.int64()),
                       "v": pa.array(np.arange(500), pa.int64())}))
    # keys 0..9 plus duplicates (the semi-join must not duplicate big rows)
    keys = mk(pa.table({"ok": pa.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
                                        3, 3, 7], pa.int64())}))
    expect = sorted((int(k), int(v)) for k, v in
                    zip(np.arange(500) % 50, np.arange(500)) if k < 10)
    # 256-bit bitmap -> false positives guaranteed; exact finish absorbs them
    out = bloom_semi_join(big, keys, "k", key_col="ok", m_bits=256,
                          k_hashes=2, num_partitions=4)
    got = sorted((r["k"], r["v"]) for r in out.take_all())
    assert got == expect
    # roomy bitmap agrees too
    out2 = bloom_semi_join(big, keys, "k", key_col="ok", m_bits=1 << 16,
                           k_hashes=3, num_partitions=4)
    assert sorted((r["k"], r["v"]) for r in out2.take_all()) == expect


def test_pivot_counts_fixed_domain(mk):
    from osm_lump_ways_ray.stages.relational import pivot_counts

    t = pa.table({"r": pa.array(["a", "a", "a", "b"]),
                  "c": pa.array([0, 0, 2, 9], pa.int64())})  # 9 outside domain
    out = {row["r"]: (row["n_0"], row["n_1"], row["n_2"])
           for row in pivot_counts(mk(t), "r", "c", range(3),
                                   num_partitions=2).take_all()}
    assert out == {"a": (2, 0, 1), "b": (0, 0, 0)}


def test_table_checksum_order_invariant_and_wrap_safe(mk):
    from osm_lump_ways_ray.stages.relational import table_checksum

    # 70k near-max 48-bit values: a naive int64 block sum would wrap
    vals = np.full(70_000, (1 << 48) - 1, np.int64)
    a = table_checksum(mk(pa.table({"x48": pa.array(vals)})), "x48").take_all()[0]
    MOD = (1 << 61) - 1
    assert a["checksum"] == (70_000 * ((1 << 48) - 1)) % MOD
    assert a["n_rows"] == 70_000
    # permutation invariance
    rng = np.random.default_rng(3)
    mixed = np.r_[vals[:100], rng.integers(0, 1 << 48, 100)]
    c1 = table_checksum(mk(pa.table({"x48": pa.array(mixed)})), "x48").take_all()[0]
    c2 = table_checksum(mk(pa.table({"x48": pa.array(mixed[::-1].copy())})),
                        "x48").take_all()[0]
    assert c1 == c2


def test_dataset_diff_categories(mk):
    from osm_lump_ways_ray.stages.relational import dataset_diff

    v1 = mk(pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                      "h": pa.array([10, 20, 30, 40], pa.int64())}))
    # 1 unchanged, 2 changed, 3 removed, 5 added
    v2 = mk(pa.table({"k": pa.array([1, 2, 4, 5], pa.int64()),
                      "h": pa.array([10, 21, 40, 50], pa.int64())}))
    got = {r["category"]: r["n_keys"]
           for r in dataset_diff(v1, v2, "k", "h",
                                 num_partitions=4).take_all()}
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_new_ops_empty_inputs(mk):
    from osm_lump_ways_ray.stages.relational import bloom_semi_join, skew_join

    empty = mk(pa.table({"k": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())}))
    one = mk(pa.table({"k": pa.array([1], pa.int64()),
                       "seg": pa.array(["s"], pa.string())}))
    assert skew_join(empty, one, on="k").take_all() == []
    ek = mk(pa.table({"ok": pa.array([], pa.int64())}))
    big = mk(pa.table({"k": pa.array([1, 2], pa.int64()),
                       "v": pa.array([7, 8], pa.int64())}))
    assert bloom_semi_join(big, ek, "k", key_col="ok").take_all() == []


def test_embedding_covariance_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.similarity import embedding_covariance

    rng = np.random.default_rng(11)
    x = rng.uniform(-0.5, 0.5, (300, 4)).astype(np.float32)
    tbl = pa.table({"embedding": pa.array(list(x),
                                          pa.list_(pa.float32()))})
    got = {(r["i"], r["j"]): r["s"]
           for r in embedding_covariance(
               ray.data.from_arrow(tbl), scale_bits=20,
               num_partitions=2).take_all()}
    q = np.floor(x.astype(np.float64) * (1 << 20) + 0.5).astype(object)
    g = (q.T @ q)  # object dtype -> exact Python-int arithmetic
    for i in range(4):
        for j in range(i, 4):
            assert got[(i + 1, j + 1)] == int(g[i, j])


def test_with_running_sum_both_paths(ray_session):
    """Exclusive prefix sum in key order: driver base case and the
    sorted-block distributed path must agree with numpy."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.relational import with_running_sum

    rng = np.random.RandomState(5)
    n = 999
    key = rng.permutation(n).astype(np.int64)
    val = rng.randint(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array(key),
                                       "v": pa.array(val)})) \
        .repartition(7)
    order = np.argsort(key)
    want_sorted = np.cumsum(val[order]) - val[order]
    want = {int(k): float(c) for k, c in zip(key[order], want_sorted)}
    for base in (2_000_000, 0):  # driver base case, then distributed path
        got = {int(r["k"]): float(r["cum_excl"])
               for r in with_running_sum(ds, "k", "v",
                                         base_case_rows=base).take_all()}
        assert got == want, f"base_case_rows={base}"


def test_det_shuffle_and_packing_parallelism_invariant(ray_session):
    """The shuffle-shard assignment and token-bin packing must be identical
    at different partition counts (determinism is their whole point)."""
    from osm_lump_ways_ray.pipelines.queries import QUERIES

    def rows(name):
        r = QUERIES[name]("/root/testdata/sf0.001")
        try:
            df = r.to_pandas()
        except AttributeError:
            df = r
        return df.to_dict("records")

    import osm_lump_ways_ray.stages.relational as rel

    a = rows("det_shuffle")
    b = rows("det_shuffle")
    assert a == b
    p1 = rows("token_packing")
    p2 = rows("token_packing")
    assert p1 == p2
    # and the prefix-sum primitive is partition-count invariant
    import numpy as np
    import pyarrow as pa
    import ray.data

    t = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                  "v": pa.array((np.arange(50) % 7).astype(np.int64))})
    outs = []
    for parts in (1, 3, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        got = sorted((int(r["k"]), float(r["cum_excl"])) for r in
                     rel.with_running_sum(ds, "k", "v",
                                          base_case_rows=0).take_all())
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
