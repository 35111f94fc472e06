"""Spatial ops: tile assignment, PIP, kNN join, hot-cell salting."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.stages.spatial import (
    NearestAnchor,
    PIPGeocoder,
    Polygon,
    assign_tiles,
    salt_hot_cells,
)


@pytest.fixture(scope="module")
def mk(ray_session):
    import ray.data

    return ray.data.from_arrow


def test_polygon_contains():
    sq = Polygon("sq", [(0, 0), (0, 10), (10, 10), (10, 0)])
    inside = sq.contains(np.array([5.0, 15.0, 5.0]), np.array([5.0, 5.0, 15.0]))
    np.testing.assert_array_equal(inside, [True, False, False])


def test_pip_first_match_wins():
    a = Polygon("a", [(0, 0), (0, 10), (10, 10), (10, 0)])
    b = Polygon("b", [(5, 5), (5, 20), (20, 20), (20, 5)])
    geo = PIPGeocoder([a, b])
    out = geo(pa.table({"lat": pa.array([7.0, 15.0, 50.0]),
                        "lon": pa.array([7.0, 15.0, 50.0])}))
    assert out["area"].to_pylist() == ["a", "b", "unknown_area"]


def test_nearest_anchor_tiebreak():
    anchors = (np.array([5, 3], dtype=np.int64),
               np.array([0, 0], dtype=np.int64),
               np.array([0, 0], dtype=np.int64))  # two anchors at same point
    na = NearestAnchor(anchors)
    out = na(pa.table({"lat": pa.array([0], pa.int64()),
                       "lon": pa.array([1000], pa.int64())}))
    assert out["nearest_anchor"].to_pylist() == [3]  # lower id wins ties


def test_assign_tiles_and_salting(mk):
    n = 1000
    # hot cell: 90% of nodes at one location (tile_hotcell fixture shape)
    lat = np.where(np.arange(n) % 10 == 0,
                   np.arange(n) * 1000, 450_000_000).astype(np.int64)
    lon = np.full(n, 900_000_000, dtype=np.int64)
    ds = mk(pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                      "lat": pa.array(lat), "lon": pa.array(lon)}))
    tiled = assign_tiles(ds, res=6)
    salted = salt_hot_cells(tiled, threshold=100, salt=8)
    rows = salted.take_all()
    from collections import Counter

    per_salted = Counter(r["salted_cell"] for r in rows)
    # the hot cell (900 rows) must split into 8 sub-keys, each ≤ ~squarely split
    assert max(per_salted.values()) < 900
    # cold cells keep exactly one salted key each (cell*salt)
    cold = [r for r in rows if r["lat"] != 450_000_000]
    assert all(r["salted_cell"] % 8 == 0 for r in cold)


def test_knn_partitioned_matches_broadcast(mk):
    """Partitioned cell-neighborhood kNN must equal the exact broadcast answer,
    including points whose true nearest anchor lies OUTSIDE their 3×3
    neighborhood (forced by clustering anchors far away at coarse res)."""
    from osm_lump_ways_ray.stages.spatial import (knn_join_broadcast,
                                                  knn_join_partitioned)

    rng = np.random.RandomState(7)
    n = 400
    lat = rng.randint(-800_000_000, 800_000_000, size=n).astype(np.int64)
    lon = rng.randint(-1_700_000_000, 1_700_000_000, size=n).astype(np.int64)
    pts = mk(pa.table({"node_id": pa.array(np.arange(n, dtype=np.int64)),
                       "lat": pa.array(lat), "lon": pa.array(lon)}))
    m = 17  # sparse anchors → many anchor-free neighborhoods → residue path
    alat = rng.randint(-800_000_000, 800_000_000, size=m).astype(np.int64)
    alon = rng.randint(-1_700_000_000, 1_700_000_000, size=m).astype(np.int64)
    anchors = mk(pa.table({"anchor_id": pa.array(np.arange(m, dtype=np.int64)),
                           "lat": pa.array(alat), "lon": pa.array(alon)}))
    part = {r["node_id"]: (r["nearest_anchor"], r["anchor_dist_dm"])
            for r in knn_join_partitioned(pts, anchors, res=5,
                                          num_partitions=4).take_all()}
    bc = knn_join_broadcast(
        pts, (np.arange(m, dtype=np.int64), alat, alon))
    expect = {r["node_id"]: (r["nearest_anchor"], r["anchor_dist_dm"])
              for r in bc.take_all()}
    assert part == expect


def test_pip_prefilter_same_result(mk):
    """The cell prefilter must not change PIP answers (pure skip optimization)."""
    from osm_lump_ways_ray.stages.spatial import PIPGeocoder, Polygon

    poly = Polygon("box", [(0, 0), (0, 100_000_000),
                           (100_000_000, 100_000_000), (100_000_000, 0)])
    batch = pa.table({
        "lat": pa.array([50_000_000, 500_000_000, -400_000_000], pa.int64()),
        "lon": pa.array([50_000_000, 500_000_000, 1_000_000_000], pa.int64()),
    })
    out = PIPGeocoder([poly])(batch)
    assert out["area"].to_pylist() == ["box", "unknown_area", "unknown_area"]


def test_ivf_persisted_index_matches_bruteforce(mk, tmp_path):
    """Persisted partition-pruned IVF with nprobe=nlist must equal brute force;
    resumable build (re-run skips finished lists)."""
    import ray.data
    from osm_lump_ways_ray.stages.similarity import (ivf_build_index,
                                                     knn_bruteforce,
                                                     knn_ivf_indexed)

    rng = np.random.RandomState(3)
    n, d = 300, 8
    emb = rng.randn(n, d).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, r)) for r in emb],
                                        pa.list_(pa.float32()))})
    ds = mk(t)
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, idx, nlist=4)
    ivf_build_index(ds, idx, nlist=4)  # resume path: all lists skip
    qids = np.arange(3, dtype=np.int64)
    qmat = emb[:3].astype(np.float64)
    got = [(r["query_id"], r["rank"], r["vec_id"])
           for r in knn_ivf_indexed(idx, (qids, qmat), k=5, nprobe=4).take_all()]
    expect = [(r["query_id"], r["rank"], r["vec_id"])
              for r in knn_bruteforce(ds, (qids, qmat), k=5).take_all()]
    assert sorted(got) == sorted(expect)


def test_ivf_build_crash_safe_and_kmeans(mk, tmp_path):
    """A build interrupted mid-write (leftover .tmp-lists, no _SUCCESS) must
    rebuild cleanly with no duplicated vectors (r2 ADVICE), and the k-means
    centroids must cover every vector exactly once across lists."""
    import os

    import ray.data
    from osm_lump_ways_ray.stages.similarity import (ivf_build_index,
                                                     kmeans_centroids,
                                                     knn_bruteforce,
                                                     knn_ivf_indexed)

    rng = np.random.RandomState(7)
    n, d = 200, 6
    emb = rng.randn(n, d).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, r)) for r in emb],
                                        pa.list_(pa.float32()))})
    ds = mk(t)

    cent = kmeans_centroids(ds, 4, iters=3)
    assert cent.shape == (4, d)
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, rtol=1e-9)

    idx = str(tmp_path / "ivf")
    # simulate a crash: stage dir exists from a killed run, no _SUCCESS
    os.makedirs(os.path.join(idx, ".tmp-lists", "ivf_list=0"), exist_ok=True)
    ivf_build_index(ds, idx, nlist=4)
    ids = sorted(r["vec_id"] for r in ray.data.read_parquet(
        os.path.join(idx, "lists")).take_all())
    assert ids == list(range(n))  # each vector in exactly one list
    # finished index: rebuild is a no-op (skip path)
    ivf_build_index(ds, idx, nlist=4)
    qids = np.arange(2, dtype=np.int64)
    qmat = emb[:2].astype(np.float64)
    got = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in
                 knn_ivf_indexed(idx, (qids, qmat), k=4, nprobe=4).take_all())
    expect = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in
                    knn_bruteforce(ds, (qids, qmat), k=4).take_all())
    assert got == expect


def test_ivf_recall_at_reduced_nprobe(mk, tmp_path):
    """ANN quality gate: on clustered data, a k-means IVF probed at
    nprobe=2 of nlist=8 must reach ≥0.9 recall@10 vs brute force (the scale
    path trades exactly this recall for an ~nlist/nprobe read reduction)."""
    import ray.data
    from osm_lump_ways_ray.stages.similarity import (ivf_build_index,
                                                     knn_bruteforce,
                                                     knn_ivf_indexed)

    rng = np.random.RandomState(11)
    n_clusters, per, d = 8, 60, 16
    centers = rng.randn(n_clusters, d) * 5.0
    emb = np.concatenate([
        centers[c] + rng.randn(per, d) * 0.3 for c in range(n_clusters)
    ]).astype(np.float32)
    n = len(emb)
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, r)) for r in emb],
                                        pa.list_(pa.float32()))})
    ds = mk(t)
    idx = str(tmp_path / "ivf_recall")
    ivf_build_index(ds, idx, nlist=8, kmeans_iters=5)

    qids = np.arange(16, dtype=np.int64)
    qmat = emb[:: n // 16][:16].astype(np.float64)
    k = 10
    truth = {}
    for r in knn_bruteforce(ds, (qids, qmat), k=k).take_all():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in knn_ivf_indexed(idx, (qids, qmat), k=k, nprobe=2).take_all():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    recall = hits / (len(truth) * k)
    assert recall >= 0.9, f"recall@10 = {recall:.3f}"


def test_embedding_lsh_subset_of_bruteforce(ray_session):
    """LSH candidates are exactly the bucket-colliding subset of the
    brute-force pair set; planted near-dups (equal leading signs) are found."""
    import ray.data

    from osm_lump_ways_ray.stages.similarity import (_normalize,
                                                     embedding_lsh_neardup)

    rng = np.random.RandomState(9)
    base = rng.randn(40, 16)
    # plant 5 near-dup pairs: tiny perturbation keeps signs and cosine ≥ 0.99
    dups = base[:5] + rng.randn(5, 16) * 1e-3
    mat = np.vstack([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in mat],
                              pa.list_(pa.float32())),
    })
    got = embedding_lsh_neardup(ray.data.from_arrow(tbl), threshold=0.9,
                                sign_dims=8, band_bits=4).to_pandas()
    got_pairs = set(zip(got.u, got.v))
    # brute-force reference with the same bucketing rule
    norm = _normalize(mat.astype(np.float64))
    sims = norm @ norm.T
    sign = (mat[:, :8] > 0).astype(int)
    w = 2 ** np.arange(4)
    b0, b1 = sign[:, :4] @ w, sign[:, 4:8] @ w
    want = {(int(i), int(j)) for i in range(len(mat)) for j in range(i + 1, len(mat))
            if sims[i, j] >= 0.9 and (b0[i] == b0[j] or b1[i] == b1[j])}
    assert got_pairs == want
    # every planted pair collides in both bands → must be recalled
    planted = {(i, 40 + i) for i in range(5)}
    assert planted <= got_pairs


def test_embedding_neardup_blocked_exact(ray_session):
    """Blocked cross-join (one task per unordered block pair, VERDICT r3 #3)
    must equal the in-process all-pairs set EXACTLY — at several block counts,
    including rows_per_block < n (multi-block) and > n (single block)."""
    import ray.data

    from osm_lump_ways_ray.stages.similarity import (_normalize,
                                                     embedding_neardup_blocked)

    rng = np.random.RandomState(17)
    mat = rng.randn(60, 12)
    mat[10:15] = mat[:5] + rng.randn(5, 12) * 1e-3  # planted near-dups
    ids = np.arange(60, dtype=np.int64) * 7 + 3     # non-dense ids
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.astype(np.float32) for row in mat],
                              pa.list_(pa.float32())),
    })
    norm = _normalize(mat.astype(np.float32).astype(np.float64))
    sims = norm @ norm.T
    want = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i in range(60) for j in range(i + 1, 60)
            if sims[i, j] >= 0.35}
    assert len(want) >= 5
    for rpb in (7, 25, 1000):
        got = embedding_neardup_blocked(
            ray.data.from_arrow(tbl), threshold=0.35,
            rows_per_block=rpb).to_pandas()
        assert set(zip(got.u, got.v)) == want, f"rows_per_block={rpb}"
        assert len(got) == len(want), f"dup rows at rows_per_block={rpb}"


def test_knn_join_auto_forced_path_parity(ray_session):
    """knn_join_auto must give identical (node_id, nearest_anchor) via both
    forced paths, and the count-based auto-select must pick each path at the
    matching threshold."""
    import ray.data

    from osm_lump_ways_ray.stages.spatial import knn_join_auto

    rng = np.random.RandomState(5)
    n = 300
    lat = (rng.uniform(-60, 60, n) * 1e7).astype(np.int64)
    lon = (rng.uniform(-170, 170, n) * 1e7).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    is_anchor = ids % 11 == 0
    pts = ray.data.from_arrow(pa.table({
        "node_id": pa.array(ids[~is_anchor]),
        "lat": pa.array(lat[~is_anchor]), "lon": pa.array(lon[~is_anchor])}))
    anc = ray.data.from_arrow(pa.table({
        "anchor_id": pa.array(ids[is_anchor]),
        "lat": pa.array(lat[is_anchor]), "lon": pa.array(lon[is_anchor])}))

    def pairs(ds):
        return sorted((r["node_id"], r["nearest_anchor"])
                      for r in ds.select_columns(
                          ["node_id", "nearest_anchor"]).take_all())

    bc = pairs(knn_join_auto(pts, anc, force_path="broadcast"))
    pt = pairs(knn_join_auto(pts, anc, force_path="partitioned",
                             num_partitions=4))
    assert bc == pt
    # auto picks broadcast under the threshold, partitioned above it
    assert pairs(knn_join_auto(pts, anc, max_broadcast_anchors=1000)) == bc
    assert pairs(knn_join_auto(pts, anc, max_broadcast_anchors=3,
                               num_partitions=4)) == bc


def test_distributed_hull_matches_local():
    """hull-of-hulls over 7 blocks == one local monotone chain, including
    colinear boundary points (non-strict definition) and min-id dedup of
    duplicate positions."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm_lump_ways_ray.stages.spatial import (_monotone_chain,
                                                  convex_hull_distributed)

    rng = np.random.default_rng(11)
    n = 4000
    lat = rng.integers(-9_000_000, 9_000_000, n)
    lon = rng.integers(-18_000_000, 18_000_000, n)
    # plant a colinear run on the top edge + a duplicate position
    lat[:4] = 9_500_000
    lon[:4] = np.array([-18_500_000, -5_000_000, 3_000_000, 18_500_000])
    lat[4], lon[4] = lat[0], lon[0]  # duplicate of a hull corner, higher id
    ids = np.arange(1, n + 1)
    ds = ray.data.from_arrow(pa.table({
        "node_id": pa.array(ids, pa.int64()),
        "lat": pa.array(lat, pa.int64()),
        "lon": pa.array(lon, pa.int64()),
    })).repartition(7)
    got = sorted((r["lat"], r["lon"], r["node_id"])
                 for r in convex_hull_distributed(ds).take_all())
    keep = _monotone_chain(lat, lon)
    exp_pts = {(int(lat[i]), int(lon[i])) for i in keep}
    exp = sorted((la, lo, min(int(ids[j]) for j in range(n)
                              if lat[j] == la and lon[j] == lo))
                 for la, lo in exp_pts)
    assert got == exp
    assert {(la, lo) for la, lo, _ in got} >= {(9_500_000, -5_000_000),
                                               (9_500_000, 3_000_000)}


def test_dist_to_longer_matches_bruteforce(mk):
    """Grid-bucketed nearest-longer-group distance must equal the quadratic
    answer, including groups whose nearest longer point lies outside their
    3x3 neighborhood (sparse clusters at coarse res force widening)."""
    from osm_lump_ways_ray.functions.haversine import haversine_m_fp
    from osm_lump_ways_ray.stages.spatial import dist_to_longer_join

    rng = np.random.RandomState(11)
    n_groups, pts_per = 12, 8
    g = np.repeat(np.arange(n_groups, dtype=np.int64), pts_per)
    c = np.zeros(len(g), np.int64)
    # distinct lengths (one tie pair to exercise the lexicographic order)
    lengths = (np.arange(n_groups, dtype=np.float64) * 100.0 + 50.0)
    lengths[3] = lengths[7]
    L = lengths[g]
    lat = rng.randint(-800_000_000, 800_000_000, len(g)).astype(np.int64)
    lon = rng.randint(-1_700_000_000, 1_700_000_000, len(g)).astype(np.int64)
    pts = mk(pa.table({"g": pa.array(g), "component_id": pa.array(c),
                       "length_m": pa.array(L, pa.float64()),
                       "lat": pa.array(lat), "lon": pa.array(lon)}))
    got = {(r["g"], r["component_id"]): r["dist_to_longer_m"]
           for r in dist_to_longer_join(pts, res=5,
                                        num_partitions=4).take_all()}
    # quadratic reference
    d = haversine_m_fp(lat[:, None].astype(np.float64),
                       lon[:, None].astype(np.float64),
                       lat[None, :].astype(np.float64),
                       lon[None, :].astype(np.float64))
    key = np.stack([L, g.astype(np.float64), c.astype(np.float64)], axis=1)
    longer = ((key[None, :, 0] > key[:, None, 0])
              | ((key[None, :, 0] == key[:, None, 0])
                 & ((key[None, :, 1] > key[:, None, 1])
                    | ((key[None, :, 1] == key[:, None, 1])
                       & (key[None, :, 2] > key[:, None, 2])))))
    dm = np.where(longer, d, np.inf)
    want = {}
    for gi in range(n_groups):
        best = dm[g == gi].min()
        if np.isfinite(best):
            want[(gi, 0)] = best
    assert set(got) == set(want)            # global max group omitted
    assert (n_groups - 1, 0) not in got
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
