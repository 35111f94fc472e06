"""End-to-end flagship lump pipeline test vs a pure-Python oracle."""

import numpy as np
import pytest

from osm_lump_ways_ray.functions.haversine import haversine_m_fp
from osm_lump_ways_ray.sources import pages as P


N_PAGES = 240  # 40 chains of 6 → 10 runs of 4 chains


@pytest.fixture(scope="module")
def lump_result(ray_session, tmp_path_factory):
    from osm_lump_ways_ray.pipelines.lump import lump

    ds = P.synth_pages_dataset(N_PAGES, seed=42, override_num_blocks=4)
    ck = tmp_path_factory.mktemp("lump_ck")
    return lump(ds, checkpoint_dir=str(ck), num_partitions=8)


def _oracle():
    """Driver-side pure-Python re-computation (independent of the library): ways
    → A1 degree weights → pillar set → M5 contraction → per-group components.

    Reference semantics: root_nodeid / num_nodes refer to the CONTRACTED graph's
    vertices (Graph2 holds only contracted vertices; root = its min vertex —
    src/way_group.rs:29, first_vertex of a BTreeMap); length sums the full
    polyline including interior nodes (src/way_group.rs:38-44)."""
    import networkx as nx

    t = P.geocode_batch(P.synth_pages_table(N_PAGES, seed=42))
    node_id = t["node_id"].to_numpy()
    lat = dict(zip(node_id.tolist(), t["lat"].to_numpy().tolist()))
    lon = dict(zip(node_id.tolist(), t["lon"].to_numpy().tolist()))

    n_chains = N_PAGES // P.CHAIN_LEN
    chains = {}
    for c in range(n_chains):
        members = [int(node_id[i]) for i in range(c * P.CHAIN_LEN, (c + 1) * P.CHAIN_LEN)]
        if c and c % P.BREAK_EVERY:
            members = [int(node_id[c * P.CHAIN_LEN - 1])] + members
        chains[c] = members

    weights = {}
    for members in chains.values():
        for pos, n in enumerate(members):
            w = 1 if pos == 0 else 2
            if pos == len(members) - 1:
                w += 1
            weights[n] = weights.get(n, 0) + w
    pillars = {n for n, w in weights.items() if w != 2}

    graphs = {}
    seg_len = {}
    for c, members in chains.items():
        name = f"g{(c // P.BREAK_EVERY) % 64}"
        g = graphs.setdefault(name, nx.Graph())
        pos = 0
        while len(members) - pos >= 2:
            nxt = next(i for i in range(pos + 1, len(members))
                       if members[i] in pillars or i == len(members) - 1)
            poly = members[pos:nxt + 1]
            g.add_edge(poly[0], poly[-1])
            length = sum(float(haversine_m_fp(
                np.array([lat[a]]), np.array([lon[a]]),
                np.array([lat[b]]), np.array([lon[b]]))[0])
                for a, b in zip(poly, poly[1:]))
            seg_len[(name, poly[0], poly[-1])] = length
            pos = nxt

    comps = {}
    for name, g in graphs.items():
        for comp in nx.connected_components(g):
            root = min(comp)
            length = sum(seg_len[(name, a, b)] if (name, a, b) in seg_len
                         else seg_len[(name, b, a)]
                         for a, b in g.subgraph(comp).edges)
            comps[(name, root)] = {"num_nodes": len(comp), "length_m": length}
    return comps


def test_lump_components_match_oracle(lump_result):
    oracle = _oracle()
    got = lump_result["components"].take_all()
    # map g-hash back to name via edges table
    from osm_lump_ways_ray.functions.hashing import hash64

    by_key = {}
    name_of_g = {hash64(f"g{i}"): f"g{i}" for i in range(64)}
    for r in got:
        by_key[(name_of_g[r["g"]], r["component_id"])] = r
    assert set(by_key) == set(oracle)
    for k, exp in oracle.items():
        assert by_key[k]["num_nodes"] == exp["num_nodes"], k
        assert by_key[k]["length_m"] == pytest.approx(exp["length_m"], rel=1e-9), k


def test_lump_sorted_desc(lump_result):
    lens = [r["length_m"] for r in lump_result["components"].take_all()]
    assert lens == sorted(lens, reverse=True)


def test_lump_tiles_cover_all_linked_nodes(lump_result):
    tiles = lump_result["tiles"].take_all()
    total = sum(r["num_nodes"] for r in tiles)
    labels_n = lump_result["labels"].count()
    assert total == labels_n
    assert all(r["num_components"] >= 1 for r in tiles)


def test_lump_metrics_lineage(lump_result):
    m = lump_result["metrics"]
    assert m["nodes"] == N_PAGES
    assert m["ways"] == N_PAGES // P.CHAIN_LEN
    assert m["components"] > 0 and m["tiles"] > 0
    assert m["t_total_s"] > 0


def test_finalize_components_props_and_ranks(lump_result, tmp_path):
    from osm_lump_ways_ray.pipelines.lump import finalize_components, write_outputs

    final = finalize_components(lump_result["components"], lump_result["edges"],
                                num_partitions=4)
    rows = final.take_all()
    assert rows, "no components"
    n = len(rows)
    for r in rows:
        assert r["root_nodeid"] == r["component_id"]
        assert r["root_nodeid_120"] == r["component_id"] % 120
        assert r["tag_group_0"].startswith("g")
        assert 0 <= r["length_desc_rank"] < n
        assert r["length_asc_rank"] == n - r["length_desc_rank"]
        assert 0 <= r["length_m_fraction_longest"] <= 1.0
    # ranks are a permutation-ish: the longest component has desc_rank 0
    longest = max(rows, key=lambda r: r["length_m"])
    assert longest["length_desc_rank"] == 0

    out = write_outputs(lump_result, str(tmp_path / "out"))
    import os

    for name in ("components", "labels", "tiles"):
        assert os.path.exists(os.path.join(out, name, "_SUCCESS"))
    # resumability: second call is a no-op (mtimes unchanged)
    m1 = os.path.getmtime(os.path.join(out, "components", "_SUCCESS"))
    write_outputs(lump_result, out)
    assert os.path.getmtime(os.path.join(out, "components", "_SUCCESS")) == m1


def test_lump_joined_pillars_parity(ray_session, tmp_path_factory, lump_result):
    """broadcast_pillars=False (join-based contraction, the scale path) must
    produce identical components to the broadcast default."""
    from osm_lump_ways_ray.pipelines.lump import lump

    ds = P.synth_pages_dataset(N_PAGES, seed=42, override_num_blocks=4)
    res = lump(ds, num_partitions=8, broadcast_pillars=False)

    def comp_key(r):
        # length rounded to mm: segment-sum ORDER differs between the two
        # contraction paths, so the float total can differ in the last ulp
        return sorted((row["g"], row["component_id"],
                       round(row["length_m"], 3), row["num_nodes"])
                      for row in r["components"].take_all())

    assert comp_key(res) == comp_key(lump_result)
