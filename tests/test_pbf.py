"""Native OSM PBF codec + Ray readers (sources/pbf.py): protobuf wire
roundtrips, delta/zigzag extremes, nonstandard granularity, unknown-field
skipping, multi-blob sharding, and the Dataset readers."""

import numpy as np
import pyarrow as pa
import pytest

from osm_lump_ways_ray.sources.pbf import (_blob_payload, _field_bytes,
                                           _field_varint,
                                           decode_primitive_block,
                                           decode_varints, encode_packed,
                                           encode_varint, scan_blob_spans,
                                           write_pbf, zigzag_decode,
                                           zigzag_encode)


def test_varint_zigzag_roundtrip_extremes():
    vals = [0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63, -12345]
    dec = zigzag_decode(decode_varints(encode_packed(vals, zigzag=True)))
    assert dec.tolist() == vals
    # unsigned path incl the full-64-bit wrap
    u = [0, 5, 2**63 - 1, 2**64 - 1]
    assert decode_varints(encode_packed(u)).view(np.uint64).tolist() == u
    assert zigzag_encode(-1) == 1 and zigzag_encode(1) == 2
    assert decode_varints(encode_varint(2**64 - 1)).view(np.uint64)[0] \
        == 2**64 - 1


def _fixture(tmp_path, features_per_blob=200):
    rng = np.random.RandomState(3)
    ids = np.unique(rng.randint(1, 10**12, 600).astype(np.int64))[:500]
    lat = rng.randint(-900000000, 900000000, len(ids)).astype(np.int64)
    lon = rng.randint(-1800000000, 1800000000, len(ids)).astype(np.int64)
    ways = [(int(1000 + i),
             ids[rng.choice(len(ids), rng.randint(2, 9), replace=False)],
             {"name": f"w{i % 7}", "waterway": "river"} if i % 3 == 0 else {})
            for i in range(60)]
    rels = [(int(5000 + i),
             [(1, int(1000 + j), "main") for j in range(i % 4 + 1)],
             {"type": "waterway"}) for i in range(9)]
    path = str(tmp_path / "rt.osm.pbf")
    info = write_pbf(path, nodes=(ids, lat, lon), ways=ways, relations=rels,
                     features_per_blob=features_per_blob)
    return path, info, (ids, lat, lon), ways, rels


def test_pbf_file_roundtrip(tmp_path):
    path, info, (ids, lat, lon), ways, rels = _fixture(tmp_path)
    assert info["n_blobs"] >= 4  # header + ≥3 sharded data blobs
    nid, nlat, nlon = [], [], []
    wid, wrefs, wkeys, wvals = [], [], [], []
    rid, rmids, rtypes, rroles = [], [], [], []
    for btype, off, size in scan_blob_spans(path):
        if btype != "OSMData":
            continue
        with open(path, "rb") as f:
            f.seek(off)
            blk = decode_primitive_block(_blob_payload(f.read(size)))
        nid.append(blk["node_id"])
        nlat.append(blk["lat"])
        nlon.append(blk["lon"])
        st = blk["strings"]

        def segs(flat, lens):
            return (np.split(flat, np.cumsum(lens)[:-1]) if len(lens)
                    else [])

        wid.extend(blk["way_id"].tolist())
        wrefs.extend(segs(blk["way_refs"], blk["way_refs_len"]))
        wkeys.extend([st[i] for i in seg] for seg in
                     segs(blk["way_key_idx"], blk["way_kv_len"]))
        wvals.extend([st[i] for i in seg] for seg in
                     segs(blk["way_val_idx"], blk["way_kv_len"]))
        rid.extend(blk["rel_id"].tolist())
        rmids.extend(segs(blk["rel_mids"], blk["rel_mids_len"]))
        rtypes.extend(segs(blk["rel_types"], blk["rel_mids_len"]))
        rroles.extend([st[i] for i in seg] for seg in
                      segs(blk["rel_role_idx"], blk["rel_mids_len"]))
    assert np.array_equal(np.concatenate(nid), ids)
    assert np.array_equal(np.concatenate(nlat), lat)
    assert np.array_equal(np.concatenate(nlon), lon)
    assert len(wid) == 60 and len(rid) == 9
    assert wid[0] == 1000 and np.array_equal(wrefs[0], ways[0][1])
    assert dict(zip(wkeys[0], wvals[0])) == ways[0][2]
    assert (rid[2] == 5002 and rmids[2].tolist() == [1000, 1001, 1002]
            and rtypes[2].tolist() == [1, 1, 1] and rroles[2] == ["main"] * 3)


def test_pbf_timestamps_roundtrip(tmp_path, ray_session):
    """Way Info + denseinfo timestamps survive encode→decode (epoch sec);
    the ways reader exposes them as the ``ts`` column (A8 latest-ts over a
    real-format input, bin/osm-lump-ways/main.rs:253)."""
    from osm_lump_ways_ray.sources.pbf import read_pbf_ways

    ids = np.array([1, 2, 3], np.int64)
    nts = np.array([1_600_000_000, 1_600_000_100, 1_500_000_000], np.int64)
    ways = [(10, np.array([1, 2], np.int64), {"name": "a"}, 1_700_000_000),
            (11, np.array([2, 3], np.int64), {}, 1_650_000_000),
            (12, np.array([1, 3], np.int64), {})]  # no metadata → ts 0
    path = str(tmp_path / "ts.osm.pbf")
    write_pbf(path, nodes=(ids, ids * 10, ids * 20, nts), ways=ways)

    spans = scan_blob_spans(path)
    with open(path, "rb") as f:
        f.seek(spans[1][1])
        blk = decode_primitive_block(_blob_payload(f.read(spans[1][2])))
    assert blk["node_ts"].tolist() == nts.tolist()

    wd = read_pbf_ways(path).to_pandas().sort_values("way_id")
    assert wd["ts"].tolist() == [1_700_000_000, 1_650_000_000, 0]


def test_pbf_nonstandard_granularity_and_unknown_fields():
    """A hand-built PrimitiveBlock with granularity 1000 / offsets plus
    injected unknown fields must decode to the right e7 coordinates."""
    st = _field_bytes(1, _field_bytes(1, b""))
    dense = (_field_bytes(1, encode_packed([7], zigzag=True))
             + _field_bytes(8, encode_packed([123456], zigzag=True))
             + _field_bytes(9, encode_packed([-654321], zigzag=True))
             + _field_bytes(20, b"unknown-inner"))  # skipped by wire type
    group = _field_bytes(2, dense) + _field_varint(15, 99)  # unknown varint
    block = (st + _field_bytes(2, group)
             + _field_varint(17, 1000)           # granularity
             + _field_varint(19, 500)            # lat_offset (nanodeg)
             + _field_varint(20, 100)            # lon_offset
             + _field_bytes(99, b"future-ext"))  # unknown top-level
    blk = decode_primitive_block(block)
    assert blk["node_id"].tolist() == [7]
    # lat = (500 + 1000*123456) nanodeg → e7 = //100
    assert blk["lat"].tolist() == [(500 + 1000 * 123456) // 100]
    assert blk["lon"].tolist() == [(100 + 1000 * -654321) // 100]


def test_pbf_uncompressed_blob(tmp_path):
    path = str(tmp_path / "raw.osm.pbf")
    ids = np.array([5, 9], np.int64)
    write_pbf(path, nodes=(ids, ids * 10, ids * 20), compress=False)
    spans = scan_blob_spans(path)
    assert [t for t, _o, _s in spans] == ["OSMHeader", "OSMData"]
    with open(path, "rb") as f:
        f.seek(spans[1][1])
        blk = decode_primitive_block(_blob_payload(f.read(spans[1][2])))
    assert blk["node_id"].tolist() == [5, 9]
    assert blk["lat"].tolist() == [50, 90]


def test_pbf_ray_readers(tmp_path, ray_session):
    from osm_lump_ways_ray.sources.pbf import (read_pbf_nodes,
                                               read_pbf_relations,
                                               read_pbf_ways)

    path, _info, (ids, lat, lon), ways, rels = _fixture(tmp_path,
                                                        features_per_blob=100)
    nd = read_pbf_nodes(path).to_pandas().sort_values("node_id")
    assert np.array_equal(nd["node_id"].to_numpy(), ids)
    assert np.array_equal(
        nd.sort_values("node_id")["lat"].to_numpy(),
        lat[np.argsort(ids, kind="stable")])
    wd = read_pbf_ways(path).to_pandas().sort_values("way_id")
    assert wd["way_id"].tolist() == [w[0] for w in ways]
    got_refs = [list(r) for r in wd["node_ids"]]
    assert got_refs == [list(w[1]) for w in ways]
    tagged = wd[wd["way_id"] == 1000].iloc[0]
    assert dict(zip(tagged["keys"], tagged["vals"])) == ways[0][2]
    rd = read_pbf_relations(path).to_pandas().sort_values("rel_id")
    assert rd["rel_id"].tolist() == [r[0] for r in rels]
    assert list(rd.iloc[2]["member_ids"]) == [1000, 1001, 1002]
    assert list(rd.iloc[2]["roles"]) == ["main"] * 3


def test_cli_lump_from_pbf(tmp_path, capsys, ray_session):
    """`lump -i FILE.osm.pbf` end-to-end: grouped features from a real PBF,
    grouped by the ways' own `name` tag; untagged ways drop unless
    --incl-unset-group (reference semantics)."""
    import json

    from osm_lump_ways_ray.__main__ import main

    # two named chains sharing tag "a" (disconnected → 2 groups) + one "b"
    # chain + one UNTAGGED way
    ids = np.arange(1, 13, dtype=np.int64)
    lat = (ids * 1_000_000).astype(np.int64)
    lon = (ids * 2_000_000).astype(np.int64)
    ways = [
        (1, np.array([1, 2, 3], np.int64), {"name": "a"}),
        (2, np.array([4, 5], np.int64), {"name": "a"}),
        (3, np.array([6, 7, 8], np.int64), {"name": "b"}),
        (4, np.array([9, 10], np.int64), {}),
    ]
    path = str(tmp_path / "in.osm.pbf")
    write_pbf(path, nodes=(ids, lat, lon), ways=ways)

    out = tmp_path / "groups.geojson"
    rc = main(["lump", "-i", path, "-o", str(out), "-g", "name",
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    fc = json.loads(out.read_text())
    names = sorted(f["properties"]["name"] for f in fc["features"])
    assert names == ["a", "a", "b"]  # untagged way dropped by default
    nn = {f["properties"]["name"]: f["properties"]["num_nodes"]
          for f in fc["features"] if f["properties"]["name"] == "b"}
    # num_nodes counts PILLAR nodes (the interior degree-2 node 7 contracts
    # into the chain — same semantics as the pages lump)
    assert nn["b"] == 2
    # …but the geometry carries the full 3-point chain
    bgeo = [f["geometry"] for f in fc["features"]
            if f["properties"]["name"] == "b"][0]
    assert sum(len(part) for part in bgeo["coordinates"]) == 3

    out2 = tmp_path / "groups2.geojson"
    rc = main(["lump", "-i", path, "-o", str(out2), "-g", "name",
               "--incl-unset-group", "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    fc2 = json.loads(out2.read_text())
    assert len(fc2["features"]) == 4  # the untagged way survives


def test_cli_down_from_pbf(tmp_path, capsys, ray_session):
    """`down -i FILE.osm.pbf`: the directed graph derives from way node
    order; loops/ends/flow all run off the real format."""
    import json

    from osm_lump_ways_ray.__main__ import main

    # chain way 1→2→3→4 named "r", side way 5→3 named "s", cycle 20→21→22→20
    ids = np.array([1, 2, 3, 4, 5, 20, 21, 22], np.int64)
    lat = (ids * 1_000_000).astype(np.int64)
    lon = (ids * 2_000_000).astype(np.int64)
    ways = [
        (1, np.array([1, 2, 3, 4], np.int64), {"name": "r"}),
        (2, np.array([5, 3], np.int64), {"name": "s"}),
        (3, np.array([20, 21, 22, 20], np.int64), {}),
    ]
    path = str(tmp_path / "w.osm.pbf")
    write_pbf(path, nodes=(ids, lat, lon), ways=ways)

    out_dir = tmp_path / "out"
    ends_f = tmp_path / "ends.geojsons"
    loops_f = tmp_path / "loops.geojsons"
    rc = main(["down", "-i", path, "--out-dir", str(out_dir),
               "--ends", str(ends_f), "--loops", str(loops_f),
               "--flow-follows-tag", "name", "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    import pyarrow.parquet as pq

    flow = pq.read_table(str(out_dir / "flow_edges")).to_pydict()
    up = {(s, d): u for s, d, u in zip(flow["src"], flow["dst"],
                                       flow["upstream_m"])}
    # node 3 has inflows from way r (2→3) and way s (5→3); the single out
    # (3→4) gets everything
    assert (3, 4) in up and up[(3, 4)] > 0
    ends = [json.loads(l) for l in
            open(ends_f, "rb").read().decode().split("\x1e") if l.strip()]
    assert [f["properties"]["end_nid"] for f in ends] == [4]
    loops = [json.loads(l) for l in
             open(loops_f, "rb").read().decode().split("\x1e") if l.strip()]
    assert len(loops) == 1 and loops[0]["properties"]["nids"] == [20, 21, 22]


def test_cli_down_pbf_relation_tags(tmp_path, capsys, ray_session):
    """--relation-tags-overwrite over a PBF input reads memberships from the
    SAME file: a relation tagged name=R re-tags its member ways, so the
    tag-grouped flow treats them as one group (interned into the same tagid
    space as the way tags)."""
    import json

    import pyarrow.parquet as pq

    from osm_lump_ways_ray.__main__ import main

    # Y junction: 1→3 (way 1, name p), 2→3 (way 2, name q), outs
    # 3→4 (way 3, name p), 3→5 (way 4, name q). Relation R makes ways
    # 2 and 3 one group (q-inflow follows to the p-side out).
    ids = np.array([1, 2, 3, 4, 5], np.int64)
    ways = [
        (1, np.array([1, 3], np.int64), {"name": "p"}),
        (2, np.array([2, 3], np.int64), {"name": "q"}),
        (3, np.array([3, 4], np.int64), {"name": "p"}),
        (4, np.array([3, 5], np.int64), {"name": "q"}),
    ]
    rels = [(9, [(1, 2, "main"), (1, 3, "main")], {"name": "R"})]
    path = str(tmp_path / "rel.osm.pbf")
    write_pbf(path, nodes=(ids, ids * 10_000_000, ids * 20_000_000),
              ways=ways, relations=rels)

    out_dir = tmp_path / "out"
    rc = main(["down", "-i", path, "--flow-follows-tag", "name",
               "--relation-tags-overwrite", "--out-dir", str(out_dir),
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    flow = pq.read_table(str(out_dir / "flow_edges")).to_pydict()
    up = {(s, d): u for s, d, u in zip(flow["src"], flow["dst"],
                                       flow["upstream_m"])}
    # ways 2 and 3 share tag R: the 2→3 inflow goes to 3→4; the 1→3 inflow
    # (tag p, no matching out group) splits equally over both outs
    in_p = up[(1, 3)] + [l for s, d, l in zip(flow["src"], flow["dst"],
                                              flow["length_m"])
                         if (s, d) == (1, 3)][0]
    in_r = up[(2, 3)] + [l for s, d, l in zip(flow["src"], flow["dst"],
                                              flow["length_m"])
                         if (s, d) == (2, 3)][0]
    assert up[(3, 4)] == in_r + in_p / 2
    assert up[(3, 5)] == in_p / 2


def test_cli_down_pbf_ends_csv_timestamp(tmp_path, capsys, ray_session):
    """--ends-csv over a PBF input keys rows by the input's LATEST way Info
    timestamp (ends_csv.rs:85-99 data-age semantics), not epoch 0."""
    import csv

    from osm_lump_ways_ray.__main__ import main

    ids = np.array([1, 2, 3, 4], np.int64)
    ways = [(1, np.array([1, 2, 3], np.int64), {"name": "r"}, 1_690_000_000),
            (2, np.array([3, 4], np.int64), {"name": "r"}, 1_700_000_123)]
    path = str(tmp_path / "ts.osm.pbf")
    write_pbf(path, nodes=(ids, ids * 1_000_000, ids * 2_000_000), ways=ways)

    ends_csv = tmp_path / "ends.csv"
    rc = main(["down", "-i", path, "--ends-csv", str(ends_csv),
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    rows = list(csv.DictReader(ends_csv.read_text().splitlines()))
    assert rows and all(r["timestamp"] == "1700000123" for r in rows)
    assert rows[0]["iso_datetime"] == "2023-11-14T22:15:23Z"


def test_pbf_missing_node_position_fails_loudly(tmp_path, ray_session):
    """A way referencing a node id with no position must raise — never
    silently shorten geometry lists (ADVICE r4: a shortened list corrupts
    every later way in the block) nor silently delete edges."""
    from ray.exceptions import RayTaskError

    from osm_lump_ways_ray.__main__ import main
    from osm_lump_ways_ray.sources.pbf import pbf_directed_edges

    ids = np.array([1, 2], np.int64)  # node 3 is MISSING
    ways = [(1, np.array([1, 2, 3], np.int64), {"name": "r"})]
    path = str(tmp_path / "clip.osm.pbf")
    write_pbf(path, nodes=(ids, ids * 1_000_000, ids * 2_000_000), ways=ways)

    edges, _nodes = pbf_directed_edges(path)
    with pytest.raises((RayTaskError, ValueError),
                       match="pbf_directed_edges"):
        edges.materialize()

    with pytest.raises((RayTaskError, ValueError),
                       match="attach_way_geometry"):
        main(["lump", "-i", path, "-o", str(tmp_path / "o.geojson"),
              "-g", "name", "--num-partitions", "4"])


def test_cli_lump_pbf_group_by_lang(tmp_path, capsys, ray_session):
    """--tag-group-by lang must group by the ways' lang tag — the previous
    shape() built a colliding dict key and silently dropped the group
    values (ADVICE r4)."""
    import json

    from osm_lump_ways_ray.__main__ import main

    ids = np.arange(1, 7, dtype=np.int64)
    ways = [(1, np.array([1, 2], np.int64), {"lang": "de"}),
            (2, np.array([3, 4], np.int64), {"lang": "fr"}),
            (3, np.array([5, 6], np.int64), {})]
    path = str(tmp_path / "lang.osm.pbf")
    write_pbf(path, nodes=(ids, ids * 1_000_000, ids * 2_000_000), ways=ways)

    out = tmp_path / "langs.geojson"
    rc = main(["lump", "-i", path, "-o", str(out), "-g", "lang",
               "--num-partitions", "4"])
    assert rc == 0
    capsys.readouterr()
    fc = json.loads(out.read_text())
    assert sorted(f["properties"]["lang"] for f in fc["features"]) \
        == ["de", "fr"]
