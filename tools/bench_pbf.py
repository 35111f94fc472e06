"""PBF read-throughput benchmark (VERDICT r4 #4 done-criterion): synthesize
a ≥1M-way .osm.pbf with the in-repo encoder, then measure `read_pbf_ways`
ways/sec end-to-end (blob-span scan → sharded zlib inflate → vectorized
varint decode → columnar ListArray assembly). The reference logs this very
metric per run (`bin/osm-lump-ways/main.rs:388-393`).

    PYTHONPATH=. python tools/bench_pbf.py [n_ways] [n_cpus]

Writes one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def synth_pbf(path: str, n_ways: int) -> dict:
    """Deterministic waterway-ish fixture: chains of ~9 noded segments with
    name/waterway tags plus the referenced dense nodes."""
    import numpy as np

    from osm_lump_ways_ray.sources.pbf import write_pbf

    rng = np.random.default_rng(42)
    refs_per_way = 9
    n_nodes = n_ways * 2 + refs_per_way  # shared-node chains
    node_ids = np.arange(1, n_nodes + 1, dtype=np.int64)
    lat = (rng.integers(-800_000_000, 800_000_000, n_nodes)
           .astype(np.int64) // 100 * 100)
    lon = (rng.integers(-1_700_000_000, 1_700_000_000, n_nodes)
           .astype(np.int64) // 100 * 100)
    ts = np.full(n_nodes, 1_600_000_000, np.int64)

    ways = []
    for i in range(n_ways):
        start = (i * 2) % (n_nodes - refs_per_way) + 1
        refs = list(range(start, start + refs_per_way))
        ways.append((i + 1, refs,
                     {"waterway": "river", "name": f"w{i % 1000}"},
                     1_600_000_000 + i % 86400))
    return write_pbf(path, nodes=(node_ids, lat, lon, ts), ways=ways)


def main() -> int:
    n_ways = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 \
        else int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    path = f"/tmp/bench_pbf_{n_ways}.osm.pbf"

    if not os.path.exists(path):
        t0 = time.monotonic()
        info = synth_pbf(path, n_ways)
        gen_s = time.monotonic() - t0
    else:
        info, gen_s = {"n_ways": n_ways, "cached": True}, 0.0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from osm_lump_ways_ray.sources.pbf import read_pbf_nodes, read_pbf_ways

    runs = []
    for _ in range(2):
        t0 = time.monotonic()
        n = read_pbf_ways(path).count()
        runs.append(round(time.monotonic() - t0, 3))
        assert n == n_ways, (n, n_ways)
    t0 = time.monotonic()
    nn = read_pbf_nodes(path).count()
    node_s = round(time.monotonic() - t0, 3)

    best = min(runs)
    out = {
        "metric": "pbf_ways_per_sec", "value": round(n_ways / best, 1),
        "unit": "ways/sec", "n_ways": n_ways, "runs_sec": runs,
        "nodes": nn, "nodes_per_sec": round(nn / node_s, 1),
        "file_mb": round(os.path.getsize(path) / 1e6, 1),
        "gen_sec": round(gen_s, 1), "num_cpus": ncpu,
        "n_blobs": info.get("n_blobs"),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
