"""osm_lump_ways_ray — a Ray-Data-native topology-lumping + spatial-tiling engine.

A from-scratch re-creation of the query/data-processing capabilities of
``amandasaurus/osm-lump-ways`` (reference at /root/reference, Rust), rebuilt as
distributed ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``functions/``  — stateless scalar/vector kernels (haversine, rounding, tag-filter
  DSL, tag grouper, deterministic hashing, grid-cell index).
- ``sources/``    — synthetic pages table (Common-Crawl-style), derived nodes/ways
  layers, GeoJSONSeq sink.
- ``stages/``     — distributed operators: degree/pillar aggregation, way→edge
  contraction, connected components (the lump kernel), SCC, flow accumulation,
  dedup family, text analysis, similarity search, spatial joins, multimodal stubs.
- ``pipelines/``  — end-to-end pipelines (the flagship lump pipeline).
- ``state/``      — checkpoint/resume manifests and per-partition lineage records.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions are owned
by the caller (driver, bench.py, test fixture).
"""

__version__ = "0.1.0"
