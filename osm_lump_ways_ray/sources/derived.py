"""Deterministic graph/geometry derivations from the ``documents`` test table.

The driver's correctness gate compares Ray pipelines against DuckDB oracle SQL on
the SAME parquet tables (CORRECTNESS_r{N}.json), so every derivation here uses
pure integer arithmetic expressible identically in SQL (no md5 node ids, no
float hashing). ``documents(doc_id, text, lang, source, n_chars)`` plays the
role of the OSM node/way streams:

- **nodes**:  ``node_id = doc_id + 1`` (> 0, reference id assertion),
  ``lat = (doc_id*LAT_MULT) % 1700000001 - 850000000``,
  ``lon = (doc_id*LON_MULT) % 3500000001 - 1750000000``  (i32 fixed-point ×1e7,
  away from poles/antimeridian so cell/PIP arithmetic has no wrap cases).
- **undirected edges** (the lump graph): doc d links to d-1 when ``d % 8 != 0``
  AND ``lang(d) == lang(d-1)`` (the shared-tag-value rule, M4 semantics); plus a
  long-range link d ↔ d-5 when ``d % 37 == 0`` and langs match. Components stay
  small (≤ ~16 nodes) so the recursive-CTE oracle is cheap.
- **directed edges** (the SCC/flow graph): within each decade ``c = d // 10``:
  edge d → d+1 when ``d % 10 != 9``, plus closing edge d → d-9 when
  ``d % 10 == 9`` — every edge gated on ``n_chars(d) % 7 != 0``. A decade whose
  10 members all pass the gate forms a 10-cycle (an SCC); any failure leaves an
  acyclic chain fragment.

SQL strings for the same derivations are provided for composition into oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LAT_MULT, LAT_MOD, LAT_OFF = 7_919_777, 1_700_000_001, 850_000_000
LON_MULT, LON_MOD, LON_OFF = 104_729_333, 3_500_000_001, 1_750_000_000


def nodes_batch(batch: pa.Table) -> pa.Table:
    d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lat = (d * LAT_MULT) % LAT_MOD - LAT_OFF
    lon = (d * LON_MULT) % LON_MOD - LON_OFF
    out = pa.table({
        "node_id": pa.array(d + 1, pa.int64()),
        "lat": pa.array(lat, pa.int64()),
        "lon": pa.array(lon, pa.int64()),
    })
    for c in ("lang", "source", "n_chars"):
        if c in batch.column_names:
            out = out.append_column(c, batch[c])
    return out


NODES_SQL = (
    "SELECT doc_id + 1 AS node_id, "
    f"(doc_id * {LAT_MULT}) % {LAT_MOD} - {LAT_OFF} AS lat, "
    f"(doc_id * {LON_MULT}) % {LON_MOD} - {LON_OFF} AS lon, "
    "lang, source, n_chars FROM documents"
)


def undirected_edges(documents_ds, *, num_partitions: int = 8):
    """documents → undirected lump edges (u, v) in node-id space.

    The d↔d-1 / d↔d-5 "link keys" need each doc's neighbor's lang — a self-join
    in SQL; here a broadcast of the (small) doc_id→lang map would not scale, so
    we emit per-row HALF-edges keyed by the midpoint and match them in a
    groupby: each doc emits (key, side, doc_id, lang) for every link it could
    participate in; a key with both sides present and equal langs becomes an
    edge. One shuffle, no join."""
    import pyarrow.compute as pc

    def half_edges(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        m_chain = d % 8 != 0
        m_long = (d % 37 == 0) & (d >= 5)
        keys = np.concatenate([2 * d[m_chain], 2 * (d + 1),
                               2 * d[m_long] + 1, 2 * (d + 5) + 1])
        sides = np.concatenate([
            np.ones(m_chain.sum(), np.int8), np.zeros(len(d), np.int8),
            np.ones(m_long.sum(), np.int8), np.zeros(len(d), np.int8)])
        docs = np.concatenate([d[m_chain], d, d[m_long], d])
        langs = np.concatenate([lang[m_chain], lang, lang[m_long], lang])
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "side": pa.array(sides, pa.int8()),
            "doc": pa.array(docs, pa.int64()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "_part": pa.array(keys % num_partitions, pa.int64()),
        })

    def match(batch: pa.Table) -> pa.Table:
        # one PARTITION per group (not one key — per-key map_groups costs one
        # Python call per key): sort by (key, side), run-split, and emit an
        # edge for every key holding exactly side-0 + side-1 with equal langs
        k = batch["key"].to_numpy(zero_copy_only=False)
        s = batch["side"].to_numpy(zero_copy_only=False)
        doc = batch["doc"].to_numpy(zero_copy_only=False)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        order = np.lexsort((s, k))
        k, s, doc, lang = k[order], s[order], doc[order], lang[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        counts = np.diff(np.append(starts, len(k)))
        two = starts[counts == 2]
        ok = (s[two] == 0) & (s[two + 1] == 1) & (lang[two] == lang[two + 1])
        sel = two[ok]
        return pa.table({"u": pa.array(doc[sel] + 1, pa.int64()),
                         "v": pa.array(doc[sel + 1] + 1, pa.int64())})

    halves = documents_ds.map_batches(half_edges, batch_format="pyarrow")
    return halves.groupby("_part").map_groups(match, batch_format="pyarrow")


UNDIRECTED_EDGES_SQL = (
    "SELECT a.doc_id + 1 AS u, b.doc_id + 1 AS v "
    "FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 1 "
    "WHERE a.doc_id % 8 <> 0 AND a.lang = b.lang "
    "UNION ALL "
    "SELECT a.doc_id + 1 AS u, b.doc_id + 1 AS v "
    "FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 5 "
    "WHERE a.doc_id % 37 = 0 AND a.lang = b.lang"
)

# recursive min-label CTE over the undirected edge set → exact component ids
CC_ORACLE_SQL = f"""
WITH RECURSIVE
  e AS ({UNDIRECTED_EDGES_SQL}),
  und AS (SELECT u AS s, v AS t FROM e UNION SELECT v, u FROM e),
  verts AS (SELECT DISTINCT s AS node FROM und),
  reach(node, lbl) AS (
    SELECT node, node FROM verts
    UNION
    SELECT und.t, reach.lbl FROM reach JOIN und ON und.s = reach.node
  ),
  comp AS (SELECT node, MIN(lbl) AS component_id FROM reach GROUP BY node)
"""


def directed_edges(documents_ds):
    """documents → directed decade-cycle edges (src, dst) in node-id space.

    Stateless per-row derivation (the gate depends only on the SOURCE doc), so
    no join/groupby is needed — pure map_batches."""

    def emit(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (nch % 7) != 0
        src, dst = [], []
        for i in range(len(d)):
            if not ok[i]:
                continue
            di = int(d[i])
            if di % 10 != 9:
                src.append(di + 1)
                dst.append(di + 2)
            else:
                src.append(di + 1)
                dst.append(di - 9 + 1)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return documents_ds.map_batches(emit, batch_format="pyarrow")


DIRECTED_EDGES_SQL = (
    "SELECT doc_id + 1 AS src, "
    "CASE WHEN doc_id % 10 <> 9 THEN doc_id + 2 ELSE doc_id - 8 END AS dst "
    "FROM documents WHERE n_chars % 7 <> 0"
)

# dst must exist as a doc (table-end truncation): join against documents
DIRECTED_EDGES_CLOSED_SQL = (
    f"SELECT e.src, e.dst FROM ({DIRECTED_EDGES_SQL}) e "
    "JOIN documents t ON t.doc_id = e.dst - 1"
)


def directed_edges_closed(documents_ds, *, max_doc_ref):
    """Directed edges with dangling dst (past table end) removed via a broadcast
    of the max doc id (a scalar — the degenerate 'small side')."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mx = ray.get(max_doc_ref) if not isinstance(max_doc_ref, int) else max_doc_ref
        return batch.filter(pc.less_equal(batch["dst"], pa.scalar(mx + 1, pa.int64())))

    return directed_edges(documents_ds).map_batches(filt, batch_format="pyarrow")
