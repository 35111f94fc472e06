"""Driver-facing query battery: one entry per implemented operator family
(SURVEY.md §2), each with a DuckDB oracle-SQL twin over the same parquet tables.

Float-parity policy (the driver hash-compares values): every floating quantity
crossing the Ray↔SQL comparison is converted to an INTEGER per row BEFORE any
aggregation (e.g. haversine metres → floor(d*10+0.5) decimetres per edge, then
integer sums) so summation order can never flip a rounding; trig ulp differences
between numpy and libm remain the only (≈1e-8/row) risk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.cells import cell_id_sql
from ..functions.haversine import MEAN_EARTH_RADIUS_M, haversine_m_fp
from ..sources import derived as D
from ..stages.relational import cogroup_join as hash_join
from ..state.derivation_cache import cached_ds, cached_obj


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read with SIZE-AWARE block count: Ray splits even
    a sub-MB file into ~64 fragment blocks, and every downstream groupby then
    pays a 64-task all-to-all (measured: identity groupby over 5k rows 2.5 s
    at 64 blocks vs 0.2 s at 4). Small files get max(8, 1 block/MB) — 8 keeps
    CPU-heavy per-doc stages parallel — while files ≥ 64 MB keep Ray's own
    sizing (at 100 TB the default streaming split is the right answer)."""
    import os

    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    nbytes = os.path.getsize(path)
    override = None
    if nbytes < 64 * 1024 * 1024:
        override = max(8, int(nbytes) // (1024 * 1024))
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=override)


def _nodes_pos(sf_dir: str):
    """Derived node positions (node_id, lat, lon) — shared across the spatial /
    waterways queries; built once per session (derivation cache)."""

    def build():
        return _read(sf_dir, "documents", columns=["doc_id"]) \
            .map_batches(D.nodes_batch, batch_format="pyarrow") \
            .select_columns(["node_id", "lat", "lon"])

    return cached_ds(("nodes_pos", sf_dir), build)


def _hav_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """SQL haversine mirroring functions/haversine.py term-for-term (fixed-point
    inputs; RADIANS applied per coordinate, not to differences)."""
    r = [f"RADIANS(({c})/10000000.0)" for c in (lat1, lon1, lat2, lon2)]
    la1, lo1, la2, lo2 = r
    return (
        f"2*{MEAN_EARTH_RADIUS_M}*ASIN(SQRT("
        f"POWER(SIN(({la2}-{la1})*0.5),2)"
        f"+COS({la1})*COS({la2})*POWER(SIN(({lo2}-{lo1})*0.5),2)))"
    )


def _dm(expr: str) -> str:
    """metres expr → integer decimetres (round half up, matches np.floor(x*10+0.5))."""
    return f"CAST(FLOOR(({expr})*10 + 0.5) AS BIGINT)"


def _derived_latlon(node_col_np: np.ndarray):
    d = node_col_np.astype(np.int64) - 1
    lat = (d * D.LAT_MULT) % D.LAT_MOD - D.LAT_OFF
    lon = (d * D.LON_MULT) % D.LON_MOD - D.LON_OFF
    return lat, lon


NODES_SQL = D.NODES_SQL

NODE_LATLON_SQL = {
    "lat": lambda col: f"((({col})-1) * {D.LAT_MULT}) % {D.LAT_MOD} - {D.LAT_OFF}",
    "lon": lambda col: f"((({col})-1) * {D.LON_MULT}) % {D.LON_MOD} - {D.LON_OFF}",
}


# ════════════════════════════════════════════════════ graph family (G1/A1/M5)

def _und_edges(sf_dir: str):
    """Undirected lump edges over the documents graph — shared G1 input
    (derivation cache; one build per session)."""

    def build():
        docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
        return D.undirected_edges(docs)

    return cached_ds(("und_edges", sf_dir), build)


def _und_cc_labels(sf_dir: str):
    """G1 connected components over ``_und_edges`` — the shared lump labels
    (computed once per session; main.rs runs ONE component pass and feeds
    every output from it)."""
    from ..stages.graph import connected_components

    def build():
        return connected_components(_und_edges(sf_dir), "u", "v",
                                    num_partitions=8)

    return cached_ds(("und_cc_labels", sf_dir), build)


def _members_to_ways(members, num_partitions: int = 16):
    """(way, node) membership rows → (way_id, node_ids) way rows, vectorized.

    Hash-partition on way then ONE numpy run-split per partition — the same
    shape as sources/pages.assemble_ways_partition. (The old per-way
    ``groupby("way").map_groups`` cost one Python call per way: 1000 pandas
    groups ≈ 3 s of pure overhead in the sf0.1 battery.)"""

    def add_part(batch: pa.Table) -> pa.Table:
        w = batch["way"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_part", pa.array(w % num_partitions, pa.int64()))

    def assemble(t: pa.Table) -> pa.Table:
        w = t["way"].to_numpy(zero_copy_only=False)
        n = t["node"].to_numpy(zero_copy_only=False)
        if len(w) == 0:  # empty bucket / schema-inference probe
            return pa.table({"way_id": pa.array([], pa.int64()),
                             "node_ids": pa.array([], pa.list_(pa.int64()))})
        order = np.lexsort((n, w))
        w, n = w[order], n[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        offsets = np.append(starts, len(w)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         pa.array(n, pa.int64()))
        return pa.table({"way_id": pa.array(w[starts] + 1, pa.int64()),
                         "node_ids": lists})

    return members.map_batches(add_part, batch_format="pyarrow") \
                  .groupby("_part").map_groups(assemble, batch_format="pyarrow")


def q_lump_components(sf_dir: str):
    """G1 over the derived documents graph → per-component node count."""
    from ray.data.aggregate import Count

    labels = _und_cc_labels(sf_dir)
    return labels.groupby("component_id").aggregate(Count(alias_name="num_nodes"))


SQL_LUMP_COMPONENTS = (
    D.CC_ORACLE_SQL
    + "SELECT component_id, COUNT(*) AS num_nodes FROM comp GROUP BY component_id"
)


def q_lump_lengths(sf_dir: str):
    """A2: per-component Σ edge length in integer decimetres (order-proof)."""
    from ray.data.aggregate import Sum

    edges = _und_edges(sf_dir)
    labels = _und_cc_labels(sf_dir)

    def add_len(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        lat_u, lon_u = _derived_latlon(u)
        lat_v, lon_v = _derived_latlon(v)
        m = haversine_m_fp(lat_u, lon_u, lat_v, lon_v)
        dm = np.floor(m * 10 + 0.5).astype(np.int64)
        return batch.append_column("len_dm", pa.array(dm, pa.int64()))

    e = edges.map_batches(add_len, batch_format="pyarrow")
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["u", "component_id"])
    e = hash_join(e, lab, ("u",), how="inner", num_partitions=8)
    agg = e.groupby("component_id").aggregate(Sum("len_dm", alias_name="length_dm"))
    return agg.map_batches(  # Ray Sum may widen to float; oracle is BIGINT
        lambda b: pa.table({"component_id": b["component_id"],
                            "length_dm": b["length_dm"].cast(pa.int64())}),
        batch_format="pyarrow")


SQL_LUMP_LENGTHS = (
    D.CC_ORACLE_SQL
    + f""",
  elen AS (
    SELECT e.u, e.v,
      {_dm(_hav_sql(NODE_LATLON_SQL["lat"]("e.u"), NODE_LATLON_SQL["lon"]("e.u"),
                    NODE_LATLON_SQL["lat"]("e.v"), NODE_LATLON_SQL["lon"]("e.v")))}
      AS len_dm
    FROM e
  )
SELECT c.component_id, CAST(SUM(elen.len_dm) AS BIGINT) AS length_dm
FROM elen JOIN comp c ON c.node = elen.u
GROUP BY c.component_id"""
)


def q_degree_pillar(sf_dir: str):
    """A1 degree weighting over derived 5-doc ways → (node_id, weight)."""
    import pandas as pd

    from ..stages.graph import node_degree_weights

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_members(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"way": pa.array(d // 5, pa.int64()),
                         "node": pa.array(d + 1, pa.int64())})

    ways = _members_to_ways(docs.map_batches(to_members,
                                             batch_format="pyarrow"))
    return node_degree_weights(ways).rename_columns(["node_id", "weight"])


SQL_DEGREE_PILLAR = """
WITH m AS (
  SELECT doc_id + 1 AS node, doc_id // 5 AS way, doc_id % 5 AS pos,
         MAX(doc_id % 5) OVER (PARTITION BY doc_id // 5) AS last_pos
  FROM documents
)
SELECT node AS node_id,
       CAST(LEAST(SUM(CASE WHEN pos = 0 THEN 1 ELSE 2 END
                 + CASE WHEN pos = last_pos THEN 1 ELSE 0 END), 255)
            AS BIGINT) AS weight
FROM m GROUP BY node
"""


def q_way_contraction(sf_dir: str):
    """M5 over derived 5-doc ways → one contracted edge per way (u, v, n_inter)."""
    import pandas as pd
    import ray

    from ..stages.graph import contract_ways, pillar_node_array

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_members(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"way": pa.array(d // 5, pa.int64()),
                         "node": pa.array(d + 1, pa.int64())})

    ways = _members_to_ways(docs.map_batches(to_members,
                                             batch_format="pyarrow")).materialize()
    pillars = pillar_node_array(ways)
    edges = contract_ways(ways, ray.put(pillars))

    def project(batch: pa.Table) -> pa.Table:
        n_inter = pc.list_value_length(batch["inter_nids"]).cast(pa.int64())
        return pa.table({"way_id": batch["way_id"], "u": batch["u"],
                         "v": batch["v"], "n_inter": n_inter})

    return edges.map_batches(project, batch_format="pyarrow")


SQL_WAY_CONTRACTION = """
SELECT doc_id // 5 + 1 AS way_id,
       MIN(doc_id) + 1 AS u,
       MAX(doc_id) + 1 AS v,
       COUNT(*) - 2 AS n_inter
FROM documents
GROUP BY doc_id // 5
HAVING COUNT(*) >= 2
"""


def _decade_closed_edges(sf_dir: str):
    """Decade-cycle directed edges (chains + closing edges) — the shared SCC
    input of the loop family; built once per session (derivation cache)."""

    def build():
        docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
        max_doc = int(docs.max("doc_id"))
        return D.directed_edges_closed(docs, max_doc_ref=max_doc)

    return cached_ds(("decade_closed_edges", sf_dir), build)


def _decade_scc(sf_dir: str):
    """G10 SCC labels over the decade-cycle graph — computed ONCE per session
    and shared by scc_loops / cycle_contraction / loop_features /
    openmetrics (the -down single-program pattern: main.rs runs one SCC)."""
    from ..stages.scc import strongly_connected_components

    def build():
        return strongly_connected_components(
            _decade_closed_edges(sf_dir), "src", "dst", num_partitions=8)

    return cached_ds(("decade_scc", sf_dir), build)


def q_scc_loops(sf_dir: str):
    """G10 over the derived decade-cycle graph → (root_nid, num_nodes)."""
    from ray.data.aggregate import Count

    scc = _decade_scc(sf_dir)
    return scc.groupby("scc_id").aggregate(Count(alias_name="num_nodes")) \
              .rename_columns(["root_nid", "num_nodes"])


SQL_SCC_LOOPS = """
SELECT (doc_id // 10) * 10 + 1 AS root_nid, COUNT(*) AS num_nodes
FROM documents
GROUP BY doc_id // 10
HAVING COUNT(*) = 10 AND SUM(CASE WHEN n_chars % 7 = 0 THEN 1 ELSE 0 END) = 0
"""


def q_flow_upstream(sf_dir: str):
    """G13 (split-equally) over decade CHAINS (closing edges removed → DAG);
    integer lengths (doc%13+1) so upstream sums are exact ints."""
    out = _decade_flow(sf_dir)

    def project(batch):
        batch = batch.copy()
        batch["upstream_m_int"] = np.floor(batch["upstream_m"] + 0.5).astype(np.int64)
        return batch[["src", "dst", "upstream_m_int"]]

    return out.map_batches(project, batch_format="pandas")


SQL_FLOW_UPSTREAM = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst, doc_id % 13 + 1 AS len,
         doc_id // 10 AS dec, doc_id AS d
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
runs AS (
  SELECT *, d - ROW_NUMBER() OVER (PARTITION BY dec ORDER BY d) AS run
  FROM e
)
SELECT src, dst,
       CAST(COALESCE(SUM(len) OVER (PARTITION BY dec, run ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS upstream_m_int
FROM runs
"""


def _decade_ends(sf_dir: str):
    """G15 end nodes of the decade chains — shared by directed_ends and the
    J6 ends-tag/membership queries (one ends pass in the -down run)."""
    from ..stages.scc import directed_ends

    return cached_ds(("decade_ends", sf_dir),
                     lambda: directed_ends(_decade_chain_edges(sf_dir)))


def q_directed_ends(sf_dir: str):
    """G15 ends over the decade DAG (chains only): out-degree-0 vertices."""
    return _decade_ends(sf_dir)


SQL_DIRECTED_ENDS = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
)
SELECT DISTINCT dst AS node FROM e
WHERE dst NOT IN (SELECT src FROM e)
"""


# ════════════════════════════════════════════ tag filter / grouper family (M1-M4)

def _docs_view(batch: pa.Table):
    from ..functions.tagfilter import ColumnTagView

    return ColumnTagView(
        {c: batch[c].to_numpy(zero_copy_only=False)
         for c in ("lang", "source") if c in batch.column_names},
        n=len(batch),
    )


def _tagfilter_query(sf_dir: str, expr: str):
    from ..functions.tagfilter import parse_tag_filter

    tf = parse_tag_filter(expr)
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(tf.mask(_docs_view(batch))))

    from ray.data.aggregate import Count

    return docs.map_batches(filt, batch_format="pyarrow") \
               .groupby("source").aggregate(Count(alias_name="n"))


def q_tagfilter_kv(sf_dir: str):
    """M1 KV filter: DSL ``lang=en`` → count per source."""
    return _tagfilter_query(sf_dir, "lang=en")


SQL_TAGFILTER_KV = "SELECT source, COUNT(*) AS n FROM documents WHERE lang = 'en' GROUP BY source"


def q_tagfilter_in(sf_dir: str):
    """M1 KinV: DSL ``lang∈en,de`` → count per source."""
    return _tagfilter_query(sf_dir, "lang∈en,de")


SQL_TAGFILTER_IN = ("SELECT source, COUNT(*) AS n FROM documents "
                    "WHERE lang IN ('en','de') GROUP BY source")


def q_tagfilter_regex(sf_dir: str):
    """M1 KreV: DSL ``source~^src1.$`` (regex SEARCH semantics) → count per source."""
    return _tagfilter_query(sf_dir, "source~^src1.$")


SQL_TAGFILTER_REGEX = ("SELECT source, COUNT(*) AS n FROM documents "
                       "WHERE regexp_matches(source, '^src1.$') GROUP BY source")


def q_tagfilter_func(sf_dir: str):
    """M3 decision list: ``lang=zh→F;source=src1→T;lang=en→T;F`` → count per lang."""
    from ray.data.aggregate import Count

    from ..functions.tagfilter import TagFilterFunc

    tff = TagFilterFunc.parse("lang=zh→F;source=src1→T;lang=en→T;F")
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(tff.mask(_docs_view(batch))))

    return docs.map_batches(filt, batch_format="pyarrow") \
               .groupby("lang").aggregate(Count(alias_name="n"))


SQL_TAGFILTER_FUNC = """
SELECT lang, COUNT(*) AS n FROM documents
WHERE (CASE WHEN lang = 'zh' THEN FALSE
            WHEN source = 'src1' THEN TRUE
            WHEN lang = 'en' THEN TRUE
            ELSE FALSE END)
GROUP BY lang
"""


def q_taggrouper(sf_dir: str):
    """M4 coalesce grouping: first-set of (source-unless-src0, lang)."""
    from ray.data.aggregate import Count

    from ..functions.taggrouper import TagGrouper
    from ..functions.tagfilter import ColumnTagView

    g = TagGrouper("source,lang")
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def keyed(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False).astype(object)
        src[src == "src0"] = None  # simulate an unset tag slot
        view = ColumnTagView(
            {"source": src, "lang": batch["lang"].to_numpy(zero_copy_only=False)},
            n=len(batch))
        vals = g.values(view)
        return pa.table({"group_value": pa.array(list(vals), pa.string())})

    return docs.map_batches(keyed, batch_format="pyarrow") \
               .groupby("group_value").aggregate(Count(alias_name="n"))


SQL_TAGGROUPER = ("SELECT COALESCE(NULLIF(source, 'src0'), lang) AS group_value, "
                  "COUNT(*) AS n FROM documents GROUP BY 1")


# ════════════════════════════════════════════════ aggregates family (A3-A8, K1-K6)

def q_group_stats(sf_dir: str):
    """A7-style grouped stats on lineitem (integer-exact mean via ppm)."""
    from ..stages.relational import bucket_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])
    agg = bucket_agg(li, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("l_quantity", "sum"),
        "min_qty": ("l_quantity", "min"),
        "max_qty": ("l_quantity", "max"),
        "n": (None, "count"),
    }, combine=True)

    def mean_ppm(batch: pa.Table) -> pa.Table:
        s = batch["sum_qty"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        ppm = np.floor(s * 1_000_000 / n + 0.5).astype(np.int64)
        sq = np.floor(s + 0.5).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pa.array(sq, pa.int64()),
            "min_qty": batch["min_qty"],
            "max_qty": batch["max_qty"],
            "n": batch["n"],
            "mean_qty_ppm": pa.array(ppm, pa.int64()),
        })

    return agg.map_batches(mean_ppm, batch_format="pyarrow")


SQL_GROUP_STATS = """
SELECT l_returnflag, l_linestatus,
       CAST(FLOOR(SUM(l_quantity) + 0.5) AS BIGINT) AS sum_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       COUNT(*) AS n,
       CAST(FLOOR(SUM(l_quantity) * 1000000 / COUNT(*) + 0.5) AS BIGINT) AS mean_qty_ppm
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_latest_ts(sf_dir: str):
    """A8 latest timestamp (fetch_max parity)."""
    import ray.data

    li = _read(sf_dir, "lineitem", columns=["l_shipdate"])
    ev = _read(sf_dir, "events", columns=["ts"])
    return pa.table({
        "latest_shipdate": [li.max("l_shipdate")],
        "latest_event_ts": [ev.max("ts")],
    })


SQL_LATEST_TS = ("SELECT (SELECT MAX(l_shipdate) FROM lineitem) AS latest_shipdate, "
                 "(SELECT MAX(ts) FROM events) AS latest_event_ts")


def q_top_k_orders(sf_dir: str):
    """K1/K2: global sort desc + limit with deterministic tie-break."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    top = orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top


SQL_TOP_K_ORDERS = ("SELECT o_orderkey, o_totalprice FROM orders "
                    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10")


def q_threshold(sf_dir: str):
    """A3/K6: filter by fraction-of-max threshold (driver-computed scalar)."""
    orders = _read(sf_dir, "orders", columns=["o_totalprice"])
    mx = orders.max("o_totalprice")
    half = mx * 0.5

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["o_totalprice"], pa.scalar(half)))

    kept = orders.map_batches(filt, batch_format="pyarrow")
    n = kept.count()
    s = kept.sum("o_totalprice") if n else 0.0
    return pa.table({"n": [n], "sum_price_int": [int(np.floor(s + 0.5))]})


SQL_THRESHOLD = """
SELECT COUNT(*) AS n, CAST(FLOOR(SUM(o_totalprice) + 0.5) AS BIGINT) AS sum_price_int
FROM orders WHERE o_totalprice >= 0.5 * (SELECT MAX(o_totalprice) FROM orders)
"""


def q_cumfrac(sf_dir: str):
    """A4 ``incl90%total``: sort desc, count rows until cumulative ≥ 90% of total;
    boundary value is the resulting min-length threshold (main.rs:563-577)."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    total = orders.sum("o_totalprice")
    target = 0.9 * total
    s = orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
    cum = 0.0
    n = 0
    boundary = None
    for batch in s.iter_batches(batch_size=4096, batch_format="pyarrow"):
        prices = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        for p in prices:
            if cum >= target:
                break
            cum += float(p)
            n += 1
            boundary = float(p)
        if cum >= target:
            break
    return pa.table({"n": [n], "boundary_int": [int(np.floor(boundary + 0.5))]})


SQL_CUMFRAC = """
WITH s AS (
  SELECT o_totalprice,
         SUM(o_totalprice) OVER (ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before,
         SUM(o_totalprice) OVER () AS total
  FROM orders
)
SELECT COUNT(*) AS n,
       CAST(FLOOR(MIN(o_totalprice) + 0.5) AS BIGINT) AS boundary_int
FROM s WHERE COALESCE(cum_before, 0) < 0.9 * total
"""


def q_region_rollup(sf_dir: str):
    """A6-style rollup via BROADCAST dimension joins (small side shipped once)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = pa.concat_tables(_read(sf_dir, "nation").iter_batches(batch_format="pyarrow"))
    region = pa.concat_tables(_read(sf_dir, "region").iter_batches(batch_format="pyarrow"))

    # broadcast both dims in one pandas merge chain
    import pandas as pd
    import ray

    nref = ray.put(nation.to_pandas())
    rref = ray.put(region.to_pandas())

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        n = ray.get(nref)
        r = ray.get(rref)
        out = batch.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        out = out.merge(r, left_on="n_regionkey", right_on="r_regionkey")
        return out[["r_name", "c_acctbal"]]

    from ..stages.relational import bucket_agg

    joined = cust.map_batches(merge, batch_format="pandas")
    agg = bucket_agg(joined, "r_name",
                     {"n_customers": (None, "count"),
                      "sum_bal": ("c_acctbal", "sum")}, combine=True)

    def to_int(batch: pa.Table) -> pa.Table:
        s = batch["sum_bal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "r_name": batch["r_name"],
            "n_customers": batch["n_customers"],
            "sum_bal_cents": pa.array(np.floor(s * 100 + 0.5).astype(np.int64), pa.int64()),
        })

    return agg.map_batches(to_int, batch_format="pyarrow")


SQL_REGION_ROLLUP = """
SELECT r_name, COUNT(*) AS n_customers,
       CAST(FLOOR(SUM(c_acctbal) * 100 + 0.5) AS BIGINT) AS sum_bal_cents
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name
"""


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped aggregate).
    Values are quantized per ROW to integer milli before the sum — integer
    partial sums are order-independent, so the map-side combiner
    (bucket_agg combine=True) is exact."""
    from ..stages.relational import bucket_agg

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def window(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us - us % 3_600_000_000
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array(hour, pa.int64()).cast(pa.timestamp("us")),
            "vm": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                           pa.int64()),
        })

    return bucket_agg(
        ev.map_batches(window, batch_format="pyarrow"),
        ["event_type", "window_start"],
        {"n": (None, "count"), "sum_value_milli": ("vm", "sum")},
        combine=True)


SQL_EVENTS_WINDOW = """
SELECT event_type, date_trunc('hour', ts) AS window_start, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_milli
FROM events GROUP BY 1, 2
"""


# ═════════════════════════════════════════════ text / dedup family

def q_dedup_exact(sf_dir: str):
    """Exact dedup by content hash → representative + group size."""
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(docs)


SQL_DEDUP_EXACT = ("SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, "
                   "COUNT(*) AS n_dups FROM documents GROUP BY md5(text)")


def q_fingerprint(sf_dir: str):
    """Document fingerprinting (md5 of 64-char prefix) → cluster sizes."""
    from ray.data.aggregate import Count, Min

    from ..stages.text import fingerprint_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    fp = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    return fp.groupby("fingerprint").aggregate(
        Min("doc_id", alias_name="keep_id"), Count(alias_name="n"))


SQL_FINGERPRINT = ("SELECT md5(substr(text, 1, 64)) AS fingerprint, "
                   "MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents "
                   "GROUP BY md5(substr(text, 1, 64))")


def q_token_stats(sf_dir: str):
    """Token counting per lang (whitespace tokens; SQL parity via string_split)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import token_stats_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    t = docs.map_batches(token_stats_batch, batch_format="pyarrow")
    return t.groupby("lang").aggregate(
        Sum("ws_tokens", alias_name="total_tokens"), Count(alias_name="n_docs"))


SQL_TOKEN_STATS = ("SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)"
                   " AS total_tokens, "
                   "COUNT(*) AS n_docs FROM documents GROUP BY lang")


def q_det_shuffle(sf_dir: str):
    """Deterministic global shuffle for training-data sharding: every doc is
    ordered by md5(seed || ':' || doc_id) — reproducible across runs and
    engines, unlike ``random_shuffle`` — then assigned (shard, pos) by the
    distributed ordinal rank (block-count offsets only touch the driver).
    The md5 is the repo's vectorized RFC-1321 kernel, bit-identical to
    DuckDB's md5(), so the oracle reorders identically."""
    from ..functions.hashing import md5_hex_array
    from ..stages.relational import with_ordinal_rank

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_hex_array([f"42:{x}" for x in d])
        return pa.table({"doc_id": batch["doc_id"],
                         "shuffle_key": pa.array(h, pa.string())})

    keyed = docs.map_batches(key, batch_format="pyarrow")
    ranked = with_ordinal_rank(keyed, ["shuffle_key", "doc_id"],
                               [False, False], out_col="rk")

    def finish(batch: pa.Table) -> pa.Table:
        rk = batch["rk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "shard": pa.array((rk - 1) // 64, pa.int64()),
            "pos": pa.array((rk - 1) % 64, pa.int64()),
        })

    # canonical result order (doc_id asc) — the shuffle lives in (shard, pos)
    return ranked.map_batches(finish, batch_format="pyarrow").sort("doc_id")


SQL_DET_SHUFFLE = """
SELECT doc_id,
       (ROW_NUMBER() OVER (ORDER BY md5('42:' || doc_id), doc_id) - 1)
         // 64 AS shard,
       (ROW_NUMBER() OVER (ORDER BY md5('42:' || doc_id), doc_id) - 1)
         % 64 AS pos
FROM documents
"""



def q_token_packing(sf_dir: str):
    """Sequence packing for training shards: docs in doc_id order are packed
    into ~4096-token bins by the cumsum-floor rule — bin = ⌊exclusive prefix
    token sum / 4096⌋ — so every engine that can window-sum reproduces the
    assignment exactly. The prefix sum is the distributed block-offset scan
    (stages/relational.with_running_sum: one (count, sum) pair per block to
    the driver). Output: per bin (n_docs, bin_tokens)."""
    from ..stages.relational import bucket_agg, with_running_sum
    from ..stages.text import token_stats_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    toks = docs.map_batches(token_stats_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "ws_tokens"]) \
        .rename_columns(["doc_id", "n_tokens"])
    cum = with_running_sum(toks, "doc_id", "n_tokens", out_col="cum_excl")

    def assign(batch: pa.Table) -> pa.Table:
        c = batch["cum_excl"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array((c // 4096).astype(np.int64), pa.int64()),
            "n_tokens": batch["n_tokens"],
        })

    return bucket_agg(cum.map_batches(assign, batch_format="pyarrow"),
                      ["bin"], {"n_docs": (None, "count"),
                                "bin_tokens": ("n_tokens", "sum")},
                      num_partitions=8, combine=True).sort("bin")


SQL_TOKEN_PACKING = """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM t
)
SELECT CAST(cum_excl // 4096 AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1
"""



def q_quality(sf_dir: str):
    """Quality scoring: mean stopword ppm per lang (integer arithmetic)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import quality_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    q = docs.map_batches(quality_batch, batch_format="pyarrow")
    agg = q.groupby("lang").aggregate(
        Sum("stop_ppm", alias_name="sum_ppm"), Count(alias_name="n"))

    def mean_int(batch: pa.Table) -> pa.Table:
        s = batch["sum_ppm"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({"lang": batch["lang"],
                         "mean_stop_ppm": pa.array(s // n, pa.int64())})

    return agg.map_batches(mean_int, batch_format="pyarrow")


SQL_QUALITY = """
WITH perdoc AS (
  SELECT lang,
         len(list_filter(string_split(text, ' '),
             x -> x IN ('the','and','of','a','to','in','is','that'))) * 1000000
         // len(string_split(text, ' ')) AS stop_ppm
  FROM documents
)
SELECT lang, CAST(SUM(stop_ppm) // COUNT(*) AS BIGINT) AS mean_stop_ppm
FROM perdoc GROUP BY lang
"""


def q_langid(sf_dir: str):
    """Language-ID heuristic vs labeled lang → confusion counts."""
    from ray.data.aggregate import Count

    from ..stages.text import langid_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    d = docs.map_batches(langid_batch, batch_format="pyarrow")
    return d.groupby(["lang", "detected_lang"]).aggregate(Count(alias_name="n"))


SQL_LANGID = """
SELECT lang,
       CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 'en'
            WHEN ' ' || text || ' ' LIKE '% der %' THEN 'de'
            WHEN ' ' || text || ' ' LIKE '% le %' THEN 'fr'
            WHEN ' ' || text || ' ' LIKE '% el %' THEN 'es'
            ELSE 'other' END AS detected_lang,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""


# ═════════════════════════════════════════════ similarity family

def _load_queries(sf_dir: str, n_queries: int = 5):
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < {n_queries} ORDER BY vec_id").fetchall()
    con.close()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-5 for the first 5 vectors (self-excluded)."""
    from ..stages.similarity import knn_bruteforce

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    queries = _load_queries(sf_dir)
    out = knn_bruteforce(emb, queries, k=5)
    return out.select_columns(["query_id", "rank", "vec_id"])


SQL_KNN_COSINE = """
SELECT query_id, rank, vec_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rank
  FROM embeddings q JOIN embeddings c ON c.vec_id >= 5
  WHERE q.vec_id < 5
) WHERE rank <= 5
"""


# ═════════════════════════════════════════════ spatial family (north rule)

def q_tile_assign(sf_dir: str):
    """Raster→vector tile assignment: derived nodes → res-6 cells → counts."""
    from ray.data.aggregate import Count

    from ..stages.spatial import assign_tiles

    nodes = _nodes_pos(sf_dir)
    tiled = assign_tiles(nodes, res=6)
    return tiled.groupby("cell").aggregate(Count(alias_name="n"))


SQL_TILE_ASSIGN = f"""
WITH n AS ({NODES_SQL})
SELECT {cell_id_sql("lat", "lon", 6)} AS cell, COUNT(*) AS n
FROM n GROUP BY 1
"""


_PIP_RECTS = [
    ("east_box", 0, 0, 600_000_000, 1_500_000_000),
    ("west_box", -700_000_000, -1_700_000_000, 100_000_000, -100_000_000),
    ("north_cap", 500_000_000, -1_750_000_000, 849_999_999, 1_749_999_999),
]


def q_pip(sf_dir: str):
    """Point-in-polygon join (actor-pool geocoder, first-match-wins areas)."""
    from ray.data.aggregate import Count

    from ..stages.spatial import Polygon, pip_join

    polys = []
    for name, la0, lo0, la1, lo1 in _PIP_RECTS:
        ring = [(la0 / 1e7, lo0 / 1e7), (la0 / 1e7, lo1 / 1e7),
                (la1 / 1e7, lo1 / 1e7), (la1 / 1e7, lo0 / 1e7)]
        polys.append(Polygon(name, ring))
    nodes = _nodes_pos(sf_dir)

    def to_deg(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False) / 1e7
        lon = batch["lon"].to_numpy(zero_copy_only=False) / 1e7
        return pa.table({"node_id": batch["node_id"],
                         "lat": pa.array(lat), "lon": pa.array(lon)})

    geo = nodes.map_batches(to_deg, batch_format="pyarrow")
    with_area = pip_join(geo, polys)
    return with_area.groupby("area").aggregate(Count(alias_name="n"))


def _pip_case_sql() -> str:
    conds = []
    for name, la0, lo0, la1, lo1 in _PIP_RECTS:
        conds.append(f"WHEN lat > {la0} AND lat < {la1} AND lon > {lo0} AND lon < {lo1} "
                     f"THEN '{name}'")
    return "CASE " + " ".join(conds) + " ELSE 'unknown_area' END"


SQL_PIP = f"""
WITH n AS ({NODES_SQL})
SELECT {_pip_case_sql()} AS area, COUNT(*) AS n FROM n GROUP BY 1
"""


def q_knn_spatial(sf_dir: str):
    """Spatial kNN join: nearest anchor (node_id % 97 == 1) per non-anchor
    node. Auto-selects broadcast vs the cell-partitioned path by anchor COUNT
    (VERDICT r3 #5) — no unbounded ``take_all`` on the anchor side."""
    from ..stages.spatial import knn_join_auto

    nodes = _nodes_pos(sf_dir)

    anchors = nodes.map_batches(
        lambda b: (lambda t: pa.table({"anchor_id": t["node_id"],
                                       "lat": t["lat"], "lon": t["lon"]}))(
            b.filter(pa.array(
                ((b["node_id"].to_numpy(zero_copy_only=False) - 1) % 97) == 0))),
        batch_format="pyarrow")
    non_anchor = nodes.map_batches(
        lambda b: b.filter(pa.array(
            ((b["node_id"].to_numpy(zero_copy_only=False) - 1) % 97) != 0)),
        batch_format="pyarrow")
    out = knn_join_auto(non_anchor, anchors, num_partitions=8)
    return out.select_columns(["node_id", "nearest_anchor"])


SQL_KNN_SPATIAL = f"""
WITH n AS ({NODES_SQL}),
a AS (SELECT * FROM n WHERE (node_id - 1) % 97 = 0),
p AS (SELECT * FROM n WHERE (node_id - 1) % 97 <> 0)
SELECT node_id, nearest_anchor FROM (
  SELECT p.node_id, a.node_id AS nearest_anchor,
         ROW_NUMBER() OVER (PARTITION BY p.node_id ORDER BY
           {_hav_sql("p.lat", "p.lon", "a.lat", "a.lon")}, a.node_id) AS rk
  FROM p CROSS JOIN a
) WHERE rk = 1
"""


def q_knn_partitioned(sf_dir: str):
    """Spatial kNN via the cell-NEIGHBORHOOD partitioned path (no anchor
    broadcast): both sides bucketed by grid cell, anchors replicated into 3×3
    neighborhoods, boundary-bound confirmation, exact fallback for the residue.
    Same answer as the broadcast path — the exact SQL oracle applies."""
    from ..stages.spatial import knn_join_partitioned

    nodes = _nodes_pos(sf_dir)
    anchors = nodes.map_batches(
        lambda b: (lambda t: pa.table({"anchor_id": t["node_id"],
                                       "lat": t["lat"], "lon": t["lon"]}))(
            b.filter(pa.array(
                ((b["node_id"].to_numpy(zero_copy_only=False) - 1) % 97) == 0))),
        batch_format="pyarrow")
    non_anchor = nodes.map_batches(
        lambda b: b.filter(pa.array(
            ((b["node_id"].to_numpy(zero_copy_only=False) - 1) % 97) != 0)),
        batch_format="pyarrow")
    out = knn_join_partitioned(non_anchor, anchors, res=3, num_partitions=8)
    return out.select_columns(["node_id", "nearest_anchor"])


def q_dist_to_longer(sf_dir: str):
    """Distance to the nearest LONGER group (the reference's
    --incl-dist-to-longer, cli_args.rs:174-178, declared-but-asserted-off
    at main.rs:735 — implemented here): nodes grouped by (node_id-1) % 37,
    each group's 'length' a deterministic hash of the group id; per group
    the min haversine to any point of a strictly longer group (tie-break
    lexicographic on (length, g, component_id)). The globally longest group
    is omitted. Grid-bucketed 3×3 search with widening rounds — no
    broadcast, no all-pairs (stages/spatial.py dist_to_longer_join)."""
    from ..stages.spatial import dist_to_longer_join

    nodes = _nodes_pos(sf_dir)

    def prep(batch: pa.Table) -> pa.Table:
        nid = batch["node_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (nid - 1) % 37
        length = ((g * 2654435761) % 100003).astype(np.float64)
        return pa.table({
            "g": pa.array(g, pa.int64()),
            "component_id": pa.array(np.zeros(len(g), np.int64), pa.int64()),
            "length_m": pa.array(length, pa.float64()),
            "lat": batch["lat"], "lon": batch["lon"],
        })

    pts = nodes.map_batches(prep, batch_format="pyarrow")
    out = dist_to_longer_join(pts, res=4, num_partitions=8)

    def finish(batch: pa.Table) -> pa.Table:
        d = batch["dist_to_longer_m"].to_numpy(zero_copy_only=False)
        dm = np.floor(d * 10 + 0.5).astype(np.int64)
        return pa.table({"g": batch["g"],
                         "dist_to_longer_dm": pa.array(dm, pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


SQL_DIST_TO_LONGER = f"""
WITH n AS ({NODES_SQL}),
p AS (
  SELECT node_id, lat, lon, (node_id - 1) % 37 AS g,
         CAST(((node_id - 1) % 37) * 2654435761 % 100003 AS DOUBLE) AS len
  FROM n
),
best AS (
  SELECT a.g AS g,
         MIN({_hav_sql("a.lat", "a.lon", "b.lat", "b.lon")}) AS d
  FROM p a JOIN p b
    ON b.len > a.len OR (b.len = a.len AND b.g > a.g)
  GROUP BY a.g
)
SELECT g, {_dm("d")} AS dist_to_longer_dm FROM best
"""


# ═════════════════════════════════ no-SQL (rows-only) extension queries

def q_minhash_clusters(sf_dir: str):
    """MinHash+LSH near-dup clusters with a full SQL value-oracle.

    Config chosen for oracle-exactness with usable precision: 32 bands of
    r=2 rows — a true jaccard≥0.8 pair matches a band with prob ≥0.8²=0.64,
    so the miss probability is (1−0.64)³² ≈ 6e-15, zero on this fixed seeded
    data (r3: the earlier r=1 config made EVERY pair sharing any single
    minhash a candidate — 287k candidates from 5k docs — and the verify
    joins dominated the query; r=2 keeps the recall argument and cuts
    candidates ~40x). Candidates then pass a JOIN-based exact-Jaccard verify
    with the integer compare 5·|A∩B| ≥ 4·|A∪B|. Result = connected
    components over pairs with shingle-jaccard ≥ 0.8 — which the oracle
    recomputes independently in SQL (list_intersect + recursive CC), so the
    banding config is not part of the oracle contract.
    """
    from ..stages.dedup import minhash_dedup_clusters

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_dedup_clusters(docs, num_perm=64, bands=32,
                                  jaccard_threshold=(4, 5), verify_with=docs) \
        .select_columns(["node", "component_id"])


SQL_MINHASH_CLUSTERS = """
WITH RECURSIVE
  sh AS (
    SELECT doc_id, list_distinct(CASE
        WHEN len(string_split(text, ' ')) < 3 THEN [text]
        ELSE [array_to_string((string_split(text, ' '))[i:i+2], ' ')
              for i in generate_series(1, len(string_split(text, ' ')) - 2)]
      END) AS s
    FROM documents
  ),
  e AS (
    SELECT a.doc_id AS u, b.doc_id AS v
    FROM sh a JOIN sh b ON b.doc_id > a.doc_id
    WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(a.s || b.s))
  ),
  und AS (SELECT u AS s, v AS t FROM e UNION SELECT v, u FROM e),
  verts AS (SELECT DISTINCT s AS node FROM und),
  reach(node, lbl) AS (
    SELECT node, node FROM verts
    UNION
    SELECT und.t, reach.lbl FROM reach JOIN und ON und.s = reach.node
  )
SELECT node, MIN(lbl) AS component_id FROM reach GROUP BY node
"""


def q_simhash(sf_dir: str):
    """SimHash signatures — full SQL value-oracle recomputing every bit from
    DuckDB's md5() (same word hash: first 8 bytes of md5, big-endian)."""
    from ..stages.dedup import simhash_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(simhash_batch, batch_format="pyarrow")


SQL_SIMHASH = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wh AS (SELECT doc_id, md5(word) AS h FROM w),
bits AS (
  SELECT wh.doc_id, b.b AS bit,
         ((strpos('0123456789abcdef', substr(wh.h, 16 - (b.b // 4), 1)) - 1)
             >> (b.b % 4)) & 1 AS v
  FROM wh, (SELECT unnest(generate_series(1, 63)) AS b) b
),
score AS (
  SELECT doc_id, bit, CASE WHEN SUM(v) * 2 - COUNT(*) > 0 THEN 1 ELSE 0 END AS s
  FROM bits GROUP BY doc_id, bit
)
SELECT doc_id AS doc,
       CAST(SUM(CASE WHEN s = 1 THEN CAST(1 AS BIGINT) << (bit - 1)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM score GROUP BY doc_id
"""


def q_simhash_clusters(sf_dir: str):
    """SimHash hamming-band near-dup clusters (dedup.py
    simhash_hamming_clusters): 4 bands over the 63 stored bits guarantee
    EXACT candidate recall for hamming≤3 (pigeonhole), so the oracle can
    enumerate hamming≤3 pairs directly and recompute the components."""
    from ..stages.dedup import simhash_hamming_clusters

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_hamming_clusters(docs, max_hamming=3) \
        .select_columns(["node", "component_id"])


# sig CTEs identical to SQL_SIMHASH; pairs = hamming≤3 (the engine's band
# prefilter is provably lossless at k=3 with 4 bands, so the oracle skips it);
# clusters = recursive CC as in the minhash oracle
SQL_SIMHASH_CLUSTERS = """
WITH RECURSIVE w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wh AS (SELECT doc_id, md5(word) AS h FROM w),
bits AS (
  SELECT wh.doc_id, b.b AS bit,
         ((strpos('0123456789abcdef', substr(wh.h, 16 - (b.b // 4), 1)) - 1)
             >> (b.b % 4)) & 1 AS v
  FROM wh, (SELECT unnest(generate_series(1, 63)) AS b) b
),
score AS (
  SELECT doc_id, bit, CASE WHEN SUM(v) * 2 - COUNT(*) > 0 THEN 1 ELSE 0 END AS s
  FROM bits GROUP BY doc_id, bit
),
sig AS (
  SELECT doc_id AS doc,
         CAST(SUM(CASE WHEN s = 1 THEN CAST(1 AS BIGINT) << (bit - 1)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM score GROUP BY doc_id
),
e AS (
  SELECT a.doc AS u, b.doc AS v
  FROM sig a JOIN sig b ON b.doc > a.doc
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
und AS (SELECT u AS s, v AS t FROM e UNION SELECT v, u FROM e),
verts AS (SELECT DISTINCT s AS node FROM und),
reach(node, lbl) AS (
  SELECT node, node FROM verts
  UNION
  SELECT und.t, reach.lbl FROM reach JOIN und ON und.s = reach.node
)
SELECT node, MIN(lbl) AS component_id FROM reach GROUP BY node
"""


def q_knn_ivf(sf_dir: str):
    """IVF-bucketed ANN with nprobe = nlist (exhaustive probing): exercises the
    full coarse-quantize → shard → probe → rank machinery while the result is
    provably the exact top-k — so the brute-force SQL oracle applies."""
    from ..stages.similarity import knn_ivf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_ivf(emb, _load_queries(sf_dir), k=5, nlist=8, nprobe=8) \
        .select_columns(["query_id", "rank", "vec_id"])


def q_multimodal_stub(sf_dir: str):
    """Multimodal decode plumbing: binary payload → typed metadata via an
    actor-pool stage. Decode itself is a deterministic fake (no image libs in
    this container — clearly marked); the Ray-side schema/batching is real."""
    from ..stages.multimodal import decode_stub

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return decode_stub(docs)


SQL_MULTIMODAL_STUB = """
SELECT doc_id, n_chars % 640 + 1 AS width, n_chars % 480 + 1 AS height,
       (n_chars % 640 + 1) * (n_chars % 480 + 1) AS n_pixels
FROM documents
"""


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary top-50 (wordcount with in-batch combiner): the
    canonical 100-TB shuffle test — partial counts per batch, tiny global SUM,
    sort+limit. Ties at the boundary break token-ascending on both sides."""
    from ..stages.text import vocab_topk

    docs = _read(sf_dir, "documents", columns=["text"])
    return vocab_topk(docs, k=50)


SQL_VOCAB_TOPK = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(*) AS n FROM toks GROUP BY token
ORDER BY n DESC, token ASC LIMIT 50
"""


def q_normalize_text(sf_dir: str):
    """Normalization fingerprints (lowercase + trim → md5): the dedup-key prep
    pass; exact SQL parity via md5(trim(lower(text)))."""
    from ..stages.text import normalize_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(normalize_batch, batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "norm_fp": b["norm_fp"]}),
        batch_format="pyarrow")


SQL_NORMALIZE_TEXT = (
    "SELECT doc_id, md5(trim(lower(text))) AS norm_fp FROM documents")


def q_pii_counts(sf_dir: str):
    """PII scrub pre-pass: per-source totals of email-shaped and long-digit
    matches (vectorized RE2 on both engines)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import pii_counts_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    d = docs.map_batches(pii_counts_batch, batch_format="pyarrow")
    agg = d.groupby("source").aggregate(
        Sum("n_emails", alias_name="total_emails"),
        Sum("n_digitseq", alias_name="total_digitseq"),
        Count(alias_name="n_docs"))
    return agg.map_batches(
        lambda b: pa.table({
            "source": b["source"],
            "total_emails": b["total_emails"].cast(pa.int64()),
            "total_digitseq": b["total_digitseq"].cast(pa.int64()),
            "n_docs": b["n_docs"].cast(pa.int64())}),
        batch_format="pyarrow")


SQL_PII_COUNTS = r"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))) AS BIGINT) AS total_emails,
       CAST(SUM(len(regexp_extract_all(text, '[0-9]{6,}'))) AS BIGINT) AS total_digitseq,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
"""


def q_repetition(sf_dir: str):
    """Gopher-style repetition signal: mean distinct-token ppm per lang
    (integer arithmetic end-to-end — same exact-compare convention as
    ``quality``)."""
    from ray.data.aggregate import Count, Sum

    from ..stages.text import repetition_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    r = docs.map_batches(repetition_batch, batch_format="pyarrow")
    agg = r.groupby("lang").aggregate(
        Sum("distinct_ppm", alias_name="sum_ppm"), Count(alias_name="n"))

    def mean_int(batch: pa.Table) -> pa.Table:
        s = batch["sum_ppm"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({"lang": batch["lang"],
                         "mean_distinct_ppm": pa.array(s // n, pa.int64())})

    return agg.map_batches(mean_int, batch_format="pyarrow")


SQL_REPETITION = """
WITH perdoc AS (
  SELECT lang,
         len(list_distinct(string_split(text, ' '))) * 1000000
         // len(string_split(text, ' ')) AS distinct_ppm
  FROM documents
)
SELECT lang, CAST(SUM(distinct_ppm) // COUNT(*) AS BIGINT) AS mean_distinct_ppm
FROM perdoc GROUP BY lang
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (per-lang keep rates, key-mod filter —
    map-only, reproducible at any parallelism) → per-lang sampled counts."""
    from ray.data.aggregate import Count

    from ..stages.text import stratified_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    rates = {"en": (1, 10), "de": (1, 2), "fr": (1, 2)}
    s = stratified_sample(docs, rates, group_col="lang", key_col="doc_id",
                          default=(1, 1))
    return s.groupby("lang").aggregate(Count(alias_name="n_sampled"))


SQL_STRATIFIED_SAMPLE = """
SELECT lang, COUNT(*) AS n_sampled FROM documents
WHERE doc_id % (CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 2
                WHEN 'fr' THEN 2 ELSE 1 END)
      < (CASE lang WHEN 'en' THEN 1 ELSE 1 END)
GROUP BY lang
"""


def q_length_histogram(sf_dir: str):
    """Document-length histogram (fixed 100-char buckets)."""
    from ..stages.text import length_histogram

    docs = _read(sf_dir, "documents", columns=["n_chars"])
    return length_histogram(docs, bucket_width=100)


SQL_LENGTH_HISTOGRAM = """
SELECT n_chars // 100 AS bucket, COUNT(*) AS n
FROM documents GROUP BY n_chars // 100
"""


QUERIES = {
    "lump_components": q_lump_components,
    "lump_lengths": q_lump_lengths,
    "degree_pillar": q_degree_pillar,
    "way_contraction": q_way_contraction,
    "scc_loops": q_scc_loops,
    "flow_upstream": q_flow_upstream,
    "directed_ends": q_directed_ends,
    "tagfilter_kv": q_tagfilter_kv,
    "tagfilter_in": q_tagfilter_in,
    "tagfilter_regex": q_tagfilter_regex,
    "tagfilter_func": q_tagfilter_func,
    "taggrouper": q_taggrouper,
    "group_stats": q_group_stats,
    "latest_ts": q_latest_ts,
    "top_k_orders": q_top_k_orders,
    "threshold": q_threshold,
    "cumfrac": q_cumfrac,
    "region_rollup": q_region_rollup,
    "events_window": q_events_window,
    "dedup_exact": q_dedup_exact,
    "fingerprint": q_fingerprint,
    "token_stats": q_token_stats,
    "quality": q_quality,
    "langid": q_langid,
    "knn_cosine": q_knn_cosine,
    "tile_assign": q_tile_assign,
    "pip": q_pip,
    "knn_spatial": q_knn_spatial,
    "knn_partitioned": q_knn_partitioned,
    "dist_to_longer": q_dist_to_longer,
    "minhash_clusters": q_minhash_clusters,
    "simhash": q_simhash,
    "simhash_clusters": q_simhash_clusters,
    "knn_ivf": q_knn_ivf,
    "multimodal_stub": q_multimodal_stub,
    "vocab_topk": q_vocab_topk,
    "normalize_text": q_normalize_text,
    "pii_counts": q_pii_counts,
    "length_histogram": q_length_histogram,
    "repetition": q_repetition,
    "stratified_sample": q_stratified_sample,
}

ORACLES = {
    "lump_components": SQL_LUMP_COMPONENTS,
    "lump_lengths": SQL_LUMP_LENGTHS,
    "degree_pillar": SQL_DEGREE_PILLAR,
    "way_contraction": SQL_WAY_CONTRACTION,
    "scc_loops": SQL_SCC_LOOPS,
    "flow_upstream": SQL_FLOW_UPSTREAM,
    "directed_ends": SQL_DIRECTED_ENDS,
    "tagfilter_kv": SQL_TAGFILTER_KV,
    "tagfilter_in": SQL_TAGFILTER_IN,
    "tagfilter_regex": SQL_TAGFILTER_REGEX,
    "tagfilter_func": SQL_TAGFILTER_FUNC,
    "taggrouper": SQL_TAGGROUPER,
    "group_stats": SQL_GROUP_STATS,
    "latest_ts": SQL_LATEST_TS,
    "top_k_orders": SQL_TOP_K_ORDERS,
    "threshold": SQL_THRESHOLD,
    "cumfrac": SQL_CUMFRAC,
    "region_rollup": SQL_REGION_ROLLUP,
    "events_window": SQL_EVENTS_WINDOW,
    "dedup_exact": SQL_DEDUP_EXACT,
    "fingerprint": SQL_FINGERPRINT,
    "token_stats": SQL_TOKEN_STATS,
    "quality": SQL_QUALITY,
    "langid": SQL_LANGID,
    "knn_cosine": SQL_KNN_COSINE,
    "tile_assign": SQL_TILE_ASSIGN,
    "pip": SQL_PIP,
    "knn_spatial": SQL_KNN_SPATIAL,
    "knn_partitioned": SQL_KNN_SPATIAL,
    "dist_to_longer": SQL_DIST_TO_LONGER,
    "multimodal_stub": SQL_MULTIMODAL_STUB,
    "minhash_clusters": SQL_MINHASH_CLUSTERS,
    "simhash": SQL_SIMHASH,
    "simhash_clusters": SQL_SIMHASH_CLUSTERS,
    "knn_ivf": SQL_KNN_COSINE,  # nprobe=nlist → provably the exact top-k
    "vocab_topk": SQL_VOCAB_TOPK,
    "normalize_text": SQL_NORMALIZE_TEXT,
    "pii_counts": SQL_PII_COUNTS,
    "length_histogram": SQL_LENGTH_HISTOGRAM,
    "repetition": SQL_REPETITION,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
}


# ═══════════════════════════════════ waterways family (G11/G14/G16/G18/G19)

def _decade_chain_edges(sf_dir: str, with_tag: bool = False, with_len: bool = False):
    """Directed decade CHAINS (no closing edges → DAG), optional tagid=doc%3 and
    integer length doc%13+1 — shared derivation for the directed-op oracles.
    Built once per (params) per session (derivation cache)."""

    def build():
        docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

        def emit(batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ((nch % 7) != 0) & ((d % 10) != 9)
            dk = d[keep]
            cols = {"src": pa.array(dk + 1, pa.int64()),
                    "dst": pa.array(dk + 2, pa.int64())}
            if with_tag:
                cols["tagid"] = pa.array(dk % 3, pa.int64())
            if with_len:
                cols["length_m"] = pa.array((dk % 13 + 1).astype(np.float64),
                                            pa.float64())
            return pa.table(cols)

        return docs.map_batches(emit, batch_format="pyarrow")

    return cached_ds(("decade_chain_edges", sf_dir, with_tag, with_len), build)


def _decade_flow(sf_dir: str):
    """G13 upstream flow (split-equally) over the decade chains — the shared
    mid-derivation of the -down battery entries (flow_upstream,
    upstream_segments; main.rs computes this ONCE per run)."""
    from ..stages.scc import upstream_flow

    def build():
        return upstream_flow(_decade_chain_edges(sf_dir, with_len=True),
                             split_equally=True, num_partitions=8)

    return cached_ds(("decade_flow", sf_dir), build)


_CHAIN_RUNS_SQL = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst, doc_id AS d, doc_id // 10 AS dec,
         doc_id % 3 AS tagid, doc_id % 13 + 1 AS len
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
runs AS (
  SELECT *, d - ROW_NUMBER() OVER (PARTITION BY dec ORDER BY d) AS run
  FROM e
)
"""


def q_down_composed(sf_dir: str):
    """The COMPOSED -down run (pipelines/waterways_down.waterways_down —
    main.rs:146-1269 single-program semantics): one SCC feeds contraction,
    one flow pass feeds ends/paths; this query returns the composed run's
    ``ends`` table (end_nid, end upstream as exact int) over the decade-chain
    DAG. The cycle-contraction branch of the same composition is pytest-
    covered (tests/test_waterways.py composed-vs-stages parity)."""
    from .waterways_down import waterways_down

    edges = _decade_chain_edges(sf_dir, with_len=True)
    res = waterways_down(edges, num_partitions=8)

    def project(batch: pa.Table) -> pa.Table:
        up = batch["end_upstream_m"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "end_nid": batch["end_nid"].cast(pa.int64()),
            "end_upstream_int": pa.array(
                np.floor(up + 0.5).astype(np.int64), pa.int64()),
        })

    return res["ends"].map_batches(project, batch_format="pyarrow")


SQL_DOWN_COMPOSED = _CHAIN_RUNS_SQL + """
SELECT MAX(dst) AS end_nid, CAST(SUM(len) AS BIGINT) AS end_upstream_int
FROM runs GROUP BY run, dec
"""


def q_cycle_contraction(sf_dir: str):
    """G11: contract decade cycles → DAG edges (cycle decades vanish).
    Reuses the session's shared G10 SCC run (``_decade_scc``)."""
    edges = _decade_closed_edges(sf_dir)

    def with_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "length_m", pa.array(np.ones(len(batch)), pa.float64()))

    from ..stages.waterways import contract_cycles

    dag, _scc = contract_cycles(edges.map_batches(with_len, batch_format="pyarrow"),
                                num_partitions=8,
                                scc_labels=_decade_scc(sf_dir))
    return dag.select_columns(["src", "dst"])


SQL_CYCLE_CONTRACTION = """
WITH cyc AS (
  SELECT doc_id // 10 AS dec FROM documents
  GROUP BY doc_id // 10
  HAVING COUNT(*) = 10 AND SUM(CASE WHEN n_chars % 7 = 0 THEN 1 ELSE 0 END) = 0
),
e AS (
  SELECT a.doc_id + 1 AS src,
         CASE WHEN a.doc_id % 10 <> 9 THEN a.doc_id + 2 ELSE a.doc_id - 8 END AS dst,
         a.doc_id // 10 AS dec
  FROM documents a JOIN documents t
    ON t.doc_id = (CASE WHEN a.doc_id % 10 <> 9 THEN a.doc_id + 1 ELSE a.doc_id - 9 END)
  WHERE a.n_chars % 7 <> 0
)
SELECT src, dst FROM e WHERE dec NOT IN (SELECT dec FROM cyc)
"""


def _decade_begp(sf_dir: str):
    """G14+G16 rows over the chain DAG (zero flow) — biggest-end node
    assignments and per-end path rows in ONE shared pass (kind=0 nodes,
    kind=1 paths), reused by the biggest_end and grouped_paths queries."""
    from ..stages.waterways import biggest_end_and_grouped_paths

    def build():
        edges = _decade_chain_edges(sf_dir, with_len=True)

        def with_flow(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "upstream_m", pa.array(np.zeros(len(batch)), pa.float64()))

        return biggest_end_and_grouped_paths(
            edges.map_batches(with_flow, batch_format="pyarrow"),
            num_partitions=8)

    return cached_ds(("decade_begp", sf_dir), build)


def q_biggest_end(sf_dir: str):
    """G14 over the chain DAG: every node's assigned end (= its run's last node)."""
    out = _decade_begp(sf_dir)

    def nodes_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], pa.scalar(0, pa.int64())))
        return pa.table({"node": t["node"], "end_nid": t["end_nid"]})

    return out.map_batches(nodes_only, batch_format="pyarrow")


SQL_BIGGEST_END = _CHAIN_RUNS_SQL + """
, ends AS (
  SELECT run, dec, MAX(dst) AS end_nid, MIN(src) AS first_src FROM runs
  GROUP BY run, dec
)
SELECT n.node, e.end_nid FROM (
  SELECT src AS node, run, dec FROM runs
  UNION
  SELECT dst AS node, run, dec FROM runs
) n JOIN ends e ON e.run = n.run AND e.dec = n.dec
"""


def q_grouped_paths(sf_dir: str):
    """G16 core over the chain DAG: per-end path rows (end, n_nodes)."""
    out = _decade_begp(sf_dir)

    def paths_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], pa.scalar(1, pa.int64())))
        return pa.table({"end_nid": t["end_nid"], "n_nodes": t["n_nodes"]})

    return out.map_batches(paths_only, batch_format="pyarrow")


SQL_GROUPED_PATHS = _CHAIN_RUNS_SQL + """
SELECT MAX(dst) AS end_nid, COUNT(*) + 1 AS n_nodes FROM runs GROUP BY run, dec
"""


def q_grouped_paths_dist(sf_dir: str):
    """G16 via the FORCED distributed list-ranking kernel (``max_group_rows=0``
    routes EVERY component through levelflow.grouped_paths_distributed —
    pointer-doubling, no per-component task): per-end path rows with the
    walked distance. Same semantics as grouped_paths (-down/main.rs
    grouped-ends), exercising the giant-component scale path end to end."""
    from ..stages.waterways import biggest_end_and_grouped_paths

    edges = _decade_chain_edges(sf_dir, with_len=True)

    def with_flow(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "upstream_m", pa.array(np.zeros(len(batch)), pa.float64()))

    out = biggest_end_and_grouped_paths(
        edges.map_batches(with_flow, batch_format="pyarrow"),
        num_partitions=8, max_group_rows=0)

    def paths_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], pa.scalar(1, pa.int64())))
        d = t["dist_m"].to_numpy(zero_copy_only=False)
        return pa.table({"end_nid": t["end_nid"], "n_nodes": t["n_nodes"],
                         "dist_m": pa.array(np.rint(d).astype(np.int64))})

    return out.map_batches(paths_only, batch_format="pyarrow")


SQL_GROUPED_PATHS_DIST = _CHAIN_RUNS_SQL + """
SELECT MAX(dst) AS end_nid, COUNT(*) + 1 AS n_nodes,
       CAST(SUM(len) AS BIGINT) AS dist_m
FROM runs GROUP BY run, dec
"""


def q_tag_groups(sf_dir: str):
    """G18 flood fill over the chain DAG with tagid = doc%3 → per-taggroup
    segment counts (stream levels excluded from the oracle compare)."""
    from ..stages.waterways import tag_groups

    edges = _decade_chain_edges(sf_dir, with_tag=True)
    out = tag_groups(edges, num_partitions=8)
    return out.select_columns(["taggroupid", "tagid", "num_segments"])


SQL_TAG_GROUPS = _CHAIN_RUNS_SQL + """
, truns AS (
  SELECT *, d - ROW_NUMBER() OVER (PARTITION BY dec, run, tagid ORDER BY d) AS trun
  FROM runs
)
SELECT MIN(src) AS taggroupid, tagid, COUNT(*) AS num_segments
FROM truns GROUP BY dec, run, tagid, trun
"""


def _decade_lsm(sf_dir: str):
    """G19 per-mouth river-system rows over the chain DAG — shared by the
    longest_source_mouth query and the S6 ends-CSV round-trip (one pass in
    the reference's -down run)."""
    from ..stages.waterways import longest_source_mouth

    return cached_ds(
        ("decade_lsm", sf_dir),
        lambda: longest_source_mouth(
            _decade_chain_edges(sf_dir, with_len=True), num_partitions=8))


def q_longest_source_mouth(sf_dir: str):
    """G19 over the chain DAG: per-mouth river-system length (integer lengths)."""
    out = _decade_lsm(sf_dir)

    def to_int(batch: pa.Table) -> pa.Table:
        m = batch["river_system_length_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "mouth_nid": batch["mouth_nid"],
            "source_nid": batch["source_nid"],
            "length_int": pa.array(np.floor(m + 0.5).astype(np.int64), pa.int64()),
            "path_nodes": batch["path_nodes"],
        })

    return out.map_batches(to_int, batch_format="pyarrow")


SQL_LONGEST_SOURCE_MOUTH = _CHAIN_RUNS_SQL + """
SELECT MAX(dst) AS mouth_nid, MIN(src) AS source_nid,
       CAST(SUM(len) AS BIGINT) AS length_int, COUNT(*) + 1 AS path_nodes
FROM runs GROUP BY run, dec
"""


def _decade_loops(sf_dir: str):
    """G21 loop-feature rows over the decade cycles — computed once per
    session off the shared SCC run, reused by loop_stats + the OpenMetrics
    round-trip (the -down run emits both outputs from one loops pass)."""
    from ..stages.waterways import loop_features

    def build():
        return loop_features(_decade_closed_edges(sf_dir), _nodes_pos(sf_dir),
                             num_partitions=8, scc_labels=_decade_scc(sf_dir))

    return cached_ds(("decade_loops", sf_dir), build)


def q_loop_stats(sf_dir: str):
    """G21 loop features (decade cycles): root_nid, num_nodes, num_segments.
    Positions arrive by hash join against the derived nodes table (r2 — the
    broadcast position dict is gone)."""
    out = _decade_loops(sf_dir)
    return out.select_columns(["root_nid", "num_nodes", "num_segments"])


SQL_LOOP_STATS = """
SELECT (doc_id // 10) * 10 + 1 AS root_nid, COUNT(*) AS num_nodes,
       COUNT(*) AS num_segments
FROM documents
GROUP BY doc_id // 10
HAVING COUNT(*) = 10 AND SUM(CASE WHEN n_chars % 7 = 0 THEN 1 ELSE 0 END) = 0
"""


# ═══════════════════════ per-component ops family (G2-G9, rows-only checks)

def _lump_graph_and_positions(sf_dir: str):
    from ..stages.graph import connected_components

    def add_cols(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return batch.append_column("g", pa.array(np.zeros(n, dtype=np.int64))) \
                    .append_column("inter_nids",
                                   pa.array([[]] * n, pa.list_(pa.int64())))

    edges_g = cached_ds(
        ("lump_edges_g", sf_dir),
        lambda: _und_edges(sf_dir).map_batches(add_cols,
                                               batch_format="pyarrow"))
    labels = cached_ds(
        ("lump_labels_g", sf_dir),
        lambda: connected_components(edges_g, "u", "v", "g", num_partitions=8))

    def build_pos():
        import duckdb

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
        pos_rows = con.execute(f"SELECT node_id, lat, lon FROM ({D.NODES_SQL}) n").fetchall()
        con.close()
        return {int(r[0]): (int(r[1]), int(r[2])) for r in pos_rows}

    pos = cached_obj(("lump_pos_dict", sf_dir), build_pos)
    return edges_g, labels, pos


def _chain_graph_and_positions(sf_dir: str):
    """Chain-only lump graph: the d↔d-5 long links are filtered out, so every
    component is a simple PATH of consecutive node ids. That closes the form of
    G2/G4/G8/G9 outputs (compress→2 vertices, lines→one full-span line, frames→
    one hull-span line, betweenness→(j+1)(k-j-1) per edge) and makes them
    SQL-oracle-checkable (VERDICT r1 next-step 3); the cyclic/branchy cases
    stay covered by tests/test_components.py fixtures."""
    from ..stages.graph import connected_components

    def chain_only(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array((v - u) == 1))
        n = len(t)
        return t.append_column("g", pa.array(np.zeros(n, dtype=np.int64))) \
                .append_column("inter_nids",
                               pa.array([[]] * n, pa.list_(pa.int64())))

    edges_g = cached_ds(
        ("chain_edges_g", sf_dir),
        lambda: _und_edges(sf_dir).map_batches(chain_only,
                                               batch_format="pyarrow"))
    labels = cached_ds(
        ("chain_labels_g", sf_dir),
        lambda: connected_components(edges_g, "u", "v", "g", num_partitions=8))
    return edges_g, labels, _nodes_pos(sf_dir)


# gaps-and-islands over the gated chain links: a run of consecutive gated docs
# d1..d2 forms the path component with nodes d1..d2+1 (node_id = doc_id + 1,
# min node = d1 = the CC label convention)
_CHAIN_RUNS_UND_SQL = """
WITH RECURSIVE
  gated AS (
    SELECT d.doc_id AS d
    FROM documents d JOIN documents p ON p.doc_id = d.doc_id - 1
    WHERE d.doc_id % 8 <> 0 AND d.lang = p.lang
  ),
  runs AS (SELECT d, d - ROW_NUMBER() OVER (ORDER BY d) AS run FROM gated),
  agg AS (SELECT MIN(d) AS d1, MAX(d) AS d2, COUNT(*) AS ne FROM runs GROUP BY run)
"""


def q_component_compress(sf_dir: str):
    """G2 per path component: (before, after) vertex counts; after = 2 always
    (every degree-2 interior contracts; no parallel-edge undo on a path)."""
    from ..pipelines.group_ops import component_compress_stats

    edges_g, labels, _nodes = _chain_graph_and_positions(sf_dir)
    return component_compress_stats(
        edges_g, labels, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, False)) \
        .select_columns(["component_id", "vertices_before", "vertices_after"])


SQL_COMPONENT_COMPRESS = _CHAIN_RUNS_UND_SQL + """
SELECT d1 AS component_id, ne + 1 AS vertices_before, 2 AS vertices_after
FROM agg
"""


def q_component_lines(sf_dir: str):
    """G4 per path component: exactly one line spanning the whole path."""
    from ..pipelines.group_ops import component_lines

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    return component_lines(
        edges_g, labels, nodes_ds, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, True)) \
        .select_columns(["component_id", "line_idx", "n_nodes"])


SQL_COMPONENT_LINES = _CHAIN_RUNS_UND_SQL + """
SELECT d1 AS component_id, 0 AS line_idx, ne + 1 AS n_nodes FROM agg
"""


def q_component_frames(sf_dir: str):
    """G8 per path component: hull → all-pairs paths → union = the sub-path
    spanning the hull nodes → one frame line."""
    from ..pipelines.group_ops import component_frames

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    return component_frames(
        edges_g, labels, nodes_ds, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, True))


# hull membership recomputed independently in SQL: point p of a component is a
# hull VERTEX iff it is not inside-or-on any triangle of three other points and
# not on the segment of any two other points (exact integer tests in HUGEINT —
# the engine's monotone chain uses python bigints, both are overflow-free).
SQL_COMPONENT_FRAMES = _CHAIN_RUNS_UND_SQL + f""",
  compnodes AS (
    SELECT d1 AS comp, UNNEST(generate_series(d1, d2 + 1)) AS node FROM agg
  ),
  pts AS (
    SELECT comp, node,
           CAST((((node - 1) * {D.LAT_MULT}) % {D.LAT_MOD} - {D.LAT_OFF}) AS HUGEINT) AS x,
           CAST((((node - 1) * {D.LON_MULT}) % {D.LON_MOD} - {D.LON_OFF}) AS HUGEINT) AS y
    FROM compnodes
  ),
  hull AS (
    SELECT p.comp, p.node FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts a, pts b, pts c
      WHERE a.comp = p.comp AND b.comp = p.comp AND c.comp = p.comp
        AND a.node < b.node AND b.node < c.node
        AND a.node <> p.node AND b.node <> p.node AND c.node <> p.node
        AND p.x BETWEEN LEAST(a.x, b.x, c.x) AND GREATEST(a.x, b.x, c.x)
        AND p.y BETWEEN LEAST(a.y, b.y, c.y) AND GREATEST(a.y, b.y, c.y)
        AND ((  (b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) >= 0
            AND (c.x-b.x)*(p.y-b.y) - (c.y-b.y)*(p.x-b.x) >= 0
            AND (a.x-c.x)*(p.y-c.y) - (a.y-c.y)*(p.x-c.x) >= 0)
         OR (   (b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) <= 0
            AND (c.x-b.x)*(p.y-b.y) - (c.y-b.y)*(p.x-b.x) <= 0
            AND (a.x-c.x)*(p.y-c.y) - (a.y-c.y)*(p.x-c.x) <= 0))
    )
    AND NOT EXISTS (
      SELECT 1 FROM pts a, pts b
      WHERE a.comp = p.comp AND b.comp = p.comp
        AND a.node < b.node AND a.node <> p.node AND b.node <> p.node
        AND (b.x-a.x)*(p.y-a.y) - (b.y-a.y)*(p.x-a.x) = 0
        AND p.x BETWEEN LEAST(a.x, b.x) AND GREATEST(a.x, b.x)
        AND p.y BETWEEN LEAST(a.y, b.y) AND GREATEST(a.y, b.y)
    )
  )
SELECT 0 AS g, comp AS component_id, 0 AS frame_idx,
       CAST(MAX(node) - MIN(node) + 1 AS BIGINT) AS n_nodes
FROM hull GROUP BY comp
"""


def q_betweenness(sf_dir: str):
    """G9 per path component with full sampling (components ≤ 8 nodes ≤
    max_nodes): bc(edge j of a k-node path) = (j+1)·(k-j-1) unordered pairs."""
    from ..pipelines.group_ops import component_betweenness

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    return component_betweenness(
        edges_g, labels, nodes_ds, max_nodes=50, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, True))


SQL_BETWEENNESS = _CHAIN_RUNS_UND_SQL + """
SELECT 0 AS g, a.d1 AS component_id, r.d AS u, r.d + 1 AS v,
       (r.d - a.d1 + 1) * (a.d2 - r.d + 1) AS bc_value
FROM agg a JOIN runs r ON r.d BETWEEN a.d1 AND a.d2
"""


def q_tag_group_classify(sf_dir: str):
    """Full G18 (pairwise river classification + stream_level_code + confluence
    distances) over tagged decade chains. tagid = (doc//4) % 3 gives same-tag
    RUNS of up to 4 edges; adjacent groups always differ, so every boundary is
    a confluence whose flow types are (In, Out) → the terminal-distributary
    rule — levels/codes/distances are then closed-form for the SQL oracle. The
    branching/tributary/side-channel rules are pytest-covered
    (tests/test_waterways.py G18 fixtures)."""
    from ..stages.scc import upstream_flow
    from ..stages.waterways import tag_groups_full

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def emit(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((nch % 7) != 0) & ((d % 10) != 9)
        dk = d[keep]
        return pa.table({
            "src": pa.array(dk + 1, pa.int64()),
            "dst": pa.array(dk + 2, pa.int64()),
            "length_m": pa.array((dk % 13 + 1).astype(np.float64), pa.float64()),
            "tagid": pa.array((dk // 4) % 3, pa.int64()),
        })

    edges = docs.map_batches(emit, batch_format="pyarrow")
    flow = upstream_flow(edges, split_equally=True, num_partitions=8,
                         distributed=False)
    # re-attach tagid (the flow output carries src/dst/length/upstream only)
    def retag(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        if "tagid" in batch.column_names:  # flow passes tagid through (r4)
            batch = batch.drop_columns(["tagid"])
        return batch.append_column("tagid", pa.array((s - 1) // 4 % 3, pa.int64()))

    full = tag_groups_full(flow.map_batches(retag, batch_format="pyarrow"),
                           num_partitions=8)
    return full.select_columns([
        "taggroupid", "tagid", "num_segments", "length_dm", "upstream_dm",
        "num_sources", "num_sinks", "num_confluences", "n_terminal_dist",
        "n_parent_rivers", "n_unallocated", "stream_level",
        "stream_level_code", "n_conf_pairs", "conf_dist_dm"])


SQL_TAG_GROUP_CLASSIFY = """
WITH e AS (
  SELECT doc_id AS d, doc_id // 10 AS dec, (doc_id // 4) % 3 AS tagid,
         doc_id % 13 + 1 AS len
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
runs0 AS (
  SELECT *, d - ROW_NUMBER() OVER (PARTITION BY dec ORDER BY d) AS run FROM e
),
runs AS (
  SELECT *, SUM(len) OVER (PARTITION BY dec, run ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS up
  FROM runs0
),
runagg AS (SELECT run, dec, MIN(d) AS d1, MAX(d) AS d2 FROM runs GROUP BY run, dec),
grp AS (
  SELECT r.run, r.dec, r.tagid,
         r.d - ROW_NUMBER() OVER (PARTITION BY r.run, r.dec, r.tagid ORDER BY r.d) AS tg_run,
         r.d, r.len, COALESCE(r.up, 0) AS up
  FROM runs r
),
gagg AS (
  SELECT g.run, g.dec, g.tagid, MIN(g.d) AS g1, MAX(g.d) AS g2,
         COUNT(*) AS nseg, SUM(g.len) AS glen,
         MAX(CASE WHEN g.d = m.gmax THEN g.up END) AS gup
  FROM grp g JOIN (SELECT run, dec, tagid, tg_run, MAX(d) AS gmax
                   FROM grp GROUP BY run, dec, tagid, tg_run) m
    ON m.run = g.run AND m.dec = g.dec AND m.tagid = g.tagid AND m.tg_run = g.tg_run
  GROUP BY g.run, g.dec, g.tagid, g.tg_run
),
gfull AS (
  SELECT ga.*, ra.d1 AS c1, ra.d2 AS c2,
         (SELECT COUNT(*) FROM gagg g2
          WHERE g2.run = ga.run AND g2.dec = ga.dec AND g2.g1 > ga.g1) AS lvl
  FROM gagg ga JOIN runagg ra ON ra.run = ga.run AND ra.dec = ga.dec
),
sinks AS (
  SELECT g1 + 1 AS gid, gup,
         ROW_NUMBER() OVER (ORDER BY gup DESC, g1 + 1 ASC) AS rk
  FROM gfull WHERE g2 = c2
)
SELECT gf.g1 + 1 AS taggroupid, gf.tagid, gf.nseg AS num_segments,
       CAST(gf.glen * 10 AS BIGINT) AS length_dm,
       CAST(gf.gup AS BIGINT) * 10 AS upstream_dm,
       CASE WHEN gf.g1 = gf.c1 THEN 1 ELSE 0 END AS num_sources,
       CASE WHEN gf.g2 = gf.c2 THEN 1 ELSE 0 END AS num_sinks,
       (CASE WHEN gf.g1 > gf.c1 THEN 1 ELSE 0 END
        + CASE WHEN gf.g2 < gf.c2 THEN 1 ELSE 0 END) AS num_confluences,
       CASE WHEN gf.g1 > gf.c1 THEN 1 ELSE 0 END AS n_terminal_dist,
       CASE WHEN gf.g2 < gf.c2 THEN 1 ELSE 0 END AS n_parent_rivers,
       0 AS n_unallocated,
       gf.lvl AS stream_level,
       (SELECT CAST(s.rk AS VARCHAR) FROM sinks s
        JOIN gfull sg ON sg.g1 + 1 = s.gid
        WHERE sg.run = gf.run AND sg.dec = gf.dec)
         || repeat('.1', CAST(gf.lvl AS INT)) AS stream_level_code,
       CASE WHEN gf.g1 > gf.c1 AND gf.g2 < gf.c2 THEN 1 ELSE 0 END AS n_conf_pairs,
       CAST(CASE WHEN gf.g1 > gf.c1 AND gf.g2 < gf.c2 THEN gf.glen * 10
            ELSE 0 END AS BIGINT) AS conf_dist_dm
FROM gfull gf
"""


def q_all_wayids(sf_dir: str):
    """J3 ``all_wayids`` output property (collect_all_wayids,
    bin/osm-lump-ways/main.rs:46-62): per component, the sorted-dedup
    ``w{id}`` list of member way ids, ';'-joined. Way analog in the documents
    derivation: chain edge of doc d IS way ``d`` covering nodes (d, d+1)."""
    from ..stages.graph import connected_components

    def chain_only(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v - u) == 1))

    edges = cached_ds(
        ("und_chain_edges", sf_dir),
        lambda: _und_edges(sf_dir).map_batches(chain_only,
                                               batch_format="pyarrow"))
    labels = cached_ds(
        ("und_chain_cc", sf_dir),
        lambda: connected_components(edges, "u", "v", num_partitions=8))
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["u", "component_id"])
    e = hash_join(edges, lab, ("u",), how="inner", num_partitions=8)

    # partition-level assembly (one Python call per HASH PARTITION, not per
    # component — the degree_pillar r3 lever): sort the partition by
    # (component_id, u), run-split on component boundaries
    def add_part(batch: pa.Table) -> pa.Table:
        c = batch["component_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_part", pa.array((c * 0x9E3779B1 % 8).astype(np.int64)))

    def per_partition(df):
        import pandas as pd

        df = df.sort_values(["component_id", "u"], kind="mergesort")
        c = df["component_id"].to_numpy(dtype=np.int64)
        u = df["u"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        ends = np.r_[starts[1:], len(c)]
        comp, joined, counts = [], [], []
        for s, t in zip(starts, ends):
            w = np.unique(u[s:t])
            comp.append(int(c[s]))
            joined.append(";".join(f"w{x}" for x in w))
            counts.append(len(w))
        return pd.DataFrame({"component_id": comp, "all_wayids": joined,
                             "n_wayids": counts})

    return e.map_batches(add_part, batch_format="pyarrow") \
        .groupby("_part").map_groups(per_partition, batch_format="pandas")


SQL_ALL_WAYIDS = """
WITH gated AS (
  SELECT d.doc_id AS d
  FROM documents d JOIN documents p ON p.doc_id = d.doc_id - 1
  WHERE d.doc_id % 8 <> 0 AND d.lang = p.lang
),
runs AS (SELECT d, d - ROW_NUMBER() OVER (ORDER BY d) AS run FROM gated)
SELECT MIN(d) AS component_id,
       string_agg('w' || CAST(d AS VARCHAR), ';' ORDER BY d) AS all_wayids,
       COUNT(*) AS n_wayids
FROM runs GROUP BY run
"""


def q_ends_tag_values(sf_dir: str):
    """J6 ``--ends-tag`` extras (-down/main.rs:935-1010): for each END node
    (out-degree 0 of the decade chains), collect the tag values of the ways
    passing through it, ';'-concatenated. Documented divergence: the reference
    concatenates in nondeterministic par_bridge order and dedups only
    consecutive repeats; this engine emits DISTINCT values in sorted order."""
    from ..stages.relational import cogroup_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"])
    ends = _decade_ends(sf_dir)

    def emit_covers(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((nch % 7) != 0) & ((d % 10) != 9)
        dk = d[keep]
        lang = batch["lang"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "node": pa.array(np.concatenate([dk + 1, dk + 2]), pa.int64()),
            "val": pa.array(np.concatenate([lang, lang]), pa.string()),
        })

    covers = docs.map_batches(emit_covers, batch_format="pyarrow")
    hits = cogroup_join(covers, ends, ("node",), how="inner", num_partitions=8)

    def per_end(df):
        import pandas as pd

        vals = sorted(set(df["val"]))
        return pd.DataFrame({"node": [int(df["node"].iloc[0])],
                             "tag_vals": [";".join(vals)]})

    return hits.groupby("node").map_groups(per_end, batch_format="pandas")


SQL_ENDS_TAG_VALUES = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst, lang
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
ends AS (
  SELECT DISTINCT dst AS node FROM e
  WHERE dst NOT IN (SELECT src FROM e)
),
covers AS (
  SELECT src AS node, lang AS val FROM e
  UNION ALL SELECT dst, lang FROM e
)
SELECT c.node, string_agg(DISTINCT c.val, ';' ORDER BY c.val) AS tag_vals
FROM covers c JOIN ends USING (node)
GROUP BY c.node
"""


QUERIES.update({
    "tag_group_classify": q_tag_group_classify,
    "all_wayids": q_all_wayids,
    "ends_tag_values": q_ends_tag_values,
})
ORACLES.update({
    "tag_group_classify": SQL_TAG_GROUP_CLASSIFY,
    "all_wayids": SQL_ALL_WAYIDS,
    "ends_tag_values": SQL_ENDS_TAG_VALUES,
})


QUERIES.update({
    "cycle_contraction": q_cycle_contraction,
    "down_composed": q_down_composed,
    "biggest_end": q_biggest_end,
    "grouped_paths": q_grouped_paths,
    "grouped_paths_dist": q_grouped_paths_dist,
    "tag_groups": q_tag_groups,
    "longest_source_mouth": q_longest_source_mouth,
    "loop_stats": q_loop_stats,
    "component_compress": q_component_compress,
    "component_lines": q_component_lines,
    "component_frames": q_component_frames,
    "betweenness": q_betweenness,
})

ORACLES.update({
    "cycle_contraction": SQL_CYCLE_CONTRACTION,
    "down_composed": SQL_DOWN_COMPOSED,
    "biggest_end": SQL_BIGGEST_END,
    "grouped_paths": SQL_GROUPED_PATHS,
    "grouped_paths_dist": SQL_GROUPED_PATHS_DIST,
    "tag_groups": SQL_TAG_GROUPS,
    "longest_source_mouth": SQL_LONGEST_SOURCE_MOUTH,
    "loop_stats": SQL_LOOP_STATS,
    "component_compress": SQL_COMPONENT_COMPRESS,
    "component_lines": SQL_COMPONENT_LINES,
    "component_frames": SQL_COMPONENT_FRAMES,
    "betweenness": SQL_BETWEENNESS,
})


# ═══════════════════════════════ J4 / J6 / ranks / embedding near-dup

def q_relation_tags(sf_dir: str):
    """J4: relation tags overwrite member-way tags; most-members relation wins
    (deterministic tie-break: max rel_id — documented divergence from the
    reference's file-order 'last seen')."""
    from ..stages.relations import relation_tags_overwrite

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def members(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (nch % 4) != 0
        dk = d[keep]
        rel = dk // 20
        return pa.table({
            "way_id": pa.array(dk // 5 + 1, pa.int64()),
            "rel_id": pa.array(rel + 1, pa.int64()),
            "rel_tag": pa.array([f"r{int(r) % 7}" for r in rel], pa.string()),
        })

    m = docs.map_batches(members, batch_format="pyarrow")
    # distinct memberships: several docs of one way may map to the same rel
    from ..stages.relational import distinct as _distinct  # noqa: F401
    from ray.data.aggregate import Count

    dedup = m.groupby(["way_id", "rel_id", "rel_tag"]).aggregate(
        Count(alias_name="_c")).select_columns(["way_id", "rel_id", "rel_tag"])
    return relation_tags_overwrite(dedup, num_partitions=8)


SQL_RELATION_TAGS = """
WITH member AS (
  SELECT DISTINCT doc_id // 5 + 1 AS way_id, doc_id // 20 + 1 AS rel_id,
         'r' || CAST((doc_id // 20) % 7 AS VARCHAR) AS rel_tag
  FROM documents WHERE n_chars % 4 <> 0
),
sizes AS (SELECT rel_id, COUNT(*) AS n_members FROM member GROUP BY rel_id)
SELECT way_id, rel_id, rel_tag, n_members FROM (
  SELECT m.*, s.n_members,
         ROW_NUMBER() OVER (PARTITION BY m.way_id
             ORDER BY s.n_members DESC, m.rel_id DESC) AS rk
  FROM member m JOIN sizes s USING (rel_id)
) WHERE rk = 1
"""


def q_ends_membership(sf_dir: str):
    """J6: per-end is_in:<filter> flags over the ways touching each end."""
    from ..functions.tagfilter import parse_tag_filter
    from ..stages.relations import ends_membership

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"])
    ends = _decade_ends(sf_dir)

    def way_nodes(batch: pa.Table) -> pa.Table:
        # every doc's node with its lang tag (the "way rows" carrying tags)
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(d + 1, pa.int64()),
                         "lang": batch["lang"]})

    wn = docs.map_batches(way_nodes, batch_format="pyarrow")
    filters = [("en", parse_tag_filter("lang=en")),
               ("de", parse_tag_filter("lang=de"))]
    out = ends_membership(ends, wn, filters, num_partitions=8)
    return out.rename_columns(["node", "is_in_en", "is_in_de", "is_in_count"])


SQL_ENDS_MEMBERSHIP = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
ends AS (SELECT DISTINCT dst AS node FROM e WHERE dst NOT IN (SELECT src FROM e)),
wn AS (SELECT doc_id + 1 AS node, lang FROM documents)
SELECT ends.node,
       MAX(CASE WHEN wn.lang = 'en' THEN 1 ELSE 0 END) AS is_in_en,
       MAX(CASE WHEN wn.lang = 'de' THEN 1 ELSE 0 END) AS is_in_de,
       MAX(CASE WHEN wn.lang = 'en' THEN 1 ELSE 0 END)
       + MAX(CASE WHEN wn.lang = 'de' THEN 1 ELSE 0 END) AS is_in_count
FROM ends JOIN wn ON wn.node = ends.node
GROUP BY ends.node
"""


def q_component_ranks(sf_dir: str):
    """A5/M9 over derived lump components: ranks + fraction props (integer and
    4-dp-rounded columns only — deterministic cross-engine)."""
    from ray.data.aggregate import Count, Sum

    edges = _und_edges(sf_dir)
    labels = _und_cc_labels(sf_dir)

    def add_len(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        lat_u, lon_u = _derived_latlon(u)
        lat_v, lon_v = _derived_latlon(v)
        m = haversine_m_fp(lat_u, lon_u, lat_v, lon_v)
        dm = np.floor(m * 10 + 0.5).astype(np.int64)
        return batch.append_column("len_dm", pa.array(dm, pa.int64()))

    e = edges.map_batches(add_len, batch_format="pyarrow")
    lab = labels.select_columns(["node", "component_id"]).rename_columns(
        ["u", "component_id"])
    e = hash_join(e, lab, ("u",), how="inner", num_partitions=8)
    comp = e.groupby("component_id").aggregate(Sum("len_dm", alias_name="length_dm"))
    comp = comp.map_batches(
        lambda b: pa.table({"component_id": b["component_id"],
                            "length_dm": b["length_dm"].cast(pa.int64())}),
        batch_format="pyarrow")

    from ..stages.relational import with_desc_rank

    n = comp.count()
    ranked = with_desc_rank(comp, "length_dm", out_col="length_desc_rank")

    def ranks(batch: pa.Table) -> pa.Table:
        desc = batch["length_desc_rank"].to_numpy(zero_copy_only=False)
        root = batch["component_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "component_id": batch["component_id"],
            "root_nodeid_120": pa.array(root % 120, pa.int64()),
            "length_dm": batch["length_dm"],
            "length_desc_rank": pa.array(desc.astype(np.int64)),
            "length_asc_rank": pa.array((n - desc).astype(np.int64)),
        })

    return ranked.map_batches(ranks, batch_format="pyarrow")


SQL_COMPONENT_RANKS = (
    D.CC_ORACLE_SQL
    + f""",
  elen AS (
    SELECT e.u,
      {_dm(_hav_sql(NODE_LATLON_SQL["lat"]("e.u"), NODE_LATLON_SQL["lon"]("e.u"),
                    NODE_LATLON_SQL["lat"]("e.v"), NODE_LATLON_SQL["lon"]("e.v")))}
      AS len_dm
    FROM e
  ),
  complen AS (
    SELECT c.component_id, CAST(SUM(elen.len_dm) AS BIGINT) AS length_dm
    FROM elen JOIN comp c ON c.node = elen.u
    GROUP BY c.component_id
  )
SELECT component_id, component_id % 120 AS root_nodeid_120, length_dm,
       (SELECT COUNT(*) FROM complen c2 WHERE c2.length_dm > c1.length_dm)
           AS length_desc_rank,
       (SELECT COUNT(*) FROM complen c2 WHERE c2.length_dm <= c1.length_dm)
           AS length_asc_rank
FROM complen c1"""
)


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (cosine ≥ 0.35 in float64; i < j).

    The synthetic embeddings are near-orthogonal (max pairwise cosine ≈ 0.48),
    so the production threshold 0.9 finds nothing; 0.35 exercises the operator.
    Both engines compute in float64 (SQL casts the float32 lists).

    Runs through the EXACT blocked cross-join (one task per unordered block
    pair; no driver collect, no corpus broadcast — VERDICT r3 #3 replaced the
    old ``take_all()`` + Python pair loop). ``embedding_lsh`` is the sublinear
    approximate twin."""
    from ..stages.similarity import embedding_neardup_blocked

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_neardup_blocked(emb, threshold=0.35, rows_per_block=256)


SQL_EMBEDDING_NEARDUP = """
SELECT a.vec_id AS u, b.vec_id AS v
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.35
"""


QUERIES.update({
    "relation_tags": q_relation_tags,
    "ends_membership": q_ends_membership,
    "component_ranks": q_component_ranks,
    "embedding_neardup": q_embedding_neardup,
})
ORACLES.update({
    "relation_tags": SQL_RELATION_TAGS,
    "ends_membership": SQL_ENDS_MEMBERSHIP,
    "component_ranks": SQL_COMPONENT_RANKS,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
})


# ═══════════════════ round-3: oracle coverage for formerly unit-only ops


def q_upstream_segments(sf_dir: str):
    """G17 per-segment emission (+ M8 round_mult prop) over the decade-chain
    flow DAG: each edge is its own single segment (no inter chain), upstream
    accumulates from the edge's flow value, min_upstream filter at 5 m,
    ``from_upstream_m_50`` exercises utils.round_mult."""
    from ..stages.waterways import upstream_segments

    flow = _decade_flow(sf_dir)

    def add_inters(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "inter_nids", pa.array([[]] * len(batch), pa.list_(pa.int64())))

    nodes = _nodes_pos(sf_dir)
    segs = upstream_segments(flow.map_batches(add_inters,
                                              batch_format="pyarrow"),
                             nodes, min_upstream_m=5.0, round_multiples=(50,),
                             num_partitions=8)

    def project(batch: pa.Table) -> pa.Table:
        fu = batch["from_upstream_m"].to_numpy(zero_copy_only=False)
        tu = batch["to_upstream_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": batch["a"].cast(pa.int64()),
            "b": batch["b"].cast(pa.int64()),
            "from_upstream_int": pa.array(
                np.floor(fu + 0.5).astype(np.int64), pa.int64()),
            "to_upstream_dm": pa.array(
                np.floor(tu * 10 + 0.5).astype(np.int64), pa.int64()),
            "from_upstream_m_50": batch["from_upstream_m_50"].cast(pa.int64()),
        })

    return segs.map_batches(project, batch_format="pyarrow")


SQL_UPSTREAM_SEGMENTS = _CHAIN_RUNS_SQL + f""",
segs AS (
  SELECT src AS a, dst AS b,
    CAST(COALESCE(SUM(len) OVER (PARTITION BY dec, run ORDER BY d
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS from_upstream_int
  FROM runs
)
SELECT a, b, from_upstream_int,
  CAST(FLOOR((from_upstream_int +
    {_hav_sql(NODE_LATLON_SQL["lat"]("a"), NODE_LATLON_SQL["lon"]("a"),
              NODE_LATLON_SQL["lat"]("b"), NODE_LATLON_SQL["lon"]("b"))}
  )*10 + 0.5) AS BIGINT) AS to_upstream_dm,
  CAST(FLOOR(from_upstream_int/50.0 + 0.5) AS BIGINT)*50 AS from_upstream_m_50
FROM segs WHERE from_upstream_int >= 5
"""


def q_through_path(sf_dir: str):
    """G20 longest source→sink shortest-path per weak component — on decade
    chains: the whole chain (component label = min node = run start)."""
    from ..stages.waterways import through_path_length

    edges = _decade_chain_edges(sf_dir, with_len=True)
    out = through_path_length(edges, num_partitions=8)

    def project(batch: pa.Table) -> pa.Table:
        m = batch["through_path_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "component": batch["component"].cast(pa.int64()),
            "through_int": pa.array(np.floor(m + 0.5).astype(np.int64),
                                    pa.int64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


SQL_THROUGH_PATH = _CHAIN_RUNS_SQL + """
SELECT MIN(src) AS component, CAST(SUM(len) AS BIGINT) AS through_int
FROM runs GROUP BY run, dec
"""


def q_semi_join_anti(sf_dir: str):
    """J2 needed-nid semi-join (left_anti flavor, main.rs:405-420 complement):
    derived nodes that NO chain edge touches — a distributed anti-join of the
    nodes table against both endpoint projections."""
    from ..stages.relational import cogroup_join, concat_blocks, distinct

    nodes = _nodes_pos(sf_dir).select_columns(["node_id"])
    edges = _decade_chain_edges(sf_dir)
    eps = concat_blocks(
        edges.map_batches(lambda b: pa.table({"node_id": b["src"]}),
                          batch_format="pyarrow"),
        edges.map_batches(lambda b: pa.table({"node_id": b["dst"]}),
                          batch_format="pyarrow"))
    out = cogroup_join(nodes, distinct(eps, "node_id"), ("node_id",),
                       how="left_anti", num_partitions=8)
    return out.select_columns(["node_id"])


SQL_SEMI_JOIN_ANTI = """
WITH e AS (
  SELECT doc_id + 1 AS src, doc_id + 2 AS dst
  FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
),
used AS (SELECT src AS node_id FROM e UNION SELECT dst FROM e)
SELECT d.doc_id + 1 AS node_id FROM documents d
WHERE d.doc_id + 1 NOT IN (SELECT node_id FROM used)
"""


def q_dup_scrub(sf_dir: str):
    """M6 consecutive-duplicate scrub inside M5 contraction: 5-doc ways whose
    node ids pair-duplicate ((d - d%2) + 1) must contract as if deduped.
    Pillar set EMPTY (isolates the scrub from degree weighting): exactly one
    edge per way, u = min node, v = max node, inters = remaining distinct."""
    import pandas as pd
    import ray

    from ..stages.graph import contract_ways

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_members(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"way": pa.array(d // 5, pa.int64()),
                         "node": pa.array((d - d % 2) + 1, pa.int64())})

    ways = _members_to_ways(docs.map_batches(to_members,
                                             batch_format="pyarrow")).materialize()
    edges = contract_ways(ways, ray.put(np.array([], dtype=np.int64)))

    def project(batch: pa.Table) -> pa.Table:
        n_inter = pc.list_value_length(batch["inter_nids"]).cast(pa.int64())
        return pa.table({"way_id": batch["way_id"], "u": batch["u"],
                         "v": batch["v"], "n_inter": n_inter})

    return edges.map_batches(project, batch_format="pyarrow")


SQL_DUP_SCRUB = """
SELECT doc_id // 5 + 1 AS way_id,
       MIN((doc_id - doc_id % 2) + 1) AS u,
       MAX((doc_id - doc_id % 2) + 1) AS v,
       COUNT(DISTINCT (doc_id - doc_id % 2) + 1) - 2 AS n_inter
FROM documents
GROUP BY doc_id // 5
HAVING COUNT(DISTINCT (doc_id - doc_id % 2) + 1) >= 2
"""


def q_crow_lines(sf_dir: str):
    """G5 into_lines_as_crow_flies + M11 dist-ends prop: on path components
    both line methods emit the single spanning path; dist_ends is the
    haversine between the two run endpoints (integer dm)."""
    from ..pipelines.group_ops import component_lines

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    out = component_lines(edges_g, labels, nodes_ds, method="crow",
                          num_partitions=8,
                          grouped_rows=_chain_grouped_rows(sf_dir, True))

    def project(batch: pa.Table) -> pa.Table:
        de = batch["dist_ends_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "component_id": batch["component_id"].cast(pa.int64()),
            "line_idx": batch["line_idx"].cast(pa.int64()),
            "n_nodes": batch["n_nodes"].cast(pa.int64()),
            "dist_ends_dm": pa.array(
                np.floor(de * 10 + 0.5).astype(np.int64), pa.int64()),
        })

    return out.map_batches(project, batch_format="pyarrow")


SQL_CROW_LINES = _CHAIN_RUNS_UND_SQL + f"""
SELECT d1 AS component_id, CAST(0 AS BIGINT) AS line_idx,
       ne + 1 AS n_nodes,
       {_dm(_hav_sql(NODE_LATLON_SQL["lat"]("d1"), NODE_LATLON_SQL["lon"]("d1"),
                     NODE_LATLON_SQL["lat"]("d2 + 1"),
                     NODE_LATLON_SQL["lon"]("d2 + 1")))} AS dist_ends_dm
FROM agg
"""


QUERIES.update({
    "upstream_segments": q_upstream_segments,
    "through_path": q_through_path,
    "semi_join_anti": q_semi_join_anti,
    "dup_scrub": q_dup_scrub,
    "crow_lines": q_crow_lines,
})
ORACLES.update({
    "upstream_segments": SQL_UPSTREAM_SEGMENTS,
    "through_path": SQL_THROUGH_PATH,
    "semi_join_anti": SQL_SEMI_JOIN_ANTI,
    "dup_scrub": SQL_DUP_SCRUB,
    "crow_lines": SQL_CROW_LINES,
})


# ═════════════════════════ r3 batch 2: M2 boolean DSL, K8 debug filters,
#                           T4 inter-store content, G6 Dijkstra
def q_tagfilter_boolean(sf_dir: str):
    """M2 parser precedence: ``∨`` splits before ``∧`` (src/tagfilter.rs:111-120)
    and ``≠`` has unset-or-different semantics — one DSL string exercising
    Or(And(KinV, KneV), KV)."""
    return _tagfilter_query(sf_dir, "lang∈en,de∧source≠src0∨lang=zh")


SQL_TAGFILTER_BOOLEAN = """
SELECT source, COUNT(*) AS n FROM documents
WHERE (lang IN ('en','de') AND source <> 'src0') OR lang = 'zh'
GROUP BY source
"""


def q_debug_wayids(sf_dir: str):
    """K8 debug filters over derived 5-doc ways: the ``¬w3`` OSMObj exclusion
    (tagfilter.rs:102-108) composed with the ``--only-these-way-groups-divmod
    3,7`` keep-rule (bin/osm-lump-ways/main.rs:523-536) → (way_id, n_nodes)."""
    from ray.data.aggregate import Count

    from ..functions.tagfilter import ColumnTagView, parse_tag_filter

    tf = parse_tag_filter("¬w3")
    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_ways(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"way_id": pa.array(d // 5 + 1, pa.int64())})

    ways = docs.map_batches(to_ways, batch_format="pyarrow") \
               .groupby("way_id").aggregate(Count(alias_name="n_nodes"))

    def debug_filter(batch: pa.Table) -> pa.Table:
        wid = batch["way_id"].to_numpy(zero_copy_only=False)
        keep = (wid % 7) == 3  # divmod keep-rule
        view = ColumnTagView({}, n=len(batch), ids=wid, obj_type="w")
        keep &= tf.mask(view)
        return batch.filter(pa.array(keep))

    return ways.map_batches(debug_filter, batch_format="pyarrow")


SQL_DEBUG_WAYIDS = """
SELECT doc_id // 5 + 1 AS way_id, COUNT(*) AS n_nodes
FROM documents
GROUP BY doc_id // 5
HAVING ((doc_id // 5 + 1) % 7) = 3 AND (doc_id // 5 + 1) <> 3
"""


def q_inter_store(sf_dir: str):
    """T4 InterStore content check: per contracted way, the COUNT and SUM of
    the interior node ids carried in the ``inter_nids`` list column (the Arrow
    re-expression of src/inter_store.rs compressed chains)."""
    import ray

    from ..stages.graph import contract_ways, pillar_node_array

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_members(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"way": pa.array(d // 5, pa.int64()),
                         "node": pa.array(d + 1, pa.int64())})

    ways = _members_to_ways(docs.map_batches(to_members,
                                             batch_format="pyarrow")).materialize()
    edges = contract_ways(ways, ray.put(pillar_node_array(ways)))

    def project(batch: pa.Table) -> pa.Table:
        il = batch["inter_nids"].combine_chunks()
        flat = il.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = il.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(flat)])
        return pa.table({
            "way_id": batch["way_id"],
            "n_inter": pa.array(np.diff(offs), pa.int64()),
            "inter_sum": pa.array(csum[offs[1:]] - csum[offs[:-1]], pa.int64()),
        })

    return edges.map_batches(project, batch_format="pyarrow")


SQL_INTER_STORE = """
SELECT doc_id // 5 + 1 AS way_id,
       CAST(COUNT(*) - 2 AS BIGINT) AS n_inter,
       CAST(SUM(doc_id + 1) - MIN(doc_id + 1) - MAX(doc_id + 1) AS BIGINT)
         AS inter_sum
FROM documents
GROUP BY doc_id // 5
HAVING COUNT(*) >= 2
"""


def q_dijkstra(sf_dir: str):
    """G6 over chord-augmented path components: per node, the shortest
    distance from the component's min vertex (forward walk vs chord+backward
    walk — real relaxation, see ``component_dijkstra``)."""
    from ..pipelines.group_ops import component_dijkstra

    edges_g, labels, _nodes = _chain_graph_and_positions(sf_dir)
    return component_dijkstra(
        edges_g, labels, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, False)) \
        .select_columns(["component_id", "node", "dist_cm"])


# prefix(n) = Σ_{k=d1+1..n} ((k-1) % 13 + 1)  (edge (k-1,k) weighted by its
# smaller endpoint); chord (d1, d2+1) of weight d1 % 29 + 3 exists when the
# component has ≥ 3 vertices (ne ≥ 2): dist = min(prefix, chord + total-prefix)
SQL_DIJKSTRA = _CHAIN_RUNS_UND_SQL + """,
  compnodes AS (
    SELECT d1, d2, ne, UNNEST(generate_series(d1, d2 + 1)) AS node FROM agg
  ),
  pref AS (
    SELECT d1, d2, ne, node,
           SUM(CASE WHEN node > d1 THEN (node - 1) % 13 + 1 ELSE 0 END)
             OVER (PARTITION BY d1 ORDER BY node) AS prefix
    FROM compnodes
  ),
  tot AS (
    SELECT *, MAX(prefix) OVER (PARTITION BY d1) AS total FROM pref
  )
SELECT d1 AS component_id, node,
       CAST(CASE WHEN ne >= 2
                 THEN LEAST(prefix, (d1 % 29 + 3) + (total - prefix))
                 ELSE prefix END AS BIGINT) AS dist_cm
FROM tot
"""


QUERIES.update({
    "tagfilter_boolean": q_tagfilter_boolean,
    "debug_wayids": q_debug_wayids,
    "inter_store": q_inter_store,
    "dijkstra": q_dijkstra,
})
ORACLES.update({
    "tagfilter_boolean": SQL_TAGFILTER_BOOLEAN,
    "debug_wayids": SQL_DEBUG_WAYIDS,
    "inter_store": SQL_INTER_STORE,
    "dijkstra": SQL_DIJKSTRA,
})


# ═════════════════════════ r3 batch 3: G7 A*, G3 spikes, D4 hull dedup,
#                           M10 edge keys, S4/S5 writer round-trips
def q_astar(sf_dir: str):
    """G7 per path component: A* (haversine heuristic) from the MIN to the
    MIDDLE vertex — early termination means only the first half of the chain
    is emitted (dij.rs:84-202)."""
    from ..pipelines.group_ops import component_astar

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    return component_astar(
        edges_g, labels, nodes_ds, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, True)) \
        .select_columns(["component_id", "seq", "node"])


# verts = d1..d2+1 (ne+1 of them); middle index (ne+1)//2 → node d1+(ne+1)//2
SQL_ASTAR = _CHAIN_RUNS_UND_SQL + """
SELECT d1 AS component_id, CAST(n - d1 AS BIGINT) AS seq, CAST(n AS BIGINT) AS node
FROM (SELECT d1, UNNEST(generate_series(d1, d1 + (ne + 1) // 2)) AS n FROM agg)
"""


def q_spike_removal(sf_dir: str):
    """G3 per path component: edges surviving iterative degree-1 spike removal
    with vertices ≡ 0 (mod 3) pinned (undirected_graph.rs:718-754) — the
    sub-path between the first and last pinned vertices."""
    from ..pipelines.group_ops import component_spikes

    edges_g, labels, _nodes = _chain_graph_and_positions(sf_dir)
    return component_spikes(
        edges_g, labels, pin_mod=3, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, False)) \
        .select_columns(["component_id", "u", "v"])


SQL_SPIKE_REMOVAL = _CHAIN_RUNS_UND_SQL + """,
  pins AS (
    SELECT d1, ((d1 + 2) // 3) * 3 AS lo, ((d2 + 1) // 3) * 3 AS hi FROM agg
  )
SELECT d1 AS component_id, CAST(u AS BIGINT) AS u, CAST(u + 1 AS BIGINT) AS v
FROM (SELECT d1, UNNEST(generate_series(lo, hi - 1)) AS u
      FROM pins WHERE lo < hi)
"""


_HULL_GRID = 500_000_000  # 50° cells — coarse enough to force duplicates


def q_hull_dedup(sf_dir: str):
    """D4 hull-input position dedup (way_group.rs:94-98) after snapping to a
    coarse lattice: (n_vertices, n_unique_pos, winner_sum) per component,
    winner = first node in adjacency order = MIN node per snapped cell."""
    from ..pipelines.group_ops import component_hull_dedup

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    return component_hull_dedup(
        edges_g, labels, nodes_ds, grid=_HULL_GRID, num_partitions=8,
        grouped_rows=_chain_grouped_rows(sf_dir, True)) \
        .select_columns(["component_id", "n_vertices", "n_unique_pos",
                         "winner_sum"])


SQL_HULL_DEDUP = _CHAIN_RUNS_UND_SQL + f""",
  compnodes AS (
    SELECT d1, ne, UNNEST(generate_series(d1, d2 + 1)) AS node FROM agg
  ),
  pts AS (
    SELECT d1, ne, node,
      CAST(FLOOR((((node - 1) * {D.LAT_MULT}) % {D.LAT_MOD} - {D.LAT_OFF})
                 / {_HULL_GRID}.0) AS BIGINT) AS gx,
      CAST(FLOOR((((node - 1) * {D.LON_MULT}) % {D.LON_MOD} - {D.LON_OFF})
                 / {_HULL_GRID}.0) AS BIGINT) AS gy
    FROM compnodes
  ),
  uniqpos AS (
    SELECT d1, ANY_VALUE(ne) AS ne, gx, gy, MIN(node) AS winner
    FROM pts GROUP BY d1, gx, gy
  )
SELECT d1 AS component_id, CAST(ANY_VALUE(ne) + 1 AS BIGINT) AS n_vertices,
       CAST(COUNT(*) AS BIGINT) AS n_unique_pos,
       CAST(SUM(winner) AS BIGINT) AS winner_sum
FROM uniqpos GROUP BY d1
"""


def q_min_max_keys(sf_dir: str):
    """M10 canonical undirected edge key (src/utils.rs:1-3) over a
    mixed-orientation derived pair stream → (mn, mx, n)."""
    from ray.data.aggregate import Count

    from ..functions.utils import min_max

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_keys(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mn, mx = min_max(d % 1000, (d * 37) % 1000)
        return pa.table({"mn": pa.array(mn, pa.int64()),
                         "mx": pa.array(mx, pa.int64())})

    return docs.map_batches(to_keys, batch_format="pyarrow") \
               .groupby(["mn", "mx"]).aggregate(Count(alias_name="n"))


SQL_MIN_MAX_KEYS = """
SELECT LEAST(doc_id % 1000, (doc_id * 37) % 1000) AS mn,
       GREATEST(doc_id % 1000, (doc_id * 37) % 1000) AS mx,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""



def _chain_grouped_rows(sf_dir: str, with_nodes: bool):
    """Session-cached kind-tagged grouped rows for the G2-G9 family: the
    labeled-edge join (+ the per-component position join for ops needing
    geometry) is identical across 9 battery queries — build it once
    (the per-query fixed cost was ~1-2 s each, VERDICT r3 perf table)."""
    from ..pipelines.group_ops import _grouped_rows
    from ..stages.relational import snapshot

    def build():
        edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
        return snapshot(_grouped_rows(
            edges_g, labels, nodes_ds if with_nodes else None, 8))

    return cached_ds(("chain_grouped_rows", with_nodes, sf_dir), build)


def _chain_line_rows(sf_dir: str):
    """Per path component: one LineString row (component_id, n_nodes, sum_node,
    lats, lons) — feature input for the S4/S5 writer round-trips (built once
    per session; both round-trips render from the same line rows)."""
    return cached_ds(("chain_line_rows", sf_dir),
                     lambda: _chain_line_rows_build(sf_dir))


def _chain_line_rows_build(sf_dir: str):
    from ..pipelines.group_ops import _grouped_rows

    edges_g, labels, nodes_ds = _chain_graph_and_positions(sf_dir)
    rows = _grouped_rows(edges_g, labels, nodes_ds, 8)

    def fn(df):
        import pandas as pd

        posrows = df[df["kind"] == 1].sort_values("node")
        nodes = posrows["node"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "component_id": [int(df["component_id"].iloc[0])],
            "n_nodes": [int(len(nodes))],
            "sum_node": [int(nodes.sum())],
            "lats": [posrows["lat"].to_numpy(dtype=np.int64)],
            "lons": [posrows["lon"].to_numpy(dtype=np.int64)],
        })

    return rows.groupby(["g", "component_id"]).map_groups(
        fn, batch_format="pandas")


def q_pbf_roundtrip(sf_dir: str):
    """Native OSM PBF roundtrip (sources/pbf.py): derived nodes + 5-doc ways
    are ENCODED to an actual .osm.pbf (framed protobuf, zlib blobs,
    delta+zigzag packed varints, string table — fixture generation, driver
    side like every writer roundtrip) and read back through the sharded
    blob-span Ray readers; per way-name tag: way count, ref count and the
    exact e7 coordinate sums of the referenced nodes, joined from the
    DECODED node table. A value match certifies framing, compression, the
    vectorized varint decode, delta chains and the string table."""
    import tempfile

    from ..sources.pbf import read_pbf_nodes, read_pbf_ways, write_pbf
    from ..stages.relational import bucket_agg, cogroup_join

    nodes_df = _nodes_pos(sf_dir).to_pandas().sort_values("node_id")
    ids = nodes_df["node_id"].to_numpy().astype(np.int64)
    lat = nodes_df["lat"].to_numpy().astype(np.int64)
    lon = nodes_df["lon"].to_numpy().astype(np.int64)
    ways = [(int(i + 1), ids[i * 5:(i + 1) * 5],
             {"name": f"n{i % 11}", "highway": "track"})
            for i in range((len(ids) + 4) // 5)]
    path = tempfile.mktemp(suffix=".osm.pbf", dir="/tmp")
    write_pbf(path, nodes=(ids, lat, lon), ways=ways, features_per_blob=64)

    wds = read_pbf_ways(path)

    def explode(batch: pa.Table) -> pa.Table:
        # flat refs + per-way repeat of the vectorized tag lookup — no
        # per-way Python (VERDICT r4 next-step #4)
        from ..sources.pbf import way_tag_values

        ids = batch["node_ids"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        lens = np.diff(ids.offsets.to_numpy(zero_copy_only=False))
        names = way_tag_values(batch, "name")
        names[names == None] = ""  # noqa: E711 — object-array sentinel
        return pa.table({
            "name": pa.array(np.repeat(names, lens).tolist(), pa.string()),
            "node_id": ids.flatten().cast(pa.int64())})

    refs = wds.map_batches(explode, batch_format="pyarrow")
    joined = cogroup_join(refs, read_pbf_nodes(path), ("node_id",),
                          how="inner", num_partitions=8)
    per_name = bucket_agg(joined, ["name"],
                          {"n_refs": (None, "count"),
                           "sum_lat": ("lat", "sum"),
                           "sum_lon": ("lon", "sum")},
                          num_partitions=4, combine=True)

    def wnames(batch: pa.Table) -> pa.Table:
        from ..sources.pbf import way_tag_values

        names = way_tag_values(batch, "name")
        names[names == None] = ""  # noqa: E711
        return pa.table({"name": pa.array(names.tolist(), pa.string())})

    counts = bucket_agg(wds.map_batches(wnames, batch_format="pyarrow"),
                        ["name"], {"n_ways": (None, "count")},
                        num_partitions=4, combine=True)
    out = cogroup_join(per_name, counts, ("name",), how="inner",
                       num_partitions=4)
    import os

    res = out.to_pandas()
    res = res.sort_values(sorted(res.columns)).reset_index(drop=True)
    os.unlink(path)
    import ray.data

    return ray.data.from_pandas(res)


SQL_PBF_ROUNDTRIP = f"""
WITH n AS ({NODES_SQL}),
ranked AS (
  SELECT node_id, lat, lon,
         (ROW_NUMBER() OVER (ORDER BY node_id) - 1) // 5 AS wi
  FROM n
)
SELECT 'n' || CAST(wi % 11 AS VARCHAR) AS name,
       COUNT(*) AS n_refs,
       CAST(SUM(lat) AS BIGINT) AS sum_lat,
       CAST(SUM(lon) AS BIGINT) AS sum_lon,
       COUNT(DISTINCT wi) AS n_ways
FROM ranked GROUP BY 1
"""


def q_geojson_roundtrip(sf_dir: str):
    """S4 writer round-trip: chain components → LineString features →
    FeatureCollection ``.geojson`` on disk (fileio.rs:127-144 framing) →
    parsed back → (component_id, n_nodes, sum_node, n_points). Integer props
    survive JSON exactly; coordinate fidelity is byte-parity unit-tested."""
    import json as _json
    import tempfile

    import pandas as pd

    from ..sources.geojson import write_features_single

    lines = _chain_line_rows(sf_dir)
    path = tempfile.mktemp(suffix=".geojson", dir="/tmp")
    info = write_features_single(
        lines, path, props_cols=["component_id", "n_nodes", "sum_node"],
        geometry="linestring")
    with open(info["path"], "rb") as f:
        fc = _json.load(f)
    assert fc["type"] == "FeatureCollection"
    out = [(feat["properties"]["component_id"], feat["properties"]["n_nodes"],
            feat["properties"]["sum_node"],
            len(feat["geometry"]["coordinates"]))
           for feat in fc["features"]]
    import os

    os.unlink(info["path"])
    return pd.DataFrame(out, columns=["component_id", "n_nodes", "sum_node",
                                      "n_points"])


SQL_GEOJSON_ROUNDTRIP = _CHAIN_RUNS_UND_SQL + """
SELECT d1 AS component_id, CAST(ne + 1 AS BIGINT) AS n_nodes,
       CAST(((d1 + d2 + 1) * (ne + 1)) // 2 AS BIGINT) AS sum_node,
       CAST(ne + 1 AS BIGINT) AS n_points
FROM agg
"""


def q_csv_roundtrip(sf_dir: str):
    """S5 writer round-trip: same features → feature CSV with WKT geometry
    (fileio.rs:216-264) on disk → parsed back → (component_id, n_nodes,
    n_points) with n_points counted from the WKT LINESTRING."""
    import tempfile

    import pandas as pd

    from ..sources.csvout import write_feature_csv

    lines = _chain_line_rows(sf_dir)
    path = tempfile.mktemp(suffix=".csv", dir="/tmp")
    write_feature_csv(lines, path, props_cols=["component_id", "n_nodes"])
    df = pd.read_csv(path)
    import os

    os.unlink(path)
    df["n_points"] = df["geom"].str.count(",") + 1
    return df[["component_id", "n_nodes", "n_points"]]


SQL_CSV_ROUNDTRIP = _CHAIN_RUNS_UND_SQL + """
SELECT d1 AS component_id, CAST(ne + 1 AS BIGINT) AS n_nodes,
       CAST(ne + 1 AS BIGINT) AS n_points
FROM agg
"""


QUERIES.update({
    "astar": q_astar,
    "spike_removal": q_spike_removal,
    "hull_dedup": q_hull_dedup,
    "min_max_keys": q_min_max_keys,
    "geojson_roundtrip": q_geojson_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
})
ORACLES.update({
    "astar": SQL_ASTAR,
    "spike_removal": SQL_SPIKE_REMOVAL,
    "hull_dedup": SQL_HULL_DEDUP,
    "min_max_keys": SQL_MIN_MAX_KEYS,
    "geojson_roundtrip": SQL_GEOJSON_ROUNDTRIP,
    "csv_roundtrip": SQL_CSV_ROUNDTRIP,
})


# ═════════════════════════ r3 batch 4: S6 ends-CSV and S7 OpenMetrics
#                           writer round-trips
def q_ends_csv_roundtrip(sf_dir: str):
    """S6 writer round-trip (ends_csv.rs:14-108): river-system mouths from the
    chain DAG → full ends CSV (timestamp, iso, upstream rounded 1 dp,
    1-based rank by upstream desc, 7-dp coordinates, `upstream > 1 m` filter)
    → parsed back → (nid, upstream_m, upstream_m_rank). Coordinate columns are
    written but compared in unit tests only (float-formatting parity)."""
    import os
    import tempfile

    import pandas as pd

    from ..sources.csvout import write_ends_csv

    out = _decade_lsm(sf_dir) \
        .select_columns(["mouth_nid", "river_system_length_m"]).to_pandas()

    nid = out["mouth_nid"].to_numpy(dtype=np.int64)
    d = nid - 1
    lat_deg = ((d * D.LAT_MULT) % D.LAT_MOD - D.LAT_OFF) / 1e7
    lon_deg = ((d * D.LON_MULT) % D.LON_MOD - D.LON_OFF) / 1e7
    rows = [{"nid": int(n), "upstream_m": float(m), "lat": la, "lon": lo}
            for n, m, la, lo in zip(
                nid, out["river_system_length_m"], lat_deg, lon_deg)]

    path = tempfile.mktemp(suffix=".csv", dir="/tmp")
    write_ends_csv(path, rows, latest_timestamp=1234567890,
                   latest_timestamp_iso="2009-02-13T23:31:30Z")
    df = pd.read_csv(path)
    os.unlink(path)
    assert (df["timestamp"] == 1234567890).all()
    return df[["nid", "upstream_m", "upstream_m_rank"]]


# upstream = Σ len per run (integer-valued, exact at 1 dp); `> 1 m` filter and
# rank-by-upstream-desc (nid tiebreak) mirror ends_csv.rs:76, :94-101.
SQL_ENDS_CSV_ROUNDTRIP = _CHAIN_RUNS_SQL + """
, mouths AS (
  SELECT MAX(dst) AS nid, CAST(SUM(len) AS DOUBLE) AS upstream_m
  FROM runs GROUP BY run, dec
)
SELECT nid, upstream_m,
       ROW_NUMBER() OVER (ORDER BY upstream_m DESC, nid) AS upstream_m_rank
FROM mouths WHERE upstream_m > 1.0
"""


def q_openmetrics_roundtrip(sf_dir: str):
    """S7 writer round-trip (openmetrics.rs:8-44): decade-loop features →
    one gauge per loop root (``loops_num_nodes{root="…"} N``) → exposition
    text parsed back → (root_nid, num_nodes)."""
    import os
    import re
    import tempfile

    import pandas as pd

    from ..sources.csvout import write_openmetrics

    loops = _decade_loops(sf_dir) \
        .select_columns(["root_nid", "num_nodes"]).to_pandas()

    path = tempfile.mktemp(suffix=".om", dir="/tmp")
    write_openmetrics(
        path, "loops_num_nodes",
        [({"root": int(r.root_nid)}, int(r.num_nodes))
         for r in loops.itertuples()],
        help_text="nodes per loop feature")
    with open(path) as f:
        text = f.read()
    os.unlink(path)
    assert text.endswith("# EOF\n") and "# TYPE loops_num_nodes gauge" in text
    pat = re.compile(r'^loops_num_nodes\{root="(\d+)"\} (\d+)$', re.M)
    out = [(int(m.group(1)), int(m.group(2))) for m in pat.finditer(text)]
    return pd.DataFrame(out, columns=["root_nid", "num_nodes"])


SQL_OPENMETRICS_ROUNDTRIP = """
SELECT (doc_id // 10) * 10 + 1 AS root_nid, COUNT(*) AS num_nodes
FROM documents
GROUP BY doc_id // 10
HAVING COUNT(*) = 10 AND SUM(CASE WHEN n_chars % 7 = 0 THEN 1 ELSE 0 END) = 0
"""


QUERIES.update({
    "ends_csv_roundtrip": q_ends_csv_roundtrip,
    "openmetrics_roundtrip": q_openmetrics_roundtrip,
})
ORACLES.update({
    "ends_csv_roundtrip": SQL_ENDS_CSV_ROUNDTRIP,
    "openmetrics_roundtrip": SQL_OPENMETRICS_ROUNDTRIP,
})


# ═══════════════════════════════════════════ streaming debounce


def q_debounce(sf_dir: str):
    """Within-window dedup: drop an event when the previous event of the same
    (user_id, event_type) is ≤ 30 min older (spacing to the previous ROW, the
    LAG semantics — both engines agree)."""
    from ..stages.temporal import debounce

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    out = debounce(ev, keys=["user_id", "event_type"], ts="ts",
                   order_tiebreak="event_id", window_s=1800)
    return out.select_columns(["event_id", "user_id", "event_type"])


SQL_DEBOUNCE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev_ts,
         ts
  FROM events
) WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
"""

QUERIES.update({"debounce": q_debounce})
ORACLES.update({"debounce": SQL_DEBOUNCE})


# ═══════════════════════════════════════════ rolling ROWS window


def q_rolling_sum(sf_dir: str):
    """Per-user 3-row rolling value sum in (ts, event_id) order — the ordered
    ROWS-window aggregate."""
    from ..stages.temporal import rolling_sum

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"]) \
        .map_batches(_quantize_milli("value", "value_milli"),
                     batch_format="pyarrow")
    return rolling_sum(ev, key="user_id", ts="ts", order_tiebreak="event_id",
                       val_milli_col="value_milli", window_rows=3)


SQL_ROLLING_SUM = """
SELECT user_id, event_id,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS rolling_milli
FROM events
"""

QUERIES.update({"rolling_sum": q_rolling_sum})
ORACLES.update({"rolling_sum": SQL_ROLLING_SUM})


# ═══════════════════════════════════════════ skew diagnostics


def q_key_skew(sf_dir: str):
    """Top-10 heaviest join keys of lineitem.l_partkey with counts — the
    pre-shuffle skew report feeding salting decisions."""
    from ..stages.relational import key_skew_report

    li = _read(sf_dir, "lineitem", columns=["l_partkey"])
    return key_skew_report(li, "l_partkey", k=10)


SQL_KEY_SKEW = """
SELECT l_partkey, COUNT(*) AS n FROM lineitem
GROUP BY 1 ORDER BY n DESC, l_partkey ASC LIMIT 10
"""

QUERIES.update({"key_skew": q_key_skew})
ORACLES.update({"key_skew": SQL_KEY_SKEW})


# ═══════════════════════════════════════════ PageRank (iterative rounds)


def q_pagerank(sf_dir: str):
    """3-iteration integer PageRank over the directed decade graph —
    distributed join+aggregate rounds, oracle unrolled exactly."""
    from ..stages.graph import pagerank_int

    edges = _decade_closed_edges(sf_dir)
    nodes = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        lambda b: pa.table({"node": pc.add(b["doc_id"],
                                           pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow")
    return pagerank_int(edges, nodes, iterations=3)


def _sql_pagerank(iterations: int = 3) -> str:
    from ..sources.derived import DIRECTED_EDGES_CLOSED_SQL

    ctes = [
        f"e AS ({DIRECTED_EDGES_CLOSED_SQL})",
        "nodes AS (SELECT doc_id + 1 AS node FROM documents)",
        "deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"c{k} AS (SELECT e.dst AS node, SUM(r{k-1}.r // deg.d) AS s "
            f"FROM e JOIN deg USING (src) JOIN r{k-1} ON r{k-1}.node = e.src "
            "GROUP BY 1)")
        ctes.append(
            f"r{k} AS (SELECT n.node, CAST(150000 + 850000 * "
            f"COALESCE(c{k}.s, 0) // 1000000 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{k} USING (node))")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT node, r AS rank_micro FROM r{iterations}")


SQL_PAGERANK = _sql_pagerank()

QUERIES.update({"pagerank": q_pagerank})
ORACLES.update({"pagerank": SQL_PAGERANK})


# ═══════════════════════════════ multimodal pipeline (decode→resize→frames→feat)


def q_multimodal_pipeline(sf_dir: str):
    """Full multimodal stub chain: decode (actor pool) → resize (integer
    aspect-fit) → frame-sample (stride/ceil) → feature-extract (md5 dims,
    per-actor model state)."""
    from ..stages.multimodal import multimodal_pipeline

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    return multimodal_pipeline(docs)


SQL_MULTIMODAL_PIPELINE = """
WITH m AS (
  SELECT doc_id, n_chars, md5(text) AS d,
         n_chars % 640 + 1 AS width, n_chars % 480 + 1 AS height
  FROM documents
), s AS (
  SELECT doc_id, width, height, width * height AS n_pixels,
         CASE WHEN GREATEST(width, height) > 224
              THEN 224000000 // GREATEST(width, height)
              ELSE 1000000 END AS sc,
         (strpos('0123456789abcdef', substr(d, 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 2, 1)) - 1) AS feat0,
         (strpos('0123456789abcdef', substr(d, 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(d, 4, 1)) - 1) AS feat1,
         n_chars % 240 + 1 AS n_frames
  FROM m
)
SELECT doc_id, width, height, n_pixels, feat0, feat1,
       width * sc // 1000000 AS resized_w,
       height * sc // 1000000 AS resized_h,
       n_frames,
       CAST(CEIL(n_frames / 8.0) AS BIGINT) AS frame_stride,
       CAST(CEIL(n_frames / CEIL(n_frames / 8.0)) AS BIGINT) AS n_sampled
FROM s
"""

QUERIES.update({"multimodal_pipeline": q_multimodal_pipeline})
ORACLES.update({"multimodal_pipeline": SQL_MULTIMODAL_PIPELINE})


def q_multimodal_decode(sf_dir: str):
    """REAL image decode (no PIL needed): per doc a deterministic gradient
    image is encoded to actual 24-bit BMP bytes, then the DecodeImage actor
    pool parses the format back (header, bottom-up rows, BGR order, 4-byte
    padding), sums channels, and nearest-neighbour-resizes to max_side=8 —
    genuine bytes→pixels math, value-exact against the SQL oracle that
    recomputes the same pixel arithmetic from doc_id."""
    from ..stages.multimodal import decode_images, encode_bmp24

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for di in d:
            w = int(di % 13 + 4)
            h = int(di % 9 + 3)
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)
            c = np.arange(3, dtype=np.int64)
            img = ((x[None, :, None] * 3 + y[:, None, None] * 5
                    + di * 7 + c[None, None, :] * 11) % 256).astype(np.uint8)
            payloads.append(encode_bmp24(img))
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    enc = docs.map_batches(synth, batch_format="pyarrow")
    return decode_images(enc, max_side=8)


SQL_MULTIMODAL_DECODE = """
WITH dim AS (
  SELECT doc_id, doc_id % 13 + 4 AS w, doc_id % 9 + 3 AS h,
         GREATEST(doc_id % 13 + 4, doc_id % 9 + 3) AS mx
  FROM documents
), rdim AS (
  SELECT *,
         CASE WHEN mx <= 8 THEN w ELSE GREATEST(1, w * 8 // mx) END AS rw,
         CASE WHEN mx <= 8 THEN h ELSE GREATEST(1, h * 8 // mx) END AS rh
  FROM dim
), px AS (
  SELECT doc_id,
         (x * 3 + y * 5 + doc_id * 7) % 256 AS r,
         (x * 3 + y * 5 + doc_id * 7 + 11) % 256 AS g,
         (x * 3 + y * 5 + doc_id * 7 + 22) % 256 AS b
  FROM dim, UNNEST(generate_series(0, w - 1)) AS tx(x),
       UNNEST(generate_series(0, h - 1)) AS ty(y)
), sums AS (
  SELECT doc_id, CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(g) AS BIGINT) AS sum_g, CAST(SUM(b) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id
), rpx AS (
  SELECT doc_id,
         ((j * w // rw) * 3 + (i * h // rh) * 5 + doc_id * 7) % 256 AS r,
         ((j * w // rw) * 3 + (i * h // rh) * 5 + doc_id * 7 + 11) % 256 AS g,
         ((j * w // rw) * 3 + (i * h // rh) * 5 + doc_id * 7 + 22) % 256 AS b
  FROM rdim, UNNEST(generate_series(0, rw - 1)) AS tj(j),
       UNNEST(generate_series(0, rh - 1)) AS ti(i)
), gsum AS (
  SELECT doc_id, CAST(SUM((r + g + b) // 3) AS BIGINT) AS resized_graysum
  FROM rpx GROUP BY doc_id
)
SELECT d.doc_id, d.w AS width, d.h AS height, d.w * d.h AS n_pixels,
       s.sum_r, s.sum_g, s.sum_b, gs.resized_graysum
FROM dim d JOIN sums s ON s.doc_id = d.doc_id
JOIN gsum gs ON gs.doc_id = d.doc_id
"""

QUERIES.update({"multimodal_decode": q_multimodal_decode})
ORACLES.update({"multimodal_decode": SQL_MULTIMODAL_DECODE})


def q_png_decode(sf_dir: str):
    """REAL PNG decode (stdlib zlib, no PIL): per doc a deterministic
    gradient image is encoded to actual PNG bytes — DEFLATE-compressed
    scanlines with the per-row adaptive filter heuristic, so the payloads mix
    Sub/Up/Average/Paeth rows — then DecodeImage routes on the PNG signature,
    inflates, unfilters, sums channels and resizes. The SQL oracle recomputes
    the same pixel arithmetic from doc_id; a value match certifies the whole
    compress→filter→unfilter→decompress path bit-exactly."""
    from ..stages.multimodal import decode_images, encode_png

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for di in d:
            w = int(di % 11 + 5)
            h = int(di % 7 + 4)
            x = np.arange(w, dtype=np.int64)
            y = np.arange(h, dtype=np.int64)
            c = np.arange(3, dtype=np.int64)
            img = ((x[None, :, None] * 7 + y[:, None, None] * 3
                    + di * 13 + c[None, None, :] * 17) % 256).astype(np.uint8)
            payloads.append(encode_png(img))
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    enc = docs.map_batches(synth, batch_format="pyarrow")
    return decode_images(enc, max_side=8)


SQL_PNG_DECODE = """
WITH dim AS (
  SELECT doc_id, doc_id % 11 + 5 AS w, doc_id % 7 + 4 AS h,
         GREATEST(doc_id % 11 + 5, doc_id % 7 + 4) AS mx
  FROM documents
), rdim AS (
  SELECT *,
         CASE WHEN mx <= 8 THEN w ELSE GREATEST(1, w * 8 // mx) END AS rw,
         CASE WHEN mx <= 8 THEN h ELSE GREATEST(1, h * 8 // mx) END AS rh
  FROM dim
), px AS (
  SELECT doc_id,
         (x * 7 + y * 3 + doc_id * 13) % 256 AS r,
         (x * 7 + y * 3 + doc_id * 13 + 17) % 256 AS g,
         (x * 7 + y * 3 + doc_id * 13 + 34) % 256 AS b
  FROM dim, UNNEST(generate_series(0, w - 1)) AS tx(x),
       UNNEST(generate_series(0, h - 1)) AS ty(y)
), sums AS (
  SELECT doc_id, CAST(SUM(r) AS BIGINT) AS sum_r,
         CAST(SUM(g) AS BIGINT) AS sum_g, CAST(SUM(b) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id
), rpx AS (
  SELECT doc_id,
         ((j * w // rw) * 7 + (i * h // rh) * 3 + doc_id * 13) % 256 AS r,
         ((j * w // rw) * 7 + (i * h // rh) * 3 + doc_id * 13 + 17) % 256 AS g,
         ((j * w // rw) * 7 + (i * h // rh) * 3 + doc_id * 13 + 34) % 256 AS b
  FROM rdim, UNNEST(generate_series(0, rw - 1)) AS tj(j),
       UNNEST(generate_series(0, rh - 1)) AS ti(i)
), gsum AS (
  SELECT doc_id, CAST(SUM((r + g + b) // 3) AS BIGINT) AS resized_graysum
  FROM rpx GROUP BY doc_id
)
SELECT d.doc_id, d.w AS width, d.h AS height, d.w * d.h AS n_pixels,
       s.sum_r, s.sum_g, s.sum_b, gs.resized_graysum
FROM dim d JOIN sums s ON s.doc_id = d.doc_id
JOIN gsum gs ON gs.doc_id = d.doc_id
"""

QUERIES.update({"png_decode": q_png_decode})
ORACLES.update({"png_decode": SQL_PNG_DECODE})


def q_jpeg_decode(sf_dir: str):
    """REAL baseline JPEG decode (pure-numpy T.81 codec, no PIL — closes the
    VERDICT r4 #7 gate): per doc a grayscale image whose 8×8 coding blocks
    are each a deterministic constant is encoded to actual JPEG bytes at
    quality 100 — DCT, all-ones quant tables, Annex-K Huffman entropy coding
    with byte stuffing — then DecodeImage routes on the FFD8 signature and
    runs the full entropy-decode → dequant → IDCT path. Block-constant
    input at q100 roundtrips BIT-EXACTLY (AC terms are mathematically zero,
    DC is an exact integer under all-ones tables), so the SQL oracle can
    recompute the pixels from doc_id; a value match certifies the whole
    codec end-to-end. Lossy-quality parity is covered by tolerance-bounded
    pytest (tests/test_multimodal.py)."""
    from ..stages.multimodal import decode_images
    from ..stages.jpeg import encode_jpeg

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for di in d:
            w = int(di % 21 + 12)
            h = int(di % 13 + 9)
            bx = np.arange((w + 7) // 8, dtype=np.int64)
            by = np.arange((h + 7) // 8, dtype=np.int64)
            bv = ((bx[None, :] * 29 + by[:, None] * 17 + di * 13)
                  % 256).astype(np.uint8)
            img = np.repeat(np.repeat(bv, 8, 0), 8, 1)[:h, :w]
            payloads.append(encode_jpeg(img, quality=100))
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    enc = docs.map_batches(synth, batch_format="pyarrow")
    return decode_images(enc, max_side=8)


SQL_JPEG_DECODE = """
WITH dim AS (
  SELECT doc_id, doc_id % 21 + 12 AS w, doc_id % 13 + 9 AS h,
         GREATEST(doc_id % 21 + 12, doc_id % 13 + 9) AS mx
  FROM documents
), rdim AS (
  SELECT *,
         CASE WHEN mx <= 8 THEN w ELSE GREATEST(1, w * 8 // mx) END AS rw,
         CASE WHEN mx <= 8 THEN h ELSE GREATEST(1, h * 8 // mx) END AS rh
  FROM dim
), px AS (
  SELECT doc_id,
         ((x // 8) * 29 + (y // 8) * 17 + doc_id * 13) % 256 AS g
  FROM dim, UNNEST(generate_series(0, w - 1)) AS tx(x),
       UNNEST(generate_series(0, h - 1)) AS ty(y)
), sums AS (
  SELECT doc_id, CAST(SUM(g) AS BIGINT) AS s FROM px GROUP BY doc_id
), rpx AS (
  SELECT doc_id,
         (((j * w // rw) // 8) * 29 + ((i * h // rh) // 8) * 17
          + doc_id * 13) % 256 AS g
  FROM rdim, UNNEST(generate_series(0, rw - 1)) AS tj(j),
       UNNEST(generate_series(0, rh - 1)) AS ti(i)
), gsum AS (
  SELECT doc_id, CAST(SUM(g) AS BIGINT) AS resized_graysum
  FROM rpx GROUP BY doc_id
)
SELECT d.doc_id, d.w AS width, d.h AS height, d.w * d.h AS n_pixels,
       s.s AS sum_r, s.s AS sum_g, s.s AS sum_b, gs.resized_graysum
FROM dim d JOIN sums s ON s.doc_id = d.doc_id
JOIN gsum gs ON gs.doc_id = d.doc_id
"""

QUERIES.update({"jpeg_decode": q_jpeg_decode})
ORACLES.update({"jpeg_decode": SQL_JPEG_DECODE})


# ═══════════════════════════════════════════ JSON property extraction


def q_json_props(sf_dir: str):
    """Per-event_type stats over the integer ``k`` field of the JSON ``props``
    column — Arrow C-regex extraction, combiner aggregate."""
    from ..stages.relational import bucket_agg
    from ..stages.text import json_int_field

    ev = _read(sf_dir, "events", columns=["event_type", "props"])
    k = json_int_field(ev, "props", "k", "k")
    return bucket_agg(k, "event_type", {
        "n": (None, "count"),
        "sum_k": ("k", "sum"),
        "min_k": ("k", "min"),
        "max_k": ("k", "max"),
    }, combine=True)


SQL_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
"""

QUERIES.update({"json_props": q_json_props})
ORACLES.update({"json_props": SQL_JSON_PROPS})


# ═══════════════════════════════════ embedding LSH near-dup (scale path)


def q_embedding_lsh(sf_dir: str):
    """LSH-bucketed embedding near-dup: 2 bands × 4 sign bits, exact cosine
    only within colliding buckets (no all-pairs, no broadcast)."""
    from ..stages.similarity import embedding_lsh_neardup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_lsh_neardup(emb, threshold=0.35)


def _sql_sign_band(first_dim: int, bits: int) -> str:
    return " + ".join(
        f"{1 << i} * (CASE WHEN embedding[{first_dim + i}] > 0 "
        "THEN 1 ELSE 0 END)" for i in range(bits))


SQL_EMBEDDING_LSH = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         {_sql_sign_band(1, 4)} AS b0,
         {_sql_sign_band(5, 4)} AS b1
  FROM embeddings
)
SELECT DISTINCT a.vec_id AS u, b.vec_id AS v
FROM s a JOIN s b ON b.vec_id > a.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1)
WHERE list_cosine_similarity(a.e, b.e) >= 0.35
"""

QUERIES.update({"embedding_lsh": q_embedding_lsh})
ORACLES.update({"embedding_lsh": SQL_EMBEDDING_LSH})


# ═══════════════════════════════════════ embedding-column aggregation


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid sums (long format, integer micro) — the
    vector-column combiner aggregate."""
    from ..stages.similarity import label_centroid_sums

    emb = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    return label_centroid_sums(emb)


def _sql_label_centroids(dim: int = 64) -> str:
    arms = " UNION ALL ".join(
        f"SELECT label::BIGINT AS label, {i}::BIGINT AS dim, "
        f"CAST(FLOOR(embedding[{i}]::DOUBLE * 1000000 + 0.5) AS BIGINT) AS m "
        f"FROM embeddings" for i in range(1, dim + 1))
    return (f"WITH u AS ({arms}) "
            "SELECT label, dim, CAST(SUM(m) AS BIGINT) AS sum_micro, "
            "COUNT(*) AS n_vecs FROM u GROUP BY 1, 2")


SQL_LABEL_CENTROIDS = _sql_label_centroids()

QUERIES.update({"label_centroids": q_label_centroids})
ORACLES.update({"label_centroids": SQL_LABEL_CENTROIDS})


# ═══════════════════════════════════════════ TF-IDF


def q_tfidf(sf_dir: str):
    """Per-document top-3 TF-IDF terms (integer idf_milli = n_docs*1000 // df;
    tie-break term ascending)."""
    from ..stages.text import tfidf_top_terms

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_top_terms(docs, k=3)


SQL_TFIDF = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), nd AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * ((nd.n * 1000) // df.df) AS BIGINT) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ((nd.n * 1000) // df.df) DESC, tf.term ASC) AS rn
  FROM tf JOIN df USING (term), nd
)
SELECT doc_id, term, score, CAST(rn AS BIGINT) AS rank FROM s WHERE rn <= 3
"""


QUERIES.update({"tfidf": q_tfidf})
ORACLES.update({"tfidf": SQL_TFIDF})


# ═══════════════════════════════════════════ raster→vector (north rule)


def q_raster_to_vector(sf_dir: str):
    """Raster→vector: res-5 per-cell counts quantized into 4 bands, 4-connected
    equal-band cells merged into regions by the distributed CC kernel."""
    from ..stages.spatial import raster_to_vector

    nodes = _nodes_pos(sf_dir)
    return raster_to_vector(nodes, res=5, n_bands=4)


SQL_RASTER_TO_VECTOR = f"""
WITH RECURSIVE
  n AS ({NODES_SQL}),
  raster AS (
    SELECT {cell_id_sql("lat", "lon", 5)} AS cell, COUNT(*) AS cnt
    FROM n GROUP BY 1
  ),
  mx AS (SELECT MAX(cnt) AS m FROM raster),
  r AS (
    SELECT cell, cnt, (cell >> 29) & 536870911 AS latb, cell & 536870911 AS lonb,
           CAST(cnt * 4 // (m + 1) AS BIGINT) AS band
    FROM raster, mx
  ),
  e AS (
    SELECT a.cell AS u, b.cell AS v
    FROM r a JOIN r b ON a.band = b.band
     AND ((b.latb = a.latb AND b.lonb = a.lonb + 1)
          OR (b.latb = a.latb + 1 AND b.lonb = a.lonb))
  ),
  und AS (SELECT u AS s, v AS t FROM e UNION SELECT v, u FROM e),
  reach(node, lbl) AS (
    SELECT cell, cell FROM r
    UNION
    SELECT und.t, reach.lbl FROM reach JOIN und ON und.s = reach.node
  ),
  lab AS (SELECT node AS cell, MIN(lbl) AS region_id FROM reach GROUP BY 1)
SELECT region_id, MIN(band) AS band, COUNT(*) AS n_cells,
       CAST(SUM(cnt) AS BIGINT) AS total_n,
       MIN(latb) AS lat_lo, MAX(latb) AS lat_hi,
       MIN(lonb) AS lon_lo, MAX(lonb) AS lon_hi
FROM lab JOIN r USING (cell) GROUP BY 1
"""


QUERIES.update({"raster_to_vector": q_raster_to_vector})
ORACLES.update({"raster_to_vector": SQL_RASTER_TO_VECTOR})


# ═══════════════════════════════════════════ temporal join / window family
#
# Operators Ray Data lacks natively, built as key-cogrouped searchsorted
# kernels (stages/temporal.py). Events carry 2024 timestamps while orders are
# 1995-2001, so the as-of join's "latest order at-or-before" resolves to each
# customer's final order — tie-breaking on equal o_orderdate is genuinely
# exercised (7 customers tie at their max date at sf0.01).


def _quantize_milli(col: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        vm = np.floor(v * 1000 + 0.5).astype(np.int64)
        return batch.append_column(out, pa.array(vm, pa.int64()))

    return fn


def q_asof_latest_order(sf_dir: str):
    """As-of join: each event matched to the customer's most recent order at
    or before the event timestamp (ties → max o_orderkey)."""
    from ..stages.temporal import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["o_custkey"],
            "o_orderkey": batch["o_orderkey"],
            "o_orderdate": batch["o_orderdate"],
            "price_cents": pa.array(np.floor(p * 100 + 0.5).astype(np.int64),
                                    pa.int64()),
        })

    right = orders.map_batches(prep, batch_format="pyarrow")
    joined = asof_join(ev, right, key="user_id", left_ts="ts",
                       right_ts="o_orderdate", tiebreak="o_orderkey",
                       right_cols=["o_orderkey", "price_cents"])
    return joined.select_columns(["event_id", "user_id", "o_orderkey",
                                  "price_cents"])


SQL_ASOF_LATEST_ORDER = """
WITH j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM j WHERE rn = 1
"""


def q_range_join_prior(sf_dir: str):
    """Interval join + aggregate: per purchase event, count/sum the same
    user's view/click events in the preceding hour (left-outer: zero rows
    keep the purchase with 0/0)."""
    from ..stages.temporal import range_join_agg

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type", "value"])
    left = ev.filter(expr="event_type == 'purchase'") \
             .select_columns(["event_id", "user_id", "ts"])
    right = ev.filter(expr="event_type == 'view' or event_type == 'click'") \
              .map_batches(_quantize_milli("value", "value_milli"),
                           batch_format="pyarrow") \
              .select_columns(["user_id", "ts", "value_milli"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "r_ts", "value_milli"])

    right = right.map_batches(rename, batch_format="pyarrow")
    out = range_join_agg(left, right, key="user_id", left_ts="ts",
                         right_ts="r_ts", val_milli_col="value_milli",
                         lo_offset_us=-3_600_000_000, hi_offset_us=0)
    return out.select_columns(["event_id", "user_id", "n_matched",
                               "sum_matched_milli"])


SQL_RANGE_JOIN_PRIOR = """
SELECT e.event_id, e.user_id, COUNT(b.ts) AS n_matched,
       COALESCE(CAST(SUM(CAST(FLOOR(b.value * 1000 + 0.5) AS BIGINT))
                     AS BIGINT), 0) AS sum_matched_milli
FROM events e
LEFT JOIN events b
  ON b.user_id = e.user_id
 AND b.event_type IN ('view', 'click')
 AND b.ts >= e.ts - INTERVAL 1 HOUR AND b.ts < e.ts
WHERE e.event_type = 'purchase'
GROUP BY 1, 2
"""


def q_sessionize(sf_dir: str):
    """Gap-based session windows (24 h gap) per user: one row per session
    with its ordinal, event count, and duration."""
    from ..stages.temporal import sessionize

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return sessionize(ev, key="user_id", ts="ts", order_tiebreak="event_id",
                      gap_s=86_400)


SQL_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 1 DAY
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_n
  FROM d
)
SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
       COUNT(*) AS n_events,
       CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT)
         AS dur_s
FROM s GROUP BY 1, 2
"""


def q_hopping_window(sf_dir: str):
    """Hopping window aggregate: 1 h windows every 30 min per event_type
    (each event expands map-side into window/hop replicas)."""
    from ..stages.temporal import hopping_window

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"]) \
        .map_batches(_quantize_milli("value", "value_milli"),
                     batch_format="pyarrow")
    return hopping_window(ev, group="event_type", ts="ts",
                          val_milli_col="value_milli",
                          window_s=3600, hop_s=1800)


SQL_HOPPING_WINDOW = """
WITH base AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 AS BIGINT) // 1800 * 1800 AS b,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), w AS (
  SELECT event_type, b AS window_start_s, vm FROM base
  UNION ALL
  SELECT event_type, b - 1800, vm FROM base
)
SELECT event_type, window_start_s, COUNT(*) AS n,
       CAST(SUM(vm) AS BIGINT) AS sum_milli
FROM w GROUP BY 1, 2
"""


def q_quantiles(sf_dir: str):
    """Distributed exact grouped quantiles (p50/p90/p99) over the quantized
    value domain — histogram shuffle is one row per distinct (group, value)."""
    from ..stages.temporal import grouped_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(_quantize_milli("value", "value_milli"),
                     batch_format="pyarrow") \
        .select_columns(["event_type", "value_milli"])
    return grouped_quantiles(ev, group="event_type",
                             val_milli_col="value_milli")


SQL_QUANTILES = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), c AS (
  SELECT event_type, vm, COUNT(*) AS n FROM v GROUP BY 1, 2
), t AS (
  SELECT event_type, vm,
         SUM(n) OVER (PARTITION BY event_type ORDER BY vm) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM c
)
SELECT t.event_type, q.qp AS q_permille, CAST(MIN(vm) AS BIGINT) AS v_milli
FROM t CROSS JOIN (VALUES (500), (900), (990)) AS q(qp)
WHERE cum * 1000 >= qp * tot
GROUP BY 1, 2
"""


def _events_vm(sf_dir: str):
    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return ev.map_batches(_quantize_milli("value", "value_milli"),
                          batch_format="pyarrow") \
             .select_columns(["event_id", "event_type", "value_milli"])


def q_quantile_bucket(sf_dir: str):
    """Groupwise quantile-bucket assignment (value quartiles per event_type) —
    the ML-pipeline normalize-by-group-statistic shape."""
    from ..stages.temporal import quantile_bucket_assign

    return quantile_bucket_assign(_events_vm(sf_dir), group="event_type",
                                  val_milli_col="value_milli")


SQL_QUANTILE_BUCKET = """
WITH v AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), c AS (
  SELECT event_type, vm AS tv, COUNT(*) AS n FROM v GROUP BY 1, 2
), t AS (
  SELECT event_type, tv,
         SUM(n) OVER (PARTITION BY event_type ORDER BY tv) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM c
), th AS (
  SELECT event_type, qp, MIN(tv) AS thr
  FROM t CROSS JOIN (VALUES (250), (500), (750)) AS q(qp)
  WHERE cum * 1000 >= qp * tot GROUP BY 1, 2
)
SELECT v.event_id, v.event_type, v.vm AS value_milli,
       CAST(1 + COUNT(CASE WHEN v.vm > th.thr THEN 1 END) AS BIGINT) AS bucket
FROM v JOIN th USING (event_type)
GROUP BY 1, 2, 3
"""


def q_groupwise_center(sf_dir: str):
    """Group-wise mean centering with integer floor mean (exact)."""
    from ..stages.temporal import groupwise_center

    return groupwise_center(_events_vm(sf_dir), group="event_type",
                            val_milli_col="value_milli")


SQL_GROUPWISE_CENTER = """
WITH v AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), m AS (
  SELECT event_type, SUM(vm) AS s, COUNT(*) AS n FROM v GROUP BY 1
)
SELECT v.event_id, v.event_type, v.vm AS value_milli,
       CAST(v.vm - m.s // m.n AS BIGINT) AS centered_milli
FROM v JOIN m USING (event_type)
"""


QUERIES.update({
    "asof_latest_order": q_asof_latest_order,
    "range_join_prior": q_range_join_prior,
    "sessionize": q_sessionize,
    "hopping_window": q_hopping_window,
    "quantiles": q_quantiles,
    "quantile_bucket": q_quantile_bucket,
    "groupwise_center": q_groupwise_center,
})
ORACLES.update({
    "asof_latest_order": SQL_ASOF_LATEST_ORDER,
    "range_join_prior": SQL_RANGE_JOIN_PRIOR,
    "sessionize": SQL_SESSIONIZE,
    "hopping_window": SQL_HOPPING_WINDOW,
    "quantiles": SQL_QUANTILES,
    "quantile_bucket": SQL_QUANTILE_BUCKET,
    "groupwise_center": SQL_GROUPWISE_CENTER,
})


# ═══════════════════════════════════════════ deterministic output ordering
#
# The driver's hash compare is ROW-ORDER-sensitive while Ray's streaming
# executor emits blocks in nondeterministic order (round 1: 7 value-exact
# queries failed hash_match purely on order). Every query result is a SMALL
# final table (aggregate / top-k / per-group summary) — the pipelines
# themselves stream; only this last collect is eager — so we canonicalize by
# collecting to one Arrow table and sorting by every primitive column.

_SORTABLE_PREDICATES = None


def _canonical_order(res):
    global _SORTABLE_PREDICATES
    import pandas as pd

    if _SORTABLE_PREDICATES is None:
        _SORTABLE_PREDICATES = (
            pa.types.is_integer, pa.types.is_floating, pa.types.is_boolean,
            pa.types.is_string, pa.types.is_large_string, pa.types.is_binary,
            pa.types.is_timestamp, pa.types.is_date, pa.types.is_decimal,
        )
    import ray
    import ray.data

    if isinstance(res, ray.data.Dataset):
        blocks = ray.get(res.to_arrow_refs())
        # Ray may hand back native pandas blocks despite the name
        tables = [pa.Table.from_pandas(b, preserve_index=False)
                  if isinstance(b, pd.DataFrame) else b for b in blocks]
        tables = [t for t in tables if t.num_rows > 0]
        res = (pa.concat_tables(tables, promote_options="permissive")
               if tables else None)
        if res is None:
            return pa.table({})
    elif isinstance(res, pd.DataFrame):
        res = pa.Table.from_pandas(res, preserve_index=False)
    if not isinstance(res, pa.Table) or res.num_rows <= 1:
        return res
    # key priority = column-NAME order (the driver canonicalizes columns by
    # sorting their names; matching its row order needs the same priority)
    keys = sorted(f.name for f in res.schema
                  if any(p(f.type) for p in _SORTABLE_PREDICATES))
    if keys:
        res = res.sort_by([(k, "ascending") for k in keys])
    return res


def _determinized(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(sf_dir: str):
        return _canonical_order(fn(sf_dir))

    return wrapped


QUERIES = {name: _determinized(fn) for name, fn in QUERIES.items()}


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs via the shingle inverted index
    (the sketch-free third dedup family; stages/dedup.ngram_jaccard_pairs).
    Threshold 5·|A∩B| ≥ 4·|A∪B| (jaccard ≥ 0.8), same planted-dup corpus
    the MinHash/SimHash queries cluster."""
    from ..stages.dedup import ngram_jaccard_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(docs, shingle_k=3, threshold=(4, 5))
    return out.sort(["n_common", "n_union", "u", "v"])


SQL_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id, list_distinct(CASE
      WHEN len(string_split(text, ' ')) < 3 THEN [text]
      ELSE [array_to_string((string_split(text, ' '))[i:i+2], ' ')
            for i in generate_series(1, len(string_split(text, ' ')) - 2)]
    END) AS s
  FROM documents
)
SELECT a.doc_id AS u, b.doc_id AS v,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
       CAST(len(list_distinct(a.s || b.s)) AS BIGINT) AS n_union
FROM sh a JOIN sh b ON b.doc_id > a.doc_id
WHERE 5 * len(list_intersect(a.s, b.s)) >= 4 * len(list_distinct(a.s || b.s))
"""

QUERIES.update({"ngram_jaccard": q_ngram_jaccard})
ORACLES.update({"ngram_jaccard": SQL_NGRAM_JACCARD})


# ═════════════════════════════════════ URL hygiene family (web-corpus stage 1)

_URL_PARTS_SQL = """
parts AS (
  SELECT doc_id, url,
         LOWER(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         LOWER(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)', 1) AS port,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path
  FROM raw
), canon AS (
  SELECT doc_id, host, scheme || '://' || host ||
         CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                   OR (scheme = 'http' AND port = '80')
              THEN '' ELSE ':' || port END || path AS curl
  FROM parts
)
"""


def _synth_pages(sf_dir: str):
    """documents + deterministic dirty url column (stages/web.synth_urls_batch
    — the SQL oracle rebuilds the identical string)."""
    from ..stages.web import synth_urls_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])
    return docs.map_batches(synth_urls_batch, batch_format="pyarrow")


def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup over a dirty synthetic url column (upper-case
    scheme/host, explicit default port, tracking query, fragment): parse via
    one RE2 pass, canonicalize, keep min doc_id per canonical url. The
    recrawl-collapsing first stage of a Common-Crawl pipeline."""
    from ..stages.web import url_dedup

    return url_dedup(_synth_pages(sf_dir)).sort("curl")


SQL_URL_DEDUP = f"""
WITH raw AS (
  SELECT doc_id, {{synth}} AS url FROM documents
), {_URL_PARTS_SQL.strip()}
SELECT curl, CAST(COUNT(*) AS BIGINT) AS n_pages, MIN(doc_id) AS keep_id
FROM canon GROUP BY curl
"""


def q_url_host_stats(sf_dir: str):
    """Per-host rollup (host-level filtering signal): page count, distinct
    canonical urls, min doc id — two-level combiner-backed aggregation so the
    host shuffle is bounded by distinct canonical urls."""
    from ..stages.web import host_stats

    return host_stats(_synth_pages(sf_dir)).sort("host")


SQL_URL_HOST_STATS = f"""
WITH raw AS (
  SELECT doc_id, {{synth}} AS url FROM documents
), {_URL_PARTS_SQL.strip()}
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_canonical,
       MIN(doc_id) AS keep_id
FROM canon GROUP BY host
"""


def q_oov_rate(sf_dir: str):
    """Per-document OOV counts vs the corpus top-100 vocabulary (quality
    signal): combiner wordcount → bounded vocab broadcast → one is_in kernel
    pass per batch."""
    from ..stages.text import oov_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return oov_stats(docs, vocab_k=100)


SQL_OOV_RATE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ORDER BY n DESC, tok ASC LIMIT 100)
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM toks t LEFT JOIN vocab v USING (tok) GROUP BY t.doc_id
"""


def q_bigram_topk(sf_dir: str):
    """Corpus top-25 bigrams (phrase-mining / n-gram-LM counting kernel):
    within-doc consecutive-token pairs via one shifted element-wise join per
    batch, map-side combined, tiny global SUM + sort."""
    from ..stages.text import bigram_topk

    docs = _read(sf_dir, "documents", columns=["text"])
    # re-sort the 25-row result into canonical (bigram-ascending) order —
    # the driver hashes the returned frame, the top-k CUT is what's tested
    return bigram_topk(docs, k=25).sort("bigram")


SQL_BIGRAM_TOPK = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), b AS (
  SELECT toks[i] || ' ' || toks[i+1] AS bigram
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bigram
ORDER BY n DESC, bigram ASC LIMIT 25
"""


def q_ngram_containment(sf_dir: str):
    """Asymmetric shingle-containment near-dup pairs (C(A,B) = |A∩B|/|A| ≥
    0.9, directed): the swallowed-document detector symmetric Jaccard misses.
    Shares the exact inverted-index core with ngram_jaccard."""
    from ..stages.dedup import ngram_containment_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_containment_pairs(docs, shingle_k=3, threshold=(9, 10))
    return out.sort(["dst", "n_common", "n_src", "src"])


SQL_NGRAM_CONTAINMENT = """
WITH sh AS (
  SELECT doc_id, list_distinct(CASE
      WHEN len(string_split(text, ' ')) < 3 THEN [text]
      ELSE [array_to_string((string_split(text, ' '))[i:i+2], ' ')
            for i in generate_series(1, len(string_split(text, ' ')) - 2)]
    END) AS s
  FROM documents
)
SELECT a.doc_id AS src, b.doc_id AS dst,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
       CAST(len(a.s) AS BIGINT) AS n_src
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
WHERE 10 * len(list_intersect(a.s, b.s)) >= 9 * len(a.s)
"""


def _fill_synth(sql: str) -> str:
    from ..stages.web import synth_urls_sql

    return sql.replace("{synth}", synth_urls_sql())


QUERIES.update({
    "url_dedup": q_url_dedup,
    "url_host_stats": q_url_host_stats,
    "oov_rate": q_oov_rate,
    "bigram_topk": q_bigram_topk,
    "ngram_containment": q_ngram_containment,
})
ORACLES.update({
    "url_dedup": _fill_synth(SQL_URL_DEDUP),
    "url_host_stats": _fill_synth(SQL_URL_HOST_STATS),
    "oov_rate": SQL_OOV_RATE,
    "bigram_topk": SQL_BIGRAM_TOPK,
    "ngram_containment": SQL_NGRAM_CONTAINMENT,
})


# ══════════════════════════════════ distributed SSSP (G6/G7 scale path, r4)

def q_sssp(sf_dir: str):
    """Multi-source shortest paths over a step+skip DAG derived from the
    decade chains (skip edges make relaxation real: the window-sum shortcut
    that suffices for flow_upstream is wrong here). Runs the fully
    distributed Bellman-Ford round engine (stages/graph.sssp_rounds) — the
    giant-component scale path of the Dijkstra/A* family; sources (in-degree
    0) are found with a distributed anti-join, nothing touches the driver."""
    from ..stages.graph import sssp
    from ..stages.relational import cogroup_join, concat_blocks, snapshot

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def ok_rows(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (nc % 7 != 0) & (d % 10 != 9)
        return pa.table({"d": pa.array(d[keep], pa.int64())})

    ok = snapshot(docs.map_batches(ok_rows, batch_format="pyarrow"))
    step = ok.map_batches(
        lambda b: (lambda d: pa.table({
            "src": pa.array(d + 1), "dst": pa.array(d + 2),
            "w": pa.array(d % 13 + 1)}))(
            b["d"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow")
    # skip edge d+1 → d+3 exists when d AND d+1 are both ok (stays inside the
    # run) and d % 3 == 0 — the cross-row test is a distributed self-join
    nxt = ok.map_batches(
        lambda b: pa.table({"k": pc.add(b["d"], pa.scalar(1, pa.int64())),
                            "d": b["d"]}), batch_format="pyarrow")
    cur = ok.map_batches(lambda b: pa.table({"k": b["d"]}),
                         batch_format="pyarrow")
    both = cogroup_join(nxt, cur, ("k",), how="inner", num_partitions=4)
    skip = both.map_batches(
        lambda b: (lambda d: (lambda kept: pa.table({
            "src": pa.array(kept + 1), "dst": pa.array(kept + 3),
            "w": pa.array(kept % 17 + 2)}))(d[d % 3 == 0]))(
            b["d"].to_numpy(zero_copy_only=False).astype(np.int64)),
        batch_format="pyarrow")
    edges = snapshot(concat_blocks(step, skip))
    from ..stages.relational import bucket_agg

    endpoints = concat_blocks(
        edges.map_batches(lambda b: pa.table({"node": b["src"]}),
                          batch_format="pyarrow"),
        edges.map_batches(lambda b: pa.table({"node": b["dst"]}),
                          batch_format="pyarrow"))
    nodes = bucket_agg(endpoints, ["node"], {"n": (None, "count")},
                       num_partitions=4, combine=True) \
        .select_columns(["node"])
    dsts = edges.map_batches(lambda b: pa.table({"node": b["dst"]}),
                             batch_format="pyarrow")
    sources = cogroup_join(nodes, dsts, ("node",), how="left_anti",
                           num_partitions=4)
    out = sssp(edges, sources, num_partitions=4)  # auto-routes (G13 pattern)
    return out.sort(["dist", "node"])


SQL_SSSP = """
WITH RECURSIVE ok AS (
  SELECT doc_id AS d FROM documents WHERE n_chars % 7 <> 0 AND doc_id % 10 <> 9
), step AS (
  SELECT d + 1 AS src, d + 2 AS dst, d % 13 + 1 AS w FROM ok
), skip AS (
  SELECT a.d + 1 AS src, a.d + 3 AS dst, a.d % 17 + 2 AS w
  FROM ok a JOIN ok b ON b.d = a.d + 1 WHERE a.d % 3 = 0
), e AS (SELECT * FROM step UNION ALL SELECT * FROM skip),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
sources AS (SELECT node FROM nodes WHERE node NOT IN (SELECT dst FROM e)),
walk(node, dist) AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM sources
  UNION
  SELECT e.dst, walk.dist + e.w FROM walk JOIN e ON e.src = walk.node
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node
"""

QUERIES.update({"sssp": q_sssp})
ORACLES.update({"sssp": SQL_SSSP})


# ═══════════════════════════ star-schema 3-table join (TPC-H Q3 shape, r4)

_Q3_CUTOFF_US = 865_123_200_000_000  # 1997-06-01T00:00:00Z in epoch micros


def q_star_join_revenue(sf_dir: str):
    """customer ⋈ orders ⋈ lineitem revenue top-10 (TPC-H Q3 shape): the
    classic selective-dimension → fact-table star join. All three reads are
    column-pruned with row filters applied at the map stage; lineitem revenue
    is quantized to integer cents PER ROW (float-parity policy) and combined
    map-side per l_orderkey before the shuffle, so the fact-table all-to-all
    moves one row per (block, orderkey) — the right 100-TB shape."""
    from ..stages.relational import bucket_agg, cogroup_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(
            lambda b: pa.table({"o_custkey": b.filter(pc.equal(
                b["c_mktsegment"], "BUILDING"))["c_custkey"]}),
            batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda b: (lambda f: pa.table({"o_custkey": f["o_custkey"],
                                           "o_orderkey": f["o_orderkey"]}))(
                b.filter(pc.less(b["o_orderdate"].cast(pa.int64()),
                                 pa.scalar(_Q3_CUTOFF_US, pa.int64())))),
            batch_format="pyarrow")
    owned = cogroup_join(orders, cust, ("o_custkey",), how="inner",
                         num_partitions=8).select_columns(["o_orderkey"])

    def li_cents(b: pa.Table) -> pa.Table:
        keep = pc.greater(b["l_shipdate"].cast(pa.int64()),
                          pa.scalar(_Q3_CUTOFF_US, pa.int64()))
        f = b.filter(keep)
        ep = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = f["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - dc) * 100 + 0.5).astype(np.int64)
        return pa.table({"o_orderkey": f["l_orderkey"],
                         "cents": pa.array(cents, pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]) \
        .map_batches(li_cents, batch_format="pyarrow")
    rev = bucket_agg(li, ["o_orderkey"], {"revenue_cents": ("cents", "sum")},
                     num_partitions=8, combine=True)
    out = cogroup_join(owned, rev, ("o_orderkey",), how="inner",
                       num_partitions=8)
    top = out.sort(["revenue_cents", "o_orderkey"],
                   descending=[True, False]).limit(10)
    # canonical order for the driver hash: sorted-col (o_orderkey) ascending
    return top.sort("o_orderkey")


SQL_STAR_JOIN_REVENUE = """
WITH li AS (
  SELECT l_orderkey,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
           AS cents
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-01'
), top AS (
  SELECT o.o_orderkey, CAST(SUM(li.cents) AS BIGINT) AS revenue_cents
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN li ON li.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1997-06-01'
  GROUP BY o.o_orderkey ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
)
SELECT o_orderkey, revenue_cents FROM top
"""

QUERIES.update({"star_join_revenue": q_star_join_revenue})
ORACLES.update({"star_join_revenue": SQL_STAR_JOIN_REVENUE})


# ═══════════════════════════════ real audio decode (RIFF/WAVE PCM16, r4)

def q_audio_decode(sf_dir: str):
    """REAL audio decode (no audio lib needed): per doc a deterministic int16
    waveform is encoded into actual RIFF/WAVE PCM16 bytes, then the
    DecodeAudio actor pool walks the chunk list back (fmt validation,
    word-aligned sizes, little-endian PCM) and emits integer features —
    genuine bytes→samples math, value-exact against the SQL oracle that
    recomputes the same sample arithmetic from doc_id."""
    from ..stages.multimodal import decode_audio, encode_wav_pcm16

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def synth(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for di in d:
            k = np.arange(di % 50 + 10, dtype=np.int64)
            v = (di * 31 + k * 2654435761) % 65536 - 32768
            payloads.append(encode_wav_pcm16(v.astype(np.int16), 16000))
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    enc = docs.map_batches(synth, batch_format="pyarrow")
    # canonical row order (name-sorted columns): abs_max first, doc_id ties
    return decode_audio(enc).sort(["abs_max", "doc_id"])


SQL_AUDIO_DECODE = """
WITH s AS (
  SELECT doc_id, k, (doc_id * 31 + k * 2654435761) % 65536 - 32768 AS v
  FROM documents, LATERAL unnest(generate_series(0, doc_id % 50 + 9)) AS g(k)
), lagged AS (
  SELECT doc_id, v, LAG(v) OVER (PARTITION BY doc_id ORDER BY k) AS pv FROM s
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(SUM(v) AS BIGINT) AS sum_s,
       CAST(MAX(ABS(v)) AS BIGINT) AS abs_max,
       CAST(SUM(CASE WHEN pv IS NOT NULL AND pv * v < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_x
FROM lagged GROUP BY doc_id
"""

QUERIES.update({"audio_decode": q_audio_decode})
ORACLES.update({"audio_decode": SQL_AUDIO_DECODE})


# ═══════════════════════ int8 embedding quantization (storage pass, r4)

def q_embedding_quantize(sf_dir: str):
    """Per-vector symmetric int8 quantization summary (the 4× storage pass):
    one stateless vectorized map over zero-copy stacked float32 lists."""
    from ..stages.similarity import quantize_embeddings_int8

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = quantize_embeddings_int8(emb).drop_columns(["codes"])
    return out.sort(["max_code", "min_code", "n_dims", "scale_micro",
                     "sum_codes", "vec_id"])


SQL_EMBEDDING_QUANTIZE = """
WITH el AS (
  SELECT vec_id, UNNEST(embedding) AS v FROM embeddings
), am AS (
  SELECT vec_id, MAX(ABS(v)) AS absmax, COUNT(*) AS n_dims FROM el
  GROUP BY vec_id
), codes AS (
  SELECT el.vec_id,
         CAST(FLOOR(el.v * 127.0 / (CASE WHEN am.absmax = 0 THEN 1
                                         ELSE am.absmax END) + 0.5)
              AS BIGINT) AS q
  FROM el JOIN am USING (vec_id)
)
SELECT c.vec_id, CAST(MAX(am.n_dims) AS BIGINT) AS n_dims,
       CAST(FLOOR(CAST(MAX(am.absmax) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
         AS scale_micro,
       CAST(SUM(c.q) AS BIGINT) AS sum_codes,
       CAST(MIN(c.q) AS BIGINT) AS min_code,
       CAST(MAX(c.q) AS BIGINT) AS max_code
FROM codes c JOIN am ON am.vec_id = c.vec_id GROUP BY c.vec_id
"""

QUERIES.update({"embedding_quantize": q_embedding_quantize})
ORACLES.update({"embedding_quantize": SQL_EMBEDDING_QUANTIZE})


# ════════════════════════════════ grouped vocabulary top-k (per-lang, r4)

def q_vocab_by_lang(sf_dir: str):
    """Top-5 tokens per language (grouped wordcount + per-group rank):
    combiner-backed (lang, token) shuffle, hash-partitioned group ranking."""
    from ..stages.text import vocab_topk_by_group

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    out = vocab_topk_by_group(docs, k=5)
    return out.sort(["lang", "n", "rank", "token"])


SQL_VOCAB_BY_LANG = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token
), r AS (
  SELECT lang, token, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, token ASC) AS rank
  FROM c
)
SELECT lang, token, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""

QUERIES.update({"vocab_by_lang": q_vocab_by_lang})
ORACLES.update({"vocab_by_lang": SQL_VOCAB_BY_LANG})


# ═══════════════════════════ distributed convex hull (hull-of-hulls, r4)

def q_global_hull(sf_dir: str):
    """Global convex hull of the derived node cloud via hull-of-hulls: every
    block reduces to its own hull, only the tiny partial-hull union reaches
    the final pass — the giant-component scale path of the G8/D4 hull step.
    Non-strict hull (colinear BOUNDARY points kept), min-id per position."""
    from ..stages.spatial import convex_hull_distributed

    nodes = _nodes_pos(sf_dir)
    return convex_hull_distributed(nodes).sort(["lat", "lon", "node_id"])


# O(n²)·EXISTS oracle: (a,b) is a hull EDGE iff no other point lies strictly
# on its right; hull "vertices" are edge endpoints = every point ON the hull
# boundary (colinear boundary points included — matching the non-strict
# monotone chain; the derived modular-lattice cloud has colinear hull runs).
SQL_GLOBAL_HULL = f"""
WITH p AS ({NODES_SQL}),
pts AS (SELECT node_id, lat, lon FROM p),
dedup AS (
  SELECT MIN(node_id) AS node_id, lat, lon FROM pts GROUP BY lat, lon
),
edges AS (
  SELECT a.node_id AS na, b.node_id AS nb
  FROM dedup a JOIN dedup b
    ON a.node_id <> b.node_id
  WHERE NOT EXISTS (
    SELECT 1 FROM dedup c
    WHERE c.node_id <> a.node_id AND c.node_id <> b.node_id
      AND (b.lat - a.lat) * (c.lon - a.lon)
          - (b.lon - a.lon) * (c.lat - a.lat) < 0)
),
verts AS (SELECT na AS node_id FROM edges UNION SELECT nb FROM edges)
SELECT d.node_id, d.lat, d.lon FROM dedup d JOIN verts USING (node_id)
"""

QUERIES.update({"global_hull": q_global_hull})
ORACLES.update({"global_hull": SQL_GLOBAL_HULL})


# ═══════════════════════════════════ funnel analysis (events stream, r4)

def q_funnel(sf_dir: str):
    """view → click → purchase WINDOWED funnel (each step within 1 day of
    the previous): per user the deepest strictly-ordered step reached; one
    combiner-backed grouped MIN per step (shuffles bounded by users × steps,
    not event rows)."""
    from ..stages.temporal import funnel_depths

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    out = funnel_depths(ev, ["view", "click", "purchase"],
                        max_gap_us=86_400_000_000)  # 1-day windowed funnel
    return out.sort("depth")


SQL_FUNNEL = """
WITH a AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
), b AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > a.t
    AND e.ts <= a.t + INTERVAL 1 DAY GROUP BY e.user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > b.t
    AND e.ts <= b.t + INTERVAL 1 DAY GROUP BY e.user_id
), d AS (
  SELECT u.user_id,
         CASE WHEN c.user_id IS NOT NULL THEN 3
              WHEN b.user_id IS NOT NULL THEN 2
              WHEN a.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)
  LEFT JOIN c USING (user_id)
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY depth
"""

QUERIES.update({"funnel": q_funnel})
ORACLES.update({"funnel": SQL_FUNNEL})


# ═══════════════════════ KMV distinct-cardinality sketch (bigrams, r4)

def q_kmv_distinct(sf_dir: str):
    """Deterministic KMV distinct-count sketch over corpus bigrams (the
    cardinality-estimation primitive of dedup planning): per-block distinct
    k-smallest md5 partials → one tiny global sort+limit → one-row estimate.
    The sketch math is integer end-to-end, so the oracle reproduces the
    ESTIMATE exactly (est 945 vs true 916 at sf0.01 — a real ~3 % KMV error,
    not a fudge)."""
    from ..stages.relational import kmv_distinct
    from ..stages.text import bigram_partial_batch

    docs = _read(sf_dir, "documents", columns=["text"])

    def hashed(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_digests_ascii, md5_hex_of_digests

        part = bigram_partial_batch(batch)
        hx = md5_hex_of_digests(md5_digests_ascii(part["bigram"]))
        return pa.table({"h": pa.array(hx, pa.string())})

    return kmv_distinct(docs.map_batches(hashed, batch_format="pyarrow"),
                        hash_col="h", k=128)


SQL_KMV_DISTINCT = """
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
), b AS (
  SELECT md5(toks[i] || ' ' || toks[i+1]) AS h
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
), d AS (SELECT DISTINCT h FROM b),
topk AS (SELECT h FROM d ORDER BY h LIMIT 128),
kth AS (SELECT MAX(h) AS h, COUNT(*) AS n FROM topk),
x AS (
  SELECT n, (SELECT SUM((strpos('0123456789abcdef', substr(kth.h, i, 1)) - 1)
                 * (CAST(1 AS BIGINT) << ((12 - i) * 4)))
             FROM unnest(generate_series(1, 12)) AS g(i)) AS x48
  FROM kth
)
SELECT CAST(n AS BIGINT) AS k_used, CAST(x48 AS BIGINT) AS kth48,
       CAST(CASE WHEN n < 128 THEN n
                 ELSE (127 * (CAST(1 AS BIGINT) << 48)) // GREATEST(x48, 1)
            END AS BIGINT) AS est_distinct
FROM x
"""

QUERIES.update({"kmv_distinct": q_kmv_distinct})
ORACLES.update({"kmv_distinct": SQL_KMV_DISTINCT})


# ═══════════════════════ HyperLogLog distinct-cardinality sketch (r4)

def q_hll_distinct(sf_dir: str):
    """Deterministic HyperLogLog sketch over corpus bigrams — the streaming
    O(m)-state counterpart to ``kmv_distinct`` (no DISTINCT pass at all:
    register max is idempotent, union = register-wise max, the shape that
    wins at 100 TB). 48-bit md5 prefixes → 512 integer registers → floor'd
    estimate; the oracle reproduces registers AND estimate exactly (the float
    expression is written identically on both sides)."""
    from ..stages.relational import hll_distinct
    from ..stages.text import bigram_partial_batch

    docs = _read(sf_dir, "documents", columns=["text"])

    def hashed(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_digests_ascii

        part = bigram_partial_batch(batch)
        dig = md5_digests_ascii(part["bigram"])
        x48 = dig[:, :6].astype(np.int64) @ (
            np.int64(1) << (np.arange(5, -1, -1, dtype=np.int64) * 8))
        return pa.table({"x48": pa.array(x48, pa.int64())})

    return hll_distinct(docs.map_batches(hashed, batch_format="pyarrow"),
                        x48_col="x48", p=9)


SQL_HLL_DISTINCT = """
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
), b AS (
  SELECT md5(toks[i] || ' ' || toks[i+1]) AS h
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
), x AS (
  SELECT (SELECT SUM((strpos('0123456789abcdef', substr(b.h, i, 1)) - 1)
              * (CAST(1 AS BIGINT) << ((12 - i) * 4)))
          FROM unnest(generate_series(1, 12)) AS g(i)) AS x48
  FROM b
), r AS (
  SELECT x48 % 512 AS idx,
         CASE WHEN x48 // 512 = 0 THEN 40
              ELSE 40 - length(bin(x48 // 512)) END AS rho
  FROM x
), reg AS (SELECT idx, MAX(rho) AS mr FROM r GROUP BY idx),
agg AS (
  SELECT COUNT(*) AS n_seen,
         SUM(CAST(1 AS BIGINT) << (40 - mr)) AS dsum
  FROM reg
)
SELECT CAST(512 AS BIGINT) AS m,
       CAST(512 - n_seen AS BIGINT) AS n_zero,
       CAST(dsum + (512 - n_seen) * (CAST(1 AS BIGINT) << 40) AS BIGINT)
           AS denom,
       CAST(floor(0.7213 / (1.0 + 1.079 / 512) * 512 * 512
                  * CAST(CAST(1 AS BIGINT) << 40 AS DOUBLE)
                  / CAST(dsum + (512 - n_seen) * (CAST(1 AS BIGINT) << 40)
                         AS DOUBLE))
            AS BIGINT) AS est_distinct
FROM agg
"""

QUERIES.update({"hll_distinct": q_hll_distinct})
ORACLES.update({"hll_distinct": SQL_HLL_DISTINCT})


# ═══════════════════════ skew-aware (broadcast-hot) join (r4)

def q_skew_join(sf_dir: str):
    """events ⋈ customer revenue per market segment, routed through the
    skew-aware join: left-side key counts (map-side combiner) pick the hot
    keys, whose right-side rows broadcast (no shuffle) while cold rows take
    the bucketed hash join — the hot-key stall answer for a 100-TB fact
    table. hot_factor=1.1 on the near-uniform test key makes BOTH paths
    carry real rows; exactness is split-invariant (inner join distributes
    over the hot/cold partition), which the forced-path pytest pins."""
    from ..stages.relational import bucket_agg, skew_join

    def vm(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b["user_id"],
            "vm": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                           pa.int64())})

    ev = _read(sf_dir, "events", columns=["user_id", "value"]) \
        .map_batches(vm, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    j = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                  hot_factor=1.1)
    return bucket_agg(j, "c_mktsegment",
                      {"n_events": (None, "count"), "milli": ("vm", "sum")},
                      num_partitions=4, combine=True).sort("c_mktsegment")


SQL_SKEW_JOIN = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS milli
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""

QUERIES.update({"skew_join": q_skew_join})
ORACLES.update({"skew_join": SQL_SKEW_JOIN})


# ═══════════════════════ grouped OLS trend (integer moment sums, r4)

def q_group_regression(sf_dir: str):
    """Per-event-type least-squares trend of value (milli-units) over time
    (days since 2024-01-01) via ``grouped_ols`` — one combiner pass, integer
    moment sums, slope reported as the exact (num, den) integer pair so the
    oracle matches bit-for-bit with no float summation-order hazard."""
    from ..stages.relational import grouped_ols

    epoch_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

    def xy(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "x": pa.array((ts - epoch_us) // 86_400_000_000, pa.int64()),
            "y": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64),
                          pa.int64())})

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"]) \
        .map_batches(xy, batch_format="pyarrow")
    return grouped_ols(ev, "event_type", "x", "y",
                       num_partitions=4).sort("event_type")


SQL_GROUP_REGRESSION = """
WITH t AS (
  SELECT event_type,
         CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS x,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM t GROUP BY event_type
)
SELECT event_type, n, sum_x, sum_y,
       CAST(n * sxy - sum_x * sum_y AS BIGINT) AS slope_num,
       CAST(n * sxx - sum_x * sum_x AS BIGINT) AS slope_den
FROM s
"""

QUERIES.update({"group_regression": q_group_regression})
ORACLES.update({"group_regression": SQL_GROUP_REGRESSION})


# ═══════════════════════ Bloom-prefiltered semi-join (r4)

def q_bloom_semi(sf_dir: str):
    """lineitem rows of URGENT orders, per returnflag — the Bloom-prefilter
    semi-join: the selective key side (urgent o_orderkey) folds into one
    1M-bit bitmap that broadcasts once, every lineitem batch drops its
    guaranteed non-matches BEFORE the join shuffle, and the exact
    cogroup finish absorbs the false positives — result exact for any
    bitmap size, shuffle volume ∝ selectivity instead of table size."""
    from ..stages.relational import bloom_semi_join, bucket_agg

    urgent = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: pa.table({"o_orderkey": b.filter(pc.equal(
                b["o_orderpriority"], "1-URGENT"))["o_orderkey"]}),
            batch_format="pyarrow")

    def qty(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_returnflag": b["l_returnflag"],
            "qty": pa.array(np.floor(q + 0.5).astype(np.int64), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_quantity"]) \
        .map_batches(qty, batch_format="pyarrow")
    j = bloom_semi_join(li, urgent, "l_orderkey", key_col="o_orderkey",
                        num_partitions=8)
    return bucket_agg(j, "l_returnflag",
                      {"n_items": (None, "count"), "sum_qty": ("qty", "sum")},
                      num_partitions=4, combine=True).sort("l_returnflag")


SQL_BLOOM_SEMI = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""

QUERIES.update({"bloom_semi": q_bloom_semi})
ORACLES.update({"bloom_semi": SQL_BLOOM_SEMI})


# ═══════════════════════ tumbling-window COUNT(DISTINCT) (r4)

def q_window_distinct(sf_dir: str):
    """Distinct active users per hour — the exact two-level distinct
    aggregation: per-block unique (window, user) pairs (combiner), pair-keyed
    shuffle (hot windows still spread by user), then a per-window count.
    The all-to-all moves distinct pairs, not rows; ``hll_distinct`` is the
    sketch alternative when even the pair set won't fit."""
    from ..stages.temporal import windowed_distinct

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    return windowed_distinct(ev, "ts", "user_id", window_s=3600,
                             num_partitions=8) \
        .sort(["n_distinct", "window_start_s"])


SQL_WINDOW_DISTINCT = """
SELECT CAST(epoch_us(ts) // 1000000 // 3600 * 3600 AS BIGINT)
           AS window_start_s,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY 1
"""

QUERIES.update({"window_distinct": q_window_distinct})
ORACLES.update({"window_distinct": SQL_WINDOW_DISTINCT})


# ═══════════════════════ LEAD(1) next-event within user (r4)

def q_next_event(sf_dir: str):
    """Every event's successor type and gap within its user stream — the
    LEAD(1) window function as one key-bucketed shuffle + per-bucket
    lexsort/shift (the sessionize body; LAG/LEAD/running-total all reduce
    to it)."""
    from ..stages.temporal import next_event

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return next_event(ev, "user_id", "ts", "event_id", "event_type",
                      num_partitions=8).sort("event_id")


SQL_NEXT_EVENT = """
WITH t AS (
  SELECT event_id,
         LEAD(event_type) OVER w AS next_event_type,
         LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, next_event_type, CAST(gap_us AS BIGINT) AS gap_us
FROM t WHERE next_event_type IS NOT NULL
"""

QUERIES.update({"next_event": q_next_event})
ORACLES.update({"next_event": SQL_NEXT_EVENT})


# ═══════════════════════ PIVOT / crosstab (r4)

def q_pivot_dow(sf_dir: str):
    """Event counts as an event_type × day-of-week crosstab — PIVOT with a
    fixed column domain (like SQL's IN list): the shuffle moves one combined
    count row per (type, dow) cell, the long→wide reshape is a per-partition
    in-process step. Day-of-week is computed as (epoch_days + 4) % 7 on BOTH
    sides (1970-01-01 was a Thursday) to dodge engine dow conventions."""
    from ..stages.relational import pivot_counts

    def dow(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b["event_type"],
            "dow": pa.array((ts // 86_400_000_000 + 4) % 7, pa.int64())})

    ev = _read(sf_dir, "events", columns=["event_type", "ts"]) \
        .map_batches(dow, batch_format="pyarrow")
    return pivot_counts(ev, "event_type", "dow", range(7),
                        num_partitions=4).sort("event_type")


SQL_PIVOT_DOW = """
WITH t AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS d
  FROM events
)
SELECT event_type,
       CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_0,
       CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
       CAST(SUM(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
       CAST(SUM(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_3,
       CAST(SUM(CASE WHEN d = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_4,
       CAST(SUM(CASE WHEN d = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_5,
       CAST(SUM(CASE WHEN d = 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_6
FROM t GROUP BY event_type
"""

QUERIES.update({"pivot_dow": q_pivot_dow})
ORACLES.update({"pivot_dow": SQL_PIVOT_DOW})


# ═══════════════════════ order-invariant table checksum (r4)

def q_table_checksum(sf_dir: str):
    """Content checksum of the documents table (doc_id|lang|n_chars rows):
    SUM of 48-bit md5 prefixes mod 2^61−1 — the replica/resumable-output
    validation primitive. Order-invariant by construction, so it survives
    any block order/partitioning; per-block partials, one-row result."""
    from ..stages.relational import table_checksum

    def hashed(b: pa.Table) -> pa.Table:
        import pandas as pd

        from ..functions.hashing import md5_digests_ascii

        s = (pd.Series(b["doc_id"].to_numpy(zero_copy_only=False)).astype(str)
             + "|" + pd.Series(b["lang"].to_pylist())
             + "|" + pd.Series(
                 b["n_chars"].to_numpy(zero_copy_only=False)).astype(str))
        dig = md5_digests_ascii(pa.array(s, pa.string()))
        x48 = dig[:, :6].astype(np.int64) @ (
            np.int64(1) << (np.arange(5, -1, -1, dtype=np.int64) * 8))
        return pa.table({"x48": pa.array(x48, pa.int64())})

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"]) \
        .map_batches(hashed, batch_format="pyarrow")
    return table_checksum(docs, "x48")


SQL_TABLE_CHECKSUM = """
WITH r AS (
  SELECT md5(CAST(doc_id AS VARCHAR) || '|' || lang || '|'
             || CAST(n_chars AS VARCHAR)) AS h
  FROM documents
), x AS (
  SELECT (SELECT SUM((strpos('0123456789abcdef', substr(r.h, i, 1)) - 1)
              * (CAST(1 AS BIGINT) << ((12 - i) * 4)))
          FROM unnest(generate_series(1, 12)) AS g(i)) AS x48
  FROM r
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(x48) % 2305843009213693951 AS BIGINT) AS checksum
FROM x
"""

QUERIES.update({"table_checksum": q_table_checksum})
ORACLES.update({"table_checksum": SQL_TABLE_CHECKSUM})


# ═══════════════════════ retention cohorts (r4)

def q_retention_cohorts(sf_dir: str):
    """Weekly retention triangle: users grouped by first-active week
    (cohort), counted in every week they return — the standard webtext
    engagement analysis. Three bounded shuffles: per-user MIN week
    (combiner), distinct (user, week) pairs (combiner), one user-keyed join,
    then a count whose input is already one row per (user, week)."""
    from ..stages.relational import bucket_agg, cogroup_join

    wk = 604_800_000_000  # µs per week

    def pairs(b: pa.Table) -> pa.Table:
        ts = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = ts // wk
        uniq = np.unique(np.stack([u, w], axis=1), axis=0)
        return pa.table({"user_id": pa.array(uniq[:, 0], pa.int64()),
                         "week": pa.array(uniq[:, 1], pa.int64())})

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])
    active = bucket_agg(ev.map_batches(pairs, batch_format="pyarrow"),
                        ["user_id", "week"], {"n": (None, "count")},
                        num_partitions=8, combine=True) \
        .select_columns(["user_id", "week"])
    first = bucket_agg(ev.map_batches(pairs, batch_format="pyarrow"),
                       "user_id", {"cohort_week": ("week", "min")},
                       num_partitions=8, combine=True)
    j = cogroup_join(active, first, ("user_id",), how="inner",
                     num_partitions=8)
    return bucket_agg(j, ["cohort_week", "week"],
                      {"n_users": (None, "count")},
                      num_partitions=4, combine=True) \
        .sort(["cohort_week", "n_users", "week"])


SQL_RETENTION = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cw
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w FROM events
)
SELECT CAST(cw AS BIGINT) AS cohort_week, CAST(w AS BIGINT) AS week,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id) GROUP BY cw, w
"""

QUERIES.update({"retention_cohorts": q_retention_cohorts})
ORACLES.update({"retention_cohorts": SQL_RETENTION})


# ═══════════════════════ grouped median + MAD (robust stats, r4)

def q_grouped_mad(sf_dir: str):
    """Per-event-type median and median-absolute-deviation — the robust
    outlier-screen statistics corpus filtering uses on heavy-tailed signals.
    Exact on the milli-quantized domain, two histogram-bounded shuffles
    (one row per DISTINCT (group, value)), ceil-rank convention shared with
    the quantiles oracle."""
    from ..stages.temporal import grouped_mad

    return grouped_mad(_events_vm(sf_dir), "event_type",
                       "value_milli").sort("event_type")


SQL_GROUPED_MAD = """
WITH v AS (
  SELECT event_type, CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm
  FROM events
), c AS (
  SELECT event_type, vm, COUNT(*) AS n FROM v GROUP BY 1, 2
), t AS (
  SELECT event_type, vm,
         SUM(n) OVER (PARTITION BY event_type ORDER BY vm) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM c
), med AS (
  SELECT event_type, CAST(MIN(vm) AS BIGINT) AS median_milli
  FROM t WHERE cum * 1000 >= 500 * tot GROUP BY 1
), a AS (
  SELECT v.event_type, ABS(vm - median_milli) AS av
  FROM v JOIN med USING (event_type)
), c2 AS (
  SELECT event_type, av, COUNT(*) AS n FROM a GROUP BY 1, 2
), t2 AS (
  SELECT event_type, av,
         SUM(n) OVER (PARTITION BY event_type ORDER BY av) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM c2
), mad AS (
  SELECT event_type, CAST(MIN(av) AS BIGINT) AS mad_milli
  FROM t2 WHERE cum * 1000 >= 500 * tot GROUP BY 1
)
SELECT event_type, median_milli, mad_milli FROM med JOIN mad USING (event_type)
"""

QUERIES.update({"grouped_mad": q_grouped_mad})
ORACLES.update({"grouped_mad": SQL_GROUPED_MAD})


# ═══════════════════════ dataset version diff (CDC, r4)

def q_table_diff(sf_dir: str):
    """Added/removed/changed/unchanged key counts between two versions of
    the documents table (v2 derived deterministically: every 17th id
    dropped, every 11th content-perturbed, every 13th re-added under a new
    id) — the incremental-reprocessing validation primitive, in ONE
    key-bucketed shuffle via conditional min/max partials, no join."""
    from ..stages.relational import dataset_diff

    def hashed(b: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_digests_ascii

        dig = md5_digests_ascii(b["text"])
        x48 = dig[:, :6].astype(np.int64) @ (
            np.int64(1) << (np.arange(5, -1, -1, dtype=np.int64) * 8))
        return pa.table({"doc_id": b["doc_id"],
                         "h": pa.array(x48, pa.int64())})

    base = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(hashed, batch_format="pyarrow")

    def v2_of(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d % 17 != 3
        dk, hk = d[keep], h[keep]
        hk = np.where(dk % 11 == 5, hk ^ 1, hk)
        add = d % 13 == 2
        return pa.table({
            "doc_id": pa.array(np.r_[dk, d[add] + 10_000_000], pa.int64()),
            "h": pa.array(np.r_[hk, h[add]], pa.int64())})

    v2 = base.map_batches(v2_of, batch_format="pyarrow")
    return dataset_diff(base, v2, "doc_id", "h",
                        num_partitions=8).sort("category")


SQL_TABLE_DIFF = """
WITH raw AS (
  SELECT doc_id, md5(text) AS hx FROM documents
), x AS (
  SELECT doc_id,
         (SELECT SUM((strpos('0123456789abcdef', substr(raw.hx, i, 1)) - 1)
              * (CAST(1 AS BIGINT) << ((12 - i) * 4)))
          FROM unnest(generate_series(1, 12)) AS g(i)) AS h
  FROM raw
), v2 AS (
  SELECT doc_id, CASE WHEN doc_id % 11 = 5 THEN xor(h, CAST(1 AS BIGINT))
                      ELSE h END AS h
  FROM x WHERE doc_id % 17 != 3
  UNION ALL
  SELECT doc_id + 10000000, h FROM x WHERE doc_id % 13 = 2
), j AS (
  SELECT x.h AS h1, v2.h AS h2
  FROM x FULL OUTER JOIN v2 ON x.doc_id = v2.doc_id
)
SELECT CASE WHEN h1 IS NULL THEN 'added'
            WHEN h2 IS NULL THEN 'removed'
            WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM j GROUP BY 1
"""

QUERIES.update({"table_diff": q_table_diff})
ORACLES.update({"table_diff": SQL_TABLE_DIFF})


# ═══════════════════════ embedding Gram / covariance matrix (r4)

def q_embedding_gram(sf_dir: str):
    """Upper-triangle Gram matrix of the embeddings table (PCA/whitening
    prep) via exact integer quantization: per-block d×d partials (float64
    matmul over ≤4096-row chunks — every partial < 2^53, so exact), one
    (i,j)-bucketed sum. The shuffle moves d(d+1)/2 rows per block, never
    the vectors."""
    from ..stages.similarity import embedding_covariance

    emb = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_covariance(emb, emb_col="embedding",
                                scale_bits=20).sort(["i", "j"])


SQL_EMBEDDING_GRAM = """
WITH q AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576 + 0.5) AS BIGINT)
             AS v
  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS g(i)
)
SELECT a.i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY 1, 2
"""

QUERIES.update({"embedding_gram": q_embedding_gram})
ORACLES.update({"embedding_gram": SQL_EMBEDDING_GRAM})


# ═══════════════════════ double-sweep BFS diameter (r4)

def q_graph_diameter(sf_dir: str):
    """Double-sweep diameter estimate of the doc graph's min-vertex
    component (the k-core graph): BFS from the min vertex, hop to the
    farthest node, BFS again — both sweeps on the distributed Bellman-Ford
    round engine, only two single-row argmax probes reach the driver."""
    from ..stages.graph import double_sweep_diameter
    from ..stages.relational import cogroup_join

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us, vs = [], []
        for delta, mask in ((1, d % 5 != 0), (4, d % 7 == 0),
                            (10, d % 11 == 0)):
            us.append(d[mask])
            vs.append(d[mask] + delta)
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    cands = docs.map_batches(cand, batch_format="pyarrow")
    ids_v = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    edges = cogroup_join(cands, ids_v, ("v",), how="inner")
    return double_sweep_diameter(edges, u_col="u", v_col="v",
                                 num_partitions=4)


SQL_GRAPH_DIAMETER = """
WITH RECURSIVE e0 AS (
  SELECT doc_id AS u, doc_id + 1 AS v FROM documents WHERE doc_id % 5 != 0
  UNION ALL
  SELECT doc_id, doc_id + 4 FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, doc_id + 10 FROM documents WHERE doc_id % 11 = 0
), ev AS (
  SELECT u, v FROM e0 WHERE v IN (SELECT doc_id FROM documents)
), e AS (
  SELECT u AS src, v AS dst FROM ev UNION ALL SELECT v, u FROM ev
), s0 AS (SELECT MIN(src) AS n FROM e),
w1(node, dist) AS (
  SELECT n, CAST(0 AS BIGINT) FROM s0
  UNION
  SELECT e.dst, w1.dist + 1 FROM w1 JOIN e ON e.src = w1.node
  WHERE w1.dist < 64
), d1 AS (SELECT node, MIN(dist) AS dist FROM w1 GROUP BY node),
far AS (SELECT node FROM d1 ORDER BY dist DESC, node ASC LIMIT 1),
w2(node, dist) AS (
  SELECT node, CAST(0 AS BIGINT) FROM far
  UNION
  SELECT e.dst, w2.dist + 1 FROM w2 JOIN e ON e.src = w2.node
  WHERE w2.dist < 64
), d2 AS (SELECT node, MIN(dist) AS dist FROM w2 GROUP BY node)
SELECT CAST((SELECT n FROM s0) AS BIGINT) AS start_node,
       CAST((SELECT node FROM far) AS BIGINT) AS far_node,
       CAST((SELECT MAX(dist) FROM d2) AS BIGINT) AS diameter_lb
"""

QUERIES.update({"graph_diameter": q_graph_diameter})
ORACLES.update({"graph_diameter": SQL_GRAPH_DIAMETER})


# ═══════════════════════ degree assortativity (r4)

def q_assortativity(sf_dir: str):
    """Degree-correlation of the doc graph (hubs-link-hubs vs hubs-link-
    leaves) as the exact integer Pearson pair r_num/r_den over all directed
    orientations — one combiner degree count, two bucketed joins, one
    moment-sum pass."""
    from ..stages.graph import degree_assortativity
    from ..stages.relational import cogroup_join

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us, vs = [], []
        for delta, mask in ((1, d % 5 != 0), (4, d % 7 == 0),
                            (10, d % 11 == 0)):
            us.append(d[mask])
            vs.append(d[mask] + delta)
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    cands = docs.map_batches(cand, batch_format="pyarrow")
    ids_v = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    edges = cogroup_join(cands, ids_v, ("v",), how="inner")
    return degree_assortativity(edges, u_col="u", v_col="v",
                                num_partitions=4)


SQL_ASSORTATIVITY = """
WITH e0 AS (
  SELECT doc_id AS u, doc_id + 1 AS v FROM documents WHERE doc_id % 5 != 0
  UNION ALL
  SELECT doc_id, doc_id + 4 FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, doc_id + 10 FROM documents WHERE doc_id % 11 = 0
), ev AS (
  SELECT u, v FROM e0 WHERE v IN (SELECT doc_id FROM documents)
), e AS (
  SELECT u AS s, v AS d FROM ev UNION ALL SELECT v, u FROM ev
), deg AS (SELECT s AS node, COUNT(*) AS k FROM e GROUP BY s),
p AS (
  SELECT a.k AS x, b.k AS y
  FROM e JOIN deg a ON a.node = e.s JOIN deg b ON b.node = e.d
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(x) AS BIGINT) AS sum_deg,
         CAST(SUM(x * y) AS BIGINT) AS sum_prod,
         CAST(SUM(x * x) AS BIGINT) AS sum_sq
  FROM p
)
SELECT n_pairs, sum_deg, sum_prod, sum_sq,
       CAST(n_pairs * sum_prod - sum_deg * sum_deg AS BIGINT) AS r_num,
       CAST(n_pairs * sum_sq - sum_deg * sum_deg AS BIGINT) AS r_den
FROM m
"""

QUERIES.update({"assortativity": q_assortativity})
ORACLES.update({"assortativity": SQL_ASSORTATIVITY})


# ═══════════════════════════════ triangle counting (clique graph, r4)

def q_triangles(sf_dir: str):
    """Distributed triangle count over the (lang, source) co-membership
    clique graph: within-group pair edges (hash-partitioned group runner),
    wedge cogroup join, closure semi-join — two shuffles end to end."""
    from ..stages.graph import triangle_count
    from ..stages.relational import map_groups_partitioned

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def pairs(df):
        import pandas as pd

        d = np.sort(df["doc_id"].to_numpy())
        if len(d) < 2:
            return pd.DataFrame({"u": np.array([], np.int64),
                                 "v": np.array([], np.int64)})
        iu = np.triu_indices(len(d), 1)
        return pd.DataFrame({"u": d[iu[0]], "v": d[iu[1]]})

    edges = map_groups_partitioned(docs, pairs, ["lang", "source"],
                                   num_partitions=8)
    return triangle_count(edges, num_partitions=8)


SQL_TRIANGLES = """
WITH e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON a.lang = b.lang AND a.source = b.source AND b.doc_id > a.doc_id
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM e e1
             JOIN e e2 ON e2.u = e1.v
             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
         AS n_triangles
"""

QUERIES.update({"triangles": q_triangles})
ORACLES.update({"triangles": SQL_TRIANGLES})


# ═══════════════════════════ bigram lift / collocations (r4)

def q_bigram_lift(sf_dir: str):
    """Collocation mining: consecutive-token pairs whose integer lift
    (n_pair·N·1000 // (c1·c2)) clears 1.2× independence with support ≥ 20 —
    two combiner wordcounts + broadcast joins, exact integer score."""
    from ..stages.text import bigram_lift

    docs = _read(sf_dir, "documents", columns=["text"])
    out = bigram_lift(docs, min_count=20, min_lift_milli=1200)
    return out.sort(["lift_milli", "n_pair", "w1", "w2"])


SQL_BIGRAM_LIFT = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), uni AS (
  SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
t AS (SELECT string_split(text, ' ') AS toks FROM documents),
b AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2
  FROM t, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
), bc AS (
  SELECT w1, w2, COUNT(*) AS cb FROM b GROUP BY w1, w2
)
SELECT bc.w1, bc.w2, CAST(bc.cb AS BIGINT) AS n_pair,
       CAST((bc.cb * tot.n * 1000) // (u1.c * u2.c) AS BIGINT) AS lift_milli
FROM bc JOIN uni u1 ON u1.tok = bc.w1 JOIN uni u2 ON u2.tok = bc.w2, tot
WHERE bc.cb >= 20 AND (bc.cb * tot.n * 1000) // (u1.c * u2.c) >= 1200
"""

QUERIES.update({"bigram_lift": q_bigram_lift})
ORACLES.update({"bigram_lift": SQL_BIGRAM_LIFT})


# ══════════ exact substring duplicate spans + decontamination (r4, dedup)

def q_duplicate_spans(sf_dir: str):
    """Word-granular ExactSubstr duplication profile (Lee et al. 2022 shape):
    per doc (≥8 words), how many 8-word window positions also occur verbatim
    in another doc. Window-hash-keyed shuffles only — never all-pairs."""
    from ..stages.dedup import duplicate_spans

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_spans(docs, window_w=8).sort("doc_id")


SQL_DUPLICATE_SPANS = """
WITH win AS (
  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) < 8 THEN []
    ELSE [array_to_string((string_split(text, ' '))[i:i+7], ' ')
          for i in generate_series(1, len(string_split(text, ' ')) - 7)] END
    ) AS w
  FROM documents
), nd AS (
  SELECT w, COUNT(DISTINCT doc_id) AS ndocs FROM win GROUP BY w
)
SELECT win.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM win JOIN nd USING (w) GROUP BY win.doc_id
"""


def q_decontaminate(sf_dir: str):
    """Train/test decontamination scan: the test set is the deterministic
    doc_id % 17 == 0 slice; every train doc (≥5 words) reports how many of
    its 5-word window positions appear anywhere in the test set."""
    from ..stages.dedup import decontaminate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return decontaminate(docs, window_w=5, test_modulus=17).sort("doc_id")


SQL_DECONTAMINATE = """
WITH win AS (
  SELECT doc_id, unnest(CASE WHEN len(string_split(text, ' ')) < 5 THEN []
    ELSE [array_to_string((string_split(text, ' '))[i:i+4], ' ')
          for i in generate_series(1, len(string_split(text, ' ')) - 4)] END
    ) AS w
  FROM documents
), test_sh AS (
  SELECT DISTINCT w FROM win WHERE doc_id % 17 = 0
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(CASE WHEN w IN (SELECT w FROM test_sh) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit
FROM win WHERE doc_id % 17 <> 0 GROUP BY doc_id
"""

QUERIES.update({"duplicate_spans": q_duplicate_spans,
                "decontaminate": q_decontaminate})
ORACLES.update({"duplicate_spans": SQL_DUPLICATE_SPANS,
                "decontaminate": SQL_DECONTAMINATE})


# ═══════════ term retrieval + rollup + grouped mode (r4, relational/text)

def q_search(sf_dir: str):
    """Inverted-index retrieval: global top-10 documents for the fixed query
    bag {scan, column, window} under integer tf·idf — the search surface over
    the same df machinery tfidf uses; per-block top-k partials, no global
    sort."""
    from ..stages.text import search_topk

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return search_topk(docs, ["scan", "column", "window"], k=10) \
        .sort("doc_id")


SQL_SEARCH = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM t
  WHERE term IN ('scan', 'column', 'window') GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), nd AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, CAST(SUM(tf * ((nd.n * 1000) // df.df)) AS BIGINT) AS score
FROM tf JOIN df USING (term), nd
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_rollup(sf_dir: str):
    """GROUP BY ROLLUP (l_returnflag, l_linestatus): finest + subtotal +
    grand-total levels from ONE combiner-backed pass over lineitem; dropped
    keys carry the 'ALL' sentinel. Quantities are integral in TPC-H, so the
    sum is exact int64 on both sides."""
    from ..stages.relational import rollup_agg

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": b["l_returnflag"],
                         "l_linestatus": b["l_linestatus"],
                         "qty": pa.array(q.astype(np.int64), pa.int64())})

    ds = li.map_batches(to_int, batch_format="pyarrow")
    return rollup_agg(ds, ["l_returnflag", "l_linestatus"],
                      {"n": (None, "count"), "sum_qty": ("qty", "sum")}) \
        .sort(["l_linestatus", "l_returnflag"])


SQL_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_grouped_mode(sf_dir: str):
    """Per-event-type modal user (count DESC, user_id ASC tie-break): the
    categorical summary quantiles can't express; shuffle bounded by distinct
    (type, user) pairs."""
    from ..stages.relational import grouped_mode

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_mode(ev, "event_type", "user_id").sort("event_type")


SQL_GROUPED_MODE = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, user_id, n, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY n DESC, user_id ASC) AS rn
  FROM c
)
SELECT event_type, user_id, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1
"""

QUERIES.update({"search": q_search, "rollup": q_rollup,
                "grouped_mode": q_grouped_mode})
ORACLES.update({"search": SQL_SEARCH, "rollup": SQL_ROLLUP,
                "grouped_mode": SQL_GROUPED_MODE})


# ═══════════════════════════════ k-core decomposition (r4, graph family)

def q_kcore(sf_dir: str):
    """2-core of a sparse deterministic doc graph (broken chains + sparse
    skip/cross links): iterative degree peel to fixpoint — the dense-subgraph
    pre-pass of web-graph pipelines. Candidate edges are emitted per row and
    endpoint-validated with one semi-join (no id-set broadcast)."""
    from ..stages.graph import kcore
    from ..stages.relational import cogroup_join

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def cand(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us, vs = [], []
        for delta, mask in ((1, d % 5 != 0), (4, d % 7 == 0),
                            (10, d % 11 == 0)):
            us.append(d[mask])
            vs.append(d[mask] + delta)
        return pa.table({"u": pa.array(np.concatenate(us), pa.int64()),
                         "v": pa.array(np.concatenate(vs), pa.int64())})

    cands = docs.map_batches(cand, batch_format="pyarrow")
    ids_v = docs.map_batches(
        lambda b: pa.table({"v": b["doc_id"]}), batch_format="pyarrow")
    edges = cogroup_join(cands, ids_v, ("v",), how="inner")
    return kcore(edges, 2, u_col="u", v_col="v").sort(["deg", "node"])


def _kcore_sql(k: int = 2, rounds: int = 24) -> str:
    """Unrolled peeling oracle: each round recomputes degrees and drops
    sub-k vertices; ``rounds`` must exceed the peel depth (the battery graph
    peels in ~10; the engine raises past 64, so a divergence is loud)."""
    edges = """
  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 5 <> 0
  UNION
  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 4 WHERE a.doc_id % 7 = 0
  UNION
  SELECT a.doc_id AS u, b.doc_id AS v FROM documents a
    JOIN documents b ON b.doc_id = a.doc_id + 10 WHERE a.doc_id % 11 = 0
"""
    # AS MATERIALIZED: each e_i references e_{i-1} three times — default
    # CTE inlining would expand 3^rounds reads of the parquet view
    # (observed as "Too many open files"); materialization makes the
    # unroll linear.
    parts = [f"e0 AS MATERIALIZED ({edges})"]
    for i in range(rounds):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM "
            f"(SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}) "
            f"GROUP BY node)")
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg < {k})")
        parts.append(
            f"e{i + 1} AS MATERIALIZED (SELECT u, v FROM e{i} "
            f"WHERE u NOT IN (SELECT node FROM b{i}) "
            f"AND v NOT IN (SELECT node FROM b{i}))")
    return ("WITH " + ",\n".join(parts) +
            f",\ndf AS (SELECT node, COUNT(*) AS deg FROM "
            f"(SELECT u AS node FROM e{rounds} UNION ALL "
            f"SELECT v FROM e{rounds}) GROUP BY node)\n"
            f"SELECT node, CAST(deg AS BIGINT) AS deg FROM df "
            f"WHERE deg >= {k}")


QUERIES.update({"kcore": q_kcore})
ORACLES.update({"kcore": _kcore_sql(2, 24)})


def q_duplicate_span_runs(sf_dir: str):
    """Longest exactly-duplicated span per doc (ExactSubstr per-doc summary):
    maximal run of consecutive duplicated 8-word windows; island detection
    vectorized per doc-hash partition."""
    from ..stages.dedup import duplicate_span_runs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_span_runs(docs, window_w=8).sort("doc_id")


SQL_DUPLICATE_SPAN_RUNS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 8
), win AS (
  SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(w) - 7)) AS g(i)
), nd AS (
  SELECT win, COUNT(DISTINCT doc_id) AS ndocs FROM win GROUP BY win
), dup AS (
  SELECT win.doc_id, win.i FROM win JOIN nd USING (win) WHERE nd.ndocs >= 2
), isl AS (
  SELECT doc_id,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM dup
), runs AS (
  SELECT doc_id, MAX(cnt) AS max_run FROM (
    SELECT doc_id, grp, COUNT(*) AS cnt FROM isl GROUP BY doc_id, grp
  ) GROUP BY doc_id
)
SELECT t.doc_id, CAST(COALESCE(r.max_run, 0) AS BIGINT) AS max_run
FROM (SELECT DISTINCT doc_id FROM win) t LEFT JOIN runs r USING (doc_id)
"""

QUERIES.update({"duplicate_span_runs": q_duplicate_span_runs})
ORACLES.update({"duplicate_span_runs": SQL_DUPLICATE_SPAN_RUNS})


QUERIES.update({"det_shuffle": q_det_shuffle,
                "token_packing": q_token_packing,
                "pbf_roundtrip": q_pbf_roundtrip})
ORACLES.update({"det_shuffle": SQL_DET_SHUFFLE,
                "token_packing": SQL_TOKEN_PACKING,
                "pbf_roundtrip": SQL_PBF_ROUNDTRIP})


# ═══════════════ gzip payload inflate (WARC-style compressed records, r5)

def q_gzip_roundtrip(sf_dir: str):
    """Compressed-payload read path: each doc's text is gzip-framed
    (zlib wbits=31 — the WARC record container) into a binary payload
    column, then inflated back and fingerprinted (byte length + md5,
    bit-identical to DuckDB ``md5()``). The oracle recomputes both stats
    from the UNCOMPRESSED source column, so a value match certifies the
    deflate→inflate roundtrip end to end. stages/web.gunzip_roundtrip —
    two streaming map_batches stages, payloads never leave their block."""
    from ..stages.web import gunzip_roundtrip

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return gunzip_roundtrip(docs).sort("doc_id")


SQL_GZIP_ROUNDTRIP = """
SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       md5(text) AS text_md5
FROM documents ORDER BY doc_id
"""

QUERIES.update({"gzip_roundtrip": q_gzip_roundtrip})
ORACLES.update({"gzip_roundtrip": SQL_GZIP_ROUNDTRIP})


# ═══════════════ WARC container source/sink roundtrip (ISO 28500, r5)

def q_warc_roundtrip(sf_dir: str):
    """Full WARC container roundtrip — the Common Crawl read path end to
    end: documents → synthetic (url, warc_ts, html) pages → ``write_warc``
    (one gzip member per record, one .warc.gz per block — sources/warc.py)
    → ``read_warc`` (parallel over files, sequential member scan within
    one, the PBF blob-shard pattern) → per-record fingerprint. The oracle
    recomputes url/ts/length/md5 straight from the source table, so a value
    match certifies header framing, Content-Length payload slicing, the
    per-member gzip framing AND the WARC-Date second-resolution timestamp
    codec. Reference analog: the native-container read loop,
    bin/osm-lump-ways/main.rs:263-284."""
    import hashlib
    import os
    import shutil

    from ..sources.warc import read_warc, write_warc
    from ..stages.web import synth_urls_batch

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def to_pages(b: pa.Table) -> pa.Table:
        b = synth_urls_batch(b)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "url": b["url"],
            "warc_ts": pa.array(d + 1_600_000_000, pa.int64()),
            "html": b["text"].cast(pa.binary()),
            "doc_id": b["doc_id"],
        })

    out_dir = os.path.join(
        "/tmp", "olwr_warc",
        os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    write_warc(docs.map_batches(to_pages, batch_format="pyarrow"), out_dir)

    def fingerprint(b: pa.Table) -> pa.Table:
        payloads = b["html"].to_pylist()
        return pa.table({
            "url": b["url"],
            "warc_ts": b["warc_ts"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "payload_md5": pa.array(
                [hashlib.md5(p).hexdigest() for p in payloads],
                pa.string()),
        })

    # canonical battery row order: all columns ascending by sorted name
    return (read_warc(out_dir)
            .map_batches(fingerprint, batch_format="pyarrow")
            .sort(["n_bytes", "payload_md5", "url", "warc_ts"]))


def _sql_warc_roundtrip() -> str:
    from ..stages.web import synth_urls_sql

    return f"""
SELECT {synth_urls_sql()} AS url,
       CAST(doc_id + 1600000000 AS BIGINT) AS warc_ts,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents ORDER BY n_bytes, payload_md5, url, warc_ts
"""


SQL_WARC_ROUNDTRIP = _sql_warc_roundtrip()

QUERIES.update({"warc_roundtrip": q_warc_roundtrip})
ORACLES.update({"warc_roundtrip": SQL_WARC_ROUNDTRIP})


def q_cdx_random_access(sf_dir: str):
    """CDX index + ranged-read certification — the Common Crawl cluster.idx
    access pattern: documents → WARC containers (write_warc) → ``build_cdx``
    scans member byte spans in parallel (surt, url, ts, filename, offset,
    length, digest) → ``read_warc_at`` re-fetches EVERY record via its
    (filename, offset, length) span only (seek + exact ranged read +
    single-member inflate — no sequential scan) → md5 of the fetched
    payload joined back to the index row on the unique warc_ts. The oracle
    recomputes url/surt/ts/length/md5 straight from the source table, so a
    value match certifies the span arithmetic byte-exactly TWICE (digest
    from the scan, payload_md5 through the ranged read) plus the SURT key
    codec. Reference analog: the blob-index fan-out of the PBF reader
    (sources/pbf.py), applied as an index artifact."""
    import hashlib
    import os
    import shutil

    from ..sources.warc import build_cdx, read_warc_at, write_warc
    from ..stages.relational import cogroup_join
    from ..stages.web import synth_urls_batch

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def to_pages(b: pa.Table) -> pa.Table:
        b = synth_urls_batch(b)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "url": b["url"],
            "warc_ts": pa.array(d + 1_600_000_000, pa.int64()),
            "html": b["text"].cast(pa.binary()),
        })

    out_dir = os.path.join(
        "/tmp", "olwr_cdx", os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(out_dir, ignore_errors=True)
    write_warc(docs.map_batches(to_pages, batch_format="pyarrow"), out_dir)

    cdx = build_cdx(out_dir)

    def fingerprint(b: pa.Table) -> pa.Table:
        payloads = b["html"].to_pylist()
        return pa.table({
            "warc_ts": b["warc_ts"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "payload_md5": pa.array(
                [hashlib.md5(p).hexdigest() for p in payloads],
                pa.string()),
        })

    fetched = read_warc_at(
        cdx.select_columns(["filename", "offset", "length", "warc_ts"]),
        out_dir).map_batches(fingerprint, batch_format="pyarrow")
    joined = cogroup_join(
        cdx.select_columns(["surt", "url", "warc_ts", "digest"]),
        fetched, on=["warc_ts"])
    # canonical battery row order: all columns ascending by sorted name
    return joined.sort(
        ["digest", "n_bytes", "payload_md5", "surt", "url", "warc_ts"])


def _sql_cdx_random_access() -> str:
    from ..stages.web import synth_urls_sql

    return f"""
SELECT 'org,example,' || LOWER(source) || ')/' || lang || '/p/'
           || CAST(doc_id % 25 AS VARCHAR) AS surt,
       {synth_urls_sql()} AS url,
       CAST(doc_id + 1600000000 AS BIGINT) AS warc_ts,
       md5(text) AS digest,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY digest, n_bytes, payload_md5, surt, url, warc_ts
"""


QUERIES.update({"cdx_random_access": q_cdx_random_access})
ORACLES.update({"cdx_random_access": _sql_cdx_random_access()})


def q_link_graph(sf_dir: str):
    """Host-level web link graph — href extraction certified end-to-end:
    documents → pages whose html embeds one RELATIVE link (``/about``,
    resolves to the page's own host) and one ABSOLUTE cross-host link
    (``https://h<doc_id%11>.example.net/x``) → ``host_link_graph`` (the
    vectorized split+RE2 findall, stages/web.py) → (src_host, dst_host,
    n_links) combiner rollup. The oracle recomputes the expected edge set
    arithmetically from the source table — a value match certifies the
    anchor splitting, href capture, relative-vs-absolute resolution AND the
    pair aggregation. The edge list is graph-engine-ready (PageRank/SCC
    over hosts). Reference analog: way-graph edge derivation from shared
    node refs (src/bin/osm-lump-ways/main.rs pass 1)."""
    from ..stages.web import host_link_graph, synth_urls_batch

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def to_pages(b: pa.Table) -> pa.Table:
        b = synth_urls_batch(b)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hub = pa.array((d % 11).astype("U"), pa.string())
        html = pc.binary_join_element_wise(
            '<html><body><nav><a href="/about">about</a> '
            '<a href="https://h', hub, '.example.net/x">x</a></nav>',
            b["text"], "</body></html>", "")
        return pa.table({"url": b["url"], "html": html})

    edges = host_link_graph(
        docs.map_batches(to_pages, batch_format="pyarrow"))
    # canonical battery row order: all columns ascending by sorted name
    return edges.sort(["dst_host", "n_links", "src_host"])


SQL_LINK_GRAPH = """
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links FROM (
  SELECT LOWER(source) || '.example.org' AS src_host,
         LOWER(source) || '.example.org' AS dst_host FROM documents
  UNION ALL
  SELECT LOWER(source) || '.example.org' AS src_host,
         'h' || CAST(doc_id % 11 AS VARCHAR) || '.example.net' AS dst_host
  FROM documents
) GROUP BY src_host, dst_host
ORDER BY dst_host, n_links, src_host
"""

QUERIES.update({"link_graph": q_link_graph})
ORACLES.update({"link_graph": SQL_LINK_GRAPH})


def q_anchor_text(sf_dir: str):
    """Inbound anchor-text rollup — anchor terms keyed by TARGET host (the
    web-corpus signal used to augment target-page training text): the same
    vectorized href findall as link_graph, but the capture keeps the
    ``>text<`` anchor span and the rollup keys on (dst_host, anchor). The
    page html embeds a per-doc anchor (the doc's lang) on its cross-host
    link plus a constant relative link, so the oracle recomputes the
    expected (host, anchor, count) triples arithmetically."""
    from ..stages.web import anchor_text_rollup, synth_urls_batch

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def to_pages(b: pa.Table) -> pa.Table:
        b = synth_urls_batch(b)
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hub = pa.array((d % 11).astype("U"), pa.string())
        html = pc.binary_join_element_wise(
            '<html><body><nav><a href="/about">about</a> '
            '<a href="https://h', hub, '.example.net/x">', b["lang"],
            "</a></nav>", b["text"], "</body></html>", "")
        return pa.table({"url": b["url"], "html": html})

    rolled = anchor_text_rollup(
        docs.map_batches(to_pages, batch_format="pyarrow"))
    # canonical battery row order: all columns ascending by sorted name
    return rolled.sort(["anchor", "dst_host", "n_links"])


SQL_ANCHOR_TEXT = """
SELECT dst_host, anchor, CAST(COUNT(*) AS BIGINT) AS n_links FROM (
  SELECT LOWER(source) || '.example.org' AS dst_host,
         'about' AS anchor FROM documents
  UNION ALL
  SELECT 'h' || CAST(doc_id % 11 AS VARCHAR) || '.example.net' AS dst_host,
         lang AS anchor
  FROM documents
) GROUP BY dst_host, anchor
ORDER BY anchor, dst_host, n_links
"""

QUERIES.update({"anchor_text": q_anchor_text})
ORACLES.update({"anchor_text": SQL_ANCHOR_TEXT})


def _synth_robots_table(docs):
    """Deterministic per-host robots table from the distinct source hosts:
    odd-numbered hosts disallow /de/ and /zh/; hosts divisible by 3 carry a
    LONGER ``Allow: /de/p/1`` override (exercises longest-match). Shared by
    q_robots_filter and q_cc_pipeline; the SQL twin is the rule arithmetic
    in SQL_ROBOTS_FILTER."""
    from ..stages.relational import bucket_agg

    def robots_rows(b: pa.Table) -> pa.Table:
        hosts, texts = [], []
        for s in b["source"].to_pylist():
            n = int("".join(c for c in s if c.isdigit()) or 0)
            txt = "# synthetic robots\nUser-agent: crawler-x\nDisallow: /\n" \
                  "\nUser-agent: *\n"
            if n % 2 == 1:
                txt += "Disallow: /de/\nDisallow: /zh/\n"
            if n % 3 == 0:
                txt += "Allow: /de/p/1\n"
            hosts.append(s.lower() + ".example.org")
            texts.append(txt)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "robots": pa.array(texts, pa.string())})

    return bucket_agg(
        docs.map_batches(lambda b: pa.table({"source": b["source"]}),
                         batch_format="pyarrow"),
        ["source"], {"_n": (None, "count")},
        num_partitions=8, combine=True).map_batches(
        robots_rows, batch_format="pyarrow")


def q_robots_filter(sf_dir: str):
    """robots.txt exclusion under longest-match REP semantics: documents →
    pages with synthetic urls; a per-host robots table derived from the
    source hosts (odd-numbered hosts disallow ``/de/`` and ``/zh/``;
    hosts divisible by 3 carry a LONGER ``Allow: /de/p/1`` override, so the
    allow-beats-disallow-on-longer-match rule is exercised, not just plain
    prefix drops). ``robots_filter`` joins pages⋈rules on host (cogroup,
    left_outer — absent hosts fully allowed) and applies one vectorized
    startswith per prefix per host run. Output: surviving pages per
    (source, lang); the oracle reproduces the rule arithmetic directly."""
    from ..stages.relational import bucket_agg
    from ..stages.web import robots_filter, synth_urls_batch

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "source"])

    def to_pages(b: pa.Table) -> pa.Table:
        b = synth_urls_batch(b)
        return b.select(["url", "doc_id", "lang", "source"])

    pages = docs.map_batches(to_pages, batch_format="pyarrow")

    kept = robots_filter(pages, _synth_robots_table(docs))
    out = bucket_agg(kept.select_columns(["source", "lang"]),
                     ["source", "lang"], {"n_kept": (None, "count")},
                     num_partitions=8, combine=True)
    # canonical battery row order: all columns ascending by sorted name
    return out.sort(["lang", "n_kept", "source"])


SQL_ROBOTS_FILTER = """
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM documents
WHERE NOT (CAST(regexp_extract(source, '[0-9]+') AS INT) % 2 = 1
           AND lang IN ('de', 'zh'))
   OR (CAST(regexp_extract(source, '[0-9]+') AS INT) % 3 = 0
       AND lang = 'de'
       AND starts_with(CAST(doc_id % 25 AS VARCHAR), '1'))
GROUP BY source, lang
ORDER BY lang, n_kept, source
"""

QUERIES.update({"robots_filter": q_robots_filter})
ORACLES.update({"robots_filter": SQL_ROBOTS_FILTER})
